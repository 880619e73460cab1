"""Test-size profile (VERDICT r15 #1: the full suite outgrew the
driver's verify time budget — ~52 min — so the DEFAULT profile runs the
same tests with fewer/smaller trials).

Every test keeps its assertions in both profiles; only trial counts,
fuzz seeds, ladder rungs, and replicated-tick counts shrink in the fast
profile. Restore the original scale with::

    SPARK_GRAFT_TEST_PROFILE=full python -m pytest tests/ -q

A handful of tests whose POINT is bulk (e.g. crossing the retirement
broadcast cap with >1M ids) cannot shrink; those carry
``@pytest.mark.slow`` and are deselected by the default ``-m "not
slow"`` in pytest.ini — run them with ``-m ""`` or the full profile
command above (which overrides the marker expression via addopts
precedence: pass ``-m ""`` explicitly).
"""

from __future__ import annotations

import os

FULL = os.environ.get("SPARK_GRAFT_TEST_PROFILE", "fast").lower() == "full"


def prof(fast, full):
    """Pick the fast- or full-profile value for a trial count / size."""
    return full if FULL else fast
