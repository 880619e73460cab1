"""Expression / semantic-parity layer (SURVEY.md §2.7, F1–F11).

T-SQL scalar idioms re-expressed as Catalyst column expressions. These stay
JVM-side (whole-stage codegen) — no Python UDFs.

Parity notes (SURVEY §7.4):
- T-SQL ``CONCAT`` treats NULL as '' → ``concat_ws`` (plain ``concat`` is
  NULL-propagating, which instead matches T-SQL ``+``).
- T-SQL ``CAST('' AS float)`` errors; Spark ``cast``/``try_cast`` yields
  NULL — the engine standardizes on NULL-on-failure.
- Divide-by-zero: T-SQL errors, Spark yields NULL; ``null_if_zero`` makes
  the NULL intent explicit so the DuckDB oracle can mirror it (NULLIF).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tsql_concat(*cols: ColumnOrName | object) -> Column:
    """F2: variadic NULL-tolerant CONCAT (NULL → '').

    Mirrors ``CONCAT('O=',TRADITIONAL_MODEL,…)`` at
    ``shareOurStrengthSQLCodev4.sql:817-823``. Plain strings are LITERAL
    fragments (pass ``F.col`` for columns); everything is cast to string.
    """
    parts = []
    for c in cols:
        c = c if isinstance(c, Column) else F.lit(c)
        parts.append(c.cast("string"))
    return F.concat_ws("", *parts)


def pad_key(c: ColumnOrName, width: int = 6, fill: str = "0") -> Column:
    """F5+F6: the zero-pad join-key idiom.

    ``CASE WHEN len(id)=6 THEN id ELSE RIGHT('000000'+id, 6) END``
    (``shareOurStrengthSQLCodev4.sql:850-856``). NOT plain ``lpad``:
    on over-long ids T-SQL RIGHT keeps the *rightmost* chars while lpad
    keeps the leftmost — so we implement the RIGHT(fill+id, n) idiom
    itself (DuckDB oracle: ``right('000000' || id, 6)``).
    """
    return F.substring(F.concat(F.lit(fill * width), _col(c).cast("string")), -width, width)


def try_double(c: ColumnOrName) -> Column:
    """F4: CAST(x AS float) with NULL-on-failure (``:873`` etc.)."""
    return _col(c).try_cast("double")


def recode(
    c: ColumnOrName,
    mapping: Mapping[str, object],
    default: object = None,
    null_value: object = None,
) -> Column:
    """F8: multi-branch CASE WHEN recode builder.

    Drives D1/D13/D14 (``shareOurStrengthSQLCodev4.sql:800-809,:996-1031``).
    ``null_value`` handles the reference's ``= NULL`` branch *intent*
    (``:1004`` can never match in T-SQL; we implement ``.isNull()``).
    """
    col = _col(c)
    expr: Column | None = None
    for k, v in mapping.items():
        cond = col == F.lit(k)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    if expr is None:
        expr = F.when(F.lit(False), F.lit(None))
    if null_value is not None:
        expr = expr.when(col.isNull(), F.lit(null_value))
    return expr.otherwise(F.lit(default))


def like_any(c: ColumnOrName, *patterns: str) -> Column:
    """F9: ``LIKE '%pat%' OR LIKE …`` disjunction (``:129-130``)."""
    col = _col(c)
    out = col.like(patterns[0])
    for p in patterns[1:]:
        out = out | col.like(p)
    return out


def pround(c: ColumnOrName, k: int = 2) -> Column:
    """Engine-parity rounding: ``floor(x * 10^k + 0.5) / 10^k``.

    ``F.round`` (JVM BigDecimal, exact-binary HALF_UP) and DuckDB ``ROUND``
    (shortest-decimal-repr based) disagree on boundary values like
    16038.691649999999 → .6916 vs .6917. This formula is pure IEEE-754
    mul/add/floor/div, so any engine computes the identical bit pattern on
    identical input doubles — the contract's oracle SQL uses the same
    ``FLOOR(x * 1eK + 0.5) / 1eK`` expression.
    """
    scale = F.lit(float(10**k))
    return F.floor(_col(c) * scale + F.lit(0.5)) / scale


def null_if_zero(c: ColumnOrName) -> Column:
    """F10 guard: NULLIF(denom, 0) so ratios yield NULL, not error/inf."""
    col = _col(c)
    return F.when(col == 0, F.lit(None)).otherwise(col)
