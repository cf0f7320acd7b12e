"""Tie-proof exact-rational arithmetic helpers.

``round(CAST(p/q AS DOUBLE), n)`` is the cross-engine defect class that
bit tpch_q3 (round 2) and events_value_moments (round 3): when the
exact rational p/q lands on a decimal half-tie at the n-th digit,
Spark (shortest-repr BigDecimal HALF_UP) and DuckDB (scaled float
nearbyint) can round the same double to opposite sides, one ULP apart.
The fix used throughout this repo is to round in INTEGER space — these
helpers are the shared implementation for any ratio of int64
quantities (averages, Jaccard, fractions, market shares).

Mechanics (full int64 range — no den bound): seed m0 from the IEEE
double ratio, then correct it with the exact integer predicate

    m = round-half-up(s·num/den)  ⟺  (2m−1)·den ≤ 2·s·num < (2m+1)·den

evaluated in DECIMAL(38,0) on Spark / HUGEINT on DuckDB (products
only — Spark's decimal ``div`` overflows internally, so no wide
division is ever performed).  The double seed is within ±1 of the true
value for any ratio below ~2^52, so a single ±1 correction step is
exact.  This is the same seed-and-correct scheme the moments std uses
for its integer sqrt.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _spark_halfup_sql(num_sql: str, den_sql: str, digits: int) -> str:
    s = 10**digits
    dec = "CAST({} AS DECIMAL(38,0))"
    two_sn = f"({dec.format(f'({num_sql})')} * {2 * s})"
    m0 = (
        f"CAST(floor({s}.0D * CAST(({num_sql}) AS DOUBLE)"
        f" / CAST(({den_sql}) AS DOUBLE) + 0.5) AS BIGINT)"
    )
    up = f"({dec.format(f'2 * ({m0}) + 1')} * {dec.format(f'({den_sql})')})"
    dn = f"({dec.format(f'2 * ({m0}) - 1')} * {dec.format(f'({den_sql})')})"
    m = (
        f"CASE WHEN {two_sn} >= {up} THEN ({m0}) + 1"
        f" WHEN {two_sn} < {dn} THEN ({m0}) - 1"
        f" ELSE ({m0}) END"
    )
    return f"CAST({m} AS DOUBLE) / {float(s)}"


def halfup_ratio(num_sql: str, den_sql: str, digits: int) -> Column:
    """``round(num/den, digits)`` by integer half-up rounding.

    ``num_sql`` / ``den_sql`` are Spark SQL fragments of int64 values
    with ``num >= 0`` and ``den > 0`` (half-up equals half-away-from-
    zero on that domain, matching both engines' ``round``).  Full
    int64 range on both operands."""
    return F.expr(_spark_halfup_sql(num_sql, den_sql, digits))


def halfup_ratio_signed(num_sql: str, den_sql: str, digits: int) -> Column:
    """Sign-aware variant (half AWAY FROM ZERO, both engines' round
    semantics) for numerators that can be negative."""
    pos = _spark_halfup_sql(f"({num_sql})", den_sql, digits)
    neg = _spark_halfup_sql(f"(-({num_sql}))", den_sql, digits)
    return F.expr(
        f"CASE WHEN ({num_sql}) >= 0 THEN {pos} ELSE -({neg}) END"
    )


def _duck_halfup_sql(num_sql: str, den_sql: str, digits: int) -> str:
    s = 10**digits
    two_sn = f"(CAST(({num_sql}) AS HUGEINT) * {2 * s})"
    m0 = (
        f"CAST(floor({s}.0 * CAST(({num_sql}) AS DOUBLE)"
        f" / CAST(({den_sql}) AS DOUBLE) + 0.5) AS BIGINT)"
    )
    up = f"(CAST(2 * ({m0}) + 1 AS HUGEINT) * CAST(({den_sql}) AS HUGEINT))"
    dn = f"(CAST(2 * ({m0}) - 1 AS HUGEINT) * CAST(({den_sql}) AS HUGEINT))"
    m = (
        f"CASE WHEN {two_sn} >= {up} THEN ({m0}) + 1"
        f" WHEN {two_sn} < {dn} THEN ({m0}) - 1"
        f" ELSE ({m0}) END"
    )
    return f"CAST({m} AS DOUBLE) / {float(s)}"


def halfup_ratio_sql(num_sql: str, den_sql: str, digits: int) -> str:
    """DuckDB twin of :func:`halfup_ratio` (HUGEINT products, same
    seed-and-correct scheme)."""
    return _duck_halfup_sql(num_sql, den_sql, digits)


def halfup_ratio_signed_sql(num_sql: str, den_sql: str, digits: int) -> str:
    """DuckDB twin of :func:`halfup_ratio_signed`."""
    pos = _duck_halfup_sql(f"({num_sql})", den_sql, digits)
    neg = _duck_halfup_sql(f"(-({num_sql}))", den_sql, digits)
    return (
        f"CASE WHEN ({num_sql}) >= 0 THEN {pos} ELSE -({neg}) END"
    )


def ppm(threshold: float) -> int:
    """A float threshold as exact parts-per-million for integer
    compares: ``p/q >= threshold`` becomes ``10^6·p >= ppm·q``."""
    return int(round(threshold * 1_000_000))
