"""Tie-proof exact-rational arithmetic helpers.

``round(CAST(p/q AS DOUBLE), n)`` is the cross-engine defect class that
bit tpch_q3 (round 2) and events_value_moments (round 3): when the
exact rational p/q lands on a decimal half-tie at the n-th digit,
Spark (shortest-repr BigDecimal HALF_UP) and DuckDB (scaled float
nearbyint) can round the same double to opposite sides, one ULP apart.
The fix used throughout this repo is to round in INTEGER space — these
helpers are the shared implementation for any ratio of nonnegative
int64 quantities (averages, Jaccard, fractions, market shares).

The quotient/remainder split keeps int64 headroom: operands never
exceed ``max(p, 10^digits · q)`` instead of ``10^digits · p``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def halfup_ratio(num_sql: str, den_sql: str, digits: int) -> Column:
    """``round(num/den, digits)`` by integer half-up rounding.

    ``num_sql`` / ``den_sql`` are Spark SQL fragments of int64 values
    with ``num >= 0`` and ``den > 0`` (half-up equals half-away-from-
    zero on that domain, matching both engines' ``round``)."""
    s = 10**digits
    return F.expr(
        f"CAST({s} * (({num_sql}) div ({den_sql}))"
        f" + (2 * {s} * (({num_sql}) % ({den_sql})) + ({den_sql}))"
        f" div (2 * ({den_sql})) AS DOUBLE) / {float(s)}"
    )


def halfup_ratio_sql(num_sql: str, den_sql: str, digits: int) -> str:
    """DuckDB twin of :func:`halfup_ratio` (``//`` floor division ==
    Spark ``div`` truncation on the nonnegative domain)."""
    s = 10**digits
    return (
        f"CAST({s} * (({num_sql}) // ({den_sql}))"
        f" + (2 * {s} * (({num_sql}) % ({den_sql})) + ({den_sql}))"
        f" // (2 * ({den_sql})) AS DOUBLE) / {float(s)}"
    )


def ppm(threshold: float) -> int:
    """A float threshold as exact parts-per-million for integer
    compares: ``p/q >= threshold`` becomes ``10^6·p >= ppm·q``."""
    return int(round(threshold * 1_000_000))
