"""Tie-proof exact-rational arithmetic helpers.

``round(CAST(p/q AS DOUBLE), n)`` is the cross-engine defect class that
bit tpch_q3 (round 2) and events_value_moments (round 3): when the
exact rational p/q lands on a decimal half-tie at the n-th digit,
Spark (shortest-repr BigDecimal HALF_UP) and DuckDB (scaled float
nearbyint) can round the same double to opposite sides, one ULP apart.
The fix used throughout this repo is to round in INTEGER space — these
helpers are the shared implementation for any ratio of int64
quantities (averages, Jaccard, fractions, market shares).

Mechanics (full int64 range — no num/den bound): split the ratio into
integer and fractional parts first, ``num = q·den + r`` with
``q = num DIV den`` and ``0 <= r < den`` (exact int64 ops), so

    round-half-up(s·num/den) = s·q + round-half-up(s·r/den)

and the inner value ``s·r/den`` is < s (≤ 10^6-ish).  The inner term
is seed-and-correct: seed m0 from the IEEE double ratio — bounded by
s, so the double error is ≪ 0.5 and one ±1 step suffices — then fix
it with the exact integer predicate

    m = round-half-up(s·r/den)  ⟺  (2m−1)·den ≤ 2·s·r < (2m+1)·den

evaluated in DECIMAL(38,0) on Spark / HUGEINT on DuckDB (products
only — Spark's decimal ``div`` overflows internally, so no wide
division is ever performed; 2·s·r ≤ 2·10^6·2^63 < 10^38 fits).
While ``s·q + m ≤ 2^53`` the output is the single correctly-rounded
division ``CAST(s·q + m AS DOUBLE)/s`` (bit-identical to the
pre-split formula on its old safe domain); beyond 2^53 that cast
itself becomes lossy, so the mirrored ``CAST(q AS DOUBLE) + m/s``
form is used instead — q is the only rounded term (exact up to
2^53·10^digits), and it is the same expression on both engines, so
cross-engine identity holds over the full int64 range.
This is the same seed-and-correct scheme the moments std uses for its
integer sqrt.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _spark_halfup_from_qr(
    q_sql: str, r_sql: str, den_sql: str, digits: int
) -> str:
    """Core seed-and-correct form over a pre-split ratio: ``q_sql`` /
    ``r_sql`` are int64 fragments with ``q >= 0`` and ``0 <= r < den``
    (the decomposition ``num = q*den + r``).  Exposed separately so the
    signed variant can feed ``(-q, -r)`` for negative numerators
    without ever negating ``num`` itself (``-(INT64_MIN)`` wraps
    silently under Spark non-ANSI int64)."""
    s = 10**digits
    dec = "CAST({} AS DECIMAL(38,0))"
    q = f"({q_sql})"
    r = f"({r_sql})"
    two_sr = f"({dec.format(f'({r})')} * {2 * s})"
    m0 = (
        f"CAST(floor({s}.0D * CAST({r} AS DOUBLE)"
        f" / CAST(({den_sql}) AS DOUBLE) + 0.5) AS BIGINT)"
    )
    up = f"({dec.format(f'2 * ({m0}) + 1')} * {dec.format(f'({den_sql})')})"
    dn = f"({dec.format(f'2 * ({m0}) - 1')} * {dec.format(f'({den_sql})')})"
    m = (
        f"CASE WHEN {two_sr} >= {up} THEN ({m0}) + 1"
        f" WHEN {two_sr} < {dn} THEN ({m0}) - 1"
        f" ELSE ({m0}) END"
    )
    safe_q = (2**53 - s) // s
    return (
        f"CASE WHEN {q} <= {safe_q}"
        f" THEN CAST(CAST({s} AS BIGINT) * {q} + ({m}) AS DOUBLE)"
        f" / {float(s)}"
        f" ELSE CAST({q} AS DOUBLE) + CAST(({m}) AS DOUBLE) / {float(s)} END"
    )


def _spark_halfup_sql(num_sql: str, den_sql: str, digits: int) -> str:
    return _spark_halfup_from_qr(
        f"(({num_sql}) DIV ({den_sql}))",
        f"(({num_sql}) % ({den_sql}))",
        den_sql,
        digits,
    )


def halfup_ratio(num_sql: str, den_sql: str, digits: int) -> Column:
    """``round(num/den, digits)`` by integer half-up rounding.

    ``num_sql`` / ``den_sql`` are Spark SQL fragments of int64 values
    with ``num >= 0`` and ``den > 0`` (half-up equals half-away-from-
    zero on that domain, matching both engines' ``round``).  Full
    int64 range on both operands."""
    return F.expr(_spark_halfup_sql(num_sql, den_sql, digits))


def halfup_ratio_signed(num_sql: str, den_sql: str, digits: int) -> Column:
    """Sign-aware variant (half AWAY FROM ZERO, both engines' round
    semantics) for numerators that can be negative.  Genuinely full
    int64 range: the negative branch runs the core form on
    ``(-q, -r)`` from the original ``num DIV den`` / ``num % den``
    split (both truncate toward zero on both engines, so ``-q >= 0``
    and ``0 <= -r < den``), never on ``-num`` — ``-(INT64_MIN)``
    would silently wrap under Spark's non-ANSI int64.  The one value
    where even ``-q`` overflows (num = INT64_MIN with den = 1) has
    ``r = 0``, so it short-circuits to the exact cast ``CAST(num AS
    DOUBLE)`` (identical on both engines)."""
    pos = _spark_halfup_sql(f"({num_sql})", den_sql, digits)
    neg = _spark_halfup_from_qr(
        f"(-(({num_sql}) DIV ({den_sql})))",
        f"(-(({num_sql}) % ({den_sql})))",
        den_sql,
        digits,
    )
    return F.expr(
        f"CASE WHEN ({num_sql}) >= 0 THEN {pos}"
        f" WHEN ({den_sql}) = 1 THEN CAST(({num_sql}) AS DOUBLE)"
        f" ELSE -({neg}) END"
    )


def _duck_halfup_from_qr(
    q_sql: str, r_sql: str, den_sql: str, digits: int
) -> str:
    s = 10**digits
    q = f"({q_sql})"
    r = f"({r_sql})"
    two_sr = f"(CAST(({r}) AS HUGEINT) * {2 * s})"
    m0 = (
        f"CAST(floor({s}.0 * CAST({r} AS DOUBLE)"
        f" / CAST(({den_sql}) AS DOUBLE) + 0.5) AS BIGINT)"
    )
    up = f"(CAST(2 * ({m0}) + 1 AS HUGEINT) * CAST(({den_sql}) AS HUGEINT))"
    dn = f"(CAST(2 * ({m0}) - 1 AS HUGEINT) * CAST(({den_sql}) AS HUGEINT))"
    m = (
        f"CASE WHEN {two_sr} >= {up} THEN ({m0}) + 1"
        f" WHEN {two_sr} < {dn} THEN ({m0}) - 1"
        f" ELSE ({m0}) END"
    )
    safe_q = (2**53 - s) // s
    return (
        f"CASE WHEN {q} <= {safe_q}"
        f" THEN CAST(CAST({s} AS BIGINT) * {q} + ({m}) AS DOUBLE)"
        f" / {float(s)}"
        f" ELSE CAST({q} AS DOUBLE) + CAST(({m}) AS DOUBLE) / {float(s)} END"
    )


def _duck_halfup_sql(num_sql: str, den_sql: str, digits: int) -> str:
    return _duck_halfup_from_qr(
        f"(({num_sql}) // ({den_sql}))",
        f"(({num_sql}) % ({den_sql}))",
        den_sql,
        digits,
    )


def halfup_ratio_sql(num_sql: str, den_sql: str, digits: int) -> str:
    """DuckDB twin of :func:`halfup_ratio` (HUGEINT products, same
    seed-and-correct scheme)."""
    return _duck_halfup_sql(num_sql, den_sql, digits)


def halfup_ratio_signed_sql(num_sql: str, den_sql: str, digits: int) -> str:
    """DuckDB twin of :func:`halfup_ratio_signed` (DuckDB ``//`` and
    ``%`` also truncate toward zero, verified: ``-7 // 2 = -3``,
    ``-7 % 2 = -1`` — same ``(q, r)`` split as Spark)."""
    pos = _duck_halfup_sql(f"({num_sql})", den_sql, digits)
    neg = _duck_halfup_from_qr(
        f"(-(({num_sql}) // ({den_sql})))",
        f"(-(({num_sql}) % ({den_sql})))",
        den_sql,
        digits,
    )
    return (
        f"CASE WHEN ({num_sql}) >= 0 THEN {pos}"
        f" WHEN ({den_sql}) = 1 THEN CAST(({num_sql}) AS DOUBLE)"
        f" ELSE -({neg}) END"
    )


def ppm(threshold: float) -> int:
    """A float threshold as exact parts-per-million for integer
    compares: ``p/q >= threshold`` becomes ``10^6·p >= ppm·q``."""
    return int(round(threshold * 1_000_000))
