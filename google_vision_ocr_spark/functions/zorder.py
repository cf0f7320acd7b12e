"""Z-order (Morton) interleaving — multi-dimensional data layout keys.

Sorting a table by the bit-interleave of two (or more) bounded columns
clusters rows that are close in EVERY dimension into the same parquet
row groups, so min/max row-group statistics prune scans for predicates
on either dimension — the Delta/Iceberg ``OPTIMIZE ZORDER BY`` idea,
expressed as a plain deterministic column.

Everything is int64 shift/mask arithmetic (a compile-time-unrolled sum
of ``bits`` disjoint-bit terms, one whole-stage-codegen'd projection) —
no UDF, no float, and trivially replayable in any SQL engine, so the
key itself can sit under a cross-engine hash gate.

Inputs are masked to ``bits`` (values must already be quantized to the
[0, 2^bits) grid — quantization policy belongs to the caller, e.g.
cents, bucketed ids, or equi-depth bin numbers from
``operators.profile.equi_depth_histogram``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton2(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of ``a`` (even positions) and ``b``
    (odd positions) into one int64 Z-key.  2·bits must fit in 63."""
    if not (1 <= bits <= 31):
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    mask = (1 << bits) - 1
    a_m = a.cast("bigint").bitwiseAND(F.lit(mask))
    b_m = b.cast("bigint").bitwiseAND(F.lit(mask))
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(a_m, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(b_m, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def morton2_sql(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """The identical interleave as ANSI-ish SQL text (DuckDB/Spark SQL
    compatible ``>>``/``<<``/``&`` arithmetic) — the oracle twin of
    :func:`morton2`, kept next to it so the two can't drift."""
    if not (1 <= bits <= 31):
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        # fully parenthesized: &/>>/<< precedence differs across dialects
        terms.append(f"((((({a_expr}) & {mask}) >> {i}) & 1) << {2 * i})")
        terms.append(f"((((({b_expr}) & {mask}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def morton2_decode(z: int, bits: int = 16) -> tuple[int, int]:
    """Python-side inverse (tests / debugging): Z-key back to (a, b)."""
    a = b = 0
    for i in range(bits):
        a |= ((z >> (2 * i)) & 1) << i
        b |= ((z >> (2 * i + 1)) & 1) << i
    return a, b
