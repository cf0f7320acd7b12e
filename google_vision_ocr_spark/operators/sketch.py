"""Count-min sketch — mergeable heavy-hitter counting at stream scale.

The CMS (Cormode & Muthukrishnan 2005) is THE sketch for approximate
frequencies over corpora too large for an exact group-by dictionary:
``depth`` hash rows × ``width`` counters, update = +1 at one bucket per
row, estimate = min over rows (always an overestimate, biased by
collisions only).  Distributed shape — and why it scales to 100 TB:

- **Build** is one map-side-combinable groupBy over (row, bucket): the
  sketch has exactly depth·width counters regardless of corpus size, so
  the shuffle reduces to a fixed-size table.  Per-executor partial
  sketches merge by plain counter addition — the same property that
  lets per-day / per-segment sketches roll up without rescanning.
- **Estimate** broadcasts the finished sketch (a few KB) against any
  candidate key set; no corpus access at query time.

Hashes are md5-derived (first 8 hex digits as an integer, one seed
prefix per row) — deterministic, seed-stable, and replayable in ANSI
SQL, so unlike xxhash64-based sketches the whole operator sits under
the DuckDB hash gate.  Reference scope: the OCR reference app has no
sketches; this extends the engine for web-scale corpus statistics
(SURVEY §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_hash(col: Column, row: Column | int, width: int) -> Column:
    """Row-seeded bucket: int(md5(row || ':' || x)[:8], 16) % width."""
    row_s = (
        F.lit(str(row)) if isinstance(row, int) else row.cast("string")
    )
    payload = F.concat(row_s, F.lit(":"), col.cast("string"))
    return (
        F.conv(F.substring(F.md5(payload.cast("binary")), 1, 8), 16, 10)
        .cast("bigint")
        % width
    )


def cms_hash_sql(expr: str, row_expr: str, width: int) -> str:
    """DuckDB twin of :func:`cms_hash` (md5 of the same UTF-8 bytes,
    same 8-hex-digit fold)."""
    payload = f"CAST({row_expr} AS VARCHAR) || ':' || CAST({expr} AS VARCHAR)"
    return (
        f"(list_reduce(list_transform(generate_series(1, 8), "
        f"i -> strpos('0123456789abcdef', "
        f"substr(md5({payload}), i, 1)) - 1), "
        f"(a, b) -> a * 16 + b) % {width})"
    )


def count_min_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch: ``(row, bucket, cnt)`` with depth·width rows.

    One generate (depth× row fan-out, scan-side) + one fixed-size
    hash aggregation; partial aggregation makes each executor emit at
    most depth·width partial counters regardless of input size."""
    rows = df.select(
        F.col(key_col).alias("__k"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    return (
        rows.select("row", cms_hash(F.col("__k"), F.col("row"), width).alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Estimate each key's frequency: min over rows of its counter.

    The sketch (depth·width rows) broadcasts; missing counters read as
    0 (a key whose bucket was never touched has estimate 0)."""
    probes = keys.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    ).select(
        key_col,
        "row",
        cms_hash(F.col(key_col), F.col("row"), width).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("cms_est")
        )
    )
