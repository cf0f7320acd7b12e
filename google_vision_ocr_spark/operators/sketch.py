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


def count_min_merge(sketches: list[DataFrame]) -> DataFrame:
    """Merge per-segment sketches by counter addition — the property
    that lets per-day / per-shard sketches roll up without rescanning
    any corpus segment.  Gate-proven equal to a full rebuild
    (cms_segment_merge shares the full build's oracle)."""
    out = None
    for seg in sketches:
        out = seg if out is None else out.unionByName(seg)
    return (
        out.groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def distinct_linear_counting(
    df: DataFrame, key_col: str, m: int = 4096
) -> DataFrame:
    """Linear-counting distinct estimation (Whang et al. 1990): hash
    each key into an ``m``-bit bitmap, count occupied buckets V, and
    estimate ``n ≈ -m·ln((m-V)/m)``.

    The scale story: the bitmap is a FIXED m/64-word table folded with
    a map-side-combinable bit_or — the corpus reduces to 64·m bits on
    the wire regardless of row count, and per-segment bitmaps OR
    together (mergeable like the CMS).  Spark's approx_count_distinct
    (HLL) is the production default; this variant exists because every
    step — the md5 bucket, the occupancy count, the estimate — is
    ANSI-SQL-replayable, so the sketch sits under the DuckDB hash gate
    where an opaque HLL register blob cannot.  Output: one row
    ``(n_buckets, occupied, estimate_e4)`` with the estimate in exact
    1e-4 units (single ln+round expression, identical both engines)."""
    pos = (
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string").cast("binary")), 1, 8),
            16,
            10,
        ).cast("bigint")
        % m
    )
    words = (
        df.select(pos.alias("__pos"))
        .select(
            (F.col("__pos") / 64).cast("bigint").alias("__w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(__pos, 64) AS INT))"
            ).alias("__bit"),
        )
        .groupBy("__w")
        .agg(F.expr("bit_or(__bit)").alias("__word"))
    )
    occ = words.agg(
        # empty input: sum over no rows is NULL — occupancy is 0
        F.coalesce(
            F.sum(F.expr("bit_count(__word)")), F.lit(0)
        )
        .cast("bigint")
        .alias("occupied")
    )
    return occ.select(
        F.lit(m).cast("bigint").alias("n_buckets"),
        "occupied",
        # saturation (V == m): the estimator diverges (ln 0) — NULL
        # sentinel, guarded BEFORE the ln so neither engine errors
        F.expr(
            f"CASE WHEN occupied >= {m} THEN NULL ELSE"
            f" CAST(round(-{m}.0D * ln(CAST({m} - occupied AS DOUBLE)"
            f" / {m}.0D) * 10000.0) AS BIGINT) END"
        ).alias("estimate_e4"),
    )
