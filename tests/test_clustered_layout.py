"""write_clustered must produce files whose parquet min/max statistics
actually prune: disjoint key ranges across files, monotone row groups
inside each."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from google_vision_ocr_spark.functions.zorder import morton2
from google_vision_ocr_spark.sources.catalog import write_clustered


def _file_ranges(path, col):
    ranges = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            los.append(st.min)
            his.append(st.max)
        ranges.append((min(los), max(his), los, his))
    return ranges


def test_clustered_files_own_disjoint_ranges(spark, tmp_path):
    df = spark.range(10000).selectExpr(
        "id", "CAST(pmod(id * 2654435761, 10000) AS BIGINT) AS k"
    )
    out = str(tmp_path / "clustered")
    write_clustered(df, out, ["k"], n_files=4)
    ranges = _file_ranges(out, "k")
    assert len(ranges) >= 3  # range partitioner may merge tiny ends
    spans = sorted((lo, hi) for lo, hi, _, _ in ranges)
    for (alo, ahi), (blo, bhi) in zip(spans, spans[1:]):
        assert ahi <= blo  # disjoint: a point predicate hits ONE file
    # a selective filter reads back exactly the right rows
    got = spark.read.parquet(out).filter(F.col("k") < 100).count()
    want = df.filter(F.col("k") < 100).count()
    assert got == want


def test_zkey_clustering_bounds_both_dimensions(spark, tmp_path):
    df = spark.range(4096).selectExpr(
        "CAST(id % 64 AS BIGINT) AS x", "CAST(id div 64 AS BIGINT) AS y"
    ).withColumn("z", morton2(F.col("x"), F.col("y"), bits=6))
    out = str(tmp_path / "zclustered")
    write_clustered(df, out, ["z"], n_files=4)
    # each file's z-range maps to a bounded box: check x/y min-max
    # stats per file are narrower than the full domain for most files
    xr = _file_ranges(out, "x")
    yr = _file_ranges(out, "y")
    narrow_x = sum(1 for lo, hi, _, _ in xr if hi - lo < 63)
    narrow_y = sum(1 for lo, hi, _, _ in yr if hi - lo < 63)
    # z-order guarantees at least one dimension is bounded per z-range
    assert narrow_x + narrow_y >= len(xr)
