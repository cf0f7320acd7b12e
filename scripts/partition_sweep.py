"""Cross-partitioning robustness sweep: run EVERY oracled contract
query under a deliberately different parallelism/shuffle configuration
(local[3], 5 shuffle partitions — coprime to the defaults) and compare
against DuckDB.

A result that depends on partition count or task order — a float sum
folded in shuffle arrival order, a row_number without a total order, a
limit without a sort — passes the default-config gate by accident and
fails here.  Exit code 0 iff all queries match.

Usage: python scripts/partition_sweep.py [sf_dir] [master] [shuffle]
"""

from __future__ import annotations

import glob
import sys

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = (pd.to_datetime(df[c]).dt.tz_localize(None)
                     .astype("datetime64[us]"))
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    master = sys.argv[2] if len(sys.argv) > 2 else "local[3]"
    shuffle = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from google_vision_ocr_spark.session import get_spark

    spark = get_spark(app_name="partition-sweep", master=master,
                      shuffle_partitions=shuffle)
    con = duckdb.connect()
    for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        name = p.split("/")[-1].replace(".parquet", "")
        con.execute(
            f"create view {name} as select * from read_parquet('{p}')"
        )

    oracles = entry_mod.oracle_sql()
    fails = []
    for name, q in sorted(entry_mod.queries().items()):
        if name not in oracles:
            continue
        try:
            a = normalize(q(spark, sf_dir).toPandas())
            b = normalize(con.execute(oracles[name]).df())
            pd.testing.assert_frame_equal(
                a, b, check_dtype=False, check_exact=False,
                rtol=1e-5, atol=1e-8,
            )
        except Exception as ex:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"FAIL {name}: {str(ex).splitlines()[0]}", flush=True)
    print(f"checked {len(oracles)} oracled queries under {master}/"
          f"shuffle={shuffle}: {len(fails)} failures", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
