"""Build a measurement-only scaled clone of the bench tables under /tmp.

The sandbox ships sf0.001/0.01/0.1 but the driver MEASURES at a larger,
driver-generated sf (r6: sf1.0).  This script replicates sf0.1 N times
(default 10) into ``/tmp/sfclone1.0`` so optimizations can be timed at
the driver's scale.  It is NOT driver data and is never read by any
declared query or test — timing only.

Replication details (so per-query cost structure stays representative):
- ``documents``: doc_id offset per replica; every TOKEN gets a
  per-replica suffix (``regexp_replace '(\\S+)' -> '$1⦂<r>'``), so
  3-shingles of different replicas are DISJOINT — minhash/LSH pair
  counts stay sparse (real sf1.0 had ~2.7k pairs from 50k docs; naive
  text replication would quadratically fabricate ~100x pairs).
  Token count per doc is unchanged; token bytes grow by ~2-3 chars.
- ``events``: user_id/event_id offset per replica (windows and
  sessionization stay per-user sized).
- ``orders``/``customer``/``lineitem``: key offsets kept consistent
  (custkey, orderkey) so joins have the same fan-in per key.
- ``embeddings``: vec_id offset; vectors unchanged.

Usage: python scripts/make_scale_clone.py [N] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from google_vision_ocr_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfclone1.0"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="make_scale_clone", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    def reps(df, exprs_fn):
        parts = [df.select(*exprs_fn(r)) for r in range(n)]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n_docs = docs.count()
    doc_cols = docs.columns

    def doc_exprs(r):
        out_cols = []
        for c in doc_cols:
            if c == "doc_id":
                out_cols.append((F.col("doc_id") + F.lit(r * n_docs)).alias("doc_id"))
            elif c == "text":
                if r == 0:
                    out_cols.append(F.col("text"))
                else:
                    out_cols.append(
                        F.regexp_replace("text", r"(\S+)", rf"$1⦂{r}").alias("text")
                    )
            elif c == "source":
                out_cols.append(F.concat_ws("#", F.col("source"), F.lit(str(r))).alias("source"))
            else:
                out_cols.append(F.col(c))
        return out_cols

    reps(docs, doc_exprs).repartition(8).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    ev_cols = ev.columns
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    n_ev = ev.count()

    def ev_exprs(r):
        cols = []
        for c in ev_cols:
            if c == "user_id":
                cols.append((F.col("user_id") + F.lit(r * n_users)).alias("user_id"))
            elif c == "event_id":
                cols.append((F.col("event_id") + F.lit(r * n_ev)).alias("event_id"))
            else:
                cols.append(F.col(c))
        return cols

    reps(ev, ev_exprs).repartition(8).write.mode("overwrite").parquet(f"{out}/events.parquet")

    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    n_cust = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
    reps(cust, lambda r: [
        (F.col(c) + F.lit(r * n_cust)).alias(c) if c == "c_custkey" else F.col(c)
        for c in cust.columns
    ]).repartition(4).write.mode("overwrite").parquet(f"{out}/customer.parquet")

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    n_ord = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    reps(orders, lambda r: [
        (F.col(c) + F.lit(r * n_ord)).alias(c) if c == "o_orderkey"
        else (F.col(c) + F.lit(r * n_cust)).alias(c) if c == "o_custkey"
        else F.col(c)
        for c in orders.columns
    ]).repartition(8).write.mode("overwrite").parquet(f"{out}/orders.parquet")

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    reps(li, lambda r: [
        (F.col(c) + F.lit(r * n_ord)).alias(c) if c == "l_orderkey" else F.col(c)
        for c in li.columns
    ]).repartition(16).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    n_emb = emb.count()
    reps(emb, lambda r: [
        (F.col(c) + F.lit(r * n_emb)).alias(c) if c == "vec_id" else F.col(c)
        for c in emb.columns
    ]).repartition(8).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    for small in ("nation", "region", "part", "supplier"):
        spark.read.parquet(f"{SRC}/{small}.parquet").write.mode("overwrite").parquet(
            f"{out}/{small}.parquet"
        )

    print("done:", out, "replicas:", n)
    spark.stop()


if __name__ == "__main__":
    main()
