"""Capture .explain("formatted") for every headline query into
plans/r07/<query>_<tag>.txt.

Usage: python scripts/capture_plans.py <tag> [sf_dir]
(tag = "before" / "after"; judge-checkable artifact, OPTIMIZATION_r07.md)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from google_vision_ocr_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "extract_documents_flagship",
    "a1_group_concat_framed",
    "j1_equi_join",
    "w1_gaps_islands",
    "o2_topk_per_lang",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_bruteforce_cosine",
    "events_hourly",
    "text_token_counts",
    "tpch_q1_pricing_summary",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="capture-plans", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    from google_vision_ocr_spark import cache

    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(txt)
        cache.release_all()
        print(f"wrote {name}_{tag}.txt ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
