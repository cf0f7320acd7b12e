"""Unit coverage for duplicate_token_windows (substring-level dedup)."""

from google_vision_ocr_spark.operators.dedup import duplicate_token_windows


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_shared_run_yields_aligned_windows(spark):
    shared = _words("s", 22)  # 22 shared tokens -> 3 windows at w=20
    docs = _docs(
        spark,
        [
            (1, _words("a", 5) + " " + shared),
            (2, _words("b", 9) + " " + shared),
            (3, _words("c", 30)),
        ],
    )
    out = duplicate_token_windows(docs, window=20).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc  # unique doc never flagged
    # doc 1: shared starts at token 5 -> interior windows at 5,6,7
    assert sorted(r.pos for r in by_doc[1]) == [5, 6, 7]
    assert sorted(r.pos for r in by_doc[2]) == [9, 10, 11]
    # the aligned windows carry the same key and a doc count of 2
    keys1 = {r.pos - 5: r.win_key for r in by_doc[1]}
    keys2 = {r.pos - 9: r.win_key for r in by_doc[2]}
    assert keys1 == keys2
    assert all(r.n_docs == 2 for r in out)


def test_short_docs_and_subwindow_repeats_are_invisible(spark):
    short_shared = _words("s", 10)  # repeated, but below the 20-token grain
    docs = _docs(
        spark,
        [
            (1, _words("a", 15) + " " + short_shared),
            (2, _words("b", 15) + " " + short_shared),
            (3, "tiny doc"),
        ],
    )
    assert duplicate_token_windows(docs, window=20).count() == 0


def test_duplicate_within_single_doc_not_flagged(spark):
    # n_docs counts DISTINCT documents: an internal repeat is repetition
    # (quality_rules territory), not cross-document duplication
    run = _words("r", 20)
    docs = _docs(spark, [(1, run + " " + run), (2, _words("z", 40))])
    assert duplicate_token_windows(docs, window=20).count() == 0
