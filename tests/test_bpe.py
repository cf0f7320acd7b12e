"""BPE training (operators/bpe.py): hand-checkable merges, overlap
semantics, the descending-sequence guard, and scan-side encoding."""

import pytest
from pyspark.sql import functions as F

from google_vision_ocr_spark.operators.bpe import (
    PUA_BASE,
    bpe_encode,
    bpe_train,
    bpe_train_merges,
    word_frequencies,
)


@pytest.fixture(scope="module")
def docs(spark):
    # 'ab' bigram weight: 3 ('abab' twice -> 2 each? no: abab has ab,ba,ab)
    return spark.createDataFrame(
        [(0, "abab abab cd"), (1, "abc cd cd")],
        "doc_id bigint, text string",
    )


def test_hand_merges(spark, docs):
    wf = word_frequencies(docs)
    freqs = {r.word: r.freq for r in wf.collect()}
    assert freqs == {"abab": 2, "abc": 1, "cd": 3}
    merges, final = bpe_train(wf, 2)
    # pair weights round 1: ab = 2*2 (abab) + 1 (abc) = 5; ba = 2; bc = 1; cd = 3
    assert (merges[0]["pair"], merges[0]["weight"]) == ("ab", 5)
    s1 = chr(PUA_BASE)
    # after merging 'ab'->s1: words are s1s1 (x2), s1c, cd
    # round 2 pairs: s1s1 = 2, s1c = 1, cd = 3 -> 'cd' wins
    assert (merges[1]["pair"], merges[1]["weight"]) == ("cd", 3)
    words = {r.word for r in final.collect()}
    assert words == {s1 + s1, s1 + "c", chr(PUA_BASE + 1)}


def test_overlap_is_left_to_right(spark):
    # 'aaa' counts the pair 'aa' twice but merges greedily to (aa)a
    d = spark.createDataFrame([(0, "aaa")], "doc_id bigint, text string")
    merges, final = bpe_train(word_frequencies(d), 1)
    assert merges[0]["pair"] == "aa" and merges[0]["weight"] == 2
    assert [r.word for r in final.collect()] == [chr(PUA_BASE) + "a"]


def test_single_char_words_have_no_pairs(spark):
    # the length guard: Spark's sequence(1, 0) DESCENDS; without the
    # CASE, 'a' would contribute substr(word, 0, 2) garbage pairs
    d = spark.createDataFrame([(0, "a b a")], "doc_id bigint, text string")
    merges, _ = bpe_train(word_frequencies(d), 1)
    assert merges == []


def test_tie_breaks_lexicographic(spark):
    d = spark.createDataFrame([(0, "xy qr")], "doc_id bigint, text string")
    merges, _ = bpe_train(word_frequencies(d), 1)
    assert merges[0]["pair"] == "qr"  # both weight 1; smallest pair wins


def test_encode_counts_post_merge_symbols(spark, docs):
    wf = word_frequencies(docs)
    merges, _ = bpe_train(wf, 2)  # merges: ab -> s1, cd -> s2
    out = {
        r.doc_id: r.bpe_tokens
        for r in bpe_encode(docs, merges).select("doc_id", "bpe_tokens").collect()
    }
    # doc 0: abab->2 sym, abab->2, cd->1  => 5
    # doc 1: abc->2 (s1,c), cd->1, cd->1  => 4
    assert out == {0: 5, 1: 4}


def test_encode_is_scan_side(spark, docs):
    merges, _ = bpe_train(word_frequencies(docs), 1)
    plan = (
        bpe_encode(docs, merges)
        ._sc._jvm.PythonSQLUtils.explainString(
            bpe_encode(docs, merges)._jdf.queryExecution(), "formatted"
        )
    )
    assert "Exchange" not in plan


def test_merge_table_schema(spark, docs):
    mt = bpe_train_merges(docs, 2)
    assert mt.columns == ["round", "pair", "merged", "weight"]
    rows = mt.orderBy("round").collect()
    assert [r["round"] for r in rows] == [1, 2]
    assert rows[0]["merged"] == chr(PUA_BASE)


def test_bad_n_merges(spark, docs):
    with pytest.raises(ValueError):
        bpe_train(word_frequencies(docs), 0)
