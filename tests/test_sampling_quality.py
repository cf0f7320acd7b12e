"""Deterministic splitting + Gopher repetition rules."""

import hashlib

from pyspark.sql import functions as F


def test_deterministic_split_matches_reference_md5(spark):
    from google_vision_ocr_spark.operators.sampling import deterministic_split

    df = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    got = {r["doc_id"]: (r["bucket"], r["split"]) for r in deterministic_split(df).collect()}
    for i in range(200):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
        split = "train" if b < 80 else ("val" if b < 90 else "test")
        assert got[i] == (b, split), i


def test_split_is_partitioning_invariant(spark):
    from google_vision_ocr_spark.operators.sampling import deterministic_split

    df = spark.createDataFrame([(i,) for i in range(500)], ["doc_id"])
    a = {r["doc_id"]: r["split"] for r in deterministic_split(df.repartition(1)).collect()}
    b = {r["doc_id"]: r["split"] for r in deterministic_split(df.repartition(13)).collect()}
    assert a == b
    # proportions roughly match the 80/10/10 spec
    n = len(a)
    train = sum(1 for v in a.values() if v == "train")
    assert 0.7 < train / n < 0.9


def test_stratified_fraction_deterministic_and_per_stratum(spark):
    from google_vision_ocr_spark.operators.sampling import stratified_fraction

    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    s1 = {r["doc_id"] for r in stratified_fraction(df, pct=10).collect()}
    s2 = {r["doc_id"] for r in stratified_fraction(df.repartition(7), pct=10).collect()}
    assert s1 == s2 and 0.04 < len(s1) / 1000 < 0.2
    # both strata represented
    langs = {("en" if i % 2 == 0 else "de") for i in s1}
    assert langs == {"en", "de"}


def test_repetition_metrics_known_values(spark):
    from google_vision_ocr_spark.operators.quality_rules import repetition_metrics

    rows = [
        (1, "a\nb\nc"),          # no dups
        (2, "a\na\nb"),          # 'a' twice: dup_line_frac=1/3, chars 2/3
        (3, "xx\nxx\nxx"),       # all dup
        (4, ""),                 # empty
        (5, "one\n\n\ntwo"),     # empty lines ignored
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    assert got[1]["n_lines"] == 3 and got[1]["dup_line_frac"] == 0.0
    assert abs(got[2]["dup_line_frac"] - 1 / 3) < 1e-9
    assert abs(got[2]["dup_line_char_frac"] - 2 / 3) < 1e-9
    assert got[3]["dup_line_frac"] == 1 - 1 / 3 and got[3]["dup_line_char_frac"] == 1.0
    assert got[4]["n_lines"] == 0 and got[4]["dup_line_frac"] == 0.0
    assert got[5]["n_lines"] == 2 and got[5]["dup_line_frac"] == 0.0


def test_repetition_gate_drops_repetitive_docs(spark):
    from google_vision_ocr_spark.operators.quality_rules import repetition_gate

    rows = [(1, "fresh\ncontent\nlines"), (2, "spam\nspam\nspam\nspam")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = [r["doc_id"] for r in repetition_gate(df).collect()]
    assert kept == [1]


def test_repetition_metrics_plan_is_shuffle_free(spark):
    from google_vision_ocr_spark.operators.quality_rules import repetition_metrics

    df = spark.createDataFrame([(1, "a\nb")], ["doc_id", "text"])
    plan = repetition_metrics(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_redact_pii_known_strings(spark):
    from google_vision_ocr_spark.functions.redact import clean_whitespace, redact_pii

    rows = [
        (1, "mail a.b+c@ex-ample.org now"),
        (2, "server at 192.168.0.1 port"),
        (3, "card 1234567890123456 ok"),
        (4, "short 12345 stays"),
        (5, "mixed bob@x.io 10.0.0.7 987654321 tail"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    from pyspark.sql import functions as F
    got = {r["id"]: r["out"] for r in df.select("id", redact_pii(F.col("t")).alias("out")).collect()}
    assert got[1] == "mail <EMAIL> now"
    assert got[2] == "server at <IP> port"
    assert got[3] == "card <NUM> ok"
    assert got[4] == "short 12345 stays"
    assert got[5] == "mixed <EMAIL> <IP> <NUM> tail"
    ws = df.filter(F.col("id") == 1).select(
        clean_whitespace(F.lit("  a \t b\n\nc ")).alias("w")).first()["w"]
    assert ws == "a b c"


def test_decontamination_drops_overlapping_docs(spark):
    from google_vision_ocr_spark.operators.decontaminate import (
        contaminated_ids,
        drop_contaminated,
    )

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "one two three four five six seven eight nine ten"),
            (3, "totally different words with no overlap at all here now"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon zeta eta theta",)], ["text"]
    )
    bad = {r["doc_id"] for r in contaminated_ids(corpus, bench, k=8).collect()}
    assert bad == {1}
    kept = {r["doc_id"] for r in drop_contaminated(corpus, bench, k=8).collect()}
    assert kept == {2, 3}


def test_decontamination_benchmark_side_broadcasts(spark):
    from google_vision_ocr_spark.operators.decontaminate import contaminated_ids

    corpus = spark.createDataFrame([(1, "a b c d e f g h i")], ["doc_id", "text"])
    bench = spark.createDataFrame([("a b c d e f g h",)], ["text"])
    plan = contaminated_ids(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_canonicalize_url_rules(spark):
    from pyspark.sql import functions as F

    from google_vision_ocr_spark.functions.urls import (
        canonicalize_url,
        registrable_domain,
        url_host,
    )

    cases = [
        ("HTTP://Example.COM:80/A/b?x=1", "http://example.com/A/b?x=1"),
        ("https://WWW.Site.Org:443/p", "https://site.org/p"),
        ("https://a.b.c/p?utm_source=x&utm_medium=y&q=2#frag", "https://a.b.c/p?q=2"),
        ("https://x.io/p?gclid=abc", "https://x.io/p"),
        ("https://x.io/p?fbclid=1&keep=2", "https://x.io/p?keep=2"),
        ("http://host:8080/p", "http://host:8080/p"),  # non-default port kept
        ("https://x.io/CaseSensitive/Path", "https://x.io/CaseSensitive/Path"),
    ]
    df = spark.createDataFrame(cases, ["raw", "want"])
    rows = df.select("raw", "want", canonicalize_url(F.col("raw")).alias("got")).collect()
    for r in rows:
        assert r["got"] == r["want"], (r["raw"], r["got"], r["want"])
    hp = df.select(
        url_host(canonicalize_url(F.col("raw"))).alias("h"),
        registrable_domain(F.col("raw")).alias("d"),
    ).collect()
    assert hp[0]["h"] == "example.com" and hp[0]["d"] == "example.com"
    assert hp[2]["h"] == "a.b.c" and hp[2]["d"] == "b.c"


def test_registrable_domain_with_public_suffix_list(spark):
    """The PSL path must pick the LONGEST matching suffix (co.uk beats
    uk) and fall back to the last-two-labels heuristic for hosts no
    suffix matches."""
    from google_vision_ocr_spark.functions.urls import with_registrable_domain

    psl = spark.createDataFrame(
        [("com",), ("org",), ("uk",), ("co.uk",), ("ac.uk",), ("gov.uk",),
         ("io",), ("jp",), ("co.jp",), ("net",)],
        ["suffix"],
    )
    rows = [
        (1, "https://news.bbc.co.uk/politics"),     # multi-label suffix
        (2, "https://www2.example.com/x"),
        (3, "https://a.b.cam.ac.uk/"),
        (4, "https://direct.gov.uk/"),              # host == label + suffix
        (5, "https://weird.host.zz/"),              # no PSL match -> heuristic
        (6, "https://shop.co.jp/"),                 # domain is exactly 1+suffix
    ]
    df = spark.createDataFrame(rows, ["id", "url"])
    got = {r["id"]: r["domain"]
           for r in with_registrable_domain(df, "url", psl=psl).collect()}
    assert got[1] == "bbc.co.uk"
    assert got[2] == "example.com"
    assert got[3] == "cam.ac.uk"
    assert got[4] == "direct.gov.uk"
    assert got[5] == "host.zz"
    assert got[6] == "shop.co.jp"
    # no-PSL call keeps the documented heuristic
    got2 = {r["id"]: r["domain"]
            for r in with_registrable_domain(df, "url").collect()}
    assert got2[1] == "co.uk"  # heuristic is wrong here, by design


def test_unigram_scores_rank_in_vs_out_of_distribution(spark):
    from google_vision_ocr_spark.operators.scoring import unigram_logprob_scores

    common = "the quick brown fox jumps over the lazy dog " * 5
    rows = [(i, common) for i in range(1, 9)] + [
        (9, "zzyzx qwerty asdfgh zxcvbn plmokn ijnuhb ygvtfc")  # all-OOV-ish
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["avg_neg_logprob"]
           for r in unigram_logprob_scores(df, vocab_size=8).collect()}
    # the out-of-distribution doc must score strictly worse (higher)
    assert got[9] > max(got[i] for i in range(1, 9))


def test_pack_shards_budget_and_order(spark):
    from google_vision_ocr_spark.operators.packing import pack_shards, shard_manifest

    rows = [(i, "en", 600) for i in range(10)] + [(i, "de", 900) for i in range(10, 16)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "ws_tokens"])
    packed = pack_shards(df, budget=2000).collect()
    by_id = {r["doc_id"]: r["shard_id"] for r in packed}
    # en: 600-token docs, budget 2000 -> runs start at 0,600,...; shard changes
    # when the running start crosses each 2000 boundary
    assert [by_id[i] for i in range(10)] == [0, 0, 0, 0, 1, 1, 1, 2, 2, 2]
    # shards never exceed budget by more than one document
    man = shard_manifest(df, budget=2000).collect()
    for r in man:
        assert r["sum_tokens"] < 2000 + 900 + 1
    # ids within a shard are contiguous
    for r in man:
        assert r["last_id"] - r["first_id"] + 1 == r["n_docs"]


def test_pack_shards_prefix_sum_across_spark_partitions(spark):
    """The two-pass prefix sum must agree with the sequential cumsum
    even when a single partition KEY straddles many Spark partitions
    (the 100 TB case: one language is half the corpus)."""
    from google_vision_ocr_spark.operators.packing import pack_shards

    rows = [(i, "en", 100 + (i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "ws_tokens"])
    got = {r["doc_id"]: r["shard_id"]
           for r in pack_shards(df, budget=500, num_partitions=16).collect()}
    run = 0
    for i in range(200):
        tok = 100 + (i % 7)
        assert got[i] == run // 500, i
        run += tok


def test_sketch_aggregates_within_error_bounds(spark):
    """Sketches (HLL approx-distinct, approx percentile) are the
    100 TB substitutes for their exact twins; pin their error against
    the exact answers on the events table."""
    from pyspark.sql import functions as F

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    exact = e.agg(
        F.count_distinct("user_id").alias("d"),
        F.expr("percentile(value, 0.5)").alias("p50"),
    ).collect()[0]
    approx = e.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("d"),
        F.percentile_approx("value", 0.5, 10000).alias("p50"),
    ).collect()[0]
    assert abs(approx["d"] - exact["d"]) <= max(2, 0.05 * exact["d"])
    # value spans ~0-100; 10k-accuracy approx median lands within 1%
    assert abs(approx["p50"] - exact["p50"]) <= 0.01 * 100


def test_blocklist_filter_with_psl(spark):
    from google_vision_ocr_spark.functions.urls import filter_blocklisted_domains

    docs = spark.createDataFrame(
        [
            (0, "https://news.bbc.co.uk/story"),   # domain bbc.co.uk (PSL)
            (1, "https://spam.bbc.co.uk/x"),       # same domain -> dropped too
            (2, "https://www.example.com/a"),
            (3, "https://ads.example.com/b"),      # example.com blocklisted
        ],
        "doc_id bigint, url string",
    )
    psl = spark.createDataFrame([("com",), ("co.uk",), ("uk",)], "suffix string")
    block = spark.createDataFrame([("bbc.co.uk",), ("EXAMPLE.com",)], "domain string")
    out = filter_blocklisted_domains(docs, block, psl=psl)
    assert {r.doc_id for r in out.collect()} == set()
    # without bbc.co.uk in the blocklist, both bbc hosts survive as one domain
    block2 = spark.createDataFrame([("example.com",)], "domain string")
    out2 = {r.doc_id: r.domain for r in
            filter_blocklisted_domains(docs, block2, psl=psl).collect()}
    assert out2 == {0: "bbc.co.uk", 1: "bbc.co.uk"}


def test_blocklist_filter_heuristic_path(spark):
    from google_vision_ocr_spark.functions.urls import filter_blocklisted_domains

    docs = spark.createDataFrame(
        [(0, "https://a.good.org/x"), (1, "https://b.bad.net/y")],
        "doc_id bigint, url string",
    )
    block = spark.createDataFrame([("bad.net",)], "domain string")
    out = filter_blocklisted_domains(docs, block)
    assert [r.doc_id for r in out.collect()] == [0]


def test_quality_python_matches_duckdb_on_unicode_adversaries():
    """The Python quality_score and the DuckDB oracle fragment must
    agree on Unicode-adversarial text: NBSP / ideographic space
    (Python \\S is pinned to re.ASCII because RE2's is), superscript
    digits and CJK (the \\pL\\pN alnum mirror), decomposed accents,
    and plain controls."""
    import duckdb

    import __spark_entry__ as entry_mod
    from google_vision_ocr_spark.functions.text import quality_score

    texts = [
        "plain ascii with the stopwords and a dog",
        "nbsp separated words here and there",
        "ideographic　space　split and the rest",
        "superscript x² plus ⅔ fraction and it",
        "cjk 中文文本 mixed with the english words",
        "decomposed café and the accent",
        "ctrl\x01chars\x02embedded and the rest",
        # vertical tab: in Python's ASCII \s and Java's \s but NOT in
        # RE2's — the exact class the explicit [ \t\n\f\r] pin closes
        "vertical\x0btab\x0bjoined and the rest",
        "form\x0cfeed split and the rest",
        "   ",
        "!!! ??? ...",
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(texts)))
        + ") t(doc_id, text)",
        texts,
    )
    sql = f"""
        WITH feat AS (
            SELECT doc_id, {entry_mod._quality_feature_sql('text')}
            FROM d
        ), f2 AS (
            SELECT doc_id, n_chars, punct, non_space, alnum,
            {entry_mod._TOKEN_STATS_SQL}
            FROM feat
        )
        SELECT doc_id, {entry_mod._QUALITY_CASE_SQL} AS quality
        FROM f2 ORDER BY doc_id
    """
    got = dict(con.execute(sql).fetchall())
    for i, t in enumerate(texts):
        assert got[i] == quality_score(t), (i, t, got[i], quality_score(t))


def test_ngram_repetition_metrics_known_values(spark):
    from google_vision_ocr_spark.operators.quality_rules import (
        ngram_repetition_metrics,
    )

    rows = [
        (1, "a b a b c"),          # "a b" twice -> top2 = 2*3 = 6
        (2, "p q r p q r p q r"),  # dup 5-grams: two grams x2 x 9 chars
        (3, "aaa b cc d"),         # all 2-gram counts tie -> max chars wins
        (4, "hello"),              # below every n
        (5, ""),                   # empty
        (6, "A  B\ta B"),          # lowercased + ws-collapsed: "a b a b"
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in ngram_repetition_metrics(df).collect()}
    r1 = got[1]
    assert r1["stream_chars"] == 9
    assert r1["top2_gram_chars"] == 6      # "a b" cnt=2, chars=2*3
    assert r1["top3_gram_chars"] == 5      # all cnt=1, len("a b a")=5
    assert r1["top4_gram_chars"] == 7
    assert r1["dup5_gram_chars"] == 0 and r1["dup6_gram_chars"] == 0
    r2 = got[2]
    assert r2["stream_chars"] == 17
    # 5-grams at i=1..5: "p q r p q"(x2), "q r p q r"(x2), "r p q r p"
    assert r2["dup5_gram_chars"] == 2 * 9 + 2 * 9
    assert r2["dup6_gram_chars"] == 2 * 11  # "p q r p q r" at i=1 and i=4
    r3 = got[3]
    assert r3["top2_gram_chars"] == 5      # tie on cnt=1 -> "aaa b" (5 chars)
    assert got[4]["stream_chars"] == 5
    assert got[4]["top2_gram_chars"] == 0 and got[4]["dup6_gram_chars"] == 0
    assert got[5]["stream_chars"] == 0
    # tokenizing lowers and splits on the RE2 ASCII class
    assert got[6]["stream_chars"] == 7 and got[6]["top2_gram_chars"] == 6


def test_ngram_repetition_metrics_keeps_every_doc(spark):
    from google_vision_ocr_spark.operators.quality_rules import (
        ngram_repetition_metrics,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["", "one", "two words", "a b c d e f g"])],
        ["doc_id", "text"],
    )
    out = ngram_repetition_metrics(df)
    assert out.count() == 4
    assert out.filter("top2_gram_chars IS NULL OR dup5_gram_chars IS NULL").count() == 0


def test_c4_line_stats_known_values(spark):
    from google_vision_ocr_spark.operators.c4_filters import c4_line_stats

    rows = [
        (1, "one two three four five.\nshort line.\nno terminal punct here"
            "\nthis javascript line ends fine.\nsix seven eight nine ten!"),
        (2, "a b c d e?\nf g h i j\"\nk l m n o."),   # 3 kept -> page kept
        (3, "a b c d e.\nf g h i j."),                 # 2 kept -> page dropped
        (4, ""),                                       # empty
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in c4_line_stats(df).collect()}
    r1 = got[1]
    assert (r1["n_lines"], r1["n_kept"], r1["n_short"], r1["n_nopunct"],
            r1["n_js"]) == (5, 2, 1, 1, 1)
    assert r1["page_keep"] == 0 and r1["kept_text"] == ""
    r2 = got[2]
    assert r2["n_kept"] == 3 and r2["page_keep"] == 1
    assert r2["kept_text"] == 'a b c d e?\nf g h i j"\nk l m n o.'
    assert got[3]["page_keep"] == 0
    assert got[4]["n_lines"] == 0 and got[4]["page_keep"] == 0


def test_c4_page_rules_brace_and_lorem(spark):
    from google_vision_ocr_spark.operators.c4_filters import (
        c4_filter,
        c4_line_stats,
    )

    kept3 = "a b c d e.\nf g h i j.\nk l m n o."
    rows = [
        (1, kept3),
        (2, kept3 + "\nvar x = { nope }."),    # brace -> drop
        (3, kept3 + "\nlorem ipsum filler."),  # boilerplate -> drop
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["page_keep"] for r in c4_line_stats(df).collect()}
    assert got == {1: 1, 2: 0, 3: 0}
    out = c4_filter(df)
    assert [tuple(r) for r in out.collect()] == [(1, kept3)]
    assert out.columns == ["doc_id", "text"]


def test_c4_line_stats_is_zero_shuffle(spark):
    from google_vision_ocr_spark.operators.c4_filters import c4_line_stats

    df = spark.createDataFrame([(1, "a b c d e.")], ["doc_id", "text"])
    plan = c4_line_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
