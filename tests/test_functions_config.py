"""Pure-function units: lang-id, quality, tokens, fingerprints, config."""

import os

from google_vision_ocr_spark.config import ExtractConfig
from google_vision_ocr_spark.functions.text import (
    count_tokens_bpe,
    count_tokens_ws,
    lang_id,
    quality_score,
    rolling_fingerprint,
    shingles,
)


def test_lang_id_heuristic():
    assert lang_id("the quick brown fox and the lazy dog went to the market") == "en"
    assert lang_id("der hund und die katze gingen schnell nach hause und schliefen") == "de"
    assert lang_id("el perro que corre en la casa de la playa") == "es"
    assert lang_id("这是一个中文句子") == "zh"
    assert lang_id("これは日本語の文です") == "jp"
    assert lang_id("") == "und"
    assert lang_id("xyzzy 12345 !!!") == "und"


def test_quality_score_ordering():
    good = ("The quick brown fox jumps over the lazy dog. " * 12).strip()
    junk = "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) !!!!"
    assert quality_score(good) > quality_score(junk)
    assert quality_score("") == 0.0
    assert 0.0 <= quality_score(junk) <= 1.0


def test_token_counts():
    assert count_tokens_ws("one two  three\n four") == 4
    assert count_tokens_ws("") == 0
    assert count_tokens_bpe("hello, world 1234") == 5  # hello , world 123 4
    assert count_tokens_bpe("") == 0


def test_fingerprint_deterministic_and_sensitive():
    a = rolling_fingerprint("some document text")
    assert a == rolling_fingerprint("some document text")
    assert a != rolling_fingerprint("some document text!")
    assert 0 <= a < 2**64


def test_shingles():
    s = shingles("a b c d", k=3)
    assert s == {"a b c", "b c d"}
    assert shingles("a b", k=3) == {"a b"}
    assert shingles("", k=3) == set()


def test_config_precedence(tmp_path):
    p = tmp_path / "config.json"
    p.write_text('{"recognizer": "flaky-stub", "max_retries": 7, "unknown_key": 1}')
    cfg = ExtractConfig.load(json_path=str(p))
    assert cfg.recognizer == "flaky-stub" and cfg.max_retries == 7
    os.environ["GVOS_MAX_RETRIES"] = "9"
    os.environ["GVOS_OTSU"] = "true"
    try:
        cfg = ExtractConfig.load(json_path=str(p), max_retries=11)
        assert cfg.max_retries == 11  # explicit override wins over env
        assert cfg.otsu is True       # env wins over defaults
    finally:
        del os.environ["GVOS_MAX_RETRIES"], os.environ["GVOS_OTSU"]
    kw = cfg.extract_kwargs()
    assert kw["rate_limit_qps"] is None and kw["otsu"] is True


def test_parse_illustration_pages():
    from google_vision_ocr_spark.functions.paths import parse_illustration_pages

    assert parse_illustration_pages("1,5,10") == [1, 5, 10]
    assert parse_illustration_pages(" 3 , x, 1, 3,") == [1, 3]
    assert parse_illustration_pages("") == []
    assert parse_illustration_pages(None) == []


def test_normalize_path_col(spark):
    from pyspark.sql import functions as F

    from google_vision_ocr_spark.functions.paths import normalize_path_col

    df = spark.createDataFrame(
        [("https://a//b///c/./d/",), ("/x/y/.",), ("plain",)], ["p"]
    )
    got = [r["n"] for r in df.select(normalize_path_col(F.col("p")).alias("n")).collect()]
    assert got == ["https://a/b/c/d", "/x/y", "plain"]


def test_all_modules_import_without_spark_session():
    """Every package module must import from a sessionless process —
    spark-submit --py-files imports modules on executors before any
    session exists there, and module-level pandas_udf schema parsing
    would crash it."""
    import subprocess
    import sys

    code = (
        "import importlib, pkgutil; import google_vision_ocr_spark as p; "
        "[importlib.import_module(m.name) for m in "
        "pkgutil.walk_packages(p.__path__, p.__name__ + '.')]"
    )
    subprocess.run([sys.executable, "-c", code], check=True, timeout=120)


def test_normalize_text_composes_and_cleans():
    from google_vision_ocr_spark.functions.text import normalize_text

    # decomposed e + U+0301 composes to precomposed é under NFC
    assert normalize_text("café") == "café"
    assert normalize_text(" a \x07 b\t\tc  ") == "a b c"
    assert normalize_text("") == ""
    assert normalize_text(None) == ""
    # ASCII \s only: NBSP survives (RE2 parity — see _WS_RE comment)
    assert normalize_text("a b") == "a b"
    # tab/newline/CR are whitespace, not stripped controls
    assert normalize_text("a\nb\rc") == "a b c"
