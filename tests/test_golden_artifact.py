"""Parity with the reference's ONE real golden artifact.

``/root/reference/result/MergedTest.pdf.txt`` is the actual output of
the reference's ``process_pdf`` (``ocr_service.py:96-127``) on a real
scanned PDF.  These tests reconstruct it byte-for-byte through this
engine: parse its framed pages, feed them through the full distributed
pipeline (SPDF payload → rasterize → grayscale → PNG → recognize →
ordered framed concat → txt sink) and require the emitted bytes to
equal the artifact.

The artifact on disk carries CRLF newlines (the original script ran on
Windows; text-mode ``'w'`` translates ``\\n``) — the canonical bytes
the reference code produced use ``\\n``, so the comparison normalizes
the artifact's CRLF once, never our output.
"""

import re

import pytest

from google_vision_ocr_spark import formats, oracle

GOLDEN = "/root/reference/result/MergedTest.pdf.txt"
FRAME_RE = re.compile(r"\n--- Page (\d+) ---\n(.*?)\n\n(?=\n--- Page \d+ ---\n|\Z)", re.DOTALL)


@pytest.fixture(scope="module")
def golden():
    raw = open(GOLDEN, "rb").read()
    content = raw.decode("utf-8").replace("\r\n", "\n")
    pages = [(int(n), t) for n, t in FRAME_RE.findall(content)]
    assert [n for n, _ in pages] == [1, 2, 3, 4]
    return content, pages


def test_framing_reconstructs_golden(golden):
    content, pages = golden
    rebuilt = "".join(oracle.frame_page(n, t) for n, t in pages)
    assert rebuilt.encode("utf-8") == content.encode("utf-8")


def test_oracle_pipeline_reproduces_golden(golden):
    content, pages = golden
    payload = formats.encode_spdf([t for _, t in pages])
    res = oracle.extract_pdf_text("MergedTest.pdf", payload)
    assert res.text.encode("utf-8") == content.encode("utf-8")
    assert res.n_pages == 4 and res.n_errors == 0


def test_spark_pipeline_reproduces_golden(spark, golden, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from google_vision_ocr_spark.plans.fused import extract_fused
    from google_vision_ocr_spark.sources.txt_sink import write_txt_per_document

    content, pages = golden
    payload = formats.encode_spdf([t for _, t in pages])
    t = pa.table({
        "url": pa.array(["warc://golden/MergedTest.pdf"]),
        "warc_ts": pa.array([None], pa.timestamp("us", tz="UTC")),
        "html": pa.array([payload], pa.binary()),
        "text": pa.array([None], pa.string()),
        "lang": pa.array(["kn"]),
    })
    src = str(tmp_path / "golden.parquet")
    pq.write_table(t, src)
    out = extract_fused(spark.read.parquet(src))
    write_txt_per_document(out, str(tmp_path / "txt"))
    written = open(tmp_path / "txt" / "MergedTest.pdf.txt", "rb").read()
    assert written == content.encode("utf-8")
