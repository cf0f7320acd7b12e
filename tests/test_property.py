"""Property-based tests (SURVEY.md §5.6) on the pure-Python core —
arbitrary unicode must survive every codec and the framing contract."""

from hypothesis import given, settings
from hypothesis import strategies as st

from google_vision_ocr_spark import formats, oracle

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # no lone surrogates
    max_size=400,
)


@settings(max_examples=60, deadline=None)
@given(st.lists(text_strategy, min_size=0, max_size=6))
def test_spdf_roundtrip_any_unicode(texts):
    assert formats.decode_spdf(formats.encode_spdf(texts)) == texts


@settings(max_examples=60, deadline=None)
@given(text_strategy)
def test_full_page_chain_roundtrip(text):
    """rasterize → grayscale → PNG → decode → read == identity."""
    gray = formats.rgb_to_gray(formats.render_page_rgb(text))
    ct, decoded = formats.decode_png(formats.encode_png(gray))
    assert ct == 0
    assert formats.read_text_from_gray(decoded) == text


@settings(max_examples=40, deadline=None)
@given(st.lists(text_strategy, min_size=1, max_size=5))
def test_oracle_spans_partition_text_exactly(texts):
    res = oracle.extract_pdf_text("u", formats.encode_spdf(texts))
    raw = res.text.encode("utf-8")
    assert res.spans[0].start == 0 and res.spans[-1].end == len(raw)
    for a, b in zip(res.spans, res.spans[1:]):
        assert a.end == b.start  # contiguous, gap-free
    for span, t in zip(res.spans, texts):
        assert raw[span.start:span.end].decode("utf-8") == oracle.frame_page(span.page, t)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 30), st.booleans()), min_size=1, max_size=20,
                unique_by=lambda x: x[0]))
def test_islands_cover_all_pages_once(pages):
    items = [
        {"page": p, "kind": "image" if is_img else "text",
         "id": f"x{p}", "text": None if is_img else f"t{p}"}
        for p, is_img in pages
    ]
    chapters = oracle.chapter_islands(items)
    assert sum(c["n_pages"] for c in chapters) == len(items)
    firsts = [c["first_page"] for c in chapters]
    assert firsts == sorted(firsts)
    n_images = sum(1 for _, i in pages if i)
    assert sum(1 for c in chapters if c["kind"] == "image") == n_images


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                    min_size=1, max_size=60),
            st.binary(min_size=0, max_size=500),
        ),
        min_size=0, max_size=5,
    ),
    st.booleans(),
)
def test_warc_roundtrip_any_bytes(pairs, gzipped):
    """Arbitrary binary bodies (incl. bytes that look like CRLF record
    separators or WARC magic) survive the WARC codec — Content-Length
    framing, not sentinel scanning."""
    from datetime import datetime, timezone

    from google_vision_ocr_spark.sources import warc

    ts = datetime(2020, 1, 2, 3, 4, 5, tzinfo=timezone.utc)
    recs = [{"url": f"https://x.test/{i}/{u}", "ts": ts, "body": b}
            for i, (u, b) in enumerate(pairs)]
    rows = warc.warc_bytes_to_rows(warc.encode_warc(recs, gzipped=gzipped))
    assert [r["html"] for r in rows] == [r["body"] for r in recs]
    assert [r["url"] for r in rows] == [r["url"] for r in recs]
