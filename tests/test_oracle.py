"""Oracle semantics: golden framing pin, routing, islands (M0).

The framing pin reproduces the exact byte pattern of the reference's
only golden artifact (``result/MergedTest.pdf.txt``, written by
``ocr_service.py:119-122``).
"""

from google_vision_ocr_spark import formats, oracle
from google_vision_ocr_spark.recognizers import RecognitionError, StubRecognizer


def test_golden_frame_format_pin():
    # ocr_service.py:120-122 writes: "\n--- Page {n} ---\n" + text + "\n\n"
    assert oracle.frame_page(1, "hello") == "\n--- Page 1 ---\nhello\n\n"
    two_pages = oracle.frame_page(1, "a") + oracle.frame_page(2, "b")
    assert two_pages == "\n--- Page 1 ---\na\n\n\n--- Page 2 ---\nb\n\n"


def test_extract_pdf_text_and_spans():
    texts = ["first page", "second pägé", "第三"]
    payload = formats.encode_spdf(texts)
    res = oracle.extract_pdf_text("u", payload)
    assert res.n_pages == 3 and res.n_errors == 0
    expected = "".join(oracle.frame_page(i + 1, t) for i, t in enumerate(texts))
    assert res.text == expected
    # spans are byte offsets into the UTF-8 encoding
    raw = res.text.encode("utf-8")
    for span, t in zip(res.spans, texts):
        assert raw[span.start : span.end].decode("utf-8") == oracle.frame_page(span.page, t)
    assert res.spans[0].start == 0 and res.spans[-1].end == len(raw)


def test_recognizer_requires_grayscale():
    rgb_png = formats.encode_png(formats.render_page_rgb("secret"))
    try:
        StubRecognizer().recognize(rgb_png)
        raise AssertionError("should reject RGB PNG")
    except RecognitionError:
        pass


def test_image_path_no_preprocess_and_format_rules():
    gray = formats.rgb_to_gray(formats.render_page_rgb("img text"))
    # PNG/BMP kept as-is (ocr_service.py:177), GIF re-encoded to PNG
    for enc in (formats.encode_png(gray), formats.encode_bmp_gray(gray),
                formats.encode_gif_gray(gray)):
        res = oracle.extract_image_text("u", enc)
        assert res.text == "img text" and res.n_errors == 0 and res.spans == []


def test_error_as_data():
    res = oracle.extract_image_text("u", b"\x00garbage-payload")
    assert res.n_errors == 1
    assert res.text.startswith("OCR Error for ID u: ")  # ocr_service.py:228


def test_html_strip_drops_boilerplate():
    html = (
        b"<html><head><script>x</script></head><body>"
        b"<nav><a href='/'>home</a><a href='/a'>a</a></nav>"
        b"<article><p>Main content paragraph that should survive.</p>"
        b"<p>Second paragraph.</p></article>"
        b"<footer><p>(c) footer</p></footer></body></html>"
    )
    res = oracle.extract_html_text("u", html)
    assert "Main content paragraph" in res.text
    assert "Second paragraph." in res.text
    assert "home" not in res.text and "footer" not in res.text


def test_route_and_islands():
    pages = [(i, f"t{i}") for i in range(1, 8)]
    items = oracle.route_items(pages, illustration_pages={3, 4, 6})
    assert [it["kind"] for it in items] == ["text", "text", "image", "image", "text", "image", "text"]
    assert items[2]["id"] == "img_pdf_3"
    chapters = oracle.chapter_islands(items)
    kinds = [(c["kind"], c["first_page"], c["n_pages"]) for c in chapters]
    assert kinds == [("text", 1, 2), ("image", 3, 1), ("image", 4, 1),
                     ("text", 5, 1), ("image", 6, 1), ("text", 7, 1)]
    assert chapters[0]["html"] == "<h2>Page 1</h2><pre>t1</pre>\n<h2>Page 2</h2><pre>t2</pre>\n"


def test_extract_table_dispatch():
    import pyarrow  # noqa: F401
    from google_vision_ocr_spark import fixtures

    table = fixtures.generate_pages(n_urls=40, seed=7, skew_pages=20)
    rows = table.to_pylist()
    results = oracle.extract_table(rows)
    kinds = {r.kind for r in results}
    assert kinds == {"pdf", "html", "image", "text"}
    assert all(r.n_errors == 0 for r in results)
    # deterministic across runs
    results2 = oracle.extract_table(fixtures.generate_pages(n_urls=40, seed=7, skew_pages=20).to_pylist())
    assert [(r.url, r.text) for r in results] == [(r.url, r.text) for r in results2]
