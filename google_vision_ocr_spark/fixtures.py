"""Deterministic synthetic input-table generator (FIXTURES.md §A).

Generates the north-rule input table
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
(`BASELINE.json` input_hint) with a payload mix mirroring the
reference's two input modes plus the north rule's HTML branch:

- ``pdf``   rows: ``%SPDF`` multi-page containers (reference PDF path,
  ``epub_processor.py:41-51``), page counts 1-8 plus one skewed
  multi-hundred-page document per table (BASELINE.json north_star:
  "skewed multi-hundred-page PDFs").
- ``image`` rows: single grayscale page images in PNG / JPEG / BMP /
  TIFF / GIF-stub
  formats (reference folder path, ``ocr_service.py:129-196``; the GIF
  rows exercise the keep-format-else-PNG rule at ``ocr_service.py:177``).
- ``html``  rows: UTF-8 HTML with boilerplate wrapping known content
  (north-rule T11 branch).
- ``text``  rows: pre-extracted text, NULL payload (pass-through).

Everything is seeded; same seed → byte-identical parquet content.
"""

from __future__ import annotations

import datetime
import random

import pyarrow as pa
import pyarrow.parquet as pq

from . import formats

EPOCH = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)

_WORDS = (
    "data spark engine page document extract pipeline shuffle partition "
    "cluster arrow batch vector column text web crawl index token stream "
    "système naïve façade über straße 데이터 처리 엔진 文本 抽取 引擎"
).split()

_SENTENCE_PUNCT = (".", ".", ".", "!", "?")


def _sentence(rng: random.Random) -> str:
    n = rng.randint(4, 12)
    words = [rng.choice(_WORDS) for _ in range(n)]
    return " ".join(words) + rng.choice(_SENTENCE_PUNCT)


def _page_text(rng: random.Random, min_sentences: int = 1, max_sentences: int = 5) -> str:
    return "\n".join(_sentence(rng) for _ in range(rng.randint(min_sentences, max_sentences)))


def _html_doc(rng: random.Random, main_paras: list[str]) -> bytes:
    nav_links = "".join(
        f'<li><a href="/{rng.randint(0, 99)}">link {i}</a></li>' for i in range(5)
    )
    body = "".join(f"<p>{p}</p>" for p in main_paras)
    doc = (
        "<!DOCTYPE html><html><head><title>t</title>"
        "<script>var x=1;</script><style>p{color:red}</style></head>"
        f"<body><nav><ul>{nav_links}</ul></nav>"
        f"<header><h1>Site</h1></header><article>{body}</article>"
        f"<footer><p>© {rng.randint(1990, 2024)} example.org</p></footer>"
        "</body></html>"
    )
    return doc.encode("utf-8")


def _image_payload(rng: random.Random, text: str) -> bytes:
    gray = formats.rgb_to_gray(formats.render_page_rgb(text))
    fmt = rng.choice(("PNG", "PNG", "JPEG", "BMP", "TIFF", "GIF"))
    if fmt == "PNG":
        return formats.encode_png(gray)
    if fmt == "JPEG":
        return formats.encode_jpeg_gray(gray)
    if fmt == "BMP":
        return formats.encode_bmp_gray(gray)
    if fmt == "TIFF":
        return formats.encode_tiff_gray(gray)
    return formats.encode_gif_gray(gray)


def generate_pages(
    n_urls: int = 200,
    seed: int = 42,
    skew_pages: int = 300,
    pdf_frac: float = 0.6,
    html_frac: float = 0.3,
    min_sentences: int = 1,
    max_sentences: int = 5,
    text_pool: int | None = None,
) -> pa.Table:
    """Build the synthetic ``pages`` table as a pyarrow Table.

    ``text_pool``: draw page texts from a pregenerated pool of that
    size instead of synthesizing each page — orders of magnitude faster
    for multi-hundred-thousand-page bench fixtures (content variety
    doesn't matter there, volume does).
    """
    rng = random.Random(seed)
    pool: list[str] | None = None
    if text_pool:
        pool_rng = random.Random(seed + 7)
        pool = [_page_text(pool_rng, min_sentences, max_sentences) for _ in range(text_pool)]

    def page_text() -> str:
        if pool is not None:
            return pool[rng.randrange(len(pool))]
        return _page_text(rng, min_sentences, max_sentences)
    urls, tss, payloads, texts, langs, kinds = [], [], [], [], [], []
    lang_cycle = ("en", "de", "es", "fr", "zh", "jp")
    for i in range(n_urls):
        url = f"https://example.org/doc/{i:06d}"
        ts = EPOCH + datetime.timedelta(minutes=i)
        roll = rng.random()
        if i == n_urls // 2:
            kind = "pdf"  # the designated skewed multi-hundred-page doc
        elif roll < pdf_frac:
            kind = "pdf"
        elif roll < pdf_frac + html_frac:
            kind = "html"
        elif roll < pdf_frac + html_frac + 0.05:
            kind = "image"
        else:
            kind = "text"
        if kind == "pdf":
            n_pages = skew_pages if i == n_urls // 2 else rng.randint(1, 8)
            payload = formats.encode_spdf([page_text() for _ in range(n_pages)])
            text = None
        elif kind == "html":
            payload = _html_doc(rng, [_sentence(rng) for _ in range(rng.randint(2, 6))])
            text = None
        elif kind == "image":
            payload = _image_payload(rng, _page_text(rng))
            text = None
        else:
            payload = None
            text = _page_text(rng)
        urls.append(url)
        tss.append(ts)
        payloads.append(payload)
        texts.append(text)
        langs.append(lang_cycle[i % len(lang_cycle)])
        kinds.append(kind)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def generate_illustrations(pages: pa.Table, seed: int = 42) -> pa.Table:
    """Designate ~10% of PDF pages / image urls as illustrations (F2/F3)."""
    rng = random.Random(seed + 1)
    urls, page_nums = [], []
    for url, payload in zip(pages.column("url").to_pylist(), pages.column("html").to_pylist()):
        if payload is None:
            continue
        if formats.is_spdf(payload):
            n_pages = len(formats.decode_spdf(payload))
            for p in range(1, n_pages + 1):
                if rng.random() < 0.1:
                    urls.append(url)
                    page_nums.append(p)
        elif (formats.sniff_format(payload) in ("PNG", "JPEG", "BMP", "TIFF", "GIF")
              and rng.random() < 0.1):
            urls.append(url)
            page_nums.append(1)
    return pa.table(
        {"url": pa.array(urls, pa.string()), "page": pa.array(page_nums, pa.int32())}
    )


def write_pages_parquet(path: str, n_urls: int = 200, seed: int = 42,
                        row_group_rows: int = 256, **kw) -> str:
    """Small row groups so Spark's scan splits parallelize: a single
    monolithic row group serializes the whole read into one task no
    matter how many executors exist."""
    pq.write_table(generate_pages(n_urls=n_urls, seed=seed, **kw), path,
                   row_group_size=row_group_rows)
    return path


def write_fixture_dir(dir_path: str, n_urls: int = 200, seed: int = 42, **kw) -> dict[str, str]:
    """Write pages + illustration designations under ``dir_path``."""
    import os

    os.makedirs(dir_path, exist_ok=True)
    pages = generate_pages(n_urls=n_urls, seed=seed, **kw)
    pages_path = os.path.join(dir_path, "pages.parquet")
    illust_path = os.path.join(dir_path, "illustrations.parquet")
    pq.write_table(pages, pages_path)
    pq.write_table(generate_illustrations(pages, seed=seed), illust_path)
    return {"pages": pages_path, "illustrations": illust_path}
