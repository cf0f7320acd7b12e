"""S1: PDF scan + rasterize as an Arrow-batch explode.

The reference rasterizes a whole PDF eagerly on one thread
(``epub_processor.py:41-51``, ``ocr_service.py:106`` —
``pdf2image.convert_from_path``) and carries PIL objects in rows.
Here the payload column is decoded inside ``mapInPandas`` and exploded
to **one row per page** ``(url, page, image)`` so the downstream unit
of parallelism is a page — the distributed analog of the reference's
one-future-per-page thread pool (``ocr_service.py:112-116``).

Page numbers come from the container's own page order (deterministic,
data-derived — never ``row_number()`` over an unordered frame), which
is what makes the later order-restoring sort (``ocr_service.py:116``)
reproducible under any partitioning.

Output rows are yielded in bounded chunks so a skewed
multi-hundred-page document cannot blow up a single Arrow batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .. import formats

RASTER_SCHEMA = "url string, page int, image binary"
_CHUNK_ROWS = 256


def rasterize_pdf_pages(df: DataFrame, payload_col: str = "html") -> DataFrame:
    """Explode SPDF payload rows into per-page RGB rasters."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        urls: list[str] = []
        pages: list[int] = []
        images: list[bytes] = []
        for pdf in batches:
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                try:
                    page_texts = formats.decode_spdf(bytes(payload))
                except Exception:
                    # fault isolation (T10): a corrupt document must not
                    # fail the job — emit one imageless page row that the
                    # recognition stage turns into error-as-data text
                    urls.append(url)
                    pages.append(1)
                    images.append(None)
                    continue
                if not page_texts:
                    # zero-page doc marker (page=0): reference writes an
                    # empty .txt — the url must survive to the output
                    urls.append(url)
                    pages.append(0)
                    images.append(None)
                    continue
                for page_no, text in enumerate(page_texts, start=1):
                    urls.append(url)
                    pages.append(page_no)
                    images.append(formats.encode_simg(formats.render_page_rgb(text)))
                    if len(urls) >= _CHUNK_ROWS:
                        yield pd.DataFrame({"url": urls, "page": pages, "image": images})
                        urls, pages, images = [], [], []
        if urls:
            yield pd.DataFrame({"url": urls, "page": pages, "image": images})

    # narrow select first: mapInPandas consumes whole rows, so keep the
    # UDF input schema minimal (SURVEY.md §4 column-pruning caveat)
    return df.select("url", payload_col).mapInPandas(gen, RASTER_SCHEMA)


def salted_repartition(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Spread a skewed document's pages across partitions.

    Hash-repartitioning on ``(url, page)`` makes the pages of one
    multi-hundred-page document land on many partitions instead of one
    (BASELINE.json north_star: "salted repartitioning and page-level
    explode before extraction").  The later ``groupBy(url)`` shuffles
    once more, but its partial aggregation combines per-partition
    first, so the expensive Python stages run fully parallel.
    """
    cols = ["url", "page"]
    if num_partitions:
        return df.repartition(num_partitions, *cols)
    return df.repartition(*cols)
