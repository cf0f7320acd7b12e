"""The flagship end-to-end extraction plan (SURVEY.md §3.2 / §7 M1).

``input table → route by payload kind → [rasterize-explode →
preprocess → recognize → ordered framed concat] | [format-normalize →
recognize] | [HTML strip] | [passthrough] → union``

Payload routing is **JVM-side** (magic-byte prefix comparison on the
binary column) so Catalyst prunes each branch's scan down to the rows
it needs before any Python stage runs — the distributed analog of the
reference's route-before-OCR compute pruning
(``epub_processor.py:95-111``).

Output: one row per url ``(url, kind, text, spans, n_pages, n_errors)``
with ``text`` byte-identical to the reference semantics (oracle.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from .. import formats
from ..functions.html import strip_html_bytes
from ..operators.assemble import SPANS_TYPE, framed_concat
from ..operators.preprocess import normalize_image_format_udf, preprocess_chain
from ..operators.rasterize import rasterize_pdf_pages, salted_repartition
from ..operators.recognize import recognize_stage

EMPTY_SPANS = f"cast(array() as {SPANS_TYPE})"


def classify_payload(df: DataFrame, payload_col: str = "html") -> DataFrame:
    """Add ``kind`` from payload magic bytes — pure Catalyst expressions."""
    p = F.col(payload_col)
    return df.withColumn(
        "kind",
        F.when(p.isNull(), F.lit("text"))
        .when(p.substr(1, 5) == F.lit(formats.SPDF_MAGIC), F.lit("pdf"))
        .when(p.substr(1, 8) == F.lit(formats.PNG_MAGIC), F.lit("image"))
        .when(p.substr(1, 3) == F.lit(formats.JPEG_MAGIC), F.lit("image"))
        .when(p.substr(1, 2) == F.lit(formats.BMP_MAGIC), F.lit("image"))
        .when(p.substr(1, 4) == F.lit(formats.TIFF_MAGIC_LE), F.lit("image"))
        .when(p.substr(1, 4) == F.lit(formats.TIFF_MAGIC_BE), F.lit("image"))
        .when(p.substr(1, 6) == F.lit(formats.GIF_MAGIC), F.lit("image"))
        .when(p.substr(1, 1) == F.lit(b"<"), F.lit("html"))
        .otherwise(F.lit("unknown")),
    )


@F.pandas_udf(StringType())
def strip_html_udf(payloads: pd.Series) -> pd.Series:
    """T11: vectorized deterministic boilerplate strip."""
    return payloads.map(lambda p: strip_html_bytes(bytes(p)))


def extract(
    df: DataFrame,
    payload_col: str = "html",
    recognizer: str = "stub",
    salt_partitions: int | None = None,
    rate_limit_qps: float | None = None,
    otsu: bool = False,
    do_deskew: bool = False,
    dpi: bool = False,
) -> DataFrame:
    """Run the full extraction pipeline over the north-rule input table."""
    classified = classify_payload(df, payload_col)

    # --- PDF branch: §3.2 golden path -------------------------------------
    pdf_rows = classified.filter(F.col("kind") == "pdf")
    pages = rasterize_pdf_pages(pdf_rows, payload_col)
    pages = salted_repartition(pages, salt_partitions)
    pages = preprocess_chain(pages, "image", otsu=otsu, do_deskew=do_deskew, dpi=dpi)
    recognized = recognize_stage(
        pages, image_col="image", id_col="page",
        recognizer=recognizer, rate_limit_qps=rate_limit_qps,
    )
    pdf_out = framed_concat(recognized.filter(F.col("page") > 0)).withColumn(
        "kind", F.lit("pdf")
    )
    # zero-page documents (page=0 marker): empty text, no frames
    pdf_empty_out = recognized.filter(F.col("page") == 0).select(
        "url",
        F.lit("").alias("text"),
        F.expr(EMPTY_SPANS).alias("spans"),
        F.lit(0).alias("n_pages"),
        F.lit(0).alias("n_errors"),
        F.lit("pdf").alias("kind"),
    )

    # --- image branch: §3.3, NO preprocess (ocr_service.py:173-174) -------
    img_rows = classified.filter(F.col("kind") == "image").select(
        "url", F.col(payload_col).alias("image")
    )
    img_norm = img_rows.withColumn("image", normalize_image_format_udf(F.col("image")))
    img_rec = recognize_stage(
        img_norm, image_col="image", id_col="url",
        recognizer=recognizer, rate_limit_qps=rate_limit_qps,
    )
    img_out = img_rec.select(
        "url",
        F.col("text"),
        F.expr(EMPTY_SPANS).alias("spans"),
        F.lit(1).alias("n_pages"),
        F.col("ocr_error").cast("int").alias("n_errors"),
        F.lit("image").alias("kind"),
    )

    # --- HTML branch: T11 --------------------------------------------------
    html_rows = classified.filter(F.col("kind") == "html").select("url", payload_col)
    html_out = html_rows.select(
        "url",
        strip_html_udf(F.col(payload_col)).alias("text"),
        F.expr(EMPTY_SPANS).alias("spans"),
        F.lit(1).alias("n_pages"),
        F.lit(0).alias("n_errors"),
        F.lit("html").alias("kind"),
    )

    # --- text passthrough + unknown ---------------------------------------
    text_out = classified.filter(F.col("kind") == "text").select(
        "url",
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        F.expr(EMPTY_SPANS).alias("spans"),
        F.lit(0).alias("n_pages"),
        F.lit(0).alias("n_errors"),
        F.lit("text").alias("kind"),
    )
    unknown_out = classified.filter(F.col("kind") == "unknown").select(
        "url",
        F.lit("").alias("text"),
        F.expr(EMPTY_SPANS).alias("spans"),
        F.lit(0).alias("n_pages"),
        F.lit(1).alias("n_errors"),
        F.lit("unknown").alias("kind"),
    )

    out_cols = ["url", "kind", "text", "spans", "n_pages", "n_errors"]
    return (
        pdf_out.select(*out_cols)
        .unionByName(pdf_empty_out.select(*out_cols))
        .unionByName(img_out.select(*out_cols))
        .unionByName(html_out.select(*out_cols))
        .unionByName(text_out.select(*out_cols))
        .unionByName(unknown_out.select(*out_cols))
    )
