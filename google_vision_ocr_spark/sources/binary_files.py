"""S2/S3: image-folder scan as a Spark binaryFile source.

Reference folder mode: list a directory, keep supported extensions,
sort by name, load each image (``main_gui.py:276-282``,
``ocr_service.py:144-150``, ``epub_processor.py:53-69``).  Spark shape:
``spark.read.format("binaryFile")`` with a glob pushdown (the F1
extension predicate applied at the *listing* level, before any byte is
read), and the deterministic name sort (O3) becomes an explicit
``page`` index derived from the sorted path order — Spark rows are
unordered, so the reference's implicit list order must be a column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SUPPORTED_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".tiff", ".gif")
# reference tuple: ocr_service.py:144
_GLOB = "*.{png,jpg,jpeg,bmp,tiff,gif,PNG,JPG,JPEG,BMP,TIFF,GIF}"


def read_image_folder(spark: SparkSession, directory: str) -> DataFrame:
    """Folder → ``(url, warc_ts, html, text, lang)`` input-table rows.

    - extension filter via ``pathGlobFilter`` (listing-level pushdown)
    - ``page`` = 1-based rank in the name sort (``main_gui.py:278``)
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", _GLOB)
        .load(directory)
    )
    w = Window.orderBy(F.col("path"))
    return raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.row_number().over(w).alias("page"),
    )


def stem_txt_name(url_col: str = "url"):
    """S5 naming rule: output text file name = stem + ``.txt``
    (``ocr_service.py:184-186``)."""
    base = F.element_at(F.split(F.col(url_col), "/"), -1)
    return F.concat(F.regexp_replace(base, r"\.[^.]+$", ""), F.lit(".txt"))
