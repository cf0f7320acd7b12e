"""S8/W3/J3: external illustration union with appended numbering.

Reference: user-supplied external illustration files are copied into
the pipeline after the main pages, numbered ``len(pages) + idx + 1``
(``epub_processor.py:153-175``, numbering at :168), skipping files
already designated as folder illustrations (dedup anti-join,
``epub_processor.py:156-159``) and files that do not exist (F4,
``epub_processor.py:154,174-175``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def append_external_illustrations(
    items: DataFrame,
    externals: DataFrame,
    doc_col: str = "url",
    page_col: str = "page",
    path_col: str = "path",
    order_col: str = "ext_idx",
    existing_paths: DataFrame | None = None,
) -> DataFrame:
    """Union ``externals`` into ``items`` with page numbers continuing
    after each document's max page.

    ``externals``: ``(url, path, ext_idx[, valid])`` — one row per
    user-supplied illustration, ``ext_idx`` = user-entry order.
    """
    ext = externals
    if "valid" in ext.columns:  # F4 existence filter, computed at ingest
        ext = ext.filter(F.col("valid")).drop("valid")
    if existing_paths is not None:  # J3 dedup anti-join
        ext = ext.join(
            F.broadcast(existing_paths.select(path_col).dropDuplicates([path_col])),
            path_col,
            "left_anti",
        )
    max_pages = items.groupBy(doc_col).agg(F.max(page_col).alias("__max_page"))
    w = Window.partitionBy(doc_col).orderBy(order_col)
    ext_items = (
        ext.join(F.broadcast(max_pages), doc_col, "left")
        .withColumn(
            page_col,
            (F.coalesce(F.col("__max_page"), F.lit(0)) + F.row_number().over(w)).cast(
                items.schema[page_col].dataType.simpleString()
            ),
        )
        .withColumn("kind", F.lit("image"))
        .withColumn(
            "item_id",
            # id scheme: ext_illust_{idx}{ext} (epub_processor.py:161)
            F.concat(
                F.lit("ext_illust_"),
                F.col(order_col).cast("string"),
                F.regexp_extract(F.col(path_col), r"(\.[^.]+)$", 1),
            ),
        )
        .withColumn("text", F.lit(None).cast("string"))
    )
    cols = [c for c in items.columns]
    for c in cols:
        if c not in ext_items.columns:
            ext_items = ext_items.withColumn(c, F.lit(None))
    return items.unionByName(ext_items.select(*cols), allowMissingColumns=False)
