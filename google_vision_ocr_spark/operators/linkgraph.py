"""Hyperlink-graph extraction from page markup — the web-graph side
of the extraction tier.

Every crawl pipeline that ranks hosts (host_pagerank), detects spam
neighbourhoods, or schedules frontier fetches starts from exactly
this operator: pull ``<a href>`` targets + anchor text out of each
page, resolve relative references against the page's base URL, drop
non-fetchable schemes, canonicalize the target (here: the SURT key of
``functions/urls.py``, so the same page linked as ``HTTPS://WWW.X…``
and ``https://x…`` is one graph node), and aggregate into a
``(src_host, dst_surt)`` edge list.

Resolution rules (fixed, documented — a deliberately small subset of
RFC 3986 that both engines replay exactly):

- ``(?i)^https?://…``      -> kept as-is (absolute);
- ``/…`` (single slash)    -> root-relative: ``base_url || href``;
- anything else (``#fragment``, ``mailto:``, ``javascript:``,
  protocol-relative ``//host/…``, dot-relative) -> dropped.

Distributed shape: href/anchor extraction, resolution and SURT are
all scan-side JVM expressions (zero Python); the only shuffle is the
final edge aggregation, keyed by (src_host, dst_surt) — fine-grained
and well-distributed because the SURT's reversed-host prefix spreads
targets across the keyspace.  At 10^12 pages the edge agg IS the
web-graph build; everything upstream pipelines inside the extraction
scan.  Anchor pairing uses ``arrays_zip`` over two extractions of the
same anchor pattern (href group / text group) — identical match sets
by construction on well-formed markup; rows where the zip pads NULL
(pathological markup) drop with the non-fetchable hrefs.

The reference app has no link stage (it OCRs page images); this
serves the north rule's web-page axis next to justext/boilerpipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .justext import _strip

_HREF_PAT = '<a[^>]*href="([^"]*)"[^>]*>.*?</a>'
_TEXT_PAT = '<a[^>]*href="[^"]*"[^>]*>(.*?)</a>'
_ABS_RE = "(?i)^https?://"


def extract_link_graph(
    df: DataFrame,
    html_col: str = "html",
    base_col: str = "base_url",
    src_host_col: str = "src_host",
) -> DataFrame:
    """``(src_host, dst_surt, n_links, first_anchor)`` edge list.

    ``base_col`` must hold the page's origin (``scheme://host``, no
    trailing slash) for root-relative resolution; ``src_host_col``
    the page's host (the graph's source node).
    """
    from ..functions.urls import surt_key

    pairs = F.expr(
        f"""filter(
              arrays_zip(regexp_extract_all({html_col}, '{_HREF_PAT}', 1),
                         regexp_extract_all({html_col}, '{_TEXT_PAT}', 1)),
              p -> p['0'] IS NOT NULL AND p['1'] IS NOT NULL)"""
    )
    exploded = (
        df.select(
            F.col(src_host_col),
            F.col(base_col),
            F.explode(pairs).alias("__p"),
        )
        .select(
            src_host_col,
            base_col,
            F.col("__p")["0"].alias("__href"),
            F.expr(_strip("__p['1']")).alias("__anchor"),
        )
        .where(
            F.col("__href").rlike(_ABS_RE)
            # single leading slash only: '//host/…' is protocol-
            # relative, NOT root-relative — appending it to base_url
            # would fabricate a bogus path on the source host
            | F.col("__href").rlike("^/($|[^/])")
        )
        .select(
            src_host_col,
            F.when(F.col("__href").rlike(_ABS_RE), F.col("__href"))
            .otherwise(F.concat(F.col(base_col), F.col("__href")))
            .alias("__resolved"),
            "__anchor",
        )
    )
    return (
        exploded.select(
            src_host_col,
            surt_key(F.col("__resolved")).alias("dst_surt"),
            "__anchor",
        )
        .groupBy(src_host_col, "dst_surt")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_links"),
            F.min("__anchor").alias("first_anchor"),
        )
    )
