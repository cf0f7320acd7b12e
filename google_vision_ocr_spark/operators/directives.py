"""Page-level indexing directives — robots meta flags + canonical
link extraction.

Before a crawl corpus is deduped or ranked, every serious pipeline
honours the page's own directives: ``<meta name="robots">`` flags
(``noindex`` pages must not enter the index / training set,
``nofollow`` pages contribute no outlinks to the link graph) and the
``<link rel="canonical">`` target (the page's self-declared canonical
URL — the strongest URL-dedup signal there is, stronger than any
similarity measure).  This operator extracts all three as one
scan-side projection:

- ``noindex`` / ``nofollow`` — int 0/1, parsed from the
  comma/space-separated content list of the FIRST robots meta tag
  (token match, so ``noindexfoo`` does not count);
- ``canonical_surt`` — the SURT key (``functions/urls.py``) of the
  first canonical link's absolute href, ``''`` when the page declares
  none (non-absolute canonical hrefs are ignored — resolving a
  relative canonical needs the fetch URL, which the caller can do via
  ``operators/linkgraph.py``'s resolution rule if it has one).

Zero shuffle, zero Python: two ``regexp_extract`` + the SURT chain,
all inside the extraction scan's project — at 10^12 pages this costs
nothing beyond the scan itself.  Downstream: ``noindex = 0`` filters
the corpus, ``canonical_surt`` feeds the same groupBy-min dedup as
``surt_url_dedup``, ``nofollow = 1`` masks ``link_graph_extraction``.

The synthesized corpus plants well-formed lowercase tags (attribute
order fixed); a production crawl would first canonicalize through the
full parser in ``functions/html.py``.

The reference app has no HTML stage (it OCRs page images); this
serves the north rule's web-page axis.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ROBOTS_PAT = '<meta name="robots" content="([^"]*)"'
_CANON_PAT = '<link rel="canonical" href="([^"]*)"'
_ABS_RE = "(?i)^https?://"


def _flag(content_col: Column, token: str) -> Column:
    # token match inside the comma/space-separated directive list
    toks = F.filter(
        F.split(F.lower(content_col), "[ ,]+"), lambda x: x != F.lit("")
    )
    return F.array_contains(toks, token).cast("int")


def page_directives(df: DataFrame, html_col: str = "html", id_col: str = "doc_id") -> DataFrame:
    """``(id, noindex, nofollow, canonical_surt)`` per page."""
    from ..functions.urls import surt_key

    robots = F.regexp_extract(F.col(html_col), _ROBOTS_PAT, 1)
    canon = F.regexp_extract(F.col(html_col), _CANON_PAT, 1)
    return df.select(
        id_col,
        _flag(robots, "noindex").alias("noindex"),
        _flag(robots, "nofollow").alias("nofollow"),
        F.when(canon.rlike(_ABS_RE), surt_key(canon))
        .otherwise(F.lit(""))
        .alias("canonical_surt"),
    )
