"""URL canonicalization for web-corpus processing.

Common-Crawl pipelines dedupe and group by canonical URL / host; the
same raw page is fetched as ``HTTP://Example.COM:80/a?utm_source=x``
and ``http://example.com/a``.  Canonicalization here is a fixed,
documented rule-set implemented entirely with JVM string/regexp
built-ins (codegen'd, zero Python, RE2-compatible patterns — no
lookarounds) so the whole column is computed in the scan's project and
a DuckDB oracle can mirror it exactly:

1. scheme and host:port lowercase (path/query case is significant);
2. default ports stripped (``:80`` for http, ``:443`` for https);
3. a leading ``www.`` label dropped from the host;
4. fragment stripped;
5. known tracking parameters removed (``utm_*``, ``fbclid``,
   ``gclid``); leftover ``?``/``&`` separators cleaned up.

No public-suffix list ships in this container, so
:func:`registrable_domain` uses the last-two-labels heuristic and says
so — swap in a PSL lookup where available.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_TAIL = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$"
TRACKING_RE = r"(utm_[a-z]+|fbclid|gclid)=[^&#]*"


def canonicalize_url(col: Column) -> Column:
    scheme = F.lower(F.regexp_extract(col, _SCHEME, 1))
    hostport = F.lower(F.regexp_extract(col, _HOSTPORT, 1))
    tail = F.regexp_extract(col, _TAIL, 1)
    c = F.concat(scheme, F.lit("://"), hostport, tail)
    c = F.regexp_replace(c, r"^(https://[^/?#:]*):443($|[/?#].*)", "$1$2")
    c = F.regexp_replace(c, r"^(http://[^/?#:]*):80($|[/?#].*)", "$1$2")
    c = F.regexp_replace(c, r"^(https?://)www\.", "$1")
    c = F.regexp_replace(c, r"#.*$", "")
    c = F.regexp_replace(c, TRACKING_RE, "")
    c = F.regexp_replace(c, r"&&+", "&")
    c = F.regexp_replace(c, r"\?&", "?")
    c = F.regexp_replace(c, r"[?&]+$", "")
    return c


def url_host(col: Column) -> Column:
    return F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1)


def registrable_domain(col: Column) -> Column:
    """Last-two-labels heuristic, lowercased (it's a grouping key; no
    public-suffix list ships in this container)."""
    return F.lower(F.regexp_extract(url_host(col), r"([^.]+\.[^.]+)$", 1))
