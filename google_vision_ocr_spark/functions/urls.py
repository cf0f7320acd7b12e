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
    public-suffix list ships in this container).  Wrong for multi-label
    suffixes like ``*.co.uk`` — use :func:`with_registrable_domain`
    with a PSL frame where one is available."""
    return F.lower(F.regexp_extract(url_host(col), r"([^.]+\.[^.]+)$", 1))


def with_registrable_domain(
    df,
    url_col: str = "url",
    out_col: str = "domain",
    psl=None,
    max_suffix_labels: int = 4,
):
    """Attach the registrable domain of each row's URL.

    With ``psl`` — a DataFrame with one ``suffix`` column holding
    public-suffix entries (``com``, ``co.uk``, …) — the domain is one
    label plus the LONGEST matching suffix, the real PSL rule.  The
    match runs over the *distinct hosts* frame (cardinality ≪ rows:
    ~10^8 hosts vs 10^12 pages), exploding at most
    ``max_suffix_labels`` candidate suffixes per host into a broadcast
    join against the PSL, then joins the small host→domain mapping back.
    Hosts matching no suffix fall back to the last-two-labels
    heuristic, as does the whole function when ``psl`` is None.
    """
    host = F.lower(url_host(F.col(url_col)))
    heuristic = F.regexp_extract(F.col("__host"), r"([^.]+\.[^.]+)$", 1)
    if psl is None:
        return (
            df.withColumn("__host", host)
            .withColumn(out_col, heuristic)
            .drop("__host")
        )
    hosts = df.select(host.alias("__host")).distinct()
    labeled = hosts.withColumn("__labels", F.split(F.col("__host"), r"\.")).withColumn(
        "__n", F.size("__labels")
    )
    cand = labeled.select(
        "__host", "__labels", "__n",
        F.explode(
            F.sequence(F.lit(1), F.least(F.col("__n") - 1, F.lit(max_suffix_labels)))
        ).alias("__k"),
    ).filter(
        # k must leave at least one label for the registrable part;
        # also drops the descending sequence(1, 0) a 1-label host makes
        (F.col("__k") >= 1) & (F.col("__k") < F.col("__n"))
    ).withColumn(
        "__suffix",
        F.concat_ws(
            ".", F.slice("__labels", F.col("__n") - F.col("__k") + 1, F.col("__k"))
        ),
    )
    matched = (
        cand.join(
            F.broadcast(psl.select(F.col("suffix").alias("__suffix"))), "__suffix"
        )
        .groupBy("__host")
        .agg(F.max("__k").alias("__k"))
    )
    mapping = (
        labeled.join(matched, "__host", "left")
        .withColumn(
            out_col,
            F.when(F.col("__k").isNull(), heuristic).otherwise(
                F.concat_ws(
                    ".",
                    F.slice(
                        "__labels", F.col("__n") - F.col("__k"), F.col("__k") + 1
                    ),
                )
            ),
        )
        .select("__host", out_col)
    )
    return df.withColumn("__host", host).join(mapping, "__host", "left").drop("__host")


def filter_blocklisted_domains(
    df,
    blocklist,
    url_col: str = "url",
    psl=None,
):
    """Drop rows whose registrable domain is blocklisted — the
    spam/adult/malware domain-list gate every crawl pipeline applies
    before anything else touches the bytes.

    ``blocklist`` is a DataFrame with one ``domain`` column (registrable
    domains).  Real lists are ~10^5-10^6 entries — always broadcastable
    — so the corpus never shuffles: domains attach scan-side (or via the
    distinct-hosts PSL path of :func:`with_registrable_domain` when
    ``psl`` is given) and the gate is one broadcast anti-join.  The
    attached ``domain`` column stays on the output: downstream host
    rollups reuse it instead of re-deriving.
    """
    domained = with_registrable_domain(df, url_col=url_col, psl=psl)
    clean = blocklist.select(F.lower(F.col("domain")).alias("domain"))
    return domained.join(F.broadcast(clean), "domain", "left_anti")


def surt_key(col: Column) -> Column:
    """Sort-friendly URI Reordering Transform of a raw URL —
    ``org,example,news)/path?a=1&b=2`` — the key web archives
    (Heritrix/OpenWayback's SURT) dedupe and range-scan by.

    Built on :func:`canonicalize_url` (lowercased scheme/host, default
    ports and ``www.`` and fragments and tracking params gone), then:

    - the scheme is dropped;
    - host labels reverse into a comma-joined big-endian prefix, a
      non-default port (kept by canonicalization) follows it, and
      ``)`` closes the authority;
    - query parameters sort lexicographically (``?b=2&a=1`` and
      ``?a=1&b=2`` are the same resource to a crawler).

    Why it matters at 10^12 rows: a corpus sorted/range-partitioned by
    SURT co-locates every host and every registrable domain in
    contiguous key ranges, so per-domain scans become partition-pruned
    prefix scans and exact URL dedup shuffles uniformly (the key
    starts with the well-distributed reversed host, not ``https://``).
    Pure JVM built-ins, zero Python, RE2-compatible patterns.
    """
    c = canonicalize_url(col)
    host = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1)
    port = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]*:([0-9]+)", 1)
    tail = F.regexp_extract(c, _TAIL, 1)
    path = F.regexp_replace(tail, r"\?.*$", "")
    query = F.regexp_extract(tail, r"\?(.*)$", 1)
    sorted_q = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda x: x != F.lit(""))), "&"
    )
    return F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.lit(")"),
        path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )
