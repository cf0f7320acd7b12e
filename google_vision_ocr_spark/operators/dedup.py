"""Deduplication operators for a large-scale training-data pipeline.

Not present in the reference (it processes one document at a time);
these are the standard web-corpus dedup family, built Spark-first:

- :func:`exact_dedup` — hash-groupBy on document content.  One shuffle
  on the 16-byte digest (never the full text); partial aggregation
  combines map-side.
- :func:`minhash_lsh_pairs` — shingle → MinHash signature (vectorized
  numpy per Arrow batch) → banded LSH → bucket self-join.  The join key
  is ``(band, band_hash)`` so only same-bucket candidates shuffle;
  at 100 TB this is the only join that matters and it is quadratic only
  within buckets.
- :func:`simhash_64` / :func:`simhash_candidates` — 64-bit SimHash with
  banded hamming blocking (4×16-bit bands: any pair within hamming
  distance 3 shares at least one exact band).
- :func:`ngram_jaccard_pairs` — exact Jaccard over word shingles via
  explode + self-join, for verification of the approximate families.

All hashing is keyed blake2b — deterministic across processes (no
Python ``hash()``), identical on driver and executors.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ..functions.text import _TOKEN_RE, shingles

_MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group identical texts: ``(text_hash, n_copies, keeper)``."""
    return (
        df.select(F.md5(F.col(text_col).cast("binary")).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min(id_col).alias(f"keeper_{id_col}"))
    )


def drop_exact_dups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep only the minimum-id row per identical text."""
    keepers = exact_dedup(df, id_col, text_col).select(
        F.col(f"keeper_{id_col}").alias(id_col)
    )
    return df.join(keepers, id_col, "left_semi")


_TOKEN_HASH_CACHE: dict[str, int] = {}


def _token_hash(tok: str) -> int:
    h = _TOKEN_HASH_CACHE.get(tok)
    if h is None:
        h = int.from_bytes(hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "big")
        if len(_TOKEN_HASH_CACHE) < 1_000_000:
            _TOKEN_HASH_CACHE[tok] = h
    return h


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct hashes of word k-shingles.

    Hot path: one keyed digest per *distinct token* (cached across the
    Arrow batch / executor lifetime), then a vectorized polynomial
    combination over the token-hash array — equivalent uniqueness to
    hashing each shingle string, ~k× fewer digest calls.
    """
    # RE2-whitespace tokenization (functions.text._TOKEN_RE): Python
    # str.split() honors Unicode whitespace (NBSP, \x0b) that the
    # RE2-replaying Jaccard/containment oracles treat as token content
    toks = [t.lower() for t in _TOKEN_RE.findall(text)]
    if not toks:
        return np.array([0], dtype=np.uint64)
    th = np.array([_token_hash(t) for t in toks], dtype=np.uint64)
    if len(toks) < k:
        h = np.uint64(1469598103934665603)
        for v in th:
            h = h * np.uint64(1000003) + v
        return np.array([h], dtype=np.uint64)
    n = len(toks) - k + 1
    acc = np.full(n, 1469598103934665603, dtype=np.uint64)
    for j in range(k):
        acc = acc * np.uint64(1000003) + th[j : j + n]
    return np.unique(acc)


def _perm_params(n_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def make_minhash_udf(n_perm: int = 64, k: int = 3, seed: int = 42):
    a, b = _perm_params(n_perm, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def minhash_udf(texts: pd.Series) -> pd.Series:
        def one(text: str) -> list[int]:
            h = _shingle_hashes(text or "", k)
            # (a*h + b) mod p, vectorized over perms × shingles
            vals = (a[:, None] * (h[None, :] % _MERSENNE) + b[:, None]) % _MERSENNE
            return vals.min(axis=1).astype(np.int64).tolist()

        return texts.map(one)

    return minhash_udf


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int = 64,
    k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, minhash) via the seeded numpy pandas-UDF.  r7: the input
    fans out to cluster parallelism first — the bench tables are
    single-row-group parquet, so the whole UDF pass otherwise runs on
    ONE task (same fix as the replayable twin; a no-op at scale where
    the scan already has enough splits).  Per-row seeded hashing is
    partition-invariant, so the signature set is unchanged."""
    from ..fanout import fanout

    udf = make_minhash_udf(n_perm=n_perm, k=k, seed=seed)
    return fanout(df, id_col).select(F.col(id_col), udf(F.col(text_col)).alias("minhash"))


def minhash_banded(
    sigs: DataFrame,
    id_col: str = "doc_id",
    n_perm: int = 64,
    bands: int = 16,
) -> DataFrame:
    """The banded ``(id, minhash, band, band_hash)`` projection of a
    :func:`minhash_signatures` table — the explode side of the LSH
    bucket self-join.  Split out of :func:`minhash_lsh_pairs` so bench
    stage-breakdowns can time signature-UDF / band-explode / join
    separately (same expressions, so the composition is unchanged)."""
    rows_per_band = n_perm // bands
    return sigs.select(
        F.col(id_col),
        F.col("minhash"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda band: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("minhash"), band * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    seed: int = 42,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs ``(id_a, id_b, est_jaccard)``.

    est_jaccard = fraction of matching MinHash components; pairs are
    produced once (id_a < id_b) and deduped across bands.

    At scale, pass ``signatures`` (a materialized
    :func:`minhash_signatures` table) — the self-join otherwise
    recomputes the signature UDF once per join side, doubling the most
    expensive stage.  Locally Catalyst keeps both sides as one scan
    lineage, so the default is fine for tests.
    """
    sigs = signatures if signatures is not None else minhash_signatures(
        df, id_col, text_col, n_perm, k, seed
    )
    banded = minhash_banded(sigs, id_col=id_col, n_perm=n_perm, bands=bands)
    left = banded.select(
        F.col("band"), F.col("band_hash"),
        F.col(id_col).alias("id_a"), F.col("minhash").alias("mh_a"),
    )
    right = banded.select(
        F.col("band"), F.col("band_hash"),
        F.col(id_col).alias("id_b"), F.col("minhash").alias("mh_b"),
    )
    pairs = (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            (
                F.size(F.filter(F.zip_with("mh_a", "mh_b", lambda x, y: x == y), lambda m: m))
                / F.lit(n_perm)
            ).alias("est_jaccard"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs


def make_simhash_udf(seed: int = 42):
    @F.pandas_udf(LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        def one(text: str) -> int:
            acc = np.zeros(64, dtype=np.int64)
            for tok in _TOKEN_RE.findall((text or "").lower()):
                h = int.from_bytes(
                    hashlib.blake2b(tok.encode("utf-8"), digest_size=8,
                                    key=seed.to_bytes(8, "big")).digest(),
                    "big",
                )
                bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits == 1, 1, -1)
            val = int((acc > 0).astype(np.uint64) @ (np.uint64(1) << np.arange(64, dtype=np.uint64)))
            return val - (1 << 64) if val >= (1 << 63) else val  # to signed int64

        return texts.map(one)

    return simhash_udf


def simhash_64(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
               seed: int = 42) -> DataFrame:
    return df.select(F.col(id_col), make_simhash_udf(seed)(F.col(text_col)).alias("simhash"))


def simhash_candidates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       max_hamming: int = 3, seed: int = 42,
                       materialize: bool = False,
                       n_bands: int | None = None,
                       signatures: DataFrame | None = None) -> DataFrame:
    """Near-dup pairs by SimHash: band-block then exact hamming filter.

    Blocking is pigeonhole-lossless when ``n_bands > max_hamming``: a
    pair within the hamming radius has at least one band with zero
    differing bits, so it collides on that band's exact key.  The
    default ``n_bands = max_hamming + 1`` guarantees this (the classic
    Manku et al. WWW'07 configuration is 64-bit / radius 3 / 4×16-bit
    bands).  More bands ⇒ shorter keys ⇒ hotter buckets: radius 3 gives
    16-bit keys (65k buckets per band), radius 10 gives ~6-bit keys —
    fine for verification corpora, too hot for 100 TB, where radius ≤3
    is the deployable setting.

    ``materialize=True`` persists + eagerly evaluates the signature
    table so the self-join reads the cache instead of running the
    SimHash UDF once per side — use at scale (same rationale as
    ``minhash_lsh_pairs(signatures=...)``).
    """
    if n_bands is None:
        n_bands = max_hamming + 1
    if n_bands <= max_hamming:
        raise ValueError(
            f"blocking is lossy: n_bands={n_bands} must exceed max_hamming={max_hamming}"
        )
    # signatures= swaps the hash family (e.g. the SQL-replayable 60-bit
    # SimHash in operators/replayable.py) while keeping the lossless
    # banding + exact-hamming pipeline; same pattern as
    # minhash_lsh_pairs(signatures=...)
    sigs = signatures if signatures is not None else simhash_64(
        df, id_col, text_col, seed
    )
    if materialize:
        from .. import cache

        sigs = cache.track(sigs.persist())
        sigs.count()
    base, rem = divmod(64, n_bands)
    widths = [base + (1 if i < rem else 0) for i in range(n_bands)]
    offsets = [sum(widths[:i]) for i in range(n_bands)]
    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), offsets[i])
                .bitwiseAND(F.lit((1 << widths[i]) - 1)).alias("key16"),
            )
            for i in range(n_bands)
        ]
    )
    banded = sigs.select(id_col, "simhash", F.explode(band_structs).alias("bk")).select(
        id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.key16").alias("key16")
    )
    left = banded.select("band", "key16", F.col(id_col).alias("id_a"),
                         F.col("simhash").alias("sh_a"))
    right = banded.select("band", "key16", F.col(id_col).alias("id_b"),
                          F.col("simhash").alias("sh_b"))
    return (
        left.join(right, ["band", "key16"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def drop_repeated_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    out_col: str = "text_dedup",
) -> DataFrame:
    """Global paragraph-level dedup (RefinedWeb-style): a paragraph
    appearing in many documents (cookie banners, subscribe prompts,
    license footers) is kept only at its first global occurrence —
    ordered by ``(id, position)`` — and dropped everywhere else; each
    document is then reassembled in original paragraph order.

    Shape: explode paragraphs → ``groupBy(digest).agg(min(struct(id,
    pos)))`` → semi-join the winners back on ``(digest, id, pos)`` →
    ``collect_list`` + ``array_sort`` to rebuild.  The shuffle key is
    the 16-byte digest, never the text, and — unlike a
    ``row_number() OVER (PARTITION BY digest)`` window — the hottest
    key (by construction the MOST duplicated paragraph, e.g. a
    universal cookie banner in ~10^9 documents) is reduced by a
    map-side-combinable ``min``, not funneled into one task's sort.
    The semi-join key ``(digest, id, pos)`` is unique per row, so it
    carries no skew either.  Documents whose every paragraph was
    dropped survive with ''.
    """
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"),
    ).withColumn("__digest", F.md5(F.col("para").cast("binary")))
    winners = (
        paras.groupBy("__digest")
        .agg(F.min(F.struct(F.col(id_col), F.col("pos"))).alias("__w"))
        .select(
            "__digest",
            F.col("__w")[id_col].alias(id_col),
            F.col("__w")["pos"].alias("pos"),
        )
    )
    kept = paras.join(winners, ["__digest", id_col, "pos"], "leftsemi")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("para")))),
                lambda s: s["para"],
            ),
            sep,
        ).alias(out_col)
    )
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(id_col, F.coalesce(F.col(out_col), F.lit("")).alias(out_col))
    )


def make_shingle_udf(k: int = 3):
    @F.pandas_udf(ArrayType(LongType()))
    def shingle_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _shingle_hashes(t or "", k).astype(np.int64).tolist())

    return shingle_udf


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                        k: int = 3, threshold: float = 0.5,
                        shingled: DataFrame | None = None) -> DataFrame:
    """Exact shingle-Jaccard pairs >= threshold via explode + self-join.

    At scale, pass ``shingled`` (a materialized ``(id, sh)`` frame from
    the same shingle UDF) so the self-join doesn't run the UDF once per
    side — same rationale as ``minhash_lsh_pairs(signatures=...)``.
    """
    sh = shingled if shingled is not None else df.select(
        F.col(id_col), make_shingle_udf(k)(F.col(text_col)).alias("sh")
    )
    sh = sh.withColumn("n_sh", F.size(F.array_distinct("sh")))
    exploded = sh.select(id_col, "n_sh", F.explode(F.array_distinct("sh")).alias("shingle"))
    a = exploded.select(F.col("shingle"), F.col(id_col).alias("id_a"), F.col("n_sh").alias("na"))
    b = exploded.select(F.col("shingle"), F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb"))
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    # integer-exact threshold (ppm compare) and 6-dp half-up jaccard —
    # round(double, 6) of the exact rational common/union is the
    # cross-engine tie class (see functions/exact.py)
    from ..functions.exact import halfup_ratio, ppm

    union = "(na + nb - common)"
    return inter.filter(
        F.col("common") * F.lit(1_000_000)
        >= F.lit(ppm(threshold)) * (F.col("na") + F.col("nb") - F.col("common"))
    ).select(
        "id_a",
        "id_b",
        halfup_ratio("common", union, 6).alias("jaccard"),
    )


def duplicate_token_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
) -> DataFrame:
    """Substring-level exact dedup signal (the suffix-array method of
    "Deduplicating Training Data Makes Language Models Better", Lee et
    al. 2022, re-expressed for a shuffle engine): find every ``window``-
    token span that occurs in MORE THAN ONE document, returning
    (id, pos, win_key, n_docs) for each duplicated span occurrence.

    A suffix array is a single-machine construction; the distributed
    equivalent hashes every length-``window`` token window (a rolling
    shingle at full window grain), counts DISTINCT documents per
    window key, and joins the >1 set back to the occurrences.  A
    cross-document repeated substring of >= ``window`` tokens shares
    ALL of its aligned windows, so recall at that grain is exact;
    shorter repeats are below the detection grain by design (the same
    trade the paper makes at 50 BPE tokens).

    Scale shape: the explode emits n_tokens-window+1 rows per doc, in
    the scan task; the distinct-document count plans as the standard
    two-exchange distinct shape, both stages map-side combinable, with
    only the 16-hex digest riding the shuffle (window TEXT never
    does).  Duplicated keys are a tiny fraction of all windows, so AQE
    broadcasts the >1 set and the occurrence side joins WITHOUT any
    shuffle (observed in the executed plan); past the broadcast
    threshold the join degrades to a digest-keyed hash join.  The
    occurrence subtree is recomputed for the join rather than
    persisted — it is pure scan-side projection, and re-reading the
    scan beats materializing a windows-count-sized intermediate.
    Collisions: 64 bits of md5 — at 10^12 windows expect ~a few false
    merges, the same accepted odds as every digest-keyed dedup here
    (use the full hex for astronomically fewer).
    """
    toks = F.expr(
        r"filter(split(lower({c}), '[ \\t\\n\\f\\r]+'), x -> x <> '')".format(c=text_col)
    )
    base = (
        df.select(F.col(id_col), toks.alias("__toks"))
        .withColumn("__n", F.size("__toks"))
        .filter(F.col("__n") >= window)
    )
    win_text = F.array_join(
        F.slice(F.col("__toks"), F.col("pos") + 1, window), " "
    )
    occ = base.select(
        F.col(id_col),
        F.explode(F.expr(f"sequence(0, __n - {window})")).alias("pos"),
        F.col("__toks"),
    ).select(
        F.col(id_col),
        "pos",
        F.substring(F.md5(win_text.cast("binary")), 1, 16).alias("win_key"),
    )
    dup = (
        occ.groupBy("win_key")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )
    return occ.join(dup, "win_key").select(id_col, "pos", "win_key", "n_docs")


def shingle_novelty(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Inter-document novelty: the fraction of a document's word
    ``k``-shingles that occur in NO other document (RefinedWeb's
    inter-document repetition signal, inverted — low novelty means the
    document is largely assembled from corpus-repeated n-grams).

    Skew-safe by construction — there is no join keyed by the shingle:
    per-document distinct shingles are computed scan-side, the global
    per-shingle document count is a map-side-combinable aggregation (a
    universal boilerplate shingle reduces, never sorts), and uniquely-
    owned shingles (count == 1) carry their single owner in the same
    aggregate (``min == max``), so attribution back to documents is a
    second bounded aggregation — no fan-out join on a hot shingle key.

    Documents with fewer than ``k`` words have no shingles and score
    novelty 1.0 (trivially novel).
    """
    from .scoring import WORDS_EXPR

    words = WORDS_EXPR.format(col=text_col)
    shingles = (
        f"CASE WHEN size({words}) < {k} THEN array() "
        f"ELSE array_distinct(transform(sequence(1, size({words}) - {k} + 1), "
        f"i -> concat_ws(' ', slice({words}, i, {k})))) END"
    )
    with_sh = df.select(F.col(id_col), F.expr(shingles).alias("__shs"))
    pairs = with_sh.select(id_col, F.explode("__shs").alias("__sh"))
    owned_unique = (
        pairs.groupBy("__sh")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min(id_col).alias(id_col),
        )
        .filter(F.col("__n") == 1)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_unique"))
    )
    totals = with_sh.select(
        F.col(id_col), F.size("__shs").cast("bigint").alias("n_shingles")
    )
    return totals.join(owned_unique, id_col, "left").select(
        id_col,
        "n_shingles",
        F.coalesce("n_unique", F.lit(0).cast("bigint")).alias("n_unique"),
        F.when(
            F.col("n_shingles") > 0,
            F.coalesce("n_unique", F.lit(0)).cast("double")
            / F.col("n_shingles").cast("double"),
        )
        .otherwise(F.lit(1.0))
        .alias("novelty"),
    )
