"""Distributed BPE tokenizer training — the first N merges of a
byte-pair-encoding vocabulary, learned from the corpus.

Training a tokenizer is the step between curation and model training;
classic BPE (Sennrich et al. 2016) is inherently iterative: count
adjacent symbol pairs, merge the most frequent, repeat.  The distributed
decomposition is the standard one:

1. **One corpus-scale pass**: ``word -> frequency`` (a hash aggregation;
   at 10^12 documents the distinct-word dictionary is ~10^8 rows — the
   only pass that ever touches the corpus).
2. **Per merge round, dictionary-scale work only**: explode each
   dictionary word's adjacent character pairs weighted by word
   frequency, hash-aggregate (map-side combinable), take the arg-max
   pair (``max_by`` over weight with a lexicographic tie-break), and
   rewrite the dictionary with the merge applied.  Each round is one
   small aggregation plus a 1-row collect — the same driver-loop shape
   as the k-means rounds in operators/similarity.py.

The trick that keeps both application AND the SQL oracle exact: each
merged pair is assigned a fresh single character from the Unicode
private-use area (U+E000 + round), so *applying* a merge greedily
left-to-right is precisely the semantics of ``replace(word, pair,
symbol)`` — identical in Spark and DuckDB (non-overlapping left-to-right
scan; ``replace('aaa','aa',X) = 'Xa'`` in both).  Symbols stay single
characters forever, so pair extraction is always ``substr(word, i, 2)``.

Pair counting uses sequence bigrams (``'aaa'`` contributes ``'aa'``
twice), the standard BPE count.  Input words must not contain U+E000..
U+E0FF (private-use) characters — they would alias merge symbols.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

from .scoring import WORDS_EXPR

#: first private-use codepoint used for merge symbols
PUA_BASE = 0xE000

# words shorter than 2 symbols have no pairs; Spark's sequence(1, 0)
# would DESCEND ([1, 0]), so the length guard is load-bearing
_PAIRS_EXPR = (
    "CASE WHEN length({col}) < 2 THEN array() "
    "ELSE transform(sequence(1, length({col}) - 1), "
    "i -> substr({col}, i, 2)) END"
)


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The one corpus-scale pass: ``(word, freq)`` dictionary."""
    return (
        docs.select(
            F.explode(F.expr(WORDS_EXPR.format(col=text_col))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def bpe_train(
    word_freq: DataFrame, n_merges: int
) -> tuple[list[Row], DataFrame]:
    """Learn ``n_merges`` merges; returns (merge rows, final dictionary).

    Each merge row: ``(round, pair, merged, weight)`` — the two-symbol
    string merged, the fresh symbol it becomes, and its weighted pair
    count at selection time.  Deterministic: ties break on the
    lexicographically smallest pair.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    merges: list[Row] = []
    wf = word_freq
    for k in range(1, n_merges + 1):
        pairs = wf.select(
            F.explode(F.expr(_PAIRS_EXPR.format(col="word"))).alias("pair"),
            "freq",
        )
        best = (
            pairs.groupBy("pair")
            .agg(F.sum("freq").cast("bigint").alias("weight"))
            .orderBy(F.col("weight").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break  # dictionary fully merged — nothing left to pair
        symbol = chr(PUA_BASE + k - 1)
        merges.append(
            Row(round=k, pair=best[0]["pair"], merged=symbol,
                weight=best[0]["weight"])
        )
        wf = wf.select(
            F.expr(f"replace(word, '{best[0]['pair']}', '{symbol}')").alias("word"),
            "freq",
        )
    return merges, wf


def bpe_train_merges(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> DataFrame:
    """End-to-end: corpus → dictionary → merge table DataFrame."""
    merges, _ = bpe_train(word_frequencies(docs, text_col), n_merges)
    spark = docs.sparkSession
    return spark.createDataFrame(
        merges, "round bigint, pair string, merged string, weight bigint"
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[Row],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply learned merges to every document: token count after BPE.

    Scan-side only — the merge list is a handful of literal replaces
    folded into one projection (no join, no shuffle)."""
    word = "w"
    expr = word
    for m in merges:
        expr = f"replace({expr}, '{m['pair']}', '{m['merged']}')"
    # token count of a word = its post-merge character count
    return docs.withColumn(
        out_col,
        F.expr(
            f"aggregate(transform({WORDS_EXPR.format(col=text_col)}, "
            f"{word} -> length({expr})), 0L, (acc, x) -> acc + x)"
        ),
    )
