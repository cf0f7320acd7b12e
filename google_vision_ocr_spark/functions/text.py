"""Text-analysis primitives for a training-data pipeline.

Beyond the reference's scope (it only extracts text); these are the
operations a 100 TB web-text curation pipeline layers on top of
extraction: language ID, quality scoring, token counting, document
fingerprinting.  Pure, deterministic functions — vectorized over numpy
/ pandas batches where it matters; the Spark wrappers live in
``operators/`` and expose them as pandas UDFs or column expressions.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pandas as pd

# --- language ID (character n-gram heuristic) ------------------------------

# Tiny signature profiles: most characteristic trigrams / characters per
# language.  Deterministic heuristic, not a trained model.
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", " an", "and", "ing", " of", "ion", " to"),
    "de": ("der", "die", "und", "ein", "sch", " de", "ich", "cht"),
    "es": (" de", "os ", " la", "ión", "ent", " el", "que", "ado"),
    "fr": (" de", "es ", " le", "ent", "que", " la", "ion", "ait"),
}
_CJK = re.compile(r"[一-鿿]")
_KANA = re.compile(r"[぀-ヿ]")


def lang_id(text: str) -> str:
    """Guess a language code from character n-gram evidence."""
    if not text:
        return "und"
    sample = text[:4000].lower()
    if _KANA.search(sample):
        return "jp"
    if _CJK.search(sample):
        return "zh"
    best_lang, best_score = "und", 0
    for lang, grams in _LANG_PROFILES.items():
        score = sum(sample.count(g) for g in grams)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang if best_score > 0 else "und"


def lang_id_series(texts: pd.Series) -> pd.Series:
    return texts.fillna("").map(lang_id)


# --- quality scoring --------------------------------------------------------

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be on for with as at by it "
    "this that from not have has had but they you he she we i".split()
)
_PUNCT = frozenset(".,!?;:'\"()[]{}-")
# The explicit RE2-whitespace class is load-bearing: the DuckDB
# oracles tokenize with RE2, whose \s is exactly [ \t\n\f\r] — ASCII
# only (Python's Unicode \S would swallow NBSP/ideographic spaces)
# AND without \x0B (Python's ASCII \s and Java's \s both include the
# vertical tab; RE2's does not — verified, and real crawls carry it)
_TOKEN_RE = re.compile(r"[^ \t\n\f\r]+")
_ASCII_WS = frozenset(" \t\n\f\r")


def _is_alnum_sql(c: str) -> bool:
    """Mirror of RE2 ``[\\pL\\pN]`` (Unicode letter or number) — what
    the quality oracle counts; Python's ``str.isalnum`` agrees on all
    of L*/N* but the category test keeps the spec single-sourced."""
    return unicodedata.category(c)[0] in ("L", "N")


def quality_score(text: str) -> float:
    """Scalar quality in [0, 1]: length + shape + punctuation + stopword
    evidence, damped by the alphanumeric ratio (symbol-soup ⇒ ~0).

    Computed as an EXACT integer rational and half-up rounded in
    integer space: every term is a ratio of integer counts, so
    score = base_num·md / (2500·n_tokens·non_space) with
    base_num = 2·min(n,500)·nt + {500|250}·nt + {500|250}·nt +
    500·min(5·stop, nt) and md = min(2·alnum, non_space).  A float
    pipeline here (the pre-round-4 form) ends in round(double, 6),
    the cross-engine tie class; the integer spec is mirrored verbatim
    by the DuckDB oracles (_QUALITY_CASE_SQL, full-int64-range via the
    seed-and-correct halfup in functions/exact.py; this Python side is
    arbitrary-precision)."""
    n = len(text)
    tokens = _TOKEN_RE.findall(text)
    nt = len(tokens)
    if nt == 0:
        return 0.0
    # ASCII whitespace only + \pL\pN alnum — the oracle's RE2 counts
    ns = sum(1 for c in text if c not in _ASCII_WS)
    if ns == 0:
        return 0.0
    sum_len = sum(len(t) for t in tokens)
    punct = sum(1 for c in text if c in _PUNCT)
    stop = sum(
        1 for t in tokens if t.lower().strip("".join(_PUNCT)) in _STOPWORDS
    )
    alnum = sum(1 for c in text if _is_alnum_sql(c))
    base_num = (
        2 * min(n, 500) * nt
        + (500 if 2 * nt <= sum_len <= 12 * nt else 250) * nt
        + (500 if 5 * punct <= n else 250) * nt
        + 500 * min(5 * stop, nt)
    )
    num = base_num * min(2 * alnum, ns)
    den = 2500 * nt * ns
    return (10**6 * (num // den) + (2 * 10**6 * (num % den) + den) // (2 * den)) / 1e6


# --- token counting ---------------------------------------------------------

# BPE-ish word/number/punctuation split, GPT-2-style but simplified and
# fully deterministic.
# explicit RE2-whitespace class in the punctuation arm (the oracle's
# RE2 \s is [ \t\n\f\r]; Python's \s would also exclude \x0B/NBSP)
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]{1,3}|[^ \t\n\f\rA-Za-z0-9]")


def count_tokens_ws(text: str) -> int:
    """Whitespace token count."""
    return len(_TOKEN_RE.findall(text))


def count_tokens_bpe(text: str) -> int:
    """BPE-ish subword-regex token count."""
    return len(_BPE_RE.findall(text))


# --- document fingerprinting ------------------------------------------------

_FP_BASE = np.uint64(1000003)
_FP_MOD_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def rolling_fingerprint(text: str) -> int:
    """Polynomial rolling hash of the whole document (64-bit)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    h = np.uint64(1469598103934665603)  # FNV offset basis
    base = _FP_BASE
    with np.errstate(over="ignore"):  # modular 2^64 arithmetic is intended
        for chunk_start in range(0, data.size, 4096):
            chunk = data[chunk_start : chunk_start + 4096]
            for b in chunk:
                h = (h * base + b) & _FP_MOD_MASK
    return int(h)


def rolling_fingerprint_series(texts: pd.Series) -> pd.Series:
    return texts.fillna("").map(rolling_fingerprint).astype("uint64")


def shingles(text: str, k: int = 3) -> set[str]:
    """Word k-shingles (lowercased) for Jaccard/MinHash dedup."""
    words = [w.lower() for w in _TOKEN_RE.findall(text)]
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


# --- Unicode normalization (extraction cleanup) ----------------------------

# C0 controls except tab/newline/CR, plus DEL — the bytes real crawls
# carry out of broken encodings and terminal dumps
_CTRL_RE = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")
# ASCII \s on purpose: Python's Unicode \s would also eat NBSP/thin
# spaces that DuckDB's RE2 \s (ASCII-only) keeps — and those are
# content, not layout, after NFC
_WS_RE = re.compile(r"\s+", re.ASCII)


def normalize_text(text: str) -> str:
    """Canonical text cleanup every extraction pipeline runs before
    hashing/dedup: Unicode NFC (combining sequences compose, so
    'cafe'+U+0301 and precomposed 'café' hash identically), control
    characters stripped, whitespace collapsed to single spaces, ends
    trimmed.  Mirrors DuckDB ``nfc_normalize`` + regexp chain exactly
    (pinned by the contract query)."""
    import unicodedata

    t = unicodedata.normalize("NFC", text or "")
    t = _CTRL_RE.sub("", t)
    return _WS_RE.sub(" ", t).strip()


def normalize_text_series(texts: pd.Series) -> pd.Series:
    return texts.map(normalize_text)
