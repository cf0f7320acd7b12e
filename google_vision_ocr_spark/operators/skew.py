"""Explicit skew mitigation: salted joins.

AQE's skew-join handling (on by default in :mod:`..session`) splits
oversized shuffle partitions at runtime, but it only triggers for
sort-merge joins and only after a stage materializes.  When a key's
skew is KNOWN ahead of time — the empty-host bucket, the `en` language
shard, the null join key every warehouse has — pre-salting is the
deterministic fix: split each hot key into ``n_salts`` sub-keys on the
big side and replicate the matching rows of the small side once per
salt, so the hot key's rows spread over ``n_salts`` tasks instead of
one straggler.

Cost model: the small side grows ``n_salts``× (it was small; that's
the premise), the big side doesn't move more bytes than before, and
the join output is IDENTICAL to the unsalted join (asserted in
tests).  For unknown skew, leave it to AQE; for known hot keys this
composes with it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key_cols: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` ⋈ ``small`` on ``key_cols`` with the hot-key rows of
    ``big`` spread across ``n_salts`` sub-partitions.

    The salt is derived deterministically from the big side's full row
    (``xxhash64`` over all columns), so repeated runs shuffle
    identically — no ``rand()`` nondeterminism under task retry, which
    is exactly the failure mode that corrupts salted joins in naive
    implementations (a retried task re-rolling different salts sends
    rows to partitions that already closed)."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        # a right/full join would emit every unmatched small-side row
        # once PER SALT — silently wrong; refuse instead
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("__salt", salt.cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, key_cols + ["__salt"], how).drop("__salt")
