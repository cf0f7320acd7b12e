"""Snapshot MERGE (upsert) — the incremental-pipeline primitive.

A recurring crawl doesn't rewrite the corpus; it merges a delta:
re-fetched pages replace their old rows, new pages append, everything
else carries forward.  Iceberg/Delta ship this as ``MERGE INTO``; on
plain DataFrames the same semantics are one FULL OUTER join on the key
with column-wise ``coalesce`` (updates win) — the shuffle is keyed by
the merge key on both sides, so at 100 TB it rides the same
partitioning the table is already bucketed by (zero extra exchange on
a bucketed/Iceberg layout, see ``sources/catalog.py``), and the delta
side is typically small enough to broadcast.

Deletes are the standard soft-delete convention: a boolean
``is_delete`` column on the delta filters matched rows out of the new
snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Change-data-capture between two snapshots of the same schema:
    one row per changed key with ``op`` ∈ {insert, update, delete} and
    the surviving values (new side for insert/update, old side for
    delete).  Unchanged keys are dropped via null-safe column equality,
    so a null→null value is "unchanged" and null→x is an update.

    The inverse of :func:`merge_upsert` — ``merge_upsert(old,
    snapshot_diff(old, new), …)`` reconstructs ``new`` — and the same
    scale shape: one full-outer shuffle keyed by the merge key (free on
    a layout already bucketed by it)."""
    if old.columns != new.columns:
        raise ValueError(
            f"snapshot schemas differ: {old.columns} vs {new.columns}"
        )
    value_cols = [c for c in old.columns if c not in key_cols]
    o = old.select(
        *[F.col(c) for c in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in value_cols],
        F.lit(True).alias("__in_o"),
    )
    n = new.select(
        *[F.col(c) for c in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in value_cols],
        F.lit(True).alias("__in_n"),
    )
    j = o.join(n, key_cols, "full_outer")
    changed = F.lit(False)
    for c in value_cols:
        changed = changed | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    op = (
        F.when(F.col("__in_o").isNull(), F.lit("insert"))
        .when(F.col("__in_n").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            "op",
            *[F.col(c) for c in key_cols],
            *[
                F.when(F.col("op") == "delete", F.col(f"__o_{c}"))
                .otherwise(F.col(f"__n_{c}"))
                .alias(c)
                for c in value_cols
            ],
        )
    )


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """New snapshot: updates replace matched target rows, unmatched
    updates append, unmatched target rows carry forward.  ``updates``
    must carry the same columns as ``target`` (plus optionally
    ``delete_col``) and at most ONE row per key — like SQL ``MERGE``,
    a multi-row delta for one key is the caller's bug (the outer join
    would emit one output row per delta row)."""
    value_cols = [c for c in target.columns if c not in key_cols]
    t = target.select(
        *[F.col(c) for c in key_cols],
        *[F.col(c).alias(f"__t_{c}") for c in value_cols],
    )
    u_cols = [F.col(c).alias(f"__u_{c}") for c in value_cols]
    if delete_col is not None:
        u_cols.append(F.col(delete_col).alias("__del"))
    u = updates.select(*[F.col(c) for c in key_cols], *u_cols)
    # matched-marker: non-nullable literal survives the outer join as
    # null on the unmatched side even when every payload column is null
    u = u.withColumn("__matched", F.lit(True))
    j = t.join(u, key_cols, "full_outer")
    if delete_col is not None:
        j = j.filter(~F.coalesce(F.col("__del"), F.lit(False)))
    return j.select(
        *[F.col(c) for c in key_cols],
        *[
            F.when(F.col("__matched").isNotNull(), F.col(f"__u_{c}"))
            .otherwise(F.col(f"__t_{c}"))
            .alias(c)
            for c in value_cols
        ],
    )
