"""Session-scoped tracking of persisted intermediate frames.

Operators that ``persist()`` a reused frame (MinHash/SimHash signature
tables, the curate corpus, LSH code tables) register it here.  Spark
only unpersists cached data when the driver-side reference is garbage
collected (ContextCleaner), which is nondeterministic — a long-lived
session running many queries accumulates executor storage.  Callers
that own query boundaries (bench loops, notebook sessions, the driver
harness) call :func:`release_all` between queries to free storage
deterministically.

At 100 TB the right pattern is different: *write* the signature table
to storage (parquet/Iceberg) and read it back for the self-join, so it
survives executor loss and never competes with shuffle memory — see
``docs/SCALE.md``.  ``persist()`` is the single-job optimization; this
registry just keeps it honest across job boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register a persisted frame for later release; returns it unchanged."""
    _TRACKED.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked frame (blocking=False); returns the count."""
    n = 0
    for df in _TRACKED:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    _TRACKED.clear()
    return n
