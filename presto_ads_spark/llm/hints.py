"""Size-gated broadcast hints.

A bare ``F.broadcast`` is mandatory: Spark attempts the broadcast past
``spark.sql.autoBroadcastJoinThreshold`` and dies at the 8 GB broadcast /
driver-memory wall instead of falling back to a shuffle join. For
data-dependent intermediates (LSH candidate-pair lists, candidate-doc
shingle tables) whose size is unbounded on adversarial input — a corpus of
identical boilerplate collapses a whole band into one bucket — the hint
must be gated on an actual size probe so the 100 TB plan degrades to a
shuffle join instead of OOMing.

The probe is bounded: ``limit(max_rows + 1).count()`` never scans more than
``max_rows + 1`` rows even when the input is huge (same pattern as the
``cosine_pairs`` O(N²) guard, similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ~1M rows of narrow (ids + short strings) data stays far under Spark's 8 GB
# broadcast ceiling even with generous per-row hash-relation overhead.
BROADCAST_ROW_CAP = 1_000_000


def fits_broadcast(df: DataFrame, max_rows: int = BROADCAST_ROW_CAP) -> bool:
    """Bounded row-count probe: True iff ``df`` has ≤ ``max_rows`` rows.

    Probe a *persisted* frame where possible — the count then doubles as
    cache materialization instead of an extra computation of the plan.
    """
    return df.limit(max_rows + 1).count() <= max_rows


def gated_broadcast(df: DataFrame, max_rows: int = BROADCAST_ROW_CAP) -> DataFrame:
    """``F.broadcast(df)`` only if a bounded probe shows ≤ ``max_rows`` rows;
    otherwise the un-hinted frame, letting AQE / autoBroadcastJoinThreshold
    pick the join strategy from runtime sizes."""
    return F.broadcast(df) if fits_broadcast(df, max_rows) else df
