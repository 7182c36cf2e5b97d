"""Sessionization and event-stream enrichment (SURVEY.md §2.2 B56).

Batch formulation: per-key gap detection via ``lag`` + cumulative sum of
gap flags. One shuffle on the session key; the window is sorted within
partitions only — scales linearly. The streaming twin is
``F.session_window`` (see streaming/windows.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """Append a ``session_id`` column: 1-based per-key session index.

    A new session starts when the gap to the previous event of the same
    key exceeds ``gap_seconds``. Ordering is (ts, tiebreak) for
    determinism when timestamps collide.
    """
    order = [F.col(ts).asc()] + (
        [F.col(order_tiebreak).asc()] if order_tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    epoch = F.col(ts).cast("long")
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(
        gap.isNull() | (gap > F.lit(gap_seconds)), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
