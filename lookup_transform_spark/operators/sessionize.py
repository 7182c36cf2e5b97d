"""Sessionization and event-stream enrichment (SURVEY.md §2.2 B56).

Batch formulation: per-key gap detection via ``lag`` + cumulative sum of
gap flags. One shuffle on the session key; the window is sorted within
partitions only — scales linearly. The streaming twin is
``F.session_window`` (see streaming/windows.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """Append a ``session_id`` column: 1-based per-key session index.

    A new session starts when the gap to the previous event of the same
    key EXCEEDS ``gap_seconds`` (a gap of exactly ``gap_seconds``
    continues the session — note ``F.session_window``'s half-open
    [ts, ts+gap) windows SPLIT at that exact boundary, so the streaming
    twin differs on boundary-exact data by construction). Ordering is
    (ts, tiebreak) for determinism when timestamps collide.

    A TIMESTAMP ``ts`` column compares at full µs precision
    (``unix_micros`` — a bare ``cast('long')`` floors to whole seconds,
    silently merging sessions up to 1 s wider than the gap); a numeric
    ``ts`` passes through, with ``gap_seconds`` read in the column's
    own units (the µs-epoch registry convention).
    """
    order = [F.col(ts).asc()] + (
        [F.col(order_tiebreak).asc()] if order_tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    ts_dt = events.schema[ts].dataType
    if isinstance(ts_dt, T.TimestampNTZType):
        # NTZ has no unix_micros and refuses cast('long') outright
        # (DATATYPE_MISMATCH at analysis) — reinterpret as an instant
        # first. Gap arithmetic only DIFFERENCES the values, so the
        # fixed offset the reinterpretation pins cancels under any
        # non-DST session timezone (UTC, this engine's default; a DST
        # zone would shift gaps spanning a transition by the offset
        # delta).
        epoch = F.unix_micros(F.col(ts).cast("timestamp"))
        gap_lit = int(gap_seconds) * 1_000_000
    elif isinstance(ts_dt, T.TimestampType):
        epoch = F.unix_micros(F.col(ts))
        gap_lit = int(gap_seconds) * 1_000_000
    elif isinstance(ts_dt, (T.ByteType, T.ShortType, T.IntegerType,
                            T.LongType)):
        epoch = F.col(ts).cast("long")
        gap_lit = gap_seconds
    else:
        raise TypeError(
            f"sessionize: ts column {ts!r} must be TIMESTAMP, "
            f"TIMESTAMP_NTZ, or integral epoch units; got "
            f"{ts_dt.simpleString()}"
        )
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(
        gap.isNull() | (gap > F.lit(gap_lit)), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
