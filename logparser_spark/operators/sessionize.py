"""Sessionization: group a user's events into sessions separated by
>= ``gap`` of inactivity.

Spark-first: the built-in ``session_window`` aggregation — sessions are
merged inside the native aggregate (map-side partial merge of
overlapping windows, skew-safe like any hash aggregate), and the same
expression works over a streaming frame with a watermark (state bounded
by the gap). The oracle twin is classic gaps-and-islands SQL (lag ->
boundary flag -> running sum -> group), which any warehouse can run —
that pairing makes the operator value-checkable in the driver contract.

Semantics note: a session EXTENDS while the next event starts strictly
before last_event + gap; an event exactly at last_event + gap starts a
NEW session (Spark merges on overlap, [t, t+gap) intervals touching at
a point do not overlap) — the oracle's boundary flag is therefore
``diff >= gap``, not ``>``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str = "username",
    time_col: str = "time",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-key sessions: (key, session_start_us, last_event_us,
    n_events). session_start == first event's time (window.start)."""
    return (
        df.groupBy(key, F.session_window(F.col(time_col), gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.unix_micros(F.col(time_col))).alias("last_event_us"),
        )
        .select(
            key,
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "last_event_us",
            "n_events",
        )
    )


def sessionize_oracle_sql(gap_us: int, where: str = "valid") -> str:
    """Gaps-and-islands DuckDB twin over the ``parsed`` CTE relation."""
    return f"""
, ev AS (
  SELECT username, epoch_us,
         CASE WHEN epoch_us - lag(epoch_us) OVER (PARTITION BY username ORDER BY epoch_us)
                   >= {gap_us} OR lag(epoch_us) OVER (PARTITION BY username ORDER BY epoch_us) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM parsed WHERE {where}
), marked AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY username ORDER BY epoch_us
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ev
)
SELECT username, MIN(epoch_us) AS session_start_us, MAX(epoch_us) AS last_event_us,
       COUNT(*) AS n_events
FROM marked GROUP BY username, session_id
ORDER BY username, session_start_us"""
