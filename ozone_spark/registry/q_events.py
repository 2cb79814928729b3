"""Event analytics — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace


# ---------------------------------------------------------------------------
# event-time analytics (ST6 north star)
# ---------------------------------------------------------------------------

# shared sessionization prelude (30-minute gap rule) ending in the
# per-(user, session) aggregate `sess`; used by events_sessionize and
# events_session_distribution
_SESSIONIZE_CTES = """WITH e AS (
  SELECT user_id, event_id, ts, value, epoch_ms(ts) // 1000 AS tss FROM events
), l AS (
  SELECT *, lag(tss) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM e
), s AS (
  SELECT *, CASE WHEN prev IS NOT NULL AND tss - prev > 1800 THEN 1 ELSE 0 END
    AS new_sess FROM l
), c AS (
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM s
), sess AS (
  SELECT user_id, session_id, count(*) AS n_events,
    CAST(max(tss) - min(tss) AS BIGINT) AS duration_s,
    round(sum(value), 4) AS total_value
  FROM c GROUP BY 1, 2
)"""


EVENT_QUERIES = [
    _q(
        "events_tumbling_daily",
        lambda spark, sf: eops.tumbling_daily(views(spark, sf)["events"]),
        """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
  count(*) AS n_events, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
        bench=True,
    ),
    _q(
        "events_sliding_6h",
        lambda spark, sf: eops.sliding_hourly(views(spark, sf)["events"]),
        """SELECT window_start_ms, window_start_ms + 21600000 AS window_end_ms,
  count(*) AS n_events
FROM (SELECT (epoch_ms(ts) // 10800000) * 10800000 - o * 10800000 AS window_start_ms
      FROM events, (SELECT unnest([0, 1]) AS o))
GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "events_sessionize",
        lambda spark, sf: eops.sessionize(views(spark, sf)["events"]),
        _SESSIONIZE_CTES + """
SELECT user_id, session_id, n_events, duration_s, total_value
FROM sess ORDER BY 1, 2""",
        bench=True,
    ),
    _q(
        "events_top_users",
        lambda spark, sf: eops.top_users_per_type(views(spark, sf)["events"]),
        """SELECT event_type, user_id, total_value, n_events, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY total_value DESC, user_id) AS rank
  FROM (SELECT event_type, user_id, round(sum(value), 4) AS total_value,
               count(*) AS n_events
        FROM events GROUP BY 1, 2)
) WHERE rank <= 3 ORDER BY event_type, rank""",
    ),
]
