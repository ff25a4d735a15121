"""Oracle registry — kernel verbs + filter/project (SURVEY §2.A adjudication keys).

Cut verbatim from the monolithic __spark_entry__.py (r14); every key
registers a Spark query and its DuckDB oracle SQL into this module's
local dicts, merged in frozen order by kdb_spark/oracles/__init__.py.
"""

from __future__ import annotations

from kdb_spark.oracles._shared import *  # noqa: F401,F403

QUERIES, ORACLES, _reg = make_registry()


# --------------------------------------------------------------------- kernel

_reg(
    "kernel_get_dense",
    lambda s, d: kn.get_dense(events_us(s, d), s, 7, "view", T_JAN10, T_JAN12),
    f"""
    WITH spine AS (SELECT range AS slot_us FROM range({T_JAN10}, {T_JAN12}, 60000000)),
    d AS (
      SELECT epoch_us(ts) - epoch_us(ts) % 60000000 AS slot_us,
             arg_max(value, event_id) AS v
      FROM events
      WHERE user_id = 7 AND event_type = 'view'
        AND epoch_us(ts) >= {T_JAN10} AND epoch_us(ts) < {T_JAN12}
      GROUP BY 1)
    SELECT s.slot_us, coalesce(d.v, 0.0) AS value
    FROM spine s LEFT JOIN d USING (slot_us)
    """,
)


_reg(
    "kernel_find_dense",
    lambda s, d: kn.find_dense(
        events_us(s, d), s, 7, None, T_JAN10, T_JAN17, res=HOUR_US
    ),
    f"""
    WITH data AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, value, event_id
      FROM events
      WHERE user_id = 7 AND epoch_us(ts) >= {T_JAN10} AND epoch_us(ts) < {T_JAN17}),
    series AS (SELECT DISTINCT user_id, event_type FROM data),
    spine AS (SELECT range AS slot_us FROM range({T_JAN10}, {T_JAN17}, 3600000000)),
    lww AS (
      SELECT user_id, event_type, ts_us - ts_us % 3600000000 AS slot_us,
             arg_max(value, event_id) AS v
      FROM data GROUP BY 1, 2, 3)
    SELECT s.user_id, s.event_type, p.slot_us, coalesce(l.v, 0.0) AS value
    FROM series s CROSS JOIN spine p
    LEFT JOIN lww l ON l.user_id = s.user_id AND l.event_type = s.event_type
                   AND l.slot_us = p.slot_us
    """,
)


_reg(
    "kernel_ingest_validate",
    lambda s, d: kn.ingest_validate(events_us(s, d), NOW_JAN20),
    f"""
    SELECT epoch_us(ts) - epoch_us(ts) % {DAY_US} AS bucket_us,
           CASE WHEN epoch_us(ts) > {NOW_JAN20} THEN 'future' ELSE 'ok' END AS status,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)


_reg(
    "kernel_retention",
    lambda s, d: kn.retention_filter(events_us(s, d), CUT_JAN08),
    f"""
    SELECT bucket_us, count(*) AS n FROM (
      SELECT epoch_us(ts) - epoch_us(ts) % {DAY_US} AS bucket_us FROM events)
    WHERE bucket_us >= {CUT_JAN08} GROUP BY 1
    """,
)


_reg(
    "series_filter",
    lambda s, d: kn.series_filter(events_us(s, d), 7, "click", T_JAN10, T_JAN17),
    f"""
    SELECT event_id, epoch_us(ts) AS ts_us, value FROM events
    WHERE user_id = 7 AND event_type = 'click'
      AND epoch_us(ts) >= {T_JAN10} AND epoch_us(ts) < {T_JAN17}
    """,
)


_reg(
    "payload_project",
    lambda s, d: kn.payload_project(load(s, d, "events")),
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, value
    FROM events
    """,
)
