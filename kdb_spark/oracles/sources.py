"""Oracle registry — source/sink adapters, versioned tables, maintenance/diagnostics.

Cut verbatim from the monolithic __spark_entry__.py (r14); every key
registers a Spark query and its DuckDB oracle SQL into this module's
local dicts, merged in frozen order by kdb_spark/oracles/__init__.py.
"""

from __future__ import annotations

from kdb_spark.oracles._shared import *  # noqa: F401,F403

QUERIES, ORACLES, _reg = make_registry()


# ------------------------------------------------------------ sources / sinks
# Adapters in kdb_spark/sources.py; round-trips normalize to exact integer
# types before the write so format transit is bit-exact (see module note).

_reg(
    "scan_parquet",
    src.q_scan_parquet,
    """
    SELECT p_partkey, p_brand, CAST(round(p_retailprice * 100) AS BIGINT) AS price_c
    FROM part WHERE p_size = 15
    """,
)


_reg(
    "scan_csv",
    src.q_scan_csv,
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
)


_reg(
    "scan_json",
    src.q_scan_json,
    """
    SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS date_us,
           CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
    FROM orders WHERE o_orderstatus = 'F'
    """,
)


_reg(
    "scan_text",
    src.q_scan_text,
    """
    SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_line
    FROM documents
    """,
)


_reg(
    "scan_orc",
    src.q_scan_orc,
    """
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
           CAST(round(l_quantity * 100) AS BIGINT) AS qty_c
    FROM lineitem WHERE l_returnflag = 'R'
    """,
)


_reg(
    "scan_binary",
    src.q_scan_binary,
    """
    SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents ORDER BY doc_id LIMIT 50
    """,
)


_reg(
    "sink_delta_like",
    src.q_sink_delta_like,
    """
    SELECT o_orderpriority, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
    FROM orders
    WHERE o_orderpriority <> '1-URGENT' OR o_orderkey % 2 = 0
    GROUP BY 1
    """,
)


_reg(
    "sink_bucketed",
    src.q_sink_bucketed,
    """
    SELECT c_mktsegment, count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """,
)


_reg(
    "sink_zorder",
    src.q_scan_zorder,
    # clustering must change the LAYOUT only, never the answer: the oracle
    # is the plain two-dimensional filter over the original events table
    f"""
    SELECT user_id, epoch_us(ts) // {DAY_US} AS day_idx,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c
    FROM events
    WHERE user_id BETWEEN 10 AND 40
      AND epoch_us(ts) // {DAY_US} BETWEEN 19730 AND 19736
    GROUP BY 1, 2
    """,
)


# table_profile's oracle is generated per column from the same kind
# dispatch the engine uses (numeric/timestamp → double min/max, string →
# lexical), so both sides profile identical shapes.
_PROFILE_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _profile_leg(name: str, kind: str) -> str:
    if kind == "str":
        mn = "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num"
        ms = f"min({name}) AS min_str, max({name}) AS max_str"
    else:
        expr = f"epoch_us({name})" if kind == "ts" else name
        mn = (
            f"CAST(min({expr}) AS DOUBLE) AS min_num, "
            f"CAST(max({expr}) AS DOUBLE) AS max_num"
        )
        ms = "CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
    return f"""
    SELECT '{name}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({name}) AS BIGINT) AS n_null,
           CAST(count(DISTINCT {name}) AS BIGINT) AS ndv, {mn}, {ms}
    FROM orders"""


_reg(
    "table_profile",
    lambda s, d: agg.table_profile(load(s, d, "orders")),
    "\nUNION ALL".join(_profile_leg(n, k) for n, k in _PROFILE_COLS),
)


# ----------------------------------------------------------------- streaming
# Each op is a Structured Streaming program run in batch-equivalence mode
# (AvailableNow trigger drained to a sink; see kdb_spark/streaming.py). The
# oracle is the equivalent batch SQL — the standard streaming correctness
# contract, so these get full value-hash checks, not rows-only.

_reg(
    "ingest_stream",
    lambda s, d: sm.ingest_stream(s, d, NOW_JAN20),
    f"""
    SELECT epoch_us(ts) - epoch_us(ts) % {DAY_US} AS bucket_us,
           CASE WHEN epoch_us(ts) > {NOW_JAN20} THEN 'future' ELSE 'ok' END AS status,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)


_reg(
    "rollup_serve",
    src.q_rollup_serve,
    """
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(ts) % 3600000000 AS hour_us,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
             CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_c,
             CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_c
      FROM events GROUP BY 1, 2)
    SELECT event_type, hour_us, n, sum_c, min_c, max_c,
           CAST((CASE WHEN sum_c < 0 THEN -1 ELSE 1 END)
                * CAST((2000000 * CAST(abs(sum_c) AS HUGEINT) + 100 * n)
                       // (200 * CAST(n AS HUGEINT)) AS BIGINT) AS DOUBLE)
             / 1e6 AS avg_value
    FROM g
    """,
)


_reg(
    "scan_evolved",
    src.q_scan_evolved,
    """
    WITH merged AS (
      SELECT doc_id, text, NULL AS lang FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, text, lang FROM documents WHERE doc_id % 2 = 1)
    SELECT coalesce(lang, '<pre-schema>') AS lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS n_chars
    FROM merged GROUP BY 1
    """,
)


_reg(
    "sink_compact",
    src.q_sink_compact,
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c
    FROM events GROUP BY 1
    """,
)


_reg(
    "scan_time_travel",
    src.q_scan_time_travel,
    f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
           CAST(min(event_id) AS BIGINT) AS min_id,
           CAST(max(event_id) AS BIGINT) AS max_id
    FROM events
    WHERE epoch_us(ts) // {DAY_US} - 19723 < 20
    GROUP BY event_type
    """,
)


_reg(
    "sink_upsert",
    src.q_sink_upsert,
    # merged table = untouched days <10 at original cents, days 10..19 at
    # cents+100 (days 10..14 REPLACED once, 15..19 appended)
    f"""
    WITH d AS (SELECT event_type,
                      CAST(round(value * 100) AS BIGINT) AS c,
                      epoch_us(ts) // {DAY_US} - 19723 AS day
               FROM events)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN day < 10 THEN c ELSE c + 100 END) AS BIGINT)
             AS sum_c
    FROM d WHERE day < 20
    GROUP BY event_type
    """,
)


_reg(
    "sink_partitioned",
    src.q_sink_partitioned,
    """
    WITH e AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS value_c,
             epoch_us(ts) // 86400000000 AS day_idx
      FROM events)
    SELECT CAST(day_idx AS BIGINT) AS day_idx, event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN day_idx = 19735 THEN value_c * 2
                         ELSE value_c END) AS BIGINT) AS sum_c
    FROM e
    WHERE day_idx BETWEEN 19734 AND 19736
    GROUP BY 1, 2
    """,
)


# incremental (CDF) read over the versioned table: manifest-diff planning,
# scans only the v0->v1 increment (days 10..19); oracle = the same day
# filter over raw events
_reg(
    "scan_changes",
    src.q_scan_changes,
    f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
           CAST(min(event_id) AS BIGINT) AS min_id,
           CAST(max(event_id) AS BIGINT) AS max_id
    FROM events
    WHERE epoch_us(ts) // {DAY_US} - 19723 >= 10
      AND epoch_us(ts) // {DAY_US} - 19723 < 20
    GROUP BY event_type
    """,
)


# count-of-counts skew census of the user_id key: log2 buckets of rows-per-
# key via the same bit-math bucket as agg_hdr_histogram; pct integer-rounded
_reg(
    "table_key_skew",
    lambda s, d: agg.table_key_skew(events_us(s, d)),
    """
    WITH per AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
    g AS (
      SELECT CAST(length(bin(n)) - 1 AS INT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(max(n) AS BIGINT) AS max_per_key
      FROM per GROUP BY 1),
    t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS t FROM g)
    SELECT bucket, (CAST(1 AS BIGINT) << bucket) AS lo,
           n_keys, n_rows, max_per_key,
           CAST((2000000 * CAST(n_rows AS HUGEINT) + t)
                // (2 * CAST(t AS HUGEINT)) AS DOUBLE) / 1e6 AS pct_rows
    FROM g, t
    """,
)


# SCD type-2 dimension history sink: full-snapshot merge closes changed/
# absent keys and opens new versions; oracle derives the expected history
# census directly from the customer table
_reg(
    "sink_scd2",
    src.q_sink_scd2,
    """
    WITH c AS (
      SELECT c_custkey, c_mktsegment,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
      FROM customer),
    rows_all AS (
      SELECT c_mktsegment AS segment, 1 AS is_open, bal_c
      FROM c WHERE bal_c < 500000
      UNION ALL
      SELECT 'UPGRADED', 1, bal_c FROM c WHERE bal_c >= 500000
      UNION ALL
      SELECT c_mktsegment, 0, bal_c FROM c WHERE bal_c >= 500000)
    SELECT segment,
           CAST(sum(is_open) AS BIGINT) AS n_open,
           CAST(sum(1 - is_open) AS BIGINT) AS n_closed,
           CAST(sum(CASE WHEN is_open = 1 THEN bal_c ELSE 0 END) AS BIGINT)
             AS sum_open_c
    FROM rows_all GROUP BY 1
    """,
)


# Feed-health census vs the virtual clock: last-seen age + trailing
# window counts, one conditional aggregate
_reg(
    "table_freshness",
    lambda s, d: agg.table_freshness(events_us(s, d), NOW_JAN20),
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(max(epoch_us(ts)) AS BIGINT) AS last_ts_us,
           CAST({NOW_JAN20} - max(epoch_us(ts)) AS BIGINT) AS age_us,
           CAST(sum(CASE WHEN epoch_us(ts) > {NOW_JAN20} - {HOUR_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_1h,
           CAST(sum(CASE WHEN epoch_us(ts) > {NOW_JAN20} - {24 * HOUR_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_24h,
           CAST(sum(CASE WHEN epoch_us(ts) > {NOW_JAN20} - {7 * 24 * HOUR_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_7d
    FROM events GROUP BY 1
    """,
)


# VACUUM the versioned table: expire old manifests, delete unreferenced
# dirs, read-back byte-identical for surviving versions
_reg(
    "sink_vacuum",
    src.q_sink_vacuum,
    f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
           CAST(min(epoch_us(ts) // {DAY_US}) AS BIGINT) AS min_day
    FROM events
    WHERE epoch_us(ts) // {DAY_US} - 19723 < 30
    GROUP BY event_type
    """,
)


# DESCRIBE HISTORY for the versioned table: the commit sequence fully
# determines the history rows, so the oracle is the expected literals
_reg(
    "scan_history",
    src.q_scan_history,
    """
    SELECT * FROM (VALUES
      (CAST(0 AS BIGINT), 'overwrite', CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
      (CAST(1 AS BIGINT), 'append',    CAST(2 AS BIGINT), CAST(0 AS BIGINT)),
      (CAST(2 AS BIGINT), 'merge',     CAST(20 AS BIGINT), CAST(20 AS BIGINT))
    ) AS t(version, mode, n_dirs, n_mapped)
    """,
)


# PERMISSIVE dirty-CSV census: deterministic fixture, so the oracle is the
# literal expected row (type failures AND token-count anomalies quarantine
# under the full-column parse the census deliberately forces — see the
# impl docstring for the column-pruning trap it pins)
_reg(
    "scan_csv_malformed",
    src.q_scan_csv_malformed,
    """
    SELECT CAST(9 AS BIGINT) AS n_rows,
           CAST(4 AS BIGINT) AS n_corrupt,
           CAST(19 AS BIGINT) AS sum_good_id,
           CAST(3 AS BIGINT) AS n_good_types,
           CAST(2250 AS BIGINT) AS sum_good_value_c,
           CAST(62 AS BIGINT) AS corrupt_chars
    """,
)


_reg(
    "scan_csv_gzip",
    src.q_scan_csv_gzip,
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
)


_reg(
    "sink_cdc_apply",
    src.q_sink_cdc_apply,
    # replay the same md5-derived change batch relationally: D drops,
    # seq-2 U (+100) beats the seq-1 decoy (+999), I appends shifted keys
    """
    WITH snap AS (
      SELECT o_orderkey AS k,
             CAST(round(o_totalprice * 100) AS BIGINT) AS payload,
             ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT
               % 10 AS slot
      FROM orders),
    applied AS (
      SELECT k, payload + 100 AS payload FROM snap WHERE slot IN (1, 2)
      UNION ALL
      SELECT k + 1000000000, 555 FROM snap WHERE slot = 3
      UNION ALL
      SELECT k, payload FROM snap WHERE slot NOT IN (0, 1, 2))
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(payload) AS BIGINT) AS sum_payload,
           CAST(sum(CASE WHEN k >= 1000000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_inserted
    FROM applied
    """,
)


_reg(
    "scan_json_nested",
    src.q_scan_json_nested,
    # adjudicates the nested round-trip symbolically: the same per-
    # priority census straight off the relational join
    """
    SELECT o.o_orderpriority,
           CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(count(l.l_linenumber) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS items_price_c,
           CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS items_qty
    FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY 1
    """,
)
