"""Oracle registry — sorts, top-k, set ops, scalar function batteries.

Cut verbatim from the monolithic __spark_entry__.py (r14); every key
registers a Spark query and its DuckDB oracle SQL into this module's
local dicts, merged in frozen order by kdb_spark/oracles/__init__.py.
"""

from __future__ import annotations

from kdb_spark.oracles._shared import *  # noqa: F401,F403

QUERIES, ORACLES, _reg = make_registry()


# -------------------------------------------------------------- sorts / top-k

_reg(
    "sort_series",
    lambda s, d: st.sort_series(events_us(s, d), 7),
    """
    SELECT CAST(row_number() OVER (ORDER BY epoch_us(ts), event_id) AS BIGINT) AS pos,
           event_id, epoch_us(ts) AS ts_us, value
    FROM events WHERE user_id = 7
    """,
)


_reg(
    "topk_per_group",
    lambda s, d: st.topk_per_group(load(s, d, "orders")),
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
    FROM orders QUALIFY rn <= 3
    """,
)


_reg(
    "topk_global",
    lambda s, d: st.topk_global(load(s, d, "orders")),
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)


# ------------------------------------------------------------------- set ops

_reg(
    "set_union",
    lambda s, d: so.set_union(load(s, d, "customer"), "BUILDING", "AUTOMOBILE"),
    """
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
)


_reg(
    "set_intersect",
    lambda s, d: so.set_intersect(load(s, d, "part")),
    """
    SELECT p_brand FROM part WHERE p_size > 40
    INTERSECT
    SELECT p_brand FROM part WHERE p_type = 'ECONOMY'
    """,
)


_reg(
    "set_except",
    lambda s, d: so.set_except(load(s, d, "customer"), load(s, d, "orders"), MIN_PRICE),
    f"""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > {MIN_PRICE}
    """,
)


# ------------------------------------------------------------------- scalars

_reg(
    "scalar_datetime",
    lambda s, d: sc.scalar_datetime(load(s, d, "orders")),
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           count(*) AS n
    FROM orders GROUP BY 1, 2, 3
    """,
)


_reg(
    "scalar_string",
    lambda s, d: sc.scalar_string(load(s, d, "part")),
    """
    SELECT p_partkey,
           lower(p_name) AS lname,
           CAST(length(p_name) AS BIGINT) AS name_len,
           substr(p_name, 1, 5) AS prefix5,
           CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
           regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
           concat_ws('|', p_brand, p_type) AS brand_type
    FROM part
    """,
)


_reg(
    "scalar_math",
    lambda s, d: sc.scalar_math(load(s, d, "lineitem")),
    """
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice) AS BIGINT) AS fl,
           CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
           round(l_extendedprice, 1) AS rnd1,
           abs(l_discount - 0.05) AS adiff,
           sqrt(l_quantity) AS sq,
           CAST(l_orderkey % 7 AS BIGINT) AS m7
    FROM lineitem WHERE l_orderkey < 100
    """,
)


_reg(
    "scalar_array",
    lambda s, d: sc.scalar_array(load(s, d, "embeddings")),
    """
    WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings)
    SELECT vec_id,
           CAST(len(v) AS BIGINT) AS dim,
           v[1] AS first_el,
           round(list_sum(v), 5) AS el_sum,
           round(list_sum(v[1:8]), 5) AS head8_sum
    FROM e
    """,
)


_reg(
    "scalar_map",
    lambda s, d: sc.scalar_map(load(s, d, "events")),
    """
    WITH kv AS (
      SELECT len(json_keys(props)) AS n_keys,
             unnest(json_keys(props)) AS key, props
      FROM events)
    SELECT key, count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.' || key) AS BIGINT)) AS BIGINT) AS sum_val,
           CAST(min(CAST(json_extract(props, '$.' || key) AS BIGINT)) AS BIGINT) AS min_val,
           CAST(max(CAST(json_extract(props, '$.' || key) AS BIGINT)) AS BIGINT) AS max_val,
           CAST(sum(n_keys) AS BIGINT) AS sum_keys
    FROM kv GROUP BY key
    """,
)


_reg(
    "scalar_json",
    lambda s, d: sc.scalar_json(load(s, d, "events")),
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           event_type, count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)


# bitwise scalar surface — kdb's bit verbs; pure int64 expressions
_reg(
    "scalar_bitwise",
    lambda s, d: sc.scalar_bitwise(events_us(s, d)),
    """
    SELECT event_id, user_id,
           CAST(event_id & user_id AS BIGINT) AS b_and,
           CAST(event_id | user_id AS BIGINT) AS b_or,
           CAST(xor(event_id, user_id) AS BIGINT) AS b_xor,
           CAST(event_id << 3 AS BIGINT) AS shl3,
           CAST(event_id >> 2 AS BIGINT) AS shr2,
           CAST(~event_id AS BIGINT) AS b_not,
           CAST(bit_count(xor(event_id, user_id)) AS BIGINT) AS hamming
    FROM events WHERE event_id < 1000
    """,
)


# Portable hash scalar surface: md5/sha2 + the md5->int64 slot idiom the
# repo's exact-parity hashing is built on (engine-specific hashes excluded
# by design — they can't be oracle-checked)
_reg(
    "scalar_hash",
    lambda s, d: sc.scalar_hash(load(s, d, "documents")),
    """
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256,
           CAST(('0x' || substring(md5(text), 1, 15))::BIGINT AS BIGINT)
             AS h_slot
    FROM documents WHERE doc_id < 200
    """,
)


# Pattern-function scalar suite over real text (RE2/Java-common subset)
_reg(
    "scalar_regex",
    lambda s, d: sc.scalar_regex(load(s, d, "documents")),
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers,
           regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
           CAST(len(regexp_extract_all(text, '[A-Za-z]{5,}')) AS BIGINT)
             AS n_long_words,
           CAST(length(regexp_replace(text, '[aeiou]', '*', 'g')) AS BIGINT)
             AS len_after_sub,
           regexp_matches(text, '[.!?]') AS has_sentence_end
    FROM documents
    """,
)


def _q_table_fk_integrity(s: SparkSession, d: str) -> DataFrame:
    from kdb_spark.analytics.aggregations import table_fk_integrity

    names = ["region", "nation", "customer", "supplier", "orders", "lineitem"]
    return table_fk_integrity({t: load(s, d, t) for t in names})


_reg(
    "table_fk_integrity",
    _q_table_fk_integrity,
    """
    SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS relation,
           (SELECT count(*) FROM lineitem) AS n_child_rows,
           (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
              (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
             AS n_orphans
    UNION ALL
    SELECT 'orders.o_custkey->customer.c_custkey',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders r WHERE NOT EXISTS
              (SELECT 1 FROM customer p WHERE p.c_custkey = r.o_custkey))
    UNION ALL
    SELECT 'customer.c_nationkey->nation.n_nationkey',
           (SELECT count(*) FROM customer),
           (SELECT count(*) FROM customer r WHERE NOT EXISTS
              (SELECT 1 FROM nation p WHERE p.n_nationkey = r.c_nationkey))
    UNION ALL
    SELECT 'supplier.s_nationkey->nation.n_nationkey',
           (SELECT count(*) FROM supplier),
           (SELECT count(*) FROM supplier r WHERE NOT EXISTS
              (SELECT 1 FROM nation p WHERE p.n_nationkey = r.s_nationkey))
    UNION ALL
    SELECT 'nation.n_regionkey->region.r_regionkey',
           (SELECT count(*) FROM nation),
           (SELECT count(*) FROM nation r WHERE NOT EXISTS
              (SELECT 1 FROM region p WHERE p.r_regionkey = r.n_regionkey))
    """,
)


_reg(
    "scalar_url",
    lambda s, d: sc.scalar_url(load(s, d, "documents")),
    # same synthetic URL, same RE2-subset regexes (DuckDB regexp_extract
    # group syntax matches); rev is an exact integer pluck
    """
    WITH u AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 3 = 0 THEN 'https://' ELSE 'http://' END)
             || 'cdn' || CAST(doc_id % 7 AS VARCHAR) || '.' || source
             || '.example.org/assets/' || lang || '/doc-'
             || CAST(doc_id AS VARCHAR) || '?rev='
             || CAST(n_chars % 100 AS VARCHAR) || '&lang=' || lang AS url
      FROM documents)
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
           regexp_extract(regexp_extract(url, '^[a-z]+://([^/]+)/', 1),
                          '([a-z0-9-]+\\.[a-z]+)$', 1) AS suffix,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           CAST(regexp_extract(url, '[?&]rev=([0-9]+)', 1) AS BIGINT) AS rev,
           url LIKE 'https://%' AS is_https
    FROM u
    """,
)
