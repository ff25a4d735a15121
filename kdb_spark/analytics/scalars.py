"""Scalar function coverage (SURVEY.md §2.B) — date/time, string, math,
array, map, JSON. The reference's only scalar math is ts flooring
(`dbase/dbase.go:127,163-164`) and a string join (`dbase/dbase.go:292`);
this is the standard library an analytics user expects.

All expressions are JVM built-ins inside whole-stage codegen — no UDFs.
Derivations that must match the DuckDB oracle avoid engine-divergent
functions (locale-dependent formats, libm transcendentals other than sqrt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scalar_datetime(orders: DataFrame) -> DataFrame:
    """date_trunc / extract family over o_orderdate (timestamp_ntz)."""
    return (
        orders.select(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
            F.month("o_orderdate").cast("long").alias("mo"),
        )
        .groupBy("yr", "qtr", "mo")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def scalar_string(part: DataFrame) -> DataFrame:
    """lower / length / substring / split / concat_ws / regexp_extract."""
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("prefix5"),
        F.size(F.split("p_name", " ")).cast("long").alias("n_words"),
        F.regexp_extract("p_name", "^([a-z]+)", 1).alias("first_word"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


def scalar_math(lineitem: DataFrame) -> DataFrame:
    """floor/ceil/round/abs/sqrt/mod — all IEEE-exact per row (sqrt is
    correctly rounded, so it matches across engines; exp/ln would not)."""
    return lineitem.filter(F.col("l_orderkey") < 100).select(
        "l_orderkey",
        "l_linenumber",
        F.floor("l_extendedprice").cast("long").alias("fl"),
        F.ceil("l_extendedprice").cast("long").alias("ce"),
        F.round("l_extendedprice", 1).alias("rnd1"),
        F.abs(F.col("l_discount") - 0.05).alias("adiff"),
        F.sqrt("l_quantity").alias("sq"),
        (F.col("l_orderkey") % 7).cast("long").alias("m7"),
    )


def scalar_array(embeddings: DataFrame) -> DataFrame:
    """size / element_at / slice / aggregate (sequential double fold —
    order-deterministic, matches DuckDB's list_sum over the same transform)."""
    vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return embeddings.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_el"),
        F.round(
            F.aggregate(vec_d, F.lit(0.0), lambda acc, x: acc + x), 5
        ).alias("el_sum"),
        F.round(
            F.aggregate(
                F.slice(vec_d, 1, 8), F.lit(0.0), lambda acc, x: acc + x
            ),
            5,
        ).alias("head8_sum"),
    )


def scalar_map(events: DataFrame) -> DataFrame:
    """Map functions: from_json → map<string,bigint>, map_keys, explode(map)
    → per-key stats. The map never leaves the JVM."""
    m = F.from_json("props", "map<string,bigint>")
    kv = events.select(
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
        F.explode(m).alias("key", "val"),
    )
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("val").alias("sum_val"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
        F.sum("n_keys").alias("sum_keys"),
    )


def scalar_json(events: DataFrame) -> DataFrame:
    """JSON path extraction over the props payload + map building."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select(k.alias("k"), "event_type")
        .groupBy((F.col("k") % 10).alias("k_mod"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def scalar_bitwise(events: DataFrame) -> DataFrame:
    """Bitwise scalar surface: AND / OR / XOR / shifts / NOT / popcount —
    kdb's native bit verbs (and the workhorse of bitmap/bloom/simhash
    composition across this repo: dedup_simhash's Hamming distance,
    agg_bitmap_distinct's word ops, emb_hamming_topk). All pure int64
    expressions, exact on any engine; popcount via the repo-standard
    bit_count. One projection, whole-stage codegen, map-only.
    """
    a = F.col("event_id")
    b = F.col("user_id")
    return events.filter(F.col("event_id") < 1000).select(
        "event_id",
        "user_id",
        a.bitwiseAND(b).cast("long").alias("b_and"),
        a.bitwiseOR(b).cast("long").alias("b_or"),
        a.bitwiseXOR(b).cast("long").alias("b_xor"),
        F.expr("shiftleft(event_id, 3)").cast("long").alias("shl3"),
        F.expr("shiftright(event_id, 2)").cast("long").alias("shr2"),
        F.expr("~event_id").cast("long").alias("b_not"),
        F.bit_count(a.bitwiseXOR(b)).cast("long").alias("hamming"),
    )


def scalar_hash(documents: DataFrame) -> DataFrame:
    """Cross-engine-portable hash scalar surface: md5 / sha2-256
    hex digests plus the md5-prefix-to-int64 idiom — the
    PORTABLE hash family every exact-parity operator in this repo builds
    on (dedup_exact's content keys, sample_hash's md5-slot gates,
    agg_count_min's seed-free sketch rows). Deliberately EXCLUDES
    Spark-native xxhash64/crc32: engine-specific hashes cannot be
    oracle-checked, which is exactly why the repo standardized on md5
    (the docstring-level contract this key pins).

    Map-only projection over a bounded id slice; standard-library hash
    kernels are JVM-side, no UDF.
    """
    t = F.col("text")
    return documents.filter(F.col("doc_id") < 200).select(
        "doc_id",
        F.md5(t).alias("h_md5"),
        F.sha2(t, 256).alias("h_sha256"),
        # the repo's md5→int64 slot device: first 15 hex chars (60 bits)
        F.expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
        .alias("h_slot"),
    )


def scalar_regex(documents: DataFrame) -> DataFrame:
    """regexp_count / extract / extract_all-size / replace / instr-like —
    the pattern-function suite over real text, restricted to the
    RE2/Java-common syntax subset (explicit classes, no lookaround, no
    shorthand class whose Unicode scope differs between engines), so
    every scalar is bit-identical cross-engine. Map-only."""
    return documents.select(
        "doc_id",
        F.regexp_count("text", F.lit("[0-9]+")).cast("long").alias("n_numbers"),
        F.regexp_extract("text", "([A-Za-z]+)", 1).alias("first_word"),
        F.size(F.regexp_extract_all("text", F.lit("[A-Za-z]{5,}"), 0))
        .cast("long")
        .alias("n_long_words"),
        F.length(F.regexp_replace("text", "[aeiou]", "*")).cast("long").alias(
            "len_after_sub"
        ),
        (F.regexp_instr("text", F.lit("[.!?]")) > 0).alias("has_sentence_end"),
    )


def scalar_url(documents: DataFrame) -> DataFrame:
    """URL parsing scalars over synthetic-but-realistic URLs built from
    row data (scheme://host/path?query) — host, registrable suffix,
    path, query-parameter pluck, and an https flag. All via RE2/Java-
    common regexes (no parse_url: Spark has it, DuckDB does not — the
    regex subset is the portable contract, as in scalar_regex). Map-only.
    """
    url = F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.lit("https://")).otherwise(
            F.lit("http://")
        ),
        F.lit("cdn"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("."),
        F.col("source"),
        F.lit(".example.org/assets/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id").cast("string"),
        F.lit("?rev="),
        (F.col("n_chars") % 100).cast("string"),
        F.lit("&lang="),
        F.col("lang"),
    )
    u = documents.select("doc_id", url.alias("url"))
    host = F.regexp_extract("url", "^[a-z]+://([^/]+)/", 1)
    return u.select(
        "doc_id",
        "url",
        host.alias("host"),
        F.regexp_extract(host, "([a-z0-9-]+\\.[a-z]+)$", 1).alias("suffix"),
        F.regexp_extract("url", "^[a-z]+://[^/]+(/[^?]*)", 1).alias("path"),
        F.regexp_extract("url", "[?&]rev=([0-9]+)", 1).cast("long").alias("rev"),
        F.col("url").startswith("https://").alias("is_https"),
    )
