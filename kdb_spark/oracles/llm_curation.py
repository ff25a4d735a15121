"""Oracle registry — LLM pipeline: splits, mixing, packing, PII, dataset cards.

Cut verbatim from the monolithic __spark_entry__.py (r14); every key
registers a Spark query and its DuckDB oracle SQL into this module's
local dicts, merged in frozen order by kdb_spark/oracles/__init__.py.
"""

from __future__ import annotations

from kdb_spark.oracles._shared import *  # noqa: F401,F403

QUERIES, ORACLES, _reg = make_registry()


_reg(
    "dataset_split",
    lambda s, d: cu.dataset_split(load(s, d, "documents")),
    """
    WITH b AS (SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
               FROM documents)
    SELECT doc_id, bucket,
           CASE WHEN bucket < 'c0' THEN 'train'
                WHEN bucket < 'e0' THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)


_reg(
    "sample_hash",
    lambda s, d: cu.sample_hash(load(s, d, "documents"), pct=10),
    """
    SELECT doc_id, text, lang, source, n_chars FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 10
    """,
)


_reg(
    "pii_redact",
    lambda s, d: cu.pii_redact(load(s, d, "documents")),
    r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '[0-9]{10,}', '<NUM>', 'g') AS clean_text,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '[0-9]{10,}')) AS BIGINT) AS n_longnums
    FROM documents
    """,
)


_reg(
    "pack_sequences",
    lambda s, d: cu.pack_sequences(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 64 AS bucket,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tok
      FROM documents),
    c AS (
      SELECT doc_id, bucket, n_tok,
             sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id) - n_tok AS start_off
      FROM t)
    SELECT doc_id, bucket, n_tok,
           CAST(bucket * 1000000000 + start_off // 256 AS BIGINT) AS pack_id,
           CAST(start_off % 256 AS BIGINT) AS pack_offset
    FROM c
    """,
)


_reg(
    "chunk_documents",
    lambda s, d: cu.chunk_documents(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents),
    c AS (
      SELECT doc_id, toks,
             unnest(range(0, greatest(1, CAST(ceil((len(toks) - 8) / 56.0) AS INT)))) AS chunk_id
      FROM t)
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           array_to_string(toks[chunk_id * 56 + 1 : chunk_id * 56 + 64], ' ') AS chunk_text,
           CAST(least(len(toks) - chunk_id * 56, 64) AS BIGINT) AS n_tok_chunk
    FROM c
    """,
)


_reg(
    "stratified_sample",
    lambda s, d: cu.stratified_sample(load(s, d, "documents")),
    """
    SELECT doc_id, lang, source FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 <
          CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 50 WHEN 'fr' THEN 25 ELSE 0 END
    """,
)


_reg(
    "mix_weights",
    lambda s, d: cu.mix_weights(load(s, d, "documents")),
    """
    WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                        CAST(sum(n_chars) AS BIGINT) AS chars
                 FROM documents GROUP BY 1),
    tot AS (SELECT CAST(sum(chars) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS k
            FROM per)
    SELECT source, n_docs, chars AS n_chars_sum,
           round(least(1.0, (CAST(total AS DOUBLE) / k) / chars), 6) AS mix_rate,
           CAST(round(round(least(1.0, (CAST(total AS DOUBLE) / k) / chars), 6)
                      * chars) AS BIGINT) AS expected_chars
    FROM per CROSS JOIN tot
    """,
)


# Composition proof: normalize → quality-gate → content-hash dedup →
# md5-bucket split → per-split accounting, one content-hash shuffle total.
_reg(
    "pipeline_corpus_prep",
    lambda s, d: cu.pipeline_corpus_prep(load(s, d, "documents")),
    r"""
    WITH c AS (
      SELECT doc_id, text,
             lower(trim(regexp_replace(
               regexp_replace(text, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', ' ', 'g'),
               '[\s]+', ' ', 'g'))) AS norm_text,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents),
    r AS (SELECT doc_id, norm_text,
                 len(toks) AS n_toks,
                 len([x FOR x IN toks
                      IF list_contains(['the','a','of','and','to','in','is'], x)])
                   / greatest(len(toks), 1) AS stop_ratio,
                 len(regexp_extract_all(text, '[0-9]'))
                   / greatest(length(text), 1) AS digit_ratio,
                 list_sum([CAST(length(x) AS DOUBLE) FOR x IN toks])
                   / greatest(len(toks), 1) AS avg_tok
          FROM c),
    kept AS (
      SELECT doc_id, md5(norm_text) AS h,
             CAST(length(norm_text) AS BIGINT) AS n_chars_norm,
             CAST(len(regexp_extract_all(norm_text, '[a-z0-9]+')) AS BIGINT)
               AS n_toks_norm
      FROM r
      WHERE (CASE WHEN n_toks >= 10 THEN 1 ELSE 0 END
           + CASE WHEN stop_ratio >= 0.05 THEN 1 ELSE 0 END
           + CASE WHEN digit_ratio <= 0.3 THEN 1 ELSE 0 END
           + CASE WHEN avg_tok >= 3.0 AND avg_tok <= 12.0 THEN 1 ELSE 0 END) >= 3),
    canon AS (
      SELECT h, min(doc_id) AS doc_id,
             min(n_chars_norm) AS n_chars_norm, min(n_toks_norm) AS n_toks_norm
      FROM kept GROUP BY h),
    s AS (
      SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'c0' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e0' THEN 'val'
                  ELSE 'test' END AS split,
             n_chars_norm, n_toks_norm
      FROM canon)
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars_norm) AS BIGINT) AS n_chars_sum,
           CAST(sum(n_toks_norm) AS BIGINT) AS n_tokens_sum
    FROM s GROUP BY 1
    """,
)


_reg(
    "mix_apply",
    lambda s, d: cu.mix_apply(load(s, d, "documents")),
    """
    WITH per AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars
                 FROM documents GROUP BY 1),
    tot AS (SELECT CAST(sum(chars) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS k FROM per),
    rates AS (
      SELECT source,
             round(least(1.0, (CAST(total AS DOUBLE) / k) / chars), 6) AS mix_rate
      FROM per CROSS JOIN tot)
    SELECT d.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
    FROM documents d JOIN rates r USING (source)
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))::BIGINT % 1000000
          < CAST(round(r.mix_rate * 1000000) AS BIGINT)
    """,
)


_reg(
    "mix_temperature",
    lambda s, d: cu.mix_temperature(load(s, d, "documents")),
    """
    WITH per AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars
                 FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(chars) AS BIGINT) AS total FROM per),
    wt AS (SELECT source, chars, total,
                  CAST(round(sqrt(CAST(chars AS DOUBLE) / total) * 1e12)
                       AS BIGINT) AS t
           FROM per CROSS JOIN tot),
    dn AS (SELECT CAST(sum(t) AS BIGINT) AS denom FROM wt)
    SELECT source, CAST(chars AS BIGINT) AS n_chars_sum,
           CAST(CAST((2000000 * CAST(t AS HUGEINT) + denom)
                     // (2 * CAST(denom AS HUGEINT)) AS BIGINT) AS DOUBLE)
             / 1e6 AS target_share,
           CAST(least(CAST(1000000 AS BIGINT),
                CAST((2000000 * CAST(t AS HUGEINT) * total
                      + CAST(denom AS HUGEINT) * chars)
                     // (2 * CAST(denom AS HUGEINT) * chars)
                     AS BIGINT)) AS DOUBLE)
             / 1e6 AS mix_rate
    FROM wt CROSS JOIN dn
    """,
)


_reg(
    "curation_token_budget",
    lambda s, d: cu.curation_token_budget(load(s, d, "documents")),
    """
    WITH t AS (SELECT doc_id, text,
                      regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents),
    r AS (SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 len(toks) AS n_toks,
                 len([x FOR x IN toks IF list_contains(['the','a','of','and','to','in','is'], x)])
                   / greatest(len(toks), 1) AS stop_ratio,
                 len(regexp_extract_all(text, '[0-9]')) / greatest(length(text), 1) AS digit_ratio,
                 list_sum([CAST(length(x) AS DOUBLE) FOR x IN toks]) / greatest(len(toks), 1) AS avg_tok
          FROM t),
    scored AS (SELECT doc_id, n_tokens,
                 CAST(CASE WHEN n_toks >= 10 THEN 1 ELSE 0 END
                    + CASE WHEN stop_ratio >= 0.05 THEN 1 ELSE 0 END
                    + CASE WHEN digit_ratio <= 0.3 THEN 1 ELSE 0 END
                    + CASE WHEN avg_tok >= 3.0 AND avg_tok <= 12.0 THEN 1 ELSE 0 END
                   AS BIGINT) AS score
               FROM r),
    levels AS (
      SELECT score, sum(n_tokens) AS level_tokens,
             coalesce(sum(sum(n_tokens)) OVER (
               ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
      FROM scored GROUP BY score),
    rates AS (
      SELECT score,
             CASE WHEN greatest(0, 10000 - above) >= level_tokens THEN 1.0
                  WHEN greatest(0, 10000 - above) <= 0 THEN 0.0
                  ELSE CAST(greatest(0, 10000 - above) AS DOUBLE)
                       / CAST(level_tokens AS DOUBLE)
             END AS keep_rate
      FROM levels)
    SELECT s.doc_id, s.score, s.n_tokens
    FROM scored s JOIN rates v ON v.score = s.score
    WHERE CAST('0x' || substring(md5(CAST(s.doc_id AS VARCHAR)), 1, 6) AS BIGINT)
            % 1000000
          < CAST(round(v.keep_rate * 1000000) AS BIGINT)
    """,
)


# Per-source dataset card: the corpus data-sheet summary every mixing
# decision reads — exact counts, device shares/means
_reg(
    "curation_dataset_card",
    lambda s, d: cu.curation_dataset_card(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT source, lang,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                  AS BIGINT) AS nt,
             CAST(length(text) AS BIGINT) AS nc
      FROM documents),
    g AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS n_tokens,
             CAST(sum(nc) AS BIGINT) AS n_chars,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_en,
             CAST(sum(CASE WHEN nt < 50 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_short,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
      FROM t GROUP BY 1)
    SELECT source, n_docs, n_tokens, n_chars, n_langs,
           CAST((2000000 * CAST(n_en AS HUGEINT) + n_docs)
                // (2 * CAST(n_docs AS HUGEINT)) AS DOUBLE) / 1e6 AS en_share,
           CAST((2000000 * CAST(n_short AS HUGEINT) + n_docs)
                // (2 * CAST(n_docs AS HUGEINT)) AS DOUBLE) / 1e6
             AS short_share,
           CAST((2000000 * CAST(n_tokens AS HUGEINT) + n_docs)
                // (2 * CAST(n_docs AS HUGEINT)) AS DOUBLE) / 1e6
             AS mean_tokens
    FROM g
    """,
)


# Sequential quality-gate funnel: integer cross-multiplied predicates,
# cumulative-AND survivor counts per source
_reg(
    "curation_filter_funnel",
    lambda s, d: cu.curation_filter_funnel(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT source, lang, CAST(length(text) AS BIGINT) AS n,
             CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
                  AS BIGINT) AS na,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS nw
      FROM documents),
    f AS (
      SELECT source,
             CASE WHEN n > 0 THEN 1 ELSE 0 END AS s1,
             CASE WHEN n > 0 AND n >= 100 AND n <= 400 THEN 1 ELSE 0 END AS s2,
             CASE WHEN n > 0 AND n >= 100 AND n <= 400
                   AND 100 * na >= 55 * n THEN 1 ELSE 0 END AS s3,
             CASE WHEN n > 0 AND n >= 100 AND n <= 400
                   AND 100 * na >= 55 * n
                   AND 3 * nw <= na AND na <= 9 * nw AND nw > 0
                  THEN 1 ELSE 0 END AS s4,
             CASE WHEN n > 0 AND n >= 100 AND n <= 400
                   AND 100 * na >= 55 * n
                   AND 3 * nw <= na AND na <= 9 * nw AND nw > 0
                   AND lang IN ('en', 'de', 'fr', 'es', 'zh')
                  THEN 1 ELSE 0 END AS s5
      FROM t),
    g AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(s1) AS BIGINT) AS n_nonempty,
             CAST(sum(s2) AS BIGINT) AS n_len_ok,
             CAST(sum(s3) AS BIGINT) AS n_alpha_ok,
             CAST(sum(s4) AS BIGINT) AS n_wordlen_ok,
             CAST(sum(s5) AS BIGINT) AS n_pass
      FROM f GROUP BY 1)
    SELECT source, n_docs, n_nonempty, n_len_ok, n_alpha_ok, n_wordlen_ok,
           n_pass,
           CAST((2000000 * CAST(n_pass AS HUGEINT) + n_docs)
                // (2 * CAST(n_docs AS HUGEINT)) AS DOUBLE) / 1e6 AS pass_rate
    FROM g
    """,
)


# Per-label text-quality census across the documents⋈embeddings id join
_reg(
    "curation_label_quality",
    lambda s, d: cu.curation_label_quality(
        load(s, d, "documents"), load(s, d, "embeddings")
    ),
    """
    WITH t AS (
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_m,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents),
    s AS (
      SELECT doc_id, n_chars_m, CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(toks,
                  x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is')))
                  AS BIGINT) AS n_stop
      FROM t),
    j AS (
      SELECT s.*, CAST(e.label AS BIGINT) AS label
      FROM s JOIN embeddings e ON e.vec_id = s.doc_id),
    g AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
             CAST(sum(n_stop) AS BIGINT) AS sum_stop,
             CAST(sum(n_chars_m) AS BIGINT) AS sum_chars
      FROM j GROUP BY label)
    SELECT label, n_docs, sum_tokens, sum_chars,
           CAST((20000 * (10000 * CAST(sum_tokens AS HUGEINT))
                 + (10000 * CAST(n_docs AS HUGEINT)))
                // (2 * (10000 * CAST(n_docs AS HUGEINT)))
                AS DOUBLE) / 1e4 AS mean_tokens,
           CAST((20000 * (10000 * CAST(sum_stop AS HUGEINT))
                 + (10000 * CAST(greatest(sum_tokens, 1) AS HUGEINT)))
                // (2 * (10000 * CAST(greatest(sum_tokens, 1) AS HUGEINT)))
                AS DOUBLE) / 1e4 AS stop_share
    FROM g
    """,
)


# Deterministic k-fold census: md5 slot mod k, per-fold doc counts
_reg(
    "dataset_kfold",
    lambda s, d: cu.dataset_kfold(load(s, d, "documents"), k=5),
    """
    SELECT (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
            % 1000000) % 5 AS fold,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY 1
    """,
)


_reg(
    "curation_skyline",
    lambda s, d: cu.curation_skyline(load(s, d, "documents")),
    # same O(n log n) two-window dominance form: m1 = best type count at
    # strictly smaller length, m2 = best among equal length; survive iff
    # better than every shorter doc and not beaten at your own length
    """
    WITH t AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(len(list_distinct(
               regexp_extract_all(lower(text), '[a-z0-9]+')))
               AS BIGINT) AS n_types
      FROM documents),
    m AS (
      SELECT source, doc_id, n_chars, n_types,
             max(n_types) OVER (PARTITION BY source ORDER BY n_chars
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1,
             max(n_types) OVER (PARTITION BY source, n_chars) AS m2
      FROM t)
    SELECT source, doc_id, n_chars, n_types
    FROM m
    WHERE (m1 IS NULL OR n_types > m1) AND n_types = m2
    """,
)


_reg(
    "dataset_balance",
    lambda s, d: cu.dataset_balance(load(s, d, "documents")),
    # same md5_slot rank order (hex_chars=6 mod 1e6 — the md5_slot
    # default), same global floor = min class count
    """
    WITH ranked AS (
      SELECT doc_id, lang AS class_key,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                        % 1000000, doc_id) AS rk
      FROM documents),
    floor_n AS (
      SELECT min(n) AS f FROM (
        SELECT count(*) AS n FROM documents GROUP BY lang))
    SELECT doc_id, class_key, CAST(rk AS BIGINT) AS rank_in_class
    FROM ranked, floor_n WHERE rk <= f
    """,
)


_reg(
    "curation_filter_overlap",
    lambda s, d: cu.curation_filter_overlap(load(s, d, "documents")),
    # same four deterministic filters, same upper-triangle census
    """
    WITH lang_top AS (
      SELECT lang FROM (
        SELECT lang, count(*) AS n FROM documents GROUP BY 1
        ORDER BY n DESC, lang LIMIT 2)),
    keeper AS (
      SELECT text, min(doc_id) AS keep_id FROM documents GROUP BY 1),
    flags AS (
      SELECT d.doc_id,
             d.n_chars < 200 AS f_short,
             d.doc_id <> k.keep_id AS f_dup,
             d.lang NOT IN (SELECT lang FROM lang_top) AS f_rare_lang,
             len(regexp_extract_all(lower(d.text), '[a-z0-9]+')) < 25
               AS f_low_alpha
      FROM documents d JOIN keeper k ON d.text = k.text),
    names(i, nm) AS (
      VALUES (1, 'short'), (2, 'dup'), (3, 'rare_lang'), (4, 'low_alpha')),
    vals AS (
      SELECT doc_id, 1 AS i, f_short AS f FROM flags UNION ALL
      SELECT doc_id, 2, f_dup FROM flags UNION ALL
      SELECT doc_id, 3, f_rare_lang FROM flags UNION ALL
      SELECT doc_id, 4, f_low_alpha FROM flags)
    SELECT a_nm.nm AS filter_a, b_nm.nm AS filter_b,
           CAST(sum(CASE WHEN a.f AND b.f THEN 1 ELSE 0 END) AS BIGINT)
             AS n_both
    FROM vals a
    JOIN vals b ON a.doc_id = b.doc_id AND a.i <= b.i
    JOIN names a_nm ON a.i = a_nm.i
    JOIN names b_nm ON b.i = b_nm.i
    GROUP BY 1, 2
    """,
)
