"""Oracle registry — LLM pipeline: exact/fuzzy/LSH dedup + decontamination.

Cut verbatim from the monolithic __spark_entry__.py (r14); every key
registers a Spark query and its DuckDB oracle SQL into this module's
local dicts, merged in frozen order by kdb_spark/oracles/__init__.py.
"""

from __future__ import annotations

from kdb_spark.oracles._shared import *  # noqa: F401,F403

QUERIES, ORACLES, _reg = make_registry()


# ------------------------------------------------------------------- LLM ops

_reg(
    "dedup_exact",
    lambda s, d: dd.dedup_exact(load(s, d, "documents")),
    """
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents GROUP BY text
    """,
)


_NGRAM_JACCARD_SQL = """
WITH d AS (
  SELECT doc_id,
         list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]) AS sh
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents)),
flat AS (SELECT doc_id, unnest(sh) AS s FROM d),
sizes AS (SELECT doc_id, len(sh) AS n_sh FROM d),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM flat a JOIN flat b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       n_inter / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
"""


_reg(
    "dedup_ngram_jaccard",
    lambda s, d: dd.dedup_ngram_jaccard(load(s, d, "documents")),
    _NGRAM_JACCARD_SQL,
)


_reg(
    "dedup_substring",
    lambda s, d: dd.dedup_substring(load(s, d, "documents")),
    """
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents),
    w AS (SELECT doc_id, array_to_string(toks[i:i+15], ' ') AS span
          FROM t CROSS JOIN unnest(range(1, len(toks) - 16 + 2)) s(i)
          WHERE len(toks) >= 16),
    h AS (SELECT span_hash, doc_id FROM (
            SELECT ('0x' || substr(md5(span), 1, 15))::BIGINT AS span_hash, doc_id
            FROM w) WHERE span_hash % 8 = 0)
    SELECT span_hash,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occ,
           min(doc_id) AS min_doc
    FROM h GROUP BY span_hash HAVING count(DISTINCT doc_id) >= 2
    """,
)


# MinHash-LSH: probabilistic candidates, exact verify. The oracle is the
# exact-jaccard ground truth; at 16 bands × 2 rows recall at j>=0.5 is ~0.99
# (≈1 at the j>=0.9 pairs this corpus contains) — verified equal at sf0.01.
_reg(
    "dedup_near_minhash",
    lambda s, d: dd.dedup_near_minhash(load(s, d, "documents")),
    _NGRAM_JACCARD_SQL,
)


# Cross-corpus (incremental-ingest) dedup: oracle = exact jaccard across the
# md5-slot split, aggregated per incoming doc. Same recall argument as
# dedup_near_minhash (16×2 banding, ≥0.99 at j≥0.5; exact verify). Shared by
# the batch op and its streaming twin (stream-static LSH join), whose drained
# result must converge to the same answer.
_CROSS_CORPUS_SQL = """
    WITH d AS (
      SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 20
               AS incoming,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            FOR i IN range(1, len(toks) - 1)]) AS sh
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
            FROM documents)
      WHERE len(toks) >= 3),
    flat AS (SELECT doc_id, incoming, unnest(sh) AS s FROM d),
    sizes AS (SELECT doc_id, len(sh) AS n_sh FROM d),
    inter AS (
      SELECT n.doc_id AS doc_new, b.doc_id AS doc_base, count(*) AS n_inter
      FROM flat n JOIN flat b ON n.s = b.s AND n.incoming AND NOT b.incoming
      GROUP BY 1, 2),
    j AS (
      SELECT doc_new, doc_base,
             n_inter / (sn.n_sh + sb.n_sh - n_inter) AS jaccard
      FROM inter
      JOIN sizes sn ON sn.doc_id = doc_new
      JOIN sizes sb ON sb.doc_id = doc_base
      WHERE n_inter / (sn.n_sh + sb.n_sh - n_inter) >= 0.5)
    SELECT doc_new AS doc_id,
           CAST(count(*) AS BIGINT) AS n_dups,
           min(doc_base) AS min_base,
           max(jaccard) AS best_jaccard
    FROM j GROUP BY 1
    """


_reg(
    "dedup_cross_corpus",
    lambda s, d: dd.dedup_cross_corpus(load(s, d, "documents")),
    _CROSS_CORPUS_SQL,
)


# Fuzzy entity matching over part names: the oracle replays the q-gram
# blocking exactly (blocking is part of the operator contract — see
# dedup_fuzzy's docstring for the provable-recall length bound), and both
# engines implement classic Levenshtein.
_reg(
    "dedup_fuzzy",
    lambda s, d: dd.dedup_fuzzy(load(s, d, "part")),
    """
    WITH names AS (
      SELECT lower(p_name) AS name, CAST(count(*) AS BIGINT) AS n_rows
      FROM part GROUP BY 1 HAVING length(lower(p_name)) >= 3),
    g AS (
      SELECT DISTINCT name,
             unnest([substr(name, i, 3) FOR i IN range(1, length(name) - 1)]) AS g
      FROM names),
    cand AS (
      SELECT DISTINCT a.name AS name_a, b.name AS name_b
      FROM g a JOIN g b ON a.g = b.g AND a.name < b.name)
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist,
           na.n_rows AS n_rows_a, nb.n_rows AS n_rows_b
    FROM cand
    JOIN names na ON na.name = name_a
    JOIN names nb ON nb.name = name_b
    WHERE levenshtein(name_a, name_b) <= 2
    """,
)


def _simhash_oracle() -> str:
    """DuckDB mirror of simhash64 + band blocking: md5 token hashes are
    byte-identical across engines, so the 64 ±1 sums, the assembled
    signature, and the hamming verify all value-match exactly."""
    sums = ",\n             ".join(
        f"sum(CASE WHEN ({'h1' if i < 32 else 'h2'} >> {i % 32}) & 1 = 1"
        f" THEN 1 ELSE -1 END) AS b{i}"
        for i in range(64)
    )
    consts = [(1 << i) if i < 63 else -(1 << 63) for i in range(64)]
    sim = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {'(-9223372036854775807 - 1)' if i == 63 else consts[i]}::BIGINT ELSE 0 END)"
        for i in range(64)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      FROM documents),
    h AS (
      SELECT doc_id,
             ('0x' || substr(md5(t), 1, 8))::BIGINT AS h1,
             ('0x' || substr(md5(t), 9, 8))::BIGINT AS h2
      FROM tok),
    sums AS (
      SELECT doc_id,
             {sums}
      FROM h GROUP BY doc_id),
    sh AS (SELECT doc_id, {sim} AS simhash FROM sums),
    bands AS (
      SELECT doc_id, simhash, t.band, (simhash >> (t.band * 16)) & 65535 AS bits
      FROM sh, (VALUES (0), (1), (2), (3)) t(band))
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bits = b.bits AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
    """


_reg(
    "dedup_simhash",
    lambda s, d: dd.dedup_simhash(load(s, d, "documents")),
    _simhash_oracle(),
)


_reg(
    "dedup_cluster",
    lambda s, d: dd.dedup_cluster(load(s, d, "documents")),
    f"""
    WITH RECURSIVE pairs AS ({_NGRAM_JACCARD_SQL.replace("SELECT doc_a", "SELECT doc_a").strip()}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
    SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS canonical_id
    FROM reach GROUP BY a
    """,
)


_reg(
    "decontaminate",
    lambda s, d: cu.decontaminate(load(s, d, "documents")),
    """
    WITH d AS (
      SELECT doc_id,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= 'e0' AS is_test,
             list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]) AS sh
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents)),
    flat AS (SELECT doc_id, is_test, unnest(sh) AS s FROM d),
    ev AS (SELECT DISTINCT s FROM flat WHERE is_test)
    SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_hits
    FROM flat f JOIN ev ON f.s = ev.s
    WHERE NOT f.is_test
    GROUP BY f.doc_id
    """,
)


_reg(
    "decontaminate_fuzzy",
    lambda s, d: dd.decontaminate_fuzzy(load(s, d, "documents")),
    """
    WITH d AS (
      SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 20
               AS is_test,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            FOR i IN range(1, len(toks) - 1)]) AS sh
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
            FROM documents)
      WHERE len(toks) >= 3),
    flat AS (SELECT doc_id, is_test, unnest(sh) AS s FROM d),
    sizes AS (SELECT doc_id, len(sh) AS n_sh FROM d),
    inter AS (
      SELECT t.doc_id AS doc_new, e.doc_id AS doc_base, count(*) AS n_inter
      FROM flat t JOIN flat e ON t.s = e.s AND NOT t.is_test AND e.is_test
      GROUP BY 1, 2),
    j AS (
      SELECT doc_new, doc_base,
             n_inter / (sn.n_sh + sb.n_sh - n_inter) AS jaccard
      FROM inter
      JOIN sizes sn ON sn.doc_id = doc_new
      JOIN sizes sb ON sb.doc_id = doc_base
      WHERE n_inter / (sn.n_sh + sb.n_sh - n_inter) >= 0.3)
    SELECT doc_new AS doc_id,
           CAST(count(*) AS BIGINT) AS n_test_matches,
           min(doc_base) AS min_test_id,
           max(jaccard) AS best_jaccard
    FROM j GROUP BY 1
    """,
)


# quality-aware dedup survivor selection: clusters (recursive reach over the
# exact-jaccard pair graph) + the shared quality score, argmax per component
# via window rank — mirrors dedup_keep_best's max_by(struct) exactly
_reg(
    "dedup_keep_best",
    lambda s, d: dd.dedup_keep_best(load(s, d, "documents")),
    f"""
    WITH RECURSIVE pairs AS ({_NGRAM_JACCARD_SQL.strip()}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
    lbl AS (
      SELECT a AS doc_id, min(b) AS canonical_id FROM reach GROUP BY a),
    t AS (SELECT doc_id, text,
                 regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
          FROM documents),
    sc AS (SELECT doc_id,
                  len(toks) AS n_tokens,
                  (CASE WHEN len(toks) >= 10 THEN 1 ELSE 0 END
                 + CASE WHEN len([x FOR x IN toks IF list_contains(['the','a','of','and','to','in','is'], x)])
                          / greatest(len(toks), 1) >= 0.05 THEN 1 ELSE 0 END
                 + CASE WHEN len(regexp_extract_all(text, '[0-9]'))
                          / greatest(length(text), 1) <= 0.3 THEN 1 ELSE 0 END
                 + CASE WHEN list_sum([CAST(length(x) AS DOUBLE) FOR x IN toks])
                          / greatest(len(toks), 1) BETWEEN 3.0 AND 12.0
                        THEN 1 ELSE 0 END) AS score
           FROM t),
    j AS (SELECT l.canonical_id, sc.doc_id, sc.score, sc.n_tokens
          FROM lbl l JOIN sc ON sc.doc_id = l.doc_id),
    r AS (SELECT canonical_id, doc_id, score,
                 row_number() OVER (PARTITION BY canonical_id
                                    ORDER BY score DESC, n_tokens DESC, doc_id) AS rn,
                 count(*) OVER (PARTITION BY canonical_id) AS n_members
          FROM j)
    SELECT CAST(canonical_id AS BIGINT) AS canonical_id,
           CAST(doc_id AS BIGINT) AS kept_doc_id,
           CAST(score AS BIGINT) AS kept_score,
           CAST(n_members AS BIGINT) AS n_members
    FROM r WHERE rn = 1
    """,
)


# Prefix dedup: normalized 64-char head blocking — truncation variants and
# boilerplate-stamped rewraps that exact hashing misses
_reg(
    "dedup_prefix",
    lambda s, d: dd.dedup_prefix(load(s, d, "documents")),
    r"""
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM (SELECT doc_id,
                 substring(regexp_replace(lower(text), '\s+', ' ', 'g'),
                           1, 64) AS p
          FROM documents)
    GROUP BY p
    """,
)


_reg(
    "dedup_bloom_probe",
    lambda s, d: dd.dedup_bloom_probe(load(s, d, "documents")),
    # bit positions = three non-overlapping 8-hex slices of md5(text)
    # mod 2^18 — the md5_slot discipline; truth = md5(text) equality.
    # The oracle replays the same bitmap-as-set semantics relationally.
    """
    WITH docs AS (
      SELECT doc_id, md5(text) AS h,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
               % 100 AS slot
      FROM documents),
    base AS (SELECT * FROM docs WHERE slot >= 20),
    incoming AS (SELECT * FROM docs WHERE slot < 20),
    bitmap AS (
      SELECT DISTINCT ('0x' || substr(h, 1 + 8 * t.i, 8))::BIGINT % 262144
               AS pos
      FROM base, range(0, 3) t(i)),
    probe AS (
      SELECT doc_id,
             ('0x' || substr(h, 1 + 8 * t.i, 8))::BIGINT % 262144 AS pos
      FROM incoming, range(0, 3) t(i)),
    hits AS (
      SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_hits
      FROM probe p WHERE EXISTS (SELECT 1 FROM bitmap b WHERE b.pos = p.pos)
      GROUP BY 1)
    SELECT i.doc_id,
           coalesce(hits.n_hits, 0) = 3 AS bloom_maybe,
           EXISTS (SELECT 1 FROM base b WHERE b.h = i.h) AS exact_dup
    FROM incoming i LEFT JOIN hits ON i.doc_id = hits.doc_id
    """,
)


_reg(
    "dedup_minhash_calibration",
    lambda s, d: dd.dedup_minhash_calibration(load(s, d, "documents")),
    # the same md5 minhash (slot j = min over shingles of the first 8 hex
    # chars of md5("j:" || shingle)) and the same exact-jaccard candidate
    # machinery; agreement is an element-wise signature compare
    """
    WITH d AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            FOR i IN range(1, len(toks) - 1)]) AS sh
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+')
                     AS toks
            FROM documents)
      WHERE len(toks) >= 3),
    flat AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d),
    mh AS (
      SELECT doc_id, t.j,
             min(('0x' || substr(md5(CAST(t.j AS VARCHAR) || ':' || s),
                                 1, 8))::BIGINT) AS mh
      FROM flat, range(0, 16) t(j)
      GROUP BY 1, 2),
    sig AS (
      SELECT doc_id, array_agg(mh ORDER BY j) AS sig FROM mh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS n_inter
      FROM flat a JOIN flat b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT i.doc_a, i.doc_b, i.n_inter,
             CAST(sa.n_sh + sb.n_sh - i.n_inter AS BIGINT) AS n_union
      FROM inter i
      JOIN (SELECT DISTINCT doc_id, n_sh FROM flat) sa ON sa.doc_id = i.doc_a
      JOIN (SELECT DISTINCT doc_id, n_sh FROM flat) sb ON sb.doc_id = i.doc_b
      WHERE 100 * i.n_inter >= 30 * (sa.n_sh + sb.n_sh - i.n_inter))
    SELECT p.doc_a, p.doc_b, p.n_inter, p.n_union,
           CAST(list_sum([CASE WHEN x.sig[i] = y.sig[i] THEN 1 ELSE 0 END
                          FOR i IN range(1, 17)]) AS BIGINT) AS m_agree
    FROM pairs p
    JOIN sig x ON x.doc_id = p.doc_a
    JOIN sig y ON y.doc_id = p.doc_b
    """,
)


# Suffix dedup: the prefix screen's mirror — shared tails under differing
# injected heads (headers/timestamps/crumbs)
_reg(
    "dedup_suffix",
    lambda s, d: dd.dedup_suffix(load(s, d, "documents")),
    r"""
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM (SELECT doc_id,
                 right(regexp_replace(lower(text), '\s+', ' ', 'g'), 64) AS p
          FROM documents)
    GROUP BY p
    """,
)
