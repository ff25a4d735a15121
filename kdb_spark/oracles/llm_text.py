"""Oracle registry — LLM pipeline: text statistics, quality, diversity, retrieval.

Cut verbatim from the monolithic __spark_entry__.py (r14); every key
registers a Spark query and its DuckDB oracle SQL into this module's
local dicts, merged in frozen order by kdb_spark/oracles/__init__.py.
"""

from __future__ import annotations

from kdb_spark.oracles._shared import *  # noqa: F401,F403

QUERIES, ORACLES, _reg = make_registry()


_reg(
    "text_stats",
    lambda s, d: tx.text_stats(load(s, d, "documents")),
    """
    WITH t AS (SELECT doc_id, text,
                      regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents)
    , c AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars_m,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
             CAST(coalesce(list_sum([CAST(length(t) AS BIGINT) FOR t IN toks]),
                           0) AS BIGINT) AS sum_len,
             CAST(len([t FOR t IN toks IF list_contains(['the','a','of','and','to','in','is'], t)]) AS BIGINT) AS n_stop,
             CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits
      FROM t)
    SELECT doc_id, n_chars_m, n_tokens, n_uniq,
           CAST(CAST((20000 * CAST(sum_len AS HUGEINT) + greatest(n_tokens, 1))
                     // (2 * CAST(greatest(n_tokens, 1) AS HUGEINT)) AS BIGINT)
                AS DOUBLE) / 1e4 AS avg_tok_len,
           n_stop, n_digits
    FROM c
    """,
)


_reg(
    "lang_id",
    lambda s, d: tx.lang_id(load(s, d, "documents")),
    """
    WITH t AS (SELECT doc_id, lang,
                      regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents),
    r AS (SELECT doc_id, lang,
                 CAST(len([t FOR t IN toks IF list_contains(['the','a','of','and','to','in','is'], t)]) AS BIGINT) AS hits,
                 CAST(greatest(len(toks), 1) AS BIGINT) AS nt
          FROM t)
    SELECT doc_id, lang,
           CAST(CAST((2000000 * CAST(hits AS HUGEINT) + nt)
                     // (2 * CAST(nt AS HUGEINT)) AS BIGINT) AS DOUBLE)
             / 1e6 AS stop_ratio,
           CASE WHEN hits / nt >= 0.05 THEN 'en' ELSE 'unk' END AS pred
    FROM r
    """,
)


_reg(
    "token_count_bpe",
    lambda s, d: tx.token_count_bpe(load(s, d, "documents")),
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
           CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_word_tokens
    FROM documents
    """,
)


_reg(
    "quality_score",
    lambda s, d: tx.quality_score(load(s, d, "documents")),
    """
    WITH t AS (SELECT doc_id, text,
                      regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents),
    r AS (SELECT doc_id,
                 len(toks) AS n_toks,
                 len([x FOR x IN toks IF list_contains(['the','a','of','and','to','in','is'], x)])
                   / greatest(len(toks), 1) AS stop_ratio,
                 len(regexp_extract_all(text, '[0-9]')) / greatest(length(text), 1) AS digit_ratio,
                 list_sum([CAST(length(x) AS DOUBLE) FOR x IN toks]) / greatest(len(toks), 1) AS avg_tok
          FROM t),
    s AS (SELECT doc_id,
                 (CASE WHEN n_toks >= 10 THEN 1 ELSE 0 END
                + CASE WHEN stop_ratio >= 0.05 THEN 1 ELSE 0 END
                + CASE WHEN digit_ratio <= 0.3 THEN 1 ELSE 0 END
                + CASE WHEN avg_tok >= 3.0 AND avg_tok <= 12.0 THEN 1 ELSE 0 END) AS score
          FROM r)
    SELECT doc_id, CAST(score AS BIGINT) AS score,
           CASE WHEN score >= 3 THEN 'keep' ELSE 'drop' END AS verdict
    FROM s
    """,
)


_reg(
    "ngram_topk",
    lambda s, d: tx.ngram_topk(load(s, d, "documents")),
    """
    WITH g AS (
      SELECT unnest(list_distinct(
               [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
             )) AS gram
      FROM (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents))
    SELECT gram, count(*) AS n FROM g
    GROUP BY gram ORDER BY n DESC, gram LIMIT 20
    """,
)


_reg(
    "udtf_tokenize",
    lambda s, d: tx.udtf_tokenize(load(s, d, "documents")),
    """
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents)
    SELECT doc_id,
           CAST(unnest(range(len(toks))) AS BIGINT) AS pos,
           unnest(toks) AS token
    FROM t
    """,
)


_reg(
    "doc_fingerprint",
    lambda s, d: tx.doc_fingerprint(load(s, d, "documents")),
    """
    WITH t AS (SELECT doc_id,
                      [17 * CAST(length(t) AS BIGINT) + ascii(t)
                       FOR t IN regexp_extract_all(lower(text), '[a-z0-9]+')] AS codes
               FROM documents)
    SELECT doc_id,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
                            (a, b) -> (a * 31 + b) % 2147483647) AS BIGINT) AS fingerprint
    FROM t
    """,
)


_reg(
    "text_repetition",
    lambda s, d: tx.text_repetition(load(s, d, "documents")),
    """
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents),
    s AS (SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 CAST(greatest(len(toks) - 2, 0) AS BIGINT) AS n_trigrams,
                 CAST(len(list_distinct([array_to_string(toks[i:i+2], ' ')
                                         FOR i IN range(1, len(toks) - 1)])) AS BIGINT)
                   AS n_tri_uniq,
                 CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq
          FROM t)
    SELECT doc_id, n_tokens, n_trigrams, n_tri_uniq,
           round(1.0 - n_tri_uniq / greatest(n_trigrams, 1), 6) AS rep_tri_ratio,
           round(1.0 - n_uniq / greatest(n_tokens, 1), 6) AS dup_tok_ratio,
           (n_trigrams > 0 AND (1.0 - n_tri_uniq / greatest(n_trigrams, 1)) >= 0.2) AS is_repetitive
    FROM s
    """,
)


_reg(
    "quality_rarity",
    lambda s, d: tx.quality_rarity(load(s, d, "documents")),
    """
    WITH t AS (SELECT doc_id,
                      unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
               FROM documents),
    f AS (SELECT tok, count(*) AS cnt FROM t GROUP BY 1),
    j AS (SELECT doc_id, cnt FROM t JOIN f USING (tok))
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(cnt) AS BIGINT) AS sum_freq,
           round(CAST(sum(cnt) AS DOUBLE) / count(*), 6) AS avg_tok_freq
    FROM j GROUP BY 1
    """,
)


_reg(
    "token_histogram",
    lambda s, d: tx.token_histogram(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tok
      FROM documents)
    SELECT CAST(pow(2, floor(log2(greatest(n_tok, 1)))) AS BIGINT) AS bin_lo,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM t GROUP BY 1
    """,
)


_reg(
    "text_normalize",
    lambda s, d: tx.text_normalize(load(s, d, "documents")),
    r"""
    WITH c AS (
      SELECT doc_id, text,
             lower(trim(regexp_replace(
               regexp_replace(text, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', ' ', 'g'),
               '[\s]+', ' ', 'g'))) AS norm_text
      FROM documents)
    SELECT doc_id, norm_text,
           CAST(length(text) - length(norm_text) AS BIGINT) AS chars_removed
    FROM c
    """,
)


# ------------------------------------------------------------ round-7 extras
# TF-IDF / BM25 sparse retrieval, PageRank, Markov transitions — the
# indexer/ranker companions to the ANN + dedup families above.

_reg(
    "text_tfidf_topk",
    lambda s, d: tx.text_tfidf_topk(load(s, d, "documents")),
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    nn AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
             round(tf * ln(n_docs / df), 6) AS score
      FROM tf JOIN df USING (term) CROSS JOIN nn)
    SELECT doc_id, term, tf, df, score, rnk FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, term) AS BIGINT) AS rnk
      FROM scored) WHERE rnk <= 5
    """,
)


_reg(
    "text_bm25_topk",
    lambda s, d: tx.text_bm25_topk(load(s, d, "documents")),
    """
    WITH base AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents),
    d AS (SELECT doc_id, len(toks) AS dl,
                 list_filter(toks, t -> t IN ('vector', 'hash', 'merge')) AS hits
          FROM base),
    stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM d),
    tfc AS (SELECT doc_id, dl, term, count(*) AS tf
            FROM (SELECT doc_id, dl, unnest(hits) AS term FROM d)
            GROUP BY 1, 2, 3),
    df AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1)
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_hits,
           round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                     * tf * (1.2 + 1.0)
                     / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl
                        / (CAST(sum_dl AS DOUBLE) / n_docs)))), 6) AS bm25
    FROM tfc JOIN df USING (term) CROSS JOIN stats
    GROUP BY doc_id, n_docs, sum_dl
    ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
)


_reg(
    "text_pmi_bigrams",
    lambda s, d: tx.text_pmi_bigrams(load(s, d, "documents")),
    """
    WITH t AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t
               FROM documents),
    big AS (
      SELECT split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2
      FROM (SELECT unnest([t[i] || ' ' || t[i + 1]
                           FOR i IN range(1, len(t))]) AS bg
            FROM t WHERE len(t) >= 2)),
    nbg AS (SELECT w1, w2, count(*) AS n_ab FROM big GROUP BY 1, 2),
    nl AS (SELECT w1, count(*) AS n_a FROM big GROUP BY 1),
    nr AS (SELECT w2, count(*) AS n_b FROM big GROUP BY 1),
    tot AS (SELECT sum(n_ab) AS n_total FROM nbg),
    scored AS (
      SELECT b.w1, b.w2,
             CAST(b.n_ab AS BIGINT) AS n_ab,
             CAST(nl.n_a AS BIGINT) AS n_a,
             CAST(nr.n_b AS BIGINT) AS n_b,
             round(ln(CAST(n_total AS DOUBLE) * b.n_ab
                      / (CAST(nl.n_a AS DOUBLE) * nr.n_b)), 6) AS pmi
      FROM nbg b JOIN nl USING (w1) JOIN nr USING (w2) CROSS JOIN tot
      WHERE b.n_ab >= 5)
    SELECT w1, w2, n_ab, n_a, n_b, pmi,
           CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS BIGINT) AS rnk
    FROM scored QUALIFY rnk <= 30
    """,
)


_reg(
    "text_hash_features",
    lambda s, d: tx.text_hash_features(load(s, d, "documents")),
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
               AS tok
      FROM documents)
    SELECT doc_id,
           CAST(CAST('0x' || substring(md5(tok), 1, 4) AS BIGINT) % 256
                AS INT) AS slot,
           CAST(count(*) AS BIGINT) AS cnt
    FROM toks
    GROUP BY 1, 2
    """,
)


# per-doc duplicated-passage fraction over dedup_substring's span sample;
# exact integer ratio, integer-rounded — the curation-facing face of the
# span registry
_reg(
    "text_boilerplate_ratio",
    lambda s, d: tx.text_boilerplate_ratio(load(s, d, "documents")),
    """
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents),
    w AS (SELECT doc_id, array_to_string(toks[i:i+15], ' ') AS span
          FROM t CROSS JOIN unnest(range(1, len(toks) - 16 + 2)) s(i)
          WHERE len(toks) >= 16),
    k AS (SELECT doc_id, span_hash FROM (
            SELECT doc_id, ('0x' || substr(md5(span), 1, 15))::BIGINT AS span_hash
            FROM w) WHERE span_hash % 8 = 0),
    reg AS (SELECT span_hash FROM k GROUP BY 1
            HAVING count(DISTINCT doc_id) >= 2),
    j AS (SELECT k.doc_id,
                 CASE WHEN r.span_hash IS NOT NULL THEN 1 ELSE 0 END AS is_dup
          FROM k LEFT JOIN reg r USING (span_hash)),
    g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                 CAST(sum(is_dup) AS BIGINT) AS n_dup
          FROM j GROUP BY 1)
    SELECT doc_id, n_kept, n_dup,
           CAST((2000000 * n_dup + n_kept) // (2 * n_kept) AS DOUBLE) / 1e6
             AS boiler_ratio
    FROM g
    """,
)


# corpus top-N vocab, then per-doc coverage — exact integer ratio; the
# oracle's vocab pick uses the same (count desc, token asc) deterministic
# order
_reg(
    "text_vocab_coverage",
    lambda s, d: tx.text_vocab_coverage(load(s, d, "documents")),
    """
    WITH tk AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, count(*) AS cnt FROM tk GROUP BY 1
        ORDER BY cnt DESC, tok LIMIT 64)),
    g AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS covered
      FROM tk t LEFT JOIN vocab v USING (tok)
      GROUP BY t.doc_id)
    SELECT doc_id, n_tokens, covered,
           CAST((2000000 * covered + n_tokens) // (2 * CAST(n_tokens AS HUGEINT))
                AS DOUBLE) / 1e6 AS coverage
    FROM g
    """,
)


# lexical diversity per doc: exact TTR + MSTTR over 50-token segments —
# ratios of exact integers on the 1e-6 grid, map-only
_reg(
    "text_msttr",
    lambda s, d: tx.text_msttr(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents),
    c AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
             CAST(len(toks) // 50 AS BIGINT) AS n_segs,
             CAST(CASE WHEN len(toks) >= 50 THEN
               list_sum(list_transform(range(len(toks) // 50),
                 i -> len(list_distinct(toks[i * 50 + 1 : i * 50 + 50]))))
             ELSE 0 END AS BIGINT) AS seg_types
      FROM t)
    SELECT doc_id, n_tokens, n_types, n_segs,
           CAST(CASE WHEN n_tokens > 0 THEN
             CAST((2000000 * CAST(n_types AS HUGEINT) + n_tokens)
                  // (2 * CAST(n_tokens AS HUGEINT)) AS BIGINT)
           END AS DOUBLE) / 1e6 AS ttr,
           CAST(CASE WHEN n_segs > 0 THEN
             CAST((2000000 * CAST(seg_types AS HUGEINT)
                   + 50 * CAST(n_segs AS HUGEINT))
                  // (2 * 50 * CAST(n_segs AS HUGEINT)) AS BIGINT)
           END AS DOUBLE) / 1e6 AS msttr
    FROM c
    """,
)


# Hapax legomena profile: map-only sorted-neighbour scan (no explode
# shuffle), exact integer counts + device ratios
_reg(
    "text_hapax_ratio",
    lambda s, d: tx.text_hapax_ratio(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
             list_sort(regexp_extract_all(lower(text), '[a-z0-9]+')) AS srt
      FROM documents),
    c AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
             CAST(len(list_distinct(srt)) AS BIGINT)
             - CAST(len(list_distinct(list_filter(
                 list_transform(range(1, len(srt)),
                   i -> CASE WHEN srt[i] = srt[i+1] THEN srt[i] END),
                 x -> x IS NOT NULL))) AS BIGINT) AS n_hapax
      FROM t)
    SELECT doc_id, n_tokens, n_types, n_hapax,
           CASE WHEN n_types > 0 THEN
             CAST((2000000 * CAST(n_hapax AS HUGEINT) + n_types)
                  // (2 * CAST(n_types AS HUGEINT)) AS DOUBLE) / 1e6
           END AS hapax_type_ratio,
           CASE WHEN n_tokens > 0 THEN
             CAST((2000000 * CAST(n_hapax AS HUGEINT) + n_tokens)
                  // (2 * CAST(n_tokens AS HUGEINT)) AS DOUBLE) / 1e6
           END AS hapax_token_ratio
    FROM c
    """,
)


# ---------------------------------------------------------- round 12, batch 2
# Simpson concentration / Gini–Simpson diversity: map-only run-length fold
# on the sorted token array; the oracle derives the SAME pair count via
# unnest+group (results must match, plans need not)
_reg(
    "text_simpson_diversity",
    lambda s, d: tx.text_simpson_diversity(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents),
    f AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    c AS (SELECT doc_id, tok, CAST(count(*) AS HUGEINT) AS cnt
          FROM f GROUP BY 1, 2),
    p AS (SELECT doc_id, sum(cnt * (cnt - 1)) AS twop FROM c GROUP BY 1),
    j AS (
      SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
             coalesce(p.twop, 0) AS twop
      FROM t LEFT JOIN p ON t.doc_id = p.doc_id)
    SELECT doc_id, n_tokens,
           CAST(twop // 2 AS BIGINT) AS n_equal_pairs,
           CASE WHEN n_tokens > 1 THEN
             CAST((2000000 * CAST(twop AS HUGEINT)
                   + CAST(n_tokens AS HUGEINT) * (n_tokens - 1))
                  // (2 * CAST(n_tokens AS HUGEINT) * (n_tokens - 1))
                  AS DOUBLE) / 1e6
           END AS simpson,
           CASE WHEN n_tokens > 1 THEN
             CAST((2000000 * (CAST(n_tokens AS HUGEINT) * (n_tokens - 1) - twop)
                   + CAST(n_tokens AS HUGEINT) * (n_tokens - 1))
                  // (2 * CAST(n_tokens AS HUGEINT) * (n_tokens - 1))
                  AS DOUBLE) / 1e6
           END AS gini_simpson
    FROM j
    """,
)


# Yule's K vocabulary-repetitiveness constant per language: exact integer
# frequency spectrum moments, unsigned device at 6 dp
_reg(
    "text_yule_k",
    lambda s, d: tx.text_yule_k(load(s, d, "documents")),
    """
    WITH f AS (
      SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents),
    m AS (
      SELECT lang, tok, CAST(count(*) AS BIGINT) AS m FROM f GROUP BY 1, 2),
    g AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(m) AS BIGINT) AS n_tokens,
             sum(CAST(m AS HUGEINT) * m) AS s2
      FROM m GROUP BY 1)
    SELECT lang, n_types, n_tokens, CAST(s2 AS BIGINT) AS s2,
           CAST((2000000 * (10000 * (s2 - CAST(n_tokens AS HUGEINT)))
                 + CAST(n_tokens AS HUGEINT) * n_tokens)
                // (2 * CAST(n_tokens AS HUGEINT) * n_tokens) AS DOUBLE) / 1e6
             AS yule_k
    FROM g
    """,
)


# Gopher/C4 intra-doc quality battery: dup-line/dup-char/bullet/ellipsis
# ratios from a map-only sorted run-length fold; oracle via unnest+group
_reg(
    "text_gopher_quality",
    lambda s, d: tx.text_gopher_quality(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
    nn AS (
      SELECT doc_id,
             CAST(len(ls) AS BIGINT) AS n_lines,
             CAST(coalesce(list_sum(list_transform(ls, x -> length(x))), 0)
                  AS BIGINT) AS n_chars,
             CAST(len(list_filter(ls, x -> starts_with(ltrim(x), '-')
                                        OR starts_with(ltrim(x), '*')))
                  AS BIGINT) AS bullet_lines,
             CAST(len(list_filter(ls, x -> ends_with(rtrim(x), '...')))
                  AS BIGINT) AS ellipsis_lines
      FROM t),
    f AS (SELECT doc_id, unnest(ls) AS line FROM t),
    gg AS (SELECT doc_id, line, CAST(count(*) AS BIGINT) AS m
           FROM f GROUP BY 1, 2),
    dd AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN m > 1 THEN m ELSE 0 END) AS BIGINT) AS dup_lines,
             CAST(sum(CASE WHEN m > 1 THEN m * length(line) ELSE 0 END)
                  AS BIGINT) AS dup_chars
      FROM gg GROUP BY 1)
    SELECT nn.doc_id, n_lines, dup_lines, dup_chars, bullet_lines,
           ellipsis_lines,
           CAST((2000000 * CAST(dup_lines AS HUGEINT) + n_lines)
                // (2 * CAST(n_lines AS HUGEINT)) AS DOUBLE) / 1e6
             AS dup_line_ratio,
           CASE WHEN n_chars > 0 THEN
             CAST((2000000 * CAST(dup_chars AS HUGEINT) + n_chars)
                  // (2 * CAST(n_chars AS HUGEINT)) AS DOUBLE) / 1e6
           END AS dup_char_ratio,
           CAST((2000000 * CAST(bullet_lines AS HUGEINT) + n_lines)
                // (2 * CAST(n_lines AS HUGEINT)) AS DOUBLE) / 1e6
             AS bullet_ratio,
           CAST((2000000 * CAST(ellipsis_lines AS HUGEINT) + n_lines)
                // (2 * CAST(n_lines AS HUGEINT)) AS DOUBLE) / 1e6
             AS ellipsis_ratio
    FROM nn JOIN dd ON dd.doc_id = nn.doc_id
    """,
)


# lang_id confusion census: integer-exact threshold replay, exact cells,
# device shares — classifier evaluation as a first-class query
_reg(
    "text_langid_eval",
    lambda s, d: tx.text_langid_eval(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT lang,
             CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                                  x -> x IN ('the','a','of','and','to','in','is')))
                  AS BIGINT) AS hits,
             CAST(greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')), 1)
                  AS BIGINT) AS nt
      FROM documents),
    cells AS (
      SELECT lang,
             CASE WHEN 20 * hits >= nt THEN 'en' ELSE 'unk' END AS pred,
             CAST(count(*) AS BIGINT) AS n
      FROM t GROUP BY 1, 2),
    o AS (
      SELECT lang, pred, n,
             CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS label_total
      FROM cells)
    SELECT lang, pred, n, label_total,
           CAST((2000000 * CAST(n AS HUGEINT) + label_total)
                // (2 * CAST(label_total AS HUGEINT)) AS DOUBLE) / 1e6 AS share
    FROM o
    """,
)


# Flesch reading ease as an exact rational on the device — no float
# constants; vowel-group syllables, [.!?]+ sentences
_reg(
    "text_readability",
    lambda s, d: tx.text_readability(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
             CAST(len(list_filter(string_split_regex(text, '[.!?]+'),
                                  x -> trim(x) != '')) AS BIGINT) AS raw_s
      FROM documents),
    b AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS w,
             greatest(raw_s, 1) AS s,
             CAST(coalesce(list_sum(list_transform(toks,
                    x -> greatest(len(regexp_extract_all(x, '[aeiou]+')),
                                  1))), 0) AS BIGINT) AS sy
      FROM t)
    SELECT doc_id, w AS n_words, s AS n_sentences, sy AS n_syllables,
           CASE WHEN w > 0 THEN
             (CASE WHEN 206835 * CAST(s AS HUGEINT) * w
                        - 1015 * CAST(w AS HUGEINT) * w
                        - 84600 * CAST(sy AS HUGEINT) * s < 0
                   THEN -1 ELSE 1 END)
             * CAST((20000 * abs(206835 * CAST(s AS HUGEINT) * w
                                 - 1015 * CAST(w AS HUGEINT) * w
                                 - 84600 * CAST(sy AS HUGEINT) * s)
                     + 1000 * CAST(s AS HUGEINT) * w)
                    // (2 * 1000 * CAST(s AS HUGEINT) * w) AS DOUBLE) / 1e4
           END AS flesch
    FROM b
    """,
)


# Code-likeness screen: deterministic line heuristics + symbol share
_reg(
    "text_code_ratio",
    lambda s, d: tx.text_code_ratio(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT doc_id, string_split(text, chr(10)) AS ls,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(regexp_extract_all(text, '[{};=<>\\[\\]()]'))
                  AS BIGINT) AS n_sym
      FROM documents),
    b AS (
      SELECT doc_id, n_chars, n_sym,
             CAST(len(ls) AS BIGINT) AS n_lines,
             CAST(len(list_filter(ls, x ->
               starts_with(x, '    ') OR starts_with(x, chr(9))
               OR ends_with(rtrim(x), '{') OR ends_with(rtrim(x), '}')
               OR ends_with(rtrim(x), ';')
               OR (contains(x, ' = ') AND NOT contains(x, '. '))))
                  AS BIGINT) AS code_lines
      FROM t)
    SELECT doc_id, n_lines, code_lines, n_sym,
           CAST((2000000 * CAST(code_lines AS HUGEINT) + n_lines)
                // (2 * CAST(n_lines AS HUGEINT)) AS DOUBLE) / 1e6
             AS code_line_ratio,
           CASE WHEN n_chars > 0 THEN
             CAST((2000000 * CAST(n_sym AS HUGEINT) + n_chars)
                  // (2 * CAST(n_chars AS HUGEINT)) AS DOUBLE) / 1e6
           END AS symbol_ratio
    FROM b
    """,
)


# Character-class census per document: exact ASCII class counts via
# delete-and-measure regexes, unsigned device shares
_reg(
    "text_char_classes",
    lambda s, d: tx.text_char_classes(load(s, d, "documents")),
    r"""
    WITH t AS (
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
             CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
                  AS BIGINT) AS n_alpha,
             CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                  AS BIGINT) AS n_digit,
             CAST(length(text)
                  - length(regexp_replace(text, '[ ' || chr(9) || chr(10) || chr(13) || ']', '', 'g'))
                  AS BIGINT) AS n_space
      FROM documents),
    c AS (
      SELECT doc_id, n_chars, n_alpha, n_digit, n_space,
             CAST(n_chars - n_alpha - n_digit - n_space AS BIGINT) AS n_other
      FROM t)
    SELECT doc_id, n_chars, n_alpha, n_digit, n_space, n_other,
           CASE WHEN n_chars > 0 THEN
             CAST((2000000 * CAST(n_alpha AS HUGEINT) + n_chars)
                  // (2 * CAST(n_chars AS HUGEINT)) AS DOUBLE) / 1e6 END AS alpha_share,
           CASE WHEN n_chars > 0 THEN
             CAST((2000000 * CAST(n_digit AS HUGEINT) + n_chars)
                  // (2 * CAST(n_chars AS HUGEINT)) AS DOUBLE) / 1e6 END AS digit_share,
           CASE WHEN n_chars > 0 THEN
             CAST((2000000 * CAST(n_space AS HUGEINT) + n_chars)
                  // (2 * CAST(n_chars AS HUGEINT)) AS DOUBLE) / 1e6 END AS space_share,
           CASE WHEN n_chars > 0 THEN
             CAST((2000000 * CAST(n_other AS HUGEINT) + n_chars)
                  // (2 * CAST(n_chars AS HUGEINT)) AS DOUBLE) / 1e6 END AS other_share
    FROM c
    """,
)


# Per-source token-length order statistics (the packing-config numbers)
_reg(
    "token_length_profile",
    lambda s, d: tx.token_length_profile(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT source, doc_id,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
               AS nt
      FROM documents),
    r AS (
      SELECT source, nt,
             row_number() OVER (PARTITION BY source ORDER BY nt, doc_id) AS rn,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
      FROM t)
    SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS total_tokens,
           CAST(max(CASE WHEN rn = (50 * n + 99) // 100 THEN nt END) AS BIGINT)
             AS p50_tokens,
           CAST(max(CASE WHEN rn = (95 * n + 99) // 100 THEN nt END) AS BIGINT)
             AS p95_tokens,
           CAST(max(nt) AS BIGINT) AS max_tokens
    FROM r GROUP BY 1
    """,
)


# Source-vocabulary overlap matrix: exact shingle-set Jaccard per source
# pair (the corpus-design contamination map)
_reg(
    "text_source_overlap",
    lambda s, d: tx.text_source_overlap(load(s, d, "documents")),
    """
    WITH d AS (
      SELECT source,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            FOR i IN range(1, len(toks) - 1)]) AS sh
      FROM (SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
            FROM documents)
      WHERE len(toks) >= 3),
    flat AS (SELECT DISTINCT source, unnest(sh) AS s FROM d),
    sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n_sh
              FROM flat GROUP BY 1),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS n_inter
      FROM flat a JOIN flat b ON a.s = b.s AND a.source < b.source
      GROUP BY 1, 2)
    SELECT source_a, source_b, n_inter,
           sa.n_sh AS na, sb.n_sh AS nb,
           CAST((2000000 * CAST(n_inter AS HUGEINT)
                 + (sa.n_sh + sb.n_sh - n_inter))
                // (2 * CAST(sa.n_sh + sb.n_sh - n_inter AS HUGEINT))
                AS DOUBLE) / 1e6 AS jaccard
    FROM inter
    JOIN sizes sa ON sa.source = source_a
    JOIN sizes sb ON sb.source = source_b
    """,
)


# Pooled per-(lang, stopword) profile: doc coverage on the unsigned device
_reg(
    "text_stopword_profile",
    lambda s, d: tx.text_stopword_profile(load(s, d, "documents")),
    """
    WITH toks AS (
      SELECT lang, doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      FROM documents),
    hits AS (
      SELECT lang, doc_id, w FROM toks
      WHERE w IN ('the', 'a', 'of', 'and', 'to', 'in', 'is')),
    pw AS (
      SELECT lang, w AS stopword,
             CAST(count(*) AS BIGINT) AS n_occurrences,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM hits GROUP BY 1, 2),
    lt AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_lang_docs
           FROM documents GROUP BY 1)
    SELECT pw.lang, pw.stopword, pw.n_docs, pw.n_occurrences,
           CAST((20000 * (10000 * CAST(pw.n_docs AS HUGEINT))
                 + (10000 * CAST(lt.n_lang_docs AS HUGEINT)))
                // (2 * (10000 * CAST(lt.n_lang_docs AS HUGEINT)))
                AS DOUBLE) / 1e4 AS doc_coverage
    FROM pw JOIN lt ON pw.lang = lt.lang
    """,
)


# Per-doc 3-gram novelty vs corpus ingest order (first appearance = lowest
# doc_id); short docs surface n_grams = 0, novelty null
_reg(
    "text_ngram_novelty",
    lambda s, d: tx.text_ngram_novelty(load(s, d, "documents")),
    """
    WITH d AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            FOR i IN range(1, len(toks) - 1)]) AS sh
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
            FROM documents)),
    flat AS (SELECT doc_id, unnest(sh) AS g FROM d),
    fs AS (SELECT g, min(doc_id) AS first_doc FROM flat GROUP BY g),
    scored AS (
      SELECT flat.doc_id,
             CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(CASE WHEN fs.first_doc = flat.doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_novel
      FROM flat JOIN fs ON flat.g = fs.g
      GROUP BY flat.doc_id)
    SELECT b.doc_id,
           CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(s.n_novel, 0) AS BIGINT) AS n_novel,
           CASE WHEN s.n_grams > 0 THEN
             CAST((20000 * (10000 * CAST(s.n_novel AS HUGEINT))
                   + (10000 * CAST(s.n_grams AS HUGEINT)))
                  // (2 * (10000 * CAST(s.n_grams AS HUGEINT)))
                  AS DOUBLE) / 1e4
           END AS novelty
    FROM (SELECT doc_id FROM documents) b
    LEFT JOIN scored s ON b.doc_id = s.doc_id
    """,
)


# Per-source robust length-outlier census (the agg_robust_zscore rule at
# the documents-per-source grain)
_reg(
    "text_length_outliers",
    lambda s, d: tx.text_length_outliers(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT source, doc_id, CAST(length(text) AS BIGINT) AS x
      FROM documents),
    r AS (
      SELECT source, x, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY x, doc_id) AS rn,
             count(*) OVER (PARTITION BY source) AS n
      FROM t),
    med AS (SELECT source, x AS med_chars FROM r
            WHERE rn = (50 * n + 99) // 100),
    d AS (
      SELECT r.source, abs(r.x - m.med_chars) AS dev, m.med_chars, r.doc_id
      FROM r JOIN med m USING (source)),
    dd AS (
      SELECT source, dev, med_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY dev, doc_id) AS rn,
             count(*) OVER (PARTITION BY source) AS n
      FROM d),
    mad AS (SELECT source, dev AS mad_chars FROM dd
            WHERE rn = (50 * n + 99) // 100),
    g AS (
      SELECT dd.source,
             CAST(max(dd.n) AS BIGINT) AS n_docs,
             CAST(max(dd.med_chars) AS BIGINT) AS med_chars,
             CAST(max(mad.mad_chars) AS BIGINT) AS mad_chars,
             CAST(sum(CASE WHEN 10 * dd.dev > 35 * mad.mad_chars
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM dd JOIN mad USING (source)
      GROUP BY dd.source)
    SELECT source, n_docs, med_chars, mad_chars, n_outliers,
           CAST((2000000 * CAST(n_outliers AS HUGEINT) + n_docs)
                // (2 * CAST(n_docs AS HUGEINT)) AS DOUBLE) / 1e6
             AS outlier_rate
    FROM g
    """,
)


# Zipf rank-frequency fit: the same (freq DESC, token ASC) rank, the same
# rank-ordered list_reduce folds (libm ln on exact integer inputs — the
# entropy/PSI precedent), the same OLS closed form + floor device
_reg(
    "text_zipf_fit",
    lambda s, d: tx.text_zipf_fit(load(s, d, "documents")),
    """
    WITH tf AS (
      SELECT source, t.tok, CAST(count(*) AS BIGINT) AS c
      FROM documents,
           unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) t(tok)
      GROUP BY 1, 2),
    ranked AS (
      SELECT source, c,
             row_number() OVER (PARTITION BY source
                                ORDER BY c DESC, tok ASC) AS rank
      FROM tf QUALIFY rank <= 100),
    folds AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_ranks,
             list_reduce(list_prepend(0.0,
               list(ln(CAST(rank AS DOUBLE)) ORDER BY rank)),
               (a, v) -> a + v) AS sx,
             list_reduce(list_prepend(0.0,
               list(ln(CAST(c AS DOUBLE)) ORDER BY rank)),
               (a, v) -> a + v) AS sy,
             list_reduce(list_prepend(0.0,
               list(ln(CAST(rank AS DOUBLE)) * ln(CAST(c AS DOUBLE))
                    ORDER BY rank)),
               (a, v) -> a + v) AS sxy,
             list_reduce(list_prepend(0.0,
               list(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE))
                    ORDER BY rank)),
               (a, v) -> a + v) AS sxx
      FROM ranked GROUP BY 1),
    fit AS (
      SELECT source, n_ranks, sx, sy,
             CAST(n_ranks AS DOUBLE) * sxx - sx * sx AS den,
             CAST(n_ranks AS DOUBLE) * sxy - sx * sy AS num
      FROM folds)
    SELECT source, n_ranks,
           CASE WHEN n_ranks >= 3 AND den > 0 THEN
             floor(num / den * 1e6 + 0.5) / 1e6 END AS zipf_slope,
           CASE WHEN n_ranks >= 3 AND den > 0 THEN
             floor((sy - (num / den) * sx) / CAST(n_ranks AS DOUBLE)
                   * 1e6 + 0.5) / 1e6 END AS zipf_intercept
    FROM fit
    """,
)


# Unigram cross-entropy quality proxy: the same add-one-smoothed corpus
# distribution, the same one-double-per-(doc,token) term, the same
# token-sorted list_reduce fold and floor device
_reg(
    "quality_unigram_logprob",
    lambda s, d: tx.quality_unigram_logprob(load(s, d, "documents")),
    """
    WITH dt AS (
      SELECT doc_id, t.tok, CAST(count(*) AS BIGINT) AS cdt
      FROM documents,
           unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) t(tok)
      GROUP BY 1, 2),
    corpus AS (
      SELECT tok, CAST(sum(cdt) AS BIGINT) AS ct FROM dt GROUP BY 1),
    nv AS (
      SELECT CAST(sum(ct) AS BIGINT) AS n_corpus,
             CAST(count(*) AS BIGINT) AS v_vocab
      FROM corpus),
    term AS (
      SELECT dt.doc_id, dt.cdt, dt.tok,
             CAST(dt.cdt AS DOUBLE)
             * (ln(CAST(c.ct + 1 AS DOUBLE))
                - ln(CAST(nv.n_corpus + nv.v_vocab AS DOUBLE))) AS t
      FROM dt JOIN corpus c USING (tok) CROSS JOIN nv),
    g AS (
      SELECT doc_id,
             CAST(sum(cdt) AS BIGINT) AS n_tokens,
             list_reduce(list_prepend(0.0, list(t ORDER BY tok)),
                         (a, v) -> a + v) AS s
      FROM term GROUP BY 1)
    SELECT d.doc_id,
           coalesce(g.n_tokens, 0) AS n_tokens,
           CASE WHEN g.n_tokens > 0 THEN
             floor(-g.s / CAST(g.n_tokens AS DOUBLE) * 1e6 + 0.5) / 1e6
           END AS xent_nats
    FROM documents d LEFT JOIN g USING (doc_id)
    """,
)
