"""Dataset-curation operators (SURVEY.md §2.K extensions): deterministic
train/val/test splitting, hash-bucket sampling, and PII redaction — the
bookkeeping steps of a training-data pipeline between dedup and export.

All JVM expressions (md5 + string compare + regexp_replace): one scan, no
shuffle, no UDF — a 100 TB split/redact is a single map-only pass whose
filters Catalyst pushes into the parquet scan of downstream readers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kdb_spark.analytics.exact import floor_div_sql
from kdb_spark.llm.dedup import tokens
from kdb_spark.tables import md5_slot

# 256 md5-prefix buckets, split by lexicographic range of the first two hex
# chars: ["00","c0") = 192/256 = 75% train, ["c0","e0") = 12.5% val,
# ["e0","ff"] = 12.5% test. The md5 of the *stringified* key is identical
# in every engine (lowercase hex), so the assignment is reproducible
# anywhere — the property a split column must have so that re-running the
# pipeline (or running it in another engine) never migrates a document
# across splits.
TRAIN_UPPER = "c0"
VAL_UPPER = "e0"


def split_expr(key: str | F.Column = "doc_id") -> F.Column:
    """The md5-bucket train/val/test assignment as a reusable expression —
    the ONE definition `dataset_split` and `pipeline_corpus_prep` share."""
    key_col = F.col(key) if isinstance(key, str) else key
    bucket = F.substring(F.md5(key_col.cast("string")), 1, 2)
    return (
        F.when(bucket < TRAIN_UPPER, F.lit("train"))
        .when(bucket < VAL_UPPER, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def dataset_split(documents: DataFrame, key: str = "doc_id") -> DataFrame:
    """Deterministic train/val/test assignment by md5(key) prefix bucket.

    Content-independent (keyed on the id, not the text) so near-duplicate
    mitigation stays the dedup ops' job; hash-keyed so the split is stable
    under repartitioning, insertion order, and engine choice — unlike
    `df.randomSplit`, which reshuffles membership per run/plan.
    """
    bucket = F.substring(F.md5(F.col(key).cast("string")), 1, 2)
    return documents.select(
        F.col(key),
        bucket.alias("bucket"),
        split_expr(key).alias("split"),
    )


def sample_hash(documents: DataFrame, pct: int, key: str = "doc_id") -> DataFrame:
    """Deterministic pct% sample: keep rows whose md5-prefix bucket falls in
    the first `pct` of 100 equal-ish slices. Same stability contract as
    `dataset_split`; used to carve repeatable eval subsets from a corpus."""
    return documents.where(md5_slot(key, hex_chars=4, mod=100) < pct)


# RE2-safe (and Java-regex-safe) patterns — no backrefs, no lookaround, so
# the same pattern string runs on Spark (Java regex), DuckDB (RE2), and any
# other RE2-family engine.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
LONGNUM_RE = "[0-9]{10,}"


def decontaminate(documents: DataFrame, n: int = 3) -> DataFrame:
    """Benchmark decontamination: count, per train/val document, the distinct
    word n-grams it shares with the held-out test split — the standard
    "is my training set contaminated with eval data" check run before
    every model train.

    Test membership comes from the same md5 split as `dataset_split`, so
    the op is self-contained and engine-reproducible. The test split's
    distinct-gram set is built once and equi-joined on an 8-byte xxhash64
    of the gram — at 100 TB the eval side is tiny relative to the corpus
    (AQE broadcasts it), and the train side streams through map-side;
    nothing ever materializes all-pairs. Emits only contaminated docs.
    """
    from kdb_spark.llm.dedup import shingles, tokens

    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)

    # The test/train branches filter on disjoint doc_id buckets, and the
    # split predicate depends only on doc_id, so Catalyst pushes each
    # filter below the tokenizer projection — every doc is tokenized
    # exactly once, in exactly one branch, with nothing materialized
    # (a persist of the exploded gram frame measured 17x slower at sf0.1).
    def _grams(side: F.Column) -> DataFrame:
        return (
            documents.filter(side)
            .select("doc_id", tokens("text").alias("toks"))
            .select("doc_id", F.explode(shingles(F.col("toks"), n)).alias("s"))
            .select("doc_id", F.xxhash64("s").alias("s"))
        )

    eval_grams = _grams(bucket >= VAL_UPPER).select("s").distinct()
    return (
        _grams(bucket < VAL_UPPER)
        .join(eval_grams, "s")
        # shingles() is per-doc distinct, so the count IS distinct grams hit
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )


def pack_sequences(
    documents: DataFrame, budget: int = 256, n_buckets: int = 64
) -> DataFrame:
    """Sequence packing: assign every document to a fixed-token-budget pack
    for LLM pre-training (concatenate-and-chunk semantics — a doc belongs
    to the pack where its first token lands).

    Scale shape: a single GLOBAL concat order would serialize the corpus
    through one window partition, so docs are first routed to one of
    `n_buckets` md5 buckets (deterministic, engine-portable — same contract
    as `dataset_split`) and packed independently per bucket: the window
    cumsum runs as `n_buckets` parallel partitions, each a bounded slice of
    the corpus. pack_id is globally unique via (bucket, within-bucket id).
    """
    n_tok = F.size(tokens("text")).cast("long")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % n_buckets
    )
    w = Window.partitionBy("bucket").orderBy("doc_id")
    return (
        documents.select(
            "doc_id", bucket.alias("bucket"), n_tok.alias("n_tok")
        )
        .withColumn("start_off", F.sum("n_tok").over(w) - F.col("n_tok"))
        .select(
            "doc_id",
            "bucket",
            "n_tok",
            (F.col("bucket") * 1_000_000_000 + F.floor(F.col("start_off") / budget))
            .cast("long")
            .alias("pack_id"),
            (F.col("start_off") % budget).cast("long").alias("pack_offset"),
        )
    )


def chunk_documents(
    documents: DataFrame, size: int = 64, overlap: int = 8
) -> DataFrame:
    """Split long documents into fixed-size token chunks with overlap — the
    context-window prep step (pack_sequences' complement: packing fills a
    budget with whole short docs; chunking cuts docs that exceed it).

    Chunk starts stride by (size - overlap); the last chunk is the
    remainder (never empty unless the doc is). Map-only: tokenize once,
    explode a per-doc `sequence` of chunk indices, slice the token array —
    no shuffle, no UDF; at 100 TB this pipelines into the corpus scan.
    """
    stride = size - overlap
    n_tok = F.size("toks")
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n_tok - F.lit(overlap)) / F.lit(stride)).cast("int")
    )
    return (
        documents.select("doc_id", tokens("text").alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.concat_ws(
                " ", F.slice("toks", F.col("chunk_id") * stride + 1, size)
            ).alias("chunk_text"),
            F.least(
                F.size("toks") - F.col("chunk_id") * stride, F.lit(size)
            ).cast("long").alias("n_tok_chunk"),
        )
    )


def stratified_sample(
    documents: DataFrame, rates: dict[str, int] | None = None, key: str = "doc_id"
) -> DataFrame:
    """Per-stratum deterministic sampling — the "data mixing" primitive:
    keep `rates[lang]` percent of each language's docs (md5-hash slot, same
    stability contract as `sample_hash`, so membership never migrates under
    repartitioning or engine choice).

    The rate table is plan-time literal (a `when` chain, not a join): the
    whole op is one map-only scan whose predicate pushes into the read.
    """
    rates = rates or {"en": 100, "de": 50, "fr": 25}
    slot = (
        F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    rate = F.lit(0)
    for lang, pct in rates.items():
        rate = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(rate)
    return documents.select("doc_id", "lang", "source").where(slot < rate)


def pii_redact(documents: DataFrame) -> DataFrame:
    """Redact emails and 10+-digit numbers (card/phone/SSN-shaped runs) from
    the text column, counting each redaction class per document.

    `regexp_replace` / `regexp_count` are JVM expressions — the whole op is
    one map-only pass over the corpus with no shuffle; at 100 TB it
    pipelines into whatever scan feeds it.
    """
    return documents.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", EMAIL_RE, "<EMAIL>"),
            LONGNUM_RE,
            "<NUM>",
        ).alias("clean_text"),
        F.regexp_count("text", F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count("text", F.lit(LONGNUM_RE)).cast("long").alias("n_longnums"),
    )


def mix_weights(documents: DataFrame) -> DataFrame:
    """Per-source sampling rates that rebalance the corpus toward a uniform
    source mixture — the data-mixing primitive (each source's rate is the
    probability `sample_hash` would then apply per doc).

    rate_s = min(1, (total_chars / n_sources) / chars_s): over-represented
    sources are downsampled to the uniform share, under-represented ones
    keep everything (rate 1.0 — this op never upsamples). One tiny
    hash-aggregate (|sources| rows) + a broadcast of the 1-row total; all
    ratios derive from exact bigint char sums, so the rates are
    engine-exact. Swap the uniform target for a weights table join to hit
    any published mixture.
    """
    per = documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars"),
    )
    tot = per.agg(
        F.sum("chars").alias("total"), F.count(F.lit(1)).alias("k")
    )
    rate = F.least(
        F.lit(1.0),
        (F.col("total").cast("double") / F.col("k")) / F.col("chars"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("chars").cast("long").alias("n_chars_sum"),
            F.round(rate, 6).alias("mix_rate"),
            F.round(F.round(rate, 6) * F.col("chars"))
            .cast("long")
            .alias("expected_chars"),
        )
    )


def pipeline_corpus_prep(documents: DataFrame) -> DataFrame:
    """End-to-end corpus preparation, composed from this engine's own
    stages: normalize (`text_normalize` semantics) → quality gate
    (`quality_score` semantics, keep score ≥ 3) → exact dedup on the
    normalized content hash (lowest doc_id is canonical) → deterministic
    md5-bucket split (`dataset_split` semantics) → per-split corpus
    accounting.

    The point is the COMPOSITION: the map-only stages (normalize, score,
    split) fuse into the scan's projection — Catalyst pipelines them into
    one pass — so the whole prep costs ONE content-hash shuffle plus a
    |splits|-row aggregate at any scale. Per-doc token/char sums are
    computed from the normalized text, so every duplicate in a hash group
    agrees on them and the canonical pick is value-stable.
    """
    from kdb_spark.llm.dedup import tokens
    from kdb_spark.llm.textstats import _CTRL_RE, _WS_RE, quality_score_expr

    norm = F.lower(
        F.trim(
            F.regexp_replace(
                F.regexp_replace("text", _CTRL_RE, " "), _WS_RE, " "
            )
        )
    )
    score = quality_score_expr(F.col("toks"))
    kept = (
        documents.select(
            "doc_id", "text", F.lit(norm).alias("norm_text"), tokens("text").alias("toks")
        )
        .filter(score >= 3)
        .select(
            "doc_id",
            F.md5("norm_text").alias("h"),
            F.length("norm_text").cast("long").alias("n_chars_norm"),
            F.size(tokens("norm_text")).cast("long").alias("n_toks_norm"),
        )
    )
    canonical = kept.groupBy("h").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("n_chars_norm").alias("n_chars_norm"),  # equal within a group
        F.min("n_toks_norm").alias("n_toks_norm"),
    )
    return (
        canonical.select(split_expr("doc_id").alias("split"), "n_chars_norm", "n_toks_norm")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars_norm").cast("long").alias("n_chars_sum"),
            F.sum("n_toks_norm").cast("long").alias("n_tokens_sum"),
        )
    )


def mix_apply(documents: DataFrame) -> DataFrame:
    """Materialize the mixture `mix_weights` prescribes: keep each doc with
    its source's rate, decided by the doc's own md5 slot — deterministic,
    repartition-stable, and exactly the acceptance rule `sample_hash` uses,
    so re-running the pipeline anywhere reproduces the same corpus.

    The rate table is |sources| rows (broadcast); the gate is a map-only
    integer compare (slot/10^6 < rate as slot < rate·10^6 — no float
    division per row). One tiny agg + one broadcast join at any scale.
    """
    rates = mix_weights(documents).select("source", "mix_rate")
    slot = md5_slot("doc_id")
    return (
        documents.join(F.broadcast(rates), "source")
        # explicit round: Spark's cast-to-long truncates while other
        # engines round, and rate*10^6 sits a ULP under an integer
        .filter(slot < F.round(F.col("mix_rate") * 1_000_000).cast("long"))
        .select("doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"))
    )


def mix_temperature(documents: DataFrame) -> DataFrame:
    """Temperature-scaled source mixture — the standard multilingual /
    multi-source balancing rule (sample source s with probability
    ∝ share^α): α < 1 flattens the mixture toward uniform without
    mix_weights' hard equal-share target. Fixed at α = 0.5, implemented
    as sqrt — IEEE 754 REQUIRES sqrt to be correctly rounded (pow is
    not, and Java's Math.pow vs C's pow differ by ulps — an engine-
    portability trap for any other α).

    Order-independence: the normalizing Σ share^α is a float sum, so
    summing it directly would be partition-order-dependent; instead each
    term is quantized to a 10^12 bigint grid first (the `_qmean` device)
    and the denominator is an EXACT integer sum. q_s and the
    downsample-only rate derive through identical double expressions in
    both engines. One |sources|-row hash-agg + a broadcast 1-row total —
    same shape and cost as mix_weights at any scale.

    Exact-parity contract (r11): target_share = round(t/denom, 6) and
    mix_rate = round(min(1, t·total/(denom·chars)), 6) are ratios of
    EXACT bigints, so the rounding happens entirely in integer space —
    half-up via `(2·10^6·num + den) DIV (2·den)` on decimal(38,0)
    (the win_donchian / _iround6 device; all operands non-negative here)
    — then ONE exact cast to double and a /1e6. Never `round(double, 6)`:
    Spark HALF_UPs the shortest decimal string while DuckDB C-rounds the
    binary double, and they disagree on exact half boundaries (the r9
    win_macd driver FAIL). The min-with-1 commutes with the rounding
    (x ≤ 1 ⇒ round6(x) ≤ 10^6), so it is applied to the integer grid.
    """
    per = documents.groupBy("source").agg(F.sum("n_chars").alias("chars"))
    tot = per.agg(F.sum("chars").alias("total"))
    with_t = per.crossJoin(F.broadcast(tot)).withColumn(
        "t",
        F.round(
            F.sqrt(F.col("chars").cast("double") / F.col("total")) * 1e12
        ).cast("long"),
    )
    denom = with_t.agg(F.sum("t").alias("denom"))
    share6 = F.expr(
        floor_div_sql(
            "2000000 * CAST(t AS DECIMAL(38,0)) + denom",
            "2 * CAST(denom AS DECIMAL(38,0))",
        )
    )
    rate6 = F.expr(
        "least(CAST(1000000 AS DECIMAL(38,0)), "
        + floor_div_sql(
            "2000000 * CAST(t AS DECIMAL(38,0)) * CAST(total AS DECIMAL(38,0))"
            " + CAST(denom AS DECIMAL(38,0)) * CAST(chars AS DECIMAL(38,0))",
            "2 * CAST(denom AS DECIMAL(38,0)) * CAST(chars AS DECIMAL(38,0))",
        )
        + ")"
    )
    return (
        with_t.crossJoin(F.broadcast(denom))
        .select(
            "source",
            F.col("chars").cast("long").alias("n_chars_sum"),
            (share6.cast("double") / F.lit(1e6)).alias("target_share"),
            (rate6.cast("double") / F.lit(1e6)).alias("mix_rate"),
        )
    )


def curation_token_budget(documents: DataFrame, budget: int = 10_000) -> DataFrame:
    """Fill a token budget with the best documents — "take the highest-
    quality docs until N tokens" (the curation step between scoring and
    training). Returns the kept docs with their score and token count.

    NO global sort: quality scores are a bounded integer domain (0-4), so
    the cut is two phases. (1) a |levels|-row aggregate finds how many
    tokens each score level holds; every level whose running total (from
    the top score down) fits entirely is kept whole. (2) the single
    BOUNDARY level is thinned to the remaining budget by the engine's
    md5-slot gate (`mix_apply`'s device): keep docs whose slot falls
    under remaining/level_tokens — deterministic, repartition-stable,
    map-only, and hash-approximate to the budget (documented: the cut is
    by expected tokens, not an exact running sum — an exact cut needs a
    global ordered cumsum, which is a single-partition window at 100 TB).
    Shape: one scan for the level agg, one broadcast of the ≤5-row level
    table, one map-only gated scan.
    """
    from kdb_spark.llm.dedup import tokens
    from kdb_spark.llm.textstats import quality_score_expr

    # materialize toks ONCE per row (quality_score_expr's documented
    # precondition): an inline tokens() expression would re-run the regex
    # tokenizer at each of the expression's ~6 references
    scored = documents.select(
        "doc_id", "text", tokens("text").alias("toks")
    ).select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        quality_score_expr(F.col("toks")).cast("long").alias("score"),
    )
    levels = (
        scored.groupBy("score")
        .agg(F.sum("n_tokens").alias("level_tokens"))
        .withColumn(
            "above",
            F.sum("level_tokens").over(
                Window.orderBy(F.desc("score")).rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .withColumn("above", F.coalesce("above", F.lit(0)))
        # remaining budget entering this level; whole-keep if it covers
        # the level, thin-keep fraction otherwise, drop when exhausted
        .withColumn(
            "remaining", F.greatest(F.lit(0), F.lit(budget) - F.col("above"))
        )
        .withColumn(
            "keep_rate",
            F.when(F.col("remaining") >= F.col("level_tokens"), F.lit(1.0))
            .when(F.col("remaining") <= 0, F.lit(0.0))
            .otherwise(
                F.col("remaining").cast("double")
                / F.col("level_tokens").cast("double")
            ),
        )
        .select("score", "keep_rate")
    )
    slot = md5_slot("doc_id")
    return (
        scored.join(F.broadcast(levels), "score")
        .filter(slot < F.round(F.col("keep_rate") * 1_000_000).cast("long"))
        .select("doc_id", "score", "n_tokens")
    )


def curation_dataset_card(documents: DataFrame) -> DataFrame:
    """Per-source dataset card — the one-table corpus summary a training
    run's data sheet starts from: document and token counts, language
    spread, English share, mean document length, and the short-doc share
    (the docs a quality gate would drop first). Every mixing/rebalancing
    decision (mix_weights, mix_temperature) reads exactly these numbers.

    EXACT cross-engine: token counts are exact integers off the shared
    tokenizer, all shares/means ride the unsigned decimal device at 6 dp
    (a source row exists only with ≥ 1 doc, so no zero guards).

    Scale shape: ONE corpus scan → one per-source hash agg (map-side
    combined) + one tiny distinct-lang agg joined on the ≤|sources| rows.
    """
    from kdb_spark.analytics.exact import iround_col
    from kdb_spark.llm.dedup import tokens

    t = documents.select(
        "source",
        "lang",
        F.size(tokens("text")).cast("long").alias("nt"),
        F.length("text").cast("long").alias("nc"),
    )
    g = t.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("n_tokens"),
        F.sum("nc").cast("long").alias("n_chars"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("n_en"),
        F.sum(F.when(F.col("nt") < 50, 1).otherwise(0))
        .cast("long")
        .alias("n_short"),
    )
    langs = t.groupBy("source").agg(
        F.countDistinct("lang").cast("long").alias("n_langs")
    )
    j = g.join(langs, "source")
    den = "CAST(n_docs AS DECIMAL(38,0))"
    return j.select(
        "source",
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_langs",
        iround_col("n_en", den, 6, signed=False).alias("en_share"),
        iround_col("n_short", den, 6, signed=False).alias("short_share"),
        iround_col("n_tokens", den, 6, signed=False).alias("mean_tokens"),
    )


def curation_filter_funnel(
    documents: DataFrame,
    min_chars: int = 100,
    max_chars: int = 400,
    min_alpha_pct: int = 55,
    min_wordlen: int = 3,
    max_wordlen: int = 9,
) -> DataFrame:
    """Sequential quality-gate funnel per source: how many documents
    survive each successive filter — non-empty → length band → alphabetic
    share → mean-word-length band → known language tag — the
    drop-attribution report a curation pipeline publishes next to its
    dataset card (quality_score ranks docs; this explains WHERE the
    corpus thins, per gate, per source, so a collapsed source is visible
    as its failing stage, not a mystery count).

    Every predicate is INTEGER cross-multiplication (100·n_alpha ≥
    pct·n_chars; wl_lo·n_words ≤ n_letters ≤ wl_hi·n_words), so no
    device is consulted until the final pass-rate. Gates are cumulative
    ANDs (a doc failing length is not re-tested downstream — first-fail
    semantics, the funnel contract).

    Scale shape: map-only predicates folded into ONE hash agg per source
    (map-side combine); output is ≤|sources| rows.
    """
    n = F.length("text").cast("long")
    n_alpha = (
        F.length("text") - F.length(F.regexp_replace("text", "[A-Za-z]", ""))
    ).cast("long")
    n_words = F.size(tokens("text")).cast("long")
    s1 = n > 0
    s2 = s1 & (n >= min_chars) & (n <= max_chars)
    s3 = s2 & (100 * n_alpha >= min_alpha_pct * n)
    s4 = (
        s3
        & (min_wordlen * n_words <= n_alpha)
        & (n_alpha <= max_wordlen * n_words)
        & (n_words > 0)
    )
    s5 = s4 & F.col("lang").isin("en", "de", "fr", "es", "zh")
    g = documents.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(s1.cast("long")).cast("long").alias("n_nonempty"),
        F.sum(s2.cast("long")).cast("long").alias("n_len_ok"),
        F.sum(s3.cast("long")).cast("long").alias("n_alpha_ok"),
        F.sum(s4.cast("long")).cast("long").alias("n_wordlen_ok"),
        F.sum(s5.cast("long")).cast("long").alias("n_pass"),
    )
    rate6 = F.expr(
        floor_div_sql(
            "2000000 * CAST(n_pass AS DECIMAL(38,0)) + n_docs",
            "2 * CAST(n_docs AS DECIMAL(38,0))",
        )
    )
    return g.select(
        "source",
        "n_docs",
        "n_nonempty",
        "n_len_ok",
        "n_alpha_ok",
        "n_wordlen_ok",
        "n_pass",
        (rate6.cast("double") / F.lit(1e6)).alias("pass_rate"),
    )


def curation_label_quality(
    documents: DataFrame, embeddings: DataFrame
) -> DataFrame:
    """Per-label text-quality profile across modalities: join each
    document to its embedding LABEL (doc_id = vec_id — the topic/cluster
    assignment) and pool token counts, stopword density, and document
    length per label — the table a mix designer reads before weighting
    labels (mix_weights reweights SOURCES; this is the same census at
    the semantic-label grain, and a label whose stopword density or
    length profile is off is a labeling bug surfaced before training).

    Exact: counts and sums are bigint; both ratios (mean tokens, pooled
    stopword share) ride the integer device at 4 dp. Map-only per side
    plus ONE hash join on the id and a ≤|labels| aggregate.
    """
    from kdb_spark.analytics.exact import iround_col
    from kdb_spark.llm.textstats import EN_STOPWORDS

    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    t = documents.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_m"),
        F.explode(F.array(tokens("text"))).alias("toks"),
    ).select(
        "doc_id",
        "n_chars_m",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.filter("toks", lambda x: F.array_contains(stop_arr, x)))
        .cast("long")
        .alias("n_stop"),
    )
    j = t.join(
        embeddings.select(
            F.col("vec_id").alias("doc_id"),
            F.col("label").cast("long").alias("label"),
        ),
        "doc_id",
    )
    g = j.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        F.sum("n_stop").cast("long").alias("sum_stop"),
        F.sum("n_chars_m").cast("long").alias("sum_chars"),
    )
    mean_tok4 = iround_col(
        "10000 * CAST(sum_tokens AS DECIMAL(38,0))",
        "10000 * CAST(n_docs AS DECIMAL(38,0))",
        4,
        signed=False,
    )
    stop4 = iround_col(
        "10000 * CAST(sum_stop AS DECIMAL(38,0))",
        "10000 * CAST(greatest(sum_tokens, 1) AS DECIMAL(38,0))",
        4,
        signed=False,
    )
    return g.select(
        "label",
        "n_docs",
        "sum_tokens",
        "sum_chars",
        mean_tok4.alias("mean_tokens"),
        stop4.alias("stop_share"),
    )


def dataset_kfold(documents: DataFrame, k: int = 5, key: str = "doc_id") -> DataFrame:
    """Deterministic k-fold assignment by md5 slot (fold = slot mod k) —
    the cross-validation sibling of `dataset_split`: stable under
    repartitioning, insertion order, and engine choice (randomSplit is
    none of these), and content-independent so dedup keeps owning leak
    prevention. Emits the assignment plus the per-fold census a CV
    harness checks before training (md5 uniformity keeps folds within
    sampling noise of n/k — the census is where skew would surface).
    """
    from kdb_spark.tables import md5_slot

    fold = (md5_slot(F.col(key)) % F.lit(k)).cast("long")
    return (
        documents.select(fold.alias("fold"))
        .groupBy("fold")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def curation_skyline(documents: DataFrame) -> DataFrame:
    """Pareto frontier (skyline) of documents per source: maximize
    vocabulary richness (distinct-token count) while minimizing length
    (n_chars) — a doc survives iff NO other doc in its source is at
    least as rich AND at least as short with one strict. This is the
    multi-objective selection cut curation actually wants ("the densest
    docs at every length budget") where a single quality score forces an
    arbitrary trade-off weight; the frontier IS the menu of optimal
    trade-offs.

    Spark-first 2D skyline: sort-by-one-dimension + running-max-of-the-
    other — a doc is dominated iff some STRICTLY shorter doc has ≥ its
    type count (m1 = max over the strictly-smaller-n_chars range frame)
    or some equal-length doc has strictly more (m2 = max over the
    n_chars peer frame). One Exchange on source shared by both Window
    frames; the naive skyline is an O(n²) self-join — this is the
    O(n log n) form, and it stays exact (ties survive together:
    identical (n_chars, n_types) pairs don't dominate each other).

    EXACT cross-engine: the metric is the shared [a-z0-9]+ tokenizer's
    distinct count (pure integers; array-lambda, map-only — no token
    explode), and dominance is integer comparison. At 100 TB the
    per-source sort is the cost — the global-sort disclosure class
    (sql_ltv_deciles), but per-SOURCE partitioned, so it parallelizes
    across the mixture.
    """
    from kdb_spark.llm.dedup import tokens

    t = documents.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size(F.array_distinct(tokens("text"))).cast("long").alias("n_types"),
    )
    w_lt = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = Window.partitionBy("source", "n_chars")
    m = t.select(
        "source",
        "doc_id",
        "n_chars",
        "n_types",
        F.max("n_types").over(w_lt).alias("m1"),
        F.max("n_types").over(w_eq).alias("m2"),
    )
    return m.filter(
        (F.col("m1").isNull() | (F.col("n_types") > F.col("m1")))
        & (F.col("n_types") == F.col("m2"))
    ).select("source", "doc_id", "n_chars", "n_types")


def dataset_balance(documents: DataFrame, key: str = "lang") -> DataFrame:
    """Class-balanced subset: per ``key`` class, keep exactly
    min(class-count) documents — the uniform-class training cut
    (`stratified_sample` keeps PROPORTIONS; this equalizes them, the
    standard fix when a 90/10 label skew makes the classifier trivial).

    Deterministic selection: within each class, docs rank by the
    md5_slot of doc_id (the repo's one portable sampling order) with
    doc_id tie-break, and the first `floor` survive — repartition- and
    insertion-order-stable, oracle-reproducible.

    Scale shape: one |classes|-sized count agg broadcast back, one
    per-class rank window (the Exchange on ``key`` is shared), one
    filter. The rank sort is per-class, parallel across the mixture.
    """
    counts = documents.groupBy(key).agg(F.count(F.lit(1)).alias("_n"))
    floor_n = counts.agg(F.min("_n").alias("_floor"))
    w = Window.partitionBy(key).orderBy(md5_slot("doc_id"), "doc_id")
    return (
        documents.withColumn("_rk", F.row_number().over(w))
        .crossJoin(F.broadcast(floor_n))
        .filter(F.col("_rk") <= F.col("_floor"))
        .select(
            "doc_id",
            F.col(key).alias("class_key"),
            F.col("_rk").cast("long").alias("rank_in_class"),
        )
    )


def curation_filter_overlap(documents: DataFrame) -> DataFrame:
    """Pairwise overlap matrix of the standard curation filters — for
    every filter pair, how many docs BOTH would remove vs each alone.
    `curation_filter_funnel` shows sequential attrition (order-dependent
    by design); this is the order-free complement that answers "is this
    filter buying anything the others don't" before anyone re-orders the
    funnel.

    Filters (deterministic, the repo's exact devices): `short`
    (n_chars < 200), `dup` (exact-dup non-keeper — doc_id ≠ min doc_id
    of its text group), `rare_lang` (outside the corpus's top-2
    languages by census), `low_alpha` (alpha-token count < 25 via the
    shared tokenizer).

    Shape: one doc pass computes all four flags (the dup flag joins the
    min-per-text hash agg back — content-hash-keyed, broadcastable
    increment-side; the lang top-2 is a |langs| census broadcast), then
    the 4×4 matrix falls out of ONE aggregate of 16 conditional sums,
    unpivoted via stack — no per-pair scans, no explode of the corpus.
    """
    from kdb_spark.llm.dedup import tokens

    lang_top = (
        documents.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), "lang")
        .limit(2)
        .select("lang", F.lit(True).alias("_top"))
    )
    keeper = documents.groupBy("text").agg(F.min("doc_id").alias("_keep_id"))
    flagged = (
        documents.join(F.broadcast(lang_top), "lang", "left")
        .join(keeper, "text")
        .select(
            "doc_id",
            (F.col("n_chars") < 200).alias("f_short"),
            (F.col("doc_id") != F.col("_keep_id")).alias("f_dup"),
            F.col("_top").isNull().alias("f_rare_lang"),
            (F.size(tokens("text")) < 25).alias("f_low_alpha"),
        )
    )
    names = ["short", "dup", "rare_lang", "low_alpha"]
    cols = ["f_short", "f_dup", "f_rare_lang", "f_low_alpha"]
    aggs = []
    for i, (na, ca) in enumerate(zip(names, cols)):
        for nb, cb in list(zip(names, cols))[i:]:
            aggs.append(
                F.sum((F.col(ca) & F.col(cb)).cast("int"))
                .cast("long")
                .alias(f"{na}__{nb}")
            )
    wide = flagged.agg(*aggs)
    pairs = [f"{na}__{nb}" for i, na in enumerate(names) for nb in names[i:]]
    stack = ", ".join(f"'{p}', {p}" for p in pairs)
    long = wide.selectExpr(
        f"stack({len(pairs)}, {stack}) as (pair, n_both)"
    )
    return long.select(
        F.split("pair", "__")[0].alias("filter_a"),
        F.split("pair", "__")[1].alias("filter_b"),
        F.col("n_both").cast("long").alias("n_both"),
    )
