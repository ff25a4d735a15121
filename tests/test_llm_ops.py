"""Direct-drive tests for the r14 LLM-pipeline additions (dedup_prefix,
text_ngram_novelty, text_stopword_profile)."""

def test_dedup_prefix_blocks_on_normalized_head(spark):
    """Rewrapped copies (same head, different whitespace) block together;
    different-tail docs sharing a 64-char prefix dedup; short docs block
    on their full normalized text."""
    from kdb_spark.llm.dedup import dedup_prefix

    head = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam"
    docs = spark.createDataFrame(
        [
            (1, head + " tail one continues here"),
            (2, head.replace(" ", "\n \t") + " a completely different tail"),
            (3, "short doc"),
            (4, "Short   DOC"),
            (5, "unrelated text entirely"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_copies for r in dedup_prefix(docs, k=60).collect()}
    assert got == {1: 2, 3: 2, 5: 1}


def test_ngram_novelty_orders_by_doc_id(spark):
    """First doc is 100% novel; an exact repeat is 0% novel; a half-new
    doc scores the exact device ratio; a short doc has no grams."""
    from kdb_spark.llm.textstats import text_ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),            # grams: "a b c", "b c d" -> both novel
            (2, "a b c d"),            # exact repeat -> 0 novel
            (3, "a b c x y z"),        # "a b c" seen; "b c x","c x y","x y z" new
            (4, "tiny doc"),           # < 3 tokens -> no grams
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_grams, r.n_novel, r.novelty)
           for r in text_ngram_novelty(docs).collect()}
    assert got[1] == (2, 2, 1.0)
    assert got[2] == (2, 0, 0.0)
    assert got[3] == (4, 3, 0.75)
    assert got[4] == (0, 0, None)


def test_stopword_profile_counts_and_coverage(spark):
    """Per-(lang, stopword) doc counts, occurrences, device coverage."""
    from kdb_spark.llm.textstats import text_stopword_profile

    docs = spark.createDataFrame(
        [
            (1, "en", "the cat and the hat"),
            (2, "en", "a dog and a log"),
            (3, "en", "no stop words here"),
            (4, "xx", "the the the"),
        ],
        "doc_id long, lang string, text string",
    )
    got = {(r.lang, r.stopword): (r.n_docs, r.n_occurrences, r.doc_coverage)
           for r in text_stopword_profile(docs).collect()}
    assert got[("en", "the")] == (1, 2, 0.3333)
    assert got[("en", "and")] == (2, 2, 0.6667)
    assert got[("en", "a")] == (1, 2, 0.3333)
    assert got[("xx", "the")] == (1, 3, 1.0)
    assert ("en", "no") not in got


def test_emb_text_agreement_pairs_and_cos(spark):
    """Near-dup text pairs carry their embedding cosine; disjoint texts
    emit nothing even when their embeddings agree."""
    from kdb_spark.llm.similarity import emb_text_agreement

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta zeta"),       # high 3-gram overlap
            (3, "one two three four five"),            # disjoint
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = [(r.doc_a, r.doc_b, r.jaccard, r.cos)
           for r in emb_text_agreement(docs, emb).collect()]
    # docs 1,2 share 2 of 4 distinct 3-grams -> jaccard 0.5; cos orthogonal
    assert got == [(1, 2, 0.5, 0.0)]


def test_label_quality_profile(spark):
    """Per-label pooled token/stopword census over the id join; device
    ratios hand-checked."""
    from kdb_spark.llm.curation import curation_label_quality

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "a dog"), (3, "pure content words")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(1, "0"), (2, "0"), (3, "1")], "vec_id long, label string"
    )
    got = {r.label: r for r in curation_label_quality(docs, emb).collect()}
    # label 0: docs 1,2 -> tokens 3+2=5, stop 1+1=2, mean 2.5, share 0.4
    assert (got[0].n_docs, got[0].sum_tokens, got[0].mean_tokens,
            got[0].stop_share) == (2, 5, 2.5, 0.4)
    assert (got[1].n_docs, got[1].sum_tokens, got[1].stop_share) == (1, 3, 0.0)


def test_length_outliers_per_source(spark):
    """Truncated/concatenated records flag against their OWN source's
    median/MAD, not a global one."""
    from kdb_spark.llm.textstats import text_length_outliers

    docs = [(i, "s1", "x" * n) for i, n in
            enumerate([100, 101, 102, 103, 104, 105, 106, 5000], 1)]
    docs += [(100 + i, "s2", "y" * n) for i, n in
             enumerate([5000, 5010, 5020, 5030], 1)]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got = {r.source: r for r in text_length_outliers(df).collect()}
    # s1: median=103, MAD=2 -> the 5000-char doc flags (dev 4897 > 7)
    assert (got["s1"].n_docs, got["s1"].med_chars, got["s1"].mad_chars,
            got["s1"].n_outliers) == (8, 103, 2, 1)
    # s2: 5000-char docs are NORMAL here -> no flags
    assert got["s2"].n_outliers == 0


def test_kfold_census_partitions_everything(spark):
    """Every doc lands in exactly one fold; fold ids are 0..k-1; counts
    sum to n and stay within sampling noise of n/k."""
    from kdb_spark.llm.curation import dataset_kfold

    docs = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    got = {r.fold: r.n_docs for r in dataset_kfold(docs, k=4).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert sum(got.values()) == 1000
    assert all(150 < v < 350 for v in got.values()), got


def test_payload_entropy_separates_flat_from_mixed(spark):
    """A single-byte payload has zero entropy; a uniform 4-symbol payload
    exactly 2 bits; empty payloads surface null — the compressed/
    encrypted detection signal in its exactly-checkable form."""
    from kdb_spark.llm.multimodal import mm_payload_entropy

    mm = spark.createDataFrame(
        [
            (1, bytearray(b"aaaaaaaa")),
            (2, bytearray(b"abcdabcd")),
            (3, bytearray(b"")),
        ],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: (r.byte_len, r.n_distinct_bytes, r.entropy_bits)
           for r in mm_payload_entropy(mm).collect()}
    assert got[1] == (8, 1, 0.0)
    assert got[2] == (8, 4, 2.0)
    assert got[3] == (0, 0, None)


def test_zipf_fit_hand_corpus(spark):
    """Known rank-frequency shape: token freqs 8/4/2/1 at ranks 1-4 give
    slope = OLS of ln(f) on ln(r), replicated in Python floats; a source
    with < 3 distinct tokens emits NULL fit."""
    import math

    from kdb_spark.llm.textstats import text_zipf_fit

    doc = " ".join(["aa"] * 8 + ["bb"] * 4 + ["cc"] * 2 + ["dd"])
    rows = [(1, doc, "en", "s1", len(doc)), (2, "xx yy", "en", "s2", 5)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r.source: r for r in text_zipf_fit(docs).collect()}
    xs = [math.log(r) for r in (1, 2, 3, 4)]
    ys = [math.log(c) for c in (8, 4, 2, 1)]
    # replicate the engines' left-to-right fold explicitly
    sx = 0.0
    for v in xs:
        sx += v
    sy = 0.0
    for v in ys:
        sy += v
    sxy = 0.0
    for a, b in zip(xs, ys):
        sxy += a * b
    sxx = 0.0
    for a in xs:
        sxx += a * a
    n = 4.0
    den = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / den
    intercept = (sy - slope * sx) / n
    assert got["s1"].n_ranks == 4
    assert got["s1"].zipf_slope == math.floor(slope * 1e6 + 0.5) / 1e6
    assert got["s1"].zipf_intercept == math.floor(intercept * 1e6 + 0.5) / 1e6
    assert got["s1"].zipf_slope < -0.9  # near-Zipf decay
    assert got["s2"].zipf_slope is None  # only 2 ranks


def test_unigram_logprob_hand_corpus(spark):
    """Two-doc corpus replicated exactly: corpus counts a=3, b=1 (N=4,
    V=2); doc1 = 'a a b', doc2 = 'a'; xent folds in token-sorted order.
    An empty doc keeps its row with NULL xent."""
    import math

    from kdb_spark.llm.textstats import quality_unigram_logprob

    rows = [
        (1, "a a b", "en", "s", 5),
        (2, "a", "en", "s", 1),
        (3, "...", "en", "s", 3),  # tokenizes to nothing
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r.doc_id: r for r in quality_unigram_logprob(docs).collect()}
    lp = lambda ct: math.log(ct + 1) - math.log(4 + 2)  # noqa: E731
    s1 = 2.0 * lp(3) + 1.0 * lp(1)  # tokens sorted: a then b
    x1 = math.floor(-s1 / 3.0 * 1e6 + 0.5) / 1e6
    s2 = 1.0 * lp(3)
    x2 = math.floor(-s2 / 1.0 * 1e6 + 0.5) / 1e6
    assert (got[1].n_tokens, got[1].xent_nats) == (3, x1)
    assert (got[2].n_tokens, got[2].xent_nats) == (1, x2)
    assert got[3].n_tokens == 0 and got[3].xent_nats is None
    # the common doc scores lower (more typical) than... doc2 is all-'a'
    assert got[2].xent_nats < got[1].xent_nats


def test_dedup_suffix_blocks_on_tail(spark):
    """Docs with different injected heads but identical normalized tails
    group; distinct tails do not; short docs block on full text."""
    from kdb_spark.llm.dedup import dedup_suffix

    tail = "x " * 80  # > 64 normalized chars
    rows = [
        (1, "HEADER A 2024\n" + tail, "en", "s", 10),
        (2, "different crumb trail   " + tail, "en", "s", 10),
        (3, "something else entirely " + "y " * 80, "en", "s", 10),
        (4, "short doc", "en", "s", 9),
        (5, "short   DOC", "en", "s", 11),  # normalizes equal to 4
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r.doc_id: r.n_copies for r in dedup_suffix(docs).collect()}
    assert got == {1: 2, 3: 1, 4: 2}


def test_triplet_eval_deterministic_picks(spark):
    """Hand 2-label corpus: picks are the cyclic label successor (pos)
    and the next-ring as-of id with wrap (neg); violations counted
    against margin 0.1. Label 0 vectors all identical (cos(a,p)=1) and
    orthogonal to label 1 (cos(a,n)=0) -> zero violations; label 1's
    two orthogonal members violate (cos(a,p)=0 < cos(a,n)+0.1)."""
    from kdb_spark.llm.similarity import emb_triplet_eval

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0], 0),
            (2, [1.0, 0.0, 0.0], 0),
            (3, [1.0, 0.0, 0.0], 0),
            (4, [0.0, 1.0, 0.0], 1),
            (5, [0.0, 0.0, 1.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = {r.label: r for r in emb_triplet_eval(emb).collect()}
    # label 0: anchors 1,2,3 (pos 2,3,1; neg = next id in ring 1:
    # 4,4,4) — cos(a,p)=1, cos(a,n)=0 -> margin 1.0, no violations
    assert (got[0].n_triplets, got[0].n_violations, got[0].viol_rate) == (3, 0, 0.0)
    # label 1: anchors 4,5 (pos 5,4; neg from ring 0 wraps: 5->none>5 so
    # min=1, 4->... next id >4 in label 0? none, wrap to 1) — cos(a,p)=0,
    # cos(a,n)=0 -> 0 - 0 < 0.1 violates for both
    assert (got[1].n_triplets, got[1].n_violations, got[1].viol_rate) == (2, 2, 1.0)
