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
