"""Recall gate for the approximate similarity index.

`ann_search_topk` is value-checked exactly by the driver oracle (seeded
plane literals make it deterministic), but an exact hash match can't tell
whether the index still RETRIEVES well — a regressed hyperplane layout
would deterministically return deterministic garbage. This measures
recall@5 against the brute-force `sim_search_topk` ground truth.

Bound: on the driver's near-random synthetic embeddings (true top-5 cos
≈ 0.3-0.37) the documented operating point is recall ≈ 0.5 at the 4x4-bit
defaults (see similarity.py:ann_search_topk). The assertion floor is 0.3:
far enough below the operating point to absorb testdata regeneration,
far above the ~0.06 a broken index (random candidates) would score.
"""

from kdb_spark.llm import similarity as sim
from kdb_spark.tables import load

from tests.conftest import SF_DIR

K = 5
N_QUERIES = 5


def _topk_ids(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["match_id"])
    return out


def test_ann_recall_at_5_vs_bruteforce(spark):
    emb = load(spark, SF_DIR, "embeddings")
    truth = _topk_ids(sim.sim_search_topk(emb, N_QUERIES, K))
    approx = _topk_ids(sim.ann_search_topk(emb, N_QUERIES, K))
    assert set(truth) == set(range(N_QUERIES))
    hits = sum(len(truth[q] & approx.get(q, set())) for q in truth)
    recall = hits / (K * len(truth))
    assert recall >= 0.3, f"recall@5 collapsed: {recall:.2f} (expected ~0.5)"
    # every ANN answer must be a real corpus vector with a sane cosine
    for r in sim.ann_search_topk(emb, N_QUERIES, K).collect():
        assert -1.000001 <= r["cos"] <= 1.000001


def test_pq_recall_at_5_vs_bruteforce(spark):
    """PQ quantization gate: the ADC ranking must still retrieve real
    neighbors, and PQ scores must approximate the true cosine.

    On near-random 64-dim embeddings the 16x4-dim, 32-codeword codebook
    after one Lloyd step measures recall ≈ 0.44; the 0.25 floor catches a
    broken codebook (random codes score ~0.06) while absorbing testdata
    regeneration."""
    emb = load(spark, SF_DIR, "embeddings")
    truth = _topk_ids(sim.sim_search_topk(emb, N_QUERIES, K))
    approx_df = sim.pq_search_topk(emb, N_QUERIES, K)
    approx = _topk_ids(approx_df)
    hits = sum(len(truth[q] & approx.get(q, set())) for q in truth)
    recall = hits / (K * len(truth))
    assert recall >= 0.25, f"PQ recall@5 collapsed: {recall:.2f}"
    # PQ score approximates a cosine of unit vectors: |score| ≤ ~1 plus
    # quantization slack
    for r in approx_df.collect():
        assert -1.5 <= r["score_pq"] <= 1.5


def test_ivf_recall_at_5_vs_bruteforce(spark):
    """IVF probes 2 of 16 lists; on near-random embeddings the measured
    operating point is recall ≈ 0.4-0.6. Floor 0.2 catches a broken
    centroid assignment (random lists ≈ nprobe/n_clusters ≈ 0.12)."""
    emb = load(spark, SF_DIR, "embeddings")
    truth = _topk_ids(sim.sim_search_topk(emb, N_QUERIES, K))
    approx = _topk_ids(sim.ivf_search_topk(emb, N_QUERIES, K))
    hits = sum(len(truth[q] & approx.get(q, set())) for q in truth)
    recall = hits / (K * len(truth))
    assert recall >= 0.2, f"IVF recall@5 collapsed: {recall:.2f}"


def test_ivfpq_recall_at_5_vs_bruteforce(spark):
    """IVF-PQ composes both approximations, so its recall is roughly the
    product of the parents' hit processes: the coarse probe keeps ~the
    IVF candidate set, ADC re-ranks it with PQ distortion. Floor 0.15
    sits above random-under-probe (~nprobe/n_clusters · PQ noise ≈ 0.05)
    and below the measured operating point, which this test prints."""
    emb = load(spark, SF_DIR, "embeddings")
    truth = _topk_ids(sim.sim_search_topk(emb, N_QUERIES, K))
    approx_df = sim.ivfpq_search_topk(emb, N_QUERIES, K)
    approx = _topk_ids(approx_df)
    hits = sum(len(truth[q] & approx.get(q, set())) for q in truth)
    recall = hits / (K * len(truth))
    print(f"ivfpq recall@5 = {recall:.2f}")
    assert recall >= 0.15, f"IVF-PQ recall@5 collapsed: {recall:.2f}"
    # every probed answer carries a PQ score in the plausible band
    for r in approx_df.collect():
        assert -1.5 <= r["score_pq"] <= 1.5


def test_emb_recall_eval_matches_inline_intersection(spark):
    """The recall-eval OPERATOR must report exactly the intersection its
    two parents produce, with the device ratio — and clear the suite's
    ANN floor on the mean."""
    emb = load(spark, SF_DIR, "embeddings")
    truth = _topk_ids(sim.sim_search_topk(emb))
    approx = _topk_ids(sim.ann_search_topk(emb))
    got = {r.query_id: r for r in sim.emb_recall_eval(emb).collect()}
    assert set(got) == set(truth)
    for q in truth:
        want_hit = len(truth[q] & approx.get(q, set()))
        assert got[q].n_hit == want_hit and got[q].k == 5
        grid = (2_000_000 * want_hit + 5) // 10
        assert got[q].recall == grid / 1e6
    mean = sum(r.n_hit for r in got.values()) / (5 * len(got))
    assert mean >= 0.3
