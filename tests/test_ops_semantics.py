"""Hand-computed semantic cases for the round-6 operators.

The oracle gate checks these ops against DuckDB on the generated tables;
these tests pin the CORNER semantics on tiny hand-built inputs the
generated data may never exercise (ties, series heads, zero variance,
all-null columns) — the same micro-case strategy the reference's own
tests use for its kernel (`dbase/dbase_test.go:146-212`).
"""

import math

import pytest

from kdb_spark.analytics import aggregations as agg
from kdb_spark.analytics import joins as jn
from kdb_spark.analytics import windows as wn
from kdb_spark.llm import curation as cu
from kdb_spark.llm import textstats as tx

EV_SCHEMA = "event_id long, user_id long, event_type string, value double, ts_us long"


def _events(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


# -------------------------------------------------------- join_asof_forward


def test_asof_forward_same_us_and_lww_tie(spark):
    """At-or-after includes a same-µs error; two errors at the SAME (user,
    ts) resolve to the max event_id (last-write-wins), and a click with no
    later error is dropped — pinned against the r10 single-scan rewrite."""
    ev = _events(
        spark,
        [
            (1, 1, "click", 0.0, 100),   # matches same-µs error below
            (2, 1, "error", 5.0, 100),
            (3, 1, "click", 0.0, 200),   # next errors at 300: LWW ⇒ eid 5
            (4, 1, "error", 7.0, 300),
            (5, 1, "error", 9.0, 300),
            (6, 1, "click", 0.0, 400),   # no error after ⇒ dropped
        ],
    )
    got = {r.event_id: r.next_value for r in jn.join_asof_forward(ev).collect()}
    assert got == {1: 5.0, 3: 9.0}


# ------------------------------------------------------------- join_nearest


def test_join_nearest_tie_prefers_earlier_error(spark):
    # errors at t=100 and t=300, click at t=200: both 100µs away → backward
    ev = _events(
        spark,
        [
            (1, 1, "error", 10.0, 100),
            (2, 1, "error", 20.0, 300),
            (3, 1, "click", 0.0, 200),
        ],
    )
    [r] = jn.join_nearest(ev).collect()
    assert (r.nearest_value, r.dist_us) == (10.0, 100)


def test_join_nearest_directions_and_missing(spark):
    ev = _events(
        spark,
        [
            (1, 1, "error", 5.0, 1000),
            (2, 1, "click", 0.0, 1010),  # backward only (10 < forever)
            (3, 2, "error", 7.0, 500),
            (4, 2, "click", 0.0, 490),  # forward only
            (5, 3, "click", 0.0, 100),  # user 3 has no errors → dropped
            (6, 4, "error", 9.0, 200),
            (7, 4, "click", 0.0, 200),  # same-µs error → distance 0
        ],
    )
    out = {r.event_id: (r.nearest_value, r.dist_us) for r in jn.join_nearest(ev).collect()}
    assert out == {2: (5.0, 10), 4: (7.0, 10), 7: (9.0, 0)}


def test_join_nearest_same_us_errors_deduped_lww(spark):
    # two errors in the same µs: the larger event_id wins (LWW), matching
    # the as-of ops' tie contract
    ev = _events(
        spark,
        [
            (1, 1, "error", 1.0, 100),
            (9, 1, "error", 2.0, 100),
            (3, 1, "click", 0.0, 150),
        ],
    )
    [r] = jn.join_nearest(ev).collect()
    assert r.nearest_value == 2.0


# ----------------------------------------------------------------- win_ewma


def test_ewma_head_renormalizes(spark):
    ev = _events(
        spark,
        [(1, 1, "view", 10.0, 100), (2, 1, "view", 20.0, 200)],
    )
    out = {r.event_id: r.ewma for r in wn.win_ewma(ev).collect()}
    w = wn.ewma_weights()
    # first row: only lag0 exists → ewma == x0 exactly
    assert out[1] == pytest.approx(10.0, abs=1e-9)
    expect = (w[0] * 20.0 + w[1] * 10.0) / (w[0] + w[1])
    assert out[2] == pytest.approx(round(expect, 6), abs=1e-9)


def test_ewma_constant_series_is_identity(spark):
    ev = _events(
        spark, [(i, 1, "view", 42.0, i * 100) for i in range(1, 30)]
    )
    for r in wn.win_ewma(ev).collect():
        assert r.ewma == pytest.approx(42.0, abs=1e-6)


# --------------------------------------------------------------- win_zscore


def test_zscore_zero_variance_yields_null_not_flag(spark):
    ev = _events(spark, [(i, 1, "view", 5.0, i * 100) for i in range(1, 10)])
    for r in wn.win_zscore(ev).collect():
        assert r.z is None
        assert r.is_outlier is False


def test_zscore_flags_spike(spark):
    rows = [(i, 1, "view", 10.0 + (i % 2) * 0.5, i * 100) for i in range(1, 33)]
    rows.append((99, 1, "view", 500.0, 10_000))
    out = {r.event_id: r for r in wn.win_zscore(_events(spark, rows)).collect()}
    assert out[99].is_outlier is True
    assert all(not out[i].is_outlier for i in range(2, 33))


# ------------------------------------------------------------ agg_count_min


def test_count_min_estimate_dominates_exact(spark):
    ev = _events(
        spark,
        [(i, i % 7, "view", 1.0, i) for i in range(500)],
    )
    rows = agg.agg_count_min(ev).collect()
    assert len(rows) == 7
    for r in rows:
        assert r.n_cms >= r.n_exact  # CMS never underestimates
    exact = {r.user_id: r.n_exact for r in rows}
    assert exact[0] == 72 and exact[1] == 72 and exact[6] == 71


# ------------------------------------------------------------ table_profile


def test_table_profile_nulls_and_ndv(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 1.5), (3, "b", None), (4, "a", 2.5)],
        "id long, s string, x double",
    )
    prof = {r.col_name: r for r in agg.table_profile(df).collect()}
    assert prof["id"].n_rows == 4 and prof["id"].n_null == 0
    assert prof["id"].ndv == 4 and prof["id"].min_num == 1.0
    assert prof["s"].n_null == 1 and prof["s"].ndv == 2
    assert (prof["s"].min_str, prof["s"].max_str) == ("a", "b")
    assert prof["x"].n_null == 1 and prof["x"].ndv == 2
    assert prof["x"].max_num == 2.5 and prof["x"].min_str is None


def test_table_profile_nonscalar_types(spark):
    """date→µs on the timestamp path; bool→0/1 numeric; binary/array/map
    profile null-count (+NDV where comparable) with null min/max instead of
    failing analysis or silently casting to double."""
    import datetime

    df = spark.createDataFrame(
        [
            (datetime.date(2024, 1, 2), True, b"ab", [1, 2], {"k": 1}),
            (datetime.date(2024, 1, 1), False, b"cd", [1, 2], None),
            (None, True, None, [3], {"k": 2}),
        ],
        "d date, b boolean, bin binary, arr array<long>, m map<string,long>",
    )
    prof = {r.col_name: r for r in agg.table_profile(df).collect()}
    assert prof["d"].n_null == 1 and prof["d"].ndv == 2
    assert prof["d"].min_num == 1704067200000000.0  # 2024-01-01T00:00Z µs
    assert prof["b"].ndv == 2 and (prof["b"].min_num, prof["b"].max_num) == (0.0, 1.0)
    assert prof["bin"].n_null == 1 and prof["bin"].ndv == 2
    assert prof["bin"].min_num is None and prof["bin"].min_str is None
    assert prof["arr"].ndv == 2 and prof["arr"].min_num is None
    assert prof["m"].n_null == 1 and prof["m"].ndv is None  # maps: not comparable


def test_table_profile_approx_mode_drops_expand(spark):
    """approx=True (the 100 TB mode) must estimate NDV within HLL tolerance,
    keep every other stat exact, and remove the multi-countDistinct Expand
    node from the plan."""
    from kdb_spark.tables import load
    from tests.conftest import SF_DIR

    df = load(spark, SF_DIR, "orders")
    exact = {r.col_name: r for r in agg.table_profile(df).collect()}
    apx = {r.col_name: r for r in agg.table_profile(df, approx=True).collect()}
    for c, r in apx.items():
        e = exact[c]
        assert (r.n_rows, r.n_null, r.min_num, r.max_num, r.min_str, r.max_str) == (
            e.n_rows, e.n_null, e.min_num, e.max_num, e.min_str, e.max_str
        )
        assert abs(r.ndv - e.ndv) <= max(2, 0.15 * e.ndv)  # rsd 5% default, 3σ
    plan = agg.table_profile(df, approx=True)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    exact_plan = agg.table_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan  # the node approx mode exists to remove


# ---------------------------------------------------------- text_repetition


def test_text_repetition_ratios(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),  # 9 tok, 7 tri, 3 uniq tri, 3 uniq tok
            (2, "one two three four"),  # no repetition at all
            (3, "x y"),  # < 3 tokens → 0 trigrams
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in tx.text_repetition(docs).collect()}
    assert (out[1].n_trigrams, out[1].n_tri_uniq) == (7, 3)
    assert out[1].rep_tri_ratio == pytest.approx(1 - 3 / 7, abs=1e-6)
    assert out[1].is_repetitive is True
    assert out[2].rep_tri_ratio == 0.0 and out[2].is_repetitive is False
    assert out[3].n_trigrams == 0 and out[3].n_tri_uniq == 0
    # degenerate short doc: ratio is vacuous, flag must NOT fire
    assert out[3].is_repetitive is False


# -------------------------------------------------------------- mix_weights


def test_mix_weights_uniform_target(spark):
    docs = spark.createDataFrame(
        [(i, "big", 300) for i in range(3)] + [(9, "small", 100)],
        "doc_id long, source string, n_chars long",
    )
    out = {r.source: r for r in cu.mix_weights(docs).collect()}
    # total=1000, k=2 → target 500/source: big (900) downsampled, small kept
    assert out["small"].mix_rate == 1.0
    assert out["big"].mix_rate == pytest.approx(500 / 900, abs=1e-6)
    assert out["big"].expected_chars == round(round(500 / 900, 6) * 900)
    assert not math.isclose(out["big"].mix_rate, 1.0)


# -------------------------------------------------------------- mm_phash


def test_mm_phash_identical_payloads_collide_and_ham_zero(spark):
    from kdb_spark.llm import multimodal as mm

    docs = spark.createDataFrame(
        [
            (1, b"the quick brown fox jumps over the lazy dog" * 4),
            (2, b"the quick brown fox jumps over the lazy dog" * 4),
            (3, bytes(range(200)) * 2),
        ],
        "doc_id long, payload binary",
    )
    sigs = {r.doc_id: r.phash for r in mm.mm_phash(docs).collect()}
    assert sigs[1] == sigs[2] != sigs[3]
    pairs = mm.mm_phash_dedup(docs).collect()
    assert [(r.doc_a, r.doc_b, r.hamming) for r in pairs] == [(1, 2, 0)]


def test_mm_phash_empty_payload_skipped(spark):
    from kdb_spark.llm import multimodal as mm

    docs = spark.createDataFrame(
        [(1, b""), (2, b"abc" * 40)], "doc_id long, payload binary"
    )
    assert {r.doc_id for r in mm.mm_phash(docs).collect()} == {2}


# ------------------------------------------------------- dedup_cross_corpus


def test_dedup_cross_corpus_matches_across_split_only(spark):
    """Only incoming×base near-dups are reported: a dup pair WITHIN the base
    corpus (ids 0,1) and one WITHIN the incoming batch (ids 3,17) must both
    stay silent; incoming doc 22 near-dups base doc 2 and is reported with
    order-independent aggregates."""
    from kdb_spark.llm import dedup as dd

    shared = "the quick brown fox jumps over the lazy dog again and again " * 3
    # md5-slot(doc_id)%100 < 20 → incoming: {3, 17, 22}; base: {0, 1, 2, 4}
    docs = spark.createDataFrame(
        [
            (0, shared + "base copy one"),
            (1, shared + "base copy two"),
            (2, shared + "base near the incoming doc"),
            (4, "completely unrelated text about spark physical plans"),
            (3, "incoming dup alpha " + shared),
            (17, "incoming dup beta " + shared),
            (22, shared + "near the incoming doc indeed"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dd.dedup_cross_corpus(docs).collect()}
    assert set(out) <= {3, 17, 22}  # only incoming docs can be reported
    assert 22 in out
    r = out[22]
    assert r.min_base in (0, 1, 2) and r.n_dups >= 1 and r.best_jaccard >= 0.5
    # the all-pairs op would also emit (0,1) and (3,17); the cross op must not:
    # base ids never appear as reported doc_id
    assert not {0, 1, 2, 4} & set(out)


# ----------------------------------------------------------- BMP decode path


def test_bmp_roundtrip_padding_and_bottom_up():
    """encode→decode is the identity for every padding width (w%4), and the
    bottom-up storage order is flipped back (asymmetric pixel proves it)."""
    import numpy as np

    from kdb_spark.llm import multimodal as mm

    for w in (4, 5, 6, 7):  # row padding 0..3 bytes
        rng = np.random.RandomState(w)
        px = rng.randint(0, 256, size=(3, w, 3)).astype(np.uint8)
        out = mm.decode_bmp(mm.encode_bmp(px))
        assert out.shape == (3, w, 3)
        assert (out == px).all()
    # top-left marker must come back at the top-left
    px = np.zeros((2, 4, 3), dtype=np.uint8)
    px[0, 0] = (255, 1, 2)
    assert tuple(mm.decode_bmp(mm.encode_bmp(px))[0, 0]) == (255, 1, 2)


def test_bmp_decode_rejects_corrupt_input():
    import numpy as np
    import pytest as pt

    from kdb_spark.llm import multimodal as mm

    good = mm.encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8))
    with pt.raises(ValueError, match="magic"):
        mm.decode_bmp(b"PNG" + good[2:])
    with pt.raises(ValueError, match="truncated"):
        mm.decode_bmp(good[:20])
    with pt.raises(ValueError, match="truncated"):
        mm.decode_bmp(good[:-4])  # pixel data short
    bad_bpp = bytearray(good)
    bad_bpp[28] = 8  # bpp field
    with pt.raises(ValueError, match="unsupported"):
        mm.decode_bmp(bytes(bad_bpp))


def test_png_roundtrip_all_filters_and_dispatch():
    """encode→decode is the identity across dimensions (heights ≥ 5 cycle
    all five PNG filter types — None/Sub/Up/Average/Paeth), and
    decode_image dispatches on the PNG signature."""
    import numpy as np

    from kdb_spark.llm import multimodal as mm

    for h, w in ((1, 1), (5, 4), (6, 7), (8, 8), (13, 3)):
        rng = np.random.RandomState(h * 10 + w)
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        payload = mm.encode_png(px)
        assert payload[:8] == mm.PNG_SIG
        out = mm.decode_png(payload)
        assert out.shape == (h, w, 3) and (out == px).all()
        assert (mm.decode_image(payload) == px).all()
    # top-left marker survives (row order + channel order)
    px = np.zeros((2, 4, 3), dtype=np.uint8)
    px[0, 0] = (255, 1, 2)
    assert tuple(mm.decode_png(mm.encode_png(px))[0, 0]) == (255, 1, 2)


def test_png_decode_rejects_corrupt_input():
    import numpy as np
    import pytest as pt

    from kdb_spark.llm import multimodal as mm

    good = mm.encode_png(np.zeros((3, 3, 3), dtype=np.uint8))
    with pt.raises(ValueError, match="signature"):
        mm.decode_png(b"BM" + good[2:])
    corrupt = bytearray(good)
    corrupt[20] ^= 0xFF  # inside IHDR data -> CRC mismatch
    with pt.raises(ValueError, match="CRC"):
        mm.decode_png(bytes(corrupt))
    with pt.raises(ValueError, match="truncated|missing"):
        mm.decode_png(good[:30])
    # 16-bit depth is an unsupported variant: rebuild IHDR with valid CRC
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 3, 3, 16, 2, 0, 0, 0)
    bad = (
        mm.PNG_SIG
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        + good[8 + 12 + 13 :]
    )
    with pt.raises(ValueError, match="unsupported"):
        mm.decode_png(bad)


def test_mm_decode_features_matches_closed_form(spark):
    """The Spark round-trip (synthesize BMP → real parse → channel sums)
    must equal the closed forms the SQL oracle uses."""
    from kdb_spark.llm import multimodal as mm

    docs = spark.createDataFrame(
        [(0, 10), (1, 250), (5, 401), (202, 7)], "doc_id long, n_chars long"
    )
    got = {r.doc_id: r for r in mm.mm_decode_features(mm.mm_bmp_table(docs)).collect()}
    for doc_id, n_chars in [(0, 10), (1, 250), (5, 401), (202, 7)]:
        w, h = 5 + doc_id % 3, 5 + doc_id % 4
        r = got[doc_id]
        assert (r.width, r.height) == (w, h)
        assert r.sum_b == h * w * (doc_id % 200) + h * (w * (w - 1) // 2)
        assert r.sum_g == w * h * (n_chars % 200) + w * (h * (h - 1) // 2)
        assert r.sum_r == h * (w * (w - 1) // 2) + w * (h * (h - 1) // 2)


@pytest.mark.codec
def test_decode_image_routes_bmp_without_codecs():
    """decode_image must decode BMP through the in-tree parser regardless
    of codec availability (the registered key's behavior can never depend
    on an optional library), and must raise the documented
    NotImplementedError for compressed payloads where Pillow is absent."""
    import numpy as np
    import pytest as pt

    from kdb_spark.llm import multimodal as mm

    px = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    assert (mm.decode_image(mm.encode_bmp(px)) == px).all()
    # PNG now decodes in-tree (r15) — codec-free even where Pillow is absent
    assert (mm.decode_image(mm.encode_png(px)) == px).all()
    if mm._pil() is None:
        with pt.raises(NotImplementedError):
            mm.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 64)  # JPEG magic


@pytest.mark.codec
def test_decode_image_png_roundtrip_exact():
    """Where Pillow exists: a PNG (lossless) payload decodes to the exact
    source pixels in the decode_bmp BGR contract, and mm_decode_features
    over a PNG column yields the same exact integer sums as the BMP path —
    the import-guarded codec route keeps the oracle shape."""
    import pytest as pt

    from kdb_spark.llm import multimodal as mm

    if mm._pil() is None:
        pt.skip("Pillow not installed in this container")
    import io

    import numpy as np

    Image = mm._pil()
    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, size=(5, 6, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(rgb, "RGB").save(buf, format="PNG")
    out = mm.decode_image(buf.getvalue())
    assert out.shape == (5, 6, 3)
    assert (out == rgb[:, :, ::-1]).all()  # BGR contract


@pytest.mark.codec
def test_decode_video_frames_where_pyav_exists():
    """Where PyAV exists: an encoded clip decodes to the expected frame
    count/shape in the BGR contract; absent the codec, the documented
    NotImplementedError (the container default)."""
    import pytest as pt

    from kdb_spark.llm import multimodal as mm

    av = mm._pyav()
    if av is None:
        with pt.raises(NotImplementedError):
            mm.decode_video(b"\x00" * 128)
        return
    import io

    import numpy as np

    buf = io.BytesIO()
    with av.open(buf, mode="w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=4)
        stream.width, stream.height, stream.pix_fmt = 16, 16, "yuv420p"
        for i in range(3):
            frame = av.VideoFrame.from_ndarray(
                np.full((16, 16, 3), i * 40, dtype=np.uint8), format="rgb24"
            )
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    frames = mm.decode_video(buf.getvalue())
    assert len(frames) == 3
    assert all(f.shape == (16, 16, 3) for f in frames)


# --------------------------------------------------------- dedup_substring


def test_dedup_substring_finds_shared_passage(spark):
    from kdb_spark.llm import dedup as dd

    shared = " ".join(f"tok{i}" for i in range(60))  # 60-token passage
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + shared + " gamma"),
            (2, "unrelated prefix words here " + shared),
            (3, "completely different text " + " ".join(f"z{i}" for i in range(40))),
        ],
        "doc_id long, text string",
    )
    out = dd.dedup_substring(docs).collect()
    assert out, "shared 60-token passage not detected"
    for r in out:
        assert r.n_docs == 2 and r.min_doc == 1  # docs 1 and 2 share spans


def test_dedup_substring_short_docs_emit_nothing(spark):
    from kdb_spark.llm import dedup as dd

    docs = spark.createDataFrame(
        [(1, "only five words right here"), (2, "only five words right here")],
        "doc_id long, text string",
    )
    assert dd.dedup_substring(docs).collect() == []


# ----------------------------------------------------- behavioral analytics


def test_funnel_requires_order(spark):
    from kdb_spark.analytics import behavior as bh

    ev = _events(
        spark,
        [
            # user 1: view → click → purchase, in order
            (1, 1, "view", 0.0, 100),
            (2, 1, "click", 0.0, 200),
            (3, 1, "purchase", 0.0, 300),
            # user 2: purchase BEFORE the view → depth stops at 1
            (4, 2, "purchase", 0.0, 100),
            (5, 2, "view", 0.0, 200),
            # user 3: click only, no view → depth 0
            (6, 3, "click", 0.0, 100),
        ],
    )
    out = {r.user_id: r for r in bh.agg_funnel(ev).collect()}
    assert out[1].reached == 3 and (out[1].t1_us, out[1].t3_us) == (100, 300)
    assert out[2].reached == 1 and out[2].t2_us is None
    assert out[3].reached == 0 and out[3].t1_us is None


def test_streaks_islands(spark):
    from kdb_spark.analytics import behavior as bh
    from kdb_spark.tables import DAY_US

    # user 1: days 0,1,2 then 5,6 → max streak 3, 5 active days
    rows = [(i, 1, "view", 0.0, d * DAY_US + 5) for i, d in enumerate([0, 1, 2, 5, 6])]
    # day 2 has a second event — distinct-day dedup must not inflate runs
    rows.append((99, 1, "view", 0.0, 2 * DAY_US + 999))
    [r] = bh.win_streaks(_events(spark, rows)).collect()
    assert (r.max_streak_days, r.n_active_days) == (3, 5)


def test_retention_cohort_offsets(spark):
    from kdb_spark.analytics import behavior as bh
    from kdb_spark.tables import DAY_US

    rows = [
        (1, 1, "view", 0.0, 0),                # cohort day 0
        (2, 1, "view", 0.0, 2 * DAY_US),       # back on day 2
        (3, 2, "view", 0.0, 0),                # same cohort, day 0 only
    ]
    out = {(r.cohort_us, r.day_offset): r.n_users
           for r in bh.retention_cohort(_events(spark, rows)).collect()}
    assert out == {(0, 0): 2, (0, 2): 1}


# ------------------------------------------------------------------ emb_pca


def test_pca_components_ordered_and_centered(spark):
    """PC1 must capture at least as much variance as PC2, and projections
    of the corpus must be mean-centered (the μ-shift contract)."""
    import numpy as np

    from kdb_spark.llm import similarity as sim
    from kdb_spark.tables import load
    from tests.conftest import SF_DIR

    out = sim.emb_pca(load(spark, SF_DIR, "embeddings")).collect()
    p1 = np.array([r.pc1 for r in out])
    p2 = np.array([r.pc2 for r in out])
    # the synthetic embeddings have a near-flat spectrum, so the fixed
    # iteration count only approximately orders the components — allow
    # near-ties, reject gross inversions (a swapped deflation would give
    # p1.var << p2.var)
    assert p1.var() >= 0.9 * p2.var() and p2.var() > 0
    assert abs(p1.mean()) < 1e-2 and abs(p2.mean()) < 1e-2


# ----------------------------------------------------------- robust stats


def test_mad_ignores_outlier(spark):
    from kdb_spark.analytics import aggregations as agg

    rows = [(i, 1, "view", 10.0, i * 100) for i in range(1, 10)]
    rows.append((99, 1, "view", 10_000.0, 10_000))  # one wild outlier
    [r] = agg.agg_mad(_events(spark, rows)).collect()
    assert r.median == 10.0 and r.mad == 0.0  # outlier cannot move either


def test_gini_extremes(spark):
    from kdb_spark.analytics import aggregations as agg

    # perfectly equal values → gini 0
    eq = _events(spark, [(i, 1, "view", 5.0, i) for i in range(1, 11)])
    [r] = agg.agg_gini(eq).collect()
    assert abs(r.gini) < 1e-9
    # all value on one event of n → gini → (n-1)/n
    conc = _events(
        spark,
        [(i, 1, "view", 0.0, i) for i in range(1, 10)] + [(10, 1, "view", 100.0, 10)],
    )
    [r] = agg.agg_gini(conc).collect()
    assert r.gini == pytest.approx(0.9, abs=1e-6)


# ----------------------------------------------------------------- win_cusum


def test_cusum_resets_and_alarms(spark):
    from kdb_spark.analytics import windows as wn

    # target 300.00: below-target stretches reset to 0; a sustained run
    # above target accumulates and alarms
    rows = (
        [(i, 1, "view", 100.0, i * 100) for i in range(1, 5)]  # drains to 0
        + [(i, 1, "view", 800.0, i * 100) for i in range(5, 8)]  # +50000/step
    )
    [r] = wn.win_cusum(_events(spark, rows)).collect()
    assert r.cusum_final == 3 * 50_000
    assert r.cusum_max == r.cusum_final
    assert r.alarmed is True

    rows2 = [(i, 2, "view", 100.0, i * 100) for i in range(1, 10)]
    [r2] = wn.win_cusum(_events(spark, rows2)).collect()
    assert (r2.cusum_final, r2.cusum_max, r2.alarmed) == (0, 0, False)


def test_reused_cache_misses_on_different_input(spark):
    """_reused is get-or-create keyed on the plan's semanticHash: a second
    call with a DIFFERENT input must not serve the first call's persisted
    data (stale-cache guard for the shared minhash/shingle tables)."""
    from kdb_spark.llm import dedup as dd

    shared = "alpha beta gamma delta epsilon zeta eta theta " * 4
    with_dup = spark.createDataFrame(
        [(2, shared + "one"), (22, shared + "two")], "doc_id long, text string"
    )  # 22 incoming (md5 slot), 2 base → one cross pair
    without = spark.createDataFrame(
        [(2, "totally unrelated words here"), (22, "and different again entirely")],
        "doc_id long, text string",
    )
    assert dd.dedup_cross_corpus(with_dup).count() == 1
    assert dd.dedup_cross_corpus(without).count() == 0  # stale cache would say 1
    assert dd.dedup_cross_corpus(with_dup).count() == 1


# ---------------------------------------------------------- win_counter_rate


def test_counter_rate_reset_zero_gap_and_head(spark):
    """Reset → increase = post-reset value; zero time gap → NULL rate
    (increase still emitted); series head dropped; normal step → Δv/Δt."""
    ev = _events(
        spark,
        [
            (1, 1, "c", 100.0, 1_000_000),
            (2, 1, "c", 160.0, 4_000_000),   # +60 over 3 s → 20/s
            (3, 1, "c", 5.0, 5_000_000),     # RESET: increase = 5, 1 s → 5/s
            (4, 1, "c", 5.0, 5_000_000),     # same µs: inc 0, rate NULL
        ],
    )
    out = {r.event_id: (r.increase, r.rate_per_sec)
           for r in wn.win_counter_rate(ev).collect()}
    assert 1 not in out  # head has no predecessor
    assert out[2] == (60.0, 20.0)
    assert out[3] == (5.0, 5.0)
    assert out[4] == (0.0, None)


# ----------------------------------------------------------- WAV decode path


def test_wav_roundtrip_and_chunk_walk():
    """decode(encode(x)) == x, and the parser walks past extra RIFF chunks
    (LIST between fmt and data) with word alignment."""
    import struct

    import numpy as np

    from kdb_spark.llm import multimodal as mm

    x = np.arange(300, dtype=np.uint8)
    rate, out = mm.decode_wav(mm.encode_wav(x, sample_rate=16000))
    assert rate == 16000 and (out == x).all()
    # splice an odd-length LIST chunk between fmt and data (word-aligned pad)
    raw = mm.encode_wav(x)
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"
    spliced = raw[:36] + extra + raw[36:]
    rate, out = mm.decode_wav(spliced)
    assert (out == x).all()


def test_wav_decode_rejects_corrupt_input():
    import numpy as np
    import pytest as pt

    from kdb_spark.llm import multimodal as mm

    good = mm.encode_wav(np.zeros(64, dtype=np.uint8))
    with pt.raises(ValueError, match="not a WAV"):
        mm.decode_wav(b"OGGS" + good[4:])
    with pt.raises(ValueError, match="truncated"):
        mm.decode_wav(good[:30])
    with pt.raises(ValueError, match="truncated WAV: sample data"):
        mm.decode_wav(good[:-10])
    bad_bits = bytearray(good)
    bad_bits[34] = 16  # bits_per_sample field
    with pt.raises(ValueError, match="unsupported"):
        mm.decode_wav(bytes(bad_bits))
    # data chunk present but fmt never seen
    with pt.raises(ValueError, match="before fmt|no data"):
        mm.decode_wav(good[:12] + good[36:])


def test_mm_audio_features_closed_form(spark):
    from kdb_spark.llm import multimodal as mm

    docs = spark.createDataFrame([(0,), (3,), (40,)], "doc_id long")
    got = {
        (r.doc_id, r.frame_idx): (r.energy, r.peak, r.n_samples)
        for r in mm.mm_audio_features(mm.mm_wav_table(docs)).collect()
    }
    assert len(got) == 3 * mm.WAV_FRAMES
    for doc_id in (0, 3, 40):
        for f in range(mm.WAV_FRAMES):
            dev = [
                (doc_id * 7 + f * mm.WAV_FRAME + i) % 255 - 128
                for i in range(mm.WAV_FRAME)
            ]
            assert got[(doc_id, f)] == (
                sum(d * d for d in dev),
                max(abs(d) for d in dev),
                mm.WAV_FRAME,
            )


# --------------------------------------------------------------- dedup_fuzzy


def test_dedup_fuzzy_matches_and_counts(spark):
    """Typos within max_dist pair up with per-value row counts; distinct
    values beyond the distance (or sharing no q-gram) stay unpaired; case
    folds before matching."""
    from kdb_spark.llm import dedup as dd

    df = spark.createDataFrame(
        [(1, "red widget"), (2, "Red Widget"), (3, "red widgit"),
         (4, "blue bolt"), (5, "blue bolt"), (6, "xy")],
        "id long, p_name string",
    )
    out = {(r.name_a, r.name_b): (r.dist, r.n_rows_a, r.n_rows_b)
           for r in dd.dedup_fuzzy(df).collect()}
    # 'red widget' (2 rows after case fold) vs 'red widgit' (1 row): 1 edit
    assert out == {("red widget", "red widgit"): (1, 2, 1)}


# ---------------------------------------------------------------- agg_entropy


def test_entropy_uniform_single_and_skewed(spark):
    import math

    ev = _events(
        spark,
        # user 1: 2+2 of two types → exactly 1 bit; user 2: one type → 0 bits
        [(1, 1, "a", 0.0, 1), (2, 1, "a", 0.0, 2),
         (3, 1, "b", 0.0, 3), (4, 1, "b", 0.0, 4),
         (5, 2, "a", 0.0, 5), (6, 2, "a", 0.0, 6),
         # user 3: 3-vs-1 split → H = 2 - 0.75*log2(3)
         (7, 3, "a", 0.0, 7), (8, 3, "a", 0.0, 8),
         (9, 3, "a", 0.0, 9), (10, 3, "b", 0.0, 10)],
    )
    out = {r.user_id: r for r in agg.agg_entropy(ev).collect()}
    assert (out[1].n_events, out[1].n_types, out[1].entropy_bits) == (4, 2, 1.0)
    assert (out[2].n_types, out[2].entropy_bits) == (1, 0.0)
    assert out[3].entropy_bits == pytest.approx(
        round(2 - 0.75 * math.log2(3), 6), abs=1e-9
    )


# ------------------------------------------------------------ text_tfidf_topk


def test_tfidf_scores_and_topk_cut(spark):
    """tf*ln(N/df) closed form; ties broken lexically; k cuts per doc."""
    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry date")],
        "doc_id long, text string",
    )
    out = {(r.doc_id, r.term): (r.tf, r.df, r.score, r.rnk)
           for r in tx.text_tfidf_topk(docs, k=2).collect()}
    ln = math.log
    # doc 1: apple tf=2 df=1 → 2·ln(3); banana tf=1 df=2 → ln(1.5)
    assert out[(1, "apple")] == (2, 1, round(2 * ln(3.0), 6), 1)
    assert out[(1, "banana")] == (1, 2, round(ln(1.5), 6), 2)
    # doc 3: cherry/date both score ln(1.5)/ln(3) — date (df=1) outranks
    assert out[(3, "date")][3] == 1 and out[(3, "cherry")][3] == 2
    assert len(out) == 6


def test_tfidf_k_larger_than_vocab(spark):
    docs = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    rows = tx.text_tfidf_topk(docs, k=5).collect()
    assert [(r.term, r.score) for r in rows] == [("solo", 0.0)]


# ------------------------------------------------------------- text_bm25_topk


def test_bm25_closed_form_and_order(spark):
    """Hand-computed Robertson BM25 on a 3-doc corpus; non-matching docs
    are absent; higher-tf shorter doc wins."""
    docs = spark.createDataFrame(
        [(1, "vector vector pad"), (2, "vector pad pad pad"), (3, "pad pad")],
        "doc_id long, text string",
    )
    rows = tx.text_bm25_topk(docs, query=("vector",), k=10).collect()
    assert [r.doc_id for r in rows] == [1, 2]
    n, sum_dl = 3, 9
    idf = math.log(1.0 + (n - 2 + 0.5) / (2 + 0.5))
    def score(tf, dl):
        return round(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (sum_dl / n))), 6)
    assert rows[0].bm25 == pytest.approx(score(2, 3), abs=1e-9)
    assert rows[1].bm25 == pytest.approx(score(1, 4), abs=1e-9)


# ------------------------------------------------------------- graph_pagerank


def test_pagerank_symmetric_pair_and_star(spark):
    """A disconnected symmetric pair keeps the uniform rank (exact fixpoint);
    a 3-leaf star concentrates rank on the hub; ranks sum to ~1 (no
    dangling mass in a symmetrized graph)."""
    from kdb_spark.analytics import graph as gr

    pair = [("a", "b"), ("b", "a")]
    star = [("h", x) for x in ("l1", "l2", "l3")] + [(x, "h") for x in ("l1", "l2", "l3")]
    edges = spark.createDataFrame(pair + star, "src string, dst string")
    out = {r.v: (r.rank, r.out_deg) for r in gr.pagerank(edges).collect()}
    n = 6
    assert out["a"] == (round(1 / n, 9), 1) and out["b"] == (round(1 / n, 9), 1)
    assert out["h"][1] == 3 and out["l1"] == out["l2"] == out["l3"]
    assert out["h"][0] > out["l1"][0] > 0
    assert sum(r for r, _ in out.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_checkpoint_truncates_lineage_same_values(spark):
    """checkpoint_every=2 over 6 rounds returns values IDENTICAL to the
    un-checkpointed run (localCheckpoint replays the same doubles) while
    the result's logical plan no longer embeds the full unrolled loop —
    the lineage bound that makes a 50-round convergence run plannable."""
    from kdb_spark.analytics import graph as gr
    from kdb_spark.llm import dedup as dd

    star = [("h", x) for x in ("l1", "l2", "l3")] + [
        (x, "h") for x in ("l1", "l2", "l3")
    ]
    edges = spark.createDataFrame(star, "src string, dst string")
    plain_df = gr.pagerank(edges, iters=6)
    plain = {r.v: r.rank for r in plain_df.collect()}
    plain_plan = plain_df._jdf.queryExecution().analyzed().toString()
    # drop the memoized intermediates so both runs build identical plans
    for k in ("pagerank_edges", "pagerank_contrib", "pagerank_base"):
        dd._REUSE_CACHE.pop(k, None)
    ck_df = gr.pagerank(edges, iters=6, checkpoint_every=2)
    ck = {r.v: r.rank for r in ck_df.collect()}
    assert ck == plain  # bit-identical, not approx
    # lineage actually truncated: the checkpointed run's plan hangs off an
    # RDD scan instead of the full 6-round join/agg chain, and carries
    # strictly fewer unrolled Aggregate rounds than the plain run
    ck_plan = ck_df._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in ck_plan or "ExistingRDD" in ck_plan
    assert ck_plan.count("Aggregate") < plain_plan.count("Aggregate")


def test_trade_graph_symmetrizes_distinct_pairs(spark):
    from kdb_spark.analytics import graph as gr

    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2)], "o_orderkey long, o_custkey long")
    li = spark.createDataFrame(
        [(10, 7), (11, 7), (12, 7), (12, 8)], "l_orderkey long, l_suppkey long")
    got = {(r.src, r.dst) for r in gr.trade_graph(orders, li).collect()}
    # parity-namespaced longs: cust k -> 2k, supp k -> 2k+1
    c1, c2, s7, s8 = 2, 4, 15, 17
    assert got == {(c1, s7), (s7, c1), (c2, s7), (s7, c2), (c2, s8), (s8, c2)}


def test_triangle_count_k4_plus_pendant(spark):
    """K4 has 4 triangles, each vertex in exactly 3; a pendant vertex has
    deg 1 and 0 triangles. Degree orientation must count each triangle
    exactly once regardless of the (deg, id) tie-break path taken."""
    from kdb_spark.analytics import graph as gr

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(k4 + [(4, 5)], "a long, b long")
    out = {r.v: (r.deg, r.n_tri) for r in gr.triangle_count(edges).collect()}
    assert out == {1: (3, 3), 2: (3, 3), 3: (3, 3), 4: (4, 3), 5: (1, 0)}


def test_repeat_trade_edges_distinct_orders_threshold(spark):
    """The >=3 threshold counts DISTINCT orders: duplicate lineitem rows
    within one order must not inflate the pair count."""
    from kdb_spark.analytics import graph as gr

    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 1), (20, 2), (21, 2)],
        "o_orderkey long, o_custkey long",
    )
    li = spark.createDataFrame(
        # (c=1,s=7): 3 distinct orders, order 10 duplicated; (c=2,s=7): 2
        [(10, 7), (10, 7), (11, 7), (12, 7), (20, 7), (21, 7)],
        "l_orderkey long, l_suppkey long",
    )
    got = {(r.doc_a, r.doc_b) for r in gr.repeat_trade_edges(orders, li).collect()}
    assert got == {(2, 15)}  # cust 1 -> 2, supp 7 -> 15


def test_co_purchase_edges_distinct_parts_threshold(spark):
    """Customers link iff >=3 DISTINCT shared parts; re-buying the same
    part across orders counts once, and edges come out a < b."""
    from kdb_spark.analytics import graph as gr

    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (20, 2), (30, 3)], "o_orderkey long, o_custkey long"
    )
    li = spark.createDataFrame(
        # cust 1 parts {100,101,102} (101 twice across orders), cust 2
        # parts {100,101,102}, cust 3 parts {100,101} -> only (1,2) links
        [(10, 100), (10, 101), (11, 101), (11, 102),
         (20, 100), (20, 101), (20, 102), (30, 100), (30, 101)],
        "l_orderkey long, l_partkey long",
    )
    got = {(r.a, r.b) for r in gr.co_purchase_edges(orders, li).collect()}
    assert got == {(1, 2)}


# ------------------------------------------------------------ agg_transitions


def test_transitions_counts_and_conditional_probs(spark):
    """lag pairs per user in ts order; prob normalizes per prev_type row."""
    from kdb_spark.analytics import behavior as bh

    ev = _events(
        spark,
        # user 1: a→b→a ; user 2: a→b  ⇒ (a,b)×2, (b,a)×1
        [(1, 1, "a", 0.0, 10), (2, 1, "b", 0.0, 20), (3, 1, "a", 0.0, 30),
         (4, 2, "a", 0.0, 10), (5, 2, "b", 0.0, 20)],
    )
    out = {(r.prev_type, r.next_type): (r.n, r.prob)
           for r in bh.agg_transitions(ev).collect()}
    assert out == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}


def test_transitions_tie_on_ts_uses_event_id(spark):
    from kdb_spark.analytics import behavior as bh

    ev = _events(
        spark,
        [(2, 1, "x", 0.0, 10), (1, 1, "y", 0.0, 10), (3, 1, "z", 0.0, 20)],
    )
    out = {(r.prev_type, r.next_type) for r in bh.agg_transitions(ev).collect()}
    assert out == {("y", "x"), ("x", "z")}


# ------------------------------------------------------------------ agg_twap


def test_twap_weights_by_holding_time(spark):
    """Value 10 held 3µs then 40 held 1µs → twap = (10·3+40·1)/4 = 17.5;
    the final tick carries no duration; single-tick series drop out."""
    ev = _events(
        spark,
        [(1, 1, "a", 10.0, 100), (2, 1, "a", 40.0, 103), (3, 1, "a", 99.0, 104),
         (4, 2, "a", 55.0, 100)],
    )
    out = {(r.user_id, r.event_type): r for r in agg.agg_twap(ev).collect()}
    assert set(out) == {(1, "a")}
    r = out[(1, "a")]
    assert (r.n_intervals, r.duration_us) == (2, 4)
    assert r.twap_c == pytest.approx(1750.0, abs=1e-9)


def test_twap_is_not_row_weighted(spark):
    # burst of 3 cheap ticks in 1µs then one expensive long interval:
    # row-mean would be dominated by the burst, twap by the long hold
    ev = _events(
        spark,
        [(1, 1, "a", 0.0, 0), (2, 1, "a", 0.0, 1), (3, 1, "a", 0.0, 2),
         (4, 1, "a", 100.0, 3), (5, 1, "a", 0.0, 1003)],
    )
    r = agg.agg_twap(ev).collect()[0]
    assert r.twap_c == pytest.approx(round(100_00 * 1000 / 1003, 4), abs=1e-9)


# ------------------------------------------------------------------- win_fby


def test_fby_keeps_all_tied_max_rows(spark):
    ev = _events(
        spark,
        [(1, 1, "a", 5.0, 10), (2, 1, "a", 9.0, 20), (3, 1, "a", 9.0, 30),
         (4, 2, "a", 1.0, 10)],
    )
    out = {(r.event_id): (r.grp_max, r.grp_n) for r in wn.win_fby(ev).collect()}
    assert out == {2: (9.0, 3), 3: (9.0, 3), 4: (1.0, 1)}


# -------------------------------------------------------------- emb_outliers


def test_emb_outliers_flags_far_vector(spark):
    """9 near-origin vectors + 1 far vector in dim 2: the far one z-scores
    past 2, the cluster does not; dist is the exact euclidean norm."""
    from kdb_spark.llm import similarity as sim

    rows = [(i, [float(i % 3) / 100.0, 0.0]) for i in range(9)] + [(9, [30.0, 40.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in sim.emb_outliers(df, dim=2).collect()}
    cx, cy = (sum(i % 3 for i in range(9)) / 100.0 + 30.0) / 10, 4.0
    assert out[9].dist == pytest.approx(math.hypot(30.0 - cx, 40.0 - cy), abs=1e-3)
    assert out[9].is_outlier
    assert sum(r.is_outlier for r in out.values()) == 1
    assert out[0].dist == pytest.approx(math.hypot(0.0 - cx, 0.0 - cy), abs=1e-3)


# ------------------------------------------------------------- win_bollinger


def test_bollinger_exact_moments_and_head_null(spark):
    """Head row (n=1) → null bands, band=null; k+1 frame mean/σ match the
    closed form; a spike breaches 'above'."""
    # 19 calm points + a spike: the trailing frame includes the spike, so
    # it must be big enough that z = (v-μ)/σ clears 2 even with σ inflated
    # by itself (max attainable z in an n-frame is (n-1)/√n)
    vals = [10.0 + (i % 2) * 0.5 for i in range(19)] + [500.0]
    ev = _events(
        spark, [(i + 1, 1, "a", v, (i + 1) * 100) for i, v in enumerate(vals)]
    )
    out = {r.event_id: r for r in wn.win_bollinger(ev, k=19).collect()}
    assert out[1].band is None and out[1].upper is None
    assert out[1].mid == 10.0
    assert out[2].band == "in"
    import statistics

    c = [int(v * 100) for v in vals]
    mu, sd = statistics.mean(c), statistics.stdev(c)
    assert out[20].mid == pytest.approx(round(mu / 100, 6), abs=1e-9)
    assert out[20].upper == pytest.approx(round((mu + 2 * sd) / 100, 6), abs=1e-6)
    assert out[20].band == "above"


def test_bollinger_frame_slides(spark):
    # k=1 → two-row frame: row 3's stats use rows 2..3 only
    ev = _events(
        spark,
        [(1, 1, "a", 0.0, 100), (2, 1, "a", 10.0, 200), (3, 1, "a", 20.0, 300)],
    )
    out = {r.event_id: r for r in wn.win_bollinger(ev, k=1).collect()}
    assert out[3].mid == 15.0


# ------------------------------------------------------ agg_distinct_overlap


def test_distinct_overlap_buckets_users(spark):
    ev = _events(
        spark,
        # user 1: both sides; user 2: only before; user 3: only after
        [(1, 1, "a", 0.0, 100), (2, 1, "a", 0.0, 900),
         (3, 2, "a", 0.0, 200), (4, 3, "a", 0.0, 800),
         (5, 4, "b", 0.0, 500)],  # exactly at split → after
    )
    out = {r.event_type: r for r in agg.agg_distinct_overlap(ev, split_us=500).collect()}
    a = out["a"]
    assert (a.n_both, a.n_only_before, a.n_only_after, a.n_users) == (1, 1, 1, 3)
    b = out["b"]
    assert (b.n_both, b.n_only_before, b.n_only_after) == (0, 0, 1)


# -------------------------------------------------------------- win_drawdown


def test_drawdown_tracks_running_peak(spark):
    ev = _events(
        spark,
        [(1, 1, "a", 100.0, 100), (2, 1, "a", 150.0, 200),
         (3, 1, "a", 90.0, 300), (4, 1, "a", 150.0, 400),
         (5, 1, "a", 200.0, 500)],
    )
    out = {r.event_id: (r.peak, r.drawdown, r.dd_frac)
           for r in wn.win_drawdown(ev).collect()}
    assert out[1] == (100.0, 0.0, 0.0)
    assert out[3] == (150.0, 60.0, 0.4)
    assert out[4] == (150.0, 0.0, 0.0)
    assert out[5] == (200.0, 0.0, 0.0)


def test_drawdown_nonpositive_peak_null_frac(spark):
    ev = _events(spark, [(1, 1, "a", -5.0, 100), (2, 1, "a", -10.0, 200)])
    out = {r.event_id: (r.peak, r.drawdown, r.dd_frac)
           for r in wn.win_drawdown(ev).collect()}
    assert out[1] == (-5.0, 0.0, None)
    assert out[2] == (-5.0, 5.0, None)


# --------------------------------------------------------------- agg_autocorr


def test_autocorr_alternating_and_trending(spark):
    # strictly increasing by constant step → r = +1; alternation → −1
    up = [(i, 1, "a", float(i), i * 100) for i in range(1, 7)]
    alt = [(i + 10, 2, "a", float(i % 2), i * 100) for i in range(1, 8)]
    out = {r.user_id: r for r in agg.agg_autocorr(_events(spark, up + alt)).collect()}
    assert out[1].ac1 == pytest.approx(1.0, abs=1e-9) and out[1].n_pairs == 5
    assert out[2].ac1 == pytest.approx(-1.0, abs=1e-9)


def test_autocorr_short_and_constant_series(spark):
    short = [(1, 1, "a", 1.0, 100), (2, 1, "a", 2.0, 200), (3, 1, "a", 3.0, 300)]
    const = [(i + 10, 2, "a", 7.0, i * 100) for i in range(1, 6)]
    out = {r.user_id: r for r in agg.agg_autocorr(_events(spark, short + const)).collect()}
    assert 1 not in out  # only 2 pairs < min_n
    assert out[2].ac1 is None  # zero variance → corr undefined, kept as null


# ------------------------------------------------------------------- win_rsi


def test_rsi_all_gain_all_loss_and_mixed(spark):
    up = [(i, 1, "a", float(i), i * 100) for i in range(1, 5)]
    down = [(i + 10, 2, "a", float(10 - i), i * 100) for i in range(1, 5)]
    # user 3: +2, -1, +2, -1 → rs = 4/2 → rsi = 100·4/6
    mixed_vals = [5.0, 7.0, 6.0, 8.0, 7.0]
    mixed = [(i + 20, 3, "a", v, i * 100) for i, v in enumerate(mixed_vals, 1)]
    out = {r.event_id: r for r in wn.win_rsi(_events(spark, up + down + mixed)).collect()}
    assert out[1].rsi is None and out[1].n_deltas == 0  # series head
    assert out[4].rsi == 100.0
    assert out[14].rsi == 0.0
    assert out[25].rsi == pytest.approx(round(100 * 400 / 600, 4), abs=1e-9)
    assert out[25].n_deltas == 4


def test_rsi_flat_series_null_and_frame_slides(spark):
    flat = [(i, 1, "a", 3.0, i * 100) for i in range(1, 4)]
    out = {r.event_id: r for r in wn.win_rsi(_events(spark, flat)).collect()}
    assert all(r.rsi is None for r in out.values())  # zero movement
    # k=2 frame: deltas +1,+1,-1,-1 → at row 5 frame covers (+1,-1) → 50
    seq = [(i + 10, 2, "a", v, i * 100)
           for i, v in enumerate([1.0, 2.0, 3.0, 2.0, 1.0], 1)]
    out2 = {r.event_id: r.rsi for r in wn.win_rsi(_events(spark, seq), k=2).collect()}
    assert out2[14] == 50.0


# ---------------------------------------------------------------- win_hampel


def test_hampel_flags_spike_mean_would_smear(spark):
    """A lone spike is flagged; its neighbors are NOT (the median ignores
    the spike where a mean/σ window would drag); head rows with tiny frames
    behave (n=1 → mad 0, dev 0 → not a spike)."""
    vals = [10.0, 10.2, 9.8, 10.0, 10.1, 500.0, 9.9, 10.0, 10.2, 10.1]
    ev = _events(
        spark, [(i + 1, 1, "a", v, (i + 1) * 100) for i, v in enumerate(vals)]
    )
    out = {r.event_id: r for r in wn.win_hampel(ev).collect()}
    assert out[6].is_spike is True
    assert all(out[i].is_spike is False for i in (1, 2, 3, 4, 5, 7, 8, 9, 10))
    assert out[1].med == 10.0 and out[1].mad == 0.0


def test_hampel_median_interpolation_even_frame(spark):
    # frame {10, 20} at row 2: med = 15, mad = 5, dev = 5 ≤ 3·5 → not spike
    ev = _events(spark, [(1, 1, "a", 10.0, 100), (2, 1, "a", 20.0, 200)])
    out = {r.event_id: (r.med, r.mad, r.is_spike)
           for r in wn.win_hampel(ev).collect()}
    assert out[2] == (15.0, 5.0, False)


def test_hampel_constant_frame_zero_mad_flags_any_move(spark):
    ev = _events(
        spark,
        [(i, 1, "a", 5.0, i * 100) for i in range(1, 8)] + [(8, 1, "a", 5.01, 800)],
    )
    out = {r.event_id: r.is_spike for r in wn.win_hampel(ev).collect()}
    assert out[8] is True and not any(out[i] for i in range(1, 8))


# ------------------------------------------------------------ emb_mmr_rerank


def test_mmr_diversifies_away_from_duplicate(spark):
    """With a duplicate of the top hit in the shortlist, diversity-weighted
    MMR (λ<0.5) must pick the dissimilar doc in round 2 where pure top-k
    would return the duplicate; round-1 tie breaks to the lower vec_id."""
    from kdb_spark.llm import similarity as sim

    rows = [
        (0, [1.0, 0.0]),   # query
        (1, [1.0, 0.0]),   # top hit
        (2, [1.0, 0.0]),   # exact duplicate of the top hit
        (3, [0.1, 0.995]), # dissimilar, low relevance
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.round: r for r in
           sim.emb_mmr_rerank(df, n_queries=1, m=10, k_sel=2, lam=0.4).collect()}
    assert out[1].match_id == 1 and out[1].rel == 1.0
    assert out[2].match_id == 3  # NOT the duplicate (score -0.02 vs -0.2)
    assert out[2].mmr > 0.4 * 1.0 - 0.6 * 1.0


def test_mmr_relevance_heavy_keeps_topk_order(spark):
    # λ=1.0 degenerates to pure relevance: rounds = top-k_sel by cosine
    from kdb_spark.llm import similarity as sim

    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.1]), (2, [1.0, 0.3]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = [r.match_id for r in sorted(
        sim.emb_mmr_rerank(df, n_queries=1, m=10, k_sel=3, lam=1.0).collect(),
        key=lambda r: r.round)]
    assert out == [1, 2, 3]


# ------------------------------------------------------------ agg_kmv_overlap


def test_kmv_small_sets_are_exact_and_overlap_decomposes(spark):
    """Below k members every estimate short-circuits to the exact count, so
    the inclusion-exclusion overlap is exact too."""
    rows = []
    eid = 0
    # type 'a': users 0..9 before, 5..14 after → both = 5
    for u in range(10):
        eid += 1; rows.append((eid, u, "a", 0.0, 100))
    for u in range(5, 15):
        eid += 1; rows.append((eid, u, "a", 0.0, 900))
    out = {r.event_type: r for r in
           agg.agg_kmv_overlap(_events(spark, rows), split_us=500).collect()}
    r = out["a"]
    assert (r.est_before, r.est_after, r.est_union, r.est_both) == (
        10.0, 10.0, 15.0, 5.0
    )


def test_kmv_estimate_tracks_large_cardinalities(spark):
    # 2000 distinct users per side, 1000 shared → estimates within ~25%
    rows = []
    eid = 0
    for u in range(2000):
        eid += 1; rows.append((eid, u, "a", 0.0, 100))
    for u in range(1000, 3000):
        eid += 1; rows.append((eid, u, "a", 0.0, 900))
    r = agg.agg_kmv_overlap(_events(spark, rows), split_us=500).collect()[0]
    for est, true in ((r.est_before, 2000), (r.est_after, 2000),
                      (r.est_union, 3000)):
        assert abs(est - true) / true < 0.25, (est, true)


# ------------------------------------------------------------ mm_segment_bounds


def test_segment_bounds_flags_relative_jumps(spark):
    """First frame always opens segment 1; a >30% relative energy move
    opens a new segment; smaller moves do not."""
    from kdb_spark.llm import multimodal as mm
    from pyspark.sql import functions as F

    # bypass the WAV synth: feed a hand-built frame-energy series through
    # the same window logic by monkey-framing mm_audio_features' output
    import kdb_spark.llm.multimodal as mmod

    feats = spark.createDataFrame(
        [(1, 0, 100), (1, 1, 125), (1, 2, 170), (1, 3, 165),
         (2, 0, 50)],
        "doc_id long, frame_idx long, energy long",
    )
    orig = mmod.mm_audio_features
    try:
        mmod.mm_audio_features = lambda _w: feats.select(
            "doc_id", "frame_idx", "energy",
            F.lit(256).alias("n_samples"), F.lit(0).alias("peak"),
        )
        out = {(r.doc_id, r.frame_idx): (r.is_boundary, r.segment_id)
               for r in mmod.mm_segment_bounds(None).collect()}
    finally:
        mmod.mm_audio_features = orig
    assert out[(1, 0)] == (True, 1)
    assert out[(1, 1)] == (False, 1)   # +25% ≤ 30%
    assert out[(1, 2)] == (True, 2)    # +36% > 30%
    assert out[(1, 3)] == (False, 2)   # −3%
    assert out[(2, 0)] == (True, 1)


# ----------------------------------------------------------- text_pmi_bigrams


def test_pmi_favors_exclusive_pairs(spark):
    """A bigram whose words appear ONLY together maxes PMI; a pair of
    ubiquitous words scores near zero; min_count drops rare pairs."""
    import math

    docs = spark.createDataFrame(
        [(1, ("alpha beta " * 6) + ("x y " * 6) + "x q"),
         (2, ("x z " * 6) + ("y x " * 3))],
        "doc_id long, text string",
    )
    out = {(r.w1, r.w2): r for r in tx.text_pmi_bigrams(docs, k=50, min_count=3).collect()}
    ab = out[("alpha", "beta")]
    # alpha appears in the left slot only in 'alpha beta'
    assert ab.n_ab == ab.n_a == 6
    n_total = sum(r.n_ab for r in
                  tx.text_pmi_bigrams(docs, k=10**6, min_count=1).collect())
    assert ab.pmi == pytest.approx(
        round(math.log(n_total * 6 / (6 * ab.n_b)), 6), abs=1e-9
    )
    assert ("alpha", "beta") in out
    best = min(out.values(), key=lambda r: r.rnk)
    assert (best.w1, best.w2) == ("alpha", "beta")


# -------------------------------------------------------------- agg_cohort_ltv


def test_cohort_ltv_accumulates_per_cohort(spark):
    from kdb_spark.analytics import behavior as bh
    from kdb_spark.tables import DAY_US

    D = DAY_US
    ev = _events(
        spark,
        # user 1 joins day 0 (10 + 20), returns day 2 (+5);
        # user 2 joins day 0 (+1); user 3 joins day 1 (+7)
        [(1, 1, "a", 10.0, 0), (2, 1, "a", 20.0, 100), (3, 1, "a", 5.0, 2 * D),
         (4, 2, "a", 1.0, 50), (5, 3, "a", 7.0, D + 3)],
    )
    out = {(r.cohort_us, r.day_offset): (r.n_users, r.value_c, r.cum_value_c)
           for r in bh.agg_cohort_ltv(ev).collect()}
    assert out[(0, 0)] == (2, 3100, 3100)
    assert out[(0, 2)] == (1, 500, 3600)   # cumulative carries day 0
    assert out[(D, 0)] == (1, 700, 700)    # separate cohort restarts
    assert (0, 1) not in out               # inactive offsets are absent


# ------------------------------------------------------- emb_centroid_classify


def test_centroid_classify_separable_labels_diagonal(spark):
    """Two well-separated label clusters classify onto the diagonal; a
    point nearer the other centroid lands off-diagonal."""
    from kdb_spark.llm import similarity as sim

    rows = (
        [(i, [1.0, 0.01 * i], 0) for i in range(5)]
        + [(10 + i, [0.01 * i, 1.0], 1) for i in range(5)]
        + [(99, [0.05, 1.0], 0)]  # labeled 0 but sits in cluster 1
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {(r.true_label, r.pred_label): r.n
           for r in sim.emb_centroid_classify(df, dim=2).collect()}
    assert out[(0, 0)] == 5 and out[(1, 1)] == 5
    assert out[(0, 1)] == 1 and (1, 0) not in out


# ----------------------------------------------------------- agg_seasonality


def test_seasonality_folds_hours_across_days(spark):
    """Rows 24h apart land in the SAME hour-of-day bucket (the periodic
    fold agg_resample doesn't do), counts/sums are exact, and the hour
    index is pure integer epoch arithmetic (no calendar)."""
    h = 3_600 * 1_000_000
    rows = [
        (1, 1, "a", 2.0, 9 * h),            # day 0, 09:00
        (2, 1, "a", 4.0, 24 * h + 9 * h),   # day 1, 09:00 — same bucket
        (3, 1, "a", 8.0, 10 * h),           # day 0, 10:00
    ]
    out = {(r.event_type, r.hour_of_day): r
           for r in agg.agg_seasonality(_events(spark, rows)).collect()}
    assert out[("a", 9)].n == 2 and out[("a", 9)].sum_value_c == 600
    assert abs(out[("a", 9)].avg_value - 3.0) < 1e-9
    assert out[("a", 10)].n == 1 and out[("a", 10)].sum_value_c == 800


# -------------------------------------------------------- text_hash_features


def test_hash_features_counts_partition_tokens(spark):
    """Per-doc slot counts sum to the doc's token count, slots stay in
    [0, n_slots), and identical tokens always share a slot (the hashing
    trick's only structural guarantees)."""
    df = spark.createDataFrame(
        [(1, "the cat the dog"), (2, ""), (3, "cat")],
        "doc_id long, text string",
    )
    rows = tx.text_hash_features(df, n_slots=8).collect()
    per_doc: dict[int, int] = {}
    for r in rows:
        assert 0 <= r.slot < 8
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.cnt
    assert per_doc == {1: 4, 3: 1}  # empty doc emits no rows
    # "cat" hashes identically in both docs: doc 1 has a slot holding ≥2
    # ("the"×2) and doc 3's single slot must appear among doc 1's slots
    slots1 = {r.slot for r in rows if r.doc_id == 1}
    slot3 = next(r.slot for r in rows if r.doc_id == 3)
    assert slot3 in slots1


# ------------------------------------------------------------------ agg_vwap


def test_vwap_zero_volume_series_yields_null(spark):
    """A series whose every tick carries k=0 volume emits NULL vwap (not a
    divide error under ANSI), while counts/volume stay exact."""
    df = spark.createDataFrame(
        [
            (1, 1, "a", 5.0, '{"k": 0}', 1_000_000),
            (2, 1, "a", 7.0, '{"k": 0}', 2_000_000),
            (3, 2, "a", 5.0, '{"k": 2}', 1_000_000),
            (4, 2, "a", 8.0, '{"k": 6}', 2_000_000),
        ],
        "event_id long, user_id long, event_type string, value double,"
        " props string, ts_us long",
    )
    out = {r.user_id: r for r in agg.agg_vwap(df).collect()}
    assert out[1].vwap_c is None and out[1].volume == 0 and out[1].n_ticks == 2
    # user 2: (500·2 + 800·6) / 8 = 725.0
    assert out[2].volume == 8 and abs(out[2].vwap_c - 725.0) < 1e-9


# ----------------------------------------------- mix_temperature / token_budget


def test_mix_temperature_flattens_toward_uniform(spark):
    """α=0.5 temperature: target shares order-match raw shares but are
    strictly closer to uniform; shares sum to ~1; the dominant source is
    downsampled (rate < 1) and the rare one keeps everything (rate 1)."""
    rows = [(i, "x" * 100, "big") for i in range(9)] + [(100, "x" * 100, "small")]
    df = spark.createDataFrame(
        [(i, t, s, len(t)) for i, t, s in rows],
        "doc_id long, text string, source string, n_chars long",
    )
    out = {r.source: r for r in cu.mix_temperature(df).collect()}
    # raw shares 0.9/0.1 → sqrt-weights ~0.75/0.25
    assert 0.1 < out["small"].target_share < 0.5 < out["big"].target_share < 0.9
    assert abs(out["big"].target_share + out["small"].target_share - 1.0) < 1e-5
    assert out["big"].mix_rate < 1.0 and out["small"].mix_rate == 1.0


def test_token_budget_keeps_high_scores_whole_and_thins_boundary(spark):
    """Levels that fit the budget are kept whole; the boundary level is
    hash-thinned to ~the remaining budget; exhausted levels drop."""
    # high-quality docs: 20 tokens each with stopwords; low-quality: digit soup
    good = "the cat sat of the mat and dog ran to the park in a big field is nice"
    bad = "9" * 50
    rows = [(i, good) for i in range(10)] + [(100 + i, bad) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n_good_tokens = len(good.split())
    kept = cu.curation_token_budget(df, budget=10 * n_good_tokens).collect()
    scores = {r.doc_id: r.score for r in kept}
    # every good doc fits exactly in budget → all kept; bad level exhausted
    assert sorted(d for d in scores if d < 100) == list(range(10))
    assert not [d for d in scores if d >= 100]
    # half the good budget → boundary thinning keeps a strict subset
    kept_half = cu.curation_token_budget(df, budget=5 * n_good_tokens).collect()
    ids_half = {r.doc_id for r in kept_half}
    assert set(ids_half) < set(range(10)) and 0 < len(ids_half) < 10


# ------------------------------------------------------------------ win_macd


def test_macd_constant_series_is_flat_and_cross_signs(spark):
    """A constant series gives macd = signal = hist = 0 everywhere (both
    EWMAs equal the constant); a step up makes macd positive (fast EWMA
    reacts first) with hist = macd − signal > 0 right after the step."""
    flat = [(i, 1, "a", 10.0, i * 1_000_000) for i in range(10)]
    out = wn.win_macd(_events(spark, flat)).collect()
    assert all(r.macd == 0.0 and r.signal == 0.0 and r.hist == 0.0 for r in out)
    step = [(i, 1, "a", 10.0 if i < 5 else 20.0, i * 1_000_000) for i in range(10)]
    got = {r.event_id: r for r in wn.win_macd(_events(spark, step)).collect()}
    assert got[5].macd > 0 and got[5].hist > 0


# -------------------------------------------------------- agg_bitmap_distinct


def test_bitmap_distinct_equals_count_distinct(spark):
    """The bitmap-word popcount must equal exact COUNT(DISTINCT) including
    ids that straddle word boundaries (61, 62, 63) and repeats."""
    day0 = 19723 * 86_400_000_000
    rows = [
        (i, uid, "a", 1.0, day0 + i)
        for i, uid in enumerate([0, 0, 1, 61, 62, 63, 124, 124, 200])
    ]
    out = agg.agg_bitmap_distinct(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_users == 7  # {0,1,61,62,63,124,200}
    assert r.n_words == 4  # words 0 (0,1,61), 1 (62,63), 2 (124), 3 (200)


# ------------------------------------------------------------ agg_chi2_drift


def test_chi2_drift_hand_case_and_zero_on_identical(spark):
    """2x2 case checks the closed-form statistic (30/10 vs 10/10 over
    en/fr gives chi2 = 3.75 exactly, dof = 1); identical distributions
    give chi2 = 0."""
    rows = (
        [(i, "t", "en", "A", 1) for i in range(30)]
        + [(30 + i, "t", "fr", "A", 1) for i in range(10)]
        + [(40 + i, "t", "en", "B", 1) for i in range(10)]
        + [(50 + i, "t", "fr", "B", 1) for i in range(10)]
    )
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {(r.source_a, r.source_b): r for r in agg.agg_chi2_drift(df).collect()}
    r = out[("A", "B")]
    assert (r.n_a, r.n_b, r.dof) == (40, 20, 1)
    assert r.chi2 == pytest.approx(3.75, abs=1e-9)
    same = spark.createDataFrame(
        [(i, "t", "en" if i % 2 else "fr", s, 1)
         for s in ("A", "B") for i in range(20)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out2 = agg.agg_chi2_drift(same).collect()
    assert len(out2) == 1 and out2[0].chi2 == 0.0


# ----------------------------------------------------- text_boilerplate_ratio


def test_boilerplate_ratio_extremes(spark):
    """An exact copy scores ratio 1.0 on every kept window (both copies);
    a unique doc scores 0.0; the ratio column is the integer-rounded
    n_dup/n_kept."""
    passage = " ".join(f"tok{i}" for i in range(60))
    unique = " ".join(f"other{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, passage), (2, passage), (3, unique)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in
           tx.text_boilerplate_ratio(df, w=4, keep_mod=2).collect()}
    assert out[1].n_kept > 0 and out[1].boiler_ratio == 1.0
    assert out[2].boiler_ratio == 1.0
    assert out[3].n_dup == 0 and out[3].boiler_ratio == 0.0


# -------------------------------------------------------------- table_key_skew


def test_key_skew_log2_census(spark):
    """Keys with 1, 3 and 5 rows land in buckets 0/1/2 (lo 1/2/4), key and
    row counts are exact, and pct_rows is the integer-rounded share."""
    rows = (
        [(1, 10, "view", 1.0, 100)]
        + [(i, 20, "view", 1.0, 100 + i) for i in range(2, 5)]
        + [(i, 30, "view", 1.0, 200 + i) for i in range(5, 10)]
    )
    out = {r.bucket: r for r in
           agg.table_key_skew(_events(spark, rows)).collect()}
    assert (out[0].lo, out[0].n_keys, out[0].n_rows, out[0].max_per_key) == (1, 1, 1, 1)
    assert (out[1].lo, out[1].n_keys, out[1].n_rows, out[1].max_per_key) == (2, 1, 3, 3)
    assert (out[2].lo, out[2].n_keys, out[2].n_rows, out[2].max_per_key) == (4, 1, 5, 5)
    assert out[2].pct_rows == pytest.approx(round(5 / 9, 6), abs=1e-9)


# ----------------------------------------------------------------- agg_dau_mau


def test_dau_mau_trailing_window_and_ratio(spark):
    """User active on day 0 counts toward MAU for the next 29 days; a day's
    DAU counts each user once regardless of event count; stickiness is the
    exact integer-rounded ratio."""
    D = 86_400_000_000
    rows = (
        [(1, 1, "view", 1.0, 0), (2, 1, "view", 1.0, 1)]   # u1 twice day0
        + [(3, 2, "view", 1.0, 0)]                          # u2 day0
        + [(4, 1, "view", 1.0, 5 * D)]                      # u1 day5
        + [(5, 3, "view", 1.0, 40 * D)]                     # u3 day40 (u1/u2 aged out)
    )
    out = {r.day: r for r in agg.agg_dau_mau(_events(spark, rows)).collect()}
    assert (out[0].dau, out[0].mau) == (2, 2)
    # day 5: u1 active; trailing window still holds u1+u2 from day 0
    assert (out[5].dau, out[5].mau) == (1, 2)
    assert out[5].stickiness == pytest.approx(0.5, abs=1e-9)
    # day 40: day-0/5 activity fell out of the 30-day window
    assert (out[40].dau, out[40].mau) == (1, 1)
    # dead days report nothing
    assert set(out) == {0, 5, 40}


# --------------------------------------------------------------- dedup_keep_best


def test_keep_best_prefers_quality_then_length(spark):
    """Within a near-dup cluster the highest-quality member survives
    (NOT the min doc_id — doc 1 is a low-quality truncation here); ties
    break to more tokens, then lower id; singletons keep themselves."""
    good = ("the quick brown fox jumps over the lazy dog and keeps on "
            "running to the old mill by the river every single day")
    trunc = good.split(" and ")[0]  # shares shingles, fails the length gate
    uniq = "completely different text about spark shuffles and parquet files"
    df = spark.createDataFrame(
        [(1, trunc), (2, good), (3, uniq)], "doc_id long, text string"
    )
    from kdb_spark.llm import dedup as dd

    out = {r.canonical_id: r for r in
           dd.dedup_keep_best(df, threshold=0.2).collect()}
    # docs 1 and 2 cluster under canonical 1, but doc 2 (higher score) wins
    assert out[1].kept_doc_id == 2 and out[1].n_members == 2
    assert out[3].kept_doc_id == 3 and out[3].n_members == 1


# ---------------------------------------------------------- text_vocab_coverage


def test_vocab_coverage_top_n_and_ratio(spark):
    """vocab_size=2 keeps the two most frequent tokens (ties by token asc);
    coverage is the exact fraction of token OCCURRENCES the vocab covers."""
    df = spark.createDataFrame(
        [
            (1, "aa aa aa bb bb cc"),   # aa:3 bb:2 -> vocab {aa, bb}
            (2, "cc cc cc cc"),         # all OOV
            (3, "aa cc"),
        ],
        "doc_id long, text string",
    )
    from kdb_spark.llm import dedup as dd

    dd._REUSE_CACHE.pop("vocab_cov_toks_2", None)
    out = {r.doc_id: r for r in tx.text_vocab_coverage(df, vocab_size=2).collect()}
    # corpus counts: cc:6, aa:4, bb:2 -> vocab {cc, aa}
    assert out[1].n_tokens == 6 and out[1].covered == 4
    assert out[1].coverage == pytest.approx(round(4 / 6, 6), abs=1e-9)
    assert out[2].covered == 4 and out[2].coverage == 1.0
    assert out[3].covered == 2 and out[3].coverage == 1.0


# ------------------------------------------------------------ win_realized_vol


def test_realized_vol_exact_deltas(spark):
    """rvol is sqrt(mean Δc²)/100 over the trailing frame: hand-checked on
    a 3-tick series; first tick (no delta) is null."""
    ev = _events(
        spark,
        [(1, 1, "view", 10.00, 100), (2, 1, "view", 10.03, 200),
         (3, 1, "view", 9.99, 300)],
    )
    out = {r.event_id: r.rvol for r in wn.win_realized_vol(ev).collect()}
    import math
    assert out[1] is None
    assert out[2] == pytest.approx(math.floor(math.sqrt(9.0) * 1e4 + 0.5) / 1e6)
    want3 = math.floor(math.sqrt((9 + 16) / 2) * 1e4 + 0.5) / 1e6
    assert out[3] == pytest.approx(want3, abs=1e-12)


# -------------------------------------------------------------- agg_tvd_drift


def test_tvd_hand_case_bounds_and_zero(spark):
    """2-lang case matches the closed form (¾ vs ½ en-share → TVD 0.25);
    identical distributions give 0; disjoint supports give 1."""
    def mk(spec):
        rows, i = [], 0
        for src, lang, n in spec:
            for _ in range(n):
                rows.append((i, "t", lang, src, 1)); i += 1
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )

    out = agg.agg_tvd_drift(mk([("A", "en", 30), ("A", "fr", 10),
                                ("B", "en", 10), ("B", "fr", 10)])).collect()
    assert len(out) == 1 and out[0].tvd == pytest.approx(0.25, abs=1e-9)
    same = agg.agg_tvd_drift(mk([("A", "en", 5), ("A", "fr", 5),
                                 ("B", "en", 7), ("B", "fr", 7)])).collect()
    assert same[0].tvd == 0.0
    disj = agg.agg_tvd_drift(mk([("A", "en", 9), ("B", "fr", 4)])).collect()
    assert disj[0].tvd == 1.0


# ------------------------------------ round-11: hhi / top_share / stochastic / msttr


def test_hhi_hand_cases(spark):
    """Monopoly → HHI 1; k equal users → exactly 1/k on the 1e-6 grid
    (integer-rounded, not float-divided)."""
    rows = [(1, "mono", i) for i in range(5)]  # one user owns all "mono"
    rows += [(u, "uniform", 100 + i) for u in (1, 2, 3, 4) for i in range(3)]
    df = spark.createDataFrame(
        [(eid, u, t, eid * 1000, 1.0) for eid, (u, t, _) in enumerate(rows)],
        "event_id long, user_id long, event_type string, ts_us long, value double",
    )
    got = {r.event_type: r for r in agg.agg_hhi(df).collect()}
    assert got["mono"].hhi == 1.0 and got["mono"].n_users == 1
    assert got["uniform"].hhi == 0.25  # 4 × (3/12)² = 1/4, exact
    assert (got["uniform"].n_users, got["uniform"].n_events) == (4, 12)


def test_top_share_two_phase_topk_matches_plain_window(spark):
    """The salted two-phase top-k must select the same top-10 set (and
    hence the same share) as a plain per-nation ranking — including the
    custkey tiebreak on equal revenue."""
    import random

    rng = random.Random(11)
    orders, custs = [], []
    for ck in range(1, 61):
        nk = ck % 3
        custs.append((ck, nk))
        for j in range(rng.randint(1, 4)):
            # duplicate totals across customers to exercise the tiebreak
            orders.append((ck * 100 + j, ck, float(rng.choice([10, 10, 25, 40]))))
    odf = spark.createDataFrame(orders, "o_orderkey long, o_custkey long, o_totalprice double")
    cdf = spark.createDataFrame(custs, "c_custkey long, c_nationkey long")
    ndf = spark.createDataFrame(
        [(0, "A"), (1, "B"), (2, "C")], "n_nationkey long, n_name string"
    )
    got = {r.n_name: r for r in agg.agg_top_share(odf, cdf, ndf).collect()}
    # brute force in python
    import collections
    rev = collections.Counter()
    for _, ck, tp in orders:
        rev[ck] += round(tp * 100)
    by_nation = collections.defaultdict(list)
    for ck, nk in custs:
        if ck in rev:
            by_nation[nk].append((rev[ck], ck))
    names = {0: "A", 1: "B", 2: "C"}
    for nk, lst in by_nation.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        top = sum(v for v, _ in lst[:10])
        tot = sum(v for v, _ in lst)
        r = got[names[nk]]
        assert (r.top_c, r.total_c, r.n_cust) == (top, tot, len(lst))
        want6 = (2 * 10**6 * top + tot) // (2 * tot)
        assert r.top_share == want6 / 1e6


def test_stochastic_hand_series(spark):
    """%K = 100·(c−lo)/(hi−lo) over the trailing 14 rows; %D = 3-row SMA
    of %K re-rounded from grid integers; flat channel → null %K and the
    null poisons %D for the next `smooth` rows."""
    vals = [1.0, 3.0, 2.0, 3.0, 1.0, 1.0]
    df = spark.createDataFrame(
        [(i, 1, "c", i * 1000, v) for i, v in enumerate(vals)],
        "event_id long, user_id long, event_type string, ts_us long, value double",
    )
    got = {r.event_id: r for r in wn.win_stochastic(df).collect()}
    # row 0: hi=lo=100 → null; rows 1+: trailing extremes over all rows so far
    assert got[0].pct_k is None and got[0].pct_d is None
    assert got[1].pct_k == 100.0          # c=300 = hi
    assert got[2].pct_k == 50.0           # (200-100)/(300-100)
    assert got[3].pct_k == 100.0
    assert got[4].pct_k == 0.0
    assert got[5].pct_k == 0.0
    # %D needs 3 consecutive non-null %K: first at row 3
    assert got[1].pct_d is None and got[2].pct_d is None
    assert got[3].pct_d == round((100 + 50 + 100) / 3, 6) == 83.333333
    assert got[4].pct_d == 50.0
    assert got[5].pct_d == round((100 + 0 + 0) / 3, 6)


def test_msttr_segments_and_short_docs(spark):
    """TTR = types/tokens exactly; MSTTR averages FULL 50-token segments
    only; docs under one segment get null msttr, empty docs null ttr."""
    seg_a = " ".join(f"w{i}" for i in range(50))          # 50 distinct
    seg_b = " ".join(["dup"] * 50)                         # 1 distinct
    doc_full = seg_a + " " + seg_b + " tail tokens here"   # partial tail dropped
    df = spark.createDataFrame(
        [(1, doc_full), (2, "just a few tokens"), (3, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in tx.text_msttr(df).collect()}
    r = got[1]
    assert (r.n_tokens, r.n_segs) == (103, 2)
    assert r.msttr == round((50 + 1) / 100, 6) == 0.51
    want_ttr6 = (2 * 10**6 * r.n_types + r.n_tokens) // (2 * r.n_tokens)
    assert r.ttr == want_ttr6 / 1e6
    assert got[2].n_segs == 0 and got[2].msttr is None
    assert got[2].ttr == 1.0  # 4 distinct / 4 tokens
    assert got[3].n_tokens == 0 and got[3].ttr is None and got[3].msttr is None


def test_lorenz_curve_hand_case(spark):
    """Cumulative shares are exact integer ratios per bucket; the final
    bucket closes both curves at exactly 1.0; buckets follow the log2
    bit-math rule with non-positive cents collapsed to bucket 0."""
    # values 1.00 (c=100, bucket 6), 2.56 (c=256, bucket 8), 10.24 (c=1024, bucket 10)
    rows = [(1, 1, "c", 1000, 1.0), (2, 1, "c", 2000, 2.56), (3, 1, "c", 3000, 10.24)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    got = {r.bucket: r for r in agg.agg_lorenz(df).collect()}
    assert sorted(got) == [6, 8, 10]
    tot = 100 + 256 + 1024
    want6 = (2 * 10**6 * 100 + tot) // (2 * tot)
    assert got[6].cum_value_share == want6 / 1e6
    w2 = (2 * 10**6 * 356 + tot) // (2 * tot)
    assert got[8].cum_value_share == w2 / 1e6
    assert got[10].cum_value_share == 1.0 and got[10].cum_row_share == 1.0
    # 1/3 → 333333.33… → (2e6·1+3) DIV 6 = 333333 → 0.333333 (half-up)
    assert got[6].cum_row_share == 0.333333


def test_pivot_points_hand_case(spark):
    """Levels derive from the PREVIOUS day's exact-cents H/L/C: pivot =
    (H+L+C)/3, ladder arithmetic exact; day 1 has null levels; the close
    is the last tick by (ts, event_id)."""
    D = 86_400_000_000
    rows = [
        # day 0: H=30.00 L=10.00, close = 20.00 (latest ts wins)
        (1, 1, "c", 0, 10.0),
        (2, 1, "c", 1000, 30.0),
        (3, 1, "c", 2000, 20.0),
        # day 1: one tick
        (4, 1, "c", D + 5, 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    got = {r.day_us: r for r in wn.win_pivot_points(df).collect()}
    assert got[0].pivot is None and got[0].r1 is None
    r = got[D]
    # H=3000 L=1000 C=2000 cents → P = 6000/300 = 20.0 exactly
    assert r.pivot == 20.0
    assert r.r1 == 30.0   # 2P − L
    assert r.s1 == 10.0   # 2P − H
    assert r.r2 == 40.0   # P + (H−L)
    assert r.s2 == 0.0    # P − (H−L)


def test_scalar_bitwise_hand_values(spark):
    from kdb_spark.analytics import scalars as sca

    df = spark.createDataFrame(
        [(12, 10, "c", 0, 1.0), (7, 1, "c", 1, 1.0)],
        "event_id long, user_id long, event_type string, ts_us long, value double",
    )
    got = {r.event_id: r for r in sca.scalar_bitwise(df).collect()}
    r = got[12]  # 1100 vs 1010
    assert (r.b_and, r.b_or, r.b_xor) == (8, 14, 6)
    assert (r.shl3, r.shr2, r.b_not) == (96, 3, -13)
    assert r.hamming == 2  # 0110
    assert got[7].hamming == 2  # 111 ^ 001 = 110


def test_part_supplier_variety_shape(spark):
    """Excluded brand/type never appear; supplier_cnt counts DISTINCT
    suppliers (≤ shipments); size bands are size DIV 10."""
    from tests.conftest import SF_DIR
    from kdb_spark.tables import load as _load

    out = agg.sql_part_supplier_variety(
        _load(spark, SF_DIR, "part"), _load(spark, SF_DIR, "lineitem")
    ).collect()
    assert out
    for r in out:
        assert r.p_brand != "Brand#45"
        assert not r.type_class.startswith("MEDIUM")
        assert 0 < r.supplier_cnt <= r.n_shipments
        assert 0 <= r.size_band <= 5


# ------------------------------------ round-12: aroon / ichimoku / ulcer / runs / dispersion / hapax


def test_aroon_hand_series(spark):
    """since_hi/lo from the struct-max argmax (LATEST tie wins), lines =
    100·(m−since)/m over the available span m; m=0 head → null lines."""
    vals = [1.0, 3.0, 2.0, 3.0, 0.5]
    df = spark.createDataFrame(
        [(i, 1, "a", i * 1000, v) for i, v in enumerate(vals)],
        "event_id long, user_id long, event_type string, ts_us long, value double",
    )
    got = {r.event_id: r for r in wn.win_aroon(df).collect()}
    assert (got[0].since_hi, got[0].since_lo) == (0, 0)
    assert got[0].aroon_up is None and got[0].aroon_down is None
    assert (got[1].aroon_up, got[1].aroon_down) == (100.0, 0.0)
    assert (got[2].aroon_up, got[2].aroon_down) == (50.0, 0.0)
    # row 3 re-hits the 3.0 high: the LATEST occurrence wins the tie
    assert got[3].since_hi == 0 and got[3].aroon_up == 100.0
    assert got[3].since_lo == 3 and got[3].aroon_down == 0.0
    # row 4 is a fresh low
    assert (got[4].aroon_up, got[4].aroon_down) == (75.0, 100.0)


def test_ichimoku_exact_midpoints(spark):
    """Every line is an exact (hi+lo)/2 midpoint in dollars — including
    quarter-cent-free .25/.5 values, where the 5000/2500 integer grids
    must be exact with NO rounding device."""
    vals = [1.0, 1.5, 3.0]
    df = spark.createDataFrame(
        [(i, 1, "a", i * 1000, v) for i, v in enumerate(vals)],
        "event_id long, user_id long, event_type string, ts_us long, value double",
    )
    got = {r.event_id: r for r in wn.win_ichimoku(df).collect()}
    assert got[0].tenkan == got[0].kijun == got[0].span_b == 1.0
    assert got[1].tenkan == 1.25  # (100+150)/2 cents, exact on the grid
    assert got[2].tenkan == got[2].kijun == got[2].span_b == 2.0
    # span A = (tenkan+kijun)/2; frames coincide on a short series
    assert got[1].span_a == 1.25 and got[2].span_a == 2.0


def test_ulcer_index_hand_series(spark):
    """Drawdowns from the trailing-frame peak in exact cents; ulcer =
    round(sqrt(Σdd²/n)/100, 4); max_dd exact dollars."""
    vals = [2.0, 1.0, 3.0, 2.0]
    df = spark.createDataFrame(
        [(i, 1, "a", i * 1000, v) for i, v in enumerate(vals)],
        "event_id long, user_id long, event_type string, ts_us long, value double",
    )
    got = {r.event_id: r for r in wn.win_ulcer_index(df).collect()}
    assert got[0].ulcer == 0.0 and got[0].max_dd == 0.0
    assert got[1].ulcer == round(math.sqrt(10000 / 2) / 100, 4) == 0.7071
    assert got[1].max_dd == 1.0
    assert got[2].ulcer == round(math.sqrt(10000 / 3) / 100, 4) == 0.5774
    assert got[3].ulcer == round(math.sqrt(20000 / 4) / 100, 4) == 0.7071
    assert got[3].max_dd == 1.0


def test_runs_test_hand_series(spark):
    """Signs of tick deltas with zeros DROPPED; runs counted on the
    filtered sequence; null-model moments exact on the 1e-6 grid."""
    vals = [1.0, 2.0, 3.0, 2.0, 3.0, 3.0, 1.0]
    # deltas: + + − + 0 −  → signs kept: + + − + −  → runs: ++|−|+|− = 4
    df = spark.createDataFrame(
        [(i, 1, "a", i * 1000, v) for i, v in enumerate(vals)],
        "event_id long, user_id long, event_type string, ts_us long, value double",
    )
    [r] = agg.agg_runs_test(df).collect()
    assert (r.n_runs, r.n_pos, r.n_neg) == (4, 3, 2)
    assert r.mu_runs == 3.4          # (5 + 2·3·2)/5, exact
    assert r.var_runs == 0.84        # 2·6·(12−5)/(25·4), exact
    # single-delta series: one run, neither moment defined at N=1 → var null
    df1 = spark.createDataFrame(
        [(0, 2, "a", 0, 1.0), (1, 2, "a", 1000, 2.0)],
        "event_id long, user_id long, event_type string, ts_us long, value double",
    )
    [r1] = agg.agg_runs_test(df1).collect()
    assert (r1.n_runs, r1.n_pos, r1.n_neg) == (1, 1, 0)
    assert r1.mu_runs == 1.0 and r1.var_runs is None


def test_poisson_dispersion_hand_counts(spark):
    """Hourly counts → variance-to-mean ratio as an exact rational;
    single-active-hour types report null dispersion."""
    from kdb_spark.tables import HOUR_US

    rows = []
    eid = 0
    for hour, n in ((0, 3), (1, 1), (2, 2)):      # type x: counts 3,1,2
        for _ in range(n):
            rows.append((eid, 1, "x", hour * HOUR_US + eid, 1.0)); eid += 1
    for _ in range(4):                             # type y: one hour
        rows.append((eid, 1, "y", 7 * HOUR_US + eid, 1.0)); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts_us long, value double",
    )
    got = {r.event_type: r for r in agg.agg_poisson_dispersion(df).collect()}
    assert (got["x"].n_hours, got["x"].n_events) == (3, 6)
    assert got["x"].mean_per_hour == 2.0
    assert got["x"].dispersion == 0.5   # (3·14 − 36)/(2·6), exact
    assert (got["y"].n_hours, got["y"].n_events) == (1, 4)
    assert got["y"].mean_per_hour == 4.0 and got["y"].dispersion is None


def test_hapax_ratio_hand_docs(spark):
    """hapax = types − adjacent-equal dup types on the sorted array;
    ratios device-exact; empty docs null, repeated-only docs zero."""
    df = spark.createDataFrame(
        [("d1", "a b a c"), ("d2", ""), ("d3", "x"), ("d4", "q q q")],
        "doc_id string, text string",
    )
    got = {r.doc_id: r for r in tx.text_hapax_ratio(df).collect()}
    assert (got["d1"].n_tokens, got["d1"].n_types, got["d1"].n_hapax) == (4, 3, 2)
    assert got["d1"].hapax_type_ratio == 0.666667   # device half-up, not trunc
    assert got["d1"].hapax_token_ratio == 0.5
    assert got["d2"].n_hapax == 0
    assert got["d2"].hapax_type_ratio is None and got["d2"].hapax_token_ratio is None
    assert (got["d3"].n_hapax, got["d3"].hapax_type_ratio) == (1, 1.0)
    assert (got["d4"].n_types, got["d4"].n_hapax) == (1, 0)
    assert got["d4"].hapax_type_ratio == 0.0


# ------------------------------------ round-12 batch 2: simpson / vwap / gaps / degrees


def test_simpson_diversity_hand_docs(spark):
    """λ = Σnᵢ(nᵢ−1)/(N(N−1)) from the run-length fold; device half-up;
    N < 2 → nulls; all-same doc → λ = 1, gini = 0."""
    df = spark.createDataFrame(
        [("d1", "a b a c"), ("d2", "q q q"), ("d3", "x"), ("d4", "")],
        "doc_id string, text string",
    )
    got = {r.doc_id: r for r in tx.text_simpson_diversity(df).collect()}
    assert (got["d1"].n_tokens, got["d1"].n_equal_pairs) == (4, 1)
    assert got["d1"].simpson == 0.166667     # 2/12 half-up on the grid
    assert got["d1"].gini_simpson == 0.833333
    assert (got["d2"].n_equal_pairs, got["d2"].simpson, got["d2"].gini_simpson) == (3, 1.0, 0.0)
    assert got["d3"].simpson is None and got["d4"].simpson is None
    assert got["d3"].n_equal_pairs == 0 and got["d4"].n_tokens == 0


def test_trailing_vwap_hand_lines(spark):
    """vwap = Σ(price·qty)/Σqty over the trailing frame in exact cents."""
    import datetime

    rows = [
        (1, 1, 7, 2.0, 10.0, datetime.datetime(2024, 1, 1)),
        (2, 1, 7, 3.0, 20.0, datetime.datetime(2024, 1, 2)),
        (3, 1, 7, 5.0, 8.0, datetime.datetime(2024, 1, 3)),
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_suppkey long,"
        " l_quantity double, l_extendedprice double, l_shipdate timestamp",
    )
    got = {r.l_orderkey: r for r in wn.win_trailing_vwap(df).collect()}
    assert got[1].vwap == 10.0 and got[1].n_lines == 1
    assert got[2].vwap == 16.0                   # (1000·2+2000·3)/(100·5)
    assert got[3].vwap == round((1000 * 2 + 2000 * 3 + 800 * 5) / (100 * 10), 6) == 12.0


def test_interarrival_stats_hand_series(spark):
    """Exact µs gaps: mean on the device grid, min/max exact, sd from
    integer second moments; single-tick series emit no row."""
    rows = [(0, 1, "a", 0, 1.0), (1, 1, "a", 1_000_000, 1.0),
            (2, 1, "a", 4_000_000, 1.0), (3, 2, "a", 0, 1.0)]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts_us long, value double",
    )
    out = {(r.user_id, r.event_type): r for r in agg.agg_interarrival_stats(df).collect()}
    assert (1, "a") in out and (2, "a") not in out   # single tick → no gaps
    r = out[(1, "a")]
    assert r.n_gaps == 2 and r.mean_gap_s == 2.0
    assert (r.min_gap_s, r.max_gap_s) == (1.0, 3.0)
    assert r.sd_gap_s == round(math.sqrt(2e12) / 1e6, 6) == 1.414214


def test_degree_distribution_hand_graph(spark):
    """Distinct-neighbor degrees over the parity-namespaced trade graph,
    log2 buckets, split by side."""
    from kdb_spark.analytics import graph as gr

    orders = spark.createDataFrame(
        [(10, 1), (20, 2)], "o_orderkey long, o_custkey long"
    )
    li = spark.createDataFrame(
        [(10, 1), (10, 2), (10, 1), (20, 1)],  # dup (10,1) line must not double-count
        "l_orderkey long, l_suppkey long",
    )
    got = {(r.side, r.bucket): r for r in gr.degree_distribution(orders, li).collect()}
    # cust1(v2) trades with s1,s2 → deg 2 (bucket 1); cust2(v4) deg 1 (bucket 0)
    assert got[(0, 1)].n_vertices == 1 and got[(0, 1)].sum_deg == 2
    assert got[(0, 0)].n_vertices == 1 and got[(0, 0)].max_deg == 1
    # supp1(v3) trades with c1,c2 → deg 2; supp2(v5) deg 1
    assert got[(1, 1)].n_vertices == 1 and got[(1, 1)].min_deg == 2
    assert got[(1, 0)].n_vertices == 1 and got[(1, 0)].sum_deg == 1


def test_acf_table_hand_series(spark):
    """Linear series → r = 1 at every lag (affine invariance); alternating
    series → −1 at odd lags, +1 at even; lags with < min_n pairs drop."""
    rows = [(i, 1, "lin", i * 1000, float(i + 1)) for i in range(6)]
    rows += [(10 + i, 2, "alt", i * 1000, [1.0, 2.0][i % 2]) for i in range(8)]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts_us long, value double",
    )
    got = {(r.user_id, r.lag): r for r in agg.agg_acf_table(df).collect()}
    # linear series: 6 rows → lags 1..3 survive min_n=3 (4,5 have 2,1 pairs)
    assert {(u, l) for (u, l) in got if u == 1} == {(1, 1), (1, 2), (1, 3)}
    assert got[(1, 1)].ac == 1.0 and got[(1, 3)].ac == 1.0
    assert got[(1, 1)].n_pairs == 5 and got[(1, 3)].n_pairs == 3
    # alternating series: odd lags anti-correlated, even lags identical
    assert got[(2, 1)].ac == -1.0 and got[(2, 3)].ac == -1.0
    assert got[(2, 2)].ac == 1.0 and got[(2, 4)].ac == 1.0


def test_obv_hand_lines(spark):
    """Signed-quantity running sum: up-move adds q, down subtracts, flat
    and the sequence head add nothing."""
    import datetime

    rows = [
        (1, 1, 7, 5.0, 10.0, datetime.datetime(2024, 1, 1)),   # head → +0
        (2, 1, 7, 3.0, 12.0, datetime.datetime(2024, 1, 2)),   # up   → +3
        (3, 1, 7, 4.0, 12.0, datetime.datetime(2024, 1, 3)),   # flat → +0
        (4, 1, 7, 2.0, 9.0, datetime.datetime(2024, 1, 4)),    # down → −2
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_suppkey long,"
        " l_quantity double, l_extendedprice double, l_shipdate timestamp",
    )
    got = {r.l_orderkey: r.obv for r in wn.win_obv(df).collect()}
    assert got == {1: 0, 2: 3, 3: 3, 4: 1}


def test_rfm_segments_hand_orders(spark):
    """R from the fixed 2001-09-01 reference, F/M exact, log2 bands; one
    cell per distinct (R,F,M) band triple."""
    import datetime

    rows = [
        # cust 1: two orders, last 2001-08-31 → r_days=1 → band 0
        (1, 1, 10.0, datetime.datetime(2001, 8, 31)),
        (2, 1, 30.0, datetime.datetime(2001, 1, 1)),
        # cust 2: one order, last 2001-08-24 → r_days=8 → band 3
        (3, 2, 5000.0, datetime.datetime(2001, 8, 24)),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp"
    )
    got = {(r.r_band, r.f_band, r.m_band): r for r in agg.sql_rfm_segments(df).collect()}
    # cust 1: F=2 → band 1; M=4000c → 4000//100000=0 → band 0
    c1 = got[(0, 1, 0)]
    assert c1.n_customers == 1 and c1.revenue_c == 4000
    assert c1.min_r_days == c1.max_r_days == 1
    # cust 2: F=1 → band 0; M=500000c → //1e5=5 → bin(5)='101' → band 2
    c2 = got[(3, 0, 2)]
    assert c2.n_customers == 1 and c2.revenue_c == 500000
    assert c2.min_r_days == 8
    assert len(got) == 2


def test_round_number_bias_hand_cases(spark):
    """Divisibility counts on exact cents (sign-indifferent), device
    shares: 2.00 hits every band, 2.50 half/dime, −1.25 quarter, 3.17
    none."""
    vals = [2.0, 2.5, -1.25, 3.17]
    df = spark.createDataFrame(
        [(i, 1, "a", i * 1000, v) for i, v in enumerate(vals)],
        "event_id long, user_id long, event_type string, ts_us long, value double",
    )
    [r] = agg.agg_round_number_bias(df).collect()
    assert (r.n, r.n_whole, r.n_half, r.n_quarter, r.n_dime) == (4, 1, 2, 3, 2)
    assert r.whole_share == 0.25 and r.half_share == 0.5
    assert r.quarter_share == 0.75 and r.dime_share == 0.5


def test_williams_r_hand_series(spark):
    """%R = −100·(hi−c)/(hi−lo) over the trailing frame: flat channel →
    NULL, close at the high → 0.0 (no signed zero), midpoints exact."""
    rows = [
        (1, 1, "a", 1000, 1.00),   # hi=lo → null
        (2, 1, "a", 2000, 2.00),   # close at high → 0.0
        (3, 1, "a", 3000, 1.50),   # −100·50/100 = −50.0
        (4, 1, "a", 4000, 1.25),   # −100·75/100 = −75.0
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    got = {r.event_id: r.willr for r in wn.win_williams_r(df).collect()}
    assert got[1] is None
    assert got[2] == 0.0 and math.copysign(1.0, got[2]) == 1.0
    assert got[3] == -50.0 and got[4] == -75.0


def test_mfi_hand_lines(spark):
    """Money flow splits by price-delta sign (head and flat join neither
    side); MFI = 100·pmf/(pmf+nmf) on the device grid."""
    import datetime

    rows = [
        (1, 1, 7, 5.0, 10.0, datetime.datetime(2024, 1, 1)),  # head → no flow
        (2, 1, 7, 3.0, 12.0, datetime.datetime(2024, 1, 2)),  # up   → pf 3600
        (3, 1, 7, 4.0, 12.0, datetime.datetime(2024, 1, 3)),  # flat → no flow
        (4, 1, 7, 2.0, 9.0, datetime.datetime(2024, 1, 4)),   # down → nf 1800
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_suppkey long,"
        " l_quantity double, l_extendedprice double, l_shipdate timestamp",
    )
    got = {r.l_orderkey: r for r in wn.win_mfi(df).collect()}
    assert got[1].mfi is None and got[1].pmf_c == 0 and got[1].nmf_c == 0
    assert got[2].mfi == 100.0 and got[2].pmf_c == 3600
    assert got[3].mfi == 100.0
    # 100·3600/5400 = 66.666… → 66.666667 on the 6 dp grid
    assert got[4].mfi == 66.666667 and got[4].nmf_c == 1800


def test_spearman_hand_groups(spark):
    """Monotone ↑ → 1.0, monotone ↓ → −1.0; ties use average ranks
    (doubled to stay integer), pinned against the hand-computed Pearson
    on ranks."""
    # ts_us < DAY_US so y = ts_us directly
    rows = (
        [(i, 1, "up", i * 1000, float(i)) for i in range(1, 6)]
        + [(10 + i, 1, "down", i * 1000, float(10 - i)) for i in range(1, 6)]
        # x = [1,1,2] with y = [1000,2000,3000]: 2·avg-ranks x=(3,3,6),
        # y=(2,4,6) → rho = 6/√48 ≈ 0.8660 → 0.866 on the 1e-4 grid
        + [(20, 1, "tie", 1000, 1.0), (21, 1, "tie", 2000, 1.0), (22, 1, "tie", 3000, 2.0)]
    )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    got = {r.event_type: r for r in agg.agg_spearman(df).collect()}
    assert got["up"].spearman_rho == 1.0 and got["up"].n == 5
    assert got["down"].spearman_rho == -1.0
    assert got["tie"].spearman_rho == 0.866


def test_yule_k_hand_langs(spark):
    """K = 10⁴·(S₂−S₁)/S₁² on the exact frequency spectrum: repeated
    types raise K, an all-hapax corpus pins K = 0."""
    rows = [
        (1, "a a a b", "aa"),           # m: a=3,b=1 → S1=4, S2=10 → K=3750
        (2, "x y z", "bb"),             # all hapax → S2=S1 → K=0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.lang: r for r in tx.text_yule_k(df).collect()}
    assert got["aa"].n_types == 2 and got["aa"].n_tokens == 4 and got["aa"].s2 == 10
    assert got["aa"].yule_k == 3750.0
    assert got["bb"].yule_k == 0.0 and got["bb"].n_types == 3


def test_cci_hand_series(spark):
    """CCI = 1000·L·(c·L−S)/(15·Σ|cⱼ·L−S|) — flat frame → NULL, rising
    trend pins +100 region, reversal flips the sign."""
    rows = [
        (1, 1, "a", 1000, 1.00),   # L=1, dev=0 → NULL
        (2, 1, "a", 2000, 2.00),   # 200000/3000 = 66.666667
        (3, 1, "a", 3000, 3.00),   # 900000/9000 = 100.0
        (4, 1, "a", 4000, 1.00),   # reversal → −66.666667
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    got = {r.event_id: r.cci for r in wn.win_cci(df).collect()}
    assert got[1] is None
    assert got[2] == 66.666667 and got[3] == 100.0
    assert got[4] == -66.666667


def test_mann_whitney_hand_split(spark):
    """Perfect weekend/weekday separation: U_b = n_a·n_b (u2_b doubled),
    z = √3 on the hand-derived tie-free variance."""
    DAY = 86_400_000_000
    rows = (
        # epoch day 0 = Thursday → weekday sample a: values 1,2,3
        [(1, 1, "g", 0 * DAY + 1, 1.0), (2, 1, "g", 0 * DAY + 2, 2.0),
         (3, 1, "g", 0 * DAY + 3, 3.0)]
        # epoch day 2 = Saturday → weekend sample b: values 10,11
        + [(4, 1, "g", 2 * DAY + 1, 10.0), (5, 1, "g", 2 * DAY + 2, 11.0)]
    )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    [r] = agg.agg_mann_whitney(df).collect()
    assert (r.n_a, r.n_b) == (3, 2)
    # R2_b = 8+10 = 18; u2_b = 18 − 2·3 = 12 (U_b = 6 = n_a·n_b, max)
    assert r.u2_b == 12
    # z = (12−6)/(2·√(720/240)) = 3/√3 = √3 → 1.7321 on the 1e-4 grid
    assert r.z == 1.7321


def test_monthly_growth_hand_orders(spark):
    """MoM growth on exact cents: +50% then −50%; the first month and
    zero-prev months report NULL."""
    import datetime

    rows = [
        (1, 1, 100.0, datetime.datetime(1995, 1, 10)),
        (2, 1, 150.0, datetime.datetime(1995, 2, 10)),
        (3, 1, 75.0, datetime.datetime(1995, 3, 10)),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp"
    )
    got = {r.ym: r for r in agg.sql_monthly_growth(df).collect()}
    assert got[199501].mom_growth is None
    assert got[199502].mom_growth == 0.5 and got[199502].prev_c == 10000
    assert got[199503].mom_growth == -0.5


def test_jaccard_neighbors_hand_graph(spark):
    """J = common/(deg_a + deg_b − common) off the deduped incidence;
    pairs under min_shared drop."""
    import datetime
    from kdb_spark.analytics import graph as gr

    t0 = datetime.datetime(1995, 1, 1)
    orders = spark.createDataFrame(
        [(1, 1, 1.0, t0), (2, 2, 1.0, t0), (3, 3, 1.0, t0)],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp",
    )
    lines = [(1, p) for p in (1, 2, 3, 4)] + [(2, p) for p in (1, 2, 3, 5)] + [
        (3, p) for p in (1, 2)
    ]
    lineitem = spark.createDataFrame(lines, "l_orderkey long, l_partkey long")
    got = {(r.a, r.b): r for r in gr.co_purchase_jaccard(orders, lineitem).collect()}
    assert set(got) == {(1, 2)}  # cust 3 shares only 2 parts → dropped
    r = got[(1, 2)]
    assert (r.common, r.deg_a, r.deg_b) == (3, 4, 4)
    assert r.jaccard == 0.6


def test_since_event_hand_rows(spark):
    """Recency feature: NULL before the first purchase, 0 on purchase
    rows, exact µs gap after; running target count rides along."""
    rows = [
        (1, 1, "view", 1000, 1.0),
        (2, 1, "purchase", 2000, 1.0),
        (3, 1, "view", 3000, 1.0),
        (4, 1, "purchase", 5000, 1.0),
        (5, 1, "view", 6000, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    got = {r.event_id: r for r in wn.win_since_event(df).collect()}
    assert got[1].since_us is None and got[1].n_target_so_far == 0
    assert got[2].since_us == 0 and got[2].n_target_so_far == 1
    assert got[3].since_us == 1000
    assert got[4].since_us == 0 and got[4].n_target_so_far == 2
    assert got[5].since_us == 1000 and got[5].n_target_so_far == 2


def test_cohens_d_hand_split(spark):
    """Hand-derived pooled variance: SS_a = 20000, SS_b = 5000 on cents;
    d = 850/√(25000/3) on the 1e-4 grid; means exact."""
    DAY = 86_400_000_000
    rows = (
        [(1, 1, "g", 0 * DAY + 1, 1.0), (2, 1, "g", 0 * DAY + 2, 2.0),
         (3, 1, "g", 0 * DAY + 3, 3.0)]
        + [(4, 1, "g", 2 * DAY + 1, 10.0), (5, 1, "g", 2 * DAY + 2, 11.0)]
    )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    [r] = agg.agg_cohens_d(df).collect()
    assert (r.n_a, r.n_b) == (3, 2)
    assert r.mean_weekday == 2.0 and r.mean_weekend == 10.5
    expected = math.floor(5100.0 / (6 * math.sqrt(150000.0 / 18)) * 1e4 + 0.5) / 1e4
    assert r.cohens_d == expected


def test_cramers_v_hand_table(spark):
    """Perfect 2×2 association (types live on disjoint weekdays):
    chi² = n and V = 1.0; structural zero cells participate."""
    DAY = 86_400_000_000
    rows = [
        (1, 1, "A", 0 * DAY + 1, 1.0), (2, 1, "A", 0 * DAY + 2, 1.0),
        (3, 1, "B", 2 * DAY + 1, 1.0), (4, 1, "B", 2 * DAY + 2, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    [r] = agg.agg_cramers_v(df).collect()
    assert (r.n, r.n_rows, r.n_cols, r.dof) == (4, 2, 2, 1)
    assert r.chi2 == 4.0 and r.cramers_v == 1.0


def test_gopher_quality_hand_doc(spark):
    """Dup lines via sorted run-length fold, bullet/ellipsis via array
    filters, all ratios on the 6 dp device."""
    text = "a\nb\na\n- x\nok..."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    [r] = tx.text_gopher_quality(df).collect()
    assert r.n_lines == 5 and r.dup_lines == 2 and r.dup_chars == 2
    assert r.bullet_lines == 1 and r.ellipsis_lines == 1
    assert r.dup_line_ratio == 0.4 and r.dup_char_ratio == 0.181818
    assert r.bullet_ratio == 0.2 and r.ellipsis_ratio == 0.2


def test_vwap_dev_hand_lines(spark):
    """dev = (pc·dq − nq)/nq over the trailing-VWAP frame: 0 on a
    lone line, positive when printing rich, negative when cheap."""
    import datetime

    rows = [
        (1, 1, 7, 5.0, 10.0, datetime.datetime(2024, 1, 1)),
        (2, 1, 7, 3.0, 12.0, datetime.datetime(2024, 1, 2)),
        (3, 1, 7, 2.0, 9.0, datetime.datetime(2024, 1, 3)),
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_suppkey long,"
        " l_quantity double, l_extendedprice double, l_shipdate timestamp",
    )
    got = {r.l_orderkey: r.vwap_dev for r in wn.win_vwap_dev(df).collect()}
    assert got[1] == 0.0
    assert got[2] == 0.116279   # 1000/8600 on the 6 dp grid
    assert got[3] == -0.134615  # −1400/10400


def test_rolling_beta_hand_flows(spark):
    """Two users with hourly flows y = x/3 + const-free and y = 2x/3 −
    exact rational betas 1/3 and 2/3 at every frame length ≥ 2."""
    HOUR = 3_600_000_000
    rows = (
        [(1, 1, "a", h * HOUR + 1, float(v)) for h, v in ((0, 1), (1, 2), (2, 3))]
        + [(10 + h, 2, "a", h * HOUR + 2, float(v)) for h, v in ((0, 1), (1, 3), (2, 5))]
    )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    got = {(r.user_id, r.h): r for r in wn.win_rolling_beta(df).collect()}
    assert got[(1, 0)].beta is None and got[(1, 0)].l == 1
    assert got[(1, 1)].beta == 0.333333 and got[(1, 2)].beta == 0.333333
    assert got[(2, 2)].beta == 0.666667


def test_repeat_rate_hand_segments(spark):
    """Repeat share and orders-per-active per segment on exact counts."""
    import datetime

    t0 = datetime.datetime(1995, 1, 1)
    orders = spark.createDataFrame(
        [(1, 1, 1.0, t0), (2, 1, 1.0, t0), (3, 2, 1.0, t0), (4, 3, 1.0, t0)],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp",
    )
    customer = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B")], "c_custkey long, c_mktsegment string"
    )
    got = {r.segment: r for r in agg.sql_repeat_rate(orders, customer).collect()}
    a, b = got["A"], got["B"]
    assert (a.n_active, a.n_repeat, a.n_orders) == (2, 1, 3)
    assert a.repeat_share == 0.5 and a.orders_per_active == 1.5
    assert b.repeat_share == 0.0 and b.orders_per_active == 1.0


def test_atr_hand_candles(spark):
    """TR seeds with h−l on the first candle, then Wilder's
    max(h−l, |h−pc|, |l−pc|); ATR is the exact frame mean in dollars."""
    HOUR = 3_600_000_000
    rows = [
        (1, 1, "a", 0 * HOUR + 1, 1.00),
        (2, 1, "a", 0 * HOUR + 2, 3.00),
        (3, 1, "a", 0 * HOUR + 3, 2.00),   # hour-0 candle: h=300 l=100 c=200
        (4, 1, "a", 1 * HOUR + 1, 2.50),   # hour-1: flat candle, pc=200 → TR=50
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    got = {r.hour_us: r for r in wn.win_atr(df).collect()}
    assert got[0].tr == 2.0 and got[0].atr == 2.0
    assert got[1 * HOUR].tr == 0.5 and got[1 * HOUR].atr == 1.25


def test_var_es_hand_tail(spark):
    """k = ⌈0.95·n⌉ exact order-statistic pick; ES is the exact tail
    mean (n=20 → ranks 19,20)."""
    rows = [(i, 1, "a", i * 1000, float(i)) for i in range(1, 21)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    [r] = agg.agg_var_es(df).collect()
    assert (r.n, r.tail_n) == (20, 2)
    assert r.var_usd == 19.0 and r.es_usd == 19.5


def test_swing_points_hand_series(spark):
    """Centered-frame fractals: only full ±k frames flag; the peak at
    index 2 is a swing high, the trough at index 6 a swing low."""
    vals = [1.0, 2.0, 5.0, 2.0, 1.0, 2.0, 0.0, 2.0, 3.0]
    rows = [(i, 1, "a", i * 1000, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    got = {r.event_id: r for r in wn.win_swing_points(df).collect()}
    assert got[2].swing_high and not got[2].swing_low
    assert got[6].swing_low and not got[6].swing_high
    # boundary rows (short frames) never flag even when extreme
    assert not got[0].swing_high and not got[0].swing_low
    assert not got[8].swing_high
    # index 5 (value 2.0) TIES the frame max of [2,1,2,0,2] — the
    # inclusive-tie convention flags plateaus
    assert got[5].swing_high
    assert not any(got[i].swing_high for i in (1, 3, 4, 7))


def test_dataset_card_hand_sources(spark):
    """Exact per-source counts with device shares/means."""
    rows = [
        (1, "one two three", "en", "web"),
        (2, "uno dos", "es", "web"),
        (3, " ".join(["w"] * 60), "en", "book"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = {r.source: r for r in cu.curation_dataset_card(df).collect()}
    w = got["web"]
    assert (w.n_docs, w.n_tokens, w.n_langs) == (2, 5, 2)
    assert w.en_share == 0.5 and w.short_share == 1.0 and w.mean_tokens == 2.5
    b = got["book"]
    assert b.n_tokens == 60 and b.short_share == 0.0 and b.en_share == 1.0


def test_langid_eval_hand_docs(spark):
    """Integer-exact threshold replay: stopword-heavy en doc predicts en,
    stopword-free docs predict unk; shares per label row."""
    rows = [
        (1, "the cat of the house is the best", "en", "w"),
        (2, "zebra quagga pangolin", "en", "w"),
        (3, "zorro rapido", "es", "w"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = {(r.lang, r.pred): r for r in tx.text_langid_eval(df).collect()}
    assert got[("en", "en")].n == 1 and got[("en", "en")].share == 0.5
    assert got[("en", "unk")].n == 1 and got[("en", "unk")].label_total == 2
    assert got[("es", "unk")].share == 1.0


def test_modality_census_hand_rows(spark):
    """Exact byte totals, label cardinality, and the dim invariant."""
    from kdb_spark.llm import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "abcd", "en", "w", 4), (2, "xy", "en", "w", 2)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    embs = spark.createDataFrame(
        [(1, [1.0, 0.0], 7), (2, [0.0, 1.0], 8)],
        "vec_id long, embedding array<float>, label int",
    )
    [r] = mm.mm_modality_census(docs, embs).collect()
    assert (r.lang, r.source, r.n_rows) == ("en", "w", 2)
    assert r.total_bytes == 6 and r.mean_bytes == 3.0
    assert r.n_labels == 2 and r.min_dim == r.max_dim == 2


def test_scalar_hash_known_digests(spark):
    """Pinned digests for a known string — the portability contract."""
    from kdb_spark.analytics import scalars as sc

    df = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    [r] = sc.scalar_hash(df).collect()
    assert r.h_md5 == "5d41402abc4b2a76b9719d911017c592"
    assert r.h_sha256 == (
        "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824"
    )
    assert r.h_slot == 419982666956583591  # int('5d41402abc4b2a7', 16)


def test_lead_time_hand_orders(spark):
    """Exact day arithmetic, p95 order statistic, late share device."""
    import datetime

    orders = spark.createDataFrame(
        [(1, 1, 1.0, datetime.datetime(1995, 1, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp, o_orderpriority string",
    )
    lines = [
        (1, i, datetime.datetime(1995, 1, 1) + datetime.timedelta(days=d))
        for i, d in enumerate([10, 20, 30, 40, 100])
    ]
    lineitem = spark.createDataFrame(
        lines, "l_orderkey long, l_linenumber int, l_shipdate timestamp"
    )
    [r] = agg.sql_lead_time(orders, lineitem).collect()
    # n=5 → k = ceil(4.75) = 5 → p95 = the max (100); mean = 40; late 1/5
    assert (r.n, r.p95_days) == (5, 100)
    assert r.mean_days == 40.0 and r.late_share == 0.2


def test_join_pit_version_selection(spark):
    """A fact must see exactly the dimension version valid at its
    instant: before/inside/after a closed range, and never a future
    version; keyless facts drop."""
    hist = spark.createDataFrame(
        [
            (1, "A", 0, 10),      # closed version [0, 10)
            (1, "B", 10, None),   # open from 10
            (2, "C", 5, None),    # key appears at 5
        ],
        "k long, seg string, valid_from long, valid_to long",
    )
    facts = spark.createDataFrame(
        [(100, 1, 0), (101, 1, 9), (102, 1, 10), (103, 2, 3), (104, 3, 7)],
        "fid long, k long, ts long",
    )
    got = {r.fid: r.seg for r in jn.join_pit(facts, hist, "k", "ts").collect()}
    assert got == {100: "A", 101: "A", 102: "B"}  # 103 pre-birth, 104 keyless


def test_ltv_deciles_hand_customers(spark):
    """Explicit (rn−1)·10 div n decile cut with exact shares."""
    import datetime

    t0 = datetime.datetime(1995, 1, 1)
    # 10 customers with LTV 1..10 dollars → one per decile, desc order
    rows = [(i, i, float(i), t0) for i in range(1, 11)]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp"
    )
    got = {r.decile: r for r in agg.sql_ltv_deciles(df).collect()}
    assert len(got) == 10 and all(got[i].n_customers == 1 for i in range(10))
    assert got[0].ltv_c == 1000   # top decile = richest customer ($10)
    assert got[0].ltv_share == round(1000 / 5500, 6)
    assert got[9].ltv_c == 100


def test_dpo_hand_series(spark):
    """Displaced-frame SMA: NULL at heads (empty displaced frame), exact
    device value once the frame has rows."""
    # period=20 → frame [-30, -11]: first 11 rows have empty frames
    vals = [float(i) for i in range(1, 15)]
    rows = [(i, 1, "a", i * 1000, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    got = {r.event_id: r.dpo for r in wn.win_dpo(df).collect()}
    assert all(got[i] is None for i in range(11))
    # row 11 (value 12.0): frame = rows 0..0 → SMA = 1.0 → DPO = 11.0
    assert got[11] == 11.0
    # row 13 (value 14.0): frame = rows 0..2 → SMA = 2.0 → DPO = 12.0
    assert got[13] == 12.0


def test_relative_volume_hand_lines(spark):
    """rvol = q·L/Σq over the prior-print frame: heads NULL, exact
    ratios after."""
    import datetime

    rows = [
        (i, 1, 7, float(q), 10.0, datetime.datetime(2024, 1, 1 + i))
        for i, q in enumerate([10, 20, 30])
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_suppkey long,"
        " l_quantity double, l_extendedprice double, l_shipdate timestamp",
    )
    got = {r.l_orderkey: r.rvol for r in wn.win_relative_volume(df).collect()}
    assert got[0] is None
    assert got[1] == 2.0           # 20·1/10
    assert got[2] == 2.0           # 30·2/30


def test_winsorized_hand_values(spark):
    """n=20, p=5 → cut 1 each side: trimmed mean over ranks 2..19,
    winsorized replaces the extremes with the cut values."""
    vals = [float(v) for v in list(range(1, 20)) + [1000]]  # outlier at top
    rows = [(i, 1, "a", i * 1000, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    [r] = agg.agg_winsorized(df).collect()
    assert (r.n, r.n_cut) == (20, 1)
    assert r.mean == round((sum(range(1, 20)) + 1000) / 20, 6)
    assert r.trimmed_mean == round(sum(range(2, 20)) / 18, 6)
    # standard clamps: the low tail (value 1) clamps to x@rn2 = 2, the
    # outlier (1000) clamps to x@rn19 = 19 → (2 + Σ2..19 + 19)/20 = 10.5
    assert r.winsorized_mean == 10.5


def test_iqr_fence_hand_values(spark):
    """Exact quartile picks and integer fences; the planted outlier is
    the only row outside."""
    vals = [float(v) for v in list(range(1, 12)) + [100]]  # n=12
    rows = [(i, 1, "a", i * 1000, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    [r] = agg.agg_iqr_fence(df).collect()
    # k1 = ceil(3) = 3 → q1 = 3; k3 = ceil(9) = 9 → q3 = 9; IQR = 6
    assert r.q1 == 3.0 and r.q3 == 9.0
    assert r.lo_fence == -6.0 and r.hi_fence == 18.0
    assert r.n_outliers == 1 and r.outlier_share == round(1 / 12, 6)


def test_roll_spread_hand_bounce(spark):
    """A perfect ±1-tick bounce has delta pairs (a,b) = (±2σ alternating)
    → negative autocovariance → spread = 2√(−cov)."""
    # prices 10, 11, 10, 11, 10 → deltas +100,−100,+100,−100 (cents)
    vals = [10.0, 11.0, 10.0, 11.0, 10.0]
    rows = [(i, 1, "a", i * 1000, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    [r] = agg.agg_roll_spread(df).collect()
    # pairs: (−100,100),(100,−100),(−100,100) → n=3, Σa=−100, Σb=100,
    # Σab = −30000; cm = 3·(−30000) − (−100·100) = −80000
    assert r.n == 3
    assert r.delta_autocov_c2 == round(-80000 / 6, 4)
    expected = math.floor(2 * math.sqrt(80000 / 6) / 100 * 1e4 + 0.5) / 1e4
    assert r.roll_spread_usd == expected


def test_amihud_hand_prints(spark):
    """Per-print grid integers, then the device mean of grids."""
    import datetime

    rows = [
        (1, 1, 7, 10.0, 10.0, datetime.datetime(2024, 1, 1)),
        (2, 1, 7, 10.0, 11.0, datetime.datetime(2024, 1, 2)),  # |dp|=100
        (3, 1, 7, 20.0, 11.0, datetime.datetime(2024, 1, 3)),  # |dp|=0
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_suppkey long,"
        " l_quantity double, l_extendedprice double, l_shipdate timestamp",
    )
    [r] = agg.agg_amihud(df).collect()
    assert r.n_prints == 2
    # print 2: 1e8·100/(1000·1100·10) = 10^10/1.1e7 → grid int of
    # round(909.0909…, 6)·1e6; print 3: 0 → mean of the two grids
    g2 = (2 * 10**6 * 10**8 * 100 + 1000 * 1100 * 10) // (2 * 1000 * 1100 * 10)
    want = ((2 * (g2 + 0) + 2) // 4) / 1e6
    assert r.amihud_pm == want


def test_burstiness_hand_cadence(spark):
    """A metronome (constant gaps) pins B = −1; an uneven cadence lands
    on the hand-derived grid value."""
    rows = (
        [(i, 1, "tick", i * 1000, 1.0) for i in range(5)]        # gaps 1000×4
        + [(10 + i, 1, "burst", t, 1.0) for i, t in enumerate([0, 100, 200, 10000])]
    )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    got = {r.event_type: r for r in agg.agg_burstiness(df).collect()}
    assert got["tick"].burstiness == -1.0
    g = [100, 100, 9800]
    n, sg, sgg = 3, sum(g), sum(x * x for x in g)
    vnum = n * sgg - sg * sg
    s = math.sqrt(vnum / (n * (n - 1)))
    m = sg / n
    assert got["burst"].burstiness == math.floor((s - m) / (s + m) * 1e4 + 0.5) / 1e4


def test_readability_hand_doc(spark):
    """Exact rational Flesch: counts pinned by hand, device at 4 dp."""
    text = "The cat sat. It sat there!"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    [r] = tx.text_readability(df).collect()
    # tokens: the,cat,sat,it,sat,there → w=6; sentences: 2
    # syllables: the(1) cat(1) sat(1) it(1) sat(1) there(2 groups: e,e) = 7
    assert (r.n_words, r.n_sentences, r.n_syllables) == (6, 2, 7)
    num = 206835 * 2 * 6 - 1015 * 36 - 84600 * 7 * 2
    den = 1000 * 2 * 6
    grid = (2 * 10**4 * abs(num) + den) // (2 * den)
    want = (1 if num >= 0 else -1) * grid / 1e4
    assert r.flesch == want


def test_interval_overlap_hand_ranges(spark):
    """Blocking must not change semantics: overlaps found across bucket
    boundaries, non-overlaps dropped, exact overlap lengths, no
    duplicate pairs from multi-bucket intervals."""
    DAY = 86_400_000_000
    a = spark.createDataFrame(
        [
            (1, 0, 3 * DAY),                 # spans 3 buckets
            (2, 10, 20),                     # tiny, bucket 0
            (3, 5 * DAY, 6 * DAY),           # disjoint from every b
        ],
        "a_id long, a_start long, a_end long",
    )
    b = spark.createDataFrame(
        [
            (100, 2 * DAY + 5, 2 * DAY + 105),  # inside a1's third day
            (101, 15, 30),                      # clips a2's tail
        ],
        "b_id long, b_start long, b_end long",
    )
    got = {(r.a_id, r.b_id): r.overlap_us
           for r in jn.join_interval_overlap(a, b).collect()}
    assert got == {(1, 100): 100, (1, 101): 15, (2, 101): 5}


def test_interval_overlap_degenerate_intervals_dropped(spark):
    """Half-open empty sets never match (r12 ADVICE): a zero-length
    interval strictly inside a partner emits nothing (∅ ∩ X = ∅), and a
    reversed interval neither explodes a descending bucket sequence nor
    produces candidates."""
    DAY = 86_400_000_000
    a = spark.createDataFrame(
        [
            (1, 50, 50),             # zero-length, strictly inside b100
            (2, 3 * DAY, 0),         # reversed: would be a descending sequence
            (3, 10, 60),             # sane control
        ],
        "a_id long, a_start long, a_end long",
    )
    b = spark.createDataFrame(
        [(100, 0, 100)], "b_id long, b_start long, b_end long"
    )
    got = {(r.a_id, r.b_id): r.overlap_us
           for r in jn.join_interval_overlap(a, b).collect()}
    assert got == {(3, 100): 50}


def test_cohort_retention_hand_orders(spark):
    """Integer month ages, exact revenue, share of the cohort's age-0
    cell."""
    import datetime

    rows = [
        (1, 1, 100.0, datetime.datetime(1995, 1, 5)),   # cohort Jan-95, age 0
        (2, 1, 50.0, datetime.datetime(1995, 3, 5)),    # age 2
        (3, 2, 10.0, datetime.datetime(1995, 3, 1)),    # cohort Mar-95, age 0
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp"
    )
    got = {(r.cohort, r.age): r for r in agg.sql_cohort_retention(df).collect()}
    jan = 1995 * 12 + 1
    mar = 1995 * 12 + 3
    assert got[(jan, 0)].revenue_retention == 1.0
    assert got[(jan, 2)].revenue_c == 5000
    assert got[(jan, 2)].revenue_retention == 0.5
    assert got[(mar, 0)].revenue_retention == 1.0 and len(got) == 3


def test_downside_risk_hand_deltas(spark):
    """Only negative deltas enter the second moment; semidev uses the
    ALL-delta denominator (Sortino convention)."""
    vals = [10.0, 12.0, 11.0, 11.0, 9.0]  # deltas +200, −100, 0, −200
    rows = [(i, 1, "a", i * 1000, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    [r] = agg.agg_downside_risk(df).collect()
    assert (r.n, r.n_down) == (4, 2)
    want = math.floor(math.sqrt((100**2 + 200**2) / 4) / 100 * 1e4 + 0.5) / 1e4
    assert r.semidev_usd == want and r.down_share == 0.5


def test_underwater_hand_spells(spark):
    """Spells segment on the below-running-high flag: lengths and the
    device mean."""
    vals = [10.0, 9.0, 9.5, 10.0, 11.0, 10.5, 11.0, 12.0]
    # running max: 10,10,10,10,11,11,11,12 → uw: F,T,T,F? (10<10 F) ...
    rows = [(i, 1, "a", i * 1000, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    [r] = agg.agg_underwater(df).collect()
    # spells: [9.0, 9.5] (len 2), [10.5] (len 1) — 10.0@i3 equals the max
    assert (r.n_spells, r.max_spell) == (2, 2)
    assert r.mean_spell == 1.5


def test_code_ratio_hand_doc(spark):
    """Indent/brace/semicolon/assignment lines flag; prose does not."""
    text = "def f():\n    return 1;\nThis is prose. Yes.\nx = 2\n}"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    [r] = tx.text_code_ratio(df).collect()
    # lines: 'def f():'(no), '    return 1;'(indent), prose(no),
    # 'x = 2'(assign), '}'(brace) → 3/5
    assert (r.n_lines, r.code_lines) == (5, 3)
    assert r.code_line_ratio == 0.6


def test_abc_parts_hand_revenue(spark):
    """Integer cumulative-share predicate: revenues 80/15/5 split exactly
    into A/B/C at the 80/95 cuts (boundary INCLUSIVE via 100·cum ≤
    80·total)."""
    lines = [(1, 1, 80.0), (1, 2, 15.0), (1, 3, 5.0)]
    lineitem = spark.createDataFrame(
        lines, "l_orderkey long, l_partkey long, l_extendedprice double"
    )
    got = {r.abc: r for r in agg.sql_abc_parts(lineitem).collect()}
    assert got["A"].n_parts == 1 and got["A"].class_c == 8000
    assert got["A"].revenue_share == 0.8
    assert got["B"].n_parts == 1 and got["C"].n_parts == 1


def test_activity_heatmap_hand_cells(spark):
    """dow/hod integer coordinates and day-shares."""
    DAY = 86_400_000_000
    HOUR = 3_600_000_000
    rows = [
        (1, 1, "a", 0 * DAY + 0 * HOUR + 5, 1.0),   # Thu 00
        (2, 1, "a", 0 * DAY + 0 * HOUR + 6, 1.0),   # Thu 00
        (3, 1, "a", 0 * DAY + 5 * HOUR + 5, 2.0),   # Thu 05
        (4, 1, "a", 2 * DAY + 1 * HOUR + 5, 3.0),   # Sat 01
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    got = {(r.dow, r.hod): r for r in agg.agg_activity_heatmap(df).collect()}
    assert got[(0, 0)].n == 2 and got[(0, 0)].day_share == round(2 / 3, 6)
    assert got[(0, 5)].sum_c == 200
    assert got[(2, 1)].day_share == 1.0 and len(got) == 3


def test_trailing_twap_hand_ticks(spark):
    """In-force µs weights: a price held 3× as long weighs 3×; the
    newest tick carries zero weight; single-tick frames NULL."""
    rows = [
        (1, 1, "a", 0, 10.0),      # in force 3000 µs
        (2, 1, "a", 3000, 20.0),   # in force 1000 µs
        (3, 1, "a", 4000, 99.0),   # newest: zero weight
        (9, 2, "a", 0, 5.0),       # lone tick: zero in-force time → NULL
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    got = {r.event_id: r.twap for r in wn.win_trailing_twap(df).collect()}
    assert got[1] == 10.0                       # its own in-force weight
    # rows 1-2: (1000·3000 + 2000·1000)/(100·4000) = 12.5
    assert got[2] == 12.5
    assert got[3] == 12.5                       # newest tick adds no weight
    assert got[9] is None


def test_gap_histogram_hand_buckets(spark):
    """Bit-math ms buckets with the sub-ms sentinel; device type-shares."""
    rows = [
        (1, 1, "a", 0, 1.0),
        (2, 1, "a", 500, 1.0),          # gap 500 µs → sentinel −1
        (3, 1, "a", 1_500_000 + 500, 1.0),  # gap 1.5e6 µs = 1500 ms → bucket 10
        (4, 1, "a", 1_500_000 + 3500, 1.0),  # gap 3000 µs = 3 ms → bucket 1
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    got = {r.bucket: r for r in agg.agg_gap_histogram(df).collect()}
    assert got[-1].n == 1 and got[-1].min_gap_us == 500
    assert got[10].n == 1          # 1500 ms → bin length 11 − 1
    assert got[1].n == 1           # 3 ms → '11' → 1
    assert got[-1].share == round(1 / 3, 6)


def test_record_stats_hand_tape(spark):
    """Records are STRICT new highs vs the prior running max; stale =
    zero delta; series heads excluded from both."""
    vals = [10.0, 12.0, 12.0, 11.0, 13.0]
    # priors:   —    10    12    12    12
    # record:        yes   no    no    yes   → 2
    # stale:         no    yes   no    no    → 1
    rows = [(i, 1, "a", i * 1000, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    [r] = agg.agg_record_stats(df).collect()
    assert (r.n, r.n_records, r.n_stale) == (4, 2, 1)
    assert r.record_share == 0.5 and r.stale_share == 0.25


def test_seasonal_index_hand_months(spark):
    """Means of means cleared exactly: Jan (two years, avg 150) vs Feb
    (one year, 100): overall monthly mean = 400/3."""
    import datetime

    rows = [
        (1, 1, 100.0, datetime.datetime(1995, 1, 5)),
        (2, 1, 200.0, datetime.datetime(1996, 1, 5)),
        (3, 1, 100.0, datetime.datetime(1995, 2, 5)),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp"
    )
    got = {r.m: r for r in agg.sql_seasonal_index(df).collect()}
    assert got[1].n_m == 2 and got[1].mean_month_usd == 150.0
    # index_jan = (30000/2)/(40000/3) = 45000/40000 = 1.125
    assert got[1].seasonal_index == 1.125
    assert got[2].seasonal_index == 0.75


def test_vol_regime_hand_series(spark):
    """Quiet-then-burst tape: ratio ≈ 1 in steady state, > 1 the moment
    the short window absorbs the burst; exact grid pinned by brute."""
    vals = [10.0 + 0.01 * (i % 2) for i in range(40)] + [10.0, 15.0, 5.0, 15.0]
    rows = [(i, 1, "a", i * 1000, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    got = {r.event_id: r.vol_ratio for r in wn.win_vol_regime(df).collect()}
    cs = [round(v * 100) for v in vals]
    ds = [None] + [cs[i] - cs[i - 1] for i in range(1, len(cs))]
    def brute(i):
        fs = [d for d in ds[max(0, i - 7): i + 1] if d is not None]
        fl = [d for d in ds[max(0, i - 31): i + 1] if d is not None]
        if len(fs) < 2 or len(fl) < 2:
            return None
        vs = len(fs) * sum(d * d for d in fs) - sum(fs) ** 2
        vl = len(fl) * sum(d * d for d in fl) - sum(fl) ** 2
        if vl <= 0 or vs < 0:
            return None
        x = math.sqrt((vs * len(fl) ** 2) / (vl * len(fs) ** 2))
        return math.floor(x * 1e4 + 0.5) / 1e4
    for i in (20, 35, 43):
        assert got[i] == brute(i), i
    assert got[43] > 1.5  # burst regime detected


def test_user_churn_hand_days(spark):
    """Retained/new/churned by adjacent-day set difference; days with no
    prior actives emit nothing."""
    DAY = 86_400_000_000
    rows = [
        (1, 1, "a", 0 * DAY + 1, 1.0), (2, 2, "a", 0 * DAY + 2, 1.0),
        (3, 1, "a", 1 * DAY + 1, 1.0), (4, 3, "a", 1 * DAY + 2, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long, value double"
    )
    got = {r.day: r for r in agg.agg_user_churn(df).collect()}
    # day 0 has no prior (absent); day 2 DOES report — everyone churned
    assert set(got) == {1, 2}
    r = got[1]
    assert (r.retained, r.new_users, r.churned, r.prev_active) == (1, 1, 1, 2)
    assert r.retention_rate == 0.5 and r.churn_rate == 0.5
    r2 = got[2]
    assert (r2.retained, r2.churned) == (0, 2) and r2.churn_rate == 1.0


def test_discount_bands_hand_lines(spark):
    """Integer percent bands, exact sums, device mean quantity."""
    rows = [(1, 0.05, 100.0, 10.0), (2, 0.05, 200.0, 20.0), (3, 0.0, 50.0, 5.0)]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_discount double, l_extendedprice double, l_quantity double"
    )
    got = {r.disc_pct: r for r in agg.sql_discount_bands(df).collect()}
    assert got[5].n == 2 and got[5].revenue_c == 30000
    assert got[5].mean_qty == 15.0 and got[0].mean_qty == 5.0


# ------------------------------------------------------------- round 13 ops


def test_anchored_vwap_resets_at_month(spark):
    """The expanding average restarts at each calendar month: the first
    line of February ignores January entirely; within a month the fold
    is the exact Σ(pc·q)/Σq."""
    import datetime

    def d(m, day):
        return datetime.datetime(1995, m, day)

    li = spark.createDataFrame(
        [
            (1, 1, 7, 10.0, 2.0, d(1, 5)),   # jan: vwap = 10
            (2, 1, 7, 20.0, 2.0, d(1, 9)),   # jan: (20+40)/4 = 15
            (3, 1, 7, 99.0, 1.0, d(2, 1)),   # feb: reset → 99
        ],
        "l_orderkey long, l_linenumber long, l_suppkey long,"
        "l_extendedprice double, l_quantity double, l_shipdate timestamp",
    )
    got = {r.l_orderkey: r for r in wn.win_anchored_vwap(li).collect()}
    assert got[1].avwap == 10.0 and got[1].n_since_anchor == 1
    assert got[2].avwap == 15.0 and got[2].n_since_anchor == 2
    assert got[3].avwap == 99.0 and got[3].n_since_anchor == 1
    assert got[3].anchor_m == got[1].anchor_m + 1


def test_gap_open_first_day_null_and_skipped_days(spark):
    """gap = today's open − previous TRADED day's close (calendar holes
    bridge to the last traded day); the series head surfaces null."""
    DAY = 86_400_000_000
    rows = [
        (1, 1, "a", 10.0, 0 * DAY + 5),
        (2, 1, "a", 12.0, 0 * DAY + 9),        # day 0: open 10, close 12
        (3, 1, "a", 11.5, 3 * DAY + 1),        # day 3: open 11.5 → gap -0.5
    ]
    got = {r.day: r for r in wn.win_gap_open(_events(spark, rows)).collect()}
    assert got[0].open_c == 1000 and got[0].close_c == 1200
    assert got[0].gap_c is None
    assert got[3].gap_c == 1150 - 1200


def test_plateau_runs_and_positions(spark):
    """Equal-cents runs: run ids increment on change, positions restart,
    max_run tracks the longest run seen so far."""
    rows = [
        (1, 1, "a", 5.0, 100),
        (2, 1, "a", 5.0, 200),
        (3, 1, "a", 5.0, 300),   # run 1, len 3
        (4, 1, "a", 6.0, 400),   # run 2, len 1
        (5, 1, "a", 5.0, 500),   # run 3 (value returns → NEW run)
    ]
    got = {r.event_id: r for r in wn.win_plateau(_events(spark, rows)).collect()}
    assert [got[i].run_id for i in (1, 2, 3, 4, 5)] == [1, 1, 1, 2, 3]
    assert [got[i].run_pos for i in (1, 2, 3, 4, 5)] == [1, 2, 3, 1, 1]
    assert got[5].max_run == 3


def test_bowley_skew_hand_quartiles(spark):
    """n=4: ranks ⌈n/4⌉=1, ⌈n/2⌉=2, ⌈3n/4⌉=3; skew is the exact device
    ratio; zero-IQR groups surface null."""
    rows = [(i, 1, "a", v, i * 100) for i, v in enumerate([1.0, 2.0, 4.0, 9.0], 1)]
    rows += [(10 + i, 1, "b", 5.0, i * 100) for i in range(3)]
    got = {r.event_type: r for r in agg.agg_bowley_skew(_events(spark, rows)).collect()}
    a = got["a"]
    assert (a.q1_c, a.q2_c, a.q3_c) == (100, 200, 400)
    # (400 + 100 - 2*200) / (400 - 100) = 100/300 → 0.333333
    assert a.bowley_skew == 0.333333
    assert got["b"].bowley_skew is None


def test_quantile_drift_hand_halves(spark):
    """Exact per-half medians and the cent drift; a type with one half
    only surfaces null drifts."""
    rows = [(i, 1, "a", float(i), i * 10) for i in range(1, 5)]          # before
    rows += [(10 + i, 1, "a", float(i + 2), 1000 + i * 10) for i in range(1, 5)]
    rows += [(100, 1, "c", 7.0, 5)]                                      # before only
    got = {r.event_type: r
           for r in agg.agg_quantile_drift(_events(spark, rows), 1000).collect()}
    a = got["a"]
    assert (a.n_before, a.n_after) == (4, 4)
    assert a.p50_drift_c == 200 and a.p90_drift_c == 200
    c = got["c"]
    assert c.n_after is None and c.p50_drift_c is None


def test_flow_imbalance_signs_and_head_exclusion(spark):
    """Series heads have no delta and are excluded; up/down/flat map to
    +1/−1/0; ratio is the signed device."""
    HOUR = 3_600_000_000
    rows = [
        (1, 1, "a", 10.0, 100),
        (2, 1, "a", 11.0, 200),          # +1
        (3, 1, "a", 11.0, 300),          # 0
        (4, 1, "a", 9.0, 400),           # -1
        (5, 2, "a", 5.0, HOUR + 100),    # head of user 2 (hour 1): excluded
        (6, 2, "a", 6.0, HOUR + 200),    # +1
    ]
    got = {r.hour: r for r in agg.agg_flow_imbalance(_events(spark, rows)).collect()}
    assert got[0].n_ticks == 3 and got[0].imbalance == 0 and got[0].flow_ratio == 0.0
    assert got[1].n_ticks == 1 and got[1].imbalance == 1 and got[1].flow_ratio == 1.0


def test_char_classes_hand_doc_and_empty(spark):
    """Known mix counts exactly; the empty document surfaces null shares."""
    docs = spark.createDataFrame(
        [(1, "Ab1 2?\n", "en", "s", 7), (2, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.doc_id: r for r in tx.text_char_classes(docs).collect()}
    r = got[1]
    assert (r.n_chars, r.n_alpha, r.n_digit, r.n_space, r.n_other) == (7, 2, 2, 2, 1)
    assert r.alpha_share == 0.285714
    e = got[2]
    assert e.n_chars == 0 and e.alpha_share is None


def test_bfs_levels_hand_graph(spark):
    """Min-hop levels with the depth cap: seed at 0, chain at 1/2/3,
    beyond-depth and disconnected vertices absent, isolated seed at 0,
    and a vertex reachable two ways keeps the SHORTER path."""
    from kdb_spark.analytics import graph as gr
    from kdb_spark.llm.dedup import _REUSE_CACHE

    _REUSE_CACHE.pop("bfs_edges", None)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4), (8, 9)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(1,), (7,)], "v long")
    got = {r.v: r.lvl for r in gr.bfs_levels(edges, seeds, max_depth=3).collect()}
    # 4 is reachable in 3 hops via the chain but in 1 via (1,4) — min wins
    assert got == {1: 0, 7: 0, 2: 1, 4: 1, 3: 2, 5: 2}
    _REUSE_CACHE.pop("bfs_edges", None)


def test_emb_label_drift_hand_vectors(spark):
    """Hand centroids: label 0 halves differ by (0.5, 0) → drift 0.5;
    label 1 has no odd half → null drift with the counts exposing why."""
    rows = [
        (0, [1.0, 2.0], 0),   # even
        (2, [2.0, 2.0], 0),   # even → even centroid (1.5, 2)
        (1, [1.0, 2.0], 0),   # odd  → odd centroid (1, 2)
        (4, [9.0, 9.0], 1),   # even only
    ]
    from kdb_spark.llm import similarity as sim

    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r.label: r for r in sim.emb_label_drift(emb).collect()}
    assert got[0].centroid_l2_drift == 0.5
    assert got[0].n_even == 2 and got[0].n_odd == 1 and got[0].d == 2
    assert got[1].centroid_l2_drift is None and got[1].n_odd is None


def test_seasonal_naive_consecutive_day_guard(spark):
    """The reference is yesterday's SAME-hour slot only when yesterday
    traded that slot — a calendar hole yields null, never a stale
    comparison; multi-tick slot-days collapse to the LAST tick."""
    DAY = 86_400_000_000
    HOUR = 3_600_000_000
    rows = [
        (1, 1, "a", 10.0, 0 * DAY + 2 * HOUR),
        (2, 1, "a", 10.5, 0 * DAY + 2 * HOUR + 5),  # same slot, later → ref
        (3, 1, "a", 12.0, 1 * DAY + 2 * HOUR),      # err = 12 - 10.5
        (4, 1, "a", 13.0, 3 * DAY + 2 * HOUR),      # hole (day 2) → null
    ]
    got = {(r.day, r.hod): r
           for r in wn.win_seasonal_naive(_events(spark, rows)).collect()}
    assert got[(0, 2)].n == 2 and got[(0, 2)].err_c is None
    assert got[(1, 2)].naive_c == 1050 and got[(1, 2)].err_c == 150
    assert got[(3, 2)].naive_c is None and got[(3, 2)].err_c is None


def test_peak_age_retouch_resets_clock(spark):
    """Equal re-touch of the high moves peak_ts forward (latest-wins tie
    inside the struct max), so the age clock resets."""
    rows = [
        (1, 1, "a", 10.0, 100),
        (2, 1, "a", 8.0, 200),    # age 100
        (3, 1, "a", 10.0, 300),   # re-touch → peak_ts 300, age 0
        (4, 1, "a", 9.0, 450),    # age 150
    ]
    got = {r.event_id: r for r in wn.win_peak_age(_events(spark, rows)).collect()}
    assert got[2].peak_age_us == 100
    assert got[3].peak_ts_us == 300 and got[3].peak_age_us == 0
    assert got[4].peak_age_us == 150 and got[4].peak_c == 1000


def test_attribution_window_and_last_touch(spark):
    """A purchase binds to the most recent click at-or-before it; beyond
    the lookback it counts unattributed; clicks after don't count."""
    from kdb_spark.analytics import behavior as bh

    DAY = 86_400_000_000
    rows = [
        (1, 1, "click", 1.0, 1 * DAY),
        (2, 1, "purchase", 5.0, 3 * DAY),        # 2d after click → attributed
        (3, 1, "purchase", 5.0, 9 * DAY + 1),    # 8d+ after → NOT
        (4, 2, "purchase", 5.0, 2 * DAY),        # user 2 never clicked
        (5, 2, "click", 1.0, 2 * DAY + 5),       # click AFTER purchase
    ]
    got = {r.day: r for r in bh.agg_attribution(_events(spark, rows)).collect()}
    assert got[3].n_purchases == 1 and got[3].n_attributed == 1
    assert got[9].n_attributed == 0
    assert got[2].n_purchases == 1 and got[2].n_attributed == 0
    assert got[3].attribution_rate == 1.0


def test_filter_funnel_first_fail_semantics(spark):
    """Each gate only sees the previous gate's survivors: a too-short doc
    can't 'pass' the alpha gate, and counts are monotone down the funnel."""
    from kdb_spark.llm import curation as cu

    docs = spark.createDataFrame(
        [
            (1, "x" * 150, "en", "s1", 150),          # passes everything
            (2, "y" * 50, "en", "s1", 50),            # fails length
            (3, "1" * 200, "en", "s1", 200),          # fails alpha (digits)
            (4, "z" * 150, "xx", "s1", 150),          # fails lang
            (5, "", "en", "s1", 0),                   # fails nonempty
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = cu.curation_filter_funnel(docs).collect()[0]
    assert (r.n_docs, r.n_nonempty, r.n_len_ok) == (5, 4, 3)
    # doc3 is 200 digit chars: survives length, dies at alpha
    assert r.n_alpha_ok == 2
    # doc1/doc4 are single-"word" 150-char runs → mean word length 150 > 9:
    # both die at the word-length gate
    assert r.n_wordlen_ok == 0 and r.n_pass == 0
    assert r.pass_rate == 0.0


def test_volume_profile_rank_and_ties(spark):
    """Ranking is (count desc, LOWER level first); shares are against the
    FULL type tape, not the top-k slice."""
    rows = [(i, 1, "a", v, i * 10) for i, v in enumerate(
        [5.0, 5.0, 5.0, 7.0, 7.0, 3.0, 3.0, 9.0], 1)]
    got = {r.level_rank: r
           for r in agg.agg_volume_profile(_events(spark, rows), top_k=3).collect()}
    assert got[1].c == 500 and got[1].n_ticks == 3
    # 7.00 and 3.00 both count 2 → lower cent (300) ranks first
    assert got[2].c == 300 and got[3].c == 700
    assert got[1].type_total == 8 and got[1].share == 0.375


def test_table_freshness_windows_and_age(spark):
    """Trailing windows are strict > (now − w); age is exact µs."""
    H = 3_600_000_000
    now = 100 * H
    rows = [
        (1, 1, "a", 1.0, now - 30 * 60_000_000),   # 30min ago → 1h,24h,7d
        (2, 1, "a", 1.0, now - 2 * H),             # 2h ago → 24h,7d
        (3, 1, "a", 1.0, now - 30 * 24 * H),       # 30d ago → none
    ]
    r = agg.table_freshness(_events(spark, rows), now).collect()[0]
    assert (r.n_total, r.n_1h, r.n_24h, r.n_7d) == (3, 1, 2, 2)
    assert r.age_us == 30 * 60_000_000


def test_label_spread_hand_variance(spark):
    """Two 1-d vectors at ±1 around mean 0 → population variance 1.0;
    a single-point label → spread 0."""
    rows = [
        (0, [1.0], 0),
        (1, [-1.0], 0),
        (2, [5.0], 1),
    ]
    from kdb_spark.llm import similarity as sim

    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r.label: r for r in sim.emb_label_spread(emb).collect()}
    assert got[0].trace_var == 1.0 and got[0].rms_spread == 1.0
    assert got[1].trace_var == 0.0 and got[1].rms_spread == 0.0


def test_changepoint_hand_shift(spark):
    """A clean level shift is found at the boundary; means and score are
    the exact device values; single-row types emit nothing."""
    rows = [(i, 1, "a", 1.0, i * 100) for i in range(1, 5)]          # 4 @ 1.00
    rows += [(10 + i, 1, "a", 5.0, 1000 + i * 100) for i in range(4)]  # 4 @ 5.00
    rows += [(100, 1, "b", 3.0, 50)]
    got = {r.event_type: r for r in agg.agg_changepoint(_events(spark, rows)).collect()}
    a = got["a"]
    assert a.split_ts_us == 400 and (a.n_left, a.n_right) == (4, 4)
    assert a.mean_left == 1.0 and a.mean_right == 5.0
    assert a.score == 400.0  # |mean_l − mean_r| in cents: |100 − 500|
    assert "b" not in got


def test_vacuum_expires_and_preserves(spark, tmp_path):
    """keep_last=2: the oldest manifest and its unreferenced dir are
    deleted; surviving versions read back identically; time travel to
    the expired version raises; append-shared dirs are NOT deleted."""
    import os

    import pytest as _pt

    from kdb_spark.sources import (
        scan_version,
        sink_vacuum,
        sink_versioned,
    )

    path = str(tmp_path / "vac")
    df0 = spark.createDataFrame([(1, "x")], "id long, v string")
    df1 = spark.createDataFrame([(2, "y")], "id long, v string")
    df2 = spark.createDataFrame([(3, "z")], "id long, v string")
    sink_versioned(df0, path, mode="overwrite")        # v0: dirs [A]
    sink_versioned(df1, path, mode="overwrite")        # v1: dirs [B]
    sink_versioned(df2, path, mode="append")           # v2: dirs [B, C]
    stats = sink_vacuum(path, keep_last=2)
    assert stats == {"versions_removed": 1, "dirs_removed": 1, "versions_kept": 2}
    assert {r.id for r in scan_version(spark, path).collect()} == {2, 3}
    assert {r.id for r in scan_version(spark, path, 1).collect()} == {2}
    with _pt.raises(ValueError):
        scan_version(spark, path, 0)
    # idempotent: nothing left to reclaim
    assert sink_vacuum(path, keep_last=2)["dirs_removed"] == 0
    assert len(os.listdir(os.path.join(path, "data"))) == 2


def test_user_lifetime_active_days(spark):
    """Distinct active days per user, pooled; multi-event days count
    once; device mean."""
    DAY = 86_400_000_000
    rows = [
        (1, 1, "a", 1.0, 0),
        (2, 1, "a", 1.0, 5),            # same day
        (3, 1, "a", 1.0, 2 * DAY),      # user 1: 2 active days, 3 events
        (4, 2, "a", 1.0, 0),            # user 2: 1 day, 1 event
        (5, 3, "a", 1.0, DAY),          # user 3: 1 day, 1 event
    ]
    got = {r.active_days: r for r in agg.agg_user_lifetime(_events(spark, rows)).collect()}
    assert got[2].n_users == 1 and got[2].sum_events == 3 and got[2].mean_events == 3.0
    assert got[1].n_users == 2 and got[1].mean_events == 1.0


def test_rapid_reorders_gap_and_having(spark):
    """Only customers with a ≤7-day consecutive gap survive; the pair
    money is the LATER order's cents; first orders have no gap."""
    import datetime

    def d(day):
        return datetime.datetime(1995, 1, 1) + datetime.timedelta(days=day)

    orders = spark.createDataFrame(
        [
            (1, 10, 100.0, d(0)),
            (2, 10, 200.0, d(3)),    # gap 3 → rapid, 20000c
            (3, 10, 300.0, d(40)),   # gap 37 → not
            (4, 20, 100.0, d(0)),
            (5, 20, 100.0, d(30)),   # gap 30 → customer 20 filtered out
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp",
    )
    got = {r.o_custkey: r for r in agg.sql_rapid_reorders(orders).collect()}
    assert list(got) == [10]
    assert got[10].n_rapid == 1 and got[10].rapid_c == 20000
    assert got[10].min_gap_d == 3 and got[10].n_orders == 3


def test_magic_census_detects_by_bytes_not_ids(spark):
    """The classifier reads BYTES: a raw body that happens to start with
    'BM' classifies as bmp (the honest collision), the wav check needs
    BOTH 'RIFF' and 'WAVE' at the right offsets, and byte totals include
    the synthesized headers."""
    from kdb_spark.llm import multimodal as mm

    docs = spark.createDataFrame(
        [
            (0, "hello", "en", "s", 5),      # BM header → bmp, 7 bytes
            (1, "hello", "en", "s", 5),      # PNG sig → png, 13 bytes
            (2, "hello", "en", "s", 5),      # RIFF/WAVE → wav, 17 bytes
            (3, "BMx", "en", "s", 3),        # raw body starting BM → bmp
            (7, "RIFFxxxxWONK", "en", "s", 12),  # RIFF but no WAVE → raw
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.magic: r for r in mm.mm_magic_census(docs).collect()}
    assert got["bmp"].n == 2 and got["bmp"].total_bytes == 7 + 3
    assert got["png"].n == 1 and got["png"].total_bytes == 13
    assert got["wav"].n == 1 and got["wav"].total_bytes == 17
    assert got["raw"].n == 1


def test_event_study_horizons_and_attrition(spark):
    """Leads stay inside the (user, type) series; shocks near the series
    end contribute only existing horizons; means are exact devices."""
    rows = [
        (1, 1, "error", 10.0, 100),
        (2, 1, "error", 11.0, 200),   # d1 for shock 1 = +100c
        (3, 1, "error", 9.0, 300),    # d2 shock1 = -100c, d1 shock2 = -200c
    ]
    got = {r.horizon: r for r in agg.agg_event_study(_events(spark, rows)).collect()}
    # horizon 1: shocks 1 and 2 have a next tick → n=2, sum = 100 - 200
    assert got[1].n_obs == 2 and got[1].sum_d_c == -100
    assert got[1].mean_move == -0.5
    # horizon 2: only shock 1 → -100c
    assert got[2].n_obs == 1 and got[2].mean_move == -1.0
    assert 3 not in got


def test_label_affinity_hand_cosine(spark):
    """Orthogonal centroids → 0; identical direction → 1; pairs emitted
    once with label_a < label_b."""
    from kdb_spark.llm import similarity as sim

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.0, 1.0], 1),
        (2, [2.0, 0.0], 2),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {(r.label_a, r.label_b): r.cosine
           for r in sim.emb_label_affinity(emb).collect()}
    assert got[(0, 1)] == 0.0 and got[(1, 2)] == 0.0
    assert got[(0, 2)] == 1.0


def test_source_overlap_hand_jaccard(spark):
    """Shared 3-grams count once per source; Jaccard is the exact device;
    sources with <3 tokens don't appear."""
    from kdb_spark.llm import textstats as tx

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "en", "s1", 7),     # shingles: {a b c, b c d}
            (2, "a b c", "en", "s2", 5),       # {a b c}
            (3, "x y", "en", "s3", 3),         # too short
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {(r.source_a, r.source_b): r for r in tx.text_source_overlap(docs).collect()}
    r = got[("s1", "s2")]
    assert (r.n_inter, r.na, r.nb) == (1, 2, 1)
    assert r.jaccard == 0.5
    assert all("s3" not in k for k in got)


def test_open_order_aging_bands(spark):
    """Only status-O orders census; band = min(age//90, 8); oldest ages
    cap into the 8 band."""
    import datetime

    def d(day):
        return datetime.datetime(1970, 1, 1) + datetime.timedelta(days=day)

    orders = spark.createDataFrame(
        [
            (1, 1, 100.0, d(11536 - 10), "O"),    # age 10 → band 0
            (2, 1, 100.0, d(11536 - 100), "O"),   # age 100 → band 1
            (3, 1, 100.0, d(11536 - 2000), "O"),  # age 2000 → band 8 (cap)
            (4, 1, 100.0, d(11536 - 10), "F"),    # closed: excluded
        ],
        "o_orderkey long, o_custkey long, o_totalprice double,"
        "o_orderdate timestamp, o_orderstatus string",
    )
    got = {r.band: r for r in agg.sql_open_order_aging(orders).collect()}
    assert got[0].n_orders == 1 and got[0].min_age_d == 0
    assert got[1].n_orders == 1
    assert got[8].n_orders == 1 and got[8].oldest_d == 2000
    assert len(got) == 3


def test_hard_negatives_label_constraint(spark):
    """Only different-label vectors rank; same-label lookalikes are
    excluded no matter how similar."""
    from kdb_spark.llm import similarity as sim

    rows = [
        (0, [1.0, 0.0], 0),       # query
        (1, [1.0, 0.001], 0),     # same label, near-identical → excluded
        (5, [1.0, 0.1], 1),       # different label → hardest negative
        (6, [0.0, 1.0], 1),       # different label, orthogonal
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = sim.emb_hard_negatives(emb, n_queries=1, k=2).collect()
    ids = [r.negative_id for r in sorted(got, key=lambda r: r.rn)]
    assert ids == [5, 6]
    assert all(r.negative_label == 1 for r in got)


def test_grid_completeness_hand_slots(spark):
    """present = distinct occupied slots; expected = span + 1; device
    ratio pooled per type."""
    H = 3_600_000_000
    rows = [
        (1, 1, "a", 1.0, 0),
        (2, 1, "a", 1.0, 10),          # same slot as above
        (3, 1, "a", 1.0, 4 * H),       # slots 0 and 4 → present 2, expected 5
        (4, 2, "a", 1.0, 7 * H),       # single slot → 1/1
    ]
    r = agg.agg_grid_completeness(_events(spark, rows)).collect()[0]
    assert (r.n_series, r.present_slots, r.expected_slots) == (2, 3, 6)
    assert r.completeness == 0.5


def test_segment_migration_quartiles_and_exclusions(spark):
    """Only customers active in BOTH halves enter; quartile rank is the
    deterministic (spend, custkey) ntile; totals are exact cents."""
    import datetime

    def d(day):
        return datetime.datetime(1970, 1, 1) + datetime.timedelta(days=day)

    rows = []
    # 4 customers with h1 spends 100,200,300,400 and h2 reversed
    for i, (a, b) in enumerate([(100, 400), (200, 300), (300, 200), (400, 100)], 1):
        rows.append((i * 10, i, float(a), d(10227 - 50)))
        rows.append((i * 10 + 1, i, float(b), d(10227 + 50)))
    rows.append((99, 9, 500.0, d(10227 - 50)))   # h1 only → excluded
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp",
    )
    got = {(r.seg_h1, r.seg_h2): r for r in agg.sql_segment_migration(orders).collect()}
    # perfect reversal: (1,4),(2,3),(3,2),(4,1), one customer each
    assert set(got) == {(1, 4), (2, 3), (3, 2), (4, 1)}
    assert got[(1, 4)].n_customers == 1 and got[(1, 4)].h1_total_c == 10000


def test_ewma_array_fold_matches_lag_chain_with_nulls(spark):
    """The r14 array fold must reproduce the lag chain EXACTLY, including
    the null-sample contract (null contributes 0 to the numerator and is
    EXCLUDED from the weight denominator — it must not shift lag slots,
    which bare collect_list would do by dropping nulls)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kdb_spark.analytics import windows as wn

    rows = [
        (1, 1, "a", 100, 1_000),
        (2, 1, "a", None, 2_000),   # null mid-series: slot must be kept
        (3, 1, "a", 300, 3_000),
        (4, 1, "a", None, 4_000),
        (5, 1, "a", 500, 5_000),
        (6, 2, "a", 700, 1_000),    # short series head
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, xc long, ts_us long"
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    n_old, d_old = wn._ewma_terms(F.col("xc"), wn.EWMA_ALPHA, w)
    n_new, d_new = wn._ewma_terms_array(F.col("xc"), wn.EWMA_ALPHA, w)
    got = df.select("event_id", n_old.alias("no"), d_old.alias("do"),
                    n_new.alias("nn"), d_new.alias("dn")).collect()
    for r in got:
        assert (r.no, r.do) == (r.nn, r.dn), r


def test_vortex_excludes_first_candle_and_flags_flat(spark):
    """VI+/VI− on a hand-built two-candle series; the first candle (no
    prev) contributes nothing, and an all-flat frame (ΣTR = 0) is null."""
    HOUR = 3_600_000_000
    rows = [
        # type a: candle 0 h=l=c=10.00; candle 1 h=12.00 l=9.00 c=11.00
        (1, 1, "a", 10.0, 0),
        (2, 1, "a", 12.0, HOUR),
        (3, 1, "a", 9.0, HOUR + 1),
        (4, 1, "a", 11.0, HOUR + 2),
        # type b: two identical flat candles -> TR = 0 -> null
        (5, 1, "b", 5.0, 0),
        (6, 1, "b", 5.0, HOUR),
    ]
    from kdb_spark.analytics import windows as wn

    got = {
        (r.event_type, r.hour_us): (r.vi_plus, r.vi_minus)
        for r in wn.win_vortex(_events(spark, rows)).collect()
    }
    # candle 0 rows: no prev -> sums empty -> null
    assert got[("a", 0)] == (None, None)
    # candle 1: vm+ = |1200-1000| = 200, vm- = |900-1000| = 100,
    # tr = max(300, 200, 100) = 300 -> 0.666667 / 0.333333
    assert got[("a", HOUR)] == (0.666667, 0.333333)
    assert got[("b", HOUR)] == (None, None)


def test_tsi_constant_momentum_saturates(spark):
    """A strictly increasing equal-step series has momentum ≡ +step, so
    double-smoothed momentum equals double-smoothed |momentum| and TSI
    saturates at exactly +100; a decreasing one at -100."""
    rows = [(i, 1, "up", 10.0 + i, i * 1000) for i in range(1, 40)]
    rows += [(100 + i, 1, "dn", 900.0 - i, i * 1000) for i in range(1, 40)]
    from kdb_spark.analytics import windows as wn

    out = {r.event_id: (r.event_type, r.tsi)
           for r in wn.win_tsi(_events(spark, rows)).collect()}
    for eid, (et, tsi) in out.items():
        if eid in (1, 101):        # series head: no momentum yet
            assert tsi is None, (eid, tsi)
        elif et == "up":
            assert tsi == 100.0, (eid, tsi)
        else:
            assert tsi == -100.0, (eid, tsi)


def test_adx_directional_movement(spark):
    """+DM/−DM gating on a hand series: an up candle scores +DM only, an
    inside candle (both moves ≤ 0) scores neither, and DX is the exact
    ratio of the frame's directional sums."""
    HOUR = 3_600_000_000
    rows = [
        # candle 0: h=10, l=9
        (1, 1, "a", 10.0, 0), (2, 1, "a", 9.0, 1),
        # candle 1: h=12, l=10 -> +DM = 200, -DM = 0 (down-move 9-10 < 0),
        #           TR = max(200, |1200-900|=300, |1000-900|=100) = 300
        (3, 1, "a", 12.0, HOUR), (4, 1, "a", 10.0, HOUR + 1),
        # candle 2: h=11.5, l=10.5 (inside candle): up = 1150-1200 < 0,
        #           dn = 1000-1050 < 0 -> both 0; close prev = 10.0
        (5, 1, "a", 11.5, 2 * HOUR), (6, 1, "a", 10.5, 2 * HOUR + 1),
    ]
    from kdb_spark.analytics import windows as wn

    got = {r.hour_us: (r.plus_di, r.minus_di, r.dx)
           for r in wn.win_adx(_events(spark, rows)).collect()}
    assert got[0] == (None, None, None)               # no prev candle
    # frame at candle 1: S+ = 200, S- = 0, STR = 300
    assert got[HOUR] == (0.666667, 0.0, 1.0)
    # candle 2: TR = max(100, |1150-1000|=150, |1050-1000|=50) = 150
    # frame: S+ = 200, S- = 0, STR = 450
    assert got[2 * HOUR] == (0.444444, 0.0, 1.0)


def test_cov_matrix_exact_small(spark):
    """Hand-checked 3-hour covariance between two types: population
    covariance over COMMON hours only, exact device at 4 dp (cents²)."""
    HOUR = 3_600_000_000
    rows = [
        # type a hourly sums: h0=100c, h1=200c, h2=300c
        (1, 1, "a", 1.0, 0), (2, 1, "a", 2.0, HOUR), (3, 1, "a", 3.0, 2 * HOUR),
        # type b hourly sums: h0=300c, h1=100c (h2 absent)
        (4, 1, "b", 3.0, 0), (5, 1, "b", 1.0, HOUR),
    ]
    from kdb_spark.analytics import aggregations as agg

    got = {(r.type_a, r.type_b): r for r in
           agg.agg_cov_matrix(_events(spark, rows)).collect()}
    r = got[("a", "b")]
    # common hours 0,1: x=(100,200), y=(300,100)
    # n*Sxy - Sx*Sy = 2*(30000+20000) - 300*400 = 100000 - 120000 = -20000
    # cov = -20000/4 = -5000.0 cents²
    assert (r.n_hours, r.sum_a_c, r.sum_b_c, r.cov_c2) == (2, 300, 400, -5000.0)


def test_label_exemplars_rank_and_ties(spark):
    """Exemplars are the own-label vectors nearest the label centroid,
    ties to the lowest vec_id; k caps the per-label output."""
    from kdb_spark.llm.similarity import emb_label_exemplars

    rows = [
        (1, [1.0, 0.0], "0"), (2, [1.0, 0.1], "0"), (3, [0.0, 1.0], "0"),
        (4, [0.0, 2.0], "1"), (5, [0.0, 3.0], "1"),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    got = [(r.label, r.rank, r.vec_id)
           for r in emb_label_exemplars(df, k=2, dim=2)
           .orderBy("label", "rank").collect()]
    # label 0 centroid ≈ (0.667, 0.367): vec 2 closest, then vec 1
    # label 1 centroid = (0, 2.5): both vecs cos = 1.0, tie -> lower id first
    assert got == [(0, 1, 2), (0, 2, 1), (1, 1, 4), (1, 2, 5)]


def test_robust_zscore_masks_nothing(spark):
    """The textbook masking case: mean/stddev z-score misses a gross
    outlier among small values, median/MAD flags it; order-statistic
    median and the all-integer 3.5-MAD rule hand-checked."""
    rows = [(i, 1, "a", v, i * 1000) for i, v in
            enumerate([10.0, 10.1, 10.2, 10.3, 10.4, 10.5, 10.6, 1000.0], 1)]
    from kdb_spark.analytics import aggregations as agg

    got = {r.event_type: r for r in
           agg.agg_robust_zscore(_events(spark, rows)).collect()}
    r = got["a"]
    # sorted cents: 1000..1060 step 10, then 100000; n=8 -> k = ceil(n/2) = 4
    # median = 4th = 1030; deviations sorted: 0,10,10,20,20,30,30,98970
    # MAD = 4th = 20; flag: 10*dev > 35*20 = 700 -> only the 98970 row
    assert (r.n, r.med_c, r.mad_c, r.n_outliers) == (8, 1030, 20, 1)
    assert r.outlier_rate == 0.125


def test_top_customer_share_argmax_ties(spark):
    """Per-nation top customer: revenue ties break to the LOWEST custkey;
    the share is the exact device ratio."""
    from kdb_spark.analytics import aggregations as agg

    orders = spark.createDataFrame(
        [(1, 10, 100.0), (2, 11, 100.0), (3, 10, 50.0), (4, 20, 30.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(10, 0), (11, 0), (20, 1)], "c_custkey long, c_nationkey int"
    )
    nation = spark.createDataFrame(
        [(0, "N0"), (1, "N1")], "n_nationkey int, n_name string"
    )
    got = {r.nation: r for r in
           agg.sql_top_customer_share(orders, customer, nation).collect()}
    # N0: cust 10 = 15000c, cust 11 = 10000c -> top 10, share 0.6
    assert (got["N0"].top_custkey, got["N0"].nation_rev_c,
            got["N0"].top_rev_c, got["N0"].top_share) == (10, 25000, 15000, 0.6)
    assert (got["N1"].top_custkey, got["N1"].top_share) == (20, 1.0)


def test_ppo_normalizes_across_price_levels(spark):
    """The PPO point: two series with identical SHAPE at different price
    levels get the SAME oscillator value (MACD's absolute spread would
    differ 100×)."""
    rows = [(i, 1, "lo", 1.0 + 0.1 * i, i * 1000) for i in range(1, 20)]
    rows += [(100 + i, 1, "hi", 100.0 + 10.0 * i, i * 1000) for i in range(1, 20)]
    from kdb_spark.analytics import windows as wn

    out = {(r.event_type, r.event_id % 100): r.ppo
           for r in wn.win_ppo(_events(spark, rows)).collect()}
    for i in range(1, 20):
        assert out[("lo", i)] == out[("hi", i)], i


def test_join_band_blocking_covers_exactly_once(spark):
    """Band pairs across bucket boundaries are found exactly once (no
    dedup pass), the tolerance is inclusive, and out-of-band rows drop."""
    from kdb_spark.analytics import joins as jn

    a = spark.createDataFrame([(1, 100), (2, 149), (3, 400)], "a_id long, a_c long")
    b = spark.createDataFrame(
        [(10, 150), (11, 99), (12, 201), (13, 450)], "b_id long, b_c long"
    )
    got = sorted(
        (r.a_id, r.b_id) for r in jn.join_band(a, b, tol_c=50).collect()
    )
    # |100-150|=50 ok (inclusive, crosses bucket 2->3), |100-99|=1 ok,
    # |149-150|=1 ok, |149-99|=50 ok, |149-201|=52 no, |400-450|=50 ok
    assert got == [(1, 10), (1, 11), (2, 10), (2, 11), (3, 13)]


def test_psi_terms_smoothed_and_signed(spark):
    """Per-bin PSI terms on a hand distribution: a stable bin scores ~0,
    a grown bin scores positive (sign follows (p−q)·ln(p/q) ≥ 0 always),
    and a bin present on only one side survives via Laplace smoothing."""
    rows = [(i, 1, "a", 1.0, 0) for i in range(1, 5)]          # 4 before
    rows += [(10 + i, 1, "b", 1.0, 0) for i in range(1, 5)]    # 4 before
    rows += [(20 + i, 1, "a", 1.0, 100) for i in range(1, 9)]  # 8 after
    from kdb_spark.analytics import aggregations as agg

    got = {r.event_type: r for r in
           agg.agg_psi(_events(spark, rows), split_us=50).collect()}
    a, b = got["a"], got["b"]
    assert (a.c_before, a.c_after) == (4, 8)
    assert (b.c_before, b.c_after) == (4, 0)
    # smoothed shares: p_a = 5/10, q_a = 9/10; p_b = 5/10, q_b = 1/10
    assert (a.p, a.q) == (0.5, 0.9)
    assert (b.p, b.q) == (0.5, 0.1)
    assert a.psi_term > 0 and b.psi_term > 0
    import math
    assert a.psi_term == round((0.5 - 0.9) * math.log(0.5 / 0.9), 6)


def test_roc_normalizes_and_guards(spark):
    """10-lag percentage change: exact device value, null at heads and on
    a non-positive base."""
    rows = [(i, 1, "a", float(i), i * 1000) for i in range(1, 25)]
    from kdb_spark.analytics import windows as wn

    got = {r.event_id: r.roc for r in wn.win_roc(_events(spark, rows)).collect()}
    assert got[5] is None                       # head: no 10-lag yet
    assert got[15] == 200.0                     # (15-5)/5 = 200%
    assert got[24] == round(100 * (24 - 14) / 14, 4)


def test_k_core_peels_tendrils_keeps_cycle(spark):
    """2-core of a cycle with pendant chains: every pendant peels (even
    multi-hop chains, proving iteration), the cycle survives with
    degree 2 everywhere; a pure path graph peels to nothing."""
    from kdb_spark.analytics import graph as gr

    # cycle 1-2-3-4-1, chain 4-5-6, isolated path 7-8-9
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (4, 5), (5, 6), (7, 8), (8, 9)],
        "doc_a long, doc_b long",
    )
    got = {r.v: r.degree for r in gr.k_core(edges, k=2, rounds=5).collect()}
    assert got == {1: 2, 2: 2, 3: 2, 4: 2}


def test_graph_fixpoint_variants_match_fixed_round(spark):
    """The r15 run-to-fixpoint wrappers equal their fixed-round registered
    forms once the fixed cap covers convergence (extra rounds past the
    fixpoint are exact no-ops) — and converge unaided on inputs where the
    user would otherwise have to guess the depth."""
    from kdb_spark.analytics import graph as gr
    from kdb_spark.llm.dedup import _REUSE_CACHE

    # k-core: cycle + two-hop pendant chain needs 2 peeling rounds
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (4, 5), (5, 6), (7, 8), (8, 9)],
        "doc_a long, doc_b long",
    )
    fixed = {r.v: r.degree for r in gr.k_core(edges, k=2, rounds=5).collect()}
    fix = {r.v: r.degree for r in gr.k_core_fixpoint(edges, k=2).collect()}
    assert fix == fixed == {1: 2, 2: 2, 3: 2, 4: 2}

    # BFS: a 6-chain is deeper than the registered max_depth=3 — the
    # fixpoint form reaches the end without a cap guess
    for key in ("bfs_edges", "bfs_fix_edges"):
        _REUSE_CACHE.pop(key, None)
    chain = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "v long")
    fixed3 = {r.v: r.lvl for r in gr.bfs_levels(chain, seeds, max_depth=3).collect()}
    full = {r.v: r.lvl for r in gr.bfs_levels_fixpoint(chain, seeds).collect()}
    assert full == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5}
    assert {v: l for v, l in full.items() if l <= 3} == fixed3
    for key in ("bfs_edges", "bfs_fix_edges"):
        _REUSE_CACHE.pop(key, None)

    # pagerank: tol mode converges to the same rounded ranks the deep
    # fixed-iteration run reaches, in fewer driver-visible rounds
    pr_edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
    )
    for key in ("pagerank_edges", "pagerank_base", "pagerank_contrib"):
        _REUSE_CACHE.pop(key, None)
    # damping 0.5 for test speed: 0.5^n convergence puts the fixed-run
    # error ~1e-24 at n=80, far below the round(9) grid; tol=1e-12 stops
    # the tol run at ~n=40 (vs ~170 rounds at the 0.85 default)
    deep = {
        r.v: r.rank
        for r in gr.pagerank(
            pr_edges, iters=80, damping=0.5, checkpoint_every=10
        ).collect()
    }
    for key in ("pagerank_edges", "pagerank_base", "pagerank_contrib"):
        _REUSE_CACHE.pop(key, None)
    conv = {
        r.v: r.rank
        for r in gr.pagerank(pr_edges, iters=300, damping=0.5, tol=1e-12).collect()
    }
    for key in ("pagerank_edges", "pagerank_base", "pagerank_contrib"):
        _REUSE_CACHE.pop(key, None)
    assert conv == deep


# ------------------------------------------------------------- r15 new keys


def test_join_band_topk_shortlist_and_ties(spark):
    """Top-k nearest-value matches: ranked by |diff| with b_id tiebreak,
    capped at k, pairs beyond tol excluded entirely."""
    from kdb_spark.analytics import joins as jn

    a = spark.createDataFrame([(1, 100)], "a_id long, a_c long")
    b = spark.createDataFrame(
        [(10, 100), (11, 110), (12, 90), (13, 140), (14, 200)],
        "b_id long, b_c long",
    )
    rows = jn.join_band_topk(a, b, tol_c=50, k=3).collect()
    got = [(r.rank, r.b_id, r.diff_c) for r in sorted(rows, key=lambda r: r.rank)]
    # diffs: b10=0, b11=10, b12=10 (tie -> lower b_id first), b13=40 (cut
    # by k), b14=100 (cut by tol)
    assert got == [(1, 10, 0), (2, 11, 10), (3, 12, 10)]


def test_mann_kendall_hand_series(spark):
    """Known S/var18/z on hand series: strictly rising day (S = C(n,2)),
    strictly falling (negated), all-tied (var18 = 0 -> z NULL), and the
    continuity correction (z uses S-1)."""
    import math

    from kdb_spark.analytics import aggregations as agg

    day_us = 86_400_000_000
    rows = []
    # day 0, type 'a': values 1,2,3 rising -> S=3
    for i, v in enumerate([1.0, 2.0, 3.0]):
        rows.append((i, "a", i * 1_000_000, v))
    # day 1, type 'a': values 3,2,1 falling -> S=-3
    for i, v in enumerate([3.0, 2.0, 1.0]):
        rows.append((10 + i, "a", day_us + i * 1_000_000, v))
    # day 0, type 'b': all tied -> S=0, var18=0 -> z NULL
    for i in range(3):
        rows.append((20 + i, "b", i * 1_000_000, 5.0))
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts_us long, value double"
    )
    got = {
        (r.event_type, r.day): r
        for r in agg.agg_mann_kendall(ev).collect()
    }
    up = got[("a", 0)]
    assert (up.n, up.s_stat, up.var18) == (3, 3, 66)
    assert up.z == (3 - 1) / math.sqrt(66 / 18.0)
    dn = got[("a", 1)]
    assert (dn.s_stat, dn.var18) == (-3, 66)
    assert dn.z == (-3 + 1) / math.sqrt(66 / 18.0)
    tied = got[("b", 0)]
    # tie term: t=3 -> 3*2*11=66 -> var18 = 66-66 = 0
    assert (tied.s_stat, tied.var18, tied.z) == (0, 0, None)


def test_emb_random_projection_signs_and_norms(spark):
    """The sketch equals a hand fold with hashlib signs, and pnorm2/qnorm2
    are the exact integer diagnostics (one-hot input: ‖p‖² = k·‖q‖²)."""
    import hashlib

    from kdb_spark.llm import similarity as sim

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.5, -0.25, 2.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: r for r in sim.emb_random_projection(emb, k=4).collect()}

    def sign(i, j):
        return 1 if hashlib.md5(f"{i}:{j}".encode()).hexdigest()[0] <= "7" else -1

    grid = 1 << 20
    for vid, vals in ((0, [1.0, 0.0, 0.0]), (1, [0.5, -0.25, 2.0])):
        import math

        q = [math.floor(v * grid + 0.5) for v in vals]
        exp = [sum(q[i] * sign(i, j) for i in range(3)) for j in range(4)]
        assert [got[vid][f"p{j}"] for j in range(4)] == exp
        assert got[vid].qnorm2 == sum(x * x for x in q)
        assert got[vid].pnorm2 == sum(p * p for p in exp)
    # one-hot: every |p_j| = |q_0|, so pnorm2 = k * qnorm2 exactly
    assert got[0].pnorm2 == 4 * got[0].qnorm2


def test_bloom_probe_no_false_negatives(spark):
    """The Bloom guarantee: every exact duplicate MUST be bloom_maybe
    (false negatives are impossible); false positives are allowed and
    reported as bloom_maybe & ~exact_dup."""
    from kdb_spark.llm import dedup as dd
    from kdb_spark.tables import load

    from tests.conftest import SF_DIR

    rows = dd.dedup_bloom_probe(load(spark, SF_DIR, "documents")).collect()
    assert rows, "incoming split must be non-empty"
    for r in rows:
        if r.exact_dup:
            assert r.bloom_maybe, f"false negative at doc {r.doc_id}"


def test_label_propagation_two_cliques_bridge(spark):
    """Two triangles joined by one bridge edge: LPA labels each triangle
    with its own minimum vertex id (the bridge's single vote loses to the
    in-triangle majority) — the density cut components can't make."""
    from kdb_spark.analytics import graph as gr

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "doc_a long, doc_b long",
    )
    got = {r.v: (r.label, r.n_members) for r in gr.label_propagation(edges).collect()}
    # left triangle keeps label 1; the bridge leaks v3's id into the right
    # triangle where the min tie-break locks it in — the right community
    # carries label 3 (hand-traced synchronous rounds), still two distinct
    # 3-member communities within ONE connected component
    assert got[1] == (1, 3) and got[2] == (1, 3) and got[3] == (1, 3)
    assert got[4] == (3, 3) and got[5] == (3, 3) and got[6] == (3, 3)
    assert {lbl for lbl, _ in got.values()} == {1, 3}


def test_curation_skyline_hand_frontier(spark):
    """Dominance semantics: strictly-better-on-both removed, equal pairs
    co-survive, per-source frontiers independent."""
    from kdb_spark.llm import curation as cu

    rows = [
        # source s1: (chars, text-with-n-distinct-tokens)
        (0, "s1", 10, "aa bb cc"),        # 10 chars*, 3 types  — frontier
        (1, "s1", 20, "aa bb cc dd"),     # 20 chars, 4 types  — frontier
        (2, "s1", 20, "aa bb cc"),        # dominated by doc 0 (shorter, same types)
        (3, "s1", 30, "aa bb"),           # dominated by doc 0
        (4, "s1", 10, "aa bb cc"),        # ties doc 0 exactly — co-survives
        (5, "s2", 99, "zz"),              # alone in its source — frontier
    ]
    docs = spark.createDataFrame(
        [(i, s, t, n) for i, s, n, t in rows],
        "doc_id long, source string, text string, n_chars long",
    )
    got = {r.doc_id for r in cu.curation_skyline(docs).collect()}
    assert got == {0, 1, 4, 5}


def test_bootstrap_ci_brackets_mean(spark):
    """Poisson-bootstrap CI: lo < hi, the point estimate falls inside,
    and the whole table is deterministic across two runs (md5 weights,
    no RNG)."""
    from kdb_spark.analytics import aggregations as agg
    from kdb_spark.oracles._shared import events_us
    from tests.conftest import SF_DIR

    ev = events_us(spark, SF_DIR)
    rows = {r.event_type: r for r in agg.agg_bootstrap_ci(ev).collect()}
    assert rows
    for r in rows.values():
        assert r.ci_lo < r.ci_hi
        assert r.ci_lo <= r.mean_usd <= r.ci_hi
    again = {r.event_type: r for r in agg.agg_bootstrap_ci(ev).collect()}
    assert {k: (v.ci_lo, v.ci_hi) for k, v in rows.items()} == {
        k: (v.ci_lo, v.ci_hi) for k, v in again.items()
    }


def test_busy_spans_merges_overlaps(spark):
    """Interval union: overlapping sessions from different users merge
    into one span (n_sessions counts them), disjoint stretches split,
    back-to-back sessions sharing an instant merge (half-open ends)."""
    from kdb_spark.analytics import aggregations as agg

    m = 60_000_000  # one minute in µs
    rows = []
    # type 'a': user 1 active 0–10min (events every min), user 2 active
    # 5–15min -> one merged span [0, 15min+1) with 2 sessions; then user 1
    # again at 60–61min -> second span
    rows += [(i, "a", 1, i * m) for i in range(11)]
    rows += [(100 + i, "a", 2, (5 + i) * m) for i in range(11)]
    rows += [(200, "a", 1, 60 * m), (201, "a", 1, 61 * m)]
    ev = spark.createDataFrame(
        [(e, t, u, ts, 1.0) for e, t, u, ts in rows],
        "event_id long, event_type string, user_id long, ts_us long, value double",
    )
    got = sorted(
        (r.span_start, r.span_end, r.n_sessions)
        for r in agg.agg_busy_spans(ev).collect()
    )
    assert got == [(0, 15 * m + 1, 2), (60 * m, 61 * m + 1, 1)]


def test_permutation_test_detects_separation(spark):
    """Disjoint value ranges: every random relabel mixes the groups, so
    no relabeled |diff| reaches the observed one -> minimal add-one p;
    identical groups -> p near 1."""
    from kdb_spark.analytics import aggregations as agg

    far = [(i, "click", 1.0) for i in range(40)] + [
        (100 + i, "purchase", 1000.0) for i in range(40)
    ]
    ev = spark.createDataFrame(
        [(e, t, 0, v) for e, t, v in far],
        "event_id long, event_type string, ts_us long, value double",
    )
    r = agg.agg_permutation_test(ev).collect()[0]
    assert (r.n_a, r.n_b) == (40, 40)
    assert r.mean_diff_usd == -999.0
    assert r.n_exceed == 0 and r.p_value == round(1 / 33, 6)

    same = [(i, "click", 5.0) for i in range(40)] + [
        (100 + i, "purchase", 5.0) for i in range(40)
    ]
    ev2 = spark.createDataFrame(
        [(e, t, 0, v) for e, t, v in same],
        "event_id long, event_type string, ts_us long, value double",
    )
    r2 = agg.agg_permutation_test(ev2).collect()[0]
    # zero observed diff: every relabel ties or exceeds -> p = 1
    assert r2.mean_diff_usd == 0.0 and r2.p_value == 1.0


def test_survival_table_hand_durations(spark):
    """Life-table semantics: n_risk is the suffix count (survived >= t),
    n_event the deaths at t, hazard = d/n — hand-checked on durations
    {0, 0, 2, 5} minutes."""
    from kdb_spark.analytics import aggregations as agg

    m = 60_000_000
    rows = []
    # user 1: single event -> duration 0; user 2: single event -> 0
    rows += [(0, "a", 1, 0), (1, "a", 2, 10 * m)]
    # user 3: 2-minute session; user 4: 5-minute session
    rows += [(2, "a", 3, 0), (3, "a", 3, 2 * m)]
    rows += [(4, "a", 4, 0), (5, "a", 4, 5 * m)]
    ev = spark.createDataFrame(
        [(e, t, u, ts, 1.0) for e, t, u, ts in rows],
        "event_id long, event_type string, user_id long, ts_us long, value double",
    )
    got = {r.dur_min: r for r in agg.agg_survival_table(ev).collect()}
    assert (got[0].n_event, got[0].n_risk) == (2, 4)
    assert (got[2].n_event, got[2].n_risk) == (1, 2)
    assert (got[5].n_event, got[5].n_risk) == (1, 1)
    assert got[0].hazard == 0.5 and got[5].hazard == 1.0


def test_emb_dispersion_identity_hand_vectors(spark):
    """The no-pairwise-join identity: for hand vectors the mean pairwise
    dot equals the brute-force average; a label with identical unit
    vectors reports mean_pair_dot = 1."""
    from kdb_spark.llm import similarity as sim

    rows = [
        (0, [1.0, 0.0], 7),
        (1, [1.0, 0.0], 7),
        (2, [1.0, 0.0], 7),
        (3, [1.0, 0.0], 8),
        (4, [0.0, 1.0], 8),  # orthogonal pair -> mean dot 0
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r.label: r for r in sim.emb_dispersion(emb).collect()}
    assert got[7].n == 3 and got[7].mean_pair_dot == 1.0
    assert got[8].n == 2 and got[8].mean_pair_dot == 0.0


def test_grid_neighbors_blocking_is_exact(spark):
    """Grid blocking finds exactly the within-radius pairs, including a
    pair straddling a cell boundary, and each pair exactly once."""
    from kdb_spark.analytics import joins as jn

    pts = spark.createDataFrame(
        [
            (1, 100, 100),
            (2, 160, 100),   # 60 from p1 — neighbor, straddles cell edge (r=150 cells: 0 vs 1)
            (3, 100, 240),   # 140 from p1 — neighbor
            (4, 100, 260),   # 160 from p1 — NOT a neighbor of p1; 20 from p3
            (5, 5000, 5000), # far away
        ],
        "pid long, px long, py long",
    )
    got = {(r.pid_a, r.pid_b): r.dist2 for r in jn.join_grid_neighbors(pts, radius=150).collect()}
    # exact expectation: enumerate brute force
    import itertools

    rows = [(1, 100, 100), (2, 160, 100), (3, 100, 240), (4, 100, 260), (5, 5000, 5000)]
    brute = {}
    for (p, x1, y1), (q, x2, y2) in itertools.combinations(rows, 2):
        d2 = (x1 - x2) ** 2 + (y1 - y2) ** 2
        if d2 <= 150 * 150:
            brute[(p, q)] = d2
    assert got == brute


def test_dataset_balance_equalizes_classes(spark):
    """Every class keeps exactly min(class count) docs, ranks are 1..floor,
    selection is deterministic across runs."""
    from kdb_spark.llm import curation as cu

    rows = [(i, "en") for i in range(10)] + [(100 + i, "fr") for i in range(3)] + [
        (200 + i, "de") for i in range(5)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    got = cu.dataset_balance(docs).collect()
    by = {}
    for r in got:
        by.setdefault(r.class_key, []).append(r.rank_in_class)
    assert {k: sorted(v) for k, v in by.items()} == {
        "en": [1, 2, 3], "fr": [1, 2, 3], "de": [1, 2, 3]
    }
    again = {(r.doc_id, r.rank_in_class) for r in cu.dataset_balance(docs).collect()}
    assert again == {(r.doc_id, r.rank_in_class) for r in got}


def test_seasonal_mk_removes_diurnal_false_trend(spark):
    """A pure diurnal cycle (values rise within each day, no cross-day
    drift) yields seasonal-MK S = 0 (each stratum is constant across
    days) while plain MK sees a strong within-day 'trend'."""
    from kdb_spark.analytics import aggregations as agg

    h = 3_600_000_000
    rows = []
    eid = 0
    for day in range(4):
        for hod in range(6):
            rows.append((eid, "a", day * 24 * h + hod * h, float(hod)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts_us long, value double"
    )
    sk = agg.agg_seasonal_mk(ev).collect()[0]
    # within a stratum all 4 days share the same value -> every pair ties
    assert sk.s_stat == 0 and sk.var18 == 0 and sk.z is None
    mk = {r.day: r.s_stat for r in agg.agg_mann_kendall(ev).collect()}
    assert all(s == 15 for s in mk.values())  # 6 rising values: C(6,2) pairs


def test_cdc_apply_merge_semantics(spark):
    """Per key the highest-seq change wins: I→U→D nets to delete, U after
    decoy-U applies the final payload, untouched keys carry, inserts
    append."""
    from kdb_spark.sources import cdc_apply

    snap = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "k long, payload long"
    )
    changes = spark.createDataFrame(
        [
            (1, "U", 99, 1), (1, "D", None, 2),        # delete wins
            (2, "U", 999, 1), (2, "U", 25, 2),         # final U wins
            (5, "I", 50, 1),                           # fresh insert
            (3, "D", None, 1), (3, "I", 35, 2),        # re-insert after delete
        ],
        "k long, op string, payload long, seq long",
    )
    got = {r.k: r.payload for r in cdc_apply(snap, changes, key="k").collect()}
    assert got == {2: 25, 3: 35, 4: 40, 5: 50}


def test_join_window_anti_complement(spark):
    """Anti-window probes are exactly the probes join_window reports with
    zero in-window matches over the symmetric window."""
    from kdb_spark.analytics import joins as jn
    from kdb_spark.oracles._shared import events_us
    from tests.conftest import SF_DIR

    ev = events_us(spark, SF_DIR)
    anti = {r.event_id for r in jn.join_window_anti(ev).collect()}
    full = {r.event_id: r.n_in_win for r in jn.join_window(ev).collect()}
    assert anti == {e for e, n in full.items() if n == 0}


def test_mk_inversion_identity_matches_pairwise(spark):
    """The O(n log n) inversion-count identity S = C(n,2) − ties − 2·inv
    equals the literal pairwise sum on random tied data — the law the
    r15 scale rewrite rests on."""
    import itertools
    import random

    from kdb_spark.analytics.aggregations import _mk_inversions

    rng = random.Random(42)
    for trial in range(30):
        n = rng.randint(1, 40)
        xs = [rng.randint(0, 8) for _ in range(n)]  # heavy ties
        pair_s = sum(
            (1 if b > a else -1 if b < a else 0)
            for a, b in itertools.combinations(xs, 2)
        )
        from collections import Counter

        tie_pairs = sum(t * (t - 1) // 2 for t in Counter(xs).values())
        ident = n * (n - 1) // 2 - tie_pairs - 2 * _mk_inversions(xs)
        assert ident == pair_s, (xs, ident, pair_s)


def test_candle_patterns_hand_candles(spark):
    """Hand OHLC: a doji (tiny body), a hammer (long lower wick), and a
    bullish engulfing of the prior bearish candle."""
    from kdb_spark.analytics import windows as wn

    h = 3_600_000_000
    rows = []
    # hour 0: bearish candle open 10.00 close 9.00 (po/pc for engulfing)
    rows += [(0, "a", 0, 10.00), (1, "a", 1, 10.50), (2, "a", 2, 8.90), (3, "a", 3, 9.00)]
    # hour 1: bullish engulfing: open 8.80 (<= prev close 9.00), close 10.20 (>= prev open 10.00)
    rows += [(10, "a", h, 8.80), (11, "a", h + 1, 8.70), (12, "a", h + 2, 10.30), (13, "a", h + 3, 10.20)]
    # hour 2: doji: open == close, wide range
    rows += [(20, "a", 2 * h, 5.00), (21, "a", 2 * h + 1, 6.00), (22, "a", 2 * h + 2, 4.00), (23, "a", 2 * h + 3, 5.00)]
    # hour 3: hammer (not doji): open 5.00, low 3.00, high 5.02, close 4.40
    # body 60c > 10% of 202c range; lower wick 140c >= 2*body 120c; upper 2c
    rows += [(30, "a", 3 * h, 5.00), (31, "a", 3 * h + 1, 3.00), (32, "a", 3 * h + 2, 5.02), (33, "a", 3 * h + 3, 4.40)]
    ev = spark.createDataFrame(
        [(e, t, ts, v) for e, t, ts, v in rows],
        "event_id long, event_type string, ts_us long, value double",
    )
    got = {r.hour_us // h: r for r in wn.win_candle_patterns(ev).collect()}
    assert got[1].engulf_bull and not got[1].engulf_bear
    assert got[2].is_doji
    assert got[3].is_hammer and not got[3].is_doji


def test_filter_overlap_hand_docs(spark):
    """Upper-triangle census: diagonal = per-filter removal counts,
    off-diagonal = joint removals, on a fixture where every intersection
    is hand-countable."""
    from kdb_spark.llm import curation as cu

    long_txt = " ".join(f"w{i}" for i in range(30))
    rows = [
        (0, "en", "a" * 10, 50),            # short + low_alpha
        (1, "en", long_txt, 500),           # clean
        (2, "en", long_txt, 500),           # dup of 1 (higher id loses)
        (3, "fr", long_txt + " extra", 500),  # clean (fr is 2nd lang)
        (4, "xx", "b c", 20),               # rare_lang + short + low_alpha
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string, n_chars long")
    got = {(r.filter_a, r.filter_b): r.n_both for r in cu.curation_filter_overlap(docs).collect()}
    assert got[("short", "short")] == 2
    assert got[("dup", "dup")] == 1
    assert got[("rare_lang", "rare_lang")] == 1
    assert got[("low_alpha", "low_alpha")] == 2
    assert got[("short", "low_alpha")] == 2
    assert got[("short", "rare_lang")] == 1
    assert got[("short", "dup")] == 0


def test_tick_bars_hand_prints(spark):
    """250 prints at ticks=100: bars of 100/100/50, OHLC picks exact in
    print order, partial last bar carries its true n."""
    from kdb_spark.analytics import windows as wn

    rows = [(i, "a", i * 1_000_000, float(i % 7)) for i in range(250)]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts_us long, value double"
    )
    got = {r.bar_id: r for r in wn.win_tick_bars(ev, ticks=100).collect()}
    assert [got[i].n for i in (0, 1, 2)] == [100, 100, 50]
    assert got[0].open_c == 0 and got[0].close_c == ((99 % 7) * 100)
    assert got[2].open_c == ((200 % 7) * 100) and got[2].n == 50
    assert got[1].bar_start_us == 100 * 1_000_000


def test_minhash_calibration_identical_docs_saturate(spark):
    """Identical docs agree on every MinHash slot (m = 16) with exact
    jaccard 1; near-identical docs land strictly between."""
    from kdb_spark.llm import dedup as dd

    base = " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                      # identical -> J=1, m=16
            (3, base + " zz yy xx ww vv"),  # superset -> 0.3<J<1
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_a, r.doc_b): r for r in dd.dedup_minhash_calibration(docs).collect()}
    ident = got[(1, 2)]
    assert ident.n_inter == ident.n_union and ident.m_agree == 16
    near = got[(1, 3)]
    assert near.n_inter < near.n_union
    assert 0 <= near.m_agree <= 16


def test_modularity_two_cliques(spark):
    """Two clean triangles (no bridge): LPA finds them, each community's
    q_term = e/m − (d/2m)² = 3/6 − (6/12)² = 0.25, total Q = 0.5 — the
    textbook two-clique modularity."""
    from kdb_spark.analytics import graph as gr

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)],
        "doc_a long, doc_b long",
    )
    rows = gr.graph_modularity(edges).collect()
    assert len(rows) == 2
    for r in rows:
        assert (r.n_members, r.e_in, r.d_tot) == (3, 3, 6)
        assert r.q_term == 0.25


def test_eta_squared_extremes(spark):
    """Value fully determined by hour -> η² = 1; hour-independent values
    -> η² = 0 (both exactly on the 6dp grid)."""
    from kdb_spark.analytics import aggregations as agg

    h = 3_600_000_000
    det, flat = [], []
    eid = 0
    for day in range(3):
        for hod in range(4):
            det.append((eid, "det", day * 24 * h + hod * h, float(hod + 1)))
            flat.append((1000 + eid, "flat", day * 24 * h + hod * h, float(day + 1)))
            eid += 1
    ev = spark.createDataFrame(
        det + flat, "event_id long, event_type string, ts_us long, value double"
    )
    got = {r.event_type: r.eta_sq for r in agg.agg_eta_squared(ev).collect()}
    assert got["det"] == 1.0
    assert got["flat"] == 0.0


def test_kruskal_wallis_hand_groups(spark):
    """Textbook check: three disjoint groups of 3 with no ties ->
    H = 12/(n(n+1))·ΣR_g²/n_g − 3(n+1) computed by hand; mean ranks in
    type order."""
    from kdb_spark.analytics import aggregations as agg

    rows = (
        [(i, "a", 0, float(v)) for i, v in enumerate([1, 2, 3])]
        + [(10 + i, "b", 0, float(v)) for i, v in enumerate([4, 5, 6])]
        + [(20 + i, "c", 0, float(v)) for i, v in enumerate([7, 8, 9])]
    )
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts_us long, value double"
    )
    out = {r.event_type: r for r in agg.agg_kruskal_wallis(ev).collect()}
    assert len(out) == 3  # long format: one row per type, globals repeated
    for r in out.values():
        assert (r.n, r.k, r.tie3) == (9, 3, 0)
        # rank sums 6/15/24 -> H = 12/90*(36/3+225/3+576/3) - 30 = 7.2
        assert r.h_stat == 7.2
    assert [out[t].mean_rank for t in "abc"] == [2.0, 5.0, 8.0]
    assert [out[t].n_g for t in "abc"] == [3, 3, 3]


def test_welch_t_hand_groups(spark):
    """Textbook Welch: a=[1..4], b=[2,4,..,10] USD — the t/df chain is
    replicated in Python floats from the same exact integer stats, so the
    assertion is bit-for-bit (floor device at 6 dp), not approximate."""
    import math

    from kdb_spark.analytics import aggregations as agg

    a, b = [1.0, 2.0, 3.0, 4.0], [2.0, 4.0, 6.0, 8.0, 10.0]
    rows = [(i, "click", 0, v) for i, v in enumerate(a)] + [
        (10 + i, "purchase", 0, v) for i, v in enumerate(b)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts_us long, value double"
    )
    r = agg.agg_welch_t(ev).collect()[0]
    xa, xb = [int(v * 100) for v in a], [int(v * 100) for v in b]
    na, nb, sa, sb = len(xa), len(xb), sum(xa), sum(xb)
    ta, tb = sum(v * v for v in xa), sum(v * v for v in xb)
    va_n = (na * ta - sa * sa) / (na * na * (na - 1))
    vb_n = (nb * tb - sb * sb) / (nb * nb * (nb - 1))
    se2 = va_n + vb_n
    t_exp = math.floor((sa / na - sb / nb) / math.sqrt(se2) * 1e6 + 0.5) / 1e6
    df_exp = (
        math.floor(
            se2 * se2 / (va_n * va_n / (na - 1) + vb_n * vb_n / (nb - 1)) * 1e6
            + 0.5
        )
        / 1e6
    )
    assert (r.n_a, r.n_b) == (4, 5)
    assert r.mean_diff_usd == -3.5
    assert r.t_stat == t_exp and r.df == df_exp
    # and the classic sanity values
    assert abs(r.t_stat - (-2.251436)) < 1e-5
    assert abs(r.df - 5.520788) < 1e-3


def test_ljung_box_hand_series(spark):
    """rho_k and Q replicated in exact Python ints/floats for a small
    alternating series (strong negative rho1), plus the white-noise
    degenerate guards (constant series -> NULLs)."""
    import math

    from kdb_spark.analytics import aggregations as agg

    vals = [1.0, 2.0, 1.0, 2.0, 1.0, 2.0, 1.0, 2.0, 1.0, 2.0]
    rows = [(i, "alt", i * 1000, v) for i, v in enumerate(vals)] + [
        (100 + i, "flat", i * 1000, 5.0) for i in range(8)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts_us long, value double"
    )
    got = {r.event_type: r for r in agg.agg_ljung_box(ev).collect()}

    x = [int(v * 100) for v in vals]
    n, s = len(x), sum(x)
    den = n * sum(v * v for v in x) - s * s
    rho_raw = []
    for k in range(1, 6):
        pairs = list(zip(x[k:], x[:-k]))
        sxy = sum(a * b for a, b in pairs)
        sx = sum(a for a, _ in pairs)
        sy = sum(b for _, b in pairs)
        num = n * n * sxy - n * s * (sx + sy) + len(pairs) * s * s
        rho_raw.append(num / (n * den))
    q = 0.0
    for k, rho in enumerate(rho_raw, start=1):
        q += rho * rho / (n - k)
    q *= n * (n + 2)
    alt = got["alt"]
    for k, rho in enumerate(rho_raw, start=1):
        assert alt[f"rho{k}"] == math.floor(rho * 1e6 + 0.5) / 1e6
    assert alt.q_stat == math.floor(q * 1e6 + 0.5) / 1e6
    # alternating series: rho1 near -1 (negative persistence)
    assert alt.rho1 < -0.8
    flat = got["flat"]
    assert flat.q_stat is None and flat.rho1 is None  # zero variance


def test_clustering_coeff_hand_graph(spark):
    """K4 minus one edge: the two degree-3 hubs close 2 of 3 possible
    neighbor pairs (C=2/3... actually 1 triangle pair of 3), the two
    degree-2 vertices sit in 1 triangle each over 1 possible pair (C=1);
    a pendant leaf gets NULL."""
    from kdb_spark.analytics import graph as gr

    # vertices 1-4: K4 minus edge (3,4); vertex 5 pendant off 1
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (1, 5)], "a long, b long"
    )
    got = {r.v: r for r in gr.clustering_coeff(edges).collect()}
    # deg: 1->4, 2->3, 3->2, 4->2, 5->1; triangles: (1,2,3),(1,2,4)
    assert (got[1].deg, got[1].n_tri) == (4, 2)
    assert got[1].coeff == round(2 * 2 / (4 * 3), 6)  # 0.333333
    assert (got[2].deg, got[2].n_tri) == (3, 2)
    assert got[2].coeff == 0.666667  # device half-up of 2/3
    assert got[3].coeff == 1.0 and got[4].coeff == 1.0
    assert got[5].deg == 1 and got[5].coeff is None


def test_grid_knn_exact_shortlist(spark):
    """k-NN shortlist matches brute force, including the cell-straddling
    neighbor and the (dist2, pid_b) tiebreak; out-of-radius points never
    appear even if a cell neighbor."""
    from kdb_spark.analytics import joins as jn

    pts = spark.createDataFrame(
        [
            (1, 100, 100),
            (2, 160, 100),   # d2=3600 from p1, straddles the r=150 cell edge
            (3, 100, 240),   # d2=19600 from p1
            (4, 200, 200),   # d2=20000 from p1
            (5, 100, 340),   # d2=57600 from p1 — OUT of radius (r²=22500)
            (9, 5000, 5000), # isolated: no rows
        ],
        "pid long, px long, py long",
    )
    got = [
        (r.pid_a, r.rank, r.pid_b, r.dist2)
        for r in jn.join_grid_knn(pts, radius=150, k=3)
        .orderBy("pid_a", "rank")
        .collect()
    ]
    assert [(a, rk, b) for a, rk, b, _ in got if a == 1] == [
        (1, 1, 2),
        (1, 2, 3),
        (1, 3, 4),
    ]
    assert all(a != 5 or b != 1 for a, _, b, _ in got) is True
    assert 9 not in {a for a, _, _, _ in got}
    # symmetric view: p5's nearest is p3 (d2=10000)
    p5 = [(rk, b, d) for a, rk, b, d in got if a == 5]
    assert p5[0] == (1, 3, 10000)


def test_parkinson_vol_hand_bars(spark):
    """One day, two usable hourly bars with known H/L ratios; an H=L bar
    and an L<=0 bar are excluded from n_bars; σ_P replicated in floats."""
    import math

    from kdb_spark.analytics import windows as wn

    H = 3_600_000_000
    rows = [
        # hour 0: hi 200 lo 100 cents
        (1, "t", 0 * H, 1.0),
        (2, "t", 0 * H + 1000, 2.0),
        # hour 1: hi 400 lo 100
        (3, "t", 1 * H, 4.0),
        (4, "t", 1 * H + 1000, 1.0),
        # hour 2: flat (excluded)
        (5, "t", 2 * H, 3.0),
        # hour 3: includes a non-positive low (excluded)
        (6, "t", 3 * H, -1.0),
        (7, "t", 3 * H + 1000, 2.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts_us long, value double"
    )
    r = wn.win_parkinson_vol(ev).collect()[0]
    t0 = (math.log(200.0) - math.log(100.0)) ** 2
    t1 = (math.log(400.0) - math.log(100.0)) ** 2
    s = 0.0 + t0 + t1
    vol = math.sqrt(s / (2.772588722239781 * 2))
    assert (r.event_type, r.day, r.n_bars) == ("t", 0, 2)
    assert r.park_vol == math.floor(vol * 1e6 + 0.5) / 1e6


def test_garman_klass_hand_bars(spark):
    """Two usable hourly bars with known OHLC; the flat bar and the
    non-positive-open bar are excluded; σ²_GK replicated in floats,
    including the O/C picks by (ts, event_id) order."""
    import math

    from kdb_spark.analytics import windows as wn

    H = 3_600_000_000
    rows = [
        # hour 0: prints 1.0 → 2.5 → 2.0  (O=100, H=250, L=100, C=200)
        (1, "t", 0 * H, 1.0),
        (2, "t", 0 * H + 1000, 2.5),
        (3, "t", 0 * H + 2000, 2.0),
        # hour 1: prints 4.0 → 1.0  (O=400, H=400, L=100, C=100)
        (4, "t", 1 * H, 4.0),
        (5, "t", 1 * H + 1000, 1.0),
        # hour 2: flat
        (6, "t", 2 * H, 3.0),
        # hour 3: negative open excluded
        (7, "t", 3 * H, -1.0),
        (8, "t", 3 * H + 1000, 2.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts_us long, value double"
    )
    r = wn.win_garman_klass(ev).collect()[0]

    def term(o, h, l, c):
        lr = math.log(float(h)) - math.log(float(l))
        lc = math.log(float(c)) - math.log(float(o))
        return 0.5 * lr * lr - 0.386294361119890 * lc * lc

    s = 0.0 + term(100, 250, 100, 200) + term(400, 400, 100, 100)
    var = s / 2.0
    assert (r.event_type, r.day, r.n_bars) == ("t", 0, 2)
    assert r.gk_var == math.floor(var * 1e6 + 0.5) / 1e6
