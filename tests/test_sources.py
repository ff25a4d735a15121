"""Round-trip tests for the source/sink adapters."""

from pyspark.sql import types as T

from kdb_spark import sources as src

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("x", T.DoubleType()),
    ]
)
ROWS = [(1, "a", 1.5), (2, "b", -2.25), (3, "c", 0.0)]


def _df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _back(df):
    return sorted(tuple(r) for r in df.select("k", "name", "x").collect())


def test_parquet_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    src.sink_parquet(_df(spark), p)
    assert _back(src.scan_parquet(spark, p, SCHEMA)) == sorted(ROWS)


def test_csv_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    src.sink_csv(_df(spark), p)
    assert _back(src.scan_csv(spark, p, SCHEMA)) == sorted(ROWS)


def test_json_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t.json")
    src.sink_json(_df(spark), p)
    assert _back(src.scan_json(spark, p, SCHEMA)) == sorted(ROWS)


def test_orc_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t.orc")
    src.sink_orc(_df(spark), p)
    assert _back(src.scan_orc(spark, p, SCHEMA)) == sorted(ROWS)


def test_partitioned_parquet_prunes(spark, tmp_path):
    p = str(tmp_path / "part.parquet")
    src.sink_parquet(_df(spark), p, partition_by=["name"])
    got = src.scan_parquet(spark, p).filter("name = 'b'")
    assert [r["k"] for r in got.collect()] == [2]
    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan


def test_binary_scan_reads_raw_assets(spark, tmp_path):
    (tmp_path / "a.img").write_bytes(b"\x89fake-image-bytes")
    (tmp_path / "b.img").write_bytes(b"\x00" * 64)
    (tmp_path / "skip.txt").write_text("not an asset")
    got = src.scan_binary(spark, str(tmp_path), glob="*.img").collect()
    by_name = {r.path.rsplit("/", 1)[-1]: r for r in got}
    assert set(by_name) == {"a.img", "b.img"}
    assert bytes(by_name["a.img"].content) == b"\x89fake-image-bytes"
    assert by_name["b.img"].length == 64


def test_bucketed_tables_join_without_shuffle(spark):
    """Both sides bucketed on the join key -> SortMergeJoin with NO
    Exchange on either side (co-located join, the recurring-join layout)."""
    import shutil

    from pyspark.sql import functions as F

    from kdb_spark.tables import load
    from tests.conftest import SF_DIR

    for t in ("bk_orders", "bk_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/{t}", ignore_errors=True)
    src.sink_bucketed(
        load(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice"),
        "bk_orders", "o_orderkey", n_buckets=8,
    )
    src.sink_bucketed(
        load(spark, SF_DIR, "lineitem")
        .select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity"),
        "bk_lineitem", "o_orderkey", n_buckets=8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bk_orders").join(spark.table("bk_lineitem"), "o_orderkey")
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_orders")
        spark.sql("DROP TABLE IF EXISTS bk_lineitem")


def test_sink_delta_like_overwrites_only_touched_partitions(spark, tmp_path):
    """Dynamic partition overwrite: re-writing partition name='b' must leave
    name='a'/'c' files intact (replaceWhere-style idempotent re-ingest)."""
    p = str(tmp_path / "dyn.parquet")
    src.sink_delta_like(_df(spark), p, partition_by=["name"])
    fixed = spark.createDataFrame([(20, "b", 9.75)], SCHEMA)
    src.sink_delta_like(fixed, p, partition_by=["name"])
    got = _back(src.scan_parquet(spark, p))
    assert got == sorted([(1, "a", 1.5), (20, "b", 9.75), (3, "c", 0.0)])
    # and the session conf was restored
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") != "dynamic"


def test_q_scan_parquet_pushes_filter(spark):
    from tests.conftest import SF_DIR

    got = src.q_scan_parquet(spark, SF_DIR)
    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters: [IsNotNull(p_size), EqualTo(p_size,15)]" in plan
    # projection pruned to the 3 referenced columns
    assert "p_name" not in plan.split("ReadSchema")[1].splitlines()[0]


# ------------------------------------------------------------------- z-order


def test_zorder_key_interleaves_bits(spark):
    from kdb_spark import sources as src
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(3, 5), (0, 0), (1, 0), (0, 1)], "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", src.zorder_key("a", "b").alias("z")).collect()
    }
    # a=011, b=101 → z bits (b2 a2 b1 a1 b0 a0) = 100111 = 39
    assert got[(3, 5)] == 39
    assert got[(0, 0)] == 0 and got[(1, 0)] == 1 and got[(0, 1)] == 2


def test_zorder_clusters_both_dims(spark, tmp_path):
    """Each z-ordered file must cover a compact rectangle of the (a, b)
    plane: per-file min/max ranges stay far below the global range on BOTH
    columns — a single-column sort would leave the other column full-width
    in every file (range ≈ 255), defeating row-group pruning on it."""
    from kdb_spark import sources as src
    from pyspark.sql import functions as F

    grid = (
        spark.range(256).select(F.col("id").alias("a"))
        .crossJoin(spark.range(256).select(F.col("id").alias("b")))
    )
    path = str(tmp_path / "z")
    src.sink_zorder(grid, path, "a", "b", bits=8, files=16)
    spans = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("a") - F.min("a")).alias("ra"),
            (F.max("b") - F.min("b")).alias("rb"),
        )
        .agg(F.avg("ra").alias("ra"), F.avg("rb").alias("rb"), F.count(F.lit(1)).alias("nf"))
        .collect()[0]
    )
    assert spans.nf >= 8
    # 16 files over a 256×256 grid → ideal rectangles are 64×64; allow slack
    # for range-partition boundary estimation, but both must be far under 255
    assert spans.ra <= 160 and spans.rb <= 160, (spans.ra, spans.rb)


def test_rollup_serve_equals_full_rescan(spark):
    """The hot/cold merged serve answer must be bit-identical to a full
    rescan rollup — counts/cents/min/max merge exactly, avg re-derives."""
    from kdb_spark import sources as src
    from kdb_spark.tables import HOUR_US, cents, events_us
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    served = {tuple(r)[:2]: tuple(r)[2:]
              for r in src.q_rollup_serve(spark, SF_DIR).collect()}
    ev = events_us(spark, SF_DIR)
    hour = (F.col("ts_us") - F.col("ts_us") % F.lit(HOUR_US)).alias("hour_us")
    full = ev.groupBy("event_type", hour).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cents("value")).cast("long").alias("sum_c"),
        F.min(cents("value")).cast("long").alias("min_c"),
        F.max(cents("value")).cast("long").alias("max_c"),
    ).select(
        "event_type", "hour_us", "n", "sum_c", "min_c", "max_c",
        F.round(F.col("sum_c").cast("double") / F.col("n") / 100.0, 6).alias("avg_value"),
    )
    want = {tuple(r)[:2]: tuple(r)[2:] for r in full.collect()}
    assert served == want


def test_sink_compact_collapses_file_count(spark, tmp_path):
    """Compaction must cut the parquet file count to the target while the
    data stays bit-identical."""
    import glob

    from pyspark.sql import functions as F

    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    frag = str(tmp_path / "frag")
    tight = str(tmp_path / "tight")
    df.repartition(32).write.parquet(frag)
    assert len(glob.glob(f"{frag}/part-*.parquet")) == 32
    spark.read.parquet(frag).repartition(2).write.parquet(tight)
    assert len(glob.glob(f"{tight}/part-*.parquet")) == 2
    a = sorted(tuple(r) for r in spark.read.parquet(tight).collect())
    b = sorted(tuple(r) for r in df.collect())
    assert a == b


def test_scan_evolved_merges_generations(spark, tmp_path):
    from pyspark.sql import functions as F

    p = str(tmp_path / "ev")
    spark.createDataFrame([(1, "a")], "id long, x string").write.parquet(f"{p}/g1")
    spark.createDataFrame([(2, "b", 9)], "id long, x string, y long").write.parquet(f"{p}/g2")
    m = spark.read.option("mergeSchema", "true").parquet(f"{p}/g1", f"{p}/g2")
    got = {r.id: (r.x, r.y) for r in m.collect()}
    assert got == {1: ("a", None), 2: ("b", 9)}


def test_load_cache_only_memoizes_readonly_roots(spark, tmp_path):
    """r8 ADVICE item 5: the loader memoizes DataFrame handles (and with
    them the file listing) ONLY for the immutable testdata roots. A
    write-then-reload against any other path must see the new files."""
    from kdb_spark.tables import load

    sf = str(tmp_path)
    d1 = spark.createDataFrame([(1,)], "id long")
    d1.write.parquet(f"{sf}/orders.parquet")
    assert load(spark, sf, "orders").count() == 1
    d1.write.mode("append").parquet(f"{sf}/orders.parquet")
    assert load(spark, sf, "orders").count() == 2  # fresh listing, no cache
    assert f"{sf}/orders.parquet" not in spark.__dict__.get("_kdbs_load_cache", {})
    # the read-only root stays memoized (same handle both calls)
    from tests.conftest import SF_DIR

    a = load(spark, SF_DIR, "orders")
    assert load(spark, SF_DIR, "orders") is a


def test_readonly_roots_env_parsing():
    """Extra cache roots must be absolute and not '/': relative entries
    would silently never match the abspath'd probe (losing load-bearing
    memoization), '/' would re-enable caching for every sink path."""
    import pytest as _pt

    from kdb_spark.tables import _parse_roots

    assert _parse_roots("") == ()
    assert _parse_roots("/data/x:/data/y/") == ("/data/x/", "/data/y/")
    assert _parse_roots("/a//b/../c") == ("/a/c/",)
    for bad in ("testdata", "/", "//", "/.."):
        with _pt.raises(ValueError):
            _parse_roots(bad)


def test_versioned_table_time_travel(spark, tmp_path):
    """Manifest-logged versions: each commit is an immutable snapshot;
    time-travel returns exactly that snapshot, latest sees appends,
    overwrite resets the lineage, unknown versions raise."""
    from kdb_spark.sources import scan_version, sink_versioned

    path = str(tmp_path / "vt")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df2 = spark.createDataFrame([(3, "c")], "id long, v string")
    v0 = sink_versioned(df1, path, mode="overwrite")
    v1 = sink_versioned(df2, path, mode="append")
    assert (v0, v1) == (0, 1)
    assert sorted(r.id for r in scan_version(spark, path, 0).collect()) == [1, 2]
    assert sorted(r.id for r in scan_version(spark, path).collect()) == [1, 2, 3]
    # overwrite starts a fresh lineage but old snapshots stay readable
    v2 = sink_versioned(df2, path, mode="overwrite")
    assert sorted(r.id for r in scan_version(spark, path, v2).collect()) == [3]
    assert sorted(r.id for r in scan_version(spark, path, 1).collect()) == [1, 2, 3]
    import pytest as _pt

    with _pt.raises(ValueError):
        scan_version(spark, path, 99)


def test_versioned_commit_race_retries_next_slot(spark, tmp_path):
    """Two committers picking the same version N: data dirs are unique so
    in-flight writers never clobber each other, and the manifest's
    O_CREAT|O_EXCL makes exactly one win N — the loser retries at N+1 on
    a refreshed log, so neither manifest is silently replaced and no
    data dir is orphaned (ADVICE r9)."""
    import json
    import os

    from kdb_spark.sources import scan_version, sink_versioned

    path = str(tmp_path / "race")
    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    df2 = spark.createDataFrame([(2, "b")], "id long, v string")
    sink_versioned(df1, path, mode="overwrite")  # v0

    # simulate a competing committer that claims version 1 between our
    # log listing and our manifest link: the os.link claim of _log/1.json
    # lands AFTER the competitor's manifest exists → must raise and retry
    real_link = os.link
    state = {"fired": False}
    comp_rel = os.path.join("data", "competitor")

    def racing_link(src, dst, *a, **kw):
        if str(dst).endswith(os.path.join("_log", "1.json")) and not state["fired"]:
            state["fired"] = True
            with open(dst, "w") as fh:
                json.dump(
                    {"version": 1, "mode": "append",
                     "dirs": [comp_parent, comp_rel]},
                    fh,
                )
        return real_link(src, dst, *a, **kw)

    with open(os.path.join(path, "_log", "0.json")) as fh:
        comp_parent = json.load(fh)["dirs"][0]
    df1.write.parquet(os.path.join(path, comp_rel))
    os.link = racing_link
    try:
        n = sink_versioned(df2, path, mode="append")
    finally:
        os.link = real_link
    assert state["fired"] and n == 2
    # the competitor's v1 manifest survived untouched
    with open(os.path.join(path, "_log", "1.json")) as fh:
        assert json.load(fh)["dirs"] == [comp_parent, comp_rel]
    # our retry re-read the log: v2 = the COMPETITOR's chain + our dir
    with open(os.path.join(path, "_log", "2.json")) as fh:
        d2 = json.load(fh)["dirs"]
    assert d2[:2] == [comp_parent, comp_rel] and len(d2) == 3
    got = sorted(r.id for r in scan_version(spark, path, 2).collect())
    assert got == [1, 1, 2]  # v0 rows + competitor's copy + our append
    assert scan_version(spark, path, 0).count() == 1
    # the loser's private commit file was cleaned up, and nothing partial
    # ever carried a version name
    leftovers = [f for f in os.listdir(os.path.join(path, "_log"))
                 if not f.endswith(".json") or f.startswith(".")]
    assert leftovers == []


def test_upsert_replaces_matches_keeps_rest(spark, tmp_path):
    """MERGE semantics: matched keys replaced exactly once, unmatched
    survive, pure inserts append, and the pre-merge snapshot is still
    readable (rollback path)."""
    from kdb_spark.sources import scan_version, sink_upsert, sink_versioned

    path = str(tmp_path / "up")
    base = spark.createDataFrame(
        [(1, "old"), (2, "old"), (3, "old")], "id long, v string"
    )
    v0 = sink_versioned(base, path, mode="overwrite")
    inc = spark.createDataFrame([(2, "new"), (9, "new")], "id long, v string")
    v1 = sink_upsert(inc, path, key="id")
    got = {r.id: r.v for r in scan_version(spark, path, v1).collect()}
    assert got == {1: "old", 2: "new", 3: "old", 9: "new"}
    # time travel back to the pre-merge snapshot
    old = {r.id: r.v for r in scan_version(spark, path, v0).collect()}
    assert old == {1: "old", 2: "old", 3: "old"}


def test_upsert_rejects_duplicate_source_keys(spark, tmp_path):
    """MERGE contract: a duplicate-keyed increment must error loudly (real
    MERGE INTO errors on multiple source matches), never commit twice."""
    from kdb_spark.sources import scan_version, sink_upsert, sink_versioned

    path = str(tmp_path / "dup")
    sink_versioned(
        spark.createDataFrame([(1, "old")], "id long, v string"), path,
        mode="overwrite",
    )
    bad = spark.createDataFrame([(1, "a"), (1, "b")], "id long, v string")
    import pytest as _pt

    with _pt.raises(ValueError, match="multiple rows"):
        sink_upsert(bad, path, key="id")
    # table unchanged: still exactly version 0
    assert [r.v for r in scan_version(spark, path).collect()] == ["old"]


def test_split_dirs_pruning_decision():
    """The partition-pruning decision for a scoped MERGE, as a pure
    function: mapped-untouched dirs carry, mapped-touched and UNMAPPED
    (legacy, mixed-partition) dirs are scanned."""
    from kdb_spark.sources import _split_dirs

    dirs = ["d0", "d1", "d2", "legacy"]
    parts = {"d0": "0", "d1": "1", "d2": "2"}
    affected, untouched = _split_dirs(dirs, parts, {"1"})
    assert affected == ["d1", "legacy"]
    assert untouched == ["d0", "d2"]
    # no partition map at all → everything is affected (full-scan merge)
    affected, untouched = _split_dirs(dirs[:1], {}, {"1"})
    assert (affected, untouched) == (["d0"], [])


def test_upsert_partition_scoped_prunes_untouched_dirs(spark, tmp_path):
    """The 100 TB contract: a scoped merge touching one partition carries
    every other partition's dir into the new manifest VERBATIM (same dir
    string — no read, no rewrite; manifest-level pruning is stronger than
    a pushed filter because the untouched files are never even listed),
    and lands exactly one new dir for the touched partition."""
    import json
    import os

    from kdb_spark.sources import scan_version, sink_upsert

    path = str(tmp_path / "scoped")
    base = spark.createDataFrame(
        [(1, 0, "old"), (2, 1, "old"), (3, 2, "old")],
        "id long, day int, v string",
    )
    # bootstrap scoped upsert creates the table with one dir per day
    v0 = sink_upsert(base, path, key="id", part_col="day")
    with open(os.path.join(path, "_log", f"{v0}.json")) as fh:
        m0 = json.load(fh)
    assert sorted(m0["parts"].values()) == ["0", "1", "2"]

    inc = spark.createDataFrame(
        [(2, 1, "new"), (9, 1, "new")], "id long, day int, v string"
    )
    v1 = sink_upsert(inc, path, key="id", part_col="day")
    with open(os.path.join(path, "_log", f"{v1}.json")) as fh:
        m1 = json.load(fh)
    untouched0 = {d for d, p in m0["parts"].items() if p != "1"}
    # days 0 and 2: identical dir strings carried from v0
    assert untouched0 < set(m1["dirs"])
    # day 1: exactly one NEW dir, absent from v0
    fresh = set(m1["dirs"]) - set(m0["dirs"])
    assert len(fresh) == 1 and m1["parts"][next(iter(fresh))] == "1"
    got = {r.id: r.v for r in scan_version(spark, path, v1).collect()}
    assert got == {1: "old", 2: "new", 3: "old", 9: "new"}
    # time travel to the pre-merge snapshot still works
    assert {r.id for r in scan_version(spark, path, v0).collect()} == {1, 2, 3}


def test_upsert_scoped_never_reads_untouched_partitions(spark, tmp_path):
    """Hard proof the survivors scan is partition-pruned: the untouched
    partitions' data files are made UNREADABLE (chmod 000) for the
    duration of the merge — if the merge listed or read them, the write
    job would fail. Stronger than a plan assertion: the files are
    physically inaccessible."""
    import json
    import os
    import stat

    from kdb_spark.sources import scan_version, sink_upsert

    path = str(tmp_path / "noread")
    base = spark.createDataFrame(
        [(1, 0, "old"), (2, 1, "old"), (3, 2, "old")],
        "id long, day int, v string",
    )
    v0 = sink_upsert(base, path, key="id", part_col="day")
    with open(os.path.join(path, "_log", f"{v0}.json")) as fh:
        m0 = json.load(fh)
    locked = [
        os.path.join(path, d) for d, p in m0["parts"].items() if p != "1"
    ]
    try:
        for d in locked:
            os.chmod(d, 0)
        inc = spark.createDataFrame([(2, 1, "new")], "id long, day int, v string")
        v1 = sink_upsert(inc, path, key="id", part_col="day")
    finally:
        for d in locked:
            os.chmod(d, stat.S_IRWXU)
    got = {r.id: r.v for r in scan_version(spark, path, v1).collect()}
    assert got == {1: "old", 2: "new", 3: "old"}


def test_upsert_scoped_converges_legacy_dir(spark, tmp_path):
    """A legacy sink_versioned seed (one mixed-partition dir, no map) is
    split into per-partition dirs by its first scoped merge, and the
    scoped match condition (part_col, key) means a key match in an
    UNTOUCHED partition is preserved, not replaced."""
    import json
    import os

    from kdb_spark.sources import scan_version, sink_upsert, sink_versioned

    path = str(tmp_path / "legacy")
    base = spark.createDataFrame(
        [(1, 0, "old"), (2, 1, "old")], "id long, day int, v string"
    )
    sink_versioned(base, path, mode="overwrite")
    # increment carries key=1 but in day=1: day=0's key=1 row must survive
    # (scoped merges match within the partition only)
    inc = spark.createDataFrame(
        [(1, 1, "new"), (2, 1, "new")], "id long, day int, v string"
    )
    v1 = sink_upsert(inc, path, key="id", part_col="day")
    rows = {(r.id, r.day): r.v for r in scan_version(spark, path, v1).collect()}
    assert rows == {(1, 0): "old", (2, 1): "new", (1, 1): "new"}
    with open(os.path.join(path, "_log", f"{v1}.json")) as fh:
        m1 = json.load(fh)
    # converged: every dir now carries a partition mapping
    assert set(m1["dirs"]) == set(m1["parts"])


def test_upsert_scoped_null_partition(spark, tmp_path):
    """NULL partition values route through the hive default-partition
    sentinel and merge correctly."""
    from kdb_spark.sources import scan_version, sink_upsert

    path = str(tmp_path / "nullpart")
    base = spark.createDataFrame(
        [(1, None, "old"), (2, 5, "old")], "id long, day int, v string"
    )
    sink_upsert(base, path, key="id", part_col="day")
    inc = spark.createDataFrame([(1, None, "new")], "id long, day int, v string")
    v1 = sink_upsert(inc, path, key="id", part_col="day")
    got = {r.id: (r.day, r.v) for r in scan_version(spark, path, v1).collect()}
    assert got == {1: (None, "new"), 2: (5, "old")}


def test_versioned_append_inherits_partition_map(spark, tmp_path):
    """A plain append after a scoped upsert keeps the parent's partition
    map, so the NEXT scoped merge still prunes the mapped dirs and only
    full-scans the one appended (unmapped) dir."""
    import json
    import os

    from kdb_spark.sources import sink_upsert, sink_versioned

    path = str(tmp_path / "appmap")
    base = spark.createDataFrame(
        [(1, 0, "a"), (2, 1, "a")], "id long, day int, v string"
    )
    sink_upsert(base, path, key="id", part_col="day")
    extra = spark.createDataFrame([(3, 2, "a")], "id long, day int, v string")
    v = sink_versioned(extra, path, mode="append")
    with open(os.path.join(path, "_log", f"{v}.json")) as fh:
        m = json.load(fh)
    assert len(m["parts"]) == 2 and len(m["dirs"]) == 3


def test_scan_version_empty_log_raises(spark, tmp_path):
    """An uninitialized or manifest-less table raises the descriptive
    error, not IndexError/FileNotFoundError."""
    import os

    from kdb_spark.sources import scan_version

    import pytest as _pt

    with _pt.raises(ValueError, match="missing _log"):
        scan_version(spark, str(tmp_path / "nope"))
    empty = tmp_path / "empty"
    os.makedirs(empty / "_log")
    with _pt.raises(ValueError, match="no committed version"):
        scan_version(spark, str(empty))


def test_partitioned_sink_prunes_and_restates_one_day(spark, tmp_path):
    """sink_partitioned's two promises: (1) a day-filtered read-back scan
    prunes at the directory level (PartitionFilters carries the day
    predicate, partitions read ≪ partitions written); (2) a dynamic
    overwrite of one day leaves every other day's rows untouched."""
    from pyspark.sql import functions as F

    from kdb_spark import sources as src
    from kdb_spark.tables import DAY_US, events_us
    from tests.conftest import SF_DIR

    ev = events_us(spark, SF_DIR).select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
        (F.col("ts_us") / F.lit(DAY_US)).cast("long").alias("day_idx"),
    )
    path = str(tmp_path / "daypart")
    src.sink_partitioned(ev, path, "day_idx")
    before = sorted(
        tuple(r)
        for r in spark.read.parquet(path).filter("day_idx != 19735").collect()
    )

    restated = ev.filter(F.col("day_idx") == 19735).withColumn(
        "value_c", F.col("value_c") * F.lit(2)
    )
    src.sink_partitioned(restated, path, "day_idx")

    back = spark.read.parquet(path)
    after = sorted(
        tuple(r) for r in back.filter("day_idx != 19735").collect()
    )
    assert after == before  # dynamic overwrite touched one directory only
    # the restated day really was rewritten
    got = back.filter("day_idx = 19735").agg(F.sum("value_c")).first()[0]
    want = (
        ev.filter("day_idx = 19735").agg(F.sum(F.col("value_c") * 2)).first()[0]
    )
    assert got == want

    q = back.filter(F.col("day_idx").between(19734, 19736))
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PartitionFilters" in plan and "day_idx" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]


def test_scan_changes_reads_only_the_increment(spark, tmp_path):
    """CDF semantics: the v0→v1 diff is exactly the append increment; the
    to-latest diff accumulates later appends; an empty diff is zero rows
    with the snapshot schema; an overwrite starts a fresh lineage whose
    diff is the replacement; bad version ranges raise."""
    import pytest as _pt

    from kdb_spark.sources import scan_changes, sink_versioned

    path = str(tmp_path / "cdf")
    mk = lambda ids: spark.createDataFrame([(i, "x") for i in ids],
                                           "id long, v string")
    v0 = sink_versioned(mk([1, 2]), path, mode="overwrite")
    v1 = sink_versioned(mk([3]), path, mode="append")
    v2 = sink_versioned(mk([4]), path, mode="append")
    assert sorted(r.id for r in scan_changes(spark, path, v0, v1).collect()) == [3]
    assert sorted(r.id for r in scan_changes(spark, path, v0).collect()) == [3, 4]
    empty = scan_changes(spark, path, v1, v1)
    assert empty.count() == 0 and empty.columns == ["id", "v"]
    v3 = sink_versioned(mk([9]), path, mode="overwrite")
    assert sorted(r.id for r in scan_changes(spark, path, v1, v3).collect()) == [9]
    with _pt.raises(ValueError):
        scan_changes(spark, path, v2, v1)
    with _pt.raises(ValueError):
        scan_changes(spark, path, 99)


def test_sink_scd2_full_lifecycle(spark, tmp_path):
    """SCD2 merge: unchanged keeps its open row, changed closes at eff_ts
    and reopens, absent closes, new opens; closed history is immutable."""
    p = str(tmp_path / "scd2")
    snap1 = spark.createDataFrame(
        [(1, "A", 10), (2, "A", 20), (3, "B", 30)],
        "k long, seg string, bal long",
    )
    src.sink_scd2(snap1, p, key="k", eff_ts=100)
    snap2 = spark.createDataFrame(
        [(1, "A", 10), (2, "C", 20), (4, "B", 40)],  # 2 changed, 3 gone, 4 new
        "k long, seg string, bal long",
    )
    src.sink_scd2(snap2, p, key="k", eff_ts=200)
    hist = {
        (r.k, r.valid_from): r for r in src.scan_version(spark, p).collect()
    }
    assert len(hist) == 5
    assert hist[(1, 100)].valid_to is None and hist[(1, 100)].seg == "A"
    assert hist[(2, 100)].valid_to == 200 and hist[(2, 100)].seg == "A"
    assert hist[(2, 200)].valid_to is None and hist[(2, 200)].seg == "C"
    assert hist[(3, 100)].valid_to == 200
    assert hist[(4, 200)].valid_to is None and hist[(4, 200)].bal == 40


def test_vacuum_sweeps_superseded_leafs_in_partial_roots(spark, tmp_path):
    """A partition-scoped merge pins only SOME __pc= leaf dirs of the
    parent's data root; once the parent version expires, the superseded
    sibling leaf dirs inside that partially-referenced root must be
    reclaimed too — the second storage-leak class on long-lived
    partition-scoped tables (the first is whole unreferenced roots)."""
    import json
    import os

    from kdb_spark.sources import scan_version, sink_upsert, sink_vacuum

    path = str(tmp_path / "partial")
    base = spark.createDataFrame(
        [(1, 0, "old"), (2, 1, "old"), (3, 2, "old")],
        "id long, day int, v string",
    )
    v0 = sink_upsert(base, path, key="id", part_col="day")
    inc = spark.createDataFrame([(2, 1, "new")], "id long, day int, v string")
    v1 = sink_upsert(inc, path, key="id", part_col="day")
    with open(os.path.join(path, "_log", f"{v0}.json")) as fh:
        m0 = json.load(fh)
    superseded = next(d for d, p in m0["parts"].items() if p == "1")
    kept = sorted(d for d, p in m0["parts"].items() if p != "1")
    stats = sink_vacuum(path, keep_last=1)
    # v0 expired; its day=1 leaf is superseded by v1's — reclaimed even
    # though the day=0/2 siblings in the same root stay live
    assert stats["versions_removed"] == 1 and stats["dirs_removed"] == 1
    assert not os.path.exists(os.path.join(path, superseded))
    for d in kept:
        assert os.path.isdir(os.path.join(path, d))
    got = {r.id: r.v for r in scan_version(spark, path, v1).collect()}
    assert got == {1: "old", 2: "new", 3: "old"}
    # idempotent
    assert sink_vacuum(path, keep_last=1)["dirs_removed"] == 0


def test_upsert_conflict_on_concurrent_commit(spark, tmp_path, monkeypatch):
    """Optimistic-concurrency: a commit landing between sink_upsert's
    snapshot read and its version claim must raise ConcurrentWriteError,
    never silently commit a manifest planned against the stale snapshot
    (the concurrent commit's dirs would vanish from the dir list — a
    lost update)."""
    import json
    import os

    import pytest as _pt

    from kdb_spark import sources as srcmod
    from kdb_spark.errors import ConcurrentWriteError

    path = str(tmp_path / "conflict")
    base = spark.createDataFrame(
        [(1, 0, "old"), (2, 1, "old")], "id long, day int, v string"
    )
    sink_upsert = srcmod.sink_upsert
    sink_upsert(base, path, key="id", part_col="day")

    real_claim = srcmod._claim_version

    def racing_claim(p, make_manifest):
        # simulate another writer winning the race: append a commit to
        # the log AFTER this merge planned its dir list but BEFORE it
        # claims a version
        log_dir = os.path.join(p, "_log")
        versions = sorted(
            int(f.split(".")[0])
            for f in os.listdir(log_dir)
            if f.endswith(".json") and not f.startswith(".")
        )
        n = versions[-1] + 1
        with open(os.path.join(log_dir, f"{n}.json"), "w") as fh:
            json.dump({"version": n, "mode": "append", "dirs": [], "parts": {}}, fh)
        return real_claim(p, make_manifest)

    monkeypatch.setattr(srcmod, "_claim_version", racing_claim)
    inc = spark.createDataFrame([(2, 1, "new")], "id long, day int, v string")
    with _pt.raises(ConcurrentWriteError, match="committed\n?.*concurrently"):
        srcmod.sink_upsert(inc, path, key="id", part_col="day")


def test_scan_csv_malformed_quarantines_type_failures(spark, tmp_path):
    """PERMISSIVE fine print pinned under a FULL-column read: type
    failures, short rows, and extra-column rows all quarantine with the
    raw line in _corrupt_record, retaining whatever fields converted
    (a pruned projection would reclassify the token-count anomalies as
    good — the plan-dependence q_scan_csv_malformed documents)."""
    from pyspark.sql import types as T

    from kdb_spark.sources import scan_csv_malformed

    p = tmp_path / "feed"
    p.mkdir()
    (p / "f.csv").write_text(
        "1,a,2.5\nbad,a,1.0\n2,b\n3,c,4.0,extra\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("etype", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    rows = {tuple(r) for r in scan_csv_malformed(spark, str(p), schema).collect()}
    # quarantined rows RETAIN their successfully-converted fields
    assert rows == {
        (1, "a", 2.5, None),
        (None, "a", 1.0, "bad,a,1.0"),
        (2, "b", None, "2,b"),
        (3, "c", 4.0, "3,c,4.0,extra"),
    }


def test_torn_manifest_fails_loudly_and_is_version_scoped(spark, tmp_path):
    """Corrupt-manifest parity (VERDICT r15 #6; reference
    `mindex/mindex.go:198-210` + `mindex_test.go:84-107`: a truncated/
    overrun index element errors the load — corruption is detected, never
    silently served). Engine analog: truncating or garbling one {n}.json
    raises CorruptManifestError from EVERY reader (scan_version,
    scan_changes, scan_history, append-on-top, vacuum), while intact
    sibling versions stay readable by explicit pin — corruption is
    per-manifest, never table-poisoning."""
    import os

    import pytest as _pt

    from kdb_spark.errors import CorruptManifestError
    from kdb_spark.sources import (
        scan_changes,
        scan_history,
        scan_version,
        sink_vacuum,
        sink_versioned,
    )

    path = str(tmp_path / "vt")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df2 = spark.createDataFrame([(3, "c")], "id long, v string")
    sink_versioned(df1, path, mode="overwrite")  # v0
    sink_versioned(df2, path, mode="append")  # v1
    sink_versioned(df2, path, mode="append")  # v2

    m1 = os.path.join(path, "_log", "1.json")
    intact = open(m1).read()

    # --- truncated JSON (torn write / disk corruption)
    with open(m1, "w") as fh:
        fh.write(intact[: len(intact) // 2])
    for reader in (
        lambda: scan_version(spark, path, 1),
        lambda: scan_changes(spark, path, 0, 1),
        lambda: scan_history(spark, path),
        lambda: sink_vacuum(path, keep_last=3),
    ):
        with _pt.raises(CorruptManifestError):
            reader()
    # version-scoped: intact snapshots stay readable by explicit pin
    assert sorted(r.id for r in scan_version(spark, path, 0).collect()) == [1, 2]
    assert scan_version(spark, path, 2).count() == 4

    # --- valid JSON, garbled shape (dirs missing / version mismatch)
    with open(m1, "w") as fh:
        fh.write('{"version": 7, "mode": "append"}')
    with _pt.raises(CorruptManifestError):
        scan_version(spark, path, 1)

    # --- appending on top of a torn LATEST manifest must refuse, not
    # bake the corruption into the child manifest
    m2 = os.path.join(path, "_log", "2.json")
    with open(m2, "w") as fh:
        fh.write("{not json")
    with _pt.raises(CorruptManifestError):
        sink_versioned(df2, path, mode="append")

    # --- vacuum aborts BEFORE deleting anything it cannot prove dead:
    # every committed manifest and every data dir survives the failure
    logs_before = sorted(os.listdir(os.path.join(path, "_log")))
    data_before = sorted(os.listdir(os.path.join(path, "data")))
    with _pt.raises(CorruptManifestError):
        sink_vacuum(path, keep_last=3)
    assert sorted(os.listdir(os.path.join(path, "_log"))) == logs_before
    assert sorted(os.listdir(os.path.join(path, "data"))) == data_before

    # --- repair (restore the intact bytes) fully recovers both versions
    with open(m1, "w") as fh:
        fh.write(intact)
    with open(m2, "w") as fh:
        fh.write(intact.replace('"version": 1', '"version": 2'))
    assert scan_version(spark, path, 1).count() == 3
