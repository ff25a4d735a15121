"""Golden-semantics tests ported from the reference test suite.

Canonical config (`dbase/dbase_test.go:28-36`): IndexDepth 4, PayloadSize 4,
BucketDuration 1000, Resolution 10; virtual clock pinned at 11999 → hot range
[10000, 12000), cold below 10000, future ≥ 12000
(`dbase/dbase_test.go:13-21`). See FIXTURES.md §A.
"""

import pytest

from kdb_spark import (
    ColdWriteError,
    FutureTimestampError,
    HotBucketRemoveError,
    RangeError,
    StoreConfig,
    TimeSeriesStore,
    ValidationError,
)

NOW = 11999
P0 = bytes(4)
PA = bytes([1, 2, 3, 4])
PB = bytes([5, 6, 7, 8])


@pytest.fixture()
def store(spark, tmp_path):
    cfg = StoreConfig(
        database_name="golden",
        data_path=str(tmp_path),
        index_depth=4,
        payload_size=4,
        bucket_duration=1000,
        resolution=10,
    )
    return TimeSeriesStore(spark, cfg)


def seeded(store):
    # cold epochs written while they were hot (virtual clock, dbase_test.go:44-57)
    store.put_batch([(3030, "a", "b", "c", "d", bytes([3, 0, 3, 0]))], now=3999)
    store.put_batch([(6060, "a", "b", "c", "d", bytes([6, 0, 6, 0]))], now=6999)
    store.put_batch(
        [
            (10990, "a", "b", "c", "d", PA),
            (11000, "a", "b", "c", "e", PB),
        ],
        now=NOW,
    )
    return store


def payloads(df):
    return [bytes(r["payload"]) for r in df.collect()]


# ---------------------------------------------------------------- get

def test_get_dense_end_exclusive(store):
    """`dbase/dbase_test.go:170-179`: exactly (end-start)/res slots."""
    seeded(store)
    out = store.get(10990, 11010, ["a", "b", "c", "d"], now=NOW)
    assert payloads(out) == [PA, P0]


def test_get_zero_fill_between_points(store):
    seeded(store)
    out = store.get(10980, 11010, ["a", "b", "c", "e"], now=NOW)
    assert payloads(out) == [P0, P0, PB]


def test_get_absent_series_is_zeros_not_error(store):
    """`dbase/dbase.go:216-225`."""
    seeded(store)
    out = store.get(10990, 11010, ["x", "y", "z", "w"], now=NOW)
    assert payloads(out) == [P0, P0]


def test_get_spans_missing_buckets(store):
    """bucket 4000..9999 has no data → zeros (`dbase/dbase.go:208-225`)."""
    seeded(store)
    out = store.get(3020, 3050, ["a", "b", "c", "d"], now=NOW)
    assert payloads(out) == [P0, bytes([3, 0, 3, 0]), P0]


def test_get_floors_to_resolution(store):
    seeded(store)
    out = store.get(10993, 11013, ["a", "b", "c", "d"], now=NOW)
    # floors to [10990, 11010) → 2 slots
    assert payloads(out) == [PA, P0]


def test_get_validation(store):
    seeded(store)
    with pytest.raises(RangeError):
        store.get(11010, 10990, ["a", "b", "c", "d"], now=NOW)  # end < start
    with pytest.raises(RangeError):
        store.get(12500, 12600, ["a", "b", "c", "d"], now=NOW)  # start > now
    with pytest.raises(RangeError):
        store.get(11000, 13000, ["a", "b", "c", "d"], now=NOW)  # end-res > now
    with pytest.raises(RangeError):
        # `dbase_test.go:268-276`: Get(now-9, now+1) must error — end passes
        # now (the open slot is not readable); Get's source check would admit
        # this, its test does not; we follow the test.
        store.get(NOW - 9, NOW + 1, ["a", "b", "c", "d"], now=NOW)
    with pytest.raises(ValidationError):
        store.get(10990, 11010, ["a", "b", "c"], now=NOW)  # arity


# ---------------------------------------------------------------- put

def test_put_future_rejected(store):
    with pytest.raises(FutureTimestampError):
        store.put_batch([(12000, "a", "b", "c", "d", PA)], now=NOW)


def test_put_at_now_allowed(store):
    """ts floors to the open slot; only ts > now (post-floor) is future
    (`dbase/dbase.go:127-132` — floor happens before the future check)."""
    store.put_batch([(NOW, "a", "b", "c", "d", PA)], now=NOW)
    out = store.get(11980, 11990, ["a", "b", "c", "d"], now=NOW)
    assert payloads(out) == [P0]  # written slot [11990,12000) not readable yet


def test_put_cold_rejected(store):
    """ts 9999 at now 11999 → bucket 9000 is cold (`dbase_test.go:188-191`)."""
    with pytest.raises(ColdWriteError):
        store.put_batch([(9999, "a", "b", "c", "d", PA)], now=NOW)


def test_put_empty_tag_rejected(store):
    with pytest.raises(ValidationError):
        store.put_batch([(11000, "a", "", "c", "d", PA)], now=NOW)


def test_put_bad_payload_rejected(store):
    with pytest.raises(ValidationError):
        store.put_batch([(11000, "a", "b", "c", "d", bytes(3))], now=NOW)


def test_put_floors_ts(store):
    store.put_batch([(11004, "a", "b", "c", "d", PA)], now=NOW)
    out = store.get(11000, 11010, ["a", "b", "c", "d"], now=NOW)
    assert payloads(out) == [PA]


def test_last_write_wins(store):
    """`dblock/dblock.go:198-205`: in-place overwrite per (series, slot)."""
    store.put_batch([(11000, "a", "b", "c", "d", PA)], now=NOW)
    store.put_batch([(11000, "a", "b", "c", "d", PB)], now=NOW)
    out = store.get(11000, 11010, ["a", "b", "c", "d"], now=NOW)
    assert payloads(out) == [PB]


# ---------------------------------------------------------------- find

def test_find_wildcard_tail(store):
    """`dbase/dbase_test.go:304-341`: both series, zero-filled."""
    seeded(store)
    out = store.find(10990, 11010, ["a", "b", "c", ""], now=NOW)
    rows = out.collect()
    by_series = {}
    for r in rows:
        by_series.setdefault(tuple(r[t] for t in ("tag1", "tag2", "tag3", "tag4")), []).append(
            (r["ts"], bytes(r["payload"]))
        )
    assert set(by_series) == {("a", "b", "c", "d"), ("a", "b", "c", "e")}
    assert by_series[("a", "b", "c", "d")] == [(10990, PA), (11000, P0)]
    assert by_series[("a", "b", "c", "e")] == [(10990, P0), (11000, PB)]


def test_find_wildcard_middle(store):
    """`mindex/mindex_test.go:175-199`: [a,b,"",d] matches exactly 2 of 3."""
    store.put_batch(
        [
            (11000, "a", "b", "c", "d", PA),
            (11000, "a", "b", "c", "e", PB),
            (11000, "a", "b", "f", "d", PB),
        ],
        now=NOW,
    )
    out = store.find(11000, 11010, ["a", "b", "", "d"], now=NOW)
    series = {tuple(r[t] for t in ("tag1", "tag2", "tag3", "tag4")) for r in out.collect()}
    assert series == {("a", "b", "c", "d"), ("a", "b", "f", "d")}


def test_find_only_existing_series(store):
    """series with no point in any scanned bucket are absent
    (`dbase/dbase.go:256-262`)."""
    seeded(store)
    out = store.find(3000, 3050, ["a", "b", "c", ""], now=NOW)
    series = {tuple(r[t] for t in ("tag1", "tag2", "tag3", "tag4")) for r in out.collect()}
    assert series == {("a", "b", "c", "d")}  # only the cold-epoch writer


def test_find_boundary_bucket_presence(store):
    """When `end` is exactly a bucket base, the reference's find loop still
    consults that bucket (`t <= be`, `dbase/dbase.go:247,256`) and registers
    its series with all-zero payloads within the clamped range."""
    seeded(store)
    # end=11000 == base of the bucket holding ("a","b","c","e")'s only point;
    # its data row (ts=11000) is excluded by ts < end but the series appears.
    out = store.find(10980, 11000, ["a", "b", "c", ""], now=NOW)
    by_series = {}
    for r in out.collect():
        by_series.setdefault(
            tuple(r[t] for t in ("tag1", "tag2", "tag3", "tag4")), []
        ).append((r["ts"], bytes(r["payload"])))
    assert set(by_series) == {("a", "b", "c", "d"), ("a", "b", "c", "e")}
    assert by_series[("a", "b", "c", "e")] == [(10980, P0), (10990, P0)]
    assert by_series[("a", "b", "c", "d")] == [(10980, P0), (10990, PA)]


def test_intra_batch_last_write_wins_row_order(store):
    """Two same-(series, slot) writes in ONE batch: the later row wins,
    matching the reference's sequential Put loop (`dblock/dblock.go:198-205`).
    Rank = struct(ingest_seq, row_seq) — full 64-bit monotonic id, no modulo
    aliasing (partition-major == input row order)."""
    store.put_batch(
        [
            (11000, "a", "b", "c", "d", PA),
            (11000, "a", "b", "c", "d", PB),
        ],
        now=NOW,
    )
    out = store.get(11000, 11010, ["a", "b", "c", "d"], now=NOW)
    assert payloads(out) == [PB]


def test_put_invalid_batch_writes_nothing(store):
    """All-or-nothing ingest: a batch with one bad row publishes zero rows
    (staging commit only after validation passes)."""
    with pytest.raises(ValidationError):
        store.put_batch(
            [
                (11000, "a", "b", "c", "d", PA),
                (11010, "a", "", "c", "d", PB),
            ],
            now=NOW,
        )
    out = store.get(11000, 11020, ["a", "b", "c", "d"], now=NOW)
    assert payloads(out) == [P0, P0]


def test_find_validation(store):
    seeded(store)
    with pytest.raises(RangeError):
        store.find(11000, 13000, ["a", "b", "c", ""], now=NOW)  # end > now


def test_compact_preserves_lww(store):
    """Compaction rewrites a bucket's files without changing visibility:
    the LWW winner and zero-fill are identical before and after."""
    store.put_batch([(11000, "a", "b", "c", "d", PA)], now=NOW)
    store.put_batch([(11000, "a", "b", "c", "d", PB)], now=NOW)
    store.put_batch([(11010, "a", "b", "c", "e", PA)], now=NOW)
    assert store.compact(11000) >= 2  # one file per batch before compaction
    out = store.get(11000, 11020, ["a", "b", "c", "d"], now=NOW)
    assert payloads(out) == [PB, P0]
    out = store.get(11000, 11020, ["a", "b", "c", "e"], now=NOW)
    assert payloads(out) == [P0, PA]


# ---------------------------------------------------------------- retention

def test_remove_before_hot_refused(store):
    """`dbase/dbase_test.go:343-389`: 10001 > oldest hot base 10000 → error."""
    seeded(store)
    with pytest.raises(HotBucketRemoveError):
        store.remove_before(10001, now=NOW)


def test_remove_before_cold_then_zeros(store):
    seeded(store)
    assert store.remove_before(4000, now=NOW) == 1
    out = store.get(3030, 3040, ["a", "b", "c", "d"], now=NOW)
    assert payloads(out) == [P0]
    # untouched buckets still intact
    out = store.get(6060, 6070, ["a", "b", "c", "d"], now=NOW)
    assert payloads(out) == [bytes([6, 0, 6, 0])]


# ---------------------------------------------------------------- crash safety

def _crashing_replace(monkeypatch, fail_on_call: int):
    """Make kdb_spark.store's os.replace raise on its Nth call (1-based)."""
    import kdb_spark.store as storemod

    real = storemod.os.replace
    calls = {"n": 0}

    def boom(src, dst):
        calls["n"] += 1
        if calls["n"] == fail_on_call:
            raise OSError("injected crash")
        return real(src, dst)

    monkeypatch.setattr(storemod.os, "replace", boom)
    return calls


def test_crash_before_commit_record_leaves_batch_invisible(store, monkeypatch):
    """A crash during the hidden-move phase (before the manifest exists) must
    leave the batch completely invisible — not a torn prefix — and recovery
    on reopen GCs the orphans (`mindex/mindex.go:187-240`: un-logged tail
    never existed)."""
    store.put_batch([(11000, "a", "b", "c", "d", PA)], now=NOW)
    with pytest.raises(OSError, match="injected crash"):
        # batch spans two buckets -> >=2 hidden moves; fail the second
        _crashing_replace(monkeypatch, 2)
        store.put_batch(
            [(10990, "a", "b", "c", "d", PB), (11000, "a", "b", "c", "e", PB)],
            now=NOW,
        )
    monkeypatch.undo()
    # the crashed batch is invisible; the earlier batch is intact
    out = store.get(10990, 11010, ["a", "b", "c", "d"], now=NOW)
    assert payloads(out) == [P0, PA]
    out = store.get(10990, 11010, ["a", "b", "c", "e"], now=NOW)
    assert payloads(out) == [P0, P0]
    # reopen: recovery removes the hidden orphans
    reopened = TimeSeriesStore(store.spark, store.config)
    import os as _os

    for entry in _os.listdir(reopened.path):
        if entry.startswith("bucket_ts="):
            parts = _os.listdir(_os.path.join(reopened.path, entry))
            assert not any(p.startswith("_b") for p in parts), parts


def test_crash_after_commit_record_is_replayed_forward(store, monkeypatch):
    """A crash during the unhide phase (manifest already fsynced) must not
    tear the batch: the next read replays the manifest and sees ALL rows."""
    import kdb_spark.store as storemod

    with pytest.raises(OSError, match="injected crash"):
        # calls: 2 hidden moves, manifest publish (3), then unhides (4, 5);
        # fail the LAST unhide -> one file visible, one still hidden
        _crashing_replace(monkeypatch, 5)
        store.put_batch(
            [(10990, "a", "b", "c", "d", PA), (11000, "a", "b", "c", "e", PB)],
            now=NOW,
        )
    monkeypatch.undo()
    import os as _os

    assert any(
        e.endswith(".manifest.json") for e in _os.listdir(store.path)
    ), "commit record must survive the crash"
    # first read after the crash: forward replay -> the whole batch visible
    out = store.get(10990, 11010, ["a", "b", "c", "d"], now=NOW)
    assert payloads(out) == [PA, P0]
    out = store.get(10990, 11010, ["a", "b", "c", "e"], now=NOW)
    assert payloads(out) == [P0, PB]
    assert not any(
        e.endswith(".manifest.json") for e in _os.listdir(store.path)
    )


# ---------------------------------------------------------------- hot cache

def test_hot_range_get_uses_pinned_cache(store):
    """SURVEY §7.6: the hot window (last max_hot_buckets partitions) is
    served from a persisted tier on repeated reads — the `persist()` analog
    of the reference's mmap+mlock hot buckets (`dblock/dblock.go:283-293`)
    — and the pin is dropped (plan reverts to a parquet scan) after
    retention invalidates it."""
    seeded(store)
    store.get(10980, 11000, ["a", "b", "c", "d"], now=NOW).collect()  # warm
    df = store.get(10980, 11000, ["a", "b", "c", "d"], now=NOW)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, plan
    # correctness through the cached tier
    assert payloads(df) == [P0, PA]
    # cold-only reads don't touch the hot tier's pin requirement
    out = store.get(3030, 3040, ["a", "b", "c", "d"], now=NOW)
    assert payloads(out) == [bytes([3, 0, 3, 0])]
    # retention invalidates the pin; next read rebuilds against the new file set
    store.remove_before(4000, now=NOW)
    assert store._hot_df is None
    out = store.get(10980, 11000, ["a", "b", "c", "d"], now=NOW)
    assert payloads(out) == [P0, PA]


def test_compact_crash_before_manifest_keeps_old_files(store, monkeypatch):
    """A crash while moving compacted files (before the commit record) must
    leave the bucket exactly as it was; reopen GCs the hidden orphans."""
    store.put_batch([(11000, "a", "b", "c", "d", PA)], now=NOW)
    store.put_batch([(11000, "a", "b", "c", "d", PB)], now=NOW)
    with pytest.raises(OSError, match="injected crash"):
        # compact: _next_batch_seq uses 1 os.replace (seq publish), then the
        # first hidden move is call 2 — fail there
        _crashing_replace(monkeypatch, 2)
        store.compact(11000)
    monkeypatch.undo()
    out = store.get(11000, 11010, ["a", "b", "c", "d"], now=NOW)
    assert payloads(out) == [PB]  # LWW intact, nothing lost
    reopened = TimeSeriesStore(store.spark, store.config)
    import os as _os

    bucket = _os.path.join(reopened.path, "bucket_ts=11000")
    assert not any(p.startswith("_c") for p in _os.listdir(bucket))
    out = reopened.get(11000, 11010, ["a", "b", "c", "d"], now=NOW)
    assert payloads(out) == [PB]


def test_compact_crash_after_manifest_converges_without_duplicates(
    store, monkeypatch
):
    """A crash mid-swap (manifest fsynced, unhide/delete unfinished) must
    converge on the next read: compacted data visible exactly once."""
    store.put_batch([(11000, "a", "b", "c", "d", PA)], now=NOW)
    store.put_batch([(11000, "a", "b", "c", "d", PB)], now=NOW)
    import os as _os

    bucket = _os.path.join(store.path, "bucket_ts=11000")
    n_old = len([f for f in _os.listdir(bucket) if not f.startswith(("_", "."))])
    assert n_old >= 2
    # calls: seq publish (1), hidden moves (2..k), manifest publish, then
    # replay renames — fail on the LAST replay rename/delete boundary by
    # failing the first post-manifest unhide
    with pytest.raises(OSError, match="injected crash"):
        _crashing_replace(monkeypatch, 4)
        store.compact(11000)
    monkeypatch.undo()
    assert any(
        e.endswith(".manifest.json") for e in _os.listdir(store.path)
    ), "commit record must survive"
    # next read replays: compacted bucket, no duplicate rows, LWW preserved
    out = store.get(11000, 11010, ["a", "b", "c", "d"], now=NOW)
    assert payloads(out) == [PB]
    files = [f for f in _os.listdir(bucket) if not f.startswith(("_", "."))]
    assert len(files) < n_old or all(f.startswith("c") for f in files)


# ----------------------------------------------------------- snapshot reads


def test_as_of_sees_pre_overwrite_value(store):
    """Time travel: an LWW overwrite in a later batch is invisible at the
    earlier snapshot; the current read sees the overwrite."""
    seeded(store)
    v1 = store.current_seq()
    store.put_batch([(10990, "a", "b", "c", "d", bytes([9, 9, 9, 9]))], now=NOW)
    assert store.current_seq() == v1 + 1
    assert payloads(store.get(10990, 11000, ["a", "b", "c", "d"], now=NOW)) == [
        bytes([9, 9, 9, 9])
    ]
    assert payloads(
        store.get(10990, 11000, ["a", "b", "c", "d"], now=NOW, as_of=v1)
    ) == [PA]


def test_as_of_before_series_existed_is_zero(store):
    """A snapshot taken before a series' first write reads dense zeros —
    and find() does not list the series at that snapshot."""
    seeded(store)
    v0 = store.current_seq()
    store.put_batch([(11200, "x", "y", "z", "w", PA)], now=NOW)
    assert payloads(
        store.get(11200, 11210, ["x", "y", "z", "w"], now=NOW, as_of=v0)
    ) == [P0]
    rows = store.find(11200, 11210, ["x", "", "", ""], now=NOW, as_of=v0).collect()
    assert rows == []


def test_as_of_survives_compaction(store):
    """Compaction preserves ingest_seq, so snapshots still resolve after a
    bucket rewrite."""
    seeded(store)
    v1 = store.current_seq()
    store.put_batch([(10990, "a", "b", "c", "d", bytes([7, 7, 7, 7]))], now=NOW)
    store.compact(10000)
    assert payloads(
        store.get(10990, 11000, ["a", "b", "c", "d"], now=NOW, as_of=v1)
    ) == [PA]
    assert payloads(store.get(10990, 11000, ["a", "b", "c", "d"], now=NOW)) == [
        bytes([7, 7, 7, 7])
    ]


def test_corrupt_data_file_fails_loudly(store):
    """The reference's corrupt-index contract (`mindex/mindex_test.go:84-107`):
    damaged storage must FAIL the read, never silently return partial data.
    Spark's default (ignoreCorruptFiles=false) is relied on — this pins it."""
    import glob
    import os

    import pytest as _pytest

    seeded(store)
    [part] = glob.glob(os.path.join(store.path, "bucket_ts=10000", "*.parquet"))
    with open(part, "wb") as fh:
        fh.write(b"not a parquet file")
    store._invalidate_hot_cache()
    with _pytest.raises(Exception, match="[Pp]arquet|footer|corrupt|magic"):
        store.get(10990, 11010, ["a", "b", "c", "d"], now=NOW).collect()
