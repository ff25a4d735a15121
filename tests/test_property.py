"""Property-based golden tests: the store vs a pure-Python simulation of the
reference's semantics (floor-to-resolution, last-write-wins across sequential
puts, dense end-exclusive zero-filled reads — `dbase/dbase.go:125-231`,
`dblock/dblock.go:198-205`).

Few examples (Spark round-trips are seconds each), but each example is an
arbitrary interleaving of writes the hand-written golden tests can't cover.
"""

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kdb_spark import StoreConfig, TimeSeriesStore

NOW = 11999
RES = 10
ZERO = bytes(4)

ts_strategy = st.integers(10_000, 11_990)
tag_strategy = st.sampled_from(["a", "b"])
payload_strategy = st.binary(min_size=4, max_size=4)
row_strategy = st.tuples(ts_strategy, tag_strategy, tag_strategy, payload_strategy)
batches_strategy = st.lists(
    st.lists(row_strategy, min_size=1, max_size=6), min_size=1, max_size=2
)


def simulate(batches, start, end, tags):
    """Reference semantics in plain Python: sequential Put loop."""
    state = {}
    for batch in batches:
        for ts, t1, t2, pld in batch:
            state[(t1, t2, ts - ts % RES)] = pld
    start -= start % RES
    end -= end % RES
    return [
        state.get((tags[0], tags[1], slot), ZERO)
        for slot in range(start, end, RES)
    ]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batches=batches_strategy,
    start=ts_strategy,
    width=st.integers(0, 40),
    t1=tag_strategy,
    t2=tag_strategy,
)
def test_get_matches_sequential_put_simulation(spark, batches, start, width, t1, t2):
    cfg = StoreConfig(
        database_name="prop",
        data_path=tempfile.mkdtemp(prefix="kdbs_prop_"),
        index_depth=2,
        payload_size=4,
        bucket_duration=1000,
        resolution=RES,
    )
    store = TimeSeriesStore(spark, cfg)
    for batch in batches:
        store.put_batch(batch, now=NOW)
    end = min(start + width, NOW)  # end may not pass now (dbase_test.go:268-276)
    got = [
        bytes(r["payload"])
        for r in store.get(start, end, [t1, t2], now=NOW).collect()
    ]
    assert got == simulate(batches, start, end, [t1, t2])
