"""Registry rotation policy (VERDICT r6 #1).

The driver's correctness gate covers the first 50 keys of `queries()`.
These tests pin the anti-gaming contract: ordering is derived purely from
the committed CORRECTNESS_r*.json history (least-recently-checked first),
never hand-tuned, so every key lands in the check window within
ceil(N/50) rounds.
"""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.abspath(entry.__file__))


def _history(root: str = REPO) -> dict[str, int]:
    """Pass-only history, mirroring __spark_entry__._driver_check_history:
    a FAILED row does not count as checked (the key must stay in the
    window), so only green rows advance a key's last-checked round."""
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        rows = json.load(open(path))
        for k, row in rows.items():
            ok = isinstance(row, dict) and not row.get("err") and all(
                row.get(f, True) for f in ("rows_match", "schema_match", "hash_match")
            )
            if ok:
                last[k] = max(last.get(k, 0), rnd)
    return last


def test_failed_rows_do_not_count_as_checked():
    """sort_series failed its r4 row (environment dtype incident) after
    passing r2/r3 — the rotation must treat its last CHECK as r3, keeping
    regression-prone keys from aging out of the window on a failure.

    Runs against FROZEN copies of the r2-r4 artifacts (tests/fixtures/):
    the live repo files gain new rows every driver round, so asserting on
    them made the suite break whenever the driver re-checked the key
    (r9 incident — sort_series passed again and the r3 pin went stale)."""
    fixtures = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
    hist = _history(fixtures)
    assert hist.get("sort_series") == 3


def test_queries_and_oracle_keys_align():
    q, o = entry.queries(), entry.oracle_sql()
    assert set(o) <= set(q)
    # oracle iteration order must follow queries order (driver walks both)
    assert list(o) == [k for k in q if k in o]


def test_least_recently_checked_first():
    last = _history()
    ks = list(entry.queries())
    rounds = [last.get(k, 0) for k in ks]
    assert rounds == sorted(rounds), "registry must be least-recently-driver-checked first"


def test_check_window_holds_stalest_keys():
    """No key outside the first-50 window may be staler than a key inside it."""
    last = _history()
    ks = list(entry.queries())
    if len(ks) <= 50:
        return
    max_in_window = max(last.get(k, 0) for k in ks[:50])
    min_outside = min(last.get(k, 0) for k in ks[50:])
    assert max_in_window <= min_outside


def test_latest_driver_snapshot_rotates_to_back():
    """The newest committed CORRECTNESS file's passing keys are the
    freshest-checked, so none of them may occupy the first-50 window while
    any strictly-staler key exists (VERDICT r10 #5: the rotation snapshot
    reads COMMITTED files — an uncommitted drop would silently re-check
    last round's keys instead of the stalest cohort). Phrased against the
    max committed round so it keeps holding as future rounds land."""
    paths = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    assert paths, "driver CORRECTNESS artifacts must be committed in-repo"
    rmax = max(int(p.rsplit("_r", 1)[1].split(".")[0]) for p in paths)
    assert rmax >= 10  # the r10 snapshot specifically must be committed
    last = _history()
    ks = list(entry.queries())
    fresh = {k for k in ks if last.get(k, 0) == rmax}
    staler = [k for k in ks if last.get(k, 0) < rmax]
    # only when there are ≥50 staler keys is the window fully theirs
    if len(staler) >= 50:
        assert not fresh & set(ks[:50])


def test_no_forbidden_types_in_final_schemas(spark):
    """Registry-wide FINAL-SCHEMA gate (VERDICT r15 #2): the driver's
    pandas canonicalization crashes on Array/Map/Struct cells
    (`unhashable type: 'list'`) and hash-mismatches Spark Decimal
    objects against the DuckDB oracle's HUGEINT→float64 — so those four
    types are forbidden in every `queries()` output schema. Builds each
    plan at sf0.001 (schema only — nothing is executed beyond whatever
    bounded driver-side work the builder itself does) and fails with the
    full offender list so one run shows every latent carrier."""
    from pyspark.sql import types as T

    from tests.conftest import SF_DIR

    sf = SF_DIR

    forbidden = (T.ArrayType, T.MapType, T.StructType, T.DecimalType)
    offenders = []
    for name, fn in entry.queries().items():
        try:
            schema = fn(spark, sf).schema
        except Exception as e:  # build errors are their own failure
            offenders.append(f"{name}: BUILD ERROR {type(e).__name__}: {e}")
            continue
        bad = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in schema.fields
            if isinstance(f.dataType, forbidden)
        ]
        if bad:
            offenders.append(f"{name}: {', '.join(bad)}")
    assert not offenders, (
        "forbidden final-schema types (driver contract):\n  "
        + "\n  ".join(offenders)
    )
