"""Empirical scaling audit as a pytest job (r13 verdict stretch item).

`pytest -m scale` runs tools/scale_probe.py's growth audit — salted K×
replicas of the sf0.1 tables, per-op wall-time growth ratios — and FAILS
on any super-linear op instead of leaving the audit as a doc exercise
(SCALE.md records the per-round tables). Deselected by default
(pytest.ini addopts): the probe generates multi-GB replica datasets and
takes minutes, so it's an explicit opt-in job like the codec tier.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

pytestmark = pytest.mark.scale


def test_no_super_linear_growth(spark):
    from tools.scale_probe import DEFAULT_OPS, run_probe

    # 2.5x flag factor: see run_probe's docstring — the linear heavy
    # ops sit at 10-12x on 8x data and ambient flips a 12x cut
    results, flagged = run_probe(spark, [1, 8], list(DEFAULT_OPS), flag_factor=2.5)
    assert results, "probe ran no ops"
    assert not flagged, (
        f"super-linear growth (>2.5x of K) in: {flagged}; "
        f"timings: { {k: results[k] for k in flagged} }"
    )
