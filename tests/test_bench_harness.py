"""Bench-harness unit tests (no Spark): grant-probe drift math and pair
validity rules.

The scaling evidence is only as honest as the harness that gates it;
round 2/3 postmortems showed two failure modes worth pinning with tests:
a sha-only probe blind to the host's fresh-page-write degradation, and a
sanity band that accepted a 0.25x "speedup" pair as valid.
"""

from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def test_probe_drift_takes_worst_axis():
    from bench import _probe_drift

    # sha stable, memtouch collapsed 100x between probes -> drift must
    # reflect the collapsed axis, not average it away
    p0 = {"sha": 100_000.0, "memtouch": 4e9}
    p1 = {"sha": 101_000.0, "memtouch": 4e7}
    assert _probe_drift([p0, p1]) > 50
    # both axes stable -> drift ~1
    assert _probe_drift([p0, {"sha": 99_000.0, "memtouch": 3.9e9}]) < 1.1
    # single probe or missing components -> no spurious drift
    assert _probe_drift([p0]) == 1.0
    assert _probe_drift([{"sha": 1.0}, {"sha": 1.0}]) == 1.0


def test_burn_touch_measures_fresh_pages():
    from bench import _burn_touch

    touched = _burn_touch(0.2)
    assert touched > 0
    assert touched % 4096 == 0


def test_pair_validity_band_rejects_sub_unity():
    """The validity predicate used by run_cdc_scaling / standalone pairs:
    speedup <= 1 on 4x cores is never valid evidence (r2 recorded a 0.25x
    'valid' pair under the old band)."""
    ratio = 4.0

    def sane(speedup: float) -> bool:
        return 1.0 < speedup < ratio * 1.1

    assert not sane(0.25)
    assert not sane(0.95)
    assert not sane(1.0)
    assert sane(1.5)
    assert sane(3.9)
    assert not sane(4.5)  # physically impossible on 4x cores
