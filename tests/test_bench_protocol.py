"""Unit tests for the scaling-protocol estimator (bench.summarize_pairs) —
the pure logic the driver's BENCH record depends on, pinned against the
exact failure modes VERDICT r3 identified."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import bandwidth_probe, summarize_pairs


def test_cold_start_inflation_pair_is_rejected():
    """The r3 driver record's exact shape: pair 1's N leg ran at half
    speed (cold start), producing a super-linear ratio (1.219) that the
    old best-pair+clamp estimator shipped as '1.0'. The new estimator
    must DISCARD that pair (N leg >25% below the best N leg) and take the
    median of the clean ones."""
    r3_driver = [
        (40372.6, 196918.6),  # ratio 1.219 — the inflation pair
        (86989.6, 195050.2),  # 0.561
        (91212.0, 201219.0),  # 0.552
        (76801.7, 160643.1),  # 0.523
    ]
    out = summarize_pairs(r3_driver)
    assert out["rejected_pairs"] == [[40372.6, 196918.6]]
    assert out["efficiency"] == 0.552  # median of [0.561, 0.552, 0.523]
    # headline legs reproduce the efficiency
    assert round(out["tps_4n"] / (4 * out["tps_n"]), 3) == out["efficiency"]


def test_no_clamp_super_linear_median_reported_raw():
    """If the SURVIVING set's median is super-linear (all N legs
    consistent — no rejection basis), the raw number must be reported,
    not clamped: honesty over optics."""
    out = summarize_pairs([(50.0, 210.0), (49.0, 205.0), (51.0, 208.0)])
    assert out["efficiency"] > 1.0
    assert out["rejected_pairs"] == []


def test_median_of_even_survivors():
    out = summarize_pairs([(50.0, 160.0), (50.0, 180.0)])
    assert out["efficiency"] == round((0.8 + 0.9) / 2, 3)


def test_single_pair_passes_through():
    out = summarize_pairs([(50.0, 170.0)])
    assert out["efficiency"] == 0.85
    assert out["tps_n"] == 50.0 and out["tps_4n"] == 170.0


def test_empty_pairs():
    assert summarize_pairs([])["efficiency"] == 0.0


def test_bandwidth_probe_smoke():
    """The exogenous window probe returns a plausible positive GB/s and
    is fast enough to gate scheduling."""
    import time

    t0 = time.time()
    gbs = bandwidth_probe(mb=32, reps=2)
    assert gbs > 0.5
    assert time.time() - t0 < 15
