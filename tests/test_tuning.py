"""LSH band/row auto-tuning (dedup/tuning.py): known optima, curve
properties, an independent-integration oracle, and config wiring."""

from __future__ import annotations

import pytest

from hyrise_generalized_dedup_spark.config import GDConfig
from hyrise_generalized_dedup_spark.dedup.tuning import (
    collision_probability,
    curve_threshold,
    tune_lsh,
    tuned_config,
)


def test_known_optima_at_128_hashes():
    # the MMDS-textbook splits for the classic thresholds
    assert tune_lsh(0.5, 128) == (32, 4)
    assert tune_lsh(0.7, 128) == (16, 8)
    assert tune_lsh(0.9, 128) == (4, 32)


def test_curve_knee_tracks_threshold():
    for t in (0.3, 0.5, 0.6, 0.7, 0.8, 0.9):
        b, r = tune_lsh(t, 128)
        assert abs(curve_threshold(b, r) - t) < 0.15, (t, b, r)


def test_rows_monotone_in_threshold():
    rows = [tune_lsh(t, 128)[1] for t in (0.3, 0.5, 0.7, 0.9)]
    assert rows == sorted(rows)


def test_fp_weight_shifts_toward_precision():
    # penalizing false positives harder -> longer bands (higher knee)
    _, r_balanced = tune_lsh(0.7, 128, fp_weight=0.5)
    _, r_precise = tune_lsh(0.7, 128, fp_weight=0.9)
    assert r_precise >= r_balanced
    _, r_recall = tune_lsh(0.7, 128, fp_weight=0.1)
    assert r_recall <= r_balanced


def test_collision_probability_basics():
    assert collision_probability(0.0, 16, 8) == 0.0
    assert collision_probability(1.0, 16, 8) == 1.0
    p = [float(collision_probability(s / 10, 16, 8)) for s in range(11)]
    assert p == sorted(p)  # monotone in s


def test_optimum_matches_independent_integration():
    """Re-derive the argmin with a pure-python midpoint rule (no numpy,
    different grid) — the divisor split must agree."""
    num_hashes, t = 128, 0.7
    n = 2000

    def err(b, r):
        fp = fn = 0.0
        for i in range(n):
            s = (i + 0.5) / n
            p = 1.0 - (1.0 - s**r) ** b
            if s < t:
                fp += p / n
            else:
                fn += (1.0 - p) / n
        return 0.5 * fp + 0.5 * fn

    brute = min(
        ((err(b, num_hashes // b), b) for b in range(1, num_hashes + 1)
         if num_hashes % b == 0),
    )[1]
    assert tune_lsh(t, num_hashes)[0] == brute


def test_tuned_config_is_valid_and_keyed():
    c = tuned_config(0.8, normalizer="type2")
    assert c.num_hashes % c.bands == 0
    assert c.jaccard_threshold == 0.8
    assert c.normalizer == "type2"
    assert c.config_hash() != GDConfig().config_hash()


def test_bad_inputs_raise():
    with pytest.raises(ValueError):
        tune_lsh(0.0, 128)
    with pytest.raises(ValueError):
        tune_lsh(1.0, 128)
    with pytest.raises(ValueError):
        tune_lsh(0.7, 1)
