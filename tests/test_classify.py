"""Sharded calibration/classification vs the float64 host classifier.

The sharded path (parallel/classify.py) must select the IDENTICAL threshold
and produce the bitwise-identical class map: Fit numerators/denominators are
exact integer counts (psum histograms) and the float64 scaled predicate is
evaluated through exact integer cutoffs.  Spec: reference evaluation.py:5-211.
"""

import numpy as np
import pytest

from descriptools_tpu import oracle
from descriptools_tpu.parallel import make_mesh
from descriptools_tpu.parallel.classify import (
    _integer_cutoff,
    sharded_classify_flood,
)
from descriptools_tpu.pipeline import classify_flood
from descriptools_tpu.utils.synthetic import synthetic_basin

PX = 12.5


def _hand_flood(rows, cols, seed, cut, noise=None):
    dem, fdr, river, fac = synthetic_basin(rows, cols, seed=seed)
    _, idx = oracle.flow_distance_index_oracle(fdr, river, PX)
    hand = oracle.hand_oracle(dem.astype(np.int32), idx)
    flood = (hand != -100) & (hand <= cut)
    if noise is not None:
        rng = np.random.default_rng(noise)
        flood &= rng.random(hand.shape) < 0.9
    return hand, flood.astype(np.uint8)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (1, 8)])
def test_sharded_classify_matches_host_float64(mesh_shape):
    hand, flood = _hand_flood(72, 100, seed=21, cut=8, noise=0)
    th0, c0, f0, cm0 = classify_flood(hand, flood)
    th, c, f, cm = sharded_classify_flood(hand, flood, make_mesh(mesh_shape))
    assert (th, c, f) == (th0, c0, f0)
    np.testing.assert_array_equal(np.asarray(cm), cm0)


def test_sharded_classify_padded_grid():
    """45x53 doesn't divide the mesh: the NoData padding must only add TN
    cells (Fit/threshold unchanged) and crop back bitwise."""
    hand, flood = _hand_flood(45, 53, seed=5, cut=5)
    th0, c0, f0, cm0 = classify_flood(hand, flood)
    th, c, f, cm = sharded_classify_flood(hand, flood, make_mesh((2, 4)))
    assert (th, c, f) == (th0, c0, f0)
    np.testing.assert_array_equal(np.asarray(cm), cm0)


def test_sharded_classify_over_direction():
    """direction='over' (binary_map's else branch, evaluation.py:113-118)."""
    hand, flood = _hand_flood(72, 100, seed=21, cut=8)
    # 'over' floods HIGH values: invert the benchmark meaningfully.
    flood = ((hand != -100) & (hand >= 12)).astype(np.uint8)
    th0, c0, f0, cm0 = classify_flood(hand, flood, under="over")
    th, c, f, cm = sharded_classify_flood(
        hand, flood, make_mesh((2, 4)), under="over"
    )
    assert (th, c, f) == (th0, c0, f0)
    np.testing.assert_array_equal(np.asarray(cm), cm0)


def test_integer_cutoff_is_exact_flip_point():
    """The cutoff must be the exact float64 predicate flip point."""
    mn, mx = 1.0, 937.0
    for th in [0.012, 0.25, 0.5, 0.0999, 1.0, 0.0]:
        c = _integer_cutoff(th, mn, mx, "under")
        assert (np.float64(c) - mn) / (mx - mn) <= th
        assert (np.float64(c + 1) - mn) / (mx - mn) > th
        c2 = _integer_cutoff(th, mn, mx, "over")
        assert (np.float64(c2) - mn) / (mx - mn) >= th
        assert (np.float64(c2 - 1) - mn) / (mx - mn) < th


def test_non_integer_hand_rejected():
    hand, flood = _hand_flood(72, 100, seed=21, cut=8)
    hand = hand.astype(np.float32)
    hand[3, 3] = 7.5
    with pytest.raises(ValueError, match="integer"):
        sharded_classify_flood(hand, flood, make_mesh((2, 4)))
