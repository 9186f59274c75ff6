"""Downslope binary-descent vs oracle, incl. threshold/terminal/cap stops."""

import numpy as np
import pytest

from descriptools_tpu import oracle
from descriptools_tpu.constants import NODATA
from descriptools_tpu.ops import downslope
from descriptools_tpu.utils.synthetic import synthetic_basin

PX = 12.5


@pytest.fixture(scope="module")
def basin():
    return synthetic_basin(72, 96, seed=11)


@pytest.mark.parametrize("ed", [5.0, 1.0, 50.0])
def test_downslope_matches_oracle(basin, ed):
    dem, fdr, _, _ = basin
    got = np.asarray(downslope(dem, fdr, PX, ed))
    want = oracle.downslope_oracle(dem, fdr, PX, ed)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_downslope_cap_semantics():
    # A long flat-ish eastward channel that never drops 5 m within the cap:
    # the result must be the partial gradient after exactly max_steps steps.
    cols = 40
    dem = np.tile(np.linspace(100.0, 99.0, cols), (3, 1))
    dem = np.round(dem * 100) / 100
    fdr = np.full((3, cols), 1, np.uint8)  # east everywhere (border exit at end)
    got = np.asarray(downslope(dem, fdr, PX, 5.0, max_steps=8))
    want = oracle.downslope_oracle(dem, fdr, PX, 5.0, max_steps=8)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_downslope_terminal_and_nodata():
    dem = np.array(
        [
            [50.0, 40.0, NODATA],
            [60.0, 45.0, 30.0],
        ]
    )
    fdr = np.array([[1, 1, 0], [1, 2, 64]], np.uint8)
    got = np.asarray(downslope(dem, fdr, PX, 5.0))
    want = oracle.downslope_oracle(dem, fdr, PX, 5.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert got[0, 2] == NODATA  # nodata cell masked
    # (0,0): drop to (0,1) is 10 >= 5 -> stops after 1 step
    np.testing.assert_allclose(got[0, 0], 10.0 / PX, rtol=1e-5)
    # (0,1): next target is NoData -> terminal at itself? No: walk stops at
    # (0,1)=start... threshold not reached, step target (0,2) is NoData ->
    # stop at start with dist 0 -> result 0.
    assert got[0, 1] == 0.0


@pytest.mark.parametrize("ed", [5.0, 1.0])
def test_jacobi_equals_descent(basin, ed):
    dem, fdr, _, _ = basin
    a = np.asarray(downslope(dem, fdr, PX, ed, method="jacobi"))
    b = np.asarray(downslope(dem, fdr, PX, ed, method="descent"))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
