"""Pallas stencil kernels vs the XLA ops (interpreter mode on CPU)."""

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from descriptools_tpu import oracle
from descriptools_tpu.constants import NODATA
from descriptools_tpu.ops import slope, topographic_index
from descriptools_tpu.ops.pallas import slope_pallas, slope_twi_fused_pallas
from descriptools_tpu.utils.synthetic import synthetic_basin

PX = 12.5


@pytest.fixture(scope="module")
def basin():
    return synthetic_basin(70, 110, seed=13)


def test_slope_pallas_matches_xla(basin):
    dem, _, _, _ = basin
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(slope_pallas(dem, PX, band=32))
    want = np.asarray(slope(dem, PX))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_fused_slope_twi_matches_pipeline(basin):
    dem, _, _, fac = basin
    with pltpu.force_tpu_interpret_mode():
        sl, twi = slope_twi_fused_pallas(dem, fac, PX, band=32)
    sl, twi = np.asarray(sl), np.asarray(twi)
    want_sl = np.asarray(slope(dem, PX))
    np.testing.assert_allclose(sl, want_sl, rtol=1e-6, atol=1e-6)
    sl_rad = np.where(dem == NODATA, NODATA, np.arctan(want_sl / 100))
    want_twi = np.asarray(topographic_index(fac, sl_rad.astype(np.float32), PX))
    np.testing.assert_allclose(twi, want_twi, rtol=2e-5, atol=1e-4)


def test_downslope_pallas_matches_jacobi(basin):
    from descriptools_tpu.ops.downslope import downslope
    from descriptools_tpu.ops.pallas.walk import downslope_pallas

    dem, fdr, _, _ = basin
    got = np.asarray(
        downslope_pallas(dem.astype(np.float32), fdr, PX, 5.0, max_steps=200,
                         h=8, interpret=True)
    )
    want = np.asarray(downslope(dem.astype(np.float32), fdr, PX, 5.0, max_steps=200))
    np.testing.assert_array_equal(got, want)


def test_flow_pallas_matches_hybrid(basin):
    from descriptools_tpu.ops.flow import flow_distance_index
    from descriptools_tpu.ops.pallas.walk import flow_pallas

    _, fdr, river, _ = basin
    fd, idx = flow_pallas(fdr, river, PX, max_steps=400, h=8, interpret=True)
    wfd, widx = flow_distance_index(fdr, river, PX, max_steps=400)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(widx))
    np.testing.assert_allclose(np.asarray(fd), np.asarray(wfd), rtol=1e-6, atol=1e-4)


def test_downslope_vmem_matches_jacobi(basin):
    from descriptools_tpu.ops.downslope import downslope
    from descriptools_tpu.ops.pallas.walk_vmem import downslope_pallas_vmem

    dem, fdr, _, _ = basin
    got = np.asarray(
        downslope_pallas_vmem(dem.astype(np.float32), fdr, PX, 5.0,
                              max_steps=200, interpret=True)
    )
    want = np.asarray(downslope(dem.astype(np.float32), fdr, PX, 5.0, max_steps=200))
    np.testing.assert_array_equal(got, want)


def test_flow_vmem_matches_hybrid(basin):
    from descriptools_tpu.ops.flow import flow_distance_index
    from descriptools_tpu.ops.pallas.walk_vmem import flow_pallas_vmem

    _, fdr, river, _ = basin
    fd, idx = flow_pallas_vmem(fdr, river, PX, max_steps=400, interpret=True)
    wfd, widx = flow_distance_index(fdr, river, PX, max_steps=400)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(widx))
    np.testing.assert_allclose(np.asarray(fd), np.asarray(wfd), rtol=1e-6, atol=1e-4)
