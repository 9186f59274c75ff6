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


# ---------------------------------------------------------------------------
# Adversarial VMEM-kernel regimes (round-2 verdict, items 8b/8c): walks that
# cross many 64-row bands, in both band-skip regimes, plus the Gauss-Seidel
# walk3 on a tall grid with a long lateral channel — the inner-while-loop
# cases the small basin fixture never reaches.
# ---------------------------------------------------------------------------


def _tall_north_basin(rows, cols, bump_every=None):
    """Northward walks crossing rows/64 bands; optional ascending bumps
    defeat the monotone-descent probe, forcing the mono=0 fallback."""
    dem = np.broadcast_to(
        np.round(np.arange(rows, dtype=np.float64) * 0.5 + 100.0)[:, None]
        .astype(np.float32),
        (rows, cols),
    ).copy()
    if bump_every:
        dem[::bump_every, :] += 3.0  # step from the row below ASCENDS
    fdr = np.full((rows, cols), 64, np.uint8)  # all north
    return dem, fdr


@pytest.mark.parametrize("bump_every", [None, 37])
def test_downslope_vmem_tall_multiband(bump_every):
    """Monotone (aggressive frozen-cell band skip) and non-monotone
    (mono=0 fallback) regimes, walks ~100 cells long across 5 bands."""
    from descriptools_tpu.ops.downslope import downslope
    from descriptools_tpu.ops.pallas.walk_vmem import downslope_pallas_vmem

    dem, fdr = _tall_north_basin(320, 128, bump_every)
    got = np.asarray(
        downslope_pallas_vmem(dem, fdr, PX, 50.0, max_steps=600,
                              interpret=True)
    )
    want = np.asarray(downslope(dem, fdr, PX, 50.0, max_steps=600))
    np.testing.assert_array_equal(got, want)


def test_flow_vmem_gauss_seidel_tall_lateral_channel():
    """Tall grid (3 FLOW_BANDs) with ~500-step paths: east along each row,
    then north up the last column to the river — drives the walk3 inner
    convergence loop far past the PAD-sweep regime."""
    from descriptools_tpu.ops.flow import flow_distance_index
    from descriptools_tpu.ops.pallas.walk_vmem import flow_pallas_vmem

    rows, cols = 384, 128
    fdr = np.full((rows, cols), 1, np.uint8)  # east
    fdr[:, -1] = 64  # last column: north
    river = np.zeros((rows, cols), np.int8)
    river[0, -1] = 1
    fd, idx = flow_pallas_vmem(fdr, river, PX, max_steps=1000, interpret=True)
    wfd, widx = flow_distance_index(fdr, river, PX, max_steps=1000)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(widx))
    np.testing.assert_allclose(np.asarray(fd), np.asarray(wfd),
                               rtol=1e-6, atol=1e-4)


def test_downslope_vmem_trunc_tracking_matches_jacobi():
    """trunc0 threading (the sharded retry signal) through the VMEM kernel:
    result AND flags bitwise vs the XLA jacobi, in both band-skip regimes."""
    import jax.numpy as jnp

    from descriptools_tpu.ops.downslope import _downslope_jacobi, trunc_cells
    from descriptools_tpu.ops.pallas.walk_vmem import downslope_pallas_vmem

    rows, cols = 64, 128
    dem = np.broadcast_to(
        (1000.0 - 0.01 * np.arange(cols)).astype(np.float32), (rows, cols)
    ).copy()
    fdr = np.full((rows, cols), 1, np.uint8)  # gentle eastward flat walk
    for bump in (None, 40):
        d = dem.copy()
        if bump:
            d[:, bump] += 3.0
        d, f = jnp.asarray(d), jnp.asarray(fdr)
        # Block is a window of a wider global grid: east edge truncates.
        tr0 = trunc_cells(d, f, 0, 0, rows, 4 * cols)
        assert int(tr0.sum()) == rows
        want, wtr = _downslope_jacobi(d, f, PX, 5.0, 5000, trunc0=tr0)
        got, gtr = downslope_pallas_vmem(d, f, PX, 5.0, max_steps=5000,
                                         trunc0=tr0, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_array_equal(np.asarray(gtr), np.asarray(wtr))
        assert np.asarray(gtr).any()  # the flat walk really is truncated


def test_flow_packed_overflow_guard_falls_back():
    """A serpentine path longer than 2^15 steps must trip the packed
    kernel's guard bits (some frozen cell holds exactly 2^15 cardinal
    steps) and fall back to the walk3 tier — results still match the XLA
    hybrid engine bitwise on indices."""
    import jax.numpy as jnp

    from descriptools_tpu.ops.flow import flow_distance_index
    from descriptools_tpu.ops.pallas.walk_vmem import flow_pallas_vmem

    rows, cols = 200, 200  # boustrophedon path of ~40000 > 2^15 steps
    fdr = np.zeros((rows, cols), np.uint8)
    for r in range(rows):
        fdr[r, :] = 1 if r % 2 == 0 else 16  # E on even rows, W on odd
        if r % 2 == 0:
            fdr[r, -1] = 4  # S connector at the east end
        else:
            fdr[r, 0] = 4  # S connector at the west end
    river = np.zeros((rows, cols), np.int8)
    river[-1, 0] = 1  # the path's terminus
    fdr_j, river_j = jnp.asarray(fdr), jnp.asarray(river)

    fd, idx = flow_pallas_vmem(fdr_j, river_j, 12.5, max_steps=60000,
                               interpret=True)
    wfd, widx = flow_distance_index(fdr_j, river_j, 12.5, max_steps=60000)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(widx))
    # The far end really is > 2^15 steps from the river (guard regime).
    assert rows * cols - rows > (1 << 15)
    np.testing.assert_allclose(np.asarray(fd), np.asarray(wfd),
                               rtol=1e-5, atol=1e-2)


def test_flow_packed_matches_hybrid_distances_closely():
    """Packed-count fdist reconstruction must stay within f32-summation
    slack of the hybrid engine on real terrain (the parity-gate bound)."""
    import jax.numpy as jnp

    from descriptools_tpu.ops.flow import flow_distance_index
    from descriptools_tpu.ops.pallas.walk_vmem import flow_pallas_vmem

    dem, fdr, river, _ = synthetic_basin(120, 160, seed=23)
    fd, idx = flow_pallas_vmem(jnp.asarray(fdr), jnp.asarray(river), PX,
                               max_steps=2000, interpret=True)
    wfd, widx = flow_distance_index(jnp.asarray(fdr), jnp.asarray(river),
                                    PX, max_steps=2000)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(widx))
    fd, wfd = np.asarray(fd, np.float64), np.asarray(wfd, np.float64)
    v = (fd != NODATA) & (wfd != NODATA)
    assert np.array_equal(fd != NODATA, wfd != NODATA)
    rel = np.abs(fd[v] - wfd[v]) / np.maximum(np.abs(wfd[v]), 1.0)
    assert rel.max() < 2e-4  # the PARITY_TPU gate bound


def test_downslope_vmem_nonmono_fallback_matches_jacobi():
    """Adversarial uphill fdr (z INCREASES eastward) violates the freeze
    kernel's monotone-descent precondition — the wrapper's lax.cond must
    route to the XLA jacobi branch and stay bitwise."""
    import jax.numpy as jnp

    from descriptools_tpu.ops.downslope import _downslope_jacobi
    from descriptools_tpu.ops.pallas.walk_vmem import downslope_pallas_vmem

    rows, cols = 32, 128
    dem = np.broadcast_to(
        (100.0 + 0.5 * np.arange(cols)).astype(np.float32), (rows, cols)
    ).copy()
    fdr = np.full((rows, cols), 1, np.uint8)  # east, uphill
    d, f = jnp.asarray(dem), jnp.asarray(fdr)
    want = _downslope_jacobi(d, f, PX, 5.0, 200)
    got = downslope_pallas_vmem(d, f, PX, 5.0, max_steps=200, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_bench_terrain_is_monotone_descent():
    """The freeze kernel's fast path requires monotone descent; pin that
    the benchmark inputs (synthetic generator) actually satisfy it, so the
    published numbers exercise the freeze kernel, not the fallback."""
    import jax.numpy as jnp

    from descriptools_tpu.d8 import pull8
    from descriptools_tpu.ops.downslope import _terminal_and_step
    from descriptools_tpu.utils.synthetic import synthetic_basin

    dem, fdr, _, _ = synthetic_basin(128, 160, seed=0)
    z, terminal, _ = _terminal_and_step(dem.astype(np.float32), fdr, PX, -100)
    fdr_eff = jnp.where(terminal, 0, jnp.asarray(fdr)).astype(jnp.int32)
    (z_succ,) = pull8(fdr_eff, [z], [0.0])
    assert not bool(np.asarray(z_succ > z).any())
