"""Trunc tracking through the blocked (>VMEM) Pallas downslope tier.

Round-3 verdict, Missing #5: without truncation flags the blocked kernel
could not serve the sharded/tiled halo-retry paths, so config-5-sized
blocks silently fell back to the XLA jacobi.  The flags ride the Zt raster
as a double terminal offset (walk.py _OFF2), and both result and flags must
be bitwise vs the XLA jacobi (the exactness contract every engine shares).
"""

import numpy as np
import pytest

from descriptools_tpu.utils.synthetic import synthetic_basin

PX = 12.5


def test_downslope_blocked_trunc_tracking_matches_jacobi():
    import jax.numpy as jnp

    from descriptools_tpu.ops.downslope import _downslope_jacobi, trunc_cells
    from descriptools_tpu.ops.pallas.walk import downslope_pallas

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
        got, gtr = downslope_pallas(d, f, PX, 5.0, max_steps=5000,
                                    h=8, trunc0=tr0, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_array_equal(np.asarray(gtr), np.asarray(wtr))
        assert np.asarray(gtr).any()  # the flat walk really is truncated


def test_downslope_blocked_trunc_on_basin_window():
    """Real-terrain window of a larger grid: tracked blocked kernel's result
    and flags equal the jacobi's, and the untracked call is unchanged."""
    import jax.numpy as jnp

    from descriptools_tpu.ops.downslope import _downslope_jacobi, trunc_cells
    from descriptools_tpu.ops.pallas.walk import downslope_pallas

    dem, fdr, _, _ = synthetic_basin(90, 120, seed=3)
    d = jnp.asarray(dem[10:74, 20:116], jnp.float32)
    f = jnp.asarray(fdr[10:74, 20:116])
    tr0 = trunc_cells(d, f, 10, 20, 90, 120)
    want, wtr = _downslope_jacobi(d, f, PX, 5.0, 200, trunc0=tr0)
    got, gtr = downslope_pallas(d, f, PX, 5.0, max_steps=200, h=8,
                                trunc0=tr0, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(gtr), np.asarray(wtr))

    plain = downslope_pallas(d, f, PX, 5.0, max_steps=200, h=8,
                             interpret=True)
    np.testing.assert_array_equal(
        np.asarray(plain),
        np.asarray(_downslope_jacobi(d, f, PX, 5.0, 200)),
    )


@pytest.mark.parametrize("mesh_shape", [(2, 4)])
def test_sharded_downslope_blocked_engine_bitwise(mesh_shape):
    """The sharded path with engine='pallas_blocked' (what
    _resolve_downslope_engine now selects for >VMEM blocks) must stay
    bitwise vs the single-device jacobi, including the halo-doubling retry."""
    import jax.numpy as jnp

    from descriptools_tpu.ops.downslope import downslope as downslope_xla
    from descriptools_tpu.parallel import make_mesh
    from descriptools_tpu.parallel.sharded import sharded_downslope

    dem, fdr, _, _ = synthetic_basin(72, 96, seed=11)
    dem = dem.astype(np.float32)
    want = np.asarray(downslope_xla(jnp.asarray(dem), jnp.asarray(fdr),
                                    PX, 5.0, max_steps=200))
    got = np.asarray(sharded_downslope(
        dem, fdr, PX, 5.0, make_mesh(mesh_shape), halo=8, max_steps=200,
        engine="pallas_blocked", interpret=True,
    ))
    np.testing.assert_array_equal(got, want)
