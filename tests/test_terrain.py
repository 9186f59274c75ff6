"""Flow-accumulation doubling vs brute-force path counting."""

import numpy as np

from descriptools_tpu.constants import NODATA
from descriptools_tpu.ops.terrain import derive_terrain, flow_accumulation
from descriptools_tpu.utils.synthetic import d8_from_dem, synthetic_dem


def brute_force_fac(fdr):
    """Count, per cell, walkers from every other cell whose path visits it."""
    from descriptools_tpu.oracle.core import _D8_LUT

    rows, cols = fdr.shape
    fac = np.zeros((rows, cols), np.int64)
    for i in range(rows):
        for j in range(cols):
            y, x = i, j
            for _ in range(rows * cols):
                step = _D8_LUT.get(int(fdr[y, x]))
                if step is None:
                    break
                dy, dx, _ = step
                ny, nx = y + dy, x + dx
                if not (0 <= ny < rows and 0 <= nx < cols):
                    break
                y, x = ny, nx
                fac[y, x] += 1
    return fac


def test_flow_accumulation_matches_brute_force():
    dem = synthetic_dem(40, 52, seed=17)
    fdr = d8_from_dem(dem)
    got = np.asarray(flow_accumulation(fdr))
    want = brute_force_fac(fdr)
    np.testing.assert_array_equal(got, want)


def test_derive_terrain_shapes_and_masking():
    dem = synthetic_dem(32, 32, seed=3)
    fdr, fac = derive_terrain(dem)
    fdr, fac = np.asarray(fdr), np.asarray(fac)
    assert (fac[dem == NODATA] == NODATA).all()
    assert (fdr[dem == NODATA] == 0).all()
    # ridges exist: some valid cells with zero accumulation
    assert (fac[dem != NODATA] == 0).any()
