"""Synthetic terrain generators for tests and benchmarks (NumPy, host-side).

Produces DEM / D8 / river rasters with the reference's conventions (-100
NoData, ESRI D8 codes, code 0 at pits & NoData) so every walk-termination
branch — river absorption, dead ends, border exits, NoData targets — is
exercised.  Steepest-descent D8 over a smooth field is strictly downhill, so
generated flow graphs are acyclic by construction; cycle handling is tested
separately with hand-crafted rasters.
"""

import numpy as np

from descriptools_tpu.constants import D8_CODES, D8_DX, D8_DY, D8_STEP, NODATA


def synthetic_dem(rows, cols, seed=0, nodata_border=True, smooth=7, amp=80.0):
    """Smooth random DEM (float32-valued integers-ish) with a NoData region.

    A blurred noise field plus a broad ramp (so paths have somewhere to go).
    If ``nodata_border``, an irregular NoData region covers one corner, like
    the bundled basin's masked surroundings.
    """
    rng = np.random.default_rng(seed)
    noise = rng.normal(size=(rows, cols))
    # Separable box blur (avoid the scipy dependency in the hot test path).
    k = smooth
    kernel = np.ones(k) / k
    for axis in (0, 1):
        noise = np.apply_along_axis(
            lambda m: np.convolve(m, kernel, mode="same"), axis, noise
        )
    ramp = np.linspace(1.0, 0.0, rows)[:, None] + np.linspace(0.5, 0.0, cols)[None, :]
    dem = 400.0 + amp * (noise + ramp)
    dem = np.round(dem).astype(np.float64)
    if nodata_border:
        yy, xx = np.mgrid[0:rows, 0:cols]
        blob = (yy + 1.3 * xx) < 0.25 * (rows + cols)
        dem[blob] = NODATA
    return dem


def d8_from_dem(dem, nodata=NODATA):
    """ESRI D8 by steepest descent; ties -> first code in ESRI order;
    pits/flats and NoData -> 0.  Mirrors descriptools_tpu.d8.d8_flow_direction."""
    dem = np.asarray(dem, dtype=np.float64)
    rows, cols = dem.shape
    pad = np.full((rows + 2, cols + 2), nodata, dtype=np.float64)
    pad[1:-1, 1:-1] = dem
    best = np.zeros((rows, cols))
    code = np.zeros((rows, cols), dtype=np.int32)
    for c, dy, dx, s in zip(D8_CODES, D8_DY, D8_DX, D8_STEP):
        nbr = pad[1 + dy : 1 + dy + rows, 1 + dx : 1 + dx + cols]
        grad = (dem - nbr) / float(s)
        ok = (nbr != nodata) & (grad > best)
        best = np.where(ok, grad, best)
        code = np.where(ok, int(c), code)
    return np.where(dem == nodata, 0, code).astype(np.uint8)


def synthetic_basin(rows, cols, seed=0, river_quantile=0.15):
    """(dem, fdr, river, fac) for a synthetic basin.

    River cells = valid cells below the given elevation quantile (flow paths
    descend, so most cells drain into the river set).  fac is a crude proxy
    (elevation rank) — sufficient for the pointwise descriptors' formulas.
    """
    dem = synthetic_dem(rows, cols, seed=seed)
    fdr = d8_from_dem(dem)
    valid = dem != NODATA
    thresh = np.quantile(dem[valid], river_quantile)
    river = ((dem <= thresh) & valid).astype(np.int8)
    rng = np.random.default_rng(seed + 1)
    fac = np.where(valid, rng.integers(0, 200000, size=dem.shape), NODATA)
    return dem, fdr, river, fac
