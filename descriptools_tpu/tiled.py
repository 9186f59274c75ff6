"""Out-of-core tiled execution on a single device.

The reference's tiling exists to fit GPU memory — tiles run serially and a
host-side presolve stitches flow paths (SURVEY §1, flowhand.py:242-411).
This module is the same capability recast on our boundary-graph machinery:
rasters live in host RAM (or memory-mapped storage), the device sees one
tile at a time, and cross-tile flow paths are stitched by the exact ring
reduction used by the multi-chip path (parallel/boundary.py) — no serial
host walks, no -50 repair protocol.

Use when the grid exceeds device HBM on a single chip (the multi-chip path
in descriptools_tpu.parallel is preferred when a mesh is available).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from descriptools_tpu.constants import FLOW_MAX_STEPS, NODATA
from descriptools_tpu.parallel import boundary


def _tile_grid(shape, tile_rows, tile_cols):
    ny = math.ceil(shape[0] / tile_rows)
    nx = math.ceil(shape[1] / tile_cols)
    return ny, nx, ny * tile_rows, nx * tile_cols


def _pad_to(arr, rows, cols, fill):
    r, c = arr.shape
    if r == rows and c == cols:
        return arr
    return np.pad(arr, ((0, rows - r), (0, cols - c)), constant_values=fill)


def tile_map(fn, arrays, fills, tile_rows, tile_cols, halo=0, out_dtype=np.float32):
    """Apply a per-tile function over a large raster with optional halo.

    ``fn(*tiles) -> tile`` runs jitted per tile; tiles are cut with ``halo``
    cells of real neighbour data (NoData-filled at grid borders) and the
    interior of the result is stitched.  Covers stencil ops (halo=1) and
    bounded-walk ops (halo ~ max walk) out of core.
    """
    shape = arrays[0].shape
    ny, nx, R, C = _tile_grid(shape, tile_rows, tile_cols)
    padded = [
        _pad_to(np.asarray(a), R, C, f) for a, f in zip(arrays, fills)
    ]
    out = np.empty(shape, out_dtype)
    jfn = jax.jit(fn)
    for iy in range(ny):
        for ix in range(nx):
            ys, xs = iy * tile_rows, ix * tile_cols
            cut = []
            for a, f in zip(padded, fills):
                t = np.full(
                    (tile_rows + 2 * halo, tile_cols + 2 * halo), f, a.dtype
                )
                ys0, xs0 = max(ys - halo, 0), max(xs - halo, 0)
                ye, xe = min(ys + tile_rows + halo, R), min(xs + tile_cols + halo, C)
                t[
                    ys0 - (ys - halo) : ys0 - (ys - halo) + (ye - ys0),
                    xs0 - (xs - halo) : xs0 - (xs - halo) + (xe - xs0),
                ] = a[ys0:ye, xs0:xe]
                cut.append(t)
            res = np.asarray(jfn(*cut))
            if halo and res.shape[0] == tile_rows + 2 * halo:
                res = res[halo:-halo, halo:-halo]
            ye_o = min(ys + tile_rows, shape[0])
            xe_o = min(xs + tile_cols, shape[1])
            out[ys:ye_o, xs:xe_o] = res[: ye_o - ys, : xe_o - xs]
    return out


def tiled_flow_hand(dem, fdr, river, fac, px, tile_rows=2048, tile_cols=2048,
                    max_steps=FLOW_MAX_STEPS, engine="auto", interpret=False):
    """Flow distance / indices / HAND / river-fac, one tile on device at a
    time, stitched exactly via the boundary-graph ring reduction.

    Bitwise-identical indices/HAND to the in-core path (same machinery as
    the sharded path, serial over tiles instead of concurrent over chips).
    ``engine='auto'`` runs each tile's local walk in the VMEM-resident
    Pallas kernel on TPU.
    """
    if engine == "auto":
        engine = "pallas" if jax.default_backend() == "tpu" else "xla"
    shape = np.asarray(dem).shape
    ny, nx, R, C = _tile_grid(shape, tile_rows, tile_cols)
    if R * C >= 1 << 31:
        raise ValueError(f"padded grid {R}x{C} overflows int32 flat river indices")
    h, w = tile_rows, tile_cols
    demp = _pad_to(np.asarray(dem), R, C, NODATA)
    fdrp = _pad_to(np.asarray(fdr), R, C, 0)
    riverp = _pad_to(np.asarray(river), R, C, 0)
    facp = _pad_to(np.asarray(fac), R, C, NODATA)

    local_fn = jax.jit(
        partial(boundary.local_flow_summary, h=h, w=w, R=R, C=C, px=px,
                max_steps=max_steps, engine=engine, interpret=interpret)
    )
    ring_sel = boundary.ring_indices(h, w)

    locals_, rings = {}, []
    for iy in range(ny):
        for ix in range(nx):
            sl = np.s_[iy * h : (iy + 1) * h, ix * w : (ix + 1) * w]
            loc = local_fn(
                demp[sl], fdrp[sl], riverp[sl], facp[sl],
                jnp.int32(iy), jnp.int32(ix),
            )
            loc = {k: np.asarray(v) for k, v in loc.items()}
            locals_[iy, ix] = loc
            rings.append({k: v[ring_sel] for k, v in loc.items()})

    ring = {k: jnp.asarray(np.concatenate([r[k] for r in rings])) for k in rings[0]}
    solved = jax.jit(
        partial(boundary.solve_ring, h=h, w=w, nx=nx, max_steps=max_steps)
    )(ring)

    fdist = np.empty(shape, np.float32)
    indices = np.empty(shape, np.int32)
    hand = np.empty(shape, demp.dtype)
    river_fac = np.empty(shape, np.float32)
    fac0 = np.float32(np.asarray(fac).reshape(-1)[0])

    combine_fn = jax.jit(
        partial(boundary.combine, h=h, w=w, nx=nx, max_steps=max_steps)
    )
    for iy in range(ny):
        for ix in range(nx):
            loc = {k: jnp.asarray(v) for k, v in locals_[iy, ix].items()}
            landed, dist, ridx, rz, rfac = (
                np.asarray(x) for x in combine_fn(loc, solved)
            )
            sl = np.s_[iy * h : (iy + 1) * h, ix * w : (ix + 1) * w]
            dem_t = demp[sl].reshape(-1)
            fd = np.where(landed, dist, NODATA).reshape(h, w)
            ix_t = np.where(landed, ridx, NODATA).reshape(h, w)
            hd = np.where(
                (dem_t != NODATA) & landed,
                np.maximum(dem_t - rz.astype(dem_t.dtype), 0),
                NODATA,
            ).reshape(h, w)
            rf = np.where(landed, rfac, fac0).reshape(h, w)
            ys, xs = iy * h, ix * w
            ye, xe = min(ys + h, shape[0]), min(xs + w, shape[1])
            fdist[ys:ye, xs:xe] = fd[: ye - ys, : xe - xs]
            indices[ys:ye, xs:xe] = ix_t[: ye - ys, : xe - xs]
            hand[ys:ye, xs:xe] = hd[: ye - ys, : xe - xs]
            river_fac[ys:ye, xs:xe] = rf[: ye - ys, : xe - xs]

    if C != shape[1]:
        indices = np.where(
            indices == NODATA, NODATA, (indices // C) * shape[1] + indices % C
        )
    return fdist, indices, hand, river_fac
