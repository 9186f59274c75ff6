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
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from descriptools_tpu.constants import (
    DOWNSLOPE_MAX_STEPS,
    FLOW_MAX_STEPS,
    NODATA,
)
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


# ---------------------------------------------------------------------------
# Loader-fed out-of-core suite (the 1e9-cell north-star form, BASELINE
# config 5): no full-grid host copy anywhere — inputs arrive through
# windowed loaders, outputs stream to disk memmaps, and the cross-tile flow
# stitching spills compacted per-tile summaries instead of keeping the grid
# resident.  Same exact machinery (boundary ring reduction, trunc-retry
# downslope) as the in-core paths, so integer outputs stay bitwise.
# ---------------------------------------------------------------------------


def load_window(loader, ys, ye, xs, xe, shape, fill, dtype, halo=0):
    """Window [ys:ye, xs:xe] plus ``halo`` rim from a windowed loader;
    positions beyond the global ``shape`` are ``fill`` (the padded-grid
    NoData convention every engine expects)."""
    rows, cols = shape
    out = np.full((ye - ys + 2 * halo, xe - xs + 2 * halo), fill, dtype)
    cy0, cy1 = max(ys - halo, 0), min(ye + halo, rows)
    cx0, cx1 = max(xs - halo, 0), min(xe + halo, cols)
    if cy1 > cy0 and cx1 > cx0:
        out[
            cy0 - (ys - halo) : cy1 - (ys - halo),
            cx0 - (xs - halo) : cx1 - (xs - halo),
        ] = loader(cy0, cy1, cx0, cx1)
    return out


def _local_compact(dem, fdr, river, fac, iy, ix, h, w, R, C, nx, px,
                   max_steps, engine, interpret):
    """Pass-A device body: local flow summary compacted for the host spill.

    The host-side combine (pass B) only needs per-cell
    (status, dist, steps, slot, ridx, rz, rfac) — tgy/tgx collapse to the
    ring-table ``slot`` here, and status/steps narrow to u8/u16, cutting the
    device->host spill from 32 to 23 bytes/cell.  Ring records keep the full
    field set for solve_ring.
    """
    loc = boundary.local_flow_summary(
        dem, fdr, river, fac, iy, ix, h, w, R, C, px,
        max_steps=max_steps, engine=engine, interpret=interpret,
    )
    ring_sel = jnp.asarray(boundary.ring_indices(h, w))
    ring = {k: v[ring_sel] for k, v in loc.items()}
    ring_len = 2 * (h + w)
    G = (R // h) * nx * ring_len
    slot = jnp.clip(
        boundary.slot_of(loc["tgy"], loc["tgx"], h, w, nx, ring_len), 0, G - 1
    )
    steps_t = jnp.uint16 if max_steps + 1 < (1 << 16) else jnp.int32
    compact = dict(
        status=loc["status"].astype(jnp.uint8),
        dist=loc["dist"],
        steps=loc["steps"].astype(steps_t),
        slot=slot.astype(jnp.int32),
        ridx=loc["ridx"],
        rz=loc["rz"],
        rfac=loc["rfac"],
    )
    return compact, ring


def _combine_host(loc, solved, max_steps):
    """Pass-B host combine — numpy mirror of boundary.combine on the
    compacted spill.  All ops are IEEE f32 adds / integer selects, so the
    result is bitwise-identical to the device combine (and therefore to the
    sharded and single-device paths' integer outputs)."""
    is_exit = loc["status"] == boundary.EXIT
    slot = loc["slot"]
    status = np.where(is_exit, solved["status"][slot], loc["status"].astype(np.int32))
    dist = np.where(is_exit, loc["dist"] + solved["dist"][slot], loc["dist"])
    steps = loc["steps"].astype(np.int32) + np.where(
        is_exit, solved["steps"][slot], 0
    )
    ridx = np.where(is_exit, solved["ridx"][slot], loc["ridx"])
    rz = np.where(is_exit, solved["rz"][slot], loc["rz"])
    rfac = np.where(is_exit, solved["rfac"][slot], loc["rfac"])
    landed = (status == boundary.RIVER) & (steps <= max_steps)
    return landed, dist, ridx, rz, rfac


def _alloc_out(out_dir, name, shape, dtype):
    if out_dir is None:
        return np.empty(shape, dtype)
    return np.lib.format.open_memmap(
        os.path.join(out_dir, name + ".npy"), mode="w+", dtype=dtype,
        shape=tuple(int(s) for s in shape),
    )


def tiled_suite(loaders, shape, cfg, tile_rows=4096, tile_cols=4096,
                out_dir=None, downslope_halo=64, engine="auto",
                interpret=False, progress=None):
    """Full descriptor suite, out of core, fed by windowed loaders.

    ``loaders``: {'dem','fdr','river','fac'} -> ``f(ys, ye, xs, xe) -> array``
    (windowed GeoTIFF/Zarr readers, or utils.synthetic.windowed_basin).  The
    dem loader should return an integer dtype for bitwise HAND parity
    (Example feeds int16; reference golden spec example.py:215-217).

    Returns the same keys as pipeline.descriptor_suite; values are np
    memmaps under ``out_dir`` (or RAM arrays if ``out_dir`` is None).
    Integer outputs (indices, hand, downslope) are bitwise-identical to the
    single-device suite; floats match up to f32 summation order (fdist) and
    exactly elsewhere.

    Passes (each one streaming tile loads/stores, nothing global resident):
      A. per-tile local flow walk on device -> compacted spill + ring records
      B. ring solve on device (tiny) -> per-tile HOST combine (pure f32/int,
         bitwise equal to the device combine; avoids re-uploading the spill)
         fused with C. per-tile device pointwise (slope stencil via 1-cell
         loader halo, TWI/mod-TWI/GFI/ln(hl/H))
      D. per-tile downslope with ``downslope_halo`` rim and exact
         truncation-retry (halo doubles per tile until no interior walk is
         cut; ops.downslope.trunc_cells — the sharded path's guarantee).
    """
    from descriptools_tpu.ops.downslope import _downslope_jacobi, trunc_cells
    from descriptools_tpu.ops.gfi import gfi as _gfi, ln_hl_h as _ln_hl_h
    from descriptools_tpu.ops.slope import slope_from_padded
    from descriptools_tpu.ops.topo import (
        modified_topographic_index,
        topographic_index,
    )

    if engine == "auto":
        engine = "pallas" if jax.default_backend() == "tpu" else "xla"
    rows, cols = shape
    h, w = tile_rows, tile_cols
    ny, nx, R, C = _tile_grid(shape, h, w)
    if R * C >= 1 << 31:
        raise ValueError(
            f"padded grid {R}x{C} overflows int32 flat river indices"
        )
    note = progress if progress is not None else (lambda *_: None)
    dem_dt = np.asarray(loaders["dem"](0, 1, 0, 1)).dtype
    max_steps = cfg.flow_max_steps

    spill_dt = dict(
        status=np.uint8, dist=np.float32,
        steps=np.uint16 if max_steps + 1 < (1 << 16) else np.int32,
        slot=np.int32, ridx=np.int32, rz=np.float32, rfac=np.float32,
    )
    spill = {
        k: _alloc_out(out_dir, "_flowloc_" + k, (ny * nx, h * w), dt)
        for k, dt in spill_dt.items()
    }

    local_fn = jax.jit(partial(
        _local_compact, h=h, w=w, R=R, C=C, nx=nx, px=cfg.px,
        max_steps=max_steps, engine=engine, interpret=interpret,
    ))

    def tile_windows(halo=0):
        for iy in range(ny):
            for ix in range(nx):
                yield iy, ix, iy * h, ix * w

    def _prefetched(thunks):
        """One-ahead prefetch on a worker thread: host-side window
        generation / spill reads overlap the device compute + relay
        transfers of the previous tile (both release the GIL)."""
        from concurrent.futures import ThreadPoolExecutor

        thunks = list(thunks)
        with ThreadPoolExecutor(1) as ex:
            fut = ex.submit(thunks[0]) if thunks else None
            for i in range(len(thunks)):
                res = fut.result()
                fut = ex.submit(thunks[i + 1]) if i + 1 < len(thunks) else None
                yield res

    def _overlapped(items, dispatch, finish):
        """Keep one tile in flight: dispatch tile t's (async) device work,
        then block on tile t-1's device_get + host writes — the dominant
        device->host relay transfer overlaps the next tile's upload and
        compute.  ``finish`` runs in tile order."""
        prev = None
        for item in items:
            cur = dispatch(item)
            if prev is not None:
                finish(*prev)
            prev = cur
        if prev is not None:
            finish(*prev)

    def _local_inputs(iy, ix, ys, xs):
        args = [
            load_window(loaders[k], ys, ys + h, xs, xs + w, shape, f, dt)
            for k, f, dt in (
                ("dem", NODATA, dem_dt), ("fdr", 0, np.uint8),
                ("river", 0, np.int8), ("fac", NODATA, np.int32),
            )
        ]
        return iy, ix, args

    rings = []

    def _finish_local(tag, dev):
        iy, ix = tag
        compact, ring = jax.device_get(dev)
        t = iy * nx + ix
        for k in spill:
            spill[k][t] = compact[k]
        rings.append(ring)
        note("flow-local", t, ny * nx)

    _overlapped(
        _prefetched(
            partial(_local_inputs, iy, ix, ys, xs)
            for iy, ix, ys, xs in tile_windows()
        ),
        lambda it: ((it[0], it[1]),
                    local_fn(*it[2], jnp.int32(it[0]), jnp.int32(it[1]))),
        _finish_local,
    )

    ring = {k: jnp.asarray(np.concatenate([r[k] for r in rings]))
            for k in rings[0]}
    solved = {
        k: np.asarray(v) for k, v in jax.device_get(jax.jit(partial(
            boundary.solve_ring, h=h, w=w, nx=nx, max_steps=max_steps
        ))(ring)).items()
    }
    del ring, rings

    out = {
        k: _alloc_out(out_dir, k, shape, dt)
        for k, dt in (
            ("slope", np.float32), ("slope_rad", np.float32),
            ("twi", np.float32), ("mod_twi", np.float32),
            ("downslope", np.float32), ("fdist", np.float32),
            ("indices", np.int32), ("hand", dem_dt),
            ("gfi", np.float32), ("ln_hl_h", np.float32),
        )
    }

    @jax.jit
    def pointwise_fn(dem_ext, fac_t, hand_t, river_fac_t):
        dem_f = jnp.asarray(dem_ext, jnp.float32)
        sl = slope_from_padded(dem_f, cfg.px)
        dem_c = dem_f[1:-1, 1:-1]
        sl_rad = jnp.where(
            dem_c == NODATA, jnp.float32(NODATA), jnp.arctan(sl / 100.0)
        )
        return dict(
            slope=sl,
            slope_rad=sl_rad,
            twi=topographic_index(fac_t, sl_rad, cfg.px),
            mod_twi=modified_topographic_index(
                fac_t, sl_rad, cfg.px, cfg.n_topo
            ),
            gfi=_gfi(hand_t, river_fac_t, cfg.n_gfi, cfg.b_gfi, cfg.px),
            ln_hl_h=_ln_hl_h(hand_t, fac_t, cfg.n_gfi, cfg.b_gfi, cfg.px),
        )

    fac0 = np.float32(np.asarray(loaders["fac"](0, 1, 0, 1)).reshape(-1)[0])

    def _combine_inputs(iy, ix, ys, xs):
        """Prefetch-thread work for pass B+C: spill read, window loads AND
        the host combine (pure numpy) all overlap the previous tile's
        device round-trip."""
        t = iy * nx + ix
        loc = {k: np.asarray(spill[k][t]) for k in spill}
        fac_t = load_window(
            loaders["fac"], ys, ys + h, xs, xs + w, shape, NODATA, np.int32
        )
        dem_ext = load_window(
            loaders["dem"], ys, ys + h, xs, xs + w, shape, NODATA, dem_dt,
            halo=1,
        )
        landed, dist, ridx, rz, rfac = _combine_host(loc, solved, max_steps)
        dem_flat = dem_ext[1:-1, 1:-1].reshape(-1)
        fd = np.where(landed, dist, np.float32(NODATA)).reshape(h, w)
        ix_t = np.where(landed, ridx, np.int32(NODATA)).reshape(h, w)
        hd = np.where(
            (dem_flat != NODATA) & landed,
            np.maximum(dem_flat - rz.astype(dem_dt), 0),
            np.asarray(NODATA, dem_dt),
        ).reshape(h, w)
        rf = np.where(landed, rfac, fac0).reshape(h, w).astype(np.float32)
        if C != cols:
            ix_t = np.where(
                ix_t == NODATA, NODATA, (ix_t // C) * cols + ix_t % C
            )
        return iy, ix, ys, xs, fac_t, dem_ext, fd, ix_t, hd, rf

    def _dispatch_pw(item):
        iy, ix, ys, xs, fac_t, dem_ext, fd, ix_t, hd, rf = item
        return (iy, ix, ys, xs, fd, ix_t, hd), pointwise_fn(
            dem_ext, fac_t, hd, rf
        )

    def _finish_pw(tag, dev):
        iy, ix, ys, xs, fd, ix_t, hd = tag
        pw = jax.device_get(dev)
        ye, xe = min(ys + h, rows), min(xs + w, cols)
        cut = np.s_[: ye - ys, : xe - xs]
        sl_out = np.s_[ys:ye, xs:xe]
        out["fdist"][sl_out] = fd[cut]
        out["indices"][sl_out] = ix_t[cut]
        out["hand"][sl_out] = hd[cut]
        for k in ("slope", "slope_rad", "twi", "mod_twi", "gfi", "ln_hl_h"):
            out[k][sl_out] = pw[k][cut]
        note("combine+pointwise", iy * nx + ix, ny * nx)

    _overlapped(
        _prefetched(
            partial(_combine_inputs, iy, ix, ys, xs)
            for iy, ix, ys, xs in tile_windows()
        ),
        _dispatch_pw,
        _finish_pw,
    )

    # Pass D: exact downslope, per-tile halo with truncation retry.
    from descriptools_tpu.ops.pallas.walk_vmem import (
        downslope_pallas_vmem,
        fits_vmem,
    )

    @partial(jax.jit, static_argnames=("halo", "eng"))
    def downslope_fn(dem_ext, fdr_ext, y0, x0, halo, eng):
        dem_f = jnp.asarray(dem_ext, jnp.float32)
        tr0 = trunc_cells(dem_f, fdr_ext, y0, x0, R, C)
        if eng == "pallas":
            o, tr = downslope_pallas_vmem(
                dem_f, fdr_ext, cfg.px, cfg.elevation_difference,
                max_steps=cfg.downslope_max_steps, trunc0=tr0,
                interpret=interpret,
            )
        else:
            o, tr = _downslope_jacobi(
                dem_f, fdr_ext, cfg.px, cfg.elevation_difference,
                cfg.downslope_max_steps, trunc0=tr0,
            )
        inner = o[halo:-halo, halo:-halo] if halo else o
        tr_in = tr[halo:-halo, halo:-halo] if halo else tr
        return inner, jnp.any(tr_in)

    halo0 = int(min(downslope_halo, max(R, C), cfg.downslope_max_steps + 1))

    def _walk_inputs(iy, ix, ys, xs, halo):
        dem_ext = load_window(
            loaders["dem"], ys, ys + h, xs, xs + w, shape, NODATA,
            dem_dt, halo=halo,
        )
        fdr_ext = load_window(
            loaders["fdr"], ys, ys + h, xs, xs + w, shape, 0, np.uint8,
            halo=halo,
        )
        return iy, ix, ys, xs, dem_ext, fdr_ext

    def _resolve_walk_eng(halo):
        if engine == "pallas" and not fits_vmem(
            h + 2 * halo, w + 2 * halo, kind="downslope_track"
        ):
            return "xla"
        return engine

    def _dispatch_walk(item):
        iy, ix, ys, xs, dem_ext, fdr_ext = item
        return (iy, ix, ys, xs), downslope_fn(
            dem_ext, fdr_ext, jnp.int32(ys - halo0), jnp.int32(xs - halo0),
            halo=halo0, eng=_resolve_walk_eng(halo0),
        )

    def _finish_walk(tag, dev):
        iy, ix, ys, xs = tag
        dn, trunc = jax.device_get(dev)
        halo = halo0
        while bool(trunc) and halo < max(R, C):
            # Rare truncation retry: rerun THIS tile synchronously with a
            # doubled halo until no interior walk is cut (exactness
            # guarantee, mirrors parallel.sharded.sharded_downslope).
            halo = min(2 * halo, max(R, C), cfg.downslope_max_steps + 1)
            _, _, _, _, dem_ext, fdr_ext = _walk_inputs(iy, ix, ys, xs, halo)
            dn, trunc = jax.device_get(downslope_fn(
                dem_ext, fdr_ext, jnp.int32(ys - halo), jnp.int32(xs - halo),
                halo=halo, eng=_resolve_walk_eng(halo),
            ))
        ye, xe = min(ys + h, rows), min(xs + w, cols)
        out["downslope"][ys:ye, xs:xe] = dn[: ye - ys, : xe - xs]
        note("downslope", iy * nx + ix, ny * nx)

    _overlapped(
        _prefetched(
            partial(_walk_inputs, iy, ix, ys, xs, halo0)
            for iy, ix, ys, xs in tile_windows()
        ),
        _dispatch_walk,
        _finish_walk,
    )

    for k in spill:
        arr = spill[k]
        if isinstance(arr, np.memmap):
            path = arr.filename
            del arr
            os.remove(path)
    return out


def tiled_classify_flood(hand, flood_loader, shape, under="under",
                         out_dir=None, tile_rows=4096, tile_cols=4096,
                         progress=None):
    """Streaming flood-map calibration + classification over an out-of-core
    HAND raster — the tiled twin of ``pipeline.classify_flood`` and
    ``parallel.classify.sharded_classify_flood``, selecting the IDENTICAL
    float64 threshold (reference evaluation.py:12-87) while touching one
    tile at a time.

    ``hand``: (rows, cols) array or np.memmap, integer-valued (integer DEM
    input); ``flood_loader(ys, ye, xs, xe)`` windows the benchmark map.
    Every full-raster scan of the reference's calibration becomes one
    streaming pass accumulating int64 TP/FP/FN per threshold batch; the
    float64 scaled predicate reduces to an exact integer cutoff
    (parallel/classify._integer_cutoff).  Returns
    (threshold, correctness, fit, class_map uint8 [memmap if out_dir]).
    """
    from descriptools_tpu.evaluation import coarse_to_fine_search
    from descriptools_tpu.parallel.classify import _integer_cutoff

    rows, cols = shape
    h, w = tile_rows, tile_cols
    ny, nx, _R, _C = _tile_grid(shape, h, w)
    note = progress if progress is not None else (lambda *_: None)

    def tiles():
        for iy in range(ny):
            for ix in range(nx):
                ys, xs = iy * h, ix * w
                yield ys, min(ys + h, rows), xs, min(xs + w, cols)

    # Pass 1: min / second-distinct-min / max (np.unique(hand)[1]/[-1], the
    # reference's NoData-skipping range, pipeline.classify_flood).
    m1 = np.inf
    m2 = np.inf
    mx = -np.inf
    nonint = 0
    for ys, ye, xs, xe in tiles():
        a = np.asarray(hand[ys:ye, xs:xe], np.float64)
        t1 = float(a.min())
        rest = a[a != t1]
        t2 = float(rest.min()) if rest.size else np.inf
        lo, hi = sorted((t1, m1))
        m1 = lo
        m2 = min(m2 if m2 != lo else np.inf, hi if hi != lo else np.inf, t2)
        mx = max(mx, float(a.max()))
        nonint += int((a[a != NODATA] % 1 != 0).sum())
    if nonint:
        raise ValueError(
            "HAND is not integer-valued; exact streaming calibration "
            "requires an integer DEM — use pipeline.classify_flood"
        )
    mn = m2  # elements[1]: smallest value distinct from the global min
    if not np.isfinite(mn) or mx <= mn:
        raise ValueError(f"degenerate HAND value range [{mn}, {mx}]")

    h00 = float(np.asarray(hand[0:1, 0:1], np.float64)[0, 0])
    probe_live = h00 != NODATA

    def counts_at(cuts):
        acc = np.zeros((len(cuts), 3), np.int64)  # tp, fp, fn
        for ys, ye, xs, xe in tiles():
            a = np.asarray(hand[ys:ye, xs:xe])
            b = np.asarray(flood_loader(ys, ye, xs, xe))
            valid = (a != NODATA) & ~(probe_live & (a == h00))
            flooded = b == 1  # bench 1 -> 2 (flooded), NODATA -> 0
            n_fl = int(flooded.sum())
            for k, cut in enumerate(cuts):
                hit = a <= cut if under == "under" else a >= cut
                pred = valid & hit
                tp = int((pred & flooded).sum())
                fp = int(pred.sum()) - tp
                acc[k] += (tp, fp, n_fl - tp)
        return acc

    def fits_at(values, scale):
        cuts = [_integer_cutoff(v / scale, mn, mx, under) for v in values]
        c = counts_at(cuts).astype(np.float64)
        return c[:, 0] / (c[:, 0] + c[:, 2] + c[:, 1])

    th = coarse_to_fine_search(fits_at)
    cut = _integer_cutoff(th, mn, mx, under)
    tp, fp, fn = counts_at([cut])[0].astype(np.float64)
    correctness = tp / (fn + tp)
    fit = tp / (tp + fn + fp)

    class_map = _alloc_out(out_dir, "class_map", shape, np.uint8)
    for t, (ys, ye, xs, xe) in enumerate(tiles()):
        a = np.asarray(hand[ys:ye, xs:xe])
        b = np.asarray(flood_loader(ys, ye, xs, xe)).astype(np.int32)
        valid = (a != NODATA) & ~(probe_live & (a == h00))
        hit = a <= cut if under == "under" else a >= cut
        pred = (valid & hit).astype(np.uint8)
        bnorm = np.where(b == 1, 2, np.where(b == NODATA, 0, b))
        class_map[ys:ye, xs:xe] = pred + bnorm.astype(np.uint8)
        note("classify", t, ny * nx)
    return th, float(correctness), float(fit), class_map
