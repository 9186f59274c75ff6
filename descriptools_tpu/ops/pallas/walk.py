"""Pallas TPU multi-sweep walk kernels: downslope + flow frontier propagation.

The XLA frontier engines (ops/downslope.py `_downslope_jacobi`,
ops/flow.py `resolve_absorbing_walk`) advance every cell's D8 walk one step
per whole-grid pass; a pass re-streams every payload through HBM, so long
flats (measured ~1300 sweeps for downslope, ~700 for flow on the bundled
basin) pay ~0.2 ms of HBM traffic per sweep.

These kernels block the grid into (BH, BW) tiles with an H-cell halo, DMA
each window HBM -> VMEM once, run **H sweeps entirely in VMEM** (values
propagate one cell per sweep, so an H-halo keeps the interior exact for H
sweeps — the wavefront analogue of blocked attention), and write the
interior back.  HBM traffic drops by ~H/window-overhead (~30x at H=64),
leaving the VPU select chain as the only per-sweep cost.

Semantics are bit-identical to the XLA engines: the same pull8 select order
(descriptools_tpu/d8.py), the same first-hit freezing, the same step-cap
gating.  Reference semantics: downslope.py:434-532 (threshold walk),
flowhand.py:565-846 (walk-to-river); the recast rationale is in SURVEY §7.

These blocked kernels are the single-device >VMEM tier; the sharded path
runs walk_vmem's whole-grid kernels per shard inside shard_map (flow via
parallel/boundary.py, downslope via parallel/sharded.py with trunc
tracking) and falls back to the XLA engines when a halo-extended shard
outgrows VMEM.
Grids are padded host-side to block multiples; the pad ring gets fdr=0
(self-pull => inert), so padding never changes real-cell results.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from descriptools_tpu.constants import D8_CODES, D8_DX, D8_DY, NODATA

# Block geometry: window lane dim (BW + 2H) and sublane dim (BH + 2H) must
# be multiples of (8, 128); H=64 keeps both aligned for BH mult of 8 and BW
# mult of 128.
BH = 256
BW = 512
H_SWEEPS = 64

_OFF = float(1 << 20)  # terminal-elevation offset (ops/downslope.py)
_HALF = float(1 << 19)
# Truncation-tracking offset encoding (shared with walk_vmem): ordinary
# terminals encode as z - _OFF, TRUNCATED terminals (ops.downslope.trunc_cells
# — the local block ran out of data mid-walk) as z - _OFF2.  The flag rides
# the already-pulled Zt raster; no extra pull.  Exact for integer elevations
# (f32 ulp at 2^21 is 0.25, and z - 2^21 is an integer < 2^24).
_OFF2 = float(1 << 21)
_T3 = float(3 << 19)  # -1.5*_OFF: below = truncated terminal encoding
# Flow: unresolved sentinel code.  Codes are int32 (+idx river / -idx-1 NaN
# absorber), exact at any grid size < 2^31 cells — f32 codes would round
# above 2^24.  INT32_MIN never collides with -idx-1 for idx < 2^31-1.
UNRES = -(1 << 31)


def _roll(a, shift, axis):
    """pltpu.roll with negative shifts mapped to size-shift (pure rotate).

    out[i] = a[(i - shift) mod n]; we use it as a shifted view whose wrapped
    edge is only ever read by window-edge cells whose values are garbage
    anyway — the H-halo keeps them away from the interior, so wraparound
    never changes results.
    """
    n = a.shape[axis]
    return pltpu.roll(a, shift % n, axis)


def _pull(masks, arr):
    """pull8 on a VMEM-resident window — identical select order to d8.pull8.

    out[r, c] = arr[r + dy, c + dx] via native VPU rotates: the two lane-dim
    rotates are hoisted (each shared by three of the eight directions); the
    row rotates are cheap sublane permutes.
    """
    east = _roll(arr, -1, 1)  # out[., c] = arr[., c + 1]
    west = _roll(arr, 1, 1)
    by_dx = {-1: west, 0: arr, 1: east}
    acc = arr
    for m, dy, dx in zip(masks, D8_DY, D8_DX):
        v = by_dx[dx]
        if dy:
            v = _roll(v, -dy, 0)
        acc = jnp.where(m, v, acc)
    return acc


def _window_dma(refs, scratches, sems, by, bx, wh, ww):
    dmas = []
    for ref, scr, i in zip(refs, scratches, range(len(refs))):
        dmas.append(
            pltpu.make_async_copy(
                ref.at[pl.ds(by * BH, wh), pl.ds(bx * BW, ww)], scr, sems.at[i]
            )
        )
    for d in dmas:
        d.start()
    for d in dmas:
        d.wait()


# ---------------------------------------------------------------------------
# Downslope kernel — blocked FREEZE-AT-HIT tier (the walk_vmem freeze
# design at HBM scale): per-cell state is only (pk, Zt); a cell whose Zt
# crossed its own threshold is FROZEN and stops advancing, so the frozen
# pair IS the first-hit record and the wrapper reconstructs the ratio (and
# the trunc flag, from the Zt offset encoding) once, post-pass.  No result
# rasters, no trunc raster, no in-sweep decode.  Exact under monotone
# descent (the wrapper lax.cond-falls back to the XLA jacobi otherwise) —
# the same argument as walk_vmem._downslope_kernel; the H-halo staleness
# bound is unchanged because freezing is a local function of each cell's
# own state.
# ---------------------------------------------------------------------------


def _downslope_kernel(t_ref, flag_ref, fdr_hbm, d_hbm, zt_hbm, thresh_hbm,
                      d_out, zt_out, w_fdr, w_d, w_zt, w_th, sems,
                      *, h, max_steps):
    by = pl.program_id(0)
    bx = pl.program_id(1)
    wh, ww = BH + 2 * h, BW + 2 * h
    # Per-block skip flags (computed by the wrapper): unfrozen-cell counts.
    # Frozen cells never change, so an all-frozen block is at its fixed
    # point and copy-through is exact.
    active = flag_ref[by, bx] > 0

    @pl.when(active)
    def _():
        _window_dma([fdr_hbm, d_hbm, zt_hbm, thresh_hbm],
                    [w_fdr, w_d, w_zt, w_th], sems, by, bx, wh, ww)

        fdr_w = w_fdr[:, :]
        masks = [fdr_w == code for code in D8_CODES]
        # Packed step-count increment derived in-kernel from the fdr window
        # (no stepd DMA): cardinal -> +1, diagonal -> +1<<16, the shared
        # packed-counts encoding (ops.downslope.unpack_dist note).  The f32
        # distance is reconstructed only in the wrapper's final expression,
        # never inside the sweep (the round-4 spill-slot failure mode).
        diag = (fdr_w == 2) | (fdr_w == 8) | (fdr_w == 32) | (fdr_w == 128)
        inc_w = jnp.where(
            fdr_w == 0, jnp.int32(0),
            jnp.where(diag, jnp.int32(1 << 16), jnp.int32(1)),
        )
        th_w = w_th[:, :]
        t0 = t_ref[0, 0]

        def sweep(k, carry):
            D, Zt = carry
            adv = ((t0 + k) < max_steps) & (Zt > th_w)
            pD = _pull(masks, D)
            pZt = _pull(masks, Zt)
            return (
                jnp.where(adv, inc_w + pD, D),
                jnp.where(adv, pZt, Zt),
            )

        D, Zt = jax.lax.fori_loop(0, h, sweep, (w_d[:, :], w_zt[:, :]))
        d_out[:, :] = D[h : h + BH, h : h + BW]
        zt_out[:, :] = Zt[h : h + BH, h : h + BW]

    @pl.when(~active)
    def _():
        _copy_through([d_hbm, zt_hbm], [d_out, zt_out], [w_d, w_zt],
                      sems, by, bx, h)


def _interior_spec():
    return pl.BlockSpec((BH, BW), lambda by, bx: (by, bx), memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("h", "max_steps", "interpret"))
def _downslope_sweeps(t, flags, fdr_p, d_p, zt_p, thresh_p,
                      h, max_steps, interpret=False):
    """One pallas call = h sweeps of the freeze kernel.  Padded window
    inputs, interior (pk, Zt) outputs."""
    rp = d_p.shape[0] - 2 * h
    cp = d_p.shape[1] - 2 * h
    grid = (rp // BH, cp // BW)
    win = (BH + 2 * h, BW + 2 * h)
    vma = jax.typeof(d_p).vma  # shard_map callers: outputs inherit axes
    return pl.pallas_call(
        functools.partial(_downslope_kernel, h=h, max_steps=max_steps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda by, bx: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole flags array
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[_interior_spec()] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((rp, cp), jnp.int32, vma=vma),  # packed pk
            jax.ShapeDtypeStruct((rp, cp), jnp.float32, vma=vma),  # Zt
        ],
        scratch_shapes=[
            pltpu.VMEM(win, jnp.int32),
            pltpu.VMEM(win, jnp.int32),  # packed-count window
            pltpu.VMEM(win, jnp.float32),
            pltpu.VMEM(win, jnp.float32),  # threshold window
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(t, flags, fdr_p, d_p, zt_p, thresh_p)


def _pad_block(arr, h, rp, cp, fill):
    r, c = arr.shape
    return jnp.pad(
        arr, ((h, h + rp - r), (h, h + cp - c)),
        constant_values=jnp.asarray(fill, arr.dtype),
    )


def _block_dims(rows, cols):
    rp = -(-rows // BH) * BH
    cp = -(-cols // BW) * BW
    return rp, cp


@functools.partial(
    jax.jit,
    static_argnames=("px", "elevation_difference", "max_steps", "h", "interpret"),
)
def downslope_pallas(dem, fdr, px, elevation_difference,
                     max_steps=5000, h=H_SWEEPS, interpret=False, trunc0=None):
    """Downslope index via the multi-sweep freeze walk kernel.

    Bit-identical to ops.downslope._downslope_jacobi (same pull order,
    identical packed step counts and the one shared f32 reconstruction via
    ops.downslope.unpack_dist, same cap semantics — downslope.py:434-532
    spec).

    Compile-cost note: the non-monotone fallback branch traces the XLA
    jacobi while-loop alongside the Pallas kernel (lax.cond compiles both),
    roughly doubling first-compile time at each new shape — accepted for
    correctness on adversarial fdr; the persistent XLA cache amortises it
    across runs, and real hydrological inputs execute only the freeze
    branch.

    With ``trunc0`` (per-cell bool from ops.downslope.trunc_cells) also
    returns an int32->bool raster flagging cells whose stop landed on a
    truncated terminal — the sharded/tiled halo-doubling retry signal,
    threaded through the walk as a double terminal offset on Zt (the same
    ``_OFF2`` encoding as walk_vmem; no extra pulled raster).  This is the
    >VMEM tier's trunc tracking, so config-5-sized (8192^2+) blocks keep the
    Pallas engine instead of falling back to the XLA jacobi.
    """
    from descriptools_tpu.d8 import pull8
    from descriptools_tpu.ops.downslope import (
        _downslope_jacobi,
        _terminal_and_step,
        unpack_dist,
    )

    track = trunc0 is not None
    rows, cols = dem.shape
    z, terminal, _stepd = _terminal_and_step(dem, fdr, px, NODATA)
    thresh0 = z - jnp.float32(elevation_difference)
    fdr_eff = jnp.where(terminal, 0, jnp.asarray(fdr)).astype(jnp.int32)
    if track:
        trunc_t = terminal & jnp.asarray(trunc0, jnp.bool_)
        zt0 = jnp.where(
            terminal,
            jnp.where(trunc_t, z - jnp.float32(_OFF2), z - _OFF),
            z,
        )
    else:
        zt0 = jnp.where(terminal, z - _OFF, z)
    # Monotone-descent probe gating the freeze kernel (walk_vmem note);
    # adversarial non-monotone inputs take the XLA jacobi branch.
    (z_succ,) = pull8(fdr_eff, [z], [0.0])
    mono = jnp.all(z_succ <= z)

    def _decode(Zt):
        base = jnp.where(Zt < -_HALF, Zt + _OFF, Zt)
        if not track:
            return base
        return jnp.where(Zt < jnp.float32(-_T3), Zt + jnp.float32(_OFF2), base)

    def run_freeze(_):
        rp, cp = _block_dims(rows, cols)
        nby, nbx = rp // BH, cp // BW
        fdr_p = _pad_block(fdr_eff, h, rp, cp, 0)
        # Pad ring: frozen by construction (zt pad -_OFF <= thresh pad 0).
        thresh_p = _pad_block(thresh0, h, rp, cp, 0.0)
        thresh_i = thresh_p[h:-h, h:-h]
        d0 = jnp.zeros((rp, cp), jnp.int32)  # packed step counts
        zt = _pad_block(zt0, h, rp, cp, -_OFF)[h:-h, h:-h]

        def _blk(mask2d):
            return jnp.sum(
                mask2d.reshape(nby, BH, nbx, BW).astype(jnp.int32),
                axis=(1, 3),
            )

        def cond(carry):
            _d, Zt, t = carry
            return jnp.any(Zt > thresh_i) & (t < max_steps)

        def body(carry):
            D, Zt, t = carry
            flags = _blk(Zt > thresh_i)
            D, Zt = _downslope_sweeps(
                jnp.full((1, 1), t, jnp.int32), flags, fdr_p,
                jnp.pad(D, h), jnp.pad(Zt, h), thresh_p,
                h, max_steps, interpret=interpret,
            )
            return (D, Zt, t + h)

        D, Zt, _t = jax.lax.while_loop(
            cond, body, (d0, zt, jnp.array(0, jnp.int32))
        )

        # Post-pass reconstruction — frozen cells hold the first-hit
        # record; unfrozen (capped) cells hold the horizon partial
        # (downslope.py:303 semantics); identical operands to the jacobi
        # engine via unpack_dist.
        pk = D[:rows, :cols]
        Zt = Zt[:rows, :cols]
        res = jnp.where(
            pk == 0, 0.0, (z - _decode(Zt)) / unpack_dist(pk, px)
        )
        res = jnp.where(z == jnp.float32(NODATA), jnp.float32(NODATA), res)
        if track:
            # Cap stops (unfrozen) are never flagged — same rule as
            # jacobi's ``res_t & stopped``.
            frozen = Zt <= thresh0
            return res, frozen & (Zt < jnp.float32(-_T3))
        return res

    def run_jacobi(_):
        return _downslope_jacobi(
            dem, fdr, px, elevation_difference, max_steps,
            trunc0=trunc0 if track else None,
        )

    return jax.lax.cond(mono, run_freeze, run_jacobi, None)


# ---------------------------------------------------------------------------
# Flow kernel: single packed state code per cell —
#   code = +absorber_index        resolved, landed on a river cell
#          -absorber_index - 1    resolved, landed on a NaN absorber
#          UNRES                  still walking
# (int32 codes, exact for any grid < 2^31 cells).  dist accumulates stepd on
# first hit, in the same order as the XLA frontier engine.  A cell resolved
# at sweep t has path length <= t <= max_steps, so no separate step counter
# is needed.
# ---------------------------------------------------------------------------


def _copy_through(srcs, dsts, scrs, sems, by, bx, h):
    """Quiescent block: forward the interior unchanged (no sweeps).

    Routed through the window scratch: a direct interior DMA would start at
    lane offset ``bx*BW + h``, which Mosaic cannot prove 128-aligned for
    h=64 (on-chip compile failure, caught by the round-3 blocked-tier parity
    gate); the window start ``bx*BW`` is aligned, and the interior slice out
    of VMEM uses static offsets like the active path."""
    wh, ww = BH + 2 * h, BW + 2 * h
    _window_dma(srcs, scrs, sems, by, bx, wh, ww)
    for dst, scr in zip(dsts, scrs):
        dst[:, :] = scr[h : h + BH, h : h + BW]


def _flow_kernel(t_ref, flag_ref, fdr_hbm, stepd_hbm, code_hbm, dist_hbm,
                 code_out, dist_out, w_fdr, w_stepd, w_code, w_dist, sems,
                 *, h, max_steps):
    by = pl.program_id(0)
    bx = pl.program_id(1)
    wh, ww = BH + 2 * h, BW + 2 * h
    # Per-block skip: resolved cells never change, so a block with no UNRES
    # cell is at its fixed point — neighbours read its constant HBM rows
    # either way.  Skipping is unconditionally exact; the tail of a huge
    # grid then costs DMA-copy-through instead of h sweeps per block.
    active = flag_ref[by, bx] > 0

    @pl.when(active)
    def _():
        _window_dma([fdr_hbm, stepd_hbm, code_hbm, dist_hbm],
                    [w_fdr, w_stepd, w_code, w_dist], sems, by, bx, wh, ww)

        fdr_w = w_fdr[:, :]
        masks = [fdr_w == code for code in D8_CODES]
        stepd_w = w_stepd[:, :]
        t0 = t_ref[0, 0]

        def sweep(k, carry):
            code, dist = carry
            gate = (t0 + k) < max_steps
            p_code = _pull(masks, code)
            p_dist = _pull(masks, dist)
            hit = gate & (code == UNRES) & (p_code != UNRES)
            dist = jnp.where(hit, stepd_w + p_dist, dist)
            code = jnp.where(hit, p_code, code)
            return (code, dist)

        code, dist = jax.lax.fori_loop(0, h, sweep, (w_code[:, :], w_dist[:, :]))
        code_out[:, :] = code[h : h + BH, h : h + BW]
        dist_out[:, :] = dist[h : h + BH, h : h + BW]

    @pl.when(~active)
    def _():
        _copy_through([code_hbm, dist_hbm], [code_out, dist_out],
                      [w_code, w_dist], sems, by, bx, h)


@functools.partial(jax.jit, static_argnames=("h", "max_steps", "interpret"))
def _flow_sweeps(t, flags, fdr_p, stepd_p, code_p, dist_p, h, max_steps,
                 interpret=False):
    rp = code_p.shape[0] - 2 * h
    cp = code_p.shape[1] - 2 * h
    grid = (rp // BH, cp // BW)
    win = (BH + 2 * h, BW + 2 * h)
    return pl.pallas_call(
        functools.partial(_flow_kernel, h=h, max_steps=max_steps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda by, bx: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole flags array
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[_interior_spec()] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((rp, cp), jnp.int32),
            jax.ShapeDtypeStruct((rp, cp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM(win, jnp.int32),
            pltpu.VMEM(win, jnp.float32),
            pltpu.VMEM(win, jnp.int32),
            pltpu.VMEM(win, jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(t, flags, fdr_p, stepd_p, code_p, dist_p)


# ---------------------------------------------------------------------------
# Generalised blocked absorbing walk: (code, dist, steps), the HBM-tier twin
# of walk_vmem.absorbing_walk_pallas_vmem for blocks too big for VMEM — the
# boundary-graph local phase uses it per shard when the VMEM tier won't fit.
# ---------------------------------------------------------------------------


def _walk3_kernel(t_ref, fdr_hbm, stepd_hbm, code_hbm, dist_hbm, steps_hbm,
                  code_out, dist_out, steps_out,
                  w_fdr, w_stepd, w_code, w_dist, w_steps, sems,
                  *, h, max_steps):
    by = pl.program_id(0)
    bx = pl.program_id(1)
    wh, ww = BH + 2 * h, BW + 2 * h
    _window_dma([fdr_hbm, stepd_hbm, code_hbm, dist_hbm, steps_hbm],
                [w_fdr, w_stepd, w_code, w_dist, w_steps], sems, by, bx, wh, ww)

    fdr_w = w_fdr[:, :]
    masks = [fdr_w == code for code in D8_CODES]
    stepd_w = w_stepd[:, :]
    t0 = t_ref[0, 0]

    def sweep(k, carry):
        code, dist, steps = carry
        gate = (t0 + k) < max_steps
        p_code = _pull(masks, code)
        p_dist = _pull(masks, dist)
        p_steps = _pull(masks, steps)
        hit = gate & (code == UNRES) & (p_code != UNRES)
        dist = jnp.where(hit, stepd_w + p_dist, dist)
        steps = jnp.where(hit, 1.0 + p_steps, steps)
        code = jnp.where(hit, p_code, code)
        return (code, dist, steps)

    code, dist, steps = jax.lax.fori_loop(
        0, h, sweep, (w_code[:, :], w_dist[:, :], w_steps[:, :])
    )
    code_out[:, :] = code[h : h + BH, h : h + BW]
    dist_out[:, :] = dist[h : h + BH, h : h + BW]
    steps_out[:, :] = steps[h : h + BH, h : h + BW]


@functools.partial(jax.jit, static_argnames=("h", "max_steps", "interpret"))
def _walk3_sweeps(t, fdr_p, stepd_p, code_p, dist_p, steps_p, h, max_steps,
                  interpret=False):
    rp = code_p.shape[0] - 2 * h
    cp = code_p.shape[1] - 2 * h
    grid = (rp // BH, cp // BW)
    win = (BH + 2 * h, BW + 2 * h)
    vma = jax.typeof(code_p).vma
    return pl.pallas_call(
        functools.partial(_walk3_kernel, h=h, max_steps=max_steps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda by, bx: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[_interior_spec()] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((rp, cp), jnp.int32, vma=vma),
            jax.ShapeDtypeStruct((rp, cp), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((rp, cp), jnp.float32, vma=vma),
        ],
        scratch_shapes=[
            pltpu.VMEM(win, jnp.int32),
            pltpu.VMEM(win, jnp.float32),
            pltpu.VMEM(win, jnp.int32),
            pltpu.VMEM(win, jnp.float32),
            pltpu.VMEM(win, jnp.float32),
            pltpu.SemaphoreType.DMA((5,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(t, fdr_p, stepd_p, code_p, dist_p, steps_p)


@functools.partial(jax.jit, static_argnames=("px", "max_steps", "h", "interpret"))
def absorbing_walk_pallas(fdr_eff, code0, stepd0, px, max_steps=20000,
                          h=H_SWEEPS, interpret=False):
    """Generic absorbing walk on the blocked (HBM-resident) tier.

    Same contract as walk_vmem.absorbing_walk_pallas_vmem: ``fdr_eff`` has
    absorbing cells zeroed, ``code0`` holds own flat index at absorbers and
    UNRES elsewhere, ``stepd0`` the per-cell step length (0 at absorbers).
    Returns (code, dist, steps) with the same accumulation order as the XLA
    frontier engine — integer outputs engine-independent bitwise.
    """
    rows, cols = fdr_eff.shape
    rp, cp = _block_dims(rows, cols)
    fdr_p = _pad_block(jnp.asarray(fdr_eff, jnp.int32), h, rp, cp, 0)
    stepd_p = _pad_block(jnp.asarray(stepd0, jnp.float32), h, rp, cp, 0.0)
    code = _pad_block(jnp.asarray(code0, jnp.int32), h, rp, cp, -1)[h:-h, h:-h]
    dist = code.astype(jnp.float32) * 0.0
    steps = dist

    def cond(carry):
        _c, _d, _s, newly, t = carry
        return (newly > 0) & (t < max_steps)

    def body(carry):
        code, dist, steps, _newly, t = carry
        before = jnp.sum(code == UNRES)
        code, dist, steps = _walk3_sweeps(
            jnp.full((1, 1), t, jnp.int32), fdr_p, stepd_p,
            jnp.pad(code, h, constant_values=-1), jnp.pad(dist, h),
            jnp.pad(steps, h), h, max_steps, interpret=interpret,
        )
        after = jnp.sum(code == UNRES)
        return (code, dist, steps, before - after, t + h)

    zero = jnp.sum(code == UNRES) * 0
    code, dist, steps, _n, _t = jax.lax.while_loop(
        cond, body, (code, dist, steps, zero + 1, zero)
    )
    sl = (slice(0, rows), slice(0, cols))
    return code[sl], dist[sl], steps[sl]


@functools.partial(jax.jit, static_argnames=("px", "max_steps", "h", "interpret"))
def flow_pallas(fdr, river, px, max_steps=20000, h=H_SWEEPS, interpret=False):
    """(fdist, indices) via the multi-sweep walk kernel, run to convergence.

    Matches ops.flow semantics exactly (flowhand.py:565-846 truth table):
    rivers absorb with their own flat index; dead ends / border exits /
    invalid codes absorb as NODATA; cycles and over-cap paths -> NODATA.
    """
    from descriptools_tpu.ops.flow import flow_states

    rows, cols = fdr.shape
    n = rows * cols
    succ, step, absorbing, absorb_nan, is_river = flow_states(
        fdr, river, rows, cols
    )
    absorbing2d = absorbing.reshape(rows, cols)
    is_river2d = is_river.reshape(rows, cols)
    self_idx = jnp.arange(n, dtype=jnp.int32).reshape(rows, cols)
    code0 = jnp.where(
        absorbing2d, jnp.where(is_river2d, self_idx, -self_idx - 1), jnp.int32(UNRES)
    )
    stepd0 = jnp.where(absorbing2d, 0.0, step.reshape(rows, cols) * jnp.float32(px))
    fdr_eff = jnp.where(absorbing2d, 0, jnp.asarray(fdr)).astype(jnp.int32)

    rp, cp = _block_dims(rows, cols)
    fdr_p = _pad_block(fdr_eff, h, rp, cp, 0)
    stepd_p = _pad_block(stepd0, h, rp, cp, 0.0)
    code = _pad_block(code0, h, rp, cp, -1)[h:-h, h:-h]  # pad: inert resolved
    dist = jnp.zeros((rp, cp), jnp.float32)

    def cond(carry):
        _code, _dist, newly, t = carry
        return (newly > 0) & (t < max_steps)

    def body(carry):
        code, dist, _newly, t = carry
        # Per-block UNRES counts double as the skip flags and the global
        # convergence counter.
        rp_, cp_ = code.shape
        flags = jnp.sum(
            (code == UNRES).reshape(rp_ // BH, BH, cp_ // BW, BW)
            .astype(jnp.int32),
            axis=(1, 3),
        )
        before = jnp.sum(flags)
        code, dist = _flow_sweeps(
            jnp.full((1, 1), t, jnp.int32), flags, fdr_p, stepd_p,
            jnp.pad(code, h, constant_values=-1), jnp.pad(dist, h),
            h, max_steps, interpret=interpret,
        )
        after = jnp.sum(code == UNRES)
        return (code, dist, before - after, t + h)

    code, dist, _newly, _t = jax.lax.while_loop(
        cond, body, (code, dist, jnp.array(1, jnp.int32), jnp.array(0, jnp.int32))
    )

    code = code[:rows, :cols]
    dist = dist[:rows, :cols]
    landed = code >= 0
    fdist = jnp.where(landed, dist, jnp.float32(NODATA))
    indices = jnp.where(landed, code, jnp.int32(NODATA))
    return fdist, indices
