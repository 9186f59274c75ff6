"""Whole-grid VMEM-resident walk kernels: the speed-of-light tier.

The blocked multi-sweep kernels (ops/pallas/walk.py) pay two taxes every
sweep: the halo-window overlap (window/interior ~ 1.9x VPU work at
BH=256/BW=512/H=64) and an HBM round-trip every H sweeps.  For grids whose
walk state fits VMEM (the bundled 2178x1534 basin is ~13.4 MB per f32
raster; v5e VMEM is 128 MB) neither tax is necessary: load the state once,
run EVERY sweep to convergence inside a single kernel launch, write back
once.

Mosaic materialises full-array temporaries for vector expressions, so a
naive whole-grid sweep needs ~25 grid-sized buffers (measured: 376 MB for
the basin).  The kernels therefore keep only the *state* rasters grid-sized
and run **PAD sweeps per in-place band visit**: band b's window is

    [ PAD-row pre-visit tail of band b-1 (carried) | band b | head of band b+1 ]

— everything read is pre-visit (own rows are read before the write, rows
below are not yet processed, rows above come from the carried tail), and a
PAD-row halo keeps the band interior wavefront-exact for exactly PAD sweeps
(information moves one row per sweep), so the visit is bitwise-identical
Jacobi while temporaries stay band-sized and window assembly / masks /
writes amortise PAD-fold.  Per-band quiescence flags (SMEM) skip bands at
their fixed point, so long-tail convergence only pays for active bands.

State-diet tricks (the sweeps are VMEM-band-traffic-bound, so every raster
removed is a direct win):
- no ``stepd`` raster: per-direction step increments are constants fused
  into the pull select-chain (packed integer counts, reconstructed to the
  reference's f32 distance ONCE post-pass via ops.downslope.unpack_dist —
  identical expression in every engine, so results stay bit-identical).
- downslope carries NO result raster at all: frozen cells (Zt at or below
  their own threshold) stop advancing, so the frozen (pk, Zt) pair IS the
  first-hit record, decoded post-pass — including the sharded truncation
  flag, which rides the Zt offset encoding (see the downslope section).
- flow carries NO fdr raster: each cell's D8 direction lives in the code
  raster's low 4 bits (see the flow section's UNRES24 encoding).

Wraparound note: pltpu.roll is circular, but a wrapped read can only be
*selected* by a cell whose fdr points off-grid, and every such cell is
already absorbing/terminal (flow_states / _terminal_and_step mark global
border exits), i.e. its direction mask is zeroed — the garbage lane is
always discarded by the select.  The 8-row top/bottom pads keep band-edge
wraps away from real rows.

Reference semantics: downslope.py:434-532 (threshold walk),
flowhand.py:565-846 (walk-to-river); see SURVEY §7 for the recast rationale.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from descriptools_tpu.constants import D8_CODES, D8_DX, D8_DY, D8_STEP, NODATA
from descriptools_tpu.ops.pallas.walk import (
    _OFF,
    _OFF2,
    _HALF,
    _T3,
    UNRES,
    _roll,
)

# Sweeps per convergence check (a full-grid reduction ~ one sweep's cost,
# so checking every CHECK sweeps keeps the overhead ~1/CHECK).
CHECK = 64
FLOW_BAND = 128  # rows per in-place band; temporaries are (band+16, cols)
# The packed freeze kernel carries only 2 state rasters through the sweep,
# so downslope bands can match flow's: halo rows drop from 25 % to 12.5 %
# of each visit's traffic and the band loop halves (measured on-chip:
# 71.8 -> see artifacts/probe_phases.json / BENCH_r05).
DOWN_BAND = 128
PAD = 8  # inert rows above and below the grid; also sweeps per band visit

VMEM_BYTES = 128 * 1024 * 1024
# Grid-sized VMEM windows per kernel kind, counted as inputs PLUS outputs:
# Mosaic allocates input AND output windows separately even under
# input_output_aliases (measured on-chip: a 6-input/2-output kernel used
# 161 MB on the basin, not 121 MB).  The +2 in fits_vmem covers band
# temporaries and the convergence-reduce temp.
#   downslope / downslope_track: the packed freeze kernel — 4 VMEM inputs
#     (fdr, z, pk, zt) + 2 outputs (pk, zt); tracking rides the Zt offset
#     encoding, so both modes share one kernel and one footprint.
#   walk3: 4 inputs (fdr, code, dist, steps) + 3 outputs.
#   walk2: 2 inputs (packed dir+code, packed counts) + 2 outputs — the
#     round-5 packed-code kernel needs no fdr raster at all.
_STATE_RASTERS = {"downslope": 6, "downslope_track": 6, "walk3": 7,
                  "walk2": 4}

# Truncation-tracking offset encoding (_OFF2/_T3, shared with the blocked
# tier): see ops/pallas/walk.py — ordinary terminals encode as z - _OFF,
# truncated terminals as z - _OFF2, the flag riding the pulled Zt raster.


def fits_vmem(rows, cols, kind="downslope"):
    """True when the whole-grid kernel's state + temp headroom fits VMEM.

    Budget = grid-sized windows (inputs + outputs, _STATE_RASTERS — Mosaic
    does not collapse aliased pairs) + a generous 24 band-sized temporaries
    for the sweep select chains and spill slots."""
    band = DOWN_BAND if kind.startswith("downslope") else FLOW_BAND
    rp, cp = _align(rows, cols, band)
    raster = (rp + 2 * PAD) * cp * 4
    temps = 24 * (band + 2 * PAD) * cp * 4
    return _STATE_RASTERS[kind] * raster + temps <= VMEM_BYTES


def _align(rows, cols, band):
    return -(-rows // band) * band, -(-cols // 128) * 128


def _pad(arr, rp, cp, fill):
    """Pad to (PAD + rp + PAD, cp) with inert fill."""
    r, c = arr.shape
    return jnp.pad(
        arr, ((PAD, PAD + rp - r), (0, cp - c)),
        constant_values=jnp.asarray(fill, arr.dtype),
    )


def _visit_masks(fdr_ext, edge_guard=False, codes=None):
    """Per-visit pull-select masks, precomputed once and shared by every
    sweep and every pulled array of the visit.

    Layout (D8 codes E=1 SE=2 S=4 SW=8 W=16 NW=32 N=64 NE=128):
      - ``e``/``w``: dy=0 direct selects;
      - ``dn``: (rolled-SE, rolled-S, any-down) for the dy=+1 group — the
        group select runs at the SOURCE row (masks pre-rolled by +1), then
        ONE sublane roll moves the whole group, cutting the per-array
        sublane rolls from six to two;
      - ``up``: likewise for dy=-1 (NW, N, NE).
    Select chains are disjoint (one D8 code per cell), so regrouping is
    bitwise-identical to the canonical d8.pull8 order.

    ``edge_guard=True`` additionally zeroes the vertical groups on the
    window's first/last row, whose pull sublane-roll WRAPS to the other
    window edge.  Interior rows keep identical selects; the edge rows go
    stale instead of reading wrap garbage — required when a visit sweeps
    more than PAD times (the walk3 inner convergence loop), because the
    "garbage stays in the discarded halo for <= PAD sweeps" invariant no
    longer bounds propagation.

    ``codes`` overrides the 8 direction values in D8_CODES order (the
    packed flow kernel stores compact dir indexes 1..8 instead of the
    power-of-two D8 codes; same masks, same select order).
    """
    cs = [int(c) for c in (D8_CODES if codes is None else codes)]
    cE, cSE, cS, cSW, cW, cNW, cN, cNE = cs
    m = {c: fdr_ext == c for c in cs}
    dn_any = m[cSE] | m[cS] | m[cSW]
    up_any = m[cNW] | m[cN] | m[cNE]
    if edge_guard:
        ri = jax.lax.broadcasted_iota(jnp.int32, fdr_ext.shape, 0)
        up_any = up_any & (ri > 0)
        dn_any = dn_any & (ri < fdr_ext.shape[0] - 1)
    # Mosaic can only rotate 32-bit data: roll the int fdr once per group
    # and compare post-roll instead of rolling bool masks.
    fdr_dn = _roll(fdr_ext, 1, 0)  # fdr of the row above, at the source row
    fdr_up = _roll(fdr_ext, -1, 0)
    return dict(
        e=m[cE], w=m[cW],
        dn=(fdr_dn == cSE, fdr_dn == cS, dn_any),
        up=(fdr_up == cNW, fdr_up == cN, up_any),
    )


def _pull_sel(mp, arr):
    """pull8 on a band window — bitwise-equal values to d8.pull8."""
    east = _roll(arr, -1, 1)
    west = _roll(arr, 1, 1)
    acc = jnp.where(mp["e"], east, arr)
    acc = jnp.where(mp["w"], west, acc)
    m_se, m_s, dn_any = mp["dn"]
    g = jnp.where(m_se, east, jnp.where(m_s, arr, west))
    acc = jnp.where(dn_any, _roll(g, -1, 0), acc)
    m_nw, m_n, up_any = mp["up"]
    g = jnp.where(m_nw, west, jnp.where(m_n, arr, east))
    acc = jnp.where(up_any, _roll(g, 1, 0), acc)
    return acc


def _pull_add(mp, arr, consts):
    """Fused ``step + value-at-successor``: per direction the step length is
    a constant, so the add rides the select chain (no stepd raster).
    ``consts`` follows D8_CODES order."""
    cE, cSE, cS, cSW, cW, cNW, cN, cNE = consts
    east = _roll(arr, -1, 1)
    west = _roll(arr, 1, 1)
    acc = jnp.where(mp["e"], cE + east, arr)
    acc = jnp.where(mp["w"], cW + west, acc)
    m_se, m_s, dn_any = mp["dn"]
    g = jnp.where(m_se, cSE + east, jnp.where(m_s, cS + arr, cSW + west))
    acc = jnp.where(dn_any, _roll(g, -1, 0), acc)
    m_nw, m_n, up_any = mp["up"]
    g = jnp.where(m_nw, cNW + west, jnp.where(m_n, cN + arr, cNE + east))
    acc = jnp.where(up_any, _roll(g, 1, 0), acc)
    return acc


def _step_consts(px):
    # Exactly the f32 product the XLA engines' stepd raster holds
    # (f32(step_pixels) * f32(px)).
    return [jnp.float32(np.float32(s) * np.float32(px)) for s in D8_STEP]


def _starts(b, band):
    """Sublane-aligned slice starts for band b (all provably multiples of 8,
    which Mosaic requires for dynamic dimension-0 vector loads)."""
    base = pl.multiple_of(b * band, PAD)
    start = pl.multiple_of(base + PAD, PAD)
    below = pl.multiple_of(base + PAD + band, PAD)
    return base, start, below


def _band_ext(ref, start, below, saved, band):
    """(band + 16, cols) pre-sweep window: carried 8-row tail of the band
    above, this band, and the head of the band below (not yet updated)."""
    below_rows = ref[pl.ds(below, PAD), :]
    mid = ref[pl.ds(start, band), :]
    return jnp.concatenate([saved, mid, below_rows], axis=0)


# ---------------------------------------------------------------------------
# Flow: walk to the nearest river / NaN absorber.
#
# The in-core flow rides the 2-raster PACKED-CODE kernel: per cell ONE
# int32 ``pc`` carries the resolution code in bits 4..31 (signed) and the
# cell's OWN D8 direction as a compact index 0..8 in bits 0..3, and a
# second int32 packs the cardinal/diagonal step counts (a bits 0-15,
# b 16-31).  A Gauss-Seidel visit therefore streams just (pc, pk) —
# walk3 streams (fdr, code, dist, steps) and round-4's walk2 still
# streamed fdr alongside (code, pk); dropping the fdr read cuts the
# per-visit VMEM band traffic while the sweep keeps the PLAIN walk2 op
# count (one signed compare for the hit test, verbatim copy on hit — see
# the encoding note in _walk2_kernel).  Unresolved cells' dir bits are
# invariant (writes are hit-gated), so the per-visit masks stay valid.
# Exactness:
#   - indices: code = pc >> 4 (arithmetic); the hit/copy logic is
#     identical to walk3 -> bitwise.
#   - cap:     steps = a + b exactly (ints), same landed rule.
#   - fdist:   a*f32(px) + b*f32(sqrt2*px) — within ~1 ulp of the float64
#     path distance, while the serial-sum engines carry O(sqrt(L)) ulps;
#     fdist was already engine-dependent "up to f32 summation order".
#   - range:   codes are +idx / -idx-1 with idx < 2^23 for any VMEM-tier
#     grid (fits_vmem caps cells well below 2^23), so 28 signed bits hold
#     them; UNRES24 = -(1<<26) sits outside the valid range.
#   - overflow: a resolved chain with >= 2^15 cardinal (or diagonal) steps
#     would carry a-field bits into b.  Along any resolving path the count
#     increments by 0/1 per cell and every suffix is some cell's FINAL
#     frozen value, so if any count reaches 2^15 some cell holds EXACTLY
#     2^15 -> guard bit 15 (or 31) is set in the final state.  One any()
#     detects it and a lax.cond re-runs the 3-raster walk3 path (compiled
#     alongside; executed only on such pathological >32767-step chains).
# ---------------------------------------------------------------------------

UNRES24 = -(1 << 26)  # unresolved code sentinel in the packed-pc encoding
_PC_T = -(1 << 29)  # pc < _PC_T  <=>  unresolved (see encoding note below)


def _walk2_kernel(pc_ref, pk_ref, pc_out, pk_out, flag_ref,
                  *, max_steps, nbands, band):
    # int32 packed step increments in D8_CODES order: cardinal -> a += 1,
    # diagonal -> b += 1 (bit 16).
    incs = [
        jnp.int32(1 if float(s) == 1.0 else 1 << 16) for s in D8_STEP
    ]
    # Encoding keeps the sweep at the plain walk2 op count:
    #  - unresolved pc = (UNRES24 << 4) | dir = about -2^30, while any
    #    resolved pc >= -(n+1)*16 > -2^29 — ONE signed compare vs _PC_T
    #    separates them (no shift in the hit test);
    #  - a hit copies the pulled pc VERBATIM: the copied dir bits are
    #    garbage, but a resolved cell's dir bits are never load-bearing —
    #    its own pulls are hit-gated off, downstream copiers overwrite the
    #    low bits again, and the final decode shifts them away.  Unresolved
    #    cells never overwrite, so THEIR dir bits (the mask source) stay
    #    intact.
    t_unres = jnp.int32(_PC_T)

    def init_flag(b, c):
        _base, start, _below = _starts(b, band)
        flag_ref[b] = jnp.sum(
            (pc_ref[pl.ds(start, band), :] < t_unres).astype(jnp.int32)
        )
        return c

    jax.lax.fori_loop(0, nbands, init_flag, 0)

    # Same Gauss-Seidel band schedule + exactness argument as _walk3_kernel.
    def visit(v, t0):
        down = (t0 // PAD) % 2 == 0

        def band_body(i, c):
            b = jnp.where(down, i, nbands - 1 - i)
            base, start, _below = _starts(b, band)

            @pl.when(flag_ref[b] > 0)
            def _():
                pc_ext = pc_ref[pl.ds(base, band + 2 * PAD), :]
                # Unresolved cells' dir bits are write-invariant: masks from
                # the visit's initial window stay valid for every sweep
                # (resolved cells' masks select garbage that the hit gate
                # discards).
                masks = _visit_masks(
                    pc_ext & 15, edge_guard=True,
                    codes=list(range(1, 9)),
                )
                pk_ext = pk_ref[pl.ds(base, band + 2 * PAD), :]

                def sweep_k(k, st):
                    pc_w, pk_w = st
                    p_pc = _pull_sel(masks, pc_w)
                    cand_pk = _pull_add(masks, pk_w, incs)
                    hit = (pc_w < t_unres) & (p_pc >= t_unres)
                    return (
                        jnp.where(hit, p_pc, pc_w),
                        jnp.where(hit, cand_pk, pk_w),
                    )

                def chunk(st):
                    pc_w, pk_w, _prev, cur = st
                    pc_w, pk_w = jax.lax.fori_loop(
                        0, PAD, sweep_k, (pc_w, pk_w)
                    )
                    ncur = jnp.sum(
                        (pc_w[PAD : PAD + band] < t_unres).astype(jnp.int32)
                    )
                    return (pc_w, pk_w, cur, ncur)

                def still_progressing(st):
                    *_, prev, cur = st
                    # cur == 0: the band fully resolved — its next visit is
                    # flag-skipped anyway, so the trailing stall-detect
                    # chunk (a guaranteed no-op) is pure waste here.
                    return (cur < prev) & (cur > 0)

                pc_ext, pk_ext, _, ncur = jax.lax.while_loop(
                    still_progressing,
                    chunk,
                    (pc_ext, pk_ext, jnp.int32(2**31 - 1), flag_ref[b]),
                )
                pc_ref[pl.ds(start, band), :] = pc_ext[PAD : PAD + band]
                pk_ref[pl.ds(start, band), :] = pk_ext[PAD : PAD + band]
                flag_ref[b] = ncur

            return c

        jax.lax.fori_loop(0, nbands, band_body, 0)
        return t0 + PAD

    def cond(carry):
        newly, t = carry
        return (newly > 0) & (t < max_steps)

    def body(carry):
        _newly, t = carry
        before = jax.lax.fori_loop(
            0, nbands, lambda b, acc: acc + flag_ref[b], jnp.int32(0)
        )
        t = jax.lax.fori_loop(0, CHECK // PAD, visit, t)
        after = jax.lax.fori_loop(
            0, nbands, lambda b, acc: acc + flag_ref[b], jnp.int32(0)
        )
        return (before - after, t)

    jax.lax.while_loop(cond, body, (jnp.int32(1), jnp.int32(0)))
    pc_out[:, :] = pc_ref[:, :]
    pk_out[:, :] = pk_ref[:, :]


def _dir_index(fdr_eff):
    """D8 code -> compact dir index (D8_CODES order, 1..8; 0 = none)."""
    d = jnp.zeros(fdr_eff.shape, jnp.int32)
    for k, c in enumerate(D8_CODES):
        d = jnp.where(fdr_eff == int(c), jnp.int32(k + 1), d)
    return d


def _packed_flow_walk(fdr_eff, code0, max_steps, interpret):
    """(code, packed_counts) via the 2-raster packed-code GS kernel."""
    rows, cols = fdr_eff.shape
    rp, cp = _align(rows, cols, FLOW_BAND)
    # pc = (code << 4) | dir; unresolved code = UNRES24; pad ring = inert
    # resolved (code -1, dir 0 -> self-keep).
    code_full = jnp.where(jnp.asarray(code0) == UNRES, jnp.int32(UNRES24),
                          jnp.asarray(code0, jnp.int32))
    pc0 = (code_full << 4) | _dir_index(jnp.asarray(fdr_eff, jnp.int32))
    pc_p = _pad(pc0, rp, cp, jnp.int32(-1) << 4)
    pk_p = pc_p * 0

    vma = jax.typeof(pc_p).vma
    pc, pk = pl.pallas_call(
        functools.partial(
            _walk2_kernel, max_steps=max_steps,
            nbands=rp // FLOW_BAND, band=FLOW_BAND,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct(pc_p.shape, jnp.int32, vma=vma),
            jax.ShapeDtypeStruct(pc_p.shape, jnp.int32, vma=vma),
        ],
        input_output_aliases={0: 0, 1: 1},
        scratch_shapes=[pltpu.SMEM((rp // FLOW_BAND,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_BYTES),
        interpret=interpret,
    )(pc_p, pk_p)

    sl = np.s_[PAD : PAD + rows, :cols]
    code = jax.lax.shift_right_arithmetic(pc[sl], 4)
    code = jnp.where(code == UNRES24, UNRES, code)
    return code, pk[sl]


@functools.partial(jax.jit, static_argnames=("px", "max_steps", "interpret"))
def flow_pallas_vmem(fdr, river, px, max_steps=20000, interpret=False):
    """(fdist, indices) with the whole walk resolved in one kernel launch.

    ``indices`` (and every integer truth-table output) is bit-identical to
    ops.pallas.walk.flow_pallas / the XLA hybrid engine (flowhand.py:565-846
    truth table).  ``fdist`` matches up to f32 summation order — here it is
    reconstructed from exact integer step counts (see the packed-kernel
    section note), which lands *closer* to the float64 distance than the
    serial-sum engines.  The reference's path-length cap stays exact
    (steps = a + b, integers; landed iff steps <= max_steps, the same rule
    as ops/flow.py _flow_doubling); chains that could overflow the packed
    16-bit counts are detected via guard bits and re-run on the walk3 tier.
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
    # Sign carries the absorber kind (river >= 0, NaN-absorber < 0); the
    # walk kernel only distinguishes UNRES vs resolved, so any non-UNRES
    # payload propagates untouched.
    code0 = jnp.where(
        absorbing2d, jnp.where(is_river2d, self_idx, -self_idx - 1), jnp.int32(UNRES)
    )
    fdr_eff = jnp.where(absorbing2d, 0, jnp.asarray(fdr)).astype(jnp.int32)

    code, pk = _packed_flow_walk(fdr_eff, code0, max_steps, interpret)
    pku = jax.lax.bitcast_convert_type(pk, jnp.uint32)
    a = (pku & jnp.uint32(0xFFFF)).astype(jnp.int32)
    b = (pku >> jnp.uint32(16)).astype(jnp.int32)
    overflow = jnp.any((a >= (1 << 15)) | (b >= (1 << 15)))

    c_card = jnp.float32(np.float32(D8_STEP[0]) * np.float32(px))
    c_diag = jnp.float32(np.float32(D8_STEP[1]) * np.float32(px))

    def from_packed(_):
        steps = a + b
        landed = (code >= 0) & (steps <= max_steps)
        fdist = jnp.where(
            landed,
            a.astype(jnp.float32) * c_card + b.astype(jnp.float32) * c_diag,
            jnp.float32(NODATA),
        )
        indices = jnp.where(landed, code, jnp.int32(NODATA))
        return fdist, indices

    def from_walk3(_):
        code3, dist3, _steps = absorbing_walk_pallas_vmem(
            fdr_eff, code0, px, max_steps=max_steps, interpret=interpret
        )
        landed = code3 >= 0  # over-cap cells were reset to UNRES (< 0)
        fdist = jnp.where(landed, dist3, jnp.float32(NODATA))
        indices = jnp.where(landed, code3, jnp.int32(NODATA))
        return fdist, indices

    return jax.lax.cond(overflow, from_walk3, from_packed, None)


# ---------------------------------------------------------------------------
# Downslope: walk until the cumulative drop reaches the threshold.
#
# Round-5 packed FREEZE kernel: per-cell state is only (pk, Zt) — pk the
# int32 packed cardinal/diagonal step counts (ops.downslope.unpack_dist),
# Zt the lookahead elevation with the usual terminal offset encodings.  A
# cell is FROZEN as soon as Zt <= z - ed (its first hit, or a terminal /
# truncated-terminal stop via the offsets); frozen cells stop advancing, so
# their (pk, Zt) ARE the first-hit record and the ratio is reconstructed
# once, post-pass, outside the sweep loop — no res raster, no trc raster,
# no in-sweep f32 reconstruction (the round-4 spill-slot failure mode).
#
# Exactness of freezing requires MONOTONE descent (z non-increasing along
# every D8 step — true for real hydrological fdr): while a cell u is
# unfrozen at sweep t, succ^k(u) was unfrozen at sweep t-k (a hit in s's
# first t-1 lookaheads would be a hit in u's first t, contradiction), so
# every value an unfrozen cell pulls is a genuine synchronous lookahead —
# the same argument that justified the frozen-band skip rule before.  For
# non-monotone (adversarial) inputs the wrapper lax.cond-falls back to the
# XLA jacobi engine, which is unconditionally exact and bitwise-identical
# on the packed operands.
# ---------------------------------------------------------------------------


def _downslope_kernel(fdr_ref, z_ref, pk_ref, zt_ref, pk_out, zt_out,
                      flag_ref, *, elevation_difference, max_steps, nbands,
                      band):
    from descriptools_tpu.ops.downslope import step_inc_consts

    incs = step_inc_consts()
    ed = jnp.float32(elevation_difference)

    # Per-band unfrozen-cell counters (SMEM): a band of frozen cells is at
    # its fixed point (frozen cells never advance), so it is skipped; the
    # counters also drive the global convergence check, replacing a
    # full-grid reduction.
    def band_count(zt_c, z_c):
        return jnp.sum((zt_c > z_c - ed).astype(jnp.int32))

    def init_flag(b, c):
        _base, start, _below = _starts(b, band)
        flag_ref[b] = band_count(
            zt_ref[pl.ds(start, band), :], z_ref[pl.ds(start, band), :]
        )
        return c

    jax.lax.fori_loop(0, nbands, init_flag, 0)

    # PAD sweeps per band visit with the carried pre-visit tail (module
    # docstring): Jacobi-exact, temporaries band-sized.
    def visit(v, t0):
        def band_body(b, carry):
            saved_pk, saved_zt = carry
            base, start, below = _starts(b, band)
            tail = pl.multiple_of(start + band - PAD, PAD)
            nxt = (pk_ref[pl.ds(tail, PAD), :], zt_ref[pl.ds(tail, PAD), :])

            @pl.when(flag_ref[b] > 0)
            def _():
                fdr_ext = fdr_ref[pl.ds(base, band + 2 * PAD), :]
                masks = _visit_masks(fdr_ext)
                pk_ext = _band_ext(pk_ref, start, below, saved_pk, band)
                zt_ext = _band_ext(zt_ref, start, below, saved_zt, band)
                z_ext = z_ref[pl.ds(base, band + 2 * PAD), :]
                thresh = z_ext - ed

                def sweep_k(k, st):
                    pk_w, zt_w = st
                    frozen = zt_w <= thresh
                    p_zt = _pull_sel(masks, zt_w)
                    cand = _pull_add(masks, pk_w, incs)
                    return (
                        jnp.where(frozen, pk_w, cand),
                        jnp.where(frozen, zt_w, p_zt),
                    )

                nk = jnp.clip(max_steps - t0, 0, PAD)
                pk_ext, zt_ext = jax.lax.fori_loop(
                    0, nk, sweep_k, (pk_ext, zt_ext)
                )
                zt_c = zt_ext[PAD : PAD + band]
                pk_ref[pl.ds(start, band), :] = pk_ext[PAD : PAD + band]
                zt_ref[pl.ds(start, band), :] = zt_c
                flag_ref[b] = band_count(zt_c, z_ext[PAD : PAD + band])

            return nxt

        saved0 = (pk_ref[pl.ds(0, PAD), :], zt_ref[pl.ds(0, PAD), :])
        jax.lax.fori_loop(0, nbands, band_body, saved0)
        return t0 + PAD

    def cond(t):
        unfrozen = jax.lax.fori_loop(
            0, nbands, lambda b, acc: acc + flag_ref[b], jnp.int32(0)
        )
        return (unfrozen > 0) & (t < max_steps)

    def body(t):
        return jax.lax.fori_loop(0, CHECK // PAD, visit, t)

    jax.lax.while_loop(cond, body, jnp.int32(0))
    # Unfrozen (capped) cells keep their horizon (pk, Zt): the wrapper's
    # post-pass partial formula is identical for both cases
    # (downslope.py:303-312 semantics).
    pk_out[:, :] = pk_ref[:, :]
    zt_out[:, :] = zt_ref[:, :]


@functools.partial(
    jax.jit,
    static_argnames=("px", "elevation_difference", "max_steps", "interpret"),
)
def downslope_pallas_vmem(dem, fdr, px, elevation_difference,
                          max_steps=5000, trunc0=None, interpret=False):
    """Downslope index, whole walk in one kernel launch.

    Bit-identical to ops.downslope._downslope_jacobi (downslope.py:434-532
    spec): same pull order, identical packed step counts and the one shared
    f32 reconstruction (ops.downslope.unpack_dist), same cap semantics.

    With ``trunc0`` (per-cell bool from ops.downslope.trunc_cells) also
    returns a bool raster flagging cells whose stop landed on a truncated
    terminal — the sharded path's halo-doubling retry signal, threaded
    through the walk as a double terminal offset on Zt (see _OFF2).  Both
    modes run the SAME 4-in/2-out freeze kernel; the flag is decoded from
    the frozen Zt post-pass.  Non-monotone-descent inputs (adversarial fdr)
    take the XLA jacobi branch of a lax.cond instead — the freeze rule's
    exactness argument needs monotone z (see the kernel section note).
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
    # Monotone-descent probe (terminal cells self-pull, so they compare
    # equal): gates the freeze kernel (see section note).
    (z_succ,) = pull8(fdr_eff, [z], [0.0])
    mono = jnp.all(z_succ <= z)

    def z_at_of(Zt):
        base = jnp.where(Zt < -_HALF, Zt + _OFF, Zt)
        if not track:
            return base
        return jnp.where(Zt < jnp.float32(-_T3), Zt + jnp.float32(_OFF2), base)

    def run_freeze(_):
        rp, cp = _align(rows, cols, DOWN_BAND)
        fdr_p = _pad(fdr_eff, rp, cp, 0)
        z_p = _pad(z, rp, cp, 0.0)
        # Pad ring: terminal-encoded (frozen: -_OFF <= 0 - ed) so padded
        # bands are quiescent and the per-band skip flags clear.
        zt_p = _pad(zt0, rp, cp, -_OFF)
        pk_p = jnp.zeros(z_p.shape, jnp.int32)

        vma = jax.typeof(z_p).vma  # shard_map: outputs inherit mesh axes
        pk, zt = pl.pallas_call(
            functools.partial(
                _downslope_kernel,
                elevation_difference=elevation_difference,
                max_steps=max_steps, nbands=rp // DOWN_BAND, band=DOWN_BAND,
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_shape=[
                jax.ShapeDtypeStruct(z_p.shape, jnp.int32, vma=vma),
                jax.ShapeDtypeStruct(z_p.shape, jnp.float32, vma=vma),
            ],
            input_output_aliases={2: 0, 3: 1},
            scratch_shapes=[pltpu.SMEM((rp // DOWN_BAND,), jnp.int32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_BYTES),
            interpret=interpret,
        )(fdr_p, z_p, pk_p, zt_p)

        sl = np.s_[PAD : PAD + rows, :cols]
        pk = pk[sl]
        Zt = zt[sl]
        # Post-pass reconstruction — identical operands/expression to the
        # jacobi engine, shared via unpack_dist.
        res = jnp.where(
            pk == 0, 0.0, (z - z_at_of(Zt)) / unpack_dist(pk, px)
        )
        res = jnp.where(z == jnp.float32(NODATA), jnp.float32(NODATA), res)
        if track:
            ed = jnp.float32(elevation_difference)
            frozen = Zt <= z - ed
            return res, frozen & (Zt < jnp.float32(-_T3))
        return res

    def run_jacobi(_):
        return _downslope_jacobi(
            dem, fdr, px, elevation_difference, max_steps,
            trunc0=trunc0 if track else None,
        )

    return jax.lax.cond(mono, run_freeze, run_jacobi, None)


# ---------------------------------------------------------------------------
# Generalised absorbing walk: (code, dist, steps) to the nearest absorber.
# The per-shard local phase of the boundary-graph reduction
# (parallel/boundary.py local_flow_summary) runs this kernel inside
# shard_map — the Pallas walk tier on the multi-chip path.  Unlike the flow
# kernel it also carries the step count (the ring composition must enforce
# the reference's global walk cap across shard segments, flowhand.py:835).
# ---------------------------------------------------------------------------


def _walk3_kernel(fdr_ref, code_ref, dist_ref, steps_ref,
                  code_out, dist_out, steps_out, flag_ref,
                  *, px, max_steps, nbands, band):
    consts = _step_consts(px)
    ones = [jnp.float32(1.0)] * 8

    def init_flag(b, c):
        _base, start, _below = _starts(b, band)
        flag_ref[b] = jnp.sum(
            (code_ref[pl.ds(start, band), :] == UNRES).astype(jnp.int32)
        )
        return c

    jax.lax.fori_loop(0, nbands, init_flag, 0)

    # Gauss-Seidel band schedule: each band window reads the rasters AS
    # THEY ARE (the neighbour visited earlier this pass is post-visit, the
    # other side pre-visit), and passes alternate top-down / bottom-up, so
    # resolution fronts cross the whole grid in one pass instead of one
    # band-row per PAD sweeps.  Exactness: a hit copies the downstream
    # cell's (code, dist, steps) only when that cell is resolved, and
    # resolved cells are write-frozen — so every resolved record equals
    # the value propagated from FINAL absorber records, and the fixed
    # point is schedule-independent, bitwise.  The reference's per-cell
    # walk cap is enforced by the wrapper's steps post-mask (the same
    # path-length rule as ops/flow.py _flow_doubling), not by a Jacobi
    # sweep gate, so out-of-order resolution never changes capped output.
    def visit(v, t0):
        down = (t0 // PAD) % 2 == 0

        def band_body(i, c):
            b = jnp.where(down, i, nbands - 1 - i)
            base, start, _below = _starts(b, band)

            @pl.when(flag_ref[b] > 0)
            def _():
                fdr_ext = fdr_ref[pl.ds(base, band + 2 * PAD), :]
                masks = _visit_masks(fdr_ext, edge_guard=True)
                code_ext = code_ref[pl.ds(base, band + 2 * PAD), :]
                dist_ext = dist_ref[pl.ds(base, band + 2 * PAD), :]
                steps_ext = steps_ref[pl.ds(base, band + 2 * PAD), :]

                def sweep_k(k, st):
                    code_w, dist_w, steps_w = st
                    p_code = _pull_sel(masks, code_w)
                    cand_d = _pull_add(masks, dist_w, consts)
                    cand_s = _pull_add(masks, steps_w, ones)
                    hit = (code_w == UNRES) & (p_code != UNRES)
                    return (
                        jnp.where(hit, p_code, code_w),
                        jnp.where(hit, cand_d, dist_w),
                        jnp.where(hit, cand_s, steps_w),
                    )

                # Inner convergence loop: keep sweeping this band in
                # PAD-sized chunks while its interior UNRES count drops, so
                # a lateral channel of any length resolves in ONE visit
                # (the pass schedule above only accelerates the vertical
                # axis; in-band propagation is bounded by sweeps, not by a
                # halo — the window spans the full width).  A no-progress
                # chunk leaves the state bitwise unchanged (every write is
                # hit-gated), so the stall detection costs one chunk — the
                # same cost the fixed 1-chunk visit pays when stalled.
                def chunk(st):
                    code_w, dist_w, steps_w, _prev, cur = st
                    code_w, dist_w, steps_w = jax.lax.fori_loop(
                        0, PAD, sweep_k, (code_w, dist_w, steps_w)
                    )
                    ncur = jnp.sum(
                        (code_w[PAD : PAD + band] == UNRES).astype(jnp.int32)
                    )
                    return (code_w, dist_w, steps_w, cur, ncur)

                def still_progressing(st):
                    *_, prev, cur = st
                    # cur == 0: the band fully resolved — its next visit is
                    # flag-skipped anyway, so the trailing stall-detect
                    # chunk (a guaranteed no-op) is pure waste here.
                    return (cur < prev) & (cur > 0)

                code_ext, dist_ext, steps_ext, _, ncur = jax.lax.while_loop(
                    still_progressing,
                    chunk,
                    (code_ext, dist_ext, steps_ext,
                     jnp.int32(2**31 - 1), flag_ref[b]),
                )
                code_ref[pl.ds(start, band), :] = code_ext[PAD : PAD + band]
                dist_ref[pl.ds(start, band), :] = dist_ext[PAD : PAD + band]
                steps_ref[pl.ds(start, band), :] = steps_ext[PAD : PAD + band]
                flag_ref[b] = ncur

            return c

        jax.lax.fori_loop(0, nbands, band_body, 0)
        return t0 + PAD

    def cond(carry):
        newly, t = carry
        return (newly > 0) & (t < max_steps)

    def body(carry):
        _newly, t = carry
        before = jnp.sum((code_ref[:, :] == UNRES).astype(jnp.int32))
        t = jax.lax.fori_loop(0, CHECK // PAD, visit, t)
        after = jnp.sum((code_ref[:, :] == UNRES).astype(jnp.int32))
        return (before - after, t)

    jax.lax.while_loop(cond, body, (jnp.int32(1), jnp.int32(0)))
    code_out[:, :] = code_ref[:, :]
    dist_out[:, :] = dist_ref[:, :]
    steps_out[:, :] = steps_ref[:, :]


@functools.partial(jax.jit, static_argnames=("px", "max_steps", "interpret"))
def absorbing_walk_pallas_vmem(fdr_eff, code0, px, max_steps=20000,
                               interpret=False):
    """Generic absorbing walk, whole state VMEM-resident.

    ``fdr_eff``: D8 codes with absorbing cells zeroed (self-pull).
    ``code0``: int32, any non-UNRES payload at absorbing cells (their own
    flat index, possibly sign-tagged) and UNRES elsewhere.  Returns
    (code, dist, steps): the absorber's payload (UNRES where the walk
    never absorbs — cycles / over-cap), the f32 path distance
    (px-weighted, same accumulation order as the XLA frontier engine in
    ops/flow.py resolve_absorbing_walk), and the f32 step count.  The
    Gauss-Seidel kernel resolves cells out of sweep order, so the cap is
    applied here as a path-length post-mask — bitwise the Jacobi-with-cap
    fixed point (over-cap cells revert to their UNRES/0/0 init).
    """
    rows, cols = fdr_eff.shape
    rp, cp = _align(rows, cols, FLOW_BAND)
    fdr_p = _pad(jnp.asarray(fdr_eff, jnp.int32), rp, cp, 0)
    code_p = _pad(jnp.asarray(code0, jnp.int32), rp, cp, -1)  # pad: inert
    dist_p = code_p.astype(jnp.float32) * 0.0
    steps_p = dist_p

    # Inside shard_map outputs must declare their varying mesh axes; inherit
    # them from the (possibly device-varying) input.
    vma = jax.typeof(code_p).vma
    code, dist, steps = pl.pallas_call(
        functools.partial(
            _walk3_kernel, px=px, max_steps=max_steps,
            nbands=rp // FLOW_BAND, band=FLOW_BAND,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct(code_p.shape, jnp.int32, vma=vma),
            jax.ShapeDtypeStruct(code_p.shape, jnp.float32, vma=vma),
            jax.ShapeDtypeStruct(code_p.shape, jnp.float32, vma=vma),
        ],
        input_output_aliases={1: 0, 2: 1, 3: 2},
        scratch_shapes=[pltpu.SMEM((rp // FLOW_BAND,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_BYTES),
        interpret=interpret,
    )(fdr_p, code_p, dist_p, steps_p)

    sl = np.s_[PAD : PAD + rows, :cols]
    code, dist, steps = code[sl], dist[sl], steps[sl]
    over = steps > jnp.float32(max_steps)
    return (
        jnp.where(over, UNRES, code),
        jnp.where(over, 0.0, dist),
        jnp.where(over, 0.0, steps),
    )
