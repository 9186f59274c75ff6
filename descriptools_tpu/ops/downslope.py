"""Downslope index — binary descent over successor-doubling tables (XLA).

TPU-native recast of reference downslope.py.  The reference walks each cell's
D8 path until the cumulative drop reaches ``elevation_difference`` (default
5 m), serially per CUDA thread with a 5000-step cap (downslope.py:434-532),
then repairs unresolved cells with a sequential CPU pass (downslope.py:373).

Key observation (derived from downslope_sequential_jit, downslope.py:160-314,
which defines the end-to-end semantics): the result is
``(z0 - z_stop) / dist_stop`` in *every* branch — threshold reached, terminal
step (border exit / NoData target / dead end), or cap.  Only the stop
position matters:

    stop(c0) = first p_k with  z(p_k) <= z(c0) - ed   (threshold)
                            or terminal(p_k)           (no valid next step)
                            or k == max_steps          (cap, 5000)

Because the threshold depends on the start cell, plain absorbing-state
doubling does not apply.  Instead we build J = O(log max_steps) doubling
levels — (2^j)-step successor, window distance, and window min-key where
``key = -inf at terminals else z`` — then run a *binary descent* per cell:
jump 2^j ahead whenever the window's min key stays above the threshold and
the cap allows, landing exactly on the stop position.  Everything is
whole-grid gathers + VPU selects; depth is 2·log2(max_steps) instead of the
reference's 5000 serial steps.
"""

from functools import partial

import jax
import jax.numpy as jnp

from descriptools_tpu.constants import DOWNSLOPE_MAX_STEPS, NODATA
from descriptools_tpu.d8 import successor

_NEG_INF = jnp.float32(-3e38)


def _num_levels(max_steps):
    j = 0
    while (1 << (j + 1)) <= max_steps:
        j += 1
    return j + 1  # levels 0..j cover jumps up to 2^j <= max_steps


def build_downslope_tables(dem, fdr, px, nodata=NODATA, max_steps=DOWNSLOPE_MAX_STEPS):
    """Doubling tables (succs, dists, minkeys) for the binary descent.

    Level j holds, per cell c: the 2^j-step successor, the summed distance of
    those steps, and min over the next 2^j *arrived* positions of
    ``key = -inf if terminal else z`` — the quantity the descent compares
    against each walker's threshold.
    """
    rows, cols = dem.shape
    z = jnp.asarray(dem, jnp.float32).reshape(-1)
    succ, step, in_bounds, valid = successor(fdr, rows, cols)
    succ = succ.reshape(-1)
    step = step.reshape(-1)
    in_bounds = in_bounds.reshape(-1)
    valid = valid.reshape(-1)

    # Terminal: no valid next step — dead-end fdr, border exit, NoData target,
    # or the cell itself being NoData (masked later anyway).
    target_nodata = z[succ] == jnp.float32(nodata)
    terminal = (~valid) | (~in_bounds) | target_nodata | (z == jnp.float32(nodata))

    n = rows * cols
    self_idx = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(terminal, _NEG_INF, z)

    succ0 = jnp.where(terminal, self_idx, succ)
    dist0 = jnp.where(terminal, 0.0, step * jnp.float32(px))
    minkey0 = key[succ0]

    succs, dists, minkeys = [succ0], [dist0], [minkey0]
    for _ in range(_num_levels(max_steps) - 1):
        s, d, m = succs[-1], dists[-1], minkeys[-1]
        succs.append(s[s])
        dists.append(d + d[s])
        minkeys.append(jnp.minimum(m, m[s]))
    return jnp.stack(succs), jnp.stack(dists), jnp.stack(minkeys)


@partial(jax.jit, static_argnames=("max_steps", "px", "elevation_difference"))
def downslope(dem, fdr, px, elevation_difference, max_steps=DOWNSLOPE_MAX_STEPS):
    """Downslope index of a whole grid on one device (float32).

    ``elevation_difference`` must be > 0 (the reference's semantics are
    degenerate otherwise).
    """
    rows, cols = dem.shape
    z = jnp.asarray(dem, jnp.float32).reshape(-1)
    succs, dists, minkeys = build_downslope_tables(
        dem, fdr, px, max_steps=max_steps
    )
    levels = succs.shape[0]

    n = rows * cols
    cur = jnp.arange(n, dtype=jnp.int32)
    dist = jnp.zeros(n, jnp.float32)
    steps = jnp.zeros(n, jnp.int32)
    thresh = z - jnp.float32(elevation_difference)

    for j in range(levels - 1, -1, -1):
        can = (minkeys[j][cur] > thresh) & (steps + (1 << j) <= max_steps)
        dist = jnp.where(can, dist + dists[j][cur], dist)
        steps = jnp.where(can, steps + (1 << j), steps)
        cur = jnp.where(can, succs[j][cur], cur)

    # One final step onto the stop position (unless the cap was reached).
    take = (steps < max_steps) & (minkeys[0][cur] <= thresh)
    dist = jnp.where(take, dist + dists[0][cur], dist)
    cur = jnp.where(take, succs[0][cur], cur)

    out = jnp.where(dist == 0.0, 0.0, (z - z[cur]) / dist)
    out = jnp.where(z == jnp.float32(NODATA), jnp.float32(NODATA), out)
    return out.reshape(rows, cols)
