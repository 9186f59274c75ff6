"""Flow tracing to the drainage network — pointer jumping (XLA).

TPU-native recast of reference flowhand.py.  The reference walks each cell's
D8 path serially on the GPU — up to 20000 data-dependent steps per thread
with heavy warp divergence (flowhand.py:565-846).  Here the walk is recast as
*successor doubling*: every cell stores its current successor, accumulated
distance, and step count; K = ceil(log2(max_steps)) rounds of three gathers
resolve every path simultaneously in log depth.  Absorbing states (river
cells and dead ends) are self-loops with zero step weight, so composition is
idempotent once a path lands.

Semantics (spec: flowhand.py flow_distance_index_gpu with zero divisions —
the configuration that produced the committed goldens; see oracle/core.py
flow_distance_index_oracle for the cell-level truth table):

  - start/arrived cell with fdr == 0            -> NaN state (-100, -100)
  - cell with fdr != 0 that is river            -> absorbed (dist, flat idx)
  - off-grid D8 step, invalid code, cycles, and
    paths longer than max_steps (20000)         -> (-100, -100)

HAND (flowhand.py:414-442) needs dem at each cell's river index — instead of
a second global gather pass we read the payload off the converged successor.
"""

from functools import partial

import jax
import jax.numpy as jnp

from descriptools_tpu.constants import FLOW_MAX_STEPS, NODATA
from descriptools_tpu.d8 import successor


def _doubling_rounds(max_steps):
    k = 0
    while (1 << k) < max_steps:
        k += 1
    return k


def flow_states(fdr, river, rows, cols):
    """Per-cell absorbing classification (flat bool arrays).

    Truth table derived from flowhand.py:599-846; identical for start cells
    and arrived-at cells (see oracle docstring).
    """
    fdr_f = jnp.asarray(fdr).reshape(-1)
    river_f = jnp.asarray(river).reshape(-1)
    succ, step, in_bounds, valid = successor(fdr, rows, cols)
    succ = succ.reshape(-1)
    step = step.reshape(-1)
    in_bounds = in_bounds.reshape(-1)
    valid = valid.reshape(-1)

    is_zero = fdr_f == 0
    is_river = (~is_zero) & (river_f == 1)
    absorb_nan = is_zero | ((~is_river) & (valid & ~in_bounds)) | ((~is_river) & ~valid)
    absorbing = absorb_nan | is_river
    return succ, step, absorbing, absorb_nan, is_river


@partial(jax.jit, static_argnames=("max_steps", "px"))
def flow_distance_index(fdr, river, px, max_steps=FLOW_MAX_STEPS):
    """Flow distance + river-cell flat index for a whole grid on one device.

    Returns (fdist float32, indices int32).
    """
    rows, cols = fdr.shape
    succ, step, absorbing, absorb_nan, is_river = flow_states(fdr, river, rows, cols)

    n = rows * cols
    self_idx = jnp.arange(n, dtype=jnp.int32)
    succ = jnp.where(absorbing, self_idx, succ)
    dist = jnp.where(absorbing, 0.0, step * jnp.float32(px))
    steps = jnp.where(absorbing, 0, 1).astype(jnp.int32)

    def body(carry, _):
        s, d, st = carry
        d = d + d[s]
        st = st + st[s]
        s = s[s]
        return (s, d, st), None

    (succ_f, dist_f, steps_f), _ = jax.lax.scan(
        body, (succ, dist, steps), None, length=_doubling_rounds(max_steps)
    )

    landed = is_river[succ_f] & (steps_f <= max_steps)
    fdist = jnp.where(landed, dist_f, jnp.float32(NODATA))
    indices = jnp.where(landed, succ_f, jnp.int32(NODATA))
    return fdist.reshape(rows, cols), indices.reshape(rows, cols)


def hand_calculator(dem, indices, nodata=NODATA):
    """HAND = clip(dem - dem.flat[indices], 0); NoData masked.

    Spec: flowhand.py:414-442.  Integer-exact when dem is integer (the golden
    pipeline feeds int16 dem), so pass dem as an int dtype for bitwise parity.
    """
    dem = jnp.asarray(dem)
    flat = dem.reshape(-1)
    idx = jnp.asarray(indices).reshape(-1)
    safe = jnp.where(idx == nodata, 0, idx)
    hand = flat - flat[safe]
    hand = jnp.where((flat != nodata) & (idx != nodata), hand, nodata)
    hand = jnp.where((hand < 0) & (hand != nodata), 0, hand)
    return hand.reshape(dem.shape)


@partial(jax.jit, static_argnames=("max_steps", "px"))
def flow_hand_index(dem, fdr, river, px, max_steps=FLOW_MAX_STEPS):
    """Flow distance, river indices, and HAND in one fused pass.

    Mirrors the reference public API ``flow_hand_index`` (flowhand.py:242-411)
    minus the host-side tiling — on TPU the whole grid stays device-resident
    and the sharded variant lives in descriptools_tpu.parallel.
    """
    fdist, indices = flow_distance_index(fdr, river, px, max_steps=max_steps)
    hand = hand_calculator(dem, indices)
    return fdist, indices, hand
