"""ICI halo exchange for sharded stencils and walk kernels.

TPU-native replacement for the reference's host-side 1-cell tile overlap
(sloper, slope.py:145-147): inside shard_map, each block swaps edge strips
with its mesh neighbours via ``lax.ppermute`` (nearest-neighbour ICI hops),
row phase then column phase — the column phase moves the already-extended
rows, so corner halos arrive without dedicated diagonal sends.  Global
borders are filled with the NoData sentinel, mirroring the reference's -100
ring (slope.py:175-182).
"""

import jax
import jax.numpy as jnp
from jax import lax


def _exchange_axis(block, width, axis, axis_name, fill):
    """Halo exchange along one array axis inside shard_map."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    def take(arr, lo, hi):
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(lo, hi)
        return arr[tuple(sl)]

    lead = take(block, 0, width)  # my first rows/cols -> previous neighbour
    trail = take(block, block.shape[axis] - width, block.shape[axis])

    if n > 1:
        # halo before my block = trailing strip of neighbour idx-1
        before = lax.ppermute(trail, axis_name, [(i, i + 1) for i in range(n - 1)])
        # halo after my block = leading strip of neighbour idx+1
        after = lax.ppermute(lead, axis_name, [(i, i - 1) for i in range(1, n)])
    else:
        before = jnp.zeros_like(lead)
        after = jnp.zeros_like(trail)

    fill_v = jnp.asarray(fill, block.dtype)
    before = jnp.where(idx == 0, fill_v, before)
    after = jnp.where(idx == n - 1, fill_v, after)
    return jnp.concatenate([before, block, after], axis=axis)


def halo_exchange(block, width, fill, axis_names=("y", "x")):
    """Extend a local block by ``width`` cells of neighbour data on all four
    sides (corners included).  Must run inside shard_map over ``axis_names``.
    """
    ext = _exchange_axis(block, width, 0, axis_names[0], fill)
    ext = _exchange_axis(ext, width, 1, axis_names[1], fill)
    return ext
