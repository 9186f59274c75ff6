"""Timing / profiling helpers.

``block_until_ready`` does not actually block on the remote-relay TPU
backend used here, so honest wall-clock numbers require a scalar readback —
``sync()`` does exactly that.  ``trace()`` wraps jax.profiler for TensorBoard
traces (SURVEY §5: the reference has no profiling at all; timings for its
paper were measured externally).
"""

import contextlib
import time

import jax
import jax.numpy as jnp


def sync(tree):
    """Force completion of every computation feeding ``tree``.

    ONE scalar readback for the whole tree: each readback is a ~27 ms relay
    round trip, so per-leaf syncing would dominate (and once over-reported a
    ~170 ms suite as ~400 ms); combining the leaves into a single fused
    scalar costs one extra tiny dispatch but only one round trip."""
    leaves = [
        jnp.asarray(leaf).ravel()[:1].astype(jnp.float32)
        for leaf in jax.tree.leaves(tree)
        if hasattr(leaf, "ravel")
    ]
    if leaves:
        float(jnp.sum(jnp.concatenate(leaves)))
    return tree


def timeit(fn, *args, warmup=1, iters=3, **kwargs):
    """Median wall-clock seconds of ``fn(*args)`` with true device sync."""
    for _ in range(warmup):
        sync(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


@contextlib.contextmanager
def trace(logdir="/tmp/descriptools_tpu_trace"):
    """jax.profiler trace context (view with TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def grid_points_per_second(cells, seconds):
    return cells / seconds
