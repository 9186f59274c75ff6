"""Stage checkpointing for long pipelines (SURVEY §5: the reference keeps
every intermediate in RAM; at 1e9 cells the descriptor stages need durable,
shard-aware checkpoints).

Uses orbax-checkpoint when available (async, sharding-preserving, the
standard JAX pod-restart path); falls back to .npz otherwise.
"""

import os

import numpy as np

try:  # pragma: no cover - environment probe
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def save_stage(path, arrays):
    """Save a dict of rasters for one pipeline stage."""
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), arrays, force=True)
        ckptr.wait_until_finished()
    else:
        np.savez(path + ".npz", **{k: np.asarray(v) for k, v in arrays.items()})


def load_stage(path, like=None):
    """Load a stage checkpoint.  ``like`` (a matching pytree of arrays or
    ShapeDtypeStructs) restores shardings under orbax."""
    if _HAS_ORBAX and os.path.isdir(path):
        ckptr = ocp.StandardCheckpointer()
        if like is not None:
            return ckptr.restore(os.path.abspath(path), like)
        return ckptr.restore(os.path.abspath(path))
    data = np.load(path + ".npz")
    return {k: data[k] for k in data.files}
