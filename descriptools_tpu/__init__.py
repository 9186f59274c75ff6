"""descriptools_tpu — a TPU-native terrain-descriptor engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
JVBSouza/descriptools (the Numba-CUDA flood-descriptor toolbox): slope, TWI,
modified TWI, downslope index, flow distance / river indices / HAND, GFI,
ln(hl/H), and the linear-binary flood classifier with coarse-to-fine
calibration.  Serial per-cell D8 walks are recast as log-depth pointer
jumping; stencils are fused VPU passes; multi-chip execution decomposes the
grid over a 2-D device mesh with ICI halo exchange and a boundary-graph
reduction for cross-shard flow paths (descriptools_tpu.parallel).
"""

__version__ = "0.1.0"

from descriptools_tpu import constants, d8, evaluation, io, ops
from descriptools_tpu.constants import NODATA

__all__ = ["constants", "d8", "evaluation", "io", "ops", "NODATA", "__version__"]


def _enable_compilation_cache():
    """Persistent XLA compilation cache: first compile of the big pointer-
    jumping programs takes minutes over the remote-compile tunnel; cache hits
    make every later process start warm."""
    import os

    import jax

    cache_dir = os.environ.get(
        "DESCRIPTOOLS_TPU_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


_enable_compilation_cache()
