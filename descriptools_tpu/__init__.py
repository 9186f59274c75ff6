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
