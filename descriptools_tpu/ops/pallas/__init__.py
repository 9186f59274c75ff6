"""Hand-written Pallas TPU kernels for the hot stencils."""

from descriptools_tpu.ops.pallas.stencil import slope_pallas, slope_twi_fused_pallas

__all__ = ["slope_pallas", "slope_twi_fused_pallas"]
