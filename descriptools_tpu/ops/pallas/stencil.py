"""Pallas TPU stencil kernels: slope and fused slope+TWI.

The reference computes slope one CUDA thread per cell (slope.py:209-259) and
TWI in a second kernel over a second HBM round-trip (topoindexes.py:218-220).
Here a single Pallas kernel streams row-bands of the 1-ring-padded DEM
HBM -> VMEM with double-buffered async DMA, evaluates the 8-neighbour
max-gradient on the VPU over (8,128)-tiled blocks, and (in the fused variant)
applies the TWI/ln map to the very same registers — one HBM read of the DEM,
one write per output, no intermediate slope round-trip.

The pure-XLA path (ops/slope.py) already fuses well; this kernel exists to
pin the roofline (single-pass HBM streaming) and as the template for deeper
fusions.  Grids are padded host-side so the lane dim is a multiple of 128
and the row-band divides evenly.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from descriptools_tpu.constants import D8_DX, D8_DY, D8_STEP, EPS, NODATA


def _stencil_body(zblk, px, rows, cols):
    """8-neighbour max downhill gradient on a (rows+2, cols+2) VMEM block."""
    dem = zblk[1 : 1 + rows, 1 : 1 + cols]
    nd = jnp.float32(NODATA)
    best = jnp.zeros((rows, cols), jnp.float32)
    for dy, dx, step in zip(D8_DY, D8_DX, D8_STEP):
        nbr = zblk[1 + dy : 1 + dy + rows, 1 + dx : 1 + dx + cols]
        grad = (dem - nbr) / jnp.float32(px * float(step))
        best = jnp.where((nbr != nd) & (grad > best), grad, best)
    return dem, jnp.where(dem == nd, nd, best * 100.0)


def _slope_kernel(hbm_ref, out_ref, *, band, cols, px, fused, fac_ref=None,
                  twi_ref=None, n_exp=None):
    def body(scratch, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(i * band, band + 2), :], scratch, sem
        )
        dma.start()
        dma.wait()
        dem, sl = _stencil_body(scratch, px, band, cols)
        out_ref[:, :] = sl
        if fused:
            # slope% -> radians -> TWI in-register (Example/example.py:63,
            # topoindexes.py:257 semantics).
            sl_rad = jnp.where(dem == NODATA, jnp.float32(NODATA),
                               jnp.arctan(sl / 100.0))
            fac = fac_ref[:, :].astype(jnp.float32)
            area = jnp.where(fac == 0, 1.0, fac) * jnp.float32(px * px)
            twi = jnp.log(area / jnp.tan(sl_rad + jnp.float32(EPS)))
            twi_ref[:, :] = jnp.where(fac <= NODATA, jnp.float32(NODATA), twi)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((band + 2, cols + 2), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def _pad_for_kernel(dem, band):
    """1-ring NoData pad, then pad rows to a band multiple and lanes to 128."""
    dem = np.asarray(dem, np.float32)
    r, c = dem.shape
    rp = (-r) % band
    cp = (-(c + 2)) % 128
    padded = np.pad(
        dem, ((1, 1 + rp), (1, 1 + cp)), constant_values=np.float32(NODATA)
    )
    return padded, r, c


@functools.partial(jax.jit, static_argnames=("px", "band"))
def _slope_call(padded, px, band):
    rp2, cp2 = padded.shape
    cols = cp2 - 2
    grid = (rp2 - 2) // band
    return pl.pallas_call(
        functools.partial(_slope_kernel, band=band, cols=cols, px=px, fused=False),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (band, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rp2 - 2, cols), jnp.float32),
    )(padded)


def slope_pallas(dem, px, band=256):
    """Slope (%) via the Pallas streaming kernel.  Semantics == ops.slope."""
    padded, r, c = _pad_for_kernel(dem, band)
    out = _slope_call(jnp.asarray(padded), px, band)
    return out[:r, :c]


def _fused_kernel(hbm_ref, fac_ref, slope_ref, twi_ref, *, band, cols, px):
    _slope_kernel(
        hbm_ref, slope_ref, band=band, cols=cols, px=px, fused=True,
        fac_ref=fac_ref, twi_ref=twi_ref,
    )


@functools.partial(jax.jit, static_argnames=("px", "band"))
def _fused_call(padded, facp, px, band):
    rp2, cp2 = padded.shape
    cols = cp2 - 2
    grid = (rp2 - 2) // band
    return pl.pallas_call(
        functools.partial(_fused_kernel, band=band, cols=cols, px=px),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((band, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((band, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((band, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rp2 - 2, cols), jnp.float32),
            jax.ShapeDtypeStruct((rp2 - 2, cols), jnp.float32),
        ),
    )(padded, facp)


def slope_twi_fused_pallas(dem, fac, px, band=256):
    """Fused slope + TWI: one DEM read, both outputs, no slope round-trip.

    Returns (slope_percent, twi).  NB: feeds the *kernel-computed* slope
    into TWI exactly like the reference pipeline does host-side.
    """
    padded, r, c = _pad_for_kernel(dem, band)
    facp = np.zeros((padded.shape[0] - 2, padded.shape[1] - 2), np.float32)
    facp[:r, :c] = np.asarray(fac, np.float32)[:, :]
    sl, twi = _fused_call(jnp.asarray(padded), jnp.asarray(facp), px, band)
    return sl[:r, :c], twi[:r, :c]
