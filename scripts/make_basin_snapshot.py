"""Generate the committed float64-oracle parity snapshot for the bundled
basin (tests/data/basin_float_snapshot.npz).

Runs the NumPy float64 oracles (descriptools_tpu.oracle — the executable
spec transcribed from the reference's *_sequential_jit twins) over the FULL
2178x1534 basin, then stores every descriptor downsampled [::4, ::4] as
float32 (4x4 stride = 6.3% of cells, ~210k samples per raster; float32
storage adds <1e-7 relative — far under the 1e-5 gate).

tests/test_basin_parity.py asserts the production engines match this
snapshot at <=1e-5 relative (fdist <=2e-4: it is a serial f32 sum of up to
20000 step lengths).  Rerun this script only when the oracle spec changes —
the snapshot is the frozen contract.

Runtime: ~5-10 min (the flow/downslope oracles are per-cell Python walks).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from descriptools_tpu import oracle
from descriptools_tpu.io import load_example_inputs
from descriptools_tpu.pipeline import PipelineConfig

EXAMPLE = "/root/reference/Example"
STRIDE = 4
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data", "basin_float_snapshot.npz",
)


def main():
    cfg = PipelineConfig()
    data = load_example_inputs(EXAMPLE)
    dem = data["dem"].astype(np.int32)
    fdr = data["fdr"]
    fac = data["fac"].astype(np.int32)
    river = data["river"]

    t0 = time.time()
    sl = oracle.slope_oracle(dem, cfg.px)
    sl_rad = np.where(dem == -100, -100.0, np.arctan(sl / 100.0))
    twi = oracle.topographic_index_oracle(fac, sl_rad, cfg.px)
    mtwi = oracle.modified_topographic_index_oracle(fac, sl_rad, cfg.px, cfg.n_topo)
    print(f"pointwise oracles: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    fdist, indices = oracle.flow_distance_index_oracle(fdr, river, cfg.px)
    print(f"flow oracle: {time.time()-t0:.1f}s", flush=True)
    hand = oracle.hand_oracle(dem, indices)
    rfac = oracle.river_accumulation_oracle(fac, indices)
    gfi = oracle.gfi_oracle(hand, rfac, cfg.n_gfi, cfg.b_gfi, cfg.px)
    lnhlh = oracle.ln_hl_h_oracle(hand, fac, cfg.n_gfi, cfg.b_gfi, cfg.px)

    t0 = time.time()
    down = oracle.downslope_oracle(dem, fdr, cfg.px, cfg.elevation_difference)
    print(f"downslope oracle: {time.time()-t0:.1f}s", flush=True)

    sub = np.s_[::STRIDE, ::STRIDE]
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(
        OUT,
        stride=np.int32(STRIDE),
        slope=sl[sub].astype(np.float32),
        twi=twi[sub].astype(np.float32),
        mod_twi=mtwi[sub].astype(np.float32),
        gfi=gfi[sub].astype(np.float32),
        ln_hl_h=lnhlh[sub].astype(np.float32),
        fdist=fdist[sub].astype(np.float32),
        downslope=down[sub].astype(np.float32),
        indices=indices[sub].astype(np.int32),
        hand=hand[sub].astype(np.int32),
    )
    print("wrote", OUT, os.path.getsize(OUT), "bytes")


if __name__ == "__main__":
    main()
