"""Probe A (round-4 verdict, Missing #3): what does the in-core whole-grid
HAND/river-fac gather actually cost INSIDE the fused suite, and is the
payload-riding alternative viable at basin size?

Measures, on the bundled basin with the production (pallas) engine:
  1. the full descriptor_suite (sustained, pipelined batches),
  2. an ablated suite identical except hand/river_fac come from a
     gather-free placeholder (hand = dem, river_fac = fac) — the delta IS
     the packed gather's in-suite cost (standalone timings over the relay
     are dispatch-dominated and lie; CLAUDE.md),
  3. the same pair with batch=1 for the latency view.

Also prints the VMEM arithmetic for the payload-riding alternative (carry
rz+rfac through the walk kernel so the gather disappears): the flow walk
would need code+pk+rz+rfac state = 4 inputs + 4 outputs + fdr, and even
with fdr packed into code's spare bits (VMEM-tier indices fit 24 bits) the
total is 8 grid rasters — at the basin's (2320 x 1536) padded f32 raster
(14.25 MB) that is ~114 MB before Mosaic band temporaries against the
128 MB cap, i.e. the same knife edge that reverted the round-4 packed
downslope.  The probe records the measured gather cost so the trade stays
quantified.  Appends to artifacts/probe_gather.json.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from descriptools_tpu.constants import NODATA
    from descriptools_tpu.io import load_example_inputs
    from descriptools_tpu.ops import (
        ln_hl_h, slope, topographic_index, modified_topographic_index,
    )
    from descriptools_tpu.ops.flow import hand_and_river_fac
    from descriptools_tpu.ops.gfi import gfi as _gfi
    from descriptools_tpu.pipeline import (
        PipelineConfig, _engine_downslope, _engine_flow, descriptor_suite,
    )

    cfg = PipelineConfig()
    data = load_example_inputs("/root/reference/Example")
    dem = jnp.asarray(data["dem"], jnp.int32)
    fdr = jnp.asarray(data["fdr"])
    fac = jnp.asarray(data["fac"], jnp.int32)
    river = jnp.asarray(data["river"])

    @partial(jax.jit, static_argnames=("gather",))
    def suite(dem, fdr, fac, river, gather=True):
        dem_f = jnp.asarray(dem, jnp.float32)
        sl = slope(dem_f, cfg.px)
        sl_rad = jnp.where(
            dem_f == NODATA, jnp.float32(NODATA), jnp.arctan(sl / 100.0)
        )
        twi = topographic_index(fac, sl_rad, cfg.px)
        mtwi = modified_topographic_index(fac, sl_rad, cfg.px, cfg.n_topo)
        down = _engine_downslope(dem_f, fdr, cfg)
        fdist, indices = _engine_flow(fdr, river, cfg)
        if gather:
            hand, river_fac = hand_and_river_fac(dem, fac, indices)
        else:
            # Gather-free placeholder with the same dtypes/shapes: the
            # downstream pointwise work is identical, so the timed delta
            # isolates the gather.
            hand = jnp.where(indices != NODATA, dem, dem)
            river_fac = jnp.asarray(fac, jnp.float32)
        geofi = _gfi(hand, river_fac, cfg.n_gfi, cfg.b_gfi, cfg.px)
        lnhlh = ln_hl_h(hand, fac, cfg.n_gfi, cfg.b_gfi, cfg.px)
        return dict(slope=sl, twi=twi, mod_twi=mtwi, downslope=down,
                    fdist=fdist, indices=indices, hand=hand, gfi=geofi,
                    ln_hl_h=lnhlh)

    def timed(gather, batch, iters=7):
        def run():
            outs = [suite(dem, fdr, fac, river, gather=gather)
                    for _ in range(batch)]
            float(sum(jnp.sum(o["hand"]) for o in outs))

        run()  # warm
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / batch

    out = {
        "engine": cfg.resolve_engine(),
        "with_gather_ms": round(timed(True, 5) * 1e3, 2),
        "no_gather_ms": round(timed(False, 5) * 1e3, 2),
        "with_gather_latency_ms": round(timed(True, 1, iters=5) * 1e3, 2),
        "no_gather_latency_ms": round(timed(False, 1, iters=5) * 1e3, 2),
    }
    out["gather_in_suite_ms"] = round(
        out["with_gather_ms"] - out["no_gather_ms"], 2
    )
    out["vmem_analysis"] = (
        "payload-riding alternative needs 8 grid rasters (code+pk+rz+rfac "
        "in/out with fdr packed into code's spare bits) = ~114 MB at basin "
        "size before band temporaries vs the 128 MB cap"
    )
    path = os.path.join(REPO, "artifacts", "probe_gather.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
