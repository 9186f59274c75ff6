"""In-suite phase attribution by ablation (the only honest method over the
relay: standalone per-phase timings are dispatch-dominated and lie —
CLAUDE.md).  Times the fused suite with each major phase removed; the
deltas are the phases' true marginal costs inside the compiled program.

Variants: full, -downslope, -flow(+gather), -gather, -stencil/pointwise.
Appends artifacts/probe_phases.json.
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
        PipelineConfig, _engine_downslope, _engine_flow,
    )

    cfg = PipelineConfig()
    data = load_example_inputs("/root/reference/Example")
    dem = jnp.asarray(data["dem"], jnp.int32)
    fdr = jnp.asarray(data["fdr"])
    fac = jnp.asarray(data["fac"], jnp.int32)
    river = jnp.asarray(data["river"])

    @partial(jax.jit, static_argnames=("down", "flow", "gather", "pointw"))
    def suite(dem, fdr, fac, river, down=True, flow=True, gather=True,
              pointw=True):
        dem_f = jnp.asarray(dem, jnp.float32)
        if pointw:
            sl = slope(dem_f, cfg.px)
            sl_rad = jnp.where(
                dem_f == NODATA, jnp.float32(NODATA), jnp.arctan(sl / 100.0)
            )
            twi = topographic_index(fac, sl_rad, cfg.px)
            mtwi = modified_topographic_index(fac, sl_rad, cfg.px, cfg.n_topo)
        else:
            twi = mtwi = dem_f
        dn = _engine_downslope(dem_f, fdr, cfg) if down else dem_f
        if flow:
            fdist, indices = _engine_flow(fdr, river, cfg)
        else:
            fdist = dem_f
            indices = jnp.asarray(fdr, jnp.int32)
        if gather and flow:
            hand, river_fac = hand_and_river_fac(dem, fac, indices)
        else:
            hand = dem
            river_fac = jnp.asarray(fac, jnp.float32)
        if pointw:
            geofi = _gfi(hand, river_fac, cfg.n_gfi, cfg.b_gfi, cfg.px)
            lnhlh = ln_hl_h(hand, fac, cfg.n_gfi, cfg.b_gfi, cfg.px)
        else:
            geofi = lnhlh = dem_f
        return (twi, mtwi, dn, fdist, indices, hand, geofi, lnhlh)

    def timed(batch=5, iters=7, **kw):
        def run():
            outs = [suite(dem, fdr, fac, river, **kw) for _ in range(batch)]
            float(sum(jnp.sum(o[5]) for o in outs))

        run()
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        return round(float(np.median(ts)) / batch * 1e3, 2)

    out = {"full_ms": timed()}
    out["no_downslope_ms"] = timed(down=False)
    out["no_flow_ms"] = timed(flow=False)
    out["no_gather_ms"] = timed(gather=False)
    out["no_pointwise_ms"] = timed(pointw=False)
    out["attribution_ms"] = {
        "downslope": round(out["full_ms"] - out["no_downslope_ms"], 2),
        "flow_incl_gather": round(out["full_ms"] - out["no_flow_ms"], 2),
        "gather": round(out["full_ms"] - out["no_gather_ms"], 2),
        "stencil_pointwise": round(out["full_ms"] - out["no_pointwise_ms"], 2),
    }
    path = os.path.join(REPO, "artifacts", "probe_phases.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
