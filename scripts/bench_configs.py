"""Benchmark the BASELINE.json analogue configs beyond the bundled basin
(bench.py config 1) and write BENCH_CONFIGS.json at the repo root.

  config 2 — synthetic 4096^2: full suite + stencil-only (slope+TWI)
             roofline probe (measured v5e cost model: ~0.1 ms/stencil pass).
  config 3 — synthetic 10000^2 (1e8 cells, past the old 2^24 index
             ceiling): full suite, single chip.
  config 4 — calibration (jax backend, fused batch-fit) on the basin HAND.

Run on the default backend (the real TPU): nohup python
scripts/bench_configs.py.  Timings are medians with relay-safe syncs.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_CONFIGS.json",
)


def main():
    import jax
    import jax.numpy as jnp

    from descriptools_tpu import evaluation
    from descriptools_tpu.io import load_example_inputs
    from descriptools_tpu.ops import slope, topographic_index
    from descriptools_tpu.pipeline import PipelineConfig, descriptor_suite
    from descriptools_tpu.utils.synthetic import synthetic_basin
    from descriptools_tpu.utils.timing import timeit

    cfg = PipelineConfig()
    results = {"backend": jax.default_backend(), "engine": cfg.resolve_engine()}

    def suite_time(size, iters):
        t0 = time.time()
        dem, fdr, river, fac = synthetic_basin(size, size, seed=0)
        gen_s = time.time() - t0
        args = (
            jnp.asarray(dem.astype(np.int32)), jnp.asarray(fdr),
            jnp.asarray(fac.astype(np.int32)), jnp.asarray(river),
        )
        t = timeit(lambda: descriptor_suite(*args, cfg), warmup=1, iters=iters)
        return dict(
            cells=size * size, seconds=round(t, 4),
            grid_points_per_s=round(size * size / t, 1),
            host_gen_s=round(gen_s, 1),
        )

    # config 2: 4096^2 full suite + stencil-only roofline
    results["config2_full_suite_4096"] = suite_time(4096, iters=3)
    dem4k = synthetic_basin(4096, 4096, seed=0)[0]
    dem_j = jnp.asarray(dem4k.astype(np.float32))
    fac_j = jnp.asarray(np.abs(dem4k).astype(np.int32))

    @jax.jit
    def stencil_only(d, f):
        sl = slope(d, cfg.px)
        sl_rad = jnp.arctan(sl / 100.0)
        return topographic_index(f, sl_rad, cfg.px)

    t = timeit(lambda: stencil_only(dem_j, fac_j), warmup=1, iters=5)
    results["config2_stencil_slope_twi_4096"] = dict(
        cells=4096 * 4096, seconds=round(t, 5),
        grid_points_per_s=round(4096 * 4096 / t, 1),
    )

    # config 3: 10k x 10k (1e8 cells) full suite, single chip
    results["config3_full_suite_10000"] = suite_time(10000, iters=2)

    # config 3 derivation leg (BASELINE config 3 is "D8 flow direction +
    # HAND"; round-4 verdict, Missing #4): derive fdr+fac from the DEM
    # alone — steepest-descent D8 + O(log D) scatter-add accumulation —
    # timed at the same 1e8-cell scale.
    from descriptools_tpu.ops.terrain import derive_terrain

    dem10k = synthetic_basin(10000, 10000, seed=0)[0]
    dem10k_j = jnp.asarray(dem10k.astype(np.int32))

    def derive():
        fdr_d, fac_d = derive_terrain(dem10k_j)
        return fac_d

    t = timeit(derive, warmup=1, iters=2)
    results["config3_derive_terrain_10000"] = dict(
        cells=10000 * 10000, seconds=round(t, 3),
        grid_points_per_s=round(10000 * 10000 / t, 1),
        note="d8_flow_direction + flow_accumulation(auto max_path) from DEM",
    )

    # config 4: calibration on the basin HAND (fused batch-fit, jax backend)
    data = load_example_inputs("/root/reference/Example")
    out = descriptor_suite(
        jnp.asarray(data["dem"], jnp.int32), jnp.asarray(data["fdr"]),
        jnp.asarray(data["fac"], jnp.int32), jnp.asarray(data["river"]), cfg,
    )
    hand = np.asarray(out["hand"])
    elements = np.unique(hand)
    from descriptools_tpu import oracle

    desc = oracle.min_max_scale_oracle(hand, elements[1], elements[-1])
    desc_j = jnp.asarray(desc, jnp.float32)
    flood_j = jnp.asarray(data["flood"])

    def calib():
        return evaluation.calibration(desc_j, flood_j, "under", backend="jax")

    th = calib()  # warm + value check
    t = timeit(calib, warmup=1, iters=3)
    results["config4_calibration_basin"] = dict(
        cells=int(hand.size), seconds=round(t, 4), threshold=float(th),
        grid_points_per_s=round(hand.size / t, 1),
        note="full coarse-to-fine search, ~100 thresholds over 3.3M cells",
    )

    from descriptools_tpu.utils import provenance

    results["rev"] = provenance.git_rev(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    # Merge: keep entries other writers own (config5_1e9.py's config5 keys).
    try:
        with open(OUT) as fh:
            merged = json.load(fh)
    except FileNotFoundError:
        merged = {}
    merged.update(results)
    with open(OUT, "w") as fh:
        json.dump(merged, fh, indent=1)
    print(json.dumps(merged))


if __name__ == "__main__":
    main()
