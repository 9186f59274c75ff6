"""Benchmark: full descriptor suite throughput on the bundled basin.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "grid-points/s/chip", "vs_baseline": N}

value      = steady-state grid-points/s/chip of the full descriptor suite
             (slope, TWI, mod-TWI, downslope, fdist/indices/HAND, GFI,
             ln(hl/H)) on the 2178x1534 bundled basin, on the default JAX
             device (the real TPU chip under the driver).
vs_baseline = speedup vs the same compiled suite on one host CPU core-set
             (the reference publishes no numbers — BASELINE.md defines the
             CPU wall-clock as the speedup denominator; numba is unavailable
             here so the measured host-CPU run of the identical program is
             the honest stand-in).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

EXAMPLE = "/root/reference/Example"
WARMUP = 2
ITERS = 5


def _time_suite(device, dem, fdr, fac, river, cfg):
    import jax
    import jax.numpy as jnp

    from descriptools_tpu.pipeline import descriptor_suite

    args = [jax.device_put(jnp.asarray(a), device) for a in (dem, fdr, fac, river)]

    def run():
        out = descriptor_suite(args[0], args[1], args[2], args[3], cfg)
        # block_until_ready does not actually block on the axon backend;
        # a scalar readback of one output syncs the whole program.
        float(jnp.sum(out["hand"]))
        return out

    for _ in range(WARMUP):
        run()
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    import jax

    from descriptools_tpu.io import load_example_inputs
    from descriptools_tpu.pipeline import PipelineConfig

    data = load_example_inputs(EXAMPLE)
    cfg = PipelineConfig()
    dem = data["dem"].astype(np.int32)
    fdr = data["fdr"]
    fac = data["fac"].astype(np.int32)
    river = data["river"]
    cells = dem.size

    accel = jax.devices()[0]
    t_accel = _time_suite(accel, dem, fdr, fac, river, cfg)
    gps = cells / t_accel

    try:
        cpu = jax.devices("cpu")[0]
        t_cpu = _time_suite(cpu, dem, fdr, fac, river, cfg)
        vs = t_cpu / t_accel
    except Exception:
        vs = 1.0

    print(
        json.dumps(
            {
                "metric": "full_descriptor_suite_bundled_basin",
                "value": round(gps, 1),
                "unit": "grid-points/s/chip",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
