"""Weak-scaling measurement of the sharded descriptor suite.

BASELINE.json's north star asks for >=80 % weak-scaling efficiency at N>=2
workers: the per-worker problem size stays fixed while the mesh grows, so
ideal scaling keeps wall-clock constant.  Real multi-chip hardware is not
available in this environment, so this harness runs the *identical* sharded
program (shard_map + ppermute halo exchange + boundary-graph ring
reduction) over a virtual CPU device mesh — it measures the framework's
scaling *behaviour* (collective volume, boundary-graph growth, padding
waste), not ICI silicon.  On a pod slice the same script runs unchanged on
real chips.

Usage:  python scripts/weak_scaling.py [--per-shard 512] [--iters 3]

Prints one line per mesh shape plus a JSON summary with parallel efficiency
relative to the single-device run.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from descriptools_tpu.parallel import make_mesh, sharded_suite
from descriptools_tpu.pipeline import PipelineConfig
from descriptools_tpu.utils.synthetic import synthetic_basin
from descriptools_tpu.utils.timing import timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-shard", type=int, default=512,
                    help="rows=cols of each shard's subgrid")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    devices = jax.devices()
    shapes = [(1, 1), (1, 2), (2, 2), (2, 4)]
    shapes = [s for s in shapes if s[0] * s[1] <= len(devices)]
    cfg = PipelineConfig(engine="xla")

    results = []
    t1 = None
    for ny, nx in shapes:
        mesh = make_mesh(shape=(ny, nx), devices=devices[: ny * nx])
        rows, cols = args.per_shard * ny, args.per_shard * nx
        dem, fdr, river, fac = synthetic_basin(rows, cols, seed=3)
        dem = dem.astype(np.int32)
        fac = fac.astype(np.int32)

        t = timeit(
            lambda: sharded_suite(dem, fdr, fac, river, cfg, mesh),
            warmup=1, iters=args.iters,
        )
        cells = rows * cols
        n = ny * nx
        if t1 is None:
            t1 = t
        eff = (t1 / t) if n == 1 else (t1 / t)
        results.append(
            dict(mesh=f"{ny}x{nx}", devices=n, cells=cells,
                 seconds=round(t, 4),
                 grid_points_per_s=round(cells / t, 1),
                 weak_scaling_efficiency=round(t1 / t, 4))
        )
        print(f"mesh {ny}x{nx}  {rows}x{cols}  {t*1e3:8.1f} ms  "
              f"{cells/t/1e6:7.2f} Mgp/s  eff {t1/t:.3f}")

    print(json.dumps({"weak_scaling": results}))


if __name__ == "__main__":
    main()
