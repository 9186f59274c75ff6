"""Probe: where do downslope's sweeps go?  Time vs max_steps cap on the
basin (identical times at two caps => convergence below the smaller one)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from descriptools_tpu.io import load_example_inputs
from descriptools_tpu.ops.pallas.walk_vmem import downslope_pallas_vmem
from descriptools_tpu.utils.timing import sync

data = load_example_inputs("/root/reference/Example")
dem = jnp.asarray(data["dem"].astype(np.float32))
fdr = jnp.asarray(data["fdr"])
px = 30.0

ref = None
for cap in [512, 2048, 5000]:
    out = downslope_pallas_vmem(dem, fdr, px, 5.0, max_steps=cap)
    sync(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = downslope_pallas_vmem(dem, fdr, px, 5.0, max_steps=cap)
        sync(out)
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)
    if cap == 5000:
        ref = np.asarray(out)
    n_nan = int(jnp.sum(jnp.isnan(out)))
    print(f"cap={cap:5d} median_ms={1e3 * ts[len(ts) // 2]:7.1f} "
          f"all={[round(1e3 * t, 1) for t in ts]} nan={n_nan}")
