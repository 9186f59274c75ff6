"""Probe: GS walk3 flow on the TPU — timing + bitwise parity vs XLA engine."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from descriptools_tpu.io import load_example_inputs
from descriptools_tpu.ops.flow import flow_distance_index
from descriptools_tpu.ops.pallas.walk_vmem import flow_pallas_vmem
from descriptools_tpu.utils.timing import sync

data = load_example_inputs("/root/reference/Example")
fdr = jnp.asarray(data["fdr"])
river = jnp.asarray(data["river"])
px = 30.0

fd_p, idx_p = flow_pallas_vmem(fdr, river, px)
sync(idx_p)
fd_x, idx_x = flow_distance_index(fdr, river, px)
sync(idx_x)
print("idx mismatch:", int(jnp.sum(idx_p != idx_x)))
print("fdist mismatch:", int(jnp.sum(fd_p != fd_x)))

for name, fn in [("gs_flow", lambda: flow_pallas_vmem(fdr, river, px))]:
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        out = fn()
        sync(out[0])
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)
    print(name, "median_ms", round(1e3 * ts[len(ts) // 2], 2), [round(1e3 * t, 1) for t in ts])
