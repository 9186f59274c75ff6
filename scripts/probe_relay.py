"""Measure the axon-relay transfer bounds + host-side costs that govern the
out-of-core (config-5) pipeline: upload/download bandwidth, sync RTT,
windowed-loader generation cost, and the host combine.  Writes
artifacts/probe_relay.json.

The round-3 config-5 run spent 5503 s on 1e9 cells while the chip computes
each 8192^2 tile in seconds — this probe attributes the wall to its real
bounds so the round-4 restructure targets the right term (VERDICT task 2d).
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

    out = {"backend": jax.default_backend()}
    MB = 1024 * 1024

    # Sync round-trip (scalar readback).
    x_small = jnp.zeros((8, 128), jnp.float32)
    float(jnp.sum(x_small))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(x_small))
        ts.append(time.perf_counter() - t0)
    out["sync_rtt_ms"] = round(float(np.median(ts)) * 1e3, 2)

    # Upload bandwidth: host -> device, then force materialisation.
    for nbytes_mb in (64, 256):
        n = nbytes_mb * MB // 4
        side = int(np.sqrt(n))
        host = np.random.default_rng(0).random((side, side), np.float32)
        # warm the transfer path
        _ = jax.device_put(host[:128])
        float(jnp.sum(_))
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            d = jax.device_put(host)
            float(jnp.sum(d))  # includes one reduce (~free) + sync
            ts.append(time.perf_counter() - t0)
        sec = float(np.min(ts))
        out[f"upload_{nbytes_mb}MB_s"] = round(sec, 3)
        out[f"upload_{nbytes_mb}MB_MBps"] = round(host.nbytes / MB / sec, 1)

        # Download: device -> host.
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            h = np.asarray(d)
            ts.append(time.perf_counter() - t0)
        sec = float(np.min(ts))
        out[f"download_{nbytes_mb}MB_s"] = round(sec, 3)
        out[f"download_{nbytes_mb}MB_MBps"] = round(h.nbytes / MB / sec, 1)
        del d, host, h

    # Windowed synthetic loader cost (2-core host) for one 8192^2 window.
    from descriptools_tpu.utils.synthetic import windowed_basin

    loaders = windowed_basin(32768, 32768, seed=5)
    for name in ("dem", "fdr", "river", "fac", "flood"):
        t0 = time.perf_counter()
        a = loaders[name](8192, 16384, 8192, 16384)
        out[f"loader_{name}_8192_s"] = round(time.perf_counter() - t0, 2)
        del a

    os.makedirs(os.path.join(REPO, "artifacts"), exist_ok=True)
    with open(os.path.join(REPO, "artifacts", "probe_relay.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
