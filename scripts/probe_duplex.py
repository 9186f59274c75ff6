"""Relay duplex probe (round-4 verdict, Missing #2a): is the axon tunnel
full-duplex?  The config-5 link bound was computed assuming the relay is
half-duplex (upload seconds + download seconds); if concurrent transfers
overlap, the true bound is ~max(up, down) and the out-of-core pipeline
should overlap tile t+1's upload with tile t-1's download
(tiled_suite(upload_in_prefetch=True)).

Measures, with device-computed download data (a cached host copy would lie):
  - upload alone, download alone (256 MB each),
  - both concurrently from two threads,
  - duplex_factor = (t_up + t_down) / t_concurrent  (~2 = full duplex,
    ~1 = half duplex),
  - whether jax.device_put works from a worker thread at all (the
    upload_in_prefetch prerequisite).
Appends results to artifacts/probe_relay.json.

Run alone on the TPU (single tenant): nohup python scripts/probe_duplex.py &
"""

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    path = os.path.join(REPO, "artifacts", "probe_relay.json")
    with open(path) as fh:
        out = json.load(fh)
    MB = 1024 * 1024
    n = 256 * MB // 4
    side = int(np.sqrt(n))

    host_up = np.random.default_rng(0).random((side, side)).astype(np.float32)
    dev = jnp.ones((side, side), jnp.float32) * jnp.float32(1.7)
    dev = (dev * dev + jnp.float32(0.3)).astype(jnp.float32)
    float(jnp.sum(dev))  # materialise on device

    def up():
        t0 = time.perf_counter()
        a = jax.device_put(host_up)
        float(jnp.sum(a[:2, :2]))  # ensure transfer landed
        return time.perf_counter() - t0

    k = [0]

    def down():
        k[0] += 1
        t0 = time.perf_counter()
        np.asarray(dev + jnp.float32(k[0]))  # fresh device value each call
        return time.perf_counter() - t0

    # Warm both paths once (compile the trivial programs).
    up(), down()

    t_up = min(up() for _ in range(2))
    t_down = min(down() for _ in range(2))

    # Worker-thread upload sanity (upload_in_prefetch prerequisite).
    try:
        with ThreadPoolExecutor(1) as ex:
            t_up_thread = ex.submit(up).result()
        thread_ok = True
    except Exception as e:  # pragma: no cover - depends on backend
        t_up_thread = None
        thread_ok = False
        out["upload_from_thread_error"] = repr(e)

    # Concurrent up + down.
    conc = []
    for _ in range(2):
        with ThreadPoolExecutor(2) as ex:
            t0 = time.perf_counter()
            fu = ex.submit(up)
            fd = ex.submit(down)
            fu.result(), fd.result()
            conc.append(time.perf_counter() - t0)
    t_conc = min(conc)

    out.update(
        duplex_probe_MB=256,
        duplex_upload_s=round(t_up, 3),
        duplex_download_s=round(t_down, 3),
        duplex_concurrent_s=round(t_conc, 3),
        duplex_factor=round((t_up + t_down) / t_conc, 3),
        duplex_full=bool(t_conc < 0.75 * (t_up + t_down)),
        upload_from_thread_ok=thread_ok,
        upload_from_thread_s=(
            round(t_up_thread, 3) if t_up_thread is not None else None
        ),
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in out if k.startswith("duplex")
                      or k.startswith("upload_from_thread")}))


if __name__ == "__main__":
    main()
