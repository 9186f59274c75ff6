"""Follow-up probe: REAL download bandwidth (device-computed data, so the
relay cannot serve a cached host copy), int8/int32 upload rates, and host
disk memmap write/read bandwidth.  Appends to artifacts/probe_relay.json."""

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

    path = os.path.join(REPO, "artifacts", "probe_relay.json")
    with open(path) as fh:
        out = json.load(fh)
    MB = 1024 * 1024

    # Download of data that only exists on device (computed there).
    for nbytes_mb in (64, 256):
        n = nbytes_mb * MB // 4
        side = int(np.sqrt(n))
        d = jnp.ones((side, side), jnp.float32) * jnp.float32(1.2345)
        d = (d * d + jnp.float32(0.731)).astype(jnp.float32)
        float(jnp.sum(d))  # ensure computed
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            h = np.asarray(d + jnp.float32(_))  # fresh value each iter
            ts.append(time.perf_counter() - t0)
        sec = float(np.min(ts))
        out[f"download_computed_{nbytes_mb}MB_s"] = round(sec, 3)
        out[f"download_computed_{nbytes_mb}MB_MBps"] = round(
            h.nbytes / MB / sec, 1
        )
        del d, h

    # Disk memmap write + read-back (1 GB) under the repo's .config5 dir.
    tmpdir = os.path.join(REPO, ".probe_tmp")
    os.makedirs(tmpdir, exist_ok=True)
    fn = os.path.join(tmpdir, "disk_probe.npy")
    a = np.random.default_rng(0).random((16384, 16384), np.float32)  # 1 GB
    t0 = time.perf_counter()
    m = np.lib.format.open_memmap(fn, mode="w+", dtype=np.float32,
                                  shape=a.shape)
    m[:] = a
    m.flush()
    del m
    sec = time.perf_counter() - t0
    out["disk_write_1GB_s"] = round(sec, 2)
    out["disk_write_MBps"] = round(a.nbytes / MB / sec, 1)
    os.system("sync")
    t0 = time.perf_counter()
    m = np.load(fn, mmap_mode="r")
    s = float(np.asarray(m[::128, ::1]).sum())  # touch every page-ish
    b = np.array(m)
    sec = time.perf_counter() - t0
    out["disk_read_1GB_s"] = round(sec, 2)
    out["disk_read_MBps"] = round(a.nbytes / MB / sec, 1)
    del m, b, a
    os.remove(fn)

    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
