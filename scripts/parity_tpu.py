"""On-TPU golden parity gate: run the production (pallas-engine) pipeline on
the real chip and bitwise-compare against the reference golden artifact and
the XLA engines.  Writes PARITY_TPU.json at the repo root.

The CI golden test runs on CPU where resolve_engine() picks the XLA tier;
this script is the Mosaic-compiled engines' parity evidence on hardware
(golden spec: /root/reference/Example/example.py:215-217).

Run: python scripts/parity_tpu.py   (default backend = the real TPU; takes
minutes on first compile over the axon relay — use nohup).
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXAMPLE = "/root/reference/Example"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PARITY_TPU.json"
)


def main():
    import jax
    import numpy as np

    from descriptools_tpu.io import read_raster
    from descriptools_tpu.pipeline import PipelineConfig, run_example

    backend = jax.default_backend()
    cfg = PipelineConfig(engine="pallas" if backend == "tpu" else "xla")

    t0 = time.time()
    out = run_example(EXAMPLE, cfg)
    t_pallas = time.time() - t0
    golden = read_raster(os.path.join(EXAMPLE, "output", "hand_class.tif"))
    mismatch = int((out["class_map"] != golden).sum())

    t0 = time.time()
    out_x = run_example(EXAMPLE, replace(cfg, engine="xla"))
    t_xla = time.time() - t0

    def neq(k):
        return int((np.asarray(out[k]) != np.asarray(out_x[k])).sum())

    # fdist is a serial f32 distance sum: the hybrid XLA engine's phase-2
    # doubling composes the sum in a different order than the Pallas
    # sweeps, so fdist is allclose-not-bitwise BY DESIGN (module docstring
    # of ops/flow.py).  Everything integer must be bitwise.
    fa = np.asarray(out["fdist"], np.float64)
    fb = np.asarray(out_x["fdist"], np.float64)
    valid = (fa != -100) & (fb != -100)
    denom = np.maximum(np.abs(fb[valid]), 1.0)
    fdist_max_rel = float(np.max(np.abs(fa[valid] - fb[valid]) / denom))
    fdist_mask_differs = int((valid != ((fa != -100) | (fb != -100))).sum())

    result = {
        "backend": backend,
        "engine": cfg.engine,
        "grid": list(np.asarray(out["hand"]).shape),
        "class_map_mismatch_vs_golden": mismatch,
        "threshold": float(out["threshold"]),
        "fit": float(out["fit"]),
        "indices_cells_differing_vs_xla_engine": neq("indices"),
        "hand_cells_differing_vs_xla_engine": neq("hand"),
        "downslope_cells_differing_vs_xla_engine": neq("downslope"),
        "fdist_max_rel_vs_xla_engine": fdist_max_rel,
        "fdist_nodata_set_differs": fdist_mask_differs,
        "wall_s_engine": round(t_pallas, 2),
        "wall_s_xla": round(t_xla, 2),
    }
    with open(OUT, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    ok = (
        mismatch == 0
        and result["indices_cells_differing_vs_xla_engine"] == 0
        and result["hand_cells_differing_vs_xla_engine"] == 0
        and result["downslope_cells_differing_vs_xla_engine"] == 0
        and result["fdist_nodata_set_differs"] == 0
        and fdist_max_rel < 2e-4
    )
    print("PARITY", "OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
