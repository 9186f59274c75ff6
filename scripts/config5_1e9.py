"""BASELINE config 5: the full descriptor suite on a ~1e9-cell DEM, out of
core on one chip (multi-chip hardware is not reachable in this environment;
the same decomposition runs under sharded_suite_staged on a pod).

Round-4 structure (probe_relay.json attribution of the round-3 run: ~80 %
of its 5503 s was the SYNTHETIC GENERATOR re-running on the 2-core host,
not the framework):

  0. prep: materialise the synthetic inputs ONCE to disk memmaps
     (.config5_inputs/, cached across runs keyed by (n, seed)) — the
     reference's real workflow reads GeoTIFFs from disk, so the timed suite
     below is fed by windowed DISK readers, which is what the loader
     interface models.  Prep cost is reported separately.
  1. tiled_suite over the memmap loaders at 32768^2 (2^30 cells — also
     exercising the int32 flat-index range), outputs streamed to memmaps.
  2. oracle/invariant spot checks on sampled windows, incl. downslope AND
     fdist/indices vs float64 oracles on halo-extended windows.
  3. streaming one-pass histogram calibration + classification.

The wall is DOWNLOAD-BOUND: the (full-duplex, probe_duplex.py) relay moves
~30 MB/s per direction, uploads (2 B/cell ring pass + ~8.5 B/cell halo'd
inputs) ride the prefetch thread, disk writes and the host-side recomputes
(slope bitwise, slope_rad, the four pointwise rasters) ride the writer
thread, and the main thread is ~pure device_get of the 18 B/cell walk
products (fdist, indices, hand, river_fac, downslope — suite_stats records
the per-lane seconds).  The artifact reports duplex-aware bounds and the
fraction achieved.

Writes CONFIG5_1E9.json at the repo root with provenance + gp/s, and
appends/updates the config5 entry in BENCH_CONFIGS.json.

Run: nohup python scripts/config5_1e9.py [--n 32768 --tile 8192] &
(first run pays the prep generation; reruns reuse the input cache).
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

INPUT_SPEC = (
    ("dem", np.int16), ("fdr", np.uint8), ("river", np.int8),
    ("fac", np.int32), ("flood", np.int8),
)


def prepare_inputs(n, seed, cache_dir, gen_tile=8192):
    """Materialise windowed_basin to disk memmaps once; reuse across runs."""
    from descriptools_tpu.utils.synthetic import windowed_basin

    meta_path = os.path.join(cache_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        if meta.get("n") == n and meta.get("seed") == seed and meta.get("done"):
            return 0.0, True
    os.makedirs(cache_dir, exist_ok=True)
    gen = windowed_basin(n, n, seed=seed)
    t0 = time.time()
    mm = {
        k: np.lib.format.open_memmap(
            os.path.join(cache_dir, k + ".npy"), mode="w+", dtype=dt,
            shape=(n, n),
        )
        for k, dt in INPUT_SPEC
    }
    for ys in range(0, n, gen_tile):
        for xs in range(0, n, gen_tile):
            ye, xe = min(ys + gen_tile, n), min(xs + gen_tile, n)
            for k, dt in INPUT_SPEC:
                v = gen[k](ys, ye, xs, xe)
                if k == "dem":
                    assert v.min() >= np.iinfo(np.int16).min
                    assert v.max() <= np.iinfo(np.int16).max
                mm[k][ys:ye, xs:xe] = v.astype(dt)
            print(f"[prep] ({ys},{xs}) done", flush=True)
    for m in mm.values():
        m.flush()
    with open(meta_path, "w") as fh:
        json.dump({"n": n, "seed": seed, "done": True}, fh)
    return time.time() - t0, False


def disk_loaders(cache_dir):
    mm = {
        k: np.load(os.path.join(cache_dir, k + ".npy"), mmap_mode="r")
        for k, _dt in INPUT_SPEC
    }
    return {k: (lambda a: lambda ys, ye, xs, xe: a[ys:ye, xs:xe])(v)
            for k, v in mm.items()}


def sample_checks(loaders, shape, out, cfg, rng, n_windows=16, win=256):
    """Oracle + invariant spot checks on random interior windows."""
    from descriptools_tpu import oracle
    from descriptools_tpu.tiled import load_window

    rows, cols = shape
    checks = dict(windows=[], ok=True)

    def fail(msg):
        checks["ok"] = False
        checks.setdefault("failures", []).append(msg)

    for wi in range(n_windows):
        for _ in range(30):  # the NoData corner blob covers whole windows
            ys = int(rng.integers(0, rows - win))
            xs = int(rng.integers(0, cols - win))
            ye, xe = ys + win, xs + win
            dem = loaders["dem"](ys, ye, xs, xe)
            if (dem != -100).mean() > 0.5:
                break
        fac = loaders["fac"](ys, ye, xs, xe)
        river = loaders["river"](ys, ye, xs, xe)
        rec = dict(ys=ys, xs=xs)

        # Pointwise oracles (slope needs a 1-cell halo window).
        dem_h = load_window(
            loaders["dem"], ys, ye, xs, xe, shape, -100, dem.dtype, halo=1
        )
        sl_o = oracle.slope_oracle(dem_h.astype(np.float64), cfg.px)[1:-1, 1:-1]
        sl = np.asarray(out["slope"][ys:ye, xs:xe], np.float64)
        rec["slope_max_abs_err"] = float(np.max(np.abs(sl - sl_o)))
        if rec["slope_max_abs_err"] > 1e-3:
            fail(f"slope window {wi}")

        twi_o = oracle.topographic_index_oracle(
            fac, np.asarray(out["slope_rad"][ys:ye, xs:xe]), cfg.px
        )
        twi = np.asarray(out["twi"][ys:ye, xs:xe], np.float64)
        v = (twi != -100) & (twi_o != -100)
        rec["twi_max_abs_err"] = (
            float(np.max(np.abs(twi[v] - twi_o[v]))) if v.any() else 0.0
        )
        if rec["twi_max_abs_err"] > 1e-3:
            fail(f"twi window {wi}")

        # Flow invariants through the loaders (global properties).
        idx = np.asarray(out["indices"][ys:ye, xs:xe])
        hand = np.asarray(out["hand"][ys:ye, xs:xe])
        fdist = np.asarray(out["fdist"][ys:ye, xs:xe])
        landed = idx != -100
        n_landed = int(landed.sum())
        rec["landed_cells"] = n_landed
        if n_landed:
            ridx = idx[landed].astype(np.int64)
            hand_l = hand[landed]
            dem_l = dem[landed]
            if n_landed > 1500:  # bound the point-query count per window
                pick = rng.choice(n_landed, 1500, replace=False)
                ridx, hand_l, dem_l = ridx[pick], hand_l[pick], dem_l[pick]
            ry, rx = ridx // cols, ridx % cols
            # Per-point 1-cell loader queries (cheap against the memmapped
            # input cache; ~0.2 ms each against synthetic generators).
            riv_ok = np.ones(len(ridx), bool)
            dem_at = np.empty(len(ridx), dem.dtype)
            for k in range(len(ridx)):
                riv_ok[k] = loaders["river"](
                    ry[k], ry[k] + 1, rx[k], rx[k] + 1
                )[0, 0] == 1
                dem_at[k] = loaders["dem"](
                    ry[k], ry[k] + 1, rx[k], rx[k] + 1
                )[0, 0]
            if not riv_ok.all():
                fail(f"window {wi}: {int((~riv_ok).sum())} indices not river")
            want_hand = np.maximum(dem_l - dem_at, 0)
            if not np.array_equal(want_hand, hand_l):
                fail(f"window {wi}: hand != dem - dem[ridx]")
            if (hand_l < 0).any():
                fail(f"window {wi}: negative hand")
        own = (river == 1) & (loaders["fdr"](ys, ye, xs, xe) != 0)
        if own.any():
            yy = np.arange(ys, ye, dtype=np.int64)[:, None]
            xx = np.arange(xs, xe, dtype=np.int64)[None, :]
            own_idx = (yy * cols + xx)[own]
            if not np.array_equal(idx[own].astype(np.int64), own_idx):
                fail(f"window {wi}: river cells lack self index")
            if not (fdist[own] == 0).all():
                fail(f"window {wi}: river cells fdist != 0")

        # Downslope oracle on a halo-extended window: compare cells whose
        # oracle walk completes inside the window (non-truncated).
        halo = 192
        dem_w = load_window(
            loaders["dem"], ys, ye, xs, xe, shape, -100, dem.dtype,
            halo=halo,
        ).astype(np.float64)
        fdr_w = load_window(
            loaders["fdr"], ys, ye, xs, xe, shape, 0, np.uint8, halo=halo
        )
        dn_o, trunc = oracle.downslope_oracle_trunc(
            dem_w, fdr_w, cfg.px, cfg.elevation_difference,
            max_steps=cfg.downslope_max_steps,
        )
        dn_o = dn_o[halo:-halo, halo:-halo]
        ok_cells = ~trunc[halo:-halo, halo:-halo]
        dn = np.asarray(out["downslope"][ys:ye, xs:xe], np.float64)
        rec["downslope_cells_compared"] = int(ok_cells.sum())
        rec["downslope_max_abs_err"] = float(
            np.max(np.abs(dn[ok_cells] - dn_o[ok_cells]))
        ) if ok_cells.any() else 0.0
        if rec["downslope_max_abs_err"] > 1e-3:
            fail(f"downslope window {wi}")

        # fdist/indices vs the float64 flow oracle on the same halo-extended
        # window (round-3 verdict, task 7): a cell whose WINDOW-oracle walk
        # lands on a river never left the window, so the global walk is the
        # identical path — indices must match bitwise (translated to global
        # flat coords) and fdist up to f32 summation order.
        riv_w = load_window(
            loaders["river"], ys, ye, xs, xe, shape, 0, np.int8, halo=halo
        )
        fd_o, idx_o = oracle.flow_distance_index_oracle(
            fdr_w, riv_w, cfg.px, max_steps=cfg.flow_max_steps
        )
        fd_o = fd_o[halo:-halo, halo:-halo]
        idx_o = idx_o[halo:-halo, halo:-halo]
        wcols = win + 2 * halo
        inwin = idx_o != -100
        rec["fdist_cells_compared"] = int(inwin.sum())
        if inwin.any():
            gy = (ys - halo) + idx_o[inwin].astype(np.int64) // wcols
            gx = (xs - halo) + idx_o[inwin].astype(np.int64) % wcols
            want_idx = gy * cols + gx
            if not np.array_equal(idx[inwin].astype(np.int64), want_idx):
                fail(f"window {wi}: indices != window-oracle indices")
            fde = np.abs(np.asarray(fdist, np.float64)[inwin] - fd_o[inwin])
            denom = np.maximum(np.abs(fd_o[inwin]), 1.0)
            rec["fdist_max_rel_err"] = float(np.max(fde / denom))
            if rec["fdist_max_rel_err"] > 2e-4:
                fail(f"window {wi}: fdist vs oracle")
        checks["windows"].append(rec)
    return checks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32768)
    ap.add_argument("--tile", type=int, default=8192)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--out-dir", default=os.path.join(REPO, ".config5_out"))
    ap.add_argument("--input-cache",
                    default=os.path.join(REPO, ".config5_inputs"))
    ap.add_argument("--engine", default="auto")
    ap.add_argument("--no-upload-in-prefetch", action="store_true",
                    help="disable the duplex upload/download overlap")
    ap.add_argument("--no-host-slope-rad", action="store_true",
                    help="download slope_rad instead of host recompute")
    ap.add_argument("--no-host-pointwise", action="store_true",
                    help="download twi/mod_twi/gfi/ln_hl_h instead of "
                         "recomputing them on the writer thread")
    ap.add_argument("--no-host-slope", action="store_true",
                    help="download the slope raster instead of the "
                         "bitwise host stencil recompute")
    ap.add_argument("--skip-verify", action="store_true",
                    help="skip the full-coverage streaming invariant pass")
    args = ap.parse_args()

    import jax

    from descriptools_tpu.pipeline import PipelineConfig
    from descriptools_tpu.tiled import tiled_suite
    from descriptools_tpu.utils import provenance

    os.makedirs(args.out_dir, exist_ok=True)
    shape = (args.n, args.n)
    cells = args.n * args.n
    cfg = PipelineConfig(engine=args.engine)

    prep_s, prep_cached = prepare_inputs(args.n, args.seed, args.input_cache)
    print(f"prep {'cached' if prep_cached else f'{prep_s:.0f}s'}", flush=True)
    loaders = disk_loaders(args.input_cache)

    phase_t = {}
    last = [time.time(), None]

    def note(phase, t, total):
        now = time.time()
        if last[1] != phase:
            last[1] = phase
            phase_t[phase] = 0.0
        phase_t[phase] = phase_t.get(phase, 0.0) + (now - last[0])
        last[0] = now
        print(f"[{time.strftime('%H:%M:%S')}] {phase} {t + 1}/{total}",
              flush=True)

    suite_stats = {}
    t0 = time.time()
    out = tiled_suite(
        loaders, shape, cfg, tile_rows=args.tile, tile_cols=args.tile,
        out_dir=args.out_dir, engine=args.engine, progress=note,
        cache_inputs=False,  # inputs already ARE disk memmaps
        stats=suite_stats,
        host_slope_rad=not args.no_host_slope_rad,
        upload_in_prefetch=not args.no_upload_in_prefetch,
        host_pointwise=not args.no_host_pointwise,
        host_slope=not args.no_host_slope,
    )
    wall = time.time() - t0
    print(f"suite wall {wall:.1f}s  {cells / wall / 1e6:.2f} Mgp/s", flush=True)

    rng = np.random.default_rng(11)
    checks = sample_checks(loaders, shape, out, cfg, rng)

    # Full-coverage streaming invariant verification (round-4 verdict,
    # Missing #1): every one of the 2^30 cells checked against the flow
    # fixed-point truth table — no sampling.
    if not args.skip_verify:
        from descriptools_tpu.verify import streaming_flow_invariants

        t0 = time.time()
        inv = streaming_flow_invariants(
            loaders, out, shape, cfg.px, cfg.flow_max_steps,
            tile_rows=args.tile, tile_cols=args.tile, progress=note,
        )
        inv["seconds"] = round(time.time() - t0, 1)
        checks["invariants"] = inv
        if not inv["ok"]:
            checks["ok"] = False
            checks.setdefault("failures", []).append(
                f"{inv['invariant_violations']} streaming invariant "
                "violations"
            )
        print(f"invariants: {inv['invariant_violations']} violations over "
              f"{inv['cells_checked']} cells in {inv['seconds']}s",
              flush=True)

    # End-to-end: ONE-pass histogram calibration + classification over the
    # HAND memmap (identical float64 threshold to the host classifier;
    # bitwise unit test at small scale in tests/test_tiled_suite.py).
    from descriptools_tpu.tiled import tiled_classify_flood

    t0 = time.time()
    th, corr, fit, class_map = tiled_classify_flood(
        out["hand"], loaders["flood"], shape,
        out_dir=args.out_dir, tile_rows=args.tile, tile_cols=args.tile,
        progress=note,
    )
    t_classify = time.time() - t0
    # Window invariants: class code = prediction + 2*benchmark-flooded.
    for _ in range(3):
        ys = int(rng.integers(0, shape[0] - 256))
        xs = int(rng.integers(0, shape[1] - 256))
        cm = np.asarray(class_map[ys : ys + 256, xs : xs + 256])
        fl = loaders["flood"](ys, ys + 256, xs, xs + 256)
        if not ((cm >= 2) == (fl == 1)).all():
            checks["ok"] = False
            checks.setdefault("failures", []).append(
                f"class_map benchmark bit wrong at ({ys},{xs})"
            )
    checks["classification"] = dict(
        threshold=float(th), correctness=float(corr), fit=float(fit),
        seconds=round(t_classify, 1),
    )

    # Relay-bound accounting (round-3 verdict task 2d; round-4 Missing #2):
    # measured link rate x bytes the pipeline must move, under BOTH duplex
    # assumptions — the duplex probe (scripts/probe_duplex.py) decides which
    # bound is the operative one.
    try:
        with open(os.path.join(REPO, "artifacts", "probe_relay.json")) as fh:
            probe = json.load(fh)
        up_mbps = probe["upload_256MB_MBps"]
        down_mbps = probe["download_computed_256MB_MBps"]
    except Exception:
        probe = {}
        up_mbps = down_mbps = None
    halo_f = (1 + 2 * 64 / args.tile) ** 2
    up_bytes = cells * 2 + cells * 8 * halo_f  # ring pass + suite pass
    # Downloads: 38 B/cell baseline (8 f32 + 1 i32 + 1 i16); -4 for
    # host-side slope_rad; -12 for host-side pointwise (drops 4 f32
    # rasters, adds the 4 B/cell river_fac).
    out_bpc = 38
    if not args.no_host_slope_rad:
        out_bpc -= 4
    if not args.no_host_pointwise:
        out_bpc -= 12
    if not args.no_host_slope:
        out_bpc -= 4
    down_bytes = cells * out_bpc
    relay = {
        "measured_up_MBps": up_mbps,
        "measured_down_MBps": down_mbps,
        "upload_bytes": int(up_bytes),
        "download_bytes": int(down_bytes),
        "download_bytes_per_cell": out_bpc,
        "duplex_factor_measured": probe.get("duplex_factor"),
        "duplex_full": probe.get("duplex_full"),
    }
    if up_mbps:
        t_up = up_bytes / (up_mbps * 2**20)
        t_down = down_bytes / (down_mbps * 2**20)
        bound_serial = t_up + t_down
        bound_duplex = max(t_up, t_down)
        relay["link_bound_seconds_if_serial"] = round(bound_serial, 1)
        relay["link_bound_gps_if_serial"] = round(cells / bound_serial, 1)
        relay["link_bound_seconds_if_duplex"] = round(bound_duplex, 1)
        relay["link_bound_gps_if_duplex"] = round(cells / bound_duplex, 1)
        operative = (
            bound_duplex if probe.get("duplex_full") else bound_serial
        )
        relay["operative_bound_seconds"] = round(operative, 1)
        relay["fraction_of_link_bound"] = round(operative / wall, 3)

    result = {
        "config": 5,
        "backend": jax.default_backend(),
        **provenance.stamp(REPO),
        "grid": list(shape),
        "cells": cells,
        "tile": args.tile,
        "engine": cfg.resolve_engine(),
        "input_prep_seconds": round(prep_s, 1),
        "input_prep_cached": prep_cached,
        "wall_s": round(wall, 1),
        "grid_points_per_s": round(cells / wall, 1),
        "phase_seconds": {k: round(v, 1) for k, v in phase_t.items()},
        "suite_stats": suite_stats,
        "host_slope_rad": not args.no_host_slope_rad,
        "host_pointwise": not args.no_host_pointwise,
        "host_slope": not args.no_host_slope,
        "upload_in_prefetch": not args.no_upload_in_prefetch,
        "relay_bound": relay,
        "checks": checks,
        "ok": checks["ok"],
    }
    with open(os.path.join(REPO, "CONFIG5_1E9.json"), "w") as fh:
        json.dump(result, fh, indent=1)

    # Fold the headline into BENCH_CONFIGS.json as the config5 entry.
    bc_path = os.path.join(REPO, "BENCH_CONFIGS.json")
    try:
        with open(bc_path) as fh:
            bc = json.load(fh)
    except FileNotFoundError:
        bc = {}
    bc[f"config5_out_of_core_{args.n}"] = {
        "cells": cells,
        "seconds": round(wall, 1),
        "grid_points_per_s": round(cells / wall, 1),
        "rev": result["rev"],
        "ok": checks["ok"],
        "note": (
            "full suite + one-pass streaming classification, disk-memmap "
            "windowed loaders and outputs, single chip over the axon relay "
            "(~30 MB/s each way measured: throughput is LINK-bound, see "
            "CONFIG5_1E9.json relay_bound)"
        ),
    }
    with open(bc_path, "w") as fh:
        json.dump(bc, fh, indent=1)

    print(json.dumps(result))
    print("CONFIG5", "OK" if checks["ok"] else "FAIL")
    return 0 if checks["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
