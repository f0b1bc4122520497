"""Interleaved mode-comparison harness (run ON the real TPU).

The shared TPU host's load varies ~6x between minutes (CLAUDE.md), so
absolute per-run numbers are meaningless. This harness times a set of
candidate modes ROUND-ROBIN in one process, many rounds, and reports
per-mode best and median along with the ratio vs the first (yardstick)
mode computed per-round (load cancels in the ratio).

Usage:
    python scripts/bench_modes.py [--rounds 8] [--inner 6] [--batch 8]
        [--modes yard,prod]  # names below
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def build_modes(names):
    from stereovision_tpu.stereo import (SGMParams, production_preset,
                                         reference_preset)
    import dataclasses

    prod = production_preset()
    registry = {
        # the fixed yardstick: fastest hier mode (r2 headline, 5.6 ms quiet)
        "yard": dataclasses.replace(
            reference_preset("hier"), refine_range=32, paths=2),
        "prod": prod,
        "hier4": dataclasses.replace(
            reference_preset("hier"), refine_range=32, paths=4),
        "full": reference_preset("full"),
        # feature-delta probes for attributing prod's cost:
        "prod_nofill": dataclasses.replace(prod, fill_invalid=False),
        "prod_nokill": dataclasses.replace(prod, census_kill=0.0),
        "prod_hier": dataclasses.replace(prod, mode="hier",
                                         fill_invalid=False),
        # inverse delta: prod already runs b_decimate=3, so probe full-height B
        "prod_bfull": dataclasses.replace(prod, b_decimate=1),
        # inverse delta: prod runs coarse_paths=2 now — probe the 4-path coarse
        "prod_cp4": dataclasses.replace(prod, coarse_paths=4),
        "prod_nolr": dataclasses.replace(prod, lr_max_diff=-1),
        "yard3": dataclasses.replace(
            reference_preset("hier"), refine_range=32, paths=2,
            coarse_scale=3),
    }
    return {n: registry[n] for n in names}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--inner", type=int, default=6)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--gap", type=float, default=0.0,
                    help="sleep between rounds (s)")
    ap.add_argument("--modes", type=str, default="yard,prod")
    ap.add_argument("--tune", action="store_true",
                    help="resolve stats_impl via stereo.autotune (what "
                         "bench.py and DepthPipeline do) instead of the "
                         "raw presets")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from stereovision_tpu.stereo import compute_disparity_batch

    H, W = 720, 1280
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, size=(H, W + 16)).astype(np.float32)
    try:
        import cv2
        base = cv2.GaussianBlur(base, (5, 5), 1.0)
    except Exception:
        pass
    left_np, right_np = base[:, :W], base[:, 8:8 + W]
    B = args.batch
    left = jnp.stack([jnp.asarray(left_np)] * B)
    right = jnp.stack([jnp.asarray(right_np)] * B)

    modes = build_modes(args.modes.split(","))
    if args.tune:
        import dataclasses

        from stereovision_tpu.stereo.autotune import (_probe_stats_impl,
                                                      tune_stats_impl)

        impl = _probe_stats_impl()
        print(f"[tune] stats_impl -> {impl}", flush=True)
        modes = {n: dataclasses.replace(tune_stats_impl(p), stats_impl=impl)
                 for n, p in modes.items()}
    fns = {}
    for name, p in modes.items():
        t0 = time.perf_counter()
        fn = jax.jit(lambda ls, rs, p=p: compute_disparity_batch(ls, rs, p))
        d, _ = fn(left, right)
        float(jnp.sum(d))
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s",
              flush=True)
        fns[name] = fn

    names = list(modes)
    times = {n: [] for n in names}
    for r in range(args.rounds):
        row = {}
        for n in names:
            fn = fns[n]
            t0 = time.perf_counter()
            for _ in range(args.inner):
                d, _ = fn(left, right)
            float(jnp.sum(d))
            ms = (time.perf_counter() - t0) / (args.inner * B) * 1e3
            times[n].append(ms)
            row[n] = ms
        y = row[names[0]]
        ratios = " ".join(f"{n}/{names[0]}={row[n] / y:.3f}"
                          for n in names[1:])
        print(f"[round {r}] " +
              " ".join(f"{n}={row[n]:.2f}ms" for n in names) +
              ("  " + ratios if ratios else ""), flush=True)
        if args.gap:
            time.sleep(args.gap)

    print("--- summary (ms/frame) ---")
    for n in names:
        ts = sorted(times[n])
        best, med = ts[0], ts[len(ts) // 2]
        print(f"{n:8s} best={best:.2f} med={med:.2f}")
    y = sorted(times[names[0]])[0]
    for n in names[1:]:
        # per-round ratio median: host load cancels within a round
        rr = sorted(t / yt for t, yt in zip(times[n], times[names[0]]))
        print(f"{n}/{names[0]} ratio: best-based="
              f"{sorted(times[n])[0] / y:.3f} "
              f"round-median={rr[len(rr) // 2]:.3f}")


if __name__ == "__main__":
    main()
