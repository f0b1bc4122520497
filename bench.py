"""Headline benchmark: disparity frames/s/chip at 720p vs the CPU reference.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N, ...}

- TPU side: this framework's production disparity engine
  (stereo.production_preset — the mode that beats the reference's accuracy
  on every quality scene) at 1280×720 with the reference's full
  320-disparity search range (depth_map.py:31-33). Extra keys report the
  fused three-method pipeline's per-stage ms (reference :3129-3151).
- Baseline: a CPU re-run of the reference's exact cv2.StereoSGBM recipe
  (depth_map.py:894-909) on the same pair, per BASELINE.md.

Measurement hardening (the shared TPU host's effective HBM bandwidth
varies ~3-7× between minutes — see CLAUDE.md):
- the WTA-stats formulation is AUTOTUNED on-chip per session
  (stereo.autotune): the Pallas form wins quiet, the XLA form under
  contention (32.7 vs 4.9 ms/frame measured in one loaded window);
- prod + a fixed yardstick mode + the CPU baseline are timed INTERLEAVED
  in one process, best-of over trials spread across BENCH_WINDOW_S
  seconds (default 240), so a load burst cannot define the artifact;
- extra keys record the yardstick and a cache-resident matmul probe so a
  loaded window is visible in the artifact itself.
"""

import json
import os
import sys
import time

import numpy as np

H, W, D = 720, 1280, 320
# frames in flight per measurement step (throughput metric — the reference's
# cv2 baseline is equally steady-state). 64 amortizes the per-program
# overheads: the production mode measured 7.49 ms/frame at batch 8 → 7.15 at
# 32 → 7.09 at 64 (r5, quiet windows) — ~5% of the frame budget was
# batch-amortizable.
BATCH = 64


def make_pair():
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, size=(H, W + 16)).astype(np.float32)
    # correlated texture so both engines behave like on natural images
    try:
        import cv2

        base = cv2.GaussianBlur(base, (5, 5), 1.0)
    except Exception:
        pass
    return base[:, :W], base[:, 8 : 8 + W]


def make_cpu_runner(left_np, right_np):
    import cv2

    sgbm = cv2.StereoSGBM_create(
        minDisparity=0, numDisparities=D, blockSize=7,
        P1=8 * 3 * 49, P2=32 * 3 * 49, disp12MaxDiff=1, uniquenessRatio=10,
        speckleWindowSize=100, speckleRange=32, preFilterCap=63,
        mode=cv2.STEREO_SGBM_MODE_SGBM_3WAY,
    )
    lu8, ru8 = left_np.astype(np.uint8), right_np.astype(np.uint8)
    sgbm.compute(lu8, ru8)

    def run(n=2):
        t0 = time.perf_counter()
        for _ in range(n):
            sgbm.compute(lu8, ru8)
        return (time.perf_counter() - t0) / n

    return run


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__) or ".",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import dataclasses

    import jax.numpy as jnp

    from stereovision_tpu.stereo import (compute_disparity_batch,
                                         production_preset, reference_preset)
    from stereovision_tpu.stereo.autotune import tune_stats_impl

    left_np, right_np = make_pair()
    cpu_run = make_cpu_runner(left_np, right_np)

    prod = tune_stats_impl(production_preset())
    yard = dataclasses.replace(
        reference_preset("hier"), refine_range=32, paths=2,
        stats_impl=prod.stats_impl)
    left = jnp.stack([jnp.asarray(left_np)] * BATCH)
    right = jnp.stack([jnp.asarray(right_np)] * BATCH)
    f_prod = jax.jit(lambda ls, rs: compute_disparity_batch(ls, rs, prod))
    f_yard = jax.jit(lambda ls, rs: compute_disparity_batch(ls, rs, yard))
    mm_w = jnp.ones((2048, 2048), jnp.bfloat16)

    def _mm(a):
        for _ in range(50):
            a = a @ mm_w
        return a

    f_mm = jax.jit(_mm)
    for f in (f_prod, f_yard):
        d, _ = f(left, right)
        float(jnp.sum(d))  # forced readback: block_until_ready is
    float(jnp.sum(f_mm(mm_w).astype(jnp.float32)[:1, :1]))  # tunnel-unreliable

    window_s = float(os.environ.get("BENCH_WINDOW_S", "240"))
    trials = max(3, int(os.environ.get("BENCH_TRIALS", "8")))
    best = {"prod": float("inf"), "yard": float("inf"),
            "mm": float("inf"), "cpu": float("inf")}
    t_start = time.perf_counter()
    for trial in range(trials):
        n = 6  # amortize the ~30 ms tunnel readback over n*BATCH frames
        t0 = time.perf_counter()
        for _ in range(n):
            d, _ = f_prod(left, right)
        float(jnp.sum(d))
        best["prod"] = min(best["prod"],
                           (time.perf_counter() - t0) / (n * BATCH))
        t0 = time.perf_counter()
        for _ in range(3):
            d, _ = f_yard(left, right)
        float(jnp.sum(d))
        best["yard"] = min(best["yard"], (time.perf_counter() - t0) / (3 * BATCH))
        t0 = time.perf_counter()
        z = f_mm(mm_w)
        float(jnp.sum(z.astype(jnp.float32)[:1, :1]))
        best["mm"] = min(best["mm"], time.perf_counter() - t0)
        best["cpu"] = min(best["cpu"], cpu_run())
        elapsed = time.perf_counter() - t_start
        if trial < trials - 1 and elapsed < window_s:
            time.sleep(min(window_s / (trials - 1), window_s - elapsed))

    tpu_fps = 1.0 / best["prod"]
    cpu_fps = 1.0 / best["cpu"]
    line = {
        "metric": "disparity_720p_d320_frames_per_second_per_chip",
        "value": round(tpu_fps, 2),
        "unit": "fps",
        "vs_baseline": round(tpu_fps / cpu_fps, 2),
        "cpu_baseline_fps": round(cpu_fps, 2),
        "stats_impl": prod.stats_impl,
        # load diagnostics: yardstick quiet-best is ~4.9 ms/frame, the
        # cache-resident matmul chain ~8 ms — a loaded window shows here
        "yardstick_ms": round(best["yard"] * 1e3, 2),
        "prod_ms": round(best["prod"] * 1e3, 2),
        "mm50_2048_ms": round(best["mm"] * 1e3, 2),
    }
    try:
        fused = bench_fused(left_np, right_np)
        if fused:
            line["fused"] = fused
    except Exception as e:  # never let the fused section break the headline
        line["fused_error"] = str(e)[:200]
    print(json.dumps(line))


def bench_fused(left_np, right_np):
    """Fused-pipeline stage timings + end-to-end fps at the reference's
    0.33 processing scale (the per-method ms stats of fused_depth_map.py
    :3129-3151). Returns a dict of milliseconds, or None on failure."""
    import jax
    import jax.numpy as jnp

    from stereovision_tpu.core import geometry as geom
    from stereovision_tpu.pipeline import FusedPipeline

    K = np.array([[700.0, 0, W / 2], [0, 700.0, H / 2], [0, 0, 1]])
    d0 = np.zeros(5)
    R, T = np.eye(3), np.array([-5.0, 0.0, 0.0])
    R1, R2, P1, P2, Q = geom.stereo_rectify(
        jnp.asarray(K), jnp.asarray(d0), jnp.asarray(K), jnp.asarray(d0),
        (W, H), jnp.asarray(R), jnp.asarray(T), alpha=0.0)
    cal = dict(
        mtx_left=K, mtx_right=K, dist_left=d0, dist_right=d0, R=R,
        T=T.reshape(3, 1), R1=np.asarray(R1), R2=np.asarray(R2),
        P1=np.asarray(P1), P2=np.asarray(P2), Q=np.asarray(Q),
        img_size=np.asarray([W, H]),
    )
    pipe = FusedPipeline(cal, scale=0.33)

    def timeit(fn, n=10):
        out = fn(0)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        float(jnp.sum(leaves[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(i + 1)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        float(jnp.sum(leaves[0].astype(jnp.float32)))
        return (time.perf_counter() - t0) / n * 1e3

    def timeit_chained(fn, x0, k=8, n=6):
        """Amortized per-call stage cost: K invocations chained inside ONE
        jit program (a data dependency serializes them). The plain ``timeit``
        numbers carry the ~1.7 ms/dispatch tunnel floor × host load — r5
        measured fuse 6.0 ms standalone vs 0.65 chained at this scale
        (scripts/bench_fused_stages.py)."""
        @jax.jit
        def run(x):
            out = None
            for _ in range(k):
                out = fn(x)
                leaf = jax.tree_util.tree_leaves(out)[0]
                x = x + 0.0 * leaf.reshape(-1)[0].astype(jnp.float32)
            return x, out

        jax.block_until_ready(run(x0))
        t0 = time.perf_counter()
        for _ in range(n):
            out = run(x0)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1]
                      .astype(jnp.float32)))
        return (time.perf_counter() - t0) / (n * k) * 1e3

    from stereovision_tpu.core import image as im
    from stereovision_tpu.fusion import fuse_depth_maps
    from stereovision_tpu.mono import flow_depth_step
    from stereovision_tpu.mono.nn import estimate_depth
    from stereovision_tpu.stereo import disparity_with_confidence

    h, w = pipe.proc[1], pipe.proc[0]
    lr = im.remap(im.resize(jnp.asarray(left_np), (h, w)), *pipe.depth_pipe._maps[:2])
    rr = im.remap(im.resize(jnp.asarray(right_np), (h, w)), *pipe.depth_pipe._maps[2:])
    res = {}
    # amortized per-stage cost (chained-K, see timeit_chained): the honest
    # compute number per stage — a standalone per-call loop is floor-bound
    res["stereo_ms"] = timeit_chained(
        lambda x: disparity_with_confidence(x, rr, pipe.sgm)[0], lr)
    frame3 = jnp.stack([lr] * 3, axis=-1)
    res["midas_ms"] = timeit_chained(
        lambda x: estimate_depth(pipe.model, pipe.variables,
                                 frame3 + 0.0 * x[0, 0])[0], lr)
    res["flow_ms"] = timeit_chained(
        lambda x: flow_depth_step(pipe.flow_state, x, jnp.float32(0.1),
                                  pipe.flow_params)[1], lr)
    sd = jnp.clip(jnp.abs(lr) % 255.0, 0, 255)
    sc = (rr % 2.0 > 1.0).astype(jnp.float32)
    res["fuse_ms"] = timeit_chained(
        lambda x: fuse_depth_maps(x, sc, sd, sc, sd, jnp.asarray(True),
                                  pipe.fusion_params)[0], sd)
    # e2e: the streaming chunk form — one uint8 upload + ONE compiled program
    # (lax.scan, on-device occlusion hysteresis) per 10-frame chunk. Warm up
    # FIRST: r03 recorded 0.15 fps because first-call compilation sat inside
    # the timed loop. Per-frame dict-call fps is also recorded; on this
    # tunnel-attached host it is bounded by the ~220 ms/frame f32 host→device
    # upload, which the chunk form amortizes.
    n = 10
    lefts = np.stack([left_np] * n).astype(np.uint8)
    rights = np.stack([right_np] * n).astype(np.uint8)
    outs = pipe.stream(lefts, rights, t0=0.0)  # compile + warm
    float(jnp.sum(outs["fused"]))
    t0 = time.perf_counter()
    outs = pipe.stream(lefts, rights, t0=1.0)
    outs = pipe.stream(lefts, rights, t0=2.0)
    float(jnp.sum(outs["fused"]))
    res["e2e_fps"] = round(2 * n / (time.perf_counter() - t0), 2)
    # host-link diagnostic: time the chunk upload alone. On this tunnel it
    # runs ~17 MB/s (≈110 ms per 720p uint8 pair), which bounds e2e_fps; a
    # PCIe-attached host moves the same bytes in <1 ms — compare e2e_fps with
    # 1000/upload_ms_per_frame to see whether the link or compute binds.
    t0 = time.perf_counter()
    dl = jax.device_put(lefts)
    dr = jax.device_put(rights)
    float(jnp.sum(dl[0].astype(jnp.float32)[:1, :1]) + jnp.sum(dr[0].astype(jnp.float32)[:1, :1]))
    res["upload_ms_per_frame"] = round((time.perf_counter() - t0) / n * 1e3, 2)
    # compute-only: same chunk already device-resident
    t0 = time.perf_counter()
    outs = pipe.stream(dl, dr, t0=3.0)
    float(jnp.sum(outs["fused"]))
    res["e2e_device_resident_fps"] = round(n / (time.perf_counter() - t0), 2)
    out = pipe(left_np, right_np, t_now=100.0)
    float(jnp.sum(out["fused"]))
    t0 = time.perf_counter()
    for i in range(3):
        out = pipe(left_np, right_np, t_now=100.1 * (i + 1))
    float(jnp.sum(out["fused"]))
    res["e2e_perframe_fps"] = round(3 / (time.perf_counter() - t0), 2)
    return {k: (round(v, 2) if isinstance(v, float) else v) for k, v in res.items()}


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
