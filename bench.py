"""Headline benchmark: disparity frames/s/chip at 720p vs the CPU reference.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

- TPU side: this framework's SGM engine (census + 4-path Pallas aggregation)
  at 1280×720 with the reference's 320-disparity search range
  (depth_map.py:31-33).
- Baseline: a CPU re-run of the reference's exact cv2.StereoSGBM recipe
  (depth_map.py:894-909) on the same pair, per BASELINE.md.
"""

import json
import sys
import time

import numpy as np

H, W, D = 720, 1280, 320
BATCH = 8  # frames in flight per measurement step (throughput metric)


def make_pair():
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, size=(H, W + 16)).astype(np.float32)
    # correlated texture so both engines behave like on natural images
    k = np.ones((5, 5), np.float32) / 25
    try:
        import cv2

        base = cv2.GaussianBlur(base, (5, 5), 1.0)
    except Exception:
        pass
    del k
    return base[:, :W], base[:, 8 : 8 + W]


def bench_tpu(left_np, right_np):
    import jax
    import jax.numpy as jnp

    from stereovision_tpu.stereo import SGMParams, compute_disparity_batch

    # the production engine: hierarchical coarse-to-fine over the reference's
    # full 320-disparity range (full-search mode: SGMParams(mode="full")).
    # refine_range=32 runs the pack=4 lane-packed refine — faster than the
    # 64-window AND more accurate on 3 of the 4 quality scenes; paths=2
    # drops the refine's vertical sweep for a further 19% at ≤0.8% bad2 cost
    # (scripts/eval_quality.py --modes hier_r32,hier_r32p2).
    params = SGMParams(num_disparities=D, mode="hier", refine_range=32, paths=2)
    left = jnp.stack([jnp.asarray(left_np)] * BATCH)
    right = jnp.stack([jnp.asarray(right_np)] * BATCH)
    fn = jax.jit(lambda ls, rs: compute_disparity_batch(ls, rs, params))
    disp, _ = fn(left, right)
    float(jnp.sum(disp))  # force full execution through the async tunnel
    n = 8  # amortize the ~30 ms tunnel readback over n*BATCH frames
    t0 = time.perf_counter()
    for _ in range(n):
        disp, _ = fn(left, right)
    float(jnp.sum(disp))
    dt = (time.perf_counter() - t0) / (n * BATCH)
    return 1.0 / dt


def bench_cpu_reference(left_np, right_np):
    import cv2

    sgbm = cv2.StereoSGBM_create(
        minDisparity=0, numDisparities=D, blockSize=7,
        P1=8 * 3 * 49, P2=32 * 3 * 49, disp12MaxDiff=1, uniquenessRatio=10,
        speckleWindowSize=100, speckleRange=32, preFilterCap=63,
        mode=cv2.STEREO_SGBM_MODE_SGBM_3WAY,
    )
    lu8, ru8 = left_np.astype(np.uint8), right_np.astype(np.uint8)
    sgbm.compute(lu8, ru8)
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        sgbm.compute(lu8, ru8)
    dt = (time.perf_counter() - t0) / n
    return 1.0 / dt


def main():
    left, right = make_pair()
    cpu_fps = bench_cpu_reference(left, right)
    tpu_fps = bench_tpu(left, right)
    print(
        json.dumps(
            {
                "metric": "disparity_720p_d320_frames_per_second_per_chip",
                "value": round(tpu_fps, 2),
                "unit": "fps",
                "vs_baseline": round(tpu_fps / cpu_fps, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
