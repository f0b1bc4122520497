"""Scaling-efficiency harness (BASELINE.md: ≥0.8 at 1 chip → 1 host → N hosts).

Measures frame-parallel disparity and distributed-BA step throughput across
mesh sizes and reports efficiency = T(1)·1 / (T(n)·n) per step... i.e.
throughput(n) / (n·throughput(1)).

On real hardware run as-is (devices = TPU chips; multi-host via
jax.distributed.initialize before launch). Under
``XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu`` it
exercises the identical sharded programs on virtual devices — collective
correctness and partitioning are real, wall-clock efficiency is not (virtual
devices share the same cores), so CPU runs print shapes/correctness plus
timings labeled accordingly.

    python bench_scaling.py [--devices 1 2 4 8] [--frames 16]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--num-disparities", type=int, default=64)
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        # the image's sitecustomize force-registers the TPU tunnel and stomps
        # the env var; honor the documented usage by pinning in code
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from stereovision_tpu.parallel import make_mesh, sharded_disparity
    from stereovision_tpu.parallel.ba import distributed_mono_ba, mono_ba_init
    from stereovision_tpu.stereo import SGMParams

    n_avail = len(jax.devices())
    sizes = args.devices or [n for n in (1, 2, 4, 8, 16) if n <= n_avail]
    platform = jax.devices()[0].platform
    virtual = platform == "cpu"

    rng = np.random.default_rng(0)
    B, H, W = args.frames, args.height, args.width
    base = rng.uniform(0, 255, (B, H, W + 8)).astype(np.float32)
    left, right = base[:, :, :W], base[:, :, 8 : 8 + W]
    params = SGMParams(
        num_disparities=args.num_disparities,
        impl="xla" if virtual else "auto",
    )

    # BA problem
    from stereovision_tpu.core import geometry as geom

    xs, ys = np.meshgrid(np.arange(9), np.arange(6))
    obj = np.stack([xs.ravel() * 2.5, ys.ravel() * 2.5, np.zeros(54)], -1)
    K = np.array([[650.0, 0, 320], [0, 650.0, 240], [0, 0, 1]])
    imgs = []
    while len(imgs) < B:
        rv = rng.uniform(-0.3, 0.3, 3)
        tv = np.array([rng.uniform(-3, 3) - 10, rng.uniform(-2, 2) - 6, rng.uniform(25, 45)])
        proj = np.asarray(geom.project_points(
            jnp.asarray(obj), jnp.asarray(rv), jnp.asarray(tv), jnp.asarray(K), jnp.zeros(5)))
        if 0 < proj[:, 0].min() and proj[:, 0].max() < 640 and 0 < proj[:, 1].min() and proj[:, 1].max() < 480:
            imgs.append(proj)
    img_pts = np.asarray(imgs)
    intr0, poses0 = mono_ba_init(obj, img_pts, (640, 480))

    results = {"platform": platform, "virtual_devices": virtual, "disparity": {}, "ba": {}}
    for n in sizes:
        mesh = make_mesh(frame=n, tile=1, devices=jax.devices()[:n])

        def run_disp():
            d, v = sharded_disparity(jnp.asarray(left), jnp.asarray(right), params, mesh)
            jax.block_until_ready(d)
            return float(jnp.sum(d))

        run_disp()
        t0 = time.perf_counter()
        for _ in range(3):
            run_disp()
        dt = (time.perf_counter() - t0) / 3
        results["disparity"][n] = round(B / dt, 2)

        def run_ba():
            g, p, rms = distributed_mono_ba(
                jnp.asarray(obj), jnp.asarray(img_pts), jnp.asarray(intr0),
                jnp.asarray(poses0), mesh, iters=5,
            )
            jax.block_until_ready(g)
            return float(rms)

        run_ba()
        t0 = time.perf_counter()
        for _ in range(3):
            run_ba()
        results["ba"][n] = round((time.perf_counter() - t0) / 3 * 1000, 1)

    # weak-scaling BA: per-device work HELD CONSTANT (16 views/device), so
    # ideal scaling is a flat time. This isolates partitioning/collective
    # overhead from the strong-scaling row above, where the per-device
    # problem shrinks to nothing (r3 VERDICT: 8-device looked 4x slower
    # because each device held 2 views' work plus every psum round).
    views_per_dev = 16
    need = views_per_dev * max(sizes)
    imgs_w = list(imgs)
    while len(imgs_w) < need:
        rv = rng.uniform(-0.3, 0.3, 3)
        tv = np.array([rng.uniform(-3, 3) - 10, rng.uniform(-2, 2) - 6, rng.uniform(25, 45)])
        proj = np.asarray(geom.project_points(
            jnp.asarray(obj), jnp.asarray(rv), jnp.asarray(tv), jnp.asarray(K), jnp.zeros(5)))
        if 0 < proj[:, 0].min() and proj[:, 0].max() < 640 and 0 < proj[:, 1].min() and proj[:, 1].max() < 480:
            imgs_w.append(proj)
    results["ba_weak"] = {}
    for n in sizes:
        mesh = make_mesh(frame=n, tile=1, devices=jax.devices()[:n])
        V = views_per_dev * n
        ip = np.asarray(imgs_w[:V])
        intr_w, poses_w = mono_ba_init(obj, ip, (640, 480))

        def run_ba_w():
            g, p, rms = distributed_mono_ba(
                jnp.asarray(obj), jnp.asarray(ip), jnp.asarray(intr_w),
                jnp.asarray(poses_w), mesh, iters=5,
            )
            jax.block_until_ready(g)
            return float(rms)

        run_ba_w()
        t0 = time.perf_counter()
        for _ in range(3):
            run_ba_w()
        results["ba_weak"][n] = round((time.perf_counter() - t0) / 3 * 1000, 1)
    t1 = results["ba_weak"][sizes[0]]
    results["ba_weak_efficiency"] = {
        n: round(t1 / results["ba_weak"][n], 3) for n in sizes
    }

    # exact row-tiled disparity (bit-identical to single-device): the frame-
    # pipelined cross-tile vertical chain, tile-parallel over all devices —
    # the single-frame-latency axis, complementing the throughput axis above
    from stereovision_tpu.parallel.disparity_exact import (
        sharded_disparity_exact_pipelined,
    )

    results["disparity_exact_tiled"] = {}
    for n in [s for s in sizes if H % s == 0]:
        mesh = make_mesh(frame=1, tile=n, devices=jax.devices()[:n])

        def run_exact():
            d, v = sharded_disparity_exact_pipelined(
                jnp.asarray(left), jnp.asarray(right), params, mesh)
            jax.block_until_ready(d)
            return float(jnp.sum(d))

        run_exact()
        t0 = time.perf_counter()
        for _ in range(3):
            run_exact()
        dt = (time.perf_counter() - t0) / 3
        results["disparity_exact_tiled"][n] = round(B / dt, 2)

    base_fps = results["disparity"][sizes[0]] / sizes[0]
    results["disparity_efficiency"] = {
        n: round(results["disparity"][n] / (n * base_fps), 3) for n in sizes
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
