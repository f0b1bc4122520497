"""lax.map vs vmap batching for the production disparity pipeline (real TPU).

lax.map runs frames sequentially (one frame's volumes live — required for
the full-search D=320 volumes) but pays every kernel's fixed cost per frame.
vmap adds a leading grid dimension to every Pallas kernel instead — per-
kernel overheads amortize across the batch, at B× the volume memory. The
production (packed hier2) volumes are tens of MB, so B=8 fits HBM easily.

Usage: python scripts/bench_batch.py [batch]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from stereovision_tpu.stereo import compute_disparity
    from stereovision_tpu.stereo.autotune import tune_stats_impl
    from stereovision_tpu.stereo import production_preset

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    H, W = 720, 1280
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, size=(H, W + 16)).astype(np.float32)
    try:
        import cv2
        base = cv2.GaussianBlur(base, (5, 5), 1.0)
    except Exception:
        pass
    left = jnp.stack([jnp.asarray(base[:, :W])] * B)
    right = jnp.stack([jnp.asarray(base[:, 8:8 + W])] * B)
    p = tune_stats_impl(production_preset())
    print("stats_impl:", p.stats_impl, "batch:", B, flush=True)

    f_map = jax.jit(lambda ls, rs: jax.lax.map(
        lambda q: compute_disparity(q[0], q[1], p), (ls, rs)))
    f_vmap = jax.jit(jax.vmap(lambda l, r: compute_disparity(l, r, p)))

    fns = {"map": f_map, "vmap": f_vmap}
    for n, f in fns.items():
        t0 = time.perf_counter()
        try:
            d, _ = f(left, right)
            float(jnp.sum(d))
            print(f"[compile] {n}: {time.perf_counter() - t0:.1f}s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[compile] {n}: FAIL {str(e)[:300]}", flush=True)
            fns[n] = None

    acc = {n: [] for n, f in fns.items() if f}
    for r in range(4):
        for n in acc:
            f = fns[n]
            d, _ = f(left, right)
            float(jnp.sum(d))
            t0 = time.perf_counter()
            for _ in range(4):
                d, _ = f(left, right)
            float(jnp.sum(d))
            acc[n].append((time.perf_counter() - t0) / (4 * B) * 1e3)
    for n, ts in acc.items():
        print(f"{n:5s} best={min(ts):6.2f} ms/frame  runs=" +
              " ".join(f"{t:.2f}" for t in ts))


if __name__ == "__main__":
    main()
