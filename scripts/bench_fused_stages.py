"""Chained (dispatch-amortized) probe of the FUSED pipeline's per-stage cost
at the reference's 0.33 processing scale (422×633) — VERDICT r5 asked whether
``fuse_ms`` ≈ 6 is real compute or the ~1.7 ms/dispatch tunnel floor plus
host load (bench.py times each stage as a standalone call, so its per-stage
numbers carry the floor; the e2e chunk form does not).

Probes (each chains K invocations inside ONE jit program):
- fuse        : fuse_depth_maps (scenario tree + blend + 9×9 bilateral)
- bilateral   : the 9×9 bilateral alone (the suspected dominant term)
- fuse_nobil  : fuse minus the bilateral (delta attribution)
- calib       : calibrate_midas_to_stereo (anchored percentile fit)
- flow_step   : flow_depth_step (dense LK + ego RANSAC + EMA state)
- midas       : the mono CNN forward at net 256×256
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

H, W = 422, 633
K = 8
N = 6


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print("backend:", jax.default_backend(), flush=True)

    from stereovision_tpu.core import image as im
    from stereovision_tpu.fusion import (FusionParams,
                                         calibrate_midas_to_stereo,
                                         fuse_depth_maps)
    from stereovision_tpu.mono import FlowDepthParams, flow_depth_step
    from stereovision_tpu.mono.depth import flow_depth_init
    from stereovision_tpu.mono.nn import create_model, estimate_depth

    rng = np.random.default_rng(0)
    sd = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    sc = jnp.asarray((rng.uniform(size=(H, W)) > 0.3).astype(np.float32))
    md = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    mc = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
    fl = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    gray = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    moving = jnp.asarray(True)
    fp = FusionParams()
    fdp = FlowDepthParams()
    state = flow_depth_init((H, W))
    model, variables = create_model()
    frame3 = jnp.stack([gray] * 3, axis=-1)
    mm_w = jnp.ones((2048, 2048), jnp.bfloat16)

    def chain(fn):
        @jax.jit
        def run(x):
            out = None
            for _ in range(K):
                out = fn(x)
                leaf = jax.tree_util.tree_leaves(out)[0]
                x = x + 0.0 * leaf.reshape(-1)[0].astype(jnp.float32)
            return x, out

        return run

    def mm(a):
        for _ in range(50):
            a = a @ mm_w
        return a

    probes = {
        "mm50": (jax.jit(mm), (mm_w,), 1),
        "fuse": (chain(
            lambda x: fuse_depth_maps(x, sc, md, mc, fl, moving, fp)[0]),
            (sd,), K),
        "bilateral": (chain(
            lambda x: im.bilateral_filter(x, fp.bilateral_d,
                                          fp.bilateral_sigma,
                                          fp.bilateral_sigma)), (sd,), K),
        "gauss15": (chain(lambda x: im.gaussian_blur(x, 15)), (sd,), K),
        "calib": (chain(
            lambda x: calibrate_midas_to_stereo(md, x, sc)[0]), (sd,), K),
        "flow_step": (chain(
            lambda x: flow_depth_step(state, x, jnp.float32(0.1), fdp)[1]),
            (gray,), K),
        "midas": (chain(
            lambda x: estimate_depth(model, variables,
                                     frame3 + 0.0 * x[0, 0])[0]), (sd,), K),
    }
    only = set(sys.argv[1:])
    if only:
        probes = {k: v for k, v in probes.items()
                  if k == "mm50" or k in only}

    for name, (f, a, _) in probes.items():
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    acc = {n: [] for n in probes}
    for r in range(3):
        for name, (f, a, k) in probes.items():
            out = f(*a)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(N):
                out = f(*a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf.reshape(-1)[:1].astype(jnp.float32)))
            acc[name].append((time.perf_counter() - t0) / (N * k) * 1e3)
    base = min(acc["mm50"])
    for n, ts in acc.items():
        print(f"{n:11s} best={min(ts):7.3f} ms  vs_mm={min(ts) / base:5.2f}  "
              "runs=" + " ".join(f"{t:.3f}" for t in ts))


if __name__ == "__main__":
    main()
