"""Standalone timing of the paths=2 production refine kernels (run on TPU).

Under HBM contention the paths=2 pipeline was measured FAR slower than
paths=4 (34 vs 13 ms single-frame) although quiet it is faster — this
probe isolates which kernel in the paths=2 chain carries the sensitivity.
Each kernel is timed on synthetic inputs of the production refine shape
(720p, pack=4 -> (Hh=184, W=1280) strips, 128-lane volume), interleaved
round-robin so a load swing cannot masquerade as a kernel difference.
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
    from stereovision_tpu.ops import sgm_pallas

    H, W = 720, 1280
    pk = 4
    Hh = -(-(-(-H // pk)) // 8) * 8  # 184
    Hp = pk * Hh
    dg = 128 // pk
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (Hp, W)).astype(np.float32)
    left = jnp.asarray(img)
    right = jnp.asarray(np.roll(img, 8, axis=1))

    cj = jax.jit(lambda l, r: (
        sgm_pallas.census_words(l, 5, 5),
        sgm_pallas.census_words(r[:, ::-1], 5, 5, mirror=True)))
    cl, crr = map(jax.block_until_ready, cj(left, right))

    cost_t2_j = jax.jit(lambda a, b: sgm_pallas.cost_volume_planes(
        a, b, W, 128, d_valid=dg, min_d=0, max_cost=24.0, transposed=2,
        pack=pk))
    cost_t1_j = jax.jit(lambda a, b: sgm_pallas.cost_volume_planes(
        a, b, W, 128, d_valid=dg, min_d=0, max_cost=24.0, transposed=1,
        pack=pk))
    cost_t = jax.block_until_ready(cost_t2_j(cl, crr))
    cost_n = jax.block_until_ready(cost_t1_j(cl, crr))[0]

    agg_t_j = jax.jit(lambda ct: sgm_pallas.aggregate_dual(
        ct, 8.0, 96.0, axis=0, out_dtype=jnp.int8, groups=pk))
    agg_n_j = jax.jit(lambda c: sgm_pallas.aggregate_dual(
        c, 8.0, 96.0, axis=0, out_dtype=jnp.int8, groups=pk))
    hf_t, hb_t = map(jax.block_until_ready, agg_t_j(cost_t))

    wstats_j = jax.jit(lambda a, b: sgm_pallas.wta_stats_from_duals(
        a, b, d_valid=dg, groups=pk))
    st_j = jax.jit(lambda a, b: sgm_pallas.st_from_duals(a, b, dg, pk))
    s_t = jax.block_until_ready(st_j(hf_t, hb_t))

    rd_j = jax.jit(lambda s: jnp.concatenate([
        sgm_pallas.right_disparity(s, dg, pre_transposed=True,
                                   plane_offset=g * dg)
        for g in range(pk)], axis=0))

    sumwta_j = jax.jit(lambda a, b: sgm_pallas.sum_wta(
        (a, b), d_valid=dg, groups=pk, emit_transposed=True))

    mm_w = jnp.ones((2048, 2048), jnp.bfloat16)

    def mm(a):
        for _ in range(50):
            a = a @ mm_w
        return a
    mm_j = jax.jit(mm)

    probes = {
        "mm50_2048 (load ref)": (mm_j, (mm_w,)),
        "cost_t2 (W,H,D)": (cost_t2_j, (cl, crr)),
        "cost_t1 (both)": (cost_t1_j, (cl, crr)),
        "agg_dual on cost_t": (agg_t_j, (cost_t,)),
        "agg_dual on cost_n": (agg_n_j, (cost_n,)),
        "wta_stats_from_duals": (wstats_j, (hf_t, hb_t)),
        "st_from_duals": (st_j, (hf_t, hb_t)),
        "sum_wta (p2 alt)": (sumwta_j, (hf_t, hb_t)),
        "rdisp x4": (rd_j, (s_t,)),
    }

    # warmup/compile
    for name, (f, a) in probes.items():
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s",
              flush=True)

    N = 20
    rounds = 3
    acc = {n: [] for n in probes}
    for r in range(rounds):
        for name, (f, a) in probes.items():
            out = f(*a)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(N):
                out = f(*a)
            jax.block_until_ready(out)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf[..., :1].astype(jnp.float32)))
            acc[name].append((time.perf_counter() - t0) / N * 1e3)
    for name, ts in acc.items():
        print(f"{name:24s} best={min(ts):7.3f} ms  runs=" +
              " ".join(f"{t:.3f}" for t in ts))


if __name__ == "__main__":
    main()
