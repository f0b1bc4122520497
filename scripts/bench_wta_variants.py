"""Bisect the Pallas WTA-stats kernel's ~20× degradation (run on real TPU).

wta_stats_from_duals measures ~42 ms at the stacked refine shape while the
XLA formulation runs 1.5 ms (scripts/bench_stats.py, dispatch-amortized).
Each variant here strips one ingredient of the kernel to find the cost:

- base        : the shipping _wta_lanes_kernel formulation (packed outputs)
- f32sum      : compute in f32 instead of int32
- bestonly    : only the packed-key best+idx (no cm/cp/comp)
- nokey       : plain min for best, separate masked argmin (no key packing)
- unpacked    : 5·groups separate (BW, BH) outputs (the pre-r3 layout)
- smallblk    : block_w=8
- bigblk      : block_w=64
- sumonly     : just s = hf+hb reduced to one packed min per group
                (lane-reduce floor for this block pattern)

All chained K inside one jit (the ~1.7 ms dispatch floor otherwise hides
everything).
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

W, Hs, D = 1280, 368, 128
GROUPS, DG = 4, 32
K = 6
N = 4


def build(variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from stereovision_tpu.ops import sgm_pallas as sp

    block_w = {"smallblk": 8, "bigblk": 48}.get(variant, 32)
    block_h = 128
    d_valid, dg, groups = DG, DG, GROUPS
    f32 = variant == "f32sum"

    def kernel(hf_ref, hb_ref, stats_ref, idx_ref, *, bh):
        acc_dt = jnp.float32 if f32 else jnp.int32
        big = jnp.float32(sp._BIG) if f32 else (sp._BIGI)
        s = hf_ref[:].astype(acc_dt) + hb_ref[:].astype(acc_dt)
        dp = 1
        while dp < dg:
            dp *= 2
        for g in range(groups):
            sg = jax.lax.slice_in_dim(s, g * dg, (g + 1) * dg, axis=2)
            dl = jax.lax.broadcasted_iota(jnp.int32, sg.shape, 2)
            if variant == "sumonly":
                best = jnp.min(sg, axis=-1)
                stats_ref[:, (0 * groups + g) * bh:(0 * groups + g + 1) * bh] = (
                    best.astype(jnp.float32))
                idx_ref[:, g * bh:(g + 1) * bh] = best.astype(jnp.int32)
                continue
            if variant == "nokey":
                best = jnp.min(sg, axis=-1)
                idx = jnp.min(jnp.where(sg == best[..., None], dl, 1 << 30),
                              axis=-1)
            elif f32:
                keyf = sg * dp + dl.astype(jnp.float32)
                kmin = jnp.min(keyf, axis=-1)
                idx = (kmin - jnp.floor(kmin / dp) * dp).astype(jnp.int32)
                best = jnp.floor(kmin / dp)
            else:
                key = jnp.minimum(sg, (1 << 30) // dp - 1) * dp + dl
                kmin = jnp.min(key, axis=-1)
                best = kmin // dp
                idx = kmin % dp
            outs = [best]
            if variant not in ("bestonly",):
                cm = jnp.min(jnp.where(dl == idx[..., None] - 1, sg, big),
                             axis=-1)
                cp = jnp.min(jnp.where(dl == idx[..., None] + 1, sg, big),
                             axis=-1)
                comp = jnp.min(
                    jnp.where(jnp.abs(dl - idx[..., None]) > 1, sg, big),
                    axis=-1)
                outs += [cm, cp, comp]
            for k, val in enumerate(outs):
                stats_ref[:, (k * groups + g) * bh:(k * groups + g + 1) * bh] = (
                    val.astype(jnp.float32))
            idx_ref[:, g * bh:(g + 1) * bh] = idx

    def kernel_unpacked(hf_ref, hb_ref, *orefs):
        s = hf_ref[:].astype(jnp.int32) + hb_ref[:].astype(jnp.int32)
        dp = 1
        while dp < dg:
            dp *= 2
        for g in range(groups):
            sg = jax.lax.slice_in_dim(s, g * dg, (g + 1) * dg, axis=2)
            dl = jax.lax.broadcasted_iota(jnp.int32, sg.shape, 2)
            key = jnp.minimum(sg, (1 << 30) // dp - 1) * dp + dl
            kmin = jnp.min(key, axis=-1)
            best = kmin // dp
            idx = kmin % dp
            cm = jnp.min(jnp.where(dl == idx[..., None] - 1, sg, sp._BIGI),
                         axis=-1)
            cp = jnp.min(jnp.where(dl == idx[..., None] + 1, sg, sp._BIGI),
                         axis=-1)
            comp = jnp.min(
                jnp.abs(dl - idx[..., None]).astype(jnp.int32) * 0 + jnp.where(
                    jnp.abs(dl - idx[..., None]) > 1, sg, sp._BIGI), axis=-1)
            for k, val in enumerate((best, cm, cp, comp)):
                orefs[g * 5 + k][:] = val.astype(jnp.float32)
            orefs[g * 5 + 4][:] = idx

    import jax

    nw = pl.cdiv(W, block_w)
    nh = pl.cdiv(Hs, block_h)
    spec3 = pl.BlockSpec((block_w, block_h, D), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    if variant == "unpacked":
        ospec = pl.BlockSpec((block_w, block_h), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
        out_specs = tuple([ospec] * (5 * groups))
        out_shape = tuple(
            jax.ShapeDtypeStruct((nw * block_w, nh * block_h),
                                 jnp.int32 if k % 5 == 4 else jnp.float32)
            for k in range(5 * groups))
        kern = kernel_unpacked
    else:
        out_specs = (
            pl.BlockSpec((block_w, 4 * groups * block_h), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_w, groups * block_h), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((nw * block_w, nh * 4 * groups * block_h),
                                 jnp.float32),
            jax.ShapeDtypeStruct((nw * block_w, nh * groups * block_h),
                                 jnp.int32),
        )
        kern = functools.partial(kernel, bh=block_h)

    import jax.numpy as jnp

    def once(a, b):
        return pl.pallas_call(
            kern, grid=(nw, nh), in_specs=[spec3, spec3],
            out_specs=out_specs, out_shape=out_shape,
        )(a, b)

    @jax.jit
    def run(a, b):
        for _ in range(K):
            out = once(a, b)
            leaf = out[0] if isinstance(out, (tuple, list)) else out
            d = leaf.reshape(-1)[0].astype(jnp.int8)
            a = a.at[0, 0, 0].add(d)
        return a, leaf

    return run


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print("backend:", jax.default_backend(), flush=True)

    names = sys.argv[1:] or [
        "base", "f32sum", "bestonly", "nokey", "unpacked", "smallblk",
        "bigblk", "sumonly",
    ]
    rng = np.random.default_rng(0)
    hf = jnp.asarray(rng.integers(0, 100, size=(W, Hs, D)).astype(np.int8))
    hb = jnp.asarray(rng.integers(0, 100, size=(W, Hs, D)).astype(np.int8))
    mm_w = jnp.ones((2048, 2048), jnp.bfloat16)

    def mm(a):
        for _ in range(50):
            a = a @ mm_w
        return a

    fns = {"mm50": (jax.jit(mm), (mm_w,), 1)}
    for n in names:
        fns[n] = (build(n), (hf, hb), K)
    dead = set()
    for n, (f, a, _) in fns.items():
        t0 = time.perf_counter()
        try:
            jax.block_until_ready(f(*a))
            print(f"[compile] {n}: {time.perf_counter() - t0:.1f}s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[compile] {n}: FAIL {str(e)[:120]}", flush=True)
            dead.add(n)
    fns = {n: v for n, v in fns.items() if n not in dead}

    acc = {n: [] for n in fns}
    for r in range(3):
        for n, (f, a, k) in fns.items():
            out = f(*a)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(N):
                out = f(*a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf[..., :1].astype(jnp.float32)))
            acc[n].append((time.perf_counter() - t0) / (N * k) * 1e3)
    base = min(acc["mm50"])
    for n, ts in acc.items():
        print(f"{n:10s} best={min(ts):8.3f} ms  vs_mm={min(ts) / base:5.2f}  "
              "runs=" + " ".join(f"{t:.3f}" for t in ts))


if __name__ == "__main__":
    main()
