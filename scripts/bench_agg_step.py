"""Decompose the dual-aggregation recurrence cost on the real TPU.

The production refine's dual sweep (pack=4 → groups=4, (W=1280, Hh=184,
D=128) int8 volume) measures ~4× above the VPU ALU roofline (SCALING.md §3).
This harness times VARIANTS of the same kernel skeleton that delete one
ingredient at a time, interleaved round-robin with a cache-resident matmul
probe (host load cancels in the ratios):

- full_raw     : the shipping kernel (raw carry, grouped min in-step)
- full_norm    : normalized-carry formulation (grouped renorm after step)
- no_groupmin  : grouped min replaced by the constant 0 (WRONG results —
                 isolates the masked-reduction cascade's cost)
- no_shifts    : d±1 shift terms dropped (WRONG — isolates the lane-shift
                 concatenates)
- no_store     : recurrence runs but only the final carry is written
                 (isolates the int8 block store traffic)
- fwd_only     : forward direction alone (is the dual fusion ~2×?)
- g1_raw       : groups=1 at the same shape (what does packing itself cost?)

Usage: python scripts/bench_agg_step.py [variant ...]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

W, X, D = 1280, 184, 128
GROUPS = 4
BS = 4  # production block_s for groups=4
N = 10
K = 10  # chained kernel invocations per jit call (amortize dispatch)


def build(variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from stereovision_tpu.ops import sgm_pallas as sp

    groups = 1 if variant == "g1_raw" else GROUPS
    dg = 0 if groups == 1 else D // groups
    p1, p2 = 8.0, 96.0
    bs = BS
    if variant.startswith("bs"):
        bs = int(variant[2:].split("_")[0])
        variant = "full_raw"
    elif variant == "f32in":
        variant = "full_raw"

    def gmin_slice(l, cat):
        # per-group min via STATIC 32-lane slice reductions (no full-width
        # masked reduce); broadcast back by select cascade or lane concat
        mins = [jnp.min(jax.lax.slice_in_dim(l, g * dg, (g + 1) * dg, axis=-1),
                        axis=-1, keepdims=True) for g in range(groups)]
        if cat:
            return jnp.concatenate(
                [jnp.broadcast_to(m, l.shape[:-1] + (dg,)) for m in mins],
                axis=-1)
        liota = jax.lax.broadcasted_iota(jnp.int32, l.shape, l.ndim - 1)
        res = mins[-1]
        for g in reversed(range(groups - 1)):
            res = jnp.where(liota < (g + 1) * dg, mins[g], res)
        return res

    def step_gm(prev, c, cat):
        shift_m = jnp.concatenate(
            [jnp.full_like(prev[..., :1], sp._BIG), prev[..., :-1]], axis=-1)
        shift_p = jnp.concatenate(
            [prev[..., 1:], jnp.full_like(prev[..., :1], sp._BIG)], axis=-1)
        lm = jax.lax.broadcasted_iota(jnp.int32, prev.shape, prev.ndim - 1) % dg
        shift_m = jnp.where(lm == 0, sp._BIG, shift_m)
        shift_p = jnp.where(lm == dg - 1, sp._BIG, shift_p)
        mp = gmin_slice(prev, cat)
        best = jnp.minimum(jnp.minimum(prev, mp + p2),
                           jnp.minimum(shift_m, shift_p) + p1)
        return c + best - mp

    def step_interleave(prev, c):
        # STRIDE-32 interleaved group layout (lane = d_local·groups + g):
        # group-min = log2(groups) wrap-correct rolls + mins, no masks or
        # broadcast-back; d±1 becomes a ±groups-lane shift with d_local
        # boundary masks. WRONG results in the current contiguous layout —
        # this measures the op pattern's cost only.
        import jax.experimental.pallas.tpu as _pltpu

        D_ = prev.shape[-1]
        lm = jax.lax.broadcasted_iota(jnp.int32, prev.shape, prev.ndim - 1)
        shift_m = _pltpu.roll(prev, groups, prev.ndim - 1)
        shift_p = _pltpu.roll(prev, D_ - groups, prev.ndim - 1)
        shift_m = jnp.where(lm < groups, sp._BIG, shift_m)
        shift_p = jnp.where(lm >= D_ - groups, sp._BIG, shift_p)
        mp = prev
        r = D_ // 2
        while r >= D_ // groups:  # {64, 32} for groups=4: wrap-correct
            mp = jnp.minimum(mp, _pltpu.roll(mp, r, prev.ndim - 1))
            r //= 2
        best = jnp.minimum(jnp.minimum(prev, mp + p2),
                           jnp.minimum(shift_m, shift_p) + p1)
        return c + best - mp

    def step_interleave5(prev, c):
        # CORRECT stride-groups interleaved step (lane = d_local·groups + g):
        # each group is a mod-``groups`` residue class, CLOSED under circular
        # rolls by multiples of ``groups`` — so the full group-min is
        # log2(dg) wrap-free roll+min doublings with NO masks and no
        # broadcast-back. d±1 = ±groups-lane rolls with d_local boundary
        # masks. (The 2-roll "gm_interleave" variant above only reduces 4 of
        # the 32 group elements — it measured the op pattern, not a correct
        # reduction; THIS is the honest cost of the banked r4 idea.)
        import jax.experimental.pallas.tpu as _pltpu

        D_ = prev.shape[-1]
        lm = jax.lax.broadcasted_iota(jnp.int32, prev.shape, prev.ndim - 1)
        shift_m = _pltpu.roll(prev, groups, prev.ndim - 1)
        shift_p = _pltpu.roll(prev, D_ - groups, prev.ndim - 1)
        shift_m = jnp.where(lm < groups, sp._BIG, shift_m)
        shift_p = jnp.where(lm >= D_ - groups, sp._BIG, shift_p)
        mp = prev
        r = groups
        while r < D_:  # {4, 8, 16, 32, 64} for groups=4
            mp = jnp.minimum(mp, _pltpu.roll(mp, r, prev.ndim - 1))
            r *= 2
        best = jnp.minimum(jnp.minimum(prev, mp + p2),
                           jnp.minimum(shift_m, shift_p) + p1)
        return c + best - mp

    def step(prev, c):
        if variant == "gm_interleave":
            return step_interleave(prev, c)
        if variant == "gm_interleave5":
            return step_interleave5(prev, c)
        if variant == "gm_slice":
            return step_gm(prev, c, cat=False)
        if variant == "gm_cat":
            return step_gm(prev, c, cat=True)
        if variant == "no_shifts":
            mp = sp._group_min(prev, dg)
            best = jnp.minimum(prev, mp + p2)
            return c + best - mp
        if variant == "no_groupmin":
            shift_m = jnp.concatenate(
                [jnp.full_like(prev[..., :1], sp._BIG), prev[..., :-1]], axis=-1)
            shift_p = jnp.concatenate(
                [prev[..., 1:], jnp.full_like(prev[..., :1], sp._BIG)], axis=-1)
            best = jnp.minimum(jnp.minimum(prev, p2),
                               jnp.minimum(shift_m, shift_p) + p1)
            return c + best
        if variant == "full_norm":
            l = sp._sgm_step_norm(prev, c, p1, p2, dg)
            return sp._renorm(l, dg)
        return sp._sgm_step_raw(prev, c, p1, p2, dg)

    dual = variant not in ("fwd_only", "copy1")
    store = variant != "no_store"
    copy = variant in ("copy", "copy1")

    def kernel(*refs, ks):
        refs = list(refs)
        cf_ref = refs.pop(0)
        cb_ref = refs.pop(0) if dual else None
        of_ref = refs.pop(0)
        ob_ref = refs.pop(0) if dual else None
        lpf_ref = refs.pop(0)
        lpb_ref = refs.pop(0) if dual else None
        j = pl.program_id(1)
        if copy:  # pure block copy: isolates the DMA/layout floor
            of_ref[:] = cf_ref[:]
            if dual:
                ob_ref[:] = cb_ref[:]
            return
        for it in range(ks):
            sf, sb = it, ks - 1 - it
            first = jnp.logical_and(j == 0, it == 0)
            cf = jax.lax.slice_in_dim(cf_ref[:], sf, sf + 1, axis=0)[0].astype(jnp.float32)
            lf = jnp.where(first, cf, step(lpf_ref[:], cf))
            lpf_ref[:] = lf
            if dual:
                cb = jax.lax.slice_in_dim(cb_ref[:], sb, sb + 1, axis=0)[0].astype(jnp.float32)
                lb = jnp.where(first, cb, step(lpb_ref[:], cb))
                lpb_ref[:] = lb
            if store:
                of_ref[pl.ds(sf, 1)] = jnp.minimum(lf, 127.0).astype(jnp.int8)[None]
                if dual:
                    ob_ref[pl.ds(sb, 1)] = jnp.minimum(lb, 127.0).astype(jnp.int8)[None]
        if not store:
            of_ref[pl.ds(0, 1)] = jnp.minimum(lf, 127.0).astype(jnp.int8)[None]
            if dual:
                ob_ref[pl.ds(0, 1)] = jnp.minimum(lb, 127.0).astype(jnp.int8)[None]

    ns = W // bs
    blk = (bs, X, D)
    spec_f = pl.BlockSpec(blk, lambda i, j: (j, i, 0), memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec(blk, lambda i, j: (ns - 1 - j, i, 0),
                          memory_space=pltpu.VMEM)
    lprev = pltpu.VMEM((X, D), jnp.float32)
    n_out = 2 if dual else 1
    in_specs = [spec_f] + ([spec_b] if dual else [])
    out_specs = tuple([spec_f] + ([spec_b] if dual else []))
    scratch = [lprev] * (2 if dual else 1)
    osd = jax.ShapeDtypeStruct((W, X, D), jnp.int8)

    # K chained invocations inside ONE jit call: a single dispatch costs
    # ~1.7 ms over the axon tunnel (CLAUDE.md), which swamps a ~0.5 ms
    # kernel — feeding each call's output into the next forces sequential
    # on-chip execution and amortizes the dispatch to noise.
    @jax.jit
    def run(cost):
        c = cost
        for _ in range(K):
            outs = pl.pallas_call(
                functools.partial(kernel, ks=bs),
                grid=(1, ns),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=tuple([osd] * n_out),
                scratch_shapes=scratch,
            )(*([c] * (2 if dual else 1)))
            c = outs[0]  # pallas_call is opaque to DCE: outs[1] still runs
        return c

    return run


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print("backend:", jax.default_backend(), flush=True)

    names = sys.argv[1:] or [
        "full_raw", "full_norm", "no_groupmin", "no_shifts", "no_store",
        "fwd_only", "g1_raw",
    ]
    rng = np.random.default_rng(0)
    cost = jnp.asarray(rng.integers(0, 25, size=(W, X, D)).astype(np.int8))
    mm_w = jnp.ones((2048, 2048), jnp.bfloat16)

    def mm(a):
        for _ in range(50):
            a = a @ mm_w
        return a

    def xla_chain(c):
        for _ in range(K):
            c = jnp.minimum(c + 1, c[::-1] + 1)
        return c

    fns = {"mm50": jax.jit(mm), "xla_minrev": jax.jit(xla_chain)}
    args = {"mm50": (mm_w,), "xla_minrev": (cost,)}
    scale = {"mm50": 1, "xla_minrev": K}
    for n in names:
        fns[n] = build(n)
        args[n] = (cost.astype(jnp.float32),) if n == "f32in" else (cost,)
        scale[n] = K
    for n, f in fns.items():
        t0 = time.perf_counter()
        out = f(*args[n])
        jax.block_until_ready(out)
        print(f"[compile] {n}: {time.perf_counter() - t0:.1f}s", flush=True)

    acc = {n: [] for n in fns}
    for r in range(3):
        for n, f in fns.items():
            out = f(*args[n])
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(N):
                out = f(*args[n])
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf[..., ::17].astype(jnp.float32)))
            acc[n].append((time.perf_counter() - t0) / (N * scale[n]) * 1e3)
    base = min(acc["mm50"])
    for n, ts in acc.items():
        print(f"{n:12s} best={min(ts):7.3f} ms  vs_mm={min(ts) / base:5.2f}  "
              "runs=" + " ".join(f"{t:.3f}" for t in ts))


if __name__ == "__main__":
    main()
