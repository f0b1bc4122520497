"""Chained (dispatch-amortized) probe of the paths=2 WTA-stats stage at the
production STACKED refine shape — run on the real TPU, ideally while the
Pallas lane-reduction kernel is in its degraded state, to compare:

- wta_pallas : wta_stats_from_duals (one-pass lane-reduction kernel)
- wta_xla    : sum_wta(..., emit_transposed=True) (transpose-first XLA form)
- st_only    : st_from_duals alone (the int8 s_t build)
- rdisp      : right_disparity over the int8 s_t (x4 groups)
- dual       : the aggregate_dual sweep itself, for scale

Each probe chains K invocations inside one jit program (a single dispatch
costs ~1.7 ms over the axon tunnel and would swamp sub-ms kernels).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

W, Hs, D = 1280, 368, 128  # stacked two-window refine pseudo-shape
GROUPS, DG = 4, 32
K = 8
N = 6


def main():
    import jax
    import jax.numpy as jnp

    from stereovision_tpu.ops import sgm_pallas as sp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print("backend:", jax.default_backend(), flush=True)

    rng = np.random.default_rng(0)
    hf = jnp.asarray(rng.integers(0, 100, size=(W, Hs, D)).astype(np.int8))
    hb = jnp.asarray(rng.integers(0, 100, size=(W, Hs, D)).astype(np.int8))
    mm_w = jnp.ones((2048, 2048), jnp.bfloat16)

    def chain(fn, feed):
        """fn(a, b) -> out; feed(out) -> int8 delta folded into the inputs to
        serialize the chain."""

        @jax.jit
        def run(a, b):
            for _ in range(K):
                out = fn(a, b)
                d = feed(out)
                a = jnp.bitwise_xor(a, d)
            return a, out

        return run

    def feed_stats(out):
        # fold a scalar from the stats maps into one input element
        s = (out[1][0, 0]).astype(jnp.int8)
        return jnp.zeros((W, Hs, D), jnp.int8).at[0, 0, 0].set(s)

    def feed_vol(out):
        v = out if not isinstance(out, tuple) else out[0]
        s = v.reshape(-1)[0].astype(jnp.int8)
        return jnp.zeros((W, Hs, D), jnp.int8).at[0, 0, 0].set(s)

    def mm(a):
        for _ in range(50):
            a = a @ mm_w
        return a

    probes = {
        "mm50": (jax.jit(mm), (mm_w,), 1),
        "wta_pallas": (chain(
            lambda a, b: sp.wta_stats_from_duals(a, b, d_valid=DG,
                                                 groups=GROUPS),
            feed_stats), (hf, hb), K),
        "wta_xla": (chain(
            lambda a, b: sp.sum_wta((a, b), d_valid=DG, groups=GROUPS,
                                    emit_transposed=True),
            feed_stats), (hf, hb), K),
        "st_only": (chain(
            lambda a, b: sp.st_from_duals(a, b, DG, GROUPS), feed_vol),
            (hf, hb), K),
        "rdisp": (chain(
            lambda a, b: jnp.concatenate([
                sp.right_disparity(sp.st_from_duals(a, b, DG, GROUPS), DG,
                                   pre_transposed=True, plane_offset=g * DG)
                for g in range(GROUPS)], axis=0),
            feed_vol), (hf, hb), K),
        "feedonly": (chain(lambda a, b: (a,), feed_vol), (hf, hb), K),
        "dual": (chain(
            lambda a, b: sp.aggregate_dual(a.astype(jnp.int8), 8.0, 96.0,
                                           axis=0, out_dtype=jnp.int8,
                                           groups=GROUPS),
            feed_vol), (hf, hb), K),
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
            float(jnp.sum(leaf[..., :1].astype(jnp.float32)))
            acc[name].append((time.perf_counter() - t0) / (N * k) * 1e3)
    base = min(acc["mm50"])
    for n, ts in acc.items():
        print(f"{n:12s} best={min(ts):7.3f} ms  vs_mm={min(ts) / base:5.2f}  "
              "runs=" + " ".join(f"{t:.3f}" for t in ts))


if __name__ == "__main__":
    main()
