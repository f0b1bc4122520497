"""Micro-bench: sum-4-volumes + WTA + s_t formulations on the real TPU.

Variants (all consume hf_t/hb_t (W,H,D) int8 + vf/vb (H,W,D) int8, the dual
aggregation kernels' outputs, and produce the WTA statistics plus the
(D,H,W) int16 s_t for the LR check):

  cur       — today's pipeline: XLA add+transpose hsum, then sum_wta
  st_first  — XLA: build s_t directly from the four transposed volumes, take
              the statistics as outer-dim reductions of s_t
  pallas    — fused Pallas sum4+WTA kernel emitting s (H,W,D) int16 + stats
              (in-kernel leading-dims transpose of the h volumes), then one
              XLA transpose for s_t
  pallas_st — same kernel but emitting s_t (D,H,W) in-kernel (full relayout)
  nolr      — stats only (no s volume anywhere): pallas kernel, vs cur XLA

Usage: python scripts/bench_sumwta.py [D ...]   (default: 128 384)
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

H, W = 720, 1280
N = int(os.environ.get("PROF_N", "30"))
_BIGI = 1 << 29


def timeit(fn, *args):
    import jax.numpy as jnp

    out = fn(*args)
    first = out[0] if isinstance(out, (tuple, list)) else out
    float(jnp.sum(first.astype(jnp.float32)[::97, ::97]))
    t0 = time.perf_counter()
    for _ in range(N):
        out = fn(*args)
    first = out[0] if isinstance(out, (tuple, list)) else out
    float(jnp.sum(first.astype(jnp.float32)[::97, ::97]))
    return (time.perf_counter() - t0) / N * 1e3


def make_pallas(d_valid, emit="hwd", block_h=8, block_w=128, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(hf_ref, hb_ref, vf_ref, vb_ref, *out_refs, dp):
        refs = list(out_refs)
        s_ref = refs.pop(0) if emit != "none" else None
        best_ref, idx_ref, cm_ref, cp_ref, comp_ref = refs
        h = hf_ref[:].astype(jnp.int32) + hb_ref[:].astype(jnp.int32)
        s = (
            jnp.transpose(h, (1, 0, 2))
            + vf_ref[:].astype(jnp.int32)
            + vb_ref[:].astype(jnp.int32)
        )
        D = s.shape[-1]
        d_iota = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        if d_valid < D:
            s = jnp.where(d_iota >= d_valid, _BIGI >> 8, s)
        if emit == "hwd":
            s_ref[:] = jnp.minimum(s, 30000).astype(jnp.int16)
        elif emit == "dhw":
            s_ref[:] = jnp.transpose(jnp.minimum(s, 30000), (2, 0, 1)).astype(jnp.int16)
        key = jnp.minimum(s, (1 << 30) // dp - 1) * dp + d_iota
        kmin = jnp.min(key, axis=-1)
        best = kmin // dp
        idx = kmin % dp
        cm = jnp.min(jnp.where(d_iota == idx[..., None] - 1, s, _BIGI), axis=-1)
        cp = jnp.min(jnp.where(d_iota == idx[..., None] + 1, s, _BIGI), axis=-1)
        comp = jnp.min(
            jnp.where(jnp.abs(d_iota - idx[..., None]) > 1, s, _BIGI), axis=-1
        )
        best_ref[:] = best.astype(jnp.float32)
        idx_ref[:] = idx
        cm_ref[:] = cm.astype(jnp.float32)
        cp_ref[:] = cp.astype(jnp.float32)
        comp_ref[:] = comp.astype(jnp.float32)

    @jax.jit
    def run(hf_t, hb_t, vf, vb):
        Wd, Hd, D = hf_t.shape
        dp = 1
        while dp < D:
            dp *= 2
        nh = pl.cdiv(Hd, block_h)
        nw = pl.cdiv(Wd, block_w)
        spec_h = pl.BlockSpec((block_w, block_h, D), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM)
        spec_v = pl.BlockSpec((block_h, block_w, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
        spec2 = pl.BlockSpec((block_h, block_w), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        f32 = jax.ShapeDtypeStruct((Hd, Wd), jnp.float32)
        i32 = jax.ShapeDtypeStruct((Hd, Wd), jnp.int32)
        out_specs, out_shape = [], []
        if emit == "hwd":
            out_specs.append(spec_v)
            out_shape.append(jax.ShapeDtypeStruct((Hd, Wd, D), jnp.int16))
        elif emit == "dhw":
            out_specs.append(
                pl.BlockSpec((D, block_h, block_w), lambda i, j: (0, i, j), memory_space=pltpu.VMEM)
            )
            out_shape.append(jax.ShapeDtypeStruct((D, Hd, Wd), jnp.int16))
        out_specs += [spec2] * 5
        out_shape += [f32, i32, f32, f32, f32]
        return pl.pallas_call(
            functools.partial(kernel, dp=dp),
            grid=(nh, nw),
            in_specs=[spec_h, spec_h, spec_v, spec_v],
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            interpret=interpret,
        )(hf_t, hb_t, vf, vb)

    return run


def main():
    import jax
    import jax.numpy as jnp

    from stereovision_tpu.ops import sgm_pallas

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    ds = [int(a) for a in sys.argv[1:]] or [128, 384]
    for D in ds:
        hf_t = jnp.asarray(rng.integers(0, 120, size=(W, H, D)).astype(np.int8))
        hb_t = jnp.asarray(rng.integers(0, 120, size=(W, H, D)).astype(np.int8))
        vf = jnp.asarray(rng.integers(0, 120, size=(H, W, D)).astype(np.int8))
        vb = jnp.asarray(rng.integers(0, 120, size=(H, W, D)).astype(np.int8))
        d_valid = D - 64 if D > 128 else D

        @jax.jit
        def cur(hf_t, hb_t, vf, vb):
            hsum = jnp.transpose(hf_t.astype(jnp.int16) + hb_t.astype(jnp.int16), (1, 0, 2))
            return sgm_pallas.sum_wta((hsum, vf, vb), d_valid=d_valid, emit_transposed=True)

        @jax.jit
        def cur_nolr(hf_t, hb_t, vf, vb):
            hsum = jnp.transpose(hf_t.astype(jnp.int16) + hb_t.astype(jnp.int16), (1, 0, 2))
            return sgm_pallas.sum_wta((hsum, vf, vb), d_valid=d_valid, emit_transposed=False)[1:]

        @jax.jit
        def st_first(hf_t, hb_t, vf, vb):
            st = jnp.transpose(hf_t.astype(jnp.int32) + hb_t.astype(jnp.int32), (2, 1, 0)) + jnp.transpose(
                vf.astype(jnp.int32) + vb.astype(jnp.int32), (2, 0, 1)
            )
            d_iota = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
            if d_valid < D:
                st = jnp.where(d_iota >= d_valid, _BIGI >> 8, st)
            st16 = jnp.minimum(st, 30000).astype(jnp.int16)
            s = st16.astype(jnp.int32)
            dp = 1
            while dp < D:
                dp *= 2
            key = jnp.minimum(s, (1 << 30) // dp - 1) * dp + d_iota
            kmin = jnp.min(key, axis=0)
            best = kmin // dp
            idx = kmin % dp
            cm = jnp.min(jnp.where(d_iota == idx[None] - 1, s, _BIGI), axis=0)
            cp = jnp.min(jnp.where(d_iota == idx[None] + 1, s, _BIGI), axis=0)
            comp = jnp.min(jnp.where(jnp.abs(d_iota - idx[None]) > 1, s, _BIGI), axis=0)
            return (
                st16,
                best.astype(jnp.float32),
                idx,
                cm.astype(jnp.float32),
                cp.astype(jnp.float32),
                comp.astype(jnp.float32),
            )

        pallas_hwd = make_pallas(d_valid, emit="hwd")
        pallas_dhw = make_pallas(d_valid, emit="dhw")
        pallas_none = make_pallas(d_valid, emit="none")

        @jax.jit
        def pallas_full(hf_t, hb_t, vf, vb):
            s, best, idx, cm, cp, comp = pallas_hwd(hf_t, hb_t, vf, vb)
            st = jnp.transpose(s, (2, 0, 1))
            return st, best, idx, cm, cp, comp

        # correctness vs cur
        ref = cur(hf_t, hb_t, vf, vb)
        for name, fn in (
            ("st_first", st_first),
            ("pallas_full", pallas_full),
            ("pallas_dhw", pallas_dhw),
        ):
            try:
                got = fn(hf_t, hb_t, vf, vb)
                ok = all(
                    bool(jnp.all(a == b)) for a, b in zip(ref, got)
                )
                print(f"D={D} {name}: match={ok}")
            except Exception as e:  # noqa: BLE001
                print(f"D={D} {name}: FAIL {str(e)[:120]}")

        for name, fn in (
            ("cur", cur),
            ("st_first", st_first),
            ("pallas_full", pallas_full),
            ("pallas_dhw", pallas_dhw),
            ("cur_nolr", cur_nolr),
            ("pallas_none", pallas_none),
        ):
            try:
                ms = timeit(fn, hf_t, hb_t, vf, vb)
                print(f"D={D} {name:>12}: {ms:7.2f} ms")
            except Exception as e:  # noqa: BLE001
                print(f"D={D} {name:>12}: FAIL {str(e)[:120]}")

        # calibration: raw transposes
        s16 = jnp.asarray(rng.integers(0, 30000, size=(H, W, D)).astype(np.int16))
        t_j = jax.jit(lambda s: jnp.transpose(s, (2, 0, 1)))
        print(f"D={D} transpose(H,W,D)->(D,H,W) i16: {timeit(t_j, s16):7.2f} ms")
        t2_j = jax.jit(lambda a, b: jnp.transpose(a.astype(jnp.int16) + b.astype(jnp.int16), (1, 0, 2)))
        print(f"D={D} add+batchT (W,H,D)->(H,W,D):  {timeit(t2_j, hf_t, hb_t):7.2f} ms")


if __name__ == "__main__":
    main()
