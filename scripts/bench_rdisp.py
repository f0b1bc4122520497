"""Micro-bench: right-disparity extraction variants on the real TPU.

The LR check needs dR(u) = argmin_{d<d_valid} S[y, u+d, d].

  cur   — materialize s_t (D,H,W) int16 (XLA transpose) + rdisp Pallas kernel
  shear — Pallas log-shear kernel directly on s (H,W,D) int16: stitch two
          W-blocks, shear sublanes by the lane index in log2(D) select-rolls,
          lane-argmin. No (D,H,W) volume ever exists.

Also times the producing XLA pass (sum+stats) emitting s (H,W,D) vs s_t.

Usage: python scripts/bench_rdisp.py [D]   (default 128)
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

H, W = 720, 1280
N = int(os.environ.get("PROF_N", "30"))


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


def make_shear(d_valid, block_h=8, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, out_ref, *, bw, w, dp):
        # stitch this W-block and the next into (BH, 2BW, D) f32
        D = a_ref.shape[-1]
        bh = a_ref.shape[0]
        strip = jnp.concatenate(
            [a_ref[:].astype(jnp.float32), b_ref[:].astype(jnp.float32)], axis=1
        )
        j = pl.program_id(1)
        # shear: strip[:, u, d] <- strip[:, u + d, d] via log2(D) select-rolls
        sh = 1
        d_iota3 = jax.lax.broadcasted_iota(jnp.int32, strip.shape, 2)
        while sh < D:
            rolled = jnp.concatenate([strip[:, sh:, :], strip[:, :sh, :]], axis=1)
            strip = jnp.where((d_iota3 & sh) != 0, rolled, strip)
            sh *= 2
        # validity: global column u0+u+d must be < w; d < d_valid
        u_iota = jax.lax.broadcasted_iota(jnp.int32, strip.shape, 1)
        gcol = j * bw + u_iota + d_iota3
        valid = (gcol < w) & (d_iota3 < d_valid)
        key = jnp.where(valid, strip.astype(jnp.int32) * dp + d_iota3, 1 << 30)
        idx = jnp.min(key, axis=-1) % dp
        out_ref[:] = jax.lax.slice_in_dim(idx, 0, bw, axis=1)

    @jax.jit
    def run(s):
        Hd, Wd, D = s.shape
        dp = 1
        while dp < D:
            dp *= 2
        bw = max(D, 128)
        nwb = pl.cdiv(Wd, bw)
        # pad W so block j+1 always exists
        Wp = (nwb + 1) * bw
        s = jnp.pad(s, ((0, 0), (0, Wp - Wd), (0, 0)), constant_values=30000)
        nh = pl.cdiv(Hd, block_h)
        spec = lambda m: pl.BlockSpec((block_h, bw, D), m, memory_space=pltpu.VMEM)  # noqa: E731
        return pl.pallas_call(
            functools.partial(kernel, bw=bw, w=Wd, dp=dp),
            grid=(nh, nwb),
            in_specs=[spec(lambda i, j: (i, j, 0)), spec(lambda i, j: (i, j + 1, 0))],
            out_specs=pl.BlockSpec((block_h, bw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Hd, Wp), jnp.int32),
            interpret=interpret,
        )(s, s)[:, :Wd]

    return run


def main():
    import jax
    import jax.numpy as jnp

    from stereovision_tpu.ops import sgm_pallas

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    D = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    d_valid = D
    s16 = jnp.asarray(rng.integers(0, 480, size=(H, W, D)).astype(np.int16))

    @jax.jit
    def cur(s):
        st = jnp.transpose(s, (2, 0, 1))
        return sgm_pallas.right_disparity(st, d_valid, pre_transposed=True)

    shear = make_shear(d_valid)

    ref = np.asarray(cur(s16))
    got = np.asarray(shear(s16))
    print("match:", bool((ref == got).all()))
    if not (ref == got).all():
        bad = np.argwhere(ref != got)
        print("mismatches:", len(bad), bad[:5], ref[tuple(bad[0])], got[tuple(bad[0])])

    print(f"cur (transpose+rdisp): {timeit(cur, s16):7.2f} ms")
    print(f"shear:                 {timeit(shear, s16):7.2f} ms")

    # rdisp alone on pre-transposed input
    st = jnp.transpose(s16, (2, 0, 1)).block_until_ready()
    rd = jax.jit(lambda s: sgm_pallas.right_disparity(s, d_valid, pre_transposed=True))
    print(f"rdisp alone:           {timeit(rd, st):7.2f} ms")


if __name__ == "__main__":
    main()
