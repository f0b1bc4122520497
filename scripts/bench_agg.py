"""Micro-bench for aggregate_dual variants on the real TPU.

Usage: python scripts/bench_agg.py [D ...]   (default: 128 384)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

H, W = 720, 1280
N = int(os.environ.get("PROF_N", "40"))


def main():
    import jax
    import jax.numpy as jnp

    from stereovision_tpu.ops import sgm_pallas

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    ds = [int(a) for a in sys.argv[1:]] or [128, 384]
    for D in ds:
        cost = jnp.asarray(rng.integers(0, 25, size=(H, W, D)).astype(np.int8))
        for axis in (0, 1):
            for dt, dtn in ((jnp.int8, "i8"), (jnp.int16, "i16")):
                for bs in (8, 16, 32):
                    fn = jax.jit(
                        lambda c, axis=axis, dt=dt, bs=bs: sgm_pallas.aggregate_dual(
                            c, 8.0, 96.0, axis=axis, block_s=bs, out_dtype=dt
                        )
                    )
                    try:
                        lf, lb = fn(cost)
                        float(jnp.sum(lf.astype(jnp.float32)[::97, ::97]))
                        t0 = time.perf_counter()
                        for _ in range(N):
                            lf, lb = fn(cost)
                        float(jnp.sum(lf.astype(jnp.float32)[::97, ::97]))
                        ms = (time.perf_counter() - t0) / N * 1e3
                        print(f"D={D} axis={axis} {dtn:>3} bs={bs:>2}: {ms:7.2f} ms")
                    except Exception as e:  # noqa: BLE001
                        print(f"D={D} axis={axis} {dtn:>3} bs={bs:>2}: FAIL {str(e)[:80]}")


def sweep_block_x():
    import jax
    import jax.numpy as jnp

    from stereovision_tpu.ops import sgm_pallas

    rng = np.random.default_rng(0)
    for D, X in ((128, 1280), (384, 1280)):
        cost = jnp.asarray(rng.integers(0, 25, size=(H, W, D)).astype(np.int8))
        for bx in (128, 184, 256, 320, 432, 512, 640):
            for bs in (8, 16):
                fn = jax.jit(
                    lambda c, bx=bx, bs=bs: sgm_pallas.aggregate_dual(
                        c, 8.0, 96.0, axis=0, block_s=bs, block_x=bx, out_dtype=jnp.int8
                    )
                )
                try:
                    lf, lb = fn(cost)
                    float(jnp.sum(lf.astype(jnp.float32)[::97, ::97]))
                    t0 = time.perf_counter()
                    for _ in range(N):
                        lf, lb = fn(cost)
                    float(jnp.sum(lf.astype(jnp.float32)[::97, ::97]))
                    ms = (time.perf_counter() - t0) / N * 1e3
                    print(f"D={D} bx={bx:>3} bs={bs:>2}: {ms:7.2f} ms")
                except Exception as e:  # noqa: BLE001
                    print(f"D={D} bx={bx:>3} bs={bs:>2}: FAIL {str(e)[:60]}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        sweep_block_x()
    else:
        main()
