"""Bisect estimate_depth's 190+ ms on-chip cost into its component ops."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from stereovision_tpu.core import image as im
    from stereovision_tpu.mono.nn import create_model

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.uniform(0, 255, (422, 633, 3)).astype(np.float32))
    small = jnp.asarray(rng.uniform(0, 1, (256, 256, 3)).astype(np.float32))
    pred = jnp.asarray(rng.uniform(0, 1, (256, 256)).astype(np.float32))
    gray = jnp.asarray(rng.uniform(0, 255, (422, 633)).astype(np.float32))

    def timeit(name, f, *a, n=20):
        g = jax.jit(f)
        out = g(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n):
            out = g(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms")

    timeit("bgr2rgb+scale", lambda f: f[..., ::-1] / 255.0, frame)
    timeit("resize_down_422x633x3->256", lambda f: im.resize(f, (256, 256)), frame)
    timeit("resize_up_256->422x633", lambda p: im.resize(p, (422, 633)), pred)
    timeit("minmax", lambda p: im.minmax_normalize(p, 0.0, 255.0), pred)
    timeit("grayscale", im.grayscale_bgr, frame)
    timeit("gauss5_422x633", lambda g_: im.gaussian_blur(g_, 5), gray)
    timeit("minmax_conf", lambda g_: im.minmax_normalize(jnp.abs(g_ - im.gaussian_blur(g_, 5)), 0.0, 1.0), gray)

    model, variables = create_model()
    timeit("forward", lambda s: model.apply(variables, s[None])[0], small)

    def full(f):
        fr = f.astype(jnp.float32)
        rgb = fr[..., ::-1] / 255.0
        H, W = fr.shape[0], fr.shape[1]
        sm = im.resize(rgb, (256, 256))
        pr = model.apply(variables, sm[None])[0]
        depth = im.resize(pr, (H, W))
        dn = im.minmax_normalize(depth, 0.0, 255.0)
        g = im.grayscale_bgr(fr)
        contrast = jnp.abs(g - im.gaussian_blur(g, 5))
        conf = im.minmax_normalize(contrast, 0.0, 1.0)
        return dn, conf

    timeit("full_one_jit", full, frame)


if __name__ == "__main__":
    main()
