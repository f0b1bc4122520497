"""On-chip profiling of the mono-depth NN forward + flow step (VERDICT r3 #3).

Times, on the real TPU, with a cache-resident matmul probe to normalize for
the shared host's ~6x load swings (CLAUDE.md):
- MidasSmall forward, f32 vs bf16-cast params, batch 1 and 4
- encoder-only vs full (where does the time go)
- dense-conv variant of the depthwise stages (is the depthwise lowering the
  problem, or small-channel utilization in general)
- MidasV21Small (the exact 21M-param architecture), f32 vs bf16
- estimate_depth end-to-end at the fused pipeline's 0.33-scale frame size
- flow_depth_step

Usage: python scripts/profile_nn.py [keys...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N = int(os.environ.get("PROF_N", "20"))


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from stereovision_tpu.models.midas import MidasSmall

    print("backend:", jax.default_backend())
    only = set(sys.argv[1:])

    def want(key):
        return not only or any(key.startswith(o) for o in only)

    def timeit(fn, *args, n=N):
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        return (time.perf_counter() - t0) / n * 1e3

    mm_w = jnp.ones((2048, 2048), jnp.bfloat16)

    @jax.jit
    def f_mm(a):
        for _ in range(50):
            a = a @ mm_w
        return a

    def probe():
        return timeit(f_mm, mm_w, n=3)

    print(f"mm50_2048 probe: {probe():.2f} ms  (quiet ~8)")

    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(0, 1, (1, 256, 256, 3)).astype(np.float32))
    x4 = jnp.asarray(rng.uniform(0, 1, (4, 256, 256, 3)).astype(np.float32))

    def bf16(tree):
        return jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16)
            if v.dtype == jnp.float32 else v, tree)

    results = {}

    def run(key, model, variables, x, dtype=None):
        if not want(key):
            return
        v, xx = (variables, x) if dtype is None else (bf16(variables), x.astype(dtype))
        f = jax.jit(lambda vv, a: model.apply(vv, a))
        results[key] = timeit(f, v, xx)
        print(f"{key}: {results[key]:.2f} ms")

    if want("small"):
        model = MidasSmall()
        variables = model.init(jax.random.PRNGKey(0), x1)
        run("small_f32_b1", model, variables, x1)
        run("small_bf16_b1", model, variables, x1, jnp.bfloat16)
        run("small_bf16_b4", model, variables, x4, jnp.bfloat16)
        run("small_f32_b4", model, variables, x4)

    if want("enc"):
        class Encoder(MidasSmall):
            @nn.compact
            def __call__(self, x):
                from stereovision_tpu.models.midas import MBConv
                c = self.encoder_chs
                h = nn.Conv(32, (3, 3), strides=2, padding="SAME", use_bias=False)(x)
                h = nn.BatchNorm(use_running_average=True)(h)
                h = nn.relu6(h)
                h = MBConv(c[0], expand=1)(h)
                h = MBConv(c[1], stride=2)(h)
                h = MBConv(c[1])(h)
                h = MBConv(c[2], stride=2, kernel=5)(h)
                h = MBConv(c[2], kernel=5)(h)
                h = MBConv(c[3], stride=2)(h)
                h = MBConv(c[3])(h)
                h = MBConv(c[3])(h)
                h = MBConv(c[4], stride=2, kernel=5)(h)
                h = MBConv(c[4], kernel=5)(h)
                return h

        enc = Encoder()
        ev = enc.init(jax.random.PRNGKey(0), x1)
        run("enc_f32_b1", enc, ev, x1)
        run("enc_bf16_b1", enc, ev, x1, jnp.bfloat16)

    if want("dense"):
        class MBConvDense(nn.Module):
            out_ch: int
            expand: int = 6
            stride: int = 1
            kernel: int = 3

            @nn.compact
            def __call__(self, x):
                in_ch = x.shape[-1]
                h = x
                if self.expand != 1:
                    h = nn.Conv(in_ch * self.expand, (1, 1), use_bias=False)(h)
                    h = nn.BatchNorm(use_running_average=True)(h)
                    h = nn.relu6(h)
                h = nn.Conv(h.shape[-1], (self.kernel, self.kernel),
                            strides=self.stride, padding="SAME", use_bias=False)(h)
                h = nn.BatchNorm(use_running_average=True)(h)
                h = nn.relu6(h)
                h = nn.Conv(self.out_ch, (1, 1), use_bias=False)(h)
                h = nn.BatchNorm(use_running_average=True)(h)
                if self.stride == 1 and in_ch == self.out_ch:
                    h = h + x
                return h

        class EncoderDense(nn.Module):
            encoder_chs: tuple = (16, 24, 40, 96, 192)

            @nn.compact
            def __call__(self, x):
                c = self.encoder_chs
                h = nn.Conv(32, (3, 3), strides=2, padding="SAME", use_bias=False)(x)
                h = nn.BatchNorm(use_running_average=True)(h)
                h = nn.relu6(h)
                h = MBConvDense(c[0], expand=1)(h)
                h = MBConvDense(c[1], stride=2)(h)
                h = MBConvDense(c[1])(h)
                h = MBConvDense(c[2], stride=2, kernel=5)(h)
                h = MBConvDense(c[2], kernel=5)(h)
                h = MBConvDense(c[3], stride=2)(h)
                h = MBConvDense(c[3])(h)
                h = MBConvDense(c[3])(h)
                h = MBConvDense(c[4], stride=2, kernel=5)(h)
                h = MBConvDense(c[4], kernel=5)(h)
                return h

        encd = EncoderDense()
        edv = encd.init(jax.random.PRNGKey(0), x1)
        run("encdense_f32_b1", encd, edv, x1)
        run("encdense_bf16_b1", encd, edv, x1, jnp.bfloat16)

    if want("v21"):
        from stereovision_tpu.models.midas_v21 import create_v21

        m21, v21 = create_v21()
        run("v21_f32_b1", m21, v21, x1)
        run("v21_bf16_b1", m21, v21, x1, jnp.bfloat16)

    if want("e2e"):
        from stereovision_tpu.mono.nn import create_model, estimate_depth

        model, variables = create_model()
        frame = jnp.asarray(
            rng.uniform(0, 255, (422, 633, 3)).astype(np.float32))
        results["estimate_depth_422x633"] = timeit(
            lambda f: estimate_depth(model, variables, f), frame)
        print(f"estimate_depth_422x633: {results['estimate_depth_422x633']:.2f} ms")

    if want("flow"):
        from stereovision_tpu.mono import (FlowDepthParams, flow_depth_init,
                                           flow_depth_step)

        fp = FlowDepthParams()
        st = flow_depth_init((422, 633))
        img = jnp.asarray(rng.uniform(0, 255, (422, 633)).astype(np.float32))

        def flow_once(s, t):
            s2, fd, has, mv = flow_depth_step(s, img, t, fp)
            return fd

        results["flow_422x633"] = timeit(flow_once, st, jnp.float32(0.1))
        print(f"flow_422x633: {results['flow_422x633']:.2f} ms")

    print(f"mm50_2048 probe (end): {probe():.2f} ms")


if __name__ == "__main__":
    main()
