"""Chained (dispatch-amortized) probe of production's arbitration + fill
internals at 720p — the two stages VERDICT r4 flagged as unprofiled
(~1.2 ms censuses + ~0.7 ms fill in the frame budget). Probes:

- census1     : census_words of ONE 720p image (the merge's cr_arb cost)
- cd2         : _census_distance_multi over 2 candidates (merge arbitration)
- cd3         : _census_distance_multi over 3 candidates (fill evidence)
- scans_xla   : the 4-direction _last_valid_scan lo/hi composition (old fill)
- scans_pallas: nearest_valid_lohi h+v (fused Pallas fill scans)
- lohi_h      : the horizontal kernel alone (isolates the transpose cost)
- median5     : im.median_blur(…, 5) on the filled map
- fill_full   : _census_fill end-to-end (pallas impl, current code)

Each probe chains K invocations inside one jit program (a single dispatch
costs ~1.7 ms over the axon tunnel and would swamp sub-ms stages); a
cache-resident matmul rides along as the load yardstick.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

H, W = 720, 1280
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
    from stereovision_tpu.ops import sgm_pallas as sp
    from stereovision_tpu.stereo import production_preset
    from stereovision_tpu.stereo.sgm import (_census_distance_multi,
                                             _census_fill, _last_valid_scan)

    p = production_preset()
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (H, W + 16)).astype(np.float32)
    left = jnp.asarray(base[:, :W])
    right = jnp.asarray(base[:, 8:8 + W])
    # piecewise-smooth disparity + speckled invalids (realistic fill load)
    yy, xx = np.mgrid[0:H, 0:W]
    disp_np = (60 + 40 * np.sin(yy / 97.0) + 30 * np.cos(xx / 131.0)).astype(
        np.float32)
    valid_np = rng.uniform(size=(H, W)) > 0.08
    valid_np[:, 300:340] = False  # an occlusion band
    disp = jnp.asarray(np.where(valid_np, disp_np, -1.0))
    valid = jnp.asarray(valid_np)
    d_up = jnp.asarray(disp_np)
    cl = sp.census_words(left, p.census_ksize, p.census_wsize)
    cr = sp.census_words(right, p.census_ksize, p.census_wsize)
    mm_w = jnp.ones((2048, 2048), jnp.bfloat16)

    def chain(fn):
        """fn(disp) -> f32 map(s); serialize K calls by folding a scalar of
        the output back into the disp input."""

        @jax.jit
        def run(d):
            out = None
            for _ in range(K):
                out = fn(d)
                leaf = out[0] if isinstance(out, tuple) else out
                d = d + 0.0 * leaf.reshape(-1)[0]
            return d, out

        return run

    def scans_xla(d):
        lo = hi = None
        for axis in (0, 1):
            for reverse in (False, True):
                val, has, _ = _last_valid_scan(d, valid, axis, reverse)
                val = jnp.where(has, val, d_up)
                lo = val if lo is None else jnp.minimum(lo, val)
                hi = val if hi is None else jnp.maximum(hi, val)
        return lo, hi

    def scans_pallas(d):
        lo, hi = sp.nearest_valid_lohi(d, valid, d_up)
        lo_v, hi_v = sp.nearest_valid_lohi(d.T, valid.T, d_up.T)
        return jnp.minimum(lo, lo_v.T), jnp.maximum(hi, hi_v.T)

    def mm(a):
        for _ in range(50):
            a = a @ mm_w
        return a

    probes = {
        "mm50": (jax.jit(mm), (mm_w,), 1),
        "census1": (chain(
            lambda d: sp.census_words(left + 0.0 * d[0, 0], p.census_ksize,
                                      p.census_wsize).astype(jnp.float32)),
            (disp,), K),
        "cd2": (chain(
            lambda d: _census_distance_multi(cl, cr, [d, d + 1.0], p,
                                             "pallas")[0]), (disp,), K),
        "cd3": (chain(
            lambda d: _census_distance_multi(cl, cr, [d, d + 1.0, d_up], p,
                                             "pallas")[0]), (disp,), K),
        # fill-style masked candidates: offsets zeroed at valid pixels →
        # the gather's block skip prunes to the invalid pixels' blocks
        "cd3_masked": (chain(
            lambda d: _census_distance_multi(
                cl, cr, [jnp.where(valid, 0.0, x)
                         for x in (d, d + 1.0, d_up)], p, "pallas")[0]),
            (disp,), K),
        "scans_xla": (chain(scans_xla), (disp,), K),
        "scans_pallas": (chain(scans_pallas), (disp,), K),
        "lohi_h": (chain(
            lambda d: sp.nearest_valid_lohi(d, valid, d_up)[0]), (disp,), K),
        "median5": (chain(lambda d: im.median_blur(d, 5)), (disp,), K),
        "fill_full": (chain(
            lambda d: _census_fill(d, valid, d_up, cl, cr, p, "pallas")),
            (disp,), K),
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
        print(f"{n:13s} best={min(ts):7.3f} ms  vs_mm={min(ts) / base:5.2f}  "
              "runs=" + " ".join(f"{t:.3f}" for t in ts))


if __name__ == "__main__":
    main()
