"""Per-stage TPU timing probe for the SGM pipeline (run on the real chip).

Times each stage of the hier pipeline at 720p/D=320 by building progressively
longer prefixes of the computation and differencing. Readback-forced timing
(see CLAUDE.md: block_until_ready is unreliable over the axon tunnel).

Usage: python scripts/profile_tpu.py [stage ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

H, W, D = 720, 1280, 320
N = int(os.environ.get("PROF_N", "10"))


def make_pair():
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, size=(H, W + 16)).astype(np.float32)
    try:
        import cv2

        base = cv2.GaussianBlur(base, (5, 5), 1.0)
    except Exception:
        pass
    return base[:, :W], base[:, 8 : 8 + W]


def timeit(fn, *args, n=N):
    import jax.numpy as jnp

    out = fn(*args)
    float(jnp.sum(jnp.asarray(out[0] if isinstance(out, (tuple, list)) else out).astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(jnp.asarray(out[0] if isinstance(out, (tuple, list)) else out).astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    from stereovision_tpu.core import image as im
    from stereovision_tpu.ops import sgm_pallas
    from stereovision_tpu.stereo import SGMParams, compute_disparity
    from stereovision_tpu.stereo.sgm import _cost_aggregate_pallas

    print("backend:", jax.default_backend(), jax.devices())
    lnp, rnp = make_pair()
    left = jnp.asarray(lnp)
    right = jnp.asarray(rnp)

    p = SGMParams(num_disparities=D, mode="hier")
    pf = SGMParams(num_disparities=D, mode="full")
    pp2 = SGMParams(num_disparities=D, mode="hier", refine_range=32, paths=2)

    stages = {}

    # full pipeline, both modes (hier_p2_total is the bench.py headline config)
    stages["hier_total"] = lambda: compute_disparity(left, right, p)
    stages["hier_p2_total"] = lambda: compute_disparity(left, right, pp2)
    stages["full_total"] = lambda: compute_disparity(left, right, pf)

    # stage prefixes at full res (D=320 full mode)
    census = jax.jit(
        lambda l, r: (
            sgm_pallas.census_words(l, 5, 5),
            sgm_pallas.census_words(r[:, ::-1], 5, 5, mirror=True),
        )
    )

    def cost_only(l, r):
        cl, crr = census(l, r)
        Dp = D + (-D) % 128
        return sgm_pallas.cost_volume_planes(cl, crr, W, Dp, d_valid=D, min_d=0, max_cost=24.0)

    cost_j = jax.jit(cost_only)

    def cost2_only(l, r):
        cl, crr = census(l, r)
        Dp = D + (-D) % 128
        return sgm_pallas.cost_volume_planes(
            cl, crr, W, Dp, d_valid=D, min_d=0, max_cost=24.0, transposed=1
        )

    cost2_j = jax.jit(cost2_only)
    stages_extra = {}
    stages_extra["cost2(+census)"] = lambda: cost2_j(left, right)

    def agg_only(l, r):
        c, ct = cost2_j(l, r)
        hf_t, hb_t = sgm_pallas.aggregate_dual(ct, 8.0, 96.0, axis=0, out_dtype=jnp.int8)
        vf, vb = sgm_pallas.aggregate_dual(c, 8.0, 96.0, axis=0, out_dtype=jnp.int8)
        return hf_t, hb_t, vf, vb

    agg_j = jax.jit(agg_only)

    def sumwta_only(l, r):
        hf_t, hb_t, vf, vb = agg_j(l, r)
        hsum = jnp.transpose(hf_t.astype(jnp.int16) + hb_t.astype(jnp.int16), (1, 0, 2))
        return sgm_pallas.sum_wta((hsum, vf, vb), d_valid=D, emit_transposed=True)

    sw_j = jax.jit(sumwta_only)

    stages["census"] = lambda: census(left, right)
    stages["cost(+census)"] = lambda: cost_j(left, right)
    stages.update(stages_extra)
    stages["agg(+cost)"] = lambda: agg_j(left, right)
    stages["sumwta(+agg)"] = lambda: sw_j(left, right)

    # the hier coarse pass in isolation (quarter res, full range)
    lc = jnp.asarray(lnp[::4, ::4].copy())
    rc = jnp.asarray(rnp[::4, ::4].copy())
    pc = SGMParams(
        num_disparities=80, median_ksize=3, speckle_window_size=0, lr_max_diff=-1
    )
    stages["hier_coarse"] = lambda: compute_disparity(lc, rc, pc)

    # refine-range versions (hier inner pass at D=128)
    p128 = SGMParams(num_disparities=128, mode="full")
    stages["full_d128"] = lambda: compute_disparity(left, right, p128)
    p128nolr = SGMParams(num_disparities=128, mode="full", lr_max_diff=-1)
    stages["full_d128_nolr"] = lambda: compute_disparity(left, right, p128nolr)

    # post-processing pieces in isolation (D=128 refine-shape)
    def sumwta_nt(l, r):
        hf_t, hb_t, vf, vb = agg_j(l, r)
        hsum = jnp.transpose(hf_t.astype(jnp.int16) + hb_t.astype(jnp.int16), (1, 0, 2))
        return sgm_pallas.sum_wta((hsum, vf, vb), d_valid=D, emit_transposed=False)[1:]

    swnt_j = jax.jit(sumwta_nt)
    stages["sumwta_nt(+agg)"] = lambda: swnt_j(left, right)

    s_t128 = jnp.asarray(
        np.random.default_rng(1).integers(0, 400, size=(128, H, W)).astype(np.int16)
    )
    rd_j = jax.jit(
        lambda s: sgm_pallas.right_disparity(s, 128, pre_transposed=True)
    )
    stages["rdisp_d128"] = lambda: rd_j(s_t128)

    disp0 = jnp.asarray(np.random.default_rng(2).uniform(0, 128, (H, W)).astype(np.float32))
    med_j = jax.jit(lambda d: im.median_blur(d, 5))
    stages["median5"] = lambda: med_j(disp0)

    from stereovision_tpu.stereo.sgm import _speckle_suppress

    val0 = disp0 > 3
    spk_j = jax.jit(lambda d, v: _speckle_suppress(d, v, p128))
    stages["speckle"] = lambda: spk_j(disp0, val0)

    sg_j = jax.jit(
        lambda d: sgm_pallas.shift_gather(d, jnp.clip(d.astype(jnp.int32), 0, None), 129)
    )
    stages["shift_gather"] = lambda: sg_j(disp0)

    # ---- lane-packed refine stages (the hier production shapes) ----
    census_pk_j = jax.jit(
        lambda l, r: (
            sgm_pallas.census_words(l, 5, 5),
            sgm_pallas.census_words(r[:, ::-1], 5, 5, mirror=True),
        )
    )
    stages["pk_census"] = lambda: census_pk_j(left, right)

    def add_pack_stages(pk):
        Dp = 128
        dg = Dp // pk
        # strip height must be a cost-block multiple (the production core
        # replicate-pads the image rows the same way)
        Hh = -(-(-(-H // pk)) // 8) * 8
        pad = pk * Hh - H

        def cost_pk(l, r):
            if pad:
                l = jnp.concatenate([l, jnp.repeat(l[-1:], pad, axis=0)], axis=0)
                r = jnp.concatenate([r, jnp.repeat(r[-1:], pad, axis=0)], axis=0)
            cl, crr = census_pk_j(l, r)
            return sgm_pallas.cost_volume_planes(
                cl, crr, W, Dp, d_valid=dg, min_d=0, max_cost=24.0,
                transposed=1, pack=pk,
            )

        cost_pk_j = jax.jit(cost_pk)

        def agg_pk(l, r):
            c, ct = cost_pk_j(l, r)
            hf_t, hb_t = sgm_pallas.aggregate_dual(
                ct, 8.0, 96.0, axis=0, out_dtype=jnp.int8, groups=pk
            )
            vf, vb = sgm_pallas.aggregate_dual(
                c, 8.0, 96.0, axis=0, out_dtype=jnp.int8, groups=pk
            )
            return hf_t, hb_t, vf, vb

        agg_pk_j = jax.jit(agg_pk)

        def sumwta_pk(l, r):
            vols = agg_pk_j(l, r)
            return sgm_pallas.sum_wta(vols, d_valid=dg, groups=pk, emit_transposed=True)

        sumwta_pk_j = jax.jit(sumwta_pk)

        def rdisp_pk(l, r):
            s_t = sumwta_pk_j(l, r)[0]
            return jnp.concatenate(
                [
                    sgm_pallas.right_disparity(
                        s_t, dg, pre_transposed=True, plane_offset=g * dg
                    )
                    for g in range(pk)
                ],
                axis=0,
            )

        rdisp_pk_j = jax.jit(rdisp_pk)
        tag = f"pk{pk}"
        stages[f"{tag}_cost(+c)"] = lambda: cost_pk_j(left, right)
        stages[f"{tag}_agg(+c)"] = lambda: agg_pk_j(left, right)
        stages[f"{tag}_sumwta(+a)"] = lambda: sumwta_pk_j(left, right)
        stages[f"{tag}_rdisp(+s)"] = lambda: rdisp_pk_j(left, right)

    add_pack_stages(2)
    add_pack_stages(4)

    sel = sys.argv[1:] or list(stages)
    for name in sel:
        ms = timeit(stages[name])
        print(f"{name:>18}: {ms:7.2f} ms")


if __name__ == "__main__":
    main()
