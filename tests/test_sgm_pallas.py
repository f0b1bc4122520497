"""Pallas SGM kernels (interpreter mode) must match the XLA reference path."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from stereovision_tpu.stereo import SGMParams, compute_disparity
from stereovision_tpu.stereo.sgm import aggregate, census_cost_volume

RNG = np.random.default_rng(11)


def small_pair(h=40, w=72, shift=5):
    base = RNG.uniform(0, 255, size=(h, w + shift)).astype(np.float32)
    return base[:, :w], base[:, shift : shift + w]


class TestPallasParity:
    def test_aggregate_matches_xla(self):
        left, right = small_pair()
        p_x = SGMParams(num_disparities=16, impl="xla")
        p_p = dataclasses.replace(p_x, impl="pallas_interpret")
        cost = census_cost_volume(jnp.asarray(left), jnp.asarray(right), p_x)
        s_x = np.asarray(aggregate(cost, p_x))
        s_p = np.asarray(aggregate(cost, p_p))
        np.testing.assert_allclose(s_p, s_x, atol=1e-4)

    def test_full_pipeline_matches_xla(self):
        left, right = small_pair()
        p_x = SGMParams(num_disparities=16, impl="xla")
        p_p = dataclasses.replace(p_x, impl="pallas_interpret")
        dx, vx = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_x)
        dp, vp = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_p)
        np.testing.assert_allclose(np.asarray(dp), np.asarray(dx), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(vp), np.asarray(vx))

    def test_cost_volume_kernel_matches_xla(self):
        from stereovision_tpu.core import image as im
        from stereovision_tpu.ops import sgm_pallas

        left, right = small_pair(h=24, w=140)
        p = SGMParams(num_disparities=16, impl="xla")
        ref = np.asarray(census_cost_volume(jnp.asarray(left), jnp.asarray(right), p))
        cl = im.census_transform(jnp.asarray(left), p.census_ksize, p.census_wsize)
        cr = im.census_transform(jnp.asarray(right), p.census_ksize, p.census_wsize)
        n_bits = p.census_ksize * p.census_wsize - 1
        out = np.asarray(
            sgm_pallas.cost_volume(
                cl, cr, 128, d_valid=16, max_cost=float(n_bits), interpret=True
            )
        )
        np.testing.assert_allclose(out[:, :, :16], ref, atol=0)
        # pad lanes carry PAD_COST — above every real census cost
        assert np.all(out[:, :, 16:] > ref.max())

    def test_acc_chaining_matches_sum(self):
        from stereovision_tpu.ops import sgm_pallas

        cost = jnp.asarray(RNG.uniform(0, 24, size=(17, 33, 128)).astype(np.float32))
        a1 = sgm_pallas.aggregate_dir(cost, 8.0, 96.0, axis=1, interpret=True)
        a2 = sgm_pallas.aggregate_dir(cost, 8.0, 96.0, axis=0, interpret=True)
        chained = sgm_pallas.aggregate_dir(cost, 8.0, 96.0, axis=0, acc=a1, interpret=True)
        np.testing.assert_allclose(np.asarray(chained), np.asarray(a1 + a2), atol=1e-4)

    def test_axis1_matches_transposed_axis0(self):
        from stereovision_tpu.ops import sgm_pallas

        cost = jnp.asarray(RNG.uniform(0, 24, size=(17, 33, 128)).astype(np.float32))
        ax1 = sgm_pallas.aggregate_dir(cost, 8.0, 96.0, axis=1, interpret=True)
        ax0t = jnp.swapaxes(
            sgm_pallas.aggregate_dir(jnp.swapaxes(cost, 0, 1), 8.0, 96.0, axis=0, interpret=True),
            0, 1,
        )
        np.testing.assert_allclose(np.asarray(ax1), np.asarray(ax0t), atol=1e-4)

    def test_reverse_direction(self):
        """Reverse aggregation == flipping, aggregating forward, flipping back."""
        from stereovision_tpu.ops import sgm_pallas

        cost = jnp.asarray(RNG.uniform(0, 24, size=(23, 40, 128)).astype(np.float32))
        fwd_of_flipped = sgm_pallas.aggregate_dir(
            cost[::-1], 8.0, 96.0, interpret=True
        )[::-1]
        rev = sgm_pallas.aggregate_dir(cost, 8.0, 96.0, reverse=True, interpret=True)
        np.testing.assert_allclose(np.asarray(rev), np.asarray(fwd_of_flipped), atol=1e-4)


class TestBlockSelection:
    def test_dual_auto_block_x_mosaic_legal(self):
        """Regression: axis-0 auto tiles must be sublane-legal (×8 or full X).

        D=320 (pad 384) at 720p picked block_x=214 before the fix, which fails
        Mosaic lowering on hardware (interpret mode doesn't check it).
        """
        from stereovision_tpu.ops.sgm_pallas import _dual_auto_block_x

        for D in (128, 256, 384, 512, 640):
            for X in (64, 160, 320, 640, 719, 1280, 1283):
                for bs in (8, 16):
                    for dt in (jnp.int8, jnp.int16, jnp.float32):
                        bx = _dual_auto_block_x(0, X, D, bs, dt)
                        assert bx == X or bx % 8 == 0, (D, X, bs, dt, bx)
                        assert 0 < bx <= max(X, 8)

    def test_full_mode_d320_shapes_compile_interpret(self):
        """The exact tile geometry of full-search D=320 at 720p (scaled-down
        rows, real W and D) runs through the dual kernels."""
        from stereovision_tpu.ops import sgm_pallas

        cost = jnp.asarray(RNG.uniform(0, 24, size=(16, 1280, 384)).astype(np.float32))
        lf, lb = sgm_pallas.aggregate_dual(cost, 8.0, 96.0, axis=0, interpret=True)
        assert lf.shape == cost.shape and lb.shape == cost.shape


class TestCensusKernel:
    def test_census_words_matches_xla(self):
        from stereovision_tpu.core import image as im
        from stereovision_tpu.ops import sgm_pallas

        img = jnp.asarray(RNG.uniform(0, 255, size=(37, 150)).astype(np.float32))
        for k, w in ((5, 5), (7, 5), (3, 3)):
            ref = np.moveaxis(np.asarray(im.census_transform(img, k, w)), -1, 0)
            out = np.asarray(sgm_pallas.census_words(img, k, w, interpret=True))
            np.testing.assert_array_equal(out[:, :, :150], ref, err_msg=f"{k}x{w}")

    def test_census_words_mirror_is_flipped_census(self):
        from stereovision_tpu.core import image as im
        from stereovision_tpu.ops import sgm_pallas

        img = jnp.asarray(RNG.uniform(0, 255, size=(24, 140)).astype(np.float32))
        ref = np.moveaxis(np.asarray(im.census_transform(img, 5, 5))[:, ::-1, :], -1, 0)
        out = np.asarray(sgm_pallas.census_words(img[:, ::-1], 5, 5, mirror=True, interpret=True))
        np.testing.assert_array_equal(out[:, :, :140], ref)


class TestSpeckleKernel:
    def test_speckle_counts_matches_xla(self):
        from stereovision_tpu.core import image as im
        from stereovision_tpu.ops import sgm_pallas

        k, r, nbins = 15, 32.0, 6
        dv = RNG.uniform(-64, 160, size=(37, 150)).astype(np.float32)
        dv[dv < -50] = -2.0 * r
        dvj = jnp.asarray(dv)
        ref = jnp.zeros_like(dvj)
        for off in (0.0, 0.5):
            b = jnp.floor(dvj / r + off)
            c = jnp.zeros_like(dvj)
            for bi in range(nbins):
                ind = (b == bi).astype(jnp.float32)
                c = c + im.window_sum(ind, k) * ind
            ref = jnp.maximum(ref, c)
        out = sgm_pallas.speckle_counts(dvj, k, r, nbins, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestShiftGather:
    """out[y, x] = src[y, x − off] for every kernel variant (plain guarded,
    assume_clipped, and the pruned multi-block form with its data-dependent
    block skip), against a take_along_axis reference."""

    def _case(self, h=40, w=200, max_off=257):
        src = RNG.uniform(0, 99, size=(h, w)).astype(np.float32)
        x = np.arange(w)[None, :]
        off = np.minimum(RNG.integers(0, max_off, (h, w)), x).astype(np.int32)
        ref = np.take_along_axis(src, x - off, axis=1)
        return jnp.asarray(src), jnp.asarray(off), ref

    def test_matches_gather_all_variants(self):
        from stereovision_tpu.ops.sgm_pallas import shift_gather

        src, off, ref = self._case()
        for kw in (
            {},
            {"assume_clipped": True},
            {"assume_clipped": True, "block_s": 32},
            {"assume_clipped": True, "block_s": 64, "block_h": 8},
        ):
            out = np.asarray(shift_gather(src, off, 257, interpret=True, **kw))
            np.testing.assert_array_equal(out, ref)

    def test_smooth_offsets_hit_skip_path(self):
        """A smooth offset field (the warp's shape) leaves most roll blocks
        unvisited; outputs must still be exact."""
        from stereovision_tpu.ops.sgm_pallas import shift_gather

        h, w = 48, 300
        src = RNG.uniform(0, 99, size=(h, w)).astype(np.float32)
        x = np.arange(w)[None, :]
        off = np.clip(
            (120 + 60 * np.sin(np.arange(w) / 31.0)[None, :]).astype(np.int32),
            0, x,
        )
        off = np.broadcast_to(off, (h, w)).copy()
        ref = np.take_along_axis(src, x - off, axis=1)
        out = np.asarray(
            shift_gather(jnp.asarray(src), jnp.asarray(off), 289,
                         block_s=32, assume_clipped=True, interpret=True)
        )
        np.testing.assert_array_equal(out, ref)

    def test_out_of_range_offsets_zero(self):
        from stereovision_tpu.ops.sgm_pallas import shift_gather

        src = jnp.ones((8, 160), jnp.float32)
        off = jnp.full((8, 160), 500, jnp.int32)  # beyond max_offset
        out = np.asarray(shift_gather(src, off, 65, interpret=True))
        assert (out == 0).all()


class TestLanePacked:
    """pack=2: the image halves travel as two 64-lane disparity groups.

    Semantics contract: identical to solving each half independently at
    D ≤ 64 over a shared full-image census (vertical paths restart at the
    half seam). The XLA path implements exactly that, so parity here pins the
    packed kernels to the definition.
    """

    def _pair(self, h, w, shift=5):
        base = RNG.uniform(0, 255, size=(h, w + shift)).astype(np.float32)
        return base[:, :w], base[:, shift : shift + w]

    def test_packed_parity(self):
        left, right = self._pair(48, 120)
        p_x = SGMParams(num_disparities=16, pack=2, impl="xla")
        p_p = dataclasses.replace(p_x, impl="pallas_interpret")
        dx, vx = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_x)
        dp, vp = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_p)
        np.testing.assert_array_equal(np.asarray(dp), np.asarray(dx))
        np.testing.assert_array_equal(np.asarray(vp), np.asarray(vx))

    def test_packed_parity_odd_height_min_disparity(self):
        left, right = self._pair(37, 120, shift=9)
        p_x = SGMParams(min_disparity=4, num_disparities=16, pack=2, impl="xla")
        p_p = dataclasses.replace(p_x, impl="pallas_interpret")
        dx, vx = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_x)
        dp, vp = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_p)
        np.testing.assert_array_equal(np.asarray(dp), np.asarray(dx))
        np.testing.assert_array_equal(np.asarray(vp), np.asarray(vp))

    def test_packed4_parity(self):
        left, right = self._pair(48, 120)
        p_x = SGMParams(num_disparities=16, pack=4, impl="xla")
        p_p = dataclasses.replace(p_x, impl="pallas_interpret")
        dx, vx = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_x)
        dp, vp = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_p)
        np.testing.assert_array_equal(np.asarray(dp), np.asarray(dx))
        np.testing.assert_array_equal(np.asarray(vp), np.asarray(vx))

    def test_packed4_parity_odd_height_min_disparity(self):
        left, right = self._pair(41, 120, shift=9)
        p_x = SGMParams(min_disparity=4, num_disparities=32, pack=4, impl="xla")
        p_p = dataclasses.replace(p_x, impl="pallas_interpret")
        dx, vx = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_x)
        dp, vp = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_p)
        np.testing.assert_array_equal(np.asarray(dp), np.asarray(dx))
        np.testing.assert_array_equal(np.asarray(vp), np.asarray(vx))

    def test_paths2_parity_all_packs(self):
        """Horizontal-only aggregation (paths=2): Pallas matches the XLA
        two-scan definition bit-for-bit at every lane packing."""
        left, right = self._pair(48, 120, shift=7)
        for pack in (1, 2, 4):
            p_x = SGMParams(num_disparities=16, pack=pack, paths=2, impl="xla")
            p_p = dataclasses.replace(p_x, impl="pallas_interpret")
            dx, vx = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_x)
            dp, vp = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_p)
            np.testing.assert_array_equal(np.asarray(dp), np.asarray(dx))
            np.testing.assert_array_equal(np.asarray(vp), np.asarray(vx))

    def test_packed_matches_manual_halves(self):
        """The packed result equals per-half solves over a full-image census."""
        from stereovision_tpu.core import image as im
        from stereovision_tpu.stereo.sgm import (
            _left_right_check, _wta, aggregate, cost_from_census,
        )

        left, right = self._pair(48, 120)
        p = SGMParams(num_disparities=16, impl="xla")
        lj, rj = jnp.asarray(left), jnp.asarray(right)
        cl = im.census_transform(lj, p.census_ksize, p.census_wsize)
        cr = im.census_transform(rj, p.census_ksize, p.census_wsize)
        halves = []
        for sl in (slice(0, 24), slice(24, 48)):
            agg = aggregate(cost_from_census(cl[sl], cr[sl], p), p)
            d_g, v_g, _ = _wta(agg, p)
            v_g = v_g & _left_right_check(agg, d_g, p)
            halves.append((d_g, v_g))
        from stereovision_tpu.stereo.sgm import _speckle_suppress

        disp = jnp.concatenate([halves[0][0], halves[1][0]], axis=0)
        valid = jnp.concatenate([halves[0][1], halves[1][1]], axis=0)
        valid = _speckle_suppress(disp, valid, p)
        disp = im.median_blur(disp, p.median_ksize)
        disp = jnp.where(valid, disp, float(p.min_disparity) - 1.0)

        pk = dataclasses.replace(p, pack=2, impl="pallas_interpret")
        dp_, vp_ = compute_disparity(lj, rj, pk)
        np.testing.assert_array_equal(np.asarray(dp_), np.asarray(disp))
        np.testing.assert_array_equal(np.asarray(vp_), np.asarray(valid))

    def test_hier_packed_refine_quality(self):
        """hier with a 64-window packed refine recovers a slanted surface to
        the same tolerance as the full search (the production 720p shape)."""
        import cv2

        h, w = 144, 256
        gt = 8 + 56 * np.arange(w, dtype=np.float32) / w  # 8..64 px across
        base = cv2.GaussianBlur(
            RNG.uniform(0, 255, size=(h, w + 80)).astype(np.float32), (5, 5), 1.0
        )
        right = base[:, 80 : 80 + w].copy()
        # left pixel x matches right pixel x − gt(x): sample base at 80+x−gt
        left = np.empty((h, w), np.float32)
        for c in range(w):
            src = 80 + c - gt[c]
            i0 = int(np.floor(src))
            f = src - i0
            left[:, c] = (1 - f) * base[:, i0] + f * base[:, i0 + 1]
        p = SGMParams(num_disparities=96, mode="hier", coarse_scale=2, refine_range=64)
        d, v = compute_disparity(jnp.asarray(left), jnp.asarray(right), p)
        d, v = np.asarray(d), np.asarray(v)
        # full-search reference on the same pair
        df, vf = compute_disparity(
            jnp.asarray(left), jnp.asarray(right), SGMParams(num_disparities=96)
        )
        df, vf = np.asarray(df), np.asarray(vf)
        inner = np.s_[10:-10, 80:-10]
        vi = v[inner]
        assert vi.mean() > 0.7, vi.mean()
        err = np.abs(d[inner] - gt[None, 80:-10])[vi]
        err_f = np.abs(df[inner] - gt[None, 80:-10])[vf[inner]]
        assert np.median(err) < max(0.6, 1.3 * np.median(err_f)), (
            np.median(err), np.median(err_f))
        # the pack=4 refine (refine_range 32, the bench headline config) must
        # recover the same slanted surface to the same tolerance
        p32 = dataclasses.replace(p, refine_range=32)
        d32, v32 = compute_disparity(jnp.asarray(left), jnp.asarray(right), p32)
        d32, v32 = np.asarray(d32), np.asarray(v32)
        vi32 = v32[inner]
        assert vi32.mean() > 0.7, vi32.mean()
        err32 = np.abs(d32[inner] - gt[None, 80:-10])[vi32]
        assert np.median(err32) < max(0.6, 1.3 * np.median(err_f)), (
            np.median(err32), np.median(err_f))


class TestWtaStatsFromDuals:
    def test_matches_sum_wta_statistics(self):
        """The one-pass lane-reduction stats kernel must reproduce sum_wta's
        statistics bit-for-bit for every group count (and st_from_duals must
        reproduce its s_t)."""
        import jax.numpy as jnp
        import numpy as np

        from stereovision_tpu.ops import sgm_pallas

        rng = np.random.default_rng(13)
        W, H, D = 96, 256, 128  # H >= 128: the hardware block constraint
        hf = jnp.asarray(rng.integers(0, 120, (W, H, D)).astype(np.int8))
        hb = jnp.asarray(rng.integers(0, 120, (W, H, D)).astype(np.int8))
        for groups, d_valid in ((1, 100), (2, 64), (4, 30)):
            want = sgm_pallas.sum_wta(
                (hf, hb), d_valid=d_valid, groups=groups, emit_transposed=True
            )
            got = sgm_pallas.wta_stats_from_duals(
                hf, hb, d_valid=d_valid, groups=groups, interpret=True
            )
            names = ("best", "idx", "cm", "cp", "comp")
            for name, g, w in zip(names, got, want[1:]):
                np.testing.assert_array_equal(
                    np.asarray(g), np.asarray(w), err_msg=f"{name} groups={groups}"
                )
            st = sgm_pallas.st_from_duals(hf, hb, d_valid, groups)
            np.testing.assert_array_equal(np.asarray(st), np.asarray(want[0]))

    def test_int16_duals_keep_exact_sums(self):
        """census_bits + P2 > 127 configs build int16 dual volumes whose sums
        exceed 255 — s_t must keep the int16 form (the int8 255-clamp would
        collapse real sums into the masked-lane sentinel and corrupt
        right_disparity; ADVICE r4)."""
        from stereovision_tpu.ops import sgm_pallas

        rng = np.random.default_rng(7)
        W, H, D = 32, 16, 32
        hf = jnp.asarray(rng.integers(0, 400, (W, H, D)).astype(np.int16))
        hb = jnp.asarray(rng.integers(0, 400, (W, H, D)).astype(np.int16))
        st = sgm_pallas.st_from_duals(hf, hb, D)
        assert st.dtype == jnp.int16
        ref = jnp.transpose(hf.astype(jnp.int32) + hb.astype(jnp.int32), (2, 1, 0))
        np.testing.assert_array_equal(np.asarray(st).astype(np.int32), np.asarray(ref))

    def test_int16_volume_config_end_to_end(self):
        """7×5 census (34 bits) at default P2=96 → int16 dual volumes
        (sgm.py builds int16 whenever census_bits + p2 > 127): the packed
        paths=2 LR check must still validate a plain shifted pair."""
        left, right = small_pair(48, 144, shift=6)
        for impl in ("xla", "pallas_interpret"):
            p = SGMParams(num_disparities=16, pack=2, paths=2,
                          census_ksize=7, census_wsize=5, impl=impl)
            d, v = compute_disparity(jnp.asarray(left), jnp.asarray(right), p)
            frac = float(np.mean(np.asarray(v)))
            assert frac > 0.5, f"{impl}: LR-check validity collapsed to {frac}"
            dd = np.asarray(d)[np.asarray(v)]
            assert float(np.median(np.abs(dd - 6))) <= 1.0


class TestNearestValidLoHi:
    def test_matches_xla_scan_composition(self):
        """The fused Pallas lo/hi fill must equal the XLA _last_valid_scan
        composition exactly, including all-invalid rows (d_up substitution)
        and non-128-multiple widths (pad masking)."""
        from stereovision_tpu.ops import sgm_pallas
        from stereovision_tpu.stereo.sgm import _last_valid_scan

        rng = np.random.default_rng(21)
        for H, W in ((24, 200), (17, 128), (40, 72)):
            disp = jnp.asarray(rng.uniform(0, 64, (H, W)).astype(np.float32))
            valid = jnp.asarray(rng.uniform(size=(H, W)) < 0.4)
            valid = valid.at[3].set(False)  # one fully-invalid row
            d_up = jnp.asarray(rng.uniform(0, 64, (H, W)).astype(np.float32))

            def xla_axis(axis):
                lo = hi = None
                for reverse in (False, True):
                    val, has, _ = _last_valid_scan(disp, valid, axis, reverse)
                    val = jnp.where(has, val, d_up)
                    lo = val if lo is None else jnp.minimum(lo, val)
                    hi = val if hi is None else jnp.maximum(hi, val)
                return lo, hi

            want_lo, want_hi = xla_axis(1)
            got_lo, got_hi = sgm_pallas.nearest_valid_lohi(
                disp, valid, d_up, block_h=8, interpret=True
            )
            np.testing.assert_array_equal(np.asarray(got_lo), np.asarray(want_lo))
            np.testing.assert_array_equal(np.asarray(got_hi), np.asarray(want_hi))
            # vertical = the same kernel on the transpose
            want_lo, want_hi = xla_axis(0)
            got_lo, got_hi = sgm_pallas.nearest_valid_lohi(
                disp.T, valid.T, d_up.T, block_h=8, interpret=True
            )
            np.testing.assert_array_equal(np.asarray(got_lo.T), np.asarray(want_lo))
            np.testing.assert_array_equal(np.asarray(got_hi.T), np.asarray(want_hi))

    def test_census_fill_parity_across_impls(self):
        """hier2 + fill_invalid end-to-end: the pallas_interpret fill path
        (fused kernel) must match the XLA fill path bit-for-bit."""
        rng = np.random.default_rng(5)
        base = rng.uniform(0, 255, (48, 170)).astype(np.float32)
        import scipy.ndimage as ndi  # smooth → realistic disparity structure

        base = ndi.gaussian_filter(base, 2.0) if hasattr(ndi, "gaussian_filter") else base
        left, right = base[:, :160], base[:, 8:168]
        p_x = SGMParams(num_disparities=32, mode="hier2", refine_range=16,
                        coarse_scale=2, fill_invalid=True, impl="xla")
        p_p = dataclasses.replace(p_x, impl="pallas_interpret")
        dx, vx = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_x)
        dp, vp = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_p)
        np.testing.assert_array_equal(np.asarray(dp), np.asarray(dx))
        np.testing.assert_array_equal(np.asarray(vp), np.asarray(vx))
