"""Disparity engine tests: synthetic ground truth + cv2.StereoSGBM comparison."""

import cv2
import numpy as np
import jax.numpy as jnp

from stereovision_tpu.stereo import SGMParams, compute_disparity, disparity_with_confidence

RNG = np.random.default_rng(3)


def shifted_pair(h=96, w=160, shift=8):
    """Right image == left shifted left by `shift` px (constant disparity)."""
    base = RNG.uniform(0, 255, size=(h, w + shift + 8)).astype(np.float32)
    base = cv2.GaussianBlur(base, (5, 5), 1.0)  # correlated texture
    left = base[:, :w]
    right = base[:, shift : shift + w]  # content shifted left ⇒ disparity +shift
    return left, right


def slanted_pair(h=96, w=192, d0=4.0, d1=14.0):
    """Disparity ramps linearly in left coords: d(x) = d0 + (d1-d0)·x/w.

    Exact warp: right pixel u sees the texture of left pixel x solving
    x − d(x) = u, i.e. x = (u + d0)/(1 − b) for linear d.
    """
    base = RNG.uniform(0, 255, size=(h, 2 * w)).astype(np.float32)
    base = cv2.GaussianBlur(base, (5, 5), 1.0)
    xs = np.arange(w, dtype=np.float64)
    b = (d1 - d0) / w
    disp = d0 + b * xs
    left = np.zeros((h, w), np.float32)
    right = np.zeros((h, w), np.float32)
    x_of_u = (xs + d0) / (1.0 - b)  # left coordinate seen by right pixel u
    for y in range(h):
        left[y] = np.interp(xs + 40.0, np.arange(2 * w), base[y])
        right[y] = np.interp(x_of_u + 40.0, np.arange(2 * w), base[y])
    return left, right, disp.astype(np.float32)


class TestConstantDisparity:
    def test_recovers_shift(self):
        shift = 8
        left, right = shifted_pair(shift=shift)
        p = SGMParams(num_disparities=32, median_ksize=5)
        disp, valid = compute_disparity(jnp.asarray(left), jnp.asarray(right), p)
        disp, valid = np.asarray(disp), np.asarray(valid)
        interior = disp[8:-8, 40:-8]
        vi = valid[8:-8, 40:-8]
        assert vi.mean() > 0.9, vi.mean()
        err = np.abs(interior[vi] - shift)
        assert np.median(err) < 0.5, np.median(err)
        assert (err < 1.0).mean() > 0.95

    def test_batch_vmap(self):
        import jax

        left, right = shifted_pair(shift=6)
        p = SGMParams(num_disparities=32)
        f = jax.vmap(lambda l, r: compute_disparity(l, r, p))
        ls = jnp.stack([jnp.asarray(left)] * 3)
        rs = jnp.stack([jnp.asarray(right)] * 3)
        disp, valid = f(ls, rs)
        assert disp.shape == (3, 96, 160)
        d0 = np.asarray(disp[0])
        np.testing.assert_array_equal(d0, np.asarray(disp[2]))

    def test_invalid_marker(self):
        left, right = shifted_pair(shift=8)
        p = SGMParams(min_disparity=0, num_disparities=32)
        disp, valid = compute_disparity(jnp.asarray(left), jnp.asarray(right), p)
        disp, valid = np.asarray(disp), np.asarray(valid)
        assert np.all(disp[~valid] == -1.0)


class TestSubpixel:
    def test_slanted_plane_subpixel(self):
        left, right, gt = slanted_pair()
        p = SGMParams(num_disparities=32, median_ksize=5)
        disp, valid = compute_disparity(jnp.asarray(left), jnp.asarray(right), p)
        disp, valid = np.asarray(disp), np.asarray(valid)
        inner = np.s_[8:-8, 24:-8]
        err = np.abs(disp[inner] - gt[None, 24:-8])[valid[inner]]
        assert np.median(err) < 0.35, np.median(err)  # subpixel accuracy


class TestAgainstOpenCV:
    def test_comparable_to_sgbm(self):
        """Depth-map fidelity anchor (BASELINE.md): our engine and cv2.SGBM agree
        on a well-textured synthetic scene to ≲1 px on commonly-valid pixels."""
        left, right, gt = slanted_pair(h=128, w=256, d0=6, d1=20)
        lu8, ru8 = left.astype(np.uint8), right.astype(np.uint8)
        num_disp = 48
        sgbm = cv2.StereoSGBM_create(
            minDisparity=0, numDisparities=num_disp, blockSize=7,
            P1=8 * 49, P2=32 * 49, disp12MaxDiff=1, uniquenessRatio=10,
            speckleWindowSize=100, speckleRange=32, preFilterCap=63,
            mode=cv2.STEREO_SGBM_MODE_SGBM_3WAY,
        )
        disp_cv = sgbm.compute(lu8, ru8).astype(np.float32) / 16.0
        p = SGMParams(num_disparities=num_disp)
        disp, valid = compute_disparity(jnp.asarray(left), jnp.asarray(right), p)
        disp, valid = np.asarray(disp), np.asarray(valid)
        inner = np.s_[10:-10, 56:-10]
        both = valid[inner] & (disp_cv[inner] > 0)
        assert both.mean() > 0.75, both.mean()
        diff = np.abs(disp[inner] - disp_cv[inner])[both]
        assert np.median(diff) < 1.0, np.median(diff)
        # both should be close to ground truth
        err_ours = np.abs(disp[inner] - gt[None, 56:-10])[both]
        err_cv = np.abs(disp_cv[inner] - gt[None, 56:-10])[both]
        assert np.median(err_ours) < max(0.5, 1.2 * np.median(err_cv)), (
            np.median(err_ours), np.median(err_cv))


class TestHierarchical:
    def test_hier_matches_full_on_slanted(self):
        left, right, gt = slanted_pair(h=128, w=256, d0=6, d1=20)
        p_full = SGMParams(num_disparities=48)
        # hier with a 32-window refine (small images; TPU uses ≥128)
        p_hier = SGMParams(num_disparities=48, mode="hier", coarse_scale=2, refine_range=32)
        df, vf = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_full)
        dh, vh = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_hier)
        df, vf, dh, vh = map(np.asarray, (df, vf, dh, vh))
        inner = np.s_[10:-10, 56:-10]
        both = vf[inner] & vh[inner]
        assert both.mean() > 0.7, both.mean()
        err_h = np.abs(dh[inner] - gt[None, 56:-10])[both]
        err_f = np.abs(df[inner] - gt[None, 56:-10])[both]
        assert np.median(err_h) < max(0.5, 1.5 * np.median(err_f)), (
            np.median(err_h), np.median(err_f))

    def test_hier_object_jump(self):
        """Near object on far background — the coarse pass must seed both."""
        rng = np.random.default_rng(7)
        H, W = 96, 192
        base = cv2.GaussianBlur(rng.uniform(0, 255, (H, W + 40)).astype(np.float32), (5, 5), 1.0)
        left = base[:, :W].copy()
        right = base[:, 4 : 4 + W].copy()  # background disparity 4
        obj = cv2.GaussianBlur(rng.uniform(0, 255, (30, 40)).astype(np.float32), (5, 5), 1.0)
        left[30:60, 80:120] = obj
        right[30:60, 80 - 24 : 120 - 24] = obj  # object disparity 24
        p = SGMParams(num_disparities=48, mode="hier", coarse_scale=2, refine_range=32)
        d, v = compute_disparity(jnp.asarray(left), jnp.asarray(right), p)
        d, v = np.asarray(d), np.asarray(v)
        obj_d = d[38:55, 90:110][v[38:55, 90:110]]
        bg_d = d[10:25, 20:60][v[10:25, 20:60]]
        assert abs(np.median(obj_d) - 24) < 1.5, np.median(obj_d)
        assert abs(np.median(bg_d) - 4) < 1.0, np.median(bg_d)


class TestConfidence:
    def test_confidence_contract(self):
        left, right = shifted_pair(shift=8)
        p = SGMParams(num_disparities=32)
        disp, conf = disparity_with_confidence(jnp.asarray(left), jnp.asarray(right), p)
        disp, conf = np.asarray(disp), np.asarray(conf)
        assert set(np.unique(conf)) <= {0.0, 1.0}
        assert np.all(disp[conf > 0] > 1.0)
        assert np.all(disp[conf > 0] < 31.0)


class TestOcclusion:
    def test_lr_check_invalidates_unmatched(self):
        """A band that exists only in the left image must be flagged invalid."""
        left, right = shifted_pair(h=96, w=160, shift=8)
        right = right.copy()
        right[:, 60:90] = RNG.uniform(0, 255, size=(96, 30))  # destroy matches
        p = SGMParams(num_disparities=32)
        _, valid = compute_disparity(jnp.asarray(left), jnp.asarray(right), p)
        valid = np.asarray(valid)
        corrupted = valid[10:-10, 70:86]
        clean = valid[10:-10, 110:150]
        assert corrupted.mean() < 0.5 * clean.mean() + 0.2


class TestMinDisparity:
    def test_nonzero_min_disparity_with_lr_check(self):
        """Regression: the LR lookup must offset by min_disparity (the right
        view's disparity array is indexed at right-pixel + min_d)."""
        shift = 24
        left, right = shifted_pair(h=96, w=192, shift=shift)
        p = SGMParams(min_disparity=16, num_disparities=32)
        disp, valid = compute_disparity(jnp.asarray(left), jnp.asarray(right), p)
        disp, valid = np.asarray(disp), np.asarray(valid)
        vi = valid[8:-8, 60:-8]
        assert vi.mean() > 0.85, vi.mean()
        err = np.abs(disp[8:-8, 60:-8][vi] - shift)
        assert np.median(err) < 0.5, np.median(err)

    def test_pallas_parity_nonzero_min_disparity(self):
        import dataclasses

        shift = 24
        left, right = shifted_pair(h=48, w=120, shift=shift)
        p_x = SGMParams(min_disparity=16, num_disparities=16, impl="xla")
        p_p = dataclasses.replace(p_x, impl="pallas_interpret")
        dx, vx = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_x)
        dp, vp = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_p)
        np.testing.assert_allclose(np.asarray(dp), np.asarray(dx), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(vp), np.asarray(vx))


class TestShadedScene:
    def test_quality_on_shaded_boxes(self):
        """A more photographic anchor: gradient-shaded boxes over a shaded
        background (smooth intensity + texture, occlusion boundaries)."""
        rng = np.random.default_rng(13)
        H, W = 120, 220
        yy, xx = np.mgrid[0:H, 0:W + 40].astype(np.float32)
        base = 90 + 50 * np.sin(xx / 37.0) + 30 * np.cos(yy / 23.0)
        base += cv2.GaussianBlur(rng.uniform(-25, 25, base.shape).astype(np.float32), (3, 3), 0.8)
        left = base[:, :W].copy()
        right = base[:, 5 : 5 + W].copy()  # background disparity 5
        gt = np.full((H, W), 5.0, np.float32)
        for (y0, x0, h, w, d) in ((20, 40, 40, 50, 18), (65, 120, 35, 60, 12)):
            box = 60 + 70 * np.outer(np.linspace(0, 1, h), np.linspace(1, 0.4, w))
            box += cv2.GaussianBlur(rng.uniform(-20, 20, box.shape).astype(np.float32), (3, 3), 0.8)
            left[y0:y0 + h, x0:x0 + w] = box
            right[y0:y0 + h, x0 - d:x0 - d + w] = box
            gt[y0:y0 + h, x0:x0 + w] = d
        p = SGMParams(num_disparities=32)
        disp, valid = compute_disparity(jnp.asarray(left), jnp.asarray(right), p)
        d, v = np.asarray(disp), np.asarray(valid)
        inner = np.s_[8:-8, 40:-8]
        err = np.abs(d[inner] - gt[inner])[v[inner]]
        assert v[inner].mean() > 0.8, v[inner].mean()
        assert np.median(err) < 0.6, np.median(err)
        # the two boxes are recovered at their disparities
        for (y0, x0, h, w, dd) in ((20, 40, 40, 50, 18), (65, 120, 35, 60, 12)):
            core = d[y0 + 8:y0 + h - 8, x0 + 8:x0 + w - 8]
            cv_ = v[y0 + 8:y0 + h - 8, x0 + 8:x0 + w - 8]
            assert abs(np.median(core[cv_]) - dd) < 1.0, (dd, np.median(core[cv_]))


class TestHier2:
    @staticmethod
    def _big_jump_scene():
        """Near box whose disparity jump (44) EXCEEDS the refine window (32):
        plain hier's single low window cannot reach the box; hier2's
        high-side window must recover it."""
        rng = np.random.default_rng(11)
        H, W, bg_d, box_d = 120, 280, 6, 50
        base = cv2.GaussianBlur(rng.uniform(0, 255, (H, W + 64)).astype(np.float32), (5, 5), 1.0)
        left = base[:, :W].copy()
        right = base[:, bg_d : bg_d + W].copy()
        obj = cv2.GaussianBlur(rng.uniform(0, 255, (60, 80)).astype(np.float32), (5, 5), 1.0)
        y0, x0 = 30, 120
        left[y0 : y0 + 60, x0 : x0 + 80] = obj
        right[y0 : y0 + 60, x0 - box_d : x0 - box_d + 80] = obj
        return left, right, bg_d, box_d, (y0, x0)

    def test_recovers_jump_beyond_refine_window(self):
        left, right, bg_d, box_d, (y0, x0) = self._big_jump_scene()
        p2 = SGMParams(num_disparities=64, mode="hier2", coarse_scale=2, refine_range=32)
        d2, v2 = compute_disparity(jnp.asarray(left), jnp.asarray(right), p2)
        d2, v2 = np.asarray(d2), np.asarray(v2)
        core = np.s_[y0 + 12 : y0 + 48, x0 + 12 : x0 + 68]
        assert v2[core].mean() > 0.8, v2[core].mean()
        assert abs(np.median(d2[core][v2[core]]) - box_d) < 1.0, np.median(d2[core][v2[core]])
        bg = np.s_[12:-12, 20:100]
        assert v2[bg].mean() > 0.8, v2[bg].mean()
        assert abs(np.median(d2[bg][v2[bg]]) - bg_d) < 1.0
        # plain hier demonstrably cannot: its one window misses the box core
        p1 = SGMParams(num_disparities=64, mode="hier", coarse_scale=2, refine_range=32)
        d1, v1 = compute_disparity(jnp.asarray(left), jnp.asarray(right), p1)
        d1, v1 = np.asarray(d1), np.asarray(v1)
        ok1 = v1[core] & (np.abs(d1[core] - box_d) < 1.0)
        ok2 = v2[core] & (np.abs(d2[core] - box_d) < 1.0)
        assert ok2.mean() > ok1.mean() + 0.3, (ok1.mean(), ok2.mean())

    def test_agg_wseg_parity_and_accuracy(self):
        """Segmented horizontal aggregation (agg_wseg): Pallas-interpret and
        XLA must restart at the same columns bit-identically, and the result
        must still recover a constant shift."""
        import dataclasses

        rng = np.random.default_rng(11)
        base = cv2.GaussianBlur(
            rng.uniform(0, 255, (64, 266)).astype(np.float32), (5, 5), 1.0
        )
        left, right = base[:, :256], base[:, 10:266]  # disparity 10
        p_x = SGMParams(num_disparities=32, pack=4, paths=2, agg_wseg=2,
                        impl="xla")
        p_p = dataclasses.replace(p_x, impl="pallas_interpret")
        dx, vx = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_x)
        dp, vp = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_p)
        np.testing.assert_allclose(np.asarray(dp), np.asarray(dx), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(vp), np.asarray(vx))
        d, v = np.asarray(dx), np.asarray(vx)
        good = d[6:-6, 40:-6][v[6:-6, 40:-6]]
        assert good.size and abs(np.median(good) - 10) < 0.3
        # and the segmentation really changes the scan (differs from wseg=1
        # somewhere near the restart columns is allowed but results stay close)
        p_1 = dataclasses.replace(p_x, agg_wseg=1)
        d1, v1 = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_1)
        both = v[6:-6, 40:-6] & np.asarray(v1)[6:-6, 40:-6]
        agree = np.abs(d[6:-6, 40:-6] - np.asarray(d1)[6:-6, 40:-6])[both]
        assert np.median(agree) < 0.1

    def test_stacked_two_window_refine_matches_sequential(self):
        """hier2's stacked [warp_A; warp_B] refine must match two sequential
        _refine_with_shift passes on a CONSTANT shift field — there the
        stacked form's census-space warp (gather the right census by the
        shift) coincides exactly with the sequential image-warp-then-census
        form away from the left border, so stacking changes the kernel-launch
        count, not the values (both impls)."""
        import dataclasses

        from stereovision_tpu.stereo.sgm import (
            _refine_two_windows, _refine_with_shift,
        )

        rng = np.random.default_rng(21)
        H, W = 96, 256
        base = cv2.GaussianBlur(
            rng.uniform(0, 255, (H, W + 40)).astype(np.float32), (5, 5), 1.0
        )
        left, right = jnp.asarray(base[:, :W]), jnp.asarray(base[:, 30:30 + W])
        shift_a = jnp.full((H, W), 24.0)
        shift_b = jnp.full((H, W), 30.0)
        # interior: clear of the border columns where the two forms construct
        # different census support (left: clipped gather vs replicated warp;
        # right: the warp never contains the image's last ``shift`` columns,
        # which the gathered census correctly sees — the backward scan can
        # carry that difference a few columns inward)
        sl = np.s_[:, 40:-40]
        for impl in ("xla", "pallas_interpret"):
            p = SGMParams(num_disparities=64, mode="hier2", refine_range=32,
                          paths=2, impl=impl)
            (da, va, ba), (db, vb, bb) = _refine_two_windows(
                left, right, shift_a, shift_b, p)
            ra = _refine_with_shift(left, right, shift_a, p, mask_seams=True,
                                    post=False)
            # lr=False: what hier2's sequential fallback actually runs for
            # window B — and what the stacked form's lr_groups=2 reproduces
            rb = _refine_with_shift(left, right, shift_b, p, mask_seams=True,
                                    post=False, lr=False)
            # disp: the two graph shapes reassociate the subpixel float
            # adds (single-ulp, ~1e-6 at these magnitudes); integer-valued
            # costs and validity must stay exactly equal
            np.testing.assert_allclose(np.asarray(da)[sl],
                                       np.asarray(ra[0])[sl], atol=2e-6,
                                       err_msg=f"disp_a {impl}")
            np.testing.assert_array_equal(np.asarray(va)[sl],
                                          np.asarray(ra[1])[sl])
            np.testing.assert_array_equal(np.asarray(ba)[sl],
                                          np.asarray(ra[2])[sl])
            np.testing.assert_allclose(np.asarray(db)[sl],
                                       np.asarray(rb[0])[sl], atol=2e-6,
                                       err_msg=f"disp_b {impl}")
            np.testing.assert_array_equal(np.asarray(vb)[sl],
                                          np.asarray(rb[1])[sl])

    def test_decimated_b_window_matches_full_stack_on_decimated_rows(self):
        """b_decimate=3: the [A(H); B(H/3)] stack's window-B strip solves the
        SAME per-row problem as the full-height [A; B] stack at rows 0, 3, 6…
        (full-res censuses sampled at those rows; horizontal-only paths make
        rows independent) — bit-equal there, row-repeated elsewhere. Window A
        must be bit-identical between the two stack geometries."""
        import dataclasses

        from stereovision_tpu.stereo.sgm import _refine_two_windows

        rng = np.random.default_rng(23)
        H, W = 96, 256  # H % 24 == 0
        base = cv2.GaussianBlur(
            rng.uniform(0, 255, (H, W + 40)).astype(np.float32), (5, 5), 1.0
        )
        left, right = jnp.asarray(base[:, :W]), jnp.asarray(base[:, 30:30 + W])
        shift_a = jnp.asarray(
            np.clip(np.round(24 + 4 * np.sin(np.arange(W) / 29.0))[None, :]
                    * np.ones((H, 1)), 0, 32).astype(np.float32))
        shift_b = shift_a + 6.0
        for impl in ("xla", "pallas_interpret"):
            p = SGMParams(num_disparities=64, mode="hier2", refine_range=32,
                          paths=2, impl=impl, b_decimate=3)
            (da, va, _), (db, vb, _) = _refine_two_windows(
                left, right, shift_a, shift_b, p)
            p1 = dataclasses.replace(p, b_decimate=1)
            (da1, va1, _), (db1, vb1, _) = _refine_two_windows(
                left, right, shift_a, shift_b, p1)
            np.testing.assert_array_equal(np.asarray(da), np.asarray(da1),
                                          err_msg=f"disp_a {impl}")
            np.testing.assert_array_equal(np.asarray(va), np.asarray(va1))
            np.testing.assert_array_equal(
                np.asarray(db)[::3], np.asarray(db1)[::3],
                err_msg=f"disp_b {impl}")
            np.testing.assert_array_equal(np.asarray(vb)[::3],
                                          np.asarray(vb1)[::3])
            # the repeated rows are exact copies of their strip row
            np.testing.assert_array_equal(np.asarray(db),
                                          np.repeat(np.asarray(db)[::3], 3,
                                                    axis=0)[:H])

    def test_fill_invalid_inpaints_and_reports_full_validity(self):
        """fill_invalid=True: remaining holes (LR-killed occlusions, seam
        masks) are inpainted from the nearest valid neighbor (ties to the
        farther disparity) and the mask comes back all-true."""
        import dataclasses

        left, right, box, d_box, d_bg = self._big_jump_scene()
        p = SGMParams(num_disparities=64, mode="hier2", coarse_scale=2,
                      refine_range=32)
        d0, v0 = compute_disparity(jnp.asarray(left), jnp.asarray(right), p)
        pf = dataclasses.replace(p, fill_invalid=True)
        d1, v1 = compute_disparity(jnp.asarray(left), jnp.asarray(right), pf)
        d0, v0, d1, v1 = map(np.asarray, (d0, v0, d1, v1))
        assert v1.all()
        assert (~v0).any()  # the scene does produce holes to fill
        # valid pixels ≥2 px from any hole are untouched (the fill path's
        # combined merge+fill median only sees different support INSIDE the
        # 5×5 window of a hole — there it may smooth with the data-chosen
        # candidate instead of the coarse prior); filled values plausible
        core = cv2.erode(v0.astype(np.uint8), np.ones((5, 5), np.uint8)) > 0
        assert core.any()
        np.testing.assert_allclose(d1[core], d0[core], atol=1e-5)
        assert d1.min() >= 0.0 and d1.max() <= 64.0

    def test_census_distance_separates_true_from_false_matches(self):
        """The hier2 arbitration signal: census distance vs the ORIGINAL
        right image is near zero at the true disparity and noise-level at a
        wrong one (both impl formats agree)."""
        from stereovision_tpu.stereo.sgm import (
            _census_distance, _census_words_for,
        )

        rng = np.random.default_rng(5)
        base = cv2.GaussianBlur(
            rng.uniform(0, 255, (64, 280)).astype(np.float32), (5, 5), 1.0
        )
        left, right = jnp.asarray(base[:, :256]), jnp.asarray(base[:, 12:268])
        p = SGMParams(num_disparities=32)
        outs = {}
        for impl in ("xla", "pallas_interpret"):
            cl = _census_words_for(left, p, impl)
            cr = _census_words_for(right, p, impl)
            true_d = jnp.full((64, 256), 12.0)
            false_d = jnp.full((64, 256), 25.0)
            outs[impl] = (
                np.asarray(_census_distance(cl, cr, true_d, p, impl)),
                np.asarray(_census_distance(cl, cr, false_d, p, impl)),
            )
        inner = np.s_[4:-4, 30:-4]
        cd_true, cd_false = outs["xla"]
        assert cd_true[inner].mean() < 1.0
        assert cd_false[inner].mean() > 6.0
        np.testing.assert_array_equal(outs["pallas_interpret"][0], cd_true)
        np.testing.assert_array_equal(outs["pallas_interpret"][1], cd_false)

    def test_hier2_interpret_parity(self):
        import dataclasses

        left, right, *_ = self._big_jump_scene()
        p_x = SGMParams(
            num_disparities=64, mode="hier2", coarse_scale=2, refine_range=32,
            impl="xla",
        )
        p_p = dataclasses.replace(p_x, impl="pallas_interpret")
        dx, vx = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_x)
        dp, vp = compute_disparity(jnp.asarray(left), jnp.asarray(right), p_p)
        np.testing.assert_allclose(np.asarray(dp), np.asarray(dx), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(vp), np.asarray(vx))


class TestHierLargeDisparity:
    def test_constant_disparity_near_window_cap(self):
        """Regression: a constant disparity larger than the refine window used
        to fail — left-edge coarse pixels (x < true disparity) returned
        garbage-low VALID matches (no LR check in the coarse pass) and the
        over-wide min-erosion (radius 2R−1 instead of R−1) dragged the refine
        window below the true disparity across ~2R columns."""
        rng = np.random.default_rng(3)
        base = cv2.GaussianBlur(
            rng.uniform(0, 255, (160, 410)).astype(np.float32), (5, 5), 1.0
        )
        left, right = base[:, :320], base[:, 72:392]  # disparity 72
        p = SGMParams(num_disparities=96, mode="hier", coarse_scale=2, refine_range=64)
        d, v = compute_disparity(jnp.asarray(left), jnp.asarray(right), p)
        d, v = np.asarray(d), np.asarray(v)
        vi = v[10:-10, 100:-10]
        assert vi.mean() > 0.9, vi.mean()
        err = np.abs(d[10:-10, 100:-10][vi] - 72.0)
        assert np.median(err) < 0.25, np.median(err)
