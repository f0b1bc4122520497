"""High-level pipeline API over a synthetic calibrated rig."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereovision_tpu.core import geometry as geom

RNG = np.random.default_rng(81)


@pytest.fixture(scope="module")
def rig_calibration():
    """A consistent stereo calibration dict (identity-ish rig, cm units)."""
    W, H = 256, 192
    K = np.array([[250.0, 0, 128], [0, 250.0, 96], [0, 0, 1]])
    R = np.eye(3)
    T = np.array([-5.0, 0.0, 0.0])
    d0 = np.zeros(5)
    R1, R2, P1, P2, Q = geom.stereo_rectify(
        jnp.asarray(K), jnp.asarray(d0), jnp.asarray(K), jnp.asarray(d0),
        (W, H), jnp.asarray(R), jnp.asarray(T), alpha=0.0)
    return {
        "mtx_left": K, "mtx_right": K, "dist_left": d0, "dist_right": d0,
        "R": R, "T": T.reshape(3, 1),
        "R1": np.asarray(R1), "R2": np.asarray(R2),
        "P1": np.asarray(P1), "P2": np.asarray(P2), "Q": np.asarray(Q),
        "img_size": np.asarray([W, H]),
    }


def stereo_pair(disp=8, W=256, H=192):
    base = RNG.uniform(0, 255, (H, W + disp + 4)).astype(np.float32)
    k = np.ones((5, 5), np.float32) / 25.0
    from scipy.signal import convolve2d

    base = convolve2d(base, k, mode="same", boundary="symm").astype(np.float32)
    return base[:, :W], base[:, disp : disp + W]


class TestDepthPipeline:
    def test_end_to_end_metric_depth(self, rig_calibration):
        from stereovision_tpu.pipeline import DepthPipeline
        from stereovision_tpu.stereo import SGMParams

        left, right = stereo_pair(disp=8)
        pipe = DepthPipeline(rig_calibration, SGMParams(num_disparities=32, impl="xla"),
                             min_depth=0.1, max_depth=5.0)
        res = pipe(left, right)
        d = np.asarray(res.disparity)
        c = np.asarray(res.confidence)
        good = d[20:-20, 40:-20][c[20:-20, 40:-20] > 0]
        assert abs(np.median(good) - 8) < 0.5
        # depth = f*B/d = 250 * 0.05 / 8 = 1.5625 m
        z = np.asarray(res.depth_m)[20:-20, 40:-20]
        z = z[z > 0]
        assert abs(np.median(z) - 1.5625) < 0.05, np.median(z)

    def test_exact_speckle_option(self, rig_calibration):
        """exact_speckle=True swaps the windowed approximation for the native
        connected-component filter (cv2.filterSpeckles semantics) and removes
        small floating islands the same way."""
        from stereovision_tpu.ops import native
        from stereovision_tpu.pipeline import DepthPipeline
        from stereovision_tpu.stereo import SGMParams

        if not native.available():
            pytest.skip("native library unavailable")
        left, right = stereo_pair(disp=8)
        p = SGMParams(num_disparities=32, impl="xla",
                      speckle_window_size=100, speckle_range=2.0)
        pipe = DepthPipeline(rig_calibration, p, exact_speckle=True)
        res = pipe(left, right)
        d = np.asarray(res.disparity)
        c = np.asarray(res.confidence)
        good = d[20:-20, 40:-20][c[20:-20, 40:-20] > 0]
        assert good.size and abs(np.median(good) - 8) < 0.5
        # the engine itself ran with the windowed filter OFF
        assert pipe.params.speckle_window_size == 0
        assert pipe._speckle_params.speckle_window_size == 100
        # invalid pixels carry zero confidence and zero depth
        assert (np.asarray(res.depth_m)[c == 0] == 0).all()

    def test_point_cloud(self, rig_calibration):
        from stereovision_tpu.pipeline import DepthPipeline
        from stereovision_tpu.stereo import SGMParams

        left, right = stereo_pair(disp=8)
        pipe = DepthPipeline(rig_calibration, SGMParams(num_disparities=32, impl="xla"))
        res = pipe(left, right)
        pts = np.asarray(pipe.point_cloud(res, rig_calibration["Q"]))
        assert pts.shape == (192, 256, 3)
        # Q units are cm here: median Z ≈ 250*5/8 = 156.25 cm
        zc = pts[20:-20, 40:-20, 2][np.asarray(res.confidence)[20:-20, 40:-20] > 0]
        assert abs(np.median(zc) - 156.25) < 5.0, np.median(zc)


class TestFusedPipeline:
    def test_streaming_fusion(self, rig_calibration):
        from stereovision_tpu.pipeline import FusedPipeline

        pipe = FusedPipeline(rig_calibration, scale=0.75, use_midas=False)
        left, right = stereo_pair(disp=8)
        out = None
        for k in range(3):
            out = pipe(np.roll(left, k, 1), np.roll(right, k, 1), t_now=0.1 * k)
        assert out is not None
        assert out["mode"] == 1  # stereo base
        f = np.asarray(out["fused"])
        assert f.max() <= 255.0 and f.max() > 0
        m = np.asarray(out["meters"])
        assert m.min() >= 0.05 and m.max() <= 30.0


class TestOcclusionFallback:
    def test_stereo_disables_on_covered_camera(self, rig_calibration):
        """The sensor-fault degradation path (reference fused_depth_map.py
        :2515-2571): cover the left camera for >5 checked frames → hysteresis
        flips, stereo turns off, fusion continues on the remaining methods."""
        from stereovision_tpu.pipeline import FusedPipeline

        pipe = FusedPipeline(rig_calibration, scale=0.75, use_midas=True)
        # sharp, high-contrast texture: the un-occluded camera must score well
        # below the 0.6x asymmetry guard (smoothed noise would not)
        sharp = RNG.uniform(0, 255, (192, 264)).astype(np.float32)
        left, right = sharp[:, :256], sharp[:, 8:264]
        covered = np.full_like(left, 15.0)  # dark flat = lens covered
        out = None
        for k in range(14):  # occlusion checked every 2nd frame; 5 to confirm
            out = pipe(covered, right, t_now=0.1 * k)
        assert pipe.hysteresis.state == "left"
        assert not pipe.hysteresis.stereo_enabled
        assert out is not None and out["mode"] in (2, 3)  # midas or flow base
        # uncover → recovers after another confirmation run
        for k in range(14, 28):
            out = pipe(left, right, t_now=0.1 * k)
        assert pipe.hysteresis.state == "none"
        assert out["mode"] == 1  # stereo base again


class TestFusedStream:
    def test_stream_matches_per_frame(self, rig_calibration):
        """The chunked lax.scan form (one upload + one program per chunk) is
        bit-identical to the per-frame form while unoccluded, carries flow
        state across chunks, and accepts uint8 input."""
        from stereovision_tpu.pipeline import FusedPipeline

        left, right = stereo_pair(disp=8)
        n = 5
        lefts = np.stack([np.roll(left, k, 1) for k in range(n)])
        rights = np.stack([np.roll(right, k, 1) for k in range(n)])
        pf = FusedPipeline(rig_calibration, scale=0.75)
        st = FusedPipeline(rig_calibration, scale=0.75)
        ref = [pf(lefts[k], rights[k], t_now=k / 30.0) for k in range(n)]
        outs = st.stream(lefts[:3], rights[:3], t0=0.0, dt=1 / 30.0)
        outs2 = st.stream(lefts[3:], rights[3:], t0=3 / 30.0, dt=1 / 30.0)
        fused = np.concatenate([np.asarray(outs["fused"]), np.asarray(outs2["fused"])])
        for k in range(n):
            np.testing.assert_array_equal(fused[k], np.asarray(ref[k]["fused"]))
        # uint8 chunks run the same program shape (device-side cast)
        u8 = st.stream(lefts.astype(np.uint8), rights.astype(np.uint8))
        assert np.asarray(u8["fused"]).shape == fused.shape

    def test_stream_occlusion_hysteresis_on_device(self, rig_calibration):
        """The traced int32 hysteresis inside the scan flips state after the
        confirmation run and routes fusion off stereo - all within ONE
        dispatched program."""
        from stereovision_tpu.pipeline import FusedPipeline

        pipe = FusedPipeline(rig_calibration, scale=0.75, use_midas=True)
        sharp = RNG.uniform(0, 255, (192, 264)).astype(np.float32)
        left, right = sharp[:, :256], sharp[:, 8:264]
        covered = np.full_like(left, 15.0)
        n = 8  # hysteresis updates EVERY frame in stream form; 5 to confirm
        outs = pipe.stream(np.stack([covered] * n), np.stack([right] * n))
        codes = np.asarray(outs["occlusion_code"])
        assert codes[-1] == 1  # left occluded confirmed on-device
        assert pipe.hysteresis.state == "left"  # carried back to host
        assert int(outs["mode"][-1]) in (2, 3)
        assert int(outs["mode"][0]) == 1  # pre-confirmation frames kept stereo
        # recovery in a second chunk
        outs = pipe.stream(np.stack([left] * n), np.stack([right] * n))
        assert pipe.hysteresis.state == "none"
        assert int(outs["mode"][-1]) == 1
