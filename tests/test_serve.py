"""Streaming depth service (apps/serve.py): stdin JSON-lines protocol and
hot-folder watch mode over a synthetic calibrated rig."""

import io
import json

import numpy as np
import jax.numpy as jnp
import pytest

from stereovision_tpu.core import geometry as geom

RNG = np.random.default_rng(17)
W, H, DISP = 160, 120, 6


@pytest.fixture(scope="module")
def rig_store(tmp_path_factory):
    """Identity-ish rig saved to a CalibrationStore + one synthetic pair."""
    from stereovision_tpu.io.store import CalibrationStore

    root = tmp_path_factory.mktemp("serve_rig")
    K = np.array([[150.0, 0, W / 2], [0, 150.0, H / 2], [0, 0, 1]])
    R, T, d0 = np.eye(3), np.array([-5.0, 0.0, 0.0]), np.zeros(5)
    R1, R2, P1, P2, Q = geom.stereo_rectify(
        jnp.asarray(K), jnp.asarray(d0), jnp.asarray(K), jnp.asarray(d0),
        (W, H), jnp.asarray(R), jnp.asarray(T), alpha=0.0)
    store = CalibrationStore(root / "calib")
    store.save("stereo_calibration_data", {
        "ret": 0.1, "R": R, "T": T.reshape(3, 1), "E": np.eye(3), "F": np.eye(3),
        "R1": np.asarray(R1), "R2": np.asarray(R2), "P1": np.asarray(P1),
        "P2": np.asarray(P2), "Q": np.asarray(Q), "roi1": np.zeros(4),
        "roi2": np.zeros(4), "mtx_left": K, "dist_left": d0, "mtx_right": K,
        "dist_right": d0, "chessboard_size": np.array([9, 6]),
        "square_size": 2.5, "img_size": np.array([W, H]),
        "num_valid_pairs": 10,
    })
    from scipy.signal import convolve2d
    import imageio.v2 as iio

    k = np.ones((5, 5), np.float32) / 25.0
    base = RNG.uniform(0, 255, (H, W + DISP)).astype(np.float32)
    base = convolve2d(base, k, mode="same", boundary="symm")
    imgs = root / "frames"
    imgs.mkdir()
    iio.imwrite(imgs / "left_001.png", base[:, :-DISP].astype(np.uint8))
    iio.imwrite(imgs / "right_001.png", base[:, DISP:].astype(np.uint8))
    return root


def _run(argv, requests):
    from stereovision_tpu.apps import serve

    out = io.StringIO()
    rc = serve.main(argv, stdin=io.StringIO("\n".join(requests) + "\n"), stdout=out)
    assert rc == 0
    return [json.loads(x) for x in out.getvalue().splitlines()]


class TestStdinProtocol:
    def test_requests_ping_stats_shutdown(self, rig_store, tmp_path):
        l, r = rig_store / "frames/left_001.png", rig_store / "frames/right_001.png"
        reqs = [
            json.dumps({"cmd": "ping"}),
            json.dumps({"left": str(l), "right": str(r), "id": 1,
                        "out": str(tmp_path)}),
            json.dumps({"left": str(l), "right": str(r), "id": 2,
                        "out": str(tmp_path)}),
            json.dumps({"cmd": "stats"}),
            json.dumps({"cmd": "shutdown"}),
        ]
        resps = _run(["--calib", str(rig_store / "calib"), "--mode", "depth",
                      "--num-disparities", "32", "--save-npz"], reqs)
        assert resps[0]["pong"] is True
        frame = {x["id"]: x for x in resps if x.get("id")}
        assert frame[1]["ok"] and frame[2]["ok"]
        assert 0.0 < frame[1]["valid_frac"] <= 1.0
        z = np.load(frame[1]["out_npz"])
        good = z["disparity"][z["valid"]]
        assert good.size and abs(np.median(good) - DISP) < 1.0
        stats = resps[-1]
        assert stats["frames"] == 2 and stats["mean_ms"] > 0

    def test_bad_request_is_reported_not_fatal(self, rig_store, tmp_path):
        l, r = rig_store / "frames/left_001.png", rig_store / "frames/right_001.png"
        reqs = [
            "not json {",
            json.dumps({"left": "missing.png", "right": str(r), "id": 5}),
            json.dumps({"left": str(l), "right": str(r), "id": 6,
                        "out": str(tmp_path)}),
        ]
        resps = _run(["--calib", str(rig_store / "calib"),
                      "--num-disparities", "32"], reqs)
        assert resps[0]["ok"] is False and "bad json" in resps[0]["error"]
        assert resps[1]["ok"] is False and resps[1]["id"] == 5
        assert resps[2]["ok"] is True and resps[2]["id"] == 6
        assert resps[-1]["frames"] == 1


class TestLiveTuning:
    def test_set_depth_range_mid_stream(self, rig_store, tmp_path):
        """{"cmd": "set"} changes the metric window between two frames of the
        same stream (reference depth_map.py:1245-1256 runtime +/- keys)."""
        l, r = rig_store / "frames/left_001.png", rig_store / "frames/right_001.png"
        reqs = [
            json.dumps({"left": str(l), "right": str(r), "id": 1,
                        "out": str(tmp_path / "a")}),
            json.dumps({"cmd": "set",
                        "params": {"min_depth": 0.1, "max_depth": 99.0}}),
            json.dumps({"left": str(l), "right": str(r), "id": 2,
                        "out": str(tmp_path / "b")}),
        ]
        resps = _run(["--calib", str(rig_store / "calib"),
                      "--num-disparities", "32", "--save-npz"], reqs)
        byid = {x["id"]: x for x in resps if x.get("id")}
        setresp = [x for x in resps if "depth_range" in x][0]
        assert setresp["ok"] and setresp["depth_range"] == [0.1, 99.0]
        # fx*B/disp = 150*0.05/6 = 1.25 m: inside [0.2, 4] already, so check
        # the clip window moved by looking at the clamp of far outliers
        z1 = np.load(byid[1]["out_npz"])
        z2 = np.load(byid[2]["out_npz"])
        assert z2["depth_m"][z2["valid"]].max() <= 99.0
        assert z1["depth_m"][z1["valid"]].max() <= 4.0

    def test_set_fusion_params_and_bad_key(self, rig_store, tmp_path):
        reqs = [
            json.dumps({"cmd": "set", "params": {"stereo_weight": 0.6}}),
            json.dumps({"cmd": "set", "params": {"bogus_knob": 1}}),
        ]
        resps = _run(["--calib", str(rig_store / "calib"), "--mode", "fused",
                      "--scale", "0.75"], reqs)
        assert resps[0]["ok"] and resps[0]["fusion_params"]["stereo_weight"] == 0.6
        assert resps[1]["ok"] is False and "bogus_knob" in resps[1]["error"]

    def test_rescale_mid_stream(self, rig_store, tmp_path):
        """{"cmd": "rescale"} rebuilds maps + params and the stream continues
        (reference fused_depth_map.py:3330-3360)."""
        l, r = rig_store / "frames/left_001.png", rig_store / "frames/right_001.png"
        reqs = [
            json.dumps({"left": str(l), "right": str(r), "id": 1,
                        "out": str(tmp_path / "a")}),
            json.dumps({"cmd": "rescale", "scale": 0.5}),
            json.dumps({"left": str(l), "right": str(r), "id": 2,
                        "out": str(tmp_path / "b")}),
        ]
        resps = _run(["--calib", str(rig_store / "calib"),
                      "--num-disparities", "16", "--save-npz"], reqs)
        byid = {x["id"]: x for x in resps if x.get("id")}
        scaled = [x for x in resps if "scale" in x][0]
        assert scaled["ok"] and scaled["scale"] == 0.5
        z1, z2 = np.load(byid[1]["out_npz"]), np.load(byid[2]["out_npz"])
        assert z1["disparity"].shape == (H, W)
        assert z2["disparity"].shape == (H // 2, W // 2)
        # disparity scales with resolution: ~DISP at full, ~DISP/2 at half
        good = z2["disparity"][z2["valid"]]
        assert good.size and abs(np.median(good) - DISP / 2) < 1.0


class TestWatchMode:
    def test_once_processes_all_pairs(self, rig_store, tmp_path):
        from stereovision_tpu.apps import serve

        out = io.StringIO()
        rc = serve.main([
            "--calib", str(rig_store / "calib"), "--num-disparities", "32",
            "--watch", str(rig_store / "frames"), "--once",
            "--out", str(tmp_path), "--save-npz", "--save-png",
        ], stdin=io.StringIO(""), stdout=out)
        assert rc == 0
        resps = [json.loads(x) for x in out.getvalue().splitlines()]
        assert resps[-1]["frames"] == 1
        assert resps[0]["ok"] and (tmp_path / "serve_001.npz").exists()
        assert (tmp_path / "serve_001.png").exists()

    def test_once_batches_pending_pairs(self, rig_store, tmp_path):
        """≥2 pending pairs ride one batched dispatch (VERDICT r2 #7); every
        pair still gets its own response + artifact."""
        import imageio.v2 as iio
        from stereovision_tpu.apps import serve

        frames = tmp_path / "frames"
        frames.mkdir()
        base = np.asarray(iio.imread(rig_store / "frames/left_001.png"))
        right = np.asarray(iio.imread(rig_store / "frames/right_001.png"))
        for i in range(3):
            iio.imwrite(frames / f"left_{i:03d}.png", base)
            iio.imwrite(frames / f"right_{i:03d}.png", right)
        out = io.StringIO()
        rc = serve.main([
            "--calib", str(rig_store / "calib"), "--num-disparities", "32",
            "--watch", str(frames), "--once", "--batch", "4",
            "--out", str(tmp_path / "out"), "--save-npz",
        ], stdin=io.StringIO(""), stdout=out)
        assert rc == 0
        resps = [json.loads(x) for x in out.getvalue().splitlines()]
        assert resps[-1]["frames"] == 3 and resps[-1]["fps"] > 0
        for i in range(3):
            z = np.load(tmp_path / "out" / f"serve_{i:03d}.npz")
            good = z["disparity"][z["valid"]]
            assert good.size and abs(np.median(good) - DISP) < 1.0
