"""Calibration CLI — replaces the reference's calibration flow
(2camers.py 'C'/'S'/'U' hotkeys → camera_calibration.invoke /
stereo_calibration.calibrate / universal_stereo_calibration.calibrate).

Examples:
    python -m stereovision_tpu.apps.calibrate mono --images captures \
        --pattern left_*.jpg --side left --board 9x6 --square-cm 2.5 --out output
    python -m stereovision_tpu.apps.calibrate stereo --images captures_stereo \
        --board 9x6 --square-cm 2.5 --out output
    python -m stereovision_tpu.apps.calibrate universal --images captures \
        --board 9x6 --square-cm 2.5 --out output
"""

from __future__ import annotations

import argparse
import fnmatch
import sys
from pathlib import Path

import numpy as np


def board_object_points(pattern, square):
    w, h = pattern
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack([xs.ravel() * square, ys.ravel() * square, np.zeros(w * h)], -1)


def detect_in_directory(directory, glob, pattern, min_images, log=print):
    from stereovision_tpu.calib import detect_chessboard
    from stereovision_tpu.io.frames import _imread_gray

    files = sorted(p for p in Path(directory).iterdir() if fnmatch.fnmatch(p.name, glob))
    detected, used = [], []
    for p in files:
        found, corners = detect_chessboard(_imread_gray(p), pattern)
        log(f"  {p.name}: {'ok' if found else 'no board'}")
        if found:
            detected.append(corners)
            used.append(p)
    if len(detected) < min_images:
        raise SystemExit(
            f"need >= {min_images} boards, found {len(detected)} in {directory}"
        )
    return np.asarray(detected), used


def run_mono(args):
    from stereovision_tpu.calib import calibrate_camera
    from stereovision_tpu.io.store import CalibrationStore

    pattern = tuple(int(v) for v in args.board.split("x"))
    glob = args.pattern or f"{args.side}_*.jpg"
    corners, used = detect_in_directory(args.images, glob, pattern, args.min_images)
    size = _image_size(used[0])
    obj = board_object_points(pattern, args.square_cm)
    out = calibrate_camera(obj, corners, size)
    rms = out["reprojection_error"]
    # reference quality gates: success < 3.0; tiers 0.5 / 1.0 (2camers.py:505-509, 1390-1396)
    tier = "excellent" if rms < 0.5 else ("ok" if rms < 1.0 else "re-calibrate advised")
    print(f"RMS = {rms:.4f} px ({tier}); success gate <3.0: {'PASS' if rms < 3.0 else 'FAIL'}")
    store = CalibrationStore(args.out)
    store.save(f"calibration_data_{args.side}", {**out, "img_size": np.asarray(size)})
    if args.reference_pkl:
        store.save_reference_pkl(Path(args.out) / f"calibration_data_{args.side}.pkl", out)
    if args.dump_undistorted:
        _dump_undistorted(used, out, size, Path(args.out) / "undistorted")
    print(f"saved → {args.out}/calibration_data_{args.side}.npz")
    return 0 if rms < 3.0 else 1


def _dump_undistorted(files, cal, size, out_dir):
    """Per-image undistortion dumps (reference camera_calibration.py:122-178:
    getOptimalNewCameraMatrix(alpha=1) + undistort)."""
    import imageio.v2 as iio
    import jax.numpy as jnp

    from stereovision_tpu.core import geometry as geom
    from stereovision_tpu.core import image as im
    from stereovision_tpu.io.frames import _imread_gray

    out_dir.mkdir(parents=True, exist_ok=True)
    K = jnp.asarray(cal["camera_matrix"])
    dist = jnp.asarray(cal["distortion_coefficients"])
    newK, _ = geom.get_optimal_new_camera_matrix(K, dist, size, alpha=1.0)
    mx, my = geom.init_undistort_rectify_map(K, dist, jnp.eye(3), newK, size)
    for p in files:
        und = np.asarray(im.remap(jnp.asarray(_imread_gray(p)), mx, my))
        iio.imwrite(out_dir / f"undistorted_{p.name}.png",
                    np.clip(und, 0, 255).astype(np.uint8))


def _image_size(path):
    from stereovision_tpu.io.frames import _imread_gray

    img = _imread_gray(path)
    return (img.shape[1], img.shape[0])


def _detect_pairs(args, pattern, min_pairs):
    from stereovision_tpu.calib import detect_chessboard
    from stereovision_tpu.io.frames import PairedImageSource, _imread_gray

    src = PairedImageSource(args.images)
    cl, cr = [], []
    size = None
    for lp, rp in src.pairs():
        gl, gr = _imread_gray(lp), _imread_gray(rp)
        size = (gl.shape[1], gl.shape[0])
        fl, col_l = detect_chessboard(gl, pattern)
        fr, col_r = detect_chessboard(gr, pattern)
        print(f"  {lp.name}: {'ok' if fl and fr else 'skip'}")
        if fl and fr:
            cl.append(col_l)
            cr.append(col_r)
    if len(cl) < min_pairs:
        raise SystemExit(f"need >= {min_pairs} valid pairs, found {len(cl)}")
    return np.asarray(cl), np.asarray(cr), size


def run_stereo(args, universal=False):
    from stereovision_tpu.calib import CalibrationFlags, stereo_calibrate
    from stereovision_tpu.core import geometry as geom
    from stereovision_tpu.io.store import CalibrationStore
    import jax.numpy as jnp

    pattern = tuple(int(v) for v in args.board.split("x"))
    # reference: dependent stereo needs >=8 pairs, universal >=10
    cl, cr, size = _detect_pairs(args, pattern, 10 if universal else 8)
    obj = board_object_points(pattern, args.square_cm)
    store = CalibrationStore(args.out)

    if universal:
        out = stereo_calibrate(obj, cl, cr, size, flags=CalibrationFlags.UNIVERSAL)
        out["calibration_type"] = "universal_stereo"
    else:
        mono_l = store.load("calibration_data_left")
        mono_r = store.load("calibration_data_right")
        out = stereo_calibrate(
            obj, cl, cr, size,
            K1=mono_l["camera_matrix"], d1=mono_l["distortion_coefficients"],
            K2=mono_r["camera_matrix"], d2=mono_r["distortion_coefficients"],
            flags=CalibrationFlags(fix_intrinsic=True),
        )
    rms = out["ret"]
    baseline = float(np.linalg.norm(out["T"]))
    print(f"stereo RMS = {rms:.4f} px" + ("  [warn >1.0]" if rms > 1.0 else ""))
    print(f"baseline = {baseline:.2f} cm" + ("" if 1 <= baseline <= 50 else "  [outside 1–50 cm sanity window]"))

    R1, R2, P1, P2, Q = geom.stereo_rectify(
        jnp.asarray(out["mtx_left"]), jnp.asarray(out["dist_left"].ravel()),
        jnp.asarray(out["mtx_right"]), jnp.asarray(out["dist_right"].ravel()),
        size, jnp.asarray(out["R"]), jnp.asarray(out["T"].ravel()), alpha=0.0,
    )
    full = {
        **out,
        "R1": np.asarray(R1), "R2": np.asarray(R2),
        "P1": np.asarray(P1), "P2": np.asarray(P2), "Q": np.asarray(Q),
        "roi1": np.asarray([0, 0, *size]), "roi2": np.asarray([0, 0, *size]),
        "chessboard_size": np.asarray(pattern), "square_size": args.square_cm,
        "img_size": np.asarray(size),
    }
    store.save("stereo_calibration_data", {k: v for k, v in full.items() if not isinstance(v, str)})
    if args.reference_pkl:
        store.save_reference_pkl(Path(args.out) / "stereo_calibration_data.pkl", full)
    store.export_txt_sidecars("stereo_calibration_data")
    _write_rectification_check(args, full, size, scanlines=universal)
    # quantitative epipolar check (the reference's scanline image, measured)
    from stereovision_tpu.calib.verify import rectification_epipolar_error
    from stereovision_tpu.io.frames import PairedImageSource

    metrics = rectification_epipolar_error(
        full, iter(PairedImageSource(args.images)), pattern
    )
    if metrics.get("n_pairs"):
        print(
            f"rectification check: mean |Δy| = {metrics['mean_abs_dy']:.3f} px "
            f"(max {metrics['max_abs_dy']:.2f}) over {metrics['n_pairs']} pairs"
        )
    print(f"saved → {args.out}/stereo_calibration_data.npz")
    return 0


def _write_rectification_check(args, cal, size, scanlines: bool):
    """Side-by-side rectified first pair — the epipolar verification image
    (stereo_calibration.py:316-338); the universal variant overlays green
    scanlines every 50 px (universal_stereo_calibration.py:350-356)."""
    import imageio.v2 as iio
    import jax.numpy as jnp

    from stereovision_tpu.core import geometry as geom
    from stereovision_tpu.core import image as im
    from stereovision_tpu.io.frames import PairedImageSource, _imread_gray

    pairs = PairedImageSource(args.images).pairs()
    if not pairs:
        return
    lp, rp = pairs[0]
    gl, gr = _imread_gray(lp), _imread_gray(rp)
    mx1, my1 = geom.init_undistort_rectify_map(
        jnp.asarray(cal["mtx_left"]), jnp.asarray(np.ravel(cal["dist_left"])),
        jnp.asarray(cal["R1"]), jnp.asarray(cal["P1"]), size)
    mx2, my2 = geom.init_undistort_rectify_map(
        jnp.asarray(cal["mtx_right"]), jnp.asarray(np.ravel(cal["dist_right"])),
        jnp.asarray(cal["R2"]), jnp.asarray(cal["P2"]), size)
    rl = np.asarray(im.remap(jnp.asarray(gl), mx1, my1))
    rr = np.asarray(im.remap(jnp.asarray(gr), mx2, my2))
    side = np.concatenate([rl, rr], axis=1)
    rgb = np.stack([side] * 3, axis=-1)
    if scanlines:
        rgb[::50, :, :] = [0, 255, 0]
    iio.imwrite(Path(args.out) / "rectification_check.png",
                np.clip(rgb, 0, 255).astype(np.uint8))


def main(argv=None):
    # Calibration is offline host work: the LM solvers want f64 and the board
    # detector compiles several small programs — pin CPU unless asked
    # (on a TPU tunnel each accelerator compile costs minutes; the depth/fused
    # CLIs keep the accelerator where the per-frame engine earns it).
    import jax

    if "--accelerator" not in (argv or sys.argv):
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized by the caller
    jax.config.update("jax_enable_x64", True)
    ap = argparse.ArgumentParser(prog="stereovision_tpu.apps.calibrate")
    ap.add_argument("--accelerator", action="store_true",
                    help="run calibration math on the default accelerator")
    sub = ap.add_subparsers(dest="cmd", required=True)
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--images", required=True)
    common.add_argument("--board", default="9x6", help="inner corners WxH")
    common.add_argument("--square-cm", type=float, default=2.5)
    common.add_argument("--out", default="output")
    common.add_argument("--min-images", type=int, default=10)
    common.add_argument("--reference-pkl", action="store_true",
                        help="also write the reference's pickle format")
    m = sub.add_parser("mono", parents=[common])
    m.add_argument("--side", choices=["left", "right"], required=True)
    m.add_argument("--pattern", default=None, help="filename glob (default <side>_*.jpg)")
    m.add_argument("--dump-undistorted", action="store_true",
                   help="write alpha=1 undistorted copies (camera_calibration.py:122-178)")
    sub.add_parser("stereo", parents=[common])
    sub.add_parser("universal", parents=[common])
    args = ap.parse_args(argv)
    if args.cmd == "mono":
        return run_mono(args)
    return run_stereo(args, universal=(args.cmd == "universal"))


if __name__ == "__main__":
    sys.exit(main())
