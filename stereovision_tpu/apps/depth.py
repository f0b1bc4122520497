"""Depth-map CLI — the offline replacement for depth_map.py's live loop:
load stereo calibration → rectify pairs → disparity → metric depth →
colormapped dumps (reference depth_map.py:1029-1271; capture-to-disk 's' key
becomes the default behavior).

    python -m stereovision_tpu.apps.depth --calib output --images captures_stereo \
        --out depth_captures --min-depth 0.2 --max-depth 4.0
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(prog="stereovision_tpu.apps.depth")
    ap.add_argument("--calib", default="output")
    src_g = ap.add_mutually_exclusive_group(required=True)
    src_g.add_argument("--images", help="directory of left_*/right_* pairs")
    src_g.add_argument("--videos", nargs=2, metavar=("LEFT", "RIGHT"),
                       help="left/right video files (decoded via imageio-ffmpeg)")
    ap.add_argument("--video-step", type=int, default=1,
                    help="with --videos: process every Nth frame (the reference's SKIP_FRAMES lever)")
    ap.add_argument("--out", default="depth_captures")
    ap.add_argument("--num-disparities", type=int, default=320)
    ap.add_argument("--mode", choices=["full", "hier", "hier2", "prod"],
                    default="full",
                    help="hier = coarse-to-fine (~2.8x faster at 320 disparities); hier2 = dual-window coarse-to-fine (better at depth discontinuities); prod = the tuned production_preset (beats the cv2 reference on every quality scene)")
    ap.add_argument("--refine-range", type=int, default=32,
                    help="hier refine window (32 = pack=4 fast path)")
    ap.add_argument("--min-depth", type=float, default=0.2, help="meters (depth_map.py:1035)")
    ap.add_argument("--max-depth", type=float, default=4.0)
    ap.add_argument("--cmap", default="turbo", choices=["turbo", "jet"])
    ap.add_argument("--save-npz", action="store_true")
    ap.add_argument("--save-ply", action="store_true",
                    help="metric point cloud via the calibration Q matrix")
    ap.add_argument("--limit", type=int, default=0, help="process only the first N pairs")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from stereovision_tpu.core import geometry as geom
    from stereovision_tpu.core import image as im
    from stereovision_tpu.io.frames import PairedImageSource, VideoSource
    from stereovision_tpu.io.store import CalibrationStore
    from stereovision_tpu.stereo import SGMParams, compute_disparity

    store = CalibrationStore(args.calib)
    cal = store.load("stereo_calibration_data")
    size = tuple(int(v) for v in cal["img_size"])
    mx1, my1 = geom.init_undistort_rectify_map(
        jnp.asarray(cal["mtx_left"]), jnp.asarray(cal["dist_left"]).ravel(),
        jnp.asarray(cal["R1"]), jnp.asarray(cal["P1"]), size)
    mx2, my2 = geom.init_undistort_rectify_map(
        jnp.asarray(cal["mtx_right"]), jnp.asarray(cal["dist_right"]).ravel(),
        jnp.asarray(cal["R2"]), jnp.asarray(cal["P2"]), size)
    focal = float(np.asarray(cal["P1"])[0, 0])
    baseline_m = abs(float(np.asarray(cal["T"]).ravel()[0])) / 100.0  # cm → m

    if args.mode == "prod":
        from stereovision_tpu.stereo import production_preset

        params = production_preset()
        if args.num_disparities != 320:
            import dataclasses

            params = dataclasses.replace(
                params, num_disparities=args.num_disparities)
    else:
        params = SGMParams(num_disparities=args.num_disparities, mode=args.mode,
                           refine_range=args.refine_range)
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    import imageio.v2 as iio

    if args.videos:
        src = zip(
            VideoSource(args.videos[0], step=args.video_step),
            VideoSource(args.videos[1], step=args.video_step),
        )
    else:
        src = PairedImageSource(args.images)
    stats = []
    for i, (left, right) in enumerate(src):
        if args.limit and i >= args.limit:
            break
        t0 = time.perf_counter()
        lr = im.remap(jnp.asarray(left), mx1, my1)
        rr = im.remap(jnp.asarray(right), mx2, my2)
        disp, valid = compute_disparity(lr, rr, params)
        depth = geom.disparity_to_depth(disp, focal, baseline_m)
        depth = jnp.clip(depth, args.min_depth, args.max_depth)
        # validity mask exactly as the reference: disp > min_disp (depth_map.py:933)
        depth = jnp.where(valid, depth, 0.0)
        # near = warm: invert normalized depth for the colormap
        norm = (depth - args.min_depth) / (args.max_depth - args.min_depth)
        vis_u8 = jnp.clip((1.0 - norm) * 255.0, 0, 255).astype(jnp.uint8)
        cmap = im.apply_colormap(vis_u8, args.cmap, bgr=False)
        dt = time.perf_counter() - t0
        stats.append(dt)
        iio.imwrite(out_dir / f"depth_{i:04d}.png", np.asarray(cmap, np.uint8))
        if args.save_npz:
            np.savez(out_dir / f"depth_{i:04d}.npz", disparity=np.asarray(disp),
                     depth=np.asarray(depth), valid=np.asarray(valid))
        if args.save_ply:
            from stereovision_tpu.io.pointcloud import write_ply

            # Q is built from the cm-unit calibration (T in cm) → points in
            # cm; export meters (units converted exactly once, like depth)
            pts = geom.reproject_image_to_3d(disp, jnp.asarray(cal["Q"])) / 100.0
            n = write_ply(out_dir / f"depth_{i:04d}.ply", np.asarray(pts),
                          colors=np.asarray(jnp.clip(lr, 0, 255)),
                          valid=np.asarray(valid))
            print(f"  point cloud: {n} vertices")
        print(f"frame {i}: {dt*1000:.1f} ms, valid {float(jnp.mean(valid)):.0%}")
    if stats:
        print(json.dumps({"frames": len(stats), "mean_ms": 1000 * float(np.mean(stats[1:] or stats))}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
