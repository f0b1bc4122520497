"""Fused-depth CLI — the offline replacement for fused_depth_map.py's main
loop (:2150-3399): occlusion detection with hysteresis → stereo + neural +
flow depth → range calibration → confidence-weighted fusion → metric legend,
with per-frame perf stats (the reference prints them every 30 frames,
:3129-3151).

    python -m stereovision_tpu.apps.fused --calib output --images captures_stereo \
        --out fused_out --scale 0.33
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(prog="stereovision_tpu.apps.fused")
    ap.add_argument("--calib", default="output")
    ap.add_argument("--images", required=True)
    ap.add_argument("--out", default="fused_out")
    ap.add_argument("--scale", type=float, default=0.33, help="PROCESSING_SCALE (:39)")
    ap.add_argument("--no-stereo", action="store_true")
    ap.add_argument("--no-midas", action="store_true")
    ap.add_argument("--no-flow", action="store_true")
    ap.add_argument("--skip-frames", type=int, default=1,
                    help="process every Nth frame (reference SKIP_FRAMES=3)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from stereovision_tpu.core import geometry as geom
    from stereovision_tpu.core import image as im
    from stereovision_tpu.fusion import (
        FusionParams, OcclusionHysteresis, calibrate_midas_to_stereo,
        classify_occlusion, fuse_depth_maps, fused_to_meters,
        normalize_to_stereo_range, occlusion_scores,
    )
    from stereovision_tpu.io.frames import PairedImageSource
    from stereovision_tpu.io.store import CalibrationStore
    from stereovision_tpu.mono import flow_depth_init, flow_depth_step, FlowDepthParams
    from stereovision_tpu.mono.nn import create_model, estimate_depth
    from stereovision_tpu.stereo import SGMParams, disparity_with_confidence

    store = CalibrationStore(args.calib)
    cal = store.load("stereo_calibration_data")
    size = tuple(int(v) for v in cal["img_size"])
    # scaled intrinsics (reference load_stereo_calibration_with_scaling :307-442)
    s = args.scale
    proc = (max(32, int(size[0] * s)) // 2 * 2, max(32, int(size[1] * s)) // 2 * 2)
    K1 = np.asarray(cal["mtx_left"], np.float64).copy()
    K2 = np.asarray(cal["mtx_right"], np.float64).copy()
    for K in (K1, K2):
        K[0] *= proc[0] / size[0]
        K[1] *= proc[1] / size[1]
    R1, R2, P1, P2, Q = geom.stereo_rectify(
        jnp.asarray(K1), jnp.asarray(cal["dist_left"]).ravel(),
        jnp.asarray(K2), jnp.asarray(cal["dist_right"]).ravel(),
        proc, jnp.asarray(cal["R"]), jnp.asarray(cal["T"]).ravel(), alpha=0.0,
    )
    mx1, my1 = geom.init_undistort_rectify_map(
        jnp.asarray(K1), jnp.asarray(cal["dist_left"]).ravel(), R1, P1, proc)
    mx2, my2 = geom.init_undistort_rectify_map(
        jnp.asarray(K2), jnp.asarray(cal["dist_right"]).ravel(), R2, P2, proc)
    focal = float(np.asarray(P1)[0, 0])
    baseline_cm = abs(float(np.asarray(cal["T"]).ravel()[0]))

    # SGBM param rescale rule (reference :2258-2266)
    num_disp = max(16, int(320 * s) // 16 * 16)
    sgm = SGMParams(num_disparities=num_disp)
    fusion_params = FusionParams()
    hysteresis = OcclusionHysteresis()

    model = variables = None
    if not args.no_midas:
        model, variables = create_model()
    flow_state = flow_depth_init((proc[1], proc[0])) if not args.no_flow else None

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    import imageio.v2 as iio

    timings = {"stereo": [], "midas": [], "flow": [], "total": []}
    src = PairedImageSource(args.images)
    t_sim = 0.0
    for i, (left, right) in enumerate(src):
        if i % args.skip_frames:
            continue
        t_total = time.perf_counter()
        lr = im.remap(im.resize(jnp.asarray(left), (proc[1], proc[0])), mx1, my1)
        rr = im.remap(im.resize(jnp.asarray(right), (proc[1], proc[0])), mx2, my2)

        # occlusion check every 2nd frame with hysteresis (:2515-2571)
        if i % 2 == 0:
            ls, rs = occlusion_scores(lr, rr)
            state = hysteresis.update(classify_occlusion(float(ls), float(rs)))
        else:
            state = hysteresis.state
        use_stereo = (not args.no_stereo) and hysteresis.stereo_enabled

        stereo_disp = stereo_conf = None
        if use_stereo:
            t0 = time.perf_counter()
            stereo_disp, stereo_conf = disparity_with_confidence(lr, rr, sgm)
            timings["stereo"].append(time.perf_counter() - t0)
            stereo_norm = jnp.clip(
                (stereo_disp - sgm.min_disparity) / sgm.num_disparities * 255.0, 0, 255
            )

        midas_cal = midas_conf = None
        if model is not None:
            t0 = time.perf_counter()
            frame_bgr = jnp.stack([lr] * 3, axis=-1)
            midas_depth, midas_conf = estimate_depth(model, variables, frame_bgr)
            if stereo_disp is not None:
                midas_cal = calibrate_midas_to_stereo(midas_depth, stereo_norm, stereo_conf)
            else:
                midas_cal = midas_depth
            timings["midas"].append(time.perf_counter() - t0)

        flow_norm = None
        camera_moving = False
        if flow_state is not None:
            t0 = time.perf_counter()
            # flow runs on the unoccluded camera (:2637-2648)
            src_img = rr if state == "left" else lr
            t_sim += 0.033 * args.skip_frames
            flow_state, flow_depth, has_flow, moving = flow_depth_step(
                flow_state, src_img, jnp.float32(t_sim), FlowDepthParams()
            )
            camera_moving = bool(moving)
            if bool(has_flow):
                ref_range = stereo_norm if stereo_disp is not None else flow_depth
                flow_norm = normalize_to_stereo_range(flow_depth, ref_range)
            timings["flow"].append(time.perf_counter() - t0)

        have_stereo = stereo_disp is not None
        have_midas = midas_cal is not None
        have_flow = flow_norm is not None
        if not (have_stereo or have_midas or have_flow):
            continue
        fused, fconf, mode = fuse_depth_maps(
            stereo_norm if have_stereo else None, stereo_conf,
            midas_cal, midas_conf, flow_norm,
            jnp.asarray(camera_moving), fusion_params,
            have_stereo=have_stereo, have_midas=have_midas, have_flow=have_flow,
        )
        meters = fused_to_meters(fused, focal, baseline_cm,
                                 num_disparities=float(sgm.num_disparities))
        cmap = im.apply_colormap(fused.astype(jnp.uint8), "jet", bgr=False)
        # HUD overlay: mode string + occlusion + motion status (reference
        # fuse_depth_maps annotation block and status line :2864-2907)
        from stereovision_tpu.fusion.fuse import mode_text
        from stereovision_tpu.utils.annotate import draw_text

        annotated = draw_text(
            np.asarray(cmap, np.uint8),
            [
                f"FUSED: {mode_text(int(mode), fusion_params, have_midas, have_flow)}",
                f"occlusion: {state}" + ("" if hysteresis.stereo_enabled else "  [stereo OFF]"),
                ("CAM MOVING" if camera_moving else "STATIC") if have_flow else "",
            ],
        )
        iio.imwrite(out_dir / f"fused_{i:04d}.png", annotated)
        np.savez(out_dir / f"fused_{i:04d}.npz", fused=np.asarray(fused),
                 conf=np.asarray(fconf), meters=np.asarray(meters),
                 mode=int(mode), occlusion=state)
        timings["total"].append(time.perf_counter() - t_total)
        print(f"frame {i}: occl={state} mode={int(mode)} "
              f"{timings['total'][-1]*1000:.0f} ms")

    summary = {
        k: round(1000 * float(np.mean(v[1:] or v)), 1) if v else None
        for k, v in timings.items()
    }
    summary["fps"] = round(1.0 / np.mean(timings["total"][1:]), 2) if len(timings["total"]) > 1 else None
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
