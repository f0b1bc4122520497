"""Fused-depth CLI — the offline replacement for fused_depth_map.py's main
loop (:2150-3399): occlusion detection with hysteresis → stereo + neural +
flow depth → range calibration → confidence-weighted fusion → metric legend,
with per-frame perf stats (the reference prints them every 30 frames,
:3129-3151). Thin wrapper over pipeline.FusedPipeline.

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

    import imageio.v2 as iio
    import jax.numpy as jnp

    from stereovision_tpu.core import image as im
    from stereovision_tpu.fusion.fuse import mode_text
    from stereovision_tpu.io.frames import PairedImageSource
    from stereovision_tpu.pipeline import FusedPipeline
    from stereovision_tpu.utils import StageTimer
    from stereovision_tpu.utils.annotate import draw_text

    pipe = FusedPipeline.from_store(
        args.calib, scale=args.scale,
        use_stereo=not args.no_stereo, use_midas=not args.no_midas,
        use_flow=not args.no_flow,
    )
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    timer = StageTimer(report_every=30)
    t_sim = 0.0
    n_out = 0
    for i, (left, right) in enumerate(PairedImageSource(args.images)):
        if i % args.skip_frames:
            continue
        t0 = time.perf_counter()
        t_sim += 0.033 * args.skip_frames
        with timer.stage("fused"):
            out = pipe(left, right, t_now=t_sim)
        timer.frame_done(time.perf_counter() - t0)
        if out is None:
            continue
        fused = out["fused"]
        mode = int(out["mode"])  # display-time sync, after dispatch
        moving = bool(out["camera_moving"]) if not args.no_flow else False
        cmap = im.apply_colormap(fused.astype(jnp.uint8), "jet", bgr=False)
        annotated = draw_text(
            np.asarray(cmap, np.uint8),
            [
                f"FUSED: {mode_text(mode, pipe.fusion_params, not args.no_midas, not args.no_flow)}",
                f"occlusion: {out['occlusion']}"
                + ("" if pipe.hysteresis.stereo_enabled else "  [stereo OFF]"),
                ("CAM MOVING" if moving else "STATIC")
                if not args.no_flow else "",
            ],
        )
        iio.imwrite(out_dir / f"fused_{i:04d}.png", annotated)
        np.savez(out_dir / f"fused_{i:04d}.npz", fused=np.asarray(fused),
                 conf=np.asarray(out["confidence"]), meters=np.asarray(out["meters"]),
                 mode=mode, occlusion=out["occlusion"])
        n_out += 1
        print(f"frame {i}: occl={out['occlusion']} mode={mode} "
              f"{(time.perf_counter()-t0)*1000:.0f} ms")
    print(json.dumps({"frames": n_out, **timer.report()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
