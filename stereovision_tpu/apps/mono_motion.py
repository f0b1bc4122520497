"""Motion-parallax mono-depth demo CLI — replaces
MONO/mono_depth_map_with_motion.py: sequential frames → flow/ego-motion
parallax depth with the reference's 3/97-percentile normalize + inverted
TURBO visualization (:384-402).

    python -m stereovision_tpu.apps.mono_motion --images frames/ --out mono_motion_out
"""

from __future__ import annotations

import argparse
import fnmatch
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(prog="stereovision_tpu.apps.mono_motion")
    ap.add_argument("--images", required=True)
    ap.add_argument("--out", default="mono_motion_out")
    ap.add_argument("--glob", default="*.jpg")
    ap.add_argument("--fps", type=float, default=30.0, help="assumed timestamp spacing")
    args = ap.parse_args(argv)

    import imageio.v2 as iio
    import jax.numpy as jnp

    from stereovision_tpu.core import image as im
    from stereovision_tpu.io.frames import _imread_gray
    from stereovision_tpu.mono import FlowDepthParams, flow_depth_init, flow_depth_step

    files = sorted(
        p for p in Path(args.images).iterdir() if fnmatch.fnmatch(p.name, args.glob)
    )
    if not files:
        raise SystemExit(f"no frames matching {args.glob} in {args.images}")
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    first = _imread_gray(files[0])
    state = flow_depth_init(first.shape)
    params = FlowDepthParams()
    for i, p in enumerate(files):
        gray = _imread_gray(p)
        state, depth, has, moving = flow_depth_step(
            state, jnp.asarray(gray), jnp.float32(i / args.fps), params
        )
        status = "MOVING" if bool(moving) else "STATIC"
        if bool(has):
            norm = im.percentile_normalize(depth, 3.0, 97.0)
            vis_u8 = ((1.0 - norm) * 255.0).astype(jnp.uint8)  # inverted TURBO
            vis = im.apply_colormap(vis_u8, "turbo", bgr=False)
            iio.imwrite(out_dir / f"motion_{i:04d}.png", np.asarray(vis, np.uint8))
        print(f"{p.name}: {status}{'' if bool(has) else ' (no depth)'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
