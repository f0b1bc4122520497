"""Neural mono-depth demo CLI — replaces MONO/mono_depth_map_ai.py:
per-frame MiDaS-class inference with the reference's near=warm TURBO
visualization (double inversion, :129-154).

    python -m stereovision_tpu.apps.mono_ai --images frames/ --out mono_ai_out
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(prog="stereovision_tpu.apps.mono_ai")
    ap.add_argument("--images", required=True)
    ap.add_argument("--out", default="mono_ai_out")
    ap.add_argument("--glob", default="*.jpg")
    # the reference demo's model selection (MONO/mono_depth_map_ai.py:24-69:
    # MiDaS_small vs DPT_Large); --checkpoint loads a real torch state_dict
    # through the manifest-validated port path of the chosen architecture
    ap.add_argument("--arch", default="small",
                    choices=("small", "midas_v21_small", "dpt_large"))
    ap.add_argument("--checkpoint", default=None,
                    help="torch .pt state_dict for midas_v21_small/dpt_large")
    args = ap.parse_args(argv)

    import fnmatch

    import imageio.v2 as iio
    import jax.numpy as jnp

    from stereovision_tpu.core import image as im
    from stereovision_tpu.io.frames import _imread_bgr
    from stereovision_tpu.mono.nn import create_model, estimate_depth

    model, variables = create_model(
        arch=args.arch, torch_state_dict=args.checkpoint
    )
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(
        p for p in Path(args.images).iterdir() if fnmatch.fnmatch(p.name, args.glob)
    )
    for i, p in enumerate(files):
        frame = _imread_bgr(p)
        depth, _ = estimate_depth(model, variables, jnp.asarray(frame))
        vis = im.apply_colormap((255 - depth).astype(jnp.uint8), "turbo", bgr=False)
        iio.imwrite(out_dir / f"depth_{i:04d}.png", np.asarray(vis, np.uint8))
        print(f"{p.name} → depth_{i:04d}.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
