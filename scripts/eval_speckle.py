"""Windowed-vs-exact speckle filter comparison (VERDICT r2 #6).

The engine's on-device speckle suppression is a windowed upper-bound
approximation of cv2.filterSpeckles (stereo/sgm.py::_speckle_suppress);
the exact connected-component semantics live in native/speckle.cpp
(golden-tested vs cv2 in tests/test_native.py). This script quantifies the
difference on the four quality scenes: per-scene disagreement rate of the
validity masks (over-kill: windowed removes, exact keeps; under-kill: the
reverse) and the bad2 impact of each choice.

Usage: python scripts/eval_speckle.py [--mode hier2] [--quick]
Prints one JSON line per scene + a summary table.
"""

import argparse
import dataclasses
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="hier2")
    ap.add_argument("--quick", action="store_true", help="360x640, D=128")
    args = ap.parse_args()

    sys.path.insert(0, "scripts")
    import jax.numpy as jnp

    import eval_quality as eq
    from stereovision_tpu.stereo import compute_disparity, reference_preset
    from stereovision_tpu.stereo.eval import evaluate_disparity
    from stereovision_tpu.stereo.sgm import exact_speckle_postpass
    from stereovision_tpu.ops import native

    if not native.available():
        print(json.dumps({"error": "native library unavailable"}))
        return 1
    H, W = (360, 640) if args.quick else (720, 1280)
    if args.quick:
        eq.D_SEARCH = 128

    p_win = reference_preset(mode=args.mode)
    p_off = dataclasses.replace(p_win, speckle_window_size=0)

    scenes = {"boxes": eq.scene_boxes, "slant": eq.scene_slant,
              "steps": eq.scene_steps, "gain": eq.scene_gain}
    rows = []
    for name, fn in scenes.items():
        rng = np.random.default_rng(42)
        left, right, gt, gt_valid = fn(rng, H, W)
        lj, rj = jnp.asarray(left), jnp.asarray(right)
        # windowed (the production default)
        dw, vw = map(np.asarray, compute_disparity(lj, rj, p_win))
        # exact: same engine with speckle off + the native post-pass
        d0, v0 = map(np.asarray, compute_disparity(lj, rj, p_off))
        de, ve = exact_speckle_postpass(d0, p_win)

        over = v0 & ~vw & ve    # windowed killed, exact kept
        under = v0 & vw & ~ve   # windowed kept, exact killed
        mw = evaluate_disparity(dw, gt, valid=vw, gt_valid=gt_valid)
        me = evaluate_disparity(de, gt, valid=ve, gt_valid=gt_valid)
        # under-kill risk: of the pixels only the exact filter removed, how
        # many were actually wrong (>2 px)? (the speckles that slip through)
        under_bad = float((np.abs(dw - gt) > 2.0)[under & gt_valid].mean()) if (under & gt_valid).any() else 0.0
        row = {
            "scene": name,
            "disagree_frac": round(float((over | under).mean()), 6),
            "overkill_frac": round(float(over.mean()), 6),
            "underkill_frac": round(float(under.mean()), 6),
            "underkill_bad2_frac": round(under_bad, 4),
            "bad2_windowed": round(mw["bad2"], 5),
            "bad2_exact": round(me["bad2"], 5),
            "exact_removed": int((v0 & ~ve).sum()),
            "windowed_removed": int((v0 & ~vw).sum()),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    keys = ["disagree_frac", "overkill_frac", "underkill_frac",
            "bad2_windowed", "bad2_exact"]
    print(f"\n{'scene':>7} " + " ".join(f"{k:>16}" for k in keys))
    for r in rows:
        print(f"{r['scene']:>7} " + " ".join(f"{r[k]:>16.6f}" for k in keys))
    return 0


if __name__ == "__main__":
    sys.path.insert(0, "scripts")
    sys.exit(main())
