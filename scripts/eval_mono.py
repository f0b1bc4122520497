"""NN-only monocular depth quality report (VERDICT r2 #4 tail).

Scores the bundled mono-depth network alone — no stereo, no fusion — against
ground truth on (a) held-out procedural scenes from the training
distribution and (b) the stereo quality scenes' disparity ground truth
(disparity ∝ inverse depth, so the scale/shift-invariant metrics apply
directly). Metrics are the standard SSI ones: scale-and-shift-aligned RMSE
and δ<1.25 accuracy.

Usage: python scripts/eval_mono.py [--arch small|midas_v21_small] [--n 16]
Prints one JSON line per dataset.
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")


def ssi_metrics(pred, target, valid=None):
    """Least-squares scale+shift of pred onto target, then RMSE (relative to
    the target's std) and delta<1.25 on the aligned positive-depth ratio."""
    p = pred.ravel().astype(np.float64)
    t = target.ravel().astype(np.float64)
    if valid is not None:
        m = valid.ravel()
        p, t = p[m], t[m]
    A = np.stack([p, np.ones_like(p)], 1)
    (s, b), *_ = np.linalg.lstsq(A, t, rcond=None)
    pa = s * p + b
    rmse_rel = float(np.sqrt(np.mean((pa - t) ** 2)) / (t.std() + 1e-9))
    # delta on strictly positive parts only (inverse depth is >= 0)
    pos = (t > 1e-6) & (pa > 1e-6)
    if pos.any():
        r = np.maximum(pa[pos] / t[pos], t[pos] / pa[pos])
        delta = float((r < 1.25).mean())
    else:
        delta = float("nan")
    return {"ssi_rmse_rel": round(rmse_rel, 4), "delta_1.25": round(delta, 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="small")
    ap.add_argument("--n", type=int, default=16, help="held-out scenes")
    ap.add_argument("--seed", type=int, default=7_000_001,
                    help="far outside the training stream")
    args = ap.parse_args()

    import jax.numpy as jnp

    from stereovision_tpu.mono.nn import create_model, estimate_depth
    from stereovision_tpu.models.synthetic_scenes import make_scene

    model, variables = create_model(arch=args.arch)

    # (a) held-out procedural scenes
    rng = np.random.default_rng(args.seed)
    accs = []
    for _ in range(args.n):
        img, invd = make_scene(rng, 256)
        bgr = img[..., ::-1]
        d, _ = estimate_depth(model, variables, jnp.asarray(bgr))
        accs.append(ssi_metrics(np.asarray(d), invd))
    row = {"dataset": "procedural_heldout", "n": args.n, "arch": args.arch}
    for k in accs[0]:
        row[k] = round(float(np.mean([a[k] for a in accs])), 4)
    print(json.dumps(row), flush=True)

    # (b) the stereo quality scenes: gt disparity ∝ inverse depth
    import eval_quality as eq

    for name, fn in (("boxes", eq.scene_boxes), ("steps", eq.scene_steps)):
        srng = np.random.default_rng(42)
        left, _, gt, gtv = fn(srng, 360, 640)
        bgr = np.repeat(left[..., None], 3, axis=-1)
        d, _ = estimate_depth(model, variables, jnp.asarray(bgr))
        m = ssi_metrics(np.asarray(d), gt, valid=gtv)
        print(json.dumps({"dataset": f"stereo_scene_{name}", "arch": args.arch, **m}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
