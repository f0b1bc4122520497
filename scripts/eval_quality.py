"""Quality benchmark: this engine vs the reference cv2.StereoSGBM recipe on
synthetic 720p scenes with exact ground-truth disparity.

The reference publishes no accuracy numbers (SURVEY.md §6), so quality parity
is measured the way its outputs would be: both engines run the same
320-disparity search (reference recipe depth_map.py:894-909 for cv2; the
reference_preset knobs for ours) and are scored against ground truth with
standard stereo metrics (EPE over produced pixels, bad-N / D1 with rejected
pixels counted as errors — the Middlebury "all" protocol,
stereo.eval.evaluate_disparity).

Scenes:
- boxes:   shaded, textured fronto-parallel boxes over a far background;
           occluded bands (background pixels whose match the box overwrites)
           are excluded from gt_valid, like dataset "unknown" regions.
- slant:   a smoothly slanted surface (disparity linear in x and y) rendered
           by exact inverse warping — subpixel ground truth.
- steps:   a disparity staircase (depth discontinuities every 160 columns).

Usage: python scripts/eval_quality.py [--quick] [--modes hier,full]
Prints one table + one JSON line per (scene, engine).
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

D_SEARCH = 320


def _texture(rng, h, w, lo=40.0, hi=210.0):
    import cv2

    base = rng.uniform(lo, hi, (h, w)).astype(np.float32)
    base = cv2.GaussianBlur(base, (5, 5), 1.2)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base += 25 * np.sin(xx / 41.0) + 18 * np.cos(yy / 29.0)
    return base


def _render_layers(rng, layers, bg_d, H, W):
    """Exact layered stereo renderer. ``layers`` = [(y0, x0, h, w, d, tex)].
    Painter's algorithm far→near in BOTH views with per-pixel surface ids;
    a left pixel's ground truth is valid iff the right view shows the same
    surface at its match point (exact occlusion handling for any overlaps)."""
    pad = D_SEARCH
    canvas = _texture(rng, H, W + pad)
    # background at constant disparity bg_d: left[x] = canvas[x] matches
    # right[x − bg_d] = canvas[(x − bg_d) + bg_d]
    left = canvas[:, :W].copy()
    right = canvas[:, bg_d : bg_d + W].copy()
    lid = np.zeros((H, W), np.int32)
    rid = np.zeros((H, W), np.int32)
    gt = np.full((H, W), float(bg_d), np.float32)
    for i, (y0, x0, h, w, d, tex) in enumerate(
        sorted(layers, key=lambda t: t[4]), start=1
    ):
        assert 0 <= x0 - d and x0 + w <= W and y0 + h <= H, (y0, x0, h, w, d)
        left[y0 : y0 + h, x0 : x0 + w] = tex
        lid[y0 : y0 + h, x0 : x0 + w] = i
        gt[y0 : y0 + h, x0 : x0 + w] = d
        right[y0 : y0 + h, x0 - d : x0 - d + w] = tex
        rid[y0 : y0 + h, x0 - d : x0 - d + w] = i
    xs = np.arange(W)[None, :]
    rows = np.broadcast_to(np.arange(H)[:, None], (H, W))
    xr = xs - gt.astype(np.int32)
    in_img = xr >= 0
    gt_valid = in_img & (rid[rows, np.clip(xr, 0, W - 1)] == lid)
    gt_valid[:, : D_SEARCH] = False  # no in-image match guaranteed
    return left, right, gt, gt_valid


def scene_boxes(rng, H=720, W=1280):
    """Shaded fronto-parallel boxes over a far background."""
    bg_d = 24 * D_SEARCH // 320
    rel_boxes = [  # (y0, x0, h, w) as fractions; d as a fraction of D_SEARCH
        (0.08, 0.30, 0.30, 0.20, 0.20),
        (0.18, 0.48, 0.36, 0.23, 0.375),
        (0.60, 0.35, 0.28, 0.26, 0.56),
        (0.58, 0.64, 0.33, 0.25, 0.30),
        (0.06, 0.80, 0.21, 0.14, 0.47),
    ]
    layers = []
    for (fy, fx, fh, fw, fd) in rel_boxes:
        fy = fy + rng.uniform(-0.03, 0.03)
        fx = fx + rng.uniform(-0.03, 0.03)
        fd = float(np.clip(fd + rng.uniform(-0.08, 0.08), 0.12, 0.9))
        y0, x0, h, w = int(fy * H), int(fx * W), int(fh * H), int(fw * W)
        d = int(fd * D_SEARCH)
        x0 = max(x0, d)
        y0 = max(0, min(y0, H - h))
        tex = _texture(rng, h, w, 60, 230) * np.outer(
            np.linspace(1.0, 0.75, h), np.linspace(0.8, 1.1, w)
        ).astype(np.float32)
        layers.append((y0, x0, h, w, d, tex))
    return _render_layers(rng, layers, bg_d, H, W)


def scene_slant(rng, H=720, W=1280):
    """Disparity plane d = a + b·x + c·y, rendered by exact inverse warp:
    right[y, xr] = left[y, (xr + a + c·y)/(1 − b)] (subpixel bilinear)."""
    a, b, c = 40.0, 0.09, 0.04
    pad = 16
    Lw = W + pad
    left_full = _texture(rng, H, Lw)
    xr = np.arange(W, dtype=np.float32)[None, :]
    yy = np.arange(H, dtype=np.float32)[:, None]
    xs = (xr + a + c * yy) / (1.0 - b)  # left column sampled for right[y, xr]
    x0 = np.floor(xs).astype(np.int64)
    frac = (xs - x0).astype(np.float32)
    x0c = np.clip(x0, 0, Lw - 2)
    rows = np.broadcast_to(np.arange(H)[:, None], (H, W))
    right = (1 - frac) * left_full[rows, x0c] + frac * left_full[rows, x0c + 1]
    left = left_full[:, :W]
    gt = a + b * np.broadcast_to(xr, (H, W)) + c * yy
    gt_valid = (xr - gt >= 0) & (xs >= 0) & (xs <= Lw - 1)
    return left, right.astype(np.float32), gt.astype(np.float32), gt_valid


def scene_steps(rng, H=720, W=1280):
    """A disparity staircase along x (depth discontinuities every W/8 columns;
    the farthest level doubles as the background, so dis-occlusion gaps show
    plausible far texture)."""
    fracs = (0.09, 0.22, 0.34, 0.47, 0.59, 0.72, 0.59, 0.34)
    steps = [int(f * D_SEARCH) for f in fracs]
    bg_d = min(steps)
    seg = W // len(steps)
    layers = []
    for i, d in enumerate(steps):
        x0 = i * seg
        x1 = W if i == len(steps) - 1 else x0 + seg
        if d == bg_d:
            continue  # the background layer already covers it
        x0 = max(x0, d)  # keep the right-view footprint in-image
        tex = _texture(rng, H, x1 - x0)
        layers.append((0, x0, H, x1 - x0, d, tex))
    return _render_layers(rng, layers, bg_d, H, W)


def scene_gain(rng, H=720, W=1280):
    """The boxes scene with an exposure mismatch between the cameras (right
    gain 1.25x, offset +12, mild vignette) — the everyday failure mode of
    unsynchronized webcam auto-exposure (the reference pins EXPOSURE=0.1 at
    init, depth_map.py:727, but cannot hold the cameras identical). Census is
    invariant to monotonic local intensity maps; SGBM's BT cost is not."""
    left, right, gt, gt_valid = scene_boxes(rng, H, W)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    vign = 1.0 - 0.15 * (((xx / W - 0.5) ** 2 + (yy / H - 0.5) ** 2) * 2.0)
    right = np.clip(right * 1.25 * vign + 12.0, 0, 255).astype(np.float32)
    return left, right, gt, gt_valid


def run_reference(left, right):
    """The reference's exact disparity path (depth_map.py:894-912): SGBM
    recipe, /16, medianBlur 5; validity = disp > MIN_DISP (depth_map.py:933)."""
    import cv2

    sgbm = cv2.StereoSGBM_create(
        minDisparity=0, numDisparities=D_SEARCH, blockSize=7,
        P1=8 * 3 * 49, P2=32 * 3 * 49, disp12MaxDiff=1, uniquenessRatio=10,
        speckleWindowSize=100, speckleRange=32, preFilterCap=63,
        mode=cv2.STEREO_SGBM_MODE_SGBM_3WAY,
    )
    lu8 = np.clip(left, 0, 255).astype(np.uint8)
    ru8 = np.clip(right, 0, 255).astype(np.uint8)
    t0 = time.perf_counter()
    disp = sgbm.compute(lu8, ru8).astype(np.float32) / 16.0
    disp = cv2.medianBlur(disp, 5)
    dt = time.perf_counter() - t0
    return disp, disp > 0, dt


def run_ours(left, right, mode):
    import dataclasses

    import jax.numpy as jnp

    from stereovision_tpu.stereo import (
        compute_disparity, production_preset, reference_preset,
    )

    if mode.startswith("prod"):  # the headline configuration (bench.py);
        # "prod_cs4" etc. override coarse_scale for quality/speed trades
        import dataclasses

        p = production_preset()
        if mode == "prod_cp4":
            p = dataclasses.replace(p, coarse_paths=4)
        elif mode.startswith("prod_cs"):
            p = dataclasses.replace(p, coarse_scale=int(mode[7:]))
        elif mode == "prod_bfull":
            p = dataclasses.replace(p, b_decimate=1)
        disp, valid = compute_disparity(
            jnp.asarray(left), jnp.asarray(right), p
        )
        return np.asarray(disp), np.asarray(valid), None
    # mode "hier_r32" = hier with refine_range 32 (the pack=4 refine);
    # "hier_r32p2" additionally restricts the refine to horizontal paths
    refine = paths = None
    if "_r" in mode:
        mode, rr = mode.split("_r")
        if "p" in rr:
            rr, pp = rr.split("p")
            paths = int(pp)
        refine = int(rr)
    p = reference_preset(mode=mode)
    if refine is not None:
        p = dataclasses.replace(p, refine_range=refine)
    if paths is not None:
        p = dataclasses.replace(p, paths=paths)
    disp, valid = compute_disparity(jnp.asarray(left), jnp.asarray(right), p)
    d = np.asarray(disp)
    return d, np.asarray(valid), None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="360x640, D=128")
    ap.add_argument("--modes", default="hier", help="comma list: hier,full")
    ap.add_argument("--scenes", default="boxes,slant,steps,gain")
    ap.add_argument("--seeds", type=int, default=1, help="instances per scene (averaged)")
    args = ap.parse_args()
    global D_SEARCH
    H, W = 720, 1280
    if args.quick:
        H, W, D_SEARCH = 360, 640, 128

    from stereovision_tpu.stereo.eval import evaluate_disparity

    scenes = {"boxes": scene_boxes, "slant": scene_slant, "steps": scene_steps,
              "gain": scene_gain}
    rows = []
    for name in args.scenes.split(","):
        acc = {}
        for seed in range(args.seeds):
            rng = np.random.default_rng(42 + 1000 * seed)
            left, right, gt, gt_valid = scenes[name](rng, H, W)
            engines = [("cv2_sgbm_3way", lambda: run_reference(left, right))]
            for mode in args.modes.split(","):
                engines.append(
                    (f"ours_{mode}", lambda m=mode: run_ours(left, right, m))
                )
            for ename, fn in engines:
                disp, valid, _ = fn()
                m = evaluate_disparity(disp, gt, valid=valid, gt_valid=gt_valid)
                acc.setdefault(ename, []).append(m)
        for ename, ms in acc.items():
            m = {k: float(np.mean([x[k] for x in ms])) for k in ms[0]}
            row = {"scene": name, "engine": ename, **{k: round(v, 4) for k, v in m.items()}}
            rows.append(row)
            print(json.dumps(row))

    # summary table
    keys = ["coverage", "epe", "bad1", "bad2", "d1_all"]
    print(f"\n{'scene':>7} {'engine':>16} " + " ".join(f"{k:>8}" for k in keys))
    for r in rows:
        print(
            f"{r['scene']:>7} {r['engine']:>16} "
            + " ".join(f"{r.get(k, float('nan')):>8.4f}" for k in keys)
        )


if __name__ == "__main__":
    main()
