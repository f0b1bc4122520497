"""Procedural (image, inverse-depth) scene generator for offline pretraining.

The reference downloads MiDaS weights from torch-hub at runtime
(fused_depth_map.py:1091-1098); this deployment is offline, so the bundled
weights are trained here on procedurally generated layered scenes. The
generator provides real monocular cues: texture density scales with depth
(perspective foreshortening), objects occlude what is behind them, and
brightness/contrast are randomized independently of depth so the network
cannot shortcut on intensity.
"""

from __future__ import annotations

import numpy as np


def make_scene(rng: np.random.Generator, size: int = 128):
    """Returns (image (S, S, 3) float32 0..255, inv_depth (S, S) float32)."""
    S = size
    depth = np.empty((S, S), np.float32)
    img = np.empty((S, S, 3), np.float32)

    def textured(region_hw, d):
        """Texture whose spatial frequency scales with depth (farther = finer)."""
        h, w = region_hw
        # base texture tile at a resolution ∝ 1/d — then upsampled
        scale = float(np.clip(8.0 / d, 0.15, 4.0))
        th = max(2, int(h * scale))
        tw = max(2, int(w * scale))
        base = rng.uniform(0, 1, (th, tw))
        ys = (np.arange(h) * th / h).astype(int)
        xs = (np.arange(w) * tw / w).astype(int)
        tex = base[np.ix_(ys, xs)]
        lo, hi = sorted(rng.uniform(0, 255, 2))
        if hi - lo < 40:
            hi = lo + 40
        rgb = lo + tex[..., None] * (hi - lo)
        tint = rng.uniform(0.6, 1.0, 3)
        return (rgb * tint).astype(np.float32)

    bg_d = rng.uniform(8.0, 24.0)
    depth[:] = bg_d
    img[:] = textured((S, S), bg_d)

    # layered objects, far → near (painter's algorithm)
    n_obj = rng.integers(3, 9)
    ds = np.sort(rng.uniform(1.5, bg_d * 0.9, n_obj))[::-1]
    for d in ds:
        # nearer objects are bigger on average (weak size cue)
        ext = int(np.clip(rng.uniform(0.15, 0.5) * S * (3.0 / d) ** 0.3, 8, S * 0.7))
        y0 = rng.integers(0, S - ext)
        x0 = rng.integers(0, S - ext)
        h = ext
        w = int(ext * rng.uniform(0.6, 1.6))
        w = min(w, S - x0)
        patch = textured((h, w), d)
        if rng.uniform() < 0.4:
            # elliptical mask
            yy, xx = np.mgrid[0:h, 0:w]
            mask = ((yy - h / 2) / (h / 2)) ** 2 + ((xx - w / 2) / (w / 2)) ** 2 <= 1
        else:
            mask = np.ones((h, w), bool)
        region = np.s_[y0 : y0 + h, x0 : x0 + w]
        img[region][mask] = patch[mask]
        depth[region][mask] = d

    # global photometric jitter independent of depth
    gain = rng.uniform(0.6, 1.3)
    bias = rng.uniform(-20, 30)
    img = np.clip(img * gain + bias, 0, 255)
    noise = rng.normal(0, rng.uniform(0.5, 3.0), img.shape)
    img = np.clip(img + noise, 0, 255).astype(np.float32)
    return img, (1.0 / depth).astype(np.float32)


def batch(rng: np.random.Generator, n: int, size: int = 128):
    imgs = np.empty((n, size, size, 3), np.float32)
    invd = np.empty((n, size, size), np.float32)
    for i in range(n):
        imgs[i], invd[i] = make_scene(rng, size)
    return imgs, invd
