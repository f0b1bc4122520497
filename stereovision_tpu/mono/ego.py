"""Ego-motion estimation: batched-RANSAC homography fit to the flow field.

Replaces ``cv2.findHomography(RANSAC, 3.0, 2000, 0.995)`` +
``cv2.perspectiveTransform`` over every pixel (reference
fused_depth_map.py:1446-1499 — including the per-pixel Python loop at :1492,
which becomes one einsum here). RANSAC under jit is fixed-iteration: all
hypothesis minimal sets are drawn at once, all 4-point DLTs run as one batched
eigh, and inlier counting is one broadcast matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stereovision_tpu.core import geometry as geom


@functools.partial(jax.jit, static_argnames=("n_hyp", "refine_iters"))
def ransac_homography(
    src: jax.Array,
    dst: jax.Array,
    key: jax.Array,
    threshold: float = 3.0,
    n_hyp: int = 512,
    refine_iters: int = 2,
):
    """Fit dst ≈ H·src robustly. src/dst: (N, 2).

    Returns (H (3,3), inlier_mask (N,), n_inliers). Fixed n_hyp hypotheses
    (cv2's adaptive 2000-iteration loop converges to far fewer for the ≥50%
    inlier regimes the flow grid produces; 512 batched hypotheses exceed its
    coverage) followed by least-squares refits on the inlier set.
    """
    N = src.shape[0]
    idx = jax.random.randint(key, (n_hyp, 4), 0, N)
    Hs = geom.homography_dlt(src[idx], dst[idx])              # (n_hyp, 3, 3)
    proj = geom.apply_homography(Hs, src[None].repeat(n_hyp, 0))  # (n_hyp, N, 2)
    err2 = jnp.sum((proj - dst[None]) ** 2, axis=-1)
    inl = err2 < threshold * threshold
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    H = Hs[best]
    mask = inl[best]

    # iterative weighted refit on inliers (all points, zero-weighted outliers)
    def refit(_, carry):
        H, mask = carry
        w = mask.astype(src.dtype)
        Hn = _weighted_dlt(src, dst, w)
        proj = geom.apply_homography(Hn, src)
        err2 = jnp.sum((proj - dst) ** 2, axis=-1)
        return Hn, err2 < threshold * threshold

    H, mask = jax.lax.fori_loop(0, refine_iters, refit, (H, mask))
    return H, mask, jnp.sum(mask)


def _weighted_dlt(src, dst, w):
    """Weighted homography DLT (weights zero-out outliers)."""
    mean_w = jnp.sum(w) + 1e-9

    def norm(p):
        mean = jnp.sum(p * w[:, None], axis=0) / mean_w
        d = jnp.sqrt(jnp.sum((p - mean) ** 2, axis=-1) + 1e-12)
        scale = jnp.sqrt(jnp.asarray(2.0, p.dtype)) / (jnp.sum(d * w) / mean_w + 1e-12)
        T = jnp.array(
            [[scale, 0, -scale * mean[0]], [0, scale, -scale * mean[1]], [0, 0, 1.0]],
            p.dtype,
        )
        return (p - mean) * scale, T

    sn, Ts = norm(src)
    dn, Td = norm(dst)
    x, y = sn[:, 0], sn[:, 1]
    u, v = dn[:, 0], dn[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r1 = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y, -u], axis=-1)
    r2 = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y, -v], axis=-1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)
    AtA = A.T @ A
    _, V = jnp.linalg.eigh(AtA)
    Hn = V[:, 0].reshape(3, 3)
    H = jnp.linalg.inv(Td) @ Hn @ Ts
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, H[2, 2])


@functools.partial(jax.jit, static_argnames=("step", "min_inliers", "n_hyp"))
def estimate_ego_motion(
    flow: jax.Array,
    key: jax.Array,
    step: int = 16,
    threshold: float = 3.0,
    min_inliers: int = 15,
    n_hyp: int = 512,
):
    """Reference `_estimate_ego_motion` contract (fused_depth_map.py:1419-1499):
    sample the flow on a ``step``-px grid, RANSAC a homography from p → p+flow,
    and densify the predicted ego-flow for every pixel.

    Returns (valid: bool scalar, expected_flow (H, W, 2)).
    """
    H_img, W_img = flow.shape[0], flow.shape[1]
    ys = jnp.arange(step // 2, H_img, step)
    xs = jnp.arange(step // 2, W_img, step)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    pts = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1).astype(flow.dtype)
    vecs = flow[gy.reshape(-1), gx.reshape(-1)]
    nxt = pts + vecs
    Hm, mask, n_inl = ransac_homography(pts, nxt, key, threshold, n_hyp)
    valid = n_inl >= min_inliers
    # dense expected flow: one homography application over the pixel grid
    yy, xx = jnp.meshgrid(
        jnp.arange(H_img, dtype=flow.dtype), jnp.arange(W_img, dtype=flow.dtype), indexing="ij"
    )
    coords = jnp.stack([xx, yy], axis=-1)
    warped = geom.apply_homography(Hm, coords.reshape(-1, 2)).reshape(H_img, W_img, 2)
    expected = jnp.where(valid, warped - coords, jnp.zeros_like(coords))
    return valid, expected
