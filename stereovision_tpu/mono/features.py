"""Sparse features: Harris corners + HOG descriptors + matching + two-view SfM.

BASELINE config 4 ("Harris/HOG tracking + two-view triangulation over an image
sequence") — the sparse, metric-scale-capable complement to the dense
flow-parallax estimator. TPU-first shapes throughout: fixed-size top-K corner
lists, descriptor matching as one MXU matmul, RANSAC as batched hypotheses,
triangulation as vmapped 4×4 eigensolves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stereovision_tpu.core import geometry as geom
from stereovision_tpu.core import image as im


# ---------------------------------------------------------------------------
# Harris corners (fixed-size top-K)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("max_corners", "nms_radius"))
def harris_corners(
    gray: jax.Array,
    max_corners: int = 512,
    k: float = 0.04,
    nms_radius: int = 4,
):
    """(H, W) → (pts (K, 2) float32 xy, scores (K,)); weak entries get score 0.

    Harris response det(M) − k·trace(M)², 3×3 NMS, then global top-K (a fixed
    K keeps every downstream shape static).
    """
    g = gray.astype(jnp.float32)
    gx, gy = im.sobel(im.gaussian_blur(g, 3))
    w = 2 * nms_radius + 1
    del w
    sxx = im.gaussian_blur(gx * gx, 5, 1.5)
    syy = im.gaussian_blur(gy * gy, 5, 1.5)
    sxy = im.gaussian_blur(gx * gy, 5, 1.5)
    resp = sxx * syy - sxy * sxy - k * (sxx + syy) ** 2
    # NMS: keep only local maxima over the (2r+1)² window
    win = im._window_stack(resp, 2 * nms_radius + 1)
    is_max = resp >= jnp.max(win, axis=-1)
    resp = jnp.where(is_max, resp, -jnp.inf)
    # suppress borders (descriptor patches must fit)
    H, W = g.shape
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    margin = 12
    inside = (ys >= margin) & (ys < H - margin) & (xs >= margin) & (xs < W - margin)
    resp = jnp.where(inside, resp, -jnp.inf)
    flat = resp.reshape(-1)
    scores, idx = jax.lax.top_k(flat, max_corners)
    pts = jnp.stack([(idx % W).astype(jnp.float32), (idx // W).astype(jnp.float32)], -1)
    valid = jnp.isfinite(scores) & (scores > 0)
    return pts, jnp.where(valid, scores, 0.0)


# ---------------------------------------------------------------------------
# HOG-style descriptors
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("patch", "cells", "bins"))
def hog_descriptors(
    gray: jax.Array, pts: jax.Array, patch: int = 16, cells: int = 4, bins: int = 8
):
    """(K, 2) keypoints → (K, cells²·bins) L2-normalized HOG descriptors."""
    g = gray.astype(jnp.float32)
    gx, gy = im.sobel(g)
    mag = jnp.hypot(gx, gy)
    ang = jnp.arctan2(gy, gx)  # [-pi, pi]
    bin_idx = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * bins).astype(jnp.int32) % bins

    half = patch // 2
    dy, dx = jnp.meshgrid(
        jnp.arange(patch, dtype=jnp.float32) - half,
        jnp.arange(patch, dtype=jnp.float32) - half,
        indexing="ij",
    )

    def one(pt):
        px = jnp.clip((pt[0] + dx).astype(jnp.int32), 0, g.shape[1] - 1)
        py = jnp.clip((pt[1] + dy).astype(jnp.int32), 0, g.shape[0] - 1)
        m = mag[py, px]                                   # (patch, patch)
        b = bin_idx[py, px]
        cell = patch // cells
        cy = (jnp.arange(patch) // cell)[:, None]
        cx = (jnp.arange(patch) // cell)[None, :]
        cell_id = cy * cells + cx                         # (patch, patch)
        slot = cell_id * bins + b
        hist = jnp.zeros((cells * cells * bins,), jnp.float32).at[
            slot.reshape(-1)
        ].add(m.reshape(-1))
        return hist / (jnp.linalg.norm(hist) + 1e-6)

    return jax.vmap(one)(pts)


# ---------------------------------------------------------------------------
# Matching (one matmul) + two-view reconstruction
# ---------------------------------------------------------------------------


@jax.jit
def match_descriptors(d1: jax.Array, d2: jax.Array, s1: jax.Array, s2: jax.Array,
                      ratio: float = 0.8):
    """Mutual-nearest matching with Lowe's ratio test.

    d1 (K, F), d2 (K, F), scores gate dead slots. Returns (idx2_for_1 (K,),
    valid (K,)): descriptor i of view 1 matches idx2_for_1[i] of view 2.
    Similarity matrix is one MXU matmul (descriptors are L2-normalized).
    """
    sim = d1 @ d2.T                                       # (K, K) cosine
    dead = (s1[:, None] <= 0) | (s2[None, :] <= 0)
    sim = jnp.where(dead, -2.0, sim)
    best2 = jnp.argmax(sim, axis=1)
    top = jnp.max(sim, axis=1)
    second = jnp.max(
        jnp.where(jax.nn.one_hot(best2, sim.shape[1], dtype=bool), -2.0, sim), axis=1
    )
    # cosine → distance ratio test: require dist1 < ratio·dist2
    d_top = jnp.sqrt(jnp.maximum(2.0 - 2.0 * top, 0.0))
    d_second = jnp.sqrt(jnp.maximum(2.0 - 2.0 * second, 0.0))
    mutual = jnp.argmax(sim, axis=0)[best2] == jnp.arange(sim.shape[0])
    valid = mutual & (d_top < ratio * d_second) & (s1 > 0)
    return best2, valid


def _essential_from_8pt(x1n, x2n, weights=None):
    """Normalized 8-point: x1n/x2n (…, N, 2) normalized coords → E (…, 3, 3)."""
    u1, v1 = x1n[..., 0], x1n[..., 1]
    u2, v2 = x2n[..., 0], x2n[..., 1]
    one = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], axis=-1
    )  # (..., N, 9)
    if weights is not None:
        A = A * weights[..., None]
    AtA = jnp.swapaxes(A, -1, -2) @ A
    _, V = jnp.linalg.eigh(AtA)
    E = V[..., :, 0].reshape(*AtA.shape[:-2], 3, 3)
    # rank-2 projection with equal singular values (essential constraint)
    U, s, Vt = jnp.linalg.svd(E)
    s2 = jnp.stack([jnp.ones_like(s[..., 0]), jnp.ones_like(s[..., 0]), jnp.zeros_like(s[..., 0])], -1)
    return U @ (s2[..., None] * Vt)


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def ransac_essential(x1n, x2n, valid, key, threshold: float = 2e-3, n_hyp: int = 256):
    """Batched-RANSAC essential matrix on normalized coords (K, 2).

    Sampson error threshold in normalized units (~ px / focal). Returns
    (E, inlier_mask).
    """
    K = x1n.shape[0]
    w = valid.astype(jnp.float32)
    # sample valid indices with replacement, biased away from dead slots
    probs = w / (jnp.sum(w) + 1e-6)
    idx = jax.random.choice(key, K, shape=(n_hyp, 8), p=probs)
    Es = _essential_from_8pt(x1n[idx], x2n[idx])          # (n_hyp, 3, 3)

    def sampson(E):
        x1h = jnp.concatenate([x1n, jnp.ones((K, 1))], -1)
        x2h = jnp.concatenate([x2n, jnp.ones((K, 1))], -1)
        Ex1 = x1h @ E.T
        Etx2 = x2h @ E
        num = jnp.sum(x2h * Ex1, axis=-1) ** 2
        den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
        return num / (den + 1e-12)

    errs = jax.vmap(sampson)(Es)                          # (n_hyp, K)
    inl = (errs < threshold * threshold) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    E, mask = Es[best], inl[best]
    # all-inlier least-squares refits (a minimal 8-point fit is noisy)
    for _ in range(2):
        E = _essential_from_8pt(x1n, x2n, weights=mask.astype(x1n.dtype))
        mask = (sampson(E) < threshold * threshold) & valid
    return E, mask


@jax.jit
def recover_pose_and_triangulate(E, x1n, x2n, inliers):
    """Decompose E → (R, t) with the cheirality test; triangulate inliers.

    Returns (R, t_unit, points3d (K, 3), depth_valid (K,)) — scale is
    unobservable from two views (t has unit norm), matching monocular SfM.
    """
    U, _, Vt = jnp.linalg.svd(E)
    d = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    U = U * jnp.where(d < 0, -1.0, 1.0)
    Wm = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    Rs = jnp.stack([U @ Wm @ Vt, U @ Wm.T @ Vt])
    ts = jnp.stack([U[:, 2], -U[:, 2]])
    eye34 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)

    def count_front(R, t):
        P2 = jnp.concatenate([R, t[:, None]], axis=1)
        X = geom.triangulate(eye34, P2, x1n, x2n)
        z1 = X[:, 2]
        z2 = (X @ R.T + t)[:, 2]
        ok = (z1 > 0) & (z2 > 0) & inliers
        return jnp.sum(ok), X

    counts = []
    Xs = []
    for i in range(2):
        for j in range(2):
            c, X = count_front(Rs[i], ts[j])
            counts.append(c)
            Xs.append((i, j, X))
    counts = jnp.stack(counts)
    bi = jnp.argmax(counts)
    R = jnp.stack([Rs[i] for i, j, _ in Xs])[bi]
    t = jnp.stack([ts[j] for i, j, _ in Xs])[bi]
    X = jnp.stack([X for _, _, X in Xs])[bi]
    z2 = (X @ R.T + t)[:, 2]
    good = inliers & (X[:, 2] > 0) & (z2 > 0)
    return R, t, X, good


def sparse_motion_depth(prev_gray, gray, K_cam, key, max_corners: int = 512):
    """Full sparse pipeline: corners → descriptors → match → E-RANSAC → pose +
    triangulated sparse depth (up to the monocular scale).

    Returns dict(pts_prev, pts_curr, depth (K,), valid (K,), R, t_unit).
    """
    p1, s1 = harris_corners(prev_gray, max_corners)
    p2, s2 = harris_corners(gray, max_corners)
    d1 = hog_descriptors(prev_gray, p1)
    d2 = hog_descriptors(gray, p2)
    midx, mvalid = match_descriptors(d1, d2, s1, s2)
    q2 = p2[midx]
    Kinv_fx = 1.0 / K_cam[0, 0]
    Kinv_fy = 1.0 / K_cam[1, 1]
    x1n = jnp.stack([(p1[:, 0] - K_cam[0, 2]) * Kinv_fx, (p1[:, 1] - K_cam[1, 2]) * Kinv_fy], -1)
    x2n = jnp.stack([(q2[:, 0] - K_cam[0, 2]) * Kinv_fx, (q2[:, 1] - K_cam[1, 2]) * Kinv_fy], -1)
    E, inl = ransac_essential(x1n, x2n, mvalid, key)
    R, t, X, good = recover_pose_and_triangulate(E, x1n, x2n, inl)
    return {
        "pts_prev": p1,
        "pts_curr": q2,
        "points3d": X,
        "depth": X[:, 2],
        "valid": good,
        "R": R,
        "t_unit": t,
    }
