"""Chessboard detection: saddle-point response → NMS → subpixel → grid order.

Replaces ``cv2.findChessboardCorners`` + ``cv2.cornerSubPix`` (reference
camera_calibration.py:65-74, stereo_calibration.py:147-168). The response, NMS
and subpixel refinement are batched device kernels (one ``vmap`` over an image
set replaces the reference's per-image Python loop); the combinatorial grid
ordering runs host-side on the handful of detected points (SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from stereovision_tpu.core import image as im


# ---------------------------------------------------------------------------
# Saddle response + NMS (device)
# ---------------------------------------------------------------------------


def corner_response(gray: jax.Array, sigma: float = 2.0) -> jax.Array:
    """Chessboard-corner (saddle-point) response: −det(Hessian) of the smoothed
    image, positive at X-junctions, ~0 elsewhere. (..., H, W) → same shape."""
    g = im.gaussian_blur(gray, int(2 * round(3 * sigma) + 1), sigma)
    gx, gy = im.sobel(g)
    gxx, gxy = im.sobel(gx)
    _, gyy = im.sobel(gy)
    return -(gxx * gyy - gxy * gxy)


def _nms_candidates(resp: np.ndarray, max_corners: int, radius: int = 5):
    """Host-side peak picking with radius suppression (tiny data)."""
    H, W = resp.shape
    thresh = resp.max() * 0.02
    # local maxima on 3x3
    r = np.asarray(resp)
    peak = (
        (r >= np.roll(r, 1, 0)) & (r >= np.roll(r, -1, 0))
        & (r >= np.roll(r, 1, 1)) & (r >= np.roll(r, -1, 1)) & (r > thresh)
    )
    ys, xs = np.nonzero(peak)
    vals = r[ys, xs]
    order = np.argsort(-vals)
    chosen = []
    taken = np.zeros((H, W), bool)
    for i in order:
        y, x = ys[i], xs[i]
        if taken[max(0, y - radius) : y + radius + 1, max(0, x - radius) : x + radius + 1].any():
            continue
        taken[y, x] = True
        chosen.append((x, y))
        if len(chosen) >= max_corners:
            break
    return np.asarray(chosen, np.float64).reshape(-1, 2)


def _ring_filter(gray: np.ndarray, cands: np.ndarray, radius: float = 4.5):
    """Keep only X-junction candidates.

    At a true chessboard inner corner the intensity on a ring is 180°-symmetric
    (s(θ) ≈ s(θ+π)) and 90°-antisymmetric (s(θ) far from s(θ+π/2)). Board-edge
    junctions and texture corners fail the symmetry test. (ChESS-style score.)
    """
    if len(cands) == 0:
        return cands
    n = 16
    ang = np.arange(n) * (2 * np.pi / n)
    dx = radius * np.cos(ang)
    dy = radius * np.sin(ang)
    H, W = gray.shape
    xs = np.clip(cands[:, 0:1] + dx[None, :], 0, W - 1.001)
    ys = np.clip(cands[:, 1:2] + dy[None, :], 0, H - 1.001)
    x0 = xs.astype(int)
    y0 = ys.astype(int)
    fx = xs - x0
    fy = ys - y0
    g = gray.astype(np.float64)
    s = (
        g[y0, x0] * (1 - fx) * (1 - fy)
        + g[y0, np.minimum(x0 + 1, W - 1)] * fx * (1 - fy)
        + g[np.minimum(y0 + 1, H - 1), x0] * (1 - fx) * fy
        + g[np.minimum(y0 + 1, H - 1), np.minimum(x0 + 1, W - 1)] * fx * fy
    )
    sym = np.abs(s - np.roll(s, n // 2, axis=1)).sum(axis=1)
    anti = np.abs(s - np.roll(s, n // 4, axis=1)).sum(axis=1)
    score = anti - 2.0 * sym
    return cands[score > 0.25 * np.median(anti)]


# ---------------------------------------------------------------------------
# Subpixel refinement (device, vmapped over corners) — cornerSubPix equivalent
# ---------------------------------------------------------------------------


def refine_corners_subpix(
    gray: jax.Array,
    corners: jax.Array,
    win: int = 11,
    iters: int = 30,
    eps: float = 1e-3,
) -> jax.Array:
    """Gradient-orthogonality subpixel refinement, the cv2.cornerSubPix model:
    at the true corner c, for every window point p, ∇I(p) ⊥ (p − c). Solve
    Σ w ∇I∇Iᵀ · c = Σ w (∇I∇Iᵀ) p  iteratively with a Gaussian window.

    gray: (H, W); corners: (N, 2) float pixel coords. Window semantics match
    cv2's winSize=(win, win) → (2·win+1)² neighborhood. Runs all corners and
    iterations as one jitted vmap/fori program.
    """
    gray = gray.astype(jnp.float32)
    gx, gy = im.sobel(gray)
    side = 2 * win + 1
    ys, xs = jnp.meshgrid(
        jnp.arange(side, dtype=jnp.float32) - win,
        jnp.arange(side, dtype=jnp.float32) - win,
        indexing="ij",
    )
    w = jnp.exp(-(xs**2 + ys**2) / (2 * (win / 2.0) ** 2))

    def sample(imgc, cx, cy):
        px = cx + xs
        py = cy + ys
        return im._bilinear_gather(imgc, px, py)

    def one_corner(c):
        def body(_, c):
            cx, cy = c[0], c[1]
            sgx = sample(gx, cx, cy)
            sgy = sample(gy, cx, cy)
            a = jnp.sum(w * sgx * sgx)
            b = jnp.sum(w * sgx * sgy)
            d = jnp.sum(w * sgy * sgy)
            bx = jnp.sum(w * (sgx * sgx * (cx + xs) + sgx * sgy * (cy + ys)))
            by = jnp.sum(w * (sgx * sgy * (cx + xs) + sgy * sgy * (cy + ys)))
            det = a * d - b * b
            ok = jnp.abs(det) > 1e-12
            nx = jnp.where(ok, (d * bx - b * by) / jnp.where(ok, det, 1.0), cx)
            ny = jnp.where(ok, (a * by - b * bx) / jnp.where(ok, det, 1.0), cy)
            # clamp step to the window (cv2 keeps iterates inside)
            nx = jnp.clip(nx, cx - win, cx + win)
            ny = jnp.clip(ny, cy - win, cy + win)
            return jnp.stack([nx, ny])

        return jax.lax.fori_loop(0, iters, body, c)

    return jax.vmap(one_corner)(corners.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Grid ordering (host, combinatorial)
# ---------------------------------------------------------------------------


def _order_grid(cands: np.ndarray, pattern: tuple[int, int]):
    """Order candidate corners into a (h, w) grid via extreme-corner homography.

    Maps the 4 extreme candidates to the unit grid's corners, projects all
    candidates into grid coordinates, snaps to integers, and checks that every
    cell is filled exactly once. Returns (w*h, 2) in row-major order (cv2
    convention: left→right within a row, top→bottom) or None.
    """
    w, h = pattern
    n = w * h
    if len(cands) < n:
        return None

    def try_assign(corners4):
        src = np.asarray(corners4, np.float64)
        dst = np.asarray([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]], np.float64)
        Hm = _homography_np(src, dst)
        if Hm is None:
            return None
        pts = np.concatenate([cands, np.ones((len(cands), 1))], axis=1) @ Hm.T
        g = pts[:, :2] / pts[:, 2:]
        snapped = np.round(g).astype(int)
        err = np.abs(g - snapped).max(axis=1)
        grid = -np.ones((h, w), int)
        for i in np.argsort(err):
            gx, gy = snapped[i]
            if 0 <= gx < w and 0 <= gy < h and grid[gy, gx] < 0 and err[i] < 0.3:
                grid[gy, gx] = i
        if (grid < 0).any():
            return None
        return cands[grid.reshape(-1)]

    # extreme corners by rotated projections (robust to tilt)
    best = None
    for ang in (0.0, np.pi / 8, -np.pi / 8):
        ca, sa = np.cos(ang), np.sin(ang)
        u = cands[:, 0] * ca + cands[:, 1] * sa
        v = -cands[:, 0] * sa + cands[:, 1] * ca
        tl = cands[np.argmin(u + v)]
        tr = cands[np.argmax(u - v)]
        br = cands[np.argmax(u + v)]
        bl = cands[np.argmin(u - v)]
        out = try_assign([tl, tr, br, bl])
        if out is not None:
            best = out
            break
        # also try the transposed pattern orientation
        out = try_assign([bl, tl, tr, br])
        if out is not None:
            best = out
            break
    return best


def _homography_np(src, dst):
    A = []
    for (x, y), (u, v) in zip(src, dst):
        A.append([x, y, 1, 0, 0, 0, -u * x, -u * y, -u])
        A.append([0, 0, 0, x, y, 1, -v * x, -v * y, -v])
    A = np.asarray(A)
    try:
        _, _, vt = np.linalg.svd(A)
    except np.linalg.LinAlgError:
        return None
    Hm = vt[-1].reshape(3, 3)
    if abs(Hm[2, 2]) < 1e-12:
        return None
    return Hm / Hm[2, 2]


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


def detect_chessboard(
    gray, pattern: tuple[int, int], subpix_win: int = 11, max_extra: int = 16
):
    """Find and order chessboard inner corners.

    gray: (H, W) array-like (float or uint8). pattern: (w, h) inner-corner
    counts, cv2 argument order. Returns (found: bool, corners (w*h, 2) float64
    row-major) — corner order matches cv2.findChessboardCorners followed by
    cornerSubPix (reference camera_calibration.py:65-74).
    """
    gray_np = np.asarray(gray, np.float32)
    gray_j = jnp.asarray(gray_np)
    w, h = pattern

    def attempt(img_np, img_j):
        resp = np.asarray(corner_response(img_j))
        cands = _nms_candidates(resp, w * h + max_extra)
        cands = _ring_filter(img_np, cands)
        if len(cands) < w * h:
            return None
        return _order_grid(cands, pattern)

    ordered = attempt(gray_np, gray_j)
    if ordered is None:
        # low-contrast / unevenly-lit fallback: retry on a locally contrast-
        # normalized image (the reference's ADAPTIVE_THRESH + NORMALIZE_IMAGE
        # re-detect, stereo_calibration.py:147-158); subpixel refinement still
        # runs on the ORIGINAL image below — normalization shifts gradients.
        norm_j = im.local_normalize(gray_j)
        ordered = attempt(np.asarray(norm_j), norm_j)
    if ordered is None:
        return False, None
    refined = np.asarray(
        refine_corners_subpix(gray_j, jnp.asarray(ordered), win=subpix_win)
    ).astype(np.float64)
    # normalize orientation: first corner should be the top-left one and rows
    # ordered top-to-bottom (cv2 may return either; our solver only needs a
    # consistent object-point correspondence, which row-major provides)
    return True, refined
