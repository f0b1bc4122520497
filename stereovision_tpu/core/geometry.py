"""Pure-jnp camera geometry: the numeric foundation of the whole engine.

Every residual function used by the calibration bundle-adjustment solvers lives
here, as do the closed-form rectification routines that replace
``cv2.stereoRectify`` / ``cv2.getOptimalNewCameraMatrix`` /
``cv2.initUndistortRectifyMap`` (reference call sites:
stereo_calibration.py:268-273, depth_map.py:625-638, 2camers.py:1196-1200).

Conventions (matching OpenCV so calibration artifacts are interchangeable):
- Camera matrix ``K = [[fx, 0, cx], [0, fy, cy], [0, 0, 1]]``.
- Distortion ``dist = (k1, k2, p1, p2, k3[, k4, k5, k6])`` — Brown–Conrady,
  optionally rational (8-coefficient); shorter vectors are zero-padded.
- ``R, T`` of a stereo pair map points from the *left* camera frame into the
  *right* camera frame: ``x_r = R @ x_l + T``.
- All functions are shape-polymorphic over leading batch dims where noted and
  are safe under ``jit`` / ``vmap`` / ``grad``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# SO(3) / SE(3)
# ---------------------------------------------------------------------------


def rodrigues(rvec: jax.Array) -> jax.Array:
    """Axis-angle vector (…, 3) → rotation matrix (…, 3, 3).

    Smooth at theta → 0 (uses a Taylor-safe branch), so it is differentiable
    everywhere — required by the LM solvers in ``calib.ba``.
    """
    rvec = jnp.asarray(rvec)
    theta2 = jnp.sum(rvec * rvec, axis=-1, keepdims=True)[..., None]  # (...,1,1)
    theta = jnp.sqrt(theta2)
    # sin(t)/t and (1-cos t)/t^2 with series fallbacks near zero.
    small = theta2 < 1e-12
    s = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    c = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    x, y, z = rvec[..., 0], rvec[..., 1], rvec[..., 2]
    zeros = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.eye(3, dtype=rvec.dtype)
    return eye + s * K + c * (K @ K)


def inverse_rodrigues(R: jax.Array) -> jax.Array:
    """Rotation matrix (…, 3, 3) → axis-angle vector (…, 3)."""
    R = jnp.asarray(R)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    # Generic case: v = 2 sin(t) * axis  →  rvec = theta * v / (2 sin t).
    generic = v * (theta / jnp.where(jnp.abs(sin_t) < 1e-7, 1.0, 2.0 * sin_t))[..., None]
    # Near theta = pi the vee vanishes; recover axis from the symmetric part.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.clip((diag + 1.0) * 0.5, 0.0, None)
    axis = jnp.sqrt(axis2)
    # Fix signs using off-diagonal sums (largest component taken positive).
    off = jnp.stack(
        [R[..., 0, 1] + R[..., 1, 0], R[..., 0, 2] + R[..., 2, 0], R[..., 1, 2] + R[..., 2, 1]],
        axis=-1,
    )
    imax = jnp.argmax(axis2, axis=-1)
    # Sign fix near pi: take component imax positive; give component j the sign
    # of sym[imax, j] (= 2 axis_i axis_j (1 − cos t), positive iff same sign).
    sym = R + jnp.swapaxes(R, -1, -2)
    idx = imax[..., None]
    row = jnp.take_along_axis(
        sym, jnp.broadcast_to(idx[..., None], sym[..., :1, :].shape), axis=-2
    )[..., 0, :]
    signs = jnp.where(row < 0, -1.0, 1.0)
    dominant_pos = jnp.take_along_axis(signs, idx, axis=-1) > 0
    signs = jnp.where(dominant_pos, signs, -signs)
    near_pi = axis * signs * theta[..., None]
    use_near_pi = (jnp.abs(sin_t) < 1e-7)[..., None] & (cos_t < 0)[..., None]
    del off
    return jnp.where(use_near_pi, near_pi, generic)


def se3_compose(r1, t1, r2, t2):
    """Compose two rigid transforms given as (rvec, tvec): x → R2(R1 x + t1) + t2."""
    R1, R2 = rodrigues(r1), rodrigues(r2)
    R = R2 @ R1
    t = (R2 @ t1[..., None])[..., 0] + t2
    return inverse_rodrigues(R), t


def se3_inverse(rvec, tvec):
    R = rodrigues(rvec)
    Rt = jnp.swapaxes(R, -1, -2)
    return inverse_rodrigues(Rt), -(Rt @ tvec[..., None])[..., 0]


# ---------------------------------------------------------------------------
# Distortion / projection
# ---------------------------------------------------------------------------


def pad_dist(dist: jax.Array, n: int = 8) -> jax.Array:
    """Zero-pad a distortion vector to ``n`` coefficients (k1 k2 p1 p2 k3 k4 k5 k6)."""
    dist = jnp.ravel(jnp.asarray(dist))
    return jnp.concatenate([dist, jnp.zeros(max(0, n - dist.shape[0]), dist.dtype)])[:n]


def distort(xy: jax.Array, dist: jax.Array) -> jax.Array:
    """Apply Brown–Conrady (+rational) distortion to normalized coords (…, 2)."""
    d = pad_dist(dist)
    k1, k2, p1, p2, k3, k4, k5, k6 = (d[i] for i in range(8))
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    radial = (1.0 + k1 * r2 + k2 * r4 + k3 * r6) / (1.0 + k4 * r2 + k5 * r4 + k6 * r6)
    xy2 = 2.0 * x * y
    xd = x * radial + p1 * xy2 + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + p2 * xy2
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(xy_d: jax.Array, dist: jax.Array, iters: int = 8) -> jax.Array:
    """Invert :func:`distort` by fixed-point iteration (cv2.undistortPoints-style).

    ``iters=8`` static iterations keep the op jit-friendly (no data-dependent
    control flow; cv2 uses 5 by default, fused_depth_map never tunes this).
    """
    # Fixed-point on the residual form cv2 uses: x = (x_d - dp) / radial.
    d8 = pad_dist(dist)
    k1, k2, p1, p2, k3, k4, k5, k6 = (d8[i] for i in range(8))

    def cv_body(_, xy):
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        r4, r6 = r2 * r2, r2 * r2 * r2
        inv_radial = (1.0 + k4 * r2 + k5 * r4 + k6 * r6) / (1.0 + k1 * r2 + k2 * r4 + k3 * r6)
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        xn = (xy_d[..., 0] - dx) * inv_radial
        yn = (xy_d[..., 1] - dy) * inv_radial
        return jnp.stack([xn, yn], axis=-1)

    return jax.lax.fori_loop(0, iters, cv_body, xy_d)


def project_points(
    obj_pts: jax.Array,
    rvec: jax.Array,
    tvec: jax.Array,
    K: jax.Array,
    dist: jax.Array,
) -> jax.Array:
    """World points (…, N, 3) → pixel coords (…, N, 2).

    This is the residual kernel of the calibration solvers — the jnp
    replacement for ``cv2.projectPoints`` (reference camera_calibration.py:205).
    """
    R = rodrigues(rvec)
    cam = obj_pts @ jnp.swapaxes(R, -1, -2) + tvec[..., None, :]
    z = cam[..., 2:3]
    xy = cam[..., :2] / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    xyd = distort(xy, dist)
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    u = xyd[..., 0] * fx[..., None] + cx[..., None]
    v = xyd[..., 1] * fy[..., None] + cy[..., None]
    return jnp.stack([u, v], axis=-1)


def undistort_points(pts: jax.Array, K: jax.Array, dist: jax.Array, R=None, P=None) -> jax.Array:
    """Pixel coords → undistorted coords (normalized, or pixels if ``P`` given).

    Mirrors ``cv2.undistortPoints(pts, K, dist, R=R, P=P)``.
    """
    inv_fx = 1.0 / K[0, 0]
    inv_fy = 1.0 / K[1, 1]
    xy_d = jnp.stack(
        [(pts[..., 0] - K[0, 2]) * inv_fx, (pts[..., 1] - K[1, 2]) * inv_fy], axis=-1
    )
    xy = undistort_normalized(xy_d, dist)
    if R is not None:
        v = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1) @ R.T
        xy = v[..., :2] / v[..., 2:3]
    if P is not None:
        P = jnp.asarray(P)
        u = xy[..., 0] * P[0, 0] + P[0, 2]
        v_ = xy[..., 1] * P[1, 1] + P[1, 2]
        xy = jnp.stack([u, v_], axis=-1)
    return xy


# ---------------------------------------------------------------------------
# Two-view geometry
# ---------------------------------------------------------------------------


def skew(t: jax.Array) -> jax.Array:
    x, y, z = t[..., 0], t[..., 1], t[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], axis=-1),
            jnp.stack([z, o, -x], axis=-1),
            jnp.stack([-y, x, o], axis=-1),
        ],
        axis=-2,
    )


def essential_from_rt(R: jax.Array, T: jax.Array) -> jax.Array:
    """E = [T]x R (cv2.stereoCalibrate convention: x_r = R x_l + T)."""
    return skew(T) @ R


def fundamental_from_krt(K1, K2, R, T):
    E = essential_from_rt(R, T)
    K2it = jnp.linalg.inv(K2).T
    K1i = jnp.linalg.inv(K1)
    return K2it @ E @ K1i


def triangulate(P1: jax.Array, P2: jax.Array, pts1: jax.Array, pts2: jax.Array) -> jax.Array:
    """Linear (DLT) triangulation. P1, P2: (3,4) projections; pts: (…, 2) pixels.

    Returns (…, 3) points in the frame the projection matrices map from.
    Solved via the normal equations of the 4×4 DLT system (eigvec of AᵀA),
    which vmaps cleanly on TPU (no per-point SVD).
    """
    rows = []
    for P, pts in ((P1, pts1), (P2, pts2)):
        u, v = pts[..., 0:1], pts[..., 1:2]
        rows.append(u * P[2] - P[0])
        rows.append(v * P[2] - P[1])
    A = jnp.stack(rows, axis=-2)  # (..., 4, 4)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    # Smallest eigenvector of the symmetric 4x4 system.
    w, V = jnp.linalg.eigh(AtA)
    X = V[..., :, 0]
    return X[..., :3] / jnp.where(jnp.abs(X[..., 3:]) < 1e-12, 1e-12, X[..., 3:])


def homography_dlt(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Direct linear transform homography from ≥4 correspondences.

    src, dst: (…, N, 2). Returns (…, 3, 3) with H[2,2] = 1. Uses Hartley
    normalization for conditioning; solved via eigh of AᵀA so it batches/vmaps
    (the batched-RANSAC hypothesis kernel in ``mono.ego`` calls this with N=4).
    """
    def normalize(p):
        mean = jnp.mean(p, axis=-2, keepdims=True)
        d = jnp.sqrt(jnp.sum((p - mean) ** 2, axis=-1, keepdims=True) + 1e-12)
        scale = jnp.sqrt(jnp.asarray(2.0, p.dtype)) / (jnp.mean(d, axis=-2, keepdims=True) + 1e-12)
        pn = (p - mean) * scale
        s = scale[..., 0, 0]
        mx, my = mean[..., 0, 0], mean[..., 0, 1]
        one = jnp.ones_like(s)
        zero = jnp.zeros_like(s)
        Tm = jnp.stack(
            [
                jnp.stack([s, zero, -s * mx], axis=-1),
                jnp.stack([zero, s, -s * my], axis=-1),
                jnp.stack([zero, zero, one], axis=-1),
            ],
            axis=-2,
        )
        return pn, Tm

    sn, Ts = normalize(src)
    dn, Td = normalize(dst)
    x, y = sn[..., 0], sn[..., 1]
    u, v = dn[..., 0], dn[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r1 = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y, -u], axis=-1)
    r2 = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y, -v], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # (..., 2N, 9)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    w, V = jnp.linalg.eigh(AtA)
    h = V[..., :, 0]
    Hn = h.reshape(*h.shape[:-1], 3, 3)
    H = jnp.linalg.inv(Td) @ Hn @ Ts
    return H / jnp.where(jnp.abs(H[..., 2:3, 2:3]) < 1e-12, 1e-12, H[..., 2:3, 2:3])


def apply_homography(H: jax.Array, pts: jax.Array) -> jax.Array:
    """pts (…, N, 2) → H·pts (…, N, 2). Replaces cv2.perspectiveTransform and the
    per-pixel Python loop at reference fused_depth_map.py:1490-1499 (one einsum)."""
    v = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    w = v @ jnp.swapaxes(H, -1, -2)
    return w[..., :2] / jnp.where(jnp.abs(w[..., 2:3]) < 1e-12, 1e-12, w[..., 2:3])


# ---------------------------------------------------------------------------
# Rectification (replaces cv2.stereoRectify / getOptimalNewCameraMatrix /
# initUndistortRectifyMap)
# ---------------------------------------------------------------------------


def _undistorted_border_extents(K, dist, size, R=None, P=None, n: int = 9):
    """Undistort an n×n pixel grid; return inner/outer rectangles (cv2 icvGetRectangles)."""
    w, h = size
    dtype = jnp.asarray(K).dtype
    xs = jnp.linspace(0.0, w - 1.0, n, dtype=dtype)
    ys = jnp.linspace(0.0, h - 1.0, n, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys)
    pts = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)
    und = undistort_points(pts, K, dist, R=R, P=P).reshape(n, n, 2)
    x, y = und[..., 0], und[..., 1]
    outer = (jnp.min(x), jnp.min(y), jnp.max(x), jnp.max(y))
    inner = (
        jnp.max(jnp.min(x, axis=1)),  # left edge of every row
        jnp.max(jnp.min(y, axis=0)),
        jnp.min(jnp.max(x, axis=1)),
        jnp.min(jnp.max(y, axis=0)),
    )
    return inner, outer


def get_optimal_new_camera_matrix(K, dist, size, alpha: float, new_size=None):
    """Free-scaling new camera matrix, mirroring cv2.getOptimalNewCameraMatrix.

    alpha=0 keeps only valid pixels; alpha=1 keeps all source pixels
    (2camers.py:1196 passes 1). Returns (newK, roi_xywh).
    """
    w, h = size
    nw, nh = new_size if new_size is not None else size
    inner, outer = _undistorted_border_extents(K, dist, size)
    ix0, iy0, ix1, iy1 = inner
    ox0, oy0, ox1, oy1 = outer
    # focal/center that map the inner rect exactly to the new image:
    fx0 = (nw - 1) / (ix1 - ix0)
    fy0 = (nh - 1) / (iy1 - iy0)
    cx0, cy0 = -fx0 * ix0, -fy0 * iy0
    # ... and the outer rect exactly:
    fx1 = (nw - 1) / (ox1 - ox0)
    fy1 = (nh - 1) / (oy1 - oy0)
    cx1, cy1 = -fx1 * ox0, -fy1 * oy0
    a = jnp.asarray(alpha, jnp.asarray(K).dtype)
    fx = fx0 * (1 - a) + fx1 * a
    fy = fy0 * (1 - a) + fy1 * a
    cx = cx0 * (1 - a) + cx1 * a
    cy = cy0 * (1 - a) + cy1 * a
    newK = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=jnp.asarray(K).dtype)
    # valid-pixel ROI: image of the inner rectangle under the new K
    rx0 = jnp.ceil(ix0 * fx + cx)
    ry0 = jnp.ceil(iy0 * fy + cy)
    rx1 = jnp.floor(ix1 * fx + cx)
    ry1 = jnp.floor(iy1 * fy + cy)
    rx0 = jnp.clip(rx0, 0, nw - 1)
    ry0 = jnp.clip(ry0, 0, nh - 1)
    roi = jnp.stack([rx0, ry0, jnp.clip(rx1 - rx0, 0, nw) , jnp.clip(ry1 - ry0, 0, nh)])
    return newK, roi


def stereo_rectify(K1, d1, K2, d2, size, R, T, alpha: float = -1.0, new_size=None):
    """Bouguet stereo rectification for horizontal stereo — the closed-form
    replacement for cv2.stereoRectify with CALIB_ZERO_DISPARITY (reference
    stereo_calibration.py:268-273 passes alpha=0; fused_depth_map.py:392-399
    passes alpha=0 + CALIB_ZERO_DISPARITY). ``alpha < 0`` means "no free-scaling
    adjustment" (cv2 default −1).

    Returns (R1, R2, P1, P2, Q).
    """
    dtype = jnp.asarray(K1).dtype
    K1 = jnp.asarray(K1, dtype)
    K2 = jnp.asarray(K2, dtype)
    R = jnp.asarray(R, dtype)
    T = jnp.ravel(jnp.asarray(T, dtype))
    w, h = size
    nw, nh = new_size if new_size is not None else size

    # 1. Split the relative rotation evenly between the two cameras:
    #    r_half = rot(-om/2) applied to cam2; cam1 gets rot(+om/2).
    om = inverse_rodrigues(R)
    r_half = rodrigues(-0.5 * om)
    t = r_half @ T

    # 2. Rotate (wR) so the baseline aligns with the x-axis (horizontal stereo).
    uu = jnp.array([1.0, 0.0, 0.0], dtype) * jnp.where(t[0] > 0, 1.0, -1.0)
    ww = jnp.cross(t, uu)
    nw_norm = jnp.linalg.norm(ww)
    nt = jnp.linalg.norm(t)
    angle = jnp.arccos(jnp.clip(jnp.abs(t[0]) / (nt + 1e-12), -1.0, 1.0))
    ww = ww * jnp.where(nw_norm > 1e-12, angle / (nw_norm + 1e-12), 0.0)
    wR = rodrigues(ww)

    R1 = wR @ jnp.swapaxes(r_half, -1, -2)  # == wR @ rot(+om/2) == R2 @ R
    R2 = wR @ r_half
    t_new = R2 @ T
    baseline = t_new[0]

    # 3. Shared focal: min over cameras of fy (adjusted down when k1 < 0,
    #    matching cv2's barrel-distortion heuristic).
    def fc_est(K, d):
        k1 = pad_dist(d)[0]
        fc = K[1, 1]
        return jnp.where(k1 < 0, fc * (1 + k1 * (w * w + h * h) / (4 * fc * fc)), fc)

    fc_new = jnp.minimum(fc_est(K1, d1), fc_est(K2, d2))

    # 4. Principal points: project the undistorted image corners through the
    #    rectifying rotation with (fc_new, cc=0) and center their mean.
    corners = jnp.array(
        [[0.0, 0.0], [w - 1.0, 0.0], [0.0, h - 1.0], [w - 1.0, h - 1.0]], dtype
    )

    def cc_for(K, d, Rrect):
        und = undistort_points(corners, K, d)  # normalized, undistorted
        v = jnp.concatenate([und, jnp.ones_like(und[..., :1])], axis=-1) @ Rrect.T
        proj = v[..., :2] / v[..., 2:3] * fc_new
        avg = jnp.mean(proj, axis=0)
        return jnp.array([(nw - 1) * 0.5, (nh - 1) * 0.5], dtype) - avg

    cc1 = cc_for(K1, d1, R1)
    cc2 = cc_for(K2, d2, R2)
    # CALIB_ZERO_DISPARITY: share the principal point between the cameras.
    cc = 0.5 * (cc1 + cc2)
    cx, cy = cc[0], cc[1]

    if alpha is not None and alpha >= 0:
        # Free-scaling: fit the inner (alpha=0) or outer (alpha=1) undistorted
        # rectangle into the new image around the fixed principal point.
        def newP(cck):
            return jnp.array(
                [[fc_new, 0, cck[0]], [0, fc_new, cck[1]], [0, 0, 1]], dtype
            )

        in1, out1 = _undistorted_border_extents(K1, d1, (w, h), R=R1, P=newP(cc))
        in2, out2 = _undistorted_border_extents(K2, d2, (w, h), R=R2, P=newP(cc))

        def s_terms(rect, ccx, ccy):
            x0, y0, x1, y1 = rect
            return jnp.stack(
                [ccx / (ccx - x0), ccy / (ccy - y0), (nw - ccx) / (x1 - ccx), (nh - ccy) / (y1 - ccy)]
            )

        s0 = jnp.maximum(jnp.max(s_terms(in1, cx, cy)), jnp.max(s_terms(in2, cx, cy)))
        s1 = jnp.minimum(jnp.min(s_terms(out1, cx, cy)), jnp.min(s_terms(out2, cx, cy)))
        a = jnp.clip(jnp.asarray(alpha, dtype), 0.0, 1.0)
        fc_new = fc_new * (s0 * (1 - a) + s1 * a)

    P1 = jnp.array(
        [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]], dtype
    )
    P1 = P1.at[0, 0].set(fc_new).at[1, 1].set(fc_new).at[0, 2].set(cx).at[1, 2].set(cy)
    P2 = P1.at[0, 3].set(baseline * fc_new)
    Q = jnp.zeros((4, 4), dtype)
    Q = (
        Q.at[0, 0].set(1.0).at[1, 1].set(1.0)
        .at[0, 3].set(-cx).at[1, 3].set(-cy)
        .at[2, 3].set(fc_new)
        .at[3, 2].set(-1.0 / baseline)
    )
    return R1, R2, P1, P2, Q


def init_undistort_rectify_map(K, dist, R, newP, size):
    """Build (map_x, map_y) float32 remap grids, mirroring
    cv2.initUndistortRectifyMap (reference depth_map.py:633-638).

    For each destination (rectified) pixel, computes the source pixel in the
    original distorted image. Feed the result to ``core.image.remap``.
    """
    w, h = size
    newP = jnp.asarray(newP)
    fx, fy = newP[0, 0], newP[1, 1]
    cx, cy = newP[0, 2], newP[1, 2]
    dtype = jnp.asarray(K).dtype
    u = (jnp.arange(w, dtype=dtype) - cx) / fx
    v = (jnp.arange(h, dtype=dtype) - cy) / fy
    gx, gy = jnp.meshgrid(u, v)  # (h, w)
    ones = jnp.ones_like(gx)
    rays = jnp.stack([gx, gy, ones], axis=-1)  # (h, w, 3)
    Rinv = jnp.linalg.inv(jnp.asarray(R, dtype))
    pts = rays @ Rinv.T
    xy = pts[..., :2] / jnp.where(jnp.abs(pts[..., 2:]) < 1e-12, 1e-12, pts[..., 2:])
    xyd = distort(xy, dist)
    map_x = xyd[..., 0] * K[0, 0] + K[0, 2]
    map_y = xyd[..., 1] * K[1, 1] + K[1, 2]
    return map_x.astype(jnp.float32), map_y.astype(jnp.float32)


def disparity_to_depth(disparity: jax.Array, focal_px: jax.Array, baseline: jax.Array) -> jax.Array:
    """depth = f·B / d (reference depth_map.py:915-926, with the eps guard)."""
    return focal_px * baseline / (disparity + 1e-6)


def reproject_image_to_3d(disparity: jax.Array, Q: jax.Array) -> jax.Array:
    """Disparity (H, W) + rectification Q (4, 4) → point cloud (H, W, 3),
    cv2.reprojectImageTo3D semantics ([x y d 1]ᵀ → Q·, dehomogenized). The Q
    matrix is part of the stereo calibration contract (§2.9) the reference
    stores but never consumes; here it closes the loop to metric 3-D."""
    H, W = disparity.shape
    xs = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
    ys = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
    vec = jnp.stack([xs, ys, disparity.astype(jnp.float32), jnp.ones_like(xs)], -1)
    out = vec @ jnp.asarray(Q, jnp.float32).T
    w = out[..., 3:4]
    return out[..., :3] / jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
