"""Calibration as batched Levenberg–Marquardt bundle adjustment.

Replaces ``cv2.calibrateCamera`` and ``cv2.stereoCalibrate`` (reference
camera_calibration.py:96-98, stereo_calibration.py:229-244,
universal_stereo_calibration.py:207-242). The residual model is
``core.geometry.project_points`` (pinhole + Brown–Conrady), so the recovered
parameters are drop-in compatible with the reference's pkl artifacts.

Design: the residual and its Jacobian are jitted JAX functions (jacfwd over a
~100-parameter vector — calibration problems are small; the *distributed*
multi-frame BA with Schur reduction lives in ``parallel.ba``); the LM damping
schedule is a host loop. OpenCV's flag set maps to freeze masks and parameter
ties (CALIB_FIX_INTRINSIC, FIX_ASPECT_RATIO, SAME_FOCAL_LENGTH,
ZERO_TANGENT_DIST, FIX_K3 — the exact sets used at stereo_calibration.py:213
and universal_stereo_calibration.py:207-212).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from stereovision_tpu.core import geometry as geom


@dataclasses.dataclass(frozen=True)
class CalibrationFlags:
    """OpenCV-equivalent calibration constraints."""

    fix_intrinsic: bool = False      # CALIB_FIX_INTRINSIC (stereo)
    fix_aspect_ratio: bool = False   # fy/fx kept at its initial ratio
    same_focal_length: bool = False  # stereo: both cameras share fx, fy
    fix_principal_point: bool = False
    zero_tangent_dist: bool = False  # p1 = p2 = 0
    fix_k: tuple = (False, False, False)  # freeze k1/k2/k3 at init (usually 0)

    UNIVERSAL = None  # set below


CalibrationFlags.UNIVERSAL = CalibrationFlags(
    fix_aspect_ratio=True,
    same_focal_length=True,
    zero_tangent_dist=True,
    fix_k=(False, False, True),  # FIX_K3 (K4/K5 absent from the 5-coef model)
)

# intrinsics vector layout per camera: [fx, fy, cx, cy, k1, k2, p1, p2, k3]
_NI = 9


def _intrinsics_mask(flags: CalibrationFlags) -> np.ndarray:
    m = np.ones(_NI)
    if flags.fix_intrinsic:
        m[:] = 0
    if flags.fix_aspect_ratio:
        m[1] = 0  # fy derived from fx
    if flags.fix_principal_point:
        m[2:4] = 0
    if flags.zero_tangent_dist:
        m[6:8] = 0
    for i, fk in enumerate(flags.fix_k):
        if fk:
            m[4 if i == 0 else (5 if i == 1 else 8)] = 0
    return m


def _unpack_K_dist(v):
    K = jnp.array([[v[0], 0.0, v[2]], [0.0, v[1], v[3]], [0.0, 0.0, 1.0]], v.dtype)
    return K, v[4:9]


# ---------------------------------------------------------------------------
# Levenberg–Marquardt core
# ---------------------------------------------------------------------------


def _lm(residual_fn, theta0, free_mask, iters=50, tol=1e-10):
    """Masked dense LM. residual_fn: θ → (R,); returns (θ*, rms_proxy_cost)."""
    res_j = jax.jit(residual_fn)
    jac_j = jax.jit(jax.jacfwd(residual_fn))
    theta = jnp.asarray(theta0)
    mask = jnp.asarray(free_mask, theta.dtype)
    r = res_j(theta)
    cost = float(r @ r)
    lam = 1e-3
    n = theta.shape[0]
    eye = jnp.eye(n, dtype=theta.dtype)
    for _ in range(iters):
        J = jac_j(theta) * mask[None, :]
        JtJ = J.T @ J
        g = J.T @ r
        accepted = False
        for _ in range(12):
            damp = lam * jnp.diag(jnp.clip(jnp.diag(JtJ), 1e-8, None)) + 1e-12 * eye
            # frozen params: keep the system nonsingular
            damp = damp + (1.0 - mask) * eye
            try:
                delta = jnp.linalg.solve(JtJ + damp, g)
            except Exception:
                lam *= 10
                continue
            theta_new = theta - delta * mask
            r_new = res_j(theta_new)
            cost_new = float(r_new @ r_new)
            if np.isfinite(cost_new) and cost_new < cost:
                rel = (cost - cost_new) / max(cost, 1e-30)
                theta, r, cost = theta_new, r_new, cost_new
                lam = max(lam * 0.3, 1e-12)
                accepted = True
                if rel < tol:
                    return theta, cost
                break
            lam *= 10
        if not accepted:
            break
    return theta, cost


# ---------------------------------------------------------------------------
# Zhang initialization (host-side numpy; feeds the LM)
# ---------------------------------------------------------------------------


def _homographies(obj_xy, img_pts):
    Hs = []
    for v in range(img_pts.shape[0]):
        H = np.asarray(geom.homography_dlt(jnp.asarray(obj_xy), jnp.asarray(img_pts[v])))
        Hs.append(H)
    return np.asarray(Hs)


def _zhang_intrinsics(Hs, size):
    def vij(H, i, j):
        return np.array(
            [
                H[0, i] * H[0, j],
                H[0, i] * H[1, j] + H[1, i] * H[0, j],
                H[1, i] * H[1, j],
                H[2, i] * H[0, j] + H[0, i] * H[2, j],
                H[2, i] * H[1, j] + H[1, i] * H[2, j],
                H[2, i] * H[2, j],
            ]
        )

    rows = []
    for H in Hs:
        rows.append(vij(H, 0, 1))
        rows.append(vij(H, 0, 0) - vij(H, 1, 1))
    A = np.asarray(rows)
    try:
        _, s, vt = np.linalg.svd(A)
        b = vt[-1]
        B11, B12, B22, B13, B23, B33 = b
        v0 = (B12 * B13 - B11 * B23) / (B11 * B22 - B12**2)
        lam = B33 - (B13**2 + v0 * (B12 * B13 - B11 * B23)) / B11
        alpha2 = lam / B11
        beta2 = lam * B11 / (B11 * B22 - B12**2)
        if alpha2 <= 0 or beta2 <= 0:
            raise np.linalg.LinAlgError
        alpha = np.sqrt(alpha2)
        beta = np.sqrt(beta2)
        gamma = -B12 * alpha2 * beta / lam
        u0 = gamma * v0 / beta - B13 * alpha2 / lam
        K = np.array([[alpha, 0.0, u0], [0.0, beta, v0], [0.0, 0.0, 1.0]])
        w, h = size
        if not (0 < u0 < w and 0 < v0 < h and 0.2 * w < alpha < 10 * w):
            raise np.linalg.LinAlgError
        return K
    except np.linalg.LinAlgError:
        w, h = size
        f = 1.2 * max(w, h)
        return np.array([[f, 0.0, (w - 1) / 2], [0.0, f, (h - 1) / 2], [0.0, 0.0, 1.0]])


def _pose_from_homography(H, K):
    Kinv = np.linalg.inv(K)
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 1.0 / np.linalg.norm(Kinv @ h1)
    r1 = lam * (Kinv @ h1)
    r2 = lam * (Kinv @ h2)
    t = lam * (Kinv @ h3)
    r3 = np.cross(r1, r2)
    R = np.stack([r1, r2, r3], axis=1)
    u, _, vt = np.linalg.svd(R)
    R = u @ vt
    if np.linalg.det(R) < 0:
        R = -R
    if t[2] < 0:  # board must be in front of the camera
        R[:, 0] *= -1
        R[:, 1] *= -1
        t = -t
    rvec = np.asarray(geom.inverse_rodrigues(jnp.asarray(R)))
    return rvec, t


# ---------------------------------------------------------------------------
# Mono calibration
# ---------------------------------------------------------------------------


def calibrate_camera(
    obj_pts,
    img_pts,
    image_size,
    flags: CalibrationFlags = CalibrationFlags(),
    iters: int = 50,
):
    """cv2.calibrateCamera equivalent.

    obj_pts: (N, 3) board points (z=0 plane, same for all views) or (V, N, 3);
    img_pts: (V, N, 2) detected corners; image_size: (w, h).
    Returns dict(camera_matrix, distortion_coefficients, rotation_vectors,
    translation_vectors, reprojection_error) — the reference pkl schema
    (camera_calibration.py:101-111).
    """
    obj_pts = np.asarray(obj_pts, np.float64)
    img_pts = np.asarray(img_pts, np.float64)
    if obj_pts.ndim == 2:
        obj = obj_pts
    else:
        obj = obj_pts[0]
    V, N = img_pts.shape[0], img_pts.shape[1]

    Hs = _homographies(obj[:, :2], img_pts)
    K0 = _zhang_intrinsics(Hs, image_size)
    poses = np.asarray([np.concatenate(_pose_from_homography(H, K0)) for H in Hs])

    intr0 = np.array([K0[0, 0], K0[1, 1], K0[0, 2], K0[1, 2], 0, 0, 0, 0, 0], np.float64)
    theta0 = np.concatenate([intr0, poses.reshape(-1)])
    mask = np.concatenate([_intrinsics_mask(flags), np.ones(6 * V)])
    aspect = intr0[1] / intr0[0]

    obj_j = jnp.asarray(obj)
    img_j = jnp.asarray(img_pts)

    def residual(theta):
        intr = theta[:_NI]
        if flags.fix_aspect_ratio:
            intr = intr.at[1].set(intr[0] * aspect)
        K, dist = _unpack_K_dist(intr)
        pv = theta[_NI:].reshape(V, 6)
        proj = geom.project_points(obj_j[None], pv[:, :3], pv[:, 3:], K[None], dist)
        return (proj - img_j).reshape(-1)

    theta, cost = _lm(residual, theta0, mask, iters=iters)
    theta = np.asarray(theta)
    intr = theta[:_NI].copy()
    if flags.fix_aspect_ratio:
        intr[1] = intr[0] * aspect
    K = np.array([[intr[0], 0, intr[2]], [0, intr[1], intr[3]], [0, 0, 1]])
    dist = intr[4:9]
    poses = theta[_NI:].reshape(V, 6)
    rms = float(np.sqrt(cost / (V * N)))
    return {
        "camera_matrix": K,
        "distortion_coefficients": dist,
        "rotation_vectors": poses[:, :3],
        "translation_vectors": poses[:, 3:],
        "reprojection_error": rms,
    }


# ---------------------------------------------------------------------------
# Stereo calibration
# ---------------------------------------------------------------------------


def stereo_calibrate(
    obj_pts,
    img_pts_left,
    img_pts_right,
    image_size,
    K1=None,
    d1=None,
    K2=None,
    d2=None,
    flags: CalibrationFlags = CalibrationFlags(fix_intrinsic=True),
    iters: int = 60,
):
    """cv2.stereoCalibrate equivalent (both the FIX_INTRINSIC mode used by
    stereo_calibration.py:213 and the joint "universal" mode,
    universal_stereo_calibration.py:207-212, via CalibrationFlags.UNIVERSAL).

    Returns dict(ret=rms, R, T, E, F, mtx_left, dist_left, mtx_right,
    dist_right) in the reference's stereo pkl field names (§2.9).
    """
    obj = np.asarray(obj_pts, np.float64)
    if obj.ndim == 3:
        obj = obj[0]
    imL = np.asarray(img_pts_left, np.float64)
    imR = np.asarray(img_pts_right, np.float64)
    V, N = imL.shape[0], imL.shape[1]
    w, h = image_size

    HsL = _homographies(obj[:, :2], imL)
    HsR = _homographies(obj[:, :2], imR)
    if K1 is None:
        K1 = _zhang_intrinsics(HsL, image_size)
        d1 = np.zeros(5)
    if K2 is None:
        K2 = _zhang_intrinsics(HsR, image_size) if not flags.same_focal_length else K1.copy()
        d2 = np.zeros(5)
    K1, K2 = np.asarray(K1, np.float64), np.asarray(K2, np.float64)
    d1 = np.ravel(np.asarray(d1, np.float64))[:5]
    d2 = np.ravel(np.asarray(d2, np.float64))[:5]
    d1 = np.pad(d1, (0, 5 - len(d1)))
    d2 = np.pad(d2, (0, 5 - len(d2)))

    posesL = [np.concatenate(_pose_from_homography(H, K1)) for H in HsL]
    posesR = [np.concatenate(_pose_from_homography(H, K2)) for H in HsR]
    # stereo transform init: median of per-view relative transforms
    Rs, Ts = [], []
    for pl, pr in zip(posesL, posesR):
        Rl = np.asarray(geom.rodrigues(jnp.asarray(pl[:3])))
        Rr = np.asarray(geom.rodrigues(jnp.asarray(pr[:3])))
        R_rel = Rr @ Rl.T
        T_rel = pr[3:] - R_rel @ pl[3:]
        Rs.append(np.asarray(geom.inverse_rodrigues(jnp.asarray(R_rel))))
        Ts.append(T_rel)
    r_st = np.median(np.asarray(Rs), axis=0)
    t_st = np.median(np.asarray(Ts), axis=0)

    intr1 = np.concatenate([[K1[0, 0], K1[1, 1], K1[0, 2], K1[1, 2]], d1])
    intr2 = np.concatenate([[K2[0, 0], K2[1, 1], K2[0, 2], K2[1, 2]], d2])
    theta0 = np.concatenate([r_st, t_st, intr1, intr2, np.asarray(posesL).reshape(-1)])
    im_mask = _intrinsics_mask(flags)
    mask = np.concatenate([np.ones(6), im_mask, im_mask, np.ones(6 * V)])
    aspect1 = intr1[1] / intr1[0]
    aspect2 = intr2[1] / intr2[0]

    obj_j = jnp.asarray(obj)
    imL_j = jnp.asarray(imL)
    imR_j = jnp.asarray(imR)

    def residual(theta):
        r_s, t_s = theta[0:3], theta[3:6]
        i1 = theta[6 : 6 + _NI]
        i2 = theta[6 + _NI : 6 + 2 * _NI]
        if flags.fix_aspect_ratio:
            i1 = i1.at[1].set(i1[0] * aspect1)
            i2 = i2.at[1].set(i2[0] * aspect2)
        if flags.same_focal_length:
            i2 = i2.at[0].set(i1[0]).at[1].set(i1[1])
        Ka, da = _unpack_K_dist(i1)
        Kb, db = _unpack_K_dist(i2)
        pv = theta[6 + 2 * _NI :].reshape(V, 6)
        projL = geom.project_points(obj_j[None], pv[:, :3], pv[:, 3:], Ka[None], da)
        rR, tR = jax.vmap(lambda r, t: geom.se3_compose(r, t, r_s, t_s))(
            pv[:, :3], pv[:, 3:]
        )
        projR = geom.project_points(obj_j[None], rR, tR, Kb[None], db)
        return jnp.concatenate([(projL - imL_j).reshape(-1), (projR - imR_j).reshape(-1)])

    theta, cost = _lm(residual, theta0, mask, iters=iters)
    theta = np.asarray(theta)
    r_s, t_s = theta[0:3], theta[3:6]
    i1 = theta[6 : 6 + _NI].copy()
    i2 = theta[6 + _NI : 6 + 2 * _NI].copy()
    if flags.fix_aspect_ratio:
        i1[1] = i1[0] * aspect1
        i2[1] = i2[0] * aspect2
    if flags.same_focal_length:
        i2[0], i2[1] = i1[0], i1[1]
    K1f = np.array([[i1[0], 0, i1[2]], [0, i1[1], i1[3]], [0, 0, 1]])
    K2f = np.array([[i2[0], 0, i2[2]], [0, i2[1], i2[3]], [0, 0, 1]])
    d1f, d2f = i1[4:9], i2[4:9]
    R = np.asarray(geom.rodrigues(jnp.asarray(r_s)))
    T = t_s
    E = np.asarray(geom.essential_from_rt(jnp.asarray(R), jnp.asarray(T)))
    F = np.asarray(
        geom.fundamental_from_krt(jnp.asarray(K1f), jnp.asarray(K2f), jnp.asarray(R), jnp.asarray(T))
    )
    rms = float(np.sqrt(cost / (2 * V * N)))
    return {
        "ret": rms,
        "R": R,
        "T": T.reshape(3, 1),
        "E": E,
        "F": F,
        "mtx_left": K1f,
        "dist_left": d1f.reshape(1, -1),
        "mtx_right": K2f,
        "dist_right": d2f.reshape(1, -1),
        "num_valid_pairs": V,
    }


def reprojection_rms(obj_pts, img_pts, K, dist, rvecs, tvecs):
    """Per-view + overall reprojection RMS (the audit the reference defines but
    never calls, camera_calibration.py:180-216)."""
    obj = jnp.asarray(obj_pts)
    if obj.ndim == 2:
        obj = obj[None]
    proj = geom.project_points(
        obj, jnp.asarray(rvecs), jnp.asarray(tvecs), jnp.asarray(K)[None], jnp.asarray(dist)
    )
    err = proj - jnp.asarray(img_pts)
    per_view = jnp.sqrt(jnp.mean(jnp.sum(err**2, axis=-1), axis=-1))
    overall = jnp.sqrt(jnp.mean(jnp.sum(err**2, axis=-1)))
    return np.asarray(per_view), float(overall)
