"""Distributed bundle adjustment: Schur-complement reduced camera system over
ICI collectives.

The reference's calibration solves (cv2.calibrateCamera / stereoCalibrate) are
single-machine LM over ~10 views. At production scale — multi-frame pose
refinement over KITTI-length sequences (BASELINE config 5) — views no longer
fit one chip's step budget. Structure of the problem:

- global parameters g (shared intrinsics; optionally the stereo transform),
- per-view parameters p_v (6-dof poses), coupled only through g.

The normal equations are arrow-shaped:  [A  B; Bᵀ C] with C block-diagonal per
view. Each device owns a shard of views and reduces the Schur complement onto
the *global* block over the mesh:

    S   = A − Σ_v B_v C_v⁻¹ B_vᵀ           (psum over the 'frame' axis)
    rhs = g_A − Σ_v B_v C_v⁻¹ r_v          (psum)
    Δg  = S⁻¹ rhs                          (replicated small solve)
    Δp_v = C_v⁻¹ (r_v − B_vᵀ Δg)           (local back-substitution)

The entire LM loop (damping, accept/reject) runs inside one jitted
``shard_map`` program — per-iteration communication is two small psums
(9×9-ish blocks), which ride ICI.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stereovision_tpu.core import geometry as geom

_NG = 9  # global params: fx fy cx cy k1 k2 p1 p2 k3


def _residual_one(g, pose, obj, img):
    K = jnp.array([[g[0], 0.0, g[2]], [0.0, g[1], g[3]], [0.0, 0.0, 1.0]], g.dtype)
    proj = geom.project_points(obj, pose[:3], pose[3:], K, g[4:9])
    return (proj - img).reshape(-1)


def _frame_blocks(g, pose, obj, img):
    """Per-view residual + Jacobian blocks (Jg: R×9, Jp: R×6)."""
    r = _residual_one(g, pose, obj, img)
    Jg = jax.jacfwd(lambda gg: _residual_one(gg, pose, obj, img))(g)
    Jp = jax.jacfwd(lambda pp: _residual_one(g, pp, obj, img))(pose)
    return r, Jg, Jp


@functools.partial(
    jax.jit, static_argnames=("mesh", "iters", "optimize_intrinsics")
)
def distributed_mono_ba(
    obj_pts: jax.Array,      # (N, 3) board/landmark points (shared)
    img_pts: jax.Array,      # (V, N, 2) observations, sharded over 'frame'
    intrinsics0: jax.Array,  # (9,)
    poses0: jax.Array,       # (V, 6)
    mesh: Mesh,
    iters: int = 20,
    optimize_intrinsics: bool = True,
):
    """Returns (intrinsics (9,), poses (V, 6), rms scalar).

    V must be divisible by the mesh's 'frame' axis. Math identical to
    ``calib.ba.calibrate_camera`` (same residual model); validated against it
    in tests on a virtual 8-device mesh.
    """
    V = img_pts.shape[0]
    n_res = 2 * img_pts.shape[1]

    def shard_body(img_sh, poses_sh, g0):
        g0 = g0.reshape(_NG)

        def blocks(g, poses):
            return jax.vmap(lambda p, im: _frame_blocks(g, p, obj_pts, im))(
                poses, img_sh
            )

        def cost_of(g, poses):
            r = jax.vmap(lambda p, im: _residual_one(g, p, obj_pts, im))(poses, img_sh)
            return jax.lax.psum(jnp.sum(r * r), "frame")

        def lm_iter(_, carry):
            # Communication: exactly TWO psums per LM iteration. The old
            # sequential damping loop issued ~20 small psums per iteration
            # (A, gA, then per damping try BCB + Bcr + cost), which made the
            # program latency-bound off-chip: SCALING_r03 measured the
            # 8-device virtual mesh 4x SLOWER than 1 device. The fori_loop
            # always executed all 6 tries anyway (accept only masks), so
            # evaluating the 6 candidate lambdas batched costs the same
            # FLOPs while collapsing the reduction rounds:
            #   psum #1: packed [A | gA | BCB_k | Bcr_k for k<6]  (631 floats)
            #   psum #2: the 6 candidate costs
            # Accept semantics identical: first candidate k with
            # cost_k < cost wins (lambda ladder lam*10^k), lam then steps to
            # max(0.3*lam*10^k, 1e-10), or 10^6*lam if all six reject.
            g, poses, lam, cost = carry
            r, Jg, Jp = blocks(g, poses)            # (Vl, R), (Vl, R, 9), (Vl, R, 6)
            A_l = jnp.einsum("vri,vrj->ij", Jg, Jg)
            gA_l = jnp.einsum("vri,vr->i", Jg, r)
            C = jnp.einsum("vri,vrj->vij", Jp, Jp)  # (Vl, 6, 6)
            B = jnp.einsum("vri,vrj->vij", Jg, Jp)  # (Vl, 9, 6)
            gP = jnp.einsum("vri,vr->vi", Jp, r)    # (Vl, 6)

            lams = lam * jnp.float32(10.0) ** jnp.arange(6, dtype=A_l.dtype)
            Cdiag = jnp.clip(jnp.diagonal(C, axis1=-2, axis2=-1), 1e-8, None)

            def cinv_of(lam_c):
                Cd = C + (lam_c * Cdiag)[..., None] * jnp.eye(6) + 1e-10 * jnp.eye(6)
                return jnp.linalg.inv(Cd)

            def local_schur(lam_c):
                Cinv = cinv_of(lam_c)
                BCB_l = jnp.einsum("vij,vjk,vlk->il", B, Cinv, B)
                Bcr_l = jnp.einsum("vij,vjk,vk->i", B, Cinv, gP)
                return BCB_l, Bcr_l

            BCBs_l, Bcrs_l = jax.vmap(local_schur)(lams)  # (6,9,9), (6,9)
            packed = jnp.concatenate(
                [A_l.ravel(), gA_l, BCBs_l.ravel(), Bcrs_l.ravel()])
            packed = jax.lax.psum(packed, "frame")
            A = packed[:81].reshape(_NG, _NG)
            gA = packed[81:90]
            BCBs = packed[90:576].reshape(6, _NG, _NG)
            Bcrs = packed[576:630].reshape(6, _NG)

            def candidate(lam_c, BCB, Bcr):
                Ad = A + lam_c * jnp.diag(jnp.clip(jnp.diag(A), 1e-8, None)) + 1e-10 * jnp.eye(_NG)
                if optimize_intrinsics:
                    dg = jnp.linalg.solve(Ad - BCB + 1e-10 * jnp.eye(_NG), gA - Bcr)
                else:
                    dg = jnp.zeros(_NG, A.dtype)
                Cinv = cinv_of(lam_c)
                dp = jnp.einsum("vij,vj->vi", Cinv, gP - jnp.einsum("vji,j->vi", B, dg))
                return g - dg, poses - dp

            gs, poss = jax.vmap(candidate)(lams, BCBs, Bcrs)  # (6, 9), (6, Vl, 6)
            costs_l = jax.vmap(
                lambda gn, pn: jnp.sum(
                    jax.vmap(lambda p, im_: _residual_one(gn, p, obj_pts, im_) ** 2)(
                        pn, img_sh).sum())
            )(gs, poss)
            costs = jax.lax.psum(costs_l, "frame")            # (6,)
            ok = (costs < cost) & jnp.isfinite(costs)
            k = jnp.argmax(ok)  # first accepted candidate
            any_ok = jnp.any(ok)
            g = jnp.where(any_ok, gs[k], g)
            poses = jnp.where(any_ok, poss[k], poses)
            cost = jnp.where(any_ok, costs[k], cost)
            lam = jnp.where(any_ok, jnp.maximum(lams[k] * 0.3, 1e-10),
                            lam * jnp.float32(10.0) ** 6)
            return g, poses, lam, cost

        lam0 = jnp.asarray(1e-3, img_sh.dtype)
        cost0 = cost_of(g0, poses_sh)
        g, poses, _, cost = jax.lax.fori_loop(
            0, iters, lm_iter, (g0, poses_sh, lam0, cost0)
        )
        rms = jnp.sqrt(cost / (V * n_res / 2))
        return g.reshape(1, _NG), poses, rms.reshape(1)

    fn = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P("frame"), P("frame"), P()),
        out_specs=(P(), P("frame"), P()),
        check_vma=False,
    )
    img_sharded = jax.device_put(img_pts, NamedSharding(mesh, P("frame")))
    poses_sharded = jax.device_put(poses0, NamedSharding(mesh, P("frame")))
    g, poses, rms = fn(img_sharded, poses_sharded, intrinsics0.reshape(1, _NG))
    return g[0], poses, rms[0]


def mono_ba_init(obj_pts, img_pts, image_size):
    """Zhang-style host-side initialization (shared with calib.ba)."""
    from stereovision_tpu.calib import ba as cba

    obj = np.asarray(obj_pts, np.float64)
    Hs = cba._homographies(obj[:, :2], np.asarray(img_pts, np.float64))
    K0 = cba._zhang_intrinsics(Hs, image_size)
    poses = np.asarray([np.concatenate(cba._pose_from_homography(H, K0)) for H in Hs])
    intr = np.array([K0[0, 0], K0[1, 1], K0[0, 2], K0[1, 2], 0, 0, 0, 0, 0])
    return intr, poses
