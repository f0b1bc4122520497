"""Distributed structure-from-motion bundle adjustment (poses + landmarks).

The north-star distributed solver (BASELINE.json): keyframes sharded across
devices, landmarks eliminated by Schur complement, and the reduced camera
system solved with preconditioned conjugate gradients whose matvecs reduce
over the mesh with ``psum`` — the communication pattern that rides ICI.

Problem:  min Σ_{(f,l) ∈ obs} ‖ π(K, T_f, X_l) − uv_{f,l} ‖²

Normal equations have the arrow structure  [U  W; Wᵀ V]  with
U block-diag per pose (6×6), V block-diag per landmark (3×3), W the sparse
pose–landmark coupling. Landmarks are eliminated:

    S Δp = b_p − W V⁻¹ b_l        (reduced camera system)
    Δx_l = V_l⁻¹ (b_l − Wᵀ Δp)    (local back-substitution)

S is never materialized (it densifies across devices): CG evaluates
S·x = U·x − W V⁻¹ Wᵀ x with one psum per matvec (the landmark-indexed
scatter/gather stays local; only (L, 3) reductions cross devices).

Gauge: pose 0 is frozen (updates masked); scale is fixed by the landmark
damping prior.

Data layout (per device after sharding over the 'frame' mesh axis):
- obs_uv   (F, M, 2)  observations per frame (fixed M slots, masked)
- obs_lid  (F, M)     landmark index per observation
- obs_mask (F, M)     live-slot mask
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stereovision_tpu.core import geometry as geom


def _project(intr, pose, X):
    """intr (4,) fx fy cx cy (no distortion for the SfM stage); X (..., 3)."""
    R = geom.rodrigues(pose[:3])
    cam = X @ R.T + pose[3:]
    z_raw = cam[..., 2:3]
    # sign-preserving clamp: a point just behind the plane must not project as
    # if in front (flipped residual signs would push LM the wrong way)
    z = jnp.sign(jnp.where(z_raw == 0, 1.0, z_raw)) * jnp.maximum(jnp.abs(z_raw), 1e-9)
    xy = cam[..., :2] / z
    return xy * intr[:2] + intr[2:]


def _frame_residual(intr, pose, landmarks, uv, lid, mask):
    X = landmarks[lid]                                     # (M, 3)
    proj = _project(intr, pose, X)
    return jnp.where(mask[:, None], proj - uv, 0.0)        # (M, 2)


@functools.partial(jax.jit, static_argnames=("mesh", "iters", "cg_iters"))
def distributed_slam_ba(
    obs_uv: jax.Array,     # (F, M, 2) sharded over 'frame'
    obs_lid: jax.Array,    # (F, M) int32
    obs_mask: jax.Array,   # (F, M) bool
    intr: jax.Array,       # (4,) fx fy cx cy
    poses0: jax.Array,     # (F, 6)
    landmarks0: jax.Array, # (L, 3) replicated
    mesh: Mesh,
    iters: int = 10,
    cg_iters: int = 24,
    lam: float = 1e-3,
):
    """Returns (poses (F, 6), landmarks (L, 3), rms)."""
    L = landmarks0.shape[0]

    def body(uv_sh, lid_sh, mask_sh, poses_sh, lm):
        n_local = uv_sh.shape[0]
        frame0 = jax.lax.axis_index("frame") == 0

        def residual_all(poses_l, lmk):
            return jax.vmap(
                lambda p, uv, lid, m: _frame_residual(intr, p, lmk, uv, lid, m)
            )(poses_l, uv_sh, lid_sh, mask_sh)             # (Fl, M, 2)

        def cost_of(poses_l, lmk):
            r = residual_all(poses_l, lmk)
            return jax.lax.psum(jnp.sum(r * r), "frame")

        def blocks(poses_l, lmk):
            r = residual_all(poses_l, lmk)
            Jp = jax.vmap(
                lambda p, uv, lid, m: jax.jacfwd(
                    lambda pp: _frame_residual(intr, pp, lmk, uv, lid, m)
                )(p)
            )(poses_l, uv_sh, lid_sh, mask_sh)             # (Fl, M, 2, 6)

            def jl_frame(p, uv, lid, m):
                def per_obs(l_xyz, u, valid):
                    return jax.jacfwd(
                        lambda X: jnp.where(
                            valid, _project(intr, p, X[None])[0] - u, jnp.zeros(2)
                        )
                    )(l_xyz)

                return jax.vmap(per_obs)(lmk[lid], uv, m)   # (M, 2, 3)

            Jl = jax.vmap(jl_frame)(poses_l, uv_sh, lid_sh, mask_sh)  # (Fl, M, 2, 3)
            return r, Jp, Jl

        def lm_iter(_, carry):
            poses_l, lmk, lam_c, cost_c = carry
            r, Jp, Jl = blocks(poses_l, lmk)
            # per-pose blocks (local)
            U = jnp.einsum("fmri,fmrj->fij", Jp, Jp)               # (Fl, 6, 6)
            b_p = jnp.einsum("fmri,fmr->fi", Jp, r)                # (Fl, 6)
            # per-landmark blocks (psum over frames)
            V_local = jnp.zeros((L, 3, 3)).at[lid_sh.reshape(-1)].add(
                jnp.einsum("fmri,fmrj->fmij", Jl, Jl).reshape(-1, 3, 3)
            )
            b_l_local = jnp.zeros((L, 3)).at[lid_sh.reshape(-1)].add(
                jnp.einsum("fmri,fmr->fmi", Jl, r).reshape(-1, 3)
            )
            # one packed psum for the landmark blocks (V | b_l): halves the
            # per-iteration reduction rounds outside the CG loop
            Vb = jax.lax.psum(
                jnp.concatenate([V_local.reshape(L, 9), b_l_local], axis=1),
                "frame")
            V = Vb[:, :9].reshape(L, 3, 3)
            b_l = Vb[:, 9:]
            # per-observation coupling blocks (local)
            W = jnp.einsum("fmri,fmrj->fmij", Jp, Jl)              # (Fl, M, 6, 3)

            Udiag = jnp.clip(jnp.diagonal(U, axis1=-2, axis2=-1), 1e-8, None)
            Ud = U + (lam_c * Udiag)[:, :, None] * jnp.eye(6) + 1e-9 * jnp.eye(6)
            Vdiag = jnp.clip(jnp.diagonal(V, axis1=-2, axis2=-1), 1e-8, None)
            Vd = V + (lam_c * Vdiag)[:, :, None] * jnp.eye(3) + 1e-9 * jnp.eye(3)
            Vinv = jnp.linalg.inv(Vd)

            def wt_x(x_l):  # Wᵀ x, reduced over frames → (L, 3)
                t = jnp.zeros((L, 3)).at[lid_sh.reshape(-1)].add(
                    jnp.einsum("fmij,fi->fmj", W, x_l).reshape(-1, 3)
                )
                return jax.lax.psum(t, "frame")

            def w_z(z):  # W z (z per landmark) → per local pose (Fl, 6)
                return jnp.einsum("fmij,fmj->fi", W, z[lid_sh])

            def matvec(x_l):
                y = jnp.einsum("fij,fj->fi", Ud, x_l)
                t = wt_x(x_l)
                z = jnp.einsum("lij,lj->li", Vinv, t)
                y = y - w_z(z)
                # gauge: pose 0 frozen
                return jnp.where((jnp.arange(n_local) == 0)[:, None] & frame0, 0.0, y)

            rhs = b_p - w_z(jnp.einsum("lij,lj->li", Vinv, b_l))
            rhs = jnp.where((jnp.arange(n_local) == 0)[:, None] & frame0, 0.0, rhs)

            # Jacobi-preconditioned CG on the reduced camera system
            Minv = jnp.linalg.inv(Ud)

            def precond(v):
                return jnp.einsum("fij,fj->fi", Minv, v)

            def cg_step(_, st):
                x, res, p_dir, rz = st
                Ap = matvec(p_dir)
                denom = jax.lax.psum(jnp.sum(p_dir * Ap), "frame")
                alpha = rz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
                x = x + alpha * p_dir
                res = res - alpha * Ap
                z = precond(res)
                rz_new = jax.lax.psum(jnp.sum(res * z), "frame")
                beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
                return x, res, z + beta * p_dir, rz_new

            x0 = jnp.zeros_like(rhs)
            z0 = precond(rhs)
            rz0 = jax.lax.psum(jnp.sum(rhs * z0), "frame")
            dp, _, _, _ = jax.lax.fori_loop(
                0, cg_iters, cg_step, (x0, rhs, z0, rz0)
            )
            # back-substitute landmarks
            dl = jnp.einsum("lij,lj->li", Vinv, b_l - wt_x(dp))

            poses_n = poses_l - dp
            lmk_n = lmk - dl
            cost_n = cost_of(poses_n, lmk_n)
            ok = (cost_n < cost_c) & jnp.isfinite(cost_n)
            poses_l = jnp.where(ok, poses_n, poses_l)
            lmk = jnp.where(ok, lmk_n, lmk)
            cost_c = jnp.where(ok, cost_n, cost_c)
            lam_c = jnp.where(ok, jnp.maximum(lam_c * 0.5, 1e-9), lam_c * 4.0)
            return poses_l, lmk, lam_c, cost_c

        cost0 = cost_of(poses_sh, lm)
        poses_f, lm_f, _, cost_f = jax.lax.fori_loop(
            0, iters, lm_iter, (poses_sh, lm, jnp.asarray(lam), cost0)
        )
        n_obs = jax.lax.psum(jnp.sum(mask_sh), "frame")
        rms = jnp.sqrt(cost_f / jnp.maximum(n_obs, 1))
        return poses_f, lm_f, rms

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P("frame"), P("frame"), P("frame"), P("frame"), P()),
        out_specs=(P("frame"), P(), P()),
        check_vma=False,
    )
    sh = NamedSharding(mesh, P("frame"))
    poses, lms, rms = fn(
        jax.device_put(obs_uv, sh),
        jax.device_put(obs_lid, sh),
        jax.device_put(obs_mask, sh),
        jax.device_put(poses0, sh),
        landmarks0,
    )
    return poses, lms, rms
