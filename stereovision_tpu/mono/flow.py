"""Dense pyramidal optical flow (coarse-to-fine iterative Lucas–Kanade).

TPU-native replacement for ``cv2.calcOpticalFlowFarneback`` (reference
fused_depth_map.py:1361-1370 with pyr_scale .5, levels 3, win 15, iters 3).
Farneback fits per-pixel quadratic polynomials; on TPU the equivalent quality
at far lower cost is windowed Lucas–Kanade solved densely: all pixels' 2×2
normal equations are two box filters + an elementwise solve, iterated per
pyramid level with warping. Same role, same output contract ((H, W, 2) flow in
pixels), compiler-friendly (convs + elementwise only, no gathers except the
bilinear warp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stereovision_tpu.core import image as im
from stereovision_tpu.utils.backend import is_tpu_backend

# max |displacement| the separable warp samples per axis (beyond it, sampling
# saturates — same practical range cap as Farneback's win×2^levels reach)
WARP_RANGE = 32


def _warp_axis_shift(src, off, R: int, interpret: bool):
    """1-D lerp-shift warp — shared with the separable remap
    (:func:`core.image.warp_axis_shift`)."""
    return im.warp_axis_shift(src, off, R, interpret)


def warp_separable(curr, flow, R: int = WARP_RANGE, interpret: bool = False):
    """Bilinear backward warp of ``curr`` by ``flow`` (H, W, 2), split into a
    vertical then horizontal 1-D pass (each a pair of Pallas shift-gathers;
    the vertical pass rides two XLA transposes, which run near HBM speed).

    Exactly bilinear wherever the vertical component is locally constant
    along x; for smooth LK flow fields the difference is O(∂v/∂x · frac) —
    far below the residual the LK iteration corrects. Displacements clamp to
    ±R per axis (the same practical range cap as the pyramid reach)."""
    tmp = _warp_axis_shift(curr.T, flow[..., 1].T, R, interpret).T
    return _warp_axis_shift(tmp, flow[..., 0], R, interpret)


def _lk_refine(prev, curr, flow, win: int, iters: int, eps: float = 1e-3,
               warp_impl: str = "gather"):
    """Iterative LK update at one pyramid level. flow: (H, W, 2)."""
    H, W = prev.shape
    gy, gx = jnp.gradient(prev)
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij"
    )

    # the windowed structure tensor depends only on prev's gradients — hoist
    # it out of the iteration (3 of the 5 box filters per step)
    a = im.box_filter(gx * gx, win) + eps
    b = im.box_filter(gx * gy, win)
    c = im.box_filter(gy * gy, win) + eps
    det = a * c - b * b

    def body(_, flow):
        if warp_impl == "gather":
            warped = im._bilinear_gather(
                curr, xs + flow[..., 0], ys + flow[..., 1])
        else:
            warped = warp_separable(
                curr, flow, interpret=(warp_impl == "shift_interpret"))
        it = warped - prev
        # windowed normal equations via box filters (all pixels at once)
        bx = im.box_filter(gx * it, win)
        by = im.box_filter(gy * it, win)
        du = -(c * bx - b * by) / det
        dv = -(a * by - b * bx) / det
        # clamp per-iteration update for stability (LK small-motion assumption)
        du = jnp.clip(du, -win, win)
        dv = jnp.clip(dv, -win, win)
        return flow + jnp.stack([du, dv], axis=-1)

    return jax.lax.fori_loop(0, iters, body, flow)


@functools.partial(jax.jit, static_argnames=("levels", "win", "iters", "warp_impl"))
def dense_flow(
    prev: jax.Array,
    curr: jax.Array,
    levels: int = 3,
    win: int = 15,
    iters: int = 3,
    warp_impl: str = "auto",
) -> jax.Array:
    """(H, W) grayscale pair → (H, W, 2) flow: curr[p + flow(p)] ≈ prev[p]…
    i.e. flow maps *prev* pixels to their position in *curr* (Farneback
    convention: prev + flow = curr).

    ``warp_impl``: "gather" (XLA per-element bilinear gather — exact, the CPU
    default), "shift" (separable Pallas shift-gather warp — the TPU default;
    the per-element gather costs ~14 ms per full-res warp on-chip, ~10× this
    path), "shift_interpret" (Pallas interpreter, for CPU parity tests), or
    "auto" (backend-resolved at trace time)."""
    if warp_impl == "auto":
        warp_impl = "shift" if is_tpu_backend() else "gather"
    prev = prev.astype(jnp.float32)
    curr = curr.astype(jnp.float32)
    H, W = prev.shape
    # build pyramid (×0.5 per level)
    pyr = [(prev, curr)]
    for _ in range(levels - 1):
        p, c = pyr[-1]
        h2, w2 = p.shape[0] // 2, p.shape[1] // 2
        pyr.append((im.resize(im.gaussian_blur(p, 5), (h2, w2)),
                    im.resize(im.gaussian_blur(c, 5), (h2, w2))))
    flow = jnp.zeros((*pyr[-1][0].shape, 2), jnp.float32)
    for lvl in range(levels - 1, -1, -1):
        p, c = pyr[lvl]
        if flow.shape[:2] != p.shape:
            flow = (
                jnp.stack(
                    [im.resize(flow[..., 0], p.shape), im.resize(flow[..., 1], p.shape)],
                    axis=-1,
                )
                * 2.0
            )
        flow = _lk_refine(p, c, flow, win, iters, warp_impl=warp_impl)
    return flow
