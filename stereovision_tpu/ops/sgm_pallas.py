"""Pallas TPU kernels for semi-global matching.

Two kernels cover the disparity engine's hot path:

- :func:`aggregate_dir` — the SGM path recurrence along one scan direction.
  The sequential dependency only exists along the scan axis; each step is a
  (rows × D) VPU block. The kernel keeps the running L row in VMEM scratch and
  streams cost blocks through, so per-frame HBM traffic is read-cost +
  write-L, nothing else. ``lax.scan`` in XLA pays per-step dispatch overhead
  (~ms for 1280 steps); here the scan is grid iteration with double-buffered
  DMA.

- :func:`wta` — fused winner-take-all over the summed volume: argmin, parabola
  subpixel neighbors, and the cv2-style uniqueness competitor, all computed in
  one read of the volume.

Both operate on (S, X, D) / (H, W, D) float32 with D a multiple of 128 (lane
dimension). Wrappers in ``stereo.sgm`` pad/transpose as needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9


# ---------------------------------------------------------------------------
# Directional aggregation
# ---------------------------------------------------------------------------


def _agg_kernel(cost_ref, out_ref, lprev_ref, *, ks: int, p1: float, p2: float, reverse: bool):
    j = pl.program_id(1)  # scan-block index (sequential, innermost)

    def col(it, _):
        s = (ks - 1 - it) if reverse else it
        c = cost_ref[pl.ds(s, 1)][0]  # (TX, D)
        prev = lprev_ref[:]
        min_prev = jnp.min(prev, axis=-1, keepdims=True)
        shift_m = jnp.concatenate(
            [jnp.full_like(prev[:, :1], _BIG), prev[:, :-1]], axis=-1
        )
        shift_p = jnp.concatenate(
            [prev[:, 1:], jnp.full_like(prev[:, :1], _BIG)], axis=-1
        )
        best = jnp.minimum(
            jnp.minimum(prev, min_prev + p2), jnp.minimum(shift_m, shift_p) + p1
        )
        first = jnp.logical_and(j == 0, it == 0)
        l = jnp.where(first, c, c + best - min_prev)
        out_ref[pl.ds(s, 1)] = l[None]
        lprev_ref[:] = l
        return 0

    jax.lax.fori_loop(0, ks, col, 0)


@functools.partial(
    jax.jit, static_argnames=("p1", "p2", "reverse", "block_s", "block_x", "interpret")
)
def aggregate_dir(
    cost: jax.Array,
    p1: float,
    p2: float,
    reverse: bool = False,
    block_s: int = 8,
    block_x: int = 120,
    interpret: bool = False,
) -> jax.Array:
    """SGM path aggregation along axis 0 of ``cost`` (S, X, D) → L (S, X, D).

    ``reverse=True`` aggregates back-to-front (the ← and ↑ paths), done
    in-kernel by visiting scan blocks and in-block columns in reverse — no
    array flips. S is padded to a block multiple with a constant; a constant
    prefix/suffix leaves the recurrence at the first real column equal to a
    fresh start (best − min_prev ≡ 0), so padding is semantically invisible.
    D must be a multiple of 128.
    """
    S, X, D = cost.shape
    pad_s = (-S) % block_s
    if pad_s:
        cost = jnp.pad(cost, ((0, pad_s), (0, 0), (0, 0)), constant_values=1.0)
    ns = (S + pad_s) // block_s
    nx = pl.cdiv(X, block_x)
    if reverse:
        index_map = lambda i, j: (ns - 1 - j, i, 0)  # noqa: E731
    else:
        index_map = lambda i, j: (j, i, 0)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(
            _agg_kernel, ks=block_s, p1=float(p1), p2=float(p2), reverse=reverse
        ),
        grid=(nx, ns),
        in_specs=[
            pl.BlockSpec((block_s, block_x, D), index_map, memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((block_s, block_x, D), index_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S + pad_s, X, D), cost.dtype),
        scratch_shapes=[pltpu.VMEM((block_x, D), jnp.float32)],
        interpret=interpret,
    )(cost)
    return out[:S]


# ---------------------------------------------------------------------------
# Fused winner-take-all
# ---------------------------------------------------------------------------


def _wta_kernel(agg_ref, best_ref, idx_ref, cm_ref, cp_ref, comp_ref):
    s = agg_ref[:]  # (BH, BW, D)
    d_iota = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    best = jnp.min(s, axis=-1)
    # argmin via masked-iota min (ties → smallest d, matching jnp.argmin)
    idx = jnp.min(jnp.where(s == best[..., None], d_iota, jnp.int32(1 << 30)), axis=-1)
    onehot_m = d_iota == (idx[..., None] - 1)
    onehot_p = d_iota == (idx[..., None] + 1)
    far = jnp.abs(d_iota - idx[..., None]) > 1
    cm = jnp.min(jnp.where(onehot_m, s, _BIG), axis=-1)
    cp = jnp.min(jnp.where(onehot_p, s, _BIG), axis=-1)
    comp = jnp.min(jnp.where(far, s, _BIG), axis=-1)
    best_ref[:] = best
    idx_ref[:] = idx
    cm_ref[:] = cm
    cp_ref[:] = cp
    comp_ref[:] = comp


@functools.partial(jax.jit, static_argnames=("block_h", "block_w", "interpret"))
def wta(agg: jax.Array, block_h: int = 8, block_w: int = 128, interpret: bool = False):
    """(H, W, D) aggregated costs → per-pixel (best, argmin, cost[idx−1],
    cost[idx+1], best competitor with |d−idx|>1), one volume read total."""
    H, W, D = agg.shape
    nh = pl.cdiv(H, block_h)
    nw = pl.cdiv(W, block_w)
    spec2d = pl.BlockSpec((block_h, block_w), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((H, W), jnp.float32)
    outs = pl.pallas_call(
        _wta_kernel,
        grid=(nh, nw),
        in_specs=[
            pl.BlockSpec(
                (block_h, block_w, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=(spec2d,) * 5,
        out_shape=(f32, jax.ShapeDtypeStruct((H, W), jnp.int32), f32, f32, f32),
        interpret=interpret,
    )(agg)
    return outs
