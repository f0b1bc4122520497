"""Exact cv2.filterSpeckles on device: log-depth connected-component labeling.

Replaces the host-blocking native C++ post-pass (native/speckle.cpp) with a
jit-compatible formulation of the same semantics (reference
depth_map.py:894-906 — SGBM's speckleWindowSize/speckleRange):

1. 4-connected components under |d[p] − d[q]| ≤ max_diff (edge relation on
   the ORIGINAL disparity values — the C++ flood fill's in-place mutation
   never affects labeling, killed neighbors are already labeled);
2. components with ≤ max_speckle_size pixels are set to new_val.

Labeling runs min-label propagation to a FIXPOINT (exactness does not
depend on an iteration budget): each round propagates labels along entire
row segments then column segments with log-depth doubling scans
(shift+select — `lax.associative_scan` costs ~4 ms/call at 720p on v5e,
the doubling form is one fused elementwise chain per step), and a
`lax.while_loop` repeats rounds until unchanged. Worst case (spiral
components) needs O(perimeter) rounds, real disparity maps converge in a
handful. Component sizes then come from one sort + segmented run-length
pass + unique-index unsort (no serial scatter-add).

Labels live in float32: linear indices < 2^23 are exact, and f32 min is
the VPU's native element op (int32 min works too; f32 keeps the option of
fusing with the float disparity math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = jnp.float32(jnp.inf)


def _shift(x, k: int, axis: int, fill):
    """x shifted +k along axis (elements move to higher indices; the first k
    positions take ``fill``)."""
    pad = [(0, 0), (0, 0)]
    pad[axis] = (k, 0)
    sl = [slice(None), slice(None)]
    sl[axis] = slice(0, x.shape[axis] - k)
    return jnp.pad(x[tuple(sl)], pad, constant_values=fill)


def _shift_neg(x, k: int, axis: int, fill):
    pad = [(0, 0), (0, 0)]
    pad[axis] = (0, k)
    sl = [slice(None), slice(None)]
    sl[axis] = slice(k, None)
    return jnp.pad(x[tuple(sl)], pad, constant_values=fill)


def _segmented_min_pass(lab, conn1, axis: int):
    """Propagate the segment minimum to every element of every run along
    ``axis``. ``conn1[..i..]`` = edge between element i−1 and i (False at
    i = 0). Log-depth doubling: after step k, conn[i] says i connects back
    to i−k through uninterrupted edges."""
    n = lab.shape[axis]
    conn = conn1
    k = 1
    while k < n:
        down = _shift(lab, k, axis, _INF)
        lab = jnp.minimum(lab, jnp.where(conn, down, _INF))
        up = _shift_neg(lab, k, axis, _INF)
        conn_up = _shift_neg(conn, k, axis, False)
        lab = jnp.minimum(lab, jnp.where(conn_up, up, _INF))
        if 2 * k < n:
            conn = conn & _shift(conn, k, axis, False)
        k *= 2
    return lab


def _cummax_doubling(x):
    """Inclusive running max over a 1-D array (doubling shifts; see module
    docstring for why not associative_scan)."""
    n = x.shape[0]
    k = 1
    while k < n:
        x = jnp.maximum(x, jnp.pad(x[:-k], (k, 0), constant_values=-jnp.inf))
        k *= 2
    return x


def _cummin_rev_doubling(x):
    """Reverse (suffix) running min."""
    n = x.shape[0]
    k = 1
    while k < n:
        x = jnp.minimum(x, jnp.pad(x[k:], (0, k), constant_values=jnp.inf))
        k *= 2
    return x


def label_components(disp: jax.Array, max_diff) -> jax.Array:
    """(H, W) float32 → (H, W) float32 canonical labels: every pixel carries
    the smallest linear index of its 4-connected |Δd| ≤ max_diff component
    (the same partition the C++ flood fill computes)."""
    H, W = disp.shape
    lab = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
    md = jnp.asarray(max_diff, disp.dtype)
    ch = jnp.pad(jnp.abs(disp[:, 1:] - disp[:, :-1]) <= md,
                 ((0, 0), (1, 0)), constant_values=False)
    cv = jnp.pad(jnp.abs(disp[1:, :] - disp[:-1, :]) <= md,
                 ((1, 0), (0, 0)), constant_values=False)

    def round_(lab):
        lab = _segmented_min_pass(lab, ch, axis=1)
        return _segmented_min_pass(lab, cv, axis=0)

    def cond(state):
        lab, prev, first = state
        return first | jnp.any(lab != prev)

    def body(state):
        lab, _, _ = state
        return round_(lab), lab, False

    lab, _, _ = jax.lax.while_loop(
        cond, body, (round_(lab), lab, jnp.asarray(True)))
    return lab


def component_sizes(lab: jax.Array) -> jax.Array:
    """(H, W) canonical labels → (H, W) int32 component pixel counts, via
    sort + segmented run length + unique-index unsort."""
    H, W = lab.shape
    n = H * W
    flat = lab.ravel()
    idx = jnp.arange(n, dtype=jnp.int32)
    skey, sidx = jax.lax.sort_key_val(flat, idx)
    new_seg = jnp.concatenate(
        [jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    pos = jnp.arange(n, dtype=jnp.float32)
    start = _cummax_doubling(jnp.where(new_seg, pos, -jnp.inf))
    nxt = jnp.concatenate([new_seg[1:], jnp.ones((1,), bool)])
    end = _cummin_rev_doubling(jnp.where(nxt, pos, jnp.inf))
    size_sorted = (end - start + 1.0).astype(jnp.int32)
    sizes = jnp.zeros((n,), jnp.int32).at[sidx].set(
        size_sorted, unique_indices=True)
    return sizes.reshape(H, W)


@functools.partial(jax.jit, static_argnames=("max_speckle_size",))
def filter_speckles_exact(disp: jax.Array, new_val, max_speckle_size: int,
                          max_diff):
    """Bit-exact device equivalent of ``native.filter_speckles`` /
    cv2.filterSpeckles: components of ≤ max_speckle_size pixels become
    new_val. Returns (disp, removed_count)."""
    disp = disp.astype(jnp.float32)
    lab = label_components(disp, max_diff)
    sizes = component_sizes(lab)
    kill = sizes <= max_speckle_size
    out = jnp.where(kill, jnp.asarray(new_val, jnp.float32), disp)
    return out, jnp.sum(kill.astype(jnp.int32))
