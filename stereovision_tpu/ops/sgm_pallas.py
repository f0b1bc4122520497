"""Pallas TPU kernels for semi-global matching.

Kernels (all streaming, HBM-traffic-bound by design):

- :func:`cost_volume` — census Hamming cost directly into (H, W, D) layout.
  Uses the reversed-right-census trick so the disparity axis of each output
  pixel is one contiguous lane-dim slice of the (pre-flipped) right census —
  no gathers, native ``population_count``.

- :func:`aggregate_dir` — the SGM path recurrence along either array axis
  (axis 0: vertical paths; axis 1: horizontal paths — no transposes), forward
  or reverse (in-kernel), with optional fused accumulation into the running
  sum volume via input/output aliasing.

- :func:`wta` — fused winner-take-all over the summed volume: argmin, parabola
  subpixel neighbors, and the cv2-style uniqueness competitor in one read.

All operate on (H, W, D) float32 with D a multiple of 128 (lane dimension).
Wrappers in ``stereo.sgm`` pad as needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9
# int8-representable "worse than any census cost" (census windows are ≤ 63
# bits in practice; real costs stay strictly below this)
PAD_COST = 120.0


# ---------------------------------------------------------------------------
# Census transform
# ---------------------------------------------------------------------------


def _census_kernel(a_ref, b_ref, out_ref, sbuf_ref, *, bh, pad_y, pad_x, ksize, wsize, mirror, nw):
    # Strip assembly: BlockSpecs can't overlap, so the row halo (pad_y rows
    # above/below) comes from TWO consecutive (bh, Wp) blocks of the padded
    # image stitched in VMEM scratch; every neighbor is then a static sublane
    # slice + lane roll of the strip (all full-width ops — arbitrary-offset
    # wide lane slices are not Mosaic-friendly, rolls by constants are).
    sbuf_ref[pl.ds(0, bh)] = a_ref[:]
    sbuf_ref[pl.ds(bh, bh)] = b_ref[:]
    strip = sbuf_ref[:]
    wp = strip.shape[-1]

    def left_roll(x, s):  # x[i] ← x[i + s]; pltpu.roll wants non-negative
        return pltpu.roll(x, (wp - s) % wp, 1)

    # One lane roll per dx on the FULL strip (ksize rolls of 2·bh rows) instead
    # of one per (dy, dx) neighbor (ksize·wsize rolls of bh rows) — the rolls
    # dominate the kernel (cross-register lane shuffles); the dy offsets are
    # then free sublane slices of the rolled strips. Bit-identical output.
    rolled = [
        left_roll(strip, (2 * pad_x - dx) if mirror else dx) for dx in range(ksize)
    ]
    center = jax.lax.slice_in_dim(rolled[ksize // 2], pad_y, pad_y + bh, axis=0)
    words = [jnp.zeros(center.shape, jnp.int32) for _ in range(nw)]
    bit = 0
    for dy in range(wsize):
        for dx in range(ksize):
            if dy == wsize // 2 and dx == ksize // 2:
                continue
            v = jax.lax.slice_in_dim(rolled[dx], dy, dy + bh, axis=0)
            w = bit // 32
            words[w] = words[w] | ((v < center).astype(jnp.int32) << (bit % 32))
            bit += 1
    for w in range(nw):
        out_ref[w] = words[w]


@functools.partial(
    jax.jit, static_argnames=("ksize", "wsize", "mirror", "block_h", "interpret")
)
def census_words(
    img: jax.Array,
    ksize: int = 5,
    wsize: int = 5,
    mirror: bool = False,
    block_h: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """(H, W) image → (nw, H, Wp) int32 census words, words-leading layout
    (what :func:`cost_volume` consumes) with Wp lane-padded; lanes ≥ W are
    junk. Bit order and replicate-border semantics match
    ``core.image.census_transform`` exactly (parity-tested).

    ``mirror=True`` computes, from the **flipped** image, the flipped census
    of the original: census(img)[:, ::-1] ≡ census_words(img[:, ::-1],
    mirror=True) — the form the cost kernel's reversed-right trick needs,
    without materializing census twice.
    """
    H, W = img.shape
    pad_y, pad_x = wsize // 2, ksize // 2
    n_bits = ksize * wsize - 1
    nw = (n_bits + 31) // 32
    # replicate-pad to P, then square up: rows to (nh+1)·bh so block i+1 always
    # exists; cols to a lane multiple ≥ W + 2·pad_x so neighbor rolls never wrap
    # back into valid columns
    p = _pad_replicate2d(img.astype(jnp.float32), pad_y, pad_x)
    nh = pl.cdiv(H, block_h)
    rows = (nh + 1) * block_h
    Wp = -(-(W + 2 * pad_x) // 128) * 128
    p = jnp.pad(p, ((0, rows - p.shape[0]), (0, Wp - p.shape[1])))
    spec = lambda m: pl.BlockSpec((block_h, Wp), m, memory_space=pltpu.VMEM)  # noqa: E731
    return pl.pallas_call(
        functools.partial(
            _census_kernel,
            bh=block_h, pad_y=pad_y, pad_x=pad_x, ksize=ksize, wsize=wsize,
            mirror=mirror, nw=nw,
        ),
        grid=(nh,),
        in_specs=[spec(lambda i: (i, 0)), spec(lambda i: (i + 1, 0))],
        out_specs=pl.BlockSpec((nw, block_h, Wp), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw, nh * block_h, Wp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((2 * block_h, Wp), jnp.float32)],
        interpret=interpret,
    )(p, p)[:, :H]


def _pad_replicate2d(x: jax.Array, pad_y: int, pad_x: int) -> jax.Array:
    top = jnp.repeat(x[:1], pad_y, axis=0)
    bot = jnp.repeat(x[-1:], pad_y, axis=0)
    x = jnp.concatenate([top, x, bot], axis=0)
    lft = jnp.repeat(x[:, :1], pad_x, axis=1)
    rgt = jnp.repeat(x[:, -1:], pad_x, axis=1)
    return jnp.concatenate([lft, x, rgt], axis=1)


# ---------------------------------------------------------------------------
# Census cost volume
# ---------------------------------------------------------------------------


def _cost_kernel(
    *refs, bw: int, d: int, d_valid: int, w: int, min_d: int,
    max_cost: float, transposed: int, pack: int
):
    # transposed: 0 → (H, W, D) out only; 1 → both layouts; 2 → (W, H, D) only.
    # The (W, H, D) block stores each column's (BH, D) slab at an outer-dim
    # index — no extra compute, the transpose falls out of the store order.
    #
    # pack=2: the lane dim carries TWO independent 64-disparity groups, one
    # per image half — group g's lanes match census rows from half g (the
    # extra census refs). Halving the pseudo-image height halves every
    # downstream volume (see stereo.sgm lane-packed refine).
    refs = list(refs)
    cl_refs = [refs.pop(0) for _ in range(pack)]
    crr_refs = [refs.pop(0) for _ in range(pack)]
    out_ref = refs.pop(0) if transposed != 2 else None
    outt_ref = refs.pop(0) if transposed else None
    buf_ref = refs.pop(0) if transposed != 2 else None
    buft_ref = refs.pop(0) if transposed else None
    # census layout: (nw, BH, W) — words leading so W sits in lanes
    # (an (H, W, nw=2) layout would pad the 2-element lane dim to 128 in VMEM).
    # Columns accumulate in an f32 VMEM buffer (narrow-dtype stores at
    # arbitrary sublane offsets are not expressible); one full-block store at
    # the end casts to the output dtype.
    j = pl.program_id(1)
    nw = cl_refs[0].shape[0]
    bh = cl_refs[0].shape[1]
    dg = d // pack
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (bh, d), 1)
    dl = d_iota % dg if pack > 1 else d_iota

    # Hoist the dynamic rotates out of the column loop: one rotate per block
    # aligns the whole strip, after which every column is a *static* slice.
    # Column x ∈ [x0, x0+bw) needs cr_rev[start(x) : +D] with
    # start(x) = w−1−x+min_d decreasing by 1 per column; rotating cr_rev by
    # −(start(x0) − (bw−1)) puts all needed windows at static offsets
    # (bw−1−xx … +D). Same for cl: one rotate by −x0. Group 1's census is
    # pre-rotated dg lanes further so its window lands on lanes [dg, 2dg).
    # Roll shifts MUST be normalized non-negative: Mosaic miscompiles negative
    # dynamic shifts when the lane width is not a power of two (measured on
    # v5e: roll(x, -s) over width 384 wrong for every s > 0 while
    # roll(x, (w−s) % w) is exact at all widths; widths 256/512 hide it).
    # Static negative shifts are rejected at trace time — dynamic ones are NOT.
    x0 = j * bw
    base = w - 1 - x0 + min_d - (bw - 1)
    wl_w = cl_refs[0].shape[-1]
    wr_w = crr_refs[0].shape[-1]
    cls = [
        [pltpu.roll(cl_refs[g][word], (-x0) % wl_w, 1) for word in range(nw)]
        for g in range(pack)
    ]
    crs = [
        [
            pltpu.roll(crr_refs[g][word], (-(base - g * dg)) % wr_w, 1)
            for word in range(nw)
        ]
        for g in range(pack)
    ]

    for xx in range(bw):  # unrolled: static slice offsets
        cost = jnp.zeros((bh, d), jnp.float32)
        for word in range(nw):
            clv = jax.lax.slice_in_dim(cls[0][word], xx, xx + 1, axis=1)
            crv = jax.lax.slice_in_dim(crs[0][word], bw - 1 - xx, bw - 1 - xx + d, axis=1)
            for g in range(1, pack):  # cascade: group g owns lanes ≥ g·dg
                clv_g = jax.lax.slice_in_dim(cls[g][word], xx, xx + 1, axis=1)
                crv_g = jax.lax.slice_in_dim(
                    crs[g][word], bw - 1 - xx, bw - 1 - xx + d, axis=1
                )
                sel = d_iota >= g * dg
                clv = jnp.where(sel, clv_g, clv)
                crv = jnp.where(sel, crv_g, crv)
            cost = cost + jax.lax.population_count(clv ^ crv).astype(jnp.float32)
        # mask disparities whose right-image column leaves the image:
        # x - min_d - d < 0 (left edge) or > W-1 (right edge, min_d < 0)
        cost = jnp.where(dl > (x0 + xx) - min_d, max_cost, cost)
        if min_d < 0:
            cost = jnp.where((x0 + xx) - min_d - dl > w - 1, max_cost, cost)
        # lane-padding disparities beyond the requested range: census costs are
        # strictly below PAD_COST, so padded lanes can never win an argmin
        if d_valid < dg:
            cost = jnp.where(dl >= d_valid, PAD_COST, cost)
        if buf_ref is not None:
            buf_ref[:, xx, :] = cost
        if buft_ref is not None:
            buft_ref[xx] = cost

    if out_ref is not None:
        out_ref[:] = buf_ref[:].astype(out_ref.dtype)
    if outt_ref is not None:
        outt_ref[:] = buft_ref[:].astype(outt_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("d", "d_valid", "min_d", "max_cost", "block_h", "block_w", "out_dtype", "interpret"),
)
def cost_volume(
    census_l: jax.Array,
    census_r: jax.Array,
    d: int,
    d_valid: int | None = None,
    min_d: int = 0,
    max_cost: float = 48.0,
    block_h: int = 8,
    block_w: int = 128,
    out_dtype=jnp.int8,
    interpret: bool = False,
) -> jax.Array:
    """census pair (H, W, nw int32) → (H, W, d) Hamming cost volume.

    Costs are small integers, stored int8 by default (¼ the HBM traffic of the
    4 aggregation reads). ``d`` must be a multiple of 128 (lane padding); lanes
    ≥ ``d_valid`` carry PAD_COST (> any real census cost) so downstream argmins
    ignore them. Disparity i encodes min_d + i.
    """
    H, W, nw = census_l.shape
    cl = jnp.moveaxis(census_l, -1, 0)                     # (nw, H, W)
    crr = jnp.moveaxis(census_r[:, ::-1, :], -1, 0)
    return cost_volume_planes(
        cl, crr, W, d, d_valid=d_valid, min_d=min_d, max_cost=max_cost,
        block_h=block_h, block_w=block_w, out_dtype=out_dtype,
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "w", "d", "d_valid", "min_d", "max_cost", "block_h", "block_w",
        "out_dtype", "transposed", "pack", "t_seg", "interpret",
    ),
)
def cost_volume_planes(
    cl: jax.Array,
    crr: jax.Array,
    w: int,
    d: int,
    d_valid: int | None = None,
    min_d: int = 0,
    max_cost: float = 48.0,
    block_h: int = 8,
    block_w: int = 128,
    out_dtype=jnp.int8,
    transposed: int = 0,
    pack: int = 1,
    t_seg: int = 1,
    interpret: bool = False,
):
    """Words-leading form of :func:`cost_volume`: ``cl`` is (nw, H, ≥w) census
    of the left image, ``crr`` is (nw, H, ≥w) census of the right image
    **flipped along W** (what :func:`census_words` with ``mirror=True``
    emits). Columns ≥ ``w`` may hold junk — every cost they touch is masked
    in-kernel (out-of-image disparities get ``max_cost``).

    ``transposed``: 0 → returns (H, W, d); 2 → returns (W, H, d) — the layout
    whose axis-0 scan IS the horizontal SGM pass (no relayout: the kernel's
    per-column slab store lands at an outer-dim index); 1 → returns the tuple
    (both layouts) from one sweep.

    ``t_seg`` > 1 stores the transposed layout COLUMN-SEGMENTED:
    (W/t_seg, t_seg·H, d), where segment g's columns occupy rows
    [g·H, (g+1)·H). An axis-0 scan of that layout runs the horizontal SGM
    recurrence with a fresh start every W/t_seg columns — t_seg× shorter
    sequential carry chains with t_seg× more rows of parallelism per step
    (the scan is latency-bound, not FLOP-bound). Costs nothing here: it is
    just a different store index map. Requires W to cover t_seg·block_w
    evenly. Path restarts are the same approximation as the pack seams.

    ``pack`` ∈ {2, 4}: lane-packed volume — H must divide by pack with H/pack
    a ``block_h`` multiple; the output is a (H/pack, W, d) pseudo-volume whose
    lanes [g·d/pack, (g+1)·d/pack) hold the costs of rows
    [g·H/pack, (g+1)·H/pack). ``d_valid`` is then per group (≤ d/pack).
    """
    W = w
    H = cl.shape[1]
    if pack > 1:
        assert pack in (2, 4) and H % pack == 0 and (H // pack) % block_h == 0, (
            "pack needs H/pack divisible by block_h (caller pads rows)"
        )
        H = H // pack
    if d_valid is None:
        d_valid = d // pack
    # widths must cover the static strip windows: cl columns up to block_w−1,
    # cr windows up to (block_w−1) + d (plus the usual start ≤ W−1+min_d span);
    # rounded up to lane multiples (dynamic rotates need 128-aligned shapes)
    wl = -(-max(W, block_w) // 128) * 128
    wr = -(-max(W + d + max(min_d, 0), block_w + d) // 128) * 128

    def fit(x, target):
        cur = x.shape[-1]
        if cur < target:
            return jnp.pad(x, ((0, 0), (0, 0), (0, target - cur)))
        return x[:, :, :target] if cur > target else x

    cl = fit(cl, wl)
    crr = fit(crr, wr)
    nw = cl.shape[0]
    nh = pl.cdiv(H, block_h)
    nwb = pl.cdiv(W, block_w)
    out_specs, out_shape, scratch = [], [], []
    if transposed != 2:
        out_specs.append(
            pl.BlockSpec((block_h, block_w, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((H, W, d), out_dtype))
        scratch.append(pltpu.VMEM((block_h, block_w, d), jnp.float32))
    if transposed:
        if t_seg > 1:
            nwb_all = pl.cdiv(W, block_w)
            assert nwb_all % t_seg == 0 and W % block_w == 0 and H % block_h == 0, (
                "t_seg needs W an even multiple of t_seg*block_w and "
                "H a block_h multiple"
            )
            nbps = nwb_all // t_seg  # column blocks per segment
            hb = H // block_h

            def im_t(i, j, nbps=nbps, hb=hb):
                return (j % nbps, (j // nbps) * hb + i, 0)

            out_specs.append(
                pl.BlockSpec((block_w, block_h, d), im_t, memory_space=pltpu.VMEM)
            )
            out_shape.append(
                jax.ShapeDtypeStruct((W // t_seg, t_seg * H, d), out_dtype)
            )
        else:
            out_specs.append(
                pl.BlockSpec((block_w, block_h, d), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM)
            )
            out_shape.append(jax.ShapeDtypeStruct((W, H, d), out_dtype))
        scratch.append(pltpu.VMEM((block_w, block_h, d), jnp.float32))
    # group g's rows arrive as separate refs offset by g·nh blocks (the kernel
    # consumes all pack left-census refs, then all pack right-census refs)
    in_specs, operands = [], []
    for g in range(pack):
        in_specs.append(
            pl.BlockSpec(
                (nw, block_h, wl),
                lambda i, j, g=g: (0, i + g * nh, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(cl)
    for g in range(pack):
        in_specs.append(
            pl.BlockSpec(
                (nw, block_h, wr),
                lambda i, j, g=g: (0, i + g * nh, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(crr)
    out = pl.pallas_call(
        functools.partial(
            _cost_kernel,
            bw=block_w, d=d, d_valid=d_valid, w=W, min_d=min_d,
            max_cost=float(max_cost), transposed=transposed, pack=pack,
        ),
        grid=(nh, nwb),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if transposed == 1 else out_specs[0],
        out_shape=tuple(out_shape) if transposed == 1 else out_shape[0],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)
    return out


# ---------------------------------------------------------------------------
# Directional aggregation
# ---------------------------------------------------------------------------


def _sgm_step(prev, c, p1, p2):
    """One SGM recurrence step over (…, D) with a raw-L carry — the reference
    formulation (used where the carry crosses devices, parallel.disparity_exact)
    and the semantics the normalized variant below must reproduce exactly."""
    min_prev = jnp.min(prev, axis=-1, keepdims=True)
    shift_m = jnp.concatenate([jnp.full_like(prev[..., :1], _BIG), prev[..., :-1]], axis=-1)
    shift_p = jnp.concatenate([prev[..., 1:], jnp.full_like(prev[..., :1], _BIG)], axis=-1)
    best = jnp.minimum(jnp.minimum(prev, min_prev + p2), jnp.minimum(shift_m, shift_p) + p1)
    return c + best - min_prev


def _sgm_step_norm(n_prev, c, p1, p2, dg: int = 0):
    """:func:`_sgm_step` with a min-normalized carry: ``n_prev = L_prev −
    min(L_prev)`` (lane-min 0), which turns the P2 term into the CONSTANT p2 —
    one broadcast-free min instead of a reduce+broadcast+add. Returns L with
    values identical to :func:`_sgm_step` (exact for integer penalties; both
    rearrangements are the same f32 sums); callers maintain
    ``n = L − min(L)`` as the next carry — the remaining single reduce per
    step. Shared by the Pallas kernels and the XLA scan path (stereo.sgm),
    which must stay bit-identical.

    ``dg`` > 0 marks a lane-packed volume: the lane dim holds D/dg independent
    disparity groups of dg lanes each (stereo.sgm packs the two image halves
    as two 64-lane groups). The d±1 shifts must then not leak across group
    boundaries, and the carry is normalized per group (:func:`_renorm`)."""
    shift_m = jnp.concatenate([jnp.full_like(n_prev[..., :1], _BIG), n_prev[..., :-1]], axis=-1)
    shift_p = jnp.concatenate([n_prev[..., 1:], jnp.full_like(n_prev[..., :1], _BIG)], axis=-1)
    if dg and dg < n_prev.shape[-1]:
        lm = jax.lax.broadcasted_iota(jnp.int32, n_prev.shape, n_prev.ndim - 1) % dg
        shift_m = jnp.where(lm == 0, _BIG, shift_m)
        shift_p = jnp.where(lm == dg - 1, _BIG, shift_p)
    best = jnp.minimum(jnp.minimum(n_prev, p2), jnp.minimum(shift_m, shift_p) + p1)
    return c + best


def _group_min(l, dg: int):
    """Per-lane-group minimum of (…, D), broadcast back to full lanes: one
    masked reduction per contiguous ``dg``-lane group, stitched with a
    cascade of region selects (2 and 4 groups in practice)."""
    D = l.shape[-1]
    if not dg or dg >= D:
        return jnp.min(l, axis=-1, keepdims=True)
    ng = D // dg
    assert D == ng * dg
    liota = jax.lax.broadcasted_iota(jnp.int32, l.shape, l.ndim - 1)
    mins = []
    for g in range(ng):
        if g == 0:
            mask = liota < dg
        elif g == ng - 1:
            mask = liota >= g * dg
        else:
            mask = (liota >= g * dg) & (liota < (g + 1) * dg)
        mins.append(jnp.min(jnp.where(mask, l, _BIG), axis=-1, keepdims=True))
    res = mins[-1]
    for g in reversed(range(ng - 1)):
        res = jnp.where(liota < (g + 1) * dg, mins[g], res)
    return res


def _renorm(l, dg: int = 0):
    """L → next normalized carry (min-zero over the lane dim; per lane group
    of width ``dg`` when the volume is lane-packed — each group must see the
    constant-P2 invariant of its own minimum)."""
    return l - _group_min(l, dg)


def _sgm_step_raw(prev, c, p1, p2, dg: int = 0):
    """:func:`_sgm_step_norm` in raw-carry form: carries the unnormalized L
    and computes the (group) min inside the step. Identical values — the same
    f32 sums in a different association — but the min-reduce of ``prev`` can
    issue in parallel with the shift terms instead of serializing the carry
    chain (renorm → next step). Wins for lane-packed volumes, where the
    grouped reduce is 2 masked reductions."""
    shift_m = jnp.concatenate([jnp.full_like(prev[..., :1], _BIG), prev[..., :-1]], axis=-1)
    shift_p = jnp.concatenate([prev[..., 1:], jnp.full_like(prev[..., :1], _BIG)], axis=-1)
    if dg and dg < prev.shape[-1]:
        lm = jax.lax.broadcasted_iota(jnp.int32, prev.shape, prev.ndim - 1) % dg
        shift_m = jnp.where(lm == 0, _BIG, shift_m)
        shift_p = jnp.where(lm == dg - 1, _BIG, shift_p)
    mp = _group_min(prev, dg)
    best = jnp.minimum(jnp.minimum(prev, mp + p2), jnp.minimum(shift_m, shift_p) + p1)
    return c + best - mp


def _wta_stats(s):
    """Winner statistics over the last (disparity) axis of s (…, D):
    (best, idx, cost[idx−1], cost[idx+1], best competitor with |d−idx|>1).
    Single source of truth for both the fused-aggregation and standalone WTA
    kernels."""
    d_iota = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
    best = jnp.min(s, axis=-1)
    idx = jnp.min(jnp.where(s == best[..., None], d_iota, jnp.int32(1 << 30)), axis=-1)
    cm = jnp.min(jnp.where(d_iota == idx[..., None] - 1, s, _BIG), axis=-1)
    cp = jnp.min(jnp.where(d_iota == idx[..., None] + 1, s, _BIG), axis=-1)
    comp = jnp.min(jnp.where(jnp.abs(d_iota - idx[..., None]) > 1, s, _BIG), axis=-1)
    return best, idx, cm, cp, comp


def _agg_kernel(*refs, ks, p1, p2, reverse, acc, axis, wta_out, emit_transposed=False):
    # axis 0: the scan axis is the blocks' outer dim — dynamic loads/stores at
    # any dtype are legal, so refs are accessed directly. axis 1: the scan axis
    # is the sublane dim, where narrow-dtype (int8/int16) accesses at arbitrary
    # offsets are not expressible — the cost block is staged into the f32 cbuf
    # scratch and columns collect in the f32 lbuf scratch, stored once at the
    # end. With ``wta_out`` the kernel also emits per-pixel winner statistics
    # from the final summed block — no separate WTA read of the volume.
    refs = list(refs)
    cost_ref = refs.pop(0)
    acc_ref = refs.pop(0) if acc else None
    out_ref = refs.pop(0)
    outt_ref = None
    if wta_out:
        best_ref, idx_ref, cm_ref, cp_ref, comp_ref = refs[:5]
        refs = refs[5:]
        if emit_transposed:
            outt_ref = refs.pop(0)
    if axis == 1:
        cbuf_ref, lbuf_ref, lprev_ref = refs
    else:
        (lprev_ref,) = refs
        cbuf_ref = lbuf_ref = None
    j = pl.program_id(1)
    if axis == 1:
        cbuf_ref[:] = cost_ref[:].astype(jnp.float32)

    def read(ref, s):
        if axis == 0:
            return ref[pl.ds(s, 1)][0]
        return ref[:, pl.ds(s, 1), :][:, 0]

    def write(ref, s, v):
        if axis == 0:
            ref[pl.ds(s, 1)] = v[None]
        else:
            ref[:, pl.ds(s, 1), :] = v[:, None]

    def col(it, _):
        s = (ks - 1 - it) if reverse else it
        src = cbuf_ref if axis == 1 else cost_ref
        c = read(src, s).astype(jnp.float32)  # (TX, D)
        first = jnp.logical_and(j == 0, it == 0)
        l = jnp.where(first, c, _sgm_step_norm(lprev_ref[:], c, p1, p2))
        if axis == 1:
            write(lbuf_ref, s, l)
        elif acc:
            write(out_ref, s, (read(acc_ref, s).astype(jnp.float32) + l).astype(out_ref.dtype))
        else:
            write(out_ref, s, l.astype(out_ref.dtype))
        lprev_ref[:] = _renorm(l)
        return 0

    jax.lax.fori_loop(0, ks, col, 0)
    if axis == 1:
        if acc:
            final = lbuf_ref[:] + acc_ref[:].astype(jnp.float32)
        else:
            final = lbuf_ref[:]
        out_ref[:] = final.astype(out_ref.dtype)
    if wta_out:
        final_f32 = out_ref[:].astype(jnp.float32)
        best, idx, cm, cp, comp = _wta_stats(final_f32)
        best_ref[:] = best
        idx_ref[:] = idx
        cm_ref[:] = cm
        cp_ref[:] = cp
        comp_ref[:] = comp
        if outt_ref is not None:
            # (BS, BX, D) → (D, BS, BX): feeds right_disparity without the
            # separate XLA transpose of the whole volume
            outt_ref[:] = jnp.transpose(out_ref[:], (2, 0, 1))


@functools.partial(
    jax.jit,
    static_argnames=(
        "p1", "p2", "axis", "reverse", "block_s", "block_x", "out_dtype",
        "wta_out", "emit_transposed", "interpret",
    ),
)
def aggregate_dir(
    cost: jax.Array,
    p1: float,
    p2: float,
    axis: int = 0,
    reverse: bool = False,
    acc: jax.Array | None = None,
    block_s: int = 8,
    block_x: int | None = None,
    out_dtype=None,
    wta_out: bool = False,
    emit_transposed: bool = False,
    interpret: bool = False,
):
    """SGM path aggregation along ``axis`` (0 or 1) of cost (H, W, D).

    Computes in float32; stores in ``out_dtype`` (default: acc's dtype, else
    int16 for integer costs / cost dtype otherwise — with integer P1/P2 the
    path costs are exact small integers, so int16 halves volume traffic).

    ``reverse`` aggregates back-to-front in-kernel (no flips). If ``acc`` is
    given (same shape), the path costs are added onto it in place (the running
    4-direction sum) via input/output aliasing. The scan length is padded to a
    block multiple with a constant, which the recurrence treats as a fresh
    start (best − min_prev ≡ 0 on constant slices). D must be a multiple of
    128.
    """
    H, W, D = cost.shape
    if out_dtype is None:
        if acc is not None:
            out_dtype = acc.dtype
        elif jnp.issubdtype(cost.dtype, jnp.integer):
            out_dtype = jnp.int16
        else:
            out_dtype = cost.dtype
    S = cost.shape[axis]
    X = cost.shape[1 - axis]
    if block_x is None:
        # fewer, larger perpendicular tiles amortize the per-column fixed cost
        # of the scan; axis 1 carries two extra f32 staging buffers, so its
        # VMEM budget is tighter. For axis 0 the wta_out 2-D blocks put X in
        # the lane dim, which must be a multiple of 128 (or the full X).
        if axis == 0:
            block_x = X if X <= 384 else 256
        else:
            n_tiles = max(1, -(-X // 160))
            block_x = -(-X // n_tiles)
    pad_s = (-S) % block_s
    if pad_s:
        pad_cfg = [(0, 0), (0, 0), (0, 0)]
        pad_cfg[axis] = (0, pad_s)
        cost = jnp.pad(cost, pad_cfg, constant_values=1.0)
        if acc is not None:
            acc = jnp.pad(acc, pad_cfg)
    ns = (S + pad_s) // block_s
    nx = pl.cdiv(X, block_x)

    if axis == 0:
        blk = (block_s, block_x, D)
        if reverse:
            index_map = lambda i, j: (ns - 1 - j, i, 0)  # noqa: E731
        else:
            index_map = lambda i, j: (j, i, 0)  # noqa: E731
    else:
        blk = (block_x, block_s, D)
        if reverse:
            index_map = lambda i, j: (i, ns - 1 - j, 0)  # noqa: E731
        else:
            index_map = lambda i, j: (i, j, 0)  # noqa: E731
    lprev = pltpu.VMEM((block_x, D), jnp.float32)

    assert not (wta_out and axis != 0), "wta_out requires an axis-0 final pass"
    assert not (emit_transposed and not wta_out), "emit_transposed needs wta_out"
    out_sd = jax.ShapeDtypeStruct(cost.shape, out_dtype)
    spec = pl.BlockSpec(blk, index_map, memory_space=pltpu.VMEM)
    if axis == 1:
        scratches = [pltpu.VMEM(blk, jnp.float32), pltpu.VMEM(blk, jnp.float32), lprev]
    else:
        scratches = [lprev]
    out_specs, out_shape = spec, out_sd
    if wta_out:
        if reverse:
            im2 = lambda i, j: (ns - 1 - j, i)  # noqa: E731
        else:
            im2 = lambda i, j: (j, i)  # noqa: E731
        spec2 = pl.BlockSpec((block_s, block_x), im2, memory_space=pltpu.VMEM)
        f32hw = jax.ShapeDtypeStruct(cost.shape[:2], jnp.float32)
        i32hw = jax.ShapeDtypeStruct(cost.shape[:2], jnp.int32)
        out_specs = (spec, spec2, spec2, spec2, spec2, spec2)
        out_shape = (out_sd, f32hw, i32hw, f32hw, f32hw, f32hw)
        if emit_transposed:
            if reverse:
                im3 = lambda i, j: (0, ns - 1 - j, i)  # noqa: E731
            else:
                im3 = lambda i, j: (0, j, i)  # noqa: E731
            spec3 = pl.BlockSpec((D, block_s, block_x), im3, memory_space=pltpu.VMEM)
            out_specs = out_specs + (spec3,)
            out_shape = out_shape + (
                jax.ShapeDtypeStruct((D, cost.shape[0], cost.shape[1]), out_dtype),
            )
    kwargs = dict(
        grid=(nx, ns),
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratches,
        interpret=interpret,
    )
    body = functools.partial(
        _agg_kernel,
        ks=block_s, p1=float(p1), p2=float(p2), reverse=reverse,
        acc=acc is not None, axis=axis, wta_out=wta_out,
        emit_transposed=emit_transposed,
    )
    if acc is None:
        out = pl.pallas_call(body, in_specs=[spec], **kwargs)(cost)
    else:
        out = pl.pallas_call(
            body, in_specs=[spec, spec], input_output_aliases={1: 0}, **kwargs
        )(cost, acc)
    if not wta_out:
        if pad_s:
            out = out[:S] if axis == 0 else out[:, :S]
        return out
    outs = tuple(o[:S] if pad_s else o for o in out)
    return outs


# ---------------------------------------------------------------------------
# Dual-direction aggregation + fused sum/WTA (the low-traffic pipeline)
# ---------------------------------------------------------------------------


def _dual_auto_block_x(axis: int, X: int, D: int, block_s: int, out_dtype) -> int:
    """Perpendicular tile width for :func:`aggregate_dual`.

    VMEM-aware: per unit of block_x the kernel holds (axis 1) four f32 staging
    blocks + double-buffered in/out block pairs, or (axis 0) just the in/out
    pairs; capped so the whole working set stays ~11 MB. For axis 0 the result
    is the block's sublane dim, which Mosaic requires to be a multiple of 8 or
    the full X — rounded up, with the grid's cdiv absorbing the overhang
    (out-of-range columns are independent junk lanes whose writes are masked).
    """
    isz = jnp.dtype(out_dtype).itemsize
    if axis == 1:
        per_x = block_s * D * (16 + 4 * (1 + isz)) + 8 * D
    else:
        per_x = block_s * D * 4 * (1 + isz) + 8 * D
    # 8 MB budget against the 16 MB scoped-vmem limit: measured stack usage
    # runs ~1.5× this model (Mosaic staging for masked int8 stores), so the
    # headroom is deliberate (D=384 axis-0 tiles OOMed at an 11 MB budget)
    cap = max(32, (8 << 20) // per_x)
    n_tiles = max(1, -(-X // min(cap, 256 if axis == 0 else 160)))
    block_x = -(-X // n_tiles)
    if axis == 0:
        block_x = min(-(-block_x // 8) * 8, X)
    return block_x


def _agg_dual_kernel(*refs, ks, p1, p2, axis, clamp, dg=0, raw=False,
                     seeded=False, final_it=-1):
    # The scan loop is unrolled (ks is small and static): every buffer access
    # becomes a static slice, which Mosaic compiles to direct tile accesses,
    # and the `first` select folds to a constant for all iterations but 0.
    # Forward and backward scans of the SAME axis in one grid sweep: at grid
    # step j the forward carry works on block j while the backward carry works
    # on block ns−1−j (its own input/output specs) — every block is fetched
    # once and written once, halving pass count vs. two aggregate_dir calls
    # and, with int8 path volumes, halving write traffic as well.
    #
    # The carries (lpf/lpb) hold exact unclamped float32 path costs, so the
    # int8 store clamp (pad lanes can reach PAD_COST+P2 > 127) never feeds
    # back into the recurrence — stored pad-lane values only ever reach the
    # sum_wta pass, which masks lanes ≥ d_valid anyway.
    #
    # ``seeded``: the scans start from caller-provided carry rows (bf/bb)
    # instead of a fresh start — the cross-device SGM chain (parallel.
    # disparity_exact) ships these over ICI. The wrapper pads the forward cost
    # at the END and the backward cost at the FRONT, so BOTH scans begin on
    # real rows at (j==0, it==0) and both true final carries occur at
    # it == final_it of the last grid step, where they are captured into the
    # ff/fb outputs (before any pad row can touch the carry). A zero boundary
    # reproduces a fresh start exactly: with a uniform carry,
    # best − min_prev ≡ 0, so L = c.
    refs = list(refs)
    cf_ref = refs.pop(0)
    cb_ref = refs.pop(0)
    bf_ref = refs.pop(0) if seeded else None
    bb_ref = refs.pop(0) if seeded else None
    of_ref = refs.pop(0)
    ob_ref = refs.pop(0)
    ff_ref = refs.pop(0) if final_it >= 0 else None
    fb_ref = refs.pop(0) if final_it >= 0 else None
    if axis == 1:
        cbf_ref, cbb_ref, lbf_ref, lbb_ref, lpf_ref, lpb_ref = refs
    else:
        lpf_ref, lpb_ref = refs
        cbf_ref = cbb_ref = lbf_ref = lbb_ref = None
    j = pl.program_id(1)
    if axis == 1:
        cbf_ref[:] = cf_ref[:].astype(jnp.float32)
        cbb_ref[:] = cb_ref[:].astype(jnp.float32)

    def read(ref, s):
        if axis == 0:
            return jax.lax.slice_in_dim(ref[:], s, s + 1, axis=0)[0]
        return jax.lax.slice_in_dim(ref[:], s, s + 1, axis=1)[:, 0]

    def write(ref, s, v):
        if axis == 0:
            ref[pl.ds(s, 1)] = v[None]
        else:
            ref[:, pl.ds(s, 1), :] = v[:, None]

    for it in range(ks):
        sf = it
        sb = ks - 1 - it
        first = jnp.logical_and(j == 0, it == 0)
        cf = read(cbf_ref if axis == 1 else cf_ref, sf).astype(jnp.float32)
        cb = read(cbb_ref if axis == 1 else cb_ref, sb).astype(jnp.float32)
        if seeded and it == 0:
            # scan start: take the carry from the boundary rows on the first
            # grid step (zeros ≡ fresh start), the scratch carry otherwise
            pf = jnp.where(j == 0, bf_ref[:], lpf_ref[:])
            pb = jnp.where(j == 0, bb_ref[:], lpb_ref[:])
        else:
            pf, pb = lpf_ref[:], lpb_ref[:]
        if raw:  # unnormalized carry; the group-min reduce overlaps the shifts
            if seeded:
                lf = _sgm_step_raw(pf, cf, p1, p2, dg)
                lb = _sgm_step_raw(pb, cb, p1, p2, dg)
            else:
                lf = jnp.where(first, cf, _sgm_step_raw(pf, cf, p1, p2, dg))
                lb = jnp.where(first, cb, _sgm_step_raw(pb, cb, p1, p2, dg))
            lpf_ref[:] = lf
            lpb_ref[:] = lb
        else:
            if seeded:
                lf = _sgm_step_norm(pf, cf, p1, p2, dg)
                lb = _sgm_step_norm(pb, cb, p1, p2, dg)
            else:
                lf = jnp.where(first, cf, _sgm_step_norm(pf, cf, p1, p2, dg))
                lb = jnp.where(first, cb, _sgm_step_norm(pb, cb, p1, p2, dg))
            lpf_ref[:] = _renorm(lf, dg)
            lpb_ref[:] = _renorm(lb, dg)
        if final_it == it:
            # true final carries (normalized form) for the cross-device chain
            @pl.when(j == pl.num_programs(1) - 1)
            def _():
                ff_ref[:] = lpf_ref[:]
                fb_ref[:] = lpb_ref[:]
        if clamp:
            lf = jnp.minimum(lf, 127.0)
            lb = jnp.minimum(lb, 127.0)
        if axis == 1:
            write(lbf_ref, sf, lf)
            write(lbb_ref, sb, lb)
        else:
            write(of_ref, sf, lf.astype(of_ref.dtype))
            write(ob_ref, sb, lb.astype(ob_ref.dtype))
    if axis == 1:
        of_ref[:] = lbf_ref[:].astype(of_ref.dtype)
        ob_ref[:] = lbb_ref[:].astype(ob_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "p1", "p2", "axis", "block_s", "block_x", "out_dtype", "groups",
        "carry", "return_final", "interpret",
    ),
)
def aggregate_dual(
    cost: jax.Array,
    p1: float,
    p2: float,
    axis: int = 0,
    block_s: int | None = None,
    block_x: int | None = None,
    out_dtype=jnp.int16,
    groups: int = 1,
    carry: str = "auto",
    boundary=None,
    return_final: bool = False,
    cost_b=None,
    interpret: bool = False,
):
    """Both directional path-cost volumes along ``axis`` of cost (H, W, D) in
    one kernel sweep → (L_fwd, L_bwd), each the shape of ``cost``.

    With census costs where n_bits + P2 ≤ 127 the per-direction path costs fit
    int8 exactly (L = c + best − min_prev ≤ c_max + P2); pad lanes can exceed
    127 and are clamped on store — harmless, because :func:`sum_wta` masks
    lanes ≥ d_valid before the argmin. Computes in float32 (carries are never
    clamped). D must be a multiple of 128.

    ``groups`` > 1: the lane dim holds that many independent D/groups-wide
    disparity groups (lane-packed image halves, see
    :func:`cost_volume_planes` ``pack``); the recurrence is isolated per group.

    ``boundary``: optional (bf, bb) pair of (X, D) float32 MIN-NORMALIZED
    carry rows seeding the two scans (the cross-device SGM chain of
    parallel.disparity_exact ships these over ICI; zeros reproduce a fresh
    start exactly). ``return_final`` additionally returns (ff, fb): the
    normalized carries after each scan's last REAL row — exactly what the
    next tile's ``boundary`` expects. ``cost_b``: optional separate cost
    volume for the backward scan (the frame-pipelined chain aggregates a
    different frame per direction). All three require ``axis == 0``,
    ``groups == 1``, and the normalized carry.
    """
    H, W, D = cost.shape
    S = cost.shape[axis]
    X = cost.shape[1 - axis]
    seeded = boundary is not None
    if block_s is None:
        # measured on v5e (184×1280×128 pack=4 volumes): groups=4 runs
        # 10-27% faster at block_s=4 than 16 (shorter scan blocks overlap
        # HBM fetch with the heavier grouped recurrence better); groups ≤ 2
        # is flat between 8 and 16 — keep the original 16
        block_s = 4 if groups >= 4 else 16
    if seeded or return_final or cost_b is not None:
        assert axis == 0 and groups == 1, "chain mode: axis 0, no lane packing"
        assert carry in ("auto", "norm"), "chain mode uses the normalized carry"
        carry = "norm"
        assert seeded and return_final, (
            "chain mode takes a boundary and returns finals together"
        )
    if block_x is None:
        block_x = _dual_auto_block_x(axis, X, D, block_s, out_dtype)
    pad_s = (-S) % block_s
    if cost_b is None:
        cost_b = cost
    if pad_s:
        if seeded:
            # forward cost padded at the END, backward at the FRONT: both
            # scans then start on real rows (where the seed is injected) and
            # both final carries happen at it == ks−1−pad_s of the last grid
            # step — before any pad row touches the carry
            cost = jnp.pad(cost, ((0, pad_s), (0, 0), (0, 0)), constant_values=1.0)
            cost_b = jnp.pad(cost_b, ((pad_s, 0), (0, 0), (0, 0)), constant_values=1.0)
        else:
            pad_cfg = [(0, 0), (0, 0), (0, 0)]
            pad_cfg[axis] = (0, pad_s)
            cost = jnp.pad(cost, pad_cfg, constant_values=1.0)
            cost_b = cost
    ns = (S + pad_s) // block_s
    nx = pl.cdiv(X, block_x)

    if axis == 0:
        blk = (block_s, block_x, D)
        im_f = lambda i, j: (j, i, 0)  # noqa: E731
        im_b = lambda i, j: (ns - 1 - j, i, 0)  # noqa: E731
    else:
        blk = (block_x, block_s, D)
        im_f = lambda i, j: (i, j, 0)  # noqa: E731
        im_b = lambda i, j: (i, ns - 1 - j, 0)  # noqa: E731
    spec_f = pl.BlockSpec(blk, im_f, memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec(blk, im_b, memory_space=pltpu.VMEM)
    lprev = pltpu.VMEM((block_x, D), jnp.float32)
    if axis == 1:
        scratches = [
            pltpu.VMEM(blk, jnp.float32), pltpu.VMEM(blk, jnp.float32),
            pltpu.VMEM(blk, jnp.float32), pltpu.VMEM(blk, jnp.float32),
            lprev, lprev,
        ]
    else:
        scratches = [lprev, lprev]
    out_sd = jax.ShapeDtypeStruct(cost.shape, out_dtype)
    clamp = jnp.dtype(out_dtype).itemsize == 1
    assert groups == 1 or D % groups == 0
    if carry == "auto":
        # grouped volumes: the raw-carry step lets the (2-reduction) group
        # min overlap the shift terms instead of serializing the carry chain
        carry = "raw" if groups > 1 else "norm"
    in_specs = [spec_f, spec_b]
    out_specs = [spec_f, spec_b]
    out_shape = [out_sd, out_sd]
    operands = [cost, cost_b]
    if seeded:
        bspec = pl.BlockSpec((block_x, D), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM)
        in_specs += [bspec, bspec]
        operands += [boundary[0].astype(jnp.float32),
                     boundary[1].astype(jnp.float32)]
    if return_final:
        fspec = pl.BlockSpec((block_x, D), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM)
        out_specs += [fspec, fspec]
        out_shape += [jax.ShapeDtypeStruct((X, D), jnp.float32)] * 2
    res = pl.pallas_call(
        functools.partial(
            _agg_dual_kernel, ks=block_s, p1=float(p1), p2=float(p2),
            axis=axis, clamp=clamp, dg=(D // groups if groups > 1 else 0),
            raw=(carry == "raw"), seeded=seeded,
            final_it=(block_s - 1 - pad_s) if return_final else -1,
        ),
        grid=(nx, ns),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratches,
        interpret=interpret,
    )(*operands)
    lf, lb = res[0], res[1]
    if pad_s:
        if seeded:
            lf, lb = lf[:S], lb[pad_s:]
        else:
            sl = [slice(None)] * 3
            sl[axis] = slice(0, S)
            lf, lb = lf[tuple(sl)], lb[tuple(sl)]
    if return_final:
        return lf, lb, res[2], res[3]
    return lf, lb


_BIGI = 1 << 29  # int32-safe "no competitor" sentinel (consumer treats ≥ this
# like _BIG: cm/cp at range boundaries are replaced, and any uniqueness
# comparison against it passes)


@functools.partial(
    jax.jit,
    static_argnames=(
        "d_valid", "emit_transposed", "groups", "interpret", "st_planes"
    ),
)
def sum_wta(
    vols,
    d_valid: int,
    emit_transposed: bool = True,
    groups: int = 1,
    interpret: bool = False,
    st_planes: int | None = None,
):
    """Path volumes → (s_t, best, idx, cm, cp, competitor).

    ``vols`` is the 4-tuple (hf_t, hb_t, vf, vb) straight from the two
    :func:`aggregate_dual` sweeps — hf_t/hb_t in (W, H, D), vf/vb in
    (H, W, D) — the 2-tuple (hf_t, hb_t) for the horizontal-only path family
    (SGMParams.paths == 2), or the legacy 3-tuple (hsum, vf, vb) with hsum
    already relayouted to (H, W, D).

    ``s_t`` is the summed volume already transposed to (D, H, W) for
    :func:`right_disparity` (None unless ``emit_transposed``) — int8 offset
    by −128 for the 2-volume family (sums ≤ 254; argmin-order preserving),
    int16 otherwise; the statistics follow :func:`_wta_stats` semantics with
    lanes ≥ ``d_valid`` masked out.

    ``groups=2`` (lane-packed halves): the statistics are taken per
    D/2-lane group and returned stacked along rows — outputs are
    (2·H, W) with rows [0, H) from group 0 and [H, 2H) from group 1, matching
    the packed pseudo-volume's row split; ``d_valid`` and ``idx`` are
    group-local.

    Plain XLA, deliberately: hand-written Pallas kernels of the same
    computation measured ~1.6-4× slower (the relayouts need XLA's tiled
    transposes). With the 4-tuple and ``emit_transposed`` the transpose-FIRST
    formulation runs: s_t is built directly from two XLA batch transposes of
    the raw volumes and the statistics reduce over s_t's outer (plane) axis —
    no (H, W, D) hsum intermediate ever materializes (measured 4.36 ms vs
    5.20 ms for the hsum form at 720p·D128; bit-identical outputs). A single
    packed key min yields best and argmin together — ties resolve to the
    smallest disparity, matching :func:`_wta_stats`.
    """
    del interpret  # XLA path — flag kept for call-site symmetry
    if len(vols) in (2, 4):
        hf_t, hb_t = vols[0], vols[1]
        vf, vb = (vols[2], vols[3]) if len(vols) == 4 else (None, None)
        if emit_transposed:
            return _sum_wta_st_first(hf_t, hb_t, vf, vb, d_valid, groups,
                                     st_planes=st_planes)
        # stats-only: lane-dim reductions over (H, W, D) win — fall through
        hsum = jnp.transpose(
            hf_t.astype(jnp.int16) + hb_t.astype(jnp.int16), (1, 0, 2)
        )
        vols = (hsum, vf, vb) if vf is not None else (hsum,)
    D = vols[0].shape[-1]
    dg = D // groups
    s = sum(v.astype(jnp.int32) for v in vols)
    d_iota = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    dl = d_iota % dg if groups > 1 else d_iota
    if d_valid < dg:
        s = jnp.where(dl >= d_valid, _BIGI >> 8, s)
    # one reduction for (best, argmin): key = s·D′ + d is exact in int32 as
    # long as s < 2³¹/D′ — real sums are ≤ 4·32767 ≪ that; clamp for safety
    dp = 1
    while dp < dg:
        dp *= 2
    key = jnp.minimum(s, (1 << 30) // dp - 1) * dp + dl
    outs = []
    for g in range(groups):
        if groups == 1:
            kg = key
            sg = s
            dlg = dl
        else:
            gmask = (d_iota >= g * dg) & (d_iota < (g + 1) * dg)
            kg = jnp.where(gmask, key, jnp.int32((1 << 30) - 1))
            sg = jnp.where(gmask, s, _BIGI)
            dlg = dl
        kmin = jnp.min(kg, axis=-1)
        best = kmin // dp
        idx = kmin % dp
        cm = jnp.min(jnp.where(dlg == idx[..., None] - 1, sg, _BIGI), axis=-1)
        cp = jnp.min(jnp.where(dlg == idx[..., None] + 1, sg, _BIGI), axis=-1)
        comp = jnp.min(
            jnp.where(jnp.abs(dlg - idx[..., None]) > 1, sg, _BIGI), axis=-1
        )
        outs.append((best, idx, cm, cp, comp))
    if groups == 1:
        best, idx, cm, cp, comp = outs[0]
    else:
        best, idx, cm, cp, comp = (
            jnp.concatenate(parts, axis=0) for parts in zip(*outs)
        )
    s_t = None
    if emit_transposed:
        s_t = jnp.transpose(jnp.minimum(s, 30000), (2, 0, 1)).astype(jnp.int16)
    return (
        s_t,
        best.astype(jnp.float32),
        idx,
        cm.astype(jnp.float32),
        cp.astype(jnp.float32),
        comp.astype(jnp.float32),
    )


def _wta_lanes_kernel(hf_ref, hb_ref, stats_ref, idx_ref, *, d_valid: int,
                      dg: int, groups: int, bh: int):
    # One read of the two int8 dual volumes; all five winner statistics as
    # LANE-dim reductions over each group's STATIC lane slice. The XLA
    # formulation re-reads the int32 summed volume once per statistic; this
    # kernel is one pass.
    #
    # All 4·groups float statistic maps leave through ONE lane-packed output
    # buffer (plus one for the int idx maps) — the original 5·groups separate
    # (BW, BH) outputs meant 22 tiny DMA transfers per grid step (measured
    # 8× slower at the 720p refine shapes).
    #
    # All arithmetic runs in FLOAT32 on exact small integers: Mosaic lowers
    # int32 lane-dim min-reductions ~14× slower than f32 ones (measured
    # r4, scripts/bench_wta_variants.py: 42 ms int32 vs 3.5 ms f32 for the
    # identical kernel at the stacked refine shape — each int32 lane reduce
    # costs ~0.7 ms vs ~0.05 f32). Sums of two int8 volumes are ≤ 254 and
    # keys ≤ 2²³ − 1 after the clamp, so every value is an exactly
    # representable f32 integer and the outputs are bit-identical to the
    # int32 formulation (the clamp only ever rebounds masked/sentinel lanes,
    # which real statistics never select).
    s = hf_ref[:].astype(jnp.float32) + hb_ref[:].astype(jnp.float32)
    dp = 1
    while dp < dg:
        dp *= 2
    fdp = jnp.float32(dp)
    big = jnp.float32(_BIGI >> 8)  # 2²¹: exceeds any real sum, f32-exact
    for g in range(groups):
        sg = jax.lax.slice_in_dim(s, g * dg, (g + 1) * dg, axis=2)
        dl = jax.lax.broadcasted_iota(jnp.int32, sg.shape, 2)
        dlf = dl.astype(jnp.float32)
        sg = jnp.where(dl >= d_valid, big, sg)
        # key = s·dp + d, clamped so keys stay < 2²³ (exact f32 integers);
        # real sums (≤ 254) are far below the clamp — identical ordering
        key = jnp.minimum(sg, (1 << 23) // dp - 1) * fdp + dlf
        kmin = jnp.min(key, axis=-1)
        best = jnp.floor(kmin / fdp)
        idx = kmin - best * fdp
        # the no-competitor sentinel stays _BIGI (2²⁹ — a power of two, so
        # f32-exact): consumers compare against it (range-boundary cm/cp
        # replacement), and the int32 formulation emits exactly this value
        fbigi = jnp.float32(_BIGI)
        cm = jnp.min(jnp.where(dlf == idx[..., None] - 1, sg, fbigi), axis=-1)
        cp = jnp.min(jnp.where(dlf == idx[..., None] + 1, sg, fbigi), axis=-1)
        comp = jnp.min(
            jnp.where(jnp.abs(dlf - idx[..., None]) > 1, sg, fbigi), axis=-1
        )
        for k, val in enumerate((best, cm, cp, comp)):
            stats_ref[:, (k * groups + g) * bh:(k * groups + g + 1) * bh] = val
        idx_ref[:, g * bh:(g + 1) * bh] = idx.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("d_valid", "groups", "block_w", "block_h", "interpret"),
)
def wta_stats_from_duals(
    hf_t: jax.Array,
    hb_t: jax.Array,
    d_valid: int,
    groups: int = 1,
    block_w: int = 32,
    block_h: int = 128,
    interpret: bool = False,
):
    """(W, H, D) int8 dual path-cost volumes → the :func:`_wta_stats`
    statistics of their sum, masked to ``d_valid`` lanes per ``dg``-lane
    group, as (groups·H, W) maps (group-major rows, matching
    :func:`sum_wta`'s packed convention). Bit-identical to the XLA
    formulation; one volume read instead of one per statistic.

    The stats come out of the kernel in the volumes' (W, H) orientation —
    2-D output blocks need a ×128 lane dim, so ``block_h`` rides the lane
    axis (Mosaic requires H ≥ 128 on hardware; smaller H works in interpret
    mode) — and are transposed back by XLA (small f32 maps)."""
    W, H, D = hf_t.shape
    dg = D // groups
    assert D % groups == 0 and d_valid <= dg
    nw = pl.cdiv(W, block_w)
    nh = pl.cdiv(H, block_h)
    spec3 = pl.BlockSpec(
        (block_w, block_h, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    # two lane-packed outputs (4·groups f32 stat maps; groups int32 idx maps):
    # block (i, j) covers every map's rows [i·BW, (i+1)·BW) for the H-chunk j
    stats_spec = pl.BlockSpec(
        (block_w, 4 * groups * block_h), lambda i, j: (i, j),
        memory_space=pltpu.VMEM,
    )
    idx_spec = pl.BlockSpec(
        (block_w, groups * block_h), lambda i, j: (i, j),
        memory_space=pltpu.VMEM,
    )
    stats, idxs = pl.pallas_call(
        functools.partial(
            _wta_lanes_kernel, d_valid=d_valid, dg=dg, groups=groups,
            bh=block_h,
        ),
        grid=(nw, nh),
        in_specs=[spec3, spec3],
        out_specs=(stats_spec, idx_spec),
        out_shape=(
            jax.ShapeDtypeStruct((nw * block_w, nh * 4 * groups * block_h),
                                 jnp.float32),
            jax.ShapeDtypeStruct((nw * block_w, nh * groups * block_h),
                                 jnp.int32),
        ),
        interpret=interpret,
    )(hf_t, hb_t)
    # unpack: (nw·BW, nh, 4·groups, BH) → per (stat, group) an (H, W) map
    stats = jnp.reshape(stats, (nw * block_w, nh, 4 * groups, block_h))
    idxs = jnp.reshape(idxs, (nw * block_w, nh, groups, block_h))

    def fmap(packed, k):
        m = jnp.reshape(
            jnp.transpose(packed[:, :, k, :], (1, 2, 0)), (nh * block_h, -1)
        )
        return m[:H, :W]

    res = []
    for g in range(groups):
        best = fmap(stats, 0 * groups + g)
        cm = fmap(stats, 1 * groups + g)
        cp = fmap(stats, 2 * groups + g)
        comp = fmap(stats, 3 * groups + g)
        idx = fmap(idxs, g)
        res.append((best, idx, cm, cp, comp))
    best, idx, cm, cp, comp = (
        jnp.concatenate(parts, axis=0) if groups > 1 else parts[0]
        for parts in zip(*res)
    )
    return best, idx, cm, cp, comp


@functools.partial(jax.jit, static_argnames=("d_valid", "groups"))
def st_from_duals(hf_t, hb_t, d_valid: int, groups: int = 1):
    """Just the (D, H, W) summed-transposed volume for
    :func:`right_disparity` — :func:`_sum_wta_st_first`'s s_t construction
    (identical argmin order) without any statistics; pairs with
    :func:`wta_stats_from_duals` on the paths=2 pipeline. With int8 dual
    volumes, stored int8 offset by −128 (sums of two int8 path volumes are
    ≤ 254; masked lanes clamp to the 127 sentinel) — rdisp only argmins, and
    the offset halves the s_t write + rdisp read traffic vs the int16 form.
    int16 duals (census_bits + P2 > 127 configs) keep the int16 clamp-at-30000
    form: a 255 clamp there would collapse real sums into the sentinel."""
    D = hf_t.shape[-1]
    dg = D // groups
    if hf_t.dtype == jnp.int8:
        # sums ≤ 254: build the transpose directly in uint8 (no int32
        # intermediate); masked lanes take 255 → the same 127 sentinel
        st = jnp.transpose(hf_t.astype(jnp.uint8) + hb_t.astype(jnp.uint8),
                           (2, 1, 0))
        if d_valid < dg:
            p_iota = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
            dl = p_iota % dg if groups > 1 else p_iota
            st = jnp.where(dl >= d_valid, jnp.uint8(255), st)
        return (st.astype(jnp.int16) - 128).astype(jnp.int8)
    st = jnp.transpose(hf_t.astype(jnp.int32) + hb_t.astype(jnp.int32), (2, 1, 0))
    if d_valid < dg:
        p_iota = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
        dl = p_iota % dg if groups > 1 else p_iota
        st = jnp.where(dl >= d_valid, _BIGI >> 8, st)
    return jnp.minimum(st, 30000).astype(jnp.int16)


def _sum_wta_st_first(hf_t, hb_t, vf, vb, d_valid: int, groups: int,
                      st_planes: int | None = None):
    """Transpose-first :func:`sum_wta` core (see its docstring): s_t (D, H, W)
    int16 is assembled from two XLA batch transposes of the raw dual-sweep
    volumes, then every statistic reduces along the outer plane axis — one
    read of s_t instead of a second full-volume pass over an hsum
    intermediate. Values are bit-identical to the lane-dim formulation (same
    integer sums, same smallest-d tie resolution)."""
    D = hf_t.shape[-1]
    dg = D // groups
    u8 = vf is None and hf_t.dtype == jnp.int8
    if u8:
        # paths=2 int8 duals: every sum is ≤ 254 (each path clamps at 127),
        # so the summed-transposed volume materializes as UINT8 — ¼ the
        # int32 form's HBM footprint for the pass the statistics re-read.
        # Masked lanes carry 255: strictly above any real sum, so argmin /
        # competitor ordering is unchanged, and the int8 s_t emission maps
        # it to the same 127 sentinel as the int32 sentinel did.
        st = jnp.transpose(hf_t.astype(jnp.uint8) + hb_t.astype(jnp.uint8),
                           (2, 1, 0))
    else:
        st = jnp.transpose(hf_t.astype(jnp.int32) + hb_t.astype(jnp.int32), (2, 1, 0))
    if vf is not None:  # paths=2 sums the horizontal pair only
        st = st + jnp.transpose(vf.astype(jnp.int32) + vb.astype(jnp.int32), (2, 0, 1))
    p_iota = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
    dl = p_iota % dg if groups > 1 else p_iota
    if d_valid < dg:
        st = jnp.where(dl >= d_valid,
                       jnp.uint8(255) if u8 else _BIGI >> 8, st)
    st_sl = st if st_planes is None else st[:st_planes]
    if u8:
        # s_t OFFSET by −128 as int8 (order-preserving — right_disparity
        # only argmins; masked 255 → the 127 sentinel > any real 254−128).
        # Halves the LR chain's dominant HBM traffic (s_t write + rdisp
        # read). ``st_planes`` keeps only the leading lane planes (the
        # packed core's LR-checked strips) — the rest never reach HBM.
        s_t = (st_sl.astype(jnp.int16) - 128).astype(jnp.int8)
    else:
        # int16 duals (census_bits + P2 > 127) keep the int16 form: a 255
        # clamp would collapse real sums into the sentinel.
        s_t = jnp.minimum(st_sl, 30000).astype(jnp.int16)
    # stats reduce the UNCLAMPED masked sum — bit-identical to the lane-dim
    # formulation even on pad lanes (the clamp only exists to fit s_t's int16);
    # XLA fuses the s_t store and these reductions into the same pass over st
    s = st.astype(jnp.int32)
    dp = 1
    while dp < dg:
        dp *= 2
    dli = jax.lax.broadcasted_iota(jnp.int32, (dg,) + st.shape[1:], 0)
    outs = []
    for g in range(groups):
        sg = jax.lax.slice_in_dim(s, g * dg, (g + 1) * dg, axis=0)
        key = jnp.minimum(sg, (1 << 30) // dp - 1) * dp + dli
        kmin = jnp.min(key, axis=0)
        best = kmin // dp
        idx = kmin % dp
        cm = jnp.min(jnp.where(dli == idx[None] - 1, sg, _BIGI), axis=0)
        cp = jnp.min(jnp.where(dli == idx[None] + 1, sg, _BIGI), axis=0)
        if u8 and d_valid < dg:
            # idx can sit at d_valid−1, whose +1 neighbor is a masked lane:
            # restore the int32 form's 2²¹ sentinel there (a REAL sum is
            # ≤ 254, so cp == 255 ⟺ masked) — keeps the raw stats
            # bit-identical to the lane-reduction kernel and the int32 path.
            # cm (idx−1 is always real) and comp (a real competitor ≤ 254
            # always beats 255) cannot select a masked lane.
            cp = jnp.where(cp == 255, _BIGI >> 8, cp)
        comp = jnp.min(jnp.where(jnp.abs(dli - idx[None]) > 1, sg, _BIGI), axis=0)
        outs.append((best, idx, cm, cp, comp))
    if groups == 1:
        best, idx, cm, cp, comp = outs[0]
    else:
        best, idx, cm, cp, comp = (
            jnp.concatenate(parts, axis=0) for parts in zip(*outs)
        )
    return (
        s_t,
        best.astype(jnp.float32),
        idx,
        cm.astype(jnp.float32),
        cp.astype(jnp.float32),
        comp.astype(jnp.float32),
    )


# ---------------------------------------------------------------------------
# Right-view disparity from the left aggregated volume (disp12 check)
# ---------------------------------------------------------------------------


def _rdisp_kernel(aggt_ref, out_ref, best_ref, idx_ref, *, bd: int, d_valid: int, w: int):
    # aggt_ref block: (BD, BH, W) of the (D, H, W)-transposed volume; for
    # right pixel u the cost at disparity d is S[y, u+d, d] = aggt[d, y, u+d].
    # A dynamic (traced-shift) lane rotate costs ~8× a static one, so the
    # per-plane alignment happens in a block-local frame v = u + j·bd using
    # only STATIC rotates (plane dd rotated by −dd), and the block's running
    # (min, argmin) is realigned into the carry with ONE dynamic rotate per
    # grid step. Ties resolve to the smallest d throughout (strict <).
    # Grid is (groups, nh, nd): the lane-packed LR chain batches its strips'
    # independent argmins into one launch (group g reads its own plane slab
    # via the in_spec index map; g never appears in the math below).
    j = pl.program_id(2)
    bh = aggt_ref.shape[1]
    wp = aggt_ref.shape[2]
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (bh, wp), 1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, _BIG)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    lbest = jnp.full((bh, wp), _BIG, jnp.float32)
    lidx = jnp.zeros((bh, wp), jnp.int32)
    for dd in range(bd):  # unrolled: static lane rotates
        row = jax.lax.slice_in_dim(aggt_ref[:], dd, dd + 1, axis=0)[0].astype(jnp.float32)
        # v-frame: value for right pixel u = v − j·bd sits at lane v; the
        # u+d<w wrap mask is v+dd<w here — static iota compare
        shifted = pltpu.roll(row, (wp - dd) % wp, 1)
        valid = ((u_iota + dd) < w) & (j * bd + dd < d_valid)
        shifted = jnp.where(valid, shifted, _BIG)
        take = shifted < lbest
        lbest = jnp.where(take, shifted, lbest)
        lidx = jnp.where(take, dd, lidx)
    # realign v → u (one dynamic rotate), mask lanes that wrapped past Wp;
    # shift normalized non-negative (negative dynamic rolls miscompile at
    # non-power-of-two widths — see _cost_kernel)
    sh = j * bd
    lbest = pltpu.roll(lbest, (-sh) % wp, 1)
    lidx = pltpu.roll(lidx, (-sh) % wp, 1)
    lbest = jnp.where(u_iota < wp - sh, lbest, _BIG)
    take = lbest < best_ref[:]
    best_ref[:] = jnp.where(take, lbest, best_ref[:])
    idx_ref[:] = jnp.where(take, lidx + sh, idx_ref[:])
    out_ref[0, :, :] = idx_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "d_valid", "block_h", "block_d", "pre_transposed", "plane_offset",
        "groups", "group_stride", "interpret"
    ),
)
def right_disparity(
    agg: jax.Array, d_valid: int, block_h: int = 8, block_d: int = 32,
    pre_transposed: bool = False, plane_offset: int = 0,
    groups: int = 1, group_stride: int | None = None, interpret: bool = False,
):
    """(H, W, D) aggregated volume → (H, W) right-view disparity indices:
    dR(u) = argmin_{d<d_valid} agg[y, u+d, d] (cv2's disp12 companion view,
    computed from the same volume — no second matching pass).

    ``plane_offset``: skip that many leading d-planes (a lane-packed volume's
    group g lives at planes [g·dg, (g+1)·dg)).

    ``groups`` > 1 (with ``group_stride`` = dg planes per group, requires
    ``pre_transposed``): batch ALL lane groups' independent argmins into ONE
    kernel launch — group g reads planes [offset + g·dg, …) and its (H, W)
    result lands at output rows [g·H, (g+1)·H). Replaces the packed LR
    chain's per-group call loop (one pad + one launch instead of ``groups``
    of each). Requires H to be a block_h multiple so group row ranges align
    with the output grid (the packed core pads strips to ×8 rows)."""
    if pre_transposed:  # (D, H, W) straight from the fused aggregation pass
        aggt = agg
        D, H, W = agg.shape
    else:
        H, W, D = agg.shape
        aggt = jnp.transpose(agg, (2, 0, 1))  # (D, H, W)
    Wp = -(-W // 128) * 128  # lane-align for the dynamic rotate
    if Wp != W:
        aggt = jnp.pad(aggt, ((0, 0), (0, 0), (0, Wp - W)))
    nh = pl.cdiv(H, block_h)
    nd = pl.cdiv(d_valid, block_d)
    assert plane_offset % block_d == 0
    if groups > 1:
        assert pre_transposed and group_stride is not None
        assert group_stride % block_d == 0 and H % block_h == 0
        assert plane_offset + (groups - 1) * group_stride + d_valid <= D
        gs_b = group_stride // block_d
    else:
        assert plane_offset + d_valid <= D
        gs_b = 0
    off_b = plane_offset // block_d
    out = pl.pallas_call(
        functools.partial(_rdisp_kernel, bd=block_d, d_valid=d_valid, w=W),
        grid=(groups, nh, nd),
        in_specs=[
            pl.BlockSpec(
                (block_d, block_h, Wp),
                lambda g, i, j: (j + off_b + g * gs_b, i, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, block_h, Wp), lambda g, i, j: (g, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((groups, H, Wp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((block_h, Wp), jnp.float32),
            pltpu.VMEM((block_h, Wp), jnp.int32),
        ],
        interpret=interpret,
    )(aggt)
    if groups > 1:
        return out.reshape(groups * H, Wp)[:, :W]
    return out[0, :, :W]


# ---------------------------------------------------------------------------
# Bounded horizontal gather (shift-select)
# ---------------------------------------------------------------------------


def _shift_gather_kernel(
    src_ref, off_ref, out_ref, acc_ref, *, bs: int, single: bool, clipped: bool
):
    # out[y, x] = src[y, x − off[y, x]], via roll-and-select:
    # Σ_s (off == s ∧ x ≥ s)·roll(src, s). A per-pixel lane gather is not
    # expressible on TPU; max_offset rolls of the row block are cheap. The
    # x ≥ s guard keeps the circular roll's wrap from leaking right-edge
    # pixels into out-of-range offsets. The block's offset base j·bs is
    # applied as ONE dynamic (traced-shift) rotate of src; the unrolled inner
    # rotates are static (a dynamic lane rotate costs ~8× a static one).
    # ``single`` marks a one-step offset grid (ns == 1): j is statically 0, so
    # the base rotate and the accumulator carry disappear.
    j = pl.program_id(1)

    off = off_ref[:]
    x_iota = None if clipped else jax.lax.broadcasted_iota(jnp.int32, off.shape, 1)

    def sweep(acc, base):
        for ss in range(bs):  # unrolled: static rotates
            s = j * bs + ss
            rolled = pltpu.roll(base, ss, 1)
            # ``clipped``: the caller guarantees off ≤ x everywhere, so
            # off == s already implies x ≥ s — the wrap guard (a compare +
            # and per roll, ~half the kernel's VPU work) drops out
            sel = (off == s) if clipped else ((off == s) & (x_iota >= s))
            acc = jnp.where(sel, rolled, acc)
        return acc

    if single:
        out_ref[:] = sweep(jnp.zeros_like(out_ref), src_ref[:])
        return

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Data-dependent pruning: offset fields from the SGM pipeline (warped-
    # image shifts, disparities) are locally smooth, so a given row block
    # usually spans a small slice of [0, max_offset) — skip this grid step's
    # whole roll unroll when none of its bs offsets occur in the block.
    hit = jnp.any((off >= j * bs) & (off < (j + 1) * bs))

    @pl.when(hit)
    def _():
        base = pltpu.roll(src_ref[:], j * bs, 1)
        acc_ref[:] = sweep(acc_ref[:], base)

    out_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("max_offset", "block_h", "block_s", "assume_clipped", "interpret"),
)
def shift_gather(
    src: jax.Array,
    offsets: jax.Array,
    max_offset: int,
    block_h: int = 16,
    block_s: int | None = None,
    assume_clipped: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """(H, W) src, (H, W) int32 offsets in [0, max_offset) →
    out[y, x] = src[y, x − offsets[y, x]]; entries whose offset is outside
    [0, max_offset) or reaches left of the image (off > x) come back 0.
    Replaces per-pixel take_along_axis gathers (≈9 ms at 720p) with max_offset
    lane rotates (≈1 ms). ``block_s`` (rolls per grid step) defaults to the
    smallest unroll whose grid covers max_offset with ≤128-step blocks — a
    fixed 64 wasted up to 49% of the rolls (e.g. 128 for max_offset 65).

    ``assume_clipped``: caller guarantees offsets ≤ x (e.g. via
    ``jnp.clip(off, 0, x)``) — skips the per-roll left-edge guard, ~2× fewer
    VPU ops. Every SGM-internal call site pre-clips."""
    H, W = src.shape
    assert offsets.shape == src.shape, (offsets.shape, src.shape)
    Wp = -(-W // 128) * 128
    if Wp != W:
        src = jnp.pad(src, ((0, 0), (0, Wp - W)))
        offsets = jnp.pad(offsets, ((0, 0), (0, Wp - W)), constant_values=-1)
    nh = pl.cdiv(H, block_h)
    if block_s is None:
        block_s = -(-max_offset // pl.cdiv(max_offset, 128))
    ns = pl.cdiv(max_offset, block_s)
    out = pl.pallas_call(
        functools.partial(
            _shift_gather_kernel, bs=block_s, single=(ns == 1),
            clipped=assume_clipped,
        ),
        grid=(nh, ns),
        in_specs=[
            pl.BlockSpec((block_h, Wp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, Wp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_h, Wp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, Wp), src.dtype),
        scratch_shapes=[pltpu.VMEM((block_h, Wp), src.dtype)],
        interpret=interpret,
    )(src, offsets.astype(jnp.int32))
    return out[:, :W]


# ---------------------------------------------------------------------------
# Speckle window counts
# ---------------------------------------------------------------------------


def _speckle_kernel(a_ref, b_ref, out_ref, sbuf_ref, *, bh, halo, k, r, nbins):
    # Strip = two stitched (bh, Wp) blocks of the replicate-padded dv field
    # (same halo trick as the census kernel). For each of the two half-offset
    # binnings and each bin: indicator → k-row sum → k-col sum (static slices
    # and rotates) → masked by the center pixel's own bin; the max over
    # binnings is the speckle neighbor count. All counts are small integers,
    # exact in f32 → bit-identical to the XLA window-sum path.
    sbuf_ref[pl.ds(0, bh)] = a_ref[:]
    sbuf_ref[pl.ds(bh, bh)] = b_ref[:]
    strip = sbuf_ref[:]
    wp = strip.shape[-1]

    def left_roll(x, s):
        return pltpu.roll(x, (wp - s) % wp, 1)

    count = jnp.zeros((bh, wp), jnp.float32)
    for off in (0.0, 0.5):
        bfield = jnp.floor(strip / r + off)
        center = left_roll(
            jax.lax.slice_in_dim(bfield, halo, halo + bh, axis=0), halo
        )

        # bins iterate as a fori_loop over chunks of 4 with static offsets
        # inside: full unrolling keeps nbins×k live temporaries and blows the
        # VMEM stack at nbins ≥ ~10, while a per-bin loop serializes and loses
        # the cross-bin instruction overlap (measured 1.3× slower); chunks
        # beyond nbins are harmless (no pixel's bin reaches them)
        def chunk_body(ci, c):
            for q in range(4):
                bi = ci * 4 + q
                ind = (bfield == bi).astype(jnp.float32)
                vs = jax.lax.slice_in_dim(ind, 0, bh, axis=0)
                for dy in range(1, k):
                    vs = vs + jax.lax.slice_in_dim(ind, dy, dy + bh, axis=0)
                hs = vs
                for dx in range(1, k):
                    hs = hs + left_roll(vs, dx)
                c = c + hs * (center == bi).astype(jnp.float32)
            return c

        c = jax.lax.fori_loop(
            0, -(-nbins // 4), chunk_body, jnp.zeros((bh, wp), jnp.float32)
        )
        count = jnp.maximum(count, c)
    out_ref[:] = count


@functools.partial(jax.jit, static_argnames=("k", "r", "nbins", "interpret"))
def speckle_counts(
    dv: jax.Array, k: int, r: float, nbins: int, interpret: bool = False
) -> jax.Array:
    """(H, W) disparity field (invalid pixels pre-set far out of range) →
    (H, W) count of same-disparity-bin pixels in the k×k window, maxed over
    two half-offset binnings of width ``r`` — the windowed speckle statistic
    of ``stereo.sgm._speckle_suppress``, one fused pass instead of
    2·nbins separable box filters."""
    H, W = dv.shape
    halo = k // 2
    bh = -(-max(8, k - 1) // 8) * 8  # strip (2·bh) must cover bh + 2·halo rows
    p = _pad_replicate2d(dv.astype(jnp.float32), halo, halo)
    nh = pl.cdiv(H, bh)
    rows = (nh + 1) * bh
    Wp = -(-(W + 2 * halo) // 128) * 128
    p = jnp.pad(p, ((0, rows - p.shape[0]), (0, Wp - p.shape[1])))
    spec = lambda m: pl.BlockSpec((bh, Wp), m, memory_space=pltpu.VMEM)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(
            _speckle_kernel, bh=bh, halo=halo, k=k, r=float(r), nbins=nbins
        ),
        grid=(nh,),
        in_specs=[spec(lambda i: (i, 0)), spec(lambda i: (i + 1, 0))],
        out_specs=spec(lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nh * bh, Wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2 * bh, Wp), jnp.float32)],
        interpret=interpret,
    )(p, p)
    return out[:H, :W]


# ---------------------------------------------------------------------------
# Fused winner-take-all
# ---------------------------------------------------------------------------


def _wta_kernel(agg_ref, best_ref, idx_ref, cm_ref, cp_ref, comp_ref):
    best, idx, cm, cp, comp = _wta_stats(agg_ref[:].astype(jnp.float32))
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
    return pl.pallas_call(
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


# ---------------------------------------------------------------------------
# Nearest-valid horizontal fill (both directions, one VMEM pass)
# ---------------------------------------------------------------------------


def _nearest_lohi_kernel(disp_ref, valid_ref, dup_ref, lo_ref, hi_ref, *, w: int):
    # Jump-pointer doubling for BOTH horizontal nearest-valid fills entirely
    # in VMEM: level k takes lane l∓k's running (value, has) wherever this
    # lane is still unfilled — after ⌈log2 w⌉ levels every lane holds its
    # nearest valid value on that side. The XLA formulation (_last_valid_scan)
    # materializes every level as a full HBM-resident map (~4·log2(w) volume
    # passes for the 4 directions); here the levels live in registers and the
    # map is read once and written once. All rolls are STATIC lane rotates
    # (k is a Python constant — the cheap kind; see _rdisp_kernel).
    # ``has`` rides as f32 0/1: lane rotates of i1 masks are not
    # Mosaic-supported at every width.
    wp = disp_ref.shape[-1]
    x_iota = jax.lax.broadcasted_iota(jnp.int32, disp_ref.shape, 1)
    valid = jnp.where(valid_ref[:] > 0.5, 1.0, 0.0)
    valid = jnp.where(x_iota < w, valid, 0.0)
    v0 = disp_ref[:] * valid
    lval, lhas = v0, valid
    rval, rhas = v0, valid
    k = 1
    while k < w:
        # left fill (nearest valid at x' ≤ x): candidate = lane l−k
        cv = pltpu.roll(lval, k, 1)
        ch = jnp.where(x_iota >= k, pltpu.roll(lhas, k, 1), 0.0)
        take = lhas < 0.5
        lval = jnp.where(take, cv, lval)
        lhas = jnp.where(take, ch, lhas)
        # right fill: candidate = lane l+k (wrap masked against the REAL
        # width — pad lanes acquire stale values during doubling)
        cv = pltpu.roll(rval, (wp - k) % wp, 1)
        ch = jnp.where(x_iota < w - k, pltpu.roll(rhas, (wp - k) % wp, 1), 0.0)
        take = rhas < 0.5
        rval = jnp.where(take, cv, rval)
        rhas = jnp.where(take, ch, rhas)
        k *= 2
    dup = dup_ref[:]
    lv = jnp.where(lhas > 0.5, lval, dup)
    rv = jnp.where(rhas > 0.5, rval, dup)
    lo_ref[:] = jnp.minimum(lv, rv)
    hi_ref[:] = jnp.maximum(lv, rv)


@functools.partial(jax.jit, static_argnames=("block_h", "interpret"))
def nearest_valid_lohi(
    disp: jax.Array,
    valid: jax.Array,
    d_up: jax.Array,
    block_h: int = 64,
    interpret: bool = False,
):
    """(H, W) disparity + validity + fallback → per-row (lo, hi): the min and
    max of the two horizontal nearest-valid fills, with ``d_up`` substituted
    on sides that have no valid pixel. Exactly
    ``min/max(where(has_l, val_l, d_up), where(has_r, val_r, d_up))`` of
    :func:`stereo.sgm._last_valid_scan` along axis 1 — one Pallas pass
    instead of 2·log2(W) materialized XLA levels. Run on the transposed map
    for the vertical directions (XLA batch transposes run near HBM speed)."""
    H, W = disp.shape
    Wp = -(-W // 128) * 128
    nh = pl.cdiv(H, block_h)
    Hp = nh * block_h
    pad = ((0, Hp - H), (0, Wp - W))
    if pad != ((0, 0), (0, 0)):
        disp = jnp.pad(disp, pad)
        valid = jnp.pad(valid, pad)
        d_up = jnp.pad(d_up, pad)
    spec = pl.BlockSpec((block_h, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)
    lo, hi = pl.pallas_call(
        functools.partial(_nearest_lohi_kernel, w=W),
        grid=(nh,),
        in_specs=[spec] * 3,
        out_specs=(spec, spec),
        out_shape=(f32, f32),
        interpret=interpret,
    )(disp.astype(jnp.float32), valid.astype(jnp.float32),
      d_up.astype(jnp.float32))
    return lo[:H, :W], hi[:H, :W]
