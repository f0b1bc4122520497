"""The disparity engine: census cost volume + semi-global matching on TPU.

This replaces the reference's ``cv2.StereoSGBM`` recipe (depth_map.py:894-909:
minDisparity=0, numDisparities=320, blockSize=7, P1/P2, uniquenessRatio=10,
disp12MaxDiff=1, speckleWindowSize=100, speckleRange=32, MODE_SGBM_3WAY) with a
TPU-first design:

- matching cost: census transform + Hamming distance (gain/bias-robust, integer
  VPU ops) instead of SGBM's Birchfield–Tomasi + prefilter;
- aggregation: 4 semi-global paths (→ ← ↓ ↑, the same path family as
  MODE_SGBM_3WAY's horizontal+vertical passes). On TPU these run as Pallas
  kernels (ops.sgm_pallas): int8 cost / int16 sum volumes, the running L row
  in VMEM scratch, and fused winner-take-all in the final pass; on CPU the
  same recurrence runs as ``lax.scan`` (the two paths are bit-identical with
  integer penalties — tests compare them exactly);
- post: winner-take-all + parabola subpixel, uniqueness ratio, left–right
  consistency, windowed speckle suppression, median filter;
- ``mode="hier"``: coarse-to-fine (full range at 1/4 scale, then a ≥128-wide
  window refined at full resolution against a disparity-warped right image).

Everything is one jittable function over static ``SGMParams``; batching over a
leading frame axis comes free via ``vmap`` (frame-parallel disparity is sharded
over the device mesh in ``parallel.disparity``).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from stereovision_tpu.core import image as im
from stereovision_tpu.utils.backend import is_tpu_backend

_BIG = jnp.float32(1e9)


@dataclasses.dataclass(frozen=True)
class SGMParams:
    """Static disparity-engine configuration (hashable → one jit cache entry).

    Mirrors the cv2.StereoSGBM knobs it replaces (reference depth_map.py:31-33,
    894-906); P1/P2 are in census-bit units rather than BT-cost units.
    """

    min_disparity: int = 0
    num_disparities: int = 128
    census_ksize: int = 5   # census window width (5x5 = one 24-bit word; the
    census_wsize: int = 5   # 7x5 blockSize-analog window costs 2x for ~equal quality
    p1: float = 8.0         # small-jump penalty
    p2: float = 96.0        # large-jump penalty
    uniqueness_ratio: int = 10      # % margin, cv2 semantics; 0 disables
    lr_max_diff: int = 1            # disp12MaxDiff; <0 disables
    speckle_window_size: int = 100  # component-area analog; 0 disables
    speckle_range: float = 32.0
    median_ksize: int = 5           # post median (reference depth_map.py:912)
    subpixel: bool = True
    # kernel implementation: "auto" → Pallas on TPU, XLA elsewhere;
    # "pallas_interpret" runs the Pallas kernels in interpreter mode (tests)
    impl: str = "auto"
    # "full" searches all num_disparities at full resolution; "hier" runs a
    # coarse 1/coarse_scale pass over the whole range, warps the right image by
    # the upsampled coarse disparity, and refines a refine_range window at full
    # resolution — ~(num_disparities/refine_range)× less full-res work.
    # "hier2" adds a second refine pass against a high-side (max-envelope)
    # window and fills pixels the low window missed — recovers the ≤R-wide
    # strips at depth discontinuities larger than refine_range that plain
    # "hier" invalidates, at ~1.6× hier cost (still ≫ full-search speed)
    mode: str = "full"
    coarse_scale: int = 4
    # hier coarse-pass path family: 4 = keep the vertical dual sweep at
    # coarse resolution (vertical coherence for window placement); 2 =
    # horizontal-only — also flips the coarse LR chain to the int8 offset
    # s_t (2-path int8 sums fit; 4-path sums need int16). The coarse solve
    # only PLACES refine windows (±margin slack absorbs small errors), so
    # prod runs 2 — measured quality-neutral on all 4 scenes.
    coarse_paths: int = 4
    # hier2 cross-window arbitration: candidates from the two windows are
    # compared by census Hamming distance against the ORIGINAL right image —
    # window-independent data evidence (an aggregated-cost comparison between
    # windows is noisy: a window missing the true match can hallucinate a
    # smooth surface whose path costs beat the true window's). census_kill
    # additionally invalidates candidates whose data evidence is noise-level
    # (torn-warp hallucinations); 0 disables the kill, not the arbitration.
    census_kill: float = 6.0
    # fill the remaining invalid pixels from their nearest valid neighbor
    # (4-direction, ties to the smaller = farther disparity — the occlusion
    # convention) + 5x5 median: every pixel then carries a best-effort value
    # and the returned mask is all-true. Off by default (cv2 SGBM leaves
    # invalids at min_disparity-1).
    fill_invalid: bool = False
    # 32 (the pack=4 refine) measured BETTER than 64 on 3/4 quality scenes in
    # hier and on 4/4 in hier2 (narrower windows exclude more wrong matches)
    # while running ~1.4x faster; plain hier on large-discontinuity scenes
    # ("steps") is the one case 64 wins — hier2 covers it strictly better.
    refine_range: int = 32
    # lane packing: pack ∈ {2, 4} solves the image's pack horizontal strips as
    # independent (128/pack)-lane disparity groups of one 128-lane volume —
    # every volume stage divides by pack. Requires num_disparities ≤ 128/pack;
    # vertical paths restart at the strip seams (same warm-up approximation as
    # the multi-chip row tiling in parallel/disparity). Set internally by the
    # hier refine from refine_range; usable directly for small full searches.
    pack: int = 1
    # SGM path family: 4 = two dual sweeps (→ ← ↓ ↑, the default); 2 = the
    # horizontal pair only — drops the vertical sweep (~35% of aggregation
    # work). Mainly useful for the hier refine, where the coarse pass already
    # fixed global structure and lane packing shortens vertical paths anyway.
    paths: int = 4
    # paths=2 WTA-statistics formulation: "pallas" = the one-pass
    # lane-reduction kernel (fastest on a quiet chip: one ~60 MB volume read);
    # "xla" = the transpose-first XLA formulation (_sum_wta_st_first). Under
    # shared-host HBM contention the Pallas kernel's per-group masked lane
    # reductions degrade ~20× while the XLA streaming form degrades only ~4×
    # (measured 30 vs 4.4 ms at the 720p refine shapes in a loaded window) —
    # "auto" lets DepthPipeline/bench autotune the choice per session.
    stats_impl: str = "pallas"
    # hier2 window-B vertical decimation: 3 = the stacked refine solves
    # window B on every 3rd row as pack strip 3 of an [A(H); B(H/3)] stack
    # (A = strips 0-2, LR-checked; total refine volume −33% vs the [A; B]
    # 2H stack) and row-repeats B's field back to H before arbitration.
    # B recovers vertically-extensive occlusion strips, and the census
    # arbitration judges its candidates per-pixel at full resolution, so
    # decimation errors are killed by data evidence. 1 = full-height B.
    # Requires H % 24 == 0 (strip seams must land on the A/B boundary);
    # other heights fall back to the full-height stack.
    b_decimate: int = 1
    # packed-core LR restriction: 0 = left-right-check every pack strip; n>0
    # = only the first n strips build s_t / right-disparity / LR-compare
    # (their lane planes slice out of the dual volumes before the summed
    # volume ever materializes). Set by the stacked two-window refine, whose
    # strips 0..pack/2−1 are window A (LR on) and the rest window B (LR off,
    # matching the sequential form's lr=False pass — validity there is
    # uniqueness + seam masking + census arbitration).
    lr_groups: int = 0
    # horizontal-aggregation column segmentation (paths=2 only): the scan
    # restarts every W/agg_wseg columns, with the segments stacked along the
    # row axis. Built on the theory that shorter carry chains with more
    # parallel rows per step would beat the latency-bound recurrence —
    # MEASURED OTHERWISE on v5e (720p pack=4: wseg=5 costs +5 ms/frame over
    # wseg=1 in the full pipeline; the dual sweep alone is flat at best).
    # Kept for experimentation; leave at 1 for production. Active only when
    # W divides by 128·agg_wseg.
    agg_wseg: int = 1

    def __post_init__(self):
        # only 3× B-decimation is implemented (24-row strip seams); any other
        # value >1 would silently degrade to the full-height stack at use
        if self.b_decimate not in (1, 3):
            raise ValueError(
                f"b_decimate must be 1 (full-height window B) or 3 "
                f"(implemented decimation factor); got {self.b_decimate}"
            )


def reference_preset(mode: str = "hier") -> "SGMParams":
    """The reference's exact SGBM search configuration (depth_map.py:31-33,
    894-906): 320 disparities from 0, blockSize-7-analog census support,
    uniqueness 10, disp12MaxDiff 1, speckle 100/32, median post-filter."""
    return SGMParams(
        min_disparity=0, num_disparities=320,
        uniqueness_ratio=10, lr_max_diff=1,
        speckle_window_size=100, speckle_range=32.0, median_ksize=5,
        mode=mode,
    )


def production_preset() -> "SGMParams":
    """The headline 720p configuration: the reference's full 320-disparity
    search, run as hier2 (two complementary R=32 windows, pack=4 lane
    packing, horizontal path family, 1/3-scale coarse pass) with census-evidence arbitration and data-driven invalid
    fill. Beats the cv2 SGBM_3WAY reference's bad2 on every quality scene
    (scripts/eval_quality.py --modes prod) at the engine's fastest measured
    pipeline shape."""
    return SGMParams(
        num_disparities=320, mode="hier2", refine_range=32, paths=2,
        coarse_scale=3, census_kill=6.0, fill_invalid=True,
        # window B solves on every 3rd row ([A(H); B(H/3)] stack — refine
        # volume −33%, measured 10.3 → 8.2 ms/frame r4) with per-pixel
        # census arbitration judging its candidates at full resolution:
        # quality identical to the full-height stack on all 4 scenes
        # (bad2 0.32/0.00/0.19/0.34% vs cv2's 0.52/24.4/0.45/0.96%)
        b_decimate=3,
        # horizontal-only coarse pass (the 5×5 coarse median + wider v_rad
        # substitute for the vertical sweep's coherence — see coarse_paths):
        # −0.4 ms/frame, still beats cv2 bad2 on all 4 scenes (multi-seed
        # audited r5; margins: boxes ~0.48 vs 0.52, gain ~0.53 vs 0.96)
        coarse_paths=2,
        # "auto": DepthPipeline/bench probe the chip once per session and pin
        # the faster WTA-stats formulation (stereo.autotune). Direct
        # compute_disparity callers get the Pallas form (the quiet-chip
        # winner) — resolution is the entry point's job, not the kernel's.
        stats_impl="auto",
    )


def _resolve_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    return "pallas" if is_tpu_backend() else "xla"


# ---------------------------------------------------------------------------
# Cost volume
# ---------------------------------------------------------------------------


def census_cost_volume(left: jax.Array, right: jax.Array, p: SGMParams) -> jax.Array:
    """(H, W) grayscale pair → (H, W, D) float32 Hamming cost volume.

    cost[y, x, d] = hamming(census_L[y, x], census_R[y, x - (min_d + d)]).
    Out-of-image matches get the max cost (census bit count) so they never win.
    """
    cl = im.census_transform(left, p.census_ksize, p.census_wsize)   # (H, W, nw)
    cr = im.census_transform(right, p.census_ksize, p.census_wsize)
    return cost_from_census(cl, cr, p)


def cost_from_census(cl: jax.Array, cr: jax.Array, p: SGMParams) -> jax.Array:
    """(H, W, nw) census pair → (H, W, D) cost volume (see
    :func:`census_cost_volume`; split out so lane-packed halves can share one
    full-image census — the seam rows must see real neighbor rows)."""
    H, W = cl.shape[0], cl.shape[1]
    D = p.num_disparities
    n_bits = p.census_ksize * p.census_wsize - 1
    x = jnp.arange(W)
    d = jnp.arange(D) + p.min_disparity
    src = x[None, :] - d[:, None]                      # (D, W)
    valid = (src >= 0) & (src <= W - 1)  # right edge matters for min_d < 0
    src = jnp.clip(src, 0, W - 1)
    # Gather right census at shifted columns: (D, H, W, nw).
    cr_shift = cr[:, src, :]                           # (H, D, W, nw)
    cr_shift = jnp.moveaxis(cr_shift, 1, 0)            # (D, H, W, nw)
    cost = im.hamming_words(cl[None], cr_shift).astype(jnp.float32)  # (D, H, W)
    cost = jnp.where(valid[:, None, :], cost, float(n_bits))
    return jnp.moveaxis(cost, 0, -1)                   # (H, W, D)


# ---------------------------------------------------------------------------
# Path aggregation
# ---------------------------------------------------------------------------


def _effective_wseg(p: SGMParams, W: int, H: int) -> int:
    """agg_wseg when it applies: horizontal-only path family and shapes the
    segmented cost-kernel layout can store (the SAME gate for both impls —
    parity depends on identical restart columns)."""
    if p.paths != 2 or p.agg_wseg <= 1:
        return 1
    ok = W % (128 * p.agg_wseg) == 0 and H % 8 == 0
    return p.agg_wseg if ok else 1


def _aggregate_dir(cost_sw: jax.Array, p1: float, p2: float) -> jax.Array:
    """Aggregate along the leading (scan) axis: (S, X, D) → (S, X, D).

    The recurrence L(d) = C(d) + min(Lp(d), Lp(d±1)+P1, minLp+P2) − minLp,
    evaluated in min-normalized-carry form and shared with the Pallas kernels
    (ops.sgm_pallas._sgm_step_norm) so the two implementations stay
    bit-identical.
    """
    from stereovision_tpu.ops.sgm_pallas import _renorm, _sgm_step_norm

    def step(carry, c):
        l = _sgm_step_norm(carry, c, p1, p2)
        return _renorm(l), l

    _, ls = jax.lax.scan(step, _renorm(cost_sw[0]), cost_sw[1:])
    return jnp.concatenate([cost_sw[:1], ls], axis=0)


def aggregate(cost: jax.Array, p: SGMParams) -> jax.Array:
    """4-direction semi-global aggregation of (H, W, D) → summed (H, W, D).

    Pallas path: the cost volume's D axis is padded to a lane multiple with a
    huge cost (padded disparities never win), the two horizontal paths scan a
    (W, H, D) transpose, the two vertical paths scan natively.
    """
    impl = _resolve_impl(p.impl)
    if impl == "xla":
        p1, p2 = jnp.float32(p.p1), jnp.float32(p.p2)
        H, W, D = cost.shape
        # left→right: scan over W; state is (H, D) per column.
        cost_w = jnp.moveaxis(cost, 1, 0)  # (W, H, D)
        seg = _effective_wseg(p, W, H)
        if seg > 1:
            # segmented horizontal scans (see SGMParams.agg_wseg): stack the
            # W-segments along the row axis so each scan step carries seg·H
            # independent rows and restarts at segment boundaries — the exact
            # semantics of the segmented Pallas layout (parity-tested)
            Wseg = W // seg
            cw = jnp.reshape(
                jnp.transpose(jnp.reshape(cost_w, (seg, Wseg, H, D)), (1, 0, 2, 3)),
                (Wseg, seg * H, D),
            )
            sseg = _aggregate_dir(cw, p1, p2)
            sseg = sseg + _aggregate_dir(cw[::-1], p1, p2)[::-1]
            s = jnp.reshape(
                jnp.transpose(jnp.reshape(sseg, (Wseg, seg, H, D)), (1, 0, 2, 3)),
                (W, H, D),
            )
            s = jnp.moveaxis(s, 0, 1)
        else:
            s = jnp.moveaxis(_aggregate_dir(cost_w, p1, p2), 0, 1)
            # right→left
            s = s + jnp.moveaxis(_aggregate_dir(cost_w[::-1], p1, p2)[::-1], 0, 1)
        if p.paths == 2:
            return s
        # top→bottom: scan over H; state is (W, D) per row.
        s = s + _aggregate_dir(cost, p1, p2)
        # bottom→top
        s = s + _aggregate_dir(cost[::-1], p1, p2)[::-1]
        return s

    from stereovision_tpu.ops import sgm_pallas

    D = cost.shape[-1]
    pad_d = (-D) % 128
    if pad_d:
        cost = jnp.pad(cost, ((0, 0), (0, 0), (0, pad_d)), constant_values=1e9)
    agg = functools.partial(
        sgm_pallas.aggregate_dir,
        p1=p.p1, p2=p.p2, interpret=(impl == "pallas_interpret"),
    )
    s = agg(cost, axis=1)
    s = agg(cost, axis=1, reverse=True, acc=s)
    s = agg(cost, axis=0, acc=s)
    s = agg(cost, axis=0, reverse=True, acc=s)
    return s[..., :D] if pad_d else s


# ---------------------------------------------------------------------------
# Winner selection + validation
# ---------------------------------------------------------------------------


def _wta(agg: jax.Array, p: SGMParams, stats=None):
    """Winner-take-all with parabola subpixel + uniqueness test.

    ``stats`` (best, idx, cm, cp, competitor) comes precomputed from the fused
    Pallas aggregation; without it the statistics are computed here.
    Returns (disp float32 px incl. min_disparity, valid bool, best aggregated
    cost float32) — the cost lets hier2 arbitrate between its two windows
    where both produce confident but conflicting matches.
    """
    D = p.num_disparities
    impl = _resolve_impl(p.impl)
    if stats is not None:
        best, best_idx, cm, cp, competitor = stats
        cm = jnp.where(best_idx == 0, best, cm)
        cp = jnp.where(best_idx >= D - 1, best, cp)
    elif impl == "xla":
        best_idx = jnp.argmin(agg, axis=-1)
        best = jnp.min(agg, axis=-1)
        d_axis = jnp.arange(D)
        far = jnp.abs(d_axis[None, None, :] - best_idx[..., None]) > 1
        competitor = jnp.min(jnp.where(far, agg, _BIG), axis=-1)
        im1 = jnp.clip(best_idx - 1, 0, D - 1)
        ip1 = jnp.clip(best_idx + 1, 0, D - 1)
        cm = jnp.take_along_axis(agg, im1[..., None], axis=-1)[..., 0]
        cp = jnp.take_along_axis(agg, ip1[..., None], axis=-1)[..., 0]
    else:
        from stereovision_tpu.ops import sgm_pallas

        pad_d = (-agg.shape[-1]) % 128
        agg_p = (
            jnp.pad(agg, ((0, 0), (0, 0), (0, pad_d)), constant_values=1e9)
            if pad_d
            else agg  # already lane-padded by the fused cost path (BIG lanes)
        )
        best, best_idx, cm, cp, competitor = sgm_pallas.wta(
            agg_p, interpret=(impl == "pallas_interpret")
        )
        # boundary neighbors out of range come back as BIG → same clip semantics
        cm = jnp.where(best_idx == 0, best, cm)
        cp = jnp.where(best_idx >= D - 1, best, cp)

    # Uniqueness (cv2 semantics, calib3d stereosgbm.cpp): invalid if any d with
    # |d − d*| > 1 has cost*(100−U) < best*100.
    if p.uniqueness_ratio > 0:
        unique_ok = competitor * (100 - p.uniqueness_ratio) >= best * 100
    else:
        unique_ok = jnp.ones_like(best, dtype=bool)

    if p.subpixel:
        denom = cm + cp - 2.0 * best
        offset = jnp.where(denom > 1e-6, (cm - cp) / (2.0 * jnp.maximum(denom, 1e-6)), 0.0)
        offset = jnp.clip(offset, -0.5, 0.5)
        interior = (best_idx > 0) & (best_idx < D - 1)
        disp = best_idx + jnp.where(interior, offset, 0.0)
    else:
        disp = best_idx.astype(jnp.float32)

    return disp.astype(jnp.float32) + p.min_disparity, unique_ok, best


def _left_right_check(agg: jax.Array, disp: jax.Array, p: SGMParams,
                      pre_transposed: bool = False) -> jax.Array:
    """Consistency: recompute the right image's disparity from the same volume
    (dR(u) = argmin_d S[y, u+d, d]) and require |dL(x) − dR(x − dL)| ≤ maxDiff.
    This is cv2's disp12MaxDiff without a second matching pass.

    The diagonal traversal reads the volume once: a Pallas kernel (sublane
    slice + lane rotate per d) on TPU, a D-step dynamic-slice loop on CPU —
    a broadcasted gather of the same data is ~100× slower on TPU.
    """
    if pre_transposed:
        H, W = agg.shape[1], agg.shape[2]
    else:
        H, W = agg.shape[0], agg.shape[1]
    D = p.num_disparities  # agg may carry padded lanes beyond D; skip them
    impl = _resolve_impl(p.impl)
    if impl == "xla":
        pad = jnp.pad(agg, ((0, 0), (0, D), (0, 0)), constant_values=_BIG)

        def body(d, carry):
            best, idx = carry
            sl = jax.lax.dynamic_slice(pad, (0, d, d), (H, W, 1))[..., 0]
            take = sl < best
            return jnp.where(take, sl, best), jnp.where(take, d, idx)

        init = (jnp.full((H, W), _BIG, agg.dtype), jnp.zeros((H, W), jnp.int32))
        _, disp_r_idx = jax.lax.fori_loop(0, D, body, init)
    else:
        from stereovision_tpu.ops import sgm_pallas

        disp_r_idx = sgm_pallas.right_disparity(
            agg, D, pre_transposed=pre_transposed,
            interpret=(impl == "pallas_interpret"),
        )
    return _lr_compare(disp, disp_r_idx, p, impl)


def _lr_compare(disp, disp_r_idx, p: SGMParams, impl: str):
    """|dL(x) − dR(x − dL)| ≤ maxDiff given the right-view disparity indices
    (shared by the plain and lane-packed cores)."""
    W = disp.shape[-1]
    D = p.num_disparities
    disp_r = disp_r_idx.astype(jnp.float32) + p.min_disparity
    # disp_r's array index u holds the disparity of RIGHT pixel u − min_d (the
    # diagonal S[y, u+i, i] covers left pixel u+i matching right pixel
    # (u+i)−(min_d+i) = u−min_d). Right pixel r0 = x − round(dL) therefore
    # lives at array index r0 + min_d, i.e. offset round(dL) − min_d from x.
    x = jnp.arange(W)
    if impl == "xla":
        u = jnp.clip(
            x[None, :] - jnp.round(disp).astype(jnp.int32) + p.min_disparity, 0, W - 1
        )
        dr_at = jnp.take_along_axis(disp_r, u, axis=-1)
    else:
        from stereovision_tpu.ops import sgm_pallas

        off = jnp.round(disp).astype(jnp.int32) - p.min_disparity
        off = jnp.clip(off, 0, x[None, :])
        dr_at = sgm_pallas.shift_gather(
            disp_r, off, D + 1, assume_clipped=True,
            interpret=(impl == "pallas_interpret"),
        )
    return jnp.abs(disp - dr_at) <= p.lr_max_diff


def _speckle_suppress(disp: jax.Array, valid: jax.Array, p: SGMParams) -> jax.Array:
    """Windowed approximation of cv2.filterSpeckles: a pixel survives only if
    enough pixels in the surrounding window have a similar disparity.

    Exact connected-component labeling is host-sequential; on TPU we bound the
    component size from above by the count of within-``speckle_range`` pixels in
    a k×k box (k ≈ √(2·speckleWindowSize)), which removes the same small
    floating speckles the reference's filter targets.
    """
    if p.speckle_window_size <= 0:
        return valid
    k = max(3, int((2 * p.speckle_window_size) ** 0.5) | 1)
    r = float(p.speckle_range)
    # Count same-disparity-bin neighbors with two half-offset binnings (a
    # neighbor within range/2 of the center shares a bin in at least one of
    # them). Counts are exact small integers (f32-exact), so the fused Pallas
    # kernel and the XLA per-bin separable window sums are bit-identical.
    nbins = (p.num_disparities + int(r)) // max(1, int(r)) + 2
    dv = jnp.where(valid, disp - p.min_disparity, -2.0 * r)
    impl = _resolve_impl(p.impl)
    if impl != "xla":
        from stereovision_tpu.ops import sgm_pallas

        count = sgm_pallas.speckle_counts(
            dv, k, r, nbins, interpret=(impl == "pallas_interpret")
        )
    else:
        count = jnp.zeros_like(disp)
        for offset in (0.0, 0.5):
            b = jnp.floor(dv / r + offset)
            c = jnp.zeros_like(disp)
            for bi in range(nbins):
                ind = (b == bi).astype(jnp.float32)
                # center's own bin selects itself: Σ_b wsum(ind_b)·ind_b
                c = c + im.window_sum(ind, k) * ind
            count = jnp.maximum(count, c)
    min_count = min(p.speckle_window_size, k * k) * 0.25
    return valid & (count >= min_count)


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------


def _cost_aggregate_pallas(left, right, p: SGMParams, interpret: bool):
    """Fused Pallas path: census → cost kernel (lane-padded D) → one
    dual-direction kernel per axis (forward+backward in the same sweep,
    per-direction volumes stored int8 when n_bits + P2 ≤ 127) → one fused
    sum/WTA pass that emits the winner statistics plus the (D, H, W) int16
    transposed sum for the LR check. Nothing reads any volume twice, and the
    untransposed 4-direction sum is never materialized.

    Returns (None, (best, idx, cm, cp, competitor), s_t); s_t lanes ≥
    num_disparities carry huge costs.
    """
    from stereovision_tpu.ops import sgm_pallas

    # census runs as a Pallas kernel straight into the words-leading layout
    # the cost kernel wants; the right image's census is computed pre-flipped
    # (mirror mode) so no (H, W, nw) intermediate or XLA relayout exists
    cl = sgm_pallas.census_words(
        left, p.census_ksize, p.census_wsize, interpret=interpret
    )
    crr = sgm_pallas.census_words(
        right[:, ::-1], p.census_ksize, p.census_wsize, mirror=True,
        interpret=interpret,
    )
    D = p.num_disparities
    Dp = D + (-D) % 128
    n_bits = p.census_ksize * p.census_wsize - 1
    # the cost kernel emits BOTH layouts in one sweep (the (W, H, D) copy is
    # just a different store order): the horizontal SGM paths then run as
    # axis-0 scans over the transposed volume — the axis-1 kernel's sublane
    # staging made it 2-6× slower than axis 0. With paths=2 the vertical sweep
    # never runs, so only the transposed layout is materialized (transposed=2
    # drops the (H, W, D) staging buffer and its stores from the kernel).
    if p.paths == 2:
        cost, cost_t = None, sgm_pallas.cost_volume_planes(
            cl, crr, left.shape[-1], Dp, d_valid=D, min_d=p.min_disparity,
            max_cost=float(n_bits), transposed=2, interpret=interpret,
        )
    else:
        cost, cost_t = sgm_pallas.cost_volume_planes(
            cl, crr, left.shape[-1], Dp, d_valid=D, min_d=p.min_disparity,
            max_cost=float(n_bits), transposed=1, interpret=interpret,
        )
    # per-direction path costs are ≤ n_bits + P2 — int8-exact for the default
    # census sizes, halving the write traffic of both dual sweeps
    vol_dt = jnp.int8 if (n_bits + p.p2) <= 127 else jnp.int16
    dual = functools.partial(
        sgm_pallas.aggregate_dual, p1=p.p1, p2=p.p2, out_dtype=vol_dt,
        interpret=interpret,
    )
    hf_t, hb_t = dual(cost_t, axis=0)
    if p.paths == 2 and p.stats_impl != "xla" and (
            interpret or cost_t.shape[1] >= 128):
        # one-pass lane-reduction stats kernel (see _disparity_core_packed)
        best, idx, cm, cp, comp = sgm_pallas.wta_stats_from_duals(
            hf_t, hb_t, d_valid=D, interpret=interpret
        )
        s_t = (
            sgm_pallas.st_from_duals(hf_t, hb_t, D)
            if p.lr_max_diff >= 0 else None
        )
        return None, (best, idx, cm, cp, comp), s_t
    if p.paths == 2:
        vols = (hf_t, hb_t)
    else:
        vf, vb = dual(cost, axis=0)
        vols = (hf_t, hb_t, vf, vb)
    # sum_wta gets the raw per-direction volumes: with the LR check on it
    # builds s_t transpose-first (no hsum intermediate); without it the
    # lane-dim stats formulation runs on an internal hsum relayout
    s_t, best, idx, cm, cp, comp = sgm_pallas.sum_wta(
        vols, d_valid=D, emit_transposed=p.lr_max_diff >= 0,
        interpret=interpret,
    )
    return None, (best, idx, cm, cp, comp), s_t


def _disparity_core(left, right, params: SGMParams, impl: str):
    """census → cost → aggregation → WTA → LR check (no speckle/median/fill).
    Inputs are float32 (H, W); returns (disp float32 px, valid bool)."""
    stats = None
    agg_t = None
    if impl == "xla":
        cost = census_cost_volume(left, right, params)
        agg = aggregate(cost, params)
    else:
        agg, stats, agg_t = _cost_aggregate_pallas(
            left, right, params, impl == "pallas_interpret"
        )
    disp, valid, best = _wta(agg, params, stats)
    if params.lr_max_diff >= 0:
        valid = valid & _left_right_check(agg if agg_t is None else agg_t, disp,
                                          params, pre_transposed=agg_t is not None)
    return disp, valid, best


def _pack_pad(img, pk: int):
    """Replicate-pad rows so H divides into pack strips of block-multiple
    height (the packed cost kernel's layout contract)."""
    H = img.shape[0]
    bh = 8
    Hh = -(-(-(-H // pk)) // bh) * bh
    Hp = pk * Hh
    if Hp != H:
        img = jnp.concatenate([img, jnp.repeat(img[-1:], Hp - H, axis=0)], axis=0)
    return img


def _disparity_core_packed(left, right, params: SGMParams, impl: str,
                           cl_pre=None, crr_pre=None):
    """Lane-packed core (pack ∈ {2, 4}): pack horizontal strips of the image
    travel as independent (128/pack)-lane disparity groups of one
    (H/pack, W, 128) pseudo-volume — cost, aggregation, and WTA traffic all
    divide by pack. Vertical SGM paths restart at the strip seams (the same
    warm-up approximation as the row tiling in parallel/disparity); everything
    else is exact. The XLA path runs the strips separately at D ≤ 128/pack
    over a shared full-image census — bit-identical to the packed kernels
    (parity-tested).

    ``cl_pre``/``crr_pre``: optional precomputed censuses of the
    (pack-padded) left / width-flipped right image in the impl's native
    format — hier2 shares one left census across its refine passes, and the
    stacked two-window refine injects per-half right censuses so the stack
    boundary keeps per-image replicate-border semantics.
    """
    H, W = left.shape
    pk = params.pack
    dg = 128 // pk  # lanes per strip's disparity group
    left = _pack_pad(left, pk)
    right = _pack_pad(right, pk)
    Hp = left.shape[0]
    Hh = Hp // pk

    if impl == "xla":
        cl = cl_pre if cl_pre is not None else im.census_transform(
            left, params.census_ksize, params.census_wsize)
        cr = crr_pre if crr_pre is not None else im.census_transform(
            right, params.census_ksize, params.census_wsize)
        ng_lr = params.lr_groups if 0 < params.lr_groups <= pk else pk
        parts = []
        for g in range(pk):
            sl = slice(g * Hh, (g + 1) * Hh)
            cost = cost_from_census(cl[sl], cr[sl], params)
            agg = aggregate(cost, params)
            disp_g, valid_g, best_g = _wta(agg, params)
            if params.lr_max_diff >= 0 and g < ng_lr:
                valid_g = valid_g & _left_right_check(agg, disp_g, params)
            parts.append((disp_g, valid_g, best_g))
        disp = jnp.concatenate([q[0] for q in parts], axis=0)
        valid = jnp.concatenate([q[1] for q in parts], axis=0)
        best = jnp.concatenate([q[2] for q in parts], axis=0)
        return disp[:H], valid[:H], best[:H]

    from stereovision_tpu.ops import sgm_pallas

    interpret = impl == "pallas_interpret"
    p = params
    D = p.num_disparities  # ≤ 128/pack: one lane group per strip
    cl = cl_pre if cl_pre is not None else sgm_pallas.census_words(
        left, p.census_ksize, p.census_wsize, interpret=interpret
    )
    crr = crr_pre if crr_pre is not None else sgm_pallas.census_words(
        right[:, ::-1], p.census_ksize, p.census_wsize, mirror=True,
        interpret=interpret,
    )
    n_bits = p.census_ksize * p.census_wsize - 1
    seg = _effective_wseg(p, W, Hh)
    if p.paths == 2:  # vertical sweep never runs — skip the (H, W, D) layout
        cost, cost_t = None, sgm_pallas.cost_volume_planes(
            cl, crr, W, 128, d_valid=D, min_d=p.min_disparity,
            max_cost=float(n_bits), transposed=2, pack=pk, t_seg=seg,
            interpret=interpret,
        )
    else:
        cost, cost_t = sgm_pallas.cost_volume_planes(
            cl, crr, W, 128, d_valid=D, min_d=p.min_disparity,
            max_cost=float(n_bits), transposed=1, pack=pk, interpret=interpret,
        )
    vol_dt = jnp.int8 if (n_bits + p.p2) <= 127 else jnp.int16
    dual = functools.partial(
        sgm_pallas.aggregate_dual, p1=p.p1, p2=p.p2, out_dtype=vol_dt,
        groups=pk, interpret=interpret,
    )
    # segmented layout: hand the whole (seg·Hh)-row extent to one tile — the
    # scan is latency-bound, so per-step parallelism is the point
    hf_t, hb_t = dual(cost_t, axis=0,
                      block_x=cost_t.shape[1] if seg > 1 else None)
    ng_lr = p.lr_groups if 0 < p.lr_groups <= pk else pk
    if p.paths == 2 and p.stats_impl != "xla" and (
            interpret or cost_t.shape[1] >= 128):
        # one-pass lane-reduction stats kernel + (if LR) the XLA s_t build:
        # the XLA stats formulation re-reads the summed volume per statistic
        best, idx, cm, cp, comp = sgm_pallas.wta_stats_from_duals(
            hf_t, hb_t, d_valid=D, groups=pk, interpret=interpret
        )
        s_t = (
            # only the LR-checked strips' lane planes enter the summed volume
            sgm_pallas.st_from_duals(hf_t[..., :ng_lr * dg],
                                     hb_t[..., :ng_lr * dg], D, ng_lr)
            if p.lr_max_diff >= 0 else None
        )
    else:
        if p.paths == 2:
            vols = (hf_t, hb_t)
        else:
            vf, vb = dual(cost, axis=0)
            vols = (hf_t, hb_t, vf, vb)
        s_t, best, idx, cm, cp, comp = sgm_pallas.sum_wta(
            vols, d_valid=D, groups=pk,
            emit_transposed=p.lr_max_diff >= 0, interpret=interpret,
            st_planes=(ng_lr * dg if ng_lr < pk else None),
        )
    if seg > 1:
        # un-permute from the segmented space back to true column adjacency:
        # the packed stats stack groups outermost — rows are
        # g·(seg·Hh) + sg·Hh + h and must become g·Hh + h over W columns;
        # s_t's rows carry no group factor (groups live in the lane planes)
        # but its LR diagonal crosses segment boundaries, so it un-permutes
        # too.
        def unseg2d(x):
            Wseg = x.shape[-1]
            return jnp.reshape(
                jnp.transpose(
                    jnp.reshape(x, (pk, seg, Hh, Wseg)), (0, 2, 1, 3)
                ),
                (pk * Hh, seg * Wseg),
            )

        best, idx, cm, cp, comp = map(unseg2d, (best, idx, cm, cp, comp))
        if s_t is not None:
            Dp, _, Wseg = s_t.shape
            s_t = jnp.reshape(
                jnp.swapaxes(jnp.reshape(s_t, (Dp, seg, Hh, Wseg)), 1, 2),
                (Dp, Hh, seg * Wseg),
            )
    disp, valid, best_c = _wta(None, p, (best, idx, cm, cp, comp))
    if p.lr_max_diff >= 0:
        # one launch for all LR-checked strips: group g reads planes
        # [g·dg, (g+1)·dg) of s_t and lands at rows [g·Hh, (g+1)·Hh)
        disp_r = sgm_pallas.right_disparity(
            s_t, D, pre_transposed=True, groups=ng_lr, group_stride=dg,
            interpret=interpret,
        )
        if ng_lr < pk:
            n_rows = ng_lr * Hh
            lr_ok = _lr_compare(disp[:n_rows], disp_r, p, impl)
            valid = jnp.concatenate(
                [valid[:n_rows] & lr_ok, valid[n_rows:]], axis=0
            )
        else:
            valid = valid & _lr_compare(disp, disp_r, p, impl)
    return disp[:H], valid[:H], best_c[:H]


@functools.partial(jax.jit, static_argnames=("params",))
def compute_disparity(left: jax.Array, right: jax.Array, params: SGMParams = SGMParams()):
    """Rectified grayscale pair (H, W) → (disparity float32 px, valid bool).

    Invalid pixels carry disparity ``min_disparity − 1`` (cv2 SGBM convention,
    reference relies on it via the ``disp > MIN_DISP`` mask, depth_map.py:933).
    """
    if params.mode in ("hier", "hier2"):
        if params.num_disparities <= params.refine_range:
            # nothing to gain (and the window-clip bounds would invert):
            # a full search over ≤ refine_range disparities IS the refine pass
            params = dataclasses.replace(params, mode="full")
        else:
            return _compute_disparity_hier(left, right, params)
    disp, valid, _ = _compute_full(left, right, params)
    if params.fill_invalid:
        # the fill_invalid contract (all-true mask) holds in full mode too —
        # including hier configs demoted to full by a small search range
        disp = _nearest4_fill(disp, valid, params)
        valid = jnp.ones_like(valid)
    return disp, valid


def _compute_full(left, right, params: SGMParams, cl_pre=None, crr_pre=None):
    """Full-search pipeline; returns (disp, valid, best aggregated cost) —
    the cost is used by hier2's cross-window arbitration (cost tiebreak)."""
    left = left.astype(jnp.float32)
    right = right.astype(jnp.float32)
    impl = _resolve_impl(params.impl)
    if params.pack > 1:
        assert params.pack in (2, 4) and params.num_disparities <= 128 // params.pack, (
            "lane packing needs num_disparities ≤ 128/pack"
        )
        disp, valid, best = _disparity_core_packed(left, right, params, impl,
                                                   cl_pre=cl_pre,
                                                   crr_pre=crr_pre)
    else:
        disp, valid, best = _disparity_core(left, right, params, impl)
    valid = _speckle_suppress(disp, valid, params)
    if params.median_ksize > 1:
        disp = im.median_blur(disp, params.median_ksize)
    disp = jnp.where(valid, disp, float(params.min_disparity) - 1.0)
    return disp, valid, best


def _compute_disparity_hier(left, right, p: SGMParams):
    """Coarse-to-fine: full-range SGM at 1/coarse_scale resolution, then a
    refine_range window at full resolution against the right image warped by
    the upsampled coarse disparity. Classic pyramid stereo, shaped for TPU:
    the window (≥128, the lane quantum) divides full-res work by
    num_disparities/refine_range while the coarse pass costs ~1/scale³.
    """
    import dataclasses as _dc

    s = p.coarse_scale
    R = p.refine_range
    H, W = left.shape
    left = left.astype(jnp.float32)
    right = right.astype(jnp.float32)

    dc_n = -(-p.num_disparities // s)  # ceil
    # The coarse pass KEEPS the LR check (cheap at 1/s² pixels): near the left
    # edge (x < true disparity) every true match is out of image, so WTA
    # returns garbage-LOW disparities that the uniqueness test alone does not
    # catch — and the min-erosion envelope would propagate them R columns
    # inward, shrinking the refine window below the true disparity (the
    # envelope only absorbs too-HIGH coarse errors). LR invalidates them;
    # invalid pixels get mean-filled before warping instead.
    coarse_p = _dc.replace(
        p, mode="full", num_disparities=max(16, dc_n),
        # the hier-level fill contract must not alter the coarse solve (its
        # invalids are handled by the dedicated occlusion-style fill below)
        fill_invalid=False,
        min_disparity=p.min_disparity // s,
        # keep the speckle filter ON at coarse res (it is cheap at 1/s²
        # pixels): scattered garbage matches that leak through the coarse LR
        # check otherwise become nearest-valid fill sources and poison d_up
        # across a whole eroded window span
        # coarse_paths=2 drops the vertical sweep's coherence; a 5×5 coarse
        # median (cheap at 1/s² pixels) restores enough of it that window
        # placement keeps the boxes-scene quality gate
        median_ksize=3 if p.coarse_paths == 4 else 5,
        speckle_window_size=p.speckle_window_size,
        refine_range=R,
        pack=1,
        # the coarse solve drives refine-window placement; vertical coherence
        # (paths=4) is cheap at 1/s² pixels but the envelope's ±margin makes
        # it optional — production runs coarse_paths=2 (see the field note)
        paths=p.coarse_paths,
    )
    lc = im.resize(left, (H // s, W // s))
    rc = im.resize(right, (H // s, W // s))
    disp_c, valid_c = compute_disparity(lc, rc, coarse_p)
    # fill invalid coarse pixels occlusion-style: nearest valid value along the
    # row from each side, keep the SMALLER (background) one — cv2's
    # filterSpeckles/occlusion convention. Mean fills (global or windowed)
    # smear a mid-range value into holes next to large jumps, which drags the
    # refine window to cover neither surface (measured: d≈150 fills inside a
    # d=230 step at 720p → 20-25% confidently-wrong matches in that segment).
    dl, has_l, _ = _last_valid_scan(disp_c, valid_c, 1)
    dr, has_r, _ = _last_valid_scan(disp_c, valid_c, 1, reverse=True)
    fill_g = jnp.sum(jnp.where(valid_c, disp_c, 0.0)) / (
        jnp.sum(valid_c.astype(jnp.float32)) + 1e-6
    )
    # median of (left-fill, right-fill, global mean): robust to any ONE bad
    # source — a coherent garbage surface leaking through the coarse LR check
    # on one side (the left out-of-FOV band produces those), or a
    # mid-range-wrong global mean next to a large jump. A plain min() picked
    # the garbage side; a plain mean dragged the window to cover neither
    # surface.
    med3 = jnp.maximum(
        jnp.minimum(dl, dr), jnp.minimum(jnp.maximum(dl, dr), fill_g)
    )
    fill = jnp.where(
        has_l & has_r, med3,
        jnp.where(has_l, dl, jnp.where(has_r, dr, fill_g)),
    )
    disp_c = jnp.where(valid_c, disp_c, fill)
    disp_c = im.median_blur(disp_c, 5)
    # exact column ratio, not s: W//s rounds down, so the true scale can be
    # up to ~0.5% above s (1280/426 = 3.005) — at d≈300 that half-pixel-per-
    # hundred bias would silently eat the window margin
    d_up = im.resize(disp_c, (H, W)) * (W / (W // s))

    # Window base = horizontal min-envelope (erosion radius R) of d_up minus a
    # margin. The cost at (x, i) samples the warp at x−i whose shift is
    # shift(x−i); the envelope guarantees shift(x−i) ≤ d(x) − margin for all
    # i < R, so the true match stays inside the window wherever the local
    # disparity range is below R (warping by the raw d_up loses objects whose
    # disparity jumps at their boundary).
    margin = 4.0 + s
    env = d_up
    k = 1
    # doubling shifts k = 1, 2, …, R/2 give erosion radius exactly R−1 — the
    # guarantee needs shift(x−i) bounded for i < R only; eroding further (the
    # old k ≤ R loop reached 2R−1) wastes window headroom near low-disparity
    # regions and costs high-side coverage
    while k < R:
        left_sh = jnp.concatenate([env[:, k:], jnp.repeat(env[:, -1:], k, axis=1)], axis=1)
        right_sh = jnp.concatenate([jnp.repeat(env[:, :1], k, axis=1), env[:, :-k]], axis=1)
        env = jnp.minimum(env, jnp.minimum(left_sh, right_sh))
        k *= 2
    two_pass = p.mode == "hier2"
    # vertical envelope radius: erosion/dilation over d_up's vertical smear
    # (coarse blur + upsample ramp spans ~2·s rows; the radius covers it with
    # headroom). Measured at s=3 on the quality scenes: radius 8 beats the old
    # 4·s = 12 — wider vertical erosion displaces window A over whole bands
    # below horizontal object edges faster than it protects them.
    v_rad = 2 * s + 2 if p.coarse_paths == 4 else 2 * s + 4
    if two_pass:
        # vertical erosion over d_up's vertical smear: rows near a horizontal
        # object edge inherit a contaminated-high d_up from the object,
        # lifting the window bottom above the far surface — window B
        # (vertically dilated) re-covers the near surface on those rows.
        # Plain hier keeps the raw envelope: with no second window, the
        # erosion would trade near-surface coverage for far-surface coverage.
        env = _erode_rows(env, v_rad, jnp.minimum)
    shift = jnp.clip(
        jnp.round(env - margin), p.min_disparity, p.min_disparity + p.num_disparities - R
    )
    impl = _resolve_impl(p.impl)
    if not two_pass:
        disp, valid, cost_a = _refine_with_shift(
            left, right, shift, p, mask_seams=False, post=True,
        )
    else:
        # Second, high-side window: a disparity jump LARGER than R puts the
        # near surface's strip (≤R wide, left of the jump) above window A —
        # LR-invalidated there. Window B tops out at the local max-envelope:
        # dilation of d_up, so shift_B(x−i) + R − 1 ≥ d(x) + margin for all
        # i < R wherever d_up locally reached the near surface. Radius 2R−1
        # (not R−1): the coarse pass erodes the near surface's edge by up to
        # ~R columns (its own LR kill + fill + blur at the occlusion), so the
        # high window must extend past the match columns of pixels whose d_up
        # ramp starts that far in — measured on the boxes quality scene, the
        # R−1 radius left the strip's matches under the LOW window (B coverage
        # 0.4 → 0.97 with 2R−1).
        env_hi = d_up
        k = 1
        while k < 2 * R:
            l_sh = jnp.concatenate(
                [env_hi[:, k:], jnp.repeat(env_hi[:, -1:], k, axis=1)], axis=1
            )
            r_sh = jnp.concatenate(
                [jnp.repeat(env_hi[:, :1], k, axis=1), env_hi[:, :-k]], axis=1
            )
            env_hi = jnp.maximum(env_hi, jnp.maximum(l_sh, r_sh))
            k *= 2
        # vertical dilation (mirror of window A's vertical erosion): rows just
        # past a horizontal object edge must still reach the object's
        # disparity while d_up's vertical ramp is mid-transition
        env_hi = _erode_rows(env_hi, v_rad, jnp.maximum)
        shift_b = jnp.clip(
            jnp.round(env_hi + margin) - (R - 1),
            p.min_disparity, p.min_disparity + p.num_disparities - R,
        )
        cl_arb = None
        cr_arb = None
        if R <= 32 and H % 16 == 0:
            # stacked form: with the horizontal-only path family the refine's
            # rows are fully independent, so BOTH windows run as one
            # [warp_A; warp_B] packed solve — half the kernel launches; the
            # per-image left AND right censuses double as the arbitration
            # censuses (the refine gathers the right census by the shift
            # field instead of censusing a warped image)
            cl_arb = _census_words_for(left, p, impl)
            cr_arb = _census_words_for(right, p, impl)
            (disp, valid, cost_a), (disp_b, valid_b, cost_b) = (
                _refine_two_windows(left, right, shift, shift_b, p,
                                    cl1=cl_arb, cr1=cr_arb)
            )
        else:
            cl_pre = None
            if R <= 64:
                # both refine passes census the SAME left image — compute it
                # once (the packed cores pad rows identically per pack)
                pk = 4 if R <= 32 else 2
                cl_pre = _census_words_for(_pack_pad(left, pk), p, impl)
                cl_arb = cl_pre
            disp, valid, cost_a = _refine_with_shift(
                left, right, shift, p, mask_seams=True, cl_pre=cl_pre,
                post=False,
            )
            disp_b, valid_b, cost_b = _refine_with_shift(
                left, right, shift_b, p, mask_seams=True, cl_pre=cl_pre,
                post=False, lr=False,
            )

    if two_pass:
        # merge. Arbitration between the windows runs on census Hamming
        # distance against the ORIGINAL right image at each candidate — a
        # window that does not contain the true match can hallucinate a
        # smooth consistent surface (the LR diagonal of the same volume
        # agrees with it, and with the horizontal-only path family its
        # aggregated cost often beats the true window's), but its data
        # evidence vs the real image is noise-level while the true match's is
        # near zero. Aggregated cost only breaks near-ties. census_kill
        # additionally drops ANY candidate with noise-level evidence.
        if cl_arb is None:
            cl_arb = _census_words_for(left, p, impl)
        if cr_arb is None:
            cr_arb = _census_words_for(right, p, impl)
        # exact-consumption pruning (outputs bit-identical): cd_a is only
        # consumed where A is valid (the kill, and better_b's disagree arm,
        # which take_b only reaches when A survived); cd_b only where A ended
        # invalid or the windows disagree (everywhere else take_b is False
        # and `valid` is already True regardless of valid_b). Masking the
        # other pixels' offsets to 0 lets the gather's data-dependent block
        # skip prune to the pixels that matter.
        cd_a = _census_distance(
            cl_arb, cr_arb, jnp.where(valid, disp, 0.0), p, impl
        )
        if p.census_kill > 0:
            valid = valid & (cd_a <= p.census_kill)
        disagree = jnp.abs(disp_b - disp) > 2.0
        need_b = (~valid) | disagree
        cd_b = _census_distance(
            cl_arb, cr_arb, jnp.where(need_b, disp_b, 0.0), p, impl
        )
        if p.census_kill > 0:
            valid_b = valid_b & (cd_b <= p.census_kill)
        better_b = jnp.where(
            jnp.abs(cd_b - cd_a) > 1.0, cd_b < cd_a, cost_b < cost_a
        )
        take_b = valid_b & ((~valid) | (disagree & better_b))
        disp = jnp.where(take_b, disp_b, disp)
        valid = valid | valid_b
        d_up_c = jnp.clip(
            d_up, p.min_disparity, p.min_disparity + p.num_disparities - 1
        )
        # single post pass on the merged field (the per-pass posts are off);
        # the median must not see the −1 sentinels the passes baked into
        # their invalid pixels — fill those with the coarse prior first
        valid = _speckle_suppress(disp, valid, p)
        if p.fill_invalid:
            # ONE median over the candidate-filled field instead of a merge
            # median followed by the fill's own median (each ~0.7 ms at
            # 720p). Valid pixels ≥2 px from any hole see identical 5×5
            # windows either way; hole neighborhoods get the data-chosen
            # fill candidate as median support instead of the raw coarse
            # prior (measured quality-neutral-or-better on all 4 scenes).
            disp = _census_fill(disp, valid, d_up_c, cl_arb, cr_arb, p, impl,
                                median_all=True)
            valid = jnp.ones_like(valid)
            return disp, valid
        if p.median_ksize > 1:
            disp = im.median_blur(jnp.where(valid, disp, d_up_c), p.median_ksize)
        disp = jnp.where(valid, disp, float(p.min_disparity) - 1.0)
        return disp, valid
    if p.fill_invalid:
        disp = _nearest4_fill(disp, valid, p)
        valid = jnp.ones_like(valid)
    return disp, valid


def _erode_rows(x, radius: int, op):
    """Morphological erosion (op=minimum) / dilation (op=maximum) along rows
    (axis 0) by doubling shifts; replicate borders."""
    k = 1
    while k < radius:
        dn = jnp.concatenate([x[k:], jnp.repeat(x[-1:], k, axis=0)], axis=0)
        up = jnp.concatenate([jnp.repeat(x[:1], k, axis=0), x[:-k]], axis=0)
        x = op(x, op(dn, up))
        k *= 2
    return x


def _census_words_for(img, p: SGMParams, impl: str):
    """Census of an original image in the impl's native format (the packed
    cores' ``cl_pre`` and the hier2 arbitration's inputs): Pallas
    words-leading (nw, H, Wp) int32, or XLA (H, W, nw)."""
    if impl == "xla":
        return im.census_transform(img, p.census_ksize, p.census_wsize)
    from stereovision_tpu.ops import sgm_pallas

    return sgm_pallas.census_words(
        img, p.census_ksize, p.census_wsize,
        interpret=(impl == "pallas_interpret"),
    )


def _census_distance(cl, cr, disp, p: SGMParams, impl: str):
    """Hamming distance between the left census and the right census at each
    pixel's CANDIDATE disparity — data evidence against the TRUE right image,
    independent of any warp window (a torn-warp hallucination scores noise
    level here even though the warped content matched). cl/cr from
    :func:`_census_words_for`; rows beyond disp's height (pack padding) are
    ignored."""
    H, W = disp.shape
    md = jnp.clip(jnp.round(disp).astype(jnp.int32), 0,
                  jnp.arange(W, dtype=jnp.int32)[None, :])
    if impl == "xla":
        clw = cl[:H]
        crw = cr[:H]
        src = jnp.arange(W, dtype=jnp.int32)[None, :] - md
        crs = jnp.take_along_axis(crw, src[..., None], axis=1)
        return jnp.sum(
            im.popcount32(clw ^ crs).astype(jnp.float32), axis=-1
        )
    from stereovision_tpu.ops import sgm_pallas

    interpret = impl == "pallas_interpret"
    dist = None
    nw = cl.shape[0]
    max_off = p.min_disparity + p.num_disparities
    for w in range(nw):
        crs = sgm_pallas.shift_gather(
            cr[w, :H, :W], md, max_off, block_s=32, assume_clipped=True,
            interpret=interpret,
        )
        d = jax.lax.population_count(cl[w, :H, :W] ^ crs).astype(jnp.float32)
        dist = d if dist is None else dist + d
    return dist


def _last_valid_scan(values, valid, axis: int, reverse: bool = False):
    """Propagate the nearest preceding (or following, with ``reverse``) valid
    value and its distance along ``axis`` via an associative scan.

    A ``take_along_axis`` of the cummax'd index does the same thing but is a
    per-element gather — ~9 ms per call at 720p on TPU (the reason
    ops.shift_gather exists) — and ``lax.associative_scan`` lowers to a
    multi-pass up/down sweep that measured ~4 ms per call at 720p. Doubling
    shifted selects (jump pointers) compute the same prefix in log₂(n) cheap
    full-array ops. Returns (value, has_valid, distance)."""
    n = values.shape[axis]
    shape = [1] * values.ndim
    shape[axis] = n
    idx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32).reshape(shape), values.shape
    )
    if reverse:
        values, valid = jnp.flip(values, axis), jnp.flip(valid, axis)
    vs = jnp.where(valid, values, 0.0)
    is_ = jnp.where(valid, idx, -1)

    def shift_in(x, k, fillv):
        # x[i] ← x[i − k] with a constant front fill (replicate the prefix
        # semantics: positions < k have no predecessor k steps back)
        pad = jnp.full_like(jax.lax.slice_in_dim(x, 0, k, axis=axis), fillv)
        return jnp.concatenate(
            [pad, jax.lax.slice_in_dim(x, 0, n - k, axis=axis)], axis=axis
        )

    k = 1
    while k < n:
        has = is_ >= 0
        vs = jnp.where(has, vs, shift_in(vs, k, 0.0))
        is_ = jnp.where(has, is_, shift_in(is_, k, -1))
        k *= 2
    has = is_ >= 0
    if reverse:
        vs, has, is_ = (jnp.flip(a, axis) for a in (vs, has, is_))
        is_ = jnp.where(has, (n - 1) - is_, -1)
    dist = jnp.where(has, jnp.abs(idx - is_), jnp.int32(1 << 20))
    return vs, has, dist


def _census_distance_multi(cl, cr, disps, p: SGMParams, impl: str):
    """:func:`_census_distance` over k candidate maps in ONE stacked gather
    (per-row operation, so stacking rows is exact) — k−1 fewer kernel
    launches. Returns the k distance maps."""
    k = len(disps)
    H = disps[0].shape[0]
    stack = jnp.concatenate(disps, axis=0)
    if impl == "xla":
        cl_k = jnp.concatenate([cl[:H]] * k, axis=0)
        cr_k = jnp.concatenate([cr[:H]] * k, axis=0)
    else:
        cl_k = jnp.concatenate([cl[:, :H]] * k, axis=1)
        cr_k = jnp.concatenate([cr[:, :H]] * k, axis=1)
    d = _census_distance(cl_k, cr_k, stack, p, impl)
    return [d[i * H : (i + 1) * H] for i in range(k)]


def _census_fill(disp, valid, d_up, cl, cr, p: SGMParams, impl: str,
                 median_all: bool = False):
    """Data-driven inpainting of invalid pixels (hier2's fill_invalid):
    candidate values are the min and max of the 4-direction nearest valid
    neighbors plus the coarse prior d_up; the candidate with the best census
    evidence at THIS pixel wins. Blind nearest-fill prefers the background
    value — right at occlusions but wrong half the time at corners and warp
    seams; the census pick decides per pixel (measured on the quality scenes:
    boxes bad2 0.64% → 0.43%, below the cv2 reference). Filled pixels are
    then smoothed with a 5×5 median of the filled map."""
    if impl == "xla":
        lo = None
        hi = None
        for axis in (0, 1):
            for reverse in (False, True):
                val, has, _ = _last_valid_scan(disp, valid, axis, reverse)
                val = jnp.where(has, val, d_up)
                lo = val if lo is None else jnp.minimum(lo, val)
                hi = val if hi is None else jnp.maximum(hi, val)
    else:
        # fused Pallas form: each axis's two direction fills + the d_up
        # substitute + min/max run in ONE kernel pass (the XLA loop above
        # materializes ~4·log2(n) full maps); vertical rides two transposes
        from stereovision_tpu.ops import sgm_pallas

        interp = impl == "pallas_interpret"
        lo, hi = sgm_pallas.nearest_valid_lohi(disp, valid, d_up,
                                               interpret=interp)
        lo_v, hi_v = sgm_pallas.nearest_valid_lohi(disp.T, valid.T, d_up.T,
                                                   interpret=interp)
        lo = jnp.minimum(lo, lo_v.T)
        hi = jnp.maximum(hi, hi_v.T)
    best_v = None
    best_cd = None
    cands = (lo, hi, d_up)
    # evidence is only consulted where ~valid — zero the candidate offsets at
    # valid pixels so the gather's data-dependent block skip prunes the roll
    # range to the (sparse) invalid pixels' candidates (offset 0 = block 0)
    masked = [jnp.where(valid, 0.0, c) for c in cands]
    for cv, cdv in zip(cands, _census_distance_multi(cl, cr, masked, p, impl)):
        if best_v is None:
            best_v, best_cd = cv, cdv
        else:
            take = cdv < best_cd - 0.5
            best_v = jnp.where(take, cv, best_v)
            best_cd = jnp.where(take, cdv, best_cd)
    filled = jnp.where(valid, disp, best_v)
    if median_all:
        # combined merge+fill median (see the two_pass caller): one 5×5 pass
        # over the candidate-filled field serves as both the merged-field
        # post median and the fill smoothing
        if p.median_ksize > 1:
            return im.median_blur(filled, p.median_ksize)
        return filled
    med = im.median_blur(filled, 5)
    return jnp.where(valid, disp, med)


def _nearest4_fill(disp, valid, p: SGMParams):
    """Inpaint invalid pixels from the nearest valid neighbor along the 4
    axis directions (min distance wins; ties prefer the smaller = farther
    disparity, the occlusion-fill convention), then smooth the filled pixels
    with a 5×5 median of the filled map."""
    H, W = disp.shape
    BIG = jnp.int32(1 << 20)
    fallback = jnp.sum(jnp.where(valid, disp, 0.0)) / (
        jnp.sum(valid.astype(jnp.float32)) + 1e-6
    )
    best_val = jnp.full(disp.shape, fallback, jnp.float32)
    best_dist = jnp.full(disp.shape, BIG, jnp.int32)
    for axis in (0, 1):
        for reverse in (False, True):
            val, _, dist = _last_valid_scan(disp, valid, axis, reverse)
            take = (dist < best_dist) | ((dist == best_dist) & (val < best_val))
            best_val = jnp.where(take, val, best_val)
            best_dist = jnp.where(take, dist, best_dist)
    filled = jnp.where(valid, disp, best_val)
    med = im.median_blur(filled, 5)
    return jnp.where(valid, disp, med)


def _refine_with_shift(left, right, shift, p: SGMParams, mask_seams: bool = False,
                       cl_pre=None, post: bool = True, lr: bool = True):
    """One hier refine pass: warp the right image by the integer ``shift``
    field, run a refine_range-window full search, and undo the shift.
    Returns (disp float32 px with invalid = min_disparity − 1, valid).

    ``mask_seams``: wherever the shift field ramps, the warped image
    duplicates or tears content (two warped columns sampling the same right
    column) — matches there are coin-flip double matches that can survive the
    LR and uniqueness tests (measured ~11% wrong-valid in box cores on the
    boxes quality scene). Invalidate pixels whose matched column sits in a
    ramp. hier2 turns this on for both passes: window A's ramps (erosion
    transitions) sit exactly where window B's max-envelope plateaus, and vice
    versa, so the merge re-covers everything with clean flat-window matches."""
    import dataclasses as _dc

    R = p.refine_range
    W = left.shape[1]
    # integer shift → bounded horizontal gather: the shift_gather kernel on
    # TPU (max_offset lane rotates), take_along_axis on CPU
    xs = jnp.arange(W, dtype=jnp.int32)[None, :]
    impl = _resolve_impl(p.impl)
    if impl == "xla":
        src_x = jnp.clip(xs - shift.astype(jnp.int32), 0, W - 1)
        warped_right = jnp.take_along_axis(right, src_x, axis=1)
    else:
        from stereovision_tpu.ops import sgm_pallas

        off = jnp.clip(shift.astype(jnp.int32), 0, xs)
        # block_s 32: fine-grained roll blocks let the kernel's smooth-offset
        # pruning skip most of the [0, D−R] shift range per row block (the
        # warp shift spans a small local window of its ~D−R global range)
        warped_right = sgm_pallas.shift_gather(
            right, off, p.min_disparity + p.num_disparities - R + 1,
            block_s=32, assume_clipped=True,
            interpret=(impl == "pallas_interpret"),
        )

    refine_p = _dc.replace(
        p, mode="full", num_disparities=R, min_disparity=0,
        pack=4 if R <= 32 else (2 if R <= 64 else 1),
        # post=False: hier2 runs speckle+median ONCE on the merged result
        # instead of once per pass — half the post cost, and the filters see
        # the final field rather than each window's partial one
        speckle_window_size=p.speckle_window_size if post else 0,
        median_ksize=p.median_ksize if post else 1,
        # lr=False: hier2's window B skips the left-right check entirely
        # (s_t never materializes, no right-disparity pass) — B's validity is
        # carried by uniqueness + seam masking + the census kill/arbitration,
        # measured quality-neutral on every scene
        lr_max_diff=p.lr_max_diff if lr else -1,
    )
    disp_r, valid, best = _compute_full(left, warped_right, refine_p,
                                        cl_pre=cl_pre)
    # cost(x, i) compared left[x] against warped_right[x−i] =
    # right[(x−i) − shift(x−i)], so the recovered disparity is
    # disp(x) = dr(x) + shift(x − dr(x)) — the shift field travels with the
    # right image's columns, NOT with x (adding shift(x) biases slanted
    # surfaces by slope·dr). Gather shift at the matched column.
    drr = jnp.clip(jnp.round(disp_r).astype(jnp.int32), 0, xs)
    if impl == "xla":
        shift_at = jnp.take_along_axis(shift, xs - drr, axis=1)
    else:
        from stereovision_tpu.ops import sgm_pallas

        shift_at = sgm_pallas.shift_gather(
            shift, drr, R, assume_clipped=True,
            interpret=(impl == "pallas_interpret"),
        )
    if mask_seams:
        # total shift variation over the census support (±(k//2 + 1) columns,
        # +1 for subpixel); ≥3 marks a ramp — a slanted surface accumulates
        # only ~slope·window ≪ 3 between the rounding steps
        ds = jnp.abs(shift[:, 1:] - shift[:, :-1])
        ds = jnp.pad(ds, ((0, 0), (1, 0)))
        r_c = p.census_ksize // 2 + 2
        # horizontal-only window sum (the warp is per-row; a 2-D box sum would
        # accumulate 2r_c+1 rows of a slant's rounding steps past the gate)
        dsp = jnp.pad(ds, ((0, 0), (r_c, r_c)), mode="edge")
        var = sum(
            jax.lax.slice_in_dim(dsp, i, i + ds.shape[1], axis=1)
            for i in range(2 * r_c + 1)
        )
        ramp = (var >= 3.0).astype(jnp.float32)
        if impl == "xla":
            ramp_at = jnp.take_along_axis(ramp, xs - drr, axis=1)
        else:
            ramp_at = sgm_pallas.shift_gather(
                ramp, drr, R, assume_clipped=True,
                interpret=(impl == "pallas_interpret"),
            )
        valid = valid & (ramp_at < 0.5)
    disp = jnp.where(valid, disp_r + shift_at, float(p.min_disparity) - 1.0)
    return disp, valid, best


def _refine_two_windows(left, right, shift_a, shift_b, p: SGMParams, cl1=None,
                        cr1=None):
    """Both hier2 refine windows as ONE stacked packed solve.

    With the horizontal-only path family (paths=2) the refine's rows are
    fully independent — no vertical aggregation, per-row LR diagonal, per-row
    warp — so stacking [warp_A; warp_B] into a 2H pseudo-image and running a
    single pack=4 search is numerically equivalent to the two sequential
    passes while HALVING the kernel-launch count (cost, aggregation, stats,
    and the shift/ramp gathers each run once over 2H instead of twice over
    H; the LR chain runs on window A's strips only — ``lr_groups=2`` — the
    sequential form's ``lr=False`` window-B semantics). Requires R ≤ 32 and
    H % 16 == 0 (the A/B boundary must land on a pack-strip seam).

    The warp happens in CENSUS space (r5): the full-resolution right census
    (``cr1`` — the same one the caller's merge arbitration needs) is gathered
    by the shift field, instead of warping the image and censusing the warp.
    The two warped-image census calls disappear, and the gather costs the
    same as the image warp it replaces. Identical wherever the shift is
    locally constant over the census support; at warp ramps the window
    straddles the tear either way and the seam mask invalidates those pixels.
    Window B's censuses are the full-res censuses SAMPLED at its decimated
    rows (both sides consistently), rather than censuses of the decimated
    image — full-res vertical neighbors are strictly better data evidence.

    ``cl1``/``cr1``: the per-image full-res censuses (impl-native format) —
    also reused by the caller for arbitration. Returns
    ((disp_a, valid_a, best_a), (disp_b, valid_b, best_b)); invalid pixels
    carry min_disparity − 1.
    """
    import dataclasses as _dc

    R = p.refine_range
    H, W = left.shape
    assert R <= 32 and H % 16 == 0
    dec = p.b_decimate if (p.b_decimate == 3 and H % 24 == 0) else 1
    impl = _resolve_impl(p.impl)
    interpret = impl == "pallas_interpret"
    xs = jnp.arange(W, dtype=jnp.int32)[None, :]
    if dec == 3:
        # [A(H); B(H/3)] stack: 4 equal strips of H/3, A = strips 0-2
        left_b, shift_bd = left[::3], shift_b[::3]
    else:
        left_b, shift_bd = left, shift_b
    left2 = jnp.concatenate([left, left_b], axis=0)
    shift2 = jnp.concatenate([shift_a, shift_bd], axis=0)
    max_sh = p.min_disparity + p.num_disparities - R + 1

    if cl1 is None:
        cl1 = _census_words_for(left, p, impl)
    if cr1 is None:
        cr1 = _census_words_for(right, p, impl)
    if impl == "xla":
        src_x = jnp.clip(xs - shift2.astype(jnp.int32), 0, W - 1)
        cl2 = jnp.concatenate([cl1, cl1[::dec] if dec == 3 else cl1], axis=0)
        cr2w = jnp.concatenate([cr1, cr1[::dec] if dec == 3 else cr1], axis=0)
        crr2 = jnp.take_along_axis(cr2w, src_x[..., None], axis=1)
    else:
        from stereovision_tpu.ops import sgm_pallas

        off2 = jnp.clip(shift2.astype(jnp.int32), 0, xs)
        cl2 = jnp.concatenate(
            [cl1[:, :H], cl1[:, :H:dec] if dec == 3 else cl1[:, :H]], axis=1)
        cr2w = jnp.concatenate(
            [cr1[:, :H], cr1[:, :H:dec] if dec == 3 else cr1[:, :H]], axis=1)
        # gather each census word by the shift field, then flip the real
        # columns into the cost kernel's mirrored layout
        # (crr[w, y, x] = census_R[w, y, W−1−x]; columns ≥ W are junk the
        # kernel masks)
        crr2 = jnp.stack(
            [sgm_pallas.shift_gather(
                cr2w[w, :, :W], off2, max_sh, block_s=32,
                assume_clipped=True, interpret=interpret)[:, :W][:, ::-1]
             for w in range(cr2w.shape[0])],
            axis=0,
        )

    refine_p = _dc.replace(
        p, mode="full", num_disparities=R, min_disparity=0, pack=4,
        speckle_window_size=0, median_ksize=1,
        # the leading strips = window A (LR-checked); the rest = window B,
        # which skips the LR chain entirely — the sequential form's
        # lr=False pass (B's validity is uniqueness + seam mask + census
        # arbitration). Shrinks s_t, right-disparity, and the LR gather.
        lr_groups=(3 if dec == 3 else 2),
    )
    # the image operands only define shapes — both censuses are injected, so
    # the (never-materialized) warped right image is not needed at all
    disp_r2, valid2, best2 = _compute_full(
        left2, left2, refine_p, cl_pre=cl2, crr_pre=crr2
    )
    drr2 = jnp.clip(jnp.round(disp_r2).astype(jnp.int32), 0, xs)
    # warp-ramp seam mask, both halves at once (see _refine_with_shift)
    ds = jnp.abs(shift2[:, 1:] - shift2[:, :-1])
    ds = jnp.pad(ds, ((0, 0), (1, 0)))
    r_c = p.census_ksize // 2 + 2
    dsp = jnp.pad(ds, ((0, 0), (r_c, r_c)), mode="edge")
    var = sum(
        jax.lax.slice_in_dim(dsp, i, i + ds.shape[1], axis=1)
        for i in range(2 * r_c + 1)
    )
    ramp = (var >= 3.0).astype(jnp.float32)
    if impl == "xla":
        shift_at2 = jnp.take_along_axis(shift2, xs - drr2, axis=1)
        ramp_at2 = jnp.take_along_axis(ramp, xs - drr2, axis=1)
    else:
        from stereovision_tpu.ops import sgm_pallas

        # one stacked gather for both per-pixel lookups (same offsets; rows
        # are independent, so stacking is exact) — halves the launch count
        Hs2 = shift2.shape[0]
        g2 = sgm_pallas.shift_gather(
            jnp.concatenate([shift2, ramp], axis=0),
            jnp.concatenate([drr2, drr2], axis=0),
            R, assume_clipped=True, interpret=interpret,
        )
        shift_at2, ramp_at2 = g2[:Hs2], g2[Hs2:]
    valid2 = valid2 & (ramp_at2 < 0.5)
    disp2 = jnp.where(valid2, disp_r2 + shift_at2, float(p.min_disparity) - 1.0)
    if dec == 1:
        return (
            (disp2[:H], valid2[:H], best2[:H]),
            (disp2[H:], valid2[H:], best2[H:]),
        )
    # row-repeat the decimated window-B field back to H: the census
    # arbitration re-judges every repeated row against full-res data
    up = lambda x: jnp.repeat(x[H:], 3, axis=0)[:H]  # noqa: E731
    return (
        (disp2[:H], valid2[:H], best2[:H]),
        (up(disp2), up(valid2), up(best2)),
    )


def exact_speckle_postpass(disp, params: SGMParams, impl: str = "device"):
    """EXACT cv2.filterSpeckles post-pass (4-connected components) as an
    alternative to the windowed on-device approximation of
    :func:`_speckle_suppress`.

    Input: a finished disparity map (numpy or device, float px) whose invalid
    pixels already carry ``min_disparity − 1``; returns (disp, valid) with
    components ≤ speckle_window_size also set to ``min_disparity − 1``. Use
    with ``speckle_window_size=0`` engine params to replace (not stack) the
    approximation.

    ``impl="device"`` (default): the jit log-depth CCL
    (:mod:`stereo.speckle_ccl`) — stays on-device, async-safe.
    ``impl="native"``: the host C++ flood fill (native/speckle.cpp) — kept
    as the bit-parity cross-check and for numpy-only callers; blocks on the
    device value.
    """
    import numpy as np

    sentinel = float(params.min_disparity) - 1.0
    if params.speckle_window_size <= 0:
        d = jnp.asarray(disp, jnp.float32)
        return d, d > sentinel
    if impl == "device":
        from stereovision_tpu.stereo.speckle_ccl import filter_speckles_exact

        d, _ = filter_speckles_exact(
            jnp.asarray(disp, jnp.float32), sentinel,
            params.speckle_window_size, params.speckle_range)
        return d, d > sentinel
    from stereovision_tpu.ops import native

    d = np.asarray(disp, np.float32)
    if native.available():
        d, _ = native.filter_speckles(
            d, sentinel, params.speckle_window_size, params.speckle_range
        )
    return d, d > sentinel


@functools.partial(jax.jit, static_argnames=("params",))
def compute_disparity_batch(lefts, rights, params: SGMParams = SGMParams()):
    """Throughput form: (B, H, W) pairs → batched (disparity, valid).

    Frames run sequentially on-device (``lax.map``) so only one frame's cost
    volumes are live — ``vmap`` would multiply the GB-scale volumes by B and
    exhaust HBM. Per-frame dispatch overhead amortizes across the batch (this
    is the shape the 720p benchmark uses). For multi-chip batching see
    ``parallel.sharded_disparity``.
    """
    return jax.lax.map(lambda p: compute_disparity(p[0], p[1], params), (lefts, rights))


@functools.partial(jax.jit, static_argnames=("params",))
def disparity_with_confidence(left, right, params: SGMParams = SGMParams()):
    """Disparity + the reference's confidence contract: 1.0 where disparity is
    strictly inside (min+1, min+num−1) and valid, else 0.0
    (fused_depth_map.py:1023-1027)."""
    disp, valid = compute_disparity(left, right, params)
    lo = params.min_disparity + 1
    hi = params.min_disparity + params.num_disparities - 1
    conf = (valid & (disp > lo) & (disp < hi)).astype(jnp.float32)
    return disp, conf
