"""Batched jnp image kernels — the replacement for the reference's cv2 image ops.

All functions take channel-last float arrays and are shape-polymorphic over a
leading batch dimension where noted. Everything here lowers to fusible XLA ops
(gathers, convs, sort networks); the Pallas variants for the few ops where XLA
underperforms live in ``stereovision_tpu.ops``.

Reference call sites being replaced:
- grayscale:            depth_map.py:890-891, fused_depth_map.py:985-986
- remap (rectify):      depth_map.py:815-826, fused_depth_map.py:480-491
- resize:               fused_depth_map.py:470-477, 1128-1139
- medianBlur(5):        depth_map.py:912
- GaussianBlur:         fused_depth_map.py:1156, 1641
- bilateralFilter(9,75,75): fused_depth_map.py:1403, 1688-1693
- calcHist/entropy:     fused_depth_map.py:226-241
- applyColorMap TURBO/JET: depth_map.py:936, fused_depth_map.py:1700
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Color / sampling
# ---------------------------------------------------------------------------

# BT.601 luma weights — identical to cv2.cvtColor(..., COLOR_BGR2GRAY).
_BGR_LUMA = (0.114, 0.587, 0.299)


def grayscale_bgr(img: jax.Array) -> jax.Array:
    """(..., H, W, 3) BGR → (..., H, W) luma, matching cv2 BGR2GRAY weights."""
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    return _BGR_LUMA[0] * b + _BGR_LUMA[1] * g + _BGR_LUMA[2] * r


def grayscale_rgb(img: jax.Array) -> jax.Array:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return _BGR_LUMA[2] * r + _BGR_LUMA[1] * g + _BGR_LUMA[0] * b


def _bilinear_gather(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Sample ``img`` (H, W[, C]) at float coords (x, y) with border replication.

    The core of remap/resize/warp. Pure gather + lerp → XLA fuses it into one
    kernel; this replaces cv2.remap(INTER_LINEAR) with BORDER_CONSTANT-free
    semantics (the reference relies on defaults; out-of-range rectified pixels
    are masked by the disparity validity mask downstream, depth_map.py:929-933).
    """
    H, W = img.shape[0], img.shape[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None] if img.ndim == 3 else (x - x0)
    wy = (y - y0)[..., None] if img.ndim == 3 else (y - y0)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def remap(img: jax.Array, map_x: jax.Array, map_y: jax.Array) -> jax.Array:
    """cv2.remap(INTER_LINEAR) equivalent: sample img at (map_x, map_y).

    img: (H, W) or (H, W, C); maps: (Ho, Wo). Out-of-bounds samples clamp to the
    border and are additionally zeroed (BORDER_CONSTANT 0, cv2's default).
    """
    out = _bilinear_gather(img, map_x, map_y)
    H, W = img.shape[0], img.shape[1]
    valid = (map_x >= 0) & (map_x <= W - 1) & (map_y >= 0) & (map_y <= H - 1)
    if img.ndim == 3:
        valid = valid[..., None]
    return jnp.where(valid, out, 0.0)


def warp_axis_shift(src: jax.Array, off: jax.Array, R: int,
                    interpret: bool = False) -> jax.Array:
    """out[y, x] = lerp(src[y, x+⌊off⌋], src[y, x+⌊off⌋+1]) along the last
    axis, |off| < R, replicate borders — as 2 bounded shift_gather calls
    (max_offset lane rotates with data-dependent block skip) instead of a
    per-element gather. The 1-D building block of the separable warps
    (mono.flow.warp_separable, :func:`remap_separable`)."""
    from stereovision_tpu.ops import sgm_pallas

    H, W = src.shape
    off = jnp.clip(off, -R, R - 1 - 1e-4)
    fl = jnp.floor(off)
    frac = off - fl
    P = jnp.pad(src, ((0, 0), (R, R)), mode="edge")
    offs = (R - fl).astype(jnp.int32)              # ∈ [1, 2R]
    offs_full = jnp.pad(offs, ((0, 0), (2 * R, 0)))
    g0 = sgm_pallas.shift_gather(
        P, offs_full, max_offset=2 * R + 1, assume_clipped=True,
        interpret=interpret)[:, 2 * R:]
    g1 = sgm_pallas.shift_gather(
        P, offs_full - 1, max_offset=2 * R + 1, assume_clipped=True,
        interpret=interpret)[:, 2 * R:]
    return g0 * (1.0 - frac) + g1 * frac


def remap_separable(img: jax.Array, map_x: jax.Array, map_y_adj: jax.Array,
                    valid: jax.Array, range_x: int, range_y: int,
                    interpret: bool = False) -> jax.Array:
    """:func:`remap` for SMOOTH fixed sampling maps (stereo rectification) as
    two 1-D :func:`warp_axis_shift` passes instead of the per-element 2-D
    gather — 13.1 → ~1 ms per 422×633 call on-chip (r5; the gather was the
    fused chunk's dominant stage).

    Catmull–Smith decomposition: the vertical pass uses the ADJUSTED map
    ``map_y_adj = map_y ∘ (inverse of map_x along x)`` so that the horizontal
    pass's source columns carry exactly the rows the true 2-D map asks for —
    the residual error is O(cross-derivative · 1 px), not
    O(cross-derivative · |dx|). Build ``map_y_adj``/``valid`` and the STATIC
    roll bounds host-side with :func:`prepare_separable_remap` (maps are
    fixed per calibration). ``valid`` is the true map's in-image mask —
    out-of-image samples are zeroed exactly like :func:`remap`."""
    H, W = img.shape[:2]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    tmp = warp_axis_shift(img.T, (map_y_adj - ys).T, range_y, interpret).T
    out = warp_axis_shift(tmp, map_x - xs, range_x, interpret)
    return jnp.where(valid, out, 0.0)


def prepare_separable_remap(map_x: np.ndarray, map_y: np.ndarray,
                            max_range: int = 96):
    """Host-side precomputation for :func:`remap_separable` from the CONCRETE
    (numpy) sampling maps. Returns ``(map_y_adj, valid, range_x, range_y)``,
    or None when the decomposition does not apply (map_x not strictly
    increasing along x — rectification maps always are — or displacement
    bounds beyond ``max_range``, where the roll-based gather loses to the
    exact per-element one)."""
    H, W = map_x.shape
    xs = np.arange(W, dtype=np.float32)
    ys = np.arange(H, dtype=np.float32)[:, None]
    # f32 maps can carry exact ties between adjacent columns (measured on
    # TPU-computed Bouguet maps); require only "no real decrease" and break
    # ties with a negligible ramp so the per-row inverse stays well-defined
    if np.diff(map_x, axis=1).min() < -1e-3:
        return None
    my_adj = np.empty_like(map_y)
    tie_break = 1e-4 * xs
    for v in range(H):
        # x' with map_x(v, x') = x (monotone inverse; ends clamp), then the
        # true row request at that source column
        row = np.maximum.accumulate(map_x[v].astype(np.float64)) + tie_break
        inv = np.interp(xs, row, xs)
        my_adj[v] = np.interp(inv, xs, map_y[v])
    valid = ((map_x >= 0) & (map_x <= W - 1)
             & (map_y >= 0) & (map_y <= H - 1))
    if not valid.any():
        return None
    rx = int(np.ceil(np.abs(map_x - xs[None, :])[valid].max())) + 2
    ry = int(np.ceil(np.abs(my_adj - ys).max())) + 2
    if max(rx, ry) > max_range:
        return None
    return my_adj.astype(np.float32), valid, max(rx, 1), max(ry, 1)


def resize(img: jax.Array, new_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize to (H', W'), cv2.resize(INTER_LINEAR)-compatible
    (half-pixel-centered sampling).

    Uses jax.image.resize, which lowers to two interpolation matmuls (MXU) —
    a gather-based formulation of the same resize is ~20× slower on TPU.
    """
    Ho, Wo = new_hw
    if img.shape[:2] == (Ho, Wo):  # identity: skip the interpolation matmuls
        return img.astype(jnp.float32)
    shape = (Ho, Wo) + img.shape[2:]
    return jax.image.resize(img.astype(jnp.float32), shape, method="linear", antialias=False)


# ---------------------------------------------------------------------------
# Separable / window filters
# ---------------------------------------------------------------------------


# cv2 getGaussianKernel fixed tables for sigma<=0 and ksize<=7
_SMALL_GAUSSIAN = {
    1: [1.0],
    3: [0.25, 0.5, 0.25],
    5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
    7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
}


def _gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    if sigma <= 0 and ksize in _SMALL_GAUSSIAN:
        return np.asarray(_SMALL_GAUSSIAN[ksize], np.float32)
    if sigma <= 0:  # cv2's rule for sigma auto-derivation
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize) - (ksize - 1) / 2
    k = np.exp(-(x**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jax.Array, ksize: int, sigma: float = 0.0) -> jax.Array:
    """Separable Gaussian blur on (..., H, W) with replicate borders."""
    k = jnp.asarray(_gaussian_kernel1d(ksize, sigma), img.dtype)
    pad = ksize // 2

    def conv1d(x, axis):
        xp = _pad_replicate(x, pad, axis)
        # windowed dot along `axis` via stacked shifts — stays fusible.
        slices = [
            jax.lax.slice_in_dim(xp, i, i + x.shape[axis], axis=axis) for i in range(ksize)
        ]
        return sum(s * k[i] for i, s in enumerate(slices))

    return conv1d(conv1d(img, -1), -2)


def _pad_replicate(x: jax.Array, pad: int, axis: int) -> jax.Array:
    cfg = [(0, 0, 0)] * x.ndim
    cfg[axis] = (pad, pad, 0)
    first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)
    reps_f = [1] * x.ndim
    reps_f[axis] = pad
    return jnp.concatenate([jnp.tile(first, reps_f), x, jnp.tile(last, reps_f)], axis=axis)


def _window_stack(img: jax.Array, ksize: int) -> jax.Array:
    """Stack the k×k neighborhood of every pixel: (..., H, W) → (..., H, W, k*k),
    replicate-padded. Powers median/bilateral/census."""
    pad = ksize // 2
    xp = _pad_replicate(_pad_replicate(img, pad, -1), pad, -2)
    H, W = img.shape[-2], img.shape[-1]
    views = []
    for dy in range(ksize):
        for dx in range(ksize):
            v = jax.lax.slice_in_dim(jax.lax.slice_in_dim(xp, dy, dy + H, axis=-2), dx, dx + W, axis=-1)
            views.append(v)
    return jnp.stack(views, axis=-1)


@functools.lru_cache(maxsize=None)
def _batcher_pairs(n: int) -> tuple:
    """Compare-exchange pairs of a Batcher odd-even merge sorting network."""
    pairs = []

    def merge(lo, cnt, r):
        step = r * 2
        if step < cnt:
            merge(lo, cnt, step)
            merge(lo + r, cnt, step)
            for i in range(lo + r, lo + cnt - r, step):
                pairs.append((i, i + r))
        else:
            pairs.append((lo, lo + r))

    def sort(lo, cnt):
        if cnt > 1:
            m = cnt // 2
            sort(lo, m)
            sort(lo + m, m)
            merge(lo, cnt, 1)

    # pad to power of two
    m = 1
    while m < n:
        m *= 2
    sort(0, m)
    return tuple((a, b) for a, b in pairs if a < n and b < n), m


@functools.lru_cache(maxsize=None)
def _median_pairs(n: int) -> tuple:
    """Batcher pairs pruned to the cone of influence of the median output.

    Walking the network backward from wire n//2, a compare-exchange whose two
    wires are both unreachable from the median output can never change it —
    dropping them keeps the selected value bit-identical while cutting ~40% of
    the min/max chain (189 → 113 pairs for n=25)."""
    pairs, _ = _batcher_pairs(n)
    needed = {n // 2}
    kept = []
    for a, b in reversed(pairs):
        if a in needed or b in needed:
            kept.append((a, b))
            needed.add(a)
            needed.add(b)
    return tuple(reversed(kept))


def median_blur(img: jax.Array, ksize: int = 5) -> jax.Array:
    """Median filter on (..., H, W) — replaces cv2.medianBlur (depth_map.py:912).

    Implemented as a compile-time Batcher sorting network over the k² shifted
    views, pruned to the comparators that can influence the median wire (pure
    min/max chains → one fused VPU kernel; 113 compare-exchanges for k=5).
    ``jnp.sort`` over a tiny trailing axis is orders of magnitude slower on
    TPU.
    """
    k2 = ksize * ksize
    win = _window_stack(img, ksize)
    vals = [win[..., i] for i in range(k2)]
    for a, b in _median_pairs(k2):
        lo = jnp.minimum(vals[a], vals[b])
        hi = jnp.maximum(vals[a], vals[b])
        vals[a], vals[b] = lo, hi
    return vals[k2 // 2]


def bilateral_filter(img: jax.Array, d: int = 9, sigma_color: float = 75.0, sigma_space: float = 75.0) -> jax.Array:
    """Edge-preserving bilateral filter on (..., H, W), matching
    cv2.bilateralFilter(d=9, 75, 75) (fused_depth_map.py:1403, 1688)."""
    ksize = d if d % 2 == 1 else d + 1
    pad = ksize // 2
    ys, xs = np.mgrid[-pad : pad + 1, -pad : pad + 1]
    # cv2 restricts the window to the inscribed circle (radius = d/2).
    mask = np.sqrt(xs**2 + ys**2) <= pad
    spatial = (np.exp(-(xs**2 + ys**2) / (2 * sigma_space**2)) * mask).reshape(-1).astype(np.float32)
    spatial_w = jnp.asarray(spatial, img.dtype)
    win = _window_stack(img, ksize)
    diff = win - img[..., None]
    cw = jnp.exp(-(diff * diff) / (2 * sigma_color * sigma_color))
    wgt = cw * spatial_w
    return jnp.sum(wgt * win, axis=-1) / (jnp.sum(wgt, axis=-1) + 1e-12)


def box_filter(img: jax.Array, ksize: int) -> jax.Array:
    """Mean filter via two 1-D passes (replicate borders)."""
    return window_sum(img, ksize) * (1.0 / (ksize * ksize))


def local_normalize(
    img: jax.Array, block: int = 33, target_std: float = 48.0, mid: float = 127.5
) -> jax.Array:
    """CLAHE-style adaptive contrast normalization: subtract the local mean
    and rescale by the local standard deviation over a ``block`` window.

    Plays the role of cv2.findChessboardCorners' ADAPTIVE_THRESH +
    NORMALIZE_IMAGE fallback (reference stereo_calibration.py:147-158):
    low-contrast / unevenly-lit boards come out with uniform local contrast
    so the saddle response and ring filter see full-strength corners."""
    x = img.astype(jnp.float32)
    mu = box_filter(x, block)
    var = jnp.maximum(box_filter(x * x, block) - mu * mu, 0.0)
    sd = jnp.sqrt(var)
    return jnp.clip(mid + (x - mu) * (target_std / (sd + 2.0)), 0.0, 255.0)


def window_sum(img: jax.Array, ksize: int) -> jax.Array:
    """Un-normalized k×k window sum via two 1-D passes (replicate borders).

    Integer-valued inputs give exact integer sums (used by the speckle filter,
    which needs bit-parity with its Pallas twin)."""
    pad = ksize // 2

    def sum1d(x, axis):
        xp = _pad_replicate(x, pad, axis)
        s = jax.lax.slice_in_dim(xp, 0, x.shape[axis], axis=axis)
        for i in range(1, ksize):
            s = s + jax.lax.slice_in_dim(xp, i, i + x.shape[axis], axis=axis)
        return s

    return sum1d(sum1d(img, -1), -2)


def sobel(img: jax.Array):
    """Sobel dx, dy on (..., H, W) with replicate borders (3×3, cv2-compatible)."""
    smooth = jnp.asarray([1.0, 2.0, 1.0], img.dtype)
    diff = jnp.asarray([-1.0, 0.0, 1.0], img.dtype)

    def conv1d(x, k, axis):
        xp = _pad_replicate(x, 1, axis)
        slices = [jax.lax.slice_in_dim(xp, i, i + x.shape[axis], axis=axis) for i in range(3)]
        return sum(s * k[i] for i, s in enumerate(slices))

    gx = conv1d(conv1d(img, smooth, -2), diff, -1)
    gy = conv1d(conv1d(img, diff, -2), smooth, -1)
    return gx, gy


# ---------------------------------------------------------------------------
# Statistics (occlusion-detector metrics, fused_depth_map.py:131-301)
# ---------------------------------------------------------------------------


def block_std(img: jax.Array, block: int = 48):
    """Per-block std over non-overlapping block×block tiles → (..., H//b, W//b).

    Reference fused_depth_map.py:180-215 iterates blocks in Python; here it is
    one reshape+reduce.
    """
    H, W = img.shape[-2], img.shape[-1]
    Hc, Wc = (H // block) * block, (W // block) * block
    x = img[..., :Hc, :Wc]
    x = x.reshape(*x.shape[:-2], Hc // block, block, Wc // block, block)
    x = jnp.moveaxis(x, -3, -2)  # (..., hb, wb, block, block)
    return jnp.std(x, axis=(-1, -2))


def histogram256(img: jax.Array) -> jax.Array:
    """256-bin histogram of a [0,255] image (cv2.calcHist equivalent) as a
    broadcast-compare reduction: a scatter-add (`.at[].add`) lowers to a
    serialized scatter on TPU — measured 2.65 ms vs 0.41 ms for this form at
    422×633 (r5, bit-identical counts)."""
    q = jnp.clip(img, 0, 255).astype(jnp.int32)
    bins = jnp.arange(256, dtype=jnp.int32)
    return jnp.sum((q[..., None] == bins).astype(jnp.float32),
                   axis=tuple(range(q.ndim)))


def shannon_entropy(img: jax.Array) -> jax.Array:
    """256-bin Shannon entropy (reference fused_depth_map.py:226-241)."""
    h = histogram256(img)
    p = h / (jnp.sum(h) + 1e-12)
    return -jnp.sum(jnp.where(p > 0, p * jnp.log2(jnp.where(p > 0, p, 1.0)), 0.0))


def minmax_normalize(img: jax.Array, lo: float = 0.0, hi: float = 255.0) -> jax.Array:
    """cv2.normalize(NORM_MINMAX) equivalent (fused_depth_map.py:1144-1151)."""
    mn = jnp.min(img)
    mx = jnp.max(img)
    return (img - mn) / jnp.where(mx - mn < 1e-12, 1.0, mx - mn) * (hi - lo) + lo


def percentile_normalize(img: jax.Array, p_lo: float, p_hi: float) -> jax.Array:
    """Percentile-windowed normalize to [0,1] (MONO demo 3/97%, flow 5/95%)."""
    lo = jnp.percentile(img, p_lo)
    hi = jnp.percentile(img, p_hi)
    return jnp.clip((img - lo) / jnp.where(hi - lo < 1e-12, 1.0, hi - lo), 0.0, 1.0)


# ---------------------------------------------------------------------------
# Colormaps (TURBO / JET lookup tables — device-side gather)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _turbo_lut() -> np.ndarray:
    """256×3 RGB turbo LUT (Google Turbo, via matplotlib's registered table)."""
    import matplotlib

    cmap = matplotlib.colormaps["turbo"]
    return (cmap(np.linspace(0, 1, 256))[:, :3] * 255).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _jet_lut() -> np.ndarray:
    import matplotlib

    cmap = matplotlib.colormaps["jet"]
    return (cmap(np.linspace(0, 1, 256))[:, :3] * 255).astype(np.float32)


def apply_colormap(img_u8: jax.Array, cmap: str = "turbo", bgr: bool = True) -> jax.Array:
    """uint8 image → (H, W, 3) colormapped, replacing cv2.applyColorMap."""
    lut = jnp.asarray(_turbo_lut() if cmap == "turbo" else _jet_lut())
    idx = jnp.clip(img_u8.astype(jnp.int32), 0, 255)
    rgb = lut[idx]
    return rgb[..., ::-1] if bgr else rgb


# ---------------------------------------------------------------------------
# Census transform (disparity-engine matching cost)
# ---------------------------------------------------------------------------


def census_transform(img: jax.Array, ksize: int = 7, wsize: int = 5) -> jax.Array:
    """Census bit-strings per pixel: (..., H, W) → (..., H, W, n_words) int32.

    Each neighbor of the ksize(w)×wsize(h) window (minus the center) contributes
    one "pixel < center" bit, packed into as many int32 words as needed. The
    disparity engine's matching cost is the Hamming distance between left/right
    census codes — robust to gain/bias differences, the standard SGM front end
    (role of the SGBM prefilter + BT cost, reference depth_map.py:894-909).
    """
    pad_y, pad_x = wsize // 2, ksize // 2
    xp = _pad_replicate(_pad_replicate(img, pad_x, -1), pad_y, -2)
    H, W = img.shape[-2], img.shape[-1]
    n_bits = ksize * wsize - 1
    n_words = (n_bits + 31) // 32
    words = [jnp.zeros(img.shape, jnp.int32) for _ in range(n_words)]
    bit = 0
    for dy in range(wsize):
        for dx in range(ksize):
            if dy == pad_y and dx == pad_x:
                continue
            v = jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(xp, dy, dy + H, axis=-2), dx, dx + W, axis=-1
            )
            w = bit // 32
            words[w] = words[w] | ((v < img).astype(jnp.int32) << (bit % 32))
            bit += 1
    return jnp.stack(words, axis=-1)


def popcount32(v: jax.Array) -> jax.Array:
    """SWAR popcount on int32 (sign-safe: masks keep every step non-negative)."""
    v = v - ((v >> 1) & 0x55555555)
    v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
    v = (v + (v >> 4)) & 0x0F0F0F0F
    return ((v * 0x01010101) >> 24) & 0x3F


def hamming32(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamming distance between census codes.

    Accepts single int32 planes or multi-word codes (..., n_words) from
    :func:`census_transform`; multi-word distances sum over the last axis.
    """
    return popcount32(a ^ b)


def hamming_words(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamming distance summed over the trailing word axis."""
    return jnp.sum(popcount32(a ^ b), axis=-1)
