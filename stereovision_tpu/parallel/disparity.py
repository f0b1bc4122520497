"""Multi-chip disparity: frame parallelism + spatial row-tile parallelism.

Frame axis: pure data parallelism (each chip gets whole frames). Tile axis:
rows of the image are sharded; each shard computes disparity on its slab
extended by halo rows fetched from neighbors over ICI (``lax.ppermute``), so
census windows and post-filters see real context. Vertical SGM paths restart
at the halo boundary — a standard tiled-SGM approximation whose error decays
within a few rows (the halo absorbs the warm-up).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from stereovision_tpu.stereo.sgm import SGMParams, compute_disparity


def _halo_rows(p: SGMParams) -> int:
    k_speckle = max(3, int((2 * p.speckle_window_size) ** 0.5) | 1) if p.speckle_window_size else 1
    warmup = 16  # rows for vertical-path warm-up
    return max(p.census_wsize // 2, p.median_ksize // 2, k_speckle // 2) + warmup


def _tile_disparity(left: jax.Array, right: jax.Array, p: SGMParams, halo: int, axis: str):
    """Per-shard body: exchange halos along ``axis``, solve, crop."""
    ntiles = jax.lax.axis_size(axis)
    if ntiles == 1:
        return compute_disparity(left, right, p)
    idx = jax.lax.axis_index(axis)

    def with_halo(img):
        top = jax.lax.ppermute(  # my bottom rows → next tile's top halo
            img[-halo:], axis, [(i, (i + 1) % ntiles) for i in range(ntiles)]
        )
        bottom = jax.lax.ppermute(  # my top rows → previous tile's bottom halo
            img[:halo], axis, [(i, (i - 1) % ntiles) for i in range(ntiles)]
        )
        # outer borders: replicate own edge rows (matches single-device
        # replicate padding) instead of the wrapped content
        top = jnp.where(idx == 0, jnp.broadcast_to(img[:1], top.shape), top)
        bottom = jnp.where(
            idx == ntiles - 1, jnp.broadcast_to(img[-1:], bottom.shape), bottom
        )
        return jnp.concatenate([top, img, bottom], axis=0)

    lh, rh = with_halo(left), with_halo(right)
    disp, valid = compute_disparity(lh, rh, p)
    return disp[halo:-halo], valid[halo:-halo]


def sharded_disparity(
    left: jax.Array, right: jax.Array, params: SGMParams, mesh: Mesh
):
    """Batched disparity over a (frame, tile) mesh.

    left/right: (B, H, W) with B divisible by the frame axis and H by the tile
    axis. Returns (disp, valid) sharded the same way.
    """
    halo = _halo_rows(params)

    def body(l, r):  # (B/frame, H/tile, W) per shard
        f = functools.partial(_tile_disparity, p=params, halo=halo, axis="tile")
        return jax.vmap(f)(l, r)

    spec = P("frame", "tile", None)
    fn = shard_map(
        body, mesh=mesh, in_specs=(spec, spec), out_specs=(spec, spec),
        check_vma=False,
    )
    fn = jax.jit(fn)
    left = jax.device_put(left, NamedSharding(mesh, spec))
    right = jax.device_put(right, NamedSharding(mesh, spec))
    return fn(left, right)
