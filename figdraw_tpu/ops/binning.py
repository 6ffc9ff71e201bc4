"""Tile binning: map quad AABBs to per-tile draw-ordered index lists.

The TPU-native replacement for GL's hardware triangle binning. One XLA call:
a (T, N) intersection mask from the tape's bboxes, then a stable argsort per
tile so each tile sees only its quads, still in draw order (the ordered-alpha
requirement from SURVEY.md §7 "hard parts" #1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .layout import QF_BBOX_X0, QF_BBOX_X1, QF_BBOX_Y0, QF_BBOX_Y1


@partial(jax.jit, static_argnames=("tiles_y", "tiles_x", "tile_h", "tile_w"))
def bin_quads(fields, start, end, tiles_y: int, tiles_x: int, tile_h: int, tile_w: int,
              y_offset=0.0):
    """Returns (tile_idx (T, N) i32, tile_counts (T,) i32).

    tile_idx[t, :counts[t]] are indices of quads in [start, end) whose bbox
    intersects tile t, in draw order; the rest is padding. The [start, end)
    window lets one padded tape hold every draw run of a frame so the whole
    frame executes as a single device call. y_offset: global row of tile row
    0 — nonzero when binning one device's row band of a mesh-sharded frame.
    """
    n = fields.shape[0]
    x0 = fields[:, QF_BBOX_X0]
    y0 = fields[:, QF_BBOX_Y0]
    x1 = fields[:, QF_BBOX_X1]
    y1 = fields[:, QF_BBOX_Y1]

    ty = y_offset + jnp.arange(tiles_y, dtype=jnp.float32) * tile_h
    tx = jnp.arange(tiles_x, dtype=jnp.float32) * tile_w
    # tile t covers pixel centers [t0 + 0.5, t0 + tile - 0.5]
    tx0 = tx[None, :, None]  # (1, TX, 1)
    ty0 = ty[:, None, None]  # (TY, 1, 1)

    idx_range = jnp.arange(n)
    valid = (idx_range >= start) & (idx_range < end)
    hit_x = (x0[None, None, :] < tx0 + tile_w) & (x1[None, None, :] > tx0)
    hit_y = (y0[None, None, :] < ty0 + tile_h) & (y1[None, None, :] > ty0)
    mask = hit_x & hit_y & valid[None, None, :]  # (TY, TX, N)
    mask = mask.reshape(tiles_y * tiles_x, n)

    idx = jnp.arange(n, dtype=jnp.int32)
    keys = jnp.where(mask, idx, n + idx)  # intersecting first, draw order kept
    order = jnp.argsort(keys, axis=1).astype(jnp.int32)
    counts = mask.sum(axis=1).astype(jnp.int32)
    return order, counts
