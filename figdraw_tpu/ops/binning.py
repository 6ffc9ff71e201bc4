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

from .layout import (
    QF_AA, QF_BBOX_X0, QF_BBOX_X1, QF_BBOX_Y0, QF_BBOX_Y1, QF_COLOR0,
    QF_INV_B, QF_INV_C, QF_PARAMS, QF_RADII, QF_RECT_PARAMS, QI_MASK, QI_MODE,
)


@partial(jax.jit, static_argnames=("tiles_y", "tiles_x", "tile_h", "tile_w",
                                   "n_runs"))
def bin_quads(fields, start, end, tiles_y: int, tiles_x: int, tile_h: int, tile_w: int,
              y_offset=0.0, modes=None, run_bounds=None, n_runs: int = 0):
    """Returns (tile_idx (T, N) i32, tile_counts (T,) i32).

    tile_idx[t, :counts[t]] are indices of quads in [start, end) whose bbox
    intersects tile t, in draw order; the rest is padding. The [start, end)
    window lets one padded tape hold every draw run of a frame so the whole
    frame executes as a single device call. y_offset: global row of tile row
    0 — nonzero when binning one device's row band of a mesh-sharded frame.

    modes (optional, frame-target runs only): enables OPAQUE OCCLUSION — a
    quad whose fully-opaque interior covers a tile makes everything drawn
    earlier in that tile invisible under source-over blending, so the tile's
    list starts at the last such quad (SURVEY.md §7 hard-part 7: binning must
    cut the per-tile work, not just partition it). The opacity test is
    conservative: mode 3 (ClipAA) solid fill, all four vertex alphas = 1,
    axis-aligned, no mask read, no rect-mask, and the tile inside the
    rounded-box interior shrunk by max corner radius + the AA half-width.

    run_bounds (optional, with modes): (n_runs, 2) i32 [start, end) ranges of
    the frame-target draw runs when ONE binning serves a whole multi-run
    frame. Culling then stays run-scoped — a cover only truncates quads of
    its OWN run (a later run's cover must not erase quads a mid-frame
    backdrop blur already needs) and quads outside every listed run (mask
    writes) are never culled. n_runs must be the static row count.
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
    if modes is not None:
        m = modes[:, QI_MODE]
        rest = m % 256  # mode + 128*elliptical (elliptical → rest >= 128)
        fill_mode = m // 256
        alphas = (
            (fields[:, QF_COLOR0 + 3] >= 1.0)
            & (fields[:, QF_COLOR0 + 7] >= 1.0)
            & (fields[:, QF_COLOR0 + 11] >= 1.0)
            & (fields[:, QF_COLOR0 + 15] >= 1.0)
        )
        radii = fields[:, QF_RADII : QF_RADII + 4]
        max_r = jnp.max(radii, axis=1)
        margin = 0.5 / jnp.maximum(fields[:, QF_AA], 1e-3) + 0.01
        ihx = fields[:, QF_PARAMS + 2] - max_r - margin  # shape half-extents
        ihy = fields[:, QF_PARAMS + 3] - max_r - margin
        opaque = (
            (rest == 3)
            & (fill_mode == 0)
            & (modes[:, QI_MASK] == 0)
            & alphas
            & (fields[:, QF_INV_B] == 0.0)
            & (fields[:, QF_INV_C] == 0.0)
            & (fields[:, QF_RECT_PARAMS + 2] < 0.0)  # rect mask disabled
            & jnp.all(radii >= 0.0, axis=1)
            & (ihx > 0.0)
            & (ihy > 0.0)
        )
        cx = (x0 + x1) * 0.5  # axis-aligned: bbox center == shape center
        cy = (y0 + y1) * 0.5
        cov_x = ((cx - ihx)[None, None, :] <= tx0 + 0.5) & (
            (cx + ihx)[None, None, :] >= tx0 + tile_w - 0.5
        )
        cov_y = ((cy - ihy)[None, None, :] <= ty0 + 0.5) & (
            (cy + ihy)[None, None, :] >= ty0 + tile_h - 0.5
        )
        covers = (
            (cov_x & cov_y).reshape(tiles_y * tiles_x, n)
            & opaque[None, :]
            & valid[None, :]
        )
        if run_bounds is None:
            last_cover = jnp.max(
                jnp.where(covers, idx[None, :], -1), axis=1, keepdims=True
            )
            mask = mask & (idx[None, :] >= last_cover)
        else:
            # run-scoped culling: per tile, the last cover WITHIN each run
            # bounds that run's quads only; quads outside every run keep -1
            thresh = jnp.full((tiles_y * tiles_x, n), -1, jnp.int32)
            for r in range(n_runs):
                s_r = run_bounds[r, 0]
                e_r = run_bounds[r, 1]
                in_r = (idx >= s_r) & (idx < e_r)
                last_r = jnp.max(
                    jnp.where(covers & in_r[None, :], idx[None, :], -1),
                    axis=1, keepdims=True,
                )
                thresh = jnp.where(in_r[None, :], last_r, thresh)
            mask = mask & (idx[None, :] >= thresh)

    keys = jnp.where(mask, idx, n + idx)  # intersecting first, draw order kept
    order = jnp.argsort(keys, axis=1).astype(jnp.int32)
    counts = mask.sum(axis=1).astype(jnp.int32)
    return order, counts
