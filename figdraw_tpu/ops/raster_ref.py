"""Reference XLA rasterizer: ordered source-over compositing of a quad tape.

This is the semantic ground truth for the Pallas tile kernel: a jitted
`lax.fori_loop` over quads, each evaluated over the full frame and composited
in draw order with the GL blend equation (glutils.nim:150-154). Correct for
any scene; the Pallas path (ops/raster_pallas.py) must match it bit-for-bit
modulo float association.

Mask semantics mirror the GL mask pipeline exactly (glcontext.nim:1873-1949 +
glsl/mask.frag:187-233): mask planes are single-channel; a mask-write quad
with coverage `a` lands as `a*a + dst*(1-a)` because the mask shader outputs
vec4(alpha) through the standard blend; reads multiply fragment alpha.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .layout import QF_BBOX_X0, QF_BBOX_X1, QF_BBOX_Y0, QF_BBOX_Y1, QI_MASK, QI_MODE
from .quad_eval import blend_over, eval_quad


def pixel_centers(height: int, width: int, y0: float = 0.0, x0: float = 0.0):
    """Pixel-center coordinates in the GL y-down ortho frame."""
    py = y0 + jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5
    px = x0 + jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5
    py = jnp.broadcast_to(py, (height, width))
    px = jnp.broadcast_to(px, (height, width))
    return px, py


def draw_pass_frame_range(
    fields,  # (N, QF_WIDTH) f32
    modes,  # (N, QI_WIDTH) i32
    start,  # () i32 — first quad of the run
    end,  # () i32 — one past the last quad
    frame,  # (H, W, 4) f32 straight-alpha
    masks,  # (K, H, W) f32 mask planes; masks[0] must be all-ones
    atlas=None,  # (S, S, 4) f32
    backdrop=None,  # (H, W, 4) f32 blurred backdrop for mode 17
    subpixel_positioning: bool = False,
    y_offset=0.0,  # global row of frame[0] — nonzero when row-sharded over a mesh
    pixelate: bool = False,
):
    """Composites quads [start, end) into the frame in order (traceable)."""
    height, width = frame.shape[0], frame.shape[1]
    px, py = pixel_centers(height, width, y0=y_offset)

    def body(i, carry):
        rgb, a = carry
        f = fields[i]
        mode = modes[i, QI_MODE]
        mask_idx = modes[i, QI_MASK]
        frag_rgb, frag_a = eval_quad(
            f, mode, px, py, atlas=atlas, backdrop=backdrop,
            subpixel_positioning=subpixel_positioning, pixelate=pixelate,
        )
        mask_val = jax.lax.dynamic_index_in_dim(masks, mask_idx, 0, keepdims=False)
        frag_a = frag_a * mask_val
        return blend_over(rgb, a, frag_rgb, frag_a)

    rgb, a = jax.lax.fori_loop(
        start, end, body, (frame[..., 0:3], frame[..., 3])
    )
    return jnp.concatenate([rgb, a[..., None]], axis=-1)


def draw_pass_frame_range_windowed(
    fields,
    modes,
    start,
    end,
    frame,
    masks,
    atlas=None,
    subpixel_positioning: bool = False,
    pixelate: bool = False,
    window: int = 128,
    y_offset=0.0,  # global row of frame[0] — nonzero when row-sharded over a mesh
):
    """Like draw_pass_frame_range, but each quad whose bbox fits a
    (window, window) tile is evaluated only there (dynamic_slice → blend →
    dynamic_update_slice); oversized quads take the full-frame branch.

    Glyph and image quads are tiny relative to the frame, so atlas-sampling
    runs drop from O(quads × pixels) to O(quads × window²) — the XLA-path
    analog of the Pallas kernel's tile binning. Order is preserved: the loop
    is still one quad at a time in draw order. Two window tiers: quads that
    fit a (window//4)² tile (glyphs — typically 10-25 px) use it, cutting
    per-quad frame traffic 16x; the rest use the full window, then the
    whole frame."""
    height, width = frame.shape[0], frame.shape[1]
    if height < window or width < window:
        return draw_pass_frame_range(
            fields, modes, start, end, frame, masks, atlas=atlas,
            subpixel_positioning=subpixel_positioning, pixelate=pixelate,
            y_offset=y_offset,
        )
    y_offset = jnp.asarray(y_offset, jnp.float32)
    px_full, py_full = pixel_centers(height, width, y0=y_offset)
    small = max(window // 4, 8)

    def body(i, frame):
        f = fields[i]
        mode = modes[i, QI_MODE]
        mask_idx = modes[i, QI_MASK]
        bx0 = f[QF_BBOX_X0]
        by0 = f[QF_BBOX_Y0]
        bx1 = f[QF_BBOX_X1]
        by1 = f[QF_BBOX_Y1]

        def make_windowed(win):
            wiy = jnp.arange(win, dtype=jnp.float32)[:, None] + 0.5
            wix = jnp.arange(win, dtype=jnp.float32)[None, :] + 0.5

            def windowed(frame):
                # window origin in band-local rows; pixel centers stay global
                x0 = jnp.clip(jnp.floor(bx0).astype(jnp.int32), 0, width - win)
                y0 = jnp.clip(
                    jnp.floor(by0 - y_offset).astype(jnp.int32), 0, height - win
                )
                tile = jax.lax.dynamic_slice(frame, (y0, x0, 0), (win, win, 4))
                px = x0.astype(jnp.float32) + wix
                py = y_offset + y0.astype(jnp.float32) + wiy
                px = jnp.broadcast_to(px, (win, win))
                py = jnp.broadcast_to(py, (win, win))
                frag_rgb, frag_a = eval_quad(
                    f, mode, px, py, atlas=atlas, backdrop=None,
                    subpixel_positioning=subpixel_positioning, pixelate=pixelate,
                )
                mask_tile = jax.lax.dynamic_slice(
                    masks, (mask_idx, y0, x0), (1, win, win)
                )[0]
                frag_a = frag_a * mask_tile
                rgb, a = blend_over(tile[..., 0:3], tile[..., 3], frag_rgb, frag_a)
                return jax.lax.dynamic_update_slice(
                    frame, jnp.concatenate([rgb, a[..., None]], axis=-1),
                    (y0, x0, 0),
                )

            return windowed

        def full(frame):
            frag_rgb, frag_a = eval_quad(
                f, mode, px_full, py_full, atlas=atlas, backdrop=None,
                subpixel_positioning=subpixel_positioning, pixelate=pixelate,
            )
            mask_val = jax.lax.dynamic_index_in_dim(
                masks, mask_idx, 0, keepdims=False
            )
            frag_a = frag_a * mask_val
            rgb, a = blend_over(frame[..., 0:3], frame[..., 3], frag_rgb, frag_a)
            return jnp.concatenate([rgb, a[..., None]], axis=-1)

        fits_small = ((bx1 - bx0) <= small) & ((by1 - by0) <= small)
        fits_big = ((bx1 - bx0) <= window) & ((by1 - by0) <= window)
        return jax.lax.cond(
            fits_small,
            make_windowed(small),
            lambda fr: jax.lax.cond(fits_big, make_windowed(window), full, fr),
            frame,
        )

    return jax.lax.fori_loop(start, end, body, frame)


@partial(jax.jit, static_argnames=("subpixel_positioning",))
def draw_pass_frame(
    fields, modes, count, frame, masks, atlas=None, backdrop=None,
    subpixel_positioning: bool = False, y_offset=0.0,
):
    """Composites quads [0, count) into the frame in order."""
    return draw_pass_frame_range(
        fields, modes, jnp.int32(0), count, frame, masks, atlas=atlas,
        backdrop=backdrop, subpixel_positioning=subpixel_positioning,
        y_offset=y_offset,
    )


def draw_pass_mask_range(
    fields,
    modes,
    start,
    end,
    mask_plane,  # (H, W) f32 — the mask being written (already cleared)
    masks,  # (K, H, W) parent planes for the read multiply
    atlas=None,
    subpixel_positioning: bool = False,
    y_offset=0.0,  # global row of mask_plane[0] when row-sharded over a mesh
    pixelate: bool = False,
):
    """Composites quads into a mask plane (glsl/mask.frag:233 semantics)."""
    height, width = mask_plane.shape
    px, py = pixel_centers(height, width, y0=y_offset)

    def body(i, m):
        f = fields[i]
        mode = modes[i, QI_MODE]
        mask_idx = modes[i, QI_MASK]
        _frag_rgb, frag_a = eval_quad(
            f, mode, px, py, atlas=atlas, backdrop=None,
            subpixel_positioning=subpixel_positioning, pixelate=pixelate,
        )
        parent = jax.lax.dynamic_index_in_dim(masks, mask_idx, 0, keepdims=False)
        frag_a = frag_a * parent
        # src = vec4(alpha) through (SRC_ALPHA, 1-SRC_ALPHA) on the R channel
        return frag_a * frag_a + m * (1.0 - frag_a)

    return jax.lax.fori_loop(start, end, body, mask_plane)


@partial(jax.jit, static_argnames=("subpixel_positioning",))
def draw_pass_mask(
    fields, modes, count, mask_plane, masks, atlas=None,
    subpixel_positioning: bool = False,
):
    return draw_pass_mask_range(
        fields, modes, jnp.int32(0), count, mask_plane, masks, atlas=atlas,
        subpixel_positioning=subpixel_positioning,
    )
