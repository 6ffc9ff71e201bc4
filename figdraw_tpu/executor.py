"""Fused frame executor: one jitted device call per frame.

The tape's pass items (draw runs, mask clears, backdrop blurs) are unrolled
into a single jitted program keyed by the frame's static pass *structure* —
the TPU-native counterpart of the GL command stream: where the reference
issues one glDrawElements per flush plus blur/mask FBO switches
(glcontext.nim:643-714, 1788-1841, 1886-1949), we chain Pallas draw passes,
planar blurs and mask writes inside one XLA program so a frame costs exactly
one dispatch + one tape upload. Pass structures repeat across frames (the
scene graph's shape changes rarely), so the jit cache stays small.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .ops import raster_pallas, raster_ref
from .ops.blur import backdrop_blur_planar

# structure items (static, hashable):
#   ("draw", target, uses_atlas, needs_backdrop)   target: -1 frame, else mask k
#   ("blur",)
#   ("clear_mask", k)
FRAME_TARGET = -1


@lru_cache(maxsize=64)
def get_frame_executor(
    structure: Tuple,
    height: int,
    width: int,
    n_masks: int,
    use_pallas: bool,
    subpixel_positioning: bool,
    has_init_frame: bool,
):
    """Returns jitted run(fields, modes, bounds, radii, clear_or_init, atlas)
    -> (H, W, 4) frame.

    bounds: (n_draws, 2) i32 quad ranges; radii: (n_blurs,) f32;
    clear_or_init: (4,) clear color, or (H, W, 4) previous frame when
    has_init_frame.
    """
    th, tw = raster_pallas.TILE_H, raster_pallas.TILE_W
    tiles_y = -(-height // th)
    tiles_x = -(-width // tw)
    ph, pw = tiles_y * th, tiles_x * tw
    any_blur = any(item[0] == "blur" for item in structure)

    def to_hwc(planes):
        return jnp.transpose(planes, (1, 2, 0))

    def to_planes(hwc):
        return jnp.transpose(hwc, (2, 0, 1))

    def run(fields, modes, bounds, radii, clear_or_init, atlas):
        if has_init_frame:
            planes = to_planes(clear_or_init)
            planes = jnp.pad(
                planes, ((0, 0), (0, ph - height), (0, pw - width))
            )
        else:
            planes = jnp.broadcast_to(
                clear_or_init[:, None, None], (4, ph, pw)
            ).astype(jnp.float32)
        masks = jnp.zeros((n_masks, ph, pw), jnp.float32).at[0].set(1.0)
        backdrop = (
            jnp.zeros((4, ph, pw), jnp.float32) if any_blur else None
        )

        di = 0
        bi = 0
        for item in structure:
            kind = item[0]
            if kind == "clear_mask":
                masks = masks.at[item[1]].set(0.0)
            elif kind == "blur":
                backdrop = backdrop_blur_planar(planes, radii[bi])
                bi += 1
            else:
                _, target, uses_atlas, needs_backdrop = item
                s = bounds[di, 0]
                e = bounds[di, 1]
                di += 1
                if target == FRAME_TARGET:
                    if use_pallas and not uses_atlas:
                        planes = raster_pallas.draw_pass_planar(
                            fields, modes, s, e, planes, masks,
                            backdrop if needs_backdrop else None,
                        )
                    else:
                        hwc = to_hwc(planes)
                        hwc = raster_ref.draw_pass_frame_range(
                            fields, modes, s, e, hwc, masks,
                            atlas=atlas if uses_atlas else None,
                            backdrop=to_hwc(backdrop) if needs_backdrop else None,
                            subpixel_positioning=subpixel_positioning,
                        )
                        planes = to_planes(hwc)
                else:
                    plane = raster_ref.draw_pass_mask_range(
                        fields, modes, s, e, masks[target], masks,
                        atlas=atlas if uses_atlas else None,
                        subpixel_positioning=subpixel_positioning,
                    )
                    masks = masks.at[target].set(plane)

        return to_hwc(planes)[:height, :width]

    return jax.jit(run)
