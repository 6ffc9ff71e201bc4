"""FigRenderer: the TPU frame driver.

Equivalent of the reference's FigRenderer + GL context execution
(/root/reference/src/figdraw/figrender.nim:1960-1995): walks the scene into a
quad tape (tape.py), then executes the tape's pass items as a short sequence
of jitted device calls — draw passes (frame or mask targets), mask clears and
backdrop-blur events. Quad counts are padded to bucketed capacities so jit
signatures stay stable across frames (SURVEY.md §7 "bucketed static shapes").
"""

from __future__ import annotations

import math
from typing import Dict, Hashable, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .atlas import Atlas, AtlasEntryMeta
from .backend import DEFAULT_SDF_AA_FACTOR
from .colors import Color
from .geometry import Vec2, vec2
from .nodes import Renders
from .render import render_root
from .tape import BlurItem, ClearMaskItem, DrawItem, FRAME_TARGET, Tape, TapeBackend
from .ops import raster_ref
from .ops.blur import backdrop_blur
from .ops.layout import QF_WIDTH, QI_WIDTH

QUAD_BUCKETS = (64, 256, 1024, 4096, 16384, 65536)

WHITE_IMAGE_KEY = "__figdraw_white__"


def _bucket(n: int) -> int:
    for b in QUAD_BUCKETS:
        if n <= b:
            return b
    return ((n + QUAD_BUCKETS[-1] - 1) // QUAD_BUCKETS[-1]) * QUAD_BUCKETS[-1]


class FigRenderer:
    """Renders `Renders` scenes to RGBA frames on the TPU.

    use_pallas: route frame draw passes through the tiled Pallas rasterizer
    when available; falls back to the XLA reference path otherwise.
    """

    def __init__(
        self,
        atlas_size: int = 512,
        pixel_scale: float = 1.0,
        use_pallas: Optional[bool] = None,
    ):
        self.atlas = Atlas(size=atlas_size)
        # white texel for drawFilledQuad (glcontext.nim:966-973)
        self.atlas.put_image(
            WHITE_IMAGE_KEY,
            np.ones((4, 4, 4), dtype=np.float32),
            AtlasEntryMeta(kind="generated"),
        )
        self._pixel_scale = float(pixel_scale)
        self._atlas_device = None
        self._atlas_generation = -1
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        self.aa_factor = DEFAULT_SDF_AA_FACTOR
        self.text_lcd_filtering = False
        self.text_subpixel_positioning = False
        self.text_subpixel_glyph_variants = False
        self.last_frame = None  # device (H, W, 4) f32 of the last render

    # --- atlas management -----------------------------------------------------

    def _white_uv(self) -> Tuple[float, float]:
        x, y, w, h = self.atlas.entries[WHITE_IMAGE_KEY]
        return (x + w / 2.0, y + h / 2.0)

    def _device_atlas(self):
        if self.atlas.dirty or self._atlas_device is None:
            self._atlas_device = jnp.asarray(self.atlas.data)
            self.atlas.dirty = False
        return self._atlas_device

    def put_image(self, key: Hashable, img, kind: str = "image") -> None:
        self.atlas.put_image(key, img, AtlasEntryMeta(kind=kind))

    def update_image(self, key: Hashable, img) -> None:
        self.atlas.update_image(key, img)

    def remove_image(self, key: Hashable) -> None:
        self.atlas.remove(key)

    def contains_image(self, key: Hashable) -> bool:
        return key in self.atlas

    # --- flatten --------------------------------------------------------------

    def flatten(
        self,
        renders: Renders,
        frame_size: Vec2,
        clear_main: bool = True,
        clear_color: Color = Color(1.0, 1.0, 1.0, 1.0),
    ) -> Tape:
        """Walk the scene into a quad tape (host side, no device work)."""
        backend = TapeBackend(white_uv=self._white_uv())
        backend.entries = self.atlas.entries
        backend.atlas_size = self.atlas.size
        backend.aa_factor = self.aa_factor
        backend.set_text_lcd_filtering_enabled(self.text_lcd_filtering)
        backend.set_text_subpixel_positioning_enabled(self.text_subpixel_positioning)
        backend.set_text_subpixel_glyph_variants_enabled(
            self.text_subpixel_glyph_variants
        )
        backend.begin_frame(frame_size, clear_main, clear_color)
        backend.save_transform()
        backend.scale(self._pixel_scale)
        render_root(backend, renders)
        backend.restore_transform()
        backend.end_frame()
        return backend.finish()

    # --- execute ---------------------------------------------------------------

    def execute(self, tape: Tape) -> jnp.ndarray:
        """Runs tape items on device; returns the (H, W, 4) f32 frame."""
        width = int(round(tape.frame_size[0]))
        height = int(round(tape.frame_size[1]))
        if tape.clear_color is not None:
            frame = jnp.broadcast_to(
                jnp.asarray(tape.clear_color, dtype=jnp.float32), (height, width, 4)
            )
        elif self.last_frame is not None and self.last_frame.shape[:2] == (height, width):
            frame = self.last_frame
        else:
            frame = jnp.zeros((height, width, 4), dtype=jnp.float32)

        n_masks = tape.mask_count + 1
        masks = jnp.concatenate(
            [
                jnp.ones((1, height, width), dtype=jnp.float32),
                jnp.zeros((n_masks - 1, height, width), dtype=jnp.float32),
            ],
            axis=0,
        )
        atlas = self._device_atlas()
        backdrop = None

        # pad the whole tape once per bucket
        n = _bucket(max(tape.count, 1))
        fields = np.zeros((n, QF_WIDTH), dtype=np.float32)
        modes = np.zeros((n, QI_WIDTH), dtype=np.int32)
        fields[: tape.count] = tape.fields[: tape.count]
        modes[: tape.count] = tape.modes[: tape.count]
        fields_d = jnp.asarray(fields)
        modes_d = jnp.asarray(modes)

        has_backdrop_modes = any(isinstance(it, BlurItem) for it in tape.items)
        if has_backdrop_modes:
            backdrop = jnp.zeros((height, width, 4), dtype=jnp.float32)

        for item in tape.items:
            if isinstance(item, ClearMaskItem):
                masks = masks.at[item.index].set(0.0)
            elif isinstance(item, BlurItem):
                backdrop = backdrop_blur(frame, jnp.float32(item.radius))
            elif isinstance(item, DrawItem):
                if item.end <= item.start:
                    continue
                run_fields, run_modes, run_count, run_modes_np = self._slice_run(
                    fields, modes, item.start, item.end
                )
                if item.target == FRAME_TARGET:
                    frame = self._draw_frame_pass(
                        run_fields, run_modes, run_count, frame, masks, atlas,
                        backdrop, run_modes_np,
                    )
                else:
                    plane = masks[item.target]
                    plane = raster_ref.draw_pass_mask(
                        run_fields,
                        run_modes,
                        run_count,
                        plane,
                        masks,
                        atlas=atlas,
                        subpixel_positioning=self.text_subpixel_positioning,
                    )
                    masks = masks.at[item.target].set(plane)

        self.last_frame = frame
        return frame

    def _slice_run(self, fields: np.ndarray, modes: np.ndarray, start: int, end: int):
        count = end - start
        n = _bucket(count)
        rf = np.zeros((n, QF_WIDTH), dtype=np.float32)
        rm = np.zeros((n, QI_WIDTH), dtype=np.int32)
        rf[:count] = fields[start:end]
        rm[:count] = modes[start:end]
        return jnp.asarray(rf), jnp.asarray(rm), jnp.int32(count), rm

    def _draw_frame_pass(self, fields, modes, count, frame, masks, atlas,
                         backdrop, modes_np=None):
        if self.use_pallas and modes_np is not None:
            from .ops import raster_pallas

            # atlas-sampling quads need gathers → XLA path (raster_pallas docstring)
            if not raster_pallas.run_uses_atlas(modes_np, int(count)):
                return raster_pallas.draw_pass_frame(
                    fields, modes, count, frame, masks, atlas, backdrop,
                    subpixel_positioning=self.text_subpixel_positioning,
                )
        return raster_ref.draw_pass_frame(
            fields,
            modes,
            count,
            frame,
            masks,
            atlas=atlas,
            backdrop=backdrop,
            subpixel_positioning=self.text_subpixel_positioning,
        )

    # --- high level -----------------------------------------------------------

    def render_frame(
        self,
        renders: Renders,
        frame_size: Vec2,
        clear_main: bool = True,
        clear_color: Color = Color(1.0, 1.0, 1.0, 1.0),
    ) -> jnp.ndarray:
        """Full frame: flatten on host, rasterize on device
        (figrender.nim:1960-1995)."""
        from .basics import scaled

        fs = scaled(frame_size)
        if fs.x <= 0 or fs.y <= 0:
            return self.last_frame
        tape = self.flatten(renders, fs, clear_main, clear_color)
        return self.execute(tape)

    def take_screenshot(self, frame=None) -> np.ndarray:
        """Last rendered frame as uint8 RGBA (readPixels analog)."""
        if frame is None:
            frame = self.last_frame
        arr = np.asarray(frame)
        return np.clip(np.round(arr * 255.0), 0, 255).astype(np.uint8)


def new_fig_renderer(atlas_size: int = 512, pixel_scale: float = 1.0) -> FigRenderer:
    return FigRenderer(atlas_size=atlas_size, pixel_scale=pixel_scale)
