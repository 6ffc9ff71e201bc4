"""Tiled Pallas TPU rasterizer (binning + per-tile ordered compositing).

Performance path replacing ops/raster_ref.py's whole-frame loop. Implemented
after the reference path validates; until then the renderer falls back.
"""

from __future__ import annotations


def draw_pass_frame(*args, **kwargs):
    raise NotImplementedError("pallas rasterizer lands after the reference path")
