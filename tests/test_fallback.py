"""Failure detection / fallback chain (SURVEY.md §5.3 analog).

The reference falls back from a failed Vulkan/Metal context to OpenGL at
runtime and has a crash-test define to exercise it; our renderer downgrades
from the Pallas rasterizer to the XLA path when the kernel fails, driven by
the FIGDRAW_PALLAS_CRASH_TEST fault injection."""

import numpy as np

from figdraw_tpu import Fig, FigKind, FigRenderer, fill, new_renders, rect, rgba, vec2
from figdraw_tpu.nodes import RenderList


def scene():
    lst = RenderList()
    lst.add_root(Fig(kind=FigKind.nkRectangle, screen_box=rect(8, 8, 40, 30),
                     fill=fill(rgba(255, 0, 0, 255))))
    r = new_renders()
    r.set_layer(0, lst)
    return r


def test_pallas_crash_falls_back_to_xla(monkeypatch):
    monkeypatch.setenv("FIGDRAW_PALLAS_CRASH_TEST", "1")
    ren = FigRenderer(atlas_size=64, use_pallas=True)
    ren.render_frame(scene(), vec2(64, 48))
    img = ren.take_screenshot()
    assert np.array_equal(img[20, 20], [255, 0, 0, 255])
    assert ren.use_pallas is False  # downgraded for subsequent frames


def test_native_flatten_falls_back_to_python_walk():
    """Scenes with kinds the native walk can't handle use the Python walk."""
    from figdraw_tpu.nodes import drawable_line
    from figdraw_tpu.nodesarray import from_renders

    r = new_renders()
    lst = RenderList()
    lst.add_root(Fig(kind=FigKind.nkDrawable, screen_box=rect(0, 0, 64, 48),
                     draw_stroke=__import__("figdraw_tpu").RenderStroke(
                         weight=3.0, fill=fill(rgba(0, 0, 255, 255))),
                     draw_ops=(drawable_line(vec2(5, 5), vec2(50, 40)),)))
    r.set_layer(0, lst)
    arr = from_renders(r)
    ren = FigRenderer(atlas_size=64, use_pallas=False)
    ren.render_frame(arr, vec2(64, 48))  # must not raise
    img = ren.take_screenshot()
    assert (img[..., 2] > 180).sum() > 20
