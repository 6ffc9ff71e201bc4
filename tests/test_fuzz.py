"""Property-based parity fuzz: random scenes through every pipeline pair.

For seeded random node trees (rects with gradients/strokes/shadows/corners/
rotations, clips, rect masks, transforms, drawables), the C++ walk must match
the Python walk bit-for-bit, and the Pallas rasterizer must match the XLA
reference within 1/255 per channel.
"""

import numpy as np
import pytest

from figdraw_tpu import (
    Fig, FigFlags, FigKind, FigRenderer, RenderShadow, RenderStroke,
    ShadowStyle, fill, linear, new_renders, rect, rgba, vec2,
)
from figdraw_tpu import native
from figdraw_tpu.basics import StrokeCap, StrokeJoin
from figdraw_tpu.fill import FillGradientAxis
from figdraw_tpu.nodes import (
    RenderList, drawable_arc, drawable_bezier, drawable_circle,
    drawable_ellipse, drawable_line, drawable_rect,
)
from figdraw_tpu.nodesarray import from_renders, to_renders

W, H = 160, 128


def _rand_fill(rng):
    kind = rng.integers(0, 3)
    c = lambda: rgba(*rng.integers(0, 256, 4).tolist())
    if kind == 0:
        return fill(c())
    axis = FillGradientAxis(int(rng.integers(0, 4)))
    if kind == 1:
        return linear(c(), c(), axis=axis)
    return linear(c(), c(), c(), axis=axis, mid_pos=int(rng.integers(1, 255)))


def _rand_rect_fig(rng, depth=0):
    x, y = rng.uniform(-20, W), rng.uniform(-20, H)
    w, h = rng.uniform(4, 90), rng.uniform(4, 70)
    flags = FigFlags(0)
    r = rng.random()
    if depth < 2 and r < 0.25:
        flags |= FigFlags.NfClipContent
    elif depth < 2 and r < 0.4:
        flags |= FigFlags.NfRectMaskContent
    corners = tuple(int(v) for v in rng.integers(0, 20, 4))
    kw = {}
    if rng.random() < 0.3:
        kw["corner_radii_y"] = tuple(int(v) for v in rng.integers(0, 20, 4))
        flags |= FigFlags.NfEllipticalCorners
    shadows = ()
    if rng.random() < 0.35:
        shadows = (RenderShadow(
            style=ShadowStyle.DropShadow if rng.random() < 0.6 else ShadowStyle.InnerShadow,
            blur=float(rng.uniform(0, 12)), spread=float(rng.uniform(0, 6)),
            x=float(rng.uniform(-6, 6)), y=float(rng.uniform(-6, 6)),
            fill=_rand_fill(rng)),)
    return Fig(
        kind=FigKind.nkRectangle, screen_box=rect(x, y, w, h),
        corners=corners, flags=flags, fill=_rand_fill(rng),
        rotation=float(rng.uniform(-40, 40)) if rng.random() < 0.3 else 0.0,
        stroke=RenderStroke(weight=float(rng.uniform(0, 5)), fill=_rand_fill(rng))
        if rng.random() < 0.4 else RenderStroke(),
        shadows=shadows, **kw,
    )


def _rand_drawable(rng):
    v = lambda a, b: vec2(float(rng.uniform(0, a)), float(rng.uniform(0, b)))
    kind = rng.integers(0, 6)
    if kind == 0:
        op = drawable_line(v(100, 80), v(100, 80))
    elif kind == 1:
        op = drawable_circle(v(80, 60), float(rng.uniform(2, 25)))
    elif kind == 2:
        op = drawable_rect(rect(*rng.uniform(2, 50, 4).tolist()),
                           corners=tuple(int(x) for x in rng.integers(0, 8, 4)))
    elif kind == 3:
        n = int(rng.integers(2, 6))
        op = drawable_bezier([v(100, 80) for _ in range(n)],
                             steps=int(rng.integers(0, 6)))
    elif kind == 4:
        op = drawable_arc(v(80, 60), float(rng.uniform(5, 35)),
                          float(rng.uniform(-3, 3)), float(rng.uniform(-5, 5)),
                          steps=int(rng.integers(0, 5)))
    else:
        op = drawable_ellipse(v(80, 60), vec2(float(rng.uniform(3, 25)),
                                              float(rng.uniform(3, 25))))
    return Fig(
        kind=FigKind.nkDrawable, screen_box=rect(5, 5, 120, 100),
        fill=_rand_fill(rng) if rng.random() < 0.5 else fill(rgba(0, 0, 0, 0)),
        draw_stroke=RenderStroke(
            weight=float(rng.uniform(0.5, 6)), fill=_rand_fill(rng),
            cap=StrokeCap(int(rng.integers(0, 4))),
            join=StrokeJoin(int(rng.integers(0, 4))),
        ),
        draw_ops=(op,),
    )


def random_scene(seed: int):
    rng = np.random.default_rng(seed)
    lst = RenderList()
    lst.add_root(Fig(kind=FigKind.nkRectangle, screen_box=rect(0, 0, W, H),
                     fill=fill(rgba(250, 250, 250, 255))))
    for _ in range(int(rng.integers(4, 10))):
        if rng.random() < 0.25:
            lst.add_root(_rand_drawable(rng))
            continue
        idx = lst.add_root(_rand_rect_fig(rng))
        for _ in range(int(rng.integers(0, 3))):
            lst.add_child(idx, _rand_rect_fig(rng, depth=1))
    r = new_renders()
    r.set_layer(0, lst)
    return r


@pytest.mark.skipif(not native.available(), reason="native flattener not built")
@pytest.mark.parametrize("seed", range(16))
def test_fuzz_native_matches_python_walk(seed):
    scene = random_scene(seed)
    ren = FigRenderer(atlas_size=64, use_pallas=False)
    arr = from_renders(scene)
    py_tape = ren.flatten(to_renders(arr), vec2(W, H))
    native_tape = ren.flatten(arr, vec2(W, H))
    assert native_tape.count == py_tape.count
    assert np.array_equal(py_tape.fields[: py_tape.count],
                          native_tape.fields[: native_tape.count])
    assert np.array_equal(py_tape.modes[: py_tape.count],
                          native_tape.modes[: native_tape.count])


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_pallas_matches_xla(seed):
    scene = random_scene(100 + seed)
    arr = from_renders(scene)
    ren_p = FigRenderer(atlas_size=64, use_pallas=True)
    ren_p.render_frame(arr, vec2(W, H))
    got = ren_p.take_screenshot()
    ren_x = FigRenderer(atlas_size=64, use_pallas=False)
    ren_x.render_frame(arr, vec2(W, H))
    ref = ren_x.take_screenshot()
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


@pytest.mark.skipif(not native.available(), reason="native flattener not built")
@pytest.mark.parametrize("seed", range(10))
def test_fuzz_text_native_matches_python_walk(seed):
    """Random TEXT scenes (sizes, decorations, invertY, selections, clips)
    through both walks: the C++ nkText emission (glyph quads, selection
    bands, decoration rects) must stay bit-identical to the Python walk."""
    from figdraw_tpu.text.layout import HAlign, VAlign, typeset
    from figdraw_tpu.text.typefaces import FigFont, load_typeface

    rng = np.random.default_rng(7000 + seed)
    tid = load_typeface("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf")
    words = ["alpha", "Bravo", "fix", "ffl", "AV.", "quick", "jump", "zig"]

    lst = RenderList()
    lst.add_root(Fig(kind=FigKind.nkRectangle, screen_box=rect(0, 0, W, H),
                     fill=_rand_fill(rng)))
    for _ in range(int(rng.integers(2, 6))):
        f = FigFont(typeface_id=tid, size=float(rng.uniform(9, 22)),
                    underline=bool(rng.random() < 0.3),
                    strikethrough=bool(rng.random() < 0.2))
        text = " ".join(rng.choice(words, size=int(rng.integers(1, 5))))
        arr = typeset(vec2(float(rng.uniform(60, 150)), 40),
                      [(f, _rand_fill(rng), text)],
                      h_align=int(rng.integers(0, 3)),
                      v_align=int(rng.integers(0, 3)),
                      wrap=bool(rng.random() < 0.7))
        flags = FigFlags(0)
        r = rng.random()
        if r < 0.2:
            flags |= FigFlags.NfInvertY
        kw = {}
        if rng.random() < 0.3:
            flags |= FigFlags.NfSelectText
            kw["selection_range"] = (0, int(rng.integers(1, 6)))
        parent = None
        if rng.random() < 0.3:
            parent = lst.add_root(Fig(
                kind=FigKind.nkRectangle,
                screen_box=rect(float(rng.uniform(0, W - 40)),
                                float(rng.uniform(0, H - 30)), 80, 30),
                corners=(6,) * 4, flags=FigFlags.NfClipContent,
                fill=fill(rgba(255, 255, 255, 255)),
            ))
        node = Fig(kind=FigKind.nkText,
                   screen_box=rect(float(rng.uniform(-10, W - 50)),
                                   float(rng.uniform(-10, H - 20)),
                                   float(rng.uniform(50, 160)), 36),
                   text_layout=arr, flags=flags, fill=_rand_fill(rng), **kw)
        if parent is not None:
            lst.add_child(parent, node)
        else:
            lst.add_root(node)

    scene = new_renders()
    scene.set_layer(0, lst)
    ren = FigRenderer(atlas_size=256, use_pallas=False)
    arr_scene = from_renders(scene)
    py_tape = ren.flatten(to_renders(arr_scene), vec2(W, H))
    native_tape = ren.flatten(arr_scene, vec2(W, H))
    assert native_tape.count == py_tape.count
    assert np.array_equal(py_tape.fields[: py_tape.count],
                          native_tape.fields[: native_tape.count])
    assert np.array_equal(py_tape.modes[: py_tape.count],
                          native_tape.modes[: native_tape.count])


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_text_pallas_matches_xla(seed):
    """Random text scenes through both rasterizers (glyph quads ride the XLA
    gather path either way; decorations/selections are Pallas SDF quads)."""
    from figdraw_tpu.text.layout import typeset
    from figdraw_tpu.text.typefaces import FigFont, load_typeface

    rng = np.random.default_rng(8100 + seed)
    tid = load_typeface("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf")
    lst = RenderList()
    lst.add_root(Fig(kind=FigKind.nkRectangle, screen_box=rect(0, 0, W, H),
                     fill=fill(rgba(250, 250, 250, 255))))
    for _ in range(int(rng.integers(2, 5))):
        f = FigFont(typeface_id=tid, size=float(rng.uniform(10, 20)),
                    underline=bool(rng.random() < 0.4))
        arr = typeset(vec2(140, 40), [(f, _rand_fill(rng), "mix AV fi 123")],
                      wrap=True)
        lst.add_root(Fig(kind=FigKind.nkText,
                         screen_box=rect(float(rng.uniform(0, W - 80)),
                                         float(rng.uniform(0, H - 30)), 140, 40),
                         text_layout=arr))
    r = new_renders()
    r.set_layer(0, lst)
    arr_scene = from_renders(r)
    ren_p = FigRenderer(atlas_size=256, use_pallas=True)
    ren_p.render_frame(arr_scene, vec2(W, H))
    got = ren_p.take_screenshot()
    ren_x = FigRenderer(atlas_size=256, use_pallas=False)
    ren_x.render_frame(arr_scene, vec2(W, H))
    ref = ren_x.take_screenshot()
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
