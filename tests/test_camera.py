"""Device-resident scenes + screen-space camera (snapshot_scene/render_view
/render_views).

The tape uploads once; per frame only a (2,) offset + zoom scalar travel
and executor.view_rows maps origins/bboxes/inverse affines/rect-mask rows
inside the jitted executor. Contract: integer pans and power-of-two zooms
of integer axis-aligned scenes equal a host re-flatten of the scene under
the same nkTransform camera BIT-exactly (ceil snapping commutes with
integer affine maps); pan(0)/zoom(1) equals the normal render; the meta
tail and padding rows are never disturbed (round-trip test); the batched
flythrough equals the per-view loop.
"""

import numpy as np
import pytest

# heavyweight end-to-end frame-loop suite: excluded by `./ci.sh fast` (-m 'not slow')
pytestmark = pytest.mark.slow

from figdraw_tpu import (
    Fig, FigFlags, FigKind, fill, new_renders, rect, rgba, vec2,
)
from figdraw_tpu.basics import TransformStyle
from figdraw_tpu.geometry import Mat3
from figdraw_tpu.nodes import RenderList
from figdraw_tpu.nodesarray import from_renders
from figdraw_tpu.renderer import FigRenderer


def _view_root(renders, d, z):
    """An nkTransform root applying the camera map p' = z·p + d — the
    reference way to scroll/zoom (re-walk under a transform) that
    render_view must reproduce."""
    return renders.add_root(0, Fig(
        kind=FigKind.nkTransform,
        transform=TransformStyle(translation=vec2(float(d[0]), float(d[1])),
                                 matrix=Mat3.scaling(float(z), float(z))),
    ))


def boxes_scene_view(d=(0, 0), z=1, n=24):
    """boxes_scene geometry under an explicit camera transform root."""
    renders = new_renders()
    tr = _view_root(renders, d, z)
    for i in range(n):
        renders.add_child(0, tr, Fig(
            kind=FigKind.nkRectangle,
            screen_box=rect(6 + (i % 6) * 22, 8 + (i // 6) * 26, 30, 22),
            corners=(5,) * 4,
            fill=fill(rgba(50 + i * 8, (i * 37) % 255, 190, 150))))
    return from_renders(renders)


def rectmask_scene_view(d=(0, 0), z=1, rows=4, cols=3):
    """Axis-aligned NfRectMaskContent cells (the rect-mask fast path, wire
    cols 42-49) with overflowing axis-aligned children, under a camera
    transform root. Everything integer + axis-aligned so integer camera
    maps commute with ceil snapping."""
    renders = new_renders()
    tr = _view_root(renders, d, z)
    for r in range(rows):
        for c in range(cols):
            cell = Fig(
                kind=FigKind.nkRectangle,
                screen_box=rect(8 + c * 52, 6 + r * 34, 42, 26),
                corners=(7, 7, 7, 7), flags=FigFlags.NfRectMaskContent,
                fill=fill(rgba(200 - r * 20, 80 + c * 30, 140, 255)),
            )
            ci = renders.add_child(0, tr, cell)
            renders.add_child(0, ci, Fig(
                kind=FigKind.nkRectangle,
                screen_box=rect(-20, -20, 400, 400),
                fill=fill(rgba(30, 40, 220, 110)),
            ))
    return from_renders(renders)


def boxes_scene(dx=0, dy=0, n=24):
    lst = RenderList()
    for i in range(n):
        lst.add_root(Fig(kind=FigKind.nkRectangle,
                         screen_box=rect(6 + (i % 6) * 22 + dx,
                                         8 + (i // 6) * 26 + dy, 30, 22),
                         corners=(5,) * 4,
                         fill=fill(rgba(50 + i * 8, (i * 37) % 255, 190, 150))))
    from figdraw_tpu import new_renders
    r = new_renders()
    r.set_layer(0, lst)
    return from_renders(r)


def clip_scene(dx=0, dy=0, rows=5, cols=4):
    renders = new_renders()
    for r in range(rows):
        for c in range(cols):
            cell = renders.add_root(0, Fig(
                kind=FigKind.nkRectangle,
                screen_box=rect(6 + c * 44 + dx, 4 + r * 28 + dy, 36, 22),
                corners=(6, 6, 6, 6), flags=FigFlags.NfClipContent,
                fill=fill(rgba(210 - r * 12, 70 + c * 25, 130, 255)),
            ))
            # screen_box is ABSOLUTE (the reference's Fig is a render list,
            # not a layout tree): a camera pan moves children too
            renders.add_child(0, cell, Fig(
                kind=FigKind.nkRectangle,
                screen_box=rect(-8 + dx, -8 + dy, 300, 300),
                fill=fill(rgba(30, 40, 220, 110)), rotation=9.0,
            ))
    return from_renders(renders)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_integer_pan_bit_exact_simple(use_pallas):
    size = vec2(176, 144)
    cam = FigRenderer(atlas_size=64, use_pallas=use_pallas)
    ref = FigRenderer(atlas_size=64, use_pallas=use_pallas)
    scene = cam.snapshot_scene(boxes_scene(), size)
    for dx, dy in ((0, 0), (9, 0), (0, -7), (-13, 11)):
        view = np.asarray(cam.render_view(scene, (dx, dy)))
        expect = np.asarray(ref.render_frame(boxes_scene(dx, dy), size))
        np.testing.assert_array_equal(view, expect, err_msg=f"pan {dx},{dy}")


def test_integer_pan_bit_exact_masks():
    """Mask-heavy snapshot (rolled XLA path): clip cells and their contents
    pan together, including the rect-mask fast path's screen→local
    translation re-derivation (axis-aligned masks stay exact)."""
    size = vec2(192, 152)
    cam = FigRenderer(atlas_size=64, use_pallas=False)
    ref = FigRenderer(atlas_size=64, use_pallas=False)
    scene = cam.snapshot_scene(clip_scene(), size)
    for dx, dy in ((6, 0), (-10, 8)):
        view = np.asarray(cam.render_view(scene, (dx, dy)))
        expect = np.asarray(ref.render_frame(clip_scene(dx, dy), size))
        np.testing.assert_array_equal(view, expect, err_msg=f"pan {dx},{dy}")


def test_integer_pan_bit_exact_mega():
    size = vec2(192, 152)
    cam = FigRenderer(atlas_size=64, use_pallas=True)
    ref = FigRenderer(atlas_size=64, use_pallas=True)
    scene = cam.snapshot_scene(clip_scene(), size)
    assert scene.kind == "mega"
    view = np.asarray(cam.render_view(scene, (7, -5)))
    expect = np.asarray(ref.render_frame(clip_scene(7, -5), size))
    np.testing.assert_array_equal(view, expect)
    assert cam.use_pallas  # no silent downgrade


def test_pan_round_trip_and_outlives_pool():
    """pan(d) then pan(0) returns the original frame exactly — padding and
    the meta tail are untouched — and the snapshot stays valid after later
    flattens recycle the native combo pool."""
    size = vec2(176, 144)
    cam = FigRenderer(atlas_size=64, use_pallas=False)
    scene = cam.snapshot_scene(boxes_scene(), size)
    base = np.asarray(cam.render_view(scene, (0, 0)))
    cam.render_view(scene, (31, -17))
    # recycle the pool twice
    cam.render_frame(boxes_scene(3, 1), size)
    cam.render_frame(boxes_scene(5, 2), size)
    again = np.asarray(cam.render_view(scene, (0.0, 0.0)))
    np.testing.assert_array_equal(again, base)


def test_fractional_pan_moves_smoothly():
    """Fractional pans shift the baked AA without re-snapping: the frame
    changes, stays finite, and a 1.0 total shift equals the 1-integer pan."""
    size = vec2(176, 144)
    cam = FigRenderer(atlas_size=64, use_pallas=False)
    scene = cam.snapshot_scene(boxes_scene(), size)
    a = np.asarray(cam.render_view(scene, (0.5, 0.25)))
    b = np.asarray(cam.render_view(scene, (0.0, 0.0)))
    assert np.isfinite(a).all() and not np.array_equal(a, b)
    one = np.asarray(cam.render_view(scene, (1.0, 0.0)))
    ref = FigRenderer(atlas_size=64, use_pallas=False)
    expect = np.asarray(ref.render_frame(boxes_scene(1, 0), size))
    np.testing.assert_array_equal(one, expect)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_integer_zoom_bit_exact(use_pallas):
    """Power-of-two integer zooms of integer axis-aligned scenes equal a
    host re-walk under the same nkTransform camera BIT-exactly (vertex
    deltas, determinants and inverse-affine entries all scale by exact
    powers of two; ceil snapping commutes with integer maps)."""
    size = vec2(352, 288)
    cam = FigRenderer(atlas_size=64, use_pallas=use_pallas)
    ref = FigRenderer(atlas_size=64, use_pallas=use_pallas)
    scene = cam.snapshot_scene(boxes_scene_view(), size)
    for (dx, dy), z in (((0, 0), 2), ((9, -7), 2), ((-13, 11), 4)):
        view = np.asarray(cam.render_view(scene, (dx, dy), zoom=z))
        expect = np.asarray(
            ref.render_frame(boxes_scene_view((dx, dy), z), size))
        np.testing.assert_array_equal(
            view, expect, err_msg=f"zoom {z} pan {dx},{dy}")


def test_integer_zoom_bit_exact_rect_masks():
    """Zoom through the rect-mask fast path: the screen→local rows (wire
    42,43/46,47) scale by 1/z and the translations re-derive, so
    axis-aligned masked cells zoom bit-exactly vs the re-walk."""
    size = vec2(352, 288)
    cam = FigRenderer(atlas_size=64, use_pallas=False)
    ref = FigRenderer(atlas_size=64, use_pallas=False)
    scene = cam.snapshot_scene(rectmask_scene_view(), size)
    for (dx, dy), z in (((4, -6), 2), ((-11, 3), 2)):
        view = np.asarray(cam.render_view(scene, (dx, dy), zoom=z))
        expect = np.asarray(
            ref.render_frame(rectmask_scene_view((dx, dy), z), size))
        np.testing.assert_array_equal(
            view, expect, err_msg=f"zoom {z} pan {dx},{dy}")


def clip_scene_view(d=(0, 0), z=1, rows=3, cols=3):
    """Axis-aligned NfClipContent cells (real mask planes — the megakernel
    path) under a camera transform root; all-integer so integer camera maps
    stay exact."""
    renders = new_renders()
    tr = _view_root(renders, d, z)
    for r in range(rows):
        for c in range(cols):
            ci = renders.add_child(0, tr, Fig(
                kind=FigKind.nkRectangle,
                screen_box=rect(10 + c * 56, 8 + r * 40, 44, 30),
                corners=(6, 6, 6, 6), flags=FigFlags.NfClipContent,
                fill=fill(rgba(210 - r * 12, 70 + c * 25, 130, 255)),
            ))
            renders.add_child(0, ci, Fig(
                kind=FigKind.nkRectangle,
                screen_box=rect(-16, -16, 360, 360),
                fill=fill(rgba(30, 40, 220, 110)),
            ))
    return from_renders(renders)


def test_integer_zoom_bit_exact_mega():
    size = vec2(352, 288)
    cam = FigRenderer(atlas_size=64, use_pallas=True)
    ref = FigRenderer(atlas_size=64, use_pallas=True)
    scene = cam.snapshot_scene(clip_scene_view(), size)
    assert scene.kind == "mega"
    view = np.asarray(cam.render_view(scene, (5, -3), zoom=2))
    expect = np.asarray(ref.render_frame(clip_scene_view((5, -3), 2),
                                         size))
    np.testing.assert_array_equal(view, expect)
    assert cam.use_pallas  # no silent downgrade


def test_fractional_zoom_smooth_and_unit_zoom_is_pan():
    """zoom=1 degenerates bitwise to the pure pan (×1.0/÷1.0 are IEEE
    exact); fractional zooms stay finite, differ, and scale the baked AA
    without re-snapping."""
    size = vec2(176, 144)
    cam = FigRenderer(atlas_size=64, use_pallas=False)
    scene = cam.snapshot_scene(boxes_scene(), size)
    pan_only = np.asarray(cam.render_view(scene, (5, -3)))
    unit_zoom = np.asarray(cam.render_view(scene, (5, -3), zoom=1.0))
    np.testing.assert_array_equal(unit_zoom, pan_only)
    frac = np.asarray(cam.render_view(scene, (5, -3), zoom=1.5))
    assert np.isfinite(frac).all() and not np.array_equal(frac, pan_only)


def _hud_nodes():
    """A screen-fixed HUD: panel + meter bar, drawn above the scene."""
    return [
        Fig(kind=FigKind.nkRectangle, screen_box=rect(8, 8, 120, 30),
            corners=(8,) * 4, fill=fill(rgba(20, 20, 30, 200))),
        Fig(kind=FigKind.nkRectangle, screen_box=rect(14, 16, 90, 14),
            corners=(4,) * 4, fill=fill(rgba(80, 230, 120, 255))),
    ]


@pytest.mark.parametrize("use_pallas", [False, True])
def test_camera_overlay_composite(use_pallas):
    """Dynamic overlay on a device-resident scene: render_view then
    render_frame(hud, clear_main=False) — the reference's clearMain=false
    framebuffer-reuse semantics (figrender.nim:1960) — equals ONE re-walk
    of the combined scene (camera-transformed base + screen-fixed HUD on a
    higher layer) bit-exactly."""
    size = vec2(352, 288)
    d, z = (9, -7), 2

    def hud_scene():
        r = new_renders()
        for n in _hud_nodes():
            r.add_root(1, n)
        return from_renders(r)

    def combined():
        r = new_renders()
        tr = _view_root(r, d, z)
        for i in range(24):
            r.add_child(0, tr, Fig(
                kind=FigKind.nkRectangle,
                screen_box=rect(6 + (i % 6) * 22, 8 + (i // 6) * 26, 30, 22),
                corners=(5,) * 4,
                fill=fill(rgba(50 + i * 8, (i * 37) % 255, 190, 150))))
        for n in _hud_nodes():
            r.add_root(1, n)
        return from_renders(r)

    cam = FigRenderer(atlas_size=64, use_pallas=use_pallas)
    ref = FigRenderer(atlas_size=64, use_pallas=use_pallas)
    scene = cam.snapshot_scene(boxes_scene_view(), size)
    cam.render_view(scene, d, zoom=z)
    view = np.asarray(cam.render_frame(hud_scene(), size, clear_main=False))
    expect = np.asarray(ref.render_frame(combined(), size))
    np.testing.assert_array_equal(view, expect)


def test_snapshot_skips_viewport_cull():
    """snapshot_scene flattens with cull=False: panning must reveal quads a
    viewport-clamped saturation cull would have dropped. (The cull only
    engages ≥4096 quads; this pins the flag plumbing via tape counts.)"""
    from figdraw_tpu.basics import scaled

    size = vec2(176, 144)
    r = FigRenderer(atlas_size=64, use_pallas=False)
    t_cull = r.flatten(boxes_scene(), scaled(size), cull=True)
    t_nocull = r.flatten(boxes_scene(), scaled(size), cull=False)
    assert t_nocull.count >= t_cull.count


@pytest.mark.parametrize("use_pallas", [False, True])
def test_render_views_matches_loop(use_pallas):
    """The flythrough batch (ONE (N,2) pans + (N,) zooms upload, chunked
    lax.map dispatch) equals the render_view loop bit-exactly, including
    fractional views and odd chunk tails."""
    size = vec2(176, 144)
    ren = FigRenderer(atlas_size=64, use_pallas=use_pallas)
    scene = ren.snapshot_scene(boxes_scene(), size)
    pans = [(0, 0), (9, -7), (0.5, 0.25), (-13, 11), (3, 4)]
    zooms = [1.0, 2.0, 1.5, 1.0, 0.75]
    stack = np.asarray(ren.render_views(scene, pans, zooms, chunk=2))
    assert stack.shape[0] == len(pans)
    for i, (p, z) in enumerate(zip(pans, zooms)):
        exp = np.asarray(ren.render_view(scene, p, zoom=z))
        np.testing.assert_array_equal(stack[i], exp, err_msg=f"view {i}")


def test_render_views_mega_scalar_zoom_u8():
    """Mega-path flythrough with a scalar zoom; as_uint8 matches
    take_screenshot's rounding per view."""
    size = vec2(192, 152)
    ren = FigRenderer(atlas_size=64, use_pallas=True)
    scene = ren.snapshot_scene(clip_scene_view(), size)
    assert scene.kind == "mega"
    pans = [(0, 0), (7, -5), (-3, 2)]
    stack = ren.render_views(scene, pans, zooms=2.0, as_uint8=True)
    assert stack.dtype == np.uint8 and stack.shape[0] == 3
    for i, p in enumerate(pans):
        exp = ren.take_screenshot(ren.render_view(scene, p, zoom=2.0))
        np.testing.assert_array_equal(np.asarray(stack[i]), exp)
    assert ren.use_pallas


def test_render_views_frames_mesh():
    """Frame-parallel flythrough: each device renders whole views of the
    chunk; bit-exact vs the loop."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    from figdraw_tpu.parallel.sharding import frames_mesh

    size = vec2(176, 144)
    ren = FigRenderer(atlas_size=64, use_pallas=False)
    scene = ren.snapshot_scene(boxes_scene(), size)
    mesh = frames_mesh()
    pans = [(float(3 * i), float(-2 * i)) for i in range(11)]
    stack = np.asarray(ren.render_views(scene, pans, zooms=1.0, chunk=2,
                                        mesh=mesh))
    assert stack.shape[0] == 11
    for i, p in enumerate(pans):
        exp = np.asarray(ren.render_view(scene, p))
        np.testing.assert_array_equal(stack[i], exp, err_msg=f"view {i}")
