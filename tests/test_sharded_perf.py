"""Multi-chip performance path: the sharded fused executor must drive the
SAME Pallas/megakernel stack as the single-chip renderer and match it within
1/255 on the 8-device CPU mesh.

Round-1 verdict item 2: the sharded path previously bypassed the whole
performance stack (per-item XLA dispatch). These tests pin the replacement:
one packed tape upload, the full pass chain in one jitted shard_map, Pallas
band rasterization with global-row offsets, halo-exchange blur, windowed
atlas draws. Reference frame-command analog: the one-command-stream frame of
glcontext.nim:643-714, now over N chips.
"""

import numpy as np
import pytest

import jax

from figdraw_tpu import (
    BackdropBlurStyle, Fig, FigFlags, FigKind, fill, new_renders, rect, rgba,
    vec2,
)
from figdraw_tpu.renderer import FigRenderer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device mesh"
)

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"


def _screenshot(frame):
    return (np.clip(np.asarray(frame), 0, 1) * 255).round().astype(np.uint8)


def _max_diff(a, b):
    return int(np.abs(a.astype(int) - b.astype(int)).max())


def test_sharded_pallas_300box_scene():
    """Pallas band rasterization + halo blur == single chip on the benchmark
    scene (make_render_tree: shadows, gradients, pill, backdrop blur)."""
    from figdraw_tpu.parallel.sharding import ShardedFigRenderer
    from figdraw_tpu.scenes import make_render_tree

    w, h = 256, 192
    scene = make_render_tree(float(w), float(h), frame=4, copies=3)

    single = FigRenderer(atlas_size=64, use_pallas=False)
    single.render_frame(scene, vec2(w, h))
    ref = single.take_screenshot()

    sharded = ShardedFigRenderer(atlas_size=64, use_pallas=True)
    got = _screenshot(sharded.render_frame(scene, vec2(w, h)))
    assert sharded.use_pallas, "sharded pallas executor fell back to XLA"
    assert _max_diff(got, ref) <= 1


def test_sharded_pallas_masks_blur_text():
    """Clip masks + backdrop blur + atlas glyphs (windowed draws with a
    global row offset; glyph runs straddle band boundaries) through the
    sharded executor."""
    from figdraw_tpu.parallel.sharding import ShardedFigRenderer
    from figdraw_tpu.text.layout import typeset
    from figdraw_tpu.text.typefaces import FigFont, load_typeface

    tid = load_typeface(DEJAVU)
    renders = new_renders()
    renders.add_root(0, Fig(kind=FigKind.nkRectangle,
                            screen_box=rect(0, 0, 256, 160),
                            fill=fill(rgba(250, 250, 250, 255))))
    clip = renders.add_root(0, Fig(
        kind=FigKind.nkRectangle, screen_box=rect(10, 10, 90, 120),
        corners=(12,) * 4, flags=FigFlags.NfClipContent,
        fill=fill(rgba(220, 220, 240, 255))))
    renders.add_child(0, clip, Fig(
        kind=FigKind.nkRectangle, screen_box=rect(0, 0, 300, 300),
        fill=fill(rgba(200, 40, 40, 160)), rotation=20.0))
    f = FigFont(typeface_id=tid, size=18.0)
    arr = typeset(vec2(140, 120),
                  [(f, fill(rgba(0, 0, 0, 255)), "band AV spanning glyphs")])
    renders.add_root(0, Fig(kind=FigKind.nkText,
                            screen_box=rect(110, 14, 140, 120),
                            text_layout=arr))
    renders.add_root(1, Fig(kind=FigKind.nkBackdropBlur,
                            screen_box=rect(30, 60, 180, 60),
                            backdrop_blur=BackdropBlurStyle(blur=9.0),
                            fill=fill(rgba(255, 255, 255, 60))))

    single = FigRenderer(atlas_size=256, use_pallas=False)
    single.render_frame(renders, vec2(256, 160))
    ref = single.take_screenshot()

    sharded = ShardedFigRenderer(atlas_size=256, use_pallas=True)
    got = _screenshot(sharded.render_frame(renders, vec2(256, 160)))
    assert sharded.use_pallas, "sharded pallas executor fell back to XLA"
    assert _max_diff(got, ref) <= 1


def test_sharded_megakernel_clip_table():
    """Mask-heavy pure-SDF scene routes through the sharded MEGAKERNEL (one
    Pallas tile walk per band, targets baked in the mode lane) and matches
    the single-chip renderer (windy_clip_mask_benchmark.nim's sub-clip
    case)."""
    from figdraw_tpu.nodes import RenderList, Renders
    from figdraw_tpu.parallel.sharding import ShardedFigRenderer

    def rect_fig(box, color, flags=0, corners=0):
        return Fig(kind=FigKind.nkRectangle, screen_box=box, fill=fill(color),
                   corners=(corners,) * 4, flags=flags)

    w, h = 320, 240
    lst = RenderList()
    lst.add_root(rect_fig(rect(0, 0, w, h), rgba(248, 249, 251, 255)))
    vp = lst.add_root(rect_fig(rect(20, 20, w - 40, h - 40),
                               rgba(232, 235, 240, 255),
                               flags=FigFlags.NfClipContent, corners=10))
    for row in range(10):
        for col in range(4):
            cell = rect(24 + col * 70, 8 + row * 24, 64, 20)
            ci = lst.add_child(vp, rect_fig(
                cell, rgba(255, 255, 255, 255),
                flags=FigFlags.NfClipContent, corners=4))
            lst.add_child(ci, rect_fig(
                rect(cell.x - 6, cell.y + 4, cell.w + 12, 14),
                rgba(90, 120, 200, 220)))
    scene = Renders()
    scene.set_layer(0, lst)

    single = FigRenderer(atlas_size=64, use_pallas=False)
    single.render_frame(scene, vec2(w, h))
    ref = single.take_screenshot()

    sharded = ShardedFigRenderer(atlas_size=64, use_pallas=True)
    got = _screenshot(sharded.render_frame(scene, vec2(w, h)))
    assert sharded.use_pallas, "sharded megakernel fell back"
    assert _max_diff(got, ref) <= 1


def test_sharded_executor_one_upload():
    """The fused executor ships the frame as ONE packed combo array — the
    tape fields/modes/bounds/radii/clear all ride executor.pack_tape_upload
    (the per-RPC tunnel-cost rule, SURVEY.md §5.8)."""
    from figdraw_tpu import executor as ex
    from figdraw_tpu.parallel.sharding import ShardedFigRenderer
    from figdraw_tpu.scenes import make_render_tree

    calls = []
    orig = ex.pack_tape_upload

    def counting_pack(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    ex.pack_tape_upload = counting_pack
    try:
        sharded = ShardedFigRenderer(atlas_size=64, use_pallas=True)
        scene = make_render_tree(128.0, 96.0, frame=1, copies=2)
        sharded.render_frame(scene, vec2(128, 96))
    finally:
        ex.pack_tape_upload = orig
    assert len(calls) == 1
