"""Layers + clip golden — the reference's tightest fidelity test
(trender_layers_clip.nim, diff threshold 1.0): multi-root ZLevel layers,
rounded clip masks, rect-mask fast path, overflow clipping."""

import os

import numpy as np
import pytest

# reference-PNG fidelity pins: the `./ci.sh quick` tier
pytestmark = pytest.mark.golden

from figdraw_tpu import (
    Fig,
    FigFlags,
    FigKind,
    FigRenderer,
    fill,
    new_renders,
    rect,
    rgba,
    vec2,
)
from figdraw_tpu.nodes import RenderList

EXPECTED_DIR = "/root/reference/tests/expected"


def _rect_fig(box, color, z, clip=False, rect_mask=False, corners=10):
    flags = FigFlags(0)
    if clip:
        flags |= FigFlags.NfClipContent
    if rect_mask:
        flags |= FigFlags.NfRectMaskContent
    return Fig(
        kind=FigKind.nkRectangle, zlevel=z, screen_box=box, fill=fill(color),
        corners=(corners,) * 4, flags=flags,
    )


def layers_clip_scene(w, h, rect_mask=False):
    """trender_layers_clip.nim makeRenderTree (:76-172)."""
    bg = rgba(255, 255, 255, 255)
    container = rgba(208, 208, 208, 255)
    button = rgba(43, 159, 234, 255)

    cw = w * 0.30
    ch = w * 0.40
    cy = h * 0.10
    clx = w * 0.03
    crx = w * 0.50
    bx = cw * 0.10
    bw = cw * 1.30
    bh = ch * 0.20
    by1 = ch * 0.15
    by2 = ch * 0.45
    by3 = ch * 0.75

    bg_list = RenderList()
    bg_list.add_root(_rect_fig(rect(0, 0, w, h), bg, -20, corners=0))

    layer0 = RenderList()
    left = layer0.add_root(_rect_fig(rect(clx, cy, cw, ch), container, 0))
    right = layer0.add_root(
        _rect_fig(rect(crx, cy, cw, ch), container, 0,
                  clip=not rect_mask, rect_mask=rect_mask)
    )
    layer0.add_child(left, _rect_fig(rect(clx + bx, cy + by2, bw, bh), button, 0))
    layer0.add_child(right, _rect_fig(rect(crx + bx, cy + by2, bw, bh), button, 0))

    low = RenderList()
    top = RenderList()
    low.add_root(_rect_fig(rect(clx + bx, cy + by3, bw, bh), button, -5))
    top.add_root(_rect_fig(rect(clx + bx, cy + by1, bw, bh), button, 20))
    low.add_root(_rect_fig(rect(crx + bx, cy + by3, bw, bh), button, -5))
    top.add_root(_rect_fig(rect(crx + bx, cy + by1, bw, bh), button, 20))

    r = new_renders()
    r.set_layer(-20, bg_list)
    r.set_layer(0, layer0)
    r.set_layer(-5, low)
    r.set_layer(20, top)
    return r


@pytest.mark.skipif(
    not os.path.isdir(EXPECTED_DIR), reason="reference goldens not mounted"
)
@pytest.mark.parametrize("use_pallas", [False, True], ids=["xla", "pallas"])
@pytest.mark.parametrize("rect_mask", [False, True])
def test_layers_clip_golden(rect_mask, use_pallas):
    from PIL import Image

    expected = np.asarray(
        Image.open(os.path.join(EXPECTED_DIR, "render_layers_clip.png")).convert("RGBA"),
        dtype=np.float32,
    )
    h, w = expected.shape[:2]
    ren = FigRenderer(atlas_size=64, use_pallas=use_pallas)
    ren.render_frame(layers_clip_scene(float(w), float(h), rect_mask), vec2(w, h))
    got = ren.take_screenshot().astype(np.float32)
    adiff = np.abs(got[..., :3] - expected[..., :3])
    diff = adiff / 255.0
    rmse = float(np.sqrt((diff ** 2).mean()))
    bad = (diff.max(axis=-1) > 32 / 255.0).mean()
    print(f"layers_clip rect_mask={rect_mask} pallas={use_pallas}: "
          f"rmse={rmse:.5f} bad={bad:.6f} maxdiff={adiff.max():.0f}")
    # the reference holds BOTH its paths to diff 1.0 on this golden
    # (trender_layers_clip.nim:249-251)
    if not rect_mask and not use_pallas:
        # CLAUDE.md invariant: the clip path matches the golden BIT-EXACTLY
        # on the XLA path
        assert adiff.max() == 0.0, f"clip path no longer bit-exact: {adiff.max()}"
    elif not use_pallas:
        # the rect-mask fast path snaps to the same pixels as the mask-plane
        # twin (tape.py _make_rect_mask); residue is corner-arc rounding
        assert rmse < 1e-3, rmse
        assert bad < 1e-3, bad
    else:
        # Pallas kernel: golden bound + the documented 1/255 kernel tolerance
        assert rmse < 1e-3 + 1.0 / 255.0, rmse
        assert bad < 1e-3, bad


def test_layer_draw_order_and_clip_semantics():
    """Structural check without the golden: -20 < -5 < 0 < 20 draw order,
    right container clips its child, left does not."""
    w, h = 400, 188
    ren = FigRenderer(atlas_size=64, use_pallas=False)
    ren.render_frame(layers_clip_scene(float(w), float(h)), vec2(w, h))
    img = ren.take_screenshot()
    cw = w * 0.30
    ch = w * 0.40
    cy = h * 0.10
    clx = w * 0.03
    crx = w * 0.50
    bx = cw * 0.10
    bw = cw * 1.30
    bh = ch * 0.20
    by2 = ch * 0.45
    # left container's wide button overflows un-clipped → blue outside container
    over_x = int(clx + cw + 10)
    over_y = int(cy + by2 + bh / 2)
    assert img[over_y, over_x, 2] > 180, img[over_y, over_x]
    # right container clips → background/container right of container edge...
    over_rx = int(crx + cw + 10)
    px = img[over_y, over_rx]
    assert not (px[2] > 180 and px[0] < 100), px
