"""Text geometry APIs at tfontutils depth: selection bands, cluster rects,
multi-caret bidi positions, caret-point hit testing.

Case-for-case ports of the reference's synthetic-arrangement tests
(/root/reference/tests/tfontutils.nim:416-610) plus the shaped-ligature
source-mapping cases (:636-700), against figdraw_tpu.text.layout's
GlyphArrangement (fonttypes.nim:430-808 semantics).
"""

import numpy as np
import pytest

from figdraw_tpu import fill, rgba, vec2
from figdraw_tpu.geometry import Rect, rect
from figdraw_tpu.text.layout import (
    ArrangedGlyph, GlyphArrangement, GlyphSourceRange, typeset,
)
from figdraw_tpu.text.typefaces import FigFont, get_typeface, load_typeface

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"


def _glyph(src, r, src_end=None):
    """testGlyph / testGlyphRange analog: a glyph covering source runes
    [src, src_end) with an explicit visual rect."""
    end = src + 1 if src_end is None else src_end
    return ArrangedGlyph(
        font_id=42, glyph_id=10 + src, cluster=src,
        source=GlyphSourceRange(src, end), rune="a", is_whitespace=False,
        pos=vec2(r.x, r.y), advance=vec2(r.w, 0.0), rect=r,
    )


def _arrangement(glyphs, n_src, lines=None):
    return GlyphArrangement(
        lines=lines if lines is not None else [(0, len(glyphs) - 1)],
        spans=[(0, len(glyphs) - 1)],
        source_runes=["a"] * n_src,
        arranged_glyphs=glyphs,
    )


def _rects_eq(got, want):
    assert len(got) == len(want), (got, want)
    for g, w in zip(got, want):
        for a, b in zip((g.x, g.y, g.w, g.h), (w.x, w.y, w.w, w.h)):
            assert abs(a - b) < 0.01, (got, want)


# --- tfontutils.nim:416-448 "source selection bands use full line height" ------

def test_selection_bands_use_full_line_height():
    arr = _arrangement([
        _glyph(0, rect(0, 2, 12, 10)),
        _glyph(1, rect(12, 4, 8, 6)),
        _glyph(2, rect(20, 0, 10, 14)),
        _glyph(3, rect(30, 2, 10, 10)),
    ], n_src=4)
    _rects_eq(arr.glyph_selection_rects_for((1, 2)),
              [rect(12, 4, 8, 6), rect(20, 0, 10, 14)])
    bands = arr.selection_rects_for((1, 2))
    _rects_eq(bands, [rect(12, 0, 18, 14)])
    _rects_eq(arr.selection_bands_for((1, 2)), bands)
    _rects_eq(arr.selection_rects_for_raw_bytes((1, 2)), bands)


# --- :450-484 "split separated visual fragments" --------------------------------

def test_selection_bands_split_separated_visual_fragments():
    arr = _arrangement([
        _glyph(0, rect(0, 0, 10, 14)),
        _glyph(1, rect(10, 0, 10, 14)),
        _glyph(3, rect(20, 0, 10, 14)),
        _glyph(2, rect(30, 0, 10, 14)),
        _glyph(4, rect(40, 0, 10, 14)),
    ], n_src=5)
    _rects_eq(arr.glyph_selection_rects_for((1, 2)),
              [rect(10, 0, 10, 14), rect(30, 0, 10, 14)])
    _rects_eq(arr.selection_rects_for((1, 2)),
              [rect(10, 0, 10, 14), rect(30, 0, 10, 14)])


# --- :486-503 "clip partial ligature ranges" -------------------------------------

def test_selection_bands_clip_partial_ligature_ranges():
    arr = _arrangement(
        [_glyph(0, rect(10, 2, 40, 10), src_end=4)], n_src=4,
        lines=[(0, 0)],
    )
    _rects_eq(arr.glyph_selection_rects_for((1, 1)), [rect(10, 2, 40, 10)])
    _rects_eq(arr.selection_rects_for((1, 1)), [rect(20, 2, 10, 10)])
    _rects_eq(arr.selection_rects_for((1, 2)), [rect(20, 2, 20, 10)])


# --- :505-527 "clip rtl partial ligature ranges from right edge" -----------------

def test_selection_bands_clip_rtl_partial_ligature_from_right():
    arr = _arrangement([
        _glyph(4, rect(0, 0, 10, 14)),
        _glyph(1, rect(10, 0, 30, 14), src_end=4),
        _glyph(0, rect(40, 0, 10, 14)),
    ], n_src=5, lines=[(0, 2)])
    _rects_eq(arr.selection_rects_for((1, 1)), [rect(30, 0, 10, 14)])
    _rects_eq(arr.selection_rects_for((2, 3)), [rect(10, 0, 20, 14)])


# --- :529-568 "caret positions collapse ltr shaped cluster fragments" ------------

def test_caret_positions_collapse_ltr_cluster_fragments():
    arr = _arrangement([
        _glyph(0, rect(0, 0, 10, 14)),
        _glyph(1, rect(22, 0, 0, 14), src_end=3),
        _glyph(1, rect(10, 0, 20, 14), src_end=3),
        _glyph(3, rect(30, 0, 10, 14)),
    ], n_src=4)
    start = arr.caret_positions_for(1)
    inside = arr.caret_positions_for(2)
    end = arr.caret_positions_for(3)
    assert len(start) == 1 and abs(start[0].pos.x - 10.0) < 0.01
    assert len(inside) == 1 and abs(inside[0].pos.x - 20.0) < 0.01
    assert len(end) == 1 and abs(end[0].pos.x - 30.0) < 0.01
    _rects_eq(arr.selection_rects_for((1, 1)), [rect(10, 0, 10, 14)])


# --- :570-610 "caret positions collapse rtl shaped cluster fragments" ------------

def test_caret_positions_collapse_rtl_cluster_fragments():
    arr = _arrangement([
        _glyph(4, rect(0, 0, 10, 14)),
        _glyph(1, rect(22, 0, 0, 14), src_end=3),
        _glyph(1, rect(10, 0, 20, 14), src_end=3),
        _glyph(0, rect(30, 0, 10, 14)),
    ], n_src=5)
    start = arr.caret_positions_for(1)
    inside = arr.caret_positions_for(2)
    end = arr.caret_positions_for(3)
    assert len(start) == 1 and abs(start[0].pos.x - 30.0) < 0.01
    assert len(inside) == 1 and abs(inside[0].pos.x - 20.0) < 0.01
    assert len(end) == 1 and abs(end[0].pos.x - 10.0) < 0.01
    _rects_eq(arr.selection_rects_for((2, 2)), [rect(10, 0, 10, 14)])


# --- :636-670 "source range helpers map ligatures back to source runes" ----------
# (real shaped text: the ffi ligature in DejaVu, like Ubuntu.ttf's in the ref)

@pytest.fixture(scope="module")
def tid():
    return load_typeface(DEJAVU)


def _typeset(tid, text, size=32.0):
    f = FigFont(typeface_id=tid, size=size)
    return typeset(vec2(300, 80), [(f, fill(rgba(0, 0, 0, 255)), text)])


def test_ligature_source_mapping_and_hit(tid):
    arr = _typeset(tid, "office")
    assert len(arr.source_runes) == 6
    assert len(arr.arranged_glyphs) < len(arr.source_runes)

    lo, hi = arr.glyph_range_for((1, 3))  # "ffi"
    assert lo == hi
    assert arr.source_rune_range_at(lo) == (1, 4)
    assert "".join(arr.source_runes[1:4]) == "ffi"

    rects = arr.glyph_selection_rects_for((2, 2))
    assert len(rects) == 1
    r0 = arr.arranged_glyphs[lo].rect
    _rects_eq(rects, [r0])
    assert len(arr.selection_rects_for((2, 2))) == 1
    # the middle-of-ligature band is a proper fraction of the glyph
    band = arr.selection_rects_for((2, 2))[0]
    assert band.w < r0.w

    hit = vec2(r0.x + r0.w / 2, r0.y + r0.h / 2)
    assert arr.glyph_index_at(hit) == lo
    assert arr.source_rune_range_at(hit) == (1, 4)


# --- :1084-1160 analog: bidi boundaries + caret round trips ----------------------

def test_bidi_boundary_multi_caret_and_roundtrip(tid):
    heb = "שלום"
    text = "ab" + heb + "cd"
    arr = _typeset(tid, text, size=20.0)
    # the LTR→RTL boundary (after "ab") yields two visual carets
    boundary = arr.caret_positions_for(2)
    assert len(boundary) >= 2
    xs = sorted(c.pos.x for c in boundary)
    assert xs[-1] - xs[0] > 1.0
    # interior positions yield one caret each
    assert len(arr.caret_positions_for(1)) == 1
    # caret → nearest-rune round trip at every insertion index: the reported
    # caret point must map back to its own source index
    for src in range(len(text) + 1):
        for caret in arr.caret_positions_for(src):
            near = arr.nearest_source_rune_for_caret_point(caret.pos)
            near_carets = arr.caret_positions_for(near)
            assert any(
                abs(c.pos.x - caret.pos.x) < 0.51 for c in near_carets
            ), (src, near)


def test_rtl_selection_bands_merge_per_direction(tid):
    heb = "שלום"
    text = "ab" + heb + "cd"
    arr = _typeset(tid, text, size=20.0)
    # selecting across the boundary produces separate visual bands (the RTL
    # fragment is visually displaced from the LTR one)
    bands = arr.selection_rects_for((1, 4))
    assert len(bands) >= 2
    # bands never overlap horizontally
    spans = sorted((b.x, b.x + b.w) for b in bands)
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 <= b0 + 0.01
    # selecting a pure RTL interior range stays one merged band
    rtl_bands = arr.selection_rects_for((3, 4))
    assert len(rtl_bands) == 1
