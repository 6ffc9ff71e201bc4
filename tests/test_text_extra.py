"""tfontutils-depth text contracts, part 2 (reference tests/tfontutils.nim).

Pins the behaviors around layout policy, hard breaks, CJK/RTL wrapping,
glyph-cache identity, font refcounting, registry identity and data-dir
resolution that part 1 (test_text.py / test_text_geometry.py) left out.
Line references cite the reference test bodies these port."""

import os
import shutil

import numpy as np
import pytest

from figdraw_tpu import fill, rgba, vec2
from figdraw_tpu.text.layout import HAlign, VAlign, typeset
from figdraw_tpu.text.typefaces import FigFont, load_typeface

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
INK = fill(rgba(0, 0, 0, 255))


@pytest.fixture(scope="module")
def tid():
    return load_typeface(DEJAVU)


def _font(tid, size=16.0, **kw):
    return FigFont(typeface_id=tid, size=size, **kw)


def test_content_hash_includes_wrapping_policy(tid):
    """tfontutils.nim:297-309 — the same text with a different wrap flag must
    hash differently (layout caches key on the policy, not just the text)."""
    f = _font(tid)
    a = typeset(vec2(200, 100), [(f, INK, "wrap policy probe text")], wrap=True)
    b = typeset(vec2(200, 100), [(f, INK, "wrap policy probe text")], wrap=False)
    assert a.content_hash != b.content_hash


def test_line_height_override_affects_layout(tid):
    """tfontutils.nim:310-320 — FigFont.lineHeight overrides the metrics-
    derived line height and moves the second line accordingly."""
    text = "first line\nsecond line"
    base = typeset(vec2(400, 200), [(_font(tid), INK, text)])
    tall = typeset(vec2(400, 200), [(_font(tid, line_height=40.0), INK, text)])
    assert tall.fonts[0].line_height == pytest.approx(40.0)

    def line_tops(arr):
        tops = {}
        for g in arr.arranged_glyphs:
            tops.setdefault(g.line_index, g.pos.y)
        return tops

    bt, tt = line_tops(base), line_tops(tall)
    assert tt[1] - tt[0] == pytest.approx(40.0, abs=0.6)
    assert (tt[1] - tt[0]) > (bt[1] - bt[0])


def test_decorations_carried_into_spans(tid):
    """tfontutils.nim:321-337 — underline/strikethrough flags on the FigFont
    reach the arrangement's per-span GlyphFont."""
    f_u = _font(tid, underline=True)
    f_s = _font(tid, strikethrough=True)
    arr = typeset(vec2(400, 60), [(f_u, INK, "under "), (f_s, INK, "strike")])
    assert arr.fonts[0].underline and not arr.fonts[0].strikethrough
    assert arr.fonts[1].strikethrough and not arr.fonts[1].underline


def test_hard_breaks_render_no_newline_glyphs(tid):
    """tfontutils.nim:887-934 — newline runes produce no drawable glyphs but
    still advance lines, and an empty hard-break line is preserved."""
    arr = typeset(vec2(400, 200), [(_font(tid), INK, "aa\n\nbb")])
    drawable = [g for g in arr.arranged_glyphs if not g.is_whitespace]
    assert all(g.rune != "\n" for g in drawable)
    lines = {g.line_index for g in drawable}
    # 'aa' on line 0, 'bb' on line 2 — the empty line 1 is preserved
    assert lines == {0, 2}


def test_cjk_wraps_without_whitespace(tid):
    """tfontutils.nim:1093-1125 — CJK runs break between ideographs even with
    no spaces: a narrow box must yield multiple lines."""
    text = "漢字測試文字換行處理"  # 10 ideographs
    arr = typeset(vec2(80, 300), [(_font(tid, size=20.0), INK, text)], wrap=True)
    lines = {g.line_index for g in arr.arranged_glyphs}
    assert len(lines) >= 2
    # every glyph stays inside the box width
    for g in arr.arranged_glyphs:
        assert g.pos.x <= 80.0 + 1e-3


def test_wrapped_hebrew_lines_stay_logical_order(tid):
    """tfontutils.nim:949-1021 — wrapping an RTL paragraph keeps LINE order
    logical (first logical words on the first line) while each line is
    visually right-aligned RTL."""
    words = ["שלום", "עולם",
             "בדיקה", "שורה"]
    text = " ".join(words)
    arr = typeset(vec2(90, 200), [(_font(tid, size=16.0), INK, text)], wrap=True)
    drawable = [g for g in arr.arranged_glyphs if not g.is_whitespace]
    lines = sorted({g.line_index for g in drawable})
    assert len(lines) >= 2
    # the glyphs whose SOURCE is the first word sit on the first line
    first_word_glyphs = [g for g in drawable if g.source.rune_start < len(words[0])]
    assert first_word_glyphs and all(g.line_index == lines[0] for g in first_word_glyphs)
    # within the first line, source order runs right-to-left visually
    line0 = [g for g in drawable if g.line_index == lines[0]]
    by_source = sorted(line0, key=lambda g: g.source.rune_start)
    xs = [g.pos.x for g in by_source]
    assert xs == sorted(xs, reverse=True)


def test_bottom_aligned_wrapped_text_stays_in_bounds(tid):
    """tfontutils.nim:1053-1067 — bottom-aligned wrapped text must not
    escape the layout box."""
    text = "a run of words that wraps across several lines in a small box"
    arr = typeset(vec2(140, 120), [(_font(tid, size=14.0), INK, text)],
                  v_align=VAlign.Bottom, wrap=True)
    ys = [g.pos.y for g in arr.arranged_glyphs if not g.is_whitespace]
    assert max(ys) <= 120.0 + 1e-3
    assert min(ys) >= 0.0


def test_glyph_hash_separates_cache_identities(tid):
    """tfontutils.nim:1267-1330 — the glyph-cache hash distinguishes lcd
    filtering, subpixel variant and glyph id (same scheme as
    fontglyphs.nim:54-59)."""
    from figdraw_tpu.text.glyphs import glyph_hash

    base = glyph_hash(1234, 55)
    assert glyph_hash(1234, 55, lcd=True) != base
    assert glyph_hash(1234, 55, variant=3) != base
    assert glyph_hash(1234, 56) != base
    assert glyph_hash(1234, 55) == base  # deterministic


def test_font_ref_copies_share_retained_handle(tid):
    """tfontutils.nim:1522-1569 — multiple FontRefs for one font id share the
    retained handle; only the LAST close is a final release."""
    from figdraw_tpu.resources import FontRef, ImageMessageBus, ImageMsgKind

    bus = ImageMessageBus()
    sub = bus.subscribe()
    a = FontRef(987654, bus=bus)
    b = FontRef(987654, bus=bus)
    a.close()
    b.close()
    finals = []
    for msg in sub.drain():
        if msg.kind == ImageMsgKind.ReleaseFont:
            finals.append(msg.final_release)
    assert finals == [False, True]


def test_typeface_ids_distinguish_bytes_and_reuse_aliases(tmp_path):
    """tfontutils.nim:224-242 — the registry id is a content hash: the same
    bytes under two names share an id; different bytes under one name don't."""
    from figdraw_tpu.text import typefaces as tf

    p1 = tmp_path / "A.ttf"
    p2 = tmp_path / "B.ttf"
    shutil.copyfile(DEJAVU, p1)
    shutil.copyfile(DEJAVU, p2)
    id1 = tf.load_typeface(str(p1))
    id2 = tf.load_typeface(str(p2))
    assert id1 == id2  # identical bytes → one typeface id
    serif = "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf"
    if os.path.exists(serif):
        p3 = tmp_path / "C.ttf"
        shutil.copyfile(serif, p3)
        assert tf.load_typeface(str(p3)) != id1


def test_load_typeface_prefers_data_dir(tmp_path):
    """tfontutils.nim:1605-1645 — figDataDir wins over system fonts for a
    bare name; unknown names fall through to the system search."""
    from figdraw_tpu.text import typefaces as tf

    data = tmp_path / "data"
    data.mkdir()
    shutil.copyfile(DEJAVU, data / "MyFace.ttf")
    old = tf.fig_data_dir()
    tf.set_fig_data_dir(str(data))
    try:
        tid = tf.load_typeface("MyFace.ttf")
        assert tf.get_typeface(tid) is not None
        # system fallback still works for a real system font name
        sys_id = tf.load_typeface("DejaVuSans.ttf")
        assert tf.get_typeface(sys_id) is not None
    finally:
        tf.set_fig_data_dir(old)


def test_typeset_preserves_gradient_span_fills(tid):
    """tfontutils.nim:1388-1408 — a gradient Fill on a span survives into
    span_colors and the glyphs' fill."""
    from figdraw_tpu import linear
    from figdraw_tpu.fill import FillGradientAxis, FillKind

    grad = linear(rgba(255, 0, 0, 255), rgba(0, 0, 255, 255),
                  axis=FillGradientAxis.fgaY)
    arr = typeset(vec2(300, 40), [(_font(tid), grad, "gradient")])
    assert arr.span_colors[0].kind == FillKind.flLinear2
    g = next(g for g in arr.arranged_glyphs if not g.is_whitespace)
    assert g.fill is not None and g.fill.kind == FillKind.flLinear2


def test_raster_font_ids_ignore_shaping_only_settings(tid):
    """tfontutils.nim:280-296 — kerning/features/lineHeight only affect
    shaping; the raster FontId keys on typeface, size, case, variations and
    ui scale, so toggling shaping settings must not fragment the glyph
    cache."""
    from figdraw_tpu.text.typefaces import FigFont, FontFeature, register_font

    base = FigFont(typeface_id=tid, size=16.0)
    a = register_font(base)
    b = register_font(FigFont(typeface_id=tid, size=16.0,
                              features=(FontFeature("liga", 0),),
                              no_kerning_adjustments=True,
                              line_height=40.0))
    assert a == b
    # raster-relevant changes DO split the id
    assert register_font(FigFont(typeface_id=tid, size=17.0)) != a
    assert register_font(base, ui_scale=2.0) != a


def test_typeface_lookup_unknown_raises(tid):
    """tfontutils.nim:220-223 — unknown ids raise instead of returning junk."""
    from figdraw_tpu.text.typefaces import get_fig_font, get_typeface

    with pytest.raises(KeyError):
        get_fig_font(0xDEAD_BEEF_0001)
    assert get_typeface(tid) is not None


def test_typeface_caches_isolated_across_threads(tid):
    """tfontutils.nim:254-279 — shaping from worker threads must not corrupt
    per-thread caches: concurrent typesets of the same text produce
    identical glyph streams."""
    import threading

    from figdraw_tpu.text.layout import typeset

    def shape():
        f = FigFont(typeface_id=tid, size=15.0)
        arr = typeset(vec2(300, 24), [(f, INK, "thread safety AV fi")])
        return [(g.glyph_id, round(g.pos.x, 4)) for g in arr.arranged_glyphs]

    expected = shape()
    results = [None] * 6
    def worker(i):
        results[i] = shape()
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r == expected for r in results)


# --- dynamic font fallback resolver (common/fontfallbacks.nim) ------------------


def test_font_fallback_resolver(tid):
    """fontfallbacks.nim:4-25: a per-thread resolver is consulted when the
    font and its static fallbacks miss a codepoint; returned typefaces are
    retried (and reused for later characters), misses are memoized."""
    from figdraw_tpu.text.typefaces import (
        FontFallbackRequest, font_fallback_resolver, get_typeface,
        load_typeface, set_font_fallback_resolver,
    )

    deva_path = "/root/reference/examples/fonts/NotoSansDevanagari-wdth-wght.ttf"
    deva_id = load_typeface(deva_path)
    calls = []

    def resolver(req: FontFallbackRequest):
        calls.append(req)
        if req.script == "Deva":
            return [deva_id]
        return []

    assert font_fallback_resolver() is None
    set_font_fallback_resolver(resolver)
    try:
        font = _font(tid)
        # DejaVu has no Devanagari coverage; क and म must resolve via the
        # resolver-provided Noto face, consulted ONCE for the first miss and
        # reused for the second (resolved typefaces persist per typeset)
        arr = typeset(vec2(400, 100), [(font, INK, "aकमb")])
        by_rune = {g.rune: g for g in arr.arranged_glyphs}
        deva_tf = get_typeface(deva_id)
        for ch in "कम":
            g = by_rune[ch]
            assert g.glyph_id == deva_tf.glyph_id(ord(ch)) and g.glyph_id != 0
        assert by_rune["a"].glyph_id != 0  # primary stays DejaVu
        assert len(calls) == 1
        assert calls[0].script == "Deva"
        assert calls[0].codepoints == (ord("क"),)
        assert calls[0].primary_typeface_id == tid

        # unresolvable codepoints ask the resolver once, then memoize the miss
        calls.clear()
        typeset(vec2(400, 100), [(font, INK, "\U00013000\U00013000")])  # hieroglyph
        assert len(calls) == 1
    finally:
        set_font_fallback_resolver(None)
    assert font_fallback_resolver() is None
