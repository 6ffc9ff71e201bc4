"""Shaping pinned against the reference's own bundled fonts.

The reference demos all four of these faces through HarfBuzz
(examples/surfer_text_shaping_demo.nim:19-22, siwin_genesis_shaping.nim:27):
NotoNaskhArabic (ccmp skeleton+dot decomposition, masked positional forms,
rlig lam pairs, mark filtering sets), NotoSansHebrew (niqqud mark-to-base),
NotoSansDevanagari (Indic syllables: akhn/rkrf conjuncts, reph, pre-base
matra reordering), FiraCode (calt programming ligatures). The glyph streams
pinned here are behavior contracts, verified visually against the rendered
demo (examples/text_shaping_demo.py) — they are what HarfBuzz-grade shaping
must produce from these fonts' own tables.
"""

import pytest

from figdraw_tpu import fill, rgba, vec2
from figdraw_tpu.text.layout import typeset
from figdraw_tpu.text.shaper import get_shaper
from figdraw_tpu.text.typefaces import (
    FigFont, FontFeature, FontVariation, get_typeface, load_typeface,
)

FONT_DIR = "/root/reference/examples/fonts"
INK = fill(rgba(0, 0, 0, 255))


def _tf(name):
    tid = load_typeface(f"{FONT_DIR}/{name}")
    return tid, get_typeface(tid)


@pytest.fixture(scope="module")
def firacode():
    return _tf("FiraCode-wght.ttf")


@pytest.fixture(scope="module")
def naskh():
    return _tf("NotoNaskhArabic-wght.ttf")


@pytest.fixture(scope="module")
def hebrew():
    return _tf("NotoSansHebrew-wdth-wght.ttf")


@pytest.fixture(scope="module")
def devanagari():
    return _tf("NotoSansDevanagari-wdth-wght.ttf")


def _shape(tf, text, features=None, lang=None):
    sh = get_shaper(tf)
    cps = [ord(c) for c in text]
    names = [tf.glyph_name(tf.glyph_id(cp)) for cp in cps]
    clusters = [(i, i + 1) for i in range(len(cps))]
    out, oc, _ = sh.substitute_ex(names, clusters, features, lang, cps=cps)
    return out, oc


def _typeset_names(tid, tf, text, size=24.0, **font_kw):
    f = FigFont(typeface_id=tid, size=size, **font_kw)
    arr = typeset(vec2(2000, 60), [(f, INK, text)])
    return [tf.glyph_name(g.glyph_id) for g in arr.arranged_glyphs], arr


# --- FiraCode: calt programming ligatures -------------------------------------

def test_firacode_calt_ligatures(firacode):
    """FiraCode 6.x shapes arrows as .seq building blocks and symbols as
    spacer+liga pairs, all through calt chains (341 GSUB lookups)."""
    _tid, tf = firacode
    cases = {
        "=>": ["equal_start.seq", "greater_equal_end.seq"],
        "->": ["hyphen_start.seq", "greater_hyphen_end.seq"],
        "!=": ["exclam.spacer", "exclam_equal.liga"],
        "===": ["equal.spacer", "equal.spacer", "equal_equal_equal.liga"],
        "<=": ["less.spacer", "less_equal.liga"],
        "|>": ["bar.spacer", "bar_greater.liga"],
        "::": ["colon.spacer", "colon_colon.liga"],
        "www": ["w.spacer", "w.spacer", "w_w_w.liga"],
        "&&": ["ampersand.spacer", "ampersand_ampersand.liga"],
    }
    for text, want in cases.items():
        got, _ = _shape(tf, text)
        assert got == want, (text, got)
    # spacers keep their own clusters (calt singles, not GSUB-4 ligatures)
    got, clusters = _shape(tf, "!=")
    assert clusters == [(0, 1), (1, 2)]


def test_firacode_calt_toggle_and_monospace(firacode):
    """FigFont.features disables calt; every glyph keeps the monospace
    advance (spacers and .liga glyphs included)."""
    tid, tf = firacode
    names, arr = _typeset_names(tid, tf, "a => b")
    assert "greater_equal_end.seq" in names
    advances = {round(g.advance.x, 3) for g in arr.arranged_glyphs}
    assert len(advances) == 1  # monospace: one advance for all glyphs
    f_off = FigFont(typeface_id=tid, size=24.0,
                    features=(FontFeature("calt", 0),))
    arr2 = typeset(vec2(2000, 60), [(f_off, INK, "=>")])
    assert [tf.glyph_name(g.glyph_id) for g in arr2.arranged_glyphs] == \
        ["equal", "greater"]


def test_firacode_wght_variation(firacode):
    """The wght axis instances different outlines (demo uses wght 520,
    surfer_text_shaping_demo.nim:101); monospace advances stay put."""
    _tid, tf = firacode
    gid = tf.glyph_id(ord("a"))
    assert tf.is_variable()
    assert tf.var_advance(gid, (FontVariation("wght", 700.0),)) == \
        tf.advance(gid)
    p_reg = tf.glyph_path(gid)
    p_bold = tf.glyph_path(gid, (FontVariation("wght", 700.0),))
    assert p_reg != p_bold  # instancing actually moved outline points


# --- Noto Naskh Arabic: skeleton decomposition + masked positional forms ------

def test_naskh_positional_forms(naskh):
    """ccmp decomposes letters into skeleton+dot marks, then the masked
    init/medi/fina stages pick forms per the joining analysis. Noto Naskh
    shares GSUB lookup 4 between init and medi — only HarfBuzz-style
    per-position feature masks shape this font correctly."""
    _tid, tf = naskh
    got, _ = _shape(tf, "محمد")
    assert got == ["uni0645.init", "uni062D.medi", "uni0645.medi",
                   "uni062F.fina"], got
    # beh decomposes to skeleton + dot-below, and the SKELETON takes .init
    got, _ = _shape(tf, "بسم")
    assert got == ["uni066E.init", "dotbelowar", "uni0633.medi",
                   "uni0645.fina"], got
    # teh: two dots above the medial tooth; jeem after alef stays isolated
    got, _ = _shape(tf, "يحتاج")
    assert got == ["uni066E.init.wide", "twodotshorizontalbelowar",
                   "uni062D.medi", "uni066E.medi.wide",
                   "twodotshorizontalabovear", "uni0627.fina",
                   "uni062D", "dotcenterar"], got


def test_naskh_lam_alef_rlig(naskh):
    """Naskh builds lam-alef from rlig PAIR forms (not one ligature glyph);
    harakat (transparent marks) do not break the pair."""
    _tid, tf = naskh
    got, _ = _shape(tf, "لا")
    assert got == ["uni0644.init.rlig", "uni0627.fina.rlig"], got
    got, _ = _shape(tf, "لَا")  # fatha between lam and alef
    assert got == ["uni0644.init.rlig", "uni064E", "uni0627.fina.rlig"], got


def test_naskh_rtl_mark_anchoring(naskh):
    """End-to-end: dots anchor INSIDE their base's advance width. In an RTL
    run the visual reversal parks the mark's draw cursor at the base origin,
    so offset.x must be the bare anchor delta (this pin caught the LTR
    pen-pullback being wrongly applied to RTL runs)."""
    tid, tf = naskh
    names, arr = _typeset_names(tid, tf, "بسم", size=26.0)
    assert names[1] == "dotbelowar"
    base, dot = arr.arranged_glyphs[0], arr.arranged_glyphs[1]
    assert dot.advance.x == 0.0
    assert 0.0 <= dot.offset.x <= base.advance.x
    # and the pair really was shaped at distinct anchors per component
    sh = get_shaper(tf)
    assert sh.mark_attach("uni066E.init", "dotbelowar") is not None


def test_naskh_mark_filtering_sets(naskh):
    """10 of Naskh's GSUB lookups carry UseMarkFilteringSet (flag 0x10);
    the GDEF MarkGlyphSets must be loaded for them to apply."""
    _tid, tf = naskh
    sh = get_shaper(tf)
    assert sh._mark_glyph_sets, "GDEF v1.2 MarkGlyphSets not parsed"
    gsub = tf._tt["GSUB"].table
    flagged = [lk for lk in gsub.LookupList.Lookup
               if (lk.LookupFlag or 0) & 0x10]
    assert len(flagged) >= 10
    # every flagged lookup resolves to a real filter set, not IgnoreMarks
    for lk in flagged[:3]:
        skip = sh._lookup_skip(lk)
        assert skip[1] is not None and 3 not in skip[0]


def test_naskh_wght_variation(naskh):
    """Naskh's wght axis (demo: 560) changes advances."""
    _tid, tf = naskh
    gid = tf.glyph_id(0x0645)  # meem
    assert tf.is_variable()
    assert tf.var_advance(gid, (FontVariation("wght", 700.0),)) != \
        tf.advance(gid)


# --- Noto Sans Hebrew: niqqud stacking -----------------------------------------

def test_hebrew_niqqud_anchoring(hebrew):
    """Niqqud (qamats, shin-dot, holam) anchor with zero advance at
    per-mark anchors; bases lay out right-to-left."""
    tid, tf = hebrew
    names, arr = _typeset_names(tid, tf, "שָׁלוֹם", size=30.0)
    assert names == ["uni05E9", "uni05B8", "uni05C1", "uni05DC", "uni05D5",
                     "uni05B9", "uni05DD"], names
    g = arr.arranged_glyphs
    assert g[1].advance.x == 0.0 and g[2].advance.x == 0.0
    # qamats (below) and shin-dot (above) take DIFFERENT anchors on shin
    assert abs(g[1].offset.x - g[2].offset.x) > 0.5
    # marks land inside the shin's advance width (RTL anchor convention)
    assert 0.0 <= g[1].offset.x <= g[0].advance.x
    # RTL: base positions strictly decrease
    bases = [gl.pos.x for gl in g if gl.advance.x > 0]
    assert bases == sorted(bases, reverse=True)


def test_hebrew_dagesh_stacking(hebrew):
    """Sheva + dagesh both attach to bet with distinct offsets (the
    genesis_shaping demo text, siwin_genesis_shaping.nim:42)."""
    tid, tf = hebrew
    names, arr = _typeset_names(tid, tf, "בְּרֵאשִׁית", size=30.0)
    assert names[0] == "uni05D1"  # bet
    assert {names[1], names[2]} == {"uni05B0", "uni05BC"}  # sheva, dagesh
    g = arr.arranged_glyphs
    assert g[1].advance.x == 0.0 and g[2].advance.x == 0.0
    assert (g[1].offset.x, g[1].offset.y) != (g[2].offset.x, g[2].offset.y)


def test_hebrew_wdth_wght_variations(hebrew):
    """Both axes of the wdth+wght variable font instance advances (demo:
    wght 560 / wdth 96, surfer_text_shaping_demo.nim:117)."""
    _tid, tf = hebrew
    gid = tf.glyph_id(0x05E9)
    narrow = tf.var_advance(gid, (FontVariation("wdth", 62.5),))
    bold = tf.var_advance(gid, (FontVariation("wght", 700.0),))
    assert narrow < tf.advance(gid) < bold


# --- Noto Sans Devanagari: Indic syllable shaping -------------------------------

def test_devanagari_reph(devanagari):
    """कर्म: syllable-initial Ra+halant becomes reph (rphf) and reorders to
    AFTER the base; र्कं additionally ligates reph with anusvara (abvs)."""
    _tid, tf = devanagari
    got, _ = _shape(tf, "कर्म")
    assert got == ["uni0915", "uni092E", "uni0930094D"], got
    got, _ = _shape(tf, "र्क")
    assert got == ["uni0915", "uni0930094D"], got
    got, _ = _shape(tf, "र्कं")  # reph + anusvara ligature via abvs
    assert got == ["uni0915", "uni0930094D0902"], got


def test_devanagari_conjuncts_and_matra(devanagari):
    """क्षत्रिय: akhn forms the kssa ligature, rkrf the t+ra conjunct, and
    the pre-base i-matra reorders to the FRONT of its syllable (a width-
    matched contextual variant selected by pres)."""
    _tid, tf = devanagari
    got, _ = _shape(tf, "क्षत्रिय")
    assert got == ["uni0915094D0937", "uni093F.04", "uni0924094D0930",
                   "uni092F"], got
    got, _ = _shape(tf, "कि")
    assert got == ["uni093F.04", "uni0915"], got
    got, _ = _shape(tf, "क्र")  # ka + rakar as one rkrf ligature
    assert got == ["uni0915094D0930"], got


def test_devanagari_half_forms(devanagari):
    """Pre-base consonants with halant take half forms (half feature),
    exercised by नमस्ते and हिन्दी (the demo body text words)."""
    _tid, tf = devanagari
    got, _ = _shape(tf, "नमस्ते")
    assert got == ["uni0928", "uni092E", "uni0938094D", "uni0924",
                   "uni0947"], got
    got, _ = _shape(tf, "हिन्दी")
    assert got == ["uni093F.03", "uni0939", "uni0928094D", "uni0926",
                   "uni0940"], got


def test_devanagari_cluster_merge_on_reorder(devanagari):
    """Reordered syllables merge their source clusters (HarfBuzz behavior):
    caret/selection treat the syllable as one unit."""
    _tid, tf = devanagari
    got, clusters = _shape(tf, "कर्म")
    # reph moved → the syllable र्म (sources 1..4) is one merged cluster
    assert clusters[1] == clusters[2] == (1, 4)
    assert clusters[0] == (0, 1)  # untouched क stays its own cluster


def test_devanagari_reph_mark_positioning(devanagari):
    """End-to-end: the reph glyph anchors above the base via abvm with zero
    advance (abvm/blwm are first-class mark features)."""
    tid, tf = devanagari
    names, arr = _typeset_names(tid, tf, "कर्म", size=30.0)
    assert names == ["uni0915", "uni092E", "uni0930094D"], names
    reph = arr.arranged_glyphs[2]
    assert reph.advance.x == 0.0
    sh = get_shaper(tf)
    assert sh.is_mark("uni0930094D")
    assert sh.mark_attach("uni092E", "uni0930094D") is not None


def test_devanagari_mixed_run(devanagari):
    """Devanagari syllables and Latin stretches coexist in one segment
    (the demo's mixed-fallback line)."""
    _tid, tf = devanagari
    got, _ = _shape(tf, "कि ab")
    assert got[:2] == ["uni093F.04", "uni0915"]
    assert got[2:] == ["space", "a", "b"]


def test_firacode_stylistic_sets(firacode):
    """FiraCode's cv/ss/zero/onum features toggle through
    FigFont.features-style tag sets (value>0 enables beyond the defaults)."""
    _tid, tf = firacode
    from figdraw_tpu.text.shaper import DEFAULT_GSUB_FEATURES

    base = frozenset(DEFAULT_GSUB_FEATURES)
    assert _shape(tf, "0")[0] == ["zero"]
    assert _shape(tf, "0", base | {"zero"})[0] == ["zero.zero"]  # slashed
    assert _shape(tf, "r", base | {"ss01"})[0] == ["r.ss01"]
    assert _shape(tf, "123", base | {"onum"})[0] == \
        ["one.tosf", "two.tosf", "three.tosf"]


def test_devanagari_joiner_semantics(devanagari):
    """ZWJ after halant requests the HALF form; ZWNJ blocks both conjunct
    and half form (explicit visible halant) — HarfBuzz joiner semantics.
    The joiner glyphs are zero-advance in the font, so they ride invisibly."""
    _tid, tf = devanagari
    got, _ = _shape(tf, "क्ष")          # plain: akhn conjunct
    assert got == ["uni0915094D0937"], got
    got, _ = _shape(tf, "क्‍ष")     # ZWJ: half form of ka
    assert got == ["uni0915094D", "uni200D", "uni0937"], got
    got, _ = _shape(tf, "क्‌ष")     # ZWNJ: full ka + visible halant
    assert got == ["uni0915", "uni094D", "uni200C", "uni0937"], got
    assert tf.advance(tf._name_to_gid["uni200C"]) == 0
