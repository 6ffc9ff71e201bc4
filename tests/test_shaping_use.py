"""USE-class script shaping: Khmer coeng subscripts/pre-base reordering and
Myanmar kinzi/medials, pinned on synthetic feaLib-built fonts (no Khmer or
Myanmar faces ship in this image; the fonts below carry the exact GSUB
structure Noto Khmer/Myanmar use — masked pref/blwf/abvf/pstf/cfar and
rphf/pref/blwf/pstf lookups under the khmr/mym2 scripts).

Reference parity target: HarfBuzz's khmer/myanmar shapers, which the
reference reaches through textbackends/harfbuzzy.nim:395-684. Glyph streams
are behavior contracts like tests/test_shaping_reference_fonts.py."""

import pytest

from figdraw_tpu import fill, rgba, vec2
from figdraw_tpu.text import use
from figdraw_tpu.text.layout import typeset
from figdraw_tpu.text.shaper import get_shaper
from figdraw_tpu.text.typefaces import FigFont, get_typeface, load_typeface

# Khmer codepoints
KA, TA, SA, RO = 0x1780, 0x178F, 0x179F, 0x179A
COENG, E, AE, II, ROBAT = 0x17D2, 0x17C1, 0x17C2, 0x17B8, 0x17CC
# Myanmar codepoints
MKA, NGA, ASAT, VIRAMA = 0x1000, 0x1004, 0x103A, 0x1039
MEDYA, MEDRA, MEDWA, ME = 0x103B, 0x103C, 0x103D, 0x1031


def _build_font(tmp_path, filename, cmap, formed, fea):
    from fontTools.feaLib.builder import addOpenTypeFeaturesFromString
    from fontTools.fontBuilder import FontBuilder
    from fontTools.pens.ttGlyphPen import TTGlyphPen

    names = [".notdef"] + list(cmap.values()) + list(formed)
    fb = FontBuilder(1000, isTTF=True)
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap(cmap)
    glyf = {}
    for g in names:
        pen = TTGlyphPen(None)
        pen.moveTo((50, 0)); pen.lineTo((450, 0))
        pen.lineTo((450, 700)); pen.lineTo((50, 700)); pen.closePath()
        glyf[g] = pen.glyph()
    fb.setupGlyf(glyf)
    fb.setupHorizontalMetrics({g: (500, 50) for g in names})
    fb.setupHorizontalHeader(ascent=800, descent=-200)
    fb.setupNameTable({"familyName": "UseTest", "styleName": "Regular"})
    fb.setupOS2(sTypoAscender=800, sTypoDescender=-200)
    fb.setupPost()
    addOpenTypeFeaturesFromString(fb.font, fea)
    path = str(tmp_path / filename)
    fb.font.save(path)
    return path


@pytest.fixture(scope="module")
def khmer_tid(tmp_path_factory):
    cmap = {
        KA: "ka", TA: "ta", SA: "sa", RO: "ro", COENG: "coeng",
        E: "e", AE: "ae", II: "ii", ROBAT: "robat",
    }
    formed = ["ro.pre", "ka.sub", "sa.sub", "ta.sub", "ka.sub.cfar",
              "robat.abv"]
    fea = """
        languagesystem DFLT dflt;
        languagesystem khmr dflt;
        feature pref { sub coeng ro by ro.pre; } pref;
        feature blwf {
            sub coeng ka by ka.sub;
            sub coeng sa by sa.sub;
            sub ta by ta.sub;   # single sub: fires ONLY at masked positions
        } blwf;
        feature abvf { sub robat by robat.abv; } abvf;
        feature cfar { sub ka.sub by ka.sub.cfar; } cfar;
    """
    path = _build_font(tmp_path_factory.mktemp("khmer"), "khmertest.ttf",
                       cmap, formed, fea)
    return load_typeface(path)


@pytest.fixture(scope="module")
def myanmar_tid(tmp_path_factory):
    cmap = {
        MKA: "ka", NGA: "nga", ASAT: "asat", VIRAMA: "virama",
        MEDYA: "medya", MEDRA: "medra", MEDWA: "medwa", ME: "e",
    }
    formed = ["kinzi", "medra.pre", "medwa.blw", "medya.pst", "ka.stack"]
    fea = """
        languagesystem DFLT dflt;
        languagesystem mym2 dflt;
        feature rphf { sub nga asat virama by kinzi; } rphf;
        feature pref { sub medra by medra.pre; } pref;
        feature blwf {
            sub medwa by medwa.blw;
            sub virama ka by ka.stack;
        } blwf;
        feature pstf { sub medya by medya.pst; } pstf;
    """
    path = _build_font(tmp_path_factory.mktemp("myanmar"), "myanmartest.ttf",
                       cmap, formed, fea)
    return load_typeface(path)


def _shape(tid, cps):
    tf = get_typeface(tid)
    sh = get_shaper(tf)
    names = [tf.glyph_name(tf.glyph_id(cp)) for cp in cps]
    clusters = [(k, k + 1) for k in range(len(cps))]
    out_n, out_c = sh.substitute(names, clusters, cps=cps)
    return out_n, out_c


# --- Khmer ------------------------------------------------------------------------

def test_khmer_syllable_segmentation():
    # srei (SA COENG RO II) is one syllable; two bases split
    cps = [SA, COENG, RO, II, KA, E]
    assert use.khmer_next_syllable(cps, 0) == 4
    assert use.khmer_next_syllable(cps, 4) == 6
    # trailing coeng pair after a vowel (cfar shape) stays in the syllable
    cps2 = [KA, COENG, RO, AE, COENG, KA]
    assert use.khmer_next_syllable(cps2, 0) == 6


def test_khmer_coeng_ro_prebase_reordering(khmer_tid):
    # srei: SA + coeng+RO + II -> coeng-ro forms ro.pre and moves BEFORE
    # the base; II stays post-base. HarfBuzz order: [ro.pre, sa, ii].
    names, clusters = _shape(khmer_tid, [SA, COENG, RO, II])
    assert names == ["ro.pre", "sa", "ii"], names
    # reordered syllable merges clusters (HarfBuzz semantics)
    assert clusters == [(0, 4)] * 3, clusters


def test_khmer_prebase_vowel_leftmost(khmer_tid):
    # srae: SA + coeng+RO + AE -> vowel reorders leftmost, then coeng-ro,
    # then base: [ae, ro.pre, sa]
    names, _ = _shape(khmer_tid, [SA, COENG, RO, AE])
    assert names == ["ae", "ro.pre", "sa"], names
    # vowel E alone (no coeng) still reorders: [e, ka]
    names, _ = _shape(khmer_tid, [KA, E])
    assert names == ["e", "ka"], names


def test_khmer_coeng_subscript(khmer_tid):
    # coeng+KA ligates to the subscript form; no reordering
    names, clusters = _shape(khmer_tid, [KA, COENG, SA])
    assert names == ["ka", "sa.sub"], names
    # ligated pair keeps its merged source cluster; base untouched
    assert clusters == [(0, 1), (1, 3)], clusters


def test_khmer_blwf_mask_blocks_base(khmer_tid):
    # blwf carries a SINGLE substitution (ta -> ta.sub) that would mangle
    # every base TA if applied globally; the positional mask restricts it to
    # the coeng-following consonant (both pair members are tagged, but the
    # lookup only covers "ta").
    names, _ = _shape(khmer_tid, [TA, COENG, TA])
    assert names == ["ta", "coeng", "ta.sub"], names
    # a bare TA TA never fires it
    names, _ = _shape(khmer_tid, [TA, TA])
    assert names == ["ta", "ta"], names


def test_khmer_cfar_after_coeng_ro(khmer_tid):
    # coeng+KA AFTER a coeng+RO carries cfar: the subscript restyles, and
    # the coeng-ro still reorders to the front
    names, _ = _shape(khmer_tid, [KA, COENG, RO, COENG, KA])
    assert names == ["ro.pre", "ka", "ka.sub.cfar"], names
    # without a preceding coeng-ro the same pair is a plain subscript
    names, _ = _shape(khmer_tid, [KA, COENG, KA])
    assert names == ["ka", "ka.sub"], names


def test_khmer_robat_abvf(khmer_tid):
    names, _ = _shape(khmer_tid, [KA, ROBAT])
    assert names == ["ka", "robat.abv"], names


def test_khmer_end_to_end_typeset(khmer_tid):
    # the full pipeline (typeset -> shaper -> arranged glyphs) emits the
    # reordered stream
    tf = get_typeface(khmer_tid)
    f = FigFont(typeface_id=khmer_tid, size=20.0)
    text = "".join(chr(c) for c in [SA, COENG, RO, II])
    arr = typeset(vec2(1000, 40), [(f, fill(rgba(0, 0, 0, 255)), text)])
    names = [tf.glyph_name(g.glyph_id) for g in arr.arranged_glyphs]
    assert names == ["ro.pre", "sa", "ii"], names


# --- Myanmar ----------------------------------------------------------------------

def test_myanmar_syllable_segmentation():
    cps = [NGA, ASAT, VIRAMA, MKA, MEDRA, ME, MKA, ME]
    assert use.myanmar_has_kinzi(cps, 0)
    assert use.myanmar_next_syllable(cps, 0) == 6
    assert use.myanmar_next_syllable(cps, 6) == 8
    # virama+C consonant stack stays in one syllable
    cps2 = [MKA, VIRAMA, MKA, ME]
    assert use.myanmar_next_syllable(cps2, 0) == 4


def test_myanmar_kinzi_reorders_after_base(myanmar_tid):
    # NGA+asat+virama encoded BEFORE the base renders ABOVE it: the kinzi
    # glyph (formed by rphf) moves to after the base consonant cluster; the
    # vowel E and medial Ra move to the front (E leftmost).
    names, clusters = _shape(myanmar_tid, [NGA, ASAT, VIRAMA, MKA, MEDRA, ME])
    assert names == ["e", "medra.pre", "ka", "kinzi"], names
    assert clusters == [(0, 6)] * 4, clusters


def test_myanmar_kinzi_simple(myanmar_tid):
    names, _ = _shape(myanmar_tid, [NGA, ASAT, VIRAMA, MKA])
    assert names == ["ka", "kinzi"], names


def test_myanmar_consonant_stack(myanmar_tid):
    # virama+KA ligates to the stacked form below the base (blwf, masked)
    names, clusters = _shape(myanmar_tid, [MKA, VIRAMA, MKA])
    assert names == ["ka", "ka.stack"], names
    assert clusters == [(0, 1), (1, 3)], clusters


def test_myanmar_medials(myanmar_tid):
    # medial ya -> post form (pstf), medial wa -> below form (blwf), no
    # reordering for either
    names, _ = _shape(myanmar_tid, [MKA, MEDYA, MEDWA])
    assert names == ["ka", "medya.pst", "medwa.blw"], names


def test_myanmar_vowel_e_per_syllable(myanmar_tid):
    # E reorders within ITS syllable only
    names, _ = _shape(myanmar_tid, [MKA, ME, MKA, ME])
    assert names == ["e", "ka", "e", "ka"], names


def test_myanmar_kinzi_after_stack(myanmar_tid):
    # kinzi lands after the whole base cluster including a consonant stack:
    # [kinzi-triple, KA, virama, KA, E] -> [e, ka, ka.stack, kinzi]
    names, _ = _shape(myanmar_tid,
                      [NGA, ASAT, VIRAMA, MKA, VIRAMA, MKA, ME])
    assert names == ["e", "ka", "ka.stack", "kinzi"], names


def test_myanmar_end_to_end_typeset(myanmar_tid):
    tf = get_typeface(myanmar_tid)
    f = FigFont(typeface_id=myanmar_tid, size=20.0)
    text = "".join(chr(c) for c in [NGA, ASAT, VIRAMA, MKA, MEDRA, ME])
    arr = typeset(vec2(1000, 40), [(f, fill(rgba(0, 0, 0, 255)), text)])
    names = [tf.glyph_name(g.glyph_id) for g in arr.arranged_glyphs]
    assert names == ["e", "medra.pre", "ka", "kinzi"], names
