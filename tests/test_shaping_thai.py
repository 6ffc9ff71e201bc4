"""Thai/Lao shaping: the HarfBuzz Thai shaper's Uniscribe-compatible SARA AM
decomposition (hb-ot-shaper-thai.cc preprocess_text), pinned on synthetic
feaLib-built fonts (no Thai/Lao faces ship in this image). The reference
reaches this through HarfBuzz (textbackends/harfbuzzy.nim); glyph streams
are behavior contracts like tests/test_shaping_use.py.

Contract: U+0E33 SARA AM decomposes to U+0E4D NIKHAHIT + U+0E32 SARA AA and
the nikhahit moves backwards over contiguous preceding tone marks
(U+0E48-U+0E4B) so it renders above the base under the tones; Lao U+0EB3 is
the same with U+0ECD/U+0EB2/U+0EC8-U+0ECB. A font lacking the decomposition
glyphs keeps SARA AM as-is (HarfBuzz's has-glyph gate)."""

import numpy as np
import pytest

from figdraw_tpu import fill, rgba, vec2
from figdraw_tpu.text.layout import typeset
from figdraw_tpu.text.shaper import get_shaper
from figdraw_tpu.text.typefaces import FigFont, get_typeface, load_typeface

# Thai codepoints
KO, MAI_EK, MAI_THO = 0x0E01, 0x0E48, 0x0E49
MAITAIKHU, SARA_I = 0x0E47, 0x0E34
NIKHAHIT, SARA_AA, SARA_AM = 0x0E4D, 0x0E32, 0x0E33
# Lao codepoints
LKO, LMAI_EK, LNIGGAHITA, LAA, LAM = 0x0E81, 0x0EC8, 0x0ECD, 0x0EB2, 0x0EB3
LYAMAKKAN, LMAI_KON = 0x0ECE, 0x0EBB


def _build_font(tmp_path, filename, cmap):
    from fontTools.feaLib.builder import addOpenTypeFeaturesFromString
    from fontTools.fontBuilder import FontBuilder
    from fontTools.pens.ttGlyphPen import TTGlyphPen

    names = [".notdef"] + list(cmap.values())
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
    fb.setupNameTable({"familyName": "ThaiTest", "styleName": "Regular"})
    fb.setupOS2(sTypoAscender=800, sTypoDescender=-200)
    fb.setupPost()
    # a GPOS kern pair so get_shaper() builds (real Thai fonts carry GPOS
    # mark attachment; the decomposition itself is table-independent)
    addOpenTypeFeaturesFromString(
        fb.font, "languagesystem DFLT dflt;\n"
                 "feature kern { pos ko maiek -10; } kern;")
    path = str(tmp_path / filename)
    fb.font.save(path)
    return path


@pytest.fixture(scope="module")
def thai_tid(tmp_path_factory):
    cmap = {
        KO: "ko", MAI_EK: "maiek", MAI_THO: "maitho",
        MAITAIKHU: "maitaikhu", SARA_I: "sarai",
        NIKHAHIT: "nikhahit", SARA_AA: "saraaa", SARA_AM: "saraam",
        LKO: "ko.lao", LMAI_EK: "maiek.lao", LNIGGAHITA: "niggahita",
        LAA: "aa.lao", LAM: "am.lao", LYAMAKKAN: "yamakkan",
        LMAI_KON: "maikon",
    }
    path = _build_font(tmp_path_factory.mktemp("thai"), "thaitest.ttf", cmap)
    return load_typeface(path)


@pytest.fixture(scope="module")
def bare_tid(tmp_path_factory):
    # SARA AM exists but the decomposition glyphs do not
    cmap = {KO: "ko", MAI_EK: "maiek", SARA_AM: "saraam"}
    path = _build_font(tmp_path_factory.mktemp("thaibare"), "bare.ttf", cmap)
    return load_typeface(path)


def _shape(tid, cps):
    tf = get_typeface(tid)
    sh = get_shaper(tf)
    names = [tf.glyph_name(tf.glyph_id(cp)) for cp in cps]
    clusters = [(k, k + 1) for k in range(len(cps))]
    return sh.substitute(names, clusters, cps=cps)


def test_sara_am_decomposes(thai_tid):
    # KO + SARA AM -> [ko, nikhahit, saraaa]; no marks crossed, so the
    # decomposed combining pair merges with the PREVIOUS cluster, exactly
    # like hb-ot-shaper-thai.cc's merge_out_clusters(start-1, end)
    names, clusters = _shape(thai_tid, [KO, SARA_AM])
    assert names == ["ko", "nikhahit", "saraaa"], names
    assert clusters == [(0, 2), (0, 2), (0, 2)], clusters


def test_nikhahit_reorders_over_tone_marks(thai_tid):
    # KO + MAI EK + SARA AM: the nikhahit moves back over the tone mark —
    # [ko, nikhahit, maiek, saraaa]; the whole moved span INCLUDING the
    # appended SARA AA merges clusters (hb merge_out_clusters(start, end))
    names, clusters = _shape(thai_tid, [KO, MAI_EK, SARA_AM])
    assert names == ["ko", "nikhahit", "maiek", "saraaa"], names
    assert clusters == [(0, 1), (1, 3), (1, 3), (1, 3)], clusters
    # two stacked tones: still a single hop to before both
    names, _ = _shape(thai_tid, [KO, MAI_EK, MAI_THO, SARA_AM])
    assert names == ["ko", "nikhahit", "maiek", "maitho", "saraaa"], names


def test_nikhahit_crosses_all_above_base_marks(thai_tid):
    """HarfBuzz's is_tone_mark set covers every above-base mark, not just
    the four tones: MAITAIKHU and the above vowel SARA I must be crossed
    too (hb-ot-shaper-thai.cc)."""
    names, _ = _shape(thai_tid, [KO, MAITAIKHU, SARA_AM])
    assert names == ["ko", "nikhahit", "maitaikhu", "saraaa"], names
    names, _ = _shape(thai_tid, [KO, SARA_I, MAI_EK, SARA_AM])
    assert names == ["ko", "nikhahit", "sarai", "maiek", "saraaa"], names
    # a below-base/baseline glyph is NOT crossed: SARA AA stops the hop
    names, _ = _shape(thai_tid, [KO, SARA_AA, SARA_AM])
    assert names == ["ko", "saraaa", "nikhahit", "saraaa"], names


def test_tone_without_sara_am_untouched(thai_tid):
    names, clusters = _shape(thai_tid, [KO, MAI_EK, KO])
    assert names == ["ko", "maiek", "ko"], names
    assert clusters == [(0, 1), (1, 2), (2, 3)], clusters


def test_multiple_sara_am_per_run(thai_tid):
    # each AM decomposes within its own syllable; reordering never crosses
    # a non-tone glyph
    names, _ = _shape(thai_tid, [KO, SARA_AM, KO, MAI_EK, SARA_AM])
    assert names == ["ko", "nikhahit", "saraaa",
                     "ko", "nikhahit", "maiek", "saraaa"], names


def test_lao_am_decomposes(thai_tid):
    names, _ = _shape(thai_tid, [LKO, LMAI_EK, LAM])
    assert names == ["ko.lao", "niggahita", "maiek.lao", "aa.lao"], names
    # HarfBuzz's Lao set is the Thai set folded by +0x80: yamakkan
    # (0x0ECE -> 0x0E4E) IS crossed, MAI KON (0x0EBB -> 0x0E3B) is NOT
    names, _ = _shape(thai_tid, [LKO, LYAMAKKAN, LAM])
    assert names == ["ko.lao", "niggahita", "yamakkan", "aa.lao"], names
    names, _ = _shape(thai_tid, [LKO, LMAI_KON, LAM])
    assert names == ["ko.lao", "maikon", "niggahita", "aa.lao"], names


def test_tableless_font_still_decomposes(tmp_path_factory):
    """HarfBuzz's preprocess runs before any table lookup, so a legacy
    Thai font with NO GSUB/GPOS (get_shaper -> None) must still get the
    SARA AM decomposition on the typeset path (layout.py's no-shaper
    branch)."""
    from fontTools.fontBuilder import FontBuilder
    from fontTools.pens.ttGlyphPen import TTGlyphPen

    cmap = {KO: "ko", MAI_EK: "maiek", NIKHAHIT: "nikhahit",
            SARA_AA: "saraaa", SARA_AM: "saraam"}
    names = [".notdef"] + list(cmap.values())
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
    fb.setupNameTable({"familyName": "ThaiBareTables",
                       "styleName": "Regular"})
    fb.setupOS2(sTypoAscender=800, sTypoDescender=-200)
    fb.setupPost()
    path = str(tmp_path_factory.mktemp("thainotables") / "notables.ttf")
    fb.font.save(path)

    tid = load_typeface(path)
    tf = get_typeface(tid)
    assert get_shaper(tf) is None
    f = FigFont(typeface_id=tid, size=20.0)
    text = "".join(chr(c) for c in [KO, MAI_EK, SARA_AM])
    arr = typeset(vec2(1000, 40), [(f, fill(rgba(0, 0, 0, 255)), text)])
    got = [tf.glyph_name(g.glyph_id) for g in arr.arranged_glyphs]
    assert got == ["ko", "nikhahit", "maiek", "saraaa"], got


def test_font_without_decomposition_keeps_sara_am(bare_tid):
    # HarfBuzz's has-glyph gate: no nikhahit/saraaa glyphs -> AM stays
    names, clusters = _shape(bare_tid, [KO, MAI_EK, SARA_AM])
    assert names == ["ko", "maiek", "saraam"], names
    assert clusters == [(0, 1), (1, 2), (2, 3)], clusters


def test_end_to_end_typeset(thai_tid):
    tf = get_typeface(thai_tid)
    f = FigFont(typeface_id=thai_tid, size=20.0)
    text = "".join(chr(c) for c in [KO, MAI_EK, SARA_AM])
    arr = typeset(vec2(1000, 40), [(f, fill(rgba(0, 0, 0, 255)), text)])
    names = [tf.glyph_name(g.glyph_id) for g in arr.arranged_glyphs]
    assert names == ["ko", "nikhahit", "maiek", "saraaa"], names


@pytest.mark.parametrize("seed", range(6))
def test_shaper_dispatch_fuzz_never_crashes(seed):
    """Adversarial mixed-script runs through the full typeset pipeline:
    random interleavings of Thai/Lao (incl. lone SARA AM, leading tone
    marks, AM-after-AM), Khmer coengs, Myanmar kinzi fragments, Arabic,
    Devanagari and Latin must never raise, and every emitted cluster must
    reference a valid source index — the dispatch in shaper.substitute_ex
    picks ONE staged pipeline per run, so cross-script runs exercise the
    'wrong pipeline sees foreign codepoints' paths."""
    rng = np.random.default_rng(seed)
    pools = [
        [0x0E01, 0x0E33, 0x0E48, 0x0E4D, 0x0E32],         # Thai
        [0x0E81, 0x0EB3, 0x0EC8],                         # Lao
        [0x1780, 0x17D2, 0x179A, 0x17C1],                 # Khmer
        [0x1000, 0x1004, 0x103A, 0x1039, 0x1031],         # Myanmar
        [0x0627, 0x0644, 0x0628, 0x064E],                 # Arabic
        [0x0915, 0x094D, 0x0930, 0x093F],                 # Devanagari
        [ord("A"), ord("f"), ord("i"), ord(" "), ord("\n")],
    ]
    tid = load_typeface("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf")
    font = FigFont(typeface_id=tid, size=16.0)
    for _ in range(20):
        n = int(rng.integers(1, 24))
        cps = [int(rng.choice(pools[int(rng.integers(0, len(pools)))]))
               for _ in range(n)]
        text = "".join(chr(c) for c in cps)
        arr = typeset(vec2(200, 200),
                      [(font, fill(rgba(0, 0, 0, 255)), text)])
        for g in arr.arranged_glyphs:
            assert 0 <= g.cluster < len(text)
            assert 0 <= g.source.rune_start < g.source.rune_end <= len(text)
