"""Native C typesetter (native/typeset.cpp + text/native_pack.py).

Pins the FDTP font-pack engine GLYPH-FOR-GLYPH and position-for-position
against the Python pipeline (text/shaper.py substitute_ex + position,
text/layout.py typeset + the GlyphArrangement query suite) — the C-host
text surface that closes the reference dynlib's typeset export gap
(/root/reference/src/figdraw/bindings/native_bindings.nim:1-628): every
script the Python pipeline stages (Latin-class, Arabic, Hebrew,
Devanagari, Khmer, Myanmar, Thai/Lao), UAX#9 bidi paragraphs, variable
instances, and the selection/caret geometry APIs must be IDENTICAL from
C; anything the engine cannot reproduce (offset-less APIs with marks,
reduced packs) must be REFUSED, never mis-shaped.
"""

import struct

import numpy as np
import pytest

from figdraw_tpu import fill, rgba, vec2
from figdraw_tpu.text import native_typeset as nt
from figdraw_tpu.text.layout import typeset
from figdraw_tpu.text.native_pack import (
    F_FEATURES_REDUCED,
    F_GSUB_DROPPED,
    F_HAS_GPOS_KERN,
    F_HAS_MARKS,
    build_font_pack,
)
from figdraw_tpu.text.shaper import DEFAULT_GSUB_FEATURES, get_shaper
from figdraw_tpu.text.typefaces import FigFont, get_typeface, load_typeface

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
UBUNTU = "/root/reference/data/Ubuntu.ttf"
HACK = "/root/reference/data/HackNerdFont-Regular.ttf"
FIRACODE = "/root/reference/examples/fonts/FiraCode-wght.ttf"

pytestmark = pytest.mark.skipif(
    not nt.available(), reason="native typesetter did not build")


def _py_shape(tid, text):
    """The Python pipeline's simple-run shaping (layout.py:640-725 segment
    path): cmap -> substitute_ex(default features) -> GPOS kern deltas."""
    tf = get_typeface(tid)
    shaper = get_shaper(tf)
    cps = [ord(c) for c in text]
    names = [tf.glyph_name(tf.glyph_id(cp)) for cp in cps]
    clusters = [(i, i + 1) for i in range(len(cps))]
    if shaper is not None:
        names, clusters, _ = shaper.substitute_ex(
            names, clusters, frozenset(DEFAULT_GSUB_FEATURES), None, cps=cps)
    deltas = (shaper.position(names)
              if shaper is not None and shaper.has_gpos_kern
              else [0] * len(names))
    gids = [tf._name_to_gid.get(n, 0) for n in names]
    advs = [tf.advance(g) + d for g, d in zip(gids, deltas)]
    if (shaper is None or not shaper.has_gpos_kern) and len(gids) > 1:
        # legacy kern folded into the left glyph (layout.py:717-725)
        for k in range(len(gids) - 1):
            advs[k] += tf.kerning(gids[k], gids[k + 1])
    return gids, advs, [c[0] for c in clusters]


def _assert_match(tid, text):
    pg, pa, pc = _py_shape(tid, text)
    cg, ca, cc = nt.shape(tid, text)
    assert list(cg) == pg, f"gids diverge for {text!r}"
    assert [float(x) for x in ca] == [float(a) for a in pa], \
        f"advances diverge for {text!r}"
    assert list(cc) == pc, f"clusters diverge for {text!r}"


# ---- pack format ------------------------------------------------------------

def test_pack_header_and_metrics():
    tid = load_typeface(DEJAVU)
    blob = build_font_pack(tid)
    magic, ver = struct.unpack_from("<II", blob, 0)
    assert magic == 0x46445450 and ver == 5
    tf = get_typeface(tid)
    upem, asc, desc, gap = nt.metrics(tid)
    assert (upem, asc, desc, gap) == (
        tf.units_per_em, tf.ascent, tf.descent, tf.line_gap)
    # DejaVu: GPOS kern feature + mark attachment, both EXPORTED in v2 —
    # nothing is dropped anymore (the ccmp ctx chain serializes)
    flags = nt.pack_flags(tid)
    assert flags & F_HAS_GPOS_KERN
    assert flags & F_HAS_MARKS
    assert not (flags & F_GSUB_DROPPED)


def test_pack_load_rejects_malformed():
    tid = load_typeface(DEJAVU)
    blob = nt.pack_blob(tid)
    assert nt.load_raw_pack(b"") == 0
    assert nt.load_raw_pack(b"\x00" * 64) == 0
    assert nt.load_raw_pack(blob[:40]) == 0          # truncated header
    assert nt.load_raw_pack(blob[: len(blob) // 2]) == 0  # truncated body
    bad = bytearray(blob)
    bad[4] = 99  # version
    assert nt.load_raw_pack(bytes(bad)) == 0
    # a LYING header: counts UNDER the hard caps but far past the remaining
    # body bytes must be rejected by the bounds check, not attempt a
    # multi-hundred-MB allocation (std::bad_alloc would terminate the host)
    lying = bytearray(blob[:64])
    for off, count in ((24, 0x80000),   # n_glyphs (cap 1<<20)
                       (28, 0x100000),  # n_cmap   (cap 1<<22)
                       (44, 0xFFFFFF)):  # n_kern0 (cap 1<<24)
        lie = bytearray(lying)
        lie[off : off + 4] = count.to_bytes(4, "little")
        assert nt.load_raw_pack(bytes(lie)) == 0


def test_cmap_and_advances_match_typeface():
    tid = load_typeface(DEJAVU)
    tf = get_typeface(tid)
    probe = [ord(c) for c in "Aa0zZ@é Ω-我"] + [0x10FFFF]
    for cp in probe:
        assert nt.glyph_id(tid, cp) == tf.glyph_id(cp)
    for cp in probe:
        gid = tf.glyph_id(cp)
        assert nt.advance(tid, gid) == np.float32(tf.advance(gid))


# ---- shaping parity ---------------------------------------------------------

def test_latin_ligatures_and_gpos_kern_match():
    tid = load_typeface(DEJAVU)
    _assert_match(tid, "Office fifi ffl flow first")
    _assert_match(tid, "AVATAR WAVE To Ya LTA")
    # ligature count sanity: 'ffi' must actually ligate (not a no-op pass)
    gids, _, clus = nt.shape(tid, "ffi")
    assert len(gids) == 1 and clus[0] == 0


def test_cyrillic_and_greek_match():
    tid = load_typeface(DEJAVU)
    _assert_match(tid, "Тест добро пожаловать")
    _assert_match(tid, "δόξα τω θεώ ΔΘΛ")


def test_ubuntu_and_hack_fonts_match():
    _assert_match(load_typeface(UBUNTU), "Toffle waffle AV fi ffl Tj")
    _assert_match(load_typeface(HACK), "Office -> != === www AV")


def test_mark_text_refused_on_offsetless_api_only():
    """The offset-less advance-stream API (fd_typeset_shape) cannot express
    mark placement and must refuse; fd_typeset_shape_ex shapes the SAME
    text with per-glyph anchor offsets."""
    tid = load_typeface(DEJAVU)
    with pytest.raises(nt.NativeTypesetUnsupported):
        nt.shape(tid, "e\u0301")  # e + combining acute
    gids, adv, dx, dy, clus = nt.shape_ex(tid, "e\u0301")
    assert len(gids) == 2 and adv[1] == 0.0
    assert dx[1] != 0.0 or dy[1] != 0.0  # the mark anchors on the base
    # precomposed form: no mark in the run, shapes on both APIs
    _assert_match(tid, "caf\u00e9")


def test_firacode_calt_shapes_natively():
    """v2 exports the full default plan incl. calt/rclt contextual chains
    with nested lookups — FiraCode's programming ligatures shape in C
    glyph-for-glyph equal to Python, and the pack is NOT flagged reduced."""
    tid = load_typeface(FIRACODE)
    assert not (nt.pack_flags(tid) & F_FEATURES_REDUCED)
    for text in ("a -> b => c", "x != y === z", "<= >= <> |> <|",
                 "// comment /* block */", "a ... b :: c",
                 "www ## ###", "plain words stay plain"):
        _assert_match(tid, text)
    # the arrow must actually ligate via the calt chain (not a no-op plan)
    pg, _, _ = _py_shape(tid, "->")
    cg, _, _ = nt.shape(tid, "->")
    assert list(cg) == pg


def test_legacy_kern_table_branch(tmp_path):
    """A font with a legacy 'kern' table and no GPOS kern feature: the C
    engine must fold kern0 into the left glyph's advance exactly like
    layout.py's elif branch."""
    from fontTools.fontBuilder import FontBuilder
    from fontTools.pens.ttGlyphPen import TTGlyphPen
    from fontTools.ttLib import newTable

    fb = FontBuilder(1000, isTTF=True)
    names = [".notdef", "A", "V", "o"]
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({ord(c): c for c in "AVo"})
    glyf = {}
    for g in names:
        pen = TTGlyphPen(None)
        pen.moveTo((50, 0)); pen.lineTo((450, 0))
        pen.lineTo((450, 700)); pen.lineTo((50, 700)); pen.closePath()
        glyf[g] = pen.glyph()
    fb.setupGlyf(glyf)
    fb.setupHorizontalMetrics({g: (500, 50) for g in names})
    fb.setupHorizontalHeader(ascent=800, descent=-200)
    fb.setupNameTable({"familyName": "KernTest", "styleName": "Regular"})
    fb.setupOS2(sTypoAscender=800, sTypoDescender=-200)
    fb.setupPost()
    kern = newTable("kern")
    kern.version = 0
    from fontTools.ttLib.tables._k_e_r_n import KernTable_format_0
    st = KernTable_format_0()
    st.coverage = 1
    st.format = 0
    st.version = 0
    st.kernTable = {("A", "V"): -80, ("V", "o"): -30}
    kern.kernTables = [st]
    fb.font["kern"] = kern
    path = str(tmp_path / "kerntest.ttf")
    fb.font.save(path)

    tid = load_typeface(path)
    assert not (nt.pack_flags(tid) & F_HAS_GPOS_KERN)
    _assert_match(tid, "AVo oVA AA")
    _, adv, _ = nt.shape(tid, "AV")
    assert float(adv[0]) == 500.0 - 80.0


def test_small_cap_returns_e_cap_without_overflow():
    """A C host passing a too-small cap must get FD_TYPESET_E_CAP back with
    its buffers untouched past cap — the shaped count is only known after
    GSUB runs, so the engine must shape internally first (a raw write into
    the caller's cap-sized arrays would be a heap overflow)."""
    import ctypes

    tid = load_typeface(DEJAVU)
    lib = nt._load()
    h = nt._pack_handle(tid)
    text = "The quick brown fox jumps over the lazy dog Office ffi"
    cps = np.array([ord(c) for c in text], dtype=np.uint32)
    CAP, GUARD = 4, 64
    for fn, extra in (
        (lambda g, x, c: lib.fd_typeset_shape(
            h, cps.ctypes.data_as(ctypes.c_void_p), len(cps), g, x, c, CAP),
         np.float32),
        (lambda g, x, c: lib.fd_typeset_line(
            h, cps.ctypes.data_as(ctypes.c_void_p), len(cps),
            ctypes.c_float(24.0), g, x, c, CAP, None), np.float32),
    ):
        gids = np.full(CAP + GUARD, 0xAB, dtype=np.uint32)
        vals = np.full(CAP + GUARD, -1.0, dtype=extra)
        clus = np.full(CAP + GUARD, 0xCD, dtype=np.uint32)
        rc = fn(gids.ctypes.data_as(ctypes.c_void_p),
                vals.ctypes.data_as(ctypes.c_void_p),
                clus.ctypes.data_as(ctypes.c_void_p))
        assert rc == nt.E_CAP
        assert (gids[CAP:] == 0xAB).all(), "gids written past cap"
        assert (vals[CAP:] == -1.0).all(), "values written past cap"
        assert (clus[CAP:] == 0xCD).all(), "clusters written past cap"


# ---- line placement ---------------------------------------------------------

def test_typeset_line_matches_typeset():
    tid = load_typeface(DEJAVU)
    text = "Office flow AVATAR 123"
    font = FigFont(typeface_id=tid, size=24.0)
    arr = typeset(vec2(100000, 100),
                  [(font, fill(rgba(0, 0, 0, 255)), text)])
    gids, xs, clus, baseline = nt.typeset_line(tid, text, 24.0)
    got = [(int(g), float(x)) for g, x in zip(gids, xs)]
    want = [(g.glyph_id, g.pos.x) for g in arr.arranged_glyphs]
    assert len(got) == len(want)
    for (cg, cx), (pg, px) in zip(got, want):
        assert cg == pg
        assert abs(cx - px) < 1e-3
    assert baseline == arr.fonts[0].baseline_offset


def test_typeset_box_matches_typeset_wrapped():
    """fd_typeset_box vs layout.py typeset on a wrapped two-paragraph box:
    identical glyph streams, pen positions, and measured size across every
    h/v alignment (the reference dynlib's full typeset export surface)."""
    tid = load_typeface(DEJAVU)
    text = ("The quick brown fox jumps over the lazy dog.\n"
            "Second paragraph with Office ffi flow and AVATAR waves to Ya.")
    font = FigFont(typeface_id=tid, size=18.0)
    for h_align in (0, 1, 2):
        for v_align in (0, 1, 2):
            arr = typeset(vec2(220, 160),
                          [(font, fill(rgba(0, 0, 0, 255)), text)],
                          h_align=h_align, v_align=v_align, wrap=True)
            gids, xs, ys, clus, size = nt.typeset_box(
                tid, text, 18.0, bounds=(220, 160),
                h_align=h_align, v_align=v_align, wrap=True)
            want = arr.arranged_glyphs
            assert len(gids) == len(want), (h_align, v_align)
            for k, g in enumerate(want):
                assert int(gids[k]) == g.glyph_id, (h_align, v_align, k)
                assert int(clus[k]) == g.cluster
                assert abs(float(xs[k]) - g.pos.x) < 1e-3, (h_align, k)
                assert abs(float(ys[k]) - g.pos.y) < 1e-3, (v_align, k)
            assert abs(size[0] - arr.max_size.x) < 1e-3
            assert abs(size[1] - arr.max_size.y) < 1e-3
            # multi-line actually exercised (wrap produced >2 lines)
            assert len(arr.lines) > 2


def test_typeset_box_places_marks_on_anchors():
    """v2: combining marks lay out ON the box path — xs/ys fold the GPOS
    anchor offsets, matching the Python arrangement's pos + offset exactly
    (layout.py's draw convention, consumed by glyphs.py)."""
    tid = load_typeface(DEJAVU)
    text = "first line\nme\u0301lange a\u0301\u0308 stack"
    font = FigFont(typeface_id=tid, size=18.0)
    arr = typeset(vec2(160, 0), [(font, fill(rgba(0, 0, 0, 255)), text)],
                  wrap=True)
    gids, xs, ys, clus, size = nt.typeset_box(
        tid, text, 18.0, bounds=(160, 0), wrap=True)
    want = arr.arranged_glyphs
    assert len(gids) == len(want)
    saw_mark_offset = False
    for k, g in enumerate(want):
        assert int(gids[k]) == g.glyph_id, k
        assert abs(float(xs[k]) - (g.pos.x + g.offset.x)) < 1e-3, k
        assert abs(float(ys[k]) - (g.pos.y + g.offset.y)) < 1e-3, k
        if g.offset.x or g.offset.y:
            saw_mark_offset = True
    assert saw_mark_offset  # the marks really anchored


def test_typeset_box_nowrap_line_height_and_cjk():
    tid = load_typeface(DEJAVU)
    font = FigFont(typeface_id=tid, size=20.0, line_height=30.0)

    def compare(text, bounds, wrap):
        arr = typeset(vec2(*bounds), [(font, fill(rgba(0, 0, 0, 255)), text)],
                      wrap=wrap)
        gids, xs, ys, clus, size = nt.typeset_box(
            tid, text, 20.0, line_height=30.0, bounds=bounds, wrap=wrap)
        want = arr.arranged_glyphs
        assert len(gids) == len(want)
        for k, g in enumerate(want):
            assert int(gids[k]) == g.glyph_id
            assert abs(float(xs[k]) - g.pos.x) < 1e-3
            assert abs(float(ys[k]) - g.pos.y) < 1e-3
        assert abs(size[0] - arr.max_size.x) < 1e-3
        assert abs(size[1] - arr.max_size.y) < 1e-3
        return arr

    # nowrap: newlines still break, custom line_height honored
    arr = compare("one two three four five\nsix seven", (60, 0), wrap=False)
    assert len(arr.lines) == 2
    # CJK codepoints break anywhere (glyphless in DejaVu, but the breaker
    # must still split — layout.py _is_cjk contract)
    arr = compare("我们是一家人", (30, 0), wrap=True)
    assert len(arr.lines) > 1
    # a word longer than the box: forced mid-word break, reflow path
    arr = compare("Honorificabilitudinitatibus again", (40, 0), wrap=True)
    assert len(arr.lines) > 2


def test_c_host_demo_compiles_and_runs(tmp_path):
    """native/examples/typeset_demo.c: a real C program against the public
    header loads a .fdtp pack, decodes UTF-8, and typesets a line — the
    external-host text path (docs/native_api.md)."""
    import os
    import subprocess

    from figdraw_tpu.text.native_pack import save_font_pack

    nt._load()  # ensure the .so exists
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(root, "native", "examples", "typeset_demo.c")
    lib_dir = os.path.join(root, "native", "build")
    exe = str(tmp_path / "typeset_demo")
    subprocess.run(
        ["gcc", src, "-I", os.path.join(root, "native"),
         "-L", lib_dir, "-lfigdraw_typeset",
         f"-Wl,-rpath,{lib_dir}", "-o", exe],
        check=True, capture_output=True)

    tid = load_typeface(DEJAVU)
    pack_path = str(tmp_path / "dejavu.fdtp")
    save_font_pack(tid, pack_path)

    text = "Office flow AVATAR"
    out = subprocess.run([exe, pack_path, text], check=True,
                         capture_output=True, text=True)
    lines = dict(l.split("=") for l in out.stdout.split())
    gids, _, _, baseline = nt.typeset_line(tid, text, 24.0)
    _, adv, _ = nt.shape(tid, text)
    tf = get_typeface(tid)
    assert int(lines["glyphs"]) == len(gids)
    assert int(lines["first_gid"]) == int(gids[0])
    want_w = float(np.sum(adv.astype(np.float64))) * 24.0 / tf.units_per_em
    assert abs(float(lines["width_px"]) - want_w) < 0.05
    assert float(lines["baseline"]) == baseline

    # the demo's wrapped-box leg (fd_typeset_box, 160 px column, centered)
    bg, _, _, _, bsize = nt.typeset_box(tid, text, 24.0, bounds=(160, 0),
                                        h_align=1, wrap=True)
    assert int(lines["box_glyphs"]) == len(bg)
    assert abs(float(lines["box_w"]) - bsize[0]) < 0.05
    assert abs(float(lines["box_h"]) - bsize[1]) < 0.05

    # the refusal path surfaces as exit code 2, not a mis-shaped stream
    r = subprocess.run([exe, pack_path, "cafe\u0301"], capture_output=True,
                       text=True)
    assert r.returncode == 2

    # --box mode drives only the offset-folding box layouter: the SAME
    # mark-bearing text lays out instead of refusing
    out = subprocess.run([exe, pack_path, "--box", "cafe\u0301"],
                         check=True, capture_output=True, text=True)
    lines = dict(l.split("=") for l in out.stdout.split())
    bg, _, _, _, bsize = nt.typeset_box(tid, "cafe\u0301", 24.0,
                                        bounds=(160, 0), h_align=1, wrap=True)
    assert int(lines["box_glyphs"]) == len(bg)
    assert abs(float(lines["box_w"]) - bsize[0]) < 0.05

    # FDTP v4: the compiled host typesets wrapped Devanagari — syllable
    # segmentation, reph/matra reordering and mark anchors all native
    dev_tid = load_typeface(DEVANAGARI)
    dev_pack = str(tmp_path / "dev.fdtp")
    save_font_pack(dev_tid, dev_pack)
    dtext = ("\u0915\u0930\u094d\u092e \u0915\u094d\u0937"
             "\u0924\u094d\u0930\u093f\u092f \u0939\u093f"
             "\u0928\u094d\u0926\u0940")
    out = subprocess.run([exe, dev_pack, "--box", dtext], check=True,
                         capture_output=True, text=True)
    lines = dict(l.split("=") for l in out.stdout.split())
    bg, _, _, _, bsize = nt.typeset_box(dev_tid, dtext, 24.0,
                                        bounds=(160, 0), h_align=1, wrap=True)
    assert int(lines["box_glyphs"]) == len(bg)
    assert int(lines["box_first_gid"]) == int(bg[0])
    assert abs(float(lines["box_w"]) - bsize[0]) < 0.05
    assert abs(float(lines["box_h"]) - bsize[1]) < 0.05


HEBREW = "/root/reference/examples/fonts/NotoSansHebrew-wdth-wght.ttf"
NASKH = "/root/reference/examples/fonts/NotoNaskhArabic-wght.ttf"
DEVANAGARI = "/root/reference/examples/fonts/NotoSansDevanagari-wdth-wght.ttf"


def test_hebrew_niqqud_shape_ex_matches_python():
    """shape_ex(rtl=True) reproduces layout.py's Hebrew arrangement
    component-wise: the LOGICAL-order glyph stream with zero-advance marks
    and bare anchor offsets (the RTL convention parks a mark's cursor at
    its base's origin — no pen pullback). Bidi reversal stays the host's
    job, exactly like a HarfBuzz buffer."""
    tid = load_typeface(HEBREW)
    tf = get_typeface(tid)
    size = 30.0
    rs = size / tf.units_per_em
    for text in ("\u05e9\u05b8\u05c1\u05dc\u05d5\u05b9\u05dd",
                 "\u05d1\u05b0\u05bc\u05e8\u05b5\u05d0"
                 "\u05e9\u05b4\u05c1\u05d9\u05ea"):
        font = FigFont(typeface_id=tid, size=size)
        arr = typeset(vec2(100000, 100),
                      [(font, fill(rgba(0, 0, 0, 255)), text)])
        want = arr.arranged_glyphs
        gids, adv, dx, dy, clus = nt.shape_ex(tid, text, rtl=True)
        assert len(gids) == len(want)
        saw_mark = False
        for k, g in enumerate(want):
            assert int(gids[k]) == g.glyph_id, (text, k)
            assert abs(float(adv[k]) * rs - g.advance.x) < 1e-3, (text, k)
            assert abs(float(dx[k]) * rs - g.offset.x) < 1e-3, (text, k)
            assert abs(-float(dy[k]) * rs - g.offset.y) < 1e-3, (text, k)
            if g.advance.x == 0.0:
                saw_mark = True
        assert saw_mark  # niqqud actually anchored with zero advance


# ---- syllable pipelines (FDTP v4) ---------------------------------------------
# Indic/Khmer/Myanmar shape NATIVELY since v4: the C engine carries the
# syllable segmentation, base/reph analysis, positional masks and the
# reorders (shaper._substitute_indic / text/use.py) -- no FD_TYPESET_E_SCRIPT
# refusal remains for any script the Python pipeline stages.


def test_devanagari_shape_ex_matches_layout():
    """Noto Sans Devanagari end-to-end: syllable segmentation, reph
    (rphf + reorder to post-base), rakar (rkrf), half forms, pre-base
    matra I reordering, conjuncts (cjct) and the presentation stages PLUS
    abvm/blwm mark anchoring must reproduce layout.py's arrangement
    bit-exactly -- the reference shapes this through HarfBuzz's Indic
    shaper (harfbuzzy.nim)."""
    tid = load_typeface(DEVANAGARI)
    tf = get_typeface(tid)
    size = 30.0
    rs = size / tf.units_per_em
    for text in ("\u0915\u0930\u094d\u092e",              # karma (reph)
                 "\u0915\u094d\u0937\u0924\u094d\u0930"
                 "\u093f\u092f",                          # kshatriya
                 "\u0928\u092e\u0938\u094d\u0924\u0947",  # namaste
                 "\u0936\u094d\u0930\u0940\u092e\u093e"
                 "\u0928\u094d",                          # shriman
                 "\u0939\u093f\u0928\u094d\u0926\u0940",  # hindi
                 "\u0915\u094b\u0902"):                    # kom
        font = FigFont(typeface_id=tid, size=size)
        arr = typeset(vec2(100000, 100),
                      [(font, fill(rgba(0, 0, 0, 255)), text)])
        want = arr.arranged_glyphs
        gids, adv, dx, dy, clus = nt.shape_ex(tid, text)
        assert len(gids) == len(want), text
        for k, g in enumerate(want):
            assert int(gids[k]) == g.glyph_id, (text, k)
            assert abs(float(adv[k]) * rs - g.advance.x) < 1e-6, (text, k)
            assert abs(float(dx[k]) * rs - g.offset.x) < 1e-6, (text, k)
            assert abs(-float(dy[k]) * rs - g.offset.y) < 1e-6, (text, k)


def test_devanagari_fuzz_parity():
    """200 seeded random Devanagari strings (consonants, matras, virama,
    anusvara/candrabindu/nukta, mixed Latin) shape glyph-for-glyph and
    cluster-for-cluster equal to the Python syllable pipeline."""
    import random

    tid = load_typeface(DEVANAGARI)
    rng = random.Random(4242)
    cons = list(range(0x0915, 0x093A))
    matras = list(range(0x093E, 0x094D)) + [0x0962, 0x0963]
    other = [0x094D, 0x0902, 0x0903, 0x0901, 0x093C,
             ord(" "), ord("a"), ord(".")]
    pool = cons + matras + other
    for _ in range(200):
        n = rng.randint(1, 10)
        text = "".join(chr(rng.choice(pool)) for _ in range(n))
        pg, pc = _py_shape_ex_stream(tid, text)
        gids, adv, dx, dy, clus = nt.shape_ex(tid, text)
        assert list(map(int, gids)) == pg, text
        assert list(map(int, clus)) == pc, text


def test_mixed_script_fuzz_parity():
    """Adversarial cross-script fuzz: Devanagari/Khmer/Myanmar/Arabic
    codepoints (plus ZWJ/ZWNJ/dotted circle) thrown at BOTH the Devanagari
    and Naskh packs — wrong-script text exercises the no-coverage paths of
    every pipeline; glyph streams and clusters must equal Python or refuse
    identically, never crash or mis-shape."""
    import random

    rng = random.Random(777)
    pools = [list(range(0x0900, 0x0980)), list(range(0x1780, 0x17FA)),
             list(range(0x1000, 0x10A0)), list(range(0x0621, 0x0670)),
             [ord(" "), ord("a"), 0x200D, 0x200C, 0x25CC]]
    for tid in (load_typeface(DEVANAGARI), load_typeface(NASKH)):
        # neither pack carries a reduced flag, so NO refusal is legitimate
        # here — a spurious NativeTypesetUnsupported must fail the test,
        # not silently skip the case
        assert not (nt.pack_flags(tid)
                    & (F_FEATURES_REDUCED | 0b11000000))  # arab/syl reduced
        for _ in range(120):
            n = rng.randint(1, 14)
            text = "".join(chr(rng.choice(rng.choice(pools)))
                           for _ in range(n))
            pg, pc = _py_shape_ex_stream(tid, text)
            gids, adv, dx, dy, clus = nt.shape_ex(tid, text)
            assert list(map(int, gids)) == pg, text
            assert list(map(int, clus)) == pc, text


def test_typeset_box_devanagari_wrapped():
    """fd_typeset_box on wrapped Devanagari: the box layouter rides the v4
    syllable pipelines — glyph streams and positions (anchor offsets
    folded) equal layout.py's typeset across alignments."""
    tid = load_typeface(DEVANAGARI)
    text = ("\u0915\u0930\u094d\u092e \u0915\u094d\u0937\u0924"
            "\u094d\u0930\u093f\u092f \u0939\u093f\u0928\u094d"
            "\u0926\u0940 \u0928\u092e\u0938\u094d\u0924\u0947 "
            "\u0936\u094d\u0930\u0940\u092e\u093e\u0928\u094d "
            "\u0915\u094b\u0902\n"
            "\u0926\u0942\u0938\u0930\u093e \u092a\u0930\u093f"
            "\u091a\u094d\u091b\u0947\u0926")
    font = FigFont(typeface_id=tid, size=20.0)
    for h_align in (0, 1, 2):
        arr = typeset(vec2(180, 120), [(font, fill(rgba(0, 0, 0, 255)),
                                        text)],
                      h_align=h_align, wrap=True)
        gids, xs, ys, clus, size = nt.typeset_box(
            tid, text, 20.0, bounds=(180, 120), h_align=h_align, wrap=True)
        want = arr.arranged_glyphs
        assert len(gids) == len(want), h_align
        for k, g in enumerate(want):
            assert int(gids[k]) == g.glyph_id, (h_align, k)
            assert abs(float(xs[k]) - (g.pos.x + g.offset.x)) < 1e-3, k
            assert abs(float(ys[k]) - (g.pos.y + g.offset.y)) < 1e-3, k
        assert len(arr.lines) >= 3  # wrap actually happened


# ---- arrangement geometry over the C ABI ----------------------------------
# fd_typeset_box_make + fd_arr_*: the reference exports its GlyphArrangement
# query suite to C hosts (fonttypes.nim:430-808 {.nativeAbi.}); the C twins
# must match layout.py position-for-position.

AFFINITY = {"leading": 0, "trailing": 1, "inside": 2}


def _assert_arrangement_matches(tid, text, size=18.0, bounds=(150, 0),
                                h_align=0, wrap=True):
    font = FigFont(typeface_id=tid, size=size)
    arr = typeset(vec2(*bounds), [(font, fill(rgba(0, 0, 0, 255)), text)],
                  h_align=h_align, wrap=wrap)
    ca = nt.Arrangement(tid, text, size, bounds=bounds, h_align=h_align,
                        wrap=wrap)
    n = len(arr.arranged_glyphs)
    assert ca.glyph_count() == n, text
    assert ca.line_count() == len(arr.lines)
    for li, (s, e) in enumerate(arr.lines):
        assert ca.line_range(li) == (s, e), (text, li)
    cw, ch = ca.content_size()
    assert abs(cw - arr.max_size.x) < 1e-3 and abs(ch - arr.max_size.y) < 1e-3
    for i, g in enumerate(arr.arranged_glyphs):
        x, y, w, h = ca.glyph_rect(i)
        assert abs(x - g.rect.x) < 1e-3, (text, i)
        assert abs(y - g.rect.y) < 1e-3, (text, i)
        assert abs(w - g.rect.w) < 1e-3, (text, i)
        assert abs(h - g.rect.h) < 1e-3, (text, i)
        cr = arr.cluster_rect(i)
        x, y, w, h = ca.cluster_rect(i)
        assert abs(x - cr.x) < 1e-3 and abs(w - cr.w) < 1e-3, (text, i)
        assert ca.source_range(i) == (g.source.rune_start,
                                      g.source.rune_end), (text, i)
    # selection bands over a sweep of rune ranges
    n_src = len(text)
    ranges = [(0, n_src - 1), (1, max(1, n_src // 2)),
              (n_src // 3, 2 * n_src // 3)]
    for (ra, rb) in ranges:
        want = arr.selection_rects_for((ra, rb))
        got = ca.selection_rects(ra, rb)
        assert len(got) == len(want), (text, ra, rb)
        for w_r, g_r in zip(want, got):
            assert abs(g_r[0] - w_r.x) < 1e-3, (text, ra, rb)
            assert abs(g_r[1] - w_r.y) < 1e-3
            assert abs(g_r[2] - w_r.w) < 1e-3, (text, ra, rb)
            assert abs(g_r[3] - w_r.h) < 1e-3
        assert ca.glyph_range_for(ra, rb) == arr.glyph_range_for((ra, rb))
    # caret positions at every insertion index
    for sr in range(n_src + 1):
        want = arr.caret_positions_for(sr)
        got = ca.caret_positions(sr)
        assert len(got) == len(want), (text, sr)
        for w_c, g_c in zip(want, got):
            assert abs(g_c[0] - w_c.pos.x) < 1e-3, (text, sr)
            assert abs(g_c[1] - w_c.pos.y) < 1e-3, (text, sr)
            assert abs(g_c[2] - w_c.rect.h) < 1e-3
            assert g_c[3] == w_c.line_index, (text, sr)
            assert g_c[5] == AFFINITY[w_c.affinity], (text, sr)
    # hit testing + nearest caret over a point grid
    for px_ in (0.0, 10.0, 40.0, 80.0, 149.0):
        for py_ in (-5.0, 2.0, 15.0, 40.0, 90.0):
            pt = vec2(px_, py_)
            assert ca.glyph_index_at(px_, py_) == arr.glyph_index_at(pt), \
                (text, px_, py_)
            assert ca.nearest_source_rune(px_, py_) == \
                arr.nearest_source_rune_for_caret_point(pt), (text, px_, py_)


def test_arrangement_geometry_ltr():
    """Wrapped LTR text with ligatures (ffi spans 3 runes — partial
    selection clips the cluster rect fractionally) matches layout.py on
    every geometry query."""
    tid = load_typeface(DEJAVU)
    _assert_arrangement_matches(
        tid, "The Office saw fifi waffle first.\nSecond line here.")


def test_arrangement_geometry_bidi():
    """Mixed Hebrew/Latin with niqqud: visual-order selection bands split
    at bidi fragment boundaries, carets double at direction boundaries,
    RTL glyphs clip partial selections from the right edge — all equal to
    layout.py."""
    tid = load_typeface(HEBREW)
    _assert_arrangement_matches(
        tid, "abc \u05e9\u05b8\u05dc\u05d5\u05dd 123 xyz")
    _assert_arrangement_matches(
        tid, "\u05e9\u05dc\u05d5\u05dd \u05e2\u05d5\u05dc\u05dd "
             "abc \u05d1\u05b0\u05bc\u05e8\u05b5\u05d0")


def test_arrangement_geometry_devanagari():
    """Devanagari reordered clusters (reph, matra I): cluster rects span
    the reordered fragments, carets land on cluster edges — equal to
    layout.py."""
    tid = load_typeface(DEVANAGARI)
    _assert_arrangement_matches(
        tid, "\u0915\u0930\u094d\u092e \u0939\u093f\u0928"
             "\u094d\u0926\u0940 ab")


def test_arrangement_geometry_edge_contracts():
    """C-host contract edges the Python wrappers never hit: rb = INT32_MAX
    is the natural select-everything idiom and must equal the explicit
    full range (not signed-overflow to zero bands); a cap=0/NULL caret
    count query must return the SAME count a full buffer receives (bidi
    doubles carets, dedup runs before capping); NULL outputs with nonzero
    caps are pure count queries, never read or written through."""
    import ctypes

    tid = load_typeface(HEBREW)
    text = "abc שלום 123 xyz"
    font = FigFont(typeface_id=tid, size=18.0)
    arr = typeset(vec2(150, 0), [(font, fill(rgba(0, 0, 0, 255)), text)],
                  wrap=True)
    ca = nt.Arrangement(tid, text, 18.0, bounds=(150, 0), wrap=True)
    lib = ca._lib
    int32_max = 2 ** 31 - 1
    want = arr.selection_rects_for((0, len(text) - 1))
    full = ca.selection_rects(0, len(text) - 1)
    big = np.zeros(64 * 4, dtype=np.float32)
    n_big = lib.fd_arr_selection_rects(
        ca._h, 0, int32_max, big.ctypes.data_as(ctypes.c_void_p), 64)
    assert n_big == len(full) == len(want) > 0
    for k in range(n_big):
        assert np.allclose(big[k * 4:k * 4 + 4], np.asarray(full[k]),
                           atol=1e-4), k
    assert lib.fd_arr_selection_rects(ca._h, 0, int32_max, None, 0) == n_big
    assert lib.fd_arr_selection_rects(ca._h, 0, int32_max, None, 16) == n_big
    for sr in range(len(text) + 1):
        got = ca.caret_positions(sr)
        assert lib.fd_arr_caret_positions(ca._h, sr, None, 0) == len(got), sr
        assert lib.fd_arr_caret_positions(ca._h, sr, None, 16) == len(got), sr


def test_variable_instance_packs():
    """build_font_pack(variations=...) bakes an INSTANCE pack: advances
    come from the varied glyph set, so fd_typeset_box over the pack equals
    layout.py's arrangement for a FigFont with the same variations (the
    reference's Font.variations travel its dynlib the same way). Naskh's
    wght axis genuinely changes advances — the two instances must differ."""
    from figdraw_tpu.text.typefaces import FontVariation

    tid = load_typeface(NASKH)
    text = "\u0633\u0644\u0627\u0645 abc 12"
    widths = {}
    for wght in (400.0, 700.0):
        vrs = (FontVariation(tag="wght", value=wght),)
        font = FigFont(typeface_id=tid, size=20.0, variations=vrs)
        arr = typeset(vec2(400, 100), [(font, fill(rgba(0, 0, 0, 255)),
                                        text)])
        gids, xs, ys, clus, size = nt.typeset_box(
            tid, text, 20.0, bounds=(400, 100), variations=vrs)
        want = arr.arranged_glyphs
        assert len(gids) == len(want), wght
        for k, g in enumerate(want):
            assert int(gids[k]) == g.glyph_id, (wght, k)
            assert abs(float(xs[k]) - (g.pos.x + g.offset.x)) < 1e-3, \
                (wght, k)
        assert abs(size[0] - arr.max_size.x) < 1e-3
        widths[wght] = size[0]
    assert widths[400.0] != widths[700.0]  # the axis actually engaged


# ---- bidi over the C ABI (FDTP v5) --------------------------------------------
# fd_typeset_box runs the full UAX#9 pass (levels, L1/L2 visual order, L4
# mirroring) from the pack's RLE bidi-class + mirrored tables — the C box
# layouter is a complete dynlib-grade typeset like the reference's
# FriBidi+HarfBuzz stack (textbackends/harfbuzzy.nim; dynlib typeset).


def _box_matches(tid, text, size=20.0, bounds=(120, 200), tol=1e-3):
    font = FigFont(typeface_id=tid, size=size)
    for h_align in (0, 1, 2):
        arr = typeset(vec2(*bounds), [(font, fill(rgba(0, 0, 0, 255)),
                                       text)],
                      h_align=h_align, wrap=True)
        gids, xs, ys, clus, out = nt.typeset_box(
            tid, text, size, bounds=bounds, h_align=h_align, wrap=True)
        want = arr.arranged_glyphs
        assert len(gids) == len(want), (text, h_align)
        for k, g in enumerate(want):
            assert int(gids[k]) == g.glyph_id, (text, h_align, k)
            assert abs(float(xs[k]) - (g.pos.x + g.offset.x)) < tol, \
                (text, h_align, k)
            assert abs(float(ys[k]) - (g.pos.y + g.offset.y)) < tol, \
                (text, h_align, k)


def test_typeset_box_bidi_hebrew():
    """RTL paragraphs, mixed LTR/RTL with European numbers, niqqud marks in
    reordered runs, mirrored brackets, and a multi-paragraph split — all
    positioned identically to layout.py's UAX#9 pass."""
    tid = load_typeface(HEBREW)
    for text in ("\u05e9\u05dc\u05d5\u05dd \u05e2\u05d5\u05dc\u05dd",
                 "abc \u05e9\u05dc\u05d5\u05dd 123 def",
                 "\u05e9\u05b8\u05c1\u05dc\u05d5\u05b9\u05dd "
                 "\u05d1\u05b0\u05bc\u05e8\u05b5\u05d0 \u05e2\u05dd",
                 "a (\u05e9\u05dc\u05d5\u05dd) b",
                 "\u05e9\u05d5\u05e8\u05d4 \u05d0\u05d7\u05ea\n"
                 "\u05e9\u05e0\u05d9\u05d9\u05d4 abc"):
        _box_matches(tid, text)


def test_typeset_box_bidi_arabic():
    """Arabic paragraphs wrap and reorder like layout.py: the staged
    positional shaping (v3) composes with the UAX#9 visual order, and
    embedded Latin/numbers sit at their resolved levels."""
    tid = load_typeface(NASKH)
    for text in ("\u0633\u0644\u0627\u0645 \u0639\u0644\u064a"
                 "\u0643\u0645 \u0648\u0631\u062d\u0645\u0629 "
                 "\u0627\u0644\u0644\u0647",
                 "the \u0628\u0633\u0645 \u0627\u0644\u0644\u0647 "
                 "price is 45 usd"):
        _box_matches(tid, text)


def test_typeset_box_bidi_fuzz():
    """150 seeded random strings over Hebrew letters + niqqud, Latin,
    digits, mirrored brackets, and the explicit bidi controls
    (LRI/RLI/FSI/PDI, LRE/RLE/LRO/RLO/PDF) across wrap widths and
    alignments — position-for-position equal to the Python layouter."""
    import random

    rng = random.Random(90210)
    pools = [[ord(c) for c in "abc XY."],
             list(range(0x05D0, 0x05EB)) + [0x05B8, 0x05B4, 0x05C1],
             [ord(c) for c in "0123456789%$+-,.:"],
             [ord(c) for c in "()[]{}<>"],
             [0x2066, 0x2067, 0x2068, 0x2069,
              0x202A, 0x202B, 0x202C, 0x202D, 0x202E,
              0x00A0, 0x0009, ord("\n")]]
    tid = load_typeface(HEBREW)
    font = FigFont(typeface_id=tid, size=18.0)
    for _ in range(150):
        n = rng.randint(1, 18)
        text = "".join(chr(rng.choice(rng.choice(pools))) for _ in range(n))
        h = rng.randint(0, 2)
        w = rng.choice([0, 90, 150])
        arr = typeset(vec2(w, 200), [(font, fill(rgba(0, 0, 0, 255)), text)],
                      h_align=h, wrap=w > 0)
        gids, xs, ys, clus, out = nt.typeset_box(
            tid, text, 18.0, bounds=(w, 200), h_align=h, wrap=w > 0)
        want = arr.arranged_glyphs
        assert len(gids) == len(want), text
        for k, g in enumerate(want):
            assert int(gids[k]) == g.glyph_id, (text, k)
            assert abs(float(xs[k]) - (g.pos.x + g.offset.x)) < 1e-3, \
                (text, k)
            assert abs(float(ys[k]) - (g.pos.y + g.offset.y)) < 1e-3, \
                (text, k)


def _use_tid(tmp_path, script):
    """The synthetic Khmer/Myanmar faces from test_shaping_use -- the exact
    masked GSUB structure Noto Khmer/Myanmar carry (no real faces ship in
    this image)."""
    from test_shaping_use import _build_font

    if script == "khmr":
        cmap = {0x1780: "ka", 0x178F: "ta", 0x179F: "sa", 0x179A: "ro",
                0x17D2: "coeng", 0x17C1: "e", 0x17C2: "ae", 0x17B8: "ii",
                0x17CC: "robat"}
        formed = ["ro.pre", "ka.sub", "sa.sub", "ta.sub", "ka.sub.cfar",
                  "robat.abv"]
        fea = """
            languagesystem DFLT dflt;
            languagesystem khmr dflt;
            feature pref { sub coeng ro by ro.pre; } pref;
            feature blwf {
                sub coeng ka by ka.sub;
                sub coeng sa by sa.sub;
                sub ta by ta.sub;
            } blwf;
            feature abvf { sub robat by robat.abv; } abvf;
            feature cfar { sub ka.sub by ka.sub.cfar; } cfar;
        """
    else:
        cmap = {0x1000: "ka", 0x1004: "nga", 0x103A: "asat",
                0x1039: "virama", 0x103B: "medya", 0x103C: "medra",
                0x103D: "medwa", 0x1031: "e"}
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
    path = _build_font(tmp_path, script + "test.ttf", cmap, formed, fea)
    return load_typeface(path)


def test_khmer_native_parity(tmp_path):
    """Khmer coeng-ro pre-base reordering, coeng subscripts, pre-base
    vowels, robat and cfar shape in C exactly like text/use.py's
    per-syllable masked stages."""
    import sys
    sys.path.insert(0, "tests") if "tests" not in sys.path else None
    tid = _use_tid(tmp_path, "khmr")
    KA, TA, SA, RO = "\u1780", "\u178f", "\u179f", "\u179a"
    COENG, E, II, ROBAT = "\u17d2", "\u17c1", "\u17b8", "\u17cc"
    for text in (KA + COENG + RO,            # coeng-ro moves pre-base
                 KA + COENG + KA,            # coeng subscript
                 TA + E,                     # pre-base vowel
                 SA + COENG + KA + ROBAT,    # robat above-base
                 KA + E + COENG + KA,        # cfar: coeng after vowel
                 SA + COENG + RO + II):      # srei
        pg, pc = _py_shape_ex_stream(tid, text)
        gids, adv, dx, dy, clus = nt.shape_ex(tid, text)
        assert list(map(int, gids)) == pg, text
        assert list(map(int, clus)) == pc, text


def test_myanmar_native_parity(tmp_path):
    """Myanmar kinzi (rphf + post-base reorder), medial ra pre-base
    reordering, below/post medials, stacked consonants and the pre-base
    vowel E shape in C exactly like text/use.py."""
    tid = _use_tid(tmp_path, "mymr")
    KA, NGA, ASAT, VIRAMA = "\u1000", "\u1004", "\u103a", "\u1039"
    MEDYA, MEDRA, MEDWA, E = "\u103b", "\u103c", "\u103d", "\u1031"
    for text in (KA + MEDRA,                  # medial ra pre-base
                 NGA + ASAT + VIRAMA + KA,    # kinzi
                 KA + E,                      # pre-base vowel
                 KA + MEDWA + MEDYA,          # below + post medials
                 KA + VIRAMA + KA + E + MEDRA):  # stack + E + medra
        pg, pc = _py_shape_ex_stream(tid, text)
        gids, adv, dx, dy, clus = nt.shape_ex(tid, text)
        assert list(map(int, gids)) == pg, text
        assert list(map(int, clus)) == pc, text


# ---- staged Arabic (FDTP v3) --------------------------------------------------

def _py_shape_ex_stream(tid, text):
    """The Python pipeline's full shaping stream: substitute_ex with source
    codepoints (routes Arabic runs through the staged positional pipeline
    exactly like layout.py's segment loop)."""
    tf = get_typeface(tid)
    shaper = get_shaper(tf)
    cps = [ord(c) for c in text]
    names = [tf.glyph_name(tf.glyph_id(cp)) for cp in cps]
    clusters = [(i, i + 1) for i in range(len(cps))]
    names, clusters, _ = shaper.substitute_ex(
        names, clusters, frozenset(DEFAULT_GSUB_FEATURES), None, cps=cps)
    return [tf._name_to_gid.get(n, 0) for n in names], \
        [c[0] for c in clusters]


def test_arabic_naskh_shape_ex_matches_layout():
    """Noto Naskh Arabic end-to-end: the staged masked pipeline (ccmp
    skeleton+dot decomposition, shared positional lookups, rlig lam-alef)
    PLUS mark anchoring must reproduce layout.py's arrangement bit-exactly
    — the reference shapes this through HarfBuzz's Arabic shaper
    (harfbuzzy.nim; surfer_text_shaping_demo class scenes)."""
    tid = load_typeface(NASKH)
    tf = get_typeface(tid)
    size = 30.0
    rs = size / tf.units_per_em
    for text in ("\u0633\u0644\u0627\u0645",                  # salam
                 "\u0627\u0644\u0639\u0631\u0628\u064a\u0629",  # al-arabiya
                 "\u0628\u0633\u0645 \u0627\u0644\u0644\u0647",  # basmala
                 "\u0645\u064f\u062d\u064e\u0645\u0651\u062f"):  # harakat
        font = FigFont(typeface_id=tid, size=size)
        arr = typeset(vec2(100000, 100),
                      [(font, fill(rgba(0, 0, 0, 255)), text)])
        want = arr.arranged_glyphs
        gids, adv, dx, dy, clus = nt.shape_ex(tid, text, rtl=True)
        assert len(gids) == len(want), text
        for k, g in enumerate(want):
            assert int(gids[k]) == g.glyph_id, (text, k)
            assert abs(float(adv[k]) * rs - g.advance.x) < 1e-6, (text, k)
            assert abs(float(dx[k]) * rs - g.offset.x) < 1e-6, (text, k)
            assert abs(-float(dy[k]) * rs - g.offset.y) < 1e-6, (text, k)


def test_arabic_positional_forms_actually_fire():
    """The masked stages must select DIFFERENT glyphs per position: BEH
    inside a word takes init/medi/fina forms distinct from its isolated
    form, proving the positional lookups fired at the joining analysis'
    positions rather than a global pass."""
    tid = load_typeface(NASKH)
    gi_iso, _, _, _, _ = nt.shape_ex(tid, "\u0628")  # isolated beh
    gi_word, _, _, _, _ = nt.shape_ex(tid, "\u0628\u0628\u0628")
    assert len(set(int(g) for g in gi_word)) >= 2
    assert int(gi_iso[0]) != int(gi_word[0])


def test_arabic_lam_alef_ligature_dejavu():
    """DejaVu's rlig lam-alef must ligate identically to the Python staged
    path (the reference pins uniFEFB on this font); mark-free, so the
    offset-less API also accepts it."""
    tid = load_typeface(DEJAVU)
    text = "\u0644\u0627"  # lam + alef
    pg, pc = _py_shape_ex_stream(tid, text)
    assert len(pg) == 1  # actually ligated
    cg, ca, cc = nt.shape(tid, text)
    assert list(cg) == pg and list(cc) == pc


def test_arabic_mixed_and_fuzz_parity():
    """Mixed Arabic/Latin runs and 120 seeded random strings (letters from
    both Arabic blocks, harakat marks, tatweel, digits, Latin) shape
    glyph-for-glyph equal to Python on Naskh and DejaVu."""
    import random

    rng = random.Random(1234)
    letters = (list(range(0x0621, 0x064B)) + [0x0640]
               + list(range(0x0660, 0x066A))
               + list(range(0x0671, 0x06D4))
               + list(range(0x0750, 0x0780)))
    marks = list(range(0x064B, 0x0660)) + [0x0670]
    latin = [ord(c) for c in "ab X."]
    tids = [load_typeface(NASKH), load_typeface(DEJAVU)]
    cases = ["abc \u0633\u0644\u0627\u0645 xyz"]
    for _ in range(120):
        n = rng.randint(1, 12)
        cps = []
        for _k in range(n):
            r = rng.random()
            if r < 0.55:
                cps.append(rng.choice(letters))
            elif r < 0.8:
                cps.append(rng.choice(marks))
            else:
                cps.append(rng.choice(latin))
        cases.append("".join(chr(c) for c in cps))
    for i, text in enumerate(cases):
        tid = tids[i % 2]
        pg, pc = _py_shape_ex_stream(tid, text)
        cg, _, _, _, cc = nt.shape_ex(tid, text)
        assert list(cg) == pg, (text, [hex(ord(c)) for c in text])
        assert list(cc) == pc, text


def _build_fea_font(tmp_path, filename, cmap, fea):
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
    fb.setupNameTable({"familyName": "PackTest", "styleName": "Regular"})
    fb.setupOS2(sTypoAscender=800, sTypoDescender=-200)
    fb.setupPost()
    addOpenTypeFeaturesFromString(fb.font, fea)
    path = str(tmp_path / filename)
    fb.font.save(path)
    return load_typeface(path)


def test_thai_sara_am_preprocess_native(tmp_path):
    """The C engine runs the HarfBuzz SARA AM decomposition itself: glyph
    stream AND merged clusters equal the Python shaper's (the synthetic
    Thai font of tests/test_shaping_thai.py)."""
    KO, MAI_EK, SARA_AM = 0x0E01, 0x0E48, 0x0E33
    NIK, AA = 0x0E4D, 0x0E32
    cmap = {KO: "ko", MAI_EK: "maiek", NIK: "nikhahit", AA: "saraaa",
            SARA_AM: "saraam"}
    tid = _build_fea_font(tmp_path, "thai.ttf", cmap,
                          "languagesystem DFLT dflt;\n"
                          "feature kern { pos ko maiek -10; } kern;")
    tf = get_typeface(tid)
    gids, adv, clus = nt.shape(tid, [KO, MAI_EK, SARA_AM])
    names = {tf._name_to_gid[n]: n for n in cmap.values()}
    assert [names[int(g)] for g in gids] == [
        "ko", "nikhahit", "maiek", "saraaa"]
    # hb merge_out_clusters: the moved span incl. SARA AA merges to start 1
    assert [int(c) for c in clus] == [0, 1, 1, 1]
    # no SARA AM -> untouched, and the kern pair still applies
    gids2, adv2, clus2 = nt.shape(tid, [KO, MAI_EK])
    assert [names[int(g)] for g in gids2] == ["ko", "maiek"]
    assert float(adv2[0]) == tf.advance(tf._name_to_gid["ko"]) - 10


def test_cursive_attachment_matches_python(tmp_path):
    """GPOS 3 cursive chaining: exit_i meets entry_{i+1}; advances override
    and the vertical offset accumulates — C equals the Python layouter."""
    cmap = {ord("a"): "a", ord("b"): "b", ord("c"): "c", ord(" "): "space"}
    tid = _build_fea_font(
        tmp_path, "curs.ttf", cmap,
        "languagesystem DFLT dflt;\n"
        "feature curs {\n"
        "  position cursive a <anchor 30 60> <anchor 470 90>;\n"
        "  position cursive b <anchor 20 40> <anchor 480 10>;\n"
        "  position cursive c <anchor 10 0> <anchor NULL>;\n"
        "} curs;\n")
    text = "abc ab"
    font = FigFont(typeface_id=tid, size=20.0)
    arr = typeset(vec2(100000, 100),
                  [(font, fill(rgba(0, 0, 0, 255)), text)])
    gids, xs, ys, clus, size = nt.typeset_box(tid, text, 20.0)
    want = arr.arranged_glyphs
    assert len(gids) == len(want)
    for k, g in enumerate(want):
        assert int(gids[k]) == g.glyph_id, k
        assert abs(float(xs[k]) - (g.pos.x + g.offset.x)) < 1e-3, k
        assert abs(float(ys[k]) - (g.pos.y + g.offset.y)) < 1e-3, k
    # the chain actually altered an advance and a vertical offset
    assert any(g.offset.y != 0.0 for g in want)

    # refusal, not degradation: the offset-less advance-stream API cannot
    # carry the chain's nonzero vertical offsets — FD_TYPESET_E_OFFSETS
    # instead of silently flattening the joins onto the baseline; the
    # offset-bearing API shapes the same text fine
    with pytest.raises(nt.NativeTypesetUnsupported, match="cursive dy"):
        nt.shape(tid, "abc")
    _, _, _, dy, _ = nt.shape_ex(tid, "abc")
    assert any(float(v) != 0.0 for v in dy)


def test_reduced_pack_refuses_by_default():
    """FD_PACK_FEATURES_REDUCED text is refused (FD_TYPESET_E_REDUCED)
    unless the host opts into divergence via fd_pack_set_allow_reduced —
    refuse-or-match is the default, divergence is explicit."""
    import ctypes

    tid = load_typeface(DEJAVU)
    blob = bytearray(nt.pack_blob(tid))
    flags = struct.unpack_from("<I", blob, 40)[0]
    struct.pack_into("<I", blob, 40, flags | F_FEATURES_REDUCED)
    lib = nt._load()
    h = lib.fd_pack_load(bytes(blob), len(blob))
    assert h
    try:
        cps = np.array([ord(c) for c in "abc"], np.uint32)
        gids = np.zeros(16, np.uint32)
        adv = np.zeros(16, np.float32)
        cl = np.zeros(16, np.uint32)
        args = (h, cps.ctypes.data_as(ctypes.c_void_p), 3,
                gids.ctypes.data_as(ctypes.c_void_p),
                adv.ctypes.data_as(ctypes.c_void_p),
                cl.ctypes.data_as(ctypes.c_void_p), 16)
        assert lib.fd_typeset_shape(*args) == nt.E_REDUCED
        lib.fd_pack_set_allow_reduced(h, 1)
        assert lib.fd_typeset_shape(*args) == 3
    finally:
        lib.fd_pack_free(h)


def test_utf8_helper():
    tid = load_typeface(DEJAVU)
    text = "Zürich → δ"
    cps = nt.utf8_to_cps(text.encode("utf-8"))
    assert [int(c) for c in cps] == [ord(c) for c in text]


def test_utf8_invalid_sequences_become_replacement():
    """The header's contract: invalid bytes decode as U+FFFD — that covers
    overlong encodings, UTF-16 surrogates and codepoints past U+10FFFF
    (RFC 3629), not just malformed continuation bytes."""
    load_typeface(DEJAVU)
    cases = [
        (b"\xc0\x80", [0xFFFD]),              # overlong NUL
        (b"\xc1\xbf", [0xFFFD]),              # overlong U+007F
        (b"\xe0\x80\xaf", [0xFFFD]),          # overlong 3-byte
        (b"\xed\xa0\x80", [0xFFFD]),          # surrogate U+D800
        (b"\xed\xbf\xbf", [0xFFFD]),          # surrogate U+DFFF
        (b"\xf4\x90\x80\x80", [0xFFFD]),      # U+110000 (> max)
        (b"\xf0\x80\x80\x80", [0xFFFD]),      # overlong 4-byte
        (b"A\xed\xa0\x80B", [65, 0xFFFD, 66]),  # valid context preserved
        (b"\xf4\x8f\xbf\xbf", [0x10FFFF]),    # the actual max is valid
        (b"\xed\x9f\xbf", [0xD7FF]),          # just below surrogates valid
    ]
    for raw, want in cases:
        cps = [int(c) for c in nt.utf8_to_cps(raw)]
        assert cps == want, (raw, cps)
