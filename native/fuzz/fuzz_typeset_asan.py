"""ASan/UBSan fuzz of the fd_arr_* arrangement-geometry C ABI.

Drives fd_typeset_box_make + every fd_arr_* query with adversarial inputs
(mixed scripts incl. RTL/bidi controls, degenerate bounds, out-of-range
indices, cap=0 count queries, undersized caps, NULL output mixes) against
an -fsanitize=address,undefined build of native/typeset.cpp. Also hammers
fd_utf8_to_cps with random byte soup and fd_pack_load with truncated /
bit-flipped blobs. Any OOB read/write, UB, or crash aborts the process.
"""
import ctypes
import random
import struct
import sys

sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), "..", ".."))

from figdraw_tpu.text.native_pack import build_font_pack
from figdraw_tpu.text.typefaces import load_typeface

LIB = ctypes.CDLL("/tmp/libfigdraw_typeset_asan.so")
LIB.fd_pack_load.restype = ctypes.c_void_p
LIB.fd_pack_load.argtypes = [ctypes.c_char_p, ctypes.c_int32]
LIB.fd_typeset_box_make.restype = ctypes.c_void_p
LIB.fd_typeset_box_make.argtypes = [
    ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32), ctypes.c_int32,
    ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
    ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
for name, res, args in [
    ("fd_arr_free", None, [ctypes.c_void_p]),
    ("fd_arr_glyph_count", ctypes.c_int32, [ctypes.c_void_p]),
    ("fd_arr_glyphs", ctypes.c_int32,
     [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
      ctypes.c_void_p, ctypes.c_int32]),
    ("fd_arr_content_size", None, [ctypes.c_void_p, ctypes.c_void_p]),
    ("fd_arr_line_count", ctypes.c_int32, [ctypes.c_void_p]),
    ("fd_arr_line_range", ctypes.c_int32,
     [ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p]),
    ("fd_arr_glyph_rect", None,
     [ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p]),
    ("fd_arr_cluster_rect", None,
     [ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p]),
    ("fd_arr_source_range", ctypes.c_int32,
     [ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p]),
    ("fd_arr_glyph_range_for", ctypes.c_int32,
     [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p]),
    ("fd_arr_selection_rects", ctypes.c_int32,
     [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
      ctypes.c_int32]),
    ("fd_arr_caret_positions", ctypes.c_int32,
     [ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32]),
    ("fd_arr_glyph_index_at", ctypes.c_int32,
     [ctypes.c_void_p, ctypes.c_float, ctypes.c_float]),
    ("fd_arr_nearest_source_rune", ctypes.c_int32,
     [ctypes.c_void_p, ctypes.c_float, ctypes.c_float]),
    ("fd_utf8_to_cps", ctypes.c_int32,
     [ctypes.c_char_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32]),
]:
    fn = getattr(LIB, name)
    fn.restype = res
    fn.argtypes = args

FONTS = [
    "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    "/root/reference/data/Ubuntu.ttf",
]
ARABIC = "/root/reference/examples/fonts/NotoNaskhArabic-wght.ttf"
import os
if os.path.exists(ARABIC):
    FONTS.append(ARABIC)

rng = random.Random(20260820)

POOLS = [
    "Hello, World! fi ffl office",
    "السلام عليكم",
    "abc שָׁלוֹם xyz",
    "क्षि र्क का",
    "‏‫mix‬‎ 123 ١٢٣",
    "line one\nline two\n\nlast",
    "�  \t  spaced out",
    "\U0001F600 beyond bmp \U00010400",
]

packs = []
for f in FONTS:
    try:
        tid = load_typeface(f)
        blob = bytes(build_font_pack(tid))
        h = LIB.fd_pack_load(blob, len(blob))
        if h:
            packs.append((f.split("/")[-1], h, blob))
    except Exception as e:
        print("pack build skipped", f, e)

assert packs, "no packs loaded"
print("packs:", [p[0] for p in packs])

# --- 1. fd_pack_load on truncated + corrupted blobs ---
name0, _, blob0 = packs[0]
for cut in [0, 1, 3, 7, 8, 16, 64, len(blob0) // 3, len(blob0) - 1]:
    h = LIB.fd_pack_load(blob0[:cut], cut)
    assert not h or cut == len(blob0), f"truncated blob accepted at {cut}"
for _ in range(400):
    b = bytearray(blob0)
    for _ in range(rng.randint(1, 8)):
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
    h = LIB.fd_pack_load(bytes(b), len(b))
    if h:  # corrupt blob may still parse; SHAPING on it must then stay safe
        soup = (ctypes.c_uint32 * 24)(*[rng.choice(
            [0x41, 0x66, 0x69, 0x5D0, 0x627, 0x915, 0x20, 0x31])
            for _ in range(24)])
        a = LIB.fd_typeset_box_make(h, soup, 24, 16.0, 0.0, 120.0, 0.0,
                                    1, 0, 1)
        if a:
            c = LIB.fd_arr_glyph_count(a)
            g = (ctypes.c_uint32 * max(c, 1))()
            x = (ctypes.c_float * max(c, 1))()
            LIB.fd_arr_glyphs(a, g, x, x, g, c)
            r = (ctypes.c_float * 4)()
            for i in range(-1, c + 1):
                LIB.fd_arr_cluster_rect(a, i, r)
            LIB.fd_arr_free(a)
        if hasattr(LIB, "fd_pack_free"):
            LIB.fd_pack_free(ctypes.c_void_p(h))
print("pack_load fuzz ok")

# --- 2. fd_utf8_to_cps byte soup ---
buf = (ctypes.c_uint32 * 512)()
for _ in range(2000):
    n = rng.randint(0, 64)
    raw = bytes(rng.randrange(256) for _ in range(n))
    cap = rng.choice([0, 1, n // 2, 512])
    LIB.fd_utf8_to_cps(raw, n, buf if cap else None, cap)
    LIB.fd_utf8_to_cps(raw + b"\x00", -1, buf, 512)
print("utf8 fuzz ok")

# --- 3. arrangement query hammer ---
made = 0
queried = 0
for it in range(1500):
    _, pack, _ = rng.choice(packs)
    text = "".join(rng.choice(POOLS)[rng.randrange(0, 8):][:rng.randint(0, 40)]
                   for _ in range(rng.randint(1, 3)))
    cps = [ord(c) for c in text]
    # occasionally inject random codepoints incl. invalid planes
    for _ in range(rng.randint(0, 4)):
        cps.insert(rng.randint(0, len(cps)) if cps else 0,
                   rng.choice([0, 0x20, 0x61, 0x5D0, 0x627, 0x915,
                               0x10FFFF, 0xFFFE, 0x200B, 0x202E, 0xD7FF]))
    n = len(cps)
    arr_cps = (ctypes.c_uint32 * max(n, 1))(*cps)
    bw = rng.choice([0.0, -5.0, 1.0, 37.5, 200.0, 1e6, float("inf")])
    bh = rng.choice([0.0, -5.0, 24.0, 1000.0])
    a = LIB.fd_typeset_box_make(
        pack, arr_cps, n, rng.choice([0.0, 1.0, 13.7, 64.0]),
        rng.choice([0.0, -1.0, 18.0]), bw, bh,
        rng.randint(-1, 3), rng.randint(-1, 3), rng.randint(-1, 2))
    if not a:
        continue
    made += 1
    cnt = LIB.fd_arr_glyph_count(a)
    assert 0 <= cnt <= 4 * max(n, 1) + 16, cnt
    # draw stream: every NULL combination + cap patterns
    gids = (ctypes.c_uint32 * max(cnt, 1))()
    xs = (ctypes.c_float * max(cnt, 1))()
    ys = (ctypes.c_float * max(cnt, 1))()
    cl = (ctypes.c_uint32 * max(cnt, 1))()
    for cap in [0, cnt // 2, cnt]:
        LIB.fd_arr_glyphs(a, gids, xs, ys, cl, cap)
        LIB.fd_arr_glyphs(a, None, xs, None, cl, cap)
        LIB.fd_arr_glyphs(a, None, None, None, None, cap)
    sz = (ctypes.c_float * 2)()
    LIB.fd_arr_content_size(a, sz)
    lc = LIB.fd_arr_line_count(a)
    pair = (ctypes.c_int32 * 2)()
    upair = (ctypes.c_uint32 * 2)()
    r4 = (ctypes.c_float * 4)()
    for line in [-2, -1, 0, lc - 1, lc, lc + 3, 2 ** 30]:
        LIB.fd_arr_line_range(a, line, pair)
    idxs = {-2, -1, 0, cnt - 1, cnt, cnt + 7, 2 ** 30}
    idxs.update(rng.randrange(-3, cnt + 3) for _ in range(6))
    for i in idxs:
        LIB.fd_arr_glyph_rect(a, i, r4)
        LIB.fd_arr_cluster_rect(a, i, r4)
        LIB.fd_arr_source_range(a, i, upair)
        queried += 4
    INT32_MAX = 2 ** 31 - 1
    for _ in range(8):
        ra = rng.randint(-3, n + 3)
        rb = rng.choice([rng.randint(-3, n + 3), INT32_MAX, -(2 ** 31)])
        LIB.fd_arr_glyph_range_for(a, ra, rb, pair)
        need = LIB.fd_arr_selection_rects(a, ra, rb, None, 0)
        assert need >= 0 or need == -3, need
        # NULL rects with a NONZERO cap is part of the count-query
        # contract and must neither write nor read through NULL
        assert LIB.fd_arr_selection_rects(a, ra, rb, None, 16) == need
        if need > 0:
            bands = (ctypes.c_float * (4 * need))()
            got = LIB.fd_arr_selection_rects(a, ra, rb, bands, need)
            assert got == need, (got, need)
            # undersized cap must not overwrite past cap
            if need > 1:
                small = (ctypes.c_float * 4)()
                LIB.fd_arr_selection_rects(a, ra, rb, small, 1)
        nc = LIB.fd_arr_caret_positions(a, ra, None, 0)
        # same NULL-with-cap contract, and the cap=0 count must match
        # what a full-size call actually writes (dedup before capping)
        assert LIB.fd_arr_caret_positions(a, ra, None, 16) == nc
        if nc > 0:
            cp_out = (ctypes.c_float * (6 * nc))()
            assert LIB.fd_arr_caret_positions(a, ra, cp_out, nc) == nc
            LIB.fd_arr_caret_positions(a, ra, cp_out, 1)
        x = rng.uniform(-1e3, 1e3)
        y = rng.uniform(-1e3, 1e3)
        LIB.fd_arr_glyph_index_at(a, x, y)
        LIB.fd_arr_nearest_source_rune(a, x, y)
        queried += 6
    LIB.fd_arr_free(a)
LIB.fd_arr_free(None)
print(f"arrangement fuzz ok: {made} arrangements, ~{queried} queries")
print("ALL FUZZ PASSED")
