"""Compiled font packs for the native C typesetter (FDTP v1).

The reference's dynlib exports the WHOLE text API to C hosts
(/root/reference/src/figdraw/bindings/native_bindings.nim:1-628 typeset/
computeLayout); here shaping is a Python subsystem (text/shaper.py), so C
hosts get a compiled-table path instead: this module serializes a typeface's
metrics plus the SHAPER'S OWN COMPILED PLAN — the simple-script GSUB lookups
(single / multiple / ligature entries with their LookupFlag skip state) and
the kern-feature GPOS lookups (single / pair / class-pair) — into one flat
little-endian blob that native/typeset.cpp re-applies with identical
semantics. Scope is the simple-script pipeline (no bidi reordering, no
staged Arabic/Indic/USE shaping, no contextual lookups): Latin/Cyrillic/
Greek-class text typeset from C matches the Python pipeline glyph-for-glyph
(tests/test_native_typeset.py); complex scripts stay Python-side — the
documented ABI boundary (docs/native_api.md).

Blob layout (all little-endian, naturally aligned):
  header:  u32 magic 'FDTP'  u32 version=1
           f32 upem  f32 ascent  f32 descent  f32 line_gap   (font units)
           u32 n_glyphs  u32 n_cmap  u32 n_sub  u32 n_pos
           u32 flags  u32 n_kern0
  cmap:    n_cmap x {u32 codepoint, u32 gid}        sorted by codepoint
  adv:     n_glyphs x f32                            advances (font units)
  gdef:    n_glyphs x u8: low nibble = GDEF glyph class (0..4); bit 7 set
           when the glyph is an attach-capable mark (GPOS 4/5/6 mark
           coverage — text containing one cannot be typeset natively)
           + pad to 4
  mattach: n_glyphs x u8 MarkAttachClassDef class    + pad to 4
  lookups: (n_sub + n_pos) records, GSUB first. One record per OpenType
           LOOKUP (entry grouping is load-bearing: a lookup's subtable
           entries are tried in order at each position, first match wins —
           splitting them into separate passes would change application
           order):
           u32 skip_classes(bit k = GDEF class k ignored)  u32 attach_class
           u32 filter_state (0 no filter set, 1 empty set, 2 present)
           u32 filter_n  [filter gids u16[], pad to 4]
           u32 n_entries, then per entry:
           u32 kind  u32 count  payload (pad to 4; see native/typeset.cpp)
  kern0:   n_kern0 x {u16 left, u16 right, i16 value, i16 0}   sorted by
           (left, right) — the legacy 'kern' table, applied only when the
           font has no GPOS kern feature (mirrors layout.py's elif branch)

`flags` bits record fidelity losses relative to the Python pipeline:
  bit 0  font has a GPOS kern/dist feature (C must NOT fall back to kern0)
  bit 1  the exported GSUB plan dropped contextual/rchain entries
  bit 2  the exported GPOS kern lookups dropped contextual entries
  bit 3  font has GPOS cursive attachment (curs) — not exported
  bit 4  font has GPOS mark attachment (4/5/6) — not exported
  bit 5  the font's default-feature plan (calt/rclt included) selects more
         lookups than the exported plan — contextual-alternate fonts like
         FiraCode shape differently in C than in Python BY DESIGN
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional

from .shaper import get_shaper
from .typefaces import get_typeface

MAGIC = 0x46445450  # 'FDTP'
VERSION = 1

# entry kinds (within a lookup record)
K_SINGLE = 1     # count x {u16 from, u16 to}                     sorted by from
K_MULTIPLE = 2   # count x {u16 from, u16 seq_n, u16 seq[...]}
K_LIGA = 4       # count x {u16 first, u16 rest_n, u16 result, u16 rest[...]}
                 # (emission order is load-bearing: same-first candidates are
                 # tried in order, longest component chain first)
K_POS1 = 17      # count x {u16 gid, i16 dx}                      sorted by gid
K_POS2S = 18     # count x {u16 g1, u16 g2, i16 v1, i16 v2}       sorted
K_POS2C = 19     # count=1; payload: {u32 n_cov, n_cd1, n_cd2, c1, c2} +
                 # cov u16[] pad4 + cd1/cd2 {u16 gid, u16 cls}[] (sorted) +
                 # matrix (c1*c2) x {i16 v1, i16 v2}

# header flags
F_HAS_GPOS_KERN = 1 << 0
F_GSUB_DROPPED = 1 << 1
F_GPOS_DROPPED = 1 << 2
F_HAS_CURSIVE = 1 << 3
F_HAS_MARKS = 1 << 4
F_FEATURES_REDUCED = 1 << 5
MARK_BIT = 0x80  # gdef byte: attach-capable mark (GPOS 4/5/6 coverage)

# the simple-script feature set typeset() resolves for Latin runs
# (shaper.DEFAULT_GSUB_FEATURES minus the contextual-only tags the native
# engine cannot honor — exporting calt/rclt lookups would silently change
# which lookups fire relative to the Python pipeline when their subtables
# are skipped, so they are excluded from the plan itself)
PACK_GSUB_FEATURES = frozenset({"ccmp", "liga", "clig", "rlig", "locl"})


def _gid(tf, name: str) -> int:
    return tf._name_to_gid.get(name, 0)


def _u16s(vals) -> bytes:
    return struct.pack("<%dH" % len(vals), *vals)


def _pad4(b: bytearray) -> None:
    while len(b) % 4:
        b.append(0)


def _skip_words(tf, skip) -> tuple:
    """(skip_classes bitmask, attach_class, filter gid list or None)."""
    classes, filter_set, attach_class = skip
    mask = 0
    for c in classes:
        mask |= 1 << c
    gids = None
    if filter_set is not None:
        gids = sorted(_gid(tf, n) for n in filter_set)
    return mask, int(attach_class or 0), gids


def _emit_record(tf, out: bytearray, skip, entries) -> None:
    """One lookup record: skip state + its subtable entries in order.
    `entries` is a list of (kind, count, payload bytes)."""
    mask, attach, gids = _skip_words(tf, skip)
    filter_state = 0 if gids is None else (1 if not gids else 2)
    out += struct.pack("<IIII", mask, attach, filter_state,
                       len(gids) if gids else 0)
    if gids:
        out += _u16s(gids)
        _pad4(out)
    out += struct.pack("<I", len(entries))
    for kind, count, payload in entries:
        out += struct.pack("<II", kind, count)
        out += payload
        _pad4(out)


def build_font_pack(typeface_id: int) -> bytes:
    """Serialize the typeface's metrics + compiled simple-script plan."""
    tf = get_typeface(typeface_id)
    shaper = get_shaper(tf)

    n_glyphs = max(tf._name_to_gid.values(), default=0) + 1

    cmap_items = []
    for cp, name in tf.cmap.items():
        cmap_items.append((int(cp), _gid(tf, name)))
    cmap_items.sort()

    adv = [0.0] * n_glyphs
    for name, gid in tf._name_to_gid.items():
        adv[gid] = float(tf.advance(gid))

    flags = 0
    gdef_cls = bytearray(n_glyphs)
    mattach = bytearray(n_glyphs)
    if shaper is not None:
        for name, cls in shaper._gdef_class.items():
            g = _gid(tf, name)
            if g:
                gdef_cls[g] = min(int(cls), 0x7F)
        for name, cls in shaper._mark_attach_class.items():
            g = _gid(tf, name)
            if g:
                mattach[g] = min(int(cls), 255)
        for name in shaper._mark_glyphs:
            g = _gid(tf, name)
            if g:
                gdef_cls[g] |= MARK_BIT
        if shaper.has_gpos_kern:
            flags |= F_HAS_GPOS_KERN
        if shaper._cursive:
            flags |= F_HAS_CURSIVE
        if shaper._mark_base or shaper._mark_lig or shaper._mark_mark:
            flags |= F_HAS_MARKS
        from .shaper import DEFAULT_GSUB_FEATURES
        plan_default = shaper._plan(frozenset(DEFAULT_GSUB_FEATURES), None)
        plan_pack = shaper._plan(PACK_GSUB_FEATURES, None)
        if [id(lk) for lk in plan_default] != [id(lk) for lk in plan_pack]:
            flags |= F_FEATURES_REDUCED

    sub_blobs = bytearray()
    n_sub = 0
    pos_blobs = bytearray()
    n_pos = 0
    if shaper is not None:
        for skip, entries, _triggers in shaper._plan(PACK_GSUB_FEATURES, None):
            packed = []
            dropped = False
            for entry in entries:
                ekind = entry[0]
                if ekind == "single":
                    rows = sorted((_gid(tf, a), _gid(tf, b))
                                  for a, b in entry[1].items())
                    payload = bytearray()
                    for a, b in rows:
                        payload += struct.pack("<HH", a, b)
                    packed.append((K_SINGLE, len(rows), bytes(payload)))
                elif ekind == "multiple":
                    payload = bytearray()
                    cnt = 0
                    for a, seq in entry[1].items():
                        payload += struct.pack("<HH", _gid(tf, a), len(seq))
                        payload += _u16s([_gid(tf, s) for s in seq])
                        cnt += 1
                    packed.append((K_MULTIPLE, cnt, bytes(payload)))
                elif ekind == "liga":
                    # font order within the lookup is load-bearing
                    # (first-match-wins at each position)
                    payload = bytearray()
                    cnt = 0
                    for first, ents in entry[1].items():
                        fg = _gid(tf, first)
                        for comp_seq, lig in ents:
                            payload += struct.pack(
                                "<HHH", fg, len(comp_seq), _gid(tf, lig))
                            payload += _u16s([_gid(tf, c) for c in comp_seq])
                            cnt += 1
                    packed.append((K_LIGA, cnt, bytes(payload)))
                else:
                    # contextual FEATURES (calt/rclt) are excluded from the
                    # plan, but a plan lookup can still carry ctx/rchain
                    # subtables (e.g. DejaVu ccmp's dotlessi chain) — the
                    # entry is dropped and the loss recorded
                    dropped = True
            if dropped:
                flags |= F_GSUB_DROPPED
            if packed:
                _emit_record(tf, sub_blobs, skip, packed)
                n_sub += 1

        if shaper.has_gpos_kern:
            for li in shaper._kern_lookup_indices():
                skip, entries = shaper._compile_gpos_lookup(li)
                packed = []
                dropped = False
                for entry in entries:
                    ekind = entry[0]
                    if ekind == "pos1":
                        rows = sorted((_gid(tf, g), int(v))
                                      for g, v in entry[1].items())
                        payload = bytearray()
                        for g, v in rows:
                            payload += struct.pack("<Hh", g, v)
                        packed.append((K_POS1, len(rows), bytes(payload)))
                    elif ekind == "pos2s":
                        rows = sorted(
                            (_gid(tf, a), _gid(tf, b), int(v1), int(v2))
                            for (a, b), (v1, v2) in entry[1].items())
                        payload = bytearray()
                        for a, b, v1, v2 in rows:
                            payload += struct.pack("<HHhh", a, b, v1, v2)
                        packed.append((K_POS2S, len(rows), bytes(payload)))
                    elif ekind == "pos2c":
                        data = entry[1]
                        cov = sorted(_gid(tf, n) for n in data["cov"])
                        cd1 = sorted((_gid(tf, n), int(c))
                                     for n, c in data["cd1"].items())
                        cd2 = sorted((_gid(tf, n), int(c))
                                     for n, c in data["cd2"].items())
                        c1 = 1 + max([c for _, c in cd1] +
                                     [c1c2[0] for c1c2 in data["m"]] + [0])
                        c2 = 1 + max([c for _, c in cd2] +
                                     [c1c2[1] for c1c2 in data["m"]] + [0])
                        payload = bytearray()
                        payload += struct.pack("<IIIII", len(cov), len(cd1),
                                               len(cd2), c1, c2)
                        payload += _u16s(cov)
                        _pad4(payload)
                        for g, c in cd1:
                            payload += struct.pack("<HH", g, c)
                        for g, c in cd2:
                            payload += struct.pack("<HH", g, c)
                        mat = [(0, 0)] * (c1 * c2)
                        for (a, b), (v1, v2) in data["m"].items():
                            mat[a * c2 + b] = (int(v1), int(v2))
                        for v1, v2 in mat:
                            payload += struct.pack("<hh", v1, v2)
                        packed.append((K_POS2C, 1, bytes(payload)))
                    else:
                        dropped = True
                if dropped:
                    flags |= F_GPOS_DROPPED
                if packed:
                    _emit_record(tf, pos_blobs, skip, packed)
                    n_pos += 1

    # legacy 'kern' table: the layout fallback for GPOS-less fonts
    # (layout.py:717-725 elif branch) — exported only when that branch
    # can fire, so the blob stays small for GPOS fonts
    kern0 = []
    if shaper is None or not shaper.has_gpos_kern:
        for (ln, rn), v in getattr(tf, "_kern", {}).items():
            lg, rg = _gid(tf, ln), _gid(tf, rn)
            if (lg or rg) and v:
                kern0.append((lg, rg, int(v)))
        kern0.sort()

    out = bytearray()
    out += struct.pack("<IIffff", MAGIC, VERSION, float(tf.units_per_em),
                       float(tf.ascent), float(tf.descent),
                       float(tf.line_gap))
    out += struct.pack("<IIIIII", n_glyphs, len(cmap_items), n_sub, n_pos,
                       flags, len(kern0))
    for cp, gid in cmap_items:
        out += struct.pack("<II", cp, gid)
    out += struct.pack("<%df" % n_glyphs, *adv)
    out += bytes(gdef_cls)
    _pad4(out)
    out += bytes(mattach)
    _pad4(out)
    out += sub_blobs
    out += pos_blobs
    for lg, rg, v in kern0:
        out += struct.pack("<HHhh", lg, rg, v, 0)
    return bytes(out)


def save_font_pack(typeface_id: int, path: str) -> None:
    with open(path, "wb") as fh:
        fh.write(build_font_pack(typeface_id))
