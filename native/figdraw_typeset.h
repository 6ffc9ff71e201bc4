/* figdraw_tpu native typesetter — C ABI (libfigdraw_typeset.so)
 *
 * The C-host text surface of figdraw_tpu, the counterpart of the reference
 * dynlib's typeset exports (/root/reference/src/figdraw/bindings/
 * native_bindings.nim:1-628). Shaping itself is a Python subsystem
 * (figdraw_tpu/text/shaper.py over fontTools); a C host instead consumes a
 * COMPILED FONT PACK (FDTP v1, produced offline by
 * figdraw_tpu.text.native_pack.save_font_pack) holding the typeface's
 * metrics plus the shaper's own compiled simple-script plan. This engine
 * re-applies that plan with semantics identical to the Python pipeline:
 * Latin/Cyrillic/Greek-class text shapes glyph-for-glyph the same
 * (tests/test_native_typeset.py pins it). Complex scripts (bidi, staged
 * Arabic/Indic/USE shaping, GPOS mark attachment) stay Python-side — the
 * documented ABI boundary (docs/native_api.md); text needing them is
 * REFUSED (FD_TYPESET_E_MARKS) rather than mis-shaped.
 */
#ifndef FIGDRAW_TYPESET_H
#define FIGDRAW_TYPESET_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct FdFontPack FdFontPack;

/* Error returns from fd_typeset_shape / fd_typeset_line. */
#define FD_TYPESET_E_CAP   (-1) /* output capacity too small */
#define FD_TYPESET_E_MARKS (-2) /* text needs GPOS mark positioning —
                                 * typeset it through the Python pipeline */

/* Pack header flag bits (native_pack.py): fidelity losses vs Python. */
#define FD_PACK_HAS_GPOS_KERN (1u << 0)
#define FD_PACK_GSUB_DROPPED  (1u << 1) /* contextual GSUB entries dropped */
#define FD_PACK_GPOS_DROPPED  (1u << 2) /* contextual kern entries dropped */
#define FD_PACK_HAS_CURSIVE   (1u << 3) /* GPOS cursive not exported */
#define FD_PACK_HAS_MARKS     (1u << 4) /* GPOS mark attachment not exported */
#define FD_PACK_FEATURES_REDUCED (1u << 5) /* the font's default-feature plan
                                 * (calt/rclt) selects more lookups than the
                                 * exported plan — contextual-alternate fonts
                                 * (e.g. FiraCode) shape differently in C */

/* Parse an FDTP v1 blob (the bytes of a .fdtp file). The blob is copied;
 * returns NULL on a malformed/truncated blob or wrong magic/version. */
FdFontPack *fd_pack_load(const void *blob, int32_t len);
void fd_pack_free(FdFontPack *pack);

/* Font metrics in FONT UNITS: which = 0 unitsPerEm, 1 ascent, 2 descent
 * (negative), 3 lineGap. Scale by (size_px / unitsPerEm). */
float fd_pack_metric(const FdFontPack *pack, int32_t which);
uint32_t fd_pack_flags(const FdFontPack *pack);
int32_t fd_pack_glyph_count(const FdFontPack *pack);

/* cmap: codepoint -> glyph id (0 = .notdef). */
uint32_t fd_pack_glyph_id(const FdFontPack *pack, uint32_t codepoint);

/* Unshaped horizontal advance of a glyph, font units. */
float fd_pack_advance(const FdFontPack *pack, uint32_t gid);

/* Shape a codepoint run: cmap mapping, the compiled GSUB plan (single /
 * multiple / ligature lookups with LookupFlag skipping), then kerning —
 * the GPOS kern feature (single / pair / class-pair) when the pack has it,
 * else the legacy 'kern' table folded into the left glyph's advance
 * (layout.py's elif branch).
 *
 * Outputs (each may be NULL to skip): gids, advances (font units, kern
 * included), clusters (source index of each glyph's first codepoint;
 * ligatures keep their first component's index — HarfBuzz cluster model).
 * Returns the glyph count, FD_TYPESET_E_CAP if it exceeds cap, or
 * FD_TYPESET_E_MARKS if the shaped run contains an attach-capable mark. */
int32_t fd_typeset_shape(const FdFontPack *pack, const uint32_t *cps,
                         int32_t n, uint32_t *gids, float *advances,
                         uint32_t *clusters, int32_t cap);

/* Single-line placement at size_px: fd_typeset_shape + pen sweep. xs[i] is
 * glyph i's pen x in px (xs[0] = 0); *baseline gets the line-top→baseline
 * offset round(ascent + lineGap/2) scaled (pixie.nim:41-42 formula,
 * layout.py:495). Same returns as fd_typeset_shape. */
int32_t fd_typeset_line(const FdFontPack *pack, const uint32_t *cps,
                        int32_t n, float size_px, uint32_t *gids, float *xs,
                        uint32_t *clusters, int32_t cap, float *baseline);

/* Full box typeset at size_px: the C counterpart of the Python layouter's
 * typeset() (figdraw_tpu/text/layout.py; the reference dynlib's typeset
 * export, bindings/native_bindings.nim). Shapes per newline-delimited
 * segment (ligatures never cross '\n'; the '\n' itself is emitted as a
 * zero-advance gid-0 glyph), greedy-wraps at whitespace/CJK break points
 * with reflow when wrap != 0 and bounds_w > 0, then positions glyphs:
 * xs/ys[i] are glyph i's pen position in px (ys at the line baseline,
 * round(ascent + lineGap/2) below the line top). line_height <= 0 selects
 * the font default (ascent - descent + lineGap, scaled). h_align:
 * 0 left / 1 center / 2 right (against bounds_w, trailing whitespace
 * excluded); v_align: 0 top / 1 middle / 2 bottom (against bounds_h).
 * out_size (may be NULL) receives {max visible line width, total height}.
 * Bidi and complex scripts stay Python-side: same FD_TYPESET_E_MARKS
 * refusal contract as fd_typeset_shape. Returns the glyph count. */
int32_t fd_typeset_box(const FdFontPack *pack, const uint32_t *cps, int32_t n,
                       float size_px, float line_height, float bounds_w,
                       float bounds_h, int32_t h_align, int32_t v_align,
                       int32_t wrap, uint32_t *gids, float *xs, float *ys,
                       uint32_t *clusters, int32_t cap, float *out_size);

/* UTF-8 → codepoints helper (len < 0 = NUL-terminated). Invalid bytes decode
 * as U+FFFD. Returns the codepoint count, or FD_TYPESET_E_CAP. */
int32_t fd_utf8_to_cps(const char *utf8, int32_t len, uint32_t *cps,
                       int32_t cap);

#ifdef __cplusplus
}
#endif

#endif /* FIGDRAW_TYPESET_H */
