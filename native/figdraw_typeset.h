/* figdraw_tpu native typesetter — C ABI (libfigdraw_typeset.so)
 *
 * The C-host text surface of figdraw_tpu, the counterpart of the reference
 * dynlib's typeset exports (/root/reference/src/figdraw/bindings/
 * native_bindings.nim:1-628). Shaping itself is a Python subsystem
 * (figdraw_tpu/text/shaper.py over fontTools); a C host instead consumes a
 * COMPILED FONT PACK (FDTP v5, produced offline by
 * figdraw_tpu.text.native_pack.save_font_pack) holding the typeface's
 * metrics plus the shaper's own compiled default-feature plan: single /
 * multiple / ligature / (chain-)contextual / reverse-chain GSUB (with
 * nested lookup application — calt/rclt fonts like FiraCode shape
 * natively), the kern/dist GPOS lookups incl. contextual kerning, GPOS 3
 * cursive chaining, and the GPOS 4/5/6 mark-to-base / mark-to-ligature /
 * mark-to-mark anchor tables. v3 packs additionally carry the staged
 * ARABIC pipeline (Unicode joining classes + per-stage positional plans):
 * Arabic text shapes natively with HarfBuzz-style masked isol/fina/medi/
 * init stages — Noto Naskh-class fonts (ccmp skeleton+dot decomposition,
 * shared positional lookups) shape identically to Python. v4 packs add the
 * SYLLABLE pipelines: Devanagari (syllable segmentation, base/reph
 * analysis, masked basic features, reph/pre-base-matra reordering), Khmer
 * (coeng pairs, pre-base vowel reordering) and Myanmar (kinzi, medials) —
 * FD_TYPESET_E_SCRIPT is no longer returned for any script the Python
 * pipeline stages. v5 packs add the UAX#9 bidi data (an RLE bidi-class
 * table over all of Unicode + the mirrored-property ranges, serialized
 * from the builder's unicodedata): fd_typeset_box runs the full bidi
 * pass — paragraph levels, explicit embeddings/isolates, L1/L2 visual
 * reordering, L4 bracket mirroring — exactly like text/bidi.py, so mixed
 * LTR/RTL paragraphs lay out from C position-for-position equal to the
 * Python layouter. This engine re-applies the plans with semantics
 * identical to the Python pipeline — gids, advances, clusters AND mark
 * offsets match glyph-for-glyph (tests/test_native_typeset.py).
 *
 * fd_typeset_shape_ex stays buffer-level like HarfBuzz: it takes the
 * run's direction and leaves paragraph reordering to the host;
 * fd_typeset_line lays out LTR.
 */
#ifndef FIGDRAW_TYPESET_H
#define FIGDRAW_TYPESET_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct FdFontPack FdFontPack;

/* Error returns from the fd_typeset_* calls. */
#define FD_TYPESET_E_CAP   (-1) /* output capacity too small */
#define FD_TYPESET_E_MARKS (-2) /* the offset-less APIs (fd_typeset_shape /
                                 * fd_typeset_line) cannot express mark
                                 * placement — use fd_typeset_shape_ex or
                                 * fd_typeset_box for mark-bearing text */
#define FD_TYPESET_E_REDUCED (-3) /* pack carries FD_PACK_FEATURES_REDUCED
                                 * and the host did not opt into divergence
                                 * (fd_pack_set_allow_reduced) */
#define FD_TYPESET_E_SCRIPT (-4) /* reserved: no longer returned since
                                 * FDTP v4 (every script the Python
                                 * pipeline stages — Arabic, Devanagari,
                                 * Khmer, Myanmar, Thai/Lao — shapes
                                 * natively); kept for ABI stability */
#define FD_TYPESET_E_OFFSETS (-5) /* the offset-less fd_typeset_shape cannot
                                 * express this run's nonzero vertical
                                 * positioning (GPOS cursive entry/exit dy)
                                 * — use fd_typeset_shape_ex (refusal, not
                                 * silent flat-baseline degradation) */

/* Pack header flag bits (native_pack.py). */
#define FD_PACK_HAS_GPOS_KERN (1u << 0)
#define FD_PACK_GSUB_DROPPED  (1u << 1) /* GSUB entries dropped (unsupported) */
#define FD_PACK_GPOS_DROPPED  (1u << 2) /* GPOS kern entries dropped */
#define FD_PACK_HAS_CURSIVE   (1u << 3) /* GPOS cursive present (exported) */
#define FD_PACK_HAS_MARKS     (1u << 4) /* GPOS mark attachment present
                                 * (exported; see FD_TYPESET_E_MARKS) */
#define FD_PACK_FEATURES_REDUCED (1u << 5) /* the exported plan lost entries
                                 * vs the Python default plan — typesetting
                                 * from such a pack REFUSES by default with
                                 * FD_TYPESET_E_REDUCED; opt into divergence
                                 * with fd_pack_set_allow_reduced */
#define FD_PACK_ARABIC_REDUCED (1u << 6) /* an ARABIC-stage-only lookup lost
                                 * entries: Arabic runs refuse by default
                                 * (same opt-in); non-Arabic text is
                                 * unaffected */
#define FD_PACK_SYLLABLE_REDUCED (1u << 7) /* an Indic/Khmer/Myanmar-stage-
                                 * only lookup lost entries: runs in those
                                 * scripts refuse by default (same opt-in) */

/* Parse an FDTP v5 blob (the bytes of a .fdtp file). The blob is copied;
 * returns NULL on a malformed/truncated blob or wrong magic/version. */
FdFontPack *fd_pack_load(const void *blob, int32_t len);
void fd_pack_free(FdFontPack *pack);

/* Opt this pack into reduced-feature divergence: by default a pack whose
 * header carries FD_PACK_FEATURES_REDUCED refuses to typeset
 * (FD_TYPESET_E_REDUCED) because its output would silently differ from the
 * Python pipeline; a host that accepts that divergence enables it here. */
void fd_pack_set_allow_reduced(FdFontPack *pack, int32_t allow);

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
 * Returns the glyph count, FD_TYPESET_E_CAP if it exceeds cap,
 * FD_TYPESET_E_MARKS if the shaped run contains an attach-capable mark, or
 * FD_TYPESET_E_OFFSETS if positioning yields nonzero vertical offsets
 * (GPOS cursive dy) this advance-stream API cannot carry. */
int32_t fd_typeset_shape(const FdFontPack *pack, const uint32_t *cps,
                         int32_t n, uint32_t *gids, float *advances,
                         uint32_t *clusters, int32_t cap);

/* Full shaping with per-glyph offsets — the HarfBuzz-buffer-shaped API:
 * GSUB (incl. contextual/reverse-chain and the Thai/Lao SARA AM
 * preprocess), GPOS kerning, cursive chaining, and GPOS 4/5/6 mark
 * attachment. Outputs (each may be NULL): gids, advances (font units;
 * attached marks carry 0), dx/dy (font units, y-UP — the draw position of
 * glyph i is pen_i + (dx[i], -dy[i]) at scale), clusters. `rtl` selects the
 * mark-offset convention of an RTL run (the host's visual reversal parks a
 * mark's cursor at its base's origin, so dx omits the pen pullback —
 * layout.py:680-716); the glyph stream stays in LOGICAL order either way,
 * bidi reordering is the host's job (like a HarfBuzz buffer). Returns the
 * glyph count, FD_TYPESET_E_CAP / FD_TYPESET_E_REDUCED. */
int32_t fd_typeset_shape_ex(const FdFontPack *pack, const uint32_t *cps,
                            int32_t n, int32_t rtl, uint32_t *gids,
                            float *advances, float *dx, float *dy,
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
 * Mark attachment and cursive offsets are FOLDED into xs/ys: a host draws
 * glyph i at (xs[i], ys[i]) and attached marks land on their base's
 * anchor. The full UAX#9 bidi pass runs inside (levels from the pack's
 * class tables, L1/L2 visual pen order, L4 mirroring before the cmap) —
 * glyph/cluster storage stays LOGICAL, only positions flip, exactly like
 * layout.py. Returns the glyph count. */
int32_t fd_typeset_box(const FdFontPack *pack, const uint32_t *cps, int32_t n,
                       float size_px, float line_height, float bounds_w,
                       float bounds_h, int32_t h_align, int32_t v_align,
                       int32_t wrap, uint32_t *gids, float *xs, float *ys,
                       uint32_t *clusters, int32_t cap, float *out_size);

/* ---- arrangement geometry ------------------------------------------------
 * The reference exports its GlyphArrangement query suite to C hosts
 * (common/fonttypes.nim:430-808 {.nativeAbi.}: glyphRect, clusterRect,
 * selectionRectsFor, caret positions, glyphIndexAt, ...). fd_typeset_box_
 * make runs the same layout as fd_typeset_box but returns a retained
 * arrangement handle the queries below operate on — all of them
 * position-for-position equal to figdraw_tpu/text/layout.py. */
typedef struct FdArrangement FdArrangement;

/* Lay out and retain; NULL on error (same failure modes as
 * fd_typeset_box). Free with fd_arr_free. */
FdArrangement *fd_typeset_box_make(const FdFontPack *pack,
                                   const uint32_t *cps, int32_t n,
                                   float size_px, float line_height,
                                   float bounds_w, float bounds_h,
                                   int32_t h_align, int32_t v_align,
                                   int32_t wrap);
void fd_arr_free(FdArrangement *a);

int32_t fd_arr_glyph_count(const FdArrangement *a);
/* The draw stream (same as fd_typeset_box's outputs; each may be NULL). */
int32_t fd_arr_glyphs(const FdArrangement *a, uint32_t *gids, float *xs,
                      float *ys, uint32_t *clusters, int32_t cap);
/* out_size[2] = {max visible line width, total height}. */
void fd_arr_content_size(const FdArrangement *a, float *out_size);
int32_t fd_arr_line_count(const FdArrangement *a);
/* out[2] = inclusive glyph index range of a line; -1 if out of range. */
int32_t fd_arr_line_range(const FdArrangement *a, int32_t line,
                          int32_t *out);
/* out[4] = {x, y, w, h}: the glyph's advance box at its line
 * (layout.py g.rect — pen x BEFORE mark offsets, line top, advance,
 * line height). */
void fd_arr_glyph_rect(const FdArrangement *a, int32_t i, float *out);
/* Bounding rect of the whole shaped cluster containing glyph i
 * (clusterRectForGlyph). */
void fd_arr_cluster_rect(const FdArrangement *a, int32_t i, float *out);
/* out[2] = the glyph's source rune range [start, end); -1 if out of
 * range. Ligatures span several runes; marks share their base's range. */
int32_t fd_arr_source_range(const FdArrangement *a, int32_t i,
                            uint32_t *out);
/* Glyph index range covering source runes [a, b] INCLUSIVE (glyphRangeFor);
 * out = {lo, hi}; -1 (out = {0, -1}) when no glyph intersects. */
int32_t fd_arr_glyph_range_for(const FdArrangement *a, int32_t ra,
                               int32_t rb, int32_t *out);
/* Per-line merged visual selection bands for source runes [ra, rb]
 * INCLUSIVE (selectionRectsFor): contiguous selected glyphs merge, an
 * unselected glyph VISUALLY in between splits, partial ligature coverage
 * clips the band. rects = 4 floats {x,y,w,h} per band. Returns the band
 * count (may exceed cap — call again with a larger buffer; rects may be
 * NULL for a pure count query, with any cap). */
int32_t fd_arr_selection_rects(const FdArrangement *a, int32_t ra,
                               int32_t rb, float *rects, int32_t cap);
/* Visual caret position(s) at a source insertion index — bidi boundaries
 * can produce more than one. out = 6 floats per entry: {x, y (caret top),
 * h, line index, glyph index (-1 for the empty arrangement), affinity
 * 0 leading / 1 trailing / 2 inside}. Returns the entry count (may exceed
 * cap; the count is the same whatever cap/out are — bidi-doubled carets
 * dedup before capping). out may be NULL for a pure count query, with
 * any cap. The fixed-size out pointers above (line_range, glyph_rect,
 * cluster_rect, source_range, glyph_range_for, content_size) must be
 * non-NULL. */
int32_t fd_arr_caret_positions(const FdArrangement *a, int32_t source_rune,
                               float *out, int32_t cap);
/* Glyph index whose advance box contains the local point, or -1. */
int32_t fd_arr_glyph_index_at(const FdArrangement *a, float x, float y);
/* Closest insertion index to a local point, measured against every caret
 * position (vertical distance counts only outside the caret's line). */
int32_t fd_arr_nearest_source_rune(const FdArrangement *a, float x,
                                   float y);

/* UTF-8 → codepoints helper (len < 0 = NUL-terminated). Invalid bytes decode
 * as U+FFFD. Returns the codepoint count, or FD_TYPESET_E_CAP. */
int32_t fd_utf8_to_cps(const char *utf8, int32_t len, uint32_t *cps,
                       int32_t cap);

#ifdef __cplusplus
}
#endif

#endif /* FIGDRAW_TYPESET_H */
