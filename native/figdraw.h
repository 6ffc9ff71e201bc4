/* figdraw.h — single-header C convenience layer over the raw figdraw_tpu
 * ABI (figdraw_flatten.h + figdraw_typeset.h), the analog of the
 * reference's dynlib consumer shim (/root/reference/src/figdraw/dynlib.nim:
 * 1-30 recreates the ergonomic API on top of the raw exports so examples
 * run unchanged against the .so).
 *
 * Everything is static inline C99 — include this one header, link
 * -lfigdraw_flatten (and -lfigdraw_typeset for text). Field offsets come
 * from the GENERATED figdraw_layout.h (regenerate with
 * native/gen_layout.py after any dtype change; fdx_scene_new validates the
 * struct sizes against the loaded library at runtime).
 *
 * Surface:
 *   FdxFig builders   fdx_rect / fdx_image / fdx_node + fdx_solid /
 *                     fdx_linear / fdx_corners / fdx_stroke / fdx_shadow /
 *                     fdx_rotation / fdx_flags / fdx_transform
 *   FdxScene          error-checked addRoot/addChild/flatten with a sticky
 *                     first-error message (fdx_scene.err)
 *   retained edits    fdx_snapshot (spans + reserves) / fdx_set_fig /
 *                     fdx_patch_root — the whole scratch-walk patch recipe
 *                     from docs/native_api.md as one call
 *   typesetting       fdx_pack_load_file / fdx_typeset_strerror
 *
 * native/examples/shim_demo.c is the end-to-end host program
 * (tests/test_native_scene_api.py compiles and runs it).
 */
#ifndef FIGDRAW_H
#define FIGDRAW_H

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "figdraw_flatten.h"
#include "figdraw_layout.h"
#include "figdraw_typeset.h"

#ifdef __cplusplus
extern "C" {
#endif

/* ---- node builders ---------------------------------------------------- */

typedef struct {
  unsigned char bytes[FD_FIG_SIZE];
} FdxFig;

static inline FdxFig fdx_node(int kind) {
  FdxFig f;
  memset(&f, 0, sizeof(f));
  f.bytes[FD_FIG_OFF_KIND] = (unsigned char)kind;
  return f;
}

static inline void fdx_box(FdxFig *f, float x, float y, float w, float h) {
  float box[4] = {x, y, w, h};
  memcpy(f->bytes + FD_FIG_OFF_BOX, box, sizeof(box));
}

static inline FdxFig fdx_rect(float x, float y, float w, float h) {
  FdxFig f = fdx_node(FD_KIND_RECTANGLE);
  fdx_box(&f, x, y, w, h);
  return f;
}

static inline FdxFig fdx_image(float x, float y, float w, float h,
                               int64_t image_id) {
  FdxFig f = fdx_node(FD_KIND_IMAGE);
  fdx_box(&f, x, y, w, h);
  memcpy(f.bytes + FD_FIG_OFF_IMAGE_ID, &image_id, sizeof(image_id));
  return f;
}

static inline void fdx_solid(FdxFig *f, uint8_t r, uint8_t g, uint8_t b,
                             uint8_t a) {
  fd_fill_solid(f->bytes + FD_FIG_OFF_FILL, r, g, b, a);
}

/* axis: 0 X, 1 Y, 2 diag TL→BR, 3 diag BL→TR (filltypes.nim) */
static inline void fdx_linear(FdxFig *f, int axis, const uint8_t start[4],
                              const uint8_t stop[4]) {
  fd_fill_linear2(f->bytes + FD_FIG_OFF_FILL, axis, start, stop);
}

static inline void fdx_corners(FdxFig *f, float radius) {
  uint16_t c[4] = {(uint16_t)radius, (uint16_t)radius, (uint16_t)radius,
                   (uint16_t)radius};
  memcpy(f->bytes + FD_FIG_OFF_CORNERS, c, sizeof(c));
}

static inline void fdx_stroke(FdxFig *f, float weight, uint8_t r, uint8_t g,
                              uint8_t b, uint8_t a) {
  memcpy(f->bytes + FD_FIG_OFF_STROKE_WEIGHT, &weight, sizeof(weight));
  fd_fill_solid(f->bytes + FD_FIG_OFF_STROKE_FILL, r, g, b, a);
}

static inline void fdx_rotation(FdxFig *f, float degrees) {
  memcpy(f->bytes + FD_FIG_OFF_ROTATION, &degrees, sizeof(degrees));
}

/* OR FigFlags bits (FD_FLAG_* in figdraw_layout.h) into the node. */
static inline void fdx_flags(FdxFig *f, uint16_t flags) {
  uint16_t cur;
  memcpy(&cur, f->bytes + FD_FIG_OFF_FLAGS, 2);
  cur |= flags;
  memcpy(f->bytes + FD_FIG_OFF_FLAGS, &cur, 2);
}

/* shadow slot idx (0..3): style 1 = drop, 2 = inner (ShadowStyle). */
static inline void fdx_shadow(FdxFig *f, int idx, int style, float blur,
                              float spread, float x, float y, uint8_t r,
                              uint8_t g, uint8_t b, uint8_t a) {
  unsigned char *s =
      f->bytes + FD_FIG_OFF_SHADOWS + (size_t)idx * FD_SHADOW_STRIDE;
  s[FD_SHADOW_OFF_STYLE] = (unsigned char)style;
  memcpy(s + FD_SHADOW_OFF_BLUR, &blur, 4);
  memcpy(s + FD_SHADOW_OFF_SPREAD, &spread, 4);
  memcpy(s + FD_SHADOW_OFF_X, &x, 4);
  memcpy(s + FD_SHADOW_OFF_Y, &y, 4);
  fd_fill_solid(s + FD_SHADOW_OFF_FILL, r, g, b, a);
}

/* an nkTransform node translating its subtree (offset mode). */
static inline FdxFig fdx_transform(float tx, float ty) {
  FdxFig f = fdx_node(FD_KIND_TRANSFORM);
  memcpy(f.bytes + FD_FIG_OFF_TX, &tx, 4);
  memcpy(f.bytes + FD_FIG_OFF_TY, &ty, 4);
  return f;
}

/* ---- error-checked scene wrapper -------------------------------------- */

typedef struct {
  FdRenders *renders;
  FigdrawFlattenCtx *ctx;
  float ui_scale, pixel_scale, aa_factor;
  const char *err; /* NULL = ok; sticky FIRST error, never overwritten */
} FdxScene;

static inline void fdx_fail_(FdxScene *s, const char *msg) {
  if (s->err == NULL) s->err = msg;
}

static inline FdxScene fdx_scene_new(float ui_scale, float pixel_scale,
                                     float aa_factor) {
  FdxScene s;
  memset(&s, 0, sizeof(s));
  s.ui_scale = ui_scale;
  s.pixel_scale = pixel_scale;
  s.aa_factor = aa_factor;
  if (fd_fig_struct_size() != FD_FIG_SIZE ||
      fd_op_struct_size() != FD_OP_SIZE) {
    s.err = "figdraw_layout.h is stale vs the loaded library "
            "(regenerate with native/gen_layout.py)";
    return s;
  }
  s.renders = fd_renders_new();
  s.ctx = fd_create(ui_scale, pixel_scale, aa_factor);
  if (!s.renders || !s.ctx) s.err = "allocation failed";
  return s;
}

static inline void fdx_scene_free(FdxScene *s) {
  if (s->renders) fd_renders_free(s->renders);
  if (s->ctx) fd_destroy(s->ctx);
  s->renders = NULL;
  s->ctx = NULL;
}

static inline int fdx_add_root(FdxScene *s, int zlevel, const FdxFig *f) {
  if (s->err) return -1;
  int idx = fd_renders_add_root(s->renders, zlevel, f->bytes);
  if (idx < 0) fdx_fail_(s, "fd_renders_add_root failed");
  return idx;
}

static inline int fdx_add_child(FdxScene *s, int zlevel, int parent,
                                const FdxFig *f) {
  if (s->err) return -1;
  int idx = fd_renders_add_child(s->renders, zlevel, parent, f->bytes);
  if (idx < 0) fdx_fail_(s, "fd_renders_add_child failed (bad parent?)");
  return idx;
}

/* Flatten every layer; returns the quad count (or -1, err set). */
static inline int fdx_flatten(FdxScene *s) {
  if (s->err) return -1;
  fd_reset(s->ctx, s->ui_scale, s->pixel_scale, s->aa_factor);
  fd_flatten_renders(s->ctx, s->renders);
  return fd_quad_count(s->ctx);
}

/* Add a rounded-rect border root in one call — the reference's
 * figRoundedRectBorder / figDashedRoundedRectBorder /
 * figDottedRoundedRectBorder ABI exports (drawutils.nim:351-422).
 * style: 0 solid, 1 dashed (p1 dash length, p2 gap), 2 dotted (p1 gap;
 * dot radius = weight/2). Generates the perimeter ops via fd_border_ops
 * (bit-identical to borders.py), appends them to the layer pool and adds
 * the nkDrawable node with the same bounds padding / fill-vs-stroke
 * conventions as borders.py's fig_* constructors. Returns the node index
 * (or -1, err set). */
static inline int fdx_add_border(FdxScene *s, int zlevel, int style,
                                 float x, float y, float w, float h,
                                 const double corners[4], uint8_t r,
                                 uint8_t g, uint8_t b, uint8_t a2,
                                 float weight, double p1, double p2,
                                 double offset) {
  if (s->err) return -1;
  double half = (weight > 0 ? weight : 0) * 0.5;
  double bp1 = p1, bp2 = p2;
  int bstyle = style;
  if (style == 2) {  /* dotted: p1 is the gap, radius from the weight */
    bp1 = half;
    bp2 = p1;
  }
  int n = fd_border_ops(bstyle, half, half, w, h, corners, bp1, bp2, offset,
                        NULL, 0);
  if (n < 0) {
    fdx_fail_(s, "fd_border_ops failed");
    return -1;
  }
  unsigned char *ops =
      (unsigned char *)malloc((size_t)(n > 0 ? n : 1) * FD_OP_SIZE);
  if (!ops) {
    fdx_fail_(s, "out of memory");
    return -1;
  }
  fd_border_ops(bstyle, half, half, w, h, corners, bp1, bp2, offset, ops, n);
  FdxFig f = fdx_node(FD_KIND_DRAWABLE);
  fdx_box(&f, (float)(x - half), (float)(y - half), (float)(w + half * 2),
          (float)(h + half * 2));
  int32_t ops_start = fd_renders_op_count(s->renders, zlevel);
  memcpy(f.bytes + FD_FIG_OFF_OPS_START, &ops_start, 4);
  memcpy(f.bytes + FD_FIG_OFF_OPS_COUNT, &n, 4);
  if (style == 2) {
    /* dots are filled circles: the node fill carries the color */
    fdx_solid(&f, r, g, b, a2);
  } else {
    float wgt = weight;
    memcpy(f.bytes + FD_FIG_OFF_DRAW_WEIGHT, &wgt, 4);
    f.bytes[FD_FIG_OFF_DRAW_CAP] = 2; /* scButt, borders.py default */
    fd_fill_solid(f.bytes + FD_FIG_OFF_DRAW_STROKE_FILL, r, g, b, a2);
  }
  for (int k = 0; k < n; k++)
    fd_renders_add_op(s->renders, zlevel, ops + (size_t)k * FD_OP_SIZE,
                      NULL, 0);
  free(ops);
  return fdx_add_root(s, zlevel, &f);
}

/* ---- retained editing (docs/native_api.md recipe as calls) ------------ */

/* Flatten recording per-root spans (spans[2i], spans[2i+1]) with `reserve`
 * inert pad rows per root. Returns the root count (or -1, err set). */
static inline int fdx_snapshot(FdxScene *s, int32_t *spans, int spans_cap,
                               int reserve) {
  if (s->err) return -1;
  fd_reset(s->ctx, s->ui_scale, s->pixel_scale, s->aa_factor);
  int n = fd_flatten_renders_spans(s->ctx, s->renders, spans, spans_cap,
                                   reserve);
  if (n < 0) fdx_fail_(s, "span table too small");
  return n;
}

static inline int fdx_set_fig(FdxScene *s, int zlevel, int index,
                              const FdxFig *f) {
  if (s->err) return -1;
  if (fd_renders_set_fig(s->renders, zlevel, index, f->bytes) != 0) {
    fdx_fail_(s, "fd_renders_set_fig: bad layer/index");
    return -1;
  }
  return 0;
}

/* Patch ONE edited root in place: scratch-walk it, validate the patch
 * guards (quad count fits the span + reserve; no mask planes or extra pass
 * items from the subtree), pad the tail with inert rows, and splice the
 * exported rows over [span_start, span_start+span_len) in the caller's
 * fields/modes mirror. Returns 1 patched, 0 = caller must re-flatten
 * (guards failed — same downgrade rule as renderer.update_scene), -1 on
 * error. */
static inline int fdx_patch_root(FdxScene *s, int zlevel, int root_pos,
                                 int32_t span_start, int32_t span_len,
                                 float *fields, int32_t *modes) {
  if (s->err) return -1;
  FigdrawFlattenCtx *scratch =
      fd_create(s->ui_scale, s->pixel_scale, s->aa_factor);
  if (!scratch) {
    fdx_fail_(s, "allocation failed");
    return -1;
  }
  int rc = 0;
  int got = fd_flatten_renders_root(scratch, s->renders, zlevel, root_pos);
  if (got >= 0 && got <= span_len && fd_mask_count(scratch) == 0 &&
      fd_item_count(scratch) <= 1) {
    fd_pad_rows(scratch, span_len - got);
    float *pf = (float *)malloc((size_t)span_len * 68 * sizeof(float));
    int32_t *pm = (int32_t *)malloc((size_t)span_len * 2 * sizeof(int32_t));
    int32_t pi[5 * 4];
    if (pf && pm &&
        fd_export(scratch, pf, pm, span_len, pi, 4) == span_len) {
      memcpy(fields + (size_t)span_start * 68, pf,
             (size_t)span_len * 68 * sizeof(float));
      memcpy(modes + (size_t)span_start * 2, pm,
             (size_t)span_len * 2 * sizeof(int32_t));
      rc = 1;
    }
    free(pf);
    free(pm);
  }
  fd_destroy(scratch);
  return rc;
}

/* ---- typesetting helpers ---------------------------------------------- */

/* Load an .fdtp font pack from disk (native_pack.save_font_pack's output).
 * Returns NULL on IO or parse failure. */
static inline FdFontPack *fdx_pack_load_file(const char *path) {
  FILE *fh = fopen(path, "rb");
  if (!fh) return NULL;
  fseek(fh, 0, SEEK_END);
  long len = ftell(fh);
  fseek(fh, 0, SEEK_SET);
  if (len <= 0 || len > (64 << 20)) {
    fclose(fh);
    return NULL;
  }
  void *buf = malloc((size_t)len);
  FdFontPack *pack = NULL;
  if (buf && fread(buf, 1, (size_t)len, fh) == (size_t)len)
    pack = fd_pack_load(buf, (int32_t)len);
  free(buf);
  fclose(fh);
  return pack;
}

/* Human-readable fd_typeset_* error (negative return codes). */
static inline const char *fdx_typeset_strerror(int code) {
  switch (code) {
    case FD_TYPESET_E_CAP:
      return "output capacity too small";
    case FD_TYPESET_E_MARKS:
      return "offset-less API cannot place marks (use fd_typeset_shape_ex "
             "or fd_typeset_box)";
    case FD_TYPESET_E_REDUCED:
      return "pack is reduced vs the Python plan (opt in with "
             "fd_pack_set_allow_reduced)";
    case FD_TYPESET_E_SCRIPT:
      return "reserved error (not returned since FDTP v4: syllable "
             "scripts shape natively)";
    case FD_TYPESET_E_OFFSETS:
      return "run has nonzero vertical positioning (GPOS cursive dy) the "
             "advance-stream API cannot carry (use fd_typeset_shape_ex)";
    default:
      return code < 0 ? "unknown typeset error" : "ok";
  }
}

#ifdef __cplusplus
}
#endif

#endif /* FIGDRAW_H */
