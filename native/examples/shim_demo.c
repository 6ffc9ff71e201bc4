/* Convenience-shim host demo (native/figdraw.h): the dynlib.nim-style
 * ergonomic surface driving BOTH halves of the C ABI end-to-end —
 *
 *   1. build a small dashboard scene with the FdxFig builders (gradient
 *      panel, shadowed card, rotated badge, translated subtree),
 *   2. typeset a label with fd_typeset_box (FDTP pack, marks included)
 *      and size a box from the measured text extent,
 *   3. snapshot with per-root spans + reserves, edit two nodes, patch them
 *      in place with fdx_patch_root, and verify the patched tape is
 *      byte-identical to a full re-flatten.
 *
 * Compiled and executed by tests/test_native_scene_api.py.
 *
 * Build: cc shim_demo.c -I.. -L../build -lfigdraw_flatten \
 *            -lfigdraw_typeset -o shim_demo  &&  ./shim_demo dejavu.fdtp
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "figdraw.h"

#define MAX_QUADS 512

static float fields[MAX_QUADS][68];
static int32_t modes[MAX_QUADS][2];
static float ref_fields[MAX_QUADS][68];
static int32_t ref_modes[MAX_QUADS][2];
static int32_t items[64][5];

int main(int argc, char **argv) {
  /* ---- typeset a label (needs the .fdtp pack path as argv[1]) -------- */
  float label_w = 120.0f;
  int label_glyphs = -1;
  if (argc > 1) {
    FdFontPack *pack = fdx_pack_load_file(argv[1]);
    if (!pack) {
      fprintf(stderr, "pack load failed: %s\n", argv[1]);
      return 2;
    }
    uint32_t cps[64];
    int n = fd_utf8_to_cps("Re\xcc\x81sum\xc3\xa9 panel", -1, cps, 64);
    uint32_t gids[64], clus[64];
    float xs[64], ys[64], size[2];
    /* combining mark included: the box layouter places it via anchors */
    label_glyphs = fd_typeset_box(pack, cps, n, 16.0f, 0.0f, 0.0f, 0.0f, 0,
                                  0, 0, gids, xs, ys, clus, 64, size);
    if (label_glyphs < 0) {
      fprintf(stderr, "typeset failed: %s\n",
              fdx_typeset_strerror(label_glyphs));
      return 3;
    }
    label_w = size[0] + 24.0f; /* pad the measured extent */
    fd_pack_free(pack);
  }
  printf("label_glyphs=%d label_w=%.1f\n", label_glyphs, label_w);

  /* ---- build the scene with the shim builders ------------------------ */
  FdxScene s = fdx_scene_new(1.0f, 1.0f, 1.2f);

  FdxFig bg = fdx_rect(0, 0, 640, 400);
  fdx_solid(&bg, 245, 246, 250, 255);
  int bg_idx = fdx_add_root(&s, 0, &bg);

  const uint8_t g0[4] = {40, 90, 200, 255}, g1[4] = {90, 200, 250, 255};
  FdxFig panel = fdx_rect(24, 24, label_w, 120);
  fdx_linear(&panel, 1, g0, g1);
  fdx_corners(&panel, 12);
  fdx_stroke(&panel, 3, 20, 40, 90, 255);
  int panel_idx = fdx_add_root(&s, 0, &panel);

  FdxFig card = fdx_rect(220, 60, 180, 110);
  fdx_solid(&card, 255, 255, 255, 255);
  fdx_corners(&card, 10);
  fdx_shadow(&card, 0, 1, 12, 4, 6, 6, 0, 0, 0, 120);
  fdx_add_root(&s, 0, &card);

  FdxFig badge = fdx_rect(430, 40, 90, 90);
  fdx_solid(&badge, 230, 80, 60, 230);
  fdx_corners(&badge, 45);
  fdx_rotation(&badge, 15.0f);
  fdx_add_root(&s, 0, &badge);

  /* dashed + dotted borders in one call (figDashedRoundedRectBorder-class
   * ABI exports, generated bit-identically to borders.py) */
  double bcorners[4] = {10, 10, 10, 10};
  int dashed_idx = fdx_add_border(&s, 0, 1, 24, 200, 200, 120, bcorners,
                                  60, 60, 160, 255, 3.0f, 9.0, 5.0, 0.0);
  int dotted_idx = fdx_add_border(&s, 0, 2, 260, 200, 160, 120, bcorners,
                                  160, 60, 60, 255, 5.0f, 4.0, 0.0, 0.0);

  /* translated subtree: an nkTransform root moving a small stack */
  FdxFig mover = fdx_transform(40.0f, 220.0f);
  int mv = fdx_add_root(&s, 0, &mover);
  FdxFig chip = fdx_rect(0, 0, 120, 48);
  fdx_solid(&chip, 120, 200, 120, 255);
  fdx_corners(&chip, 8);
  fdx_add_child(&s, 0, mv, &chip);

  int quads = fdx_flatten(&s);
  printf("dashed_idx=%d dotted_idx=%d\n", dashed_idx, dotted_idx);
  printf("quads=%d\n", quads);
  if (s.err || quads <= 0 || quads > MAX_QUADS) {
    fprintf(stderr, "scene error: %s\n", s.err ? s.err : "quad overflow");
    return 4;
  }

  /* ---- retained edits via the shim ----------------------------------- */
  int patch_ok = 0;
  {
    int32_t spans[32];
    int n_roots = fdx_snapshot(&s, spans, 16, 2);
    int n = fd_quad_count(s.ctx);
    if (n_roots < 0 || n > MAX_QUADS) goto done;
    if (fd_export(s.ctx, &fields[0][0], &modes[0][0], MAX_QUADS,
                  &items[0][0], 64) != n)
      goto done;

    /* edit 1: recolor the background; edit 2: restyle the panel. The
     * byte-compare against a fresh re-flatten needs count-PRESERVING
     * edits (a count change still patches — the reserve absorbs it — but
     * the fresh walk re-packs rows tightly, so spans stop aligning; the
     * Python contract compares rendered pixels instead) */
    FdxFig bg2 = fdx_rect(0, 0, 640, 400);
    fdx_solid(&bg2, 24, 26, 32, 255);
    fdx_set_fig(&s, 0, bg_idx, &bg2);
    FdxFig panel2 = fdx_rect(24, 24, label_w, 120);
    fdx_linear(&panel2, 1, g1, g0); /* same axis: same quad count */
    fdx_corners(&panel2, 20);
    fdx_stroke(&panel2, 3, 90, 20, 40, 255);
    fdx_set_fig(&s, 0, panel_idx, &panel2);

    /* roots are flatten-order positions here (single layer, added in
     * order): bg at 0, panel at 1 */
    if (fdx_patch_root(&s, 0, 0, spans[0], spans[1] - spans[0],
                       &fields[0][0], &modes[0][0]) != 1)
      goto done;
    if (fdx_patch_root(&s, 0, 1, spans[2], spans[3] - spans[2],
                       &fields[0][0], &modes[0][0]) != 1)
      goto done;

    /* verify: byte-identical to a full re-flatten of the edited scene */
    int32_t spans2[32];
    if (fdx_snapshot(&s, spans2, 16, 2) != n_roots) goto done;
    if (fd_export(s.ctx, &ref_fields[0][0], &ref_modes[0][0], MAX_QUADS,
                  &items[0][0], 64) != n)
      goto done;
    if (memcmp(fields, ref_fields, (size_t)n * 68 * sizeof(float)) == 0 &&
        memcmp(modes, ref_modes, (size_t)n * 2 * sizeof(int32_t)) == 0)
      patch_ok = 1;
  }
done:
  printf("patch_ok=%d err=%s\n", patch_ok, s.err ? s.err : "none");
  fdx_scene_free(&s);
  return (quads > 0 && patch_ok && (argc <= 1 || label_glyphs > 0)) ? 0 : 5;
}
