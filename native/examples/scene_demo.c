/* Scene-building C API smoke demo: assembles a layered scene in pure C,
 * flattens it, and prints the quad count. Compiled and executed by
 * tests/test_native_scene_api.py to prove the ABI works for external hosts
 * (the reference's native-dynlib consumers, bindings/native_bindings.nim).
 *
 * Build: cc scene_demo.c -I.. -L../build -lfigdraw_flatten -o scene_demo
 */

#include <stdint.h>
#include <stdio.h>
#include <string.h>

#include "figdraw_flatten.h"

/* Packed row layouts (nodesarray.py FIG_DTYPE / OP_DTYPE); a C host can
 * declare the full structs — for the demo we poke fields by offset into a
 * correctly-sized buffer to stay layout-agnostic except where we write. */

int main(void) {
  unsigned char fig[512];
  unsigned char op[64];
  int fig_size = fd_fig_struct_size();
  int op_size = fd_op_struct_size();
  if (fig_size > (int)sizeof(fig) || op_size > (int)sizeof(op)) {
    fprintf(stderr, "struct sizes too large\n");
    return 2;
  }

  FigdrawFlattenCtx *ctx = fd_create(1.0f, 1.0f, 1.2f);
  FdRenders *renders = fd_renders_new();

  /* background rectangle: kind (u8 @0) = 2 (nkRectangle); box f32[4] @8 */
  memset(fig, 0, sizeof(fig));
  fig[0] = 2;
  float box[4] = {0.0f, 0.0f, 200.0f, 150.0f};
  memcpy(fig + 8, box, sizeof(box));
  /* fill PackedFill @ 28 (after box+rotation) */
  fd_fill_solid(fig + 28, 240, 240, 240, 255);
  int root = fd_renders_add_root(renders, 0, fig);
  if (root != 0) return 3;

  /* child rounded rect with a gradient */
  memset(fig, 0, sizeof(fig));
  fig[0] = 2;
  float box2[4] = {20.0f, 20.0f, 120.0f, 80.0f};
  memcpy(fig + 8, box2, sizeof(box2));
  const uint8_t start[4] = {255, 0, 0, 255}, stop[4] = {0, 0, 255, 255};
  fd_fill_linear2(fig + 28, 1, start, stop);
  uint16_t corners[4] = {8, 8, 8, 8};
  memcpy(fig + 44, corners, sizeof(corners)); /* corners @44 */
  if (fd_renders_add_child(renders, 0, root, fig) < 0) return 4;

  /* a drawable line on zlevel 1 */
  memset(fig, 0, sizeof(fig));
  fig[0] = 3; /* nkDrawable */
  float box3[4] = {10.0f, 10.0f, 150.0f, 100.0f};
  memcpy(fig + 8, box3, sizeof(box3));
  memset(op, 0, sizeof(op));
  /* DrawOp: kind u8 @0 = 0 (line); data f32[8] @16: ax ay bx by */
  float line[4] = {0.0f, 0.0f, 100.0f, 60.0f};
  memcpy(op + 16, line, sizeof(line));
  int32_t ops_start = fd_renders_op_count(renders, 1);
  fd_renders_add_op(renders, 1, op, NULL, 0);
  /* drawable payload offsets (nodesarray.py FIG_DTYPE; the Python test
   * compiles this file with -D overrides straight from the dtype) */
#ifndef FD_OFF_OPS_START
#define FD_OFF_OPS_START 300
#endif
#ifndef FD_OFF_DRAW_WEIGHT
#define FD_OFF_DRAW_WEIGHT 308
#endif
#ifndef FD_OFF_DRAW_STROKE_FILL
#define FD_OFF_DRAW_STROKE_FILL 320
#endif
  memcpy(fig + FD_OFF_OPS_START, &ops_start, 4);
  int32_t one = 1;
  memcpy(fig + FD_OFF_OPS_START + 4, &one, 4);
  float weight = 5.0f;
  memcpy(fig + FD_OFF_DRAW_WEIGHT, &weight, 4);
  fd_fill_solid(fig + FD_OFF_DRAW_STROKE_FILL, 20, 160, 60, 255);
  fd_renders_add_root(renders, 1, fig);

  fd_flatten_renders(ctx, renders);
  int quads = fd_quad_count(ctx);
  printf("quads=%d\n", quads);

  /* ---- retained-edit leg (snapshot_scene / update_scene from C) ---------
   * Snapshot with per-root spans (+1 reserve row per root), edit one node,
   * re-walk ONLY its root in a scratch context, splice the rows over the
   * old span, and check the patched tape is byte-identical to a full
   * re-flatten. */
  int patch_ok = 0;
  {
    fd_reset(ctx, 1.0f, 1.0f, 1.2f);
    int n_roots = fd_renders_root_count(renders);
    int32_t spans[16];
    if (n_roots > 8 ||
        fd_flatten_renders_spans(ctx, renders, spans, 8, 1) != n_roots)
      goto done;
    int n = fd_quad_count(ctx);
    static float fields[256][68];
    static int32_t modes[256][2];
    static int32_t items[64][5];
    if (n > 256 || fd_export(ctx, &fields[0][0], &modes[0][0], 256,
                             &items[0][0], 64) != n)
      goto done;

    /* edit: recolor the gradient child (layer 0, node index root+1) */
    memset(fig, 0, sizeof(fig));
    fig[0] = 2;
    memcpy(fig + 8, box2, sizeof(box2));
    const uint8_t s2[4] = {0, 200, 80, 255}, e2[4] = {200, 0, 200, 255};
    fd_fill_linear2(fig + 28, 0, s2, e2);
    memcpy(fig + 44, corners, sizeof(corners));
    if (fd_renders_set_fig(renders, 0, root + 1, fig) != 0) goto done;

    /* scratch re-walk of the dirty root (position 0 of layer 0) */
    FigdrawFlattenCtx *scratch = fd_create(1.0f, 1.0f, 1.2f);
    int got = fd_flatten_renders_root(scratch, renders, 0, 0);
    int span_len = spans[1] - spans[0];
    if (got >= 0 && got <= span_len && fd_mask_count(scratch) == 0 &&
        fd_item_count(scratch) <= 1) {
      fd_pad_rows(scratch, span_len - got); /* fill the reserve tail */
      static float pf[256][68];
      static int32_t pm[256][2];
      static int32_t pi[64][5];
      if (fd_export(scratch, &pf[0][0], &pm[0][0], 256, &pi[0][0], 64) ==
          span_len) {
        memcpy(&fields[spans[0]][0], &pf[0][0],
               (size_t)span_len * 68 * sizeof(float));
        memcpy(&modes[spans[0]][0], &pm[0][0],
               (size_t)span_len * 2 * sizeof(int32_t));
        /* reference: a full re-flatten of the edited scene */
        fd_reset(ctx, 1.0f, 1.0f, 1.2f);
        static int32_t spans2[16];
        fd_flatten_renders_spans(ctx, renders, spans2, 8, 1);
        static float rf[256][68];
        static int32_t rm[256][2];
        if (fd_export(ctx, &rf[0][0], &rm[0][0], 256, &pi[0][0], 64) == n &&
            memcmp(fields, rf, (size_t)n * 68 * sizeof(float)) == 0 &&
            memcmp(modes, rm, (size_t)n * 2 * sizeof(int32_t)) == 0)
          patch_ok = 1;
      }
    }
    fd_destroy(scratch);
  }
done:
  printf("patch_ok=%d\n", patch_ok);

  fd_renders_free(renders);
  fd_destroy(ctx);
  return (quads >= 3 && patch_ok) ? 0 : 5;
}
