/* typeset_demo.c — a real C host typesetting through the figdraw_tpu native
 * ABI (libfigdraw_typeset.so), the counterpart of the reference dynlib's
 * typeset consumers (/root/reference/src/figdraw/dynlib.nim:1-30).
 *
 * Usage: typeset_demo <pack.fdtp> [text]
 *
 * The .fdtp pack is produced offline by Python:
 *   from figdraw_tpu.text.native_pack import save_font_pack
 *   save_font_pack(load_typeface("DejaVuSans.ttf"), "dejavu.fdtp")
 *
 * Prints key=value lines consumed by tests/test_native_typeset_demo
 * (glyph count, total advance, first gid, baseline) plus a human-readable
 * glyph table on stderr. Exit codes: 0 ok, 2 refused (text needs mark
 * positioning — typeset it through the Python pipeline), 1 other errors.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "figdraw_typeset.h"

#define MAXG 4096

int main(int argc, char **argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s <pack.fdtp> [text]\n", argv[0]);
    return 1;
  }
  /* --box: drive only fd_typeset_box (folds mark/cursive offsets into
   * positions) — the API for mark-bearing and syllable-script text the
   * offset-less line leg refuses. */
  int box_only = argc > 2 && strcmp(argv[2], "--box") == 0;
  const char *text = argc > (box_only ? 3 : 2) ? argv[box_only ? 3 : 2]
                                               : "Office flow AVATAR";

  FILE *f = fopen(argv[1], "rb");
  if (!f) {
    perror("open pack");
    return 1;
  }
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  void *blob = malloc((size_t)len);
  if (fread(blob, 1, (size_t)len, f) != (size_t)len) {
    fprintf(stderr, "short read\n");
    return 1;
  }
  fclose(f);

  FdFontPack *pack = fd_pack_load(blob, (int32_t)len);
  free(blob);
  if (!pack) {
    fprintf(stderr, "bad pack\n");
    return 1;
  }

  uint32_t cps[MAXG];
  int32_t n = fd_utf8_to_cps(text, -1, cps, MAXG);
  if (n < 0) {
    fprintf(stderr, "utf8 decode failed\n");
    return 1;
  }

  uint32_t gids[MAXG], clusters[MAXG];
  float xs[MAXG], baseline = 0.0f;
  float size = 24.0f;
  int32_t count = box_only ? 0
                           : fd_typeset_line(pack, cps, n, size, gids, xs,
                                             clusters, MAXG, &baseline);
  if (count == FD_TYPESET_E_MARKS) {
    fprintf(stderr, "refused: text needs GPOS mark positioning\n");
    fd_pack_free(pack);
    return 2;
  }
  if (count < 0) {
    fprintf(stderr, "typeset failed (%d)\n", count);
    fd_pack_free(pack);
    return 1;
  }

  float total = 0.0f;
  if (!box_only) {
    float scale = size / fd_pack_metric(pack, 0);
    float advs[MAXG];
    int32_t c2 = fd_typeset_shape(pack, cps, n, NULL, advs, NULL, MAXG);
    for (int32_t i = 0; i < c2; i++) total += advs[i] * scale;

    fprintf(stderr, "%-6s %-8s %-10s %s\n", "gid", "x(px)", "cluster",
            "flags");
    for (int32_t i = 0; i < count; i++)
      fprintf(stderr, "%-6u %-8.2f %-10u\n", gids[i], xs[i], clusters[i]);
  }

  /* the full box layouter: wrap the same text into a 160 px column,
   * centered — the dynlib typeset() surface (layout.py counterpart).
   * Own buffers: the line-leg gids/xs/clusters are still printed below. */
  uint32_t bgids[MAXG], bclusters[MAXG];
  float bxs[MAXG], ys[MAXG], box_size[2] = {0, 0};
  int32_t bcount =
      fd_typeset_box(pack, cps, n, size, 0.0f, 160.0f, 0.0f, /*h_align=*/1,
                     /*v_align=*/0, /*wrap=*/1, bgids, bxs, ys, bclusters,
                     MAXG, box_size);
  if (bcount < 0) {
    fprintf(stderr, "typeset_box failed (%d)\n", bcount);
    fd_pack_free(pack);
    return 1;
  }

  if (!box_only) {
    printf("glyphs=%d\n", count);
    printf("first_gid=%u\n", count ? gids[0] : 0);
    printf("width_px=%.3f\n", total);
    printf("baseline=%.1f\n", baseline);
  }
  printf("flags=%u\n", fd_pack_flags(pack));
  printf("box_glyphs=%d\n", bcount);
  printf("box_first_gid=%u\n", bcount ? bgids[0] : 0);
  printf("box_w=%.3f\n", box_size[0]);
  printf("box_h=%.3f\n", box_size[1]);
  fd_pack_free(pack);
  return 0;
}
