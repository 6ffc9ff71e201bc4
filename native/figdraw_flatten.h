/* C ABI of the figdraw_tpu native flattener (libfigdraw_flatten.so).
 *
 * The native-integration surface of the engine, counterpart of the
 * reference's C-ABI dynlib facade (bindings/native_bindings.nim +
 * native_dynlib.json): external hosts build scenes as packed Fig rows
 * (layout mirrored by figdraw_tpu/nodesarray.py FIG_DTYPE, validated at load
 * time via fd_fig_struct_size) and receive the packed quad tape + pass items
 * that the TPU executor consumes.
 *
 * Quad record layout: figdraw_tpu/ops/layout.py (QF_* / QI_* offsets).
 * Item rows (5 x int32): kind (0 draw, 1 blur, 2 clear-mask), target
 * (-1 frame / mask index), start, end, radius (float bits in slot 4).
 */

#ifndef FIGDRAW_FLATTEN_H
#define FIGDRAW_FLATTEN_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct FigdrawFlattenCtx FigdrawFlattenCtx;

/* Create a flatten context. ui_scale/pixel_scale mirror setFigUiScale and
 * the renderer pixel scale; aa_factor is the SDF coverage slope (1.2). */
FigdrawFlattenCtx *fd_create(float ui_scale, float pixel_scale, float aa_factor);
void fd_destroy(FigdrawFlattenCtx *ctx);

/* Walk one layer's roots in order. nodes: n_nodes packed Fig rows;
 * roots: indexes into nodes. Call once per layer in ascending ZLevel. */
void fd_flatten_layer(FigdrawFlattenCtx *ctx, const void *nodes, int n_nodes,
                      const int32_t *roots, int n_roots);

/* Result sizes (call after the last layer). */
int fd_quad_count(FigdrawFlattenCtx *ctx);
int fd_item_count(FigdrawFlattenCtx *ctx);
int fd_mask_count(FigdrawFlattenCtx *ctx);

/* Size of one packed Fig row; must equal FIG_DTYPE.itemsize (264). */
int fd_fig_struct_size(void);

/* Copy out quads and items; returns the quad count or -1 if a capacity is
 * too small. fields: quad_cap x 68 floats; modes: quad_cap x 2 int32;
 * items: item_cap x 5 int32. */
int fd_export(FigdrawFlattenCtx *ctx, float *fields, int32_t *modes,
              int quad_cap, int32_t *items, int item_cap);

#ifdef __cplusplus
}
#endif

#endif /* FIGDRAW_FLATTEN_H */
