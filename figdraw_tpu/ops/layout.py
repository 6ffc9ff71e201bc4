"""Packed quad-record layout shared by the host tape packer and TPU kernels.

The reference streams per-vertex attribute arrays to the GPU
(/root/reference/src/figdraw/opengl/glcontext.nim:76-94). On TPU we flatten
each emitted quad to one fixed-width f32 record (plus an i32 lane for the
packed sdf mode and mask index), so a whole pass is two dense HBM arrays:

    fields: (N, QF_WIDTH) float32
    modes:  (N, 2)        int32   [packed_sdf_mode, mask_read_index]

Quad geometry is stored as the inverse affine map from screen space to the
quad's (u, v) parameter square — the TPU-native equivalent of the GL
rasterizer interpolating per-vertex uv over two triangles. For the
parallelograms figdraw emits this is exact.
"""

# --- f32 field offsets -------------------------------------------------------

# Inverse affine: [u, v]^T = INV * (p - origin)
QF_INV_A = 0  # du/dx
QF_INV_B = 1  # du/dy
QF_INV_C = 2  # dv/dx
QF_INV_D = 3  # dv/dy
QF_ORG_X = 4  # screen-space position of the uv=(0,0) corner (TL vertex)
QF_ORG_Y = 5

# Screen-space AABB for binning
QF_BBOX_X0 = 6
QF_BBOX_Y0 = 7
QF_BBOX_X1 = 8
QF_BBOX_Y1 = 9

# Texture-uv affine: tex_uv = UV3 + u * DU + v * DV  (identity for SDF quads)
QF_UV3_X = 10
QF_UV3_Y = 11
QF_UVDU_X = 12
QF_UVDU_Y = 13
QF_UVDV_X = 14
QF_UVDV_Y = 15

# Per-vertex colors, normalized RGBA, vertex order 0=BL 1=BR 2=TR 3=TL
# (matches gradientColors order, figbackend.nim:161-183)
QF_COLOR0 = 16  # .. 19
QF_COLOR1 = 20  # .. 23
QF_COLOR2 = 24  # .. 27
QF_COLOR3 = 28  # .. 31

# linear3 fill extra colors
QF_MID_COLOR = 32  # .. 35
QF_STOP_COLOR = 36  # .. 39

# sdfParams / sdfRadii / sdfFactors exactly as the GL vertex streams
QF_PARAMS = 40  # .. 43
QF_RADII = 44  # .. 47
QF_FACTORS = 48  # .. 49

QF_AA = 50  # per-quad AA factor (GL: uniform changed via flush)
QF_SUBPIXEL_SHIFT = 51

# Rect-mask fast path (glcontext.nim:831-850): params(cx,cy,hx,hy),
# packed radii, inverse-transform rows matX/matY. params.z < 0 → disabled.
QF_RECT_PARAMS = 52  # .. 55
QF_RECT_RADII = 56  # .. 59
QF_RECT_MATX = 60  # .. 63
QF_RECT_MATY = 64  # .. 67

QF_WIDTH = 68  # pad target; keep a multiple of 4

# --- i32 lanes ----------------------------------------------------------------

QI_MODE = 0  # packed: sdf_mode + 128*elliptical + 256*fill_mode
QI_MASK = 1  # mask texture read index (0 = no mask / all-white)
QI_WIDTH = 2
