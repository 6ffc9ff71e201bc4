"""Tiled Pallas TPU rasterizer: per-tile ordered alpha compositing.

The performance path replacing ops/raster_ref.py's whole-frame quad loop —
the TPU-native analog of the GL fragment pipeline (SURVEY.md §7 step 3):

  1. bin_quads (XLA) maps quad AABBs to per-tile index lists in draw order
  2. a Pallas kernel over a (tiles_y, tiles_x) grid walks each tile's binned
     quads with `lax.fori_loop`, evaluates the SDF fragment math over the
     (TILE_H, TILE_W) VMEM tile and source-over blends in registers —
     an ordered loop, not a commutative reduce, preserving GL draw order
  3. only the final tile color hits HBM once per pass

Atlas-sampling modes (0, 13-16) need gathers, which the VPU lacks; the
renderer routes runs containing them through the XLA path instead (they are
rare glyph/image quads; the SDF-heavy 300-box benchmark path never leaves
this kernel).

Frame layout inside the pass is channel-planar (4, H, W): a trailing RGBA
dim of 4 would waste 124 of 128 vector lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import bin_quads
from .quad_eval_planar import eval_quad_planar
from .layout import QI_MASK, QI_MODE

import os as _os

TILE_H = int(_os.environ.get("FIGDRAW_TILE", "128"))
# lanes are 128-wide; shrinking the tile height cuts wasted eval area for
# mid-sized quads without giving up lane occupancy
TILE_W = int(_os.environ.get("FIGDRAW_TILE_W", "128"))

# modes that sample the atlas texture: sdfModeAtlas + the MSDF family
ATLAS_BASE_MODES = (0, 13, 14, 15, 16)


def atlas_to_planes(atlas):
    """(S, S, 4) HWC atlas -> ((4, T, T) channel-planar planes, S).

    T = max(S, 256) so the in-kernel sampling window (th+8 <= 136 rows,
    tw+128 = 256 lanes) always fits the buffer whole: atlases smaller than
    a tile would otherwise clamp the window below the tile and hit sub-128
    lane rolls Mosaic refuses on hardware. Texel math keeps using the REAL
    size S (returned second); the zero padding is only ever read for
    pixels outside the quad, which are alpha-masked."""
    planes = jnp.transpose(atlas, (2, 0, 1))
    s = planes.shape[1]
    # round UP to a multiple of 256 (not just a 256 minimum): the window
    # snap math needs buf - pw divisible by 128 and buf - ph by 8, which a
    # non-power-of-two atlas (e.g. 320) would break — its snapped window
    # could exclude the atlas tail and wrap-read wrong texels
    t = max(-(-s // 256) * 256, 256)
    if t != s:
        planes = jnp.pad(planes, ((0, 0), (0, t - s), (0, t - s)))
    return planes, s


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def run_uses_atlas(modes_np, count: int) -> bool:
    """Host-side check: does this run need texture gathers? (numpy, pre-upload)"""
    import numpy as np

    if count <= 0:
        return False
    base = modes_np[:count, QI_MODE] % 256
    base = np.where(base >= 128, base - 128, base)
    return bool(np.isin(base, ATLAS_BASE_MODES).any())


ATLAS11_MAX_SIZE = 512  # whole-atlas VMEM residency cap (4·S²·4B ≤ 4 MB)


def mark_atlas11(fields_np, modes_np, count: int, atlas_size: int,
                 pixelate: bool = False) -> bool:
    """Host pre-pass: validate every atlas-sampling quad in [0, count) for
    the in-kernel 1:1 window-sample path and set MODE_ATLAS11_BIT on them
    (in place, on the padded upload copy). Returns True iff ALL atlas quads
    qualified. Only consulted under FIGDRAW_ATLAS11=always — the default
    routes atlas runs to the XLA windowed-gather evaluator, which measured
    faster on hardware (renderer.execute has the numbers).

    Eligibility (conservative): plain atlas mode 0 (the MSDF family needs
    the median + screen-px-range path), axis-aligned (no rotation, no uv
    cross terms), uv scale exactly 1 texel per pixel on both axes (glyph and
    unscaled-image quads; flipY and scaled draws fail), GL_LINEAR filtering
    (pixelate uses GL_NEAREST), and an atlas small enough to live in VMEM.
    The XLA evaluators ignore the bit, so marked quads stay valid on every
    fallback path.
    """
    import numpy as np

    from .layout import (
        QF_INV_A, QF_INV_B, QF_INV_C, QF_INV_D,
        QF_UVDU_X, QF_UVDU_Y, QF_UVDV_X, QF_UVDV_Y,
    )
    from .quad_eval import MODE_ATLAS11_BIT

    if count <= 0:
        return True
    m = modes_np[:count, QI_MODE]
    rest = m % 256
    base = np.where(rest >= 128, rest - 128, rest)
    is_atlas = np.isin(base, ATLAS_BASE_MODES)
    if not is_atlas.any():
        return True
    if pixelate or atlas_size > ATLAS11_MAX_SIZE:
        return False
    f = fields_np[:count]
    ok = (
        (base == 0)
        & (f[:, QF_INV_B] == 0.0)
        & (f[:, QF_INV_C] == 0.0)
        & (f[:, QF_UVDU_Y] == 0.0)
        & (f[:, QF_UVDV_X] == 0.0)
        & (np.abs(f[:, QF_INV_A] * f[:, QF_UVDU_X] * atlas_size - 1.0) < 1e-4)
        & (np.abs(f[:, QF_INV_D] * f[:, QF_UVDV_Y] * atlas_size - 1.0) < 1e-4)
    )
    if not bool((ok | ~is_atlas).all()):
        return False
    modes_np[:count, QI_MODE] = np.where(is_atlas, m | MODE_ATLAS11_BIT, m)
    return True


def _lower_bound(tidx_ref, count, value):
    """First position in the tile's (ascending) valid index list with
    tidx >= value — scalar binary search over SMEM."""

    def cond(c):
        lo, hi = c
        return lo < hi

    def body(c):
        lo, hi = c
        mid = (lo + hi) // 2
        v = tidx_ref[0, 0, mid]
        return jax.lax.cond(
            v < value, lambda: (mid + 1, hi), lambda: (lo, mid)
        )

    lo, _hi = jax.lax.while_loop(cond, body, (jnp.int32(0), count))
    return lo


def _kernel(counts_ref, seg_ref, fields_ref, modes_ref, tidx_ref, frame_ref,
            masks_ref, *rest, tiles_x: int, has_backdrop: bool,
            mask_target: bool = False, has_atlas: bool = False,
            subpixel_positioning: bool = False, atlas_size: int = 0,
            qid_base: int = 0):
    """seg_ref: (3,) SMEM [start, end, row0]: the [start, end) quad-id range
    of this draw run (or a range covering everything) plus the global row of
    tile row 0 (nonzero when this kernel rasterizes one device's row band of
    a mesh-sharded frame). Within a tile the binned list is ascending, and a
    run's quads form a contiguous segment of it (runs partition the tape in
    draw order). qid_base: global quad id of fields_ref row 0 — nonzero when
    the tape is CHUNKED to fit VMEM (fields_ref is a window; tidx keeps
    global ids)."""
    rest = list(rest)
    backdrop_ref = rest.pop(0) if has_backdrop else None
    atlas_ref = rest.pop(0) if has_atlas else None
    (out_ref,) = rest
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    t = ty * tiles_x + tx
    count = counts_ref[t]
    run_start = seg_ref[0]
    run_end = seg_ref[1]
    row0 = seg_ref[2]
    j_lo = _lower_bound(tidx_ref, count, run_start)
    j_hi = _lower_bound(tidx_ref, count, run_end)

    th, tw = frame_ref.shape[1], frame_ref.shape[2]
    y0 = (row0 + ty * th).astype(jnp.float32)
    x0 = (tx * tw).astype(jnp.float32)
    iy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32)
    ix = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
    py = y0 + iy + 0.5
    px = x0 + ix + 0.5

    if has_backdrop:
        bd = (backdrop_ref[0], backdrop_ref[1], backdrop_ref[2], backdrop_ref[3])
    else:
        bd = None

    if mask_target:
        # mask plane write: m = a^2 + m*(1-a), parent multiply via masks_ref
        # (glsl/mask.frag:233 through the GL blend)
        def body(j, m):
            qi = tidx_ref[0, 0, j] - qid_base

            def fget(k):
                return fields_ref[qi, k]

            mode = modes_ref[qi, QI_MODE]
            mask_i = modes_ref[qi, QI_MASK]
            _fr, _fg, _fb, fa = eval_quad_planar(fget, mode, px, py)
            fa = fa * masks_ref[mask_i]
            return fa * fa + m * (1.0 - fa)

        out_ref[0] = jax.lax.fori_loop(j_lo, j_hi, body, frame_ref[0])
        return

    # Back-to-front fori source-over. A front-to-back lax.while with a
    # per-iteration max(transmittance) early-out was MEASURED SLOWER at
    # every density (300-box 0.59→0.66 ms, 3000-box 1.4→5.9 ms device): the
    # scalar reduce in the loop condition serializes the vector pipeline,
    # and the scenes' shadow falloffs keep some pixel's T high enough that
    # tiles rarely exit early anyway. The fori body has only the
    # accumulation dependency, which Mosaic pipelines.
    def body(j, carry):
        r, g, b, a = carry
        qi = tidx_ref[0, 0, j] - qid_base

        def fget(k):
            return fields_ref[qi, k]

        mode = modes_ref[qi, QI_MODE]
        mask_i = modes_ref[qi, QI_MASK]
        fr, fg, fb, fa = eval_quad_planar(
            fget, mode, px, py, backdrop_planes=bd,
            atlas_ref=atlas_ref, tile_origin=(x0, y0),
            subpixel_positioning=subpixel_positioning, atlas_size=atlas_size,
        )
        fa = fa * masks_ref[mask_i]
        inv = 1.0 - fa
        return (fr * fa + r * inv, fg * fa + g * inv, fb * fa + b * inv,
                fa + a * inv)

    init = (frame_ref[0], frame_ref[1], frame_ref[2], frame_ref[3])
    r, g, b, a = jax.lax.fori_loop(j_lo, j_hi, body, init)
    out_ref[0] = r
    out_ref[1] = g
    out_ref[2] = b
    out_ref[3] = a


# Largest quad window one pallas_call holds in VMEM: the whole (N, 68) f32
# tape + modes + frame/mask tiles must fit the ~16 MB scoped VMEM budget.
# A 32k-quad tape in one call (8.9 MB of fields) sits exactly at the Mosaic
# scoped-VMEM cliff (16.28 vs 16.00 MB — compile-variance OOM, then a
# silent XLA fallback). Bigger tapes run as ceil(N / CHUNK) sequential
# calls composited in draw order; each extra full-frame pass costs ~2x33 MB
# of HBM traffic (~0.1 ms) — far cheaper than losing the kernel.
VMEM_QUAD_CHUNK = int(_os.environ.get("FIGDRAW_VMEM_CHUNK", "8192"))
# The megakernel cannot chunk (mask planes live in VMEM registers across the
# whole walk); its whole-tape cap is the largest row count MEASURED to
# compile reliably (16384 rows = 4.5 MB of fields; 32768 sits on the cliff).
VMEM_MEGA_ROWS = int(_os.environ.get("FIGDRAW_VMEM_MEGA_ROWS", "16384"))


def _raster_tiles(fields, modes, tile_idx, tile_counts, seg, frame_planes,
                  masks, backdrop_planes, tiles_y: int, tiles_x: int,
                  has_backdrop: bool, mask_target: bool = False,
                  tile_h: int = 0, tile_w: int = 0, atlas_planes=None,
                  subpixel_positioning: bool = False, atlas_size: int = 0):
    n = fields.shape[0]
    out = frame_planes
    for lo in range(0, n, VMEM_QUAD_CHUNK):
        hi = min(n, lo + VMEM_QUAD_CHUNK)
        if lo == 0 and hi == n:
            seg_k = seg
        else:
            seg_k = jnp.stack([
                jnp.clip(seg[0], lo, hi), jnp.clip(seg[1], lo, hi), seg[2]
            ])
        out = _raster_tiles_call(
            fields[lo:hi], modes[lo:hi], tile_idx, tile_counts, seg_k, out,
            masks, backdrop_planes, tiles_y, tiles_x, has_backdrop,
            mask_target=mask_target, tile_h=tile_h, tile_w=tile_w,
            atlas_planes=atlas_planes,
            subpixel_positioning=subpixel_positioning, atlas_size=atlas_size,
            qid_base=lo,
        )
    return out


@functools.partial(
    jax.jit,
    static_argnames=("tiles_y", "tiles_x", "has_backdrop", "mask_target",
                     "tile_h", "tile_w", "subpixel_positioning", "atlas_size",
                     "qid_base"),
)
def _raster_tiles_call(fields, modes, tile_idx, tile_counts, seg, frame_planes,
                       masks, backdrop_planes, tiles_y: int, tiles_x: int,
                       has_backdrop: bool, mask_target: bool = False,
                       tile_h: int = 0, tile_w: int = 0, atlas_planes=None,
                       subpixel_positioning: bool = False, atlas_size: int = 0,
                       qid_base: int = 0):
    n = fields.shape[0]
    n_masks = masks.shape[0]
    th = tile_h or TILE_H
    tw = tile_w or TILE_W
    planes = frame_planes.shape[0]
    has_atlas = atlas_planes is not None

    def tile_map(ty, tx, *_refs):
        return (0, ty, tx)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # fields, whole
        pl.BlockSpec(memory_space=pltpu.VMEM),  # modes, whole
        pl.BlockSpec((1, 1, n), lambda ty, tx, *_r: (ty * tiles_x + tx, 0, 0),
                     memory_space=pltpu.SMEM),  # tile index list row
        pl.BlockSpec((planes, th, tw), tile_map, memory_space=pltpu.VMEM),  # target tile
        pl.BlockSpec((n_masks, th, tw), lambda ty, tx, *_r: (0, ty, tx),
                     memory_space=pltpu.VMEM),  # mask tiles
    ]
    inputs = [fields, modes, tile_idx, frame_planes, masks]
    if has_backdrop:
        in_specs.append(
            pl.BlockSpec((4, th, tw), tile_map, memory_space=pltpu.VMEM)
        )
        inputs.append(backdrop_planes)
    if has_atlas:
        # whole channel-planar atlas resident in VMEM (gated <= 512 px by the
        # executor); 1:1 quads window-sample it in-kernel
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        inputs.append(atlas_planes)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # tile_counts, seg
        grid=(tiles_y, tiles_x),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((planes, th, tw), tile_map, memory_space=pltpu.VMEM),
    )

    kernel = functools.partial(
        _kernel, tiles_x=tiles_x, has_backdrop=has_backdrop,
        mask_target=mask_target, has_atlas=has_atlas,
        subpixel_positioning=subpixel_positioning, atlas_size=atlas_size,
        qid_base=qid_base,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(frame_planes.shape, jnp.float32),
        interpret=_interpret(),
    )(tile_counts, seg, *inputs)
    return out


def draw_pass_planar(fields, modes, start, end, frame_planes, masks_p,
                     backdrop_planes=None, y_offset=None,
                     tile_h: int = 0, tile_w: int = 0,
                     atlas_planes=None, subpixel_positioning: bool = False,
                     atlas_size: int = 0):
    """Planar-layout draw pass over quads [start, end) — the building block the
    fused frame executor chains inside one jit.

    frame_planes: (4, PH, PW) f32 with PH, PW multiples of the tile size;
    masks_p: (K, PH, PW); backdrop_planes: (4, PH, PW) or None. y_offset:
    global row of frame_planes row 0 when row-sharded over a mesh.
    """
    import os

    if os.environ.get("FIGDRAW_PALLAS_CRASH_TEST") == "1":
        # fault injection exercising the renderer's XLA fallback
        # (the reference's -d:vulkanCrashTest analog, siwinshim.nim:769-774)
        raise RuntimeError("pallas crash test requested")
    th = tile_h or TILE_H
    tw = tile_w or TILE_W
    ph, pw = frame_planes.shape[1], frame_planes.shape[2]
    assert ph % th == 0 and pw % tw == 0
    tiles_y = ph // th
    tiles_x = pw // tw

    row0 = (
        jnp.int32(0) if y_offset is None
        else jnp.asarray(y_offset).astype(jnp.int32)
    )
    # modes enables opaque occlusion: every quad in this run targets the
    # frame, so a full-tile opaque quad truncates the tile's list
    tile_idx, tile_counts = bin_quads(
        fields, start, end, tiles_y, tiles_x, th, tw,
        y_offset=row0.astype(jnp.float32), modes=modes,
    )
    tile_idx = tile_idx[:, None, :]  # (T, 1, N): TPU block dims must tile the last two axes

    seg = jnp.stack([jnp.int32(0), jnp.int32(2**30), row0])  # whole binned list
    return _raster_tiles(
        fields, modes, tile_idx, tile_counts, seg, frame_planes, masks_p,
        backdrop_planes, tiles_y, tiles_x, backdrop_planes is not None,
        tile_h=th, tile_w=tw, atlas_planes=atlas_planes,
        subpixel_positioning=subpixel_positioning, atlas_size=atlas_size,
    )


def prebin(fields, n_quads, ph: int, pw: int, y_offset=None,
           tile_h: int = 0, tile_w: int = 0, modes=None, run_bounds=None,
           n_runs: int = 0):
    """Bin the whole tape once; draw runs then select their contiguous
    per-tile segments in-kernel (runs partition the tape in draw order, and
    each tile's binned list is ascending). modes + run_bounds (n_runs static)
    enable run-scoped opaque-occlusion culling in the same single argsort
    (see binning.bin_quads)."""
    th = tile_h or TILE_H
    tw = tile_w or TILE_W
    tiles_y = ph // th
    tiles_x = pw // tw
    y0 = jnp.float32(0) if y_offset is None else y_offset.astype(jnp.float32)
    tile_idx, tile_counts = bin_quads(
        fields, jnp.int32(0), n_quads, tiles_y, tiles_x, th, tw, y_offset=y0,
        modes=modes, run_bounds=run_bounds, n_runs=n_runs,
    )
    return tile_idx[:, None, :], tile_counts


def _seg3(start, end, y_offset):
    row0 = (
        jnp.int32(0) if y_offset is None
        else jnp.asarray(y_offset).astype(jnp.int32)
    )
    return jnp.stack([
        jnp.asarray(start).astype(jnp.int32),
        jnp.asarray(end).astype(jnp.int32),
        row0,
    ])


def draw_pass_planar_prebinned(fields, modes, start, end, tile_idx, tile_counts,
                               frame_planes, masks_p, backdrop_planes=None,
                               y_offset=None, tile_h: int = 0, tile_w: int = 0,
                               atlas_planes=None,
                               subpixel_positioning: bool = False,
                               atlas_size: int = 0):
    import os

    if os.environ.get("FIGDRAW_PALLAS_CRASH_TEST") == "1":
        # fault injection exercising the renderer's XLA fallback
        raise RuntimeError("pallas crash test requested")
    th = tile_h or TILE_H
    tw = tile_w or TILE_W
    ph, pw = frame_planes.shape[1], frame_planes.shape[2]
    return _raster_tiles(
        fields, modes, tile_idx, tile_counts, _seg3(start, end, y_offset),
        frame_planes, masks_p, backdrop_planes, ph // th, pw // tw,
        backdrop_planes is not None, tile_h=th, tile_w=tw,
        atlas_planes=atlas_planes, subpixel_positioning=subpixel_positioning,
        atlas_size=atlas_size,
    )


def draw_pass_mask_prebinned(fields, modes, start, end, tile_idx, tile_counts,
                             mask_plane, masks_p, y_offset=None,
                             tile_h: int = 0, tile_w: int = 0):
    """Binned mask-plane write (a^2 + m(1-a) blend); mask_plane: (1, PH, PW)."""
    th = tile_h or TILE_H
    tw = tile_w or TILE_W
    ph, pw = mask_plane.shape[1], mask_plane.shape[2]
    return _raster_tiles(
        fields, modes, tile_idx, tile_counts, _seg3(start, end, y_offset),
        mask_plane, masks_p, None, ph // th, pw // tw, False,
        mask_target=True, tile_h=th, tile_w=tw,
    )


# --- megakernel: the whole multi-pass frame as ONE tile walk ---------------------
#
# Mask-heavy scenes (one clip per table cell — the reference's
# windy_clip_mask_benchmark) cost one full-frame Pallas pass per draw run and
# per mask write in the rolled executor: ~3 passes per cell, each DMAing every
# frame tile through VMEM. The megakernel removes the pass structure entirely:
# the executor bakes each quad's TARGET (frame or mask plane k) and the
# clear-mask boundaries into the mode lane's high bits, and one kernel walks
# each tile's binned quads once in tape order, holding the frame AND the mask
# planes in VMEM registers. Per-tile cost is proportional to the quads that
# touch the tile; HBM traffic is one frame read + one write, independent of
# how many masks the scene uses.
#
# Mode-lane packing (host side, executor.pack_mega_modes):
#   bits  0-11  sdf mode (mode + 128*elliptical + 256*fillMode, < 4096)
#   bit     12  clear-mask sentinel (fields row carries a full-frame bbox)
#   bits 16+    target + 1 (0 = frame, k+1 = mask plane k)

MEGA_CLEAR_BIT = 1 << 12
MEGA_TARGET_SHIFT = 16
MEGA_MODE_MASK = 0xFFF
# bits passed through to the evaluator: the 0xFFF packed mode + the 1:1
# atlas-sample flag (bit 13, quad_eval.MODE_ATLAS11_BIT); the clear bit (12)
# and target bits (16+) stay kernel-internal
MEGA_EVAL_MASK = 0x2FFF


def _mega_kernel(counts_ref, seg_ref, fields_ref, modes_ref, tidx_ref, frame_ref,
                 *rest, tiles_x: int, n_masks: int, has_atlas: bool = False,
                 subpixel_positioning: bool = False, atlas_size: int = 0):
    rest = list(rest)
    atlas_ref = rest.pop(0) if has_atlas else None
    (out_ref,) = rest
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    t = ty * tiles_x + tx
    count = counts_ref[t]
    row0 = seg_ref[0]  # global row of tile row 0 (row-sharded bands)

    th, tw = frame_ref.shape[1], frame_ref.shape[2]
    y0 = (row0 + ty * th).astype(jnp.float32)
    x0 = (tx * tw).astype(jnp.float32)
    iy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32)
    ix = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
    py = y0 + iy + 0.5
    px = x0 + ix + 0.5

    # mask planes live as n_masks SEPARATE (th, tw) registers in the carry:
    # n_masks is static, so plane selection is a lax.switch over the scalar
    # plane index — one branch executes — instead of (n_masks, th, tw)
    # compare/select/sum sweeps per quad (which cost ~3*n_masks tile-ops on
    # every quad of a masked scene)
    ones = jnp.ones((th, tw), jnp.float32)
    zeros = jnp.zeros((th, tw), jnp.float32)
    masks0 = (ones,) + (zeros,) * (n_masks - 1)  # plane 0 = all-pass parent

    def _plane(masks, k):
        """masks[k] for a clamped scalar k (one switch branch executes)."""
        if n_masks == 1:
            return masks[0]
        k = jnp.clip(k, 0, n_masks - 1)
        return jax.lax.switch(k, [lambda m=m: m for m in masks])

    def _with_plane(masks, k, new):
        """masks with plane k replaced (k >= 1: plane 0 is never a target)."""
        if n_masks <= 1:
            return masks
        k = jnp.clip(k, 1, n_masks - 1)
        return jax.lax.switch(
            k - 1,
            [
                lambda i=i: tuple(
                    new if j == i + 1 else masks[j] for j in range(n_masks)
                )
                for i in range(n_masks - 1)
            ],
        )

    def body(j, carry):
        r, g, b, a, *masks = carry
        masks = tuple(masks)
        qi = tidx_ref[0, 0, j]
        raw = modes_ref[qi, QI_MODE]
        tgt_enc = jax.lax.shift_right_logical(raw, MEGA_TARGET_SHIFT)
        is_clear = jax.lax.shift_right_logical(raw, 12) & 1
        mode = raw & MEGA_EVAL_MASK
        mask_i = modes_ref[qi, QI_MASK]

        def clear_branch(c):
            r, g, b, a, *masks = c
            return (r, g, b, a) + _with_plane(tuple(masks), tgt_enc - 1, zeros)

        def draw_branch(c):
            r, g, b, a, *masks = c
            masks = tuple(masks)

            def fget(k):
                return fields_ref[qi, k]

            fr, fg, fb, fa = eval_quad_planar(
                fget, mode, px, py,
                atlas_ref=atlas_ref, tile_origin=(x0, y0),
                subpixel_positioning=subpixel_positioning,
                atlas_size=atlas_size,
            )
            fa = fa * _plane(masks, mask_i)

            def to_frame(_):
                inv = 1.0 - fa
                return (fr * fa + r * inv, fg * fa + g * inv,
                        fb * fa + b * inv, fa + a * inv) + masks

            def to_mask(_):
                tk = tgt_enc - 1
                cur = _plane(masks, tk)
                new = fa * fa + cur * (1.0 - fa)  # mask.frag through GL blend
                return (r, g, b, a) + _with_plane(masks, tk, new)

            return jax.lax.cond(tgt_enc == 0, to_frame, to_mask, None)

        return jax.lax.cond(is_clear == 1, clear_branch, draw_branch, carry)

    init = (frame_ref[0], frame_ref[1], frame_ref[2], frame_ref[3]) + masks0
    r, g, b, a, *_masks = jax.lax.fori_loop(jnp.int32(0), count, body, init)
    out_ref[0] = r
    out_ref[1] = g
    out_ref[2] = b
    out_ref[3] = a


@functools.partial(
    jax.jit, static_argnames=("tiles_y", "tiles_x", "n_masks", "tile_h", "tile_w",
                              "subpixel_positioning", "atlas_size")
)
def _raster_mega(fields, modes, tile_idx, tile_counts, seg, frame_planes,
                 tiles_y: int, tiles_x: int, n_masks: int,
                 tile_h: int = 0, tile_w: int = 0, atlas_planes=None,
                 subpixel_positioning: bool = False, atlas_size: int = 0):
    n = fields.shape[0]
    th = tile_h or TILE_H
    tw = tile_w or TILE_W
    has_atlas = atlas_planes is not None

    def tile_map(ty, tx, *_refs):
        return (0, ty, tx)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # fields
        pl.BlockSpec(memory_space=pltpu.VMEM),  # modes
        pl.BlockSpec((1, 1, n), lambda ty, tx, *_r: (ty * tiles_x + tx, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((4, th, tw), tile_map, memory_space=pltpu.VMEM),
    ]
    inputs = [fields, modes, tile_idx, frame_planes]
    if has_atlas:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        inputs.append(atlas_planes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # tile_counts, seg (row0)
        grid=(tiles_y, tiles_x),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((4, th, tw), tile_map, memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(
        _mega_kernel, tiles_x=tiles_x, n_masks=n_masks, has_atlas=has_atlas,
        subpixel_positioning=subpixel_positioning, atlas_size=atlas_size,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(frame_planes.shape, jnp.float32),
        interpret=_interpret(),
    )(tile_counts, seg, *inputs)


def draw_pass_mega(fields, modes, frame_planes, n_masks: int, y_offset=None,
                   tile_h: int = 0, tile_w: int = 0, atlas_planes=None,
                   subpixel_positioning: bool = False, atlas_size: int = 0):
    """One-kernel whole frame over target-baked modes; frame_planes (4, PH, PW)."""
    import os

    if os.environ.get("FIGDRAW_PALLAS_CRASH_TEST") == "1":
        # fault injection exercising the renderer's XLA fallback
        raise RuntimeError("pallas crash test requested")
    th = tile_h or TILE_H
    tw = tile_w or TILE_W
    ph, pw = frame_planes.shape[1], frame_planes.shape[2]
    tile_idx, tile_counts = prebin(
        fields, jnp.int32(fields.shape[0]), ph, pw, y_offset=y_offset,
        tile_h=th, tile_w=tw,
    )
    row0 = (
        jnp.int32(0) if y_offset is None
        else jnp.asarray(y_offset).astype(jnp.int32)
    )
    return _raster_mega(
        fields, modes, tile_idx, tile_counts, row0[None], frame_planes,
        ph // th, pw // tw, n_masks, tile_h=th, tile_w=tw,
        atlas_planes=atlas_planes, subpixel_positioning=subpixel_positioning,
        atlas_size=atlas_size,
    )


def draw_pass_frame(fields, modes, count, frame, masks, atlas=None, backdrop=None,
                    subpixel_positioning: bool = False):
    """(H, W, 4)-layout convenience wrapper around draw_pass_planar."""
    height, width = frame.shape[0], frame.shape[1]
    tiles_y = -(-height // TILE_H)
    tiles_x = -(-width // TILE_W)
    ph = tiles_y * TILE_H
    pw = tiles_x * TILE_W

    frame_planes = jnp.transpose(frame, (2, 0, 1))
    if (ph, pw) != (height, width):
        frame_planes = jnp.pad(frame_planes, ((0, 0), (0, ph - height), (0, pw - width)))
        masks_p = jnp.pad(masks, ((0, 0), (0, ph - height), (0, pw - width)))
    else:
        masks_p = masks

    if backdrop is not None:
        backdrop_planes = jnp.transpose(backdrop, (2, 0, 1))
        if (ph, pw) != (height, width):
            backdrop_planes = jnp.pad(
                backdrop_planes, ((0, 0), (0, ph - height), (0, pw - width))
            )
    else:
        backdrop_planes = None

    out = draw_pass_planar(
        fields, modes, jnp.int32(0), count, frame_planes, masks_p, backdrop_planes
    )
    out = out[:, :height, :width]
    return jnp.transpose(out, (1, 2, 0))
