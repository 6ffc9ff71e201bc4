"""Benchmark / demo scenes.

`make_render_tree` reproduces the structure of the reference's 300-box
animated shadow demo (/root/reference/examples/renderlist_100_common.nim:11-251):
a translucent white backdrop, `copies` × 3 animated rounded/shadowed/gradient
boxes (red stroked elliptical-corner, green gradient + drop shadow, blue
gradient + inner shadow + stroke), an elliptical orange pill, a moving
18px backdrop-blur panel and a yellow overlay rect. Box placement uses
numpy's seeded RNG (the reference uses Nim's; positions differ, scene
composition and load match).
"""

from __future__ import annotations

import math

import numpy as np

from .basics import (
    BackdropBlurStyle,
    FigFlags,
    FigKind,
    RenderShadow,
    RenderStroke,
    ShadowStyle,
)
from .colors import rgba
from .fill import FillGradientAxis, fill, linear
from .geometry import rect
from .nodes import Fig, RenderList, Renders, new_renders


# Box-placement clamp bounds shared by the object-form builder, the numpy
# animator and the native animator (native.scene_animate passes these to
# fd_scene_animate, so this is the single source of truth): the rightmost
# box column starts at x=320 / the lowest at y=300, max animated size
# 260x180.
_SCENE_CLAMP_X = 320.0 + 260.0  # = 580
_SCENE_CLAMP_Y = 300.0 + 180.0  # = 480

_scene_random_cache = {}


def _scene_randoms(copies: int, max_x: float, max_y: float):
    key = (copies, max_x, max_y)
    cached = _scene_random_cache.get(key)
    if cached is None:
        rng = np.random.RandomState(12345)
        cached = (
            rng.uniform(0.0, max_x, size=copies),
            rng.uniform(0.0, max_y, size=copies),
        )
        _scene_random_cache[key] = cached
    return cached


# The animator's sixteen phase functions t*a + i*b, batched into ONE sin and
# ONE cos call per frame (element-wise identical to sixteen separate calls;
# separate numpy calls on 100-element arrays cost ~2-5 us each in dispatch
# alone). Row order is load-bearing — _scene_animate indexes these.
_SIN_COEF = np.array(
    [[1.0, 0.15], [0.8, 0.07], [1.25, 0.11], [0.7, 0.05], [0.85, 0.05],
     [1.1, 0.05], [0.9, 0.03], [1.05, 0.06], [0.85, 0.04]]
)
_COS_COEF = np.array(
    [[0.9, 0.2], [0.65, 0.09], [0.8, 0.06], [0.95, 0.08], [0.75, 0.04],
     [0.9, 0.03], [0.8, 0.04]]
)

_scene_anim_cache = {}


def _scene_anim_state(copies: int):
    """Per-copies cached phase matrices and scratch buffers (one allocation,
    reused every frame)."""
    state = _scene_anim_cache.get(copies)
    if state is None:
        i = np.arange(copies, dtype=np.float64)
        sin_phase = i[None, :] * _SIN_COEF[:, 1:2]
        cos_phase = i[None, :] * _COS_COEF[:, 1:2]
        state = {
            # angle-addition tables: sin/cos of the per-copy phase offsets,
            # evaluated once. Per frame only the 9+7 t-dependent scalars go
            # through libm; the (16, copies) grids are 2 mul + 1 add each
            # (sin(ta+ib) = sin(ta)cos(ib) + cos(ta)sin(ib)). ~7x on the
            # animator at 4000 copies vs the batched direct sin/cos, within
            # 1 ULP of it (the object-form builder make_render_tree stays
            # the direct-evaluation semantic reference).
            "sin_of_sp": np.sin(sin_phase),
            "cos_of_sp": np.cos(sin_phase),
            "sin_of_cp": np.sin(cos_phase),
            "cos_of_cp": np.cos(cos_phase),
            # contiguous (the C animator takes raw pointers; numpy is
            # indifferent)
            "sin_t": np.ascontiguousarray(_SIN_COEF[:, 0]),
            "cos_t": np.ascontiguousarray(_COS_COEF[:, 0]),
            "s_buf": np.empty_like(sin_phase),
            "c_buf": np.empty_like(cos_phase),
            "tmp_s": np.empty_like(sin_phase),
            "tmp_c": np.empty_like(cos_phase),
            "box": np.empty((3, copies, 4), np.float64),
            "corners": np.empty((3, copies, 4), np.float64),
        }
        _scene_anim_cache[copies] = state
    return state


def _scene_static(w: float, h: float, copies: int):
    """Everything in the 300-box scene that does NOT depend on the frame:
    node kinds/flags, fill kinds and colors, strokes, shadow styles and
    shadow fills, the static pill. Returns (RendersArray, RenderListArray)."""
    from .nodesarray import RenderListArray, RendersArray

    n_nodes = 1 + copies * 3 + 3
    lst = RenderListArray(capacity=n_nodes)
    lst.count = n_nodes
    lst.root_ids = list(range(n_nodes))
    nodes = lst.nodes
    nodes["parent"] = -1

    # backdrop
    nodes["kind"][0] = int(FigKind.nkRectangle)
    nodes["box"][0] = (0, 0, w, h)
    nodes["fill"]["kind"][0] = 0
    nodes["fill"]["c0"][0] = (255, 255, 255, 155)

    red = slice(1, 1 + 3 * copies, 3)
    green = slice(2, 2 + 3 * copies, 3)
    blue = slice(3, 3 + 3 * copies, 3)

    nodes["kind"][red] = int(FigKind.nkRectangle)
    nodes["flags"][red] = int(FigFlags.NfEllipticalCorners)
    nodes["fill"]["c0"][red] = (220, 40, 40, 155)
    nodes["stroke_weight"][red] = 5.0
    nodes["stroke_fill"]["c0"][red] = (0, 0, 0, 155)

    nodes["kind"][green] = int(FigKind.nkRectangle)
    green_grad = (np.arange(copies) % 2) == 0
    gidx = np.arange(2, 2 + 3 * copies, 3)
    gg = gidx[green_grad]
    gs = gidx[~green_grad]
    nodes["fill"]["kind"][gg] = 2
    nodes["fill"]["axis"][gg] = np.where(
        (np.arange(copies)[green_grad] % 4) < 2,
        int(FillGradientAxis.fgaX),
        int(FillGradientAxis.fgaDiagTLBR),
    )
    nodes["fill"]["midpos"][gg] = 128
    nodes["fill"]["c0"][gg] = (18, 112, 64, 255)
    nodes["fill"]["c1"][gg] = (40, 180, 90, 255)
    nodes["fill"]["c2"][gg] = (78, 224, 188, 255)
    nodes["fill"]["c0"][gs] = (40, 180, 90, 155)
    nodes["shadows"]["style"][green, 0] = 1
    nodes["shadows"]["fill"]["c0"][green, 0] = (0, 0, 0, 155)

    nodes["kind"][blue] = int(FigKind.nkRectangle)
    blue_grad = (np.arange(copies) % 3) == 0
    bidx = np.arange(3, 3 + 3 * copies, 3)
    bg_ = bidx[blue_grad]
    bs_ = bidx[~blue_grad]
    nodes["fill"]["kind"][bg_] = 2
    nodes["fill"]["axis"][bg_] = np.where(
        (np.arange(copies)[blue_grad] % 2) == 0,
        int(FillGradientAxis.fgaY),
        int(FillGradientAxis.fgaDiagBLTR),
    )
    nodes["fill"]["midpos"][bg_] = 132
    nodes["fill"]["c0"][bg_] = (44, 72, 186, 255)
    nodes["fill"]["c1"][bg_] = (60, 90, 220, 255)
    nodes["fill"]["c2"][bg_] = (118, 168, 255, 255)
    nodes["fill"]["c0"][bs_] = (60, 90, 220, 155)
    nodes["stroke_weight"][blue] = 4.0
    nodes["stroke_fill"]["c0"][blue] = (255, 255, 255, 210)
    nodes["shadows"]["style"][blue, 0] = 2
    nodes["shadows"]["fill"]["kind"][bg_, 0] = 1
    nodes["shadows"]["fill"]["axis"][bg_, 0] = int(FillGradientAxis.fgaDiagBLTR)
    nodes["shadows"]["fill"]["c0"][bg_, 0] = (25, 25, 40, 100)
    nodes["shadows"]["fill"]["c1"][bg_, 0] = (65, 65, 95, 180)
    nodes["shadows"]["fill"]["c0"][bs_, 0] = (40, 40, 60, 150)

    # static elliptical pill
    base = 1 + 3 * copies
    nodes["kind"][base] = int(FigKind.nkRectangle)
    nodes["box"][base] = (max(20.0, w - 200.0), 20, 180, 100)
    nodes["fill"]["c0"][base] = (238, 140, 30, 220)
    nodes["corners"][base] = (90, 90, 90, 90)
    nodes["corners_y"][base] = (50, 50, 50, 50)
    nodes["flags"][base] = int(FigFlags.NfEllipticalCorners)
    nodes["stroke_weight"][base] = 4.0
    nodes["stroke_fill"]["c0"][base] = (90, 45, 0, 220)

    # blur panel + overlay (boxes animate; styles don't)
    nodes["kind"][base + 1] = int(FigKind.nkBackdropBlur)
    nodes["blur"][base + 1] = 18.0
    nodes["kind"][base + 2] = int(FigKind.nkRectangle)
    nodes["fill"]["c0"][base + 2] = (255, 225, 55, 120)
    nodes["stroke_weight"][base + 2] = 6.0
    nodes["stroke_fill"]["c0"][base + 2] = (95, 72, 0, 185)

    out = RendersArray()
    out.set_layer(0, lst)
    return out, lst


def _scene_animate(nodes, w: float, h: float, frame: int, copies: int) -> None:
    """The frame-dependent columns: box positions/sizes, corner radii,
    shadow blur/spread/offsets, and the moving blur panel + overlay.
    Routes to the C animator (native fd_scene_animate — the reference's
    demo loop animates in compiled Nim, renderlist_100_common.nim) when the
    flattener library is up, else the vectorized numpy twin below; the two
    are BIT-identical (tests/test_scenes_native.py)."""
    from . import native

    st = _scene_anim_state(copies)
    max_x = max(0.0, w - _SCENE_CLAMP_X)
    max_y = max(0.0, h - _SCENE_CLAMP_Y)
    base_xs, base_ys = _scene_randoms(copies, max_x, max_y)
    if native.available() and native.scene_animate(
            nodes, w, h, frame, copies, base_xs, base_ys, st):
        return
    _scene_animate_np(nodes, w, h, frame, copies)


def _scene_animate_np(nodes, w: float, h: float, frame: int,
                      copies: int) -> None:
    """numpy animator — the semantic reference for fd_scene_animate. All
    sixteen phase functions ride cached angle-addition tables — per
    frame only 32 scalar sin/cos hit libm (see _scene_anim_state; within
    1 ULP of direct evaluation) — and box/corner rows build in cached
    scratch buffers instead of np.stack."""
    t = frame * 0.02
    st = _scene_anim_state(copies)
    # s[k] = sin(t*a_k + i*b_k), c[k] = cos(...): angle addition over the
    # cached per-copy phase tables (see _scene_anim_state)
    sin_ta = np.sin(t * st["sin_t"])[:, None]
    cos_ta = np.cos(t * st["sin_t"])[:, None]
    s = np.multiply(st["cos_of_sp"], sin_ta, out=st["s_buf"])
    s += np.multiply(st["sin_of_sp"], cos_ta, out=st["tmp_s"])
    sin_tc = np.sin(t * st["cos_t"])[:, None]
    cos_tc = np.cos(t * st["cos_t"])[:, None]
    c = np.multiply(st["cos_of_cp"], cos_tc, out=st["c_buf"])
    c -= np.multiply(st["sin_of_cp"], sin_tc, out=st["tmp_c"])

    max_x = max(0.0, w - _SCENE_CLAMP_X)
    max_y = max(0.0, h - _SCENE_CLAMP_Y)
    base_xs, base_ys = _scene_randoms(copies, max_x, max_y)
    off_x = np.clip(base_xs + s[0] * 20, 0.0, max_x)
    off_y = np.clip(base_ys + c[0] * 20, 0.0, max_y)

    pulse_w = 0.5 + 0.5 * s[1]
    pulse_h = 0.5 + 0.5 * c[1]

    red = slice(1, 1 + 3 * copies, 3)
    green = slice(2, 2 + 3 * copies, 3)
    blue = slice(3, 3 + 3 * copies, 3)
    box, corners = st["box"], st["corners"]

    # red: elliptical corner animation
    cp = 0.5 + 0.5 * s[2]
    c0f = 4.0 + 26.0 * cp
    c1f = 6.0 + 22.0 * (1.0 - cp)
    c2f = 8.0 + 18.0 * (0.5 + 0.5 * s[3])
    c3f = 10.0 + 16.0 * (0.5 + 0.5 * c[2])
    box[0, :, 0] = 60.0 + off_x
    box[0, :, 1] = 60.0 + off_y
    box[0, :, 2] = 160.0 + 100.0 * pulse_w
    box[0, :, 3] = 110.0 + 70.0 * pulse_h
    nodes["box"][red] = box[0]
    # float -> u16 field assignment truncates toward zero, same as the
    # object form's int(); corners_y col 1/3 truncate AFTER doubling
    corners[0, :, 0] = c0f
    corners[0, :, 1] = c1f
    corners[0, :, 2] = c2f
    corners[0, :, 3] = c3f
    nodes["corners"][red] = corners[0]
    corners[0, :, 1] = c1f * 2
    corners[0, :, 3] = c3f * 2
    nodes["corners_y"][red] = corners[0]

    # green: box, corners, drop shadow animation
    gp = 0.5 + 0.5 * c[3]
    box[1, :, 0] = 320.0 + off_x
    box[1, :, 1] = 120.0 + off_y
    box[1, :, 2] = 160.0 + 100.0 * pulse_h
    box[1, :, 3] = 110.0 + 70.0 * pulse_w
    nodes["box"][green] = box[1]
    corners[1, :, 0] = 6.0 + 22.0 * gp
    corners[1, :, 1] = 8.0 + 18.0 * (1.0 - gp)
    corners[1, :, 2] = 10.0 + 16.0 * (0.5 + 0.5 * c[4])
    corners[1, :, 3] = 12.0 + 14.0 * (0.5 + 0.5 * s[4])
    nodes["corners"][green] = corners[1]
    sp = 0.5 + 0.5 * s[5]
    sh = nodes["shadows"]
    sh["blur"][green, 0] = np.maximum(0.0, 6.0 + 18.0 * sp)
    sh["spread"][green, 0] = np.maximum(0.0, 4.0 + 20.0 * (1.0 - sp))
    sh["x"][green, 0] = 6.0 + 10.0 * s[6]
    sh["y"][green, 0] = 6.0 + 10.0 * c[5]

    # blue: box + inner shadow animation
    box[2, :, 0] = 180.0 + off_x
    box[2, :, 1] = 300.0 + off_y
    box[2, :, 2] = 160.0 + 100.0 * (1.0 - pulse_w)
    box[2, :, 3] = 110.0 + 70.0 * (1.0 - pulse_h)
    nodes["box"][blue] = box[2]
    ip = 0.5 + 0.5 * s[7]
    sh["blur"][blue, 0] = np.maximum(0.0, 8.0 + 10.0 * ip)
    sh["spread"][blue, 0] = np.maximum(0.0, 2.0 + 10.0 * (1.0 - ip))
    sh["x"][blue, 0] = 6.0 * s[8]
    sh["y"][blue, 0] = 6.0 * c[6]

    # moving blur panel + overlay
    base = 1 + 3 * copies
    yw, yh, ym = 360.0, 240.0, 20.0
    yx = ym + max(0.0, w - yw - ym * 2.0) * (0.5 + 0.5 * math.sin(t * 0.33))
    yy = ym + max(0.0, h - yh - ym * 2.0) * (0.5 + 0.5 * math.cos(t * 0.41))
    yc = int(20.0 + 12.0 * (0.5 + 0.5 * math.sin(t * 0.7)))
    nodes["box"][base + 1] = (yx, yy, yw, yh)
    nodes["corners"][base + 1] = (yc,) * 4
    nodes["box"][base + 2] = (yx, yy, yw, yh)
    nodes["corners"][base + 2] = (yc,) * 4


def make_render_tree_array(w: float, h: float, frame: int, copies: int = 100,
                           cache: dict = None):
    """Vectorized array-form builder of the same scene as make_render_tree —
    the production path: numpy column writes straight into FIG_DTYPE rows,
    consumed zero-copy by the native flattener. ~100x faster to build than
    the object form.

    cache: a caller-owned dict enables the RETAINED form — the static
    columns (kinds, fills, strokes, shadow styles) are written once and only
    the animated columns update per frame, like a production frame loop
    mutating a retained scene array."""
    if cache is not None:
        key = (w, h, copies)
        ent = cache.get(key)
        if ent is None:
            ent = cache[key] = _scene_static(w, h, copies)
        out, lst = ent
        _scene_animate(lst.nodes, w, h, frame, copies)
        return out
    out, lst = _scene_static(w, h, copies)
    _scene_animate(lst.nodes, w, h, frame, copies)
    return out


def make_render_tree(w: float, h: float, frame: int, copies: int = 100) -> Renders:
    lst = RenderList()
    t = frame * 0.02

    lst.add_root(
        Fig(
            kind=FigKind.nkRectangle,
            zlevel=0,
            screen_box=rect(0, 0, w, h),
            fill=fill(rgba(255, 255, 255, 155)),
        )
    )

    red_start = (60.0, 60.0)
    green_start = (320.0, 120.0)
    blue_start = (180.0, 300.0)
    max_w, max_h = 260.0, 180.0
    max_x = max(0.0, w - (green_start[0] + max_w))
    max_y = max(0.0, h - (blue_start[1] + max_h))

    rng = np.random.RandomState(12345)
    base_xs = rng.uniform(0.0, max_x, size=copies)
    base_ys = rng.uniform(0.0, max_y, size=copies)

    for i in range(copies):
        jitter_x = math.sin(t + i * 0.15) * 20
        jitter_y = math.cos(t * 0.9 + i * 0.2) * 20
        off_x = min(max(base_xs[i] + jitter_x, 0.0), max_x)
        off_y = min(max(base_ys[i] + jitter_y, 0.0), max_y)

        pulse_w = 0.5 + 0.5 * math.sin(t * 0.8 + i * 0.07)
        pulse_h = 0.5 + 0.5 * math.cos(t * 0.65 + i * 0.09)
        red_w = 160.0 + 100.0 * pulse_w
        red_h = 110.0 + 70.0 * pulse_h
        green_w = 160.0 + 100.0 * pulse_h
        green_h = 110.0 + 70.0 * pulse_w
        blue_w = 160.0 + 100.0 * (1.0 - pulse_w)
        blue_h = 110.0 + 70.0 * (1.0 - pulse_h)

        cp = 0.5 + 0.5 * math.sin(t * 1.25 + i * 0.11)
        c0 = 4.0 + 26.0 * cp
        c1 = 6.0 + 22.0 * (1.0 - cp)
        c2 = 8.0 + 18.0 * (0.5 + 0.5 * math.sin(t * 0.7 + i * 0.05))
        c3 = 10.0 + 16.0 * (0.5 + 0.5 * math.cos(t * 0.8 + i * 0.06))

        gp = 0.5 + 0.5 * math.cos(t * 0.95 + i * 0.08)
        g0 = 6.0 + 22.0 * gp
        g1 = 8.0 + 18.0 * (1.0 - gp)
        g2 = 10.0 + 16.0 * (0.5 + 0.5 * math.cos(t * 0.75 + i * 0.04))
        g3 = 12.0 + 14.0 * (0.5 + 0.5 * math.sin(t * 0.85 + i * 0.05))

        sp = 0.5 + 0.5 * math.sin(t * 1.1 + i * 0.05)
        shadow_blur = max(0.0, 6.0 + 18.0 * sp)
        shadow_spread = max(0.0, 4.0 + 20.0 * (1.0 - sp))
        shadow_x = 6.0 + 10.0 * math.sin(t * 0.9 + i * 0.03)
        shadow_y = 6.0 + 10.0 * math.cos(t * 0.9 + i * 0.03)
        ip = 0.5 + 0.5 * math.sin(t * 1.05 + i * 0.06)
        inset_blur = max(0.0, 8.0 + 10.0 * ip)
        inset_spread = max(0.0, 2.0 + 10.0 * (1.0 - ip))
        inset_x = 6.0 * math.sin(t * 0.85 + i * 0.04)
        inset_y = 6.0 * math.cos(t * 0.8 + i * 0.04)
        use_green_gradient = (i % 2) == 0
        use_blue_gradient = (i % 3) == 0

        lst.add_root(
            Fig(
                kind=FigKind.nkRectangle,
                zlevel=0,
                corners=(int(c0), int(c1), int(c2), int(c3)),
                corner_radii_y=(int(c0), int(c1 * 2), int(c2), int(c3 * 2)),
                flags=FigFlags.NfEllipticalCorners,
                screen_box=rect(red_start[0] + off_x, red_start[1] + off_y, red_w, red_h),
                fill=fill(rgba(220, 40, 40, 155)),
                stroke=RenderStroke(weight=5.0, fill=fill(rgba(0, 0, 0, 155))),
            )
        )

        green_fill = (
            linear(
                rgba(18, 112, 64, 255),
                rgba(40, 180, 90, 255),
                rgba(78, 224, 188, 255),
                axis=(
                    FillGradientAxis.fgaX
                    if (i % 4) < 2
                    else FillGradientAxis.fgaDiagTLBR
                ),
                mid_pos=128,
            )
            if use_green_gradient
            else fill(rgba(40, 180, 90, 155))
        )
        lst.add_root(
            Fig(
                kind=FigKind.nkRectangle,
                zlevel=0,
                screen_box=rect(
                    green_start[0] + off_x, green_start[1] + off_y, green_w, green_h
                ),
                corners=(int(g0), int(g1), int(g2), int(g3)),
                fill=green_fill,
                shadows=(
                    RenderShadow(
                        style=ShadowStyle.DropShadow,
                        blur=shadow_blur,
                        spread=shadow_spread,
                        x=shadow_x,
                        y=shadow_y,
                        fill=fill(rgba(0, 0, 0, 155)),
                    ),
                ),
            )
        )

        blue_fill = (
            linear(
                rgba(44, 72, 186, 255),
                rgba(60, 90, 220, 255),
                rgba(118, 168, 255, 255),
                axis=(
                    FillGradientAxis.fgaY
                    if (i % 2) == 0
                    else FillGradientAxis.fgaDiagBLTR
                ),
                mid_pos=132,
            )
            if use_blue_gradient
            else fill(rgba(60, 90, 220, 155))
        )
        inner_fill = (
            linear(rgba(25, 25, 40, 100), rgba(65, 65, 95, 180),
                   axis=FillGradientAxis.fgaDiagBLTR)
            if use_blue_gradient
            else fill(rgba(40, 40, 60, 150))
        )
        lst.add_root(
            Fig(
                kind=FigKind.nkRectangle,
                zlevel=0,
                screen_box=rect(
                    blue_start[0] + off_x, blue_start[1] + off_y, blue_w, blue_h
                ),
                fill=blue_fill,
                stroke=RenderStroke(weight=4.0, fill=fill(rgba(255, 255, 255, 210))),
                shadows=(
                    RenderShadow(
                        style=ShadowStyle.InnerShadow,
                        blur=inset_blur,
                        spread=inset_spread,
                        x=inset_x,
                        y=inset_y,
                        fill=inner_fill,
                    ),
                ),
            )
        )

    # elliptical orange pill
    lst.add_root(
        Fig(
            kind=FigKind.nkRectangle,
            zlevel=0,
            screen_box=rect(max(20.0, w - 200.0), 20, 180, 100),
            fill=fill(rgba(238, 140, 30, 220)),
            corners=(90, 90, 90, 90),
            corner_radii_y=(50, 50, 50, 50),
            flags=FigFlags.NfEllipticalCorners,
            stroke=RenderStroke(weight=4.0, fill=fill(rgba(90, 45, 0, 220))),
        )
    )

    # moving backdrop-blur panel + yellow overlay
    yw, yh, ym = 360.0, 240.0, 20.0
    travel_x = max(0.0, w - yw - ym * 2.0)
    travel_y = max(0.0, h - yh - ym * 2.0)
    yx = ym + travel_x * (0.5 + 0.5 * math.sin(t * 0.33))
    yy = ym + travel_y * (0.5 + 0.5 * math.cos(t * 0.41))
    yc = 20.0 + 12.0 * (0.5 + 0.5 * math.sin(t * 0.7))

    lst.add_root(
        Fig(
            kind=FigKind.nkBackdropBlur,
            zlevel=0,
            corners=(int(yc),) * 4,
            screen_box=rect(yx, yy, yw, yh),
            fill=fill(rgba(0, 0, 0, 0)),
            backdrop_blur=BackdropBlurStyle(blur=18.0),
        )
    )
    lst.add_root(
        Fig(
            kind=FigKind.nkRectangle,
            zlevel=0,
            corners=(int(yc),) * 4,
            screen_box=rect(yx, yy, yw, yh),
            fill=fill(rgba(255, 225, 55, 120)),
            stroke=RenderStroke(weight=6.0, fill=fill(rgba(95, 72, 0, 185))),
        )
    )

    renders = new_renders()
    renders.set_layer(0, lst)
    return renders
