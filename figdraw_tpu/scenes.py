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
