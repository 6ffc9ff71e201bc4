"""Drawable beziers demo — windy_drawable_beziers, offscreen.

Re-derives /root/reference/examples/windy_drawable_beziers.nim:21-260: a
panel showing quadratic / cubic / 5-point generic beziers stroked with
different caps and joins, their control polygons and control points, two
arc sweeps, and endpoint markers — the nkDrawable op vocabulary (lines,
circles, rects, beziers, arcs) with adaptive decomposition.
Writes examples/out/drawable_beziers.png.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from figdraw_tpu import (
    Fig, FigKind, RenderStroke, StrokeCap, StrokeJoin, drawable_arc,
    drawable_bezier, drawable_circle, drawable_line, drawable_rect, fill,
    new_renders, rect, rgba, vec2,
)
from figdraw_tpu.renderer import FigRenderer

W, H = 760, 560
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")


def drawable(area, node_fill, stroke, ops, steps=0, aa=0.0):
    return Fig(kind=FigKind.nkDrawable, screen_box=area, fill=fill(node_fill),
               draw_stroke=stroke, draw_steps=steps, draw_aa=aa,
               draw_ops=tuple(ops))


def make_scene():
    renders = new_renders()
    renders.add_root(0, Fig(kind=FigKind.nkRectangle, screen_box=rect(0, 0, W, H),
                            fill=fill(rgba(246, 248, 252, 255))))
    margin = max(28.0, min(W, H) * 0.08)
    area = rect(margin, margin, W - margin * 2, H - margin * 2)
    lp = lambda x, y: vec2(area.w * x, area.h * y)

    transparent = rgba(0, 0, 0, 0)
    blue, rose, green = rgba(26, 99, 214, 255), rgba(221, 62, 125, 255), rgba(40, 153, 94, 255)
    muted = {"blue": rgba(26, 99, 214, 70), "rose": rgba(221, 62, 125, 70),
             "green": rgba(40, 153, 94, 70), "ink": rgba(82, 92, 112, 120)}
    white = rgba(255, 255, 255, 230)

    quadratic = [lp(0.08, 0.72), lp(0.29, 0.10), lp(0.52, 0.64)]
    cubic = [lp(0.14, 0.38), lp(0.36, 0.04), lp(0.58, 0.94), lp(0.83, 0.42)]
    generic = [lp(0.10, 0.58), lp(0.25, 0.88), lp(0.43, 0.44), lp(0.64, 0.80),
               lp(0.91, 0.20)]
    arc_center = lp(0.76, 0.75)

    def add(node):
        renders.add_root(0, node)

    # two arc sweeps, square caps + bevel joins
    add(drawable(area, transparent,
                 RenderStroke(weight=3.0, fill=fill(muted["ink"]),
                              cap=StrokeCap.scSquare, join=StrokeJoin.sjBevel),
                 [drawable_arc(arc_center, min(area.w, area.h) * 0.10,
                               -math.pi * 1.10, math.pi * 1.35),
                  drawable_arc(arc_center, min(area.w, area.h) * 0.15,
                               -math.pi * 0.85, math.pi * 0.95)],
                 steps=24, aa=0.85))
    # rounded-rect frame as a drawable
    add(drawable(area, transparent,
                 RenderStroke(weight=2.0, fill=fill(rgba(80, 90, 110, 90))),
                 [drawable_rect(rect(18, 18, area.w - 36, area.h - 36),
                                corners=(16, 16, 16, 16))]))
    # control polygons + control points per curve
    for pts, key in ((quadratic, "blue"), (cubic, "rose"), (generic, "green")):
        add(drawable(area, transparent,
                     RenderStroke(weight=1.4, fill=fill(muted[key])),
                     [drawable_line(pts[i], pts[i + 1]) for i in range(len(pts) - 1)]))
        add(drawable(area, muted[key],
                     RenderStroke(weight=1.5, fill=fill(white)),
                     [drawable_circle(p, 5.0) for p in pts]))
    # the curves: butt / square+bevel / round+round
    add(drawable(area, transparent,
                 RenderStroke(weight=7.0, fill=fill(blue), cap=StrokeCap.scButt),
                 [drawable_bezier(quadratic)], aa=0.9))
    add(drawable(area, transparent,
                 RenderStroke(weight=8.0, fill=fill(rose), cap=StrokeCap.scSquare,
                              join=StrokeJoin.sjBevel),
                 [drawable_bezier(cubic)], steps=24, aa=0.9))
    add(drawable(area, transparent,
                 RenderStroke(weight=5.5, fill=fill(green), cap=StrokeCap.scRound,
                              join=StrokeJoin.sjRound),
                 [drawable_bezier(generic)], steps=32, aa=0.9))
    # endpoint markers
    for p, c, r in ((lp(0.52, 0.64), blue, 9.0), (lp(0.83, 0.42), rose, 9.0),
                    (lp(0.91, 0.20), green, 8.0)):
        add(drawable(area, c, RenderStroke(weight=2.0, fill=fill(white)),
                     [drawable_circle(p, r)]))
    return renders


def main():
    os.makedirs(OUT, exist_ok=True)
    ren = FigRenderer(atlas_size=128)
    ren.render_frame(make_scene(), vec2(W, H))
    from PIL import Image

    Image.fromarray(ren.take_screenshot()).save(
        os.path.join(OUT, "drawable_beziers.png"))
    print(f"wrote {os.path.join(OUT, 'drawable_beziers.png')}")


if __name__ == "__main__":
    main()
