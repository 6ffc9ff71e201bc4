"""SDF star demo — windy_msdf_star, offscreen.

Re-derives /root/reference/examples/windy_msdf_star.nim's capability: a
five-point star authored ONCE as a small signed-distance image and drawn at
many sizes/styles through the SDF image modes (nkMsdfImage: fill, annular
stroke via stroke_weight, soft threshold) — resolution-independent shapes
without re-rasterizing, the reference's sdfy/msdfgen pipeline replaced by
figdraw_tpu.utils.sdfgen (coverage -> SDF, no external assets).
Writes examples/out/msdf_star.png.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from figdraw_tpu import (
    Fig, FigKind, MsdfImageStyle, fill, new_renders, rect, rgba, vec2,
)
from figdraw_tpu.renderer import FigRenderer
from figdraw_tpu.resources import ImageMessageBus, put_image
from figdraw_tpu.utils.sdfgen import sdf_from_coverage

W, H = 760, 520
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")
STAR_ID = 9001
PX_RANGE = 8.0


def star_coverage(size: int = 96, points: int = 5,
                  inner_frac: float = 0.42) -> np.ndarray:
    """Analytic coverage of a regular star polygon, 4x supersampled."""
    ss = 4
    n = size * ss
    yy, xx = np.mgrid[0:n, 0:n]
    cx = cy = n / 2.0
    px = (xx + 0.5 - cx) / (n / 2.0)
    py = (yy + 0.5 - cy) / (n / 2.0)
    r_outer = 0.92
    r_inner = r_outer * inner_frac
    verts = []
    for i in range(points * 2):
        ang = -math.pi / 2.0 + i * math.pi / points
        r = r_outer if i % 2 == 0 else r_inner
        verts.append((r * math.cos(ang), r * math.sin(ang)))
    # even-odd point-in-polygon over the supersampled grid
    inside = np.zeros((n, n), bool)
    m = len(verts)
    for i in range(m):
        x0, y0 = verts[i]
        x1, y1 = verts[(i + 1) % m]
        crosses = ((y0 > py) != (y1 > py)) & (
            px < (x1 - x0) * (py - y0) / (y1 - y0 + 1e-30) + x0
        )
        inside ^= crosses
    cov = inside.reshape(size, ss, size, ss).mean(axis=(1, 3))
    return cov.astype(np.float32)


def make_scene():
    renders = new_renders()
    renders.add_root(0, Fig(
        kind=FigKind.nkRectangle, screen_box=rect(0, 0, W, H),
        fill=fill(rgba(24, 28, 40, 255)),
    ))

    gold = rgba(250, 200, 70, 255)
    sky = rgba(120, 190, 250, 255)
    rose = rgba(240, 110, 160, 255)
    white = rgba(245, 245, 250, 255)

    def star(x, y, s, color, stroke_weight=0.0, sd_threshold=0.0):
        renders.add_root(0, Fig(
            kind=FigKind.nkMsdfImage, screen_box=rect(x, y, s, s),
            msdf_image=MsdfImageStyle(id=STAR_ID, fill=fill(color),
                                      px_range=PX_RANGE,
                                      sd_threshold=sd_threshold,
                                      stroke_weight=stroke_weight),
        ))

    # one source, many scales: crisp from 24 px to 300 px
    x = 36.0
    for s in (24.0, 48.0, 96.0, 180.0):
        star(x, H - s - 40.0, s, gold)
        x += s + 26.0
    star(430.0, 40.0, 300.0, rgba(90, 70, 190, 255))
    # annular (outline) variants via stroke_weight
    star(60.0, 60.0, 120.0, sky, stroke_weight=3.0)
    star(210.0, 90.0, 80.0, rose, stroke_weight=1.5)
    # a fattened star via sd_threshold bias
    star(300.0, 60.0, 110.0, white, sd_threshold=-0.12)
    return renders


def main():
    os.makedirs(OUT, exist_ok=True)
    bus = ImageMessageBus()
    ren = FigRenderer(atlas_size=512, use_pallas=True)
    ren.ensure_image_message_subscription(bus)
    put_image(STAR_ID, sdf_from_coverage(star_coverage(), px_range=PX_RANGE),
              bus=bus)
    ren.render_frame(make_scene(), vec2(W, H))
    from PIL import Image

    Image.fromarray(ren.take_screenshot()).save(
        os.path.join(OUT, "msdf_star.png"))
    print(f"wrote {os.path.join(OUT, 'msdf_star.png')}")


if __name__ == "__main__":
    main()
