"""Bottom-left-origin graph demo — siwin_graph_bottom_left, offscreen.

Re-derives /root/reference/examples/siwin_graph_bottom_left.nim:33-180: the
whole plot lives under an nkTransform that flips Y (translation (0, H) +
scale(1, -1)), so the scene is authored in bottom-left math coordinates;
text nodes carry NfInvertY to flip their glyphs back upright. Draws a grid,
axes, a sine point cloud, an origin marker and an upright legend.
Writes examples/out/graph_bottom_left.png.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from figdraw_tpu import (
    Fig, FigFlags, FigKind, RenderStroke, TransformStyle, fill, new_renders,
    rect, rgba, vec2,
)
from figdraw_tpu.geometry import Mat3
from figdraw_tpu.renderer import FigRenderer
from figdraw_tpu.text.layout import typeset
from figdraw_tpu.text.typefaces import FigFont, load_typeface

W, H = 900, 620
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")


def add_rect(renders, parent, box, color, corners=0.0, stroke=None):
    return renders.add_child(0, parent, Fig(
        kind=FigKind.nkRectangle, screen_box=box, fill=fill(color),
        corners=(corners,) * 4, stroke=stroke or RenderStroke(),
    ))


def make_scene(font):
    renders = new_renders()
    root = renders.add_root(0, Fig(kind=FigKind.nkRectangle,
                                   screen_box=rect(0, 0, W, H),
                                   fill=fill(rgba(248, 249, 253, 255))))
    # flip into bottom-left coordinates: y' = H - y
    scene = renders.add_child(0, root, Fig(
        kind=FigKind.nkTransform,
        transform=TransformStyle(translation=vec2(0.0, H),
                                 matrix=Mat3.scaling(1.0, -1.0)),
    ))

    margin = max(36.0, min(W, H) * 0.08)
    plot = rect(margin, margin, max(40.0, W - margin * 2), max(40.0, H - margin * 2))
    add_rect(renders, scene, plot, rgba(255, 255, 255, 255), corners=10.0)

    grid = 10
    for i in range(grid + 1):
        t = i / grid
        add_rect(renders, scene, rect(plot.x + t * plot.w, plot.y, 1.0, plot.h),
                 rgba(225, 229, 238, 255))
        add_rect(renders, scene, rect(plot.x, plot.y + t * plot.h, plot.w, 1.0),
                 rgba(225, 229, 238, 255))
    # axes hug the BOTTOM-LEFT corner — in flipped space they sit at plot.y
    add_rect(renders, scene, rect(plot.x, plot.y, plot.w, 2.0), rgba(60, 65, 80, 255))
    add_rect(renders, scene, rect(plot.x, plot.y, 2.0, plot.h), rgba(60, 65, 80, 255))

    samples = max(120, int(plot.w))
    for i in range(samples + 1):
        t = i / samples
        x = plot.x + t * plot.w
        y_norm = min(1.0, max(0.0, 0.5 + 0.35 * math.sin(t * 2.0 * math.pi)))
        y = plot.y + y_norm * plot.h
        add_rect(renders, scene, rect(x - 1.5, y - 1.5, 3.0, 3.0),
                 rgba(230, 63, 63, 255))
    # origin marker at graph (0, 0)
    add_rect(renders, scene, rect(plot.x - 3.0, plot.y - 3.0, 6.0, 6.0),
             rgba(39, 169, 110, 255))

    # upright legend inside the flipped scene: NfInvertY re-flips the glyphs
    pad = 12.0
    legend = rect(plot.x + plot.w - 300.0, plot.y + plot.h - 20.0 - 124.0,
                  280.0, 124.0)
    add_rect(renders, scene, legend, rgba(255, 255, 255, 230), corners=8.0,
             stroke=RenderStroke(weight=1.2, fill=fill(rgba(120, 130, 150, 180))))
    text = ("Legend\n"
            "Red points: y = 0.5 + 0.35*sin(2 pi x)\n"
            "Green point: origin (0, 0)\n"
            "Axes: bottom-left coordinates")
    tb = rect(legend.x + pad, legend.y + pad, legend.w - 2 * pad, legend.h - 2 * pad)
    arr = typeset(vec2(tb.w, tb.h), [(font, fill(rgba(35, 40, 52, 255)), text)])
    renders.add_child(0, scene, Fig(
        kind=FigKind.nkText, screen_box=tb, text_layout=arr,
        flags=FigFlags.NfInvertY | FigFlags.NfSelectText,
        fill=fill(rgba(255, 221, 122, 220)), selection_range=(0, 5),
    ))
    return renders


def main():
    os.makedirs(OUT, exist_ok=True)
    tid = load_typeface("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf")
    font = FigFont(typeface_id=tid, size=13.0)
    ren = FigRenderer(atlas_size=512)
    ren.render_frame(make_scene(font), vec2(W, H))
    from PIL import Image

    Image.fromarray(ren.take_screenshot()).save(
        os.path.join(OUT, "graph_bottom_left.png"))
    print(f"wrote {os.path.join(OUT, 'graph_bottom_left.png')}")


if __name__ == "__main__":
    main()
