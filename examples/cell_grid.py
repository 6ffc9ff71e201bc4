"""Cell grid stress demo — windy_cell_grid, offscreen.

Re-derives /root/reference/examples/windy_cell_grid.nim:16-135: a 24x32
grid of pastel cells, each a rounded stroked rect with a drop shadow and a
centered text label — 768 shadowed cells + 768 text layouts in one frame.
Writes examples/out/cell_grid.png. FIGDRAW_COLS/ROWS/GAP override the grid.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from figdraw_tpu import (
    DropShadow, Fig, FigKind, RenderShadow, RenderStroke, fill, new_renders,
    rect, rgba, vec2,
)
from figdraw_tpu.renderer import FigRenderer
from figdraw_tpu.text.layout import HAlign, VAlign, typeset
from figdraw_tpu.text.typefaces import FigFont, load_typeface

W, H = 1280, 960
COLS = int(os.environ.get("FIGDRAW_COLS", "24"))
ROWS = int(os.environ.get("FIGDRAW_ROWS", "32"))
GAP = float(os.environ.get("FIGDRAW_GAP", "6"))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")

PALETTE = [
    rgba(255, 205, 210, 255), rgba(255, 224, 178, 255), rgba(255, 245, 157, 255),
    rgba(200, 230, 201, 255), rgba(178, 235, 242, 255), rgba(209, 196, 233, 255),
]


def make_scene(font):
    renders = new_renders()
    root = renders.add_root(0, Fig(kind=FigKind.nkRectangle,
                                   screen_box=rect(0, 0, W, H),
                                   fill=fill(rgba(243, 246, 252, 255))))
    margin = max(28.0, min(W, H) * 0.04)
    usable_w = max(1.0, W - margin * 2 - GAP * (COLS - 1))
    usable_h = max(1.0, H - margin * 2 - GAP * (ROWS - 1))
    cw = usable_w / COLS
    ch = usable_h / ROWS
    cell_id = 0
    shadow = (RenderShadow(style=DropShadow, blur=4, x=3, y=3,
                           fill=fill(rgba(0, 0, 0, 45))),)
    stroke = RenderStroke(weight=1.5, fill=fill(rgba(15, 20, 30, 38)))
    for row in range(ROWS):
        for col in range(COLS):
            box = rect(margin + col * (cw + GAP), margin + row * (ch + GAP), cw, ch)
            cell = renders.add_child(0, root, Fig(
                kind=FigKind.nkRectangle, screen_box=box,
                fill=fill(PALETTE[cell_id % len(PALETTE)]),
                corners=(2.0, 2.0, 2.0, 4.0), stroke=stroke, shadows=shadow,
            ))
            inset = min(10.0, cw * 0.2, ch * 0.2)
            tb = rect(box.x + inset, box.y + inset,
                      max(1.0, box.w - inset * 2), max(1.0, box.h - inset * 2))
            arr = typeset(vec2(tb.w, tb.h),
                          [(font, fill(rgba(17, 22, 35, 235)), f"cell ${cell_id}")],
                          h_align=HAlign.Center, v_align=VAlign.Middle, wrap=False)
            renders.add_child(0, cell, Fig(kind=FigKind.nkText, screen_box=tb,
                                           text_layout=arr))
            cell_id += 1
    return renders


def main():
    os.makedirs(OUT, exist_ok=True)
    tid = load_typeface("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf")
    font = FigFont(typeface_id=tid, size=10.0)
    ren = FigRenderer(atlas_size=512)
    ren.render_frame(make_scene(font), vec2(W, H))
    from PIL import Image

    Image.fromarray(ren.take_screenshot()).save(os.path.join(OUT, "cell_grid.png"))
    print(f"wrote {os.path.join(OUT, 'cell_grid.png')}")


if __name__ == "__main__":
    main()
