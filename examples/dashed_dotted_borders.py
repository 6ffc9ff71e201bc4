"""Dashed/dotted borders demo — siwin_dashed_dotted_borders, offscreen.

Re-derives /root/reference/examples/siwin_dashed_dotted_borders.nim: a grid
of cards showing the path-space border generators (figdraw_tpu/borders.py,
the live piece of the reference's legacy CPU texture layer,
drawutils.nim:264-422): solid, dashed and dotted rounded-rect perimeters at
different weights, dash cycles, dot pitches and phase offsets, plus an
animated-phase "marching ants" card (phase comes from the frame index).
Writes examples/out/dashed_dotted_borders.png.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from figdraw_tpu import (
    Fig, FigKind, RenderShadow, RenderStroke, ShadowStyle, StrokeCap, fill,
    new_renders, rect, rgba, vec2,
)
from figdraw_tpu.borders import (
    fig_dashed_rounded_rect_border,
    fig_dotted_rounded_rect_border,
    fig_rounded_rect_border,
)
from figdraw_tpu.renderer import FigRenderer

W, H = 820, 560
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")


def make_scene(phase: float = 0.0):
    renders = new_renders()
    renders.add_root(0, Fig(
        kind=FigKind.nkRectangle, screen_box=rect(0, 0, W, H),
        fill=fill(rgba(236, 240, 247, 255)),
    ))

    cols, rows = 3, 2
    pad, gap = 36.0, 28.0
    card_w = (W - pad * 2 - gap * (cols - 1)) / cols
    card_h = (H - pad * 2 - gap * (rows - 1)) / rows
    ink = rgba(34, 48, 74, 255)
    blue = rgba(26, 99, 214, 255)
    rose = rgba(221, 62, 125, 255)
    green = rgba(40, 153, 94, 255)

    cards = [
        ("solid", lambda box: fig_rounded_rect_border(
            box, (14, 14, 14, 14), fill(ink), 3.0)),
        ("dashed", lambda box: fig_dashed_rounded_rect_border(
            box, (14, 14, 14, 14), fill(blue), 3.0,
            dash_length=14.0, gap_length=8.0)),
        ("dashed round caps", lambda box: fig_dashed_rounded_rect_border(
            box, (22, 22, 22, 22), fill(rose), 5.0,
            dash_length=2.0, gap_length=12.0, cap=StrokeCap.scRound)),
        ("dotted", lambda box: fig_dotted_rounded_rect_border(
            box, (14, 14, 14, 14), fill(green), 5.0, gap_length=7.0)),
        ("dotted tight", lambda box: fig_dotted_rounded_rect_border(
            box, (28, 28, 4, 4), fill(ink), 3.0, gap_length=3.0)),
        ("marching ants", lambda box: fig_dashed_rounded_rect_border(
            box, (10, 10, 10, 10), fill(blue), 2.0,
            dash_length=8.0, gap_length=6.0, offset=phase)),
    ]
    i = 0
    for row in range(rows):
        for col in range(cols):
            x = pad + col * (card_w + gap)
            y = pad + row * (card_h + gap)
            renders.add_root(0, Fig(
                kind=FigKind.nkRectangle,
                screen_box=rect(x, y, card_w, card_h),
                fill=fill(rgba(255, 255, 255, 245)),
                corners=(14, 14, 14, 14),
                shadows=(RenderShadow(style=ShadowStyle.DropShadow, blur=14,
                                      spread=2, x=0, y=6,
                                      fill=fill(rgba(25, 35, 55, 34))),),
            ))
            inset = rect(x + 18, y + 18, card_w - 36, card_h - 36)
            renders.add_root(0, cards[i][1](inset))
            i += 1
    return renders


def main():
    os.makedirs(OUT, exist_ok=True)
    ren = FigRenderer(atlas_size=128)
    ren.render_frame(make_scene(phase=5.0), vec2(W, H))
    from PIL import Image

    Image.fromarray(ren.take_screenshot()).save(
        os.path.join(OUT, "dashed_dotted_borders.png"))
    print(f"wrote {os.path.join(OUT, 'dashed_dotted_borders.png')}")


if __name__ == "__main__":
    main()
