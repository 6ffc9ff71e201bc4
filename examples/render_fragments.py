"""Fragment-backed animation — the renderfragments demo, offscreen.

Re-derives /root/reference/examples/renderfragments_common.nim:10-83 +
windy_renderfragments.nim: a static gradient background holds an animated
card row as a RENDER FRAGMENT — each frame swaps just the fragment with
update_fragment (base-list indexes stay stable; no rebuild of the
background), the drifting transform and lifting/breathing cards living in
the swapped subtree. Writes examples/out/fragments_00.png .. _05.png.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from figdraw_tpu import (
    DropShadow, Fig, FigKind, RenderShadow, RenderStroke, TransformStyle,
    fill, linear, new_render_fragments, rect, rgba, vec2,
)
from figdraw_tpu.fill import FillGradientAxis
from figdraw_tpu.nodes import RenderList
from figdraw_tpu.renderer import FigRenderer

W, H = 640, 400
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")

COLORS = (rgba(255, 103, 120, 255), rgba(91, 192, 143, 255), rgba(92, 132, 255, 255))


def make_cards(frame: int) -> RenderList:
    """The animated subtree (renderfragments_common.nim:11-58)."""
    t = frame * 0.025
    card_w = min(180.0, max(80.0, (W - 120.0) / 3.0))
    card_h = min(220.0, max(100.0, H * 0.38))
    gap = min(30.0, max(12.0, W * 0.025))
    row_w = card_w * 3 + gap * 2
    row_x = (W - row_w) * 0.5
    row_y = (H - card_h) * 0.5
    drift = math.sin(t) * min(28.0, W * 0.03)

    lst = RenderList()
    transform = lst.add_root(Fig(
        kind=FigKind.nkTransform,
        transform=TransformStyle(translation=vec2(drift, 0.0)),
    ))
    for card, color in enumerate(COLORS):
        phase = t + card * 1.4
        lift = math.sin(phase) * 24.0
        corner = 18.0 + (math.sin(phase) + 1.0) * 8.0
        lst.add_child(transform, Fig(
            kind=FigKind.nkRectangle,
            screen_box=rect(row_x + card * (card_w + gap), row_y + lift,
                            card_w, card_h),
            corners=(corner,) * 4,
            fill=fill(color),
            stroke=RenderStroke(weight=3.0, fill=fill(rgba(255, 255, 255, 190))),
            shadows=(RenderShadow(style=DropShadow, blur=18.0, spread=2.0,
                                  x=0.0, y=12.0, fill=fill(rgba(30, 38, 65, 70))),),
        ))
    return lst


def main():
    os.makedirs(OUT, exist_ok=True)
    fragments = new_render_fragments()
    background = fragments.add_root(0, Fig(
        kind=FigKind.nkRectangle, screen_box=rect(0, 0, W, H),
        fill=linear(rgba(244, 247, 255, 255), rgba(218, 226, 246, 255),
                    axis=FillGradientAxis.fgaY),
    ))
    cursor = fragments.insert_children((0, background), make_cards(0), 0)[0]

    ren = FigRenderer(atlas_size=128)
    from PIL import Image

    for i in range(6):
        ren.render_frame(fragments, vec2(W, H))
        Image.fromarray(ren.take_screenshot()).save(
            os.path.join(OUT, f"fragments_{i:02d}.png"))
        # swap ONLY the fragment — the base list is untouched
        cursor = fragments.update_fragment(cursor, make_cards((i + 1) * 8))[0]
    print(f"wrote {OUT}/fragments_00.png .. _05.png")


if __name__ == "__main__":
    main()
