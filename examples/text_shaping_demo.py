"""Text shaping showcase: ligatures, kerning, bidi, Arabic, marks, overlays.

Renders a card demonstrating the text subsystem — OpenType ligatures and
kerning, UAX#9 bidirectional layout with mirrored brackets, Arabic cursive
joining with harakat — plus an external overlay layer composited between
zlevels. Writes text_shaping_demo.png.

Run: python examples/text_shaping_demo.py  (add JAX_PLATFORMS=cpu PYTHONPATH=
to force CPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from figdraw_tpu import (
    Fig, FigKind, FigRenderer, RenderShadow, ShadowStyle, fill, new_renders,
    rect, rgba, vec2,
)
from figdraw_tpu.text.layout import HAlign, typeset
from figdraw_tpu.text.typefaces import FigFont, load_typeface

W, H = 520, 300


def main() -> None:
    tid = load_typeface("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf")
    ink = fill(rgba(24, 28, 40, 255))
    ren = FigRenderer(atlas_size=1024)
    renders = new_renders()

    renders.add_root(0, Fig(
        kind=FigKind.nkRectangle, screen_box=rect(0, 0, W, H),
        fill=fill(rgba(248, 249, 252, 255)),
    ))
    renders.add_root(0, Fig(
        kind=FigKind.nkRectangle, screen_box=rect(16, 16, W - 32, H - 32),
        corners=(14, 14, 14, 14), fill=fill(rgba(255, 255, 255, 255)),
        shadows=(RenderShadow(style=ShadowStyle.DropShadow, blur=18, spread=2,
                              x=0, y=6, fill=fill(rgba(30, 40, 80, 60))),),
    ))

    lines = [
        ("Efficient waffles — AV To fi fl ffi", 24),   # ligatures + kerning
        ("naïve café, ẹ́véryone", 24),                  # combining marks
        ("abc שלום 123 (חשוב) def", 24),               # bidi + mirroring
        ("بِسْمِ اللَّهِ — السلام عليكم", 26),          # arabic forms + harakat
    ]
    y = 36.0
    for text, size in lines:
        f = FigFont(typeface_id=tid, size=float(size))
        arr = typeset(vec2(W - 72, 40), [(f, ink, text)], h_align=HAlign.Left)
        renders.add_root(1, Fig(
            kind=FigKind.nkText, screen_box=rect(36, y, W - 72, 40),
            text_layout=arr,
        ))
        y += 44.0

    # an externally produced layer (any JAX/numpy output) slid between the
    # card (z<=1) and nothing above — tinted diagonal ribbon
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    ribbon = np.zeros((H, W, 4), np.float32)
    band = np.exp(-((xx + yy - 650.0) / 60.0) ** 2)
    ribbon[..., 0] = 0.2
    ribbon[..., 1] = 0.5
    ribbon[..., 2] = 1.0
    ribbon[..., 3] = 0.25 * band

    frame = np.asarray(
        ren.render_frame_with_overlays(renders, vec2(W, H), {2: ribbon})
    )
    from PIL import Image

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "text_shaping_demo.png")
    Image.fromarray((np.clip(frame, 0, 1) * 255).astype(np.uint8)).save(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
