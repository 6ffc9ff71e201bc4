"""Multi-script scripture shaping — siwin_genesis_shaping, offscreen.

Re-derives /root/reference/examples/siwin_genesis_shaping.nim's showcase:
three panels of public-domain scripture exercising the shaper's hardest
paths — Hebrew with niqqud (RTL bidi + GPOS mark-to-base vowel points),
polytonic Greek (precomposed breathing/accent forms), and an English serif
column — each typeset right/left-aligned with real line stacks.
Writes examples/out/scripture_shaping.png.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from figdraw_tpu import Fig, FigKind, RenderStroke, fill, linear, new_renders, rect, rgba, vec2
from figdraw_tpu.fill import FillGradientAxis
from figdraw_tpu.renderer import FigRenderer
from figdraw_tpu.text.layout import HAlign, typeset
from figdraw_tpu.text.typefaces import FigFont, load_typeface

W, H = 960, 560
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")

HEBREW_GENESIS_3_19 = [
    "בְּזֵעַת אַפֶּיךָ תֹּאכַל לֶחֶם",
    "עַד שׁוּבְךָ אֶל־הָאֲדָמָה",
    "כִּי מִמֶּנָּה לֻקָּחְתָּ",
    "כִּי־עָפָר אַתָּה",
    "וְאֶל־עָפָר תָּשׁוּב׃",
]
GREEK_JOHN_3_16 = [
    "Οὕτω γὰρ ἠγάπησεν ὁ Θεὸς τὸν κόσμον,",
    "ὥστε τὸν υἱὸν αὐτοῦ τὸν μονογενῆ ἔδωκεν,",
    "ἵνα πᾶς ὁ πιστεύων εἰς αὐτὸν μὴ ἀπόληται,",
    "ἀλλ᾽ ἔχῃ ζωὴν αἰώνιον.",
]
ENGLISH_GENESIS_3_19 = [
    "In the sweat of thy face shalt thou eat bread,",
    "till thou return unto the ground;",
    "for out of it wast thou taken:",
    "for dust thou art,",
    "and unto dust shalt thou return.",
]


def add_panel(renders, box, title, rows, font, title_font, ink, h_align):
    renders.add_root(0, Fig(
        kind=FigKind.nkRectangle, screen_box=box, corners=(12,) * 4,
        fill=fill(rgba(255, 255, 255, 235)),
        stroke=RenderStroke(weight=1.2, fill=fill(rgba(150, 140, 120, 180))),
    ))
    arr = typeset(vec2(box.w - 32, 30), [(title_font, fill(rgba(120, 90, 40, 255)), title)],
                  h_align=HAlign.Center, wrap=False)
    renders.add_root(0, Fig(kind=FigKind.nkText,
                            screen_box=rect(box.x + 16, box.y + 14, box.w - 32, 30),
                            text_layout=arr))
    y = box.y + 58
    for row in rows:
        arr = typeset(vec2(box.w - 36, 34), [(font, ink, row)],
                      h_align=h_align, wrap=False)
        renders.add_root(0, Fig(kind=FigKind.nkText,
                                screen_box=rect(box.x + 18, y, box.w - 36, 34),
                                text_layout=arr))
        y += 36 if len(rows) <= 5 else 30


def main():
    os.makedirs(OUT, exist_ok=True)
    # the reference's own bundled Hebrew face (siwin_genesis_shaping.nim:27)
    hebrew = load_typeface(
        "/root/reference/examples/fonts/NotoSansHebrew-wdth-wght.ttf")
    sans = load_typeface("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf")
    serif_path = "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf"
    serif = load_typeface(serif_path) if os.path.exists(serif_path) else sans

    renders = new_renders()
    renders.add_root(0, Fig(kind=FigKind.nkRectangle, screen_box=rect(0, 0, W, H),
                            fill=linear(rgba(247, 242, 230, 255), rgba(228, 218, 196, 255),
                                        axis=FillGradientAxis.fgaY)))
    ink = fill(rgba(40, 34, 26, 255))
    pw = (W - 4 * 20) / 3
    add_panel(renders, rect(20, 40, pw, 480), "בראשית ג יט",
              HEBREW_GENESIS_3_19,
              FigFont(typeface_id=hebrew, size=19.0,
                      fallback_typeface_ids=(sans,)),
              FigFont(typeface_id=hebrew, size=17.0), ink, HAlign.Right)
    add_panel(renders, rect(40 + pw, 40, pw, 480), "Κατά Ιωάννην γ 16",
              GREEK_JOHN_3_16, FigFont(typeface_id=serif, size=13.0),
              FigFont(typeface_id=serif, size=17.0), ink, HAlign.Left)
    add_panel(renders, rect(60 + 2 * pw, 40, pw, 480), "Genesis 3:19",
              ENGLISH_GENESIS_3_19, FigFont(typeface_id=serif, size=11.5),
              FigFont(typeface_id=serif, size=17.0), ink, HAlign.Left)

    ren = FigRenderer(atlas_size=1024)
    ren.render_frame(renders, vec2(W, H))
    from PIL import Image

    Image.fromarray(ren.take_screenshot()).save(
        os.path.join(OUT, "scripture_shaping.png"))
    print(f"wrote {os.path.join(OUT, 'scripture_shaping.png')}")


if __name__ == "__main__":
    main()
