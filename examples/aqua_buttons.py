"""Aqua-style widget gallery — the windy_aqua_buttons demo, offscreen.

Re-derives the reference's richest UI scene
(/root/reference/examples/windy_aqua_buttons.nim:27-995) in figdraw_tpu's
API: pill push buttons built from nested rect-mask clips with 3-stop rim /
body gradients and four stacked inner shadows, radio buttons with gloss +
pupil, check buttons whose checkmark is two rotated rounded rects with
shadow and shine layers, and a popup menu — all SDF quads, one fused device
program. Writes examples/out/aqua_buttons.png.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from figdraw_tpu import (
    DropShadow, Fig, FigFlags, FigKind, InnerShadow, RenderShadow, RenderStroke,
    fill, linear, new_renders, rect, rgba, vec2,
)
from figdraw_tpu.fill import FillGradientAxis
from figdraw_tpu.renderer import FigRenderer
from figdraw_tpu.text.layout import HAlign, VAlign, typeset
from figdraw_tpu.text.typefaces import FigFont, load_typeface

fgaY = FillGradientAxis.fgaY
fgaDiagTLBR = FillGradientAxis.fgaDiagTLBR

W, H = 560, 280
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")


def add_rect(renders, parent, box, box_fill, corners, flags=0, rotation=0.0,
             stroke=None, shadows=()):
    return renders.add_child(0, parent, Fig(
        kind=FigKind.nkRectangle, screen_box=box, fill=fill(box_fill),
        corners=(corners,) * 4, flags=FigFlags(flags), rotation=rotation,
        stroke=stroke or RenderStroke(), shadows=tuple(shadows),
    ))


def add_label(renders, parent, box, font, text, color):
    arr = typeset(vec2(box.w, box.h), [(font, fill(color), text)],
                  h_align=HAlign.Center, v_align=VAlign.Middle, wrap=False)
    renders.add_child(0, parent, Fig(kind=FigKind.nkText, screen_box=box,
                                     text_layout=arr))


def inner_shadow(blur, x, y, color):
    return RenderShadow(style=InnerShadow, blur=blur, x=x, y=y, fill=fill(color))


def add_aqua_button(renders, root, box, font, text, default=False):
    """Pill push button (windy_aqua_buttons.nim:620-865): drop shadow pad,
    rim gradient ring, clipped inner body with side shades, top sheen."""
    radius = box.h / 2.0
    # floor shadow
    add_rect(renders, root, rect(box.x, box.y + 1.5, box.w, box.h),
             rgba(0, 0, 0, 54 if default else 44), radius,
             shadows=[RenderShadow(style=DropShadow, blur=5.8, y=1.8,
                                   fill=fill(rgba(0, 0, 0, 58 if default else 46)))])
    if default:
        rim = linear(rgba(150, 224, 255, 255), rgba(62, 150, 242, 255),
                     rgba(8, 92, 206, 255), axis=fgaY, mid_pos=132)
        body = linear(rgba(196, 240, 255, 255), rgba(66, 160, 248, 255),
                      rgba(16, 106, 222, 255), axis=fgaY, mid_pos=124)
        rim_stroke = rgba(6, 70, 160, 240)
        side = rgba(4, 60, 150, 60)
        ink = rgba(255, 255, 255, 255)
    else:
        rim = linear(rgba(250, 250, 248, 255), rgba(210, 212, 208, 255),
                     rgba(158, 160, 156, 255), axis=fgaY, mid_pos=132)
        body = linear(rgba(255, 255, 255, 255), rgba(236, 237, 234, 255),
                      rgba(208, 210, 206, 255), axis=fgaY, mid_pos=124)
        rim_stroke = rgba(110, 112, 108, 230)
        side = rgba(70, 72, 70, 40)
        ink = rgba(40, 42, 40, 255)
    outline = add_rect(renders, root, box, rim, radius,
                       flags=FigFlags.NfRectMaskContent,
                       stroke=RenderStroke(weight=0.55, fill=fill(rim_stroke)))
    inner = rect(box.x + 2, box.y + 2, box.w - 4, box.h - 4)
    inner_r = max(1.0, radius - 2.0)
    clip = add_rect(renders, outline, inner, body, inner_r,
                    flags=FigFlags.NfRectMaskContent,
                    shadows=[
                        inner_shadow(3.0, 0, 1.2, rgba(0, 0, 0, 26 if default else 22)),
                        inner_shadow(2.0, 0, -1.0, rgba(255, 255, 255, 68 if default else 58)),
                        inner_shadow(7.0, 2, 0, side),
                        inner_shadow(7.0, -2, 0, side),
                    ])
    # top shade + sheen inside the clip
    add_rect(renders, clip, rect(inner.x - 2, inner.y, inner.w + 4, inner.h * 0.38),
             linear(rgba(255, 255, 255, 120), rgba(255, 255, 255, 0), axis=fgaY),
             inner_r)
    add_rect(renders, clip, rect(inner.x + 15, inner.y + 3.2, inner.w - 30, 1.0),
             rgba(255, 255, 255, 170), 0.5)
    add_label(renders, root, box, font, text, ink)


def add_radio(renders, root, box, selected):
    """Radio button (windy_aqua_buttons.nim:104-255)."""
    radius = min(box.w, box.h) / 2.0
    add_rect(renders, root, rect(box.x, box.y + 1, box.w, box.h),
             rgba(0, 0, 0, 32), radius)
    outer = add_rect(renders, root, box,
                     linear(rgba(253, 253, 250, 255), rgba(166, 168, 164, 255), axis=fgaY),
                     radius,
                     stroke=RenderStroke(weight=0.8, fill=fill(rgba(108, 111, 107, 220))),
                     shadows=[inner_shadow(2.4, 0, 1, rgba(0, 0, 0, 48)),
                              inner_shadow(2.2, 0, -1, rgba(255, 255, 255, 90))])
    inset = 1.6 if selected else 2.0
    inner = rect(box.x + inset, box.y + inset, box.w - 2 * inset, box.h - 2 * inset)
    inner_r = max(1.0, min(inner.w, inner.h) / 2.0)
    if selected:
        body = linear(rgba(120, 230, 255, 255), rgba(0, 124, 238, 255), axis=fgaDiagTLBR)
        stroke_c = rgba(0, 82, 191, 245)
        shadows = [inner_shadow(2.8, 0, 1, rgba(0, 58, 142, 86)),
                   inner_shadow(2.8, -1, -1, rgba(255, 255, 255, 80)),
                   inner_shadow(3.8, 1, 0, rgba(0, 51, 120, 46))]
    else:
        body = linear(rgba(255, 255, 255, 255), rgba(235, 235, 232, 255), axis=fgaY)
        stroke_c = rgba(201, 203, 199, 200)
        shadows = [inner_shadow(2.5, 0, 1, rgba(0, 0, 0, 30)),
                   inner_shadow(2.0, 0, -1, rgba(255, 255, 255, 115))]
    add_rect(renders, outer, inner, body, inner_r,
             stroke=RenderStroke(weight=0.5, fill=fill(stroke_c)), shadows=shadows)
    gloss = (rect(box.x + 4.5, box.y + 2.8, box.w - 9, 2.7) if selected
             else rect(box.x + 3.4, box.y + 2.5, box.w - 6.8, 2.2))
    add_rect(renders, outer, gloss,
             linear(rgba(255, 255, 255, 135 if selected else 190),
                    rgba(255, 255, 255, 0 if selected else 18), axis=fgaY),
             1.35 if selected else 1.1)
    if selected:
        size = min(box.w, box.h) * 0.34
        pupil = rect(box.x + (box.w - size) / 2, box.y + (box.h - size) / 2, size, size)
        add_rect(renders, outer, pupil,
                 linear(rgba(44, 66, 87, 248), rgba(6, 22, 44, 248), axis=fgaY),
                 size / 2, stroke=RenderStroke(weight=0.4, fill=fill(rgba(0, 0, 0, 145))))
        add_rect(renders, outer, rect(pupil.x + 1.1, pupil.y + 0.9, pupil.w - 2.2, 1.0),
                 rgba(255, 255, 255, 85), 0.5)


def add_check(renders, root, box, checked):
    """Check button + rotated-rect checkmark (windy_aqua_buttons.nim:257-416)."""
    add_rect(renders, root, rect(box.x, box.y + 1, box.w, box.h), rgba(0, 0, 0, 36), 2.5)
    if checked:
        body = linear(rgba(122, 232, 255, 255), rgba(0, 124, 238, 255), axis=fgaDiagTLBR)
        stroke_c = rgba(0, 82, 191, 245)
        shadows = [inner_shadow(3.0, 0, 1, rgba(0, 54, 130, 82)),
                   inner_shadow(2.2, -1, -1, rgba(255, 255, 255, 82)),
                   inner_shadow(3.0, 1, 0, rgba(0, 41, 100, 42))]
    else:
        body = linear(rgba(255, 255, 255, 255), rgba(214, 215, 212, 255), axis=fgaY)
        stroke_c = rgba(88, 90, 88, 220)
        shadows = [inner_shadow(2.5, 0, 1, rgba(0, 0, 0, 32)),
                   inner_shadow(2.0, 0, -1, rgba(255, 255, 255, 112))]
    outer = add_rect(renders, root, box, body, 2.5,
                     flags=FigFlags.NfRectMaskContent,
                     stroke=RenderStroke(weight=1.0, fill=fill(stroke_c)),
                     shadows=shadows)
    add_rect(renders, outer, rect(box.x + 1.4, box.y + 1.1, box.w - 2.8, 2.6),
             linear(rgba(255, 255, 255, 142 if checked else 178),
                    rgba(255, 255, 255, 0 if checked else 20), axis=fgaY), 1.2)
    if checked:
        mark = linear(rgba(7, 76, 122, 245), rgba(3, 17, 45, 245), axis=fgaY)
        mx = box.x - box.w * 0.06
        short = rect(mx + box.w * 0.18, box.y + box.h * 0.56, box.w * 0.42, 2.6)
        long = rect(mx + box.w * 0.37, box.y + box.h * 0.45, box.w * 0.62, 2.6)
        for seg, rot in ((short, -43.0), (long, 48.0)):
            add_rect(renders, outer, rect(seg.x + 0.6, seg.y + 0.8, seg.w, seg.h),
                     rgba(0, 16, 38, 72), 1.3, rotation=rot)
        for seg, rot in ((short, -43.0), (long, 48.0)):
            add_rect(renders, outer, seg, mark, 1.3, rotation=rot)
        for seg, rot in ((short, -43.0), (long, 48.0)):
            add_rect(renders, outer, rect(seg.x + 0.5, seg.y + 0.1, seg.w * 0.68, 0.8),
                     rgba(255, 255, 255, 76), 0.4, rotation=rot)


def add_popup(renders, root, box, font, text):
    """Popup menu with arrow capsule (windy_aqua_buttons.nim:418-579)."""
    add_rect(renders, root, rect(box.x, box.y + 1.6, box.w, box.h), rgba(0, 0, 0, 58), 5.0)
    outer = add_rect(renders, root, box,
                     linear(rgba(255, 255, 255, 255), rgba(238, 239, 237, 255),
                            rgba(205, 207, 203, 255), axis=fgaY),
                     5.0,
                     flags=FigFlags.NfRectMaskContent,
                     stroke=RenderStroke(weight=0.8, fill=fill(rgba(112, 114, 110, 225))),
                     shadows=[inner_shadow(3.0, 0, 1, rgba(0, 0, 0, 46)),
                              inner_shadow(2.4, 0, -1, rgba(255, 255, 255, 118))])
    # blue arrow capsule on the right
    cap = rect(box.x + box.w - box.h + 3, box.y + 3, box.h - 6, box.h - 6)
    add_rect(renders, outer, cap,
             linear(rgba(122, 216, 255, 255), rgba(10, 110, 230, 255), axis=fgaY),
             4.0, stroke=RenderStroke(weight=0.5, fill=fill(rgba(0, 74, 168, 240))))
    cx = cap.x + cap.w / 2
    add_rect(renders, outer, rect(cx - 3.4, cap.y + 5.4, 6.8, 1.6),
             rgba(255, 255, 255, 235), 0.8, rotation=0.0)
    # up / down chevrons from rotated bars
    for ydir, ybase in ((1.0, cap.y + 4.2), (-1.0, cap.y + cap.h - 5.8)):
        add_rect(renders, outer, rect(cx - 3.6, ybase, 4.4, 1.6),
                 rgba(255, 255, 255, 235), 0.8, rotation=35.0 * ydir)
        add_rect(renders, outer, rect(cx - 0.6, ybase, 4.4, 1.6),
                 rgba(255, 255, 255, 235), 0.8, rotation=-35.0 * ydir)
    add_label(renders, root, rect(box.x + 10, box.y, box.w - box.h - 14, box.h),
              font, text, rgba(30, 32, 30, 255))


def make_scene(font):
    renders = new_renders()
    root = renders.add_root(0, Fig(kind=FigKind.nkFrame, screen_box=rect(0, 0, W, H)))
    add_rect(renders, root, rect(0, 0, W, H), rgba(236, 238, 235, 255), 0)
    for y in range(0, H, 4):  # pinstripe background
        add_rect(renders, root, rect(0, y, W, 1), rgba(255, 255, 255, 70), 0)

    add_aqua_button(renders, root, rect(120, 40, 130, 26), font, "Cancel", default=False)
    add_aqua_button(renders, root, rect(270, 40, 130, 26), font, "OK", default=True)

    add_radio(renders, root, rect(120, 110, 18, 18), selected=True)
    add_radio(renders, root, rect(150, 110, 18, 18), selected=False)
    add_check(renders, root, rect(205, 110, 18, 18), checked=True)
    add_check(renders, root, rect(233, 110, 18, 18), checked=False)
    add_check(renders, root, rect(261, 110, 18, 18), checked=True)

    add_popup(renders, root, rect(120, 170, 200, 24), font, "Automatic")
    return renders


def main():
    os.makedirs(OUT, exist_ok=True)
    tid = load_typeface("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf")
    font = FigFont(typeface_id=tid, size=13.0)
    ren = FigRenderer(atlas_size=512)
    ren.render_frame(make_scene(font), vec2(W, H))
    png = ren.take_screenshot()
    from PIL import Image

    Image.fromarray(png).save(os.path.join(OUT, "aqua_buttons.png"))
    print(f"wrote {os.path.join(OUT, 'aqua_buttons.png')}")


if __name__ == "__main__":
    main()
