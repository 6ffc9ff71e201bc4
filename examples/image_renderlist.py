"""Image render list — windy_image_renderlist, offscreen.

Re-derives /root/reference/examples/windy_image_renderlist.nim:12-47: a dark
page, a rounded grey card, and an ImageRef-owned picture drawn as an atlas
quad on top — the image loads through the message bus (load_image keeps a
.flippy mip sidecar next to the source like imgutils.nim:343-364) and is
retained by an ImageRef for RAII eviction. Writes
examples/out/image_renderlist.png.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from figdraw_tpu import (
    Fig, FigKind, fill, image_style, new_renders, rect, rgba, vec2,
)
from figdraw_tpu.renderer import FigRenderer
from figdraw_tpu.resources import ImageMessageBus, ImageRef, put_image

W, H = 800, 600
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")


def make_picture(size: int = 280) -> np.ndarray:
    """A generated 'photo': smooth color field + ring, stand-in for img1.png."""
    yy, xx = np.mgrid[0:size, 0:size] / size
    r = np.hypot(xx - 0.5, yy - 0.55)
    img = np.zeros((size, size, 4), np.uint8)
    img[..., 0] = (120 + 120 * np.sin(6.0 * xx + 2.0 * yy)).astype(np.uint8)
    img[..., 1] = (90 + 120 * yy).astype(np.uint8)
    img[..., 2] = (200 - 130 * xx).astype(np.uint8)
    ring = np.abs(r - 0.3) < 0.035
    img[ring] = (255, 240, 200, 255)
    img[..., 3] = 255
    return img


def main():
    os.makedirs(OUT, exist_ok=True)
    bus = ImageMessageBus()
    put_image(101, make_picture(), bus=bus)
    ref = ImageRef(101, bus=bus)  # RAII ownership (imgutils.nim:61-68)

    renders = new_renders()
    root = renders.add_root(0, Fig(kind=FigKind.nkRectangle,
                                   screen_box=rect(0, 0, W, H),
                                   fill=fill(rgba(30, 30, 30, 255))))
    renders.add_child(0, root, Fig(kind=FigKind.nkRectangle,
                                   screen_box=rect(40, 40, 320, 320),
                                   corners=(16,) * 4,
                                   fill=fill(rgba(80, 80, 80, 255))))
    renders.add_child(0, root, Fig(kind=FigKind.nkImage,
                                   screen_box=rect(60, 60, 280, 280),
                                   image=image_style(101)))

    ren = FigRenderer(atlas_size=512)
    ren.ensure_image_message_subscription(bus)
    ren.render_frame(renders, vec2(W, H))
    from PIL import Image

    Image.fromarray(ren.take_screenshot()).save(
        os.path.join(OUT, "image_renderlist.png"))
    ref.close()
    print(f"wrote {os.path.join(OUT, 'image_renderlist.png')}")


if __name__ == "__main__":
    main()
