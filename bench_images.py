"""Image-heavy frame benchmark — the windy_image_renderlist class of
workload (/root/reference/examples/windy_image_renderlist.nim) at 40-100x
the demo's one image: N panels of rounded box + nkImage at 1080p, in three
variants:

  sdf_control  the same panels with NO images (bounds the atlas cost)
  images_11    every image at its native size (1:1 atlas quads)
  images_scaled every image scaled (non-1:1 — the case that routes whole
               runs to the XLA windowed-gather path today)
  images_mixed images interleaved with shadowed SDF boxes (the structural
               worst case: one draw run carrying both kinds)

Prints one JSON line per variant. FIGDRAW_BENCH_IMAGES (default "100,400")
scales N; FIGDRAW_BENCH_FRAMES (default 30) per loop.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

W = int(os.environ.get("FIGDRAW_BENCH_W", "1920"))
H = int(os.environ.get("FIGDRAW_BENCH_H", "1080"))
FRAMES = int(os.environ.get("FIGDRAW_BENCH_FRAMES", "30"))
WARMUP = int(os.environ.get("FIGDRAW_BENCH_WARMUP", "5"))
SCALES = tuple(int(v) for v in os.environ.get(
    "FIGDRAW_BENCH_IMAGES", "100,400").split(","))

IMG_ID = 7001
SRC = 64  # source image edge (atlas entry is SRC x SRC)


def _photo_image(edge=SRC):
    """A deterministic 'photo': smooth gradients + a few hard edges."""
    y, x = np.mgrid[0:edge, 0:edge]
    img = np.zeros((edge, edge, 4), np.uint8)
    img[..., 0] = (x * 255 / edge).astype(np.uint8)
    img[..., 1] = (y * 255 / edge).astype(np.uint8)
    img[..., 2] = ((x + y) * 127 / edge).astype(np.uint8)
    img[(x // 8 + y // 8) % 2 == 0, 2] = 220
    img[..., 3] = 255
    return img


def build_scene(n, variant):
    from figdraw_tpu import (
        Fig, FigFlags, FigKind, fill, image_style, new_renders, rect, rgba,
    )
    from figdraw_tpu.basics import RenderShadow, ShadowStyle
    from figdraw_tpu.nodes import RenderList
    from figdraw_tpu.nodesarray import from_renders

    rng = np.random.RandomState(777)
    lst = RenderList()
    lst.add_root(Fig(kind=FigKind.nkRectangle, screen_box=rect(0, 0, W, H),
                     fill=fill(rgba(30, 30, 30, 255))))
    for i in range(n):
        x = float(rng.uniform(0, W - 120))
        y = float(rng.uniform(0, H - 120))
        lst.add_root(Fig(
            kind=FigKind.nkRectangle, screen_box=rect(x, y, 104, 104),
            fill=fill(rgba(80, 80, 80, 255)), corners=(12,) * 4))
        if variant == "sdf_control":
            lst.add_root(Fig(
                kind=FigKind.nkRectangle,
                screen_box=rect(x + 12, y + 12, 80, 80),
                fill=fill(rgba(120 + i % 90, 90, 200, 255)),
                corners=(6,) * 4))
            continue
        if variant == "images_11":
            box = rect(x + 20, y + 20, SRC, SRC)  # native size -> 1:1
        else:
            s = (80, 40, 96)[i % 3]  # scaled draws (never 1:1)
            box = rect(x + 12, y + 12, s, s)
        lst.add_root(Fig(kind=FigKind.nkImage, screen_box=box,
                         image=image_style(IMG_ID)))
        if variant == "images_mixed":
            lst.add_root(Fig(
                kind=FigKind.nkRectangle,
                screen_box=rect(x + 60, y + 60, 70, 50),
                fill=fill(rgba(200, 160, 60, 200)), corners=(8,) * 4,
                shadows=(RenderShadow(style=ShadowStyle.DropShadow, blur=8.0,
                                      spread=3.0, x=4.0, y=4.0,
                                      fill=fill(rgba(0, 0, 0, 140))),)))
    renders = new_renders()
    renders.set_layer(0, lst)
    return from_renders(renders)


def bench_variant(ren, n, variant, size):
    scene = build_scene(n, variant)
    out = None
    for _ in range(WARMUP):
        out = ren.render_frame(scene, size)
    out.block_until_ready()
    samples = []
    for _ in range(FRAMES):
        t0 = time.perf_counter()
        ren.render_frame(scene, size).block_until_ready()
        samples.append((time.perf_counter() - t0) * 1000.0)
    return float(np.median(samples)), float(np.percentile(samples, 95))


def main():
    from figdraw_tpu import FigRenderer, vec2
    from figdraw_tpu.resources import ImageMessageBus, put_image

    size = vec2(W, H)
    for n in SCALES:
        ren = FigRenderer(atlas_size=256, use_pallas=True)
        bus = ImageMessageBus()
        ren.ensure_image_message_subscription(bus)
        # mipmapped=True is the production default (load_image): minified
        # scaled draws (the 40px of a 64px source) then pay the flatten-time
        # trilinear second quad — the path this bench exists to bound
        put_image(IMG_ID, _photo_image(), bus=bus, mipmapped=True)
        res = {}
        for variant in ("sdf_control", "images_11", "images_scaled",
                        "images_mixed"):
            med, p95 = bench_variant(ren, n, variant, size)
            res[variant] = med
            print(f"  {n:4d} panels {variant:13s} med={med:7.2f} ms "
                  f"p95={p95:7.2f} ms fps={1000.0 / med:6.1f}",
                  file=sys.stderr)
        print(json.dumps({
            "metric": f"image_frame_{n}img",
            "value": round(res["images_scaled"], 3),
            "unit": "ms",
            "images_11": round(res["images_11"], 3),
            "images_mixed": round(res["images_mixed"], 3),
            "sdf_control": round(res["sdf_control"], 3),
        }))


if __name__ == "__main__":
    main()
