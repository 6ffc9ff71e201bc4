"""Images, atlas, MSDF modes and the resource message bus.

Behavior ports of /root/reference/tests/timage_loading.nim (bus staleness /
replay / RAII eviction) and trender_image / trender_image_msdf_invert
(drawImage, flipY, MSDF sampling).
"""

import numpy as np

from figdraw_tpu import (
    Fig,
    FigFlags,
    FigKind,
    FigRenderer,
    MsdfImageStyle,
    fill,
    image_style,
    new_renders,
    rect,
    rgba,
    vec2,
)
from figdraw_tpu.nodes import RenderList
from figdraw_tpu.resources import (
    ImageMessageBus,
    ImageMsg,
    ImageMsgKind,
    ImageRef,
    put_image,
    replace_image,
)


def checker_image(w=8, h=8):
    img = np.zeros((h, w, 4), dtype=np.uint8)
    img[: h // 2, : w // 2] = (255, 0, 0, 255)
    img[: h // 2, w // 2 :] = (0, 255, 0, 255)
    img[h // 2 :, : w // 2] = (0, 0, 255, 255)
    img[h // 2 :, w // 2 :] = (255, 255, 0, 255)
    return img


def render_image_node(ren, image_id, flags=0, w=64, h=64):
    lst = RenderList()
    lst.add_root(
        Fig(kind=FigKind.nkImage, screen_box=rect(8, 8, 32, 32),
            flags=flags, image=image_style(image_id))
    )
    r = new_renders()
    r.set_layer(0, lst)
    ren.render_frame(r, vec2(w, h))
    return ren.take_screenshot()


def test_draw_image_and_flip_y():
    bus = ImageMessageBus()
    ren = FigRenderer(atlas_size=64, use_pallas=False)
    ren.ensure_image_message_subscription(bus)
    put_image(1234, checker_image(), bus=bus)

    img = render_image_node(ren, 1234)
    # top-left quadrant of the image (red) lands in the rect's top-left
    assert img[12, 12, 0] > 200 and img[12, 12, 1] < 60
    # bottom-left is blue
    assert img[35, 12, 2] > 200

    flipped = render_image_node(ren, 1234, flags=FigFlags.NfInvertY)
    assert flipped[12, 12, 2] > 200  # blue now on top
    assert flipped[35, 12, 0] > 200  # red at bottom


def test_minified_zoom_blends_mip_levels_monotonically():
    """Flatten-time TRILINEAR: a minified image blends the two bracketing
    mip levels by the (linear-in-scale) fraction instead of nearest-level
    popping — an animated zoom fades between levels monotonically
    (GL mipmapped atlas, glcontext.nim:610-620). Levels are synthetic
    solid colors (level 0 red, level 1 blue) so the blend is measurable."""
    from figdraw_tpu.resources import ImageMessageBus, ImageMsg, ImageMsgKind

    red = np.zeros((32, 32, 4), np.uint8)
    red[:] = (255, 0, 0, 255)
    blue = np.zeros((16, 16, 4), np.uint8)
    blue[:] = (0, 0, 255, 255)
    mips = tuple(
        np.full((e, e, 4), (0, 255, 0, 255), np.uint8) for e in (8, 4, 2, 1)
    )
    bus = ImageMessageBus()
    ren = FigRenderer(atlas_size=128, use_pallas=False)
    ren.ensure_image_message_subscription(bus)
    bus.publish(ImageMsg(kind=ImageMsgKind.PutImage, id=555, image=red,
                         mipmapped=True, mips=(blue,) + mips))

    def center_px(w):
        lst = RenderList()
        lst.add_root(Fig(kind=FigKind.nkRectangle, screen_box=rect(0, 0, 48, 48),
                         fill=fill(rgba(255, 255, 255, 255))))
        lst.add_root(Fig(kind=FigKind.nkImage, screen_box=rect(4, 4, w, w),
                         image=image_style(555)))
        r = new_renders()
        r.set_layer(0, lst)
        ren.render_frame(r, vec2(48, 48))
        shot = ren.take_screenshot()
        return shot[4 + int(w // 2), 4 + int(w // 2)].astype(float)

    reds, blues = [], []
    for w in (32, 28, 24, 20, 17, 16):
        px = center_px(w)
        reds.append(px[0])
        blues.append(px[2])
    assert reds[0] > 250 and blues[0] < 5    # native size: pure level 0
    assert blues[-1] > 250 and reds[-1] < 5  # 2x minified: pure level 1
    # monotone: red fades out, blue fades in, no pops back
    for a, b in zip(reds, reds[1:]):
        assert b <= a + 1.0, reds
    for a, b in zip(blues, blues[1:]):
        assert b >= a - 1.0, blues
    # mid-sweep is a genuine BLEND of both levels, not a switch
    assert 30 < reds[2] < 225 and 30 < blues[2] < 225, (reds, blues)


def test_anisotropic_minification_uses_max_axis_lod():
    """LOD derives from the MAX-axis footprint (GL LINEAR_MIPMAP_LINEAR):
    a 32x32 image drawn 32 wide but only 16 tall is 2x minified and must
    sample level 1 exactly like a uniform 16x16 draw — x-only LOD would
    keep level 0 and alias/shimmer under animation."""
    from figdraw_tpu.resources import ImageMessageBus, ImageMsg, ImageMsgKind

    red = np.zeros((32, 32, 4), np.uint8)
    red[:] = (255, 0, 0, 255)
    blue = np.zeros((16, 16, 4), np.uint8)
    blue[:] = (0, 0, 255, 255)
    mips = tuple(
        np.full((e, e, 4), (0, 255, 0, 255), np.uint8) for e in (8, 4, 2, 1)
    )
    bus = ImageMessageBus()
    ren = FigRenderer(atlas_size=128, use_pallas=False)
    ren.ensure_image_message_subscription(bus)
    bus.publish(ImageMsg(kind=ImageMsgKind.PutImage, id=556, image=red,
                         mipmapped=True, mips=(blue,) + mips))

    def center_px(w, h):
        lst = RenderList()
        lst.add_root(Fig(kind=FigKind.nkRectangle,
                         screen_box=rect(0, 0, 48, 48),
                         fill=fill(rgba(255, 255, 255, 255))))
        lst.add_root(Fig(kind=FigKind.nkImage, screen_box=rect(4, 4, w, h),
                         image=image_style(556)))
        r = new_renders()
        r.set_layer(0, lst)
        ren.render_frame(r, vec2(48, 48))
        shot = ren.take_screenshot()
        return shot[4 + int(h // 2), 4 + int(w // 2)].astype(float)

    wide = center_px(32, 16)   # x 1:1, y 2x minified -> level 1 (blue)
    tall = center_px(16, 32)   # y 1:1, x 2x minified -> level 1 (blue)
    square = center_px(16, 16)  # uniform 2x -> level 1 (blue), the anchor
    for px in (wide, tall, square):
        assert px[2] > 250 and px[0] < 5, (wide, tall, square)


def test_replace_image_updates_pixels():
    bus = ImageMessageBus()
    ren = FigRenderer(atlas_size=64, use_pallas=False)
    ren.ensure_image_message_subscription(bus)
    put_image(77, checker_image(), bus=bus)
    render_image_node(ren, 77)

    solid = np.zeros((8, 8, 4), dtype=np.uint8)
    solid[:] = (10, 200, 30, 255)
    replace_image(77, solid, bus=bus)
    img = render_image_node(ren, 77)
    assert img[20, 20, 1] > 150 and img[20, 20, 0] < 60


def test_bus_replay_on_subscribe():
    bus = ImageMessageBus()
    put_image(5, checker_image(), bus=bus)
    put_image(6, checker_image(), bus=bus)
    sub = bus.subscribe()
    msgs = sub.drain()
    assert {m.id for m in msgs} == {5, 6}
    assert all(m.kind == ImageMsgKind.PutImage for m in msgs)


def test_bus_staleness():
    bus = ImageMessageBus()
    m1 = bus.publish(ImageMsg(kind=ImageMsgKind.PutImage, id=9, image=checker_image()))
    m2 = bus.publish(ImageMsg(kind=ImageMsgKind.PutImage, id=9, image=checker_image()))
    assert not bus.message_current(m1)  # superseded
    assert bus.message_current(m2)
    bus.publish(ImageMsg(kind=ImageMsgKind.ClearImageCache))
    assert not bus.message_current(m2)  # cache generation bumped


def test_image_ref_final_release_evicts():
    bus = ImageMessageBus()
    ren = FigRenderer(atlas_size=64, use_pallas=False)
    ren.ensure_image_message_subscription(bus)
    put_image(42, checker_image(), bus=bus)
    ref1 = ImageRef(42, bus=bus)
    ref2 = ImageRef(42, bus=bus)
    ren.process_image_messages()
    assert ren.contains_image(42)
    ref1.close()
    ren.process_image_messages()
    assert ren.contains_image(42)  # still retained by ref2
    ref2.close()
    ren.process_image_messages()
    assert not ren.contains_image(42)


def synthetic_msdf(size=32, radius=10.0, px_range=4.0):
    """True SDF of a circle stored in rgb (median == sd), alpha in w (mtsdf)."""
    yy, xx = np.mgrid[0:size, 0:size]
    d = np.sqrt((xx + 0.5 - size / 2) ** 2 + (yy + 0.5 - size / 2) ** 2)
    sd = (radius - d) / px_range + 0.5
    sd = np.clip(sd, 0.0, 1.0).astype(np.float32)
    return np.stack([sd, sd, sd, sd], axis=-1)


def test_msdf_mode_renders_circle():
    bus = ImageMessageBus()
    ren = FigRenderer(atlas_size=64, use_pallas=False)
    ren.ensure_image_message_subscription(bus)
    put_image(99, synthetic_msdf(), bus=bus)

    lst = RenderList()
    lst.add_root(
        Fig(kind=FigKind.nkMsdfImage, screen_box=rect(16, 16, 32, 32),
            msdf_image=MsdfImageStyle(id=99, fill=fill(rgba(0, 0, 0, 255)),
                                      px_range=4.0))
    )
    r = new_renders()
    r.set_layer(0, lst)
    ren.render_frame(r, vec2(64, 64))
    img = ren.take_screenshot()
    assert img[32, 32, 0] < 50  # center: glyph color
    assert img[18, 18, 0] > 200  # corner of quad: background
    # outline (annular) variant
    lst2 = RenderList()
    lst2.add_root(
        Fig(kind=FigKind.nkMsdfImage, screen_box=rect(16, 16, 32, 32),
            msdf_image=MsdfImageStyle(id=99, fill=fill(rgba(0, 0, 0, 255)),
                                      px_range=4.0, stroke_weight=2.0))
    )
    r2 = new_renders()
    r2.set_layer(0, lst2)
    ren.render_frame(r2, vec2(64, 64))
    img2 = ren.take_screenshot()
    assert img2[32, 32, 0] > 200  # hollow center


def test_atlas_usage_snapshot():
    from figdraw_tpu.renderer import atlas_usage_snapshot

    bus = ImageMessageBus()
    ren = FigRenderer(atlas_size=64, use_pallas=False)
    ren.ensure_image_message_subscription(bus)
    put_image(7, checker_image(), bus=bus)
    render_image_node(ren, 7)
    usage = ren.atlas_usage()
    assert usage.image_count >= 1
    assert usage.entry_count >= 2  # white + image
    assert 0.0 < usage.used_ratio <= 1.0
    snap = atlas_usage_snapshot()
    assert snap.snapshot_id > 0


def test_atlas_grow_and_replay():
    bus = ImageMessageBus()
    ren = FigRenderer(atlas_size=32, use_pallas=False)
    ren.ensure_image_message_subscription(bus)
    # overflow the 32x32 atlas → grow with repack, entries survive
    for i in range(6):
        put_image(100 + i, checker_image(16, 16), bus=bus)
    ren.process_image_messages()
    assert ren.atlas.size > 32
    for i in range(6):
        assert ren.contains_image(100 + i)


def test_mipmapped_minification():
    """Minified draws sample the matching mip level (the GL atlas is
    mipmapped; flippy chains in the reference)."""
    bus = ImageMessageBus()
    ren = FigRenderer(atlas_size=256, use_pallas=False)
    ren.ensure_image_message_subscription(bus)
    # 64x64 1px checker: naive bilinear at 8x minification aliases to extremes;
    # the level-3 mip averages to gray
    img = np.zeros((64, 64, 4), dtype=np.uint8)
    img[::2, ::2] = (255, 255, 255, 255)
    img[1::2, 1::2] = (255, 255, 255, 255)
    img[::2, 1::2, 3] = 255
    img[1::2, ::2, 3] = 255
    put_image(555, img, bus=bus, mipmapped=True)
    ren.process_image_messages()
    assert (555, 1) in ren.atlas.entries and (555, 3) in ren.atlas.entries

    lst = RenderList()
    lst.add_root(Fig(kind=FigKind.nkImage, screen_box=rect(8, 8, 8, 8),
                     image=image_style(555)))
    r = new_renders()
    r.set_layer(0, lst)
    ren.render_frame(r, vec2(32, 32))
    out = ren.take_screenshot()
    # interior pixels near 50% gray, not 0/255 aliasing
    inner = out[10:14, 10:14, 0].astype(int)
    assert 90 <= inner.mean() <= 165, inner


def test_sdf_from_coverage_circle():
    """Generated SDF matches the analytic circle distance away from edges."""
    from figdraw_tpu.utils.sdfgen import sdf_from_coverage

    size, radius = 48, 15.0
    yy, xx = np.mgrid[0:size, 0:size]
    d = np.sqrt((xx + 0.5 - size / 2) ** 2 + (yy + 0.5 - size / 2) ** 2)
    coverage = np.clip(radius - d + 0.5, 0.0, 1.0)
    px_range = 8.0
    sdf = sdf_from_coverage(coverage, px_range=px_range)
    got_sd = (sdf[..., 0] - 0.5) * px_range
    true_sd = radius - d
    sel = np.abs(true_sd) < px_range / 2 - 1
    err = np.abs(got_sd - true_sd)[sel]
    assert err.max() < 0.75, err.max()


def test_generated_glyph_sdf_renders_scaled():
    """glyph SDF via nkMsdfImage: crisp at 3x the raster size (msdf_star
    capability without external msdfgen assets)."""
    from figdraw_tpu import Fig, FigKind, MsdfImageStyle, fill, new_renders, rect, rgba
    from figdraw_tpu.text.typefaces import get_typeface, load_typeface
    from figdraw_tpu.utils.sdfgen import glyph_sdf

    tf = get_typeface(load_typeface("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"))
    out = glyph_sdf(tf, tf.glyph_id(ord("O")), size=24.0, px_range=4.0)
    assert out is not None
    sdf_img, _offset = out

    bus = ImageMessageBus()
    ren = FigRenderer(atlas_size=128, use_pallas=False)
    ren.ensure_image_message_subscription(bus)
    put_image(777, sdf_img, bus=bus)

    h0, w0 = sdf_img.shape[:2]
    lst = RenderList()
    lst.add_root(Fig(kind=FigKind.nkRectangle, screen_box=rect(0, 0, 120, 120),
                     fill=fill(rgba(255, 255, 255, 255))))
    lst.add_root(Fig(kind=FigKind.nkMsdfImage,
                     screen_box=rect(10, 10, w0 * 3, h0 * 3),
                     msdf_image=MsdfImageStyle(id=777, fill=fill(rgba(0, 0, 0, 255)),
                                               px_range=4.0)))
    r = new_renders()
    r.set_layer(0, lst)
    ren.render_frame(r, vec2(120, 120))
    img = ren.take_screenshot()
    dark = img[..., 0] < 100
    assert dark.sum() > 300  # big "O" ring drawn
    ys, xs = np.nonzero(dark)
    # ring shape: hole in the middle
    cy, cx = int(ys.mean()), int(xs.mean())
    assert img[cy, cx, 0] > 200


def test_incremental_atlas_upload():
    """replace_image streams ship only the changed region to the device
    (glTexSubImage2D analog), not the whole atlas."""
    import jax.numpy as jnp

    from figdraw_tpu.renderer import FigRenderer
    from figdraw_tpu.resources import ImageMessageBus, put_image, replace_image

    bus = ImageMessageBus()
    ren = FigRenderer(atlas_size=512, use_pallas=False)
    ren.ensure_image_message_subscription(bus)
    frame0 = np.zeros((64, 64, 4), np.uint8)
    frame0[..., 0] = 10
    put_image(9001, frame0, bus=bus)
    ren.process_image_messages()
    # copy: np.asarray of a CPU jax array is a zero-copy view, and the patch
    # path donates the device buffer — the view would mutate under us
    full = np.array(ren._device_atlas(), copy=True)
    assert ren.atlas_upload_bytes == ren.atlas.data.nbytes  # first: full

    # stream a new frame: same dims → in-place update → region upload only
    frame1 = np.zeros((64, 64, 4), np.uint8)
    frame1[..., 1] = 200
    replace_image(9001, frame1, bus=bus)
    ren.process_image_messages()
    dev = np.asarray(ren._device_atlas())
    assert ren.atlas_upload_bytes == 64 * 64 * 4 * 4  # one 64x64 f32 patch
    assert np.array_equal(dev, ren.atlas.data)  # device matches host exactly
    assert not np.array_equal(dev, full)


def test_pixelate_nearest_sampling():
    """pixelate=True samples the atlas with GL_NEAREST (glcontext.nim:165-168
    newContext(pixelate)) — pixel-art stays blocky under magnification."""
    from figdraw_tpu import Fig, FigKind, image_style
    from figdraw_tpu.renderer import FigRenderer
    from figdraw_tpu.resources import ImageMessageBus, put_image

    bus = ImageMessageBus()
    img = np.zeros((2, 2, 4), np.uint8)
    img[0, 0] = (255, 0, 0, 255)
    img[0, 1] = (0, 255, 0, 255)
    img[1, 0] = (0, 0, 255, 255)
    img[1, 1] = (255, 255, 0, 255)

    def render(pixelate):
        ren = FigRenderer(atlas_size=64, use_pallas=False, pixelate=pixelate)
        ren.ensure_image_message_subscription(bus)
        put_image(4242, img, bus=bus)
        ren.process_image_messages()
        renders = new_renders()
        renders.add_root(0, Fig(kind=FigKind.nkImage,
                                screen_box=rect(0, 0, 32, 32),
                                image=image_style(4242)))
        ren.render_frame(renders, vec2(32, 32))
        return ren.take_screenshot()

    near = render(True)
    lin = render(False)
    assert tuple(near[12, 12][:3]) == (255, 0, 0)  # pure texel color
    c = lin[15, 15][:3].astype(int)
    assert 40 < c[0] < 230 and 40 < c[1] < 230  # bilinear blend at the seam
    assert not np.array_equal(near, lin)


def test_clear_images_removes_only_listed_ids():
    """timage_loading: a targeted ClearImages batch evicts just those atlas
    entries; unrelated ids keep their entries and the replay table forgets
    the cleared content."""
    from figdraw_tpu.resources import clear_images

    bus = ImageMessageBus()
    ren = FigRenderer(atlas_size=128)
    ren.ensure_image_message_subscription(bus)
    for i in (21, 22, 23):
        put_image(i, checker_image(), bus=bus)
    ren.process_image_messages()
    assert all(ren.contains_image(i) for i in (21, 22, 23))

    clear_images([21, 23], bus=bus)
    ren.process_image_messages()
    assert not ren.contains_image(21)
    assert ren.contains_image(22)
    assert not ren.contains_image(23)

    # a renderer subscribing later replays only the surviving image
    ren2 = FigRenderer(atlas_size=128)
    ren2.ensure_image_message_subscription(bus)
    ren2.process_image_messages()
    assert ren2.contains_image(22)
    assert not ren2.contains_image(21)


def test_clear_font_glyphs_allows_regeneration():
    """tfontutils.nim:1472-1521 — clearing a font's glyphs removes exactly
    its atlas entries; the next frame regenerates them and renders the same
    pixels."""
    from figdraw_tpu.resources import clear_font_glyphs
    from figdraw_tpu.text.layout import typeset
    from figdraw_tpu.text.typefaces import FigFont, load_typeface

    tid = load_typeface("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf")
    f = FigFont(typeface_id=tid, size=14.0)
    arr = typeset(vec2(140, 22), [(f, fill(rgba(10, 10, 20, 255)), "regen AV")])
    renders = new_renders()
    renders.add_root(0, Fig(kind=FigKind.nkRectangle,
                            screen_box=rect(0, 0, 150, 40),
                            fill=fill(rgba(255, 255, 255, 255))))
    renders.add_root(0, Fig(kind=FigKind.nkText,
                            screen_box=rect(4, 6, 140, 22), text_layout=arr))

    bus = ImageMessageBus()
    ren = FigRenderer(atlas_size=256, use_pallas=False)
    ren.ensure_image_message_subscription(bus)
    ren.render_frame(renders, vec2(150, 40))
    first = ren.take_screenshot()
    glyph_keys = [k for k, m in ren.atlas.meta.items() if m.kind == "glyph"]
    assert glyph_keys

    # identify the glyphs' font id from the metadata, then clear that font
    font_ids = {m.font_id for m in ren.atlas.meta.values() if m.kind == "glyph"}
    assert len(font_ids) == 1
    clear_font_glyphs(next(iter(font_ids)), bus=bus)
    ren.process_image_messages()
    assert not any(k in ren.atlas for k in glyph_keys)

    # next frame regenerates the glyphs and matches exactly
    ren.render_frame(renders, vec2(150, 40))
    assert np.array_equal(first, ren.take_screenshot())


def test_subscription_ring_overflow_keeps_newest():
    """rchannels.nim ring push semantics: a bounded inbox overwrites its
    oldest messages; the newest survive, and a fresh subscriber still gets
    everything live through the replay table."""
    bus = ImageMessageBus()
    sub = bus.subscribe()
    cap = sub._inbox.maxlen
    n = cap + 40
    for i in range(n):
        put_image(1000 + i, checker_image(), bus=bus)
    msgs = sub.drain()
    assert len(msgs) <= cap
    assert msgs[-1].id == 1000 + n - 1  # newest kept
    assert all(m.id >= 1000 + (n - cap) for m in msgs)  # oldest dropped

    # replay to a late subscriber ALSO flows through the bounded ring (the
    # reference replays via the same RChan): the newest `cap` entries arrive
    late = bus.subscribe()
    replayed = {m.id for m in late.drain()}
    assert len(replayed) <= cap
    assert 1000 + n - 1 in replayed


def test_clear_image_cache_recovers_and_regenerates():
    """ClearImageCache wipes the whole atlas (white texel included); the next
    frame must restore the white texel, re-rasterize referenced glyphs (the
    ensured-glyph stamps key on the bumped entries version), and render the
    same pixels."""
    from figdraw_tpu.resources import clear_image_cache
    from figdraw_tpu.text.layout import typeset
    from figdraw_tpu.text.typefaces import FigFont, load_typeface

    tid = load_typeface("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf")
    f = FigFont(typeface_id=tid, size=14.0)
    arr = typeset(vec2(120, 22), [(f, fill(rgba(10, 10, 20, 255)), "wipe AV")])
    renders = new_renders()
    renders.add_root(0, Fig(kind=FigKind.nkRectangle,
                            screen_box=rect(0, 0, 140, 40),
                            fill=fill(rgba(255, 255, 255, 255))))
    renders.add_root(0, Fig(kind=FigKind.nkText,
                            screen_box=rect(4, 6, 120, 22), text_layout=arr))

    bus = ImageMessageBus()
    ren = FigRenderer(atlas_size=256, use_pallas=False)
    ren.ensure_image_message_subscription(bus)
    ren.render_frame(renders, vec2(140, 40))
    first = ren.take_screenshot()

    clear_image_cache(bus=bus)
    ren.render_frame(renders, vec2(140, 40))  # must not crash or blank
    assert np.array_equal(first, ren.take_screenshot())


def test_mtsdf_and_annular_msdf_render():
    """Modes 14 (MTSDF: alpha channel SDF) and 15/16 (annular MSDF/MTSDF —
    stroke_weight > 0 outlines the shape): both backends render the circle /
    ring within 1/255 (atlas.frag:296-318 family)."""
    from figdraw_tpu import MsdfImageStyle

    bus = ImageMessageBus()
    put_image(98, synthetic_msdf(), bus=bus)

    lst = RenderList()
    lst.add_root(Fig(kind=FigKind.nkRectangle, screen_box=rect(0, 0, 200, 100),
                     fill=fill(rgba(250, 250, 250, 255))))
    # MTSDF solid (alpha-channel SDF)
    lst.add_root(Fig(kind=FigKind.nkMtsdfImage, screen_box=rect(10, 20, 64, 64),
                     msdf_image=MsdfImageStyle(id=98, fill=fill(rgba(20, 60, 200, 255)),
                                               px_range=4.0)))
    # MSDF annular (outline ring)
    lst.add_root(Fig(kind=FigKind.nkMsdfImage, screen_box=rect(110, 20, 64, 64),
                     msdf_image=MsdfImageStyle(id=98, fill=fill(rgba(200, 40, 40, 255)),
                                               px_range=4.0, stroke_weight=2.0)))
    r = new_renders()
    r.set_layer(0, lst)

    frames = {}
    for use_pallas in (False, True):
        ren = FigRenderer(atlas_size=64, use_pallas=use_pallas)
        ren.ensure_image_message_subscription(bus)
        ren.render_frame(r, vec2(200, 100))
        frames[use_pallas] = ren.take_screenshot()
    ref, pal = frames[False], frames[True]
    assert np.abs(ref.astype(int) - pal.astype(int)).max() <= 1

    # solid disc: filled center; annular: hollow center, inked ring
    assert ref[52, 42, 2] > 150  # blue disc center (MTSDF fill)
    cx = ref[52, 142]
    assert cx[0] > 200 and cx[1] > 200  # ring center stays background
    # search the ring row for red ink to avoid exact-radius brittleness
    row = ref[52, 110:174]
    assert ((row[:, 0] > 150) & (row[:, 1] < 120)).any()
