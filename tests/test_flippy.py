""".flippy container, snappy codec, alpha bleed, disk cache (formatflippy.nim)."""

import os
import tempfile

import numpy as np
import pytest

from figdraw_tpu.utils import flippy as fl


def test_snappy_roundtrip():
    rng = np.random.default_rng(7)
    cases = [
        b"",
        b"x",
        b"hello world " * 500,
        rng.integers(0, 256, 100_000, dtype=np.uint8).tobytes(),
        b"\x00" * 70_000 + b"abc" * 30_000,  # crosses the 64K fragment
    ]
    for data in cases:
        c = fl.snappy_compress(data)
        assert fl.snappy_uncompress(c) == data
        # the pure-Python fallback decoder reads the native encoder's output
        assert fl._py_uncompress(c) == data


def test_snappy_compresses():
    data = b"abcd" * 4096
    assert len(fl.snappy_compress(data)) < len(data) // 4


def test_snappy_rejects_garbage():
    with pytest.raises(ValueError):
        fl.snappy_uncompress(b"\xff\xff\xff\xff\xff\xff")


def test_flippy_file_roundtrip():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 48, 4), dtype=np.uint8)
    f = fl.image_to_flippy(img, bleed=False)
    # full chain down to a 1-px edge (formatflippy.nim:101-112)
    assert f.mipmaps[0].shape == (64, 48, 4)
    assert min(f.mipmaps[-1].shape[:2]) == 1
    assert f.width == 48 and f.height == 64
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "t.flippy")
        fl.save_flippy(f, p)
        g = fl.load_flippy(p)
    assert len(g.mipmaps) == len(f.mipmaps)
    for a, b in zip(f.mipmaps, g.mipmaps):
        assert np.array_equal(a, b)


def test_flippy_rejects_bad_header():
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "bad.flippy")
        with open(p, "wb") as fh:
            fh.write(b"nope" + b"\x00" * 16)
        with pytest.raises(IOError):
            fl.load_flippy(p)


def test_alpha_bleed():
    """a=0 texels inherit nearby opaque color; alpha stays 0; opaque texels
    untouched (formatflippy.nim:18-75)."""
    img = np.zeros((16, 16, 4), np.uint8)
    img[4:12, 4:12] = (200, 10, 10, 255)
    out = fl.alpha_bleed(img)
    assert out[0, 0, 3] == 0
    assert out[0, 0, 0] > 0  # red bled into the corner
    assert np.array_equal(out[5, 5], (200, 10, 10, 255))
    # fully-opaque image is a no-op
    solid = np.full((8, 8, 4), 77, np.uint8)
    assert np.array_equal(fl.alpha_bleed(solid), solid)


def test_disk_cache_regenerates_on_mtime():
    from PIL import Image

    img = np.zeros((16, 16, 4), np.uint8)
    img[4:12, 4:12] = (0, 255, 0, 255)
    with tempfile.TemporaryDirectory() as td:
        png = os.path.join(td, "x.png")
        Image.fromarray(img).save(png)
        fl.read_image_cached(png)
        sidecar = png + ".flippy"
        assert os.path.exists(sidecar)
        t1 = os.path.getmtime(sidecar)
        fl.read_image_cached(png)  # fresh sidecar → no rewrite
        assert os.path.getmtime(sidecar) == t1
        os.utime(png, (os.path.getmtime(png) + 5,) * 2)
        fl.read_image_cached(png)  # stale sidecar → regenerated
        assert os.path.getmtime(sidecar) > t1


def test_load_image_publishes_flippy_mips():
    """load_image routes through the sidecar cache and ships the stored chain
    to the renderer atlas (imgutils.nim:343-364 + figrender pump)."""
    from PIL import Image

    from figdraw_tpu.renderer import FigRenderer
    from figdraw_tpu.resources import ImageMessageBus, load_image

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32, 4), dtype=np.uint8)
    with tempfile.TemporaryDirectory() as td:
        png = os.path.join(td, "y.png")
        Image.fromarray(img).save(png)
        bus = ImageMessageBus()
        ref = load_image(png, bus=bus)
        assert os.path.exists(png + ".flippy")
        ren = FigRenderer(atlas_size=256, use_pallas=False)
        ren.ensure_image_message_subscription(bus)
        ren.process_image_messages()
        assert ref.id in ren.atlas.entries
        # level-1 mip (16x16) came from the sidecar chain
        assert (ref.id, 1) in ren.atlas.entries
        stored = fl.load_flippy(png + ".flippy")
        expect = ren.atlas._normalize(stored.mipmaps[1])
        got = ren.atlas._images[(ref.id, 1)]
        assert np.array_equal(np.asarray(got), np.asarray(expect))


def test_reads_reference_flippy_files():
    """The clean-room snappy decoder reads the reference's own supersnappy-
    compressed assets (data/arrow.flippy, data/img1.flippy)."""
    import os

    from PIL import Image

    for name, exact in (("arrow", 1), ("img1", 0)):
        path = f"/root/reference/data/{name}.flippy"
        if not os.path.exists(path):
            pytest.skip("reference data not mounted")
        f = fl.load_flippy(path)
        png = np.asarray(Image.open(f"/root/reference/data/{name}.png").convert("RGBA"))
        assert f.mipmaps[0].shape == png.shape
        opaque = png[..., 3] > 0
        diff = np.abs(
            f.mipmaps[0][opaque].astype(int) - png[opaque].astype(int)
        ).max()
        assert diff <= exact  # transparent texels were alpha-bled by pixie
        assert min(f.mipmaps[-1].shape[:2]) == 1


def test_mip_chain_shape_ladder_matches_pixie():
    """Odd dims round up with edge duplication (pixie minifyBy2): the
    reference's img1 chain is 100→50→25→13→7→4→2→1."""
    img = np.zeros((100, 100, 4), np.uint8)
    img[..., 3] = 255
    f = fl.image_to_flippy(img, bleed=False)
    sizes = [m.shape[0] for m in f.mipmaps]
    assert sizes == [100, 50, 25, 13, 7, 4, 2, 1]
