"""Megakernel fast path: C++ combo export == Python packer, end-to-end parity.

The megakernel executes a mask-heavy frame as ONE Pallas pass (mask planes
live in VMEM registers; clear sentinels carry tight bboxes). On the 180x6
clip-table benchmark this runs sub-clip masks at rect-mask speed
(windy_clip_mask_benchmark.nim's workload)."""

import numpy as np
import pytest

from figdraw_tpu import (
    Fig, FigFlags, FigKind, fill, new_renders, rect, rgba, vec2,
)
from figdraw_tpu import native
from figdraw_tpu.nodesarray import from_renders
from figdraw_tpu.renderer import FigRenderer, _bucket
import figdraw_tpu.executor as ex


def clip_table(rows=8, cols=6, w=256.0, h=200.0):
    renders = new_renders()
    renders.add_root(0, Fig(kind=FigKind.nkRectangle, screen_box=rect(0, 0, w, h),
                            fill=fill(rgba(250, 250, 250, 255))))
    for r in range(rows):
        for c in range(cols):
            cell = renders.add_root(0, Fig(
                kind=FigKind.nkRectangle,
                screen_box=rect(4 + c * 40, 4 + r * 24, 36, 20),
                corners=(5, 5, 5, 5), flags=FigFlags.NfClipContent,
                fill=fill(rgba(200 - r * 9, 60 + c * 20, 120, 255)),
            ))
            renders.add_child(0, cell, Fig(
                kind=FigKind.nkRectangle, screen_box=rect(0, 0, 300, 300),
                fill=fill(rgba(30, 30, 220, 120)), rotation=10.0,
            ))
    return renders


@pytest.mark.skipif(not native.available(), reason="native flattener not built")
def test_cxx_mega_export_matches_python_packer():
    arr = from_renders(clip_table())
    ren = FigRenderer(atlas_size=128, use_pallas=False)
    tape = ren.flatten(arr, vec2(256, 200))
    mf, mm = ex.pack_mega_modes(
        tape, tape.fields[: tape.count], tape.modes[: tape.count]
    )
    res = native.flatten_fast(
        arr, 256, 200, 1.0, 1.0, 1.2, (1, 1, 1, 1),
        atlas_entries=ren.atlas.entries, atlas_size=ren.atlas.size,
        white_uv=ren._white_uv(), min_items=24, bucket=_bucket,
    )
    assert res is not None and res[0] == "mega"
    combo, mask_count = res[1], res[2]
    assert mask_count == tape.mask_count
    rows = mf.shape[0]
    assert np.array_equal(combo[:rows, :68], mf)
    assert np.array_equal(combo[:rows, 68:70].view(np.int32), mm)
    assert not combo[rows:-1].any()  # padding stays zero (never binned)


@pytest.mark.skipif(not native.available(), reason="native flattener not built")
def test_fast_path_takes_tape_route_for_light_scenes():
    renders = new_renders()
    renders.add_root(0, Fig(kind=FigKind.nkRectangle, screen_box=rect(0, 0, 64, 64),
                            fill=fill(rgba(255, 0, 0, 255))))
    arr = from_renders(renders)
    res = native.flatten_fast(arr, 64, 64, 1.0, 1.0, 1.2, (1, 1, 1, 1),
                              min_items=24, bucket=_bucket)
    assert res is not None and res[0] == "tape"
    assert res[1].count == 1


def test_mega_frame_matches_xla():
    """End-to-end: the mega fast path renders the clip table identically to
    the XLA rolled path (uint8 tolerance 1)."""
    arr = from_renders(clip_table())
    ren_mega = FigRenderer(atlas_size=128, use_pallas=True)
    ren_mega.render_frame(arr, vec2(256, 200))
    assert ren_mega.use_pallas, "mega path fell back"
    mega = ren_mega.take_screenshot()
    ren_xla = FigRenderer(atlas_size=128, use_pallas=False)
    ren_xla.render_frame(arr, vec2(256, 200))
    xla = ren_xla.take_screenshot()
    assert np.abs(mega.astype(int) - xla.astype(int)).max() <= 1
