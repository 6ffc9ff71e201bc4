"""render_frame_async: the pipelined frame API (flatten on the caller's
thread, upload+dispatch on the renderer's worker thread, <= 2 frames in
flight to respect the native combo pool's ping-pong)."""

import numpy as np

from figdraw_tpu import Fig, FigKind, fill, rect, rgba, vec2
from figdraw_tpu.nodes import RenderList
from figdraw_tpu.nodesarray import from_renders
from figdraw_tpu.renderer import FigRenderer


def _scene(frame):
    lst = RenderList()
    for i in range(40):
        lst.add_root(Fig(kind=FigKind.nkRectangle,
                         screen_box=rect(4 + (i % 8) * 14 + frame,
                                         6 + (i // 8) * 20, 36, 28),
                         corners=(4,) * 4,
                         fill=fill(rgba(60 + i * 4, (i * 31) % 255, 180, 155))))
    from figdraw_tpu import new_renders
    r = new_renders()
    r.set_layer(0, lst)
    return from_renders(r)


def test_async_frames_match_sync():
    size = vec2(160, 128)
    sync_r = FigRenderer(atlas_size=64, use_pallas=False)
    async_r = FigRenderer(atlas_size=64, use_pallas=False)
    futures = [async_r.render_frame_async(_scene(f), size) for f in range(4)]
    frames = [np.asarray(f.result()) for f in futures]
    for f in range(4):
        expect = np.asarray(sync_r.render_frame(_scene(f), size))
        np.testing.assert_array_equal(frames[f], expect)


def test_async_then_sync_drains():
    """A sync render after async ones must produce the right frame (the
    drain keeps the combo pool from being overwritten mid-upload)."""
    size = vec2(160, 128)
    r = FigRenderer(atlas_size=64, use_pallas=False)
    fut = r.render_frame_async(_scene(0), size)
    sync_frame = np.asarray(r.render_frame(_scene(1), size))
    ref = FigRenderer(atlas_size=64, use_pallas=False)
    ref.render_frame(_scene(0), size)
    expect = np.asarray(ref.render_frame(_scene(1), size))
    np.testing.assert_array_equal(sync_frame, expect)
    fut.result()


def test_async_inflight_cap():
    """No more than two unreleased buffers at any point: issuing many async
    frames back-to-back stays correct frame-by-frame."""
    size = vec2(160, 128)
    r = FigRenderer(atlas_size=64, use_pallas=False)
    futs = [(f, r.render_frame_async(_scene(f % 3), size)) for f in range(7)]
    ref = FigRenderer(atlas_size=64, use_pallas=False)
    expects = {f: np.asarray(ref.render_frame(_scene(f), size))
               for f in range(3)}
    for f, fut in futs:
        np.testing.assert_array_equal(np.asarray(fut.result()), expects[f % 3])


def test_async_exception_propagates():
    size = vec2(160, 128)
    r = FigRenderer(atlas_size=64, use_pallas=False)

    orig = r.execute

    def boom(tape):
        raise RuntimeError("injected execute failure")

    r.execute = boom
    fut = r.render_frame_async(_scene(0), size)
    try:
        fut.result()
        raised = False
    except RuntimeError:
        raised = True
    assert raised
    r.execute = orig
    # the pipeline stays usable afterwards
    out = np.asarray(r.render_frame_async(_scene(1), size).result())
    assert out.shape == (128, 160, 4)
