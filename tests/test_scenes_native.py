"""fd_scene_animate (native/flatten.cpp) vs the numpy animator
(scenes._scene_animate_np): BIT-identical node arrays.

The demo-scene animator is the host side of the benchmark frame loop (the
reference's renderlist_100_common.nim animates in compiled Nim); the C twin
must reproduce the numpy math exactly — double evaluation in the same
operation order, round-to-nearest f64->f32 stores, truncating f64->u16
corner stores, and the clip/max edge cases. The lib builds with
-ffp-contract=off so FMA never re-rounds what numpy computes unfused."""

import numpy as np
import pytest

from figdraw_tpu import native
from figdraw_tpu.scenes import (
    _scene_anim_state,
    _scene_animate_np,
    _scene_randoms,
    _scene_static,
    make_render_tree_array,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native flattener did not build")


@pytest.mark.parametrize("copies", [1, 2, 5, 100])
@pytest.mark.parametrize("size", [(1280.0, 720.0), (333.5, 217.25),
                                  (400.0, 300.0)])
def test_native_animate_bit_identical(copies, size):
    w, h = size
    _, lst_c = _scene_static(w, h, copies)
    _, lst_np = _scene_static(w, h, copies)
    st = _scene_anim_state(copies)
    max_x = max(0.0, w - 580.0)
    max_y = max(0.0, h - 480.0)
    base_xs, base_ys = _scene_randoms(copies, max_x, max_y)
    for frame in (0, 1, 123, 10007):
        ok = native.scene_animate(lst_c.nodes, w, h, frame, copies,
                                  base_xs, base_ys, st)
        assert ok
        _scene_animate_np(lst_np.nodes, w, h, frame, copies)
        if lst_c.nodes.tobytes() != lst_np.nodes.tobytes():
            for col in lst_c.nodes.dtype.names:
                a, b = lst_c.nodes[col], lst_np.nodes[col]
                assert a.tobytes() == b.tobytes(), \
                    f"column {col} diverges at frame {frame}"


def test_dispatcher_uses_native_and_matches(monkeypatch):
    """make_render_tree_array's retained path goes through the C animator
    and still produces the exact array the numpy path would."""
    w, h, copies = 1280.0, 720.0, 7
    cache = {}
    out = make_render_tree_array(w, h, 42, copies=copies, cache=cache)
    nodes_c = out.layers[0].nodes.copy()

    # force the numpy fallback and compare
    monkeypatch.setattr(native, "scene_animate",
                        lambda *a, **k: False)
    cache2 = {}
    out2 = make_render_tree_array(w, h, 42, copies=copies, cache=cache2)
    assert nodes_c.tobytes() == out2.layers[0].nodes.tobytes()


def test_native_animate_rejects_short_array():
    _, lst = _scene_static(640.0, 480.0, 3)
    st = _scene_anim_state(3)
    base_xs, base_ys = _scene_randoms(3, 60.0, 0.0)
    lib = native._load()
    rc = lib.fd_scene_animate(
        native._ptr(lst.nodes), 2, 640.0, 480.0, 580.0, 480.0, 0, 3,
        native._ptr(base_xs), native._ptr(base_ys),
        native._ptr(st["sin_of_sp"]), native._ptr(st["cos_of_sp"]),
        native._ptr(st["sin_of_cp"]), native._ptr(st["cos_of_cp"]),
        native._ptr(st["sin_t"]), native._ptr(st["cos_t"]))
    assert rc == -1
