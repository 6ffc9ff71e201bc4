"""Scene-building C API: a host assembling Fig rows through the fd_renders_*
ABI produces the same tape as the Python scene path (native_bindings.nim
analog — external hosts without Python build scenes this way)."""

import ctypes

import numpy as np
import pytest

from figdraw_tpu import native
from figdraw_tpu.nodesarray import FIG_DTYPE, OP_DTYPE

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native flattener not built"
)


def _flatten_capi(build):
    """Run `build(lib, renders)` against a fresh context; return (fields, modes)."""
    lib = native._load()
    ctx = lib.fd_create(
        ctypes.c_float(1.0), ctypes.c_float(1.0), ctypes.c_float(1.2)
    )
    renders = lib.fd_renders_new()
    try:
        build(lib, renders)
        lib.fd_flatten_renders(ctx, renders)
        n = lib.fd_quad_count(ctx)
        fields = np.zeros((max(n, 1), 68), np.float32)
        modes = np.zeros((max(n, 1), 2), np.int32)
        items = np.zeros((max(lib.fd_item_count(ctx), 1), 5), np.int32)
        rc = lib.fd_export(
            ctx,
            fields.ctypes.data_as(ctypes.c_void_p),
            modes.ctypes.data_as(ctypes.c_void_p),
            fields.shape[0],
            items.ctypes.data_as(ctypes.c_void_p),
            items.shape[0],
        )
        assert rc == n
        return fields[:n], modes[:n]
    finally:
        lib.fd_renders_free(renders)
        lib.fd_destroy(ctx)


def _row_ptr(row):
    return row.ctypes.data_as(ctypes.c_void_p)


NK_RECT = 2
NK_DRAWABLE = 3
DK_CIRCLE = 1
DK_BEZIER = 3
NF_CLIP = 1


def test_capi_scene_matches_python_scene():
    # --- build via the C ABI, exactly as an external host would --------------
    def build(lib, renders):
        bg = np.zeros((), FIG_DTYPE)
        bg["kind"] = NK_RECT
        bg["box"] = (0, 0, 200, 150)
        lib.fd_fill_solid(_row_ptr(bg["fill"]), 240, 240, 240, 255)
        root = lib.fd_renders_add_root(renders, 0, _row_ptr(bg))
        assert root == 0

        clip = np.zeros((), FIG_DTYPE)
        clip["kind"] = NK_RECT
        clip["box"] = (10, 10, 100, 80)
        clip["corners"] = (9, 9, 9, 9)
        clip["flags"] = NF_CLIP
        lib.fd_fill_solid(_row_ptr(clip["fill"]), 200, 50, 50, 255)
        ci = lib.fd_renders_add_root(renders, 0, _row_ptr(clip))

        inner = np.zeros((), FIG_DTYPE)
        inner["kind"] = NK_RECT
        inner["box"] = (0, 0, 300, 300)
        start = np.array([255, 0, 0, 255], np.uint8)
        stop = np.array([0, 0, 255, 255], np.uint8)
        lib.fd_fill_linear2(
            _row_ptr(inner["fill"]), 1,
            start.ctypes.data_as(ctypes.c_void_p),
            stop.ctypes.data_as(ctypes.c_void_p),
        )
        rc = lib.fd_renders_add_child(renders, 0, ci, _row_ptr(inner))
        assert rc == ci + 1

        # drawable with a circle + a quadratic bezier on zlevel 1
        d = np.zeros((), FIG_DTYPE)
        d["kind"] = NK_DRAWABLE
        d["box"] = (20, 20, 150, 100)
        d["draw_weight"] = 4.0
        lib.fd_fill_solid(_row_ptr(d["draw_stroke_fill"]), 10, 160, 40, 255)
        d["ops_start"] = lib.fd_renders_op_count(renders, 1)
        circle = np.zeros((), OP_DTYPE)
        circle["kind"] = DK_CIRCLE
        circle["data"][0:3] = (40, 40, 25)
        lib.fd_renders_add_op(renders, 1, _row_ptr(circle), None, 0)
        bez = np.zeros((), OP_DTYPE)
        bez["kind"] = DK_BEZIER
        pts = np.array([[0, 80], [60, 0], [140, 70]], np.float32)
        lib.fd_renders_add_op(
            renders, 1, _row_ptr(bez),
            pts.ctypes.data_as(ctypes.c_void_p), pts.shape[0],
        )
        d["ops_count"] = 2
        lib.fd_renders_add_root(renders, 1, _row_ptr(d))

    c_fields, c_modes = _flatten_capi(build)

    # --- the same scene through the Python API -------------------------------
    from figdraw_tpu import (
        Fig, FigFlags, FigKind, RenderStroke, fill, new_renders, rect, rgba,
        vec2,
    )
    from figdraw_tpu.fill import FillGradientAxis, linear
    from figdraw_tpu.nodes import drawable_bezier, drawable_circle
    from figdraw_tpu.nodesarray import from_renders
    from figdraw_tpu.renderer import FigRenderer

    renders = new_renders()
    renders.add_root(0, Fig(
        kind=FigKind.nkRectangle, screen_box=rect(0, 0, 200, 150),
        fill=fill(rgba(240, 240, 240, 255)),
    ))
    clip = renders.add_root(0, Fig(
        kind=FigKind.nkRectangle, screen_box=rect(10, 10, 100, 80),
        corners=(9, 9, 9, 9), flags=FigFlags.NfClipContent,
        fill=fill(rgba(200, 50, 50, 255)),
    ))
    renders.add_child(0, clip, Fig(
        kind=FigKind.nkRectangle, screen_box=rect(0, 0, 300, 300),
        fill=linear(rgba(255, 0, 0, 255), rgba(0, 0, 255, 255),
                    axis=FillGradientAxis.fgaY),
    ))
    renders.add_root(1, Fig(
        kind=FigKind.nkDrawable, screen_box=rect(20, 20, 150, 100),
        draw_stroke=RenderStroke(weight=4.0, fill=fill(rgba(10, 160, 40, 255))),
        draw_ops=(
            drawable_circle(vec2(40, 40), 25.0),
            drawable_bezier([vec2(0, 80), vec2(60, 0), vec2(140, 70)]),
        ),
    ))
    ren = FigRenderer(atlas_size=64, use_pallas=False)
    py_tape = ren.flatten(from_renders(renders), vec2(200, 150))

    assert py_tape.count == c_fields.shape[0]
    assert np.array_equal(py_tape.fields[: py_tape.count], c_fields)
    assert np.array_equal(py_tape.modes[: py_tape.count], c_modes)


def _border_rows_c(lib, style, box, corners, p1=0.0, p2=0.0, off=0.0):
    lib.fd_border_ops.restype = ctypes.c_int32
    lib.fd_border_ops.argtypes = (
        [ctypes.c_int32] + [ctypes.c_double] * 4
        + [ctypes.c_void_p] + [ctypes.c_double] * 3
        + [ctypes.c_void_p, ctypes.c_int32])
    cr = np.asarray(corners, dtype=np.float64)
    cap = 4096
    buf = np.zeros(cap, dtype=OP_DTYPE)
    n = lib.fd_border_ops(style, box.x, box.y, box.w, box.h,
                          cr.ctypes.data_as(ctypes.c_void_p), p1, p2, off,
                          buf.ctypes.data_as(ctypes.c_void_p), cap)
    assert 0 <= n <= cap
    return buf[:n]


def _border_rows_py(ops):
    from figdraw_tpu.nodes import DrawableKind

    rows = np.zeros(len(ops), dtype=OP_DTYPE)
    for k, op in enumerate(ops):
        rows[k]["kind"] = int(op.kind)
        if op.kind == DrawableKind.dkLine:
            rows[k]["data"][0:4] = (op.a.x, op.a.y, op.b.x, op.b.y)
        elif op.kind == DrawableKind.dkCircle:
            rows[k]["data"][0:3] = (op.center.x, op.center.y, op.radius)
        elif op.kind == DrawableKind.dkArc:
            rows[k]["data"][0:5] = (op.arc_center.x, op.arc_center.y,
                                    op.arc_radius, op.start_angle,
                                    op.sweep_angle)
    return rows


def test_capi_border_ops_bit_identical():
    """fd_border_ops == borders.py BIT-identical (the reference exports the
    figRoundedRectBorder/dashed/dotted generators over its ABI,
    drawutils.nim:351-404): 120 fuzzed boxes/radii/patterns across all
    three styles, byte-compared at the OP_DTYPE row level."""
    import random

    from figdraw_tpu import rect
    from figdraw_tpu.borders import (
        drawable_dashed_rounded_rect_border_ops,
        drawable_dotted_rounded_rect_border_ops,
        drawable_rounded_rect_border_ops,
    )

    lib = native._load()
    rng = random.Random(8080)
    for _ in range(120):
        box = rect(rng.uniform(-20, 50), rng.uniform(-20, 50),
                   rng.uniform(0.0, 300), rng.uniform(0.0, 300))
        corners = tuple(rng.uniform(0, 60) for _ in range(4))
        style = rng.randint(0, 2)
        p1 = rng.uniform(0, 12)
        p2 = rng.uniform(0, 8)
        off = rng.uniform(-9, 20)
        if style == 0:
            want = _border_rows_py(
                drawable_rounded_rect_border_ops(box, corners))
        elif style == 1:
            want = _border_rows_py(drawable_dashed_rounded_rect_border_ops(
                box, corners, p1, p2, off))
        else:
            want = _border_rows_py(drawable_dotted_rounded_rect_border_ops(
                box, corners, p1, p2, off))
        got = _border_rows_c(lib, style, box, corners, p1, p2, off)
        assert len(got) == len(want), (style, box, corners, p1, p2, off)
        assert got.tobytes() == want.tobytes(), (style, box, corners)


def test_capi_dashed_border_scene_matches_python():
    """End-to-end: a C host building a dashed-border node from
    fd_border_ops rows flattens to the same tape as Python's
    fig_dashed_rounded_rect_border scene."""
    from figdraw_tpu import new_renders, rect, rgba, vec2
    from figdraw_tpu.borders import fig_dashed_rounded_rect_border
    from figdraw_tpu.fill import fill
    from figdraw_tpu.nodesarray import from_renders
    from figdraw_tpu.renderer import FigRenderer

    box = rect(20, 15, 140, 90)
    corners = (12, 6, 0, 18)
    weight, dash, gap, off = 3.0, 8.0, 5.0, 2.5

    def build(lib, renders):
        half = weight * 0.5
        local = rect(half, half, box.w, box.h)
        rows = _border_rows_c(lib, 1, local, corners, dash, gap, off)
        d = np.zeros((), FIG_DTYPE)
        d["kind"] = NK_DRAWABLE
        d["box"] = (box.x - half, box.y - half,
                    box.w + weight, box.h + weight)
        d["draw_weight"] = weight
        d["draw_cap"] = 2  # scButt
        lib.fd_fill_solid(_row_ptr(d["draw_stroke_fill"]), 30, 90, 200, 255)
        d["ops_start"] = lib.fd_renders_op_count(renders, 0)
        for k in range(len(rows)):
            lib.fd_renders_add_op(
                renders, 0, rows[k:k + 1].ctypes.data_as(ctypes.c_void_p),
                None, 0)
        d["ops_count"] = len(rows)
        lib.fd_renders_add_root(renders, 0, _row_ptr(d))

    c_fields, c_modes = _flatten_capi(build)

    renders = new_renders()
    fig = fig_dashed_rounded_rect_border(
        box, corners, fill(rgba(30, 90, 200, 255)), weight, dash, gap, off)
    renders.add_root(0, fig)
    ren = FigRenderer(atlas_size=64, use_pallas=False)
    py_tape = ren.flatten(from_renders(renders), vec2(220, 160))

    assert py_tape.count == c_fields.shape[0]
    assert np.array_equal(py_tape.fields[: py_tape.count], c_fields)
    assert np.array_equal(py_tape.modes[: py_tape.count], c_modes)


def test_capi_rejects_bad_parent():
    lib = native._load()
    renders = lib.fd_renders_new()
    try:
        fig = np.zeros((), FIG_DTYPE)
        fig["kind"] = NK_RECT
        assert lib.fd_renders_add_child(renders, 0, 7, _row_ptr(fig)) == -1
    finally:
        lib.fd_renders_free(renders)


def test_c_host_demo_compiles_and_runs(tmp_path):
    """native/examples/scene_demo.c: a real C program against the public
    header builds a layered scene and flattens it — the external-host path
    (native dynlib consumers)."""
    import os
    import subprocess

    from figdraw_tpu.nodesarray import FIG_DTYPE

    native._load()  # ensure the .so exists
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(root, "native", "examples", "scene_demo.c")
    lib_dir = os.path.join(root, "native", "build")
    exe = str(tmp_path / "scene_demo")
    offs = {name: FIG_DTYPE.fields[name][1]
            for name in ("ops_start", "draw_weight", "draw_stroke_fill")}
    subprocess.run(
        [
            "gcc", src, "-I", os.path.join(root, "native"),
            f"-DFD_OFF_OPS_START={offs['ops_start']}",
            f"-DFD_OFF_DRAW_WEIGHT={offs['draw_weight']}",
            f"-DFD_OFF_DRAW_STROKE_FILL={offs['draw_stroke_fill']}",
            "-L", lib_dir, "-lfigdraw_flatten",
            f"-Wl,-rpath,{lib_dir}", "-o", exe,
        ],
        check=True, capture_output=True,
    )
    out = subprocess.run([exe], check=True, capture_output=True, text=True)
    lines = dict(l.split("=") for l in out.stdout.split())
    assert int(lines["quads"]) >= 3
    assert int(lines["patch_ok"]) == 1  # the C retained-edit leg


def test_layout_header_is_current():
    """native/figdraw_layout.h is GENERATED from the Python row dtypes —
    a dtype change without regeneration would desync every shim consumer
    (fdx_scene_new also validates sizes at runtime, but compile-time
    offsets must match too)."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gen = os.path.join(root, "native", "gen_layout.py")
    spec = importlib.util.spec_from_file_location("gen_layout", gen)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with open(os.path.join(root, "native", "figdraw_layout.h")) as fh:
        assert fh.read() == mod.generate(), (
            "figdraw_layout.h is stale — run python native/gen_layout.py")


def test_shim_demo_compiles_and_runs(tmp_path):
    """native/examples/shim_demo.c: the single-header convenience layer
    (native/figdraw.h, the dynlib.nim-shim analog) drives scene building,
    fd_typeset_box text measurement (marks included) and the retained
    patch recipe end-to-end from one real C program."""
    import os
    import subprocess

    from figdraw_tpu.text import native_typeset as nt
    from figdraw_tpu.text.native_pack import save_font_pack
    from figdraw_tpu.text.typefaces import load_typeface

    native._load()
    if not nt.available():
        pytest.skip("native typesetter did not build")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(root, "native", "examples", "shim_demo.c")
    lib_dir = os.path.join(root, "native", "build")
    exe = str(tmp_path / "shim_demo")
    pack = str(tmp_path / "dejavu.fdtp")
    save_font_pack(
        load_typeface("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"),
        pack)
    subprocess.run(
        [
            "gcc", src, "-I", os.path.join(root, "native"),
            "-L", lib_dir, "-lfigdraw_flatten", "-lfigdraw_typeset",
            f"-Wl,-rpath,{lib_dir}", "-o", exe,
        ],
        check=True, capture_output=True,
    )
    out = subprocess.run([exe, pack], check=True, capture_output=True,
                         text=True)
    lines = dict(
        kv.split("=") for l in out.stdout.splitlines() for kv in l.split())
    assert int(lines["quads"]) > 0
    assert int(lines["patch_ok"]) == 1
    assert int(lines["label_glyphs"]) > 0  # mark-bearing label typeset in C
    # one-call border roots (fdx_add_border over fd_border_ops) landed
    assert int(lines["dashed_idx"]) >= 0
    assert int(lines["dotted_idx"]) > int(lines["dashed_idx"])


def test_capi_retained_patch_matches_full_reflatten():
    """fd_flatten_renders_spans + fd_renders_set_fig + fd_flatten_renders_root:
    a C host's retained edit (scratch re-walk of the dirty root spliced over
    its recorded span, reserve tail padded with fd_pad_rows) is bit-identical
    to a full re-flatten of the edited scene — the update_scene contract over
    the C ABI (the reference dynlib's updateNode consumers,
    bindings/native_bindings.nim)."""
    lib = native._load()
    renders = lib.fd_renders_new()
    ctx = lib.fd_create(
        ctypes.c_float(1.0), ctypes.c_float(1.0), ctypes.c_float(1.2)
    )
    scratch = lib.fd_create(
        ctypes.c_float(1.0), ctypes.c_float(1.0), ctypes.c_float(1.2)
    )

    def export(c):
        n = lib.fd_quad_count(c)
        fields = np.zeros((max(n, 1), 68), np.float32)
        modes = np.zeros((max(n, 1), 2), np.int32)
        items = np.zeros((max(lib.fd_item_count(c), 1), 5), np.int32)
        rc = lib.fd_export(
            c,
            fields.ctypes.data_as(ctypes.c_void_p),
            modes.ctypes.data_as(ctypes.c_void_p),
            fields.shape[0],
            items.ctypes.data_as(ctypes.c_void_p),
            items.shape[0],
        )
        assert rc == n
        return fields[:n], modes[:n]

    try:
        for i in range(3):
            fig = np.zeros((), FIG_DTYPE)
            fig["kind"] = NK_RECT
            fig["box"] = (10 + 30 * i, 10, 24, 24)
            fig["corners"] = (4, 4, 4, 4)
            lib.fd_fill_solid(_row_ptr(fig["fill"]), 40 * (i + 1), 80, 120, 255)
            assert lib.fd_renders_add_root(renders, 0, _row_ptr(fig)) == i
        # a second layer so spans cross layers
        top = np.zeros((), FIG_DTYPE)
        top["kind"] = NK_RECT
        top["box"] = (0, 60, 100, 10)
        lib.fd_fill_solid(_row_ptr(top["fill"]), 9, 9, 9, 255)
        lib.fd_renders_add_root(renders, 2, _row_ptr(top))

        n_roots = lib.fd_renders_root_count(renders)
        assert n_roots == 4
        spans = np.zeros((n_roots, 2), np.int32)
        reserve = 2
        rc = lib.fd_flatten_renders_spans(
            ctx, renders, spans.ctypes.data_as(ctypes.c_void_p),
            n_roots, reserve,
        )
        assert rc == n_roots
        assert lib.fd_flatten_renders_spans(  # cap too small -> -1
            ctx, renders, spans.ctypes.data_as(ctypes.c_void_p), 1, 0
        ) == -1
        lib.fd_reset(ctx, ctypes.c_float(1.0), ctypes.c_float(1.0),
                     ctypes.c_float(1.2))
        rc = lib.fd_flatten_renders_spans(
            ctx, renders, spans.ctypes.data_as(ctypes.c_void_p),
            n_roots, reserve,
        )
        assert rc == n_roots
        fields, modes = export(ctx)
        assert (spans[:, 1] - spans[:, 0] >= reserve).all()

        # edit root 1 (layer 0): new fill + corners change
        edit = np.zeros((), FIG_DTYPE)
        edit["kind"] = NK_RECT
        edit["box"] = (40, 10, 24, 24)
        edit["corners"] = (9, 9, 0, 0)
        lib.fd_fill_solid(_row_ptr(edit["fill"]), 250, 50, 10, 255)
        assert lib.fd_renders_set_fig(renders, 0, 1, _row_ptr(edit)) == 0
        assert lib.fd_renders_set_fig(renders, 0, 99, _row_ptr(edit)) == -1
        assert lib.fd_renders_set_fig(renders, 7, 0, _row_ptr(edit)) == -1

        # scratch re-walk of the dirty root, pad to span, splice
        got = lib.fd_flatten_renders_root(scratch, renders, 0, 1)
        span_len = int(spans[1, 1] - spans[1, 0])
        assert 0 < got <= span_len
        assert lib.fd_mask_count(scratch) == 0
        assert lib.fd_item_count(scratch) <= 1
        lib.fd_pad_rows(scratch, span_len - got)
        pf, pm = export(scratch)
        assert pf.shape[0] == span_len
        patched_f = fields.copy()
        patched_m = modes.copy()
        patched_f[spans[1, 0] : spans[1, 1]] = pf
        patched_m[spans[1, 0] : spans[1, 1]] = pm

        # reference: full re-flatten of the edited scene
        lib.fd_reset(ctx, ctypes.c_float(1.0), ctypes.c_float(1.0),
                     ctypes.c_float(1.2))
        lib.fd_flatten_renders_spans(
            ctx, renders, spans.ctypes.data_as(ctypes.c_void_p),
            n_roots, reserve,
        )
        rf, rm = export(ctx)
        assert np.array_equal(patched_f, rf)
        assert np.array_equal(patched_m, rm)

        assert lib.fd_flatten_renders_root(scratch, renders, 0, 99) == -1
        assert lib.fd_flatten_renders_root(scratch, renders, 5, 0) == -1
    finally:
        lib.fd_renders_free(renders)
        lib.fd_destroy(ctx)
        lib.fd_destroy(scratch)


def test_capi_text_node_matches_python_scene():
    """fd_renders_add_text: a C host appending pre-shaped glyph rows and
    decoration rects renders the same tape as the Python text path (the
    reference dynlib exports text drawing the same way)."""
    from figdraw_tpu import Fig, FigKind, fill, new_renders, rect, rgba, vec2
    from figdraw_tpu.basics import fig_ui_scale
    from figdraw_tpu.nodesarray import from_renders
    from figdraw_tpu.renderer import FigRenderer
    from figdraw_tpu.text.layout import typeset
    from figdraw_tpu.text.typefaces import FigFont, load_typeface

    tid = load_typeface("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf")
    f = FigFont(typeface_id=tid, size=16.0, underline=True)
    arr = typeset(vec2(140, 24), [(f, fill(rgba(20, 20, 40, 255)), "AV fi")])

    renders = new_renders()
    renders.add_root(0, Fig(kind=FigKind.nkRectangle,
                            screen_box=rect(0, 0, 160, 60),
                            fill=fill(rgba(250, 250, 250, 255))))
    renders.add_root(0, Fig(kind=FigKind.nkText,
                            screen_box=rect(8, 8, 140, 24), text_layout=arr))
    scene = from_renders(renders)

    ren = FigRenderer(atlas_size=128, use_pallas=False)
    py_tape = ren.flatten(scene, vec2(160, 60))  # rasterizes glyphs, warm atlas
    assert py_tape.count > 3  # bg + underline + glyph quads

    # --- the same scene through the C ABI ------------------------------------
    lst = scene.layers[0]
    glyphs, trects = lst.text_view()
    bg_row = np.ascontiguousarray(lst.nodes[0])
    text_row = np.ascontiguousarray(lst.nodes[1])  # glyphs_start/count packed

    lib = native._load()
    ids, levels, rects_ = native.pack_atlas_entries(ren.atlas.entries,
                                                    ren.atlas.size)
    go = ren._glyph_offsets_pack()
    ctx = lib.fd_create(ctypes.c_float(fig_ui_scale()), ctypes.c_float(1.0),
                        ctypes.c_float(1.2))
    rend = lib.fd_renders_new()
    try:
        lib.fd_set_text_config(ctx, 0, 0, 0)
        lib.fd_set_atlas(
            ctx,
            ids.ctypes.data_as(ctypes.c_void_p),
            levels.ctypes.data_as(ctypes.c_void_p),
            rects_.ctypes.data_as(ctypes.c_void_p),
            ids.shape[0], ctypes.c_float(float(ren.atlas.size)),
        )
        if go:
            gkeys, goffs = go
            lib.fd_set_glyph_offsets(
                ctx,
                gkeys.ctypes.data_as(ctypes.c_void_p),
                goffs.ctypes.data_as(ctypes.c_void_p),
                gkeys.shape[0],
            )
        u, v = ren._white_uv()
        lib.fd_set_white_uv(ctx, ctypes.c_double(u), ctypes.c_double(v))

        assert lib.fd_renders_add_root(rend, 0, _row_ptr(bg_row)) == 0
        assert lib.fd_renders_glyph_count(rend, 0) == 0
        assert lib.fd_renders_trect_count(rend, 0) == 0
        g = np.ascontiguousarray(glyphs)
        t = np.ascontiguousarray(trects)
        lib.fd_renders_add_text(
            rend, 0,
            g.ctypes.data_as(ctypes.c_void_p), g.shape[0],
            t.ctypes.data_as(ctypes.c_void_p), t.shape[0],
        )
        assert lib.fd_renders_glyph_count(rend, 0) == g.shape[0]
        lib.fd_renders_add_root(rend, 0, _row_ptr(text_row))

        lib.fd_flatten_renders(ctx, rend)
        n = lib.fd_quad_count(ctx)
        fields = np.zeros((max(n, 1), 68), np.float32)
        modes = np.zeros((max(n, 1), 2), np.int32)
        items = np.zeros((max(lib.fd_item_count(ctx), 1), 5), np.int32)
        rc = lib.fd_export(
            ctx,
            fields.ctypes.data_as(ctypes.c_void_p),
            modes.ctypes.data_as(ctypes.c_void_p),
            fields.shape[0],
            items.ctypes.data_as(ctypes.c_void_p),
            items.shape[0],
        )
        assert rc == n
    finally:
        lib.fd_renders_free(rend)
        lib.fd_destroy(ctx)

    assert n == py_tape.count
    assert np.array_equal(py_tape.fields[:n], fields[:n])
    assert np.array_equal(py_tape.modes[:n], modes[:n])
