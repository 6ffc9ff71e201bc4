"""Renderer walk behavior via a recording backend (no device work).

Port of /root/reference/tests/ttransform.nim: elliptical corner propagation,
transform composition, bezier/arc decomposition counts, adaptive step
scaling, caps/joins, per-node AA override.
"""

import math

from figdraw_tpu import (
    BackendContext,
    Fig,
    FigFlags,
    FigKind,
    Mat3,
    RenderStroke,
    SdfMode,
    StrokeCap,
    StrokeJoin,
    TransformStyle,
    fill,
    new_renders,
    rect,
    rgba,
    set_fig_ui_scale,
    fig_ui_scale,
    vec2,
)
from figdraw_tpu.backend import DEFAULT_SDF_AA_FACTOR
from figdraw_tpu.basics import BackdropBlurStyle
from figdraw_tpu.nodes import (
    drawable_arc,
    drawable_bezier,
    drawable_ellipse,
    drawable_line,
    drawable_rect,
)
from figdraw_tpu.render import render_root


class RecordingBackend(BackendContext):
    """Records draw calls and transformed rect origins (ttransform.nim:7-122)."""

    def __init__(self):
        super().__init__()
        self.draws = []
        self.sdf_modes = []
        self.sdf_radii = []
        self.backdrop_radii = []
        self.aa_changes = []

    def _record_rect(self, r):
        top_left = self.mat.apply(vec2(r.x, r.y))
        self.draws.append(rect(top_left.x, top_left.y, r.w, r.h))

    def draw_rounded_rect_sdf(self, rect, fill, radii, mode=SdfMode.sdfModeClipAA,
                              factor=4.0, spread=0.0, shape_size=vec2(0, 0)):
        self.sdf_radii.append(radii)
        self.sdf_modes.append(mode)
        self._record_rect(rect)

    def draw_quadratic_bezier_sdf(self, rect, fill, p0, p1, p2, stroke_weight, cap):
        self._record_rect(rect)

    def draw_filled_quad(self, verts, colors):
        top_left = self.mat.apply(verts[0])
        self.draws.append(rect(top_left.x, top_left.y, 0.0, 0.0))

    def draw_backdrop_blur(self, rect, radii, blur_radius):
        self.backdrop_radii.append(radii)

    def set_sdf_aa_factor(self, aa_factor):
        if self.aa_factor == aa_factor:
            return
        self.aa_factor = aa_factor
        self.aa_changes.append(aa_factor)

    def begin_mask(self, clip_rect, radii):
        pass

    def end_mask(self):
        pass

    def pop_mask(self):
        pass


def rendered_drawable_draws(op, screen_box=None, draw_steps=0):
    if screen_box is None:
        screen_box = rect(0, 0, 300, 300)
    renders = new_renders()
    renders.add_root(0, Fig(
        kind=FigKind.nkDrawable,
        screen_box=screen_box,
        draw_stroke=RenderStroke(weight=2.0, fill=fill(rgba(255, 0, 0, 255))),
        draw_steps=draw_steps,
        draw_ops=(op,),
    ))
    ctx = RecordingBackend()
    render_root(ctx, renders)
    return ctx.draws


def test_elliptical_rectangle_corner_axes():
    renders = new_renders()
    renders.add_root(0, Fig(
        kind=FigKind.nkRectangle,
        screen_box=rect(5, 7, 40, 20),
        fill=fill(rgba(255, 0, 0, 255)),
        flags=FigFlags.NfEllipticalCorners,
        corners=(12, 10, 8, 6),
        corner_radii_y=(4, 5, 6, 7),
    ))
    ctx = RecordingBackend()
    render_root(ctx, renders)
    assert len(ctx.sdf_radii) == 1
    assert ctx.sdf_radii[0].x == (12.0, 10.0, 8.0, 6.0)
    assert ctx.sdf_radii[0].y == (4.0, 5.0, 6.0, 7.0)


def test_circular_corners_promote_to_equal_axes():
    renders = new_renders()
    renders.add_root(0, Fig(
        kind=FigKind.nkRectangle,
        screen_box=rect(5, 7, 40, 20),
        fill=fill(rgba(255, 0, 0, 255)),
        corners=(12, 10, 8, 6),
    ))
    ctx = RecordingBackend()
    render_root(ctx, renders)
    assert len(ctx.sdf_radii) == 1
    assert ctx.sdf_radii[0].x == ctx.sdf_radii[0].y


def test_backdrop_blur_gets_elliptical_corners():
    renders = new_renders()
    renders.add_root(0, Fig(
        kind=FigKind.nkBackdropBlur,
        flags=FigFlags.NfEllipticalCorners,
        screen_box=rect(5, 7, 40, 20),
        corners=(12, 10, 8, 6),
        corner_radii_y=(4, 5, 6, 7),
        backdrop_blur=BackdropBlurStyle(blur=10.0),
    ))
    ctx = RecordingBackend()
    render_root(ctx, renders)
    assert len(ctx.backdrop_radii) == 1
    assert ctx.backdrop_radii[0].x == (12.0, 10.0, 8.0, 6.0)
    assert ctx.backdrop_radii[0].y == (4.0, 5.0, 6.0, 7.0)


def test_translation_applies_to_children():
    renders = new_renders()
    root = renders.add_root(0, Fig(
        kind=FigKind.nkTransform,
        transform=TransformStyle(translation=vec2(5.0, -4.0)),
    ))
    renders.add_child(0, root, Fig(
        kind=FigKind.nkDrawable,
        screen_box=rect(0, 0, 1, 1),
        fill=fill(rgba(255, 0, 0, 255)),
        draw_ops=(drawable_rect(rect(2, 2, 1, 1)),),
    ))
    ctx = RecordingBackend()
    render_root(ctx, renders)
    assert len(ctx.draws) == 1
    assert abs(ctx.draws[0].x - 7.0) < 1e-4
    assert abs(ctx.draws[0].y - (-2.0)) < 1e-4


def test_matrix_transform_applies_to_children():
    renders = new_renders()
    root = renders.add_root(0, Fig(
        kind=FigKind.nkTransform,
        transform=TransformStyle(
            translation=vec2(10.0, 20.0),
            matrix=Mat3.scaling(2.0, 3.0),
        ),
    ))
    renders.add_child(0, root, Fig(
        kind=FigKind.nkDrawable,
        screen_box=rect(0, 0, 1, 1),
        fill=fill(rgba(255, 0, 0, 255)),
        draw_ops=(drawable_rect(rect(2, 2, 1, 1)),),
    ))
    ctx = RecordingBackend()
    render_root(ctx, renders)
    assert len(ctx.draws) == 1
    assert abs(ctx.draws[0].x - 14.0) < 1e-4
    assert abs(ctx.draws[0].y - 26.0) < 1e-4


def test_quadratic_bezier_is_one_sdf_op():
    draws = rendered_drawable_draws(
        drawable_bezier([vec2(0, 0), vec2(10, 20), vec2(20, 0)], steps=4),
        screen_box=rect(5, 7, 30, 20),
    )
    assert len(draws) == 1


def test_round_capped_line_has_endpoint_caps():
    renders = new_renders()
    renders.add_root(0, Fig(
        kind=FigKind.nkDrawable,
        screen_box=rect(5, 7, 30, 20),
        draw_stroke=RenderStroke(weight=2.0, fill=fill(rgba(255, 0, 0, 255)),
                                 cap=StrokeCap.scRound),
        draw_ops=(drawable_line(vec2(0, 0), vec2(10, 0)),),
    ))
    ctx = RecordingBackend()
    render_root(ctx, renders)
    assert len(ctx.draws) == 3


def test_square_capped_line_is_one_extended_segment():
    renders = new_renders()
    renders.add_root(0, Fig(
        kind=FigKind.nkDrawable,
        screen_box=rect(5, 7, 30, 20),
        draw_stroke=RenderStroke(weight=2.0, fill=fill(rgba(255, 0, 0, 255)),
                                 cap=StrokeCap.scSquare),
        draw_ops=(drawable_line(vec2(0, 0), vec2(10, 0)),),
    ))
    ctx = RecordingBackend()
    render_root(ctx, renders)
    assert len(ctx.draws) == 1


def test_higher_order_bezier_decomposes_into_quadratic_spans():
    draws = rendered_drawable_draws(
        drawable_bezier(
            [vec2(0, 0), vec2(10, 20), vec2(20, -10), vec2(30, 0)], steps=4
        ),
        screen_box=rect(5, 7, 30, 20),
    )
    assert len(draws) == 4


def test_adaptive_cubic_decomposition_scales_with_screen_size():
    small = rendered_drawable_draws(
        drawable_bezier([vec2(0, 0), vec2(4, 20), vec2(8, -20), vec2(12, 0)])
    )
    large = rendered_drawable_draws(
        drawable_bezier([vec2(0, 0), vec2(40, 200), vec2(80, -200), vec2(120, 0)])
    )
    assert len(small) > 0
    assert len(large) > len(small)


def test_arc_renders_as_quadratic_spans():
    draws = rendered_drawable_draws(
        drawable_arc(vec2(10, 10), 8.0, 0.0, math.pi / 2, steps=4),
        screen_box=rect(5, 7, 30, 20),
    )
    assert len(draws) == 4


def test_adaptive_arc_decomposition_scales_with_screen_size():
    small = rendered_drawable_draws(drawable_arc(vec2(16, 16), 8.0, 0.0, math.pi))
    large = rendered_drawable_draws(drawable_arc(vec2(90, 90), 80.0, 0.0, math.pi))
    assert len(small) > 0
    assert len(large) > len(small)


def test_ellipse_fill_and_stroke_with_elliptical_corners():
    renders = new_renders()
    renders.add_root(0, Fig(
        kind=FigKind.nkDrawable,
        screen_box=rect(5, 7, 30, 20),
        fill=fill(rgba(20, 40, 80, 255)),
        draw_stroke=RenderStroke(weight=2.0, fill=fill(rgba(255, 0, 0, 255))),
        draw_ops=(drawable_ellipse(vec2(10, 8), vec2(6.25, 3.5)),),
    ))
    ctx = RecordingBackend()
    render_root(ctx, renders)
    assert len(ctx.draws) == 2
    assert ctx.sdf_modes == [SdfMode.sdfModeClipAA, SdfMode.sdfModeAnnularAA]
    for radii in ctx.sdf_radii:
        assert radii.x == (6.25, 6.25, 6.25, 6.25)
        assert radii.y == (3.5, 3.5, 3.5, 3.5)
    assert abs(ctx.draws[0].x - 8.75) < 1e-4
    assert abs(ctx.draws[0].y - 11.5) < 1e-4
    assert abs(ctx.draws[0].w - 12.5) < 1e-4
    assert abs(ctx.draws[0].h - 7.0) < 1e-4


def test_zero_radius_ellipse_is_ignored():
    assert rendered_drawable_draws(
        drawable_ellipse(vec2(10, 10), vec2(8.0, 0.0))
    ) == []


def test_bevel_joins_for_decomposed_arc():
    renders = new_renders()
    renders.add_root(0, Fig(
        kind=FigKind.nkDrawable,
        screen_box=rect(5, 7, 30, 20),
        draw_stroke=RenderStroke(weight=2.0, fill=fill(rgba(255, 0, 0, 255)),
                                 cap=StrokeCap.scButt, join=StrokeJoin.sjBevel),
        draw_ops=(drawable_arc(vec2(10, 10), 8.0, 0.0, math.pi / 2, steps=4),),
    ))
    ctx = RecordingBackend()
    render_root(ctx, renders)
    assert len(ctx.draws) == 7


def test_node_steps_default_for_curve_ops():
    renders = new_renders()
    renders.add_root(0, Fig(
        kind=FigKind.nkDrawable,
        screen_box=rect(5, 7, 40, 30),
        draw_stroke=RenderStroke(weight=2.0, fill=fill(rgba(255, 0, 0, 255))),
        draw_steps=4,
        draw_ops=(
            drawable_bezier([vec2(0, 0), vec2(10, 20), vec2(20, 0)]),
            drawable_arc(vec2(20, 10), 8.0, 0.0, math.pi / 2, steps=2),
        ),
    ))
    ctx = RecordingBackend()
    render_root(ctx, renders)
    assert len(ctx.draws) == 3


def test_quadratic_sdf_padding_in_physical_pixels():
    old = fig_ui_scale()
    set_fig_ui_scale(2.0)
    try:
        draws = rendered_drawable_draws(
            drawable_bezier([vec2(0, 0), vec2(10, 10), vec2(20, 0)])
        )
        assert len(draws) == 1
        assert abs(draws[0].w - 48.0) < 1e-4
        assert abs(draws[0].h - 18.0) < 1e-4
    finally:
        set_fig_ui_scale(old)


def test_drawable_aa_overrides_and_restores():
    renders = new_renders()
    renders.add_root(0, Fig(
        kind=FigKind.nkDrawable,
        screen_box=rect(5, 7, 40, 30),
        fill=fill(rgba(255, 0, 0, 255)),
        draw_aa=0.75,
        draw_ops=(drawable_rect(rect(2, 3, 10, 8)),),
    ))
    ctx = RecordingBackend()
    render_root(ctx, renders)
    assert len(ctx.draws) == 1
    assert len(ctx.aa_changes) == 2
    assert abs(ctx.aa_changes[0] - 0.75) < 1e-4
    assert abs(ctx.aa_changes[1] - DEFAULT_SDF_AA_FACTOR) < 1e-4
    assert abs(ctx.aa_factor - DEFAULT_SDF_AA_FACTOR) < 1e-4
