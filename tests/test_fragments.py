"""RenderFragments API invariants.

Port of /root/reference/tests/trenderfragments.nim: fragment inserts keep
base indexes stable, traversal metadata survives physical inserts, nested
cursors, in-place fragment replacement, render-walk over fragments.
"""

from figdraw_tpu import (
    BackendContext,
    Fig,
    FigKind,
    RenderFragments,
    SdfMode,
    TransformStyle,
    fill,
    new_renders,
    rect,
    rgba,
    vec2,
)
from figdraw_tpu.nodes import RenderList
from figdraw_tpu.render import render_root


def make_fig(node_id: int, zlevel: int = 0) -> Fig:
    return Fig(kind=FigKind.nkRectangle, zlevel=zlevel, rotation=float(node_id))


def node_id(node: Fig) -> int:
    return int(node.rotation)


def child_ids(fragments: RenderFragments, parent):
    return [node_id(fragments.node_at(c)) for c in fragments.children(parent)]


def root_cursors(fragments: RenderFragments, zlevel: int):
    return list(fragments.roots(zlevel))


class RecordingBackend(BackendContext):
    def __init__(self):
        super().__init__()
        self.draws = []

    def draw_rounded_rect_sdf(self, rect, fill, radii, mode=SdfMode.sdfModeClipAA,
                              factor=4.0, spread=0.0, shape_size=vec2(0, 0)):
        top_left = self.mat.apply(vec2(rect.x, rect.y))
        from figdraw_tpu.geometry import Rect

        self.draws.append(Rect(top_left.x, top_left.y, rect.w, rect.h))


def test_insert_fragment_roots_keeps_base_physical_indexes():
    fragments = RenderFragments()
    root = fragments.add_root(0, make_fig(10))
    fragments.add_child((0, root), make_fig(40))

    children = RenderList()
    child_root = children.add_root(make_fig(20))
    children.add_child(child_root, make_fig(21))
    children.add_root(make_fig(30))

    inserted = fragments.insert_children((0, root), children, 0)
    roots = root_cursors(fragments, 0)

    assert [node_id(n) for n in fragments[0].nodes] == [10, 40]
    assert len(inserted) == 2
    assert node_id(fragments.node_at(inserted[0])) == 20
    assert node_id(fragments.node_at(inserted[1])) == 30
    assert child_ids(fragments, roots[0]) == [20, 30, 40]
    assert child_ids(fragments, inserted[0]) == [21]
    assert fragments.effective_child_count(roots[0]) == 3
    assert fragments[0].nodes[root].child_count == 1


def test_physical_inserts_keep_fragment_metadata_synchronized():
    fragments = RenderFragments()
    root = fragments.add_root(0, make_fig(10))
    fragments.add_child((0, root), make_fig(11))
    fragments.add_child((0, root), make_fig(13))

    child = RenderList()
    child.add_root(make_fig(20))
    fragments.insert_children((0, root), child, 1)
    fragments.insert_child((0, root), make_fig(12), 2)
    fragments.insert_root(0, make_fig(5), 0)

    roots = root_cursors(fragments, 0)
    assert [node_id(fragments.node_at(r)) for r in roots] == [5, 10]
    assert child_ids(fragments, roots[1]) == [11, 20, 12, 13]


def test_nested_cursor_insert_and_append_overloads():
    fragments = RenderFragments()
    root = fragments.add_root(0, make_fig(10))

    children = RenderList()
    child_root = children.add_root(make_fig(20))
    children.add_child(child_root, make_fig(21))
    inserted = fragments.insert_children((0, root), children, 0)

    nested = RenderList()
    nested.add_root(make_fig(22))
    fragments.insert_children(inserted[0], nested, 1)
    appended = fragments.add_child(inserted[0], make_fig(23))

    assert node_id(fragments.node_at(appended)) == 23
    assert child_ids(fragments, inserted[0]) == [21, 22, 23]


def test_update_fragment_preserves_position():
    fragments = RenderFragments()
    root = fragments.add_root(5, make_fig(10))
    fragments.add_child((5, root), make_fig(40))

    initial = RenderList()
    initial.add_root(make_fig(20))
    initial.add_root(make_fig(30))
    inserted = fragments.insert_children((5, root), initial, 0)

    updated = RenderList()
    updated_root = updated.add_root(make_fig(50, 1))
    updated.add_child(updated_root, make_fig(51, 1))
    updated.add_root(make_fig(60, 1))
    replacement = fragments.update_fragment(inserted[0], updated)

    roots = root_cursors(fragments, 5)
    assert len(replacement) == 2
    assert child_ids(fragments, roots[0]) == [50, 60, 40]
    assert child_ids(fragments, replacement[0]) == [51]
    assert fragments.node_at(replacement[0]).zlevel == 5
    assert fragments.node_at(replacement[1]).zlevel == 5
    assert [node_id(n) for n in fragments[5].nodes] == [10, 40]


def test_update_nested_fragment_through_cursor():
    fragments = RenderFragments()
    root = fragments.add_root(0, make_fig(10))

    parent_list = RenderList()
    parent_list.add_root(make_fig(20))
    parent = fragments.insert_children((0, root), parent_list, 0)[0]

    nested_list = RenderList()
    nested_list.add_root(make_fig(30))
    nested = fragments.insert_children(parent, nested_list, 0)[0]

    updated = RenderList()
    updated.add_root(make_fig(31))
    updated.add_root(make_fig(32))
    replacement = fragments.update_fragment(nested, updated)

    assert len(replacement) == 2
    assert child_ids(fragments, parent) == [31, 32]


def test_renderer_traverses_transform_fragments():
    fragments = RenderFragments()
    root = fragments.add_root(0, Fig(
        kind=FigKind.nkTransform,
        transform=TransformStyle(translation=vec2(5.0, -4.0)),
    ))
    child = RenderList()
    child.add_root(Fig(
        kind=FigKind.nkRectangle,
        screen_box=rect(2, 2, 1, 1),
        fill=fill(rgba(255, 0, 0, 255)),
    ))
    fragments.insert_children((0, root), child, 0)

    ctx = RecordingBackend()
    render_root(ctx, fragments)
    assert len(ctx.draws) == 1
    assert abs(ctx.draws[0].x - 7.0) < 1e-4
    assert abs(ctx.draws[0].y - (-2.0)) < 1e-4


def test_wraps_unchanged_renders():
    renders = new_renders()
    root = renders.add_root(2, make_fig(10))
    renders.add_child(2, root, make_fig(11))

    fragments = RenderFragments(renders)
    roots = root_cursors(fragments, 2)

    assert child_ids(fragments, roots[0]) == [11]
    assert [node_id(n) for n in renders[2].nodes] == [10, 11]
