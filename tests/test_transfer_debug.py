"""transfer.copy_into zlevel splitting + debugtools visibility/hit testing.

Behavior ports of /root/reference/tests/ttransfer.nim and tdebugtools.nim.
"""

from dataclasses import dataclass, field
from typing import List

from figdraw_tpu import Fig, FigFlags, FigKind, fill, new_renders, rect, rgba, vec2
from figdraw_tpu.debugtools import (
    FigLocation,
    FigVisibilityReason,
    color_at,
    fig_visibility,
    hits_at_point,
    top_fig_at_point,
)
from figdraw_tpu.nodes import RenderList
from figdraw_tpu.transfer import copy_into, to_tree


@dataclass
class UserNode:
    """Duck-typed app node for copy_into."""

    kind: FigKind = FigKind.nkRectangle
    zlevel: int = 0
    screen_box: object = None
    flags: FigFlags = FigFlags(0)
    rotation: float = 0.0
    fill: object = None
    children: List["UserNode"] = field(default_factory=list)

    def __post_init__(self):
        if self.screen_box is None:
            self.screen_box = rect(0, 0, 10, 10)
        if self.fill is None:
            self.fill = fill(rgba(255, 0, 0, 255))


def test_copy_into_splits_zlevels_into_roots():
    tree = UserNode(
        rotation=1.0,
        children=[
            UserNode(rotation=2.0),
            UserNode(rotation=3.0, zlevel=1, children=[UserNode(rotation=4.0, zlevel=1)]),
            UserNode(rotation=5.0),
        ],
    )
    renders = copy_into(tree)
    # same-zlevel children stay children; zlevel-1 subtree becomes a new root
    assert sorted(renders.layers.keys()) == [0, 1]
    l0 = renders[0]
    assert [int(n.rotation) for n in l0.nodes] == [1, 2, 5]
    assert l0.nodes[0].child_count == 2
    l1 = renders[1]
    assert [int(n.rotation) for n in l1.nodes] == [3, 4]
    assert l1.root_ids == [0]
    assert l1.nodes[1].parent == 0


def test_copy_into_skips_inactive():
    tree = UserNode(
        rotation=1.0,
        children=[UserNode(rotation=2.0, flags=FigFlags.NfInactive)],
    )
    renders = copy_into(tree)
    assert len(renders[0].nodes) == 1


def test_to_tree_structure():
    lst = RenderList()
    root = lst.add_root(Fig(kind=FigKind.nkRectangle))
    lst.add_child(root, Fig(kind=FigKind.nkRectangle))
    child2 = lst.add_child(root, Fig(kind=FigKind.nkRectangle))
    lst.add_child(child2, Fig(kind=FigKind.nkRectangle))
    tree = to_tree(lst)
    assert len(tree.children) == 1
    assert len(tree.children[0].children) == 2
    assert len(tree.children[0].children[1].children) == 1


def make_rect_fig(x, y, w, h, alpha=255, **kw):
    return Fig(
        kind=FigKind.nkRectangle,
        screen_box=rect(x, y, w, h),
        fill=fill(rgba(100, 100, 100, alpha)),
        **kw,
    )


def test_visibility_basic_and_disabled():
    renders = new_renders()
    idx = renders.add_root(0, make_rect_fig(0, 0, 50, 50))
    vis = fig_visibility(renders, 0, idx)
    assert vis.visible and vis.reason == FigVisibilityReason.fvVisible

    renders2 = new_renders()
    idx2 = renders2.add_root(0, make_rect_fig(0, 0, 50, 50, flags=FigFlags.NfDisableRender))
    vis2 = fig_visibility(renders2, 0, idx2)
    assert not vis2.visible and vis2.reason == FigVisibilityReason.fvDisabled


def test_visibility_clipped_out():
    renders = new_renders()
    parent = renders.add_root(
        0, make_rect_fig(0, 0, 20, 20, flags=FigFlags.NfClipContent)
    )
    child = renders.add_child(0, parent, make_rect_fig(100, 100, 10, 10))
    vis = fig_visibility(renders, 0, child)
    assert not vis.visible and vis.reason == FigVisibilityReason.fvClippedOut


def test_visibility_covered_by_opaque_rect():
    renders = new_renders()
    target = renders.add_root(0, make_rect_fig(10, 10, 20, 20))
    cover = renders.add_root(0, make_rect_fig(0, 0, 100, 100, alpha=255))
    vis = fig_visibility(renders, 0, target)
    assert not vis.visible and vis.reason == FigVisibilityReason.fvCovered
    assert vis.covered_by == FigLocation(zlevel=0, index=cover)

    # translucent cover does not occlude
    renders2 = new_renders()
    target2 = renders2.add_root(0, make_rect_fig(10, 10, 20, 20))
    renders2.add_root(0, make_rect_fig(0, 0, 100, 100, alpha=100))
    assert fig_visibility(renders2, 0, target2).visible


def test_hits_at_point_order():
    renders = new_renders()
    a = renders.add_root(0, make_rect_fig(0, 0, 50, 50))
    b = renders.add_root(0, make_rect_fig(10, 10, 50, 50))
    hits = hits_at_point(renders, vec2(20, 20))
    assert [h.location.index for h in hits] == [a, b]
    top = top_fig_at_point(renders, vec2(20, 20))
    assert top.location.index == b
    assert top_fig_at_point(renders, vec2(200, 200)) is None


def test_color_at_on_rendered_frame():
    import numpy as np

    img = np.zeros((4, 4, 4), dtype=np.uint8)
    img[2, 3] = (10, 20, 30, 40)
    c = color_at(img, 3, 2)
    assert (c.r, c.g, c.b, c.a) == (10, 20, 30, 40)
    c2 = color_at(img, vec2(3.7, 2.2))
    assert (c2.r, c2.g, c2.b, c2.a) == (10, 20, 30, 40)
    assert color_at(img, 10, 10).a == 0
