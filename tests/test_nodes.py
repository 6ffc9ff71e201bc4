"""RenderList helper API invariants.

Port of /root/reference/tests/tfignodes_helpers.nim — same scenarios, same
expected index remapping.
"""

from figdraw_tpu import (
    Fig,
    FigKind,
    FigFlags,
    RenderList,
    init_corner_radii_2d,
    new_renders,
)


def make_fig(node_id: int, zlevel: int = 0) -> Fig:
    return Fig(kind=FigKind.nkRectangle, zlevel=zlevel, rotation=float(node_id))


def node_id(node: Fig) -> int:
    return int(node.rotation)


def child_ids(lst: RenderList, parent_idx: int):
    return [node_id(lst.nodes[i]) for i in lst.child_index(parent_idx)]


def test_corner_radii_2d_detects_circular_and_elliptical():
    circular = init_corner_radii_2d([4, 6, 8, 10])
    elliptical = init_corner_radii_2d([4, 6, 8, 10], [2, 3, 4, 5])
    assert circular.is_circular
    assert circular.x == circular.y
    assert not elliptical.is_circular


def test_elliptical_corner_fields():
    node = Fig(
        kind=FigKind.nkBackdropBlur,
        flags=FigFlags.NfEllipticalCorners,
        corners=(8, 7, 6, 5),
        corner_radii_y=(4, 3, 2, 1),
    )
    assert FigFlags.NfEllipticalCorners in node.flags
    assert node.corner_radii_y == (4, 3, 2, 1)


def test_insert_root_shifts_existing_root_and_parent_indexes():
    lst = RenderList()
    root_a = lst.add_root(make_fig(10))
    lst.add_child(root_a, make_fig(11))
    lst.add_root(make_fig(20))

    inserted = lst.insert_root(make_fig(15), 1)

    assert inserted == 2
    assert lst.root_ids == [0, 2, 3]
    assert [node_id(n) for n in lst.nodes] == [10, 11, 15, 20]
    assert lst.nodes[1].parent == 0
    assert lst.nodes[2].parent == -1
    assert lst.nodes[3].parent == -1
    assert lst.nodes[0].child_count == 1
    assert lst.nodes[2].child_count == 0


def test_insert_child_inserts_at_position_and_shifts_subtree_parents():
    lst = RenderList()
    root = lst.add_root(make_fig(10))
    lst.add_child(root, make_fig(11))
    old_second = lst.add_child(root, make_fig(13))
    lst.add_child(old_second, make_fig(14))

    inserted = lst.insert_child(root, make_fig(12), 1)

    assert inserted == 2
    assert [node_id(n) for n in lst.nodes] == [10, 11, 12, 13, 14]
    assert child_ids(lst, root) == [11, 12, 13]
    assert lst.nodes[3].parent == root
    assert lst.nodes[4].parent == 3
    assert lst.nodes[0].child_count == 3
    assert lst.nodes[2].child_count == 0
    assert lst.nodes[3].child_count == 1


def test_insert_children_remaps_incoming_roots_and_internal_parents():
    lst = RenderList()
    root = lst.add_root(make_fig(10))
    lst.add_child(root, make_fig(40))

    children = RenderList()
    child_root = children.add_root(make_fig(20))
    children.add_child(child_root, make_fig(21))
    children.add_root(make_fig(30))

    inserted = lst.insert_children(root, children, 0)

    assert inserted == [1, 3]
    assert [node_id(n) for n in lst.nodes] == [10, 20, 21, 30, 40]
    assert child_ids(lst, root) == [20, 30, 40]
    assert lst.nodes[1].parent == root
    assert lst.nodes[2].parent == 1
    assert lst.nodes[3].parent == root
    assert lst.nodes[4].parent == root
    assert lst.nodes[0].child_count == 3
    assert lst.nodes[1].child_count == 1


def test_renders_add_children_forces_layer_zlevel():
    renders = new_renders()
    root = renders.add_root(5, make_fig(10, 1))

    children = RenderList()
    child_root = children.add_root(make_fig(20, 9))
    children.add_child(child_root, make_fig(21, 9))

    inserted = renders.add_children(5, root, children)

    assert inserted == [1]
    assert renders[5].nodes[0].zlevel == 5
    assert renders[5].nodes[1].zlevel == 5
    assert renders[5].nodes[2].zlevel == 5
    assert renders[5].nodes[0].child_count == 1
    assert renders[5].nodes[1].child_count == 1


def test_renders_accessor_creates_mutable_layer():
    renders = new_renders()
    renders[4].add_root(make_fig(10, 4))
    assert renders.len(4) == 1
    assert node_id(renders[4].nodes[0]) == 10


def test_set_layer_installs_complete_render_list():
    lst = RenderList()
    lst.add_root(make_fig(10, 3))
    renders = new_renders()
    renders.set_layer(3, lst)
    assert renders.len(3) == 1
    assert node_id(renders[3].nodes[0]) == 10
