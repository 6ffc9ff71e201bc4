"""Device-resident per-root animation (render_view's root_transforms).

The tape uploads once (snapshot_scene); per frame only a (roots, 6) affine
table travels and executor.animate_rows applies p' = M·p + t per root span
inside the jitted executor — the generalization of the whole-tape camera
(view_rows) that removes the host C walk from affine animation entirely.

Contract (mirrors test_camera's): integer per-root translations and
power-of-two axis-aligned scales of integer axis-aligned roots equal a host
re-flatten of the scene with each animated root wrapped in the equivalent
nkTransform BIT-exactly (ceil snapping commutes with integer affine maps).
Rotations/fractional affines keep the baked vertex snapping and are
float-rounding approximate. Untouched roots, padding and the meta tail are
never disturbed; the camera composes on top; the bulk (R, 6) array form
equals the dict form; deferred retained patches fuse into the animated
dispatch.
"""

import numpy as np
import pytest

# heavyweight end-to-end frame-loop suite: excluded by `./ci.sh fast` (-m 'not slow')
pytestmark = pytest.mark.slow

from figdraw_tpu import (
    Fig, FigFlags, FigKind, fill, new_renders, rect, rgba, root_affine, vec2,
)
from figdraw_tpu.basics import TransformStyle
from figdraw_tpu.geometry import Mat3
from figdraw_tpu.nodesarray import from_renders
from figdraw_tpu.renderer import FigRenderer


def _wrap_transform(renders, aff):
    """An nkTransform root applying p' = M·p + t — the reference way to
    move a subtree (re-walk under a transform) that root_transforms must
    reproduce."""
    a, b, c, d, tx, ty = [float(v) for v in aff]
    return renders.add_root(0, Fig(
        kind=FigKind.nkTransform,
        transform=TransformStyle(translation=vec2(tx, ty),
                                 matrix=Mat3(a, b, 0.0, c, d, 0.0)),
    ))


def boxes_roots(n=12, wrap=None):
    """n axis-aligned integer box roots. wrap: {i: (6,) affine} builds the
    comparison scene with box i under the equivalent nkTransform. Returns
    (scene, base_root_keys)."""
    renders = new_renders()
    keys = []
    for i in range(n):
        f = Fig(
            kind=FigKind.nkRectangle,
            screen_box=rect(8 + (i % 4) * 42, 6 + (i // 4) * 38, 30, 24),
            corners=(5,) * 4,
            fill=fill(rgba(40 + i * 10, (i * 53) % 255, 180, 160)),
        )
        if wrap and i in wrap:
            tr = _wrap_transform(renders, wrap[i])
            renders.add_child(0, tr, f)
            keys.append(tr)
        else:
            keys.append(renders.add_root(0, f))
    return from_renders(renders), keys


def clip_roots(rows=3, cols=3, wrap=None):
    """Clip cells (real mask planes) with overflowing children — the
    mask-involved case the PATCH path refuses but animation supports
    (the whole span, mask-write quads included, moves together)."""
    renders = new_renders()
    keys = []
    i = 0
    for r in range(rows):
        for c in range(cols):
            cell = Fig(
                kind=FigKind.nkRectangle,
                screen_box=rect(10 + c * 56, 8 + r * 44, 44, 32),
                corners=(6,) * 4, flags=FigFlags.NfClipContent,
                fill=fill(rgba(210 - r * 12, 70 + c * 25, 130, 255)),
            )
            if wrap and i in wrap:
                tr = _wrap_transform(renders, wrap[i])
                ci = renders.add_child(0, tr, cell)
                keys.append(tr)
            else:
                ci = renders.add_root(0, cell)
                keys.append(ci)
            renders.add_child(0, ci, Fig(
                kind=FigKind.nkRectangle,
                screen_box=rect(-12, -12, 320, 320),
                fill=fill(rgba(30, 40, 220, 110)),
            ))
            i += 1
    return from_renders(renders), keys


def rectmask_roots(rows=3, cols=3, wrap=None):
    """NfRectMaskContent cells (the rect-mask fast path, wire cols 42-49)
    with overflowing children — exercises the screen→local row composition
    with M⁻¹ and the translation re-derivation."""
    renders = new_renders()
    keys = []
    i = 0
    for r in range(rows):
        for c in range(cols):
            cell = Fig(
                kind=FigKind.nkRectangle,
                screen_box=rect(8 + c * 52, 6 + r * 40, 42, 28),
                corners=(7,) * 4, flags=FigFlags.NfRectMaskContent,
                fill=fill(rgba(200 - r * 20, 80 + c * 30, 140, 255)),
            )
            if wrap and i in wrap:
                tr = _wrap_transform(renders, wrap[i])
                ci = renders.add_child(0, tr, cell)
                keys.append(tr)
            else:
                ci = renders.add_root(0, cell)
                keys.append(ci)
            renders.add_child(0, ci, Fig(
                kind=FigKind.nkRectangle,
                screen_box=rect(-20, -20, 400, 400),
                fill=fill(rgba(30, 40, 220, 110)),
            ))
            i += 1
    return from_renders(renders), keys


def T(dx, dy):
    return np.asarray((1.0, 0.0, 0.0, 1.0, float(dx), float(dy)), np.float32)


def S(s, dx=0.0, dy=0.0):
    return np.asarray((float(s), 0.0, 0.0, float(s), float(dx), float(dy)),
                      np.float32)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_integer_translate_bit_exact(use_pallas):
    size = vec2(208, 168)
    moves = {1: T(12, 0), 4: T(0, -10), 7: T(-9, 13), 10: T(25, 25)}
    anim = FigRenderer(atlas_size=64, use_pallas=use_pallas)
    ref = FigRenderer(atlas_size=64, use_pallas=use_pallas)
    base, keys = boxes_roots()
    scene = anim.snapshot_scene(base, size)
    wrapped, _ = boxes_roots(wrap=moves)
    view = np.asarray(anim.render_view(
        scene, root_transforms={keys[i]: m for i, m in moves.items()}))
    expect = np.asarray(ref.render_frame(wrapped, size))
    np.testing.assert_array_equal(view, expect)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_pow2_scale_bit_exact(use_pallas):
    """Power-of-two per-root scales (about the scene origin and with an
    integer translation folded in) reproduce the wrapped re-walk exactly —
    inverse-affine entries, determinants and bbox corners all scale by
    exact powers of two."""
    size = vec2(416, 352)
    moves = {0: S(2), 5: S(2, 16, 8), 9: S(0.5, 40, 120)}
    anim = FigRenderer(atlas_size=64, use_pallas=use_pallas)
    ref = FigRenderer(atlas_size=64, use_pallas=use_pallas)
    base, keys = boxes_roots()
    scene = anim.snapshot_scene(base, size)
    wrapped, _ = boxes_roots(wrap=moves)
    view = np.asarray(anim.render_view(
        scene, root_transforms={keys[i]: m for i, m in moves.items()}))
    expect = np.asarray(ref.render_frame(wrapped, size))
    np.testing.assert_array_equal(view, expect)


def test_clip_roots_animate_bit_exact():
    """Clip cells (mask planes) move WITH their contents: the animation
    span covers the mask-write quads too. snapshot(animate=True) keeps the
    scene off the sentinel-interleaved mega layout."""
    size = vec2(224, 176)
    moves = {0: T(14, 6), 4: T(-8, 10)}
    anim = FigRenderer(atlas_size=64, use_pallas=True)
    ref = FigRenderer(atlas_size=64, use_pallas=True)
    base, keys = clip_roots()
    scene = anim.snapshot_scene(base, size, animate=True)
    assert scene.kind != "mega"
    wrapped, _ = clip_roots(wrap=moves)
    view = np.asarray(anim.render_view(
        scene, root_transforms={keys[i]: m for i, m in moves.items()}))
    expect = np.asarray(ref.render_frame(wrapped, size))
    np.testing.assert_array_equal(view, expect)
    assert anim.use_pallas  # no silent downgrade


def test_rect_mask_roots_translate_bit_exact():
    size = vec2(208, 168)
    moves = {1: T(10, -4), 6: T(-6, 12)}
    anim = FigRenderer(atlas_size=64, use_pallas=False)
    ref = FigRenderer(atlas_size=64, use_pallas=False)
    base, keys = rectmask_roots()
    scene = anim.snapshot_scene(base, size)
    wrapped, _ = rectmask_roots(wrap=moves)
    view = np.asarray(anim.render_view(
        scene, root_transforms={keys[i]: m for i, m in moves.items()}))
    expect = np.asarray(ref.render_frame(wrapped, size))
    np.testing.assert_array_equal(view, expect)


def test_mega_mask_scene_requires_animate_flag():
    """A mask-bearing mega snapshot has no per-root row mapping (clear
    sentinels interleave) — root_transforms must refuse loudly, and the
    animate=True snapshot of the same scene must work."""
    size = vec2(224, 176)
    r = FigRenderer(atlas_size=64, use_pallas=True)
    base, keys = clip_roots()
    scene = r.snapshot_scene(base, size)
    assert scene.kind == "mega"
    with pytest.raises(ValueError, match="animate=True"):
        r.render_view(scene, root_transforms={keys[0]: T(5, 5)})


def test_identity_table_is_plain_view_and_round_trip():
    """An all-identity table renders bit-identically to the plain view
    (padding, sentinels and untouched roots byte-stable), on both the dict
    and bulk-array forms; and a real animation leaves the resident combo
    unmodified (functional transform — the next plain view is the base)."""
    size = vec2(208, 168)
    r = FigRenderer(atlas_size=64, use_pallas=True)
    base, keys = boxes_roots()
    scene = r.snapshot_scene(base, size)
    plain = np.asarray(r.render_view(scene))
    ident_dict = np.asarray(r.render_view(scene, root_transforms={}))
    np.testing.assert_array_equal(ident_dict, plain)
    n = len(scene.anim_order)
    bulk = np.zeros((n, 6), np.float32)
    bulk[:, 0] = 1.0
    bulk[:, 3] = 1.0
    ident_bulk = np.asarray(r.render_view(scene, root_transforms=bulk))
    np.testing.assert_array_equal(ident_bulk, plain)
    moved = np.asarray(r.render_view(
        scene, root_transforms={keys[2]: T(30, 18)}))
    assert not np.array_equal(moved, plain)
    again = np.asarray(r.render_view(scene))
    np.testing.assert_array_equal(again, plain)


def test_bulk_array_equals_dict():
    size = vec2(208, 168)
    r = FigRenderer(atlas_size=64, use_pallas=True)
    base, keys = boxes_roots()
    scene = r.snapshot_scene(base, size)
    moves = {keys[1]: T(7, -3), keys[8]: S(2, 4, 4)}
    via_dict = np.asarray(r.render_view(scene, root_transforms=moves))
    n = len(scene.anim_order)
    bulk = np.zeros((n, 6), np.float32)
    bulk[:, 0] = 1.0
    bulk[:, 3] = 1.0
    slot = scene.anim_slot
    for k, m in moves.items():
        bulk[slot[(0, k)]] = m
    via_bulk = np.asarray(r.render_view(scene, root_transforms=bulk))
    np.testing.assert_array_equal(via_bulk, via_dict)


def test_anim_composes_with_camera_bit_exact():
    """Integer per-root translate under an integer pan + pow-2 zoom equals
    the wrapped re-walk under the same nkTransform camera root — animation
    applies in scene space, the camera on top (p'' = z·(M·p + t) + d)."""
    size = vec2(416, 336)
    moves = {3: T(11, 7), 6: T(-5, 9)}
    anim = FigRenderer(atlas_size=64, use_pallas=True)
    ref = FigRenderer(atlas_size=64, use_pallas=True)
    base, keys = boxes_roots()
    scene = anim.snapshot_scene(base, size)
    view = np.asarray(anim.render_view(
        scene, pan=(9, -7), zoom=2,
        root_transforms={keys[i]: m for i, m in moves.items()}))
    # the reference structure: camera transform root wrapping per-root
    # transform wrappers wrapping the boxes
    renders = new_renders()
    cam = renders.add_root(0, Fig(
        kind=FigKind.nkTransform,
        transform=TransformStyle(translation=vec2(9.0, -7.0),
                                 matrix=Mat3.scaling(2.0, 2.0))))
    for i in range(12):
        f = Fig(
            kind=FigKind.nkRectangle,
            screen_box=rect(8 + (i % 4) * 42, 6 + (i // 4) * 38, 30, 24),
            corners=(5,) * 4,
            fill=fill(rgba(40 + i * 10, (i * 53) % 255, 180, 160)),
        )
        if i in moves:
            a, b, c, d, tx, ty = [float(v) for v in moves[i]]
            tr = renders.add_child(0, cam, Fig(
                kind=FigKind.nkTransform,
                transform=TransformStyle(translation=vec2(tx, ty),
                                         matrix=Mat3(a, b, 0.0, c, d, 0.0))))
            renders.add_child(0, tr, f)
        else:
            renders.add_child(0, cam, f)
    expect = np.asarray(ref.render_frame(from_renders(renders), size))
    np.testing.assert_array_equal(view, expect)


def test_rotation_matches_reflatten_closely():
    """Rotation keeps the baked vertex snapping (the re-walk snaps POST-
    transform), so equality is approximate: tiny mean error, and any larger
    deviations confined to a handful of AA edge pixels."""
    size = vec2(208, 168)
    anim = FigRenderer(atlas_size=64, use_pallas=True)
    ref = FigRenderer(atlas_size=64, use_pallas=True)
    base, keys = boxes_roots()
    scene = anim.snapshot_scene(base, size)
    aff = root_affine(rotate=17.0, center=(8 + 42 + 15, 6 + 15))
    view = np.asarray(anim.render_view(scene, root_transforms={keys[1]: aff}))
    wrapped, _ = boxes_roots(wrap={1: aff})
    expect = np.asarray(ref.render_frame(wrapped, size))
    diff = np.abs(view - expect)
    assert diff.mean() < 2e-3, diff.mean()
    # snapping deltas move AA edges by ≤1px: large deviations must be rare
    assert (diff > 0.1).mean() < 0.01, (diff > 0.1).mean()


def test_root_affine_helper_identity_and_translate():
    np.testing.assert_array_equal(
        root_affine(), np.asarray((1, 0, 0, 1, 0, 0), np.float32))
    np.testing.assert_array_equal(
        root_affine(translate=(5, -3)),
        np.asarray((1, 0, 0, 1, 5, -3), np.float32))
    # scale about a center keeps the center fixed
    aff = root_affine(scale=2.0, center=(10, 20))
    a, b, c, d, tx, ty = aff
    assert (a * 10 + b * 20 + tx, c * 10 + d * 20 + ty) == (10.0, 20.0)


def test_patch_then_animate_fused():
    """update_scene (deferred patch) followed by an animated view: the
    patch lands in base scene space in the SAME dispatch and the result
    equals a fresh snapshot of the edited scene under the same table."""
    from figdraw_tpu import native
    if native._load() is None:
        pytest.skip("retained patching needs the C++ walk")
    size = vec2(208, 168)
    r = FigRenderer(atlas_size=64, use_pallas=True)
    ref = FigRenderer(atlas_size=64, use_pallas=True)
    base, keys = boxes_roots()
    scene = r.snapshot_scene(base, size)
    # recolor one UNanimated box in place (count-preserving edit)
    base[0].set_solid_color(keys[5], rgba(255, 0, 0, 255))
    r.update_scene(scene, base, dirty=[keys[5]])
    assert scene.pending_patch is not None
    moves = {keys[2]: T(16, 10)}
    view = np.asarray(r.render_view(scene, root_transforms=moves))
    fresh = ref.snapshot_scene(base, size)
    expect = np.asarray(ref.render_view(fresh, root_transforms={
        keys[2]: T(16, 10)}))
    np.testing.assert_array_equal(view, expect)


def test_unknown_root_key_raises():
    size = vec2(208, 168)
    r = FigRenderer(atlas_size=64, use_pallas=False)
    base, keys = boxes_roots()
    scene = r.snapshot_scene(base, size)
    with pytest.raises(KeyError, match="no recorded span"):
        r.render_view(scene, root_transforms={9999: T(1, 1)})
    with pytest.raises(ValueError, match="slot order"):
        r.render_view(scene, root_transforms=np.zeros((3, 6), np.float32))
