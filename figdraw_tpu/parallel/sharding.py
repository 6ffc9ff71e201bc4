"""Multi-chip scale-out: tile-space sharding of the rasterizer over a Mesh.

The reference has no distributed axis (SURVEY.md §2.9); its TPU-native
scale-out is framebuffer decomposition: shard frame rows across devices with
`shard_map`, broadcast the (small) quad tape, and let every chip rasterize
its own rows. No collectives are needed in the draw pass — each row band is
independent — so the whole frame scales linearly over ICI until the tape
broadcast dominates. Backdrop blur's vertical pass is the one cross-band
dependency; the sharded executor handles it with a halo exchange via
jax.lax.ppermute (neighbor rows only, 2×64 px per boundary).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8: check_rep became check_vma (varying-manual-axes tracking)
    from jax import shard_map as _new_shard_map

    def shard_map(f=None, **kw):
        if kw.pop("check_rep", None) is False:
            kw["check_vma"] = False
        return _new_shard_map(f, **kw) if f is not None else _new_shard_map(**kw)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops import raster_ref
from ..ops.blur import _blur_axis

ROWS_AXIS = "rows"


def make_sharded_draw_pass(mesh: Mesh, subpixel_positioning: bool = False):
    """Returns a jitted draw pass with the frame row-sharded over `mesh`.

    Signature: (fields, modes, count, frame, masks, backdrop) -> frame,
    where frame/masks/backdrop are globally (H, W, 4) / (K, H, W) / (H, W, 4)
    with H divisible by the mesh axis size.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(),  # fields (replicated)
            P(),  # modes
            P(),  # count
            P(ROWS_AXIS, None, None),  # frame rows
            P(None, ROWS_AXIS, None),  # masks rows
            P(ROWS_AXIS, None, None),  # backdrop rows
        ),
        out_specs=P(ROWS_AXIS, None, None),
        check_rep=False,
    )
    def draw(fields, modes, count, frame, masks, backdrop):
        local_h = frame.shape[0]
        row0 = jax.lax.axis_index(ROWS_AXIS) * local_h
        return raster_ref.draw_pass_frame(
            fields,
            modes,
            count,
            frame,
            masks,
            atlas=None,
            backdrop=backdrop,
            subpixel_positioning=subpixel_positioning,
            y_offset=row0.astype(jnp.float32),
        )

    return jax.jit(draw)


def make_sharded_blur(mesh: Mesh, max_radius: float = 64.0):
    """Row-sharded separable backdrop blur with a ppermute halo exchange.

    The horizontal pass is embarrassingly row-parallel; the vertical pass
    needs up to ceil(radius) = 64 rows of halo from each neighbor
    (blur.frag:12 clamps the radius to 64, so the halo bound is static).
    """
    halo = int(max_radius) + 1  # +1: linear tap interpolation reads floor(x)+1
    axis_size = mesh.shape[ROWS_AXIS]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(ROWS_AXIS, None, None), P()),
        out_specs=P(ROWS_AXIS, None, None),
        check_rep=False,
    )
    def blur(frame, radius):
        local = _blur_axis(frame, radius, axis=1)  # horizontal, local
        local_h = local.shape[0]
        idx = jax.lax.axis_index(ROWS_AXIS)
        if halo >= local_h:
            # bands shorter than the blur reach: gather all rows, blur, take
            # our band back (small frames only — 1080p/8 bands are 135 rows)
            gathered = jax.lax.all_gather(local, ROWS_AXIS, axis=0, tiled=True)
            blurred = _blur_axis(gathered, radius, axis=0)
            return jax.lax.dynamic_slice_in_dim(blurred, idx * local_h, local_h, 0)
        # halo exchange: receive the last `halo` rows of the upper neighbor and
        # the first `halo` rows of the lower neighbor
        up = [(i, (i + 1) % axis_size) for i in range(axis_size)]
        down = [(i, (i - 1) % axis_size) for i in range(axis_size)]
        from_above = jax.lax.ppermute(local[-halo:], ROWS_AXIS, up)
        from_below = jax.lax.ppermute(local[:halo], ROWS_AXIS, down)
        # clamp-to-edge at the global boundary: replicate own edge rows
        top_pad = jnp.where(idx == 0, jnp.repeat(local[:1], halo, axis=0), from_above)
        bot_pad = jnp.where(
            idx == axis_size - 1, jnp.repeat(local[-1:], halo, axis=0), from_below
        )
        extended = jnp.concatenate([top_pad, local, bot_pad], axis=0)
        blurred = _blur_axis(extended, radius, axis=0)
        return blurred[halo:-halo]

    return jax.jit(blur)


def default_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices), (ROWS_AXIS,))


# --- sharded fused executor ------------------------------------------------------
#
# The multi-chip PERFORMANCE path (round-2 verdict item 2): the whole frame —
# Pallas band rasterization, mask-plane writes, halo-exchange backdrop blur,
# windowed atlas draws — runs inside ONE jitted shard_map. One replicated tape
# upload (executor.pack_tape_upload), one dispatch per frame, each chip owning
# a contiguous row band. This replaces the round-1 per-item XLA dispatch loop
# that bypassed the Pallas/megakernel stack entirely.
#
# Band geometry: each device's band is padded to a multiple of the shard tile
# height (default 8 — the f32 VMEM sublane minimum — so padding stays under
# one tile row per band). Rows past the true frame height render normally and
# are cropped off; tile (8, 128) keeps per-band Pallas grids dense for the
# 135-row bands a 1080p/8-chip split produces.

import os as _os

SHARD_TILE_H = int(_os.environ.get("FIGDRAW_SHARD_TILE", "8"))
SHARD_TILE_W = 128
BLUR_HALO = 65  # radius clamp 64 (blur.frag:12) + 1 for the linear tap lerp


def _band_geometry(mesh: Mesh, height: int, width: int):
    n = mesh.shape[ROWS_AXIS]
    th = SHARD_TILE_H
    tw = SHARD_TILE_W
    band = -(-height // n)
    pband = max(-(-band // th) * th, th)
    gh = pband * n
    pw = -(-width // tw) * tw
    return n, th, tw, pband, gh, pw


def _banded_blur_planar(local, radius, axis_size: int, halo: int = BLUR_HALO):
    """Separable backdrop blur on a channel-planar (4, h, w) row band inside a
    shard_map body: horizontal pass is band-local; the vertical pass reads up
    to `halo` rows from each neighbor via jax.lax.ppermute (clamp-to-edge at
    the global boundary by replicating own edge rows)."""
    local = _blur_axis(local, radius, axis=2)
    if axis_size == 1:
        return _blur_axis(local, radius, axis=1)
    local_h = local.shape[1]
    idx = jax.lax.axis_index(ROWS_AXIS)
    if halo >= local_h:
        # bands shorter than the blur reach: gather all rows, blur, slice back
        gathered = jax.lax.all_gather(local, ROWS_AXIS, axis=1, tiled=True)
        blurred = _blur_axis(gathered, radius, axis=1)
        return jax.lax.dynamic_slice_in_dim(blurred, idx * local_h, local_h, 1)
    up = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    down = [(i, (i - 1) % axis_size) for i in range(axis_size)]
    from_above = jax.lax.ppermute(local[:, -halo:], ROWS_AXIS, up)
    from_below = jax.lax.ppermute(local[:, :halo], ROWS_AXIS, down)
    top = jnp.where(idx == 0, jnp.repeat(local[:, :1], halo, axis=1), from_above)
    bot = jnp.where(
        idx == axis_size - 1, jnp.repeat(local[:, -1:], halo, axis=1), from_below
    )
    extended = jnp.concatenate([top, local, bot], axis=1)
    return _blur_axis(extended, radius, axis=1)[:, halo:-halo]


@lru_cache(maxsize=32)
def get_sharded_frame_executor(
    mesh: Mesh,
    structure: tuple,
    height: int,
    width: int,
    n_masks: int,
    use_pallas: bool,
    subpixel_positioning: bool,
    has_init_frame: bool,
    pixelate: bool = False,
):
    """Mesh-sharded analog of executor.get_frame_executor.

    Returns (run, (gh, pw)): run(combo, init_frame, atlas) -> (gh, pw, 4)
    global frame; crop to [:height, :width]. combo and atlas are replicated;
    init_frame must be (gh, pw, 4) when has_init_frame (row-sharded), else a
    (1, 1, 4) dummy (replicated)."""
    from .. import executor as ex
    from ..ops import raster_pallas
    from ..ops.layout import QF_WIDTH

    n_dev, th, tw, pband, gh, pw = _band_geometry(mesh, height, width)
    n_draws = sum(1 for item in structure if item[0] == "draw")
    n_blurs = sum(1 for item in structure if item[0] == "blur")
    any_blur = n_blurs > 0

    def to_hwc(p):
        return jnp.transpose(p, (1, 2, 0))

    def to_planes(h):
        return jnp.transpose(h, (2, 0, 1))

    def run_local(combo, init_frame, atlas):
        rows = ex._meta_rows(n_draws, n_blurs, QF_WIDTH + ex.COMBO_EXTRA)
        fields = combo[:-rows, :QF_WIDTH]
        modes = jax.lax.bitcast_convert_type(
            combo[:-rows, QF_WIDTH : QF_WIDTH + ex.COMBO_EXTRA], jnp.int32
        )
        meta = combo[-rows:].reshape(-1)
        nd2 = max(2 * n_draws, 2)
        bounds = jax.lax.bitcast_convert_type(meta[:nd2], jnp.int32).reshape(-1, 2)
        radii = meta[2 * n_draws : 2 * n_draws + max(n_blurs, 1)]
        clear_color = meta[2 * n_draws + n_blurs : 2 * n_draws + n_blurs + 4]

        row0 = jax.lax.axis_index(ROWS_AXIS).astype(jnp.int32) * pband
        y_off = row0.astype(jnp.float32)
        if has_init_frame:
            planes = to_planes(init_frame)
        else:
            planes = jnp.broadcast_to(
                clear_color[:, None, None], (4, pband, pw)
            ).astype(jnp.float32)
        masks = jnp.zeros((n_masks, pband, pw), jnp.float32).at[0].set(1.0)
        backdrop = jnp.zeros((4, pband, pw), jnp.float32) if any_blur else None

        if use_pallas:
            # bin the whole tape once per band; runs select their segments.
            # run-scoped occlusion culling, same as the single-chip executor
            frame_draw_pos = [
                di_ for di_, item in enumerate(
                    [it for it in structure if it[0] == "draw"]
                )
                if ex._draw_flags(item)[0] == ex.FRAME_TARGET
            ]
            rb = (
                bounds[jnp.asarray(frame_draw_pos, jnp.int32)]
                if frame_draw_pos else None
            )
            tile_idx, tile_counts = raster_pallas.prebin(
                fields, jnp.int32(fields.shape[0]), pband, pw,
                y_offset=row0, tile_h=th, tile_w=tw,
                modes=modes if frame_draw_pos else None, run_bounds=rb,
                n_runs=len(frame_draw_pos),
            )
        atlas_planes = None
        atlas_real = 0
        if use_pallas and any(
            item[0] == "draw" and ex._draw_flags(item)[3] for item in structure
        ):
            atlas_planes, atlas_real = raster_pallas.atlas_to_planes(atlas)

        di = 0
        bi = 0
        for item in structure:
            kind = item[0]
            if kind == "clear_mask":
                masks = masks.at[item[1]].set(0.0)
            elif kind == "blur":
                backdrop = _banded_blur_planar(planes, radii[bi], n_dev)
                bi += 1
            else:
                target, uses_atlas, needs_backdrop, atlas11 = ex._draw_flags(item)
                s = bounds[di, 0]
                e = bounds[di, 1]
                di += 1
                if target == ex.FRAME_TARGET:
                    if use_pallas and (not uses_atlas or atlas11):
                        planes = raster_pallas.draw_pass_planar_prebinned(
                            fields, modes, s, e, tile_idx, tile_counts,
                            planes, masks,
                            backdrop if needs_backdrop else None,
                            y_offset=row0, tile_h=th, tile_w=tw,
                            atlas_planes=atlas_planes if atlas11 else None,
                            subpixel_positioning=subpixel_positioning,
                            atlas_size=atlas_real if atlas11 else 0,
                        )
                    else:
                        hwc = to_hwc(planes)
                        if uses_atlas and not needs_backdrop:
                            hwc = raster_ref.draw_pass_frame_range_windowed(
                                fields, modes, s, e, hwc, masks, atlas=atlas,
                                subpixel_positioning=subpixel_positioning,
                                pixelate=pixelate, y_offset=y_off,
                            )
                        else:
                            hwc = raster_ref.draw_pass_frame_range(
                                fields, modes, s, e, hwc, masks,
                                atlas=atlas if uses_atlas else None,
                                backdrop=to_hwc(backdrop) if needs_backdrop else None,
                                subpixel_positioning=subpixel_positioning,
                                pixelate=pixelate, y_offset=y_off,
                            )
                        planes = to_planes(hwc)
                else:
                    if use_pallas and not uses_atlas:
                        plane = raster_pallas.draw_pass_mask_prebinned(
                            fields, modes, s, e, tile_idx, tile_counts,
                            masks[target][None], masks,
                            y_offset=row0, tile_h=th, tile_w=tw,
                        )[0]
                    else:
                        plane = raster_ref.draw_pass_mask_range(
                            fields, modes, s, e, masks[target], masks,
                            atlas=atlas if uses_atlas else None,
                            subpixel_positioning=subpixel_positioning,
                            pixelate=pixelate, y_offset=y_off,
                        )
                    masks = masks.at[target].set(plane)
        return to_hwc(planes)

    init_spec = P(ROWS_AXIS, None, None) if has_init_frame else P()
    sharded = shard_map(
        run_local,
        mesh=mesh,
        in_specs=(P(), init_spec, P()),
        out_specs=P(ROWS_AXIS, None, None),
        check_rep=False,
    )
    return jax.jit(sharded), (gh, pw)


@lru_cache(maxsize=32)
def get_sharded_mega_executor(
    mesh: Mesh, height: int, width: int, n_masks: int, has_init_frame: bool,
    has_atlas: bool = False, subpixel_positioning: bool = False,
):
    """Mesh-sharded megakernel (executor.get_mega_executor): ONE Pallas tile
    walk per row band over target-baked modes; 1:1 atlas quads sample the
    replicated VMEM atlas in-kernel. Returns (run, (gh, pw))."""
    from .. import executor as ex
    from ..ops import raster_pallas
    from ..ops.layout import QF_WIDTH

    n_dev, th, tw, pband, gh, pw = _band_geometry(mesh, height, width)

    def run_local(combo, init_frame, atlas=None):
        fields = combo[:-1, :QF_WIDTH]
        modes = jax.lax.bitcast_convert_type(
            combo[:-1, QF_WIDTH : QF_WIDTH + ex.COMBO_EXTRA], jnp.int32
        )
        clear_color = combo[-1][0:4]
        row0 = jax.lax.axis_index(ROWS_AXIS).astype(jnp.int32) * pband
        if has_init_frame:
            planes = jnp.transpose(init_frame, (2, 0, 1))
        else:
            planes = jnp.broadcast_to(
                clear_color[:, None, None], (4, pband, pw)
            ).astype(jnp.float32)
        if has_atlas:
            atlas_planes, atlas_real = raster_pallas.atlas_to_planes(atlas)
        else:
            atlas_planes, atlas_real = None, 0
        planes = raster_pallas.draw_pass_mega(
            fields, modes, planes, n_masks,
            y_offset=row0, tile_h=th, tile_w=tw,
            atlas_planes=atlas_planes,
            subpixel_positioning=subpixel_positioning,
            atlas_size=atlas_real,
        )
        return jnp.transpose(planes, (1, 2, 0))

    init_spec = P(ROWS_AXIS, None, None) if has_init_frame else P()
    in_specs = (P(), init_spec) + ((P(),) if has_atlas else ())
    sharded = shard_map(
        run_local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(ROWS_AXIS, None, None),
        check_rep=False,
    )
    return jax.jit(sharded), (gh, pw)


class ShardedFigRenderer:
    """Multi-chip frame renderer: the framebuffer row-sharded over a Mesh.

    The host flatten is unchanged (the quad tape is small and replicated);
    each device rasterizes its row band through the SAME performance stack as
    the single-chip renderer — Pallas tile kernels (or the megakernel for
    mask-heavy pure-SDF scenes), one packed tape upload, the whole pass chain
    in one jitted shard_map — with backdrop blur exchanging halo rows over
    ICI. Scales the reference's pixel-parallel fragment work across chips —
    the axis the reference's single-GPU design never had (SURVEY.md §2.9).
    """

    def __init__(
        self,
        mesh: Optional[Mesh] = None,
        atlas_size: int = 256,
        use_pallas: Optional[bool] = None,
        pixel_scale: float = 1.0,
    ):
        from ..renderer import FigRenderer

        self.mesh = mesh if mesh is not None else default_mesh()
        self.n = self.mesh.shape[ROWS_AXIS]
        # reuse the single-chip renderer for flattening + atlas management
        self._flattener = FigRenderer(
            atlas_size=atlas_size, use_pallas=False, pixel_scale=pixel_scale
        )
        if use_pallas is None:
            from .. import config

            override = config.runtime_backend_override()
            use_pallas = (
                override if override is not None
                else jax.default_backend() == "tpu"
            )
        self.use_pallas = use_pallas
        self.last_frame = None
        self._last_padded = None

    def process_image_messages(self) -> None:
        self._flattener.process_image_messages()

    def _init_frame(self, gh: int, pw: int, has_init_frame: bool):
        if not has_init_frame:
            return jnp.zeros((1, 1, 4), jnp.float32)
        lp = self._last_padded
        if lp is not None and lp.shape == (gh, pw, 4):
            return lp
        return jnp.zeros((gh, pw, 4), jnp.float32)

    def render_frame(self, renders, frame_size, clear_main=True,
                     clear_color=(1.0, 1.0, 1.0, 1.0)):
        """Flatten on host, rasterize row-sharded; returns global (H, W, 4)."""
        from ..basics import scaled
        from ..colors import as_color

        fs = scaled(frame_size)
        self._flattener.process_image_messages()
        tape = self._flattener.flatten(renders, fs, clear_main,
                                       as_color(clear_color))
        frame = self.execute(tape)
        self._flattener.publish_atlas_usage()
        return frame

    def execute(self, tape) -> jnp.ndarray:
        """Runs the whole tape as ONE sharded device call — the multi-chip
        twin of FigRenderer.execute. Split into _plan (host packing + path
        choice) and _dispatch (device) like the single-chip execute."""
        return self._dispatch(self._plan(tape))

    def _plan(self, tape):
        """Host half: pad the tape, decide mega vs pass-chain, and pack the
        upload combos — the sharded twin of FigRenderer._plan_execution."""
        import numpy as np
        from types import SimpleNamespace

        from .. import executor as ex
        from ..ops.layout import QF_WIDTH, QI_WIDTH
        from ..renderer import ROLLED_THRESHOLD, _bucket

        width = int(round(tape.frame_size[0]))
        height = int(round(tape.frame_size[1]))
        n_masks = tape.mask_count + 1

        n = _bucket(max(tape.count, 1))
        fields = np.zeros((n, QF_WIDTH), dtype=np.float32)
        modes = np.zeros((n, QI_WIDTH), dtype=np.int32)
        fields[: tape.count] = tape.fields[: tape.count]
        modes[: tape.count] = tape.modes[: tape.count]

        from ..config import atlas11_policy
        from ..ops.raster_pallas import mark_atlas11

        # same measured policy as FigRenderer.execute: atlas quads default to
        # the XLA windowed-gather evaluator; FIGDRAW_ATLAS11=always re-enables
        # the in-kernel VMEM-atlas sampler
        pallas_atlas_ok = (
            self.use_pallas
            and atlas11_policy() == "always"
            and mark_atlas11(
                fields, modes, tape.count, self._flattener.atlas.size,
                self._flattener.pixelate,
            )
        )
        structure, bounds, radii, is_atlas_mode, is_backdrop_mode = (
            ex.tape_structure(tape, modes)
        )
        structure = [
            item if item[0] != "draw"
            else item + (bool(item[2] and pallas_atlas_ok),)
            for item in structure
        ]
        seen_blur = any(item[0] == "blur" for item in structure)
        has_init_frame = tape.clear_color is None
        clear = np.asarray(tape.clear_color or (0, 0, 0, 0), dtype=np.float32)

        mega_atlas = bool(is_atlas_mode[: tape.count].any())
        mega = (
            len(structure) > ROLLED_THRESHOLD
            and self.use_pallas
            and not seen_blur
            and (not mega_atlas or pallas_atlas_ok)
            and not bool(is_backdrop_mode[: tape.count].any())
        )
        mega_combo = None
        if mega:
            mf, mm = ex.pack_mega_modes(
                tape, fields[: tape.count], modes[: tape.count]
            )
            nm = _bucket(max(mf.shape[0], 1))
            mega_fields = np.zeros((nm, QF_WIDTH), dtype=np.float32)
            mega_modes = np.zeros((nm, QI_WIDTH), dtype=np.int32)
            mega_fields[: mf.shape[0]] = mf
            mega_modes[: mm.shape[0]] = mm
            mega_combo = ex.pack_tape_upload(
                mega_fields, mega_modes, np.zeros((0, 2), np.int32),
                np.zeros((0,), np.float32), clear,
            )
        return SimpleNamespace(
            height=height, width=width, n_masks=n_masks,
            structure=structure, has_init_frame=has_init_frame, clear=clear,
            n_pad=n, fields=fields, modes=modes,
            bounds=np.asarray(bounds, dtype=np.int32).reshape(-1, 2),
            radii=np.asarray(radii, dtype=np.float32),
            mega=mega, mega_atlas=mega_atlas, mega_combo=mega_combo,
            combo=None,
        )

    def _frame_combo(self, plan):
        """Pass-chain upload combo, packed lazily (the mega path never needs
        it unless it downgrades)."""
        if plan.combo is None:
            from .. import executor as ex

            plan.combo = ex.pack_tape_upload(
                plan.fields, plan.modes, plan.bounds, plan.radii, plan.clear
            )
        return plan.combo

    def _dispatch(self, plan) -> jnp.ndarray:
        """Device half: upload the plan's combo and run the sharded executor
        with the mega → pass-chain fallback."""
        if plan.mega and self.use_pallas:
            run, (gh, pw) = get_sharded_mega_executor(
                self.mesh, plan.height, plan.width, plan.n_masks,
                plan.has_init_frame, has_atlas=plan.mega_atlas,
                subpixel_positioning=self._flattener.text_subpixel_positioning,
            )
            try:
                mega_args = (
                    jnp.asarray(plan.mega_combo),
                    self._init_frame(gh, pw, plan.has_init_frame),
                ) + (
                    (self._flattener._device_atlas(),)
                    if plan.mega_atlas
                    else ()
                )
                frame = run(*mega_args)
                self._last_padded = frame
                self.last_frame = frame[: plan.height, : plan.width]
                return self.last_frame
            except Exception as exc:
                from ..utils.perf import log_kv
                import logging

                log_kv(
                    logging.WARNING,
                    "sharded mega rasterizer failed; falling back",
                    error=repr(exc),
                )
                self.use_pallas = False

        combo = self._frame_combo(plan)

        def make_run(use_pallas):
            return get_sharded_frame_executor(
                self.mesh, tuple(plan.structure), plan.height, plan.width,
                plan.n_masks, use_pallas,
                self._flattener.text_subpixel_positioning,
                plan.has_init_frame, self._flattener.pixelate,
            )

        run, (gh, pw) = make_run(self.use_pallas)
        args = (
            jnp.asarray(combo),
            self._init_frame(gh, pw, plan.has_init_frame),
            self._flattener._device_atlas(),
        )
        try:
            frame = run(*args)
        except Exception as exc:
            if not self.use_pallas:
                raise
            from ..utils.perf import log_kv
            import logging

            log_kv(
                logging.WARNING,
                "sharded pallas rasterizer failed; falling back to XLA",
                error=repr(exc),
            )
            self.use_pallas = False
            run, _ = make_run(False)
            frame = run(*args)
        self._last_padded = frame
        self.last_frame = frame[: plan.height, : plan.width]
        return self.last_frame

    # --- device-resident scenes on the mesh ---------------------------------

    def snapshot_scene(self, renders, frame_size, clear_main=True,
                       clear_color=(1.0, 1.0, 1.0, 1.0), reserve=None,
                       animate=False):
        """Flatten once (saturation cull OFF — panning can reveal culled
        quads) and park the replicated combo on the mesh; render_view then
        scrolls/zooms it row-sharded across chips for pure kernel + ICI
        cost — the multi-chip twin of FigRenderer.snapshot_scene (incl. the
        retained-scene spans and per-root row reserves)."""
        from ..basics import scaled
        from ..colors import as_color
        from ..renderer import DeviceScene

        fs = scaled(frame_size)
        self._flattener.process_image_messages()
        tape = self._flattener.flatten(
            renders, fs, clear_main, as_color(clear_color), cull=False,
            record_spans=True, reserve=reserve,
        )
        plan = self._plan(tape)
        if animate and tape.mask_count:
            # the mega export interleaves clear sentinel rows when plane
            # masks exist, breaking the tape-row ↔ combo-row mapping the
            # animation table needs — stay on the frame executor
            plan.mega = False
        if plan.mega and self.use_pallas:
            kind = "mega"
            combo = plan.mega_combo
            n_quads = combo.shape[0] - 1  # one meta row (clear color)
        else:
            kind = "frame"
            combo = self._frame_combo(plan)
            n_quads = plan.n_pad
        scene = DeviceScene(
            kind=kind, plan=plan, combo_dev=jnp.asarray(combo),
            n_quads=n_quads, n_pad=plan.n_pad,
        )
        # retained-scene patch state (update_scene) — same mapping guard as
        # the single-chip snapshot: mega interleaves clear sentinel rows
        # when plane masks exist
        if getattr(tape, "root_spans", None) and not (
            kind == "mega" and tape.mask_count
        ):
            from ..renderer import _patchable_spans

            scene.spans = _patchable_spans(tape)
            # animation keeps the UNfiltered spans (clip cells move their
            # mask-plane quads along; only patches need the filter)
            scene.anim_spans = dict(tape.root_spans)
        scene.atlas_generation = self._flattener.atlas.generation
        scene.snap_args = (frame_size, clear_main, clear_color, reserve,
                           animate)
        return scene

    def update_scene(self, scene, renders, dirty=None):
        """Patch a mesh-resident DeviceScene in place after in-place edits
        to `renders` — the sharded twin of FigRenderer.update_scene: dirty
        roots' subtrees re-walk in the scratch context and their UNPACKED
        combo rows (fields + bitcast mode lanes, the sharded wire layout)
        scatter into the replicated device combo as one upload. Unsupported
        edits re-snapshot (same semantics as single-chip)."""
        patched = self._try_patch_scene(scene, renders, dirty)
        if patched:
            return scene
        frame_size, clear_main, clear_color, reserve, animate = scene.snap_args
        fresh = self.snapshot_scene(renders, frame_size, clear_main,
                                    clear_color, reserve=reserve,
                                    animate=animate)
        from ..renderer import DeviceScene

        for slot in DeviceScene.__slots__:
            setattr(scene, slot, getattr(fresh, slot))
        return scene

    def _try_patch_scene(self, scene, renders, dirty) -> bool:
        import numpy as np

        from ..ops.layout import QF_WIDTH
        from ..renderer import _patch_device_scene

        plan = scene.plan

        def old_bboxes(idx):
            return plan.fields[idx][:, 6:10].copy()

        def apply_mirrors(idx, rows):
            # the plan keeps logical fields/modes (the lazy pass-chain
            # combo packs from them) plus any packed combos
            plan.fields[idx] = rows[:, :QF_WIDTH]
            plan.modes[idx] = rows[:, QF_WIDTH:].view(np.int32)
            if plan.combo is not None:
                plan.combo[idx] = rows
            if plan.mega_combo is not None:
                plan.mega_combo[idx] = rows

        atlas11 = any(
            item[0] == "draw" and len(item) > 4 and item[4]
            for item in plan.structure
        )
        return _patch_device_scene(
            self._flattener, scene, renders, dirty,
            layout="unpacked", atlas11=atlas11,
            old_bboxes=old_bboxes, apply_mirrors=apply_mirrors,
        )

    def render_view(self, scene, pan=(0.0, 0.0), zoom: float = 1.0,
                    root_transforms=None):
        """One row-sharded frame of a device-resident scene under the camera
        p' = zoom·p + pan. Same bit-exactness contract as the single-chip
        render_view (view_rows runs on the replicated combo before the
        shard_map splits row bands); the combo layout here is the unpacked
        70-wide one, so the rect-mask columns differ
        (executor.VIEW_RECT_COLS_UNPACKED). root_transforms animates the
        replicated combo with the per-root affine table exactly like
        FigRenderer.render_view — the table applies BEFORE the shard_map
        splits row bands, so sharded animation is bit-exact vs single-chip
        (tests/test_sharded_perf.py)."""
        import numpy as np

        from .. import executor as ex
        from ..renderer import (
            FigRenderer, _anim_table, _patch_staging,
        )

        plan = scene.plan
        cam = (float(pan[0]), float(pan[1]), float(zoom), self.use_pallas,
               scene.kind)
        d = jnp.asarray(np.asarray(pan, dtype=np.float32).reshape(2))
        z = jnp.float32(zoom)
        run, rest = self._view_executor(scene)
        if root_transforms is not None:
            table = jnp.asarray(_anim_table(scene, root_transforms))
            ridx = scene.anim_ridx_dev
            try:
                if scene.pending_patch is not None:
                    packed = _patch_staging(*scene.pending_patch)
                    pav = ex.get_patch_anim_view_runner(
                        run, scene.n_quads, packed.shape[0],
                        ex.VIEW_RECT_COLS_UNPACKED,
                    )
                    frame, scene.combo_dev = pav(
                        scene.combo_dev, jnp.asarray(packed), table, ridx,
                        d, z, *rest,
                    )
                    scene.pending_patch = None
                else:
                    av = ex.get_anim_view_runner(
                        run, scene.n_quads, ex.VIEW_RECT_COLS_UNPACKED
                    )
                    frame = av(scene.combo_dev, table, ridx, d, z, *rest)
            except Exception as exc:
                self._downgrade_scene(scene, exc)
                return self.render_view(scene, pan, zoom, root_transforms)
            scene.pending_damage = None
            scene.last_cam = None
            scene.last_view_frame = None
            self._last_padded = frame
            self.last_frame = frame[: plan.height, : plan.width]
            return self.last_frame
        try:
            if scene.pending_patch is not None and FigRenderer._partial_ok(
                scene, cam
            ):
                # damage-clipped, same contract as single-chip: the select
                # runs on the PADDED sharded frame (prev is padded too)
                packed = _patch_staging(*scene.pending_patch)
                ppv = ex.get_partial_patch_view_runner(
                    run, scene.n_quads, packed.shape[0],
                    ex.VIEW_RECT_COLS_UNPACKED,
                )
                from ..renderer import _damage_rects

                frame, scene.combo_dev = ppv(
                    scene.combo_dev, jnp.asarray(packed),
                    jnp.asarray(_damage_rects(scene.pending_damage)),
                    d, z, scene.last_view_frame, *rest,
                )
                scene.pending_patch = None
            elif scene.pending_patch is not None:
                packed = _patch_staging(*scene.pending_patch)
                pv = ex.get_patch_view_runner(
                    run, scene.n_quads, packed.shape[0],
                    ex.VIEW_RECT_COLS_UNPACKED,
                )
                frame, scene.combo_dev = pv(
                    scene.combo_dev, jnp.asarray(packed), d, z, *rest,
                )
                scene.pending_patch = None
            else:
                viewed = ex.get_view_runner(
                    run, scene.n_quads, ex.VIEW_RECT_COLS_UNPACKED
                )
                frame = viewed(scene.combo_dev, d, z, *rest)
        except Exception as exc:
            self._downgrade_scene(scene, exc)
            return self.render_view(scene, pan, zoom)
        scene.pending_damage = None
        scene.last_cam = cam
        scene.last_view_frame = frame  # padded: the partial-render source
        self._last_padded = frame
        self.last_frame = frame[: plan.height, : plan.width]
        return self.last_frame

    def _view_executor(self, scene):
        """(run, rest) for a mesh-resident scene — the sharded executor
        matching the snapshot's path and its view-invariant arguments."""
        plan = scene.plan
        if scene.kind == "mega":
            run, (gh, pw) = get_sharded_mega_executor(
                self.mesh, plan.height, plan.width, plan.n_masks,
                plan.has_init_frame, has_atlas=plan.mega_atlas,
                subpixel_positioning=self._flattener.text_subpixel_positioning,
            )
            rest = (self._init_frame(gh, pw, plan.has_init_frame),) + (
                (self._flattener._device_atlas(),) if plan.mega_atlas else ()
            )
        else:
            run, (gh, pw) = get_sharded_frame_executor(
                self.mesh, tuple(plan.structure), plan.height, plan.width,
                plan.n_masks, self.use_pallas,
                self._flattener.text_subpixel_positioning,
                plan.has_init_frame, self._flattener.pixelate,
            )
            rest = (
                self._init_frame(gh, pw, plan.has_init_frame),
                self._flattener._device_atlas(),
            )
        return run, rest

    def _downgrade_scene(self, scene, exc: Exception) -> None:
        if not self.use_pallas:
            raise exc
        from ..utils.perf import log_kv
        import logging

        log_kv(
            logging.WARNING,
            "sharded view executor failed; downgrading the scene to XLA",
            error=repr(exc),
        )
        self.use_pallas = False
        scene.kind = "frame"
        # the plan's host mirrors already carry any retained patches, so a
        # deferred device patch is superseded by the repack; the previous
        # frame came from the failed executor — don't mix paths in a partial
        scene.pending_patch = None
        scene.last_view_frame = None
        scene.last_cam = None
        scene.combo_dev = jnp.asarray(self._frame_combo(scene.plan))
        scene.n_quads = scene.plan.n_pad
        # per-quad slot index is sized to n_quads — rebuild lazily
        scene.anim_ridx_dev = None

    def render_views(self, scene, pans, zooms=1.0, chunk: int = 0,
                     as_uint8: bool = False):
        """Row-sharded flythrough: the camera path renders as chunked
        lax.map dispatches over the sharded executor — every view still
        spans all chips' row bands, and the whole path's host→device
        traffic is the (N, 2) pans + (N,) zooms arrays. Bit-exact vs the
        render_view loop (clear snapshots; clear_main=False snapshots fall
        back to the sequential loop to keep chained-composite semantics)."""
        import numpy as np

        from .. import executor as ex
        from ..renderer import FigRenderer, _frames_to_u8

        FigRenderer._flush_scene_patch(scene)
        plan = scene.plan
        ds = np.ascontiguousarray(
            np.asarray(pans, dtype=np.float32).reshape(-1, 2))
        n = ds.shape[0]
        zarr = np.asarray(zooms, dtype=np.float32)
        zs = (np.full((n,), float(zarr), np.float32) if zarr.ndim == 0
              else zarr.reshape(n).copy())
        if chunk <= 0:
            from ..config import batch_chunk

            chunk = batch_chunk()
        if plan.has_init_frame:
            frames = [self.render_view(scene, d, zoom=float(z))
                      for d, z in zip(ds, zs)]
            out = (jnp.stack(frames) if frames else jnp.zeros(
                (0, plan.height, plan.width, 4), jnp.float32))
            return _frames_to_u8(out) if as_uint8 else out
        run, rest = self._view_executor(scene)
        view_fn = ex.get_view_frame_fn(
            run, scene.n_quads, ex.VIEW_RECT_COLS_UNPACKED
        )
        batched = ex.get_batch_runner(view_fn, 2)
        parts = []
        try:
            for s in range(0, n, chunk):
                k = min(chunk, n - s)
                target = 1 << max(k - 1, 0).bit_length()
                idx = np.minimum(np.arange(target), k - 1)
                out = batched(jnp.asarray(ds[s : s + k][idx]),
                              jnp.asarray(zs[s : s + k][idx]),
                              scene.combo_dev, *rest)
                parts.append(out[:k, : plan.height, : plan.width])
        except Exception as exc:
            self._downgrade_scene(scene, exc)
            return self.render_views(scene, pans, zooms, chunk, as_uint8)
        out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        if n:
            self.last_frame = out[-1]
        return _frames_to_u8(out) if as_uint8 else out


# --- frame-parallel offline rendering ---------------------------------------------
#
# The second parallel axis: where the row-sharded executor splits ONE frame
# across chips, the frame-parallel runner gives each chip WHOLE frames of a
# render_batch chunk — offline animation/thumbnail farms are embarrassingly
# parallel, so throughput scales ~linearly with mesh size and no collective
# ever runs (the reference's GL loop has neither axis).

FRAMES_AXIS = "frames"


def frames_mesh(n_devices: Optional[int] = None) -> Mesh:
    """A 1-D mesh over the frame axis for FigRenderer.render_batch(mesh=...)."""
    import numpy as np

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[: n_devices]
    return Mesh(np.array(devices), (FRAMES_AXIS,))


def get_frame_parallel_runner(run, n_vary: int, mesh: Mesh):
    """shard_map analog of executor.get_batch_runner: the stacked per-frame
    buffers (first `n_vary` args) shard along the frame axis, the remaining
    args replicate, and each device lax.maps the single-frame executor over
    its local frames. The frame axis must be a multiple of the mesh size
    (render_batch pads per-device counts to a pow2)."""
    n = mesh.devices.size

    @jax.jit
    def batched(*args):
        vary = args[:n_vary]
        const = args[n_vary:]

        def local(*a):
            lv = a[:n_vary]
            lc = a[n_vary:]
            return jax.lax.map(lambda v: run(*v, *lc), lv)

        body = shard_map(
            local,
            mesh=mesh,
            in_specs=tuple(P(FRAMES_AXIS) for _ in vary)
            + tuple(P() for _ in const),
            out_specs=P(FRAMES_AXIS),
            check_rep=False,
        )
        return body(*vary, *const)

    return batched


_FRAME_PARALLEL_CACHE = {}


def cached_frame_parallel_runner(run, n_vary: int, mesh: Mesh):
    key = (run, n_vary, tuple(map(id, mesh.devices.flat)), mesh.axis_names)
    got = _FRAME_PARALLEL_CACHE.get(key)
    if got is None:
        got = get_frame_parallel_runner(run, n_vary, mesh)
        _FRAME_PARALLEL_CACHE[key] = got
    return got
