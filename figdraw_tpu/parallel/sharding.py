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

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8: no check_rep kwarg
    from jax import shard_map as _new_shard_map

    def shard_map(f=None, **kw):
        kw.pop("check_rep", None)
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


class ShardedFigRenderer:
    """Multi-chip frame renderer: the framebuffer row-sharded over a Mesh.

    The host flatten is unchanged (the quad tape is small and replicated);
    each device rasterizes its row band, and backdrop blur exchanges halos
    over ICI. Scales the reference's pixel-parallel fragment work across
    chips — the axis the reference's single-GPU design never had
    (SURVEY.md §2.9).
    """

    def __init__(self, mesh: Optional[Mesh] = None, atlas_size: int = 256):
        from ..renderer import FigRenderer

        self.mesh = mesh if mesh is not None else default_mesh()
        self.n = self.mesh.shape[ROWS_AXIS]
        # reuse the single-chip renderer for flattening + atlas management
        self._flattener = FigRenderer(atlas_size=atlas_size, use_pallas=False)
        self._blur = make_sharded_blur(self.mesh)
        self.last_frame = None

    def render_frame(self, renders, frame_size, clear_main=True,
                     clear_color=(1.0, 1.0, 1.0, 1.0)):
        """Flatten on host, rasterize row-sharded; returns global (H, W, 4)."""
        import numpy as np
        from jax.sharding import NamedSharding

        from ..basics import scaled
        from ..colors import as_color
        from ..executor import FRAME_TARGET
        from ..ops.layout import QF_WIDTH, QI_WIDTH
        from ..renderer import _bucket
        from ..tape import BlurItem, ClearMaskItem, DrawItem

        fs = scaled(frame_size)
        self._flattener.process_image_messages()
        tape = self._flattener.flatten(renders, fs, clear_main,
                                       as_color(clear_color))
        width = int(round(tape.frame_size[0]))
        height = -(-int(round(tape.frame_size[1])) // self.n) * self.n  # pad rows

        cap = _bucket(max(tape.count, 1))
        fields = np.zeros((cap, QF_WIDTH), np.float32)
        modes = np.zeros((cap, QI_WIDTH), np.int32)
        fields[: tape.count] = tape.fields[: tape.count]
        modes[: tape.count] = tape.modes[: tape.count]
        fields_d = jnp.asarray(fields)
        modes_d = jnp.asarray(modes)

        frame_sh = NamedSharding(self.mesh, P(ROWS_AXIS, None, None))
        masks_sh = NamedSharding(self.mesh, P(None, ROWS_AXIS, None))
        cc = tape.clear_color or (0, 0, 0, 0)
        frame = jax.device_put(
            jnp.broadcast_to(
                jnp.asarray(cc, jnp.float32), (height, width, 4)
            ),
            frame_sh,
        )
        n_masks = tape.mask_count + 1
        masks = jax.device_put(
            jnp.zeros((n_masks, height, width), jnp.float32).at[0].set(1.0),
            masks_sh,
        )
        backdrop = jax.device_put(
            jnp.zeros((height, width, 4), jnp.float32), frame_sh
        )

        atlas = self._flattener._device_atlas()
        for item in tape.items:
            if isinstance(item, BlurItem):
                backdrop = self._blur(frame, jnp.float32(item.radius))
            elif isinstance(item, ClearMaskItem):
                masks = masks.at[item.index].set(0.0)
            elif isinstance(item, DrawItem) and item.target == FRAME_TARGET:
                frame = self._draw_range(
                    fields_d, modes_d, item.start, item.end, frame, masks,
                    backdrop, atlas,
                )
            else:  # mask-plane write, row-sharded like the frame
                masks = self._mask_range(
                    fields_d, modes_d, item.start, item.end, item.target,
                    masks, atlas,
                )
        self.last_frame = frame
        return frame[: int(round(tape.frame_size[1]))]

    def _draw_range(self, fields, modes, start, end, frame, masks, backdrop,
                    atlas):
        # make_sharded_draw_pass composites [0, count); generalize via the
        # range-aware core
        import functools

        if not hasattr(self, "_draw_range_fn"):
            mesh = self.mesh

            @functools.partial(
                shard_map,
                mesh=mesh,
                in_specs=(
                    P(), P(), P(), P(),
                    P(ROWS_AXIS, None, None),
                    P(None, ROWS_AXIS, None),
                    P(ROWS_AXIS, None, None),
                    P(),
                ),
                out_specs=P(ROWS_AXIS, None, None),
                check_rep=False,
            )
            def draw(fields, modes, s, e, frame, masks, backdrop, atlas):
                local_h = frame.shape[0]
                row0 = jax.lax.axis_index(ROWS_AXIS) * local_h
                return raster_ref.draw_pass_frame_range(
                    fields, modes, s, e, frame, masks,
                    atlas=atlas,
                    backdrop=backdrop,
                    y_offset=row0.astype(jnp.float32),
                )

            self._draw_range_fn = jax.jit(draw)
        return self._draw_range_fn(
            fields, modes, jnp.int32(start), jnp.int32(end), frame, masks,
            backdrop, atlas,
        )

    def _mask_range(self, fields, modes, start, end, target, masks, atlas):
        """Row-sharded mask-plane write: per-pixel a^2 + m(1-a), no cross-row
        dependence, so the band split is free."""
        import functools

        if not hasattr(self, "_mask_range_fn"):
            mesh = self.mesh

            @functools.partial(
                shard_map,
                mesh=mesh,
                in_specs=(
                    P(), P(), P(), P(), P(),
                    P(None, ROWS_AXIS, None),
                    P(),
                ),
                out_specs=P(None, ROWS_AXIS, None),
                check_rep=False,
            )
            def write(fields, modes, s, e, target, masks, atlas):
                local_h = masks.shape[1]
                row0 = jax.lax.axis_index(ROWS_AXIS) * local_h
                plane = jax.lax.dynamic_index_in_dim(masks, target, 0,
                                                     keepdims=False)
                plane = raster_ref.draw_pass_mask_range(
                    fields, modes, s, e, plane, masks, atlas=atlas,
                    y_offset=row0.astype(jnp.float32),
                )
                return jax.lax.dynamic_update_index_in_dim(
                    masks, plane, target, 0
                )

            self._mask_range_fn = jax.jit(write)
        return self._mask_range_fn(
            fields, modes, jnp.int32(start), jnp.int32(end),
            jnp.int32(target), masks, atlas,
        )
