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
from jax.experimental.shard_map import shard_map

from ..ops import raster_ref
from ..ops.blur import TAP_RADIUS, _blur_axis

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
    halo = int(max_radius)
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
        # halo exchange: receive the last `halo` rows of the upper neighbor and
        # the first `halo` rows of the lower neighbor
        up = [(i, (i + 1) % axis_size) for i in range(axis_size)]
        down = [(i, (i - 1) % axis_size) for i in range(axis_size)]
        from_above = jax.lax.ppermute(local[-halo:], ROWS_AXIS, up)
        from_below = jax.lax.ppermute(local[:halo], ROWS_AXIS, down)
        idx = jax.lax.axis_index(ROWS_AXIS)
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
