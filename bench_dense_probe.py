"""Dense-scene device-cost dissection (the 28k-quad datapoint of bench.py).

Times the pieces of the fused frame separately on the real chip so the
9-12 ms FIGDRAW_BENCH_COPIES=4000 frame can be attributed: the binning
argsort, the chunked Pallas tile walk, and the end-to-end fused dispatch.
Each probe jits separately (cold compiles are minutes through the tunnel;
results land in the persistent cache).

FIGDRAW_BENCH_COPIES scales the scene (default 4000 = ~28k quads).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

COPIES = int(os.environ.get("FIGDRAW_BENCH_COPIES", "4000"))
W, H = 1920, 1080
REPS = int(os.environ.get("FIGDRAW_BENCH_REPS", "8"))


def t_ms(fn, *args):
    out = fn(*args)
    out = out[0] if isinstance(out, tuple) else out
    out.block_until_ready()
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        out = out[0] if isinstance(out, tuple) else out
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) * 1000.0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from figdraw_tpu import FigRenderer, vec2
    from figdraw_tpu.scenes import make_render_tree_array
    from figdraw_tpu.ops import raster_pallas as rp
    from figdraw_tpu.ops.binning import bin_quads
    import figdraw_tpu.executor as ex

    ren = FigRenderer(atlas_size=256, use_pallas=True)
    size = vec2(W, H)
    cache = {}
    scene = make_render_tree_array(W, H, 0, copies=COPIES, cache=cache)
    tape = ren.flatten(scene, size)
    n = tape.count
    print(f"quads={n} items={len(tape.items)} mask_count={tape.mask_count}",
          file=sys.stderr)

    th = ex.pick_tile_h(tape.fields, n, H, W)
    tw = rp.TILE_W
    tiles_y = -(-H // th)
    tiles_x = -(-W // tw)
    ph, pw = tiles_y * th, tiles_x * tw
    print(f"tile_h={th} grid={tiles_y}x{tiles_x}", file=sys.stderr)

    # pad like the executor's upload bucketing: whole VMEM chunks so every
    # chunked pallas_call sees a full-width tile_idx block
    n_pad = -(-n // rp.VMEM_QUAD_CHUNK) * rp.VMEM_QUAD_CHUNK
    fields = jnp.asarray(
        np.pad(tape.fields[:n], ((0, n_pad - n), (0, 0))))
    modes = jnp.asarray(np.pad(tape.modes[:n], ((0, n_pad - n), (0, 0))))

    # --- binning alone ---------------------------------------------------------
    binf = jax.jit(lambda f, m: bin_quads(
        f, jnp.int32(0), jnp.int32(n), tiles_y, tiles_x, th, tw, modes=m))
    ms_bin = t_ms(binf, fields, modes)
    print(f"bin_quads (argsort {tiles_y * tiles_x}x{n}): {ms_bin:.2f} ms")

    # --- tile walk alone (prebinned) --------------------------------------------
    tile_idx, tile_counts = jax.jit(lambda f, m: rp.prebin(
        f, jnp.int32(n), ph, pw, tile_h=th, tile_w=tw, modes=m))(fields, modes)
    tile_idx.block_until_ready()
    frame = jnp.zeros((4, ph, pw), jnp.float32)
    masks = jnp.zeros((1, ph, pw), jnp.float32).at[0].set(1.0)
    walkf = jax.jit(lambda f, m, ti, tc, fr, mk: rp.draw_pass_planar_prebinned(
        f, m, jnp.int32(0), jnp.int32(n), ti, tc, fr, mk,
        tile_h=th, tile_w=tw))
    ms_walk = t_ms(walkf, fields, modes, tile_idx, tile_counts, frame, masks)
    print(f"tile walk (chunked {n_pad // rp.VMEM_QUAD_CHUNK}x pallas): "
          f"{ms_walk:.2f} ms")

    # --- full fused frame (the bench.py path) -----------------------------------
    out = ren.render_frame(scene, size)
    out.block_until_ready()
    best = float("inf")
    flat_best = float("inf")
    for f_i in range(REPS):
        t0 = time.perf_counter()
        sc = make_render_tree_array(W, H, f_i + 1, copies=COPIES, cache=cache)
        tp = ren.flatten(sc, size)
        t1 = time.perf_counter()
        out = ren.execute(tp)
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t1) * 1000.0)
        flat_best = min(flat_best, (t1 - t0) * 1000.0)
    print(f"fused frame: flatten+pack {flat_best:.2f} ms, "
          f"upload+device {best:.2f} ms")


if __name__ == "__main__":
    main()
