"""Device-side profiling: where do the 141 ms go?"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax
import jax.numpy as jnp

from figdraw_tpu import FigRenderer, vec2
from figdraw_tpu.scenes import make_render_tree
from figdraw_tpu.renderer import _bucket
from figdraw_tpu.ops.layout import QF_WIDTH, QI_WIDTH
from figdraw_tpu.ops import raster_pallas, raster_ref, binning
from figdraw_tpu.ops.blur import backdrop_blur

W, H = 1920, 1080
ren = FigRenderer(atlas_size=256, use_pallas=False)
tape = ren.flatten(make_render_tree(W, H, 0), vec2(W, H))
print("quads:", tape.count, "items:", [(type(i).__name__, getattr(i,'end',0)-getattr(i,'start',0)) for i in tape.items])

n = _bucket(tape.count)
fields = np.zeros((n, QF_WIDTH), np.float32); fields[:tape.count] = tape.fields[:tape.count]
modes = np.zeros((n, QI_WIDTH), np.int32); modes[:tape.count] = tape.modes[:tape.count]
fields_d = jnp.asarray(fields); modes_d = jnp.asarray(modes)
count = jnp.int32(tape.count)
frame = jnp.ones((H, W, 4), jnp.float32)
masks = jnp.ones((1, H, W), jnp.float32)

def timeit(name, fn, reps=10):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name}: {dt:.2f} ms")
    return out

ty, tx = -(-H // 128), -(-W // 128)
timeit("bin_quads", lambda: binning.bin_quads(fields_d, count, ty, tx, 128, 128))
timeit("pallas draw (no backdrop)", lambda: raster_pallas.draw_pass_frame(fields_d, modes_d, count, frame, masks))
timeit("blur", lambda: backdrop_blur(frame, jnp.float32(18.0)))
bd = jnp.zeros((H, W, 4), jnp.float32)
timeit("pallas draw (with backdrop)", lambda: raster_pallas.draw_pass_frame(fields_d, modes_d, count, frame, masks, backdrop=bd))
timeit("noop transfer", lambda: jnp.asarray(fields), reps=10)
# tile stats
tidx, counts = binning.bin_quads(fields_d, count, ty, tx, 128, 128)
c = np.asarray(counts)
print("tile quad counts: max", c.max(), "mean", c.mean(), "sum", c.sum())
