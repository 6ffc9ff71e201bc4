"""Separable gaussian backdrop blur.

Port of the reference's two-pass 17-tap blur
(/root/reference/src/figdraw/opengl/glsl/blur.frag:11-33 +
glcontext.nim:1743-1831): radius clamped to 64, sigma = radius/2, tap step =
max(radius/8, 1) px, 8 taps each side, clamp-to-edge sampling, no blend.
Expressed as a gather over 17 shifted images — XLA fuses this into a tight
vectorized stencil; a Pallas variant is unnecessary at 17 taps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

TAP_RADIUS = 8


def _blur_axis(img: jnp.ndarray, radius, axis: int) -> jnp.ndarray:
    """One separable pass along `axis` (0 = vertical, 1 = horizontal)."""
    r = jnp.clip(radius, 0.0, 64.0)
    sigma = jnp.maximum(0.5 * r, 0.5)
    step_px = jnp.maximum(r / TAP_RADIUS, 1.0)
    n = img.shape[axis]

    # sample position per tap: x + i*step, linearly interpolated, clamp-to-edge
    coords = jnp.arange(n, dtype=jnp.float32)
    acc = jnp.zeros_like(img)
    weight_sum = jnp.zeros((), dtype=img.dtype)
    for i in range(-TAP_RADIUS, TAP_RADIUS + 1):
        x = i * step_px
        w = jnp.exp(-0.5 * (x * x) / (sigma * sigma))
        pos = coords + x
        p0 = jnp.floor(pos)
        frac = pos - p0
        i0 = jnp.clip(p0.astype(jnp.int32), 0, n - 1)
        i1 = jnp.clip(i0 + 1, 0, n - 1)
        s0 = jnp.take(img, i0, axis=axis)
        s1 = jnp.take(img, i1, axis=axis)
        fr_shape = [1] * img.ndim
        fr_shape[axis] = n
        fr = frac.reshape(fr_shape)
        acc = acc + (s0 * (1.0 - fr) + s1 * fr) * w
        weight_sum = weight_sum + w

    out = acc / jnp.maximum(weight_sum, 1e-5)
    return jnp.where(r <= 0.5, img, out)


@jax.jit
def backdrop_blur(frame: jnp.ndarray, radius) -> jnp.ndarray:
    """Two-pass separable gaussian over an (H, W, 4) frame: H then V, matching
    runBackdropSeparableBlur's pass order (glcontext.nim:1760-1780)."""
    out = _blur_axis(frame, radius, axis=1)
    out = _blur_axis(out, radius, axis=0)
    return out


def backdrop_blur_planar(frame_planes: jnp.ndarray, radius) -> jnp.ndarray:
    """Same blur on a channel-planar (4, H, W) frame (the executor's layout)."""
    out = _blur_axis(frame_planes, radius, axis=2)
    out = _blur_axis(out, radius, axis=1)
    return out
