#!/usr/bin/env python3
"""Gradient-based transfer-function fitting (differentiable rendering demo).

No reference analogue: the reference renderer is forward-only.  This
example renders a target image with a known transfer function, then
recovers that transfer function from a flat initial guess by gradient
descent through the renderer itself (``amrvolumerenderer_tpu.diff``),
using optax Adam.  The same machinery supports volume fitting (optimize
the data instead of the LUT) and camera/sensitivity analysis.
"""

from __future__ import annotations

import argparse
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from amrvolumerenderer_tpu import diff
from amrvolumerenderer_tpu.camera import camera_basis
from amrvolumerenderer_tpu.types import CameraParameters


def build_scene(size: int, image_size: int):
    rng = np.random.default_rng(17)
    data = rng.uniform(0.1, 0.9, size=(size, size, size)).astype(np.float32)
    camera = CameraParameters(
        eye=(0.5, 0.5, 3.0), look_at=(0.5, 0.5, 0.5), up=(0.0, 1.0, 0.0)
    )
    forward, right, up = camera_basis(camera)
    step = 0.5 / size
    args = (
        jnp.asarray(data)[None],
        jnp.zeros((1, 3), jnp.float32),
        jnp.ones((1, 3), jnp.float32),
        jnp.full((1, 3), size, jnp.int32),
        # LUT slot filled per call
        jnp.asarray([step], jnp.float32),
        jnp.asarray(camera.eye, jnp.float32),
        jnp.asarray(forward, jnp.float32),
        jnp.asarray(right, jnp.float32),
        jnp.asarray(up, jnp.float32),
        jnp.float32(camera.fov_y_degrees),
        jnp.float32(0.0),
        jnp.float32(1.0),
    )
    static = dict(width=image_size, height=image_size, num_steps=4 * size)
    return args, static


def ramp_lut(size: int, peak_alpha: float) -> np.ndarray:
    t = np.linspace(0.0, 1.0, size, dtype=np.float32)
    lut = np.stack([t, 0.4 * np.ones_like(t), 1.0 - t, peak_alpha * t], axis=1)
    return lut


def main(argv: Optional[Sequence[str]] = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=60)
    parser.add_argument("--volume-size", type=int, default=8)
    parser.add_argument("--image-size", type=int, default=24)
    parser.add_argument("--lut-size", type=int, default=32)
    args_ns = parser.parse_args(argv)

    import optax

    scene_args, static = build_scene(args_ns.volume_size, args_ns.image_size)

    target_lut = jnp.asarray(ramp_lut(args_ns.lut_size, peak_alpha=0.5))[None]
    target = diff.render_image_diff(
        *scene_args[:4], target_lut, *scene_args[4:], **static
    )

    def loss_fn(lut):
        image = diff.render_image_diff(
            *scene_args[:4], lut, *scene_args[4:], **static
        )
        return jnp.mean((image - target) ** 2)

    lut = jnp.asarray(ramp_lut(args_ns.lut_size, peak_alpha=0.1))[None]
    optimizer = optax.adam(3e-2)
    opt_state = optimizer.init(lut)
    value_and_grad = jax.jit(jax.value_and_grad(loss_fn))

    initial = None
    for step in range(args_ns.steps):
        val, grad = value_and_grad(lut)
        if initial is None:
            initial = float(val)
        updates, opt_state = optimizer.update(grad, opt_state)
        # project back into [0, 1] AFTER the update: clipping inside the
        # loss would zero the gradient of any out-of-range entry and
        # freeze it there permanently
        lut = jnp.clip(optax.apply_updates(lut, updates), 0.0, 1.0)
        if step % 10 == 0 or step == args_ns.steps - 1:
            print(f"step {step:4d}  loss {float(val):.6g}")

    final = float(value_and_grad(lut)[0])
    print(f"loss: {initial:.6g} -> {final:.6g} "
          f"({initial / max(final, 1e-30):.1f}x reduction)")
    return 0 if final < 0.1 * initial else 1


if __name__ == "__main__":
    raise SystemExit(main())
