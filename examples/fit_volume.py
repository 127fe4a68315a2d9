#!/usr/bin/env python3
"""Multi-view volume reconstruction (differentiable rendering demo).

No reference analogue: the reference renderer is forward-only.  Renders a
target volume from several orbit cameras, then recovers the volume from a
uniform initial guess by Adam through the renderer
(``amrvolumerenderer_tpu.diff``) — the tomography-style inverse problem.
Demonstrates gradients with respect to the DATA (the transfer-function
demo, ``fit_transfer_function.py``, differentiates the LUT instead).
"""

from __future__ import annotations

import argparse
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from amrvolumerenderer_tpu import diff
from amrvolumerenderer_tpu.types import CameraParameters


def orbit_cameras(n_views: int, radius: float = 2.5):
    center = (0.5, 0.5, 0.5)
    cams = []
    for i in range(n_views):
        theta = 2.0 * math.pi * i / n_views
        eye = (
            0.5 + radius * math.cos(theta),
            0.5 + 0.4 * math.sin(2 * theta),
            0.5 + radius * math.sin(theta),
        )
        cams.append(CameraParameters(eye=eye, look_at=center, up=(0.0, 1.0, 0.0)))
    return cams


def target_volume(size: int) -> np.ndarray:
    c = (np.arange(size) + 0.5) / size
    x, y, z = np.meshgrid(c, c, c, indexing="ij")
    r2 = (x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2
    blob = np.exp(-r2 / 0.06)
    lobe = 0.5 * np.exp(-((x - 0.7) ** 2 + (y - 0.3) ** 2 + (z - 0.6) ** 2) / 0.02)
    return np.clip(blob + lobe, 0.0, 1.0).astype(np.float32)


def main(argv: Optional[Sequence[str]] = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=150)
    parser.add_argument("--volume-size", type=int, default=8)
    parser.add_argument("--image-size", type=int, default=20)
    parser.add_argument("--views", type=int, default=6)
    args_ns = parser.parse_args(argv)

    import optax

    truth = target_volume(args_ns.volume_size)
    bricks = [(truth, (0.0, 0.0, 0.0), (1.0, 1.0, 1.0))]
    views = []
    for cam in orbit_cameras(args_ns.views):
        scene_args, static = diff.prepare_scene(
            bricks, cam, width=args_ns.image_size, height=args_ns.image_size
        )
        target = diff.render_image_diff(*scene_args, **static)
        views.append((scene_args, static, target))

    def loss_fn(volume):
        total = 0.0
        for scene_args, static, target in views:
            image = diff.render_image_diff(
                volume[None], *scene_args[1:], **static
            )
            total = total + jnp.mean((image - target) ** 2)
        return total / len(views)

    volume = jnp.full(truth.shape, 0.3, dtype=jnp.float32)
    optimizer = optax.adam(5e-2)
    opt_state = optimizer.init(volume)
    value_and_grad = jax.jit(jax.value_and_grad(loss_fn))

    initial = None
    for step in range(args_ns.steps):
        val, grad = value_and_grad(volume)
        if initial is None:
            initial = float(val)
        updates, opt_state = optimizer.update(grad, opt_state)
        # project back into [0, 1] AFTER the update: clipping inside the
        # loss would zero the gradient of any out-of-range cell and
        # freeze it there permanently
        volume = jnp.clip(optax.apply_updates(volume, updates), 0.0, 1.0)
        if step % 25 == 0 or step == args_ns.steps - 1:
            print(f"step {step:4d}  loss {float(val):.6g}")

    final = float(value_and_grad(volume)[0])
    recovered = np.clip(np.asarray(volume), 0.0, 1.0)
    corr = float(np.corrcoef(recovered.ravel(), truth.ravel())[0, 1])
    print(f"loss: {initial:.6g} -> {final:.6g}; "
          f"volume correlation with truth: {corr:.3f}")
    return 0 if final < 0.1 * initial and corr > 0.6 else 1


if __name__ == "__main__":
    raise SystemExit(main())
