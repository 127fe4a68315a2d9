"""Headline benchmark: volume ray-march throughput on one chip.

Renders the benchmark scene (BASELINE.md config 1 scaled up: a 64^3 domain
split into 32^3 bricks) at 1024x1024 and reports ray-cast throughput in
Grays/s against the 1 Gray/s/chip north-star target (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from amrvolumerenderer_tpu import api
    from amrvolumerenderer_tpu.camera import auto_orbit_camera
    from amrvolumerenderer_tpu.colormap import build_color_table
    from amrvolumerenderer_tpu.ops.raymarch import (
        max_steps_for_bucket,
        render_brick_bucket,
    )
    from amrvolumerenderer_tpu.renderer import (
        _build_camera_arrays,
        compute_global_bounds,
        compute_reference_sample_distance,
    )
    from amrvolumerenderer_tpu.scene import (
        LevelBox,
        LevelGeometry,
        build_brick_buckets,
    )

    width = height = 1024
    n_cells, box_size = 64, 32

    coords = np.arange(n_cells) / (n_cells - 1)
    field = (
        coords[:, None, None] ** 2
        + coords[None, :, None] ** 2
        + coords[None, None, :] ** 2
    )
    boxes = []
    for i0 in range(0, n_cells, box_size):
        for j0 in range(0, n_cells, box_size):
            for k0 in range(0, n_cells, box_size):
                boxes.append(
                    LevelBox(
                        data=field[
                            i0 : i0 + box_size,
                            j0 : j0 + box_size,
                            k0 : k0 + box_size,
                        ],
                        lo=np.array([i0, j0, k0]),
                    )
                )
    geom = LevelGeometry(prob_lo=np.zeros(3), cell_size=np.full(3, 1.0 / n_cells))
    data = api.AmrData(level_data=[boxes], level_geometry=[geom])
    geometry = api.load_amr_geometry(data, 0, -1, 0, False, True, verbose=False)

    bounds = compute_global_bounds(geometry)
    camera = auto_orbit_camera(bounds)
    ref_dist = compute_reference_sample_distance(geometry, bounds)
    scalar_range = geometry.scalar_range
    t = geometry.scalar_transform
    eye, fwd, right, up = _build_camera_arrays(camera)

    bucket = build_brick_buckets(geometry.bricks)[0]
    n = len(bucket.brick_indices)
    steps = np.zeros(n, dtype=np.float32)
    luts = np.zeros((n, 256, 4), dtype=np.float32)
    for slot, idx in enumerate(bucket.brick_indices):
        b = geometry.bricks[int(idx)]
        sd = max(b.min_spacing() * 0.5, 1e-5)
        steps[slot] = sd
        luts[slot] = build_color_table(1.0, sd / ref_dist, scalar_range, None)
    num_steps = max_steps_for_bucket(bucket.min_corner, bucket.max_corner, steps)

    args = (
        jnp.asarray(bucket.data),
        jnp.asarray(bucket.min_corner),
        jnp.asarray(bucket.max_corner),
        jnp.asarray(bucket.cell_dims),
        jnp.asarray(luts),
        jnp.asarray(steps),
        eye,
        fwd,
        right,
        up,
        jnp.float32(camera.fov_y_degrees),
        jnp.float32(scalar_range[0]),
        jnp.float32(1.0 / (scalar_range[1] - scalar_range[0])),
        jnp.float32(t.positive_floor),
        jnp.float32(t.normalization_min),
        jnp.float32(t.inverse_normalization_span),
    )
    kwargs = dict(
        width=width,
        height=height,
        num_steps=num_steps,
        log_scale=bool(t.log_scale_input),
        normalize=bool(t.normalize_to_unit_range),
        clip_start=1.0,
        apply_clip=False,
    )

    # warmup / compile
    colors, depths = render_brick_bucket(*args, **kwargs)
    jax.block_until_ready((colors, depths))

    iters = 5
    start = time.perf_counter()
    for _ in range(iters):
        colors, depths = render_brick_bucket(*args, **kwargs)
    jax.block_until_ready((colors, depths))
    elapsed = (time.perf_counter() - start) / iters

    rays = width * height * n  # one ray per pixel per brick layer
    grays_per_s = rays / elapsed / 1e9
    print(
        json.dumps(
            {
                "metric": "ray_throughput",
                "value": round(grays_per_s, 4),
                "unit": "Gray/s",
                "vs_baseline": round(grays_per_s / 1.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
