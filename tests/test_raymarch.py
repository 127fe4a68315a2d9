"""Ray-march kernel tests: the jitted kernel vs a literal per-pixel port.

``scalar_raymarch`` below is a direct, scalar transcription of the reference
kernel loop (VolumePainter.cpp:735-922) used as a cross-validation oracle;
the jitted masked-loop kernel must match it (near) exactly.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from amrvolumerenderer_tpu.camera import camera_basis
from amrvolumerenderer_tpu.ops.raymarch import (
    max_steps_for_bucket,
    render_brick_bucket,
)
from amrvolumerenderer_tpu.types import CameraParameters


def scalar_raymarch(
    data, bmin, bmax, dims, lut, step, camera, width, height, range_min, range_max
):
    """Literal scalar port of the reference per-pixel loop (oracle)."""
    forward, right, up = camera_basis(camera)
    eye = camera.eye
    aspect = width / max(height, 1)
    tan_half_fov = math.tan(camera.fov_y_degrees * 0.5 * math.pi / 180.0)
    nx, ny, nz = dims
    dx = (bmax[0] - bmin[0]) / nx
    dy = (bmax[1] - bmin[1]) / ny
    dz = (bmax[2] - bmin[2]) / nz
    extent_mag = float(np.linalg.norm(np.asarray(bmax) - np.asarray(bmin)))
    mesh_eps = extent_mag * 1e-4
    inv_range = 1.0 / (range_max - range_min) if range_max != range_min else 1.0

    colors = np.zeros((height * width, 4), dtype=np.float32)
    depths = np.full(height * width, np.inf, dtype=np.float32)
    for index in range(width * height):
        px = index % width
        py = index // width
        ndc_x = (px + 0.5) / width * 2.0 - 1.0
        ndc_y = (py + 0.5) / height * 2.0 - 1.0
        d = (
            forward
            + ndc_x * tan_half_fov * aspect * right
            + ndc_y * tan_half_fov * up
        )
        norm = np.linalg.norm(d)
        if norm > 0:
            d = d / norm
        tmin, tmax = -math.inf, math.inf
        ok = True
        for axis in range(3):
            if abs(d[axis]) < 1e-8:
                if eye[axis] < bmin[axis] or eye[axis] > bmax[axis]:
                    ok = False
                continue
            t1 = (bmin[axis] - eye[axis]) / d[axis]
            t2 = (bmax[axis] - eye[axis]) / d[axis]
            if t1 > t2:
                t1, t2 = t2, t1
            tmin = max(tmin, t1)
            tmax = min(tmax, t2)
        if not ok or not (tmax >= tmin):
            continue
        dist = tmin + mesh_eps
        if dist < 0:
            dist = mesh_eps
        accum = np.zeros(4)

        def inside(p):
            return all(bmin[a] <= p[a] <= bmax[a] for a in range(3))

        pos = eye + d * dist
        while dist < tmax and not inside(pos):
            dist += step
            pos = eye + d * dist
        while dist < tmax and accum[3] < 1.0:
            if inside(pos):
                fx = (pos[0] - bmin[0]) / dx
                fy = (pos[1] - bmin[1]) / dy
                fz = (pos[2] - bmin[2]) / dz
                i = min(max(int(math.floor(fx)), 0), nx - 1)
                j = min(max(int(math.floor(fy)), 0), ny - 1)
                k = min(max(int(math.floor(fz)), 0), nz - 1)
                scalar = float(data[i, j, k])
                normalized = min(max((scalar - range_min) * inv_range, 0.0), 1.0)
                li = min(max(int(normalized * 255), 0), 255)
                sample = lut[li]
                alpha = sample[3] * (1.0 - accum[3])
                accum[:3] += sample[:3] * alpha
                accum[3] += alpha
            dist += step
            pos = eye + d * dist
        accum = np.clip(accum, 0.0, 1.0)
        colors[index] = accum
        if accum[3] > 0.0:
            entry = eye + d * tmin
            depths[index] = float(np.dot(entry - eye, forward))
    return colors, depths


def _run_kernel(data, bmin, bmax, lut, step, camera, width, height):
    forward, right, up = camera_basis(camera)
    num_steps = max_steps_for_bucket(
        np.asarray([bmin]), np.asarray([bmax]), np.asarray([step])
    )
    colors, depths = render_brick_bucket(
        jnp.asarray(data[None].astype(np.float32)),
        jnp.asarray(np.asarray([bmin], dtype=np.float32)),
        jnp.asarray(np.asarray([bmax], dtype=np.float32)),
        jnp.asarray(np.asarray([data.shape], dtype=np.int32)),
        jnp.asarray(lut[None]),
        jnp.asarray(np.asarray([step], dtype=np.float32)),
        jnp.asarray(camera.eye, dtype=jnp.float32),
        jnp.asarray(forward, dtype=jnp.float32),
        jnp.asarray(right, dtype=jnp.float32),
        jnp.asarray(up, dtype=jnp.float32),
        jnp.float32(camera.fov_y_degrees),
        jnp.float32(0.0),
        jnp.float32(1.0),
        jnp.float32(0.0),
        jnp.float32(0.0),
        jnp.float32(1.0),
        width=width,
        height=height,
        num_steps=num_steps,
        log_scale=False,
        normalize=False,
        clip_start=1.0,
        apply_clip=False,
    )
    return np.asarray(colors[0]), np.asarray(depths[0])


@pytest.fixture
def simple_camera():
    return CameraParameters(
        eye=(0.5, 0.5, 3.0),
        look_at=(0.5, 0.5, 0.5),
        up=(0.0, 1.0, 0.0),
        fov_y_degrees=45.0,
        near_plane=0.1,
        far_plane=10.0,
    )


def test_kernel_matches_scalar_oracle(simple_camera):
    rng = np.random.default_rng(7)
    data = rng.uniform(0.0, 1.0, size=(8, 8, 8)).astype(np.float32)
    lut = np.zeros((256, 4), dtype=np.float32)
    lut[:, 0] = np.linspace(0, 1, 256)
    lut[:, 1] = 0.3
    lut[:, 3] = np.linspace(0.02, 0.4, 256)
    bmin, bmax = (0.0, 0.0, 0.0), (1.0, 1.0, 1.0)
    step = 0.0625  # 0.5 * (1/8)
    width = height = 16

    got_c, got_d = _run_kernel(data, bmin, bmax, lut, step, simple_camera, width, height)
    exp_c, exp_d = scalar_raymarch(
        data, bmin, bmax, (8, 8, 8), lut, step, simple_camera, width, height, 0.0, 1.0
    )
    np.testing.assert_allclose(got_c, exp_c, atol=2e-5)
    finite = np.isfinite(exp_d)
    np.testing.assert_array_equal(np.isfinite(got_d), finite)
    np.testing.assert_allclose(got_d[finite], exp_d[finite], atol=1e-4)


def test_miss_rays_are_empty(simple_camera):
    data = np.ones((4, 4, 4), dtype=np.float32)
    lut = np.ones((256, 4), dtype=np.float32)
    # tiny box far off to the side: corner pixels must miss
    colors, depths = _run_kernel(
        data, (5.0, 5.0, 0.0), (5.2, 5.2, 0.2), lut, 0.05, simple_camera, 8, 8
    )
    assert np.all(colors[:, 3] == 0.0)
    assert np.all(np.isinf(depths))


def test_opaque_box_saturates(simple_camera):
    data = np.ones((4, 4, 4), dtype=np.float32)
    lut = np.zeros((256, 4), dtype=np.float32)
    lut[:, 0] = 1.0
    lut[:, 3] = 1.0  # fully opaque samples
    colors, depths = _run_kernel(
        data, (0.0, 0.0, 0.0), (1.0, 1.0, 1.0), lut, 0.125, simple_camera, 8, 8
    )
    center = (8 // 2) * 8 + 8 // 2
    assert colors[center, 3] == pytest.approx(1.0)
    assert colors[center, 0] == pytest.approx(1.0)
    # depth equals the view-space distance to the entry plane z=1 => 2.0
    assert depths[center] == pytest.approx(2.0, abs=0.05)


def test_empty_lut_accumulates_nothing(simple_camera):
    data = np.ones((4, 4, 4), dtype=np.float32)
    lut = np.zeros((256, 4), dtype=np.float32)
    colors, depths = _run_kernel(
        data, (0.0, 0.0, 0.0), (1.0, 1.0, 1.0), lut, 0.125, simple_camera, 8, 8
    )
    assert np.all(colors == 0.0)
    assert np.all(np.isinf(depths))
