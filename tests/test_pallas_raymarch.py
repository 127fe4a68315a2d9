"""Pallas kernel vs XLA oracle (interpret mode on CPU; hardware on TPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amrvolumerenderer_tpu.camera import camera_basis
from amrvolumerenderer_tpu.ops.pallas_raymarch import (
    TILE_P,
    pack_camera,
    pallas_render_bucket,
)
from amrvolumerenderer_tpu.ops.raymarch import (
    max_steps_for_bucket,
    render_brick_bucket,
)
from amrvolumerenderer_tpu.types import CameraParameters


def run_both(data, bmin, bmax, lut, step, camera, width, height):
    """Run oracle and Pallas kernel on the same (pre-transformed) bricks."""
    forward, right, up = camera_basis(camera)
    num_bricks = data.shape[0]
    num_steps = max_steps_for_bucket(bmin, bmax, step)

    dims = np.stack([np.array(d.shape, np.int32) for d in data])
    oracle_c, oracle_d = render_brick_bucket(
        jnp.asarray(data),
        jnp.asarray(bmin.astype(np.float32)),
        jnp.asarray(bmax.astype(np.float32)),
        jnp.asarray(dims),
        jnp.asarray(lut),
        jnp.asarray(step.astype(np.float32)),
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

    extent = bmax - bmin
    mesh_eps = np.linalg.norm(extent, axis=-1) * 1e-4
    meta = np.concatenate(
        [bmin, bmax, step[:, None], mesh_eps[:, None]], axis=-1
    ).astype(np.float32)
    dims4 = np.concatenate(
        [dims, np.zeros((num_bricks, 1), np.int32)], axis=-1
    )
    aspect = width / max(height, 1)
    cam = pack_camera(
        np.asarray(camera.eye), forward, right, up,
        math.tan(camera.fov_y_degrees * 0.5 * math.pi / 180.0), aspect,
        0.0, 1.0, 1.0,
    )
    pallas_c, pallas_d = pallas_render_bucket(
        jnp.asarray(data),
        jnp.asarray(meta),
        jnp.asarray(dims4),
        jnp.asarray(lut),
        jnp.asarray(cam),
        width=width,
        height=height,
        num_steps=num_steps,
        apply_clip=False,
        interpret=jax.default_backend() == "cpu",
    )
    return (
        np.asarray(oracle_c),
        np.asarray(oracle_d),
        np.asarray(pallas_c),
        np.asarray(pallas_d),
    )


@pytest.fixture
def camera():
    return CameraParameters(
        eye=(0.5, 0.5, 3.0), look_at=(0.5, 0.5, 0.5), up=(0.0, 1.0, 0.0),
        fov_y_degrees=45.0, near_plane=0.1, far_plane=10.0,
    )


def test_pallas_matches_oracle(camera):
    rng = np.random.default_rng(11)
    width = height = 32  # 1024 pixels = 1 tile
    data = rng.uniform(0, 1, (2, 8, 8, 8)).astype(np.float32)
    bmin = np.array([[0.0, 0.0, 0.0], [0.3, 0.3, 0.3]])
    bmax = np.array([[1.0, 1.0, 1.0], [0.8, 0.8, 0.8]])
    lut = np.tile(
        np.stack(
            [
                np.linspace(0, 1, 256),
                np.full(256, 0.4),
                np.linspace(1, 0, 256),
                np.linspace(0.05, 0.5, 256),
            ],
            axis=-1,
        ).astype(np.float32)[None],
        (2, 1, 1),
    )
    step = np.array([0.0625, 0.04])

    oc, od, pc, pd = run_both(data, bmin, bmax, lut, step, camera, width, height)
    np.testing.assert_allclose(pc, oc, atol=3e-5)
    finite = np.isfinite(od)
    np.testing.assert_array_equal(np.isfinite(pd), finite)
    np.testing.assert_allclose(pd[finite], od[finite], atol=1e-4)


def test_pallas_multi_tile(camera):
    rng = np.random.default_rng(12)
    width, height = 64, 32  # 2048 pixels = 2 tiles
    data = rng.uniform(0, 1, (1, 4, 4, 4)).astype(np.float32)
    bmin = np.array([[0.1, 0.1, 0.1]])
    bmax = np.array([[0.9, 0.9, 0.9]])
    lut = np.tile(
        np.linspace(0, 0.6, 256 * 4).reshape(256, 4).astype(np.float32)[None],
        (1, 1, 1),
    )
    step = np.array([0.1])
    oc, od, pc, pd = run_both(data, bmin, bmax, lut, step, camera, width, height)
    np.testing.assert_allclose(pc, oc, atol=3e-5)
