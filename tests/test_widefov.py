"""Wide-FOV / oblique-ray parity: slice-march vs the raymarch oracle.

VERDICT r1 flagged the slice-march ``marchable`` guard (|d_a| <= 1e-8
along the global march axis) as untested at wide FOV with off-axis bricks.
These tests lock the measured result: at fov_y in {90, 120} (and beyond)
the integrator stays within the reference tolerance contract
(ImageFullTest.cpp:56-85: per-channel 0.02, <=2% bad pixels) everywhere,
including bricks far off the view axis where rays are most oblique to the
march axis.  A truly guard-dropped ray needs |d_a| <= 1e-8, i.e. a ray at
90 degrees to the camera's dominant forward axis — unreachable for a
perspective camera below fov 180 (at fov 120 the corner ray still has
|d_a| >= 0.38).  The reference has no such exclusion
(VolumePainter.cpp:775-809) but also cannot generate such rays.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from amrvolumerenderer_tpu.camera import camera_basis
from amrvolumerenderer_tpu.ops.raymarch import (
    max_steps_for_bucket,
    render_brick_bucket,
)
from amrvolumerenderer_tpu.types import CameraParameters

from test_slicemarch import make_lut, run_kernel


def _oracle(field, bmin, bmax, lut, step, cam, width, height):
    n = field.shape[0]
    forward, right, up = camera_basis(cam)
    dims = np.array([[n, n, n]], np.int32)
    colors, _ = render_brick_bucket(
        jnp.asarray(field[None]),
        jnp.asarray(bmin[None].astype(np.float32)),
        jnp.asarray(bmax[None].astype(np.float32)),
        jnp.asarray(dims),
        jnp.asarray(lut[None]),
        jnp.asarray(np.array([step], np.float32)),
        jnp.asarray(cam.eye, dtype=jnp.float32),
        jnp.asarray(forward, dtype=jnp.float32),
        jnp.asarray(right, dtype=jnp.float32),
        jnp.asarray(up, dtype=jnp.float32),
        jnp.float32(cam.fov_y_degrees), jnp.float32(0.0), jnp.float32(1.0),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1.0),
        width=width, height=height,
        num_steps=max_steps_for_bucket(
            bmin[None], bmax[None], np.array([step])
        ),
        log_scale=False, normalize=False, clip_start=1.0, apply_clip=False,
    )
    return np.asarray(colors[0])


@pytest.mark.parametrize(
    "fov,bmin_t",
    [
        (90.0, (0.0, 0.0, 0.0)),      # head-on
        (90.0, (2.0, 0.5, -1.0)),     # off-axis: oblique rays
        (90.0, (-3.5, 0.0, 0.0)),     # far off-axis, opposite side
        (120.0, (0.0, 0.0, 0.0)),
        (120.0, (2.0, 0.5, -1.0)),
        (120.0, (-3.5, 0.0, 0.0)),    # mixed-sign tile directions
    ],
)
def test_widefov_slicemarch_matches_oracle(fov, bmin_t):
    n = 16
    coords = (np.arange(n) + 0.5) / n
    field = (
        coords[:, None, None] * 0.3
        + coords[None, :, None] * 0.4
        + coords[None, None, :] * 0.3
    ).astype(np.float32)
    bmin = np.array(bmin_t, float)
    bmax = bmin + 1.0
    lut = make_lut()
    width = height = 32
    step = 0.5 / n
    cam = CameraParameters(
        eye=(0.5, 0.5, 3.5), look_at=(0.5, 0.5, 0.5), up=(0, 1, 0),
        fov_y_degrees=fov, near_plane=0.1, far_plane=20.0,
    )

    oracle_c = _oracle(field, bmin, bmax, lut, step, cam, width, height)
    slice_c, _ = run_kernel(field, bmin, bmax, 2, lut, step, cam, width, height)

    diff = np.abs(slice_c - oracle_c)
    bad = (diff > 0.02).any(axis=-1)
    assert bad.mean() <= 0.02, f"bad pixel fraction {bad.mean():.3f}"
    assert diff.mean() < 0.002, f"mean abs diff {diff.mean():.4f}"
    # energy parity: the guard must not drop ray segments
    assert np.isclose(slice_c.sum(), oracle_c.sum(), rtol=0.05, atol=0.5), (
        slice_c.sum(), oracle_c.sum(),
    )


def test_widefov_grazing_rays_keep_energy():
    """The most oblique reachable configuration: fov 120 with the brick at
    the frame edge.  If the marchable guard dropped segments, the slice
    image would lose integrated energy vs the oracle."""
    n = 16
    field = np.full((n, n, n), 0.6, np.float32)
    bmin = np.array([-5.0, -0.5, 0.0])
    bmax = bmin + 1.0
    lut = make_lut()
    cam = CameraParameters(
        eye=(0.5, 0.5, 3.5), look_at=(0.5, 0.5, 0.5), up=(0, 1, 0),
        fov_y_degrees=120.0, near_plane=0.1, far_plane=40.0,
    )
    step = 0.5 / n
    oracle_c = _oracle(field, bmin, bmax, lut, step, cam, 32, 32)
    slice_c, _ = run_kernel(field, bmin, bmax, 2, lut, step, cam, 32, 32)
    assert oracle_c.sum() > 1.0  # the brick is actually visible
    assert np.isclose(slice_c.sum(), oracle_c.sum(), rtol=0.05)
