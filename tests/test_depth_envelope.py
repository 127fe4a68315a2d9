"""Adversarial exactness tests for the depth-contiguous multichip pipeline.

The depth-contiguous exchange pre-composites each device's contiguous depth
run locally (parallel/directsend.py render_depth_contiguous_slicemarch);
this is exact when per-pixel depth order is consistent with the brick
depth-hint order (the convexified-AMR case).  These tests probe the
envelope's documented edges — camera inside the brick cloud, bricks with
IDENTICAL depth hints, the eye exactly on a shared brick corner — and
assert the depth pipeline stays pixel-identical to the layered exchange
(the direct mapping of DirectSendBase.cpp:316-458) and to the
single-device fold.
"""

import numpy as np
import pytest

from amrvolumerenderer_tpu import api
from amrvolumerenderer_tpu.camera import compute_box_depth_hints
from amrvolumerenderer_tpu.renderer import render_scene
from amrvolumerenderer_tpu.types import CameraParameters, RenderParameters


@pytest.fixture
def geometry(r2_scene):
    levels, geoms = r2_scene
    data = api.AmrData(level_data=levels, level_geometry=geoms)
    return api.load_amr_geometry(data, 0, -1, 0, False, True, verbose=False)


def _render_all_pipelines(geometry, camera, **param_kw):
    frames = {}
    for pipeline in ("depth", "layered"):
        params = RenderParameters(
            width=32, height=32, devices=8, multichip_pipeline=pipeline,
            **param_kw,
        )
        img, _ = render_scene(
            "", params, geometry, camera=camera, verbose=False
        )
        frames[pipeline] = np.asarray(img.pixels)
    single = RenderParameters(width=32, height=32, **param_kw)
    img1, _ = render_scene(
        "", single, geometry, camera=camera, verbose=False,
        method="slicemarch",
    )
    frames["single"] = np.asarray(img1.pixels)
    return frames


def _assert_identical(frames):
    assert frames["single"][:, 3].max() > 0.05  # something rendered
    np.testing.assert_allclose(
        frames["depth"][:, :4], frames["layered"][:, :4], atol=1e-5
    )
    np.testing.assert_allclose(
        frames["depth"][:, :4], frames["single"][:, :4], atol=1e-5
    )


def test_camera_inside_brick_cloud(geometry):
    """Eye strictly inside the 2x2x2 brick cloud: every brick's hint is
    negative or tiny and several bricks surround the eye."""
    camera = CameraParameters(
        eye=(0.52, 0.47, 0.5), look_at=(1.5, 1.2, 0.9), up=(0.0, 1.0, 0.0)
    )
    _assert_identical(_render_all_pipelines(geometry, camera))


def test_identical_depth_hints_across_devices(geometry):
    """Head-on camera: the scene's symmetric brick rings tie exactly in
    depth hint, so the device-chunk boundaries of the depth-contiguous
    assignment split tied groups."""
    camera = CameraParameters(
        eye=(0.5, 0.5, -1.5), look_at=(0.5, 0.5, 0.5), up=(0.0, 1.0, 0.0)
    )
    mins = np.array([b.min_corner for b in geometry.bricks])
    maxs = np.array([b.max_corner for b in geometry.bricks])
    hints = compute_box_depth_hints(mins, maxs, camera)
    # the premise: ties exist (4-way symmetric rings)
    assert len(np.unique(hints)) < len(hints)
    _assert_identical(_render_all_pipelines(geometry, camera))


def test_eye_on_shared_brick_corner(geometry):
    """Eye exactly on the corner shared by all 8 bricks: boundary-inclusion
    conventions in the AABB slab test are maximally stressed."""
    camera = CameraParameters(
        eye=(0.5, 0.5, 0.5), look_at=(0.5, 0.5, 2.0), up=(0.0, 1.0, 0.0)
    )
    _assert_identical(_render_all_pipelines(geometry, camera))


def test_identical_hints_trilinear(geometry):
    """The tie case through the trilinear + ghost-ring path."""
    camera = CameraParameters(
        eye=(0.5, 0.5, -1.5), look_at=(0.5, 0.5, 0.5), up=(0.0, 1.0, 0.0)
    )
    _assert_identical(
        _render_all_pipelines(geometry, camera, sampling="trilinear")
    )
