"""Camera math and RNG parity tests."""

import math

import numpy as np
import pytest

from amrvolumerenderer_tpu.camera import (
    MT19937,
    auto_orbit_camera,
    camera_basis,
    compute_box_depth_hint,
    make_perspective_matrix,
    make_view_matrix,
    safe_normalize,
)
from amrvolumerenderer_tpu.types import CameraParameters, VolumeBounds


def test_mt19937_known_values():
    # std::mt19937 reference outputs
    rng = MT19937(5489)
    assert rng.next_u32() == 3499211612
    rng = MT19937(1)
    assert rng.next_u32() == 1791095845


def test_mt19937_10000th():
    # C++ standard: the 10000th value of mt19937 default-seeded is 4123659995
    rng = MT19937(5489)
    for _ in range(9999):
        rng.next_u32()
    assert rng.next_u32() == 4123659995


def test_uniform_float_range():
    rng = MT19937(91021)
    vals = [rng.uniform_float(0.0, 2.0 * math.pi) for _ in range(100)]
    assert all(0.0 <= v < 2.0 * math.pi + 1e-5 for v in vals)


def test_safe_normalize():
    v = safe_normalize(np.array([3.0, 0.0, 4.0]))
    np.testing.assert_allclose(v, [0.6, 0.0, 0.8])
    # degenerate input falls back to -z (CameraUtils.hpp:21)
    np.testing.assert_allclose(safe_normalize(np.zeros(3)), [0.0, 0.0, -1.0])


def test_view_matrix_layout():
    eye = np.array([0.0, 0.0, 5.0])
    look = np.zeros(3)
    up = np.array([0.0, 1.0, 0.0])
    view = make_view_matrix(eye, look, up)
    # forward = -z; right = +x; columns hold the basis, row 3 the translation
    np.testing.assert_allclose(view[:3, 0], [1.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(view[:3, 1], [0.0, 1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(view[:3, 2], [0.0, 0.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(view[3, :3], [0.0, 0.0, -5.0], atol=1e-6)


def test_perspective_matrix_depth_ordering():
    """The reference's matrix layout (CameraUtils.hpp stores the basis in
    columns with translation in row 3) yields clip depths that *decrease*
    with distance from the eye; its visibility sort pops smaller depths
    first, i.e. back-to-front.  Verify we reproduce that convention."""
    from amrvolumerenderer_tpu.visibility import _compute_depth_range

    proj = make_perspective_matrix(45.0, 1.0, 0.1, 100.0)
    view = make_view_matrix(
        np.array([0.0, 0.0, 5.0]), np.zeros(3), np.array([0.0, 1.0, 0.0])
    )
    near_lo, near_hi = _compute_depth_range(
        view, proj, np.array([-0.5, -0.5, 3.0]), np.array([0.5, 0.5, 4.0])
    )
    far_lo, far_hi = _compute_depth_range(
        view, proj, np.array([-0.5, -0.5, -4.0]), np.array([0.5, 0.5, -3.0])
    )
    assert near_lo <= near_hi and far_lo <= far_hi
    # farther box sorts first (smaller depth) under the reference convention
    assert far_lo < near_lo


def test_auto_orbit_camera_deterministic():
    bounds = VolumeBounds((-1, -1, -1), (1, 1, 1))
    cam1 = auto_orbit_camera(bounds, 91021)
    cam2 = auto_orbit_camera(bounds, 91021)
    np.testing.assert_array_equal(cam1.eye, cam2.eye)
    assert cam1.fov_y_degrees == pytest.approx(45.0)
    assert cam1.near_plane == pytest.approx(0.1)
    # distance = r / tan(22.5deg) + max(0.25 r, 0.5); r = sqrt(3)
    r = math.sqrt(3.0)
    dist = r / math.tan(math.pi / 8) + max(0.25 * r, 0.5)
    assert cam1.far_plane == pytest.approx(4.0 * dist, rel=1e-6)
    assert np.linalg.norm(cam1.eye - cam1.look_at) == pytest.approx(dist, rel=1e-5)


def test_auto_orbit_camera_seed_changes_view():
    bounds = VolumeBounds((-1, -1, -1), (1, 1, 1))
    cam1 = auto_orbit_camera(bounds, 91021)
    cam2 = auto_orbit_camera(bounds, 12345)
    assert not np.allclose(cam1.eye, cam2.eye)


def test_box_depth_hint():
    cam = CameraParameters(
        eye=(0.0, 0.0, 10.0), look_at=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0)
    )
    # box [1,2]^3 in front of the camera: nearest corner at z=2, depth 8
    hint = compute_box_depth_hint(np.array([1.0, 1.0, 1.0]), np.array([2.0, 2.0, 2.0]), cam)
    assert hint == pytest.approx(8.0, rel=1e-6)


def test_camera_basis_orthonormal():
    cam = CameraParameters(
        eye=(3.0, 2.0, 7.0), look_at=(0.5, -0.5, 0.0), up=(0.0, 1.0, 0.0)
    )
    f, r, u = camera_basis(cam)
    for v in (f, r, u):
        assert np.linalg.norm(v) == pytest.approx(1.0, rel=1e-6)
    assert abs(np.dot(f, r)) < 1e-6
    assert abs(np.dot(f, u)) < 1e-6
    assert abs(np.dot(r, u)) < 1e-6


def test_box_depth_hints_batch_matches_scalar():
    from amrvolumerenderer_tpu.camera import compute_box_depth_hints

    rng = np.random.default_rng(6)
    cam = CameraParameters(
        eye=(2.0, 1.0, 3.0), look_at=(0.5, 0.4, 0.6), up=(0.0, 1.0, 0.0)
    )
    mins = rng.random((10, 3)) * 2 - 1
    maxs = mins + rng.random((10, 3))
    batch = compute_box_depth_hints(mins, maxs, cam)
    for i in range(10):
        expected = compute_box_depth_hint(mins[i], maxs[i], cam)
        assert batch[i] == pytest.approx(expected, rel=1e-6)


class TestOrbitCameraSequence:
    def _base(self):
        from amrvolumerenderer_tpu.types import CameraParameters

        return CameraParameters(
            eye=np.array([3.0, 2.0, 0.5]),
            look_at=np.array([0.5, 0.5, 0.5]),
            up=np.array([0.0, 1.0, 0.0]),
            fov_y_degrees=45.0,
            near_plane=0.1,
            far_plane=20.0,
        )

    def test_frame0_is_base_exactly(self):
        from amrvolumerenderer_tpu.camera import orbit_camera_sequence

        base = self._base()
        cams = orbit_camera_sequence(base, 8)
        assert np.array_equal(np.asarray(cams[0].eye), np.asarray(base.eye))
        assert cams[0].fov_y_degrees == base.fov_y_degrees

    def test_equidistant_and_periodic(self):
        from amrvolumerenderer_tpu.camera import orbit_camera_sequence

        base = self._base()
        cams = orbit_camera_sequence(base, 16)
        look = np.asarray(base.look_at)
        r0 = np.linalg.norm(np.asarray(base.eye) - look)
        for cam in cams:
            assert np.isclose(np.linalg.norm(np.asarray(cam.eye) - look), r0)
            # up-axis component of the offset is preserved (rotation about up)
            assert np.isclose(
                np.dot(np.asarray(cam.eye) - look, np.asarray(base.up)),
                np.dot(np.asarray(base.eye) - look, np.asarray(base.up)),
            )

    def test_quarter_turn(self):
        from amrvolumerenderer_tpu.camera import orbit_camera_sequence

        base = self._base()
        cams = orbit_camera_sequence(base, 4)
        # rotating (2.5, 1.5, 0) about +y by 90 deg gives (0, 1.5, -2.5)
        expected = np.array([0.5 + 0.0, 2.0, 0.5 - 2.5])
        assert np.allclose(np.asarray(cams[1].eye), expected)

    def test_partial_sweep_and_errors(self):
        from amrvolumerenderer_tpu.camera import orbit_camera_sequence

        base = self._base()
        cams = orbit_camera_sequence(base, 2, total_degrees=90.0)
        assert len(cams) == 2
        # frame 1 is a 45-degree rotation about up: the offsets' components
        # perpendicular to the axis are 45 degrees apart
        look = np.asarray(base.look_at)
        axis = np.asarray(base.up) / np.linalg.norm(np.asarray(base.up))
        a = np.asarray(base.eye) - look
        b = np.asarray(cams[1].eye) - look
        a = a - axis * np.dot(a, axis)
        b = b - axis * np.dot(b, axis)
        cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
        assert np.isclose(np.degrees(np.arccos(cos)), 45.0, atol=1e-6)
        import pytest

        with pytest.raises(ValueError):
            orbit_camera_sequence(base, 0)
