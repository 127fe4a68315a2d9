"""Ghost-cell rings: seam-free trilinear sampling across split-piece
boundaries.

The reference never splits bricks (one VolumePainter launch per AmrBox,
Common/VolumePainter.cpp:548), so its nearest-sampling has no seams to
worry about.  This framework splits bricks to fit the [8, 128] vreg slice
layout; trilinear sampling used to clamp interpolation at piece edges
(C0 seams).  A 1-cell ghost ring — neighbor data of the same brick at
split boundaries, edge-replicated at true brick faces — makes any piece
decomposition render identically to the unsplit brick.
"""

import numpy as np
import pytest

from amrvolumerenderer_tpu.camera import camera_basis
from amrvolumerenderer_tpu.colormap import build_color_table
from amrvolumerenderer_tpu.ops import slicemarch as sm
from amrvolumerenderer_tpu.types import (
    Brick,
    CameraParameters,
    RenderParameters,
    SceneGeometry,
)


def _identity_geometry(field_bricks):
    """SceneGeometry with the identity scalar transform ([0,1] data)."""
    geometry = SceneGeometry()
    for data, mn, mx in field_bricks:
        geometry.bricks.append(
            Brick(data=np.asarray(data, np.float32), min_corner=mn,
                  max_corner=mx)
        )
    geometry.scalar_range = (0.0, 1.0)
    geometry.has_scalar_range = True
    return geometry


class TestGhostExtraction:
    def test_split_to_cubes_ghost_ring(self):
        """Interior ghost cells carry neighbor data; faces edge-replicate."""
        from amrvolumerenderer_tpu.fast_scene import _split_to_cubes

        rng = np.random.default_rng(3)
        data = rng.random((8, 5, 5)).astype(np.float32)
        pieces = _split_to_cubes(data, np.zeros(3), np.ones(3), 4, ghost=1)
        assert len(pieces) == 2 * 2 * 2
        # first piece: core [0:4, 0:4, 0:4], stored with ring -> shape 6
        block, mn, mx, dims = pieces[0]
        assert block.shape == (6, 6, 6)
        assert tuple(dims) == (4, 4, 4)
        # core matches
        np.testing.assert_array_equal(block[1:5, 1:5, 1:5], data[0:4, 0:4, 0:4])
        # high-side ghost plane = neighbor data from the second half
        np.testing.assert_array_equal(block[5, 1:5, 1:5], data[4, 0:4, 0:4])
        # low-side ghost plane at the true brick face = edge replication
        np.testing.assert_array_equal(block[0, 1:5, 1:5], data[0, 0:4, 0:4])
        # a ragged piece: core [4:8, 4:5, 4:5] -> stored (6, 3, 3)
        block, _mn, _mx, dims = pieces[-1]
        assert block.shape == (6, 3, 3)
        assert tuple(dims) == (4, 1, 1)
        np.testing.assert_array_equal(block[1:5, 1, 1], data[4:8, 4, 4])
        # low ghost plane reaches back into the first half
        np.testing.assert_array_equal(block[0, 1, 1], data[3, 4, 4])

    def test_split_to_cubes_ghost_zero_is_view(self):
        from amrvolumerenderer_tpu.fast_scene import _split_to_cubes

        data = np.arange(4 * 4 * 4, dtype=np.float32).reshape(4, 4, 4)
        pieces = _split_to_cubes(data, np.zeros(3), np.ones(3), 4, ghost=0)
        assert len(pieces) == 1
        block, mn, mx, dims = pieces[0]
        assert np.shares_memory(block, data)
        assert tuple(dims) == (4, 4, 4)

    def test_split_brick_for_slices_ghost_ring(self):
        rng = np.random.default_rng(5)
        data = rng.random((8, 40, 40)).astype(np.float32)
        # (40+2)*(40+2) > 1024 forces one transverse split (axis=0 march)
        pieces = sm.split_brick_for_slices(
            data, np.zeros(3), np.ones(3), axis=0, ghost=1
        )
        assert len(pieces) == 2
        d0, mn0, mx0 = pieces[0]
        d1, mn1, mx1 = pieces[1]
        assert d0.shape == (10, 22, 42)
        assert mx0[1] == pytest.approx(0.5)
        assert mn1[1] == pytest.approx(0.5)
        # piece 0 core = data[:, 0:20, :]; its high-u ghost row is data row 20
        np.testing.assert_array_equal(d0[1:9, 1:21, 1:41], data[:, 0:20, :])
        np.testing.assert_array_equal(d0[1:9, 21, 1:41], data[:, 20, :])
        # piece 1 low-u ghost row reaches back into piece 0's core
        np.testing.assert_array_equal(d1[1:9, 0, 1:41], data[:, 19, :])
        # true brick faces edge-replicate (clamping semantics preserved)
        np.testing.assert_array_equal(d0[0], d0[1])
        np.testing.assert_array_equal(d0[1:9, 1:21, 0], d0[1:9, 1:21, 1])

    def test_pack_slice_volume_ghost_dims(self):
        rng = np.random.default_rng(6)
        ghosted = rng.random((10, 22, 42)).astype(np.float32)
        vol, (ns, nu, nv) = sm.pack_slice_volume(ghosted, axis=0, ghost=1)
        assert (ns, nu, nv) == (8, 20, 40)
        assert vol.shape == (10, sm.SUBLANES, sm.LANES)
        # stored core cell (k, u, v) at flat (u+1) * 42 + (v+1), slice k+1
        flat = vol.reshape(10, -1)
        assert flat[3, 5 * 42 + 7] == ghosted[3, 5, 7]


class TestSeamFreeTrilinear:
    """Any piece decomposition of a brick renders like the unsplit brick."""

    W = H = 64
    N = 40

    def _setup(self):
        rng = np.random.default_rng(7)
        field = rng.random((self.N, self.N, self.N)).astype(np.float32)
        camera = CameraParameters(
            eye=(0.9, 0.7, 3.0), look_at=(0.5, 0.5, 0.5), up=(0, 1, 0),
        )
        forward, right, up = camera_basis(camera)
        axis = sm.choose_march_axis(forward)
        assert axis == 2  # the split below assumes a -z march
        lut = build_color_table(1.0, 1.0, (0.0, 1.0), None)
        rd = 0.5 / self.N
        oracle_c, _ = sm.slicemarch_reference(
            field, np.zeros(3), np.ones(3), axis, lut, rd,
            np.asarray(camera.eye), forward, right, up,
            camera.fov_y_degrees, self.W, self.H, sampling="trilinear",
        )
        return field, camera, rd, oracle_c

    def _render(self, geometry, camera, rd):
        from amrvolumerenderer_tpu.renderer_fast import (
            render_composited_slicemarch,
        )

        params = RenderParameters(
            width=self.W, height=self.H, sampling="trilinear"
        )
        frame = render_composited_slicemarch(
            geometry, params, camera, (0.0, 1.0), rd, self.W, self.H, None,
            interpret=True,
        )
        return frame[:, :4]

    def test_split_pieces_match_unsplit_oracle(self):
        """The work-list path transverse-splits 40^2 slices; with ghost
        rings the composited trilinear frame equals the unsplit-brick
        oracle (f64) to the same tolerance as the single-piece kernel."""
        field, camera, rd, oracle_c = self._setup()
        got = self._render(
            _identity_geometry([(field, np.zeros(3), np.ones(3))]), camera, rd
        )
        diff = np.abs(got - oracle_c)
        # f32-vs-f64 LUT-bin straddle on isolated pixels, like
        # test_slicemarch.TestTrilinear.test_kernel_matches_numpy_oracle
        assert np.quantile(diff, 0.999) < 1e-4
        assert diff.max() < 1e-2

    def test_cross_brick_boundary_still_clamps(self):
        """Ghost rings are intra-brick: the same field pre-split into two
        BRICKS edge-replicates at their shared face and visibly departs
        from the unsplit oracle — this locks the seam signal the
        intra-brick ghost test would otherwise miss, and documents the
        cross-brick limitation."""
        field, camera, rd, oracle_c = self._setup()
        half = self.N // 2
        two_bricks = _identity_geometry([
            (field[:half], np.zeros(3), np.array([0.5, 1.0, 1.0])),
            (field[half:], np.array([0.5, 0.0, 0.0]), np.ones(3)),
        ])
        got = self._render(two_bricks, camera, rd)
        seam = np.abs(got - oracle_c).max()
        assert seam > 0.02  # the clamped seam is a real pixel-level error

    def test_fast_scene_cube_split_matches_worklist_split(self):
        """FastSceneRenderer's 30^3-core cube decomposition and the
        work-list path's transverse decomposition are DIFFERENT split
        layouts; with ghost rings both render the same image."""
        from amrvolumerenderer_tpu.fast_scene import FastSceneRenderer

        field, camera, rd, oracle_c = self._setup()
        geometry = _identity_geometry([(field, np.zeros(3), np.ones(3))])
        params = RenderParameters(
            width=self.W, height=self.H, sampling="trilinear"
        )
        fast = FastSceneRenderer(geometry, params, interpret=True)
        assert fast.ghost == 1 and fast.core == 30
        assert fast.canonical.shape[0] == 8  # ceil(40/30)^3
        frame = fast.render(camera, overlay=False)
        diff = np.abs(frame[:, :4] - oracle_c)
        # a handful of isolated pixels straddle a LUT bin (the cube pieces
        # compute (pos - pmin) / cell with different fp association than
        # the unsplit oracle); a real seam reads > 0.02 along a full line
        # (see test_cross_brick_boundary_still_clamps)
        assert np.quantile(diff, 0.99) < 1e-4
        assert diff.max() < 5e-3

    def test_nearest_packing_unchanged(self):
        """ghost stays 0 for nearest sampling (no perf or layout change)."""
        from amrvolumerenderer_tpu.fast_scene import FastSceneRenderer
        from amrvolumerenderer_tpu.renderer_fast import (
            prepare_slicemarch_scene,
        )

        field, camera, rd, _ = self._setup()
        geometry = _identity_geometry([(field, np.zeros(3), np.ones(3))])
        params = RenderParameters(width=self.W, height=self.H)
        prep = prepare_slicemarch_scene(
            geometry, params, camera, (0.0, 1.0), rd, self.W, self.H, None
        )
        assert prep["ghost"] == 0
        fast = FastSceneRenderer(geometry, params, interpret=True)
        assert fast.ghost == 0 and fast.core == 32
