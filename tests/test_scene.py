"""Scene construction tests (SceneBuilder.cpp semantics)."""

import math

import numpy as np
import pytest

from amrvolumerenderer_tpu.scene import (
    LevelBox,
    LevelGeometry,
    SceneBuildOptions,
    assign_owners,
    build_brick_buckets,
    build_scene_geometry,
    compute_scene_histogram,
    set_scene_normalization_range,
)


def make_level(data, lo=(0, 0, 0), prob_lo=(0.0, 0.0, 0.0), cell=(0.1, 0.1, 0.1)):
    return (
        [[LevelBox(data=np.asarray(data, dtype=np.float64), lo=np.asarray(lo))]],
        [LevelGeometry(prob_lo=np.asarray(prob_lo), cell_size=np.asarray(cell))],
    )


def test_world_corners_and_rescale():
    # 10x20x40 cells at dx=0.1 => extents (1, 2, 4); min extent 1 => scale 1
    data = np.ones((10, 20, 40))
    levels, geom = make_level(data)
    scene = build_scene_geometry(levels, geom, SceneBuildOptions())
    b = scene.bricks[0]
    np.testing.assert_allclose(b.min_corner, [0, 0, 0])
    np.testing.assert_allclose(b.max_corner, [1, 2, 4])


def test_rescale_smallest_axis_to_one():
    # extents (0.5, 1.0, 2.0) => scale = 2 (SceneBuilder.cpp:229-254)
    data = np.ones((5, 10, 20))
    levels, geom = make_level(data)
    scene = build_scene_geometry(levels, geom, SceneBuildOptions())
    b = scene.bricks[0]
    np.testing.assert_allclose(b.max_corner - b.min_corner, [1, 2, 4])


def test_explicit_bounds_padding():
    data = np.ones((10, 10, 10))
    levels, geom = make_level(data)
    scene = build_scene_geometry(levels, geom, SceneBuildOptions())
    # extent 1 each axis, padding = 0.05 * max extent
    np.testing.assert_allclose(scene.explicit_bounds.min_corner, [-0.05] * 3)
    np.testing.assert_allclose(scene.explicit_bounds.max_corner, [1.05] * 3)


def test_scalar_ranges_and_normalization():
    data = np.linspace(2.0, 10.0, 1000).reshape(10, 10, 10)
    levels, geom = make_level(data)
    scene = build_scene_geometry(levels, geom, SceneBuildOptions())
    assert scene.original_scalar_range == pytest.approx((2.0, 10.0), rel=1e-6)
    assert scene.processed_scalar_range == pytest.approx((2.0, 10.0), rel=1e-6)
    # normalize-to-data-range default: scalar range becomes [0, 1]
    assert scene.scalar_range == (0.0, 1.0)
    t = scene.scalar_transform
    assert t.normalize_to_unit_range
    assert t.inverse_normalization_span == pytest.approx(1.0 / 8.0)


def test_log_scale_transform():
    data = np.array([[[0.0, 1.0], [math.e, math.e**2]]]).reshape(1, 2, 2)
    levels, geom = make_level(data)
    scene = build_scene_geometry(
        levels, geom, SceneBuildOptions(log_scale_input=True)
    )
    t = scene.scalar_transform
    assert t.log_scale_input
    # positive floor = smallest positive value = 1.0
    assert t.positive_floor == pytest.approx(1.0)
    assert scene.processed_scalar_range == pytest.approx((0.0, 2.0), rel=1e-6)


def test_log_scale_without_positive_values_raises():
    data = -np.ones((4, 4, 4))
    levels, geom = make_level(data)
    with pytest.raises(RuntimeError, match="no positive scalar values"):
        build_scene_geometry(levels, geom, SceneBuildOptions(log_scale_input=True))


def test_degenerate_range_widens():
    data = np.full((4, 4, 4), 3.0)
    levels, geom = make_level(data)
    scene = build_scene_geometry(levels, geom, SceneBuildOptions())
    assert scene.processed_scalar_range == pytest.approx((3.0, 4.0))


def test_no_data_raises():
    with pytest.raises(RuntimeError, match="Failed to locate"):
        build_scene_geometry([[]], [LevelGeometry(np.zeros(3), np.ones(3))],
                             SceneBuildOptions())


def test_set_normalization_range_override():
    data = np.linspace(0.0, 1.0, 64).reshape(4, 4, 4)
    levels, geom = make_level(data)
    scene = build_scene_geometry(
        levels, geom, SceneBuildOptions(normalize_to_data_range=False)
    )
    set_scene_normalization_range(scene, 0.25, 0.75)
    assert scene.scalar_range == (0.0, 1.0)
    assert scene.scalar_transform.inverse_normalization_span == pytest.approx(2.0)


def test_histogram_counts():
    data = np.linspace(0.0, 1.0, 4096).reshape(16, 16, 16)
    levels, geom = make_level(data)
    scene = build_scene_geometry(levels, geom, SceneBuildOptions())
    hist = compute_scene_histogram(scene, 16)
    assert hist.sample_count == 4096
    assert hist.bin_counts.sum() == 4096
    # uniform data => nearly uniform bins
    assert hist.bin_counts.min() >= 200
    assert hist.normalized_range == (0.0, 1.0)
    assert hist.has_original_range


def test_histogram_invalid_bins():
    data = np.ones((2, 2, 2))
    levels, geom = make_level(data)
    scene = build_scene_geometry(levels, geom, SceneBuildOptions())
    with pytest.raises(ValueError):
        compute_scene_histogram(scene, 0)


def test_assign_owners_round_robin():
    data = np.ones((2, 2, 2))
    levels = [[LevelBox(data=data, lo=np.array([i * 2, 0, 0])) for i in range(5)]]
    geom = [LevelGeometry(np.zeros(3), np.full(3, 0.5))]
    scene = build_scene_geometry(levels, geom, SceneBuildOptions())
    assign_owners(scene, 2)
    assert [b.owner for b in scene.bricks] == [0, 1, 0, 1, 0]


def test_brick_buckets_group_by_shape():
    from amrvolumerenderer_tpu.types import Brick

    bricks = [
        Brick(np.ones((4, 4, 4), np.float32), (0, 0, 0), (1, 1, 1)),
        Brick(np.ones((4, 4, 4), np.float32), (1, 0, 0), (2, 1, 1)),
        Brick(np.ones((8, 4, 4), np.float32), (2, 0, 0), (4, 1, 1)),
    ]
    buckets = build_brick_buckets(bricks)
    assert len(buckets) == 2
    sizes = sorted(b.data.shape[0] for b in buckets)
    assert sizes == [1, 2]


def test_brick_buckets_granularity_coalesces():
    from amrvolumerenderer_tpu.types import Brick

    bricks = [
        Brick(np.ones((4, 4, 4), np.float32), (0, 0, 0), (1, 1, 1)),
        Brick(np.ones((6, 5, 4), np.float32), (1, 0, 0), (2, 1, 1)),
    ]
    buckets = build_brick_buckets(bricks, granularity=8)
    assert len(buckets) == 1
    assert buckets[0].data.shape == (2, 8, 8, 8)
    np.testing.assert_array_equal(buckets[0].cell_dims, [[4, 4, 4], [6, 5, 4]])


class TestDeviceStats:
    """Host/device scalar-stat routing parity (VERDICT r2 #4): the batched
    device reduction must agree with the float64 host oracle to float32
    rounding on every transform configuration."""

    def _scene_data(self):
        rng = np.random.default_rng(7)
        data = rng.lognormal(0.0, 2.0, (16, 16, 16))
        data[0, 0, 0] = np.nan  # finite-count must skip
        data[1, 0, 0] = np.inf
        data[2, 0, 0] = 0.0  # excluded from min-positive
        return data

    @pytest.mark.parametrize("log_scale", [False, True])
    def test_build_scene_parity(self, monkeypatch, log_scale):
        data = self._scene_data()
        levels, geom = make_level(data)
        scenes = {}
        for policy in ("numpy", "native", "device"):
            monkeypatch.setenv("AVR_SCALAR_STATS", policy)
            try:
                scenes[policy] = build_scene_geometry(
                    levels, geom, SceneBuildOptions(log_scale_input=log_scale)
                )
            except RuntimeError as e:
                if policy == "native" and "unavailable" in str(e):
                    continue  # no toolchain: native path legitimately absent
                raise
        for policy, scene in scenes.items():
            if policy == "numpy":
                continue
            for attr in ("original_scalar_range", "processed_scalar_range"):
                np.testing.assert_allclose(
                    getattr(scenes["numpy"], attr), getattr(scene, attr),
                    rtol=1e-6, err_msg=policy,
                )
            tn = scenes["numpy"].scalar_transform
            td = scene.scalar_transform
            np.testing.assert_allclose(tn.positive_floor, td.positive_floor,
                                       rtol=1e-6, err_msg=policy)
            np.testing.assert_allclose(tn.processed_min, td.processed_min,
                                       rtol=1e-6, atol=1e-6, err_msg=policy)
            np.testing.assert_allclose(tn.processed_max, td.processed_max,
                                       rtol=1e-6, atol=1e-6, err_msg=policy)

    @pytest.mark.parametrize("log_scale", [False, True])
    def test_global_range_parity(self, monkeypatch, log_scale):
        """The monotone-shortcut range must match the full transformed-pass
        oracle on every stats routing."""
        from amrvolumerenderer_tpu.renderer import (
            _transformed_range_numpy,
            compute_global_scalar_range,
        )

        data = self._scene_data()
        levels, geom = make_level(data)
        scene = build_scene_geometry(
            levels, geom, SceneBuildOptions(log_scale_input=log_scale)
        )
        lo, hi = _transformed_range_numpy(scene)
        for policy in ("numpy", "native", "device"):
            monkeypatch.setenv("AVR_SCALAR_STATS", policy)
            try:
                got = compute_global_scalar_range(scene)
            except RuntimeError as e:
                if policy == "native" and "unavailable" in str(e):
                    continue
                raise
            np.testing.assert_allclose(got, (lo, hi), rtol=1e-5, atol=1e-6,
                                       err_msg=policy)

    def test_allnan_bricks_raise_on_both_paths(self, monkeypatch):
        data = np.full((4, 4, 4), np.nan)
        levels, geom = make_level(data)
        for policy in ("numpy", "device"):
            monkeypatch.setenv("AVR_SCALAR_STATS", policy)
            with pytest.raises(RuntimeError, match="valid scalar range"):
                build_scene_geometry(levels, geom, SceneBuildOptions())
