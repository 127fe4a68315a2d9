"""End-to-end in-situ API tests: the insitu_example scene
(Examples/RenderFromMultiFab.cpp) rendered through api.render."""

import numpy as np
import pytest

from amrvolumerenderer_tpu import api
from amrvolumerenderer_tpu.types import CameraParameters, color_map_from_tuples


def make_amr_data(r2_scene):
    levels, geoms = r2_scene
    return api.AmrData(level_data=levels, level_geometry=geoms)


def test_insitu_render_produces_image(tmp_path, r2_scene):
    data = make_amr_data(r2_scene)
    options = api.RenderOptions(
        width=64, height=64, output_filename=str(tmp_path / "multifab-render.ppm")
    )
    image, timing = api.render(data, options, verbose=False)
    assert image.width == 64 and image.height == 64
    # something visible was rendered
    alpha = image.pixels[:, 3]
    assert alpha.max() > 0.1
    assert (alpha > 0).mean() > 0.05
    # wireframe overlay puts white-ish pixels near the box silhouette
    assert image.pixels[:, :3].max() > 0.9
    assert (tmp_path / "multifab-render.ppm").exists()
    assert timing.render_seconds >= 0


def test_insitu_render_deterministic(tmp_path, r2_scene):
    data = make_amr_data(r2_scene)
    opts = api.RenderOptions(
        width=32, height=32, output_filename=str(tmp_path / "a.ppm")
    )
    img1, _ = api.render(data, opts, verbose=False)
    img2, _ = api.render(data, opts, verbose=False)
    np.testing.assert_array_equal(img1.pixels, img2.pixels)


def test_insitu_render_explicit_camera(tmp_path, r2_scene):
    data = make_amr_data(r2_scene)
    options = api.RenderOptions(
        width=32,
        height=32,
        output_filename=str(tmp_path / "cam.ppm"),
        camera=CameraParameters(
            eye=(3.0, 2.0, 3.0), look_at=(0.5, 0.5, 0.5), up=(0, 1, 0),
            fov_y_degrees=45.0, near_plane=0.1, far_plane=20.0,
        ),
    )
    image, _ = api.render(data, options, verbose=False)
    assert image.pixels[:, 3].max() > 0.1


def test_insitu_render_with_colormap_and_range(tmp_path, r2_scene):
    data = make_amr_data(r2_scene)
    options = api.RenderOptions(
        width=32,
        height=32,
        output_filename=str(tmp_path / "cmap.png"),
        scalar_range=(0.5, 2.5),
        color_map=color_map_from_tuples(
            [(0.5, 0, 0, 1, 0.0), (1.5, 0, 1, 0, 0.4), (2.5, 1, 0, 0, 0.9)]
        ),
    )
    image, _ = api.render(data, options, verbose=False)
    assert image.pixels[:, 3].max() > 0.05
    assert (tmp_path / "cmap.png").exists()


def test_box_transparency_one_renders_nothing(tmp_path, r2_scene):
    data = make_amr_data(r2_scene)
    options = api.RenderOptions(
        width=32, height=32, box_transparency=1.0,
        output_filename=str(tmp_path / "t.ppm"),
    )
    image, _ = api.render(data, options, verbose=False)
    # alpha scale 0 => nothing accumulated except the wireframe overlay
    interior = image.pixels[:, 3]
    # overlay pixels exist but volume contribution is zero => alpha only on
    # wireframe lines
    assert (interior > 0).mean() < 0.35


def test_antialiasing_must_be_square(r2_scene):
    data = make_amr_data(r2_scene)
    with pytest.raises(ValueError, match="perfect square"):
        api.render(data, api.RenderOptions(antialiasing=2), verbose=False)


def test_antialiased_render(tmp_path, r2_scene):
    data = make_amr_data(r2_scene)
    img1, _ = api.render(
        data,
        api.RenderOptions(
            width=24, height=24, antialiasing=4,
            output_filename=str(tmp_path / "aa.ppm"),
        ),
        verbose=False,
    )
    assert img1.width == 24 and img1.height == 24


def test_invalid_colormap_rejected(r2_scene):
    data = make_amr_data(r2_scene)
    with pytest.raises(ValueError, match="at least two"):
        api.render(
            data,
            api.RenderOptions(color_map=color_map_from_tuples([(0, 0, 0, 0, 0)])),
            verbose=False,
        )
    with pytest.raises(ValueError, match="strictly increasing"):
        api.render(
            data,
            api.RenderOptions(
                color_map=color_map_from_tuples(
                    [(1.0, 0, 0, 0, 0), (0.5, 0, 0, 0, 0)]
                )
            ),
            verbose=False,
        )


def test_invalid_camera_rejected(r2_scene):
    data = make_amr_data(r2_scene)
    with pytest.raises(ValueError, match="distinct"):
        api.render(
            data,
            api.RenderOptions(
                camera=CameraParameters(eye=(1, 1, 1), look_at=(1, 1, 1), up=(0, 1, 0))
            ),
            verbose=False,
        )


def test_histogram(r2_scene):
    data = make_amr_data(r2_scene)
    hist = api.compute_histogram(data, api.HistogramOptions(bin_count=32))
    assert hist.sample_count == 32**3
    assert hist.bin_counts.sum() == 32**3
    assert hist.normalized_range == (0.0, 1.0)
    # r^2 field: low values dominate (volume of small-radius shells)
    assert hist.bin_counts[:16].sum() > hist.bin_counts[16:].sum()


def test_histogram_log_scale(r2_scene):
    data = make_amr_data(r2_scene)
    # shift to strictly positive values for log
    levels, geoms = r2_scene
    for box in levels[0]:
        box.data = box.data + 0.01
    hist = api.compute_histogram(
        data, api.HistogramOptions(bin_count=16, log_scale_input=True)
    )
    assert hist.bin_counts.sum() == 32**3


def test_histogram_component_selection(r2_scene):
    """Multi-component data: histogram respects the component index
    (SceneBuildOptions component, VolumeRendererApi.hpp:46-52)."""
    from amrvolumerenderer_tpu.scene import LevelBox, LevelGeometry

    rng = np.random.default_rng(3)
    multi = rng.random((8, 8, 8, 2))
    multi[..., 1] = 0.5  # constant second component
    boxes = [LevelBox(multi, np.zeros(3, dtype=int))]
    geoms = [LevelGeometry(np.zeros(3), np.full(3, 1.0 / 8))]
    data = api.AmrData(level_data=[boxes], level_geometry=geoms)

    h0 = api.compute_histogram(data, api.HistogramOptions(bin_count=8, component=0))
    h1 = api.compute_histogram(data, api.HistogramOptions(bin_count=8, component=1))
    assert h0.sample_count == h1.sample_count == 512
    # constant field: degenerate range widens by +1, all samples in bin 0
    assert h1.bin_counts[0] == 512
    assert h0.bin_counts.max() < 512


def test_log_scale_render_slicemarch_matches_raymarch(tmp_path, r2_scene):
    """log_scale through the slice-march pre-transform equals the per-sample
    transform of the exact path within the cross-integrator tolerance."""
    from amrvolumerenderer_tpu.renderer import render_scene
    from amrvolumerenderer_tpu.types import RenderParameters

    levels, geoms = r2_scene
    for box in levels[0]:
        box.data = box.data + 0.05  # strictly positive for log
    data = api.AmrData(level_data=levels, level_geometry=geoms)
    geometry = api.load_amr_geometry(data, 0, -1, 0, True, True, verbose=False)
    params = RenderParameters(width=40, height=40)
    img_ray, _ = render_scene("", params, geometry, verbose=False,
                              method="raymarch")
    img_slice, _ = render_scene("", params, geometry, verbose=False,
                                method="slicemarch")
    diff = np.abs(img_ray.pixels[:, :4] - img_slice.pixels[:, :4])
    assert diff.mean() < 0.015
    assert (diff > 0.02).any(axis=-1).mean() <= 0.12


def test_render_sampling_option(r2_scene, tmp_path):
    """RenderOptions.sampling="trilinear" flows to the kernels; bad values
    are rejected at validation."""
    from amrvolumerenderer_tpu import api

    levels, geoms = r2_scene
    data = api.AmrData(level_data=levels, level_geometry=geoms)
    out = str(tmp_path / "tri.ppm")
    opts = api.RenderOptions(
        width=24, height=24, output_filename=out, sampling="trilinear"
    )
    image, _ = api.render(data, opts, verbose=False)
    assert np.asarray(image.pixels)[:, 3].max() > 0.0

    with pytest.raises(ValueError, match="sampling"):
        api.render(
            data,
            api.RenderOptions(width=8, height=8, output_filename=out,
                              sampling="bogus"),
            verbose=False,
        )


def test_render_antialiasing_nine(tmp_path, r2_scene):
    """AA=9 (3x3 box downsample) works through the public API, matching
    the reference's perfect-square contract (VolumeRenderer.cpp:479-528)."""
    levels, geoms = r2_scene
    data = api.AmrData(level_data=levels, level_geometry=geoms)
    out = str(tmp_path / "aa9.ppm")
    image, _timing = api.render(data, api.RenderOptions(
        width=24, height=24, antialiasing=9, output_filename=out,
    ), verbose=False)
    import os

    result = image.pixels
    assert result.shape == (24 * 24, 5)
    assert os.path.exists(out)
    assert float(np.asarray(result)[:, 3].max()) > 0.0
