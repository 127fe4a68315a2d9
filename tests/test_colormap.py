"""Transfer-function LUT tests (VolumePainter.cpp:442-516 semantics)."""

import numpy as np
import pytest

from amrvolumerenderer_tpu.colormap import (
    build_color_table,
    compute_scaled_alpha,
    saturate_soft_tail_np,
    _lab_to_srgb,
    _srgb_to_lab,
)
from amrvolumerenderer_tpu.types import color_map_from_tuples


def test_scaled_alpha_identity_at_unit_factor():
    assert compute_scaled_alpha(0.5, 1.0, 1.0) == pytest.approx(0.5)


def test_scaled_alpha_step_normalization():
    # half step => alpha' = 1 - (1-a)^0.5
    a = compute_scaled_alpha(0.75, 1.0, 0.5)
    assert a == pytest.approx(1.0 - 0.25**0.5)


def test_scaled_alpha_transparency_scale():
    # alpha_scale = 1 - box_transparency multiplies the base alpha
    assert compute_scaled_alpha(0.5, 0.0, 1.0) == 0.0
    assert compute_scaled_alpha(0.5, 0.5, 1.0) == pytest.approx(0.25)


def test_scaled_alpha_edge_cases():
    assert compute_scaled_alpha(2.0, 1.0, 1.0) == 1.0
    assert compute_scaled_alpha(0.5, 1.0, 0.0) == 0.0
    assert compute_scaled_alpha(-0.5, 1.0, 1.0) == 0.0


def test_default_jet_table_shape_and_range():
    table = build_color_table(1.0, 1.0, (0.0, 1.0), None)
    assert table.shape == (256, 4)
    assert table.dtype == np.float32
    assert np.all(table >= 0.0) and np.all(table[:, :3] <= 1.0)
    # jet: starts dark blue, ends orange-ish (r=0.5, g=0, b=0)
    np.testing.assert_allclose(table[0, :3], [0.0, 0.0, 0.5625], atol=1e-5)
    np.testing.assert_allclose(table[-1, :3], [0.5, 0.0, 0.0], atol=1e-5)
    # default opacity ramp endpoints
    assert table[0, 3] == pytest.approx(0.05, abs=1e-5)
    assert table[-1, 3] == pytest.approx(0.5, abs=1e-5)


def test_default_table_rescaled_range():
    # The opacity ramp is placed on the scalar range, so its sampled alphas
    # are invariant under range changes; the jet *color* nodes stay on [0, 1]
    # (rescaleTableToRange is an identity because the opacity nodes already
    # span the range, VolumePainter.cpp:484-499) and clamp outside it.
    t1 = build_color_table(1.0, 1.0, (0.0, 1.0), None)
    t2 = build_color_table(1.0, 1.0, (-5.0, 10.0), None)
    np.testing.assert_allclose(t1[:, 3], t2[:, 3], atol=1e-5)
    # below value 0 the color clamps to the first jet node
    np.testing.assert_allclose(t2[:84, :3], np.tile([0.0, 0.0, 0.5625], (84, 1)),
                               atol=1e-5)
    # above value 1 it clamps to the last jet node
    np.testing.assert_allclose(t2[-150:, :3], np.tile([0.5, 0.0, 0.0], (150, 1)),
                               atol=1e-5)


def test_custom_colormap_endpoints():
    cmap = color_map_from_tuples(
        [(0.0, 0.0, 0.0, 1.0, 0.0), (1.0, 1.0, 0.0, 0.0, 0.8)]
    )
    table = build_color_table(1.0, 1.0, (0.0, 1.0), cmap)
    np.testing.assert_allclose(table[0, :3], [0.0, 0.0, 1.0], atol=1e-5)
    np.testing.assert_allclose(table[-1, :3], [1.0, 0.0, 0.0], atol=1e-5)
    assert table[0, 3] == pytest.approx(0.0, abs=1e-6)
    assert table[-1, 3] == pytest.approx(0.8, abs=1e-6)
    # opacity interpolates linearly between nodes (midpoint .5, sharpness 0)
    assert table[128, 3] == pytest.approx(0.4, abs=2e-3)


def test_custom_colormap_lab_interpolation_differs_from_rgb():
    # Lab-space midpoint between saturated red and blue is not the RGB mean
    cmap = color_map_from_tuples(
        [(0.0, 1.0, 0.0, 0.0, 0.5), (1.0, 0.0, 0.0, 1.0, 0.5)]
    )
    table = build_color_table(1.0, 1.0, (0.0, 1.0), cmap)
    rgb_mid = np.array([0.5, 0.0, 0.5])
    assert not np.allclose(table[128, :3], rgb_mid, atol=0.05)


def test_lab_roundtrip():
    rgb = np.array([[0.2, 0.5, 0.8], [1.0, 0.0, 0.0], [0.3, 0.3, 0.3]])
    back = _lab_to_srgb(_srgb_to_lab(rgb))
    np.testing.assert_allclose(back, rgb, atol=1e-3)


def test_box_transparency_scales_table_alpha():
    opaque = build_color_table(1.0, 1.0, (0.0, 1.0), None)
    transparent = build_color_table(0.25, 1.0, (0.0, 1.0), None)
    assert np.all(transparent[:, 3] <= opaque[:, 3] + 1e-7)
    assert transparent[:, 3].max() < opaque[:, 3].max()


def test_saturate_soft_tail():
    v = np.linspace(-0.5, 1.5, 101)
    out = saturate_soft_tail_np(v, 0.5, 1.0)
    assert np.all(out >= 0.0) and np.all(out <= 1.0)
    # identity below clip start
    np.testing.assert_allclose(out[v <= 0.5], np.clip(v[v <= 0.5], 0, 1))
    # degenerate rolloff: hard clamp
    out2 = saturate_soft_tail_np(v, 1.0, 1.0)
    np.testing.assert_allclose(out2, np.clip(v, 0.0, 1.0))
