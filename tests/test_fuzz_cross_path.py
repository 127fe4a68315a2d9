"""Seeded cross-path fuzz: random AMR hierarchies x cameras rendered
through independent product paths must agree.

Each case builds a random two-level hierarchy (random refined boxes over
a random base field), a random outside-the-domain camera, and compares:

  * the persistent single-chip renderer (FastSceneRenderer / tilemarch
    mega-kernel fold) against
  * the persistent multi-chip renderer on the virtual 8-device mesh
    (slicemarch per-device render + all_to_all exchange + ordered fold).

The two share only the scene ingestion and the (key, owner, local)
ordering contract — kernels, fold structure, and communication differ
entirely — so agreement within f32 fold-association tolerance is a
strong whole-pipeline invariant (the reference's Common/Testing matrix
idea, driven by fuzzing instead of enumerated cases)."""

from __future__ import annotations

import numpy as np
import pytest

from amrvolumerenderer_tpu import api
from amrvolumerenderer_tpu.fast_scene import FastSceneRenderer
from amrvolumerenderer_tpu.parallel.persistent import MultiChipSceneRenderer
from amrvolumerenderer_tpu.scene import LevelBox, LevelGeometry
from amrvolumerenderer_tpu.types import CameraParameters, RenderParameters


def random_geometry(rng):
    n = 16
    base = rng.random((n, n, n))
    level0 = [LevelBox(base, np.zeros(3, dtype=int))]
    # 1-2 random refined boxes on a 2x grid, 8-cell aligned inside the
    # domain (AMReX-style proper nesting on the coarse grid)
    level1 = []
    for _ in range(rng.integers(1, 3)):
        lo = rng.integers(0, 3, size=3) * 8
        level1.append(
            LevelBox(rng.random((16, 16, 16)), lo.astype(int))
        )
    data = api.AmrData(
        level_data=[level0, level1],
        level_geometry=[
            LevelGeometry(np.zeros(3), np.full(3, 1.0 / n)),
            LevelGeometry(np.zeros(3), np.full(3, 1.0 / (2 * n))),
        ],
        refinement_ratios=[(2, 2, 2)],
    )
    return api.load_amr_geometry(data, 0, -1, 0, False, True, verbose=False)


def random_camera(rng):
    # random direction, outside the [0,1]^3 domain
    d = rng.normal(size=3)
    d /= np.linalg.norm(d)
    eye = 0.5 + d * rng.uniform(1.8, 3.5)
    return CameraParameters(
        eye=tuple(eye), look_at=(0.5, 0.5, 0.5), up=(0, 1, 0)
    )


@pytest.mark.parametrize(
    "seed,knobs",
    [
        (11, {}),
        (23, {}),
        (47, {}),
        # quality-knob matrix: the cross-path invariant must hold for
        # every kernel variant, not just the defaults — each knob selects
        # different gather/classify code in BOTH kernels
        (59, {"sampling": "trilinear"}),
        (61, {"sampling": "trilinear", "classification": "pre"}),
        (67, {"lut_size": 128}),
        (71, {"sampling": "trilinear", "lut_size": 128}),
    ],
)
def test_single_vs_multichip_fuzz(seed, knobs):
    rng = np.random.default_rng(seed)
    geometry = random_geometry(rng)
    params = RenderParameters(width=32, height=32, **knobs)
    single = FastSceneRenderer(geometry, params)
    multi = MultiChipSceneRenderer(geometry, params, num_devices=8)
    for _ in range(2):
        cam = random_camera(rng)
        fs = single.render(cam, overlay=False)
        fm = multi.render(cam, overlay=False)
        assert np.abs(fs[np.isfinite(fs)]).sum() > 0
        np.testing.assert_allclose(fs[:, :4], fm[:, :4], atol=1e-5)
        fin_s = np.isfinite(fs[:, 4])
        fin_m = np.isfinite(fm[:, 4])
        np.testing.assert_array_equal(fin_s, fin_m)
        np.testing.assert_allclose(
            fs[fin_s, 4], fm[fin_m, 4], atol=1e-5
        )
