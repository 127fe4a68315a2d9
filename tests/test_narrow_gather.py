"""Narrowed volume gather (ops/tilemarch.compute_row_chords +
``narrow_rows``): the kernel shrinks its 8-row gather select chain to a
certified per-item window of ``narrow_rows`` rows.

Contracts locked here:

  * PIXEL PARITY IS BITWISE: a certified window must contain every row
    any valid ray's stencil touches, so the narrowed gather returns the
    exact same values as the full chain (invalid rays are alpha-masked
    in both paths) — outputs must be bit-identical, not just close;
  * the chord certificate is verified against an INDEPENDENT dense ray
    sampling of the tile (not the corner-hull construction itself);
  * the narrowed kernel is ON by default on the persistent path and
    actually eligible at production tile/brick ratios;
  * the SMEM prefetch model accounts for the extra [W] chord table.
"""

import numpy as np
import pytest

from amrvolumerenderer_tpu import api
from amrvolumerenderer_tpu.fast_scene import FastSceneRenderer
from amrvolumerenderer_tpu.ops import slicemarch as sm
from amrvolumerenderer_tpu.ops import tilemarch as tm
from amrvolumerenderer_tpu.scene import LevelBox, LevelGeometry
from amrvolumerenderer_tpu.types import (
    CameraParameters,
    RenderParameters,
    color_map_from_tuples,
)


def _shell_geometry(n=64, brick=32):
    c = (np.arange(n) + 0.5) / n
    r = np.sqrt(
        (c[:, None, None] - 0.5) ** 2
        + (c[None, :, None] - 0.5) ** 2
        + (c[None, None, :] - 0.5) ** 2
    )
    f = np.exp(-((r - 0.40) / 0.015) ** 2)
    boxes = [
        LevelBox(f[i:i + brick, j:j + brick, k:k + brick],
                 np.array([i, j, k], dtype=int))
        for i in range(0, n, brick)
        for j in range(0, n, brick)
        for k in range(0, n, brick)
    ]
    geoms = [LevelGeometry(np.zeros(3), np.full(3, 1.0 / n))]
    data = api.AmrData(level_data=[boxes], level_geometry=geoms)
    return api.load_amr_geometry(data, 0, -1, 0, False, True, verbose=False)


def _random_geometry(seed, n=32, brick=16):
    rng = np.random.default_rng(seed)
    f = (rng.random((n, n, n)) ** 2).astype(np.float64)
    boxes = [
        LevelBox(f[i:i + brick, j:j + brick, k:k + brick],
                 np.array([i, j, k], dtype=int))
        for i in range(0, n, brick)
        for j in range(0, n, brick)
        for k in range(0, n, brick)
    ]
    geoms = [LevelGeometry(np.zeros(3), np.full(3, 1.0 / n))]
    data = api.AmrData(level_data=[boxes], level_geometry=geoms)
    return api.load_amr_geometry(data, 0, -1, 0, False, True, verbose=False)


CAMS = [
    (0.5, 0.6, 3.2),
    (3.1, 0.5, 0.4),
    (-1.9, 2.3, -1.2),
    (0.52, 3.0, 0.55),
    (0.4, 0.45, 0.5),  # eye inside the domain
]


def _cam(eye):
    return CameraParameters(eye=eye, look_at=(0.5, 0.5, 0.5), up=(0, 1, 0))


class TestNarrowParity:
    @pytest.mark.parametrize("sampling", ["nearest", "trilinear"])
    def test_bitwise_parity_shell(self, sampling):
        g = _shell_geometry()
        fsr = FastSceneRenderer(
            g, RenderParameters(width=64, height=64, sampling=sampling),
            interpret=True,
        )
        hit_any = False
        for eye in CAMS:
            cam = _cam(eye)
            fsr.narrow_rows = 4
            inputs = fsr.frame_inputs(cam, as_numpy=True)
            if inputs is None:
                continue
            rc = inputs["row_chords"]
            hit_any |= bool((rc != tm.NARROW_SENTINEL).any())
            a = np.asarray(fsr.render(cam))
            fsr.narrow_rows = None
            b = np.asarray(fsr.render(cam))
            assert np.array_equal(a, b)
        assert hit_any  # at least one camera exercised the narrow loops

    def test_bitwise_parity_preclassified(self):
        g = _shell_geometry()
        fsr = FastSceneRenderer(
            g,
            RenderParameters(
                width=64, height=64, sampling="trilinear",
                classification="pre",
            ),
            interpret=True,
        )
        for eye in CAMS[:3]:
            cam = _cam(eye)
            fsr.narrow_rows = 4
            a = np.asarray(fsr.render(cam))
            fsr.narrow_rows = None
            b = np.asarray(fsr.render(cam))
            assert np.array_equal(a, b)

    def test_bitwise_parity_random_fuzz(self):
        for seed in (3, 17):
            g = _random_geometry(seed)
            fsr = FastSceneRenderer(
                g, RenderParameters(width=64, height=64), interpret=True
            )
            rng = np.random.default_rng(seed + 100)
            for _ in range(3):
                cam = _cam(tuple(rng.uniform(-2.0, 3.0, 3)))
                fsr.narrow_rows = 4
                a = np.asarray(fsr.render(cam))
                fsr.narrow_rows = None
                b = np.asarray(fsr.render(cam))
                assert np.array_equal(a, b)

    def test_bitwise_parity_transparent_tf(self):
        """Band-split items (shells with a transparent middle) keep the
        chord valid over BOTH expanded bands."""
        g = _shell_geometry()
        fsr = FastSceneRenderer(
            g, RenderParameters(width=64, height=64), interpret=True
        )
        fsr.set_transfer_function(color_map=color_map_from_tuples([
            (0.0, 0, 0, 0, 0.0), (0.3, 0, 0, 0.2, 0.0),
            (0.6, 0.9, 0.4, 0.1, 0.35), (1.0, 1, 1, 1, 0.9),
        ]))
        for eye in CAMS[:3]:
            cam = _cam(eye)
            fsr.narrow_rows = 4
            a = np.asarray(fsr.render(cam))
            fsr.narrow_rows = None
            b = np.asarray(fsr.render(cam))
            assert np.array_equal(a, b)

    def test_batch_path_parity(self):
        g = _shell_geometry()
        fsr = FastSceneRenderer(
            g, RenderParameters(width=64, height=64), interpret=True
        )
        cams = [_cam(e) for e in CAMS[:3]]
        fsr.narrow_rows = 4
        a = fsr.render_batch(cams)
        fsr.narrow_rows = None
        b = fsr.render_batch(cams)
        for x, y in zip(a, b):
            assert np.array_equal(np.asarray(x), np.asarray(y))


class TestChordCertificate:
    def test_certificate_against_dense_ray_sampling(self):
        """Independent check: for certified items, sample a DENSE pixel
        grid inside the tile (not just the 4 corner rays the builder
        hulls) and verify every touched row lies inside the kernel's
        narrowed window at every occupied slice."""
        g = _shell_geometry()
        fsr = FastSceneRenderer(
            g, RenderParameters(width=256, height=256, sampling="trilinear"),
            interpret=True,
        )
        from amrvolumerenderer_tpu.camera import camera_basis

        R = 4
        checked = 0
        for eye in CAMS[:4]:
            cam = _cam(eye)
            fsr.narrow_rows = R
            inputs = fsr.frame_inputs(cam, as_numpy=True)
            if inputs is None:
                continue
            rc = inputs["row_chords"]
            elig = np.flatnonzero(rc != tm.NARROW_SENTINEL)
            if len(elig) == 0:
                continue
            meta = inputs["meta"]
            dims = inputs["dims"]
            offsets = inputs["offsets"]
            tile_ids = inputs["tile_ids"]
            wt = np.asarray(tile_ids)[
                np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
            ]
            wb = inputs["bricks"]
            ib = inputs["item_bounds"].astype(np.int64)
            forward, right, up = camera_basis(cam)
            axis = sm.choose_march_axis(forward)
            axes = [axis] + [a for a in range(3) if a != axis]
            eye_p = np.asarray(cam.eye, np.float64)[axes]
            tiles_x = fsr.pad_w // tm.TILE_W
            rng = np.random.default_rng(7)
            for w in rng.choice(elig, size=min(12, len(elig)),
                                replace=False):
                t_id, b = int(wt[w]), int(wb[w])
                lo, hi = int(ib[w]) >> 16, int(ib[w]) & 0xFFFF
                a0 = np.float32((int(rc[w]) >> 16) / 256.0)
                da = np.float32(
                    ((int(rc[w]) << 16 & 0xFFFFFFFF) - 2**32
                     if (int(rc[w]) << 16 & 0xFFFFFFFF) >= 2**31
                     else int(rc[w]) << 16 & 0xFFFFFFFF) >> 16
                )
                da = np.float32(float(da) / 4096.0)
                # dense 9x9 pixel grid inside the tile
                tx, ty = t_id % tiles_x, t_id // tiles_x
                pxs = tx * 32 + np.linspace(0, 31, 9) + 0.5
                pys = ty * 32 + np.linspace(0, 31, 9) + 0.5
                px, py = np.meshgrid(pxs, pys)
                tan_half = np.tan(np.radians(cam.fov_y_degrees) * 0.5)
                aspect = fsr.render_width / max(fsr.render_height, 1)
                ndc_x = px * (2.0 / fsr.render_width) - 1.0
                ndc_y = py * (2.0 / fsr.render_height) - 1.0
                d = (
                    np.asarray(forward)[None, None]
                    + (ndc_x * tan_half * aspect)[..., None]
                    * np.asarray(right)
                    + (ndc_y * tan_half)[..., None] * np.asarray(up)
                )
                dpp = d[..., axes]
                pmin = meta[b, 0:3]
                cell = meta[b, 6:9]
                nu, nv = int(dims[b, 1]), int(dims[b, 2])
                stride = int(dims[b, 6]) or nv
                gh = fsr.ghost
                for k in range(lo, hi):
                    z = pmin[0] + (k + 0.5) * cell[0]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        tk = (z - eye_p[0]) / dpp[..., 0]
                    valid = np.isfinite(tk) & (tk > 0)
                    if not valid.any():
                        continue
                    u = eye_p[1] + tk * dpp[..., 1]
                    v = eye_p[2] + tk * dpp[..., 2]
                    cu = (u - pmin[1]) / cell[1]
                    cvv = (v - pmin[2]) / cell[2]
                    pu = np.clip(cu - 0.5, -gh, nu - 1 + gh)
                    pv = np.clip(cvv - 0.5, -gh, nv - 1 + gh)
                    iu0 = np.floor(pu).astype(int)
                    iv0 = np.floor(pv).astype(int)
                    iu1 = np.minimum(iu0 + 1, nu - 1 + gh)
                    iv1 = np.minimum(iv0 + 1, nv - 1 + gh)
                    A = np.float32(a0 + np.float32(k) * da)
                    r_lo = int(np.clip(np.floor(A), 0, 8 - R))
                    for iu in (iu0, iu1):
                        for iv in (iv0, iv1):
                            rows = ((iu + gh) * stride + (iv + gh)) >> 7
                            rows = rows[valid]
                            assert (rows >= r_lo).all() and (
                                rows <= r_lo + R - 1
                            ).all(), (
                                f"row escape: item {w} slice {k} "
                                f"window [{r_lo}, {r_lo + R - 1}] rows "
                                f"[{rows.min()}, {rows.max()}]"
                            )
                    checked += 1
        assert checked > 50

    def test_eligibility_high_at_production_ratio(self):
        """At 1024^2 (tiles small vs bricks on screen) most items must
        certify — guards a silent regression that disables the narrowed
        gather while parity keeps passing."""
        g = _shell_geometry()
        fsr = FastSceneRenderer(
            g, RenderParameters(width=1024, height=1024), interpret=True
        )
        inputs = fsr.frame_inputs(_cam(CAMS[0]), as_numpy=True)
        rc = inputs["row_chords"]
        assert (rc != tm.NARROW_SENTINEL).mean() > 0.8

    def test_default_on(self):
        g = _random_geometry(1)
        fsr = FastSceneRenderer(
            g, RenderParameters(width=32, height=32), interpret=True
        )
        assert fsr.narrow_rows == 4
        inputs = fsr.frame_inputs(_cam(CAMS[0]), as_numpy=True)
        assert inputs["row_chords"] is not None

    def test_sentinel_unreachable_by_eligible_items(self):
        """Eligible packs clamp a0 to int16 minus the sentinel's high
        half, so NARROW_SENTINEL can never be produced by accident."""
        g = _shell_geometry()
        fsr = FastSceneRenderer(
            g, RenderParameters(width=256, height=256), interpret=True
        )
        inputs = fsr.frame_inputs(_cam(CAMS[0]), as_numpy=True)
        rc = inputs["row_chords"].astype(np.int64)
        elig = rc[rc != tm.NARROW_SENTINEL]
        assert ((elig >> 16) > -32768).all()


class TestNativeParity:
    @pytest.mark.parametrize(
        "geometry_fn,sampling",
        [
            (_shell_geometry, "nearest"),
            (_shell_geometry, "trilinear"),
            (lambda: _random_geometry(3), "trilinear"),
        ],
    )
    def test_native_matches_oracle_bitwise(self, geometry_fn, sampling):
        """native.row_chords (avr_row_chords) must reproduce the NumPy
        oracle's packed int32 output EXACTLY — the chord is a correctness
        artifact (it bounds the kernel's gather), so the native twin runs
        the identical f64/f32 arithmetic, not an approximation."""
        from amrvolumerenderer_tpu import native
        from amrvolumerenderer_tpu.camera import camera_basis

        if native.get_lib() is None:
            pytest.skip("native library unavailable")
        g = geometry_fn()
        fsr = FastSceneRenderer(
            g, RenderParameters(width=128, height=128, sampling=sampling),
            interpret=True,
        )
        compared = 0
        for eye in CAMS:
            cam = _cam(eye)
            inputs = fsr.frame_inputs(cam, as_numpy=True)
            if inputs is None:
                continue
            offsets = inputs["offsets"]
            wt = np.asarray(inputs["tile_ids"])[
                np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
            ]
            forward, right, up = camera_basis(cam)
            axis = sm.choose_march_axis(forward)
            axes = [axis] + [a for a in range(3) if a != axis]
            kwargs = dict(
                fov_y_degrees=cam.fov_y_degrees, axes=axes,
                width=fsr.pad_w, logical_width=fsr.render_width,
                logical_height=fsr.render_height, ghost=fsr.ghost,
                sampling=sampling, narrow_rows=4,
            )
            args = (
                inputs["meta"], inputs["dims"], wt, inputs["bricks"],
                inputs["item_bounds"], np.asarray(cam.eye), forward,
                right, up,
            )
            oracle = tm.compute_row_chords_oracle(*args, **kwargs)
            nat = native.row_chords(*args, **kwargs)
            assert nat is not None
            np.testing.assert_array_equal(np.asarray(nat), oracle)
            compared += len(oracle)
        assert compared > 100


class TestSmemModel:
    def test_narrow_adds_one_item_table(self):
        base = tm.smem_prefetch_bytes(8, 256, 1000, 64)
        narrow = tm.smem_prefetch_bytes(8, 256, 1000, 64, narrow=True)
        assert narrow - base == 8 * tm._pad128(1000) * 4

    def test_max_batch_frames_shrinks_under_narrow(self):
        full = tm.max_batch_frames(512, 6000, 512)
        nar = tm.max_batch_frames(512, 6000, 512, narrow=True)
        assert nar <= full


def test_dyn_row_semantics_interpret():
    """_dyn_row(tile, r) == broadcast of row r (the take0-splat primitive
    validated on real Mosaic 2026-08: pltpu.roll with a dynamic sublane
    shift silently no-ops on v5e, so the narrowed gather must NOT use
    it)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(shift_ref, x_ref, o_ref):
        o_ref[0] = tm._dyn_row(x_ref[0], shift_ref[0])

    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((1, 8, 128), lambda t, *_: (t, 0, 0))],
            out_specs=pl.BlockSpec((1, 8, 128), lambda t, *_: (t, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.float32),
        interpret=True,
    )
    x = np.arange(8 * 128, dtype=np.float32).reshape(1, 8, 128)
    for s in (0, 3, 7):
        out = np.asarray(f(np.array([s], np.int32), x))[0]
        np.testing.assert_array_equal(
            out, np.broadcast_to(x[0, s], (8, 128))
        )
