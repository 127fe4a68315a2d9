"""Ordering-key cache (visibility.OrderKeyCache).

The adjacency DAG depends on the camera only through sign(view_dir) per
axis; a clean (cycle-free) build over a cuboid-tiling partition is a
valid compositing order for every camera whose domain-reaching rays are
per-axis sign-consistent with the DAG (frustum_safe_axes: eye outside
the domain on the entry side per axis, or frustum sign-strict) — each
occlusion then travels a gap-free face chain = a directed DAG path, so
depth tie-breaks only order pairs no ray sees together.  Cameras that
fail the gate (the code-review counterexample: eye between face planes
with the frustum straddling that axis) bypass the cache entirely.
These tests lock the gates (tiling check, frustum gate, clean flag from
both the native v2 symbol and the Python builder), the memo behavior,
and — the part that matters — pixel-exact renders from cache-warmed
keys at a DIFFERENT camera sharing the gate key.
"""

import numpy as np
import pytest

from amrvolumerenderer_tpu import api
from amrvolumerenderer_tpu.fast_scene import FastSceneRenderer
from amrvolumerenderer_tpu.types import CameraParameters, RenderParameters
from amrvolumerenderer_tpu.visibility import (
    OrderKeyCache,
    _is_cuboid_tiling,
    build_visibility_order,
    order_keys_or_hints,
)


def _grid(g):
    ax = np.arange(g, dtype=np.float64) / g
    lo = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
    return lo, lo + 1.0 / g


def test_cuboid_tiling_gate():
    lo, hi = _grid(3)
    assert _is_cuboid_tiling(lo, hi)
    # punch a hole: no longer tiles the bbox
    keep = np.ones(len(lo), bool)
    keep[13] = False
    assert not _is_cuboid_tiling(lo[keep], hi[keep])
    # two-level tiling (one cell split into 8) still tiles
    cell_lo, cell_hi = lo[13], hi[13]
    kids_lo, kids_hi = [], []
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                off = np.array([di, dj, dk]) / 6.0
                kids_lo.append(cell_lo + off)
                kids_hi.append(cell_lo + off + 1.0 / 6.0)
    assert _is_cuboid_tiling(
        np.concatenate([lo[keep], np.array(kids_lo)]),
        np.concatenate([hi[keep], np.array(kids_hi)]),
    )
    assert not _is_cuboid_tiling(np.zeros((0, 3)), np.zeros((0, 3)))


def test_frustum_gate():
    """Axis k of the memo gate passes when the eye is outside the domain
    on the entry side (rays opposing the sign can't reach the domain) or
    when all 4 corner rays share the strict sign; a camera failing an
    axis gates to None — caching would freeze tie-breaks that ARE
    load-bearing for it."""
    lo, hi = _grid(2)  # domain [0, 1]^3
    cache = OrderKeyCache(lo, hi)
    assert cache.flat_sound

    def cam(eye, look=(0.5, 0.5, 0.5), fov=45.0):
        return CameraParameters(
            eye=eye, look_at=look, up=(0, 1, 0),
            fov_y_degrees=fov, near_plane=0.1, far_plane=20.0,
        )

    # eye outside the domain on every axis: safe regardless of FOV width
    assert cache.gate(cam((3.0, 2.0, -1.0)), 1.0) == (-1, -1, 1)
    assert cache.gate(cam((2.0, 1.5, 3.0)), 1.0) == (-1, -1, -1)
    assert cache.gate(cam((3.0, 2.0, -1.5), fov=150.0), 1.0) is not None
    # axis-aligned view: view_dir is zero on two axes -> no DAG edges
    # there, tie-breaks order those faces -> never cache
    assert cache.gate(cam((3.0, 0.5, 0.5)), 1.0) is None
    # the code-review counterexample (2x2x1 domain): eye BETWEEN the
    # x face planes with the frustum straddling x — rays oppose
    # sign(view_dir) and connect DAG-unconstrained pieces
    big_lo = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], float)
    big_hi = big_lo + np.array([1.0, 1.0, 1.0])
    wide = OrderKeyCache(big_lo, big_hi)
    assert wide.flat_sound
    assert wide.gate(
        cam((1.6, -2.0, -0.3), look=(0.5, 0.5, 0.5)), 1.0
    ) is None
    # same eye x inside, but looking steeply enough that the frustum is
    # x-sign-strict: safe again
    assert wide.gate(
        cam((1.6, -2.0, -0.3), look=(0.2, 2.0, 0.8), fov=20.0), 1.0
    ) is not None


def _cyclic_scene():
    """A deterministic random box set whose face graph cycles (found by
    seed search; both builders break the cycle by splitting a box)."""
    r = np.random.default_rng(109)
    lo = r.uniform(0, 3, (8, 3))
    hi = lo + r.uniform(0.5, 2.0, (8, 3))
    lo = np.round(lo * 2) / 2
    hi = np.maximum(np.round(hi * 2) / 2, lo + 0.5)
    eye = r.uniform(-2, 5, 3)
    look = r.uniform(1, 2, 3)
    cam = CameraParameters(
        eye=eye, look_at=look, up=(0, 1, 0),
        fov_y_degrees=45.0, near_plane=0.1, far_plane=50.0,
    )
    return lo, hi, cam


def test_clean_flag_native_and_python():
    """Acyclic grid -> clean True; a cycle-broken build -> clean False,
    on both builder implementations."""
    import amrvolumerenderer_tpu.native as native_mod

    lo, hi = _grid(2)
    cam = CameraParameters(
        eye=(2.0, 1.5, 3.0), look_at=(0.5, 0.5, 0.5), up=(0, 1, 0),
        fov_y_degrees=45.0, near_plane=0.1, far_plane=20.0,
    )
    pin_lo, pin_hi, pin_cam = _cyclic_scene()

    for force_python in (False, True):
        if force_python:
            saved = (native_mod._lib, native_mod._load_attempted)
            native_mod._lib = None
            native_mod._load_attempted = True
        elif native_mod.get_lib() is None:
            continue
        try:
            order, clean = build_visibility_order(
                cam, 1.0, lo, hi, np.arange(8, dtype=np.int32), 8,
                return_clean=True,
            )
            assert order is not None and clean is True
            order, clean = build_visibility_order(
                pin_cam, 1.0, pin_lo, pin_hi,
                np.arange(len(pin_lo), dtype=np.int32), len(pin_lo),
                return_clean=True,
            )
            assert order is not None and clean is False
        finally:
            if force_python:
                native_mod._lib, native_mod._load_attempted = saved


def test_cache_memoizes_per_octant():
    lo, hi = _grid(3)
    cache = OrderKeyCache(lo, hi)

    def cam(eye):
        return CameraParameters(
            eye=eye, look_at=(0.5, 0.5, 0.5), up=(0, 1, 0),
            fov_y_degrees=45.0, near_plane=0.1, far_plane=20.0,
        )

    a = order_keys_or_hints(cam((2.0, 1.5, 3.0)), 1.0, lo, hi, cache=cache)
    assert cache.misses == 1 and cache.hits == 0
    b = order_keys_or_hints(cam((1.5, 2.5, 2.0)), 1.0, lo, hi, cache=cache)
    assert cache.hits == 1
    assert b is a  # the memoized array itself
    # different octant recomputes
    c = order_keys_or_hints(cam((-2.0, 1.5, 3.0)), 1.0, lo, hi, cache=cache)
    assert cache.misses == 2
    assert c is not a
    # the non-tiling gate keeps the memo empty
    keep = np.ones(len(lo), bool)
    keep[13] = False
    holed = OrderKeyCache(lo[keep], hi[keep])
    assert not holed.flat_sound
    order_keys_or_hints(
        cam((2.0, 1.5, 3.0)), 1.0, lo[keep], hi[keep], cache=holed
    )
    assert not holed._flat and holed.misses == 0


@pytest.fixture
def geometry(r2_scene):
    levels, geoms = r2_scene
    data = api.AmrData(level_data=levels, level_geometry=geoms)
    return api.load_amr_geometry(data, 0, -1, 0, False, True, verbose=False)


def test_cached_keys_render_pixel_exact(geometry):
    """Render camera B through a cache warmed at camera A (same octant):
    pixels must equal a cold render of camera B.  Any pair of layers that
    can share a ray is DAG-ordered identically in both builds; the
    tie-break-order differences only permute layers no ray sees together,
    which the per-pixel fold never observes."""
    params = RenderParameters(width=48, height=48)
    cam_a = CameraParameters(
        eye=(2.5, 1.8, 3.0), look_at=(0.5, 0.5, 0.5), up=(0, 1, 0),
        fov_y_degrees=45.0, near_plane=0.1, far_plane=20.0,
    )
    cam_b = CameraParameters(
        eye=(3.1, 1.4, 2.2), look_at=(0.4, 0.6, 0.5), up=(0, 1, 0),
        fov_y_degrees=45.0, near_plane=0.1, far_plane=20.0,
    )

    warmed = FastSceneRenderer(geometry, params)
    gate_a = warmed._order_cache.gate(cam_a, 1.0)
    assert gate_a is not None
    assert gate_a == warmed._order_cache.gate(cam_b, 1.0)
    warmed.render(cam_a)
    before_hits = warmed._order_cache.hits
    frame_b_cached = warmed.render(cam_b)
    assert warmed._order_cache.hits > before_hits  # B reused A's keys

    cold = FastSceneRenderer(geometry, params)
    frame_b_cold = cold.render(cam_b)
    np.testing.assert_array_equal(frame_b_cached, frame_b_cold)


def test_mixed_sign_frustum_bypasses_cache(geometry):
    """The code-review counterexample, end-to-end: a camera whose eye
    sits between the scene's face planes (mixed-sign frustum) must NOT
    read or write the cache — its render is bit-exact with a cold
    renderer even after warming the same view-dir octant from outside."""
    params = RenderParameters(width=48, height=48)
    # outside camera (gates to a key) shares sign(view_dir) with the
    # inside camera (gates to None)
    cam_out = CameraParameters(
        eye=(-4.0, -3.0, -2.5), look_at=(0.5, 0.5, 0.5), up=(0, 1, 0),
        fov_y_degrees=45.0, near_plane=0.1, far_plane=30.0,
    )
    cam_in = CameraParameters(
        eye=(0.2, -0.6, -0.4), look_at=(1.2, 0.7, 0.6), up=(0, 1, 0),
        fov_y_degrees=60.0, near_plane=0.05, far_plane=30.0,
    )
    warmed = FastSceneRenderer(geometry, params)
    assert warmed._order_cache.gate(cam_out, 1.0) is not None
    assert warmed._order_cache.gate(cam_in, 1.0) is None
    warmed.render(cam_out)
    stored = dict(warmed._order_cache._flat)
    frame_in_warm = warmed.render(cam_in)
    # no read and no write happened for the inside camera
    assert dict(warmed._order_cache._flat) == stored
    cold = FastSceneRenderer(geometry, params)
    frame_in_cold = cold.render(cam_in)
    np.testing.assert_array_equal(frame_in_warm, frame_in_cold)
