"""Ordering-key cache (visibility.OrderKeyCache).

Under eye-side-of-plane edge orientation (round 4) the adjacency DAG
depends on the camera only through the eye's CELL of the face-plane
arrangement; a clean (cycle-free) build over a cuboid-tiling partition
is a valid compositing order for every camera whose eye shares the cell
— each occlusion travels a gap-free face chain = a directed DAG path
oriented consistently for every eye in the cell, independent of view
direction or frustum.  An eye ON a face plane (degenerate orientation)
bypasses the cache entirely.  These tests lock the gates (tiling check,
eye-cell gate, clean flag from both the native symbol and the Python
builder), the memo behavior, and — the part that matters — pixel-exact
renders from cache-warmed keys at a DIFFERENT camera sharing the gate
key.
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


def test_eye_cell_gate():
    """The memo key is the eye's per-axis cell of the face-plane
    arrangement (under eye-side edge orientation the DAG depends on the
    camera only through that cell); an eye ON a face plane gates to None
    (degenerate orientation), while view direction / frustum no longer
    matter at all."""
    lo, hi = _grid(2)  # domain [0, 1]^3, face planes at 0, 0.5, 1 per axis
    cache = OrderKeyCache(lo, hi)
    assert cache.flat_sound

    def cam(eye, look=(0.5, 0.5, 0.5), fov=45.0):
        return CameraParameters(
            eye=eye, look_at=look, up=(0, 1, 0),
            fov_y_degrees=fov, near_plane=0.1, far_plane=20.0,
        )

    # eye outside the domain: cell index 3 (past all planes) / 0 (before)
    assert cache.gate(cam((3.0, 2.0, -1.0)), 1.0) == (3, 3, 0)
    # axis-aligned view (view_dir zero on two axes): CACHEABLE now —
    # eye-side orientation has no direction degeneracy
    assert cache.gate(cam((3.0, 0.7, 0.7)), 1.0) == (3, 2, 2)
    # same cell, wildly different look/fov: same key
    assert cache.gate(
        cam((3.0, 0.7, 0.7), look=(0.1, 2.0, -1.0), fov=150.0), 1.0
    ) == (3, 2, 2)
    # different cell on y: different key
    assert cache.gate(cam((3.0, 0.2, 0.7)), 1.0) == (3, 1, 2)
    # eye exactly on a face plane: degenerate, never cache
    assert cache.gate(cam((0.5, 0.7, 0.7)), 1.0) is None
    assert cache.gate(cam((3.0, 1.0, 0.7)), 1.0) is None
    # eye INSIDE the domain: still a well-defined cell
    assert cache.gate(cam((0.2, 0.7, 0.2)), 1.0) == (1, 2, 1)


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


def test_on_plane_eye_bypasses_cache(geometry):
    """The remaining degenerate case, end-to-end: a camera whose eye
    lies ON a face plane (rays cross that plane in both directions, so
    edge orientation is undefined there) must NOT read or write the
    cache — its render is bit-exact with a cold renderer even after
    warming a neighboring cell."""
    params = RenderParameters(width=48, height=48)
    # the r2 scene tiles [0, 1]^3 with face planes at 0, 0.5, 1
    cam_out = CameraParameters(
        eye=(-4.0, -3.0, -2.5), look_at=(0.5, 0.5, 0.5), up=(0, 1, 0),
        fov_y_degrees=45.0, near_plane=0.1, far_plane=30.0,
    )
    cam_on = CameraParameters(
        eye=(0.5, -0.6, -0.4), look_at=(1.2, 0.7, 0.6), up=(0, 1, 0),
        fov_y_degrees=60.0, near_plane=0.05, far_plane=30.0,
    )
    warmed = FastSceneRenderer(geometry, params)
    assert warmed._order_cache.gate(cam_out, 1.0) is not None
    assert warmed._order_cache.gate(cam_on, 1.0) is None
    warmed.render(cam_out)
    stored = dict(warmed._order_cache._flat)
    frame_on_warm = warmed.render(cam_on)
    # no read and no write happened for the on-plane camera
    assert dict(warmed._order_cache._flat) == stored
    cold = FastSceneRenderer(geometry, params)
    frame_on_cold = cold.render(cam_on)
    np.testing.assert_array_equal(frame_on_warm, frame_on_cold)
    # an eye INSIDE the domain (between planes) is now cacheable and
    # pixel-exact across the warm/cold boundary — the old frustum gate
    # refused these
    cam_in = CameraParameters(
        eye=(0.2, 0.7, 0.3), look_at=(0.8, 0.2, 0.6), up=(0, 1, 0),
        fov_y_degrees=60.0, near_plane=0.05, far_plane=30.0,
    )
    assert warmed._order_cache.gate(cam_in, 1.0) is not None
    frame_in_warm = warmed.render(cam_in)
    frame_in_again = warmed.render(cam_in)  # second render hits the memo
    np.testing.assert_array_equal(frame_in_warm, frame_in_again)
    cold2 = FastSceneRenderer(geometry, params)
    np.testing.assert_array_equal(
        frame_in_warm, cold2.render(cam_in)
    )


def test_gate_refuses_eyes_near_merged_planes():
    """Review finding: face planes within the tolerance window cluster;
    the gate must refuse an eye near ANY member plane of a cluster, not
    just its leader — the builders treat such an eye as degenerate (no
    edges for that plane) and the resulting order must never be cached."""
    w = 1e-5  # window for coordinates <= 1
    lo = np.array([[0.0, 0.0, 0.0], [0.5 + 0.8 * w, 0.0, 0.0]])
    hi = np.array([[0.5, 1.0, 1.0], [1.0, 1.0, 1.0]])
    cache = OrderKeyCache(lo, hi)

    def cam(eye):
        return CameraParameters(
            eye=eye, look_at=(0.5, 0.5, 0.5), up=(0, 1, 0),
            fov_y_degrees=45.0, near_plane=0.1, far_plane=20.0,
        )

    # eye within tolerance of the merged-away plane (0.5 + 0.8w): the
    # leader-only gate used to hand this a cacheable key
    assert cache.gate(cam((0.5 + 1.3 * w, 0.7, 0.7)), 1.0) is None
    # eye clearly past the whole cluster: cacheable
    assert cache.gate(cam((0.6, 0.7, 0.7)), 1.0) is not None
    assert cache.gate(cam((0.3, 0.7, 0.7)), 1.0) is not None
