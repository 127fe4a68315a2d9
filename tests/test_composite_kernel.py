"""Pallas tile-space compositor vs the host oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from amrvolumerenderer_tpu.compositor import composite_layers_host, sort_layers
from amrvolumerenderer_tpu.ops.composite import (
    LANES,
    SUBLANES,
    TILE_P,
    composite_tiles,
)


def test_composite_tiles_matches_host(rng):
    num_layers, num_tiles = 5, 3
    colors = (
        rng.random((num_layers, num_tiles, 4, SUBLANES, LANES)) * 0.8
    ).astype(np.float32)
    colors[:, :, :3] *= colors[:, :, 3:4]  # premultiplied
    depths = (rng.random((num_layers, num_tiles, SUBLANES, LANES)) * 9).astype(
        np.float32
    )
    coverage = rng.random((num_layers, num_tiles)) > 0.3
    hints = (rng.random(num_layers) * 5).astype(np.float32)
    owners = rng.integers(0, 3, num_layers).astype(np.int32)
    local = np.arange(num_layers, dtype=np.int32)

    order = sort_layers(hints, owners, local)
    owners_sorted = owners[order]

    out_c, out_d = composite_tiles(
        jnp.asarray(colors),
        jnp.asarray(depths),
        jnp.asarray(order),
        jnp.asarray(owners_sorted),
        jnp.asarray(coverage),
        interpret=jax.default_backend() == "cpu",
    )

    # host oracle on flattened layers with the mask applied up front
    num_pixels = num_tiles * TILE_P
    layers = np.zeros((num_layers, num_pixels, 5), np.float32)
    for i in range(num_layers):
        c = np.transpose(colors[i], (0, 2, 3, 1)).reshape(num_pixels, 4).copy()
        d = depths[i].reshape(num_tiles, TILE_P).copy()
        cov = np.repeat(coverage[i], TILE_P)
        c[~cov] = 0.0
        d[~coverage[i]] = np.inf
        layers[i, :, :4] = c
        layers[i, :, 4] = d.reshape(num_pixels)
    expected = composite_layers_host(layers, hints, owners, local)

    got = np.zeros((num_pixels, 5), np.float32)
    got[:, :4] = np.transpose(np.asarray(out_c), (0, 2, 3, 1)).reshape(
        num_pixels, 4
    )
    got[:, 4] = np.asarray(out_d).reshape(num_pixels)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_composite_tiles_single_layer(rng):
    colors = rng.random((1, 2, 4, SUBLANES, LANES)).astype(np.float32)
    depths = rng.random((1, 2, SUBLANES, LANES)).astype(np.float32)
    out_c, out_d = composite_tiles(
        jnp.asarray(colors),
        jnp.asarray(depths),
        jnp.asarray(np.array([0], np.int32)),
        jnp.asarray(np.array([0], np.int32)),
        jnp.asarray(np.ones((1, 2), np.int32)),
        interpret=jax.default_backend() == "cpu",
    )
    np.testing.assert_allclose(np.asarray(out_c), colors[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_d), depths[0], atol=1e-6)


def test_fused_frame_matches_unfused(r2_scene):
    """composited_frame (raw render + Pallas composite) must match the
    unfused worklist render + host fold."""
    import math

    from amrvolumerenderer_tpu import api
    from amrvolumerenderer_tpu.camera import (
        auto_orbit_camera,
        camera_basis,
        compute_box_depth_hint,
    )
    from amrvolumerenderer_tpu.colormap import build_color_table
    from amrvolumerenderer_tpu.ops import slicemarch as sm
    from amrvolumerenderer_tpu.renderer import (
        compute_global_bounds,
        compute_reference_sample_distance,
    )
    from amrvolumerenderer_tpu.renderer_fast import (
        _pretransform,
        composited_frame,
    )

    levels, geoms = r2_scene
    data = api.AmrData(level_data=levels, level_geometry=geoms)
    g = api.load_amr_geometry(data, 0, -1, 0, False, True, verbose=False)
    width = height = 64
    bounds = compute_global_bounds(g)
    camera = auto_orbit_camera(bounds)
    forward, right, up = camera_basis(camera)
    axis = sm.choose_march_axis(forward)
    axes = [axis] + [a for a in range(3) if a != axis]
    ref = compute_reference_sample_distance(g, bounds)
    t = g.scalar_transform

    lut = build_color_table(1.0, 1.0, g.scalar_range, None)
    packed_single = sm.build_log_lut(lut)
    num = len(g.bricks)
    vol = np.zeros((num, 16, sm.SUBLANES, sm.LANES), np.float32)
    meta = np.zeros((num, 12), np.float32)
    dims = np.zeros((num, 8), np.int32)
    hints = np.zeros(num, np.float32)
    bmins, bmaxs = [], []
    for i, b in enumerate(g.bricks):
        pt = _pretransform(b.data, t, 1.0, False)
        v, (ns, nu, nv) = sm.pack_slice_volume(pt, axis)
        vol[i, :ns] = v
        pmin = np.asarray(b.min_corner)[axes]
        pmax = np.asarray(b.max_corner)[axes]
        meta[i, 0:3], meta[i, 3:6] = pmin, pmax
        meta[i, 6:9] = (pmax - pmin) / np.array([ns, nu, nv])
        dims[i, :3] = (ns, nu, nv)
        dims[i, 3:6] = axes
        hints[i] = compute_box_depth_hint(b.min_corner, b.max_corner, camera)
        bmins.append(b.min_corner)
        bmaxs.append(b.max_corner)
    luts = np.ascontiguousarray(
        np.broadcast_to(packed_single[None], (num, 4, 2, 128))
    )
    cam = sm.pack_camera(
        np.asarray(camera.eye), forward, right, up, camera.fov_y_degrees,
        1.0, 0.0, 1.0, ref,
    )
    wb, wt, coverage = sm.compute_worklist(
        np.stack(bmins), np.stack(bmaxs), np.asarray(camera.eye),
        forward, right, up, camera.fov_y_degrees, width, height, pad_to=8,
    )
    owners = np.arange(num, dtype=np.int32)
    local = np.zeros(num, np.int32)
    order = sort_layers(hints, owners, local)

    interp = jax.default_backend() == "cpu"
    fused = np.asarray(
        composited_frame(
            jnp.asarray(vol), jnp.asarray(meta), jnp.asarray(dims),
            jnp.asarray(luts), jnp.asarray(cam), jnp.asarray(wb),
            jnp.asarray(wt), jnp.asarray(coverage), jnp.asarray(order),
            jnp.asarray(owners[order]),
            width=width, height=height, max_slices=16, interpret=interp,
        )
    )

    colors, depths = __import__(
        "amrvolumerenderer_tpu.ops.slicemarch", fromlist=["x"]
    ).slicemarch_render_worklist(
        jnp.asarray(vol), jnp.asarray(meta), jnp.asarray(dims),
        jnp.asarray(luts), jnp.asarray(cam), jnp.asarray(wb),
        jnp.asarray(wt), jnp.asarray(coverage),
        width=width, height=height, max_slices=16, interpret=interp,
    )
    layers = np.concatenate(
        [np.asarray(colors), np.asarray(depths)[..., None]], axis=-1
    )
    expected = composite_layers_host(layers, hints, owners, local)
    np.testing.assert_allclose(fused, expected, atol=1e-5)


def test_hbm_streaming_composite_matches_vmem(rng):
    """composite_tiles_hbm (double-buffered DMA, O(1) VMEM in layers)
    equals the single-pass VMEM kernel."""
    import jax.numpy as jnp

    from amrvolumerenderer_tpu.ops.composite import (
        composite_tiles,
        composite_tiles_hbm,
    )

    L, T = 7, 3
    colors = rng.random((L, T, 4, 8, 128)).astype(np.float32) * 0.8
    depths = (rng.random((L, T, 8, 128)) * 9).astype(np.float32)
    coverage = rng.random((L, T)) > 0.3
    colors[~coverage] = np.nan  # unscheduled blocks are undefined
    hints = rng.random(L).astype(np.float32)
    owners = rng.integers(0, 3, L).astype(np.int32)
    order = np.lexsort((np.arange(L), owners, hints)).astype(np.int32)
    sowners = owners[order]

    a = composite_tiles(
        jnp.asarray(colors), jnp.asarray(depths), jnp.asarray(order),
        jnp.asarray(sowners), jnp.asarray(coverage), interpret=True,
    )
    b = composite_tiles_hbm(
        jnp.asarray(colors), jnp.asarray(depths), jnp.asarray(order),
        jnp.asarray(sowners), jnp.asarray(coverage), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=1e-6)
