"""Differentiable-rendering tests (amrvolumerenderer_tpu.diff).

The diff path is a beyond-reference capability (the reference renderer,
Common/VolumePainter.cpp:735-922, is forward-only); these tests lock
(a) forward faithfulness where the smooth and discrete formulations must
agree exactly, (b) gradient correctness against central finite
differences, and (c) that the whole pipeline composes under jit/grad.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amrvolumerenderer_tpu import diff
from amrvolumerenderer_tpu.camera import camera_basis
from amrvolumerenderer_tpu.ops.raymarch import render_bucket_impl
from amrvolumerenderer_tpu.types import CameraParameters

WIDTH = HEIGHT = 12
NUM_STEPS = 64


def make_camera():
    return CameraParameters(
        eye=(0.5, 0.5, 3.0),
        look_at=(0.5, 0.5, 0.5),
        up=(0.0, 1.0, 0.0),
        fov_y_degrees=45.0,
    )


def make_args(data, lut, *, bmin=(0.0, 0.0, 0.0), bmax=(1.0, 1.0, 1.0)):
    """Assemble the positional argument tuple shared by the oracle and the
    diff renderer (single-brick bucket)."""
    camera = make_camera()
    forward, right, up = camera_basis(camera)
    dims = np.asarray(data.shape)
    step = 0.5 * float(
        np.min((np.asarray(bmax) - np.asarray(bmin)) / dims)
    )
    return (
        jnp.asarray(data, jnp.float32)[None],
        jnp.asarray(bmin, jnp.float32)[None],
        jnp.asarray(bmax, jnp.float32)[None],
        jnp.asarray(dims, jnp.int32)[None],
        jnp.asarray(lut, jnp.float32)[None],
        jnp.asarray([step], jnp.float32),
        jnp.asarray(camera.eye, jnp.float32),
        jnp.asarray(forward, jnp.float32),
        jnp.asarray(right, jnp.float32),
        jnp.asarray(up, jnp.float32),
        jnp.float32(camera.fov_y_degrees),
        jnp.float32(0.0),
        jnp.float32(1.0),
        jnp.float32(0.0),
        jnp.float32(0.0),
        jnp.float32(1.0),
    )


def smooth_lut(size=256, peak_alpha=0.35):
    lut = np.zeros((size, 4), dtype=np.float32)
    t = np.linspace(0.0, 1.0, size)
    lut[:, 0] = t
    lut[:, 1] = 0.4
    lut[:, 2] = 1.0 - t
    lut[:, 3] = peak_alpha * t
    return lut


STATIC = dict(width=WIDTH, height=HEIGHT, num_steps=NUM_STEPS,
              log_scale=False, normalize=False, clip_start=1.0,
              apply_clip=False)


def test_forward_matches_oracle_on_constant_field():
    # a constant field makes trilinear == nearest, and value 128/255 lands
    # exactly on LUT entry 128, so the lerped lookup equals the floor()'d
    # one: the two formulations must agree to f32 rounding.
    data = np.full((8, 8, 8), 128.0 / 255.0, dtype=np.float32)
    lut = smooth_lut()
    args = make_args(data, lut)
    got_c, got_d = diff.render_layers_diff(*args, **STATIC)
    exp_c, exp_d = render_bucket_impl(*args, **STATIC)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(exp_c), atol=2e-6)
    np.testing.assert_array_equal(
        np.isfinite(np.asarray(got_d)), np.isfinite(np.asarray(exp_d))
    )


def test_forward_close_to_oracle_on_smooth_field():
    # on a smooth random field the trilinear/lerped formulation should stay
    # visually close to the nearest/floor oracle (same integral, smoother
    # interpolants) — a coarse sanity bound, not a parity contract.
    rng = np.random.default_rng(3)
    base = rng.uniform(0.2, 0.8, size=(4, 4, 4))
    data = np.kron(base, np.ones((2, 2, 2)))[:8, :8, :8].astype(np.float32)
    lut = smooth_lut()
    args = make_args(data, lut)
    got_c, _ = diff.render_layers_diff(*args, **STATIC)
    exp_c, _ = render_bucket_impl(*args, **STATIC)
    assert float(jnp.abs(got_c - exp_c).max()) < 0.12


def test_grad_wrt_data_matches_finite_differences():
    rng = np.random.default_rng(11)
    data = rng.uniform(0.2, 0.8, size=(6, 6, 6)).astype(np.float32)
    lut = smooth_lut(peak_alpha=0.3)
    args = make_args(data, lut)
    w = jnp.asarray(rng.uniform(0.0, 1.0, size=(WIDTH * HEIGHT, 4)), jnp.float32)

    def loss(d):
        image = diff.render_image_diff(d, *args[1:], **STATIC)
        return jnp.sum(image * w)

    g = np.asarray(jax.grad(loss)(args[0]))[0]
    assert np.any(g != 0.0), "gradient wrt volume data must be nonzero"

    # central finite differences on the largest-gradient cells
    flat = np.argsort(np.abs(g).ravel())[::-1][:5]
    eps = 2e-2
    for fi in flat:
        i, j, k = np.unravel_index(fi, g.shape)
        dp = np.array(data)
        dp[i, j, k] += eps
        dm = np.array(data)
        dm[i, j, k] -= eps
        fd = (float(loss(jnp.asarray(dp)[None])) -
              float(loss(jnp.asarray(dm)[None]))) / (2 * eps)
        assert fd == pytest.approx(float(g[i, j, k]), rel=0.12, abs=2e-4), (
            f"cell {(i, j, k)}: ad={g[i, j, k]:.6g} fd={fd:.6g}"
        )


def test_grad_wrt_lut_matches_finite_differences():
    rng = np.random.default_rng(4)
    data = rng.uniform(0.2, 0.8, size=(6, 6, 6)).astype(np.float32)
    lut = smooth_lut(size=64, peak_alpha=0.3)
    args = make_args(data, lut)
    w = jnp.asarray(rng.uniform(0.0, 1.0, size=(WIDTH * HEIGHT, 4)), jnp.float32)

    def loss(table):
        image = diff.render_image_diff(args[0], *args[1:4], table,
                                       *args[5:], **STATIC)
        return jnp.sum(image * w)

    g = np.asarray(jax.grad(loss)(args[4]))[0]
    assert np.any(g != 0.0), "gradient wrt transfer function must be nonzero"

    idx = np.argsort(np.abs(g).ravel())[::-1][:5]
    eps = 2e-2
    for fi in idx:
        r, c = np.unravel_index(fi, g.shape)
        lp = np.array(lut)
        lp[r, c] += eps
        lm = np.array(lut)
        lm[r, c] -= eps
        fd = (float(loss(jnp.asarray(lp)[None])) -
              float(loss(jnp.asarray(lm)[None]))) / (2 * eps)
        assert fd == pytest.approx(float(g[r, c]), rel=0.12, abs=2e-4), (
            f"entry {(r, c)}: ad={g[r, c]:.6g} fd={fd:.6g}"
        )


def test_jit_grad_matches_eager():
    rng = np.random.default_rng(5)
    data = rng.uniform(0.2, 0.8, size=(6, 6, 6)).astype(np.float32)
    args = make_args(data, smooth_lut())

    def loss(d):
        return jnp.mean(diff.render_image_diff(d, *args[1:], **STATIC))

    eager = jax.grad(loss)(args[0])
    jitted = jax.jit(jax.grad(loss))(args[0])
    np.testing.assert_allclose(
        np.asarray(eager), np.asarray(jitted), rtol=1e-5, atol=1e-7
    )


def test_composite_layers_diff_matches_manual_fold():
    rng = np.random.default_rng(9)
    layers = rng.uniform(0.0, 0.4, size=(3, 10, 4)).astype(np.float32)
    order = [2, 0, 1]
    got = np.asarray(diff.composite_layers_diff(jnp.asarray(layers), order))
    accum = np.zeros((10, 4), dtype=np.float32)
    for li in order:
        accum = accum + layers[li] * (1.0 - accum[:, 3:4])
    np.testing.assert_allclose(got, np.clip(accum, 0, 1), rtol=1e-6, atol=1e-7)


def test_two_brick_default_order_is_depth_sorted():
    # two disjoint bricks stacked along the view axis: the near brick must
    # be composited first (its color dominates where both overlap).
    rng = np.random.default_rng(2)
    d_near = np.full((4, 4, 4), 0.9, dtype=np.float32)
    d_far = np.full((4, 4, 4), 0.1, dtype=np.float32)
    camera = make_camera()
    forward, right, up = camera_basis(camera)
    lut = smooth_lut(peak_alpha=0.9)
    args = (
        jnp.asarray(np.stack([d_far, d_near]), jnp.float32),
        jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32),
        jnp.asarray([[1.0, 1.0, 1.0], [1.0, 1.0, 2.0]], jnp.float32),
        jnp.asarray([[4, 4, 4], [4, 4, 4]], jnp.int32),
        jnp.asarray(np.stack([lut, lut]), jnp.float32),
        jnp.asarray([0.125, 0.125], jnp.float32),
        jnp.asarray(camera.eye, jnp.float32),
        jnp.asarray(forward, jnp.float32),
        jnp.asarray(right, jnp.float32),
        jnp.asarray(up, jnp.float32),
        jnp.float32(camera.fov_y_degrees),
        jnp.float32(0.0),
        jnp.float32(1.0),
    )
    image = np.asarray(diff.render_image_diff(*args, **STATIC))
    center = (HEIGHT // 2) * WIDTH + WIDTH // 2
    # near brick has value 0.9 -> red-dominant under smooth_lut
    assert image[center, 0] > image[center, 2], (
        "near (red) brick must composite in front of the far (blue) one"
    )


def test_remat_grad_matches_no_remat():
    rng = np.random.default_rng(6)
    data = rng.uniform(0.2, 0.8, size=(6, 6, 6)).astype(np.float32)
    args = make_args(data, smooth_lut())

    def loss(d, remat):
        return jnp.mean(
            diff.render_image_diff(d, *args[1:], remat=remat, **STATIC)
        )

    g_remat = jax.grad(lambda d: loss(d, True))(args[0])
    g_plain = jax.grad(lambda d: loss(d, False))(args[0])
    np.testing.assert_allclose(
        np.asarray(g_remat), np.asarray(g_plain), rtol=1e-6, atol=1e-9
    )


def test_prepare_scene_end_to_end():
    rng = np.random.default_rng(8)
    bricks = [
        (rng.uniform(0.1, 0.9, size=(6, 6, 6)).astype(np.float32),
         (0.0, 0.0, 0.0), (1.0, 1.0, 1.0)),
        (rng.uniform(0.1, 0.9, size=(4, 8, 6)).astype(np.float32),
         (0.0, 0.0, 1.0), (1.0, 1.0, 2.0)),
    ]
    args, static = diff.prepare_scene(
        bricks, make_camera(), width=WIDTH, height=HEIGHT
    )
    image = diff.render_image_diff(*args, **static)
    assert image.shape == (WIDTH * HEIGHT, 4)
    assert float(image[:, 3].max()) > 0.0

    def loss(d):
        return jnp.mean(diff.render_image_diff(d, *args[1:], **static))

    g = np.asarray(jax.grad(loss)(args[0]))
    assert np.any(g[0] != 0.0) and np.any(g[1] != 0.0), (
        "gradients must flow into both bricks"
    )
    # padding cells (outside brick 1's [4, 8, 6] valid region) can only
    # receive gradient through clamp-to-edge ties; the valid region must
    # dominate
    assert np.abs(g[1][:4, :8, :6]).sum() > 0.0


def test_sharded_brick_axis_gradient_matches_single_device():
    # the diff path is plain XLA, so data-parallel gradients come from
    # GSPMD alone: shard the brick axis over the virtual 8-device mesh
    # and the jitted gradient must match the unsharded one exactly.
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")

    rng = np.random.default_rng(13)
    bricks = []
    for b in range(8):
        lo = (0.0, 0.0, float(b))
        hi = (1.0, 1.0, float(b) + 1.0)
        bricks.append(
            (rng.uniform(0.1, 0.9, size=(4, 4, 4)).astype(np.float32), lo, hi)
        )
    camera = CameraParameters(
        eye=(0.5, 0.5, 20.0), look_at=(0.5, 0.5, 4.0), up=(0.0, 1.0, 0.0)
    )
    args, static = diff.prepare_scene(bricks, camera, width=8, height=8)

    def loss(d):
        return jnp.mean(diff.render_image_diff(d, *args[1:], **static))

    g_single = np.asarray(jax.jit(jax.grad(loss))(args[0]))

    mesh = Mesh(np.array(jax.devices()[:8]), ("bricks",))
    sharding = NamedSharding(mesh, PartitionSpec("bricks"))
    data_sharded = jax.device_put(args[0], sharding)
    g_sharded = np.asarray(jax.jit(jax.grad(loss))(data_sharded))
    np.testing.assert_allclose(g_sharded, g_single, rtol=1e-6, atol=1e-9)


def test_no_nan_gradient_on_parallel_miss_rays():
    # regression: an axis-aligned camera with an odd image dimension puts
    # exactly-zero direction components on the center row/column; for a
    # brick whose perpendicular extent excludes the eye the slab guard
    # returns tmin = +inf, and inf * 0 in the position math used to
    # poison jax.grad with NaNs while the forward image stayed clean.
    rng = np.random.default_rng(15)
    data = rng.uniform(0.2, 0.8, size=(4, 4, 4)).astype(np.float32)
    lut = smooth_lut()
    # brick displaced in x so the eye (x=0.5) is outside its x slab
    args = make_args(data, lut, bmin=(2.0, 0.0, 0.0), bmax=(3.0, 1.0, 1.0))
    static = dict(STATIC, width=11, height=11)

    def loss(d):
        return jnp.sum(diff.render_image_diff(d, *args[1:], **static))

    image = np.asarray(diff.render_image_diff(*args, **static))
    assert np.all(np.isfinite(image))
    g = np.asarray(jax.grad(loss)(args[0]))
    assert np.all(np.isfinite(g)), f"{np.isnan(g).sum()} NaN gradient cells"


def test_prepare_scene_opacity_reference_is_coarsest_brick():
    # the product pipeline normalizes per-brick LUT opacity against the
    # COARSEST brick (renderer.compute_reference_sample_distance); the
    # coarse brick's normalization factor is then exactly 1, so its LUT
    # must equal a plain build, and the fine brick's opacity must come
    # out LOWER per sample (factor < 1 under 1-(1-a)^f).
    from amrvolumerenderer_tpu.colormap import build_color_table

    rng = np.random.default_rng(19)
    coarse = rng.uniform(0.2, 0.8, size=(4, 4, 4)).astype(np.float32)
    fine = rng.uniform(0.2, 0.8, size=(8, 8, 8)).astype(np.float32)
    bricks = [
        (coarse, (0.0, 0.0, 0.0), (1.0, 1.0, 1.0)),
        (fine, (0.0, 0.0, 1.0), (1.0, 1.0, 2.0)),
    ]
    args, _ = diff.prepare_scene(bricks, make_camera(), width=8, height=8)
    luts = np.asarray(args[4])
    expected_coarse = build_color_table(1.0, 1.0, (0.0, 1.0), None, size=256)
    np.testing.assert_allclose(luts[0], expected_coarse, rtol=1e-6, atol=1e-7)
    # fine brick steps half as far -> factor 0.5 -> strictly less alpha
    assert np.all(luts[1][1:, 3] < luts[0][1:, 3])


def test_default_order_matches_corner_depth_hints():
    # the default ordering key must be the forward pipeline's fallback:
    # min view depth over the 8 box corners (compute_box_depth_hints),
    # not a per-pixel alpha-gated entry depth — a brick that accumulates
    # zero alpha must still order by its geometry.
    from amrvolumerenderer_tpu.camera import compute_box_depth_hints

    camera = make_camera()
    forward, right, up = camera_basis(camera)
    mins = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, 0.0]], np.float32)
    maxs = np.array([[1.0, 1.0, 2.0], [1.0, 1.0, 1.0]], np.float32)
    hints = compute_box_depth_hints(mins, maxs, camera)
    expected = np.argsort(hints)
    # transparent LUT: the per-pixel entry-depth key would be inf for
    # both bricks (no alpha), but the corner-hint key still orders them
    lut = np.zeros((256, 4), dtype=np.float32)
    data = np.full((4, 4, 4), 0.5, dtype=np.float32)
    orders = []

    real_composite = diff.composite_layers_diff

    def spy_composite(colors, order):
        orders.append(np.asarray(order))
        return real_composite(colors, order)

    import unittest.mock as mock

    with mock.patch.object(diff, "composite_layers_diff", spy_composite):
        diff.render_image_diff(
            jnp.asarray(np.stack([data, data])),
            jnp.asarray(mins), jnp.asarray(maxs),
            jnp.asarray([[4, 4, 4], [4, 4, 4]], jnp.int32),
            jnp.asarray(np.stack([lut, lut])),
            jnp.asarray([0.125, 0.125], jnp.float32),
            jnp.asarray(camera.eye, jnp.float32),
            jnp.asarray(forward, jnp.float32),
            jnp.asarray(right, jnp.float32),
            jnp.asarray(up, jnp.float32),
            jnp.float32(camera.fov_y_degrees),
            jnp.float32(0.0), jnp.float32(1.0),
            **STATIC,
        )
    np.testing.assert_array_equal(orders[0], expected)


def test_prepare_geometry_from_plotfile(tmp_path):
    # the bridge from the product ingestion path to the diff renderer:
    # write a plotfile, load it through the driver's scene build, and
    # differentiate through the resulting scene.
    from amrvolumerenderer_tpu.driver import load_plotfile_geometry
    from amrvolumerenderer_tpu.plotfile import write_plotfile
    from amrvolumerenderer_tpu.scene import LevelBox, LevelGeometry

    n = 8
    c = np.arange(n) / (n - 1)
    field = (c[:, None, None] ** 2 + c[None, :, None] ** 2
             + c[None, None, :] ** 2).astype(np.float64)
    path = str(tmp_path / "plt00000")
    write_plotfile(
        path, [[LevelBox(field, np.zeros(3, dtype=int))]],
        [LevelGeometry(np.zeros(3), np.full(3, 1.0 / n))],
        var_names=["density"],
    )
    geometry = load_plotfile_geometry(
        path, "density", 0, -1, log_scale_input=False, verbose=False
    )
    args, static = diff.prepare_geometry(
        geometry, make_camera(), width=WIDTH, height=HEIGHT
    )
    image = diff.render_image_diff(*args, **static)
    assert float(image[:, 3].max()) > 0.0

    def loss(d):
        return jnp.mean(diff.render_image_diff(d, *args[1:], **static))

    g = np.asarray(jax.grad(loss)(args[0]))
    assert np.any(g != 0.0)

    # an EXPLICIT scalar range (the CLI --scalar-range / time-series fixed
    # range) must flow through the bridge exactly as the forward pipeline
    # consumes it (renderer.py render_scene: geometry.scalar_range when
    # has_scalar_range): normalization moves into the transform and the
    # classified range becomes (0, 1) — not the recomputed data range
    from amrvolumerenderer_tpu.scene import set_scene_normalization_range

    set_scene_normalization_range(geometry, 0.0, 10.0)
    args2, _static2 = diff.prepare_geometry(
        geometry, make_camera(), width=WIDTH, height=HEIGHT
    )
    assert float(args2[11]) == 0.0 and float(args2[12]) == 1.0
    t = geometry.scalar_transform
    assert float(args2[14]) == np.float32(t.normalization_min)
    assert float(args2[15]) == np.float32(t.inverse_normalization_span)


def test_grad_wrt_camera_eye_is_finite_and_nonzero():
    # pose gradients exist (the eye flows through ray origins, slab
    # entry/exit, and every sample position) but are SUBGRADIENTS of a
    # staircase: the fixed-step quadrature's per-pixel step count jumps
    # by +-1 as the eye moves, so finite differences at any practical
    # eps measure the jumps, not the smooth branch (measured: FD ~ 10 vs
    # AD ~ -1 at eps=1e-2 over a 12x12 frame).  The testable contract is
    # finiteness + nonzeroness; data/TF gradients are the
    # FD-validated surfaces (the quadrature grid does not move with
    # them).
    rng = np.random.default_rng(23)
    data = rng.uniform(0.2, 0.8, size=(6, 6, 6)).astype(np.float32)
    args = make_args(data, smooth_lut(peak_alpha=0.3))
    w = jnp.asarray(rng.uniform(0.0, 1.0, size=(WIDTH * HEIGHT, 4)), jnp.float32)

    def loss(eye):
        return jnp.sum(
            diff.render_image_diff(*args[:6], eye, *args[7:], **STATIC) * w
        )

    g = np.asarray(jax.grad(loss)(args[6]))
    assert np.all(np.isfinite(g))
    assert np.any(g != 0.0), "gradient wrt camera eye must be nonzero"


def test_transfer_function_optimization_descends():
    # the motivating use case: recover a transfer function by gradient
    # descent against a target image rendered with a known TF.
    rng = np.random.default_rng(21)
    data = rng.uniform(0.1, 0.9, size=(6, 6, 6)).astype(np.float32)
    target_lut = smooth_lut(size=32, peak_alpha=0.5)
    args = make_args(data, target_lut)
    target = diff.render_image_diff(*args, **STATIC)

    def loss(table):
        image = diff.render_image_diff(args[0], *args[1:4], table,
                                       *args[5:], **STATIC)
        return jnp.mean((image - target) ** 2)

    lut0 = jnp.asarray(smooth_lut(size=32, peak_alpha=0.15))[None]
    value_and_grad = jax.jit(jax.value_and_grad(loss))
    lut_opt = lut0
    losses = []
    for _ in range(12):
        val, g = value_and_grad(lut_opt)
        losses.append(float(val))
        lut_opt = jnp.clip(lut_opt - 2.0 * g, 0.0, 1.0)
    final, _ = value_and_grad(lut_opt)
    assert float(final) < 0.5 * losses[0], (
        f"optimization failed to descend: {losses[0]:.3g} -> {float(final):.3g}"
    )
