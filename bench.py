"""Headline benchmark: end-to-end 1024x1024 AMR frame on one chip.

BASELINE.md north-star: a 1024^2 multi-brick AMR frame rendered AND
composited in under 50 ms per chip.  This benchmark renders the scaled
insitu scene (a 64^3 domain split into eight 32^3 bricks) through the
slice-march Pallas kernel with work-list culling, then folds all brick
layers with the depth-sorted compositor — one fused jitted program per
frame.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = 50 ms / measured ms (>1 means faster than the target).
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

TARGET_MS = 50.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from amrvolumerenderer_tpu.camera import auto_orbit_camera, camera_basis
    from amrvolumerenderer_tpu.colormap import build_color_table
    from amrvolumerenderer_tpu.compositor import sort_layers
    from amrvolumerenderer_tpu.ops import slicemarch as sm
    from amrvolumerenderer_tpu.types import VolumeBounds

    on_tpu = jax.default_backend() == "tpu"
    width = height = 1024 if on_tpu else 128  # CPU fallback keeps CI fast

    n_cells, box = 64, 32
    coords = np.arange(n_cells) / (n_cells - 1)
    field = (
        coords[:, None, None] ** 2
        + coords[None, :, None] ** 2
        + coords[None, None, :] ** 2
    ).astype(np.float32)
    field /= field.max()

    bounds = VolumeBounds((-0.05,) * 3, (1.05,) * 3)
    camera = auto_orbit_camera(bounds)
    forward, right, up = camera_basis(camera)
    axis = sm.choose_march_axis(forward)
    axes = [axis] + [a for a in range(3) if a != axis]

    vols, metas, dims_list, bmins, bmaxs, hints = [], [], [], [], [], []
    from amrvolumerenderer_tpu.camera import compute_box_depth_hint

    for i0 in range(0, n_cells, box):
        for j0 in range(0, n_cells, box):
            for k0 in range(0, n_cells, box):
                d = field[i0 : i0 + box, j0 : j0 + box, k0 : k0 + box]
                mn = np.array([i0, j0, k0]) / n_cells
                mx = np.array([i0 + box, j0 + box, k0 + box]) / n_cells
                vol, (ns, nu, nv) = sm.pack_slice_volume(d, axis)
                pmin, pmax = mn[axes], mx[axes]
                cell = (pmax - pmin) / np.array([ns, nu, nv])
                m = np.zeros(12, np.float32)
                m[0:3], m[3:6], m[6:9] = pmin, pmax, cell
                dd = np.zeros(8, np.int32)
                dd[:3] = (ns, nu, nv)
                dd[3:6] = axes
                vols.append(vol)
                metas.append(m)
                dims_list.append(dd)
                bmins.append(mn)
                bmaxs.append(mx)
                hints.append(compute_box_depth_hint(mn, mx, camera))

    vol = np.stack(vols)
    meta = np.stack(metas)
    dims = np.stack(dims_list)
    num_bricks = vol.shape[0]

    lut = build_color_table(1.0, 1.0, (0.0, 1.0), None)
    packed = np.ascontiguousarray(
        np.broadcast_to(
            sm.build_log_lut(lut)[None], (num_bricks, 4, sm.LUT_ROWS, sm.LANES)
        )
    )
    ref_dist = 0.5 / n_cells
    cam = sm.pack_camera(
        np.asarray(camera.eye), forward, right, up, camera.fov_y_degrees,
        width / height, 0.0, 1.0, ref_dist,
    )
    wb, wt, coverage = sm.compute_worklist(
        np.stack(bmins), np.stack(bmaxs), np.asarray(camera.eye),
        forward, right, up, camera.fov_y_degrees, width, height,
    )

    hints = np.asarray(hints, dtype=np.float32)
    owners = np.arange(num_bricks, dtype=np.int32)
    local = np.zeros(num_bricks, dtype=np.int32)
    order = sort_layers(hints, owners, local)
    sorted_owners = owners[order]

    from amrvolumerenderer_tpu.renderer_fast import composited_frame

    def one_frame(vol, meta, dims, lutp, cam, wb, wt, cov, order, sowners):
        frame_px = composited_frame(
            vol, meta, dims, lutp, cam, wb, wt, cov, order, sowners,
            width=width, height=height, max_slices=32,
        )
        return jnp.sum(frame_px[:, :4])

    # Several frames per dispatch: host->device dispatch latency through the
    # runtime can exceed the frame time itself, so the per-frame number is
    # taken from a K-frame loop inside one jitted program.
    K = 10

    @jax.jit
    def frames(vol, meta, dims, lutp, cam, wb, wt, cov, order, sowners):
        def body(_, acc):
            return acc + one_frame(
                vol, meta, dims, lutp, cam, wb, wt, cov, order, sowners
            )
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    args = (
        jnp.asarray(vol), jnp.asarray(meta), jnp.asarray(dims),
        jnp.asarray(packed), jnp.asarray(cam), jnp.asarray(wb),
        jnp.asarray(wt), jnp.asarray(coverage), jnp.asarray(order),
        jnp.asarray(sorted_owners),
    )

    checksum = float(frames(*args))  # compile + warm up
    assert np.isfinite(checksum) and checksum > 0.0

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(frames(*args))  # scalar readback forces completion
        times.append(time.perf_counter() - t0)
    frame_ms = min(times) * 1e3 / K

    print(
        json.dumps(
            {
                "metric": "amr_frame_1024_composited",
                "value": round(frame_ms, 2),
                "unit": "ms",
                "vs_baseline": round(TARGET_MS / frame_ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
