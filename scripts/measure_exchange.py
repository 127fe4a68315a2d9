"""Measure the multichip composite exchange instead of modeling it.

Runs on a virtual N-device CPU mesh (invoked by bench.py as a subprocess
so the TPU-bound parent process keeps its platform): wall-clocks the
depth-contiguous and layered composite exchanges in K-iteration jitted
loops, and extracts the ACTUAL per-frame cross-link collective bytes from
the compiled HLO (every all-to-all / all-gather op's output, scaled by the
fraction that crosses a link) — the measurement twin of the reference's
per-run compositing timer (VolumeRenderer.cpp:1247-1253).

Usage: python scripts/measure_exchange.py <pixels> <layers> <devices>
Prints one JSON object.
"""

import json
import os
import re
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count="
        + (sys.argv[3] if len(sys.argv) > 3 else "8")
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

_DTYPE_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "f16": 2, "u8": 1, "s8": 1,
                "u32": 4, "s32": 4, "u16": 2, "s16": 2, "pred": 1}


def cross_link_bytes(hlo_text: str, num_devices: int) -> int:
    """Per-DEVICE bytes crossing ICI links per frame, from the compiled
    HLO.  For each collective, the op's output type (left of the op name)
    is the per-device output — a TUPLE of split shapes for tuple-form
    all-to-all, a plain array for all-gather — of which (D-1)/D arrived
    over links.  Multiply by D for the all-device total (main() reports
    both; *_link_mb_total is the number comparable to the
    ici_exchange_mb_* payload model in bench.py)."""
    total = 0
    for line in hlo_text.splitlines():
        m = re.search(r"=\s*(.*?)\s*(all-to-all|all-gather)\(", line)
        if not m:
            continue
        out_bytes = 0
        for dtype, dims in re.findall(r"(\w+)\[([\d,]*)\]", m.group(1)):
            size = _DTYPE_BYTES.get(dtype)
            if size is None or not dims:
                continue
            elems = int(np.prod([int(d) for d in dims.split(",")]))
            out_bytes += elems * size
        total += out_bytes * (num_devices - 1) // num_devices
    return total


def time_compiled(fn, args, iters=4, reps=2):
    import time

    jax.block_until_ready(fn(*args))  # warm compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    pixels = int(sys.argv[1]) if len(sys.argv) > 1 else 430080
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 36
    devices = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    pixels -= pixels % devices
    lmax = -(-layers // devices)

    from amrvolumerenderer_tpu.parallel.directsend import (
        composite_layers_sharded,
        composite_partials_sharded,
        make_mesh,
    )

    mesh = make_mesh(devices)
    rng = np.random.default_rng(0)

    out = {"devices": devices, "pixels": pixels, "layers": layers}

    # depth-contiguous: D pre-composited partials, one all_to_all
    partials = rng.random((devices, pixels, 5)).astype(np.float32)

    def run_depth(p):
        return composite_partials_sharded(mesh, p)

    import jax.numpy as jnp

    p_dev = jnp.asarray(partials)
    out["depth_ms"] = round(time_compiled(run_depth, (p_dev,)), 3)
    # compiled HLO for the inner shard_map program
    from amrvolumerenderer_tpu.parallel import directsend as ds

    num = mesh.devices.size
    import jax.sharding as shd
    P = shd.PartitionSpec

    def depth_prog(img):
        def body(img):
            _, np_, ch = img.shape
            shard = np_ // num
            chunks = img.reshape(num, shard, ch)
            received = jax.lax.all_to_all(
                chunks, ds.mesh_axes(mesh), split_axis=0, concat_axis=0
            )
            owners = jax.lax.broadcasted_iota(jnp.int32, (num, 1), 0)[:, 0]
            return ds._composite_sorted_runs(received, owners)

        return jax.shard_map(
            body, mesh=mesh, in_specs=P(ds.mesh_axes(mesh)),
            out_specs=P(ds.mesh_axes(mesh)),
        )(img)

    hlo = jax.jit(depth_prog).lower(p_dev).compile().as_text()
    per_dev = cross_link_bytes(hlo, devices)
    out["depth_link_mb_per_dev"] = round(per_dev / 1e6, 2)
    out["depth_link_mb_total"] = round(per_dev * devices / 1e6, 2)

    # layered: D * Lmax full layers through the all_to_all + gathered hints
    lay = rng.random((devices * lmax, pixels, 5)).astype(np.float32)
    hints = np.arange(devices * lmax, dtype=np.float32)
    l_dev = jnp.asarray(lay)
    h_dev = jnp.asarray(hints)
    for transport in ("float32", "ubyte"):
        def run_lay(a, b, _t=transport):
            return composite_layers_sharded(mesh, a, b, transport=_t)

        out[f"layered_{transport}_ms"] = round(
            time_compiled(run_lay, (l_dev, h_dev), iters=2, reps=1), 3
        )
        prog = jax.jit(
            jax.shard_map(
                lambda a, b, _t=transport: ds._compose_shard(
                    a, b, _t, ds.mesh_axes(mesh)
                ),
                mesh=mesh,
                in_specs=(P(ds.mesh_axes(mesh)),) * 2,
                out_specs=P(ds.mesh_axes(mesh)),
            )
        )
        hlo = prog.lower(l_dev, h_dev).compile().as_text()
        per_dev = cross_link_bytes(hlo, devices)
        out[f"layered_{transport}_link_mb_per_dev"] = round(per_dev / 1e6, 2)
        out[f"layered_{transport}_link_mb_total"] = round(
            per_dev * devices / 1e6, 2
        )

    # pre-blended layered (round 4): the persistent mesh renderer ships
    # O(runs) pre-blended layers instead of O(layers).  On the 36-piece
    # bench scene the run depth ~= the layer depth (4.5 pieces/device)
    # and the per-frame plan falls back to the raw exchange
    # (_use_preblend) — record that decision; the traffic win appears on
    # deep shards, so measure the pre-blend against a like-for-like raw
    # exchange on a 216-piece scene (27 pieces/device, Morton placement)
    # whose run structure comes from the real visibility order.
    try:
        from bench import build_three_level_scene
        from amrvolumerenderer_tpu import api
        from amrvolumerenderer_tpu.camera import auto_orbit_camera
        from amrvolumerenderer_tpu.parallel.directsend import (
            _layers_preblend_prog,
            _layers_prog,
            preblend_plan,
        )
        from amrvolumerenderer_tpu.parallel.persistent import (
            MultiChipSceneRenderer,
        )
        from amrvolumerenderer_tpu.scene import LevelBox, LevelGeometry
        from amrvolumerenderer_tpu.types import RenderParameters

        def frame_plan(geometry):
            r = MultiChipSceneRenderer(
                geometry, RenderParameters(width=1024, height=1024),
                num_devices=devices,
            )
            _axis, _cam, slot_hints, slot_valid = r._frame_state(
                auto_orbit_camera(r.bounds)
            )
            eff = r._effective_hints(slot_hints, slot_valid)
            return r, eff, preblend_plan(eff)

        r, eff, (_lo, _rs, _pm, rmax) = frame_plan(build_three_level_scene())
        out["bench_scene_rmax"] = rmax
        out["bench_scene_lmax"] = eff.shape[1]
        out["bench_scene_preblend_active"] = bool(r._use_preblend(rmax))

        n, bs = 48, 8  # 216 pieces, 27/device
        c = (np.arange(n) + 0.5) / n
        rad = np.sqrt(((c[:, None, None] - 0.5) ** 2)
                      + ((c[None, :, None] - 0.5) ** 2)
                      + ((c[None, None, :] - 0.5) ** 2))
        f = np.exp(-((rad - 0.35) / 0.1) ** 2)
        boxes = [
            LevelBox(f[i:i + bs, j:j + bs, k:k + bs],
                     np.array([i, j, k], dtype=int))
            for i in range(0, n, bs)
            for j in range(0, n, bs)
            for k in range(0, n, bs)
        ]
        deep = api.load_amr_geometry(
            api.AmrData(
                level_data=[boxes],
                level_geometry=[
                    LevelGeometry(np.zeros(3), np.full(3, 1.0 / n))
                ],
            ), 0, -1, 0, False, True, verbose=False,
        )
        r, eff, (local_order, run_slot, perm, rmax) = frame_plan(deep)
        lmax_r = eff.shape[1]
        deep_px = max(devices, (pixels // 4) - (pixels // 4) % devices)
        out["deep_rmax"] = rmax
        out["deep_lmax"] = lmax_r
        out["deep_pixels"] = deep_px
        lay_r = rng.random((devices * lmax_r, deep_px, 5)).astype(np.float32)
        prog = _layers_preblend_prog(mesh, "float32", rmax)
        args = (
            jnp.asarray(lay_r), jnp.asarray(local_order),
            jnp.asarray(run_slot), jnp.asarray(perm),
        )
        out["deep_preblend_ms"] = round(
            time_compiled(prog, args, iters=2, reps=1), 3
        )
        hlo = prog.lower(*args).compile().as_text()
        per_dev = cross_link_bytes(hlo, devices)
        out["deep_preblend_link_mb_per_dev"] = round(per_dev / 1e6, 2)
        out["deep_preblend_link_mb_total"] = round(
            per_dev * devices / 1e6, 2
        )
        # like-for-like raw layered exchange at the same depth
        hints_r = np.where(
            np.isfinite(eff), eff, np.float32(np.inf)
        ).reshape(-1)
        plain = _layers_prog(mesh, "float32")
        pargs = (jnp.asarray(lay_r), jnp.asarray(hints_r))
        out["deep_layered_ms"] = round(
            time_compiled(plain, pargs, iters=2, reps=1), 3
        )
        hlo = plain.lower(*pargs).compile().as_text()
        per_dev = cross_link_bytes(hlo, devices)
        out["deep_layered_link_mb_per_dev"] = round(per_dev / 1e6, 2)
        out["deep_layered_link_mb_total"] = round(
            per_dev * devices / 1e6, 2
        )
    except Exception as err:  # scene import is bench-environment only
        out["layered_preblend_error"] = repr(err)[:120]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
