"""Re-validate the march-loop unroll factor with the slope method.

The round-2 sweep ("unroll 2/4/8 identical") was drawn from the
hoisting-poisoned methodology; this one uses the single-launch slope
measurement on the real chip.  Usage: python scripts/unroll_sweep.py
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import bench  # noqa: E402
from amrvolumerenderer_tpu.camera import auto_orbit_camera  # noqa: E402
from amrvolumerenderer_tpu.fast_scene import FastSceneRenderer  # noqa: E402
from amrvolumerenderer_tpu.types import (  # noqa: E402
    RenderParameters,
    color_map_from_tuples,
)


def measure(fsr, cam, unroll, F=(4, 16)):
    import jax
    import jax.numpy as jnp

    from amrvolumerenderer_tpu.ops import tilemarch as tm

    inputs = fsr.frame_inputs(cam, as_numpy=True)

    def launch_time(f):
        import time

        cams = np.tile(inputs["cam"], (f, 1)).astype(np.float32)
        cams[:, 19] = np.arange(f)

        @jax.jit
        def frames(vol, meta, dims, lut, cams, offsets, bricks, owners,
                   ibounds, tile_ids):
            out_c, _ = tm.tilemarch_render_batch(
                vol, meta, dims, lut, cams, offsets, bricks, owners,
                ibounds, tile_ids,
                width=fsr.pad_w, height=fsr.pad_h, max_slices=fsr.cube,
                logical_width=fsr.render_width,
                logical_height=fsr.render_height,
                interpret=fsr.interpret, sampling=fsr.parameters.sampling,
                ghost=fsr.ghost, dma_slices=inputs["dma_slices"],
                classification=fsr.parameters.classification,
                unroll=unroll,
            )
            return jnp.sum(out_c[:, ::8])

        tile = lambda a: jnp.asarray(np.tile(a[None], (f,) + (1,) * a.ndim))
        args = (
            fsr._packed_vol, jnp.asarray(inputs["meta"]),
            jnp.asarray(inputs["dims"]), fsr._lut_device, jnp.asarray(cams),
            tile(inputs["offsets"]), tile(inputs["bricks"]),
            tile(inputs["owners"]), tile(inputs["item_bounds"]),
            tile(inputs["tile_ids"]),
        )
        float(frames(*args))  # warm/compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(frames(*args))
            times.append(time.perf_counter() - t0)
        return min(times) * 1e3

    f1, f2 = F
    return max((launch_time(f2) - launch_time(f1)) / (f2 - f1), 1e-3)


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    width = height = 1024

    geom = bench.build_three_level_scene()
    fsr = FastSceneRenderer(geom, RenderParameters(width=width, height=height))
    cam = auto_orbit_camera(fsr.bounds)

    sgeom = bench.build_shell_scene()
    sfsr = FastSceneRenderer(sgeom, RenderParameters(width=width, height=height))
    scam = auto_orbit_camera(sfsr.bounds)
    sfsr.set_transfer_function(color_map=color_map_from_tuples([
        (0.0, 0, 0, 0, 0.0), (0.3, 0, 0, 0, 0.0),
        (0.5, 1.0, 0.5, 0.2, 0.4), (1.0, 1.0, 1.0, 1.0, 0.8),
    ]))

    for unroll in (2, 4, 8):
        d = measure(fsr, cam, unroll)
        s = measure(sfsr, scam, unroll)
        print(f"unroll={unroll}: dense {d:.3f} ms  shell_tf {s:.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
