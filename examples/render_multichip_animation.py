"""Persistent multi-chip animation: bricks resident on a device mesh.

The one-shot ``devices=N`` option (render_volume.py, api.render) matches
the reference's per-render ``mpirun`` flow — brick tables re-pack and
re-upload every call.  For animation and in-situ serving,
``MultiChipSceneRenderer`` keeps the scene sharded on the mesh for the
whole run: per frame only the 20-float camera pack, per-piece ordering
keys, and the validity mask ship to the devices, and the render +
exchange + composite program is compiled once and reused.  The orbit
itself renders through ``render_batch``: consecutive same-march-axis
frames scan inside ONE sharded dispatch.

Run on any device set; on a single-host CPU you can fake a mesh with:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/render_multichip_animation.py
(Beyond reference: the reference has no persistent-scene API.)
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from amrvolumerenderer_tpu import api  # noqa: E402
from amrvolumerenderer_tpu.camera import auto_orbit_camera  # noqa: E402
from amrvolumerenderer_tpu.parallel.persistent import (  # noqa: E402
    MultiChipSceneRenderer,
)
from amrvolumerenderer_tpu.scene import LevelBox, LevelGeometry  # noqa: E402
from amrvolumerenderer_tpu.types import (  # noqa: E402
    CameraParameters,
    RenderParameters,
)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--size", type=int, default=256, help="frame edge pixels")
    p.add_argument("--frames", type=int, default=8, help="orbit frame count")
    p.add_argument("--output-dir", default=".", help="where the PPMs go")
    args = p.parse_args(argv)

    n = 32
    c = (np.arange(n) + 0.5) / n
    field = (
        c[:, None, None] ** 2 + c[None, :, None] ** 2 + c[None, None, :] ** 2
    )
    data = api.AmrData(
        level_data=[[LevelBox(field, np.zeros(3, dtype=int))]],
        level_geometry=[LevelGeometry(np.zeros(3), np.full(3, 1.0 / n))],
    )
    geometry = api.load_amr_geometry(
        data, 0, -1, 0, False, True, verbose=False
    )

    devices = len(jax.devices())
    renderer = MultiChipSceneRenderer(
        geometry, RenderParameters(width=args.size, height=args.size),
        num_devices=devices,
    )
    print(f"scene resident on {devices} device(s); rendering orbit ...")

    base = auto_orbit_camera(renderer.bounds)
    center = 0.5 * (renderer.bounds.min_corner + renderer.bounds.max_corner)
    offset = np.asarray(base.eye) - center
    cams = []
    for k in range(args.frames):
        ang = 2.0 * np.pi * k / 32.0
        cs, sn = np.cos(ang), np.sin(ang)
        eye = center + np.array([
            cs * offset[0] + sn * offset[2],
            offset[1],
            -sn * offset[0] + cs * offset[2],
        ])
        cams.append(CameraParameters(
            eye=tuple(eye), look_at=tuple(center), up=(0, 1, 0)
        ))
    os.makedirs(args.output_dir, exist_ok=True)
    pattern = os.path.join(args.output_dir, "multichip_{:02d}.ppm")
    # batched: consecutive same-march-axis frames scan inside ONE sharded
    # dispatch (render(cam, output_filename=...) serves the per-frame case)
    renderer.render_batch(cams, output_pattern=pattern)
    stats = renderer.last_batch_stats
    print(f"  {args.frames} frames in {stats['dispatch_count']} mesh "
          f"dispatch(es): {pattern.format(0)} ..")
    print("done; the sharded program compiled once and served every frame")
    return 0


if __name__ == "__main__":
    sys.exit(main())
