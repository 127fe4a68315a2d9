"""Pallas port of the exact ray-march kernel (validation artifact).

Same semantics as ``ops.raymarch.render_bucket_impl`` (the XLA oracle,
mirroring Common/VolumePainter.cpp:735-922), hand-tiled for the TPU.

NOTE: this kernel requires a general 1D gather from the VMEM-resident
brick, which current Mosaic does not support on hardware ("Only 2D gather
is supported"); it runs in interpret mode only and is kept as an
intermediate validation artifact.  The production hardware path is the
slice-march kernel (``ops/slicemarch.py``), designed around the vreg
gather the hardware actually has:

  * grid = (bricks, pixel tiles): each program instance marches one brick
    for one tile of ``TILE_P`` pixels;
  * the brick volume and the 256-entry LUT live in VMEM for the whole
    march — sampling never touches HBM inside the step loop;
  * ray directions are generated in-kernel from pixel indices (no [P, 3]
    direction buffer in HBM);
  * per-brick metadata (corners, dims, step) rides in SMEM via scalar
    prefetch.

All math is performed on [SUBLANES, 128] vregs.  Nearest-cell sampling is a
flat 1D VMEM gather (``jnp.take``); correctness is validated against the
oracle in interpret mode on CPU and on hardware by tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
TILE_P = LANES * SUBLANES  # 1024 pixels per program instance

COLOR_TABLE_SIZE = 256


def _kernel(
    # scalar-prefetch refs (SMEM)
    cam_ref,  # [16] float32: eye(3) fwd(3) right(3) up(3) tanHalfFov aspect
    #            range_min inverse_range clip_start pad
    meta_ref,  # [B, 8] float32: min(3) max(3) step mesh_eps
    dims_ref,  # [B, 4] int32: nx ny nz pad
    # tensor refs
    data_ref,  # [1, nx, ny, nz] VMEM brick
    lut_ref,  # [1, 256, 4] VMEM
    color_ref,  # [1, TILE_P, 4] out
    depth_ref,  # [1, TILE_P] out
    *,
    width: int,
    height: int,
    num_steps: int,
    apply_clip: bool,
    soft_clip_tolerance: float = 1e-5,
):
    b = pl.program_id(0)
    t = pl.program_id(1)

    eye = [cam_ref[i] for i in range(3)]
    fwd = [cam_ref[3 + i] for i in range(3)]
    right = [cam_ref[6 + i] for i in range(3)]
    up = [cam_ref[9 + i] for i in range(3)]
    tan_half_fov = cam_ref[12]
    aspect = cam_ref[13]
    range_min = cam_ref[14]
    inverse_range = cam_ref[15]
    clip_start = cam_ref[16]

    bmin = [meta_ref[b, i] for i in range(3)]
    bmax = [meta_ref[b, 3 + i] for i in range(3)]
    step = meta_ref[b, 6]
    mesh_eps = meta_ref[b, 7]
    nx = dims_ref[b, 0]
    ny = dims_ref[b, 1]
    nz = dims_ref[b, 2]

    pad_ny = data_ref.shape[2]
    pad_nz = data_ref.shape[3]

    # pixel indices for this tile as a [SUBLANES, LANES] vreg
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0)
    pix = t * TILE_P + sub * LANES + lane
    px = (pix % width).astype(jnp.float32)
    py = (pix // width).astype(jnp.float32)

    # ray directions (VolumePainter.cpp:741-766)
    ndc_x = (px + 0.5) * (2.0 / width) - 1.0
    ndc_y = (py + 0.5) * (2.0 / height) - 1.0
    plane_x = ndc_x * tan_half_fov * aspect
    plane_y = ndc_y * tan_half_fov
    d = [fwd[i] + plane_x * right[i] + plane_y * up[i] for i in range(3)]
    len_sq = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    inv_len = jnp.where(len_sq > 0.0, jax.lax.rsqrt(len_sq), 0.0)
    d = [di * inv_len for di in d]

    # slab test (VolumePainter.cpp:775-809)
    inf = jnp.float32(np.inf)
    tmin = jnp.full((SUBLANES, LANES), -np.inf, jnp.float32)
    tmax = jnp.full((SUBLANES, LANES), np.inf, jnp.float32)
    for axis in range(3):
        parallel = jnp.abs(d[axis]) < 1e-8
        safe = jnp.where(parallel, 1.0, d[axis])
        inv = 1.0 / safe
        t1 = (bmin[axis] - eye[axis]) * inv
        t2 = (bmax[axis] - eye[axis]) * inv
        lo = jnp.minimum(t1, t2)
        hi = jnp.maximum(t1, t2)
        inside_axis = (eye[axis] >= bmin[axis]) & (eye[axis] <= bmax[axis])
        lo = jnp.where(parallel, jnp.where(inside_axis, -inf, inf), lo)
        hi = jnp.where(parallel, jnp.where(inside_axis, inf, -inf), hi)
        tmin = jnp.maximum(tmin, lo)
        tmax = jnp.minimum(tmax, hi)
    hit = tmax >= tmin

    d0 = tmin + mesh_eps
    d0 = jnp.where(d0 < 0.0, mesh_eps, d0)

    dims_f = [nx.astype(jnp.float32), ny.astype(jnp.float32), nz.astype(jnp.float32)]
    cell = [
        jnp.where(
            dims_f[i] > 0.0, (bmax[i] - bmin[i]) / jnp.maximum(dims_f[i], 1.0), 1.0
        )
        for i in range(3)
    ]

    flat = data_ref[0].reshape(-1)
    lut = lut_ref[0]  # [256, 4]

    def body(k, carry):
        acc_r, acc_g, acc_b, acc_a = carry
        dist = d0 + step * k.astype(jnp.float32)
        pos = [eye[i] + d[i] * dist for i in range(3)]
        inside = (
            (pos[0] >= bmin[0]) & (pos[0] <= bmax[0])
            & (pos[1] >= bmin[1]) & (pos[1] <= bmax[1])
            & (pos[2] >= bmin[2]) & (pos[2] <= bmax[2])
        )
        active = hit & (dist < tmax) & inside & (acc_a < 1.0)

        fi = jnp.floor((pos[0] - bmin[0]) / cell[0]).astype(jnp.int32)
        fj = jnp.floor((pos[1] - bmin[1]) / cell[1]).astype(jnp.int32)
        fk = jnp.floor((pos[2] - bmin[2]) / cell[2]).astype(jnp.int32)
        fi = jnp.clip(fi, 0, jnp.maximum(nx - 1, 0))
        fj = jnp.clip(fj, 0, jnp.maximum(ny - 1, 0))
        fk = jnp.clip(fk, 0, jnp.maximum(nz - 1, 0))
        flat_idx = (fi * pad_ny + fj) * pad_nz + fk
        raw = jnp.take(flat, flat_idx.reshape(-1)).reshape(SUBLANES, LANES)

        # scalar transform is pre-baked into the LUT domain by the host for
        # the normalize path; the optional soft tail clip is applied here
        scalar = jnp.where(jnp.isfinite(raw), raw, 0.0)
        if apply_clip:
            clamped_end = 1.0
            clamped = jnp.clip(scalar, 0.0, clamped_end)
            normalized_c = (clamped - clip_start) / (clamped_end - clip_start)
            smooth = normalized_c + normalized_c * normalized_c - normalized_c**3
            soft = clip_start + (clamped_end - clip_start) * smooth
            in_roll = (clamped > clip_start) & (clamped < clamped_end)
            scalar = jnp.where(in_roll, soft, clamped)
        normalized = jnp.clip((scalar - range_min) * inverse_range, 0.0, 1.0)
        lut_idx = jnp.clip(
            (normalized * (COLOR_TABLE_SIZE - 1)).astype(jnp.int32),
            0,
            COLOR_TABLE_SIZE - 1,
        ).reshape(-1)
        s_r = jnp.take(lut[:, 0], lut_idx).reshape(SUBLANES, LANES)
        s_g = jnp.take(lut[:, 1], lut_idx).reshape(SUBLANES, LANES)
        s_b = jnp.take(lut[:, 2], lut_idx).reshape(SUBLANES, LANES)
        s_a = jnp.take(lut[:, 3], lut_idx).reshape(SUBLANES, LANES)

        alpha = jnp.where(active, s_a * (1.0 - acc_a), 0.0)
        return (
            acc_r + s_r * alpha,
            acc_g + s_g * alpha,
            acc_b + s_b * alpha,
            acc_a + alpha,
        )

    zero = jnp.zeros((SUBLANES, LANES), jnp.float32)
    acc_r, acc_g, acc_b, acc_a = jax.lax.fori_loop(
        0, num_steps, body, (zero, zero, zero, zero)
    )
    acc_r = jnp.clip(acc_r, 0.0, 1.0)
    acc_g = jnp.clip(acc_g, 0.0, 1.0)
    acc_b = jnp.clip(acc_b, 0.0, 1.0)
    acc_a = jnp.clip(acc_a, 0.0, 1.0)

    entry_depth = tmin * (
        d[0] * fwd[0] + d[1] * fwd[1] + d[2] * fwd[2]
    )
    depth = jnp.where(
        hit & (acc_a > 0.0) & jnp.isfinite(entry_depth), entry_depth, inf
    )

    miss = jnp.logical_not(hit)
    acc_r = jnp.where(miss, 0.0, acc_r)
    acc_g = jnp.where(miss, 0.0, acc_g)
    acc_b = jnp.where(miss, 0.0, acc_b)
    acc_a = jnp.where(miss, 0.0, acc_a)

    out = jnp.stack([acc_r, acc_g, acc_b, acc_a], axis=-1)  # [S, L, 4]
    color_ref[0] = out.reshape(TILE_P, 4)
    depth_ref[0] = depth  # [SUBLANES, LANES]


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "num_steps", "apply_clip", "interpret"),
)
def pallas_render_bucket(
    data: jnp.ndarray,  # [B, nx, ny, nz] float32 (values already transformed
    #                      to the normalized LUT domain by the host pre-pass)
    meta: jnp.ndarray,  # [B, 8] float32: min(3) max(3) step mesh_eps
    dims: jnp.ndarray,  # [B, 4] int32
    lut: jnp.ndarray,  # [B, 256, 4]
    cam: jnp.ndarray,  # [17] float32 camera/scalar packing (see _kernel)
    *,
    width: int,
    height: int,
    num_steps: int,
    apply_clip: bool,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render a brick bucket with the Pallas kernel.

    The caller is responsible for applying the scalar transform to the brick
    data beforehand (a one-time vectorized pass over the volume — cheaper
    than re-transforming every sample in the march loop) and for padding
    ``width * height`` to a multiple of TILE_P.
    """
    num_bricks = data.shape[0]
    num_pixels = width * height
    assert num_pixels % TILE_P == 0, (num_pixels, TILE_P)
    num_tiles = num_pixels // TILE_P

    kernel = functools.partial(
        _kernel,
        width=width,
        height=height,
        num_steps=num_steps,
        apply_clip=apply_clip,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_bricks, num_tiles),
        in_specs=[
            pl.BlockSpec(
                (1,) + data.shape[1:], lambda b, t, *_: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, COLOR_TABLE_SIZE, 4), lambda b, t, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_P, 4), lambda b, t, *_: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, LANES), lambda b, t, *_: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    colors, depths = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_bricks, num_pixels, 4), jnp.float32),
            jax.ShapeDtypeStruct(
                (num_bricks, num_pixels // LANES, LANES), jnp.float32
            ),
        ],
        interpret=interpret,
    )(cam, meta, dims, data, lut)
    return colors, depths.reshape(num_bricks, num_pixels)


def pack_camera(
    eye, forward, right, up, tan_half_fov, aspect, range_min, inverse_range,
    clip_start,
) -> np.ndarray:
    cam = np.zeros(17, dtype=np.float32)
    cam[0:3] = eye
    cam[3:6] = forward
    cam[6:9] = right
    cam[9:12] = up
    cam[12] = tan_half_fov
    cam[13] = aspect
    cam[14] = range_min
    cam[15] = inverse_range
    cam[16] = clip_start
    return cam
