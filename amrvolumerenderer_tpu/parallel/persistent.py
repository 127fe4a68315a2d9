"""Persistent multi-chip scene renderer: bricks resident on a device mesh.

The one-shot multi-chip path (renderer_fast.render_composited_sharded)
matches the reference's per-render flow — it re-packs and re-uploads the
brick table every call, which is exactly what renderSingleTrial pays
(VolumeRenderer.cpp:1103-1339 re-paints from rank-resident data each
trial, but OUR depth-contiguous placement is camera-dependent, so the
one-shot path also re-ships data).  Animation and in-situ serving want
the reference's *data model* instead: brick data resident per rank for
the whole run (the AMReX DistributionMapping that main.cpp:19-36 sets up
once), with only per-frame camera state moving.

``MultiChipSceneRenderer`` brings the persistent-scene design of
``FastSceneRenderer`` to a mesh:

  * the canonical piece table is placed ONCE, sharded over the mesh in
    static (owner, local index) order — the layered pipeline's placement
    contract, and the reference's static rank assignment;
  * per frame, only the 20-float camera pack, per-slot depth hints, and
    the validity mask ship to the device; the march-axis repack runs on
    device per shard (cached per axis, like the single-chip renderer);
  * render + exchange + ordered fold run as ONE compiled shard_map
    program (slicemarch per-device render -> all_to_all pixel exchange ->
    run-grouped fold, directsend._compose_shard), compiled ONCE and reused
    across every frame and march axis — the one-shot path's jit
    closure captures the camera as a constant and recompiles per frame;
  * ``set_transfer_function`` / ``update_data`` keep working: the LUT
    broadcast and the piece table are re-placed, everything else stays.

Depth-hint ties break in (owner, local) order — the REFERENCE'S exact
tie-break (DirectSendBase.cpp:378-388 uses communicator rank); the
one-shot path's visibility-graph tie-break refinement
(renderer_fast.visibility_owner_keys) requires camera-dependent
placement and is deliberately not applied here.

Beyond reference: the reference has no persistent-scene API at all.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..camera import camera_basis
from ..fast_scene import FastSceneRenderer, _device_downsample, _repack_for_axis


# one downsample dispatch per CHUNK of antialiased batch frames (the
# width/height/block operands are static so jit re-specializes per config)
_batch_downsample = jax.jit(
    jax.vmap(_device_downsample, in_axes=(0, None, None, None)),
    static_argnums=(1, 2, 3),
)
from ..ops import slicemarch as sm
from ..renderer_fast import _fetch_global, _grouped_cumcount
from ..visibility import order_keys_or_hints
from ..types import CameraParameters, ColorMap, RenderParameters, SceneGeometry
from .directsend import (
    _compose_shard,
    _compose_shard_preblend,
    _encode_ubyte,
    _exchange_and_fold_runs,
    _preblend_runs_scan,
    make_mesh,
    mesh_axes,
    pack_contiguous,
    preblend_plan,
    shard_leading,
)


def _morton_order(box_min: np.ndarray, box_max: np.ndarray) -> np.ndarray:
    """Piece permutation along a Morton (Z-order) curve of piece centers.

    Centers quantize to a 10-bit grid per axis over the scene bounds;
    ties (coincident centers across refinement levels) break by original
    index, keeping the order deterministic."""
    centers = 0.5 * (np.asarray(box_min, float) + np.asarray(box_max, float))
    lo = centers.min(axis=0)
    span = centers.max(axis=0) - lo
    span[span == 0.0] = 1.0
    q = np.clip(
        ((centers - lo) / span * 1023.0).astype(np.int64), 0, 1023
    )
    code = np.zeros(len(centers), np.int64)
    for bit in range(10):
        for a in range(3):
            code |= ((q[:, a] >> bit) & 1) << (3 * bit + (2 - a))
    return np.lexsort((np.arange(len(centers)), code))


class MultiChipSceneRenderer(FastSceneRenderer):
    """Device-mesh twin of ``FastSceneRenderer``: prepare once, render any
    camera across ``num_devices`` chips with per-frame uploads limited to
    camera + hints.  See the module docstring for the design contract."""

    def __init__(
        self,
        geometry: SceneGeometry,
        parameters: RenderParameters,
        num_devices: Optional[int] = None,
        color_map: Optional[ColorMap] = None,
        interpret: Optional[bool] = None,
        precision: str = "float32",
        transport: str = "float32",
    ):
        super().__init__(
            geometry, parameters, color_map=color_map, interpret=interpret,
            precision=precision,
        )
        if transport not in ("float32", "ubyte"):
            raise ValueError(f"unknown transport {transport!r}")
        self.transport = transport
        avail = len(jax.devices())
        num_devices = avail if num_devices is None else int(num_devices)
        if num_devices < 1 or num_devices > avail:
            raise ValueError(
                f"devices={num_devices} but {avail} device(s) available"
            )
        pad_pixels = self.pad_w * self.pad_h
        if pad_pixels % num_devices:
            raise ValueError(
                f"padded frame ({self.pad_w}x{self.pad_h}) is not divisible "
                f"by the device count {num_devices}"
            )
        self.num_devices = num_devices
        # multi-host mesh shaping policy lives in make_mesh ("auto" = one
        # dcn row per host)
        self.mesh = make_mesh(num_devices, dcn_size="auto")

        # static placement: global (owner, local index) order split into
        # contiguous per-device runs (pack_contiguous), fixed for the
        # renderer's lifetime.  slot_to_idx maps [D * Bmax] device slots
        # to canonical piece indices (padding slots repeat an arbitrary
        # piece and are masked by ``slot_valid``).
        #
        # When every piece has the same owner (the common in-situ case:
        # the renderer owns the distribution), pieces are ordered along a
        # Morton space-filling curve first, so each device holds a
        # spatially COMPACT region — the reference's AMReX default
        # DistributionMapping is likewise SFC-based.  Compactness is what
        # makes the run pre-blend pay: a compact region is depth-
        # contiguous from most viewpoints, so a device's layers form few
        # runs in the global order (scattered placement can make runs ~=
        # layers, at which point the pre-blend ships MORE than the raw
        # exchange and the per-frame plan falls back, _select_transport).
        if len(np.unique(self.owners)) <= 1:
            order = _morton_order(self.box_min, self.box_max)
        else:
            local = _grouped_cumcount(self.owners)
            order = np.lexsort((local, self.owners))
        (slot_to_idx,), slot_valid, _ = pack_contiguous(
            num_devices, np.zeros(len(order), np.float32),
            order.astype(np.int32),
        )
        self._slot_to_idx = slot_to_idx
        self._slot_valid = slot_valid
        self._placed_cache: dict = {}  # axis -> sharded [T, S, 8, 128]
        self._placed_lut = None  # sharded [T, 4, LUT_ROWS, LANES]
        self._meta_cache: dict = {}  # (axis, lut epoch) -> device tables
        self._lut_epoch = 0
        # ONE compiled shard_map program per (sampling, classification) —
        # keyed so post-construction parameter mutation takes effect like
        # it does on the single-chip FastSceneRenderer (which re-reads the
        # knobs every frame) instead of silently reusing the first compile
        self._step_progs = {}
        # deep-AMR shards: above this many pieces per device, render each
        # piece inside the pre-blend fold (O(runs x pixels) peak memory)
        # instead of materializing the full O(pieces x pixels) layer
        # stack first (VERDICT r3 Weak #7)
        self.scan_piece_threshold = 16
        # pre-blend cost model (VERDICT r4 #7): ratio of local memory
        # bandwidth to per-link ICI bandwidth.  v5e: ~820 GB/s HBM vs
        # ~45 GB/s/link ICI -> ~18.  Set to ~1 for a mesh whose "links"
        # are the local memory system (the virtual CPU mesh), where
        # pre-blending never pays (measured: 2.8 -> 4.0 s even at 87%
        # byte savings, ROADMAP r5).
        self.preblend_link_ratio = 18.0
        self._place_canonical()

    # ---- placement ------------------------------------------------------

    def _place_canonical(self) -> None:
        """(Re)place the slot-ordered canonical table on the mesh."""
        placed = jnp.take(
            self.canonical, jnp.asarray(self._slot_to_idx), axis=0
        )
        (self._placed_canonical,) = shard_leading(self.mesh, placed)
        self._placed_cache = {}
        self._placed_lut = None

    def _placed_vol(self, axis: int) -> jnp.ndarray:
        vol = self._placed_cache.get(axis)
        if vol is None:
            vol = _repack_for_axis(
                self._placed_canonical, axis=axis, cube=self.cube
            )
            (vol,) = shard_leading(self.mesh, vol)
            self._placed_cache[axis] = vol
        return vol

    def _placed_luts(self) -> jnp.ndarray:
        if self._placed_lut is None:
            luts = jnp.broadcast_to(
                self._lut_device[None],
                (len(self._slot_to_idx),) + self._lut_device.shape,
            )
            (self._placed_lut,) = shard_leading(self.mesh, luts)
        return self._placed_lut

    # ---- invalidation hooks --------------------------------------------

    def set_transfer_function(self, *args, **kwargs) -> None:
        super().set_transfer_function(*args, **kwargs)
        if hasattr(self, "_placed_lut"):
            self._placed_lut = None
            self._lut_epoch += 1  # dims[:, 7] slice bounds depend on the LUT

    def update_data(self, brick_arrays) -> None:
        super().update_data(brick_arrays)
        self._place_canonical()
        self._lut_epoch += 1  # slice extrema changed with the values
        self._meta_cache = {}

    # ---- the compiled per-frame program ---------------------------------

    def _sharded_step(self, rmax: int):
        """ONE compiled program, reused for every frame and march axis:
        per-device slicemarch render of the resident shard, local run
        pre-blend, pixel all_to_all exchange of O(runs) pre-blended
        layers, global-order fold (directsend._compose_shard_preblend —
        the reference's composeLayered pre-blend before the exchange,
        DirectSendBase.cpp:418-425).  Camera/plan/valid/tables are
        ARGUMENTS (the one-shot path's jit captures the camera as a
        constant, recompiling per frame); jit re-specializes per bucketed
        ``rmax`` run depth."""
        scan_pieces = self._scan_pieces()
        prog_key = (
            self.parameters.sampling, self.parameters.classification, rmax,
            scan_pieces,
        )
        cached = self._step_progs.get(prog_key)
        if cached is not None:
            return cached
        axes = mesh_axes(self.mesh)
        transport = self.transport
        kw = dict(
            width=self.pad_w, height=self.pad_h, max_slices=self.cube,
            logical_width=self.render_width,
            logical_height=self.render_height,
            interpret=self.interpret, sampling=self.parameters.sampling,
            ghost=self.ghost, classification=self.parameters.classification,
        )

        def step(b_vol, b_meta, b_dims, b_lut, b_valid, b_lorder, b_rslot,
                 perm, cam):
            if scan_pieces:
                runs = _preblend_runs_scan(
                    self._piece_renderer(
                        b_vol, b_meta, b_dims, b_lut, b_valid, cam, kw
                    ),
                    b_vol.shape[0], b_lorder[0], b_rslot[0], rmax,
                    self.pad_w * self.pad_h,
                )
                return _exchange_and_fold_runs(runs, perm, transport, axes)
            colors, depths = sm.slicemarch_render(
                b_vol, b_meta, b_dims, b_lut, cam, **kw
            )
            layers = jnp.concatenate([colors, depths[..., None]], axis=-1)
            mask = b_valid[:, None, None]
            cleared = jnp.zeros_like(layers).at[..., 4].set(jnp.inf)
            layers = jnp.where(mask, layers, cleared)
            return _compose_shard_preblend(
                layers, b_lorder[0], b_rslot[0], perm, rmax, transport, axes
            )

        prog = jax.jit(
            jax.shard_map(
                step,
                mesh=self.mesh,
                in_specs=(P(axes),) * 5 + (P(axes), P(axes), P(), P()),
                out_specs=P(axes),
                check_vma=False,  # pallas_call out_shape carries no vma info
            )
        )
        self._step_progs[prog_key] = prog
        return prog

    def _sharded_step_plain(self):
        """The non-pre-blended step: exchange every layer, fold by
        gathered hints (directsend._compose_shard).  Used when a frame's
        run decomposition would ship at least as many pre-blended layers
        as raw layers (_use_preblend), so pre-blending would only add
        fold work and traffic."""
        prog_key = (
            self.parameters.sampling, self.parameters.classification,
            "plain",
        )
        cached = self._step_progs.get(prog_key)
        if cached is not None:
            return cached
        axes = mesh_axes(self.mesh)
        transport = self.transport
        kw = dict(
            width=self.pad_w, height=self.pad_h, max_slices=self.cube,
            logical_width=self.render_width,
            logical_height=self.render_height,
            interpret=self.interpret, sampling=self.parameters.sampling,
            ghost=self.ghost, classification=self.parameters.classification,
        )

        def step(b_vol, b_meta, b_dims, b_lut, b_valid, b_hints, cam):
            colors, depths = sm.slicemarch_render(
                b_vol, b_meta, b_dims, b_lut, cam, **kw
            )
            layers = jnp.concatenate([colors, depths[..., None]], axis=-1)
            mask = b_valid[:, None, None]
            cleared = jnp.zeros_like(layers).at[..., 4].set(jnp.inf)
            layers = jnp.where(mask, layers, cleared)
            hints = jnp.where(b_valid, b_hints, jnp.inf)
            return _compose_shard(layers, hints, transport, axes)

        prog = jax.jit(
            jax.shard_map(
                step,
                mesh=self.mesh,
                in_specs=(P(axes),) * 6 + (P(),),
                out_specs=P(axes),
                check_vma=False,  # pallas_call out_shape carries no vma info
            )
        )
        self._step_progs[prog_key] = prog
        return prog

    # ---- rendering ------------------------------------------------------

    def _use_preblend(self, rmax: int) -> bool:
        """Per-frame transport choice by COST MODEL (VERDICT r4 #7), not
        the bare run-count proxy: pre-blending saves
        ``(lmax - rmax) * pixels * B`` link bytes per device but spends an
        extra local fold whose traffic is ``~(lmax + rmax) * pixels * B``
        of HBM (read every raw layer, scatter into run slots).  With
        ``R = hbm_rate / link_rate`` (``preblend_link_ratio``) the
        saved link time exceeds the fold time iff

            (lmax - rmax) * R > (lmax + rmax)

        At the v5e default R~18 this activates whenever the byte saving
        exceeds ~10% — nearly the old ``rmax < lmax`` proxy, but it now
        correctly refuses marginal savings (e.g. rmax 34 vs lmax 36)
        that cannot pay for the fold.  At R~1 (a mesh whose links ARE
        the local memory system — the virtual CPU mesh) it never
        activates, matching the measured CPU-mesh wall clocks (pre-blend
        2.8 -> 4.0 s even at 87% byte savings; ROADMAP r5 crossover
        table).  The deep-AMR scan mode always pre-folds (there the win
        is O(runs x pixels) memory, not traffic).

        ``transport="ubyte"`` also always pre-folds: the two paths
        quantize at different points (per pre-blended run vs per raw
        layer), so flipping between them per frame would make a static
        scene's colors shift between orbit frames — byte transport pins
        ONE quantization semantics (the reference's: pre-blend first,
        byte send after, DirectSendBase.cpp:418-446) at the cost of
        shipping bucketed run layers even when runs >= layers.  The
        float32 paths are bitwise-identical, so adaptivity is free
        there."""
        if self._scan_pieces() or self.transport == "ubyte":
            return True
        lmax = len(self._slot_to_idx) // self.num_devices
        return (lmax - rmax) * self.preblend_link_ratio > (lmax + rmax)

    def _scan_pieces(self) -> bool:
        """Deep-AMR mode: fuse render into the pre-blend fold when the
        per-device piece count would make the layer stack the dominant
        HBM cost (threshold in pieces/device, override via
        ``scan_piece_threshold``)."""
        per_device = len(self._slot_to_idx) // self.num_devices
        return per_device > self.scan_piece_threshold

    @staticmethod
    def _piece_renderer(b_vol, b_meta, b_dims, b_lut, b_valid, cam, kw):
        """One-local-piece renderer for ``_preblend_runs_scan``: dynamic-
        slices piece j out of the resident shard and renders it alone
        (cleared when invalid), so no full layer stack ever exists."""
        def render_one(j):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, j, 1, axis=0)
            colors, depths = sm.slicemarch_render(
                sl(b_vol), sl(b_meta), sl(b_dims), sl(b_lut), cam, **kw
            )
            layer = jnp.concatenate(
                [colors[0], depths[0][..., None]], axis=-1
            )
            cleared = jnp.zeros_like(layer).at[..., 4].set(jnp.inf)
            return jnp.where(b_valid[j], layer, cleared)

        return render_one

    def _placed_tables(self, axis: int):
        """Sharded (meta, dims) brick tables for one march axis.

        Slot-ordered brick tables are axis- and LUT-dependent only: cache
        them on device (sharded like _placed_vol/_placed_lut — an
        unsharded device-0 array would be re-transferred/resharded through
        jit on EVERY frame) so a fixed-axis animation ships nothing but
        camera + hints + validity per frame."""
        key = (axis, self._lut_epoch)
        placed_tables = self._meta_cache.get(key)
        if placed_tables is None:
            idx = self._slot_to_idx
            meta, dims = self._axis_metadata(axis)
            placed_tables = shard_leading(self.mesh, meta[idx], dims[idx])
            # drop stale-LUT entries, keep the other axes of this epoch
            self._meta_cache = {
                k: v for k, v in self._meta_cache.items()
                if k[1] == self._lut_epoch
            }
            self._meta_cache[key] = placed_tables
        return placed_tables

    def _frame_state(self, camera: CameraParameters):
        """Per-frame host prep: march axis, 20-float camera pack, per-slot
        depth/order keys, and the slot validity mask."""
        forward, right, up = camera_basis(camera)
        axis = sm.choose_march_axis(forward)
        idx = self._slot_to_idx
        hints = order_keys_or_hints(
            camera, self.render_width / max(self.render_height, 1),
            self.box_min, self.box_max,
            use_graph=self.parameters.use_visibility_graph,
            parents=self.parents,
            parent_min=self._parent_min,
            parent_max=self._parent_max,
            cache=self._order_cache,  # per-octant memo (static boxes)
        )
        slot_hints = np.where(
            self._slot_valid, hints[idx], np.float32(np.inf)
        )
        # transparency culling folds into validity: fully-transparent
        # pieces render as cleared layers (zero exchange contribution)
        slot_valid = self._slot_valid & self.visible[idx]
        cam = self._pack_cam(camera, forward, right, up)
        return axis, cam, slot_hints, slot_valid

    def _effective_hints(self, slot_hints, slot_valid) -> np.ndarray:
        """[D, Lmax] hint table with culled/padding slots at +inf — the
        order the device fold would have applied, for preblend_plan."""
        return np.where(
            slot_valid, slot_hints, np.float32(np.inf)
        ).reshape(self.num_devices, -1)

    def render(
        self,
        camera: CameraParameters,
        output_filename: Optional[str] = None,
        overlay: bool = True,
    ) -> np.ndarray:
        """Render one frame across the mesh; returns the output-resolution
        [W*H, 5] image (full frame on every host — the Gatherv of
        ImageColorOnly.hpp:220-270 as an allgather)."""
        axis, cam, slot_hints, slot_valid = self._frame_state(camera)
        meta_dev, dims_dev = self._placed_tables(axis)
        local_order, run_slot, perm, rmax = preblend_plan(
            self._effective_hints(slot_hints, slot_valid)
        )

        if self._use_preblend(rmax):
            frame = self._sharded_step(rmax)(
                self._placed_vol(axis),
                meta_dev, dims_dev,
                self._placed_luts(),
                jnp.asarray(slot_valid), jnp.asarray(local_order),
                jnp.asarray(run_slot), jnp.asarray(perm),
                jnp.asarray(cam),
            )
        else:
            frame = self._sharded_step_plain()(
                self._placed_vol(axis),
                meta_dev, dims_dev,
                self._placed_luts(),
                jnp.asarray(slot_valid), jnp.asarray(slot_hints),
                jnp.asarray(cam),
            )
        pixels = _fetch_global(frame)
        pixels = pixels.reshape(self.pad_h, self.pad_w, 5)
        pixels = pixels[: self.render_height, : self.render_width].reshape(
            -1, 5
        )
        if self.sqrt_aa > 1:
            pixels = np.asarray(_device_downsample(
                jnp.asarray(pixels), self.render_width, self.render_height,
                self.sqrt_aa,
            ))
        return self._finish_frame(pixels, camera, output_filename, overlay)

    # ---- batched rendering ----------------------------------------------

    def _sharded_batch_step(self, bytes_out, rmax: int):
        """The batched twin of ``_sharded_step``: ONE shard_map program
        whose body ``lax.scan``s the render+pre-blend+exchange+fold over
        the chunk's frame axis — a camera orbit pays one dispatch and one
        readback per chunk instead of per frame.  jit re-specializes per
        distinct (chunk length, rmax); the caller buckets chunk sizes to
        powers of two and run depths to multiples of four so a long orbit
        compiles a handful of variants."""
        scan_pieces = self._scan_pieces()
        prog_key = (
            self.parameters.sampling, self.parameters.classification,
            "batch", bytes_out, rmax, scan_pieces,
        )
        cached = self._step_progs.get(prog_key)
        if cached is not None:
            return cached
        axes = mesh_axes(self.mesh)
        transport = self.transport
        kw = dict(
            width=self.pad_w, height=self.pad_h, max_slices=self.cube,
            logical_width=self.render_width,
            logical_height=self.render_height,
            interpret=self.interpret, sampling=self.parameters.sampling,
            ghost=self.ghost, classification=self.parameters.classification,
        )

        def step(b_vol, b_meta, b_dims, b_lut, b_valid, b_lorder, b_rslot,
                 perms, cams):
            # b_lorder/b_rslot [F, 1, Lmax] (device shard); perms
            # [F, D * rmax] + cams [F, 20] replicated
            def body(carry, xs):
                cam, lorder, rslot, perm = xs
                if scan_pieces:
                    runs = _preblend_runs_scan(
                        self._piece_renderer(
                            b_vol, b_meta, b_dims, b_lut, b_valid, cam, kw
                        ),
                        b_vol.shape[0], lorder[0], rslot[0], rmax,
                        self.pad_w * self.pad_h,
                    )
                    frame = _exchange_and_fold_runs(
                        runs, perm, transport, axes
                    )
                else:
                    colors, depths = sm.slicemarch_render(
                        b_vol, b_meta, b_dims, b_lut, cam, **kw
                    )
                    layers = jnp.concatenate(
                        [colors, depths[..., None]], axis=-1
                    )
                    mask = b_valid[:, None, None]
                    cleared = (
                        jnp.zeros_like(layers).at[..., 4].set(jnp.inf)
                    )
                    layers = jnp.where(mask, layers, cleared)
                    frame = _compose_shard_preblend(
                        layers, lorder[0], rslot[0], perm, rmax, transport,
                        axes,
                    )
                if bytes_out:
                    # Mesa byte codec on device after the fold: the
                    # readback shrinks 5x (4 u8 vs 4+1 f32 per pixel);
                    # "rgb" drops the alpha byte too
                    b = _encode_ubyte(frame[:, :4])
                    frame = b[:, :3] if bytes_out == "rgb" else b
                return carry, frame

            _, frames = jax.lax.scan(
                body, 0, (cams, b_lorder, b_rslot, perms)
            )
            return frames  # [F, P_shard, C]

        prog = jax.jit(
            jax.shard_map(
                step,
                mesh=self.mesh,
                in_specs=(P(axes),) * 5
                + (P(None, axes), P(None, axes), P(), P()),
                out_specs=P(None, axes),
                check_vma=False,  # pallas_call out_shape carries no vma info
            )
        )
        self._step_progs[prog_key] = prog
        return prog

    def _sharded_batch_step_plain(self, bytes_out):
        """Batched twin of ``_sharded_step_plain`` (see _use_preblend)."""
        prog_key = (
            self.parameters.sampling, self.parameters.classification,
            "batch-plain", bytes_out,
        )
        cached = self._step_progs.get(prog_key)
        if cached is not None:
            return cached
        axes = mesh_axes(self.mesh)
        transport = self.transport
        kw = dict(
            width=self.pad_w, height=self.pad_h, max_slices=self.cube,
            logical_width=self.render_width,
            logical_height=self.render_height,
            interpret=self.interpret, sampling=self.parameters.sampling,
            ghost=self.ghost, classification=self.parameters.classification,
        )

        def step(b_vol, b_meta, b_dims, b_lut, b_valid, b_hints, cams):
            # b_hints [F, T_shard]; cams [F, 20] replicated
            def body(carry, xs):
                cam, hints = xs
                colors, depths = sm.slicemarch_render(
                    b_vol, b_meta, b_dims, b_lut, cam, **kw
                )
                layers = jnp.concatenate(
                    [colors, depths[..., None]], axis=-1
                )
                mask = b_valid[:, None, None]
                cleared = jnp.zeros_like(layers).at[..., 4].set(jnp.inf)
                layers = jnp.where(mask, layers, cleared)
                h = jnp.where(b_valid, hints, jnp.inf)
                frame = _compose_shard(layers, h, transport, axes)
                if bytes_out:
                    b = _encode_ubyte(frame[:, :4])
                    frame = b[:, :3] if bytes_out == "rgb" else b
                return carry, frame

            _, frames = jax.lax.scan(body, 0, (cams, b_hints))
            return frames  # [F, P_shard, C]

        prog = jax.jit(
            jax.shard_map(
                step,
                mesh=self.mesh,
                in_specs=(P(axes),) * 5 + (P(None, axes), P()),
                out_specs=P(None, axes),
                check_vma=False,  # pallas_call out_shape carries no vma info
            )
        )
        self._step_progs[prog_key] = prog
        return prog

    def render_batch(
        self,
        cameras,
        overlay: bool = True,
        output_pattern: Optional[str] = None,
        max_chunk_bytes: int = 64 << 20,
        bytes_out=False,
    ) -> np.ndarray:
        """Render a camera sequence across the mesh with ONE dispatch per
        chunk (the mesh twin of ``FastSceneRenderer.render_batch``).

        Consecutive same-march-axis frames are grouped, then scanned on
        device in power-of-two chunks bounded by ``max_chunk_bytes`` of
        readback: per chunk the hosts ship [F, 20] camera packs plus
        [F, slots] order keys and read back [F, pixels, C] — the brick
        tables stay resident.  Frames come back in input order as
        [len(cameras), width*height, 5] float32 (``bytes_out=True``/"rgb"
        applies the Mesa byte codec on device after the fold — 4- or
        3-channel uint8; requires antialiasing=1 on this renderer, since
        the AA downsample runs host-side after the sharded fold).
        Beyond reference — the reference has no batched render entry."""
        cameras = list(cameras)
        if bytes_out and overlay:
            raise ValueError("bytes_out requires overlay=False (the "
                             "wireframe overlay blends float pixels)")
        if bytes_out and self.sqrt_aa > 1:
            raise ValueError(
                "bytes_out with antialiasing > 1 is not supported on the "
                "mesh renderer (the AA downsample runs after the sharded "
                "fold); use float frames"
            )
        num_out = self.parameters.width * self.parameters.height
        chans = (3 if bytes_out == "rgb" else 4) if bytes_out else 5
        pad_pixels = self.pad_w * self.pad_h
        frame_bytes = pad_pixels * (chans if bytes_out else 5 * 4)

        def prep(i, camera):
            axis, cam, slot_hints, slot_valid = self._frame_state(camera)
            return axis, (i, cam, slot_hints, slot_valid)

        def begin_group(axis, group):
            meta_dev, dims_dev = self._placed_tables(axis)
            return (
                self._placed_vol(axis), meta_dev, dims_dev,
                self._placed_luts(),
            )

        def pack(part, ctx):
            cams = np.stack([p[1] for p in part])
            valid = part[0][3]  # camera-independent within a batch
            # per-frame run plans under ONE chunk-wide rmax (the compiled
            # scan shape is shared across the chunk's frames); chunks
            # whose run depth defeats the pre-blend ship raw layers
            # (_use_preblend)
            effs = [self._effective_hints(p[2], p[3]) for p in part]
            plans = [preblend_plan(e) for e in effs]
            rmax = max(pl[3] for pl in plans)
            if not self._use_preblend(rmax):
                hints = np.stack([p[2] for p in part])
                return ("plain", cams, hints, valid)
            plans = [
                pl if pl[3] == rmax else preblend_plan(e, rmax=rmax)
                for pl, e in zip(plans, effs)
            ]
            lorder = np.stack([pl[0] for pl in plans])
            rslot = np.stack([pl[1] for pl in plans])
            perms = np.stack([pl[2] for pl in plans])
            return ("pre", cams, lorder, rslot, perms, valid, rmax)

        def dispatch(packed, ctx):
            vol, meta_dev, dims_dev, luts = ctx
            if packed[0] == "plain":
                _, cams, hints, valid = packed
                prog = self._sharded_batch_step_plain(bytes_out)
                return prog(
                    vol, meta_dev, dims_dev, luts,
                    jnp.asarray(valid), jnp.asarray(hints),
                    jnp.asarray(cams),
                )
            _, cams, lorder, rslot, perms, valid, rmax = packed
            prog = self._sharded_batch_step(bytes_out, rmax)
            return prog(
                vol, meta_dev, dims_dev, luts,
                jnp.asarray(valid), jnp.asarray(lorder),
                jnp.asarray(rslot), jnp.asarray(perms), jnp.asarray(cams),
            )

        def readback(part, frames, results, stats):
            host = _fetch_global(frames)  # [F, P_pad, C]
            stats["readback_mb"] += host.nbytes / 1e6
            host = host.reshape(len(part), self.pad_h, self.pad_w, chans)
            host = host[
                :, : self.render_height, : self.render_width
            ].reshape(len(part), -1, chans)
            if self.sqrt_aa > 1:
                # ONE vmapped downsample dispatch per chunk (a per-frame
                # _device_downsample would pay the dispatch latency per
                # frame, defeating the batching; float frames only —
                # bytes_out + AA is rejected above)
                host = np.asarray(_batch_downsample(
                    jnp.asarray(host), self.render_width,
                    self.render_height, self.sqrt_aa,
                ))
            for (idx, *_), px in zip(part, host):
                results[idx] = np.asarray(px)

        return self._run_chunked_batch(
            cameras, num_out=num_out, chans=chans, bytes_out=bytes_out,
            overlay=overlay, output_pattern=output_pattern,
            prep=prep, begin_group=begin_group,
            chunk_cap=lambda g, c: min(16, max_chunk_bytes // frame_bytes),
            pack=pack, dispatch=dispatch, readback=readback,
        )
