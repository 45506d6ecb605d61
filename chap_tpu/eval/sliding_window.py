"""Batched, on-device sliding-window 3D inference.

Rebuild of the reference's throughput-critical path (val_3D.test_single_case
:14-79 / test_3D_util.py:91-129 / missing utils.test_3d_patch): same geometry
— pad-to-patch, ceil-div grid with min-clamped last stride, overlapping
softmax accumulation, count normalization, argmax, unpad — but engineered for
TPU instead of one synchronous batch-1 device roundtrip per patch:

  * the volume is uploaded ONCE; the whole patch grid runs in ONE dispatch
    (lax.scan over patch batches) with score/count maps as carry;
  * patch gather AND overlapping scatter-add ride the MXU as one-hot
    selection matmuls — arbitrary strides (18/4) never hit the TPU's
    (8,128)-tile alignment fast path as dynamic slices, but a selection
    matmul is layout-agnostic;
  * the score accumulator is class-FIRST [C,W,H,D] (a class-last layout puts
    tiny C in the 128-wide lane dim: 64x padded memory);
  * optional bfloat16 compute, f32 accumulation; int8 label-map download;
  * async dispatch-ahead across cases overlaps device compute with the
    (slow) device->host link and host-side metrics.

Optional largest-connected-component post-processing matches the test_LA
--nms flag (test_LA.py:15,50-58).
"""
from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from chap_tpu.metrics.surface import cal_metric_3d, cal_metric_3d_full
from chap_tpu.semi.nms import _largest_cc_host


def compute_grid(shape: Tuple[int, int, int], patch: Tuple[int, int, int],
                 stride_xy: int, stride_z: int) -> np.ndarray:
    """Patch start positions, ceil-div strides with min-clamped last step
    (val_3D.py:42-54 geometry)."""
    ww, hh, dd = shape
    sx = math.ceil(max(ww - patch[0], 0) / stride_xy) + 1
    sy = math.ceil(max(hh - patch[1], 0) / stride_xy) + 1
    sz = math.ceil(max(dd - patch[2], 0) / stride_z) + 1
    starts = []
    for x in range(sx):
        xs = min(stride_xy * x, ww - patch[0])
        for y in range(sy):
            ys = min(stride_xy * y, hh - patch[1])
            for z in range(sz):
                zs = min(stride_z * z, dd - patch[2])
                starts.append((xs, ys, zs))
    return np.array(starts, np.int32)


class SlidingWindowEngine:
    """Holds the jit-compiled whole-volume program for one (model, patch,
    batch) configuration; reuse across cases to amortize compilation.

    The ENTIRE grid runs in one dispatch: a lax.scan over patch batches with
    the score/count maps as carry — gather (vmap dynamic_slice), batched
    forward, scatter-add (dynamic_update_slice read-modify-write), then
    on-device argmax. One host->device volume upload, one label-map download.
    Compute optionally in bfloat16 (MXU native); accumulation stays float32.
    """

    def __init__(self, model, patch_size: Tuple[int, int, int],
                 sw_batch: int = 8, compute_dtype=jnp.float32,
                 pack_binary: bool = True, quantize_upload: bool = False,
                 mesh=None):
        self.model = model
        self.patch = tuple(patch_size)
        self.sw_batch = sw_batch
        self.compute_dtype = compute_dtype
        self.pack_binary = pack_binary
        # multi-chip: ONE volume uses ALL devices — the patch grid's batch
        # axis is sharded over the mesh with shard_map, each device
        # accumulates its patches' softmax into a local score/count map, and
        # a single psum per volume merges them (SURVEY §2.3: eval rides the
        # same mesh as training; the collective is one [C,W,H,D]+[W,H,D]
        # reduction over ICI, not per-patch traffic)
        self.mesh = mesh if (mesh is not None
                             and int(np.prod(list(mesh.shape.values()))) > 1
                             ) else None
        if self.mesh is not None:
            n_dev = int(np.prod(list(self.mesh.shape.values())))
            assert sw_batch % n_dev == 0, \
                f"sw_batch {sw_batch} must divide over {n_dev} mesh devices"
        # uint8 fixed-point host->device volume transfer with on-device
        # dequant: HALF the bf16 payload on the upload-bound tunnel link.
        # Medical volumes are min-max normalized from <=12-bit acquisitions;
        # 1/255 absolute granularity sits at the same precision as the bf16
        # 8-bit significand already accepted for compute (argmax parity is
        # asserted by tests/test_sliding_window.py).
        self.quantize_upload = quantize_upload
        patch = self.patch

        def accumulate(variables, vol_c, starts, valid, num_classes: int):
            """Scan the (possibly per-device) patch grid, returning the
            accumulated class-first score map and overlap count map."""
            shape = vol_c.shape
            ww, hh, dd = shape
            # class-FIRST accumulator layout [C,W,H,D]: keeps the big spatial
            # dims in the TPU's (sublane, lane) tiles. A class-last layout
            # would put C (e.g. 2) in the 128-wide lane dim -> 64x padded
            # memory and pathological scatter bandwidth.
            score0 = jnp.zeros((num_classes,) + shape, jnp.float32)
            cnt0 = jnp.zeros(shape, jnp.float32)

            def selection_matrices(s, dtype):
                """One-hot selection matrices mapping patch coords -> volume
                coords. Scatter/gather as matmuls ride the MXU instead of the
                slow unaligned dynamic-slice path (offsets like 18/4 never hit
                TPU's (8,128)-tile alignment fast path). Each output element
                has exactly one nonzero contribution, so at HIGHEST precision
                the result is bit-exact."""
                sx = (jnp.arange(ww)[None, :] ==
                      (s[0] + jnp.arange(patch[0]))[:, None]).astype(dtype)
                sy = (jnp.arange(hh)[None, :] ==
                      (s[1] + jnp.arange(patch[1]))[:, None]).astype(dtype)
                sz = (jnp.arange(dd)[None, :] ==
                      (s[2] + jnp.arange(patch[2]))[:, None]).astype(dtype)
                return sx, sy, sz

            def scan_body(carry, batch_in):
                sc, ct = carry
                b_starts, b_valid = batch_in
                # gather in compute dtype (one-hot selectors are exact in
                # bf16; each output has a single nonzero contribution, so
                # only the data mantissa is rounded (<=0.4%) — immaterial
                # ahead of the network forward and for the argmax vote);
                # scatter-side selectors stay f32 for exact accumulation.
                gx, gy, gz = jax.vmap(
                    lambda s: selection_matrices(s, compute_dtype))(b_starts)
                sx, sy, sz = jax.vmap(
                    lambda s: selection_matrices(s, jnp.float32))(b_starts)
                # explicit pairwise contraction order (one spatial dim at a
                # time) — a single 4-operand einsum lets XLA pick a blow-up
                # order like (Sx x Sy) first.
                g = jnp.einsum("XYZ,bxX->bxYZ", vol_c, gx)
                g = jnp.einsum("bxYZ,byY->bxyZ", g, gy)
                patches = jnp.einsum("bxyZ,bzZ->bxyz", g, gz)
                out = model.apply(variables, patches[..., None], train=False)
                if isinstance(out, (tuple, list)):
                    # dual-decoder logit ensemble (test_2D_fully.py:72)
                    out = (out[0] + out[1]) / 2.0
                # class axis to a MAJOR dim BEFORE the softmax: softmax over a
                # tiny class-minor axis runs on 128-lane-padded layouts
                out = jnp.moveaxis(out, -1, 1)                # [B,C,pw,ph,pd]
                probs = jax.nn.softmax(out.astype(jnp.float32), axis=1)
                probs = probs * b_valid[:, None, None, None, None]

                s_ = jnp.einsum("bcxyz,bzZ->bcxyZ", probs, sz)
                s_ = jnp.einsum("bcxyZ,byY->bcxYZ", s_, sy)
                sc = sc + jnp.einsum("bcxYZ,bxX->cXYZ", s_, sx)
                mx = jnp.sum(sx, axis=1) * b_valid[:, None]   # [B,W]
                my = jnp.sum(sy, axis=1)
                mz = jnp.sum(sz, axis=1)
                ct = ct + jnp.einsum("bX,bY,bZ->XYZ", mx, my, mz)
                return (sc, ct), None

            (score, cnt), _ = jax.lax.scan(scan_body, (score0, cnt0),
                                           (starts, valid))
            return score, cnt

        def run(variables, volume, scale, offset, starts, valid,
                num_classes: int):
            shape = volume.shape
            ww, hh, dd = shape
            # dequantize on device (no-op identity affine when the upload is
            # not quantized: scale=1, offset=0 — same jitted program)
            volume = volume.astype(jnp.float32) * scale + offset
            vol_c = volume.astype(compute_dtype)
            if self.mesh is not None:
                # shard the patch-batch axis over every mesh axis; merge the
                # per-device partial score/count maps with ONE psum per volume
                from jax.experimental.shard_map import shard_map
                from jax.sharding import PartitionSpec as P
                axes = (self.mesh.axis_names[0]
                        if len(self.mesh.axis_names) == 1
                        else tuple(self.mesh.axis_names))

                def local(variables, vol_c, starts, valid):
                    sc, ct = accumulate(variables, vol_c, starts, valid,
                                        num_classes)
                    return (jax.lax.psum(sc, axes), jax.lax.psum(ct, axes))

                score, cnt = shard_map(
                    local, mesh=self.mesh,
                    in_specs=(P(), P(), P(None, axes), P(None, axes)),
                    out_specs=(P(), P()), check_rep=False,
                )(variables, vol_c, starts, valid)
            else:
                score, cnt = accumulate(variables, vol_c, starts, valid,
                                        num_classes)
            label = jnp.argmax(score / jnp.maximum(cnt, 1e-8)[None],
                               axis=0)
            # int8 result: the device->host path is the scarce resource
            # (tunnel-attached TPUs move ~30 MB/s down), 4x smaller download.
            if num_classes == 2 and dd % 8 == 0 and self.pack_binary:
                # 2-class maps: pack 8 voxels/byte (np.unpackbits bit order,
                # MSB first) — another 8x off the download. A first attempt
                # predated the bf16-upload work and was reverted as a wash;
                # in the now IO-bound regime the pack's device cost hides
                # under the link time it saves.
                bits = label.reshape(ww, hh, dd // 8, 8).astype(jnp.float32)
                weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1],
                                      jnp.float32)
                return jnp.einsum("whdk,k->whd", bits, weights).astype(jnp.uint8)
            return label.astype(jnp.int8)

        self._run = jax.jit(run, static_argnums=(6,))

    def predict_async(self, variables, image: np.ndarray, stride_xy: int,
                      stride_z: int, num_classes: int):
        """Dispatch one volume's inference; returns an opaque handle. JAX
        dispatch is async, so successive volumes pipeline: the device starts
        the next case while the previous label map streams back over the
        (slow) host link. Call :meth:`finalize` on the handle."""
        w, h, d = image.shape
        pads = [max(self.patch[i] - image.shape[i], 0) for i in range(3)]
        pad_lo = [p // 2 for p in pads]
        pad_hi = [p - p // 2 for p in pads]
        if any(pads):
            image = np.pad(image, list(zip(pad_lo, pad_hi)), mode="constant")
        shape = image.shape

        starts = compute_grid(shape, self.patch, stride_xy, stride_z)
        n = starts.shape[0]
        n_pad = ((n + self.sw_batch - 1) // self.sw_batch) * self.sw_batch
        valid = np.ones((n_pad,), np.float32)
        if n_pad != n:
            starts = np.concatenate([starts, np.zeros((n_pad - n, 3), np.int32)])
            valid[n:] = 0.0
        starts = starts.reshape(-1, self.sw_batch, 3)
        valid = valid.reshape(-1, self.sw_batch)

        # upload in compute dtype: host->device bandwidth is the scarce
        # resource on tunnel-attached chips; a bf16 volume is half the f32
        # payload, and the first device op casts to compute dtype anyway.
        # (np.dtype(jnp.bfloat16) resolves to the ml_dtypes numpy scalar, so
        # the cast happens host-side and the small payload is what's shipped.)
        # With quantize_upload the payload halves AGAIN: uint8 fixed point
        # over the volume's min-max range, dequantized on device.
        if self.quantize_upload:
            vmin = float(image.min())
            vmax = float(image.max())
            scale = (vmax - vmin) / 255.0 or 1.0
            host_vol = np.rint((image - vmin) / scale).astype(np.uint8)
            offset = vmin
        else:
            host_vol = image.astype(np.dtype(self.compute_dtype))
            scale, offset = 1.0, 0.0
        device_map = self._run(variables, jnp.asarray(host_vol),
                               jnp.float32(scale), jnp.float32(offset),
                               jnp.asarray(starts), jnp.asarray(valid),
                               num_classes)
        packed = (num_classes == 2 and shape[2] % 8 == 0 and self.pack_binary)
        return device_map, (w, h, d), pad_lo, any(pads), packed

    def finalize(self, handle, num_classes: int, nms: bool = False) -> np.ndarray:
        device_map, (w, h, d), pad_lo, padded, packed = handle
        label_map = np.asarray(device_map)
        if packed:
            label_map = np.unpackbits(label_map, axis=-1)
        label_map = label_map.astype(np.int32)
        if padded:
            label_map = label_map[pad_lo[0]:pad_lo[0] + w,
                                  pad_lo[1]:pad_lo[1] + h,
                                  pad_lo[2]:pad_lo[2] + d]
        if nms:
            label_map = _largest_cc_host(label_map[None], num_classes)[0]
        return label_map

    def predict(self, variables, image: np.ndarray, stride_xy: int,
                stride_z: int, num_classes: int, nms: bool = False) -> np.ndarray:
        """Sliding-window inference of one volume [W,H,D] -> label map."""
        handle = self.predict_async(variables, image, stride_xy, stride_z,
                                    num_classes)
        return self.finalize(handle, num_classes, nms)


def test_single_case(model, variables, image: np.ndarray, stride_xy: int,
                     stride_z: int, patch_size: Tuple[int, int, int],
                     num_classes: int, sw_batch: int = 8,
                     nms: bool = False) -> np.ndarray:
    """One-shot convenience wrapper (val_3D.test_single_case equivalent)."""
    engine = SlidingWindowEngine(model, patch_size, sw_batch)
    return engine.predict(variables, image, stride_xy, stride_z, num_classes, nms)


def test_all_case(model, variables, dataset, num_classes: int,
                  patch_size: Tuple[int, int, int], stride_xy: int,
                  stride_z: int, sw_batch: int = 8, nms: bool = False,
                  full_metrics: bool = False,
                  per_case: Optional[List] = None, mesh=None) -> np.ndarray:
    """Mean per-class metrics over an h5 case dataset (val_3D.py:91-107;
    full_metrics adds ravd/asd like test_3D_util.py:147-152). With a >1-device
    mesh, each volume's patch grid is sharded over all chips (see
    SlidingWindowEngine)."""
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
        sw_batch = ((sw_batch + n_dev - 1) // n_dev) * n_dev
    engine = SlidingWindowEngine(model, patch_size, sw_batch, mesh=mesh)
    metric_fn = cal_metric_3d_full if full_metrics else cal_metric_3d
    width = 4 if full_metrics else 2
    total = np.zeros((num_classes - 1, width))

    # two-deep pipeline: dispatch case i+1 before collecting case i, so device
    # compute overlaps the label-map download and host metric computation
    pending = []
    def collect(entry):
        nonlocal total
        i, sample, handle = entry
        prediction = engine.finalize(handle, num_classes, nms)
        label = np.asarray(sample["label"])
        case_metrics = np.stack([metric_fn(label == c, prediction == c)
                                 for c in range(1, num_classes)])
        total += case_metrics
        if per_case is not None:
            per_case.append((sample.get("case", str(i)), case_metrics))

    for i in range(len(dataset)):
        sample = dataset[i]
        handle = engine.predict_async(variables, np.asarray(sample["image"]),
                                      stride_xy, stride_z, num_classes)
        pending.append((i, sample, handle))
        if len(pending) >= 2:
            collect(pending.pop(0))
    while pending:
        collect(pending.pop(0))
    return total / len(dataset)
