"""Batched, on-device sliding-window 3D inference.

Rebuild of the reference's throughput-critical path (val_3D.test_single_case
:14-79 / test_3D_util.py:91-129 / missing utils.test_3d_patch): same geometry
— pad-to-patch, ceil-div grid with min-clamped last stride, overlapping
softmax accumulation, count normalization, argmax, unpad — but engineered for
TPU instead of one synchronous batch-1 device roundtrip per patch:

  * the volume is uploaded ONCE; score/count maps live on device;
  * patches are gathered on device (vmap'd dynamic_slice) and forwarded in
    fixed-size batches (static shapes -> one compile per volume bucket);
  * softmax patches scatter-add back on device via a fori_loop of
    dynamic_update_slice read-modify-writes;
  * only the final argmax label map is pulled to host.

Optional largest-connected-component post-processing matches the test_LA
--nms flag (test_LA.py:15,50-58).
"""
from __future__ import annotations

import math
from typing import Callable, List, Optional, Tuple

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
                 sw_batch: int = 8, compute_dtype=jnp.float32):
        self.model = model
        self.patch = tuple(patch_size)
        self.sw_batch = sw_batch
        self.compute_dtype = compute_dtype
        patch = self.patch

        def run(variables, volume, starts, valid, num_classes: int):
            shape = volume.shape
            score0 = jnp.zeros(shape + (num_classes,), jnp.float32)
            cnt0 = jnp.zeros(shape, jnp.float32)
            vol_c = volume.astype(compute_dtype)

            def scan_body(carry, batch_in):
                sc, ct = carry
                b_starts, b_valid = batch_in

                def gather(s):
                    return jax.lax.dynamic_slice(vol_c, (s[0], s[1], s[2]), patch)

                patches = jax.vmap(gather)(b_starts)          # [B,pw,ph,pd]
                out = model.apply(variables, patches[..., None], train=False)
                if isinstance(out, (tuple, list)):
                    # dual-decoder logit ensemble (test_2D_fully.py:72)
                    out = (out[0] + out[1]) / 2.0
                probs = jax.nn.softmax(out.astype(jnp.float32), axis=-1)
                probs = probs * b_valid[:, None, None, None, None]

                def body(i, carry2):
                    sc2, ct2 = carry2
                    s = b_starts[i]
                    idx4 = (s[0], s[1], s[2], 0)
                    region = jax.lax.dynamic_slice(sc2, idx4, patch + (sc2.shape[-1],))
                    sc2 = jax.lax.dynamic_update_slice(sc2, region + probs[i], idx4)
                    creg = jax.lax.dynamic_slice(ct2, (s[0], s[1], s[2]), patch)
                    ct2 = jax.lax.dynamic_update_slice(
                        ct2, creg + b_valid[i], (s[0], s[1], s[2]))
                    return sc2, ct2

                sc, ct = jax.lax.fori_loop(0, b_starts.shape[0], body, (sc, ct))
                return (sc, ct), None

            (score, cnt), _ = jax.lax.scan(scan_body, (score0, cnt0),
                                           (starts, valid))
            return jnp.argmax(score / jnp.maximum(cnt, 1e-8)[..., None],
                              axis=-1).astype(jnp.int32)

        self._run = jax.jit(run, static_argnums=(4,))

    def predict(self, variables, image: np.ndarray, stride_xy: int,
                stride_z: int, num_classes: int, nms: bool = False) -> np.ndarray:
        """Sliding-window inference of one volume [W,H,D] -> label map."""
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

        label_map = np.asarray(self._run(
            variables, jnp.asarray(image.astype(np.float32)),
            jnp.asarray(starts), jnp.asarray(valid), num_classes))
        if any(pads):
            label_map = label_map[pad_lo[0]:pad_lo[0] + w,
                                  pad_lo[1]:pad_lo[1] + h,
                                  pad_lo[2]:pad_lo[2] + d]
        if nms:
            label_map = _largest_cc_host(label_map[None], num_classes)[0]
        return label_map


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
                  per_case: Optional[List] = None) -> np.ndarray:
    """Mean per-class metrics over an h5 case dataset (val_3D.py:91-107;
    full_metrics adds ravd/asd like test_3D_util.py:147-152)."""
    engine = SlidingWindowEngine(model, patch_size, sw_batch)
    metric_fn = cal_metric_3d_full if full_metrics else cal_metric_3d
    width = 4 if full_metrics else 2
    total = np.zeros((num_classes - 1, width))
    for i in range(len(dataset)):
        sample = dataset[i]
        prediction = engine.predict(variables, np.asarray(sample["image"]),
                                    stride_xy, stride_z, num_classes, nms)
        label = np.asarray(sample["label"])
        case_metrics = np.stack([metric_fn(label == c, prediction == c)
                                 for c in range(1, num_classes)])
        total += case_metrics
        if per_case is not None:
            per_case.append((sample.get("case", str(i)), case_metrics))
    return total / len(dataset)
