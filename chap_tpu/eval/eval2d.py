"""Slice-wise 2D volume evaluation.

Rebuild of val_2D.test_single_volume (val_2D.py:54-97): zoom each slice to the
network size, forward, argmax, zoom back, per-class Dice+HD95. TPU-first: the
reference runs ONE synchronous device roundtrip per slice at batch 1; here all
slices of a volume are zoomed on host, stacked, forwarded in a few fixed-size
batches (padded to a bucket so the jit cache stays small), and only the final
label map returns to host.

Ensemble modes match val_2D.py:66-80: model1 | model2 | logit_ensemble |
prob_ensemble (and plain single-output models).
"""
from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from chap_tpu.data.transforms import resize_slice
from chap_tpu.metrics.surface import calculate_metric_percase, calculate_metric_percase_full


def make_predictor(model, model_type: str = "logit_ensemble") -> Callable:
    """Jitted fn(variables, x[B,H,W,1]) -> label map [B,H,W] int32."""

    @jax.jit
    def predict(variables, x):
        out = model.apply(variables, x, train=False)
        if isinstance(out, (tuple, list)):
            o1, o2 = out[0], out[1]
            if model_type == "model1":
                prob = jax.nn.softmax(o1, axis=-1)
            elif model_type == "model2":
                prob = jax.nn.softmax(o2, axis=-1)
            elif model_type == "logit_ensemble":
                prob = jax.nn.softmax((o1 + o2) / 2.0, axis=-1)
            elif model_type == "prob_ensemble":
                prob = (jax.nn.softmax(o1, axis=-1) + jax.nn.softmax(o2, axis=-1)) / 2.0
            else:
                raise ValueError(model_type)
        else:
            prob = jax.nn.softmax(out, axis=-1)
        # int8: shrink the device->host transfer (tunnel downloads are slow)
        return jnp.argmax(prob, axis=-1).astype(jnp.int8)

    return predict


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def predict_volume(predict: Callable, variables, image: np.ndarray,
                   patch_size: Sequence[int] = (256, 256),
                   slice_batch: int = 16, mesh=None) -> np.ndarray:
    """image: [D,H,W] float -> prediction [D,H,W] int. Batched slice inference
    with D padded to a multiple of slice_batch (static shapes, one compile).

    With a >1-device mesh, each slice chunk is device_put with batch-dim
    sharding: the forward runs SPMD over all chips (params are replicated by
    the trainers), so eval during a multi-chip training run is no longer a
    single-device serial bottleneck (SURVEY §2.3)."""
    sharding = None
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
        if n_dev > 1:
            from chap_tpu.parallel.mesh import batch_sharding
            slice_batch = _round_up(slice_batch, n_dev)
            sharding = batch_sharding(mesh, 4)
    d, x, y = image.shape
    slices = np.stack([resize_slice(image[i], patch_size, order=0)
                       for i in range(d)]).astype(np.float32)
    d_pad = _round_up(d, slice_batch)
    if d_pad != d:
        slices = np.concatenate(
            [slices, np.zeros((d_pad - d,) + slices.shape[1:], np.float32)])
    # two-phase: dispatch all chunks async first, then pull results — the
    # device computes ahead while earlier chunks stream back over the tunnel
    futures = []
    for start in range(0, d_pad, slice_batch):
        chunk = slices[start:start + slice_batch][..., None]
        chunk = (jax.device_put(chunk, sharding) if sharding is not None
                 else jnp.asarray(chunk))
        futures.append(predict(variables, chunk))
    pred = np.concatenate([np.asarray(f) for f in futures])[:d]
    if (x, y) != tuple(patch_size):
        pred = np.stack([resize_slice(pred[i].astype(np.float32), (x, y), order=0)
                         for i in range(d)]).astype(np.int32)
    return pred


def test_single_volume(image: np.ndarray, label: np.ndarray, predict: Callable,
                       variables, classes: int,
                       patch_size: Sequence[int] = (256, 256),
                       full_metrics: bool = False, mesh=None) -> List[Tuple]:
    """Per-class (dice, hd95[, asd, jc]) like val_2D.py:93-97 /
    test_2D_fully.py:81-83."""
    prediction = predict_volume(predict, variables, np.asarray(image),
                                patch_size, mesh=mesh)
    label = np.asarray(label)
    metric_fn = calculate_metric_percase_full if full_metrics else calculate_metric_percase
    return [metric_fn(prediction == c, label == c) for c in range(1, classes)]


def make_ds_predictor(model) -> Callable:
    """Predictor for deep-supervision models returning (main, *aux) logits —
    the val_2D.test_single_volume_ds path (val_2D.py:100-122)."""

    @jax.jit
    def predict(variables, x):
        outs = model.apply(variables, x, train=False)
        main = outs[0] if isinstance(outs, (tuple, list)) else outs
        return jnp.argmax(jax.nn.softmax(main, axis=-1), axis=-1).astype(jnp.int8)

    return predict


def make_adv_predictor(model, decoder: str = "model1") -> Callable:
    """Split-model predictor (val_2D.test_single_adv:125-155): forward through
    the shared encoder alone (the reference's separate ``net_g``), then ONE
    decoder half (``net_f1``) — the natural eval mode for the ACAL
    shared-encoder model. Routes via the model's forward_encoder / decoder
    attributes (the acalnet API reconstructed from
    train_share_encoder_2D.py:183-222)."""
    if decoder not in ("model1", "model2"):
        raise ValueError(decoder)

    @jax.jit
    def predict(variables, x):
        feature = model.apply(variables, x, train=False,
                              method=model.forward_encoder)

        def decode(m, f):
            d = m.decoder1 if decoder == "model1" else m.decoder2
            return d(f, train=False)

        out = model.apply(variables, feature, method=decode)
        if isinstance(out, (tuple, list)):   # reference's tuple unwrap (:143)
            out = out[0]
        return jnp.argmax(jax.nn.softmax(out, axis=-1), axis=-1).astype(jnp.int8)

    return predict


def test_single_adv(image: np.ndarray, label: np.ndarray, model, variables,
                    classes: int, patch_size: Sequence[int] = (256, 256),
                    decoder: str = "model1") -> List[Tuple]:
    """Split-model slice eval (val_2D.test_single_adv:125-155): same zoom ->
    forward -> zoom-back protocol as test_single_volume but through
    encoder + one decoder halves."""
    predict = make_adv_predictor(model, decoder)
    prediction = predict_volume(predict, variables, np.asarray(image), patch_size)
    label = np.asarray(label)
    return [calculate_metric_percase(prediction == c, label == c)
            for c in range(1, classes)]


def test_single_adv_polyp(image: np.ndarray, label: np.ndarray, model,
                          variables, decoder: str = "model1") -> float:
    """Split-model whole-image binary eval returning Dice via the polyp
    F-measure recipe (val_2D.test_single_adv_polyp:187-210)."""
    from chap_tpu.metrics.fmeasure import fmeasure_calu
    predict = make_adv_predictor(model, decoder)
    x = jnp.asarray(np.asarray(image, np.float32)[None])
    if x.ndim == 3:
        x = x[..., None]
    pred = np.asarray(predict(variables, x))[0]
    return fmeasure_calu(pred, np.asarray(label))[3]


def test_single_volume_polyp(image: np.ndarray, label: np.ndarray,
                             predict: Callable, variables) -> float:
    """Whole-image binary eval returning Dice via the polyp F-measure recipe
    (val_2D.py:158-184)."""
    from chap_tpu.metrics.fmeasure import fmeasure_calu
    x = jnp.asarray(np.asarray(image, np.float32)[None])
    if x.ndim == 3:
        x = x[..., None]
    pred = np.asarray(predict(variables, x))[0]
    return fmeasure_calu(pred, np.asarray(label))[3]


def evaluate_volumes(dataset, predict: Callable, variables, classes: int,
                     patch_size: Sequence[int] = (256, 256),
                     full_metrics: bool = False, mesh=None) -> np.ndarray:
    """Mean per-class metrics over a volume dataset (train_ours_2D.py:407-415).
    With a >1-device mesh the slice forwards run SPMD over all chips
    (predict_volume batch sharding); surface metrics stay host-side for
    medpy-exact semantics."""
    total = None
    for i in range(len(dataset)):
        sample = dataset[i]
        m = np.array(test_single_volume(sample["image"], sample["label"],
                                        predict, variables, classes, patch_size,
                                        full_metrics, mesh=mesh))
        total = m if total is None else total + m
    return total / len(dataset)
