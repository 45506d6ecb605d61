import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chap_tpu.eval.sliding_window import SlidingWindowEngine, compute_grid


class ArgmaxModel:
    """Tiny stand-in 'model': probability = one-hot of thresholded intensity,
    so engine output can be verified against a pure-numpy reference."""

    def apply(self, variables, x, train=False):
        # x: [B,pw,ph,pd,1] -> logits [B,pw,ph,pd,2]
        fg = (x[..., 0] > 0.5).astype(jnp.float32)
        return jnp.stack([(1 - fg) * 10.0, fg * 10.0], axis=-1)


def numpy_reference(image, patch, stride_xy, stride_z, num_classes):
    """Direct transcription of the reference accumulation loop semantics
    (val_3D.py:42-72) with the same toy predictor."""
    ww, hh, dd = image.shape
    sx = math.ceil(max(ww - patch[0], 0) / stride_xy) + 1
    sy = math.ceil(max(hh - patch[1], 0) / stride_xy) + 1
    sz = math.ceil(max(dd - patch[2], 0) / stride_z) + 1
    score = np.zeros(image.shape + (num_classes,), np.float32)
    cnt = np.zeros(image.shape, np.float32)
    for x in range(sx):
        xs = min(stride_xy * x, ww - patch[0])
        for y in range(sy):
            ys = min(stride_xy * y, hh - patch[1])
            for z in range(sz):
                zs = min(stride_z * z, dd - patch[2])
                p = image[xs:xs + patch[0], ys:ys + patch[1], zs:zs + patch[2]]
                fg = (p > 0.5).astype(np.float32)
                logits = np.stack([(1 - fg) * 10.0, fg * 10.0], axis=-1)
                e = np.exp(logits - logits.max(-1, keepdims=True))
                probs = e / e.sum(-1, keepdims=True)
                score[xs:xs + patch[0], ys:ys + patch[1], zs:zs + patch[2]] += probs
                cnt[xs:xs + patch[0], ys:ys + patch[1], zs:zs + patch[2]] += 1
    return np.argmax(score / cnt[..., None], axis=-1)


def test_grid_geometry():
    starts = compute_grid((40, 40, 20), (16, 16, 8), 12, 6)
    # sx = ceil(24/12)+1 = 3, sy = 3, sz = ceil(12/6)+1 = 3
    assert starts.shape == (27, 3)
    assert starts[:, 0].max() == 24  # clamped to ww - patch
    assert starts[:, 2].max() == 12


def test_engine_matches_numpy_reference():
    rng = np.random.RandomState(0)
    image = rng.rand(40, 36, 20).astype(np.float32)
    patch = (16, 16, 8)
    engine = SlidingWindowEngine(ArgmaxModel(), patch, sw_batch=4)
    got = engine.predict({}, image, stride_xy=12, stride_z=6, num_classes=2)
    want = numpy_reference(image, patch, 12, 6, 2)
    np.testing.assert_array_equal(got, want)


def test_engine_pads_small_volume():
    rng = np.random.RandomState(1)
    image = rng.rand(10, 12, 6).astype(np.float32)  # smaller than patch
    engine = SlidingWindowEngine(ArgmaxModel(), (16, 16, 8), sw_batch=2)
    got = engine.predict({}, image, stride_xy=12, stride_z=6, num_classes=2)
    assert got.shape == image.shape
    # thresholded prediction is exact even through pad/unpad
    np.testing.assert_array_equal(got, (image > 0.5).astype(np.int64))


def test_engine_nms_removes_islands():
    image = np.zeros((20, 20, 10), np.float32)
    image[2:10, 2:10, 2:8] = 1.0     # big blob
    image[15:17, 15:17, 8:9] = 1.0   # small island
    engine = SlidingWindowEngine(ArgmaxModel(), (16, 16, 8), sw_batch=2)
    got = engine.predict({}, image, stride_xy=8, stride_z=4, num_classes=2,
                         nms=True)
    assert got[3, 3, 3] == 1
    assert got[15, 15, 8] == 0


def test_bitpacked_download_matches_unpacked():
    """2-class label maps travel bit-packed (8 voxels/byte); the unpacked
    result must be voxel-identical to the plain int8 path."""
    import jax.numpy as jnp
    from chap_tpu.eval.sliding_window import SlidingWindowEngine
    from chap_tpu.models import net_factory_3d
    from chap_tpu.config import ModelConfig

    cfg = ModelConfig()
    cfg.n_filters_3d = 2
    model = net_factory_3d("vnet", 1, 2, mode="test", cfg=cfg)
    rng = np.random.RandomState(0)
    image = rng.rand(20, 20, 16).astype(np.float32)
    patch = (16, 16, 8)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, *patch, 1)), train=False)

    packed = SlidingWindowEngine(model, patch, sw_batch=4, pack_binary=True)
    plain = SlidingWindowEngine(model, patch, sw_batch=4, pack_binary=False)
    out_packed = packed.predict(variables, image, 4, 4, 2)
    out_plain = plain.predict(variables, image, 4, 4, 2)
    np.testing.assert_array_equal(out_packed, out_plain)
    # packing really engaged (depth divisible by 8)
    handle = packed.predict_async(variables, image, 4, 4, 2)
    assert handle[-1] is True


def test_quantized_upload_argmax_parity():
    """uint8 fixed-point upload + on-device dequant: the label map must agree
    with the float path except at decision-boundary voxels (<0.5% on a real
    VNet over a random volume; exactly equal for a thresholded toy away from
    the threshold's quantization bin)."""
    from chap_tpu.models import net_factory_3d
    from chap_tpu.config import ModelConfig

    cfg = ModelConfig()
    cfg.n_filters_3d = 2
    model = net_factory_3d("vnet", 1, 2, mode="test", cfg=cfg)
    rng = np.random.RandomState(0)
    image = rng.rand(20, 20, 16).astype(np.float32)
    patch = (16, 16, 8)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, *patch, 1)), train=False)

    quant = SlidingWindowEngine(model, patch, sw_batch=4, quantize_upload=True)
    plain = SlidingWindowEngine(model, patch, sw_batch=4, quantize_upload=False)
    out_q = quant.predict(variables, image, 4, 4, 2)
    out_p = plain.predict(variables, image, 4, 4, 2)
    mismatch = float((out_q != out_p).mean())
    assert mismatch < 0.005, mismatch
