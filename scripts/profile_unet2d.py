"""Per-op microbenches of the 2D DualDecoder at the CHAP train shape
(batch 24, 256², bf16): where do the forward's milliseconds go?

Times each encoder stage, each decoder up-block piece (1x1 pre-conv,
bilinear resize, concat+ConvBlock), and candidate replacements (bilinear 2x
as an exact fixed-kernel transposed conv; z/w-packed narrow convs).

Usage: python scripts/profile_unet2d.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from chap_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

B = 24
DT = jnp.bfloat16


def t(tag, fn, *args, n=20, gflop=None):
    f = jax.jit(fn)
    out = f(*args)
    jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    dt = (time.perf_counter() - t0) / n
    rate = f" -> {gflop / dt / 1000:.1f} TFLOP/s" if gflop else ""
    print(f"  {tag}: {dt * 1000:.2f} ms{rate}", flush=True)


def conv(x, ci, co, hw, k=3):
    w = jnp.asarray(np.random.RandomState(0).randn(k, k, ci, co) * 0.1, DT)
    gf = 2 * B * hw * hw * k * k * ci * co / 1e9
    t(f"conv{k}x{k} {ci}->{co} @{hw}²",
      lambda x, w: jax.lax.conv_general_dilated(
          x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")),
      x, w, gflop=gf)


def main():
    rng = np.random.RandomState(0)
    print("== encoder-stage convs ==", flush=True)
    for ci, co, hw in [(1, 16, 256), (16, 16, 256), (16, 32, 128),
                       (32, 32, 128), (32, 64, 64), (64, 64, 64),
                       (64, 128, 32), (128, 128, 32), (128, 256, 16),
                       (256, 256, 16)]:
        x = jnp.asarray(rng.rand(B, hw, hw, ci), DT)
        conv(x, ci, co, hw)

    print("== decoder pieces ==", flush=True)
    for c_hi, c_skip, hw in [(256, 128, 16), (128, 64, 32), (64, 32, 64),
                             (32, 16, 128)]:
        x = jnp.asarray(rng.rand(B, hw, hw, c_hi), DT)
        # 1x1 pre-conv
        w1 = jnp.asarray(rng.randn(1, 1, c_hi, c_skip) * 0.1, DT)
        t(f"1x1 {c_hi}->{c_skip} @{hw}²",
          lambda x, w: jax.lax.conv_general_dilated(
              x, w, (1, 1), "SAME",
              dimension_numbers=("NHWC", "HWIO", "NHWC")), x, w1)
        xs = jnp.asarray(rng.rand(B, hw, hw, c_skip), DT)
        # bilinear 2x resize (flax/jax.image path)
        t(f"bilinear 2x resize {c_skip}ch {hw}->{2*hw}",
          lambda x: jax.image.resize(
              x, (B, 2 * hw, 2 * hw, c_skip), method="bilinear"), xs)
        # the same 2x bilinear as a fixed-kernel transposed conv
        k1 = jnp.asarray([0.25, 0.75, 0.75, 0.25], DT)
        wk = jnp.einsum("i,j->ij", k1, k1)[:, :, None, None] \
            * jnp.eye(c_skip, dtype=DT)[None, None]
        t(f"bilinear-as-deconv {c_skip}ch {hw}->{2*hw}",
          lambda x, w: jax.lax.conv_transpose(
              x, w, (2, 2), "SAME",
              dimension_numbers=("NHWC", "HWIO", "NHWC")), xs, wk)
        # post-concat ConvBlock conv
        xc = jnp.asarray(rng.rand(B, 2 * hw, 2 * hw, 2 * c_skip), DT)
        conv(xc, 2 * c_skip, c_skip, 2 * hw)

    print("== aux ops ==", flush=True)
    x16 = jnp.asarray(rng.rand(B, 256, 256, 16), DT)
    t("BN train-mode 16ch @256²",
      lambda x: (x - x.mean((0, 1, 2), keepdims=True))
      * jax.lax.rsqrt(x.var((0, 1, 2), keepdims=True) + 1e-5), x16)
    t("dropout mask 16ch @256²",
      lambda x: x * jax.random.bernoulli(
          jax.random.PRNGKey(0), 0.95, x.shape).astype(DT) / 0.95, x16)
    t("maxpool 2x2 16ch @256²",
      lambda x: jax.lax.reduce_window(
          x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"),
      x16.astype(jnp.float32))

    print("== packed variants of the narrow convs ==", flush=True)
    from chap_tpu.ops.s2d import zpack_conv_kernel  # 1-axis pack works in 2D
    for ci, co, hw, f in [(16, 16, 256, 8), (32, 32, 128, 4),
                          (1, 16, 256, 8), (16, 32, 128, 4)]:
        x = jnp.asarray(rng.rand(B, hw, hw, ci), DT)
        w = jnp.asarray(rng.randn(3, 3, ci, co) * 0.1, DT)
        # reuse the 3D transform by treating H as a unit axis
        w3 = w[None]                                   # [1,3,3,ci,co]
        wz = zpack_conv_kernel(w3, f)[0]               # [3, 3+f-1, ci, f*co]
        gf = 2 * B * hw * hw * 9 * ci * co / 1e9

        def packed(x, wz, f=f):
            y = jax.lax.conv_general_dilated(
                x, wz, (1, f), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            b, hh, wg, fc = y.shape
            return y.reshape(b, hh, wg * f, fc // f)

        t(f"wpack{f} conv3x3 {ci}->{co} @{hw}²", packed, x, wz, gflop=gf)


if __name__ == "__main__":
    main()
