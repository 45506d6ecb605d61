"""Per-stage timing of the VNet 3D forward on the real chip.

Times (a) encoder vs decoder split, (b) every conv/deconv shape the LA-protocol
VNet executes, as standalone jitted dispatches with mean-consumed outputs (no
output relayout), dependency-free reps and a final device_get sync (the tunnel
makes block_until_ready unreliable).

Usage: python scripts/profile_vnet.py [sw_batch]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from chap_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from chap_tpu.config import ModelConfig  # noqa: E402
from chap_tpu.models import net_factory_3d  # noqa: E402

PATCH = (112, 112, 80)
REPS = 10


def _sync(out):
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])


def timed(fn, *args):
    _sync(fn(*args))
    _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(REPS):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / REPS * 1000.0


def conv_bench(b, shape, cin, cout, k, stride, transpose=False):
    x = jnp.zeros((b, *shape, cin), jnp.bfloat16)
    if transpose:
        w = jnp.zeros((k, k, k, cin, cout), jnp.bfloat16)

        def f(x, w):
            y = jax.lax.conv_transpose(x, w, (stride,) * 3, "VALID",
                                       dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            return y.astype(jnp.float32).mean()
    else:
        w = jnp.zeros((k, k, k, cin, cout), jnp.bfloat16)

        def f(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (stride,) * 3, "SAME" if stride == 1 else "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            return y.astype(jnp.float32).mean()

    ms = timed(jax.jit(f), x, w)
    out_vox = np.prod([s // stride for s in shape]) if not transpose else \
        np.prod([s * stride for s in shape])
    flops = 2 * b * out_vox * (k ** 3) * cin * cout
    tflops = flops / (ms / 1000) / 1e12
    kind = "deconv" if transpose else "conv"
    print(f"  {kind} k{k} s{stride} {cin:4d}->{cout:4d} @ {shape}: "
          f"{ms:8.2f} ms  {tflops:6.1f} TFLOP/s")
    return ms


def main():
    sw = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    cfg = ModelConfig()
    cfg.dtype = "bfloat16"
    model = net_factory_3d("vnet", 1, 2, mode="test", cfg=cfg)
    x = jnp.zeros((sw, *PATCH, 1), jnp.bfloat16)
    variables = jax.jit(lambda k: model.init({"params": k}, x, train=False))(
        jax.random.PRNGKey(0))

    def full(v, x):
        return model.apply(v, x, train=False).astype(jnp.float32).mean()

    def enc(v, x):
        feats = model.apply(v, x, train=False,
                            method=lambda m, x, train: m.encoder(x, train=train))
        return sum(f.astype(jnp.float32).mean() for f in feats)

    t_full = timed(jax.jit(full), variables, x)
    t_enc = timed(jax.jit(enc), variables, x)
    print(f"sw_batch={sw} bf16 s2d={cfg.s2d_stem}")
    print(f"  full fwd: {t_full:8.2f} ms   encoder: {t_enc:8.2f} ms   "
          f"decoder ~ {t_full - t_enc:8.2f} ms")

    print("conv shapes (encoder path):")
    w, h, d = PATCH
    conv_bench(sw, (w // 2, h // 2, d // 2), 8, 16, 3, 1)       # s2d stem conv
    conv_bench(sw, (w // 2, h // 2, d // 2), 16, 32, 2, 2)      # one_dw
    conv_bench(sw, (w // 2, h // 2, d // 2), 32, 32, 3, 1)      # block_two x2
    conv_bench(sw, (w // 4, h // 4, d // 4), 64, 64, 3, 1)      # block_three x3
    conv_bench(sw, (w // 8, h // 8, d // 8), 128, 128, 3, 1)    # block_four x3
    conv_bench(sw, (w // 16, h // 16, d // 16), 256, 256, 3, 1) # block_five x3
    print("decoder path:")
    conv_bench(sw, (w // 16, h // 16, d // 16), 256, 128, 2, 2, transpose=True)
    conv_bench(sw, (w // 8, h // 8, d // 8), 128, 128, 3, 1)    # block_six x3
    conv_bench(sw, (w // 4, h // 4, d // 4), 64, 64, 3, 1)      # block_seven x3
    conv_bench(sw, (w // 2, h // 2, d // 2), 32, 32, 3, 1)      # block_eight x2
    conv_bench(sw, (w // 4, h // 4, d // 4), 64, 32, 2, 2, transpose=True)
    conv_bench(sw, (w // 2, h // 2, d // 2), 16, 16, 3, 1)      # block_nine plain-equiv
    conv_bench(sw, (w // 2, h // 2, d // 2), 128, 128, 3, 1)    # s2d tail conv


if __name__ == "__main__":
    main()
