"""Same-process A/B of the z-packed 32-ch stage convs (model.zpack_stage2)
on the inference-engine shapes: VNet forward, batch 48 x (112,112,80) bf16.

The 32-ch stages (block_two/block_eight) are output-lane-bound: a Co=32 conv
runs at the speed of a 32-wide matmul (BENCH_NOTES round-3). zpack widens the
output to 128 lanes for 2x the FLOPs with a CONTIGUOUS unpack (no transpose
— the failure mode of the round-3 s2d-stage-2 attempt). This script decides
whether bench.py enables it.

Usage: python scripts/bench_zpack.py [batch [reps]]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from chap_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from chap_tpu.models.vnet3d import VNet  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 48
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SHAPE = (112, 112, 80)


def bench(tag, model, variables, x):
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    out = fwd(variables, x)
    jax.device_get(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fwd(variables, x)
    jax.device_get(jnp.ravel(out)[0])
    dt = (time.perf_counter() - t0) / REPS
    print(f"{tag}: {dt * 1000:.1f} ms/fwd ({BATCH / dt:.0f} patches/s)",
          flush=True)
    return out


def main():
    plain = VNet(num_classes=2, n_filters=16, normalization="batchnorm",
                 dtype=jnp.bfloat16, s2d_stem=True, zpack_stage2=False)
    fast = VNet(num_classes=2, n_filters=16, normalization="batchnorm",
                dtype=jnp.bfloat16, s2d_stem=True, zpack_stage2=True)
    x = jnp.asarray(np.random.RandomState(0).rand(BATCH, *SHAPE, 1)
                    .astype(np.float32))
    init = jax.jit(lambda r, x: plain.init(r, x, train=False))
    variables = init(jax.random.PRNGKey(0), x)
    o_p = bench("plain  (s2d_stem)", plain, variables, x)
    o_z = bench("zpack  (s2d_stem + zpack_stage2)", fast, variables, x)
    o_p = bench("plain  again (window check)", plain, variables, x)
    diff = float(jnp.max(jnp.abs(o_p.astype(jnp.float32)
                                 - o_z.astype(jnp.float32))))
    print(f"max |plain - zpack| = {diff:.3e} (bf16 tolerance)")


if __name__ == "__main__":
    main()
