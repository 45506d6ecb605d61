"""2D DualDecoder forward/backward microbench at the CHAP train shape
(batch 24 x 256², bf16): locates how far the UNet convs run from the v5e
peak, to size the conv-layout attack on the train-step deficit.

Per-image dual-decoder forward = 9.4 GFLOP (BENCH_NOTES derivation), so
batch-24 fwd = 226 GFLOP; fwd+bwd of a supervised loss ~3x that.

Usage: python scripts/bench_fwd2d.py [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from chap_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from chap_tpu.config import Config  # noqa: E402
from chap_tpu.models import net_factory  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 24
GF_FWD = 9.4 * BATCH


def timeit(tag, fn, *args, n=10, gflop=None):
    out = fn(*args)
    jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    dt = (time.perf_counter() - t0) / n
    rate = f" -> {gflop / dt / 1000:.1f} TFLOP/s" if gflop else ""
    print(f"{tag}: {dt * 1000:.1f} ms{rate}", flush=True)


def main():
    cfg = Config()
    cfg.model.dtype = "bfloat16"
    model = net_factory("dualdecoder", 1, 4, cfg.model)
    x = jnp.asarray(np.random.RandomState(0).rand(BATCH, 256, 256, 1)
                    .astype(np.float32))
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), x)
    label = jnp.zeros((BATCH, 256, 256), jnp.int32)

    fwd_eval = jax.jit(lambda v, x: model.apply(v, x, train=False))
    timeit("fwd eval-mode", fwd_eval, variables, x, gflop=GF_FWD)

    def fwd_train(v, x, rng):
        (o1, o2), _ = model.apply(v, x, train=True, mutable=["batch_stats"],
                                  rngs={"dropout": rng})
        return o1, o2

    fwd_train = jax.jit(fwd_train)
    timeit("fwd train-mode (BN+dropout)", fwd_train, variables, x,
           jax.random.PRNGKey(1), gflop=GF_FWD)

    def loss_fn(params, bs, x, rng):
        (o1, o2), upd = model.apply({"params": params, "batch_stats": bs},
                                    x, train=True, mutable=["batch_stats"],
                                    rngs={"dropout": rng})
        return (jnp.mean((o1 - 1.0) ** 2) + jnp.mean((o2 - 1.0) ** 2))

    grad = jax.jit(jax.grad(loss_fn))
    timeit("fwd+bwd train-mode", grad, variables["params"],
           variables["batch_stats"], x, jax.random.PRNGKey(1),
           gflop=3 * GF_FWD)


if __name__ == "__main__":
    main()
