"""IN-GRAPH per-stage profile of the 2D DualDecoder (batch 24 x 256², bf16).

Standalone per-op microbenches through the tunnel are soaked by ~1.5-2 ms of
dispatch overhead per call (scripts/profile_unet2d.py round-4 finding), so
every stage here is timed as a lax.scan of 8 dependent applications inside
ONE jitted program — dispatch cost amortizes to noise and XLA fuses exactly
as it would inside the real forward.

Usage: python scripts/profile_unet2d_ingraph.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from chap_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from chap_tpu.models.unet2d import DualDecoder, Encoder, Decoder  # noqa: E402

B = 24
DT = jnp.bfloat16
N = 8


def scan_time(tag, fn, *args, n_dispatch=6):
    """Time fn via an 8-iteration in-graph scan (input perturbed per
    iteration to defeat CSE); report per-application ms."""

    def scanned(*args):
        def body(c, _):
            out = fn(*args, scale=1.0 + c * 1e-6)
            leaves = jax.tree_util.tree_leaves(out)
            return jnp.float32(leaves[0].ravel()[0]), None

        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
        return out

    f = jax.jit(scanned)
    out = f(*args)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(n_dispatch):
        out = f(*args)
    jax.device_get(out)
    dt = (time.perf_counter() - t0) / n_dispatch / N
    print(f"  {tag}: {dt * 1000:.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    model = DualDecoder(num_classes=4, dtype=DT)
    x = jnp.asarray(rng.rand(B, 256, 256, 1), jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), x)
    params = variables["params"]
    bstats = variables["batch_stats"]

    enc = Encoder(dtype=DT)
    enc_vars = {"params": params["encoder"],
                "batch_stats": bstats["encoder"]}
    feats = enc.apply(enc_vars, x, train=False)
    dec1 = Decoder(4, bilinear=True, dtype=DT)
    dec1_vars = {"params": params["decoder1"],
                 "batch_stats": bstats["decoder1"]}
    dec2 = Decoder(4, bilinear=False, dtype=DT)
    dec2_vars = {"params": params["decoder2"],
                 "batch_stats": bstats["decoder2"]}

    print("== in-graph stage times (eval mode) ==", flush=True)
    scan_time("FULL dual-decoder fwd",
              lambda v, x, scale: model.apply(v, x * scale, train=False),
              variables, x)
    scan_time("encoder", lambda v, x, scale: enc.apply(v, x * scale,
                                                       train=False),
              enc_vars, x)
    scan_time("decoder1 (bilinear)",
              lambda v, f, scale: dec1.apply(
                  v, [t * scale for t in f], train=False), dec1_vars, feats)
    scan_time("decoder2 (deconv)",
              lambda v, f, scale: dec2.apply(
                  v, [t * scale for t in f], train=False), dec2_vars, feats)

    # encoder prefixes -> per-stage attribution by differences
    for k in range(1, 6):
        def prefix(v, x, scale, k=k):
            f = enc.apply(v, x * scale, train=False)
            return f[k - 1]
        scan_time(f"encoder prefix {k} stages", prefix, enc_vars, x)

    print("== train-mode (BN stats + dropout) ==", flush=True)
    scan_time("FULL fwd train-mode",
              lambda v, x, scale: model.apply(
                  v, x * scale, train=True, mutable=["batch_stats"],
                  rngs={"dropout": jax.random.PRNGKey(1)}), variables, x)
    scan_time("encoder train-mode",
              lambda v, x, scale: enc.apply(
                  v, x * scale, train=True, mutable=["batch_stats"],
                  rngs={"dropout": jax.random.PRNGKey(1)}), enc_vars, x)


if __name__ == "__main__":
    main()
