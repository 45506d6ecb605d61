"""Pretrained-weight ingestion (VERDICT round-1 missing #1):
EfficientNet-b0 -> EffiUNet encoder with patch_first_conv, against a
synthetic checkpoint in the exact lukemelas key layout (the package itself
is not in this environment — the reference downloads it at runtime,
efficient_encoder.py:111-201)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _fake_b0_state_dict(rng):
    """Synthesize a b0 state_dict with lukemelas naming by inverting the
    converter's own flax template shapes."""
    from chap_tpu.convert.torch_import import efficientnet_b0_rules
    from chap_tpu.models.efficientunet import EffiUNet

    model = EffiUNet(num_classes=2)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), train=False)
    enc_p = variables["params"]["encoder"]
    enc_s = variables["batch_stats"]["encoder"]

    def get(tree, path):
        node = tree
        for part in path.split("/"):
            node = node[part]
        return node

    sd = {}
    for tp, kind, fp in efficientnet_b0_rules():
        if kind == "conv":
            kern = np.asarray(get(enc_p, fp)["kernel"])    # (kh,kw,I,O)
            # small zero-centered weights: all-positive randoms explode
            # through 16 swish blocks into inf (a test artifact, not a
            # converter property)
            sd[f"{tp}.weight"] = (rng.rand(
                kern.shape[3], kern.shape[2], kern.shape[0], kern.shape[1]
            ).astype(np.float32) - 0.5) * 0.2
            if "bias" in get(enc_p, fp):
                sd[f"{tp}.bias"] = (rng.rand(kern.shape[3]).astype(np.float32)
                                    - 0.5) * 0.2
        else:  # bn
            c = np.asarray(get(enc_p, fp)["scale"]).shape[0]
            for name in ("weight", "bias", "running_mean"):
                sd[f"{tp}.{name}"] = (rng.rand(c).astype(np.float32) - 0.5) * 0.2
            sd[f"{tp}.running_var"] = rng.rand(c).astype(np.float32) + 0.5
    # classifier head keys the encoder must ignore
    sd["_conv_head.weight"] = rng.rand(1280, 320, 1, 1).astype(np.float32)
    sd["_fc.weight"] = rng.rand(1000, 1280).astype(np.float32)
    return sd, variables


def test_efficientnet_ingestion_rgb():
    from chap_tpu.convert.torch_import import convert_efficientnet_pretrained
    rng = np.random.RandomState(0)
    sd, variables = _fake_b0_state_dict(rng)
    out = convert_efficientnet_pretrained(sd, variables, in_chns=3)
    got = out["params"]["encoder"]["stem"]["kernel"]
    np.testing.assert_allclose(
        got, np.transpose(sd["_conv_stem.weight"], (2, 3, 1, 0)), atol=1e-6)
    # a deep block's SE weights landed
    got_se = out["params"]["encoder"]["stage6_block0"]["SqueezeExcite_0"][
        "Conv_0"]["kernel"]
    np.testing.assert_allclose(
        got_se, np.transpose(sd["_blocks.15._se_reduce.weight"], (2, 3, 1, 0)),
        atol=1e-6)
    # BN running stats landed in batch_stats
    got_var = out["batch_stats"]["encoder"]["stage0_block0"]["BatchNorm_0"]["var"]
    np.testing.assert_allclose(got_var, sd["_blocks.0._bn1.running_var"],
                               atol=1e-6)


def test_efficientnet_patch_first_conv_single_channel():
    """in_chns=1: stem kernel summed over input channels
    (efficient_encoder.py:53-54), so a grayscale input x produces the same
    stem response as the RGB input (x,x,x)."""
    from chap_tpu.convert.torch_import import convert_efficientnet_pretrained
    from chap_tpu.models.efficientunet import EffiUNet

    rng = np.random.RandomState(1)
    sd, _ = _fake_b0_state_dict(rng)

    model1 = EffiUNet(num_classes=2)
    v1 = model1.init({"params": jax.random.PRNGKey(0)},
                     jnp.zeros((1, 64, 64, 1)), train=False)
    out1 = convert_efficientnet_pretrained(sd, v1, in_chns=1)
    want = np.transpose(sd["_conv_stem.weight"], (2, 3, 1, 0)).sum(
        axis=2, keepdims=True)
    np.testing.assert_allclose(out1["params"]["encoder"]["stem"]["kernel"],
                               want, atol=1e-6)

    with pytest.raises(ValueError):
        convert_efficientnet_pretrained(sd, v1, in_chns=5)


def test_efficientunet_forward_after_ingestion():
    from chap_tpu.convert.torch_import import convert_efficientnet_pretrained
    from chap_tpu.models.efficientunet import EffiUNet

    rng = np.random.RandomState(2)
    sd, _ = _fake_b0_state_dict(rng)
    model = EffiUNet(num_classes=4)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 64, 64, 1)), train=False)
    out = convert_efficientnet_pretrained(sd, v, in_chns=1)
    y = model.apply(out, jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32),
                    train=False)
    assert y.shape == (1, 64, 64, 4)
    assert np.isfinite(np.asarray(y)).all()


def test_get_encoder_multi_arch():
    """Compound scaling matches the reference table's out_channels
    (efficient_encoder.py:129,147,156: b2 -> (32,24,48,120,352),
    b3 -> (40,32,48,136,384))."""
    from chap_tpu.models.efficientunet import get_encoder
    import jax
    import jax.numpy as jnp

    for name, want in [("efficientnet-b0", (32, 24, 40, 112, 320)),
                       ("efficientnet-b2", (32, 24, 48, 120, 352)),
                       ("efficientnet-b3", (40, 32, 48, 136, 384))]:
        enc = get_encoder(name)
        v = enc.init({"params": jax.random.PRNGKey(0)},
                     jnp.zeros((1, 64, 64, 3)), train=False)
        feats = enc.apply(v, jnp.zeros((1, 64, 64, 3)), train=False,
                          mutable=["batch_stats"])[0]
        assert tuple(f.shape[-1] for f in feats) == want, name

    with pytest.raises(KeyError):
        get_encoder("efficientnet-b9")
