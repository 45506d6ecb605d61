"""SwinUNet weight-copy parity vs the torch reference SwinTransformerSys
(swin_transformer_unet_skip_expand_decoder_sys.py:599-817) through the
state_dict converter, plus the load_from pretrained-encoder surgery
(vision_transformer.py:55-90). Skipped without /root/reference."""
import os

import numpy as np
import pytest

from ref_loader import REF, import_ref

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


def _torch_sys(img_size=32, embed_dim=24, window_size=4, num_classes=3):
    torch = pytest.importorskip("torch")
    mod = import_ref("networks.swin_transformer_unet_skip_expand_decoder_sys")
    torch.manual_seed(0)
    m = mod.SwinTransformerSys(
        img_size=img_size, patch_size=4, in_chans=3, num_classes=num_classes,
        embed_dim=embed_dim, depths=[2, 2, 2, 2], num_heads=[3, 6, 12, 24],
        window_size=window_size, drop_path_rate=0.0, projection_dim=0)
    m.eval()
    return m


def test_swinunet_matches_reference_via_converter():
    import torch
    import jax
    import jax.numpy as jnp
    from chap_tpu.convert import convert_state_dict
    from chap_tpu.models.swin_unet import SwinUNet

    ref = _torch_sys()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = SwinUNet(num_classes=3, img_size=32, patch_size=4, embed_dim=24,
                     depths=(2, 2, 2, 2), num_heads=(3, 6, 12, 24),
                     window_size=4)
    x_np = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x_np), train=False)
    converted = convert_state_dict("swinunet", sd, variables)

    out_j = model.apply(converted, jnp.asarray(x_np), train=False)
    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2)))
        out_t, _ = ref(xt)
    out_t = np.transpose(out_t.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=5e-4, rtol=5e-3)


def test_swin_pretrained_encoder_surgery():
    """Official-checkpoint ingestion: encoder keys land in enc*/merge*, the
    load_from mirror initializes matching decoder blocks, and everything
    without a pretrained analog keeps its fresh init."""
    import jax
    import jax.numpy as jnp
    from chap_tpu.convert.torch_import import convert_swin_pretrained
    from chap_tpu.models.swin_unet import SwinUNet

    ref = _torch_sys()
    # an ImageNet-style checkpoint: {'model': encoder-only keys}
    enc_sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()
              if k.startswith(("layers.", "patch_embed.", "norm."))
              or k in ("norm.weight", "norm.bias")}
    ckpt = {"model": enc_sd}

    model = SwinUNet(num_classes=3, img_size=32, patch_size=4, embed_dim=24,
                     depths=(2, 2, 2, 2), num_heads=(3, 6, 12, 24),
                     window_size=4)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 32, 32, 3)), train=False)
    converted = convert_swin_pretrained(ckpt, variables)

    p = converted["params"]
    # encoder block got the torch weights
    got = p["enc0_blk0"]["WindowAttention_0"]["qkv"]["kernel"]
    want = np.transpose(enc_sd["layers.0.blocks.0.attn.qkv.weight"])
    np.testing.assert_allclose(got, want, atol=1e-6)
    # surgery mirror: dec2 (dim 24) initialized from layers.0 (dim 24)
    got_dec = p["dec2_blk0"]["WindowAttention_0"]["qkv"]["kernel"]
    np.testing.assert_allclose(got_dec, want, atol=1e-6)
    # dec0 (dim 96) mirrors layers.2 (dim 96)
    got_dec0 = p["dec0_blk0"]["WindowAttention_0"]["qkv"]["kernel"]
    want_dec0 = np.transpose(enc_sd["layers.2.blocks.0.attn.qkv.weight"])
    np.testing.assert_allclose(got_dec0, want_dec0, atol=1e-6)
    # output head had no pretrained analog: unchanged from fresh init
    np.testing.assert_allclose(
        p["output"]["kernel"],
        np.asarray(variables["params"]["output"]["kernel"]), atol=1e-6)
