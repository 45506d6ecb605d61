"""SwinDecoder (SwinTransformer_Decoder, swin_..._original.py:807-1036)."""
import jax
import jax.numpy as jnp
import pytest


def _pyramid(b=1, s=32, chans=(16, 32, 64, 128, 256)):
    return [jnp.zeros((b, s // 2 ** i, s // 2 ** i, c))
            for i, c in enumerate(chans)]


def test_swin_decoder_forward():
    from chap_tpu.models.swin_unet import SwinDecoder
    dec = SwinDecoder(num_classes=4, img_size=32, embed_dim=8,
                      num_heads=(1, 2, 2, 4, 4), window_size=4)
    feats = _pyramid(s=32)
    v = dec.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    out = dec.apply(v, feats, train=False)
    # full input resolution restored by the final dim_scale-2 expand
    assert out.shape == (1, 32, 32, 4)


def test_swin_decoder_projector_head():
    from chap_tpu.models.swin_unet import SwinDecoder
    dec = SwinDecoder(num_classes=2, img_size=32, embed_dim=8,
                      num_heads=(1, 2, 2, 4, 4), window_size=4,
                      projection_dim=16)
    feats = _pyramid(s=32)
    v = dec.init({"params": jax.random.PRNGKey(0)}, feats, train=False,
                 with_features=True)
    out, proj = dec.apply(v, feats, train=False, with_features=True,
                          mutable=["batch_stats"])[0]
    assert out.shape == (1, 32, 32, 2)
    assert proj.shape == (1, 32, 32, 16)


def test_swin_decoder_rejects_wrong_levels():
    from chap_tpu.models.swin_unet import SwinDecoder
    dec = SwinDecoder(img_size=32, embed_dim=8, num_heads=(1, 2, 2, 4, 4))
    with pytest.raises(ValueError):
        dec.init({"params": jax.random.PRNGKey(0)}, _pyramid(s=32)[:3],
                 train=False)
