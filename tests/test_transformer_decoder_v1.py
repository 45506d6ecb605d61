"""MaskTransformerDecoderV1 (MyTransformerDecoderV1, mask2former...py:466-713)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_mask_transformer_decoder_v1():
    from chap_tpu.models.transformer_decoder import MaskTransformerDecoderV1
    dec = MaskTransformerDecoderV1(num_queries=4, num_classes=3, hidden_dim=32,
                                   num_layers=3, num_heads=4)
    # layer i consumes level i directly (no cycling)
    feats = [jnp.zeros((2, 4, 4, 16)), jnp.zeros((2, 8, 8, 8)),
             jnp.zeros((2, 16, 16, 8))]
    mask_features = jnp.zeros((2, 32, 32, 8))
    v = dec.init({"params": jax.random.PRNGKey(0)}, feats, mask_features,
                 train=False)
    segs, (cls, mask) = dec.apply(v, feats, mask_features, train=False)
    assert len(segs) == 3
    assert segs[0].shape == (2, 3, 4, 4)
    assert segs[2].shape == (2, 3, 16, 16)
    # prediction heads: class logits get the +1 no-object slot (:589),
    # mask = query-embedding x pixel-features einsum (:683)
    assert cls.shape == (2, 4, 4)            # [B, Q, num_classes+1]
    assert mask.shape == (2, 4, 32, 32)


def test_decoder_v1_rejects_too_few_levels():
    from chap_tpu.models.transformer_decoder import MaskTransformerDecoderV1
    dec = MaskTransformerDecoderV1(num_layers=4)
    feats = [jnp.zeros((1, 4, 4, 8))] * 2
    with pytest.raises(ValueError):
        dec.init({"params": jax.random.PRNGKey(0)}, feats,
                 jnp.zeros((1, 8, 8, 8)), train=False)


def test_decoder_v1_single_head_cross_attention_maps_are_responses():
    """With one cross-attn head, the returned attention map is the raw
    (softmax-pre) query-key logits — nonconstant for nonzero inputs."""
    from chap_tpu.models.transformer_decoder import MaskTransformerDecoderV1
    dec = MaskTransformerDecoderV1(num_queries=2, num_classes=2, hidden_dim=16,
                                   num_layers=1, num_heads=2)
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.rand(1, 4, 4, 8), jnp.float32)]
    mask_features = jnp.asarray(rng.rand(1, 8, 8, 4), jnp.float32)
    v = dec.init({"params": jax.random.PRNGKey(1)}, feats, mask_features,
                 train=False)
    segs, _ = dec.apply(v, feats, mask_features, train=False)
    assert np.asarray(segs[0]).std() > 0
