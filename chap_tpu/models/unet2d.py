"""2D UNet family — the heart of CHAP (reference unet.py:125-292,498-822).

Flax linen, NHWC, channels [16,32,64,128,256]. The dual-decoder forward with
channel perturbation traces into a single XLA graph: encode once, perturb the
pyramid, decode twice.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from chap_tpu.models.layers import ConvBlock, DownBlock, UpBlock, UpBlockPlus
from chap_tpu.models.perturb import (
    feature_dropout,
    feature_noise,
    perform_dropout,
)

DEFAULT_CHNS = (16, 32, 64, 128, 256)
DEFAULT_DROPOUT = (0.05, 0.1, 0.2, 0.3, 0.5)


class Encoder(nn.Module):
    """5-scale encoder: in_conv + 4x(maxpool -> ConvBlock) (unet.py:125-151)."""
    feature_chns: Sequence[int] = DEFAULT_CHNS
    dropout: Sequence[float] = DEFAULT_DROPOUT
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> List[jnp.ndarray]:
        chns, drops = self.feature_chns, self.dropout
        x0 = ConvBlock(chns[0], drops[0], self.dtype, name="in_conv")(x, train=train)
        x1 = DownBlock(chns[1], drops[1], self.dtype, name="down1")(x0, train=train)
        x2 = DownBlock(chns[2], drops[2], self.dtype, name="down2")(x1, train=train)
        x3 = DownBlock(chns[3], drops[3], self.dtype, name="down3")(x2, train=train)
        x4 = DownBlock(chns[4], drops[4], self.dtype, name="down4")(x3, train=train)
        return [x0, x1, x2, x3, x4]


class Decoder(nn.Module):
    """4x UpBlock + 3x3 out conv (unet.py:153-190). bilinear=False is the
    reference's up_type 0 (mcnet transpose-conv decoder2)."""
    num_classes: int
    feature_chns: Sequence[int] = DEFAULT_CHNS
    bilinear: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feature: Sequence[jnp.ndarray], *, train: bool,
                 with_features: bool = False):
        chns = self.feature_chns
        x0, x1, x2, x3, x4 = feature
        x = UpBlock(chns[3], chns[3], 0.0, self.bilinear, self.dtype, name="up1")(x4, x3, train=train)
        x = UpBlock(chns[2], chns[2], 0.0, self.bilinear, self.dtype, name="up2")(x, x2, train=train)
        x = UpBlock(chns[1], chns[1], 0.0, self.bilinear, self.dtype, name="up3")(x, x1, train=train)
        x = UpBlock(chns[0], chns[0], 0.0, self.bilinear, self.dtype, name="up4")(x, x0, train=train)
        out = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=self.dtype, name="out_conv")(x)
        if with_features:
            return out, x
        return out


class DecoderPlus(nn.Module):
    """Additive-skip decoder (unet.py:193-242); returns all stage features
    when asked (used by UNet_plus / DSNet multiscale fusion)."""
    num_classes: int
    feature_chns: Sequence[int] = DEFAULT_CHNS
    bilinear: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feature: Sequence[jnp.ndarray], *, train: bool,
                 with_features: bool = False):
        chns = self.feature_chns
        x0, x1, x2, x3, x4 = feature
        feats = []
        x = UpBlockPlus(chns[3], chns[3], 0.0, self.bilinear, self.dtype, name="up1")(x4, x3, train=train)
        feats.append(x)
        x = UpBlockPlus(chns[2], chns[2], 0.0, self.bilinear, self.dtype, name="up2")(x, x2, train=train)
        feats.append(x)
        x = UpBlockPlus(chns[1], chns[1], 0.0, self.bilinear, self.dtype, name="up3")(x, x1, train=train)
        feats.append(x)
        x = UpBlockPlus(chns[0], chns[0], 0.0, self.bilinear, self.dtype, name="up4")(x, x0, train=train)
        feats.append(x)
        out = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=self.dtype, name="out_conv")(x)
        if with_features:
            return out, feats
        return out


class DualDecoder(nn.Module):
    """CHAP core model (unet.py:245-292): shared encoder, decoder1 bilinear,
    decoder2 selected by decoder_type in {same, plus, mcnet}.

    Extended forward mirrors the reference's
    forward(x, with_feat, dropout, dropout_level, scores, comp_dropout): when
    ``dropout_level`` is given, the encoder pyramid is split into two
    channel-perturbed copies (chap_tpu.models.perturb) before the two decodes.
    Needs rng collection 'perturb' in that mode.
    """
    num_classes: int
    decoder_type: str = "mcnet"
    feature_chns: Sequence[int] = DEFAULT_CHNS
    dropout: Sequence[float] = DEFAULT_DROPOUT
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.feature_chns, self.dropout, self.dtype)
        self.decoder1 = Decoder(self.num_classes, self.feature_chns, True, self.dtype)
        if self.decoder_type == "same":
            self.decoder2 = Decoder(self.num_classes, self.feature_chns, True, self.dtype)
        elif self.decoder_type == "plus":
            self.decoder2 = DecoderPlus(self.num_classes, self.feature_chns, True, self.dtype)
        elif self.decoder_type == "mcnet":
            self.decoder2 = Decoder(self.num_classes, self.feature_chns, False, self.dtype)
        else:
            raise ValueError(f"unknown decoder_type {self.decoder_type!r}")

    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 with_feat: bool = False,
                 dropout_level: Optional[Sequence[int]] = None,
                 scores: Optional[Sequence[Optional[jnp.ndarray]]] = None,
                 comp_dropout: bool = False,
                 stop_encoder_grad: bool = False,
                 perturb_gate=None):
        feature = self.encoder(x, train=train)
        if stop_encoder_grad:
            # ACAL decoder max-step: encoder frozen (the reference's
            # torch.no_grad encoder pass, train_share_encoder_2D.py:216-217)
            feature = [jax.lax.stop_gradient(f) for f in feature]
        if dropout_level is not None:
            rng = self.make_rng("perturb")
            f1, f2 = perform_dropout(rng, feature, dropout_level, scores,
                                     comp_dropout, gate=perturb_gate)
            out1 = self.decoder1(f1, train=train)
            out2 = self.decoder2(f2, train=train)
        else:
            out1 = self.decoder1(feature, train=train)
            out2 = self.decoder2(feature, train=train)
        if with_feat:
            return out1, out2, feature
        return out1, out2

    def forward_encoder(self, x: jnp.ndarray, *, train: bool = False):
        """Encoder-only pass — the ACAL trainer's frozen-encoder step
        (train_share_encoder_2D.py:216-222). Use via apply(method=...)."""
        return self.encoder(x, train=train)

    def forward_decoders(self, feature: Sequence[jnp.ndarray], *, train: bool = False):
        """Decoder-only pass over a precomputed pyramid (ACAL decoder max-step)."""
        return (self.decoder1(feature, train=train),
                self.decoder2(feature, train=train))


class UNet(nn.Module):
    """Plain single-decoder UNet (unet.py:498-552)."""
    num_classes: int
    feature_chns: Sequence[int] = DEFAULT_CHNS
    dropout: Sequence[float] = DEFAULT_DROPOUT
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.feature_chns, self.dropout, self.dtype)
        self.decoder = Decoder(self.num_classes, self.feature_chns, True, self.dtype)

    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 with_feats: bool = False):
        feature = self.encoder(x, train=train)
        return self.decoder(feature, train=train, with_features=with_feats)

    def forward_encoder(self, x: jnp.ndarray, *, train: bool = False):
        return self.encoder(x, train=train)

    def forward_decoder(self, feature, *, train: bool = False):
        return self.decoder(feature, train=train)


class UNetPlus(nn.Module):
    """UNet with additive-skip decoder (unet.py:554-620); in train mode also
    returns the final decoder feature map (unet.py:614-620)."""
    num_classes: int
    feature_chns: Sequence[int] = DEFAULT_CHNS
    dropout: Sequence[float] = DEFAULT_DROPOUT
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        feature = Encoder(self.feature_chns, self.dropout, self.dtype)(x, train=train)
        out, feats = DecoderPlus(self.num_classes, self.feature_chns, True, self.dtype)(
            feature, train=train, with_features=True)
        if train:
            return out, feats[-1]
        return out


class UNetCCT(nn.Module):
    """Main decoder + 3 perturbed aux decoders (unet.py:776-801).

    Needs rng collection 'perturb' in train mode.
    """
    num_classes: int
    feature_chns: Sequence[int] = DEFAULT_CHNS
    dropout: Sequence[float] = DEFAULT_DROPOUT
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.feature_chns, self.dropout, self.dtype)
        self.main_decoder = Decoder(self.num_classes, self.feature_chns, True, self.dtype)
        self.aux_decoder1 = Decoder(self.num_classes, self.feature_chns, True, self.dtype)
        self.aux_decoder2 = Decoder(self.num_classes, self.feature_chns, True, self.dtype)
        self.aux_decoder3 = Decoder(self.num_classes, self.feature_chns, True, self.dtype)

    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        feature = self.encoder(x, train=train)
        main_seg = self.main_decoder(feature, train=train)
        rng = self.make_rng("perturb")
        keys = jax.random.split(rng, 3 * len(feature)).reshape(3, len(feature), 2)
        aux1 = [feature_noise(keys[0, i], f) for i, f in enumerate(feature)]
        aux2 = [_dropout_elementwise(keys[1, i], f, 0.3) for i, f in enumerate(feature)]
        aux3 = [feature_dropout(keys[2, i], f) for i, f in enumerate(feature)]
        return (main_seg,
                self.aux_decoder1(aux1, train=train),
                self.aux_decoder2(aux2, train=train),
                self.aux_decoder3(aux3, train=train))


def _dropout_elementwise(rng: jax.Array, x: jnp.ndarray, p: float) -> jnp.ndarray:
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape).astype(x.dtype)
    return x * keep / (1.0 - p)


def _resize_to(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize of NHWC logits to a target spatial size
    (torch F.interpolate default mode, unet.py:446)."""
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, hw[0], hw[1], c), method="nearest")


class UNetURPC(nn.Module):
    """Multi-scale deep supervision with stage perturbations (unet.py:404-464,
    804-822). Returns 4 logits maps at full resolution.

    Needs rng collection 'perturb' in train mode.
    """
    num_classes: int
    feature_chns: Sequence[int] = DEFAULT_CHNS
    dropout: Sequence[float] = DEFAULT_DROPOUT
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        shape = x.shape[1:3]
        chns = self.feature_chns
        feature = Encoder(chns, self.dropout, self.dtype)(x, train=train)
        x0, x1, x2, x3, x4 = feature
        if train:
            r1, r2, r3 = jax.random.split(self.make_rng("perturb"), 3)

        h = UpBlock(chns[3], chns[3], 0.0, True, self.dtype, name="up1")(x4, x3, train=train)
        dp3_in = _dropout_elementwise(r1, h, 0.5) if train else h
        dp3 = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=self.dtype, name="out_dp3")(dp3_in)
        dp3 = _resize_to(dp3, shape)

        h = UpBlock(chns[2], chns[2], 0.0, True, self.dtype, name="up2")(h, x2, train=train)
        dp2_in = feature_dropout(r2, h) if train else h
        dp2 = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=self.dtype, name="out_dp2")(dp2_in)
        dp2 = _resize_to(dp2, shape)

        h = UpBlock(chns[1], chns[1], 0.0, True, self.dtype, name="up3")(h, x1, train=train)
        dp1_in = feature_noise(r3, h) if train else h
        dp1 = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=self.dtype, name="out_dp1")(dp1_in)
        dp1 = _resize_to(dp1, shape)

        h = UpBlock(chns[0], chns[0], 0.0, True, self.dtype, name="up4")(h, x0, train=train)
        dp0 = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=self.dtype, name="out_conv")(h)
        return dp0, dp1, dp2, dp3
