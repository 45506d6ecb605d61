"""CycleGAN-era legacy networks (networks_other.py:260-525).

The reference carries these unreferenced by any trainer or test path — they
are kept for strict capability parity of the model zoo surface:

  * ``GANLoss`` (:260-294): LSGAN (MSE) or vanilla (BCE) criterion against a
    constant real/fake target;
  * ``ResnetGenerator`` (:300-351): Johnson-style 7x7 stem -> 2 stride-2
    downs -> n residual blocks (reflect-padded) -> 2 stride-2 ups -> 7x7
    tanh head;
  * ``UnetGenerator`` (:396-423) / ``UnetSkipConnectionBlock`` (:426-477):
    recursive k4-stride2 U-Net with LeakyReLU(0.2) downs, ReLU ups, concat
    skips, tanh outermost;
  * ``NLayerDiscriminator`` (:480-525): PatchGAN k4 stack ndf*(1,2,4,8),
    LeakyReLU(0.2), 1-channel head, optional sigmoid.

Flax linen, NHWC. Norms follow the reference's default BatchNorm2d; pass
``norm="instancenorm"`` for the InstanceNorm variant (which, as in the
reference, turns conv biases on).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def _norm(norm: str, train: bool, dtype):
    if norm == "batchnorm":
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            dtype=dtype)
    if norm == "instancenorm":
        return nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                            use_scale=False, dtype=dtype)
    raise ValueError(f"unknown norm {norm!r}")


def _reflect_pad(x: jnp.ndarray, p: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


def gan_loss(pred: jnp.ndarray, target_is_real: bool,
             use_lsgan: bool = True, real_label: float = 1.0,
             fake_label: float = 0.0) -> jnp.ndarray:
    """GANLoss (networks_other.py:260-294): MSE (lsgan) or BCE against a
    constant target map."""
    target = real_label if target_is_real else fake_label
    if use_lsgan:
        return jnp.mean((pred - target) ** 2)
    eps = 1e-7
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


class GANLoss:
    """Constructor-compatible wrapper (networks_other.py:260)."""

    def __init__(self, use_lsgan: bool = True, target_real_label: float = 1.0,
                 target_fake_label: float = 0.0):
        self.use_lsgan = use_lsgan
        self.real_label = target_real_label
        self.fake_label = target_fake_label

    def __call__(self, pred, target_is_real: bool):
        return gan_loss(pred, target_is_real, self.use_lsgan,
                        self.real_label, self.fake_label)


class _ResnetBlock(nn.Module):
    """ResnetBlock (networks_other.py:355-393): reflect-padded conv3-norm-relu
    [-dropout] -conv3-norm with residual add."""
    dim: int
    norm: str = "batchnorm"
    use_dropout: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        h = _reflect_pad(x, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID",
                    use_bias=self.norm == "instancenorm", dtype=self.dtype)(h)
        h = _norm(self.norm, train, self.dtype)(h)
        h = nn.relu(h)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        h = _reflect_pad(h, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID",
                    use_bias=self.norm == "instancenorm", dtype=self.dtype)(h)
        h = _norm(self.norm, train, self.dtype)(h)
        return x + h


class ResnetGenerator(nn.Module):
    """ResnetGenerator (networks_other.py:300-351)."""
    output_nc: int
    ngf: int = 64
    n_blocks: int = 6
    norm: str = "batchnorm"
    use_dropout: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        bias = self.norm == "instancenorm"
        h = _reflect_pad(x, 3)
        h = nn.Conv(self.ngf, (7, 7), padding="VALID", use_bias=bias,
                    dtype=self.dtype)(h)
        h = nn.relu(_norm(self.norm, train, self.dtype)(h))
        for i in range(2):                       # 2 stride-2 downs
            mult = 2 ** i
            h = nn.Conv(self.ngf * mult * 2, (3, 3), strides=(2, 2),
                        padding=1, use_bias=bias, dtype=self.dtype)(h)
            h = nn.relu(_norm(self.norm, train, self.dtype)(h))
        for _ in range(self.n_blocks):
            h = _ResnetBlock(self.ngf * 4, self.norm, self.use_dropout,
                             self.dtype)(h, train=train)
        for i in range(2):                       # 2 stride-2 ups
            mult = 2 ** (2 - i)
            h = nn.ConvTranspose(self.ngf * mult // 2, (3, 3), strides=(2, 2),
                                 padding="SAME", use_bias=bias,
                                 dtype=self.dtype)(h)
            h = nn.relu(_norm(self.norm, train, self.dtype)(h))
        h = _reflect_pad(h, 3)
        h = nn.Conv(self.output_nc, (7, 7), padding="VALID", dtype=self.dtype)(h)
        return jnp.tanh(h)


class UnetSkipConnectionBlock(nn.Module):
    """UnetSkipConnectionBlock (networks_other.py:426-477): k4-stride2 down,
    recursive submodule, k4-stride2 up; non-outermost blocks concat the
    identity skip on channels."""
    outer_nc: int
    inner_nc: int
    submodule: Optional[nn.Module] = None
    outermost: bool = False
    innermost: bool = False
    norm: str = "batchnorm"
    use_dropout: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        bias = self.norm == "instancenorm"
        h = x
        if not self.outermost:
            h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.inner_nc, (4, 4), strides=(2, 2), padding=1,
                    use_bias=bias or self.outermost, dtype=self.dtype)(h)
        if not (self.outermost or self.innermost):
            h = _norm(self.norm, train, self.dtype)(h)
        if self.submodule is not None:
            h = self.submodule(h, train=train)
        h = nn.relu(h)
        h = nn.ConvTranspose(self.outer_nc, (4, 4), strides=(2, 2),
                             padding="SAME",
                             use_bias=bias or self.outermost,
                             dtype=self.dtype)(h)
        if self.outermost:
            return jnp.tanh(h)
        h = _norm(self.norm, train, self.dtype)(h)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        return jnp.concatenate([x, h], axis=-1)


class UnetGenerator(nn.Module):
    """UnetGenerator (networks_other.py:396-423): num_downs-deep recursive
    U-Net (image 2^num_downs -> 1 at the bottleneck)."""
    output_nc: int
    num_downs: int = 7
    ngf: int = 64
    norm: str = "batchnorm"
    use_dropout: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        common = dict(norm=self.norm, dtype=self.dtype)
        block = UnetSkipConnectionBlock(self.ngf * 8, self.ngf * 8,
                                        innermost=True, **common)
        for _ in range(self.num_downs - 5):
            block = UnetSkipConnectionBlock(self.ngf * 8, self.ngf * 8,
                                            submodule=block,
                                            use_dropout=self.use_dropout,
                                            **common)
        for mult in (4, 2, 1):
            block = UnetSkipConnectionBlock(self.ngf * mult,
                                            self.ngf * mult * 2,
                                            submodule=block, **common)
        block = UnetSkipConnectionBlock(self.output_nc, self.ngf,
                                        submodule=block, outermost=True,
                                        **common)
        return block(x, train=train)


class NLayerDiscriminator(nn.Module):
    """PatchGAN NLayerDiscriminator (networks_other.py:480-525)."""
    ndf: int = 64
    n_layers: int = 3
    norm: str = "batchnorm"
    use_sigmoid: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        bias = self.norm == "instancenorm"
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1,
                    dtype=self.dtype)(x)
        h = nn.leaky_relu(h, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            h = nn.Conv(self.ndf * nf_mult, (4, 4), strides=(2, 2), padding=1,
                        use_bias=bias, dtype=self.dtype)(h)
            h = nn.leaky_relu(_norm(self.norm, train, self.dtype)(h), 0.2)
        nf_mult = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf_mult, (4, 4), strides=(1, 1), padding=1,
                    use_bias=bias, dtype=self.dtype)(h)
        h = nn.leaky_relu(_norm(self.norm, train, self.dtype)(h), 0.2)
        h = nn.Conv(1, (4, 4), strides=(1, 1), padding=1, dtype=self.dtype)(h)
        return nn.sigmoid(h) if self.use_sigmoid else h
