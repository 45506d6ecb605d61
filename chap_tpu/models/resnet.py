"""ResNet / ResNeXt backbone family, rank-generic (2D and 3D in one module).

Rebuild of the reference's constructor families resnet18...resnext152_32x8d
(resnet.py:359-415 for 3D, resnet3d.py:213-265 — identical twins — and the 2D
ResNet2d :242-357). The reference keeps two near-duplicate 600-line files; here
one Flax module parameterized by ``ndim`` covers both, NDHWC/NHWC layouts.

Semantics preserved from resnet.py:144-239:
  * base width 16*width (medical-image narrow variant, not torchvision's 64)
  * 7x7 stride-1 stem (full-resolution c1 feature), maxpool defined but
    UNUSED in forward (:230-231 comments it out) — so stages are strided
  * stages at planes base*2/4/8/16, each stride 2 (layer4_dilation=2 switches
    the last stage to stride 1, dilation 2, resnet.py:176-180)
  * Bottleneck width = planes * (width_per_group/64) * groups (:107)
  * downsample = 1x1 strided conv + BN, or avg_down variant (avgpool +
    1x1 stride-1 conv + BN, :203-216)
  * forward returns the 5-level pyramid [c1, c2, c3, c4, c5] (:226-237)

The reference's deep_stem branch (:161-166) wires a 64-channel stem into a
16-channel bn1 — it would crash if instantiated; here the stem norm follows
the actual channel count, with the stem's stride-2 first conv kept.
"""
from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax.numpy as jnp


def _bn(train: bool, dtype, name=None):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        dtype=dtype, name=name)


class BasicBlock(nn.Module):
    """conv3-BN-ReLU-conv3-BN + residual, post-add ReLU (resnet.py:68-100)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    avg_down: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        n_sp = x.ndim - 2
        k, s = (3,) * n_sp, (self.stride,) * n_sp
        h = nn.Conv(self.planes, k, strides=s, padding=1, use_bias=False,
                    dtype=self.dtype)(x)
        h = _bn(train, self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes, k, padding=1, use_bias=False,
                    dtype=self.dtype)(h)
        h = _bn(train, self.dtype)(h)
        residual = _downsample(x, self.planes, self.stride, self.avg_down,
                               self.dtype, train)
        return nn.relu(h + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride, groups, dilation) -> 1x1 x4 expansion
    (resnet.py:103-141)."""
    planes: int
    stride: int = 1
    groups: int = 1
    base_width: int = 64
    dilation: int = 1
    avg_down: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        n_sp = x.ndim - 2
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * 4
        h = nn.Conv(width, (1,) * n_sp, use_bias=False, dtype=self.dtype)(x)
        h = _bn(train, self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(width, (3,) * n_sp, strides=(self.stride,) * n_sp,
                    padding=self.dilation,
                    kernel_dilation=(self.dilation,) * n_sp,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype)(h)
        h = _bn(train, self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(out_ch, (1,) * n_sp, use_bias=False, dtype=self.dtype)(h)
        h = _bn(train, self.dtype)(h)
        residual = _downsample(x, out_ch, self.stride, self.avg_down,
                               self.dtype, train)
        return nn.relu(h + residual)


def _downsample(x: jnp.ndarray, out_ch: int, stride: int, avg_down: bool,
                dtype, train: bool) -> jnp.ndarray:
    """Identity when shapes already match; else the reference's 1x1-conv+BN
    (or avgpool + 1x1 conv + BN when avg_down, resnet.py:203-216).
    Static (trace-time) branch."""
    if stride == 1 and x.shape[-1] == out_ch:
        return x
    n_sp = x.ndim - 2
    h = x
    if avg_down and stride != 1:
        h = nn.avg_pool(h, (stride,) * n_sp, strides=(stride,) * n_sp)
        h = nn.Conv(out_ch, (1,) * n_sp, use_bias=False, dtype=dtype,
                    name="downsample_conv")(h)
    else:
        h = nn.Conv(out_ch, (1,) * n_sp, strides=(stride,) * n_sp,
                    use_bias=False, dtype=dtype, name="downsample_conv")(h)
    return _bn(train, dtype, name="downsample_bn")(h)


class ResNetBackbone(nn.Module):
    """The shared ResNet/ResNet2d body (resnet.py:144-239, :242-357).
    ``ndim`` (2 or 3) must match the input rank; returns [c1..c5]."""
    block: str = "basic"                  # basic | bottleneck
    layers: Sequence[int] = (2, 2, 2, 2)
    width: int = 1
    groups: int = 1
    width_per_group: int = 64
    avg_down: bool = False
    deep_stem: bool = False
    layer4_dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False
                 ) -> List[jnp.ndarray]:
        if self.block not in ("basic", "bottleneck"):
            raise ValueError(f"unknown block {self.block!r}")
        if self.layer4_dilation not in (1, 2):
            raise NotImplementedError("layer4_dilation must be 1 or 2")
        n_sp = x.ndim - 2
        base = 16 * self.width

        if self.deep_stem:
            h = x
            for i, (ch, st) in enumerate([(32, 2), (32, 1)]):
                h = nn.Conv(ch, (3,) * n_sp, strides=(st,) * n_sp, padding=1,
                            use_bias=False, dtype=self.dtype,
                            name=f"stem_conv{i}")(h)
                h = _bn(train, self.dtype, name=f"stem_bn{i}")(h)
                h = nn.relu(h)
            h = nn.Conv(64, (3,) * n_sp, padding=1, use_bias=False,
                        dtype=self.dtype, name="conv1")(h)
        else:
            h = nn.Conv(base, (7,) * n_sp, padding=3, use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
        h = _bn(train, self.dtype, name="bn1")(h)
        h = nn.relu(h)

        feats = [h]
        for stage, blocks in enumerate(self.layers):
            planes = base * 2 ** (stage + 1)
            last = stage == len(self.layers) - 1
            stride = 1 if (last and self.layer4_dilation == 2) else 2
            dilation = self.layer4_dilation if last else 1
            for b in range(blocks):
                kwargs = dict(planes=planes, stride=stride if b == 0 else 1,
                              dilation=dilation, avg_down=self.avg_down,
                              dtype=self.dtype,
                              name=f"layer{stage + 1}_block{b}")
                if self.block == "bottleneck":
                    h = Bottleneck(groups=self.groups,
                                   base_width=self.width_per_group,
                                   **kwargs)(h, train=train)
                else:
                    h = BasicBlock(**kwargs)(h, train=train)
            feats.append(h)
        return feats


def _make(block: str, layers: Sequence[int], **kw) -> ResNetBackbone:
    return ResNetBackbone(block=block, layers=tuple(layers), **kw)


# constructor family (resnet.py:359-415 == resnet3d.py:213-265; pass ndim via
# the input rank — the module itself is rank-generic)
def resnet18(**kw):
    return _make("basic", (2, 2, 2, 2), **kw)


def resnet18_d(**kw):
    return _make("basic", (2, 2, 2, 2), deep_stem=True, avg_down=True, **kw)


def resnet34(**kw):
    return _make("basic", (3, 4, 6, 3), **kw)


def resnet34_d(**kw):
    return _make("basic", (3, 4, 6, 3), deep_stem=True, avg_down=True, **kw)


def resnet50(**kw):
    return _make("bottleneck", (3, 4, 6, 3), **kw)


def resnet50_w2x(**kw):
    return _make("bottleneck", (3, 4, 6, 3), width=2, **kw)


def resnet50_16s(**kw):
    return _make("bottleneck", (3, 4, 6, 3), layer4_dilation=2, **kw)


def resnet50_d(**kw):
    return _make("bottleneck", (3, 4, 6, 3), deep_stem=True, avg_down=True, **kw)


def resnet101(**kw):
    return _make("bottleneck", (3, 4, 23, 3), **kw)


def resnet101_d(**kw):
    return _make("bottleneck", (3, 4, 23, 3), deep_stem=True, avg_down=True, **kw)


def resnext101_32x8d(**kw):
    return _make("bottleneck", (3, 4, 23, 3), groups=32, width_per_group=8, **kw)


def resnet152(**kw):
    return _make("bottleneck", (3, 8, 36, 3), **kw)


def resnet152_d(**kw):
    return _make("bottleneck", (3, 8, 36, 3), deep_stem=True, avg_down=True, **kw)


def resnext152_32x8d(**kw):
    return _make("bottleneck", (3, 8, 36, 3), groups=32, width_per_group=8, **kw)


CONSTRUCTORS = {
    "resnet18": resnet18, "resnet18_d": resnet18_d,
    "resnet34": resnet34, "resnet34_d": resnet34_d,
    "resnet50": resnet50, "resnet50_d": resnet50_d,
    "resnet50_w2x": resnet50_w2x, "resnet50_16s": resnet50_16s,
    "resnet101": resnet101, "resnet101_d": resnet101_d,
    "resnet152": resnet152, "resnet152_d": resnet152_d,
    "resnext101_32x8d": resnext101_32x8d, "resnext152_32x8d": resnext152_32x8d,
}
