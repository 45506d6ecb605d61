"""Shared auxiliary blocks (reference networks/utils.py SqEx :280-302,
attention.py SCSEModule :51-64 / Conv2dReLU :9-48, VoxResNet.py SEBlock
:9-23) and weight-init helpers (networks_other.py init_weights :64-76).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

# torch kaiming_normal_ equivalent for flax Conv kernels
kaiming_normal = nn.initializers.he_normal()
xavier_normal = nn.initializers.xavier_normal()


class SqEx(nn.Module):
    """Squeeze-and-excitation over NDHWC (utils.py:280-302)."""
    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        axes = tuple(range(1, x.ndim - 1))
        s = jnp.mean(x, axis=axes)
        s = nn.relu(nn.Dense(x.shape[-1] // self.reduction, dtype=self.dtype)(s))
        s = nn.sigmoid(nn.Dense(x.shape[-1], dtype=self.dtype)(s))
        return x * s.reshape(s.shape[:1] + (1,) * len(axes) + s.shape[1:])


class SEBlock3d(nn.Module):
    """Residual SE with conv squeeze (VoxResNet.py:9-23)."""
    reduction: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        s = nn.relu(nn.Conv(x.shape[-1] // self.reduction, (1, 1, 1),
                            dtype=self.dtype)(s))
        s = nn.relu(nn.Conv(x.shape[-1], (1, 1, 1), dtype=self.dtype)(s))
        return s * x + x


class SCSEModule(nn.Module):
    """Concurrent spatial+channel SE (attention.py:51-64)."""
    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        ch = jnp.mean(x, axis=(1, 2), keepdims=True)
        ch = nn.relu(nn.Conv(c // self.reduction, (1, 1), dtype=self.dtype)(ch))
        ch = nn.sigmoid(nn.Conv(c, (1, 1), dtype=self.dtype)(ch))
        sp = nn.sigmoid(nn.Conv(1, (1, 1), dtype=self.dtype)(x))
        return x * ch + x * sp


class Conv2dReLU(nn.Module):
    """conv-BN-ReLU (attention.py:9-48)."""
    out_channels: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        x = nn.Conv(self.out_channels, (self.kernel, self.kernel),
                    strides=self.stride, padding=self.kernel // 2,
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        return nn.relu(x)
