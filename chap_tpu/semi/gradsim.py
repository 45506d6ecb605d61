"""Gradient-similarity channel scoring (GradSim).

Rebuild of the missing ``utils.grad.GradSim`` contract (SURVEY.md §2.4; call
sites train_ours_2D.py:288,297,360-365): per encoder level, the cosine
similarity between the LABELED-loss gradient and the UNLABELED-loss gradient
of that level's final conv kernel, per output channel. High similarity =
channel learns consistently from both streams; low similarity = channel is
being pulled apart — those are preferentially dropped by the channel
perturbation (chap_tpu.models.perturb.scores_dropout_v2).

TPU-first: instead of the reference's extra eager backward passes through the
optimizer, the two gradients are produced by ``jax.grad`` over (loss_l,
loss_u) inside the jitted train step, and the per-channel cosines are an EMA
carried in the TrainState.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

GradSimState = Tuple[jnp.ndarray, ...]  # one [C] vector per encoder level

ENCODER_LEVEL_PATHS = (
    ("encoder", "in_conv", "Conv_1"),
    ("encoder", "down1", "ConvBlock_0", "Conv_1"),
    ("encoder", "down2", "ConvBlock_0", "Conv_1"),
    ("encoder", "down3", "ConvBlock_0", "Conv_1"),
    ("encoder", "down4", "ConvBlock_0", "Conv_1"),
)

# VNet 3D encoder (chap_tpu.models.vnet3d.VEncoder): the final conv kernel of
# each scale's ConvBlock3d, stages (1,2,3,3,3). The s2d stem names its convs
# identically ("Conv_0", param "kernel") with the SAME kernel shape, so these
# paths are s2d-invariant.
VNET_LEVEL_PATHS = (
    ("encoder", "block_one", "Conv_0"),
    ("encoder", "block_two", "Conv_1"),
    ("encoder", "block_three", "Conv_2"),
    ("encoder", "block_four", "Conv_2"),
    ("encoder", "block_five", "Conv_2"),
)


def init_sim_scores(feature_chns: Sequence[int]) -> GradSimState:
    """All-zero init — the perturbation engine falls back to plain channel
    dropout until real scores arrive (FilterDropout.py:73-75 semantics)."""
    return tuple(jnp.zeros((c,), jnp.float32) for c in feature_chns)


def _get_path(tree: Dict[str, Any], path: Tuple[str, ...]) -> jnp.ndarray:
    node: Any = tree
    for p in path:
        node = node[p]
    return node["kernel"]


def level_kernel_grads(param_grads: Dict[str, Any],
                       paths: Sequence[Tuple[str, ...]] = ENCODER_LEVEL_PATHS
                       ) -> List[jnp.ndarray]:
    """Extract the 5 encoder level kernels' gradients from a param pytree."""
    return [_get_path(param_grads, p) for p in paths]


def update_grad_sim(state: GradSimState, grads_l: Dict[str, Any],
                    grads_u: Dict[str, Any], decay: float = 0.9,
                    paths: Sequence[Tuple[str, ...]] = ENCODER_LEVEL_PATHS
                    ) -> GradSimState:
    """EMA-update per-level per-channel cosine(g_labeled, g_unlabeled)."""
    kl = level_kernel_grads(grads_l, paths)
    ku = level_kernel_grads(grads_u, paths)
    new_state = []
    for old, gl, gu in zip(state, kl, ku):
        # kernel [*k, cin, cout] -> per-out-channel flattened vectors
        a = gl.reshape(-1, gl.shape[-1])
        b = gu.reshape(-1, gu.shape[-1])
        na = jnp.linalg.norm(a, axis=0)
        nb = jnp.linalg.norm(b, axis=0)
        cos = jnp.sum(a * b, axis=0) / (na * nb + 1e-12)
        new_state.append(decay * old + (1 - decay) * cos)
    return tuple(new_state)
