"""BCP mixed-supervision loss (masked dice + masked CE over image/patch regions).

Rebuild of mix_loss at train_ours_2D.py:198-216: a mixed input is supervised by
its "image" label inside mask==1 and its "patch" label inside mask==0, with
swapped image/patch weights for the unlabeled-carrier batch.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from chap_tpu.losses.ce import masked_cross_entropy
from chap_tpu.losses.dice import dice_loss_bcp


def mix_loss(logits: jnp.ndarray, img_l: jnp.ndarray, patch_l: jnp.ndarray,
             mask: jnp.ndarray, num_classes: int, l_weight: float = 1.0,
             u_weight: float = 0.5, unlab: bool = False,
             fused: bool | None = None
             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (loss_image, loss_patch, total) like the reference's
    (loss_image, loss_patch, (dice+ce)/2) triple.

    logits: [B,H,W,C]; img_l/patch_l: integer [B,H,W]; mask: {0,1} [B,H,W]
    where mask==1 selects the surviving "image" region.

    fused=None auto-selects the Pallas fused dice+CE kernel on TPU (one HBM
    pass per region instead of softmax/one-hot/square re-reads).
    """
    import jax as _jax
    if fused is None:
        fused = _jax.default_backend() == "tpu"
    image_weight, patch_weight = (u_weight, l_weight) if unlab else (l_weight, u_weight)
    patch_mask = 1 - mask

    if fused:
        from chap_tpu.ops.fused_losses import fused_masked_dice_ce
        d1, c1 = fused_masked_dice_ce(logits, img_l, mask)
        d2, c2 = fused_masked_dice_ce(logits, patch_l, patch_mask)
        loss_dice1, loss_ce1 = d1 * image_weight, image_weight * c1
        loss_dice2, loss_ce2 = d2 * patch_weight, patch_weight * c2
    else:
        probs = jax.nn.softmax(logits, axis=-1)
        loss_dice1 = dice_loss_bcp(probs, img_l, mask, num_classes) * image_weight
        loss_dice2 = dice_loss_bcp(probs, patch_l, patch_mask, num_classes) * patch_weight
        loss_ce1 = image_weight * masked_cross_entropy(logits, img_l, mask)
        loss_ce2 = patch_weight * masked_cross_entropy(logits, patch_l, patch_mask)

    loss_image = (loss_dice1 + loss_ce1) / 2.0
    loss_patch = (loss_dice2 + loss_ce2) / 2.0
    total = (loss_dice1 + loss_dice2 + loss_ce1 + loss_ce2) / 2.0
    return loss_image, loss_patch, total
