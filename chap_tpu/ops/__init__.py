from chap_tpu.ops.fused_losses import fused_masked_dice_ce  # noqa: F401
