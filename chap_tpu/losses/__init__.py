from chap_tpu.losses.dice import (  # noqa: F401
    dice_loss,
    dice_loss_bcp,
    soft_dice_loss_masked,
    one_hot,
)
from chap_tpu.losses.ce import (  # noqa: F401
    cross_entropy,
    cross_entropy_per_pixel,
    masked_cross_entropy,
    mse_loss,
    mse_loss_noreduction,
)
from chap_tpu.losses.mix import mix_loss  # noqa: F401
from chap_tpu.losses.vat import vat_loss_2d, l2_normalize_batch  # noqa: F401
from chap_tpu.losses.worst_case import (  # noqa: F401
    WorstCaseEstimationLoss,
    worst_case_estimation_loss,
)
