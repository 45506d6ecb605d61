from chap_tpu.metrics.surface import (  # noqa: F401
    dc,
    hd95,
    asd,
    ravd,
    jc,
    calculate_metric_percase,
    calculate_metric_percase_full,
)
from chap_tpu.metrics.dice import soft_dice, hard_dice  # noqa: F401
