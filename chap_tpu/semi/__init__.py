from chap_tpu.semi.bcp import generate_mask  # noqa: F401
from chap_tpu.semi.patchmask import create_mask_v1  # noqa: F401
from chap_tpu.semi.nms import largest_cc_batch, get_masks_with_nms  # noqa: F401
from chap_tpu.semi.gradsim import GradSimState, init_sim_scores, update_grad_sim  # noqa: F401
from chap_tpu.semi.memory_bank import ImageMemoryBank  # noqa: F401
