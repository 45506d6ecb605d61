from chap_tpu.utils.ramps import sigmoid_rampup  # noqa: F401
from chap_tpu.utils.launch import init_save_folder  # noqa: F401
