from chap_tpu.eval.eval2d import test_single_volume, evaluate_volumes  # noqa: F401
from chap_tpu.eval.sliding_window import test_single_case, test_all_case  # noqa: F401
