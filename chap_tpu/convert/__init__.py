from chap_tpu.convert.torch_import import convert_state_dict  # noqa: F401
