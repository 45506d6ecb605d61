"""Import the reference's torch model files with their unused heavy deps
stubbed (fvcore/thop/detectron2/timm pull CUDA-era packages absent here).
Shared by the weight-copy parity tests and the converter tests."""
import sys
import types

REF = "/root/reference/code"


def install_ref_stubs():
    import torch.nn as _nn
    for name in ["fvcore", "fvcore.nn", "fvcore.nn.weight_init", "thop",
                 "torchsummary", "ptflops", "detectron2", "detectron2.config",
                 "detectron2.layers", "detectron2.utils",
                 "detectron2.utils.registry"]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["fvcore.nn"].weight_init = sys.modules["fvcore.nn.weight_init"]
    wi = sys.modules["fvcore.nn.weight_init"]
    wi.c2_xavier_fill = lambda *a, **k: None
    wi.c2_msra_fill = lambda *a, **k: None
    sys.modules["thop"].clever_format = lambda *a, **k: None
    sys.modules["thop"].profile = lambda *a, **k: (0, 0)
    sys.modules["torchsummary"].summary = lambda *a, **k: None
    sys.modules["detectron2.config"].configurable = lambda f=None, **k: (
        f if f is not None else (lambda g: g))
    sys.modules["detectron2.layers"].Conv2d = _nn.Conv2d

    class _Registry:
        def __init__(self, *a, **k):
            pass

        def register(self, *a, **k):
            return lambda f: f

        def __call__(self, *a, **k):
            return lambda f: f

    sys.modules["detectron2.utils.registry"].Registry = _Registry

    for name in ["timm", "timm.models", "timm.models.layers"]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    tml = sys.modules["timm.models.layers"]
    tml.DropPath = _nn.Identity
    tml.trunc_normal_tf_ = lambda *a, **k: None
    tml.trunc_normal_ = lambda *a, **k: None

    def _to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    tml.to_2tuple = _to_2tuple

    if REF not in sys.path:
        sys.path.insert(0, REF)


def import_ref(module: str):
    """e.g. import_ref('networks.unet') after install_ref_stubs()."""
    import importlib
    install_ref_stubs()
    return importlib.import_module(module)
