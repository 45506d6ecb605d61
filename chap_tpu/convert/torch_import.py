"""Torch checkpoint -> Flax variables converter.

The reference trains and distributes plain ``model.state_dict()`` files
(train_ours_2D.py:428-435 saves latest.pth / {model}_best_model.pth; the test
CLIs load them via load_state_dict, test_2D_fully.py:115-117, test_LA.py:44-46).
This module maps those state_dicts onto the Flax parameter trees of the
rebuilt models by NAME, with the tensor-layout rules proven numerically by
tests/test_reference_parity.py (weight-copy forward parity <=3e-4):

  * Conv2d  [O,I,kh,kw]        -> kernel (kh,kw,I,O)
  * Conv3d  [O,I,kd,kh,kw]     -> kernel (kd,kh,kw,I,O)
  * ConvTranspose2d [I,O,kh,kw]-> kernel (kh,kw,I,O), spatially flipped
    (lax.conv_transpose correlates with an un-flipped kernel)
  * ConvTranspose3d            -> same, 3 flipped spatial dims
  * BatchNorm weight/bias      -> params scale/bias;
    running_mean/var           -> batch_stats mean/var
  * Linear  [O,I]              -> kernel (I,O)

Works for any s2d_stem setting: the s2d fast-path modules keep nn.Conv
compatible parameter names/shapes (models/vnet3d.py) and rearrange kernels at
trace time only.

Supported families (the ones whose checkpoints the reference eval CLIs load):
``dualdecoder`` / ``unet`` / ``unetp`` (2D, unet.py:125-292,498-620),
``vnet`` / ``dualdecoder3d`` (vnet.py:127-315), ``unet_3D`` (unet_3D.py:20-100).
"""
from __future__ import annotations

from typing import Any, Dict, List, Mapping, Tuple

import numpy as np

# One rule = (torch key prefix, kind, flax path).
# kinds: conv | deconv | bn | linear ; paths are /-joined, rooted at the
# params (and for bn also batch_stats) collection.
Rule = Tuple[str, str, str]


# --------------------------------------------------------------------------
# rule tables per model family
# --------------------------------------------------------------------------

def _convblock2d(tp: str, fp: str) -> List[Rule]:
    """unet.py ConvBlock (:44-60): Sequential(conv,BN,lrelu,drop,conv,BN,lrelu)."""
    return [
        (f"{tp}.conv_conv.0", "conv", f"{fp}/Conv_0"),
        (f"{tp}.conv_conv.1", "bn", f"{fp}/BatchNorm_0"),
        (f"{tp}.conv_conv.4", "conv", f"{fp}/Conv_1"),
        (f"{tp}.conv_conv.5", "bn", f"{fp}/BatchNorm_1"),
    ]


def _encoder2d(tp: str = "encoder", fp: str = "encoder") -> List[Rule]:
    rules = _convblock2d(f"{tp}.in_conv", f"{fp}/in_conv")
    for i in range(1, 5):
        rules += _convblock2d(f"{tp}.down{i}.maxpool_conv.1",
                              f"{fp}/down{i}/ConvBlock_0")
    return rules


def _decoder2d(tp: str, fp: str, bilinear: bool) -> List[Rule]:
    """unet.py Decoder/Decoder_plus UpBlocks (:76-123): conv1x1 + bilinear up
    (bilinear=1) or ConvTranspose2d up (bilinear=0), then ConvBlock."""
    rules: List[Rule] = []
    for i in range(1, 5):
        if bilinear:
            rules.append((f"{tp}.up{i}.conv1x1", "conv", f"{fp}/up{i}/Conv_0"))
        else:
            rules.append((f"{tp}.up{i}.up", "deconv",
                          f"{fp}/up{i}/ConvTranspose_0"))
        rules += _convblock2d(f"{tp}.up{i}.conv", f"{fp}/up{i}/ConvBlock_0")
    rules.append((f"{tp}.out_conv", "conv", f"{fp}/out_conv"))
    return rules


def dualdecoder_rules(decoder_type: str = "mcnet") -> List[Rule]:
    """unet.py DualDecoder (:245-292): decoder1 bilinear; decoder2 bilinear
    for 'same'/'plus', transpose-conv for 'mcnet'."""
    return (_encoder2d()
            + _decoder2d("decoder1", "decoder1", bilinear=True)
            + _decoder2d("decoder2", "decoder2",
                         bilinear=(decoder_type != "mcnet")))


def unet2d_rules() -> List[Rule]:
    """unet.py UNet (:498-552): encoder + single bilinear decoder."""
    return _encoder2d() + _decoder2d("decoder1", "decoder", bilinear=True)


def _convblock3d(tp: str, fp: str, n_stages: int, has_norm: bool) -> List[Rule]:
    """vnet.py convBlock (:8-35): n_stages x (conv[,norm],relu)."""
    step = 3 if has_norm else 2
    rules: List[Rule] = []
    for i in range(n_stages):
        rules.append((f"{tp}.conv.{step * i}", "conv", f"{fp}/Conv_{i}"))
        if has_norm:
            rules.append((f"{tp}.conv.{step * i + 1}", "bn",
                          f"{fp}/BatchNorm_{i}"))
    return rules


_VNET_ENC_STAGES = (("block_one", 1), ("block_two", 2), ("block_three", 3),
                    ("block_four", 3), ("block_five", 3))
_VNET_DEC_STAGES = (("block_six", 3), ("block_seven", 3), ("block_eight", 2),
                    ("block_nine", 1))


def _vnet_encoder(tp: str, fp: str, has_norm: bool) -> List[Rule]:
    rules: List[Rule] = []
    for name, n in _VNET_ENC_STAGES:
        rules += _convblock3d(f"{tp}.{name}", f"{fp}/{name}", n, has_norm)
    for name in ("block_one_dw", "block_two_dw", "block_three_dw",
                 "block_four_dw"):
        rules.append((f"{tp}.{name}.conv.0", "conv", f"{fp}/{name}/Conv_0"))
        if has_norm:
            rules.append((f"{tp}.{name}.conv.1", "bn",
                          f"{fp}/{name}/BatchNorm_0"))
    return rules


def _vnet_decoder(tp: str, fp: str, has_norm: bool, up_type: int) -> List[Rule]:
    """vnet.py Decoder (:170-223) with Upsampling_function (:97-125): mode 0 =
    ConvTranspose3d at Sequential index 0; modes 1/2 = Upsample (no params) at
    0, Conv3d at 1; norm follows the conv."""
    rules: List[Rule] = []
    for name in ("block_five_up", "block_six_up", "block_seven_up",
                 "block_eight_up"):
        if up_type == 0:
            rules.append((f"{tp}.{name}.conv.0", "deconv",
                          f"{fp}/{name}/ConvTranspose_0"))
            norm_idx = 1
        else:
            rules.append((f"{tp}.{name}.conv.1", "conv", f"{fp}/{name}/Conv_0"))
            norm_idx = 2
        if has_norm:
            rules.append((f"{tp}.{name}.conv.{norm_idx}", "bn",
                          f"{fp}/{name}/BatchNorm_0"))
    for name, n in _VNET_DEC_STAGES:
        rules += _convblock3d(f"{tp}.{name}", f"{fp}/{name}", n, has_norm)
    rules.append((f"{tp}.out_conv", "conv", f"{fp}/out_conv"))
    return rules


def vnet_rules(normalization: str = "batchnorm") -> List[Rule]:
    has_norm = normalization != "none"
    return (_vnet_encoder("encoder", "encoder", has_norm)
            + _vnet_decoder("decoder", "decoder", has_norm, up_type=0))


def dualdecoder3d_rules(normalization: str = "batchnorm") -> List[Rule]:
    """vnet.py DualDecoder3d (:225-238): decoder1 trilinear, decoder2 deconv."""
    has_norm = normalization != "none"
    return (_vnet_encoder("encoder", "encoder", has_norm)
            + _vnet_decoder("decoder1", "decoder1", has_norm, up_type=1)
            + _vnet_decoder("decoder2", "decoder2", has_norm, up_type=0))


def unet3d_rules() -> List[Rule]:
    """unet_3D.py (:20-100): UnetConv3 = conv1/conv2 Sequentials whose norms
    are InstanceNorm3d (affine=False -> no torch params; the rebuild matches,
    see tests/test_reference_parity.py unet3d)."""
    rules: List[Rule] = []
    for name in ("conv1", "conv2", "conv3", "conv4", "center"):
        rules.append((f"{name}.conv1.0", "conv", f"{name}/Conv_0"))
        rules.append((f"{name}.conv2.0", "conv", f"{name}/Conv_1"))
    for name in ("up_concat4", "up_concat3", "up_concat2", "up_concat1"):
        rules.append((f"{name}.conv.conv1.0", "conv",
                      f"{name}/UnetConv3_0/Conv_0"))
        rules.append((f"{name}.conv.conv2.0", "conv",
                      f"{name}/UnetConv3_0/Conv_1"))
    rules.append(("final", "conv", "final"))
    return rules


_FAMILIES = {
    "dualdecoder": dualdecoder_rules,
    "unet": unet2d_rules,
    "vnet": vnet_rules,
    "dualdecoder3d": dualdecoder3d_rules,
    "unet_3D": unet3d_rules,
}


# --------------------------------------------------------------------------
# tensor layout conversion + tree plumbing
# --------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor without importing torch


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    if w.ndim == 4:                      # [O,I,kh,kw]
        return np.transpose(w, (2, 3, 1, 0))
    if w.ndim == 5:                      # [O,I,kd,kh,kw]
        return np.transpose(w, (2, 3, 4, 1, 0))
    raise ValueError(f"conv weight rank {w.ndim}")


def _deconv_kernel(w: np.ndarray) -> np.ndarray:
    if w.ndim == 4:                      # [I,O,kh,kw]
        return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])
    if w.ndim == 5:                      # [I,O,kd,kh,kw]
        return np.ascontiguousarray(
            np.transpose(w, (2, 3, 4, 0, 1))[::-1, ::-1, ::-1])
    raise ValueError(f"deconv weight rank {w.ndim}")


def _get(tree: Dict[str, Any], path: str) -> Dict[str, Any]:
    node = tree
    for part in path.split("/"):
        if part not in node:
            raise KeyError(f"flax path {path!r}: {part!r} not in "
                           f"{sorted(node.keys())}")
        node = node[part]
    return node


def _assign(leaf: Dict[str, Any], name: str, value: np.ndarray,
            where: str) -> None:
    if name not in leaf:
        raise KeyError(f"{where}: leaf has no {name!r} ({sorted(leaf)})")
    want = np.shape(leaf[name])
    if tuple(want) != value.shape:
        raise ValueError(f"{where}/{name}: shape {value.shape} != template "
                         f"{tuple(want)}")
    leaf[name] = value.astype(np.asarray(leaf[name]).dtype)


def apply_rules(rules: List[Rule], state_dict: Mapping[str, Any],
                params: Dict[str, Any], batch_stats: Dict[str, Any]) -> List[str]:
    """Fill params/batch_stats (mutated in place) from the state_dict.
    Returns the list of consumed torch keys."""
    consumed: List[str] = []
    for tp, kind, fp in rules:
        if kind in ("conv", "deconv"):
            w = _np(state_dict[f"{tp}.weight"])
            kernel = _conv_kernel(w) if kind == "conv" else _deconv_kernel(w)
            _assign(_get(params, fp), "kernel", kernel, fp)
            consumed.append(f"{tp}.weight")
            if f"{tp}.bias" in state_dict:
                _assign(_get(params, fp), "bias",
                        _np(state_dict[f"{tp}.bias"]), fp)
                consumed.append(f"{tp}.bias")
        elif kind == "bn":
            leaf_p = _get(params, fp)
            _assign(leaf_p, "scale", _np(state_dict[f"{tp}.weight"]), fp)
            _assign(leaf_p, "bias", _np(state_dict[f"{tp}.bias"]), fp)
            leaf_s = _get(batch_stats, fp)
            _assign(leaf_s, "mean", _np(state_dict[f"{tp}.running_mean"]), fp)
            _assign(leaf_s, "var", _np(state_dict[f"{tp}.running_var"]), fp)
            consumed += [f"{tp}.{s}" for s in
                         ("weight", "bias", "running_mean", "running_var")]
        elif kind == "linear":
            w = _np(state_dict[f"{tp}.weight"])
            _assign(_get(params, fp), "kernel", np.transpose(w), fp)
            consumed.append(f"{tp}.weight")
            if f"{tp}.bias" in state_dict:
                _assign(_get(params, fp), "bias",
                        _np(state_dict[f"{tp}.bias"]), fp)
                consumed.append(f"{tp}.bias")
        else:
            raise ValueError(f"unknown rule kind {kind!r}")
    return consumed


def _to_mutable(tree):
    import jax
    try:
        import flax
        tree = flax.core.unfreeze(tree)
    except Exception:
        pass
    return jax.tree.map(np.asarray, tree)


def convert_state_dict(model_name: str, state_dict: Mapping[str, Any],
                       variables: Mapping[str, Any], *,
                       decoder_type: str = "mcnet",
                       normalization: str = "batchnorm",
                       strict: bool = True) -> Dict[str, Any]:
    """Convert a torch ``state_dict`` into the Flax ``variables`` template
    (as returned by ``model.init``). Returns a new variables dict; raises on
    any shape mismatch, and with ``strict`` also on leftover torch keys
    (``num_batches_tracked`` counters are always ignored)."""
    if model_name not in _FAMILIES:
        raise ValueError(f"no converter for model {model_name!r}; "
                         f"available: {sorted(_FAMILIES)}")
    if model_name == "dualdecoder":
        rules = dualdecoder_rules(decoder_type)
    elif model_name in ("vnet", "dualdecoder3d"):
        rules = _FAMILIES[model_name](normalization)
    else:
        rules = _FAMILIES[model_name]()

    params = _to_mutable(variables["params"])
    batch_stats = _to_mutable(variables.get("batch_stats", {}))
    consumed = set(apply_rules(rules, state_dict, params, batch_stats))

    leftovers = [k for k in state_dict
                 if k not in consumed and not k.endswith("num_batches_tracked")]
    if leftovers and strict:
        raise ValueError(f"{len(leftovers)} torch keys not consumed, e.g. "
                         f"{leftovers[:8]}")

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out
