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


def unetp_rules() -> List[Rule]:
    """unet.py UNet_plus (:554-620): encoder + additive-skip Decoder_plus.
    UpBlock_plus keeps UpBlock's parameterized layout — conv1x1 / up / conv
    (unet.py:101-123; only the fusion op differs) — so the UpBlock rule
    emitter transfers directly. The projector is a parameterless AvgPool.
    Flax-side names are the compact module's auto names (UNetPlus is
    @nn.compact: Encoder_0 / DecoderPlus_0)."""
    return (_encoder2d("encoder", "Encoder_0")
            + _decoder2d("decoder", "DecoderPlus_0", bilinear=True))


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


def vnet_ds_rules(normalization: str = "batchnorm") -> List[Rule]:
    """Deep-supervised VNet: Encoder + Decoder_ds (vnet.py:241-300, same
    parameterized layout as Decoder) + SideConv heads (:317-336). The
    reference ships no composed model; keys assume the natural composition
    attributes encoder/decoder/side (matching chap VNetDS)."""
    has_norm = normalization != "none"
    rules = (_vnet_encoder("encoder", "encoder", has_norm)
             + _vnet_decoder("decoder", "decoder", has_norm, up_type=0))
    for n in ("side5", "side4", "side3", "side2"):
        rules.append((f"side.{n}", "conv", f"side/{n}"))
    return rules


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


def _swin_block_rules(tp: str, fp: str) -> List[Rule]:
    """SwinTransformerBlock (swin...sys.py:169-307) -> chap SwinBlock."""
    return [
        (f"{tp}.norm1", "ln", f"{fp}/LayerNorm_0"),
        (f"{tp}.attn.qkv", "linear", f"{fp}/WindowAttention_0/qkv"),
        (f"{tp}.attn.proj", "linear", f"{fp}/WindowAttention_0/proj"),
        (f"{tp}.attn.relative_position_bias_table", "raw",
         f"{fp}/WindowAttention_0/relative_position_bias_table"),
        (f"{tp}.norm2", "ln", f"{fp}/LayerNorm_1"),
        (f"{tp}.mlp.fc1", "linear", f"{fp}/Mlp_0/Dense_0"),
        (f"{tp}.mlp.fc2", "linear", f"{fp}/Mlp_0/Dense_1"),
    ]


def swinunet_rules(depths=(2, 2, 2, 2)) -> List[Rule]:
    """Full SwinTransformerSys state_dict (swin...sys.py:599-817) -> chap
    SwinUNet. Key correspondence: layers.{i} = enc{i}_blk*/merge{i};
    layers_up.0 = expand0; layers_up.{j>=1} = dec{j-1}_blk* (+ expand{j} from
    its .upsample); concat_back_dim.{j} = skip_reduce{j-1}; norm/norm_up =
    bottleneck/decoder-final LayerNorms; up = the FinalPatchExpand head."""
    n = len(depths)
    rules: List[Rule] = [
        ("patch_embed.proj", "conv", "patch_embed"),
        ("patch_embed.norm", "ln", "LayerNorm_0"),
        ("norm", "ln", "norm"),
        ("norm_up", "ln", "norm_up"),
        ("up.expand", "linear", "up_x4/Dense_0"),
        ("up.norm", "ln", "up_x4/LayerNorm_0"),
        ("output", "conv", "output"),
    ]
    for i in range(n):
        for d in range(depths[i]):
            rules += _swin_block_rules(f"layers.{i}.blocks.{d}",
                                       f"enc{i}_blk{d}")
        if i < n - 1:
            rules.append((f"layers.{i}.downsample.norm", "ln",
                          f"merge{i}/LayerNorm_0"))
            rules.append((f"layers.{i}.downsample.reduction", "linear",
                          f"merge{i}/Dense_0"))
    rules.append(("layers_up.0.expand", "linear", "expand0/Dense_0"))
    rules.append(("layers_up.0.norm", "ln", "expand0/LayerNorm_0"))
    for j in range(1, n):
        for d in range(depths[n - 1 - j]):
            rules += _swin_block_rules(f"layers_up.{j}.blocks.{d}",
                                       f"dec{j - 1}_blk{d}")
        rules.append((f"concat_back_dim.{j}", "linear", f"skip_reduce{j - 1}"))
        if j < n - 1:
            rules.append((f"layers_up.{j}.upsample.expand", "linear",
                          f"expand{j}/Dense_0"))
            rules.append((f"layers_up.{j}.upsample.norm", "ln",
                          f"expand{j}/LayerNorm_0"))
    return rules


_B0_STAGE_BLOCKS = (1, 2, 2, 3, 3, 4, 1)    # lukemelas b0 repeats


def efficientnet_b0_rules() -> List[Rule]:
    """lukemelas efficientnet_pytorch b0 state_dict -> the chap EffiUNet
    ENCODER subtree (models/efficientunet.py). Torch naming: _conv_stem/_bn0
    stem, _blocks.{k} MBConvs with _expand_conv/_bn0 (absent when
    expand_ratio==1), _depthwise_conv/_bn1, _se_reduce/_se_expand,
    _project_conv/_bn2; the classifier head (_conv_head/_bn1/_fc) has no
    pyramid analog (the reference encoder deletes _fc too,
    efficient_encoder.py:78,105-109)."""
    rules: List[Rule] = [
        ("_conv_stem", "conv", "stem"),
        ("_bn0", "bn", "BatchNorm_0"),
    ]
    k = 0
    for si, blocks in enumerate(_B0_STAGE_BLOCKS):
        for b in range(blocks):
            tp = f"_blocks.{k}"
            fp = f"stage{si}_block{b}"
            expand = si > 0
            ci = 0
            if expand:
                rules.append((f"{tp}._expand_conv", "conv", f"{fp}/Conv_{ci}"))
                rules.append((f"{tp}._bn0", "bn", f"{fp}/BatchNorm_{ci}"))
                ci += 1
            rules.append((f"{tp}._depthwise_conv", "conv", f"{fp}/Conv_{ci}"))
            rules.append((f"{tp}._bn1", "bn", f"{fp}/BatchNorm_{ci}"))
            rules.append((f"{tp}._se_reduce", "conv",
                          f"{fp}/SqueezeExcite_0/Conv_0"))
            rules.append((f"{tp}._se_expand", "conv",
                          f"{fp}/SqueezeExcite_0/Conv_1"))
            rules.append((f"{tp}._project_conv", "conv", f"{fp}/Conv_{ci + 1}"))
            rules.append((f"{tp}._bn2", "bn", f"{fp}/BatchNorm_{ci + 1}"))
            k += 1
    return rules


def convert_efficientnet_pretrained(state_dict: Mapping[str, Any],
                                    variables: Mapping[str, Any],
                                    in_chns: int = 1) -> Dict[str, Any]:
    """Ingest a pretrained EfficientNet-b0 checkpoint into an EffiUNet's
    encoder (decoder keeps fresh init — it has no ImageNet analog). Implements
    patch_first_conv for non-RGB inputs (efficient_encoder.py:36-67):
    in_chns 1 sums the stem kernel over the input-channel axis, in_chns 2
    keeps the first two channels scaled by 3/2."""
    sd = dict(state_dict)
    w = _np(sd["_conv_stem.weight"])            # [O, 3, kh, kw]
    if in_chns == 1:
        sd["_conv_stem.weight"] = w.sum(1, keepdims=True)
    elif in_chns == 2:
        sd["_conv_stem.weight"] = w[:, :2] * (3.0 / 2.0)
    elif in_chns != 3:
        raise ValueError("patch_first_conv supports in_chns in (1, 2, 3); "
                         f"got {in_chns} (the reference re-initializes >3, "
                         "which equals training from scratch)")

    params = _to_mutable(variables["params"])
    batch_stats = _to_mutable(variables.get("batch_stats", {}))
    enc_p = params["encoder"] if "encoder" in params else params
    enc_s = batch_stats.get("encoder", batch_stats)
    apply_rules(efficientnet_b0_rules(), sd, enc_p, enc_s)
    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def swin_encoder_surgery(state_dict: Mapping[str, Any],
                         num_layers: int = 4) -> Dict[str, Any]:
    """The reference's load_from checkpoint surgery
    (vision_transformer.py:71-87): every encoder key layers.{i}... also
    initializes the mirrored decoder stage layers_up.{num_layers-1-i}...
    (shape-mismatched entries are dropped later by the lenient converter,
    exactly like the reference's strict=False load)."""
    full = dict(state_dict)
    for k, v in state_dict.items():
        if k.startswith("layers."):
            mirrored = num_layers - 1 - int(k[7])
            full[f"layers_up.{mirrored}" + k[8:]] = v
    return full


_FAMILIES = {
    "dualdecoder": dualdecoder_rules,
    "unet": unet2d_rules,
    "unetp": unetp_rules,
    "vnet": vnet_rules,
    "vnet_ds": vnet_ds_rules,
    "dualdecoder3d": dualdecoder3d_rules,
    "unet_3D": unet3d_rules,
    "swinunet": swinunet_rules,
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
                params: Dict[str, Any], batch_stats: Dict[str, Any],
                lenient: bool = False) -> List[str]:
    """Fill params/batch_stats (mutated in place) from the state_dict.
    Returns the list of consumed torch keys. ``lenient`` skips rules whose
    torch keys are absent or whose shapes mismatch (torch load_state_dict
    strict=False semantics, used by the pretrained-encoder surgery)."""
    consumed: List[str] = []
    for tp, kind, fp in rules:
        if lenient:
            probe = tp if kind == "raw" else f"{tp}.weight"
            if probe not in state_dict:
                continue
            try:
                consumed += apply_rules([(tp, kind, fp)], state_dict, params,
                                        batch_stats)
            except (KeyError, ValueError):
                pass
            continue
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
        elif kind == "ln":
            leaf = _get(params, fp)
            _assign(leaf, "scale", _np(state_dict[f"{tp}.weight"]), fp)
            _assign(leaf, "bias", _np(state_dict[f"{tp}.bias"]), fp)
            consumed += [f"{tp}.weight", f"{tp}.bias"]
        elif kind == "raw":
            parent, _, leaf_name = fp.rpartition("/")
            _assign(_get(params, parent), leaf_name, _np(state_dict[tp]), fp)
            consumed.append(tp)
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

    _BUFFERS = ("num_batches_tracked", "relative_position_index", "attn_mask")
    # SwinTransformerSys constructs its projector even at projection_dim=0
    # (zero-element tensors, swin...sys.py:728-733) — nothing to ingest.
    _IGNORE_PREFIXES = ("projector.",) if model_name == "swinunet" else ()
    leftovers = [k for k in state_dict
                 if k not in consumed and not k.endswith(_BUFFERS)
                 and not k.startswith(_IGNORE_PREFIXES)]
    if leftovers and strict:
        raise ValueError(f"{len(leftovers)} torch keys not consumed, e.g. "
                         f"{leftovers[:8]}")

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def convert_swin_pretrained(state_dict: Mapping[str, Any],
                            variables: Mapping[str, Any],
                            depths=(2, 2, 2, 2)) -> Dict[str, Any]:
    """Ingest an OFFICIAL ImageNet-pretrained Swin encoder checkpoint into a
    chap SwinUNet — the reference's load_from path (vision_transformer.py:
    55-90): unwrap {'model': ...}, mirror encoder layers into the decoder
    (:75-80 surgery), then lenient-load (strict=False, :83-87) so keys absent
    from the checkpoint (expands, skip reduces, output head) keep their fresh
    init and shape-mismatched mirrors are dropped."""
    if "model" in state_dict:
        state_dict = state_dict["model"]
    full = swin_encoder_surgery(state_dict, num_layers=len(depths))
    params = _to_mutable(variables["params"])
    batch_stats = _to_mutable(variables.get("batch_stats", {}))
    consumed = apply_rules(swinunet_rules(depths), full, params, batch_stats,
                           lenient=True)
    if not any(k.startswith("layers.") for k in consumed):
        raise ValueError("no encoder weights matched — is this a Swin "
                         "checkpoint?")
    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out
