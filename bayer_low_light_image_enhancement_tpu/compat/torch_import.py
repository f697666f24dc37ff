"""PyTorch ``.pth`` checkpoint import for output-parity verification.

The reference saves ``{'epoch', 'state_dict', 'optimizer'}`` dicts
(``/root/reference/train.py:168-183``) and strips DataParallel ``module.``
prefixes at load (``/root/reference/test.py:90-91``). This module maps those
state_dicts onto our flax parameter pytree:

* torch Conv2d weight (O, I/g, kh, kw)      -> HWIO kernel (kh, kw, I/g, O)
* torch ConvTranspose2d k=2 (I, O, 2, 2)    -> our Upsample2x 1x1 kernel
  (1, 1, I, 4O) with column index o*4 + di*2 + dj (see models/common.py)
* LayerNorm weight/bias                      -> direct
* attention temperature (heads, 1, 1)        -> (heads,)

Name scheme follows the canonical reference module tree (embedding,
conv_tran1..7 {conv, Transformer{norm1, attn{qkv, qkv_dwconv, project_out,
temperature}, ffn{pointwise1, depthwise, pointwise2}}, channel_reduce,
Conv_out}, down1..3.body.0, up1..3, channel_reduce1..3, conv_out), tolerating
the root-copy spelling differences (attn.proj, Sequential indices, nested
norm wrappers).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth checkpoint into a flat {name: np.ndarray} dict.

    Accepts either a bare state_dict or the reference's wrapper dict; strips
    ``module.`` prefixes. Requires torch (CPU build is enough).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    state = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in state.items():
        k = k[len("module.") :] if k.startswith("module.") else k
        out[k] = v.detach().cpu().numpy()
    return out


def conv_w(w: np.ndarray) -> np.ndarray:
    """(O, I/g, kh, kw) -> (kh, kw, I/g, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def convT2x2_to_upsample(w: np.ndarray) -> np.ndarray:
    """(I, O, 2, 2) transposed kernel -> (1, 1, I, 4O) pixel-shuffle kernel."""
    i, o, kh, kw = w.shape
    if (kh, kw) != (2, 2):
        raise ValueError(f"expected 2x2 transposed kernel, got {w.shape}")
    # Row-major (o, di, dj) flatten == column index o*4 + di*2 + dj.
    return w.reshape(1, 1, i, o * 4)


def _get(sd: Mapping[str, np.ndarray], *names: str) -> np.ndarray:
    for n in names:
        if n in sd:
            return sd[n]
    raise KeyError(f"none of {names} in checkpoint (have e.g. {list(sd)[:8]}...)")


def _conv(sd, base: str, bias: bool = True) -> Dict[str, np.ndarray]:
    p = {"kernel": conv_w(_get(sd, f"{base}.weight"))}
    if bias and f"{base}.bias" in sd:
        p["bias"] = sd[f"{base}.bias"]
    return p


def _layernorm(sd, base: str) -> Dict[str, np.ndarray]:
    w = _get(sd, f"{base}.weight", f"{base}.body.weight", f"{base}.norm.weight")
    p = {"weight": w}
    for cand in (f"{base}.bias", f"{base}.body.bias", f"{base}.norm.bias"):
        if cand in sd:
            p["bias"] = sd[cand]
            break
    return p


def _attention(sd, base: str) -> Dict[str, Any]:
    # Root copy spells qkv as a Sequential (qkv.0 / qkv.1) and the projection
    # as `proj`; WFB spells them qkv / qkv_dwconv / project_out.
    if f"{base}.qkv.0.weight" in sd:
        qkv, dw = f"{base}.qkv.0", f"{base}.qkv.1"
    else:
        qkv, dw = f"{base}.qkv", f"{base}.qkv_dwconv"
    proj = f"{base}.proj" if f"{base}.proj.weight" in sd else f"{base}.project_out"
    out = {
        "qkv": _conv(sd, qkv),
        "qkv_dwconv": _conv(sd, dw),
        "project_out": _conv(sd, proj),
    }
    if f"{base}.log_temperature" in sd:
        # BayerTORGBColorMultiLvl.py:331 stores log(T), zero-init.
        out["log_temperature"] = sd[f"{base}.log_temperature"].reshape(-1)
    else:
        out["temperature"] = _get(sd, f"{base}.temperature", f"{base}.scale").reshape(-1)
    return out


def _ffn(sd, base: str) -> Dict[str, Any]:
    if f"{base}.pointwise1.weight" in sd:
        names = ("pointwise1", "depthwise", "pointwise2")
        return {n: _conv(sd, f"{base}.{n}") for n in names}
    # Root ConvFFN is a Sequential: net.0 (1x1), net.1 (dw), net.3 (1x1).
    return {
        "pointwise1": _conv(sd, f"{base}.net.0"),
        "depthwise": _conv(sd, f"{base}.net.1"),
        "pointwise2": _conv(sd, f"{base}.net.3"),
    }


def _transformer_block(sd, base: str) -> Dict[str, Any]:
    return {
        "norm1": _layernorm(sd, f"{base}.norm1"),
        "attn": _attention(sd, f"{base}.attn"),
        "norm2": _layernorm(sd, f"{base}.norm2"),
        "ffn": _ffn(sd, f"{base}.ffn"),
    }


def _conv_transformer(sd, base: str) -> Dict[str, Any]:
    tr = f"{base}.Transformer" if f"{base}.Transformer.attn.qkv.weight" in sd or any(
        k.startswith(f"{base}.Transformer.") for k in sd
    ) else f"{base}.transformer"
    out = f"{base}.Conv_out" if f"{base}.Conv_out.weight" in sd else f"{base}.out.0"
    reduce = f"{base}.channel_reduce" if f"{base}.channel_reduce.weight" in sd else f"{base}.reduce"
    return {
        "conv": _conv(sd, f"{base}.conv"),
        "transformer": _transformer_block(sd, tr),
        "channel_reduce": _conv(sd, reduce),
        "conv_out": _conv(sd, out),
    }


def _upsample(sd, base: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": convT2x2_to_upsample(_get(sd, f"{base}.weight")),
        "bias": _get(sd, f"{base}.bias"),
    }


def _downsample(sd, base: str) -> Dict[str, Any]:
    conv = f"{base}.body.0" if f"{base}.body.0.weight" in sd else f"{base}.net.0"
    return {"conv": _conv(sd, conv, bias=False)}


def import_rawformer_state_dict(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Map a canonical RawFormer torch state_dict to our flax params tree."""
    params: Dict[str, Any] = {"embedding": _conv(sd, "embedding")}
    for k in range(1, 8):
        params[f"conv_tran{k}"] = _conv_transformer(sd, f"conv_tran{k}")
    for j in range(1, 4):
        params[f"down{j}"] = _downsample(sd, f"down{j}")
        params[f"up{j}"] = _upsample(sd, f"up{j}")
        params[f"channel_reduce{j}"] = _conv(sd, f"channel_reduce{j}")
    params["conv_out"] = _conv(sd, "conv_out")
    return {"params": params}


# ---------------------------------------------------------------------------
# Variant families. Reference checkpoints load with the same module.-strip
# (``/root/reference/test.py:88-93``); the trees below follow
# ``RawFomer_WFB_FFAB/model.py:437-508`` (WFB) and
# ``FrequencyawareLumaChromaAttentionRAWFormer.py:257-370`` (FLCA).
# ---------------------------------------------------------------------------


def _dense(sd, base: str) -> Dict[str, np.ndarray]:
    """torch nn.Linear (O, I) -> flax Dense kernel (I, O)."""
    p = {"kernel": np.transpose(_get(sd, f"{base}.weight"), (1, 0))}
    if f"{base}.bias" in sd:
        p["bias"] = sd[f"{base}.bias"]
    return p


def _mamba(sd, base: str) -> Dict[str, Any]:
    """mamba_ssm.Mamba -> ops.ssm.MambaBlock.

    in/x/dt/out projections are Linears (transposed); the causal conv1d
    kernel goes (D_inner, 1, d_conv) -> (d_conv, 1, D_inner).
    """
    return {
        "in_proj": _dense(sd, f"{base}.in_proj"),
        "conv1d_kernel": np.transpose(_get(sd, f"{base}.conv1d.weight"), (2, 1, 0)),
        "conv1d_bias": _get(sd, f"{base}.conv1d.bias"),
        "x_proj": _dense(sd, f"{base}.x_proj"),
        "dt_proj": _dense(sd, f"{base}.dt_proj"),
        "A_log": _get(sd, f"{base}.A_log"),
        "D": _get(sd, f"{base}.D"),
        "out_proj": _dense(sd, f"{base}.out_proj"),
    }


def _feb(sd, base: str) -> Dict[str, Any]:
    """blocks.FEB (``blocks.py:11-39``): fpre + two conv/lrelu/conv stacks."""
    return {
        "fpre": _conv(sd, f"{base}.fpre"),
        "process1_0": _conv(sd, f"{base}.process1.0"),
        "process1_1": _conv(sd, f"{base}.process1.2"),
        "process2_0": _conv(sd, f"{base}.process2.0"),
        "process2_1": _conv(sd, f"{base}.process2.2"),
    }


def _process_block(sd, base: str) -> Dict[str, Any]:
    return {
        "frequency_process": _feb(sd, f"{base}.frequency_process"),
        "cat": _conv(sd, f"{base}.cat"),
    }


def _ffab(sd, base: str) -> Dict[str, Any]:
    """blocks.FFAB (``blocks.py:60-92``): Sequential indices -> named ops."""
    return {
        "conv0_pre": _conv(sd, f"{base}.conv0.0"),
        "conv0": _process_block(sd, f"{base}.conv0.1"),
        "conv1": _process_block(sd, f"{base}.conv1"),
        "conv2": _process_block(sd, f"{base}.conv2"),
        "conv3": _process_block(sd, f"{base}.conv3"),
        "conv4_pb": _process_block(sd, f"{base}.conv4.0"),
        "conv4_reduce": _conv(sd, f"{base}.conv4.1"),
        "conv5_pb": _process_block(sd, f"{base}.conv5.0"),
        "conv5_reduce": _conv(sd, f"{base}.conv5.1"),
        "convout_pb": _process_block(sd, f"{base}.convout.0"),
        "convout_reduce": _conv(sd, f"{base}.convout.1"),
    }


def _conv_bn(sd, base: str):
    """Conv2d_BN (``model.py:17-40``) -> (params, batch_stats)."""
    params = {
        "c": _conv(sd, f"{base}.c", bias=False),
        "bn": {"scale": _get(sd, f"{base}.bn.weight"), "bias": _get(sd, f"{base}.bn.bias")},
    }
    stats = {
        "bn": {
            "mean": _get(sd, f"{base}.bn.running_mean"),
            "var": _get(sd, f"{base}.bn.running_var"),
        }
    }
    return params, stats


def _gated_ffn(sd, base: str):
    """WFB FeedForward (``model.py:42-65``) -> (params, batch_stats)."""
    rep1, rep1_s = _conv_bn(sd, f"{base}.rep_conv1")
    rep2, rep2_s = _conv_bn(sd, f"{base}.rep_conv2")
    params = {
        "project_in": _conv(sd, f"{base}.project_in"),
        "rep_conv1": rep1,
        "rep_conv2": rep2,
        "dwconv": _conv(sd, f"{base}.dwconv"),
        "project_out": _conv(sd, f"{base}.project_out"),
    }
    return params, {"rep_conv1": rep1_s, "rep_conv2": rep2_s}


def _wm(sd, base: str) -> Dict[str, Any]:
    """WM (``model.py:138-172``). model2 (expand=9) is dead in the reference
    forward and intentionally not imported."""
    return {
        "convb_0": _conv(sd, f"{base}.convb.0"),
        "convb_1": _conv(sd, f"{base}.convb.2"),
        "ln": {"scale": _get(sd, f"{base}.ln.weight"), "bias": _get(sd, f"{base}.ln.bias")},
        "model1": _mamba(sd, f"{base}.model1"),
        "smooth": _conv(sd, f"{base}.smooth"),
    }


def _wmb(sd, base: str):
    """WMB (``model.py:203-245``) -> (params, batch_stats)."""
    ffn, ffn_stats = _gated_ffn(sd, f"{base}.ffn")
    params = {
        "norm1": _layernorm(sd, f"{base}.norm1"),
        "illu": {
            "conv1": _conv(sd, f"{base}.illu.conv1"),
            "depth_conv": _conv(sd, f"{base}.illu.depth_conv"),
            "conv2": _conv(sd, f"{base}.illu.conv2"),
        },
        "ffab": _ffab(sd, f"{base}.ffab"),
        "mb": _wm(sd, f"{base}.mb"),
        "norm2": _layernorm(sd, f"{base}.norm2"),
        "ffn": ffn,
    }
    return params, {"ffn": ffn_stats}


def import_wfb_state_dict(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Map a RawFomer_WFB_FFAB checkpoint to RawFormerWFB variables
    (params + batch_stats for the re-param conv BNs)."""
    params: Dict[str, Any] = {"embedding": _conv(sd, "embedding")}
    stats: Dict[str, Any] = {}
    for k in range(1, 8):
        base = f"conv_tran{k}"
        wmb, wmb_stats = _wmb(sd, f"{base}.Transformer")
        params[base] = {
            "conv": _conv(sd, f"{base}.conv"),
            "Transformer": wmb,
            "channel_reduce": _conv(sd, f"{base}.channel_reduce"),
            "conv_out": _conv(sd, f"{base}.Conv_out"),
        }
        stats[base] = {"Transformer": wmb_stats}
    for j in range(1, 4):
        params[f"down{j}"] = _downsample(sd, f"down{j}")
        params[f"up{j}"] = _upsample(sd, f"up{j}")
        params[f"channel_reduce{j}"] = _conv(sd, f"channel_reduce{j}")
    params["conv_out"] = _conv(sd, "conv_out")
    return {"params": params, "batch_stats": stats}


def _flca(sd, base: str) -> Dict[str, Any]:
    """FLCA (``FrequencyawareLumaChroma...py:103-134``): three bias-free
    guidance convs, SE (Sequential indices 1/3), three scalar balances."""
    return {
        "low_attn": _conv(sd, f"{base}.low_attn.0", bias=False),
        "high_attn": _conv(sd, f"{base}.high_attn.0", bias=False),
        "chroma_attn": _conv(sd, f"{base}.chroma_attn.0", bias=False),
        "se": {"fc1": _conv(sd, f"{base}.se.1"), "fc2": _conv(sd, f"{base}.se.3")},
        "alpha": _get(sd, f"{base}.alpha"),
        "beta": _get(sd, f"{base}.beta"),
        "gamma": _get(sd, f"{base}.gamma"),
    }


def import_flca_state_dict(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Map a FLCA-RawFormer checkpoint
    (``FrequencyawareLumaChromaAttentionRAWFormer.py:284-370``) to
    FLCARawFormer variables."""
    params: Dict[str, Any] = {"embedding": _conv(sd, "embedding")}
    for k in range(1, 8):
        base = f"conv_tran{k}"
        params[base] = {
            "FLCA": _flca(sd, f"{base}.FLCA"),
            "Transformer": _transformer_block(sd, f"{base}.Transformer"),
            "channel_reduce": _conv(sd, f"{base}.channel_reduce"),
            "Conv_out": _conv(sd, f"{base}.Conv_out"),
        }
    for j in range(1, 4):
        params[f"down{j}"] = _downsample(sd, f"down{j}")
        params[f"up{j}"] = _upsample(sd, f"up{j}")
        params[f"channel_reduce{j}"] = _conv(sd, f"channel_reduce{j}")
    params["conv_out"] = _conv(sd, "conv_out")
    return {"params": params}


def _se(sd, base: str) -> Dict[str, Any]:
    """SE Sequential: [AdaptiveAvgPool2d, conv, ReLU, conv, Sigmoid]."""
    return {"fc1": _conv(sd, f"{base}.1"), "fc2": _conv(sd, f"{base}.3")}


def _enhanced_flca(sd, base: str, pyramid: bool) -> Dict[str, Any]:
    """EnhancedFLCA (``TrueColorRawFormer.py:191-257``; pyramid + res_proj
    variant ``BayerTORGBColorMultiLvl.py:182-285``)."""
    p = {
        "color_attention": _conv(sd, f"{base}.color_attention.0"),
        "low_attn": _conv(sd, f"{base}.low_attn.0"),
        "high_attn": _conv(sd, f"{base}.high_attn.0"),
        "se": _se(sd, f"{base}.se"),
    }
    if pyramid:
        p["res_proj_0"] = _conv(sd, f"{base}.res_proj.0")
        p["res_proj_1"] = _conv(sd, f"{base}.res_proj.2")
    return p


def _bayer_processor(sd, base: str) -> Dict[str, Any]:
    """EnhancedBayerProcessor (``TrueColorRawFormer.py:79-142``;
    BayerTORGB variant ``BayerTORGBColorMultiLvl.py:72-134`` — identical
    parameter names, different wiring handled by the flax module)."""
    return {
        "wb_gains": _get(sd, f"{base}.wb_gains"),
        "color_matrix": _get(sd, f"{base}.color_matrix"),
        "demosaic_refine_0": _conv(sd, f"{base}.demosaic_refine.0"),
        "demosaic_refine_1": _conv(sd, f"{base}.demosaic_refine.2"),
        "chroma_extractor_0": _conv(sd, f"{base}.chroma_extractor.0"),
        "chroma_extractor_1": _conv(sd, f"{base}.chroma_extractor.2"),
    }


def _color_correction(sd, base: str) -> Dict[str, Any]:
    """CameraAwareColorCorrection (``TrueColorRawFormer.py:148-185``;
    softplus-gamma variant stores ``gamma_param``,
    ``BayerTORGBColorMultiLvl.py:144``)."""
    gamma = _get(sd, f"{base}.gamma", f"{base}.gamma_param")
    return {
        "gamma": np.asarray(gamma).reshape(()),
        "color_transform_0": _conv(sd, f"{base}.color_transform.0"),
        "color_transform_1": _conv(sd, f"{base}.color_transform.2"),
        "tone_curve_0": _conv(sd, f"{base}.tone_curve.0"),
        "tone_curve_1": _conv(sd, f"{base}.tone_curve.2"),
    }


def import_truecolor_state_dict(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Map a TrueColorRawFormer checkpoint (``TrueColorRawFormer.py:377-453``)
    or its BayerTORGB variant (``BayerTORGBColorMultiLvl.py:387-462``, detected
    by the pyramid FLCA's res_proj keys) to TrueColorRawFormer variables."""
    pyramid = "conv_tran1.FLCA.res_proj.0.weight" in sd
    params: Dict[str, Any] = {
        "bayer_processor": _bayer_processor(sd, "bayer_processor"),
        "embedding": _conv(sd, "embedding"),
        "color_correction": _color_correction(sd, "color_correction"),
    }
    for k in range(1, 8):
        base = f"conv_tran{k}"
        params[base] = {
            "FLCA": _enhanced_flca(sd, f"{base}.FLCA", pyramid),
            "Transformer": _transformer_block(sd, f"{base}.Transformer"),
            "channel_reduce": _conv(sd, f"{base}.channel_reduce"),
            "Conv_out": _conv(sd, f"{base}.Conv_out"),
        }
    for j in range(1, 4):
        params[f"down{j}"] = _downsample(sd, f"down{j}")
        params[f"up{j}"] = _upsample(sd, f"up{j}")
        params[f"channel_reduce{j}"] = _conv(sd, f"channel_reduce{j}")
    params["conv_out"] = _conv(sd, "conv_out")
    return {"params": params}


IMPORTERS = {
    "rawformer": import_rawformer_state_dict,
    "rawformer_wfb": import_wfb_state_dict,
    "flca_rawformer": import_flca_state_dict,
    "truecolor_rawformer": import_truecolor_state_dict,
    "bayertorgb_rawformer": import_truecolor_state_dict,
}
