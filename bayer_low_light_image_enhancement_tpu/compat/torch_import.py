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


# ---------------------------------------------------------------------------
# Remaining zoo families (round-4 importer matrix). Where a reference model's
# own forward cannot run (documented wiring bugs, SURVEY.md §7), the importer
# maps the checkpoint a *repaired* reference produces — the repairs are the
# same ones our models ship (consistent decoder widths etc.), and the parity
# tests construct exactly that repaired torch model (tests/test_variant_import2.py).
# ---------------------------------------------------------------------------


def _mha(sd, base: str, num_heads: int) -> Dict[str, Any]:
    """torch nn.MultiheadAttention(dim, h, batch_first=True) -> flax
    nn.MultiHeadDotProductAttention params. Both split the projected feature
    dim into heads-major contiguous blocks, so only transposition/reshape is
    needed: in_proj_weight [3C, C] rows are (q | k | v) each [C, C]."""
    w = _get(sd, f"{base}.in_proj_weight")
    b = _get(sd, f"{base}.in_proj_bias")
    c = w.shape[1]
    hd = c // num_heads
    out = {}
    for i, name in enumerate(("query", "key", "value")):
        wi = w[i * c : (i + 1) * c]  # [C_out, C_in]
        out[name] = {
            "kernel": np.transpose(wi, (1, 0)).reshape(c, num_heads, hd),
            "bias": b[i * c : (i + 1) * c].reshape(num_heads, hd),
        }
    wo = _get(sd, f"{base}.out_proj.weight")  # [C, C]
    out["out"] = {
        "kernel": np.transpose(wo, (1, 0)).reshape(num_heads, hd, c),
        "bias": _get(sd, f"{base}.out_proj.bias"),
    }
    return out


def _ln_vec(sd, base: str) -> Dict[str, np.ndarray]:
    """Plain nn.LayerNorm -> flax nn.LayerNorm {scale, bias}."""
    return {"scale": _get(sd, f"{base}.weight"), "bias": _get(sd, f"{base}.bias")}


def _token_transformer(sd, base: str, num_heads: int,
                       mlp=("mlp.0", "mlp.2"),
                       norms=("norm1", "norm2")) -> Dict[str, Any]:
    """Token-MHSA transformer (ln1/attn/ln2/mlp1/mlp2) shared by the FLCA
    U-Net family (Transformer_FLCA_UNet.py:129-148, rawformerwithLumma.py:45-63,
    BayerLumaChromaTransformer.py:116-147)."""
    return {
        "ln1": _ln_vec(sd, f"{base}.{norms[0]}"),
        "attn": _mha(sd, f"{base}.attn", num_heads),
        "ln2": _ln_vec(sd, f"{base}.{norms[1]}"),
        "mlp1": _dense(sd, f"{base}.{mlp[0]}"),
        "mlp2": _dense(sd, f"{base}.{mlp[1]}"),
    }


def _resca(sd, base: str) -> Dict[str, Any]:
    """ResCA (Transformer_FLCA_UNet.py:111-124): ResBlock(body.0/body.2) + SE."""
    return {
        "rb": {
            "conv1_kernel": conv_w(_get(sd, f"{base}.rb.body.0.weight")),
            "conv1_bias": _get(sd, f"{base}.rb.body.0.bias"),
            "conv2": _conv(sd, f"{base}.rb.body.2"),
        },
        "se": _se(sd, f"{base}.se"),
    }


def _guidance_flca(sd, base: str) -> Dict[str, Any]:
    """Shared FLCA guidance tree (Transformer_FLCA_UNet.py:40-89 pool variant
    and UnetLummaDWT.py:71-134 DWT variant — identical parameter names)."""
    return {
        "low_attn": _conv(sd, f"{base}.low_attn.0", bias=False),
        "high_attn": _conv(sd, f"{base}.high_attn.0", bias=False),
        "chroma_attn": _conv(sd, f"{base}.chroma_attn.0", bias=False),
        "se": _se(sd, f"{base}.se"),
        "alpha": _get(sd, f"{base}.alpha"),
        "beta": _get(sd, f"{base}.beta"),
        "gamma": _get(sd, f"{base}.gamma"),
    }


def import_flca_unet_state_dict(
    sd: Mapping[str, np.ndarray], num_blocks: int = 3, heads: int = 4,
    dwt: bool = False,
) -> Dict[str, Any]:
    """Transformer_FLCA_UNet (``/root/reference/Transformer_FLCA_UNet.py:197-260``)
    or its Haar-DWT variant (``UnetLummaDWT.py:241-305``, ``dwt=True``) ->
    models.flca_unet.TransformerFLCAUNet variables."""
    params: Dict[str, Any] = {}
    for i in (1, 2, 3):
        enc = f"enc{i}"
        params[enc] = {
            "in_conv": _conv(sd, f"{enc}.in_conv"),
            **{
                f"block{j}": _resca(sd, f"{enc}.blocks.{j}")
                for j in range(num_blocks)
            },
            "flca": _guidance_flca(sd, f"{enc}.flca"),
            "down": _conv(sd, f"{enc}.down"),
        }
    params["down_bott"] = _conv(sd, "down_bott")
    params["trans"] = _token_transformer(sd, "trans", heads, norms=("ln1", "ln2"))
    params["up_bott"] = _upsample(sd, "up_bott")
    for i in (1, 2, 3):
        dec = f"dec{i}"
        params[dec] = {
            "up": _upsample(sd, f"{dec}.up"),
            "fuse_conv": _conv(sd, f"{dec}.fuse.0"),
            "resca1": _resca(sd, f"{dec}.fuse.2"),
            "resca2": _resca(sd, f"{dec}.fuse.3"),
        }
    params["tail_conv"] = _conv(sd, "tail.0")
    params["tail_out"] = _conv(sd, "tail.2")
    if dwt:
        params["enh_conv"] = _conv(sd, "enhTail.0")
        params["enh_out"] = _conv(sd, "enhTail.2")
    return {"params": params}


def import_unet_luma_dwt_state_dict(sd, num_blocks: int = 3, heads: int = 4):
    return import_flca_unet_state_dict(sd, num_blocks, heads, dwt=True)


def import_simple_flca_unet_state_dict(
    sd: Mapping[str, np.ndarray], heads: int = 4
) -> Dict[str, Any]:
    """rawformerwithLumma.py Transformer_FLCA_UNet (:75-149) ->
    models.luma_variants.SimpleFLCAUNet variables. The reference forward has
    two latent wiring bugs our model repairs (guidance resized to feature
    resolution; consistent bottleneck width) — the parity test builds the
    repaired torch model, whose state_dict this maps verbatim."""
    params: Dict[str, Any] = {}

    def conv_block(base):
        return {"conv1": _conv(sd, f"{base}.0"), "conv2": _conv(sd, f"{base}.2")}

    def simple_flca(base):
        return {
            "low_attn": _conv(sd, f"{base}.low_attn.0"),
            "high_attn": _conv(sd, f"{base}.high_attn.0"),
            "chroma_attn": _conv(sd, f"{base}.chroma_attn.0"),
        }

    for i in (1, 2, 3):
        params[f"enc{i}"] = conv_block(f"enc{i}")
        params[f"dec{i}"] = conv_block(f"dec{i}")
        params[f"trans{i}"] = _token_transformer(sd, f"trans{i}", heads)
        params[f"flca{i}"] = simple_flca(f"flca{i}")
        params[f"up{i}"] = _upsample(sd, f"up{i}")
    params["bottleneck"] = _token_transformer(sd, "bottleneck", heads)
    params["flca_bottleneck"] = simple_flca("flca_bottleneck")
    params["final"] = _conv(sd, "final")
    return {"params": params}


def import_lumachroma_transformer_state_dict(
    sd: Mapping[str, np.ndarray], num_blocks: int = 2, heads: int = 4
) -> Dict[str, Any]:
    """BayerLumaChromaTransformer.py Transformer_FLCA_UNet_Full (:231-291) ->
    models.lumachroma_transformer.BayerLumaChromaTransformer variables."""
    params: Dict[str, Any] = {}

    def trans(base):
        t = _token_transformer(sd, base, heads)
        t["local_dw"] = _conv(sd, f"{base}.local_enhance.0")
        return t

    def mk_flca(base):
        return {
            "low_attn": _conv(sd, f"{base}.low_attn.0", bias=False),
            "high_attn": _conv(sd, f"{base}.high_attn.0", bias=False),
            "chroma_attn": _conv(sd, f"{base}.chroma_attn.0", bias=False),
            "refine": _conv(sd, f"{base}.refine", bias=False),
        }

    for i in (1, 2, 3):
        enc = f"enc{i}"
        params[f"{enc}_in"] = _conv(sd, f"{enc}.in_conv")
        for j in range(num_blocks):
            params[f"{enc}_block{j}"] = {
                "conv1": _conv(sd, f"{enc}.blocks.{j}.0"),
                "conv2": _conv(sd, f"{enc}.blocks.{j}.3"),
            }
        params[f"{enc}_trans"] = trans(f"{enc}.trans")
        params[f"{enc}_flca"] = mk_flca(f"{enc}.flca")
        params[f"{enc}_down"] = _conv(sd, f"{enc}.down")
    params["bott_down"] = _conv(sd, "bottleneck.conv_down")
    params["bott_trans"] = trans("bottleneck.trans")
    params["bott_flca"] = mk_flca("bottleneck.flca")
    params["bott_up"] = _upsample(sd, "bottleneck.conv_up")
    for i in (1, 2, 3):
        dec = f"dec{i}"
        params[f"{dec}_up"] = _upsample(sd, f"{dec}.up")
        params[f"{dec}_fuse1"] = _conv(sd, f"{dec}.fuse.0")
        params[f"{dec}_fuse2"] = _conv(sd, f"{dec}.fuse.3")
    params["tail_conv"] = _conv(sd, "tail.0")
    params["tail_out"] = _conv(sd, "tail.2")
    if "res_proj.weight" in sd:
        params["res_proj"] = _conv(sd, "res_proj")
    return {"params": params}


def _flca_pyramid(sd, base: str, levels: int = 2) -> Dict[str, Any]:
    """FLCA_Pyramid (``MultiLvl...RAWFormer.py:86-183``) -> ops.flca.FLCAPyramid."""
    p: Dict[str, Any] = {}
    for l in range(levels):
        p[f"low_attn_{l}"] = _conv(sd, f"{base}.low_attn.{l}.0", bias=False)
        p[f"high_attn_{l}"] = _conv(sd, f"{base}.high_attn.{l}.0", bias=False)
        p[f"freq_gate_{l}"] = _conv(sd, f"{base}.freq_gate_head.{l}")
    p["chroma_attn"] = _conv(sd, f"{base}.chroma_attn.0", bias=False)
    p["chroma_gate"] = _conv(sd, f"{base}.chroma_gate")
    p["se"] = _se(sd, f"{base}.se")
    p["res_proj_0"] = _conv(sd, f"{base}.res_proj.0")
    p["res_proj_1"] = _conv(sd, f"{base}.res_proj.2")
    return p


def import_multilvl_flca_state_dict(
    sd: Mapping[str, np.ndarray], flca_levels: int = 2
) -> Dict[str, Any]:
    """MultiLvl FLCA RawFormer (``MultiLvl...RAWFormer.py:313-416``) ->
    models.multilvl_flca.MultiLvlFLCARawFormer variables."""
    params: Dict[str, Any] = {"embedding": _conv(sd, "embedding")}
    for k in range(1, 8):
        base = f"conv_tran{k}"
        params[base] = {
            "FLCA": _flca_pyramid(sd, f"{base}.FLCA", flca_levels),
            "Transformer": _transformer_block(sd, f"{base}.Transformer"),
            "channel_reduce": _conv(sd, f"{base}.channel_reduce"),
            "Conv_out": _conv(sd, f"{base}.Conv_out"),
        }
    for j in (1, 2, 3):
        # down{j} is a bare Sequential here (``:322-326``), not Downsample.
        params[f"down{j}"] = {"conv": _conv(sd, f"down{j}.0", bias=False)}
        params[f"up{j}"] = _upsample(sd, f"up{j}")
        params[f"channel_reduce{j}"] = _conv(sd, f"channel_reduce{j}")
    params["conv_out"] = _conv(sd, "conv_out")
    return {"params": params}


def import_luma_mhsa_state_dict(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Attenblock.py RawFormer (:241-329) ->
    models.luma_variants.LumaMHSARawFormer variables. The reference decoder's
    proj2/proj3 declare concat widths (dim*6 / dim*3) inconsistent with its
    own up-projections (its forward cannot run past proj2); our model uses the
    consistent widths (dim*4 / dim*2) and the parity test repairs the torch
    model the same way."""

    def block(base):
        return {
            "norm1": _layernorm(sd, f"{base}.norm1"),
            "attn": {
                "to_qkv": _conv(sd, f"{base}.attn.to_qkv"),
                "luma_cond": {
                    "net0": _conv(sd, f"{base}.attn.luma_cond.net.0"),
                    "net1": _conv(sd, f"{base}.attn.luma_cond.net.2"),
                    "gamma": _conv(sd, f"{base}.attn.luma_cond.gamma"),
                    "beta": _conv(sd, f"{base}.attn.luma_cond.beta"),
                },
                "alpha": np.asarray(_get(sd, f"{base}.attn.alpha")).reshape(()),
                "proj": _conv(sd, f"{base}.attn.proj"),
            },
            "norm2": _layernorm(sd, f"{base}.norm2"),
            "ffn": _ffn(sd, f"{base}.ffn"),
        }

    params: Dict[str, Any] = {"embedding": _conv(sd, "embedding")}
    for our, ref in (
        ("enc1", "enc1"), ("enc2", "enc2"), ("enc3", "enc3"),
        ("bottleneck", "bottleneck"),
        ("dec1", "dec1"), ("dec2", "dec2"), ("dec3", "dec3"),
    ):
        params[our] = block(ref)
    for j in (1, 2, 3):
        params[f"down{j}"] = _downsample(sd, f"down{j}")
        params[f"up{j}"] = _upsample(sd, f"up{j}")
        params[f"proj{j}"] = _conv(sd, f"proj{j}")
    params["output_conv"] = _conv(sd, "output.0")
    return {"params": params}


def _kan_linear(sd, base: str):
    """kan_model.KANLinear (:40-102) -> (params, batch_stats). Parameter
    matrices are (out, in) on both sides — no transpose."""
    params = {
        "scale": _get(sd, f"{base}.scale"),
        "translation": _get(sd, f"{base}.translation"),
        "wavelet_weights": _get(sd, f"{base}.wavelet_weights"),
        "weight": _get(sd, f"{base}.weight"),
        "bn": {"scale": _get(sd, f"{base}.bn.weight"), "bias": _get(sd, f"{base}.bn.bias")},
    }
    stats = {
        "bn": {
            "mean": _get(sd, f"{base}.bn.running_mean"),
            "var": _get(sd, f"{base}.bn.running_var"),
        }
    }
    return params, stats


def _kan_stage(sd, base: str):
    """kan_model.KANConvTransformer (:159-175) -> (params, batch_stats)."""
    qkv, qkv_s = _kan_linear(sd, f"{base}.transformer.attn.qkv.0")
    proj, proj_s = _kan_linear(sd, f"{base}.transformer.attn.proj")
    kan1, kan1_s = _kan_linear(sd, f"{base}.transformer.ffn.net.0")
    kan2, kan2_s = _kan_linear(sd, f"{base}.transformer.ffn.net.3")
    reduce_, reduce_s = _kan_linear(sd, f"{base}.reduce")
    params = {
        "conv": _conv(sd, f"{base}.conv"),
        "norm1": _layernorm(sd, f"{base}.transformer.norm1"),
        "attn": {
            "qkv_kan": qkv,
            "qkv_dwconv": _conv(sd, f"{base}.transformer.attn.qkv.1"),
            "temperature": _get(sd, f"{base}.transformer.attn.scale").reshape(-1),
            "proj": proj,
        },
        "norm2": _layernorm(sd, f"{base}.transformer.norm2"),
        "ffn": {
            "kan1": kan1,
            "dwconv": _conv(sd, f"{base}.transformer.ffn.net.1"),
            "kan2": kan2,
        },
        "reduce": reduce_,
        "out_conv": _conv(sd, f"{base}.out.0"),
    }
    stats = {
        "attn": {"qkv_kan": qkv_s, "proj": proj_s},
        "ffn": {"kan1": kan1_s, "kan2": kan2_s},
        "reduce": reduce_s,
    }
    return params, stats


def import_wavkan_state_dict(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """kan_model.WavKANRawFormer (:178-236) -> models.wavkan.WavKANRawFormer
    variables (params + batch_stats for the KANLinear BatchNorms). Matching
    the reference's decoder temperature shapes requires
    ``WavKANConfig(ref_decoder_heads=True)`` (the reference passes channel
    counts as decoder head counts, ``kan_model.py:203-205``)."""
    params: Dict[str, Any] = {"embed": _conv(sd, "embed")}
    stats: Dict[str, Any] = {}
    for i in range(3):
        p, s = _kan_stage(sd, f"encoder.{i}")
        params[f"enc{i}"], stats[f"enc{i}"] = p, s
        params[f"down{i}_conv"] = _conv(sd, f"downsamples.{i}.net.0")
        pd, sd_ = _kan_stage(sd, f"decoder.{i}")
        params[f"dec{i}"], stats[f"dec{i}"] = pd, sd_
        params[f"up{i}"] = _upsample(sd, f"upsamples.{i}")
    p, s = _kan_stage(sd, "bottleneck")
    params["bottleneck"], stats["bottleneck"] = p, s
    params["out_conv"] = _conv(sd, "output.0")
    return {"params": params, "batch_stats": stats}


IMPORTERS = {
    "rawformer": import_rawformer_state_dict,
    "rawformer_wfb": import_wfb_state_dict,
    "flca_rawformer": import_flca_state_dict,
    "truecolor_rawformer": import_truecolor_state_dict,
    "bayertorgb_rawformer": import_truecolor_state_dict,
    "flca_unet": import_flca_unet_state_dict,
    "unet_luma_dwt": import_unet_luma_dwt_state_dict,
    "simple_flca_unet": import_simple_flca_unet_state_dict,
    "lumachroma_transformer": import_lumachroma_transformer_state_dict,
    "multilvl_flca_rawformer": import_multilvl_flca_state_dict,
    "luma_mhsa_rawformer": import_luma_mhsa_state_dict,
    "wavkan_rawformer": import_wavkan_state_dict,
}
