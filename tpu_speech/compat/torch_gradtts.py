"""Grad-TTS PyTorch checkpoint -> tpu_speech flax params converter.

Maps the reference state_dict layout (Grad-TTS/model/tts.py module tree) onto
our channels-last parameter tree:

- Conv1d (out,in,k)      -> kernel (k,in,out)
- Conv1d k=1 / Linear    -> Dense kernel (in,out)
- Conv2d (out,in,kh,kw)  -> kernel (kh,kw,in,out)
- ConvTranspose2d (in,out,kh,kw) -> kernel (kh,kw,in,out)

Published checkpoints load losslessly (BASELINE requirement).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def conv1d_w(t):
    return _np(t).transpose(2, 1, 0)  # (out,in,k) -> (k,in,out)


def dense_w(t):
    w = _np(t)
    if w.ndim == 3:  # conv1d k=1
        w = w[:, :, 0]
    elif w.ndim == 4:  # conv2d 1x1
        w = w[:, :, 0, 0]
    return w.T  # (out,in) -> (in,out)


def conv2d_w(t):
    return _np(t).transpose(2, 3, 1, 0)  # (out,in,kh,kw) -> (kh,kw,in,out)


def convt2d_w(t):
    return _np(t).transpose(2, 3, 0, 1)  # (in,out,kh,kw) -> (kh,kw,in,out)


def _layernorm(sd, prefix):
    return {"gamma": _np(sd[f"{prefix}.gamma"]), "beta": _np(sd[f"{prefix}.beta"])}


def _conv1d(sd, prefix):
    return {"kernel": conv1d_w(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _dense(sd, prefix):
    out = {"kernel": dense_w(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _conv2d(sd, prefix):
    return {"kernel": conv2d_w(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _groupnorm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _block(sd, prefix):
    return {
        "conv": _conv2d(sd, f"{prefix}.block.0"),
        "norm": _groupnorm(sd, f"{prefix}.block.1"),
    }


def _resnet_block(sd, prefix, has_res_conv):
    out = {
        "mlp": _dense(sd, f"{prefix}.mlp.1"),
        "block1": _block(sd, f"{prefix}.block1"),
        "block2": _block(sd, f"{prefix}.block2"),
    }
    if has_res_conv:
        out["res_conv"] = _dense(sd, f"{prefix}.res_conv")
    return out


def _rezero_attn(sd, prefix):
    return {
        "g": _np(sd[f"{prefix}.fn.g"]),
        "fn": {
            "to_qkv": {"kernel": dense_w(sd[f"{prefix}.fn.fn.to_qkv.weight"])},
            "to_out": _dense(sd, f"{prefix}.fn.fn.to_out"),
        },
    }


def convert_text_encoder(sd: Dict, prefix: str = "encoder", n_layers: int = 6) -> Dict:
    """Reference TextEncoder params -> our TextEncoder param subtree."""
    p = {}
    p["emb"] = {"embedding": _np(sd[f"{prefix}.emb.weight"])}
    prenet = {}
    for i in range(3):
        prenet[f"conv_{i}"] = _conv1d(sd, f"{prefix}.prenet.conv_layers.{i}")
        prenet[f"norm_{i}"] = _layernorm(sd, f"{prefix}.prenet.norm_layers.{i}")
    prenet["proj"] = _conv1d(sd, f"{prefix}.prenet.proj")
    p["prenet"] = prenet

    enc = {}
    for i in range(n_layers):
        attn = {
            "conv_q": _dense(sd, f"{prefix}.encoder.attn_layers.{i}.conv_q"),
            "conv_k": _dense(sd, f"{prefix}.encoder.attn_layers.{i}.conv_k"),
            "conv_v": _dense(sd, f"{prefix}.encoder.attn_layers.{i}.conv_v"),
            "conv_o": _dense(sd, f"{prefix}.encoder.attn_layers.{i}.conv_o"),
        }
        for rel in ("emb_rel_k", "emb_rel_v"):
            key = f"{prefix}.encoder.attn_layers.{i}.{rel}"
            if key in sd:
                attn[rel] = _np(sd[key])
        enc[f"attn_{i}"] = attn
        enc[f"norm1_{i}"] = _layernorm(sd, f"{prefix}.encoder.norm_layers_1.{i}")
        enc[f"ffn_{i}"] = {
            "conv_1": _conv1d(sd, f"{prefix}.encoder.ffn_layers.{i}.conv_1"),
            "conv_2": _conv1d(sd, f"{prefix}.encoder.ffn_layers.{i}.conv_2"),
        }
        enc[f"norm2_{i}"] = _layernorm(sd, f"{prefix}.encoder.norm_layers_2.{i}")
    p["encoder"] = enc

    p["proj_m"] = _conv1d(sd, f"{prefix}.proj_m")
    p["proj_w"] = {
        "conv_1": _conv1d(sd, f"{prefix}.proj_w.conv_1"),
        "norm_1": _layernorm(sd, f"{prefix}.proj_w.norm_1"),
        "conv_2": _conv1d(sd, f"{prefix}.proj_w.conv_2"),
        "norm_2": _layernorm(sd, f"{prefix}.proj_w.norm_2"),
        "proj": _conv1d(sd, f"{prefix}.proj_w.proj"),
    }
    return p


def convert_estimator(
    sd: Dict,
    prefix: str = "decoder.estimator",
    dim_mults=(1, 2, 4),
    n_spks: int = 1,
) -> Dict:
    """Reference GradLogPEstimator2d params -> our estimator subtree."""
    p = {}
    if n_spks > 1:
        p["spk_mlp_0"] = _dense(sd, f"{prefix}.spk_mlp.0")
        p["spk_mlp_1"] = _dense(sd, f"{prefix}.spk_mlp.2")
    p["mlp_0"] = _dense(sd, f"{prefix}.mlp.0")
    p["mlp_1"] = _dense(sd, f"{prefix}.mlp.2")

    num_res = len(dim_mults)
    for i in range(num_res):
        # downs.{i} = [resnet1, resnet2, attn, downsample]
        # level input dims differ from output at every down level -> res_conv
        p[f"down_{i}_res1"] = _resnet_block(
            sd, f"{prefix}.downs.{i}.0",
            has_res_conv=f"{prefix}.downs.{i}.0.res_conv.weight" in sd,
        )
        p[f"down_{i}_res2"] = _resnet_block(
            sd, f"{prefix}.downs.{i}.1",
            has_res_conv=f"{prefix}.downs.{i}.1.res_conv.weight" in sd,
        )
        p[f"down_{i}_attn"] = _rezero_attn(sd, f"{prefix}.downs.{i}.2")
        if i < num_res - 1:
            p[f"down_{i}_ds"] = {"conv": _conv2d(sd, f"{prefix}.downs.{i}.3.conv")}

    p["mid_block1"] = _resnet_block(
        sd, f"{prefix}.mid_block1",
        has_res_conv=f"{prefix}.mid_block1.res_conv.weight" in sd,
    )
    p["mid_attn"] = _rezero_attn(sd, f"{prefix}.mid_attn")
    p["mid_block2"] = _resnet_block(
        sd, f"{prefix}.mid_block2",
        has_res_conv=f"{prefix}.mid_block2.res_conv.weight" in sd,
    )

    for j in range(num_res - 1):
        p[f"up_{j}_res1"] = _resnet_block(
            sd, f"{prefix}.ups.{j}.0",
            has_res_conv=f"{prefix}.ups.{j}.0.res_conv.weight" in sd,
        )
        p[f"up_{j}_res2"] = _resnet_block(
            sd, f"{prefix}.ups.{j}.1",
            has_res_conv=f"{prefix}.ups.{j}.1.res_conv.weight" in sd,
        )
        p[f"up_{j}_attn"] = _rezero_attn(sd, f"{prefix}.ups.{j}.2")
        p[f"up_{j}_us"] = {
            "kernel": convt2d_w(sd[f"{prefix}.ups.{j}.3.conv.weight"]),
            "bias": _np(sd[f"{prefix}.ups.{j}.3.conv.bias"]),
        }

    p["final_block"] = _block(sd, f"{prefix}.final_block")
    p["final_conv"] = _conv2d(sd, f"{prefix}.final_conv")
    return p


def convert_gradtts(state_dict: Dict, n_spks: int = 1, n_enc_layers: int = 6) -> Dict:
    """Full reference GradTTS state_dict -> {'params': ...} for our GradTTS."""
    sd = {k: v for k, v in state_dict.items()}
    params = {
        "encoder": convert_text_encoder(sd, "encoder", n_enc_layers),
        "estimator": convert_estimator(sd, "decoder.estimator", n_spks=n_spks),
    }
    if n_spks > 1:
        params["spk_emb"] = {"embedding": _np(sd["spk_emb.weight"])}
    return {"params": params}
