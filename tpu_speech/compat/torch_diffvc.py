"""DiffVC PyTorch checkpoint -> tpu_speech flax params converter.

Maps DiffVC/model/vc.py module trees (FwdDiffusion encoder, conditional
GradLogPEstimator) onto our channels-last layout. Reuses the layout helpers
from the Grad-TTS converter.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from tpu_speech.compat.torch_gradtts import (
    _block,
    _conv1d,
    _conv2d,
    _dense,
    _layernorm,
    _np,
    _resnet_block,
    _rezero_attn,
    convt2d_w,
)


def _conv2d_as_dense(sd, prefix):
    return _dense(sd, prefix)


def _instance_norm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def convert_mel_encoder(sd: Dict, prefix: str, n_layers: int = 6) -> Dict:
    """DiffVC MelEncoder params -> our MelEncoder subtree."""
    p = {"init_proj": _dense(sd, f"{prefix}.init_proj"),
         "term_proj": _dense(sd, f"{prefix}.term_proj")}
    prenet = {}
    for i in range(3):
        prenet[f"conv_{i}"] = _conv1d(sd, f"{prefix}.prenet.conv_layers.{i}")
        prenet[f"norm_{i}"] = _layernorm(sd, f"{prefix}.prenet.norm_layers.{i}")
    prenet["proj"] = _conv1d(sd, f"{prefix}.prenet.proj")
    p["prenet"] = prenet
    enc = {}
    for i in range(n_layers):
        attn = {
            k: _dense(sd, f"{prefix}.encoder.attn_layers.{i}.{k}")
            for k in ("conv_q", "conv_k", "conv_v", "conv_o")
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
    return p


def convert_postnet(sd: Dict, prefix: str) -> Dict:
    return {
        "init_conv": _dense(sd, f"{prefix}.init_conv"),
        "block1": {
            "conv": _conv2d(sd, f"{prefix}.res_block.block1.block.0"),
            "norm": _instance_norm(sd, f"{prefix}.res_block.block1.block.1"),
        },
        "block2": {
            "conv": _conv2d(sd, f"{prefix}.res_block.block2.block.0"),
            "norm": _instance_norm(sd, f"{prefix}.res_block.block2.block.1"),
        },
        "res": _dense(sd, f"{prefix}.res_block.res"),
        "final_conv": _dense(sd, f"{prefix}.final_conv"),
    }


def convert_fwd_diffusion(sd: Dict, prefix: str = "", n_layers: int = 6) -> Dict:
    pre = f"{prefix}." if prefix else ""
    return {
        "encoder": convert_mel_encoder(sd, f"{pre}encoder", n_layers),
        "postnet": convert_postnet(sd, f"{pre}postnet"),
    }


def _ref_conv(sd, prefix):
    return {
        "conv": _conv2d(sd, f"{prefix}.0"),
        "norm": _instance_norm(sd, f"{prefix}.1"),
    }


def convert_ref_block(sd: Dict, prefix: str) -> Dict:
    return {
        "mlp1": _dense(sd, f"{prefix}.mlp1.1"),
        "mlp2": _dense(sd, f"{prefix}.mlp2.1"),
        "block11": _ref_conv(sd, f"{prefix}.block11"),
        "block12": _ref_conv(sd, f"{prefix}.block12"),
        "block21": _ref_conv(sd, f"{prefix}.block21"),
        "block22": _ref_conv(sd, f"{prefix}.block22"),
        "block31": _ref_conv(sd, f"{prefix}.block31"),
        "block32": _ref_conv(sd, f"{prefix}.block32"),
        "final_conv": _dense(sd, f"{prefix}.final_conv"),
    }


def convert_estimator_vc(
    sd: Dict, prefix: str = "decoder.estimator", use_ref_t: bool = True,
    dim_mults=(1, 2, 4),
) -> Dict:
    p = {
        "mlp_0": _dense(sd, f"{prefix}.mlp.0"),
        "mlp_1": _dense(sd, f"{prefix}.mlp.2"),
        "cond_block_0": _dense(sd, f"{prefix}.cond_block.0"),
        "cond_block_1": _dense(sd, f"{prefix}.cond_block.2"),
    }
    if use_ref_t:
        p["ref_block"] = convert_ref_block(sd, f"{prefix}.ref_block")

    num_res = len(dim_mults)
    for i in range(num_res):
        p[f"down_{i}_res1"] = _resnet_block(
            sd, f"{prefix}.downs.{i}.0",
            has_res_conv=f"{prefix}.downs.{i}.0.res_conv.weight" in sd)
        p[f"down_{i}_res2"] = _resnet_block(
            sd, f"{prefix}.downs.{i}.1",
            has_res_conv=f"{prefix}.downs.{i}.1.res_conv.weight" in sd)
        p[f"down_{i}_attn"] = _rezero_attn(sd, f"{prefix}.downs.{i}.2")
        if i < num_res - 1:
            p[f"down_{i}_ds"] = {"conv": _conv2d(sd, f"{prefix}.downs.{i}.3.conv")}
    p["mid_block1"] = _resnet_block(
        sd, f"{prefix}.mid_block1",
        has_res_conv=f"{prefix}.mid_block1.res_conv.weight" in sd)
    p["mid_attn"] = _rezero_attn(sd, f"{prefix}.mid_attn")
    p["mid_block2"] = _resnet_block(
        sd, f"{prefix}.mid_block2",
        has_res_conv=f"{prefix}.mid_block2.res_conv.weight" in sd)
    for j in range(num_res - 1):
        p[f"up_{j}_res1"] = _resnet_block(
            sd, f"{prefix}.ups.{j}.0",
            has_res_conv=f"{prefix}.ups.{j}.0.res_conv.weight" in sd)
        p[f"up_{j}_res2"] = _resnet_block(
            sd, f"{prefix}.ups.{j}.1",
            has_res_conv=f"{prefix}.ups.{j}.1.res_conv.weight" in sd)
        p[f"up_{j}_attn"] = _rezero_attn(sd, f"{prefix}.ups.{j}.2")
        p[f"up_{j}_us"] = {
            "kernel": convt2d_w(sd[f"{prefix}.ups.{j}.3.conv.weight"]),
            "bias": _np(sd[f"{prefix}.ups.{j}.3.conv.bias"]),
        }
    p["final_block"] = _block(sd, f"{prefix}.final_block")
    p["final_conv"] = _conv2d(sd, f"{prefix}.final_conv")
    return p


def convert_diffvc(state_dict: Dict, use_ref_t: bool = True,
                   n_enc_layers: int = 6) -> Dict:
    """Full DiffVC state_dict -> {'params': ...} for our DiffVC."""
    sd = dict(state_dict)
    return {
        "params": {
            "encoder": convert_fwd_diffusion(sd, "encoder", n_enc_layers),
            "estimator": convert_estimator_vc(
                sd, "decoder.estimator", use_ref_t),
        }
    }
