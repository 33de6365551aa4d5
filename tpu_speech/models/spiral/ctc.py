"""CTC decoder head + finetune model for SPIRAL.

Re-design of SPIRAL/nemo/collections/asr/modules/conv_asr.py:214-360
(ConvASRDecoder) and models/spec2vec/ctc_finetune.py:59-555: pretrained
ST2Vec feature encoder (features_only) + conv decoder -> log-probs -> CTC.
The encoder-freeze-for-N-updates trick (ctc_finetune.py:403-405) becomes a
stop_gradient gate inside the jitted step.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_speech.models.spiral.conv_layers import ConvNormAct, ProjUpsampling, create_pad_mask
from tpu_speech.models.spiral.encoder import ConvLayerCfg
from tpu_speech.models.spiral.masking import apply_mask, gaussian_mask_emb
from tpu_speech.models.spiral.st2vec import ST2VecConfig, ST2VecEncoder, wav_to_spec
from tpu_speech.utils.typing_contracts import typecheck


class ConvASRDecoder(nn.Module):
    """Conv stack + 1x1 projection to vocab logits, log-softmax output."""

    num_classes: int
    conv_layers: Tuple[ConvLayerCfg, ...] = (
        ConvLayerCfg(512, (5,), (1,), None, "relu", 0.1),
        ConvLayerCfg(512, (5,), (1,), None, "relu", 0.1),
    )
    blank_pos: str = "vocab_first"
    upsample_rate: Optional[int] = None
    upsample_filters: int = 512
    # reference upsampling-decoder recipe defaults
    # (spiral_base_finetune_ls100_char.py:59)
    upsample_norm: Optional[str] = "ln"
    upsample_act: Optional[str] = "relu"
    upsample_dropout: float = 0.1
    # causal decoder convs — set for streaming models (streaming.py)
    causal: bool = False

    @property
    def blank_idx(self) -> int:
        if self.blank_pos == "vocab_first":
            return 0
        return self.num_classes_with_blank - 1

    @property
    def num_classes_with_blank(self) -> int:
        if self.blank_pos == "after_vocab_last":
            return self.num_classes + 1
        return self.num_classes

    @nn.compact
    @typecheck(x="B T C @embedding", lens="B @lengths")
    def __call__(self, x, lens, train: bool = False):
        if self.upsample_rate is not None:
            x, lens = ProjUpsampling(
                self.upsample_filters, (5,), self.upsample_rate,
                norm_type=self.upsample_norm, act_func=self.upsample_act,
                dropout=self.upsample_dropout, causal=self.causal,
                name="proj_upsampling",
            )(x, lens, train=train)
        pad_mask = create_pad_mask(lens, x.shape[1])
        for i, c in enumerate(self.conv_layers):
            x, lens, pad_mask = ConvNormAct(
                c.filters, c.kernel_size, c.stride, c.norm_type, c.act_func,
                c.dropout, "1d", bias=c.bias, causal=self.causal,
                name=f"conv_{i}",
            )(x, lens, pad_mask, train=train)
        logits = nn.Dense(self.num_classes_with_blank, name="decoder_proj")(x)
        return nn.log_softmax(logits, axis=-1), lens


class CTCFinetuneModel(nn.Module):
    """ST2Vec encoder (features only) + ConvASRDecoder (ctc_finetune.py:59-)."""

    encoder_cfg: ST2VecConfig
    num_classes: int
    blank_pos: str = "vocab_first"
    decoder_convs: Tuple[ConvLayerCfg, ...] = (
        ConvLayerCfg(512, (5,), (1,), None, "relu", 0.1),
        ConvLayerCfg(512, (5,), (1,), None, "relu", 0.1),
    )
    # char recipes upsample the 8x-subsampled features 4x before CTC
    # (spiral_base_finetune_ls100_char.py ProjUpsampling rate=4)
    upsample_rate: Optional[int] = None
    upsample_filters: int = 512
    upsample_norm: Optional[str] = "ln"
    upsample_act: Optional[str] = "relu"
    upsample_dropout: float = 0.1

    @property
    def blank_idx(self) -> int:
        if self.blank_pos == "vocab_first":
            return 0
        if self.blank_pos == "after_vocab_last":
            return self.num_classes  # appended blank
        return self.num_classes - 1

    def setup(self):
        self.encoder = ST2VecEncoder(self.encoder_cfg)
        self.decoder = ConvASRDecoder(
            self.num_classes, self.decoder_convs, self.blank_pos,
            upsample_rate=self.upsample_rate,
            upsample_filters=self.upsample_filters,
            upsample_norm=self.upsample_norm,
            upsample_act=self.upsample_act,
            upsample_dropout=self.upsample_dropout,
            # streaming encoder implies a causal decoder so the whole
            # specs->logits path is chunk-incremental (streaming.py)
            causal=self.encoder_cfg.streaming is not None,
        )

    @typecheck(specs="B T F @spec", spec_lens="B @lengths")
    def __call__(self, specs, spec_lens, train: bool = False,
                 freeze_encoder: bool = False):
        feats, feat_lens = self.encoder.encode_features(
            specs, spec_lens, train=train
        )
        if freeze_encoder:
            feats = jax.lax.stop_gradient(feats)
        return self.decoder(feats, feat_lens, train=train)


@typecheck(log_probs="B T K @logprobs", logit_lens="B @lengths",
           labels="B L @labels", label_lens="B @lengths")
def ctc_loss(log_probs, logit_lens, labels, label_lens, blank_idx: int):
    """Mean-over-batch CTC loss (losses/ctc.py:31-131 semantics)."""
    b, t, _ = log_probs.shape
    logit_mask = (
        jnp.arange(t)[None, :] >= logit_lens[:, None]
    ).astype(log_probs.dtype)
    label_mask = (
        jnp.arange(labels.shape[1])[None, :] >= label_lens[:, None]
    ).astype(log_probs.dtype)
    per_seq = optax.ctc_loss(
        log_probs, logit_mask, labels, label_mask, blank_id=blank_idx
    )
    return jnp.mean(per_seq)


@flax.struct.dataclass
class CTCTrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def make_finetune_step(model: CTCFinetuneModel, cfg: ST2VecConfig, tx,
                       freeze_finetune_updates: int = 0,
                       accum_steps: int = 1,
                       bf16: bool = False,
                       mesh=None,
                       state_shardings=None):
    """accum_steps>1: trainer.accumulate_grad_batches — batch leaves arrive
    stacked [accum_steps, batch, ...] (parallel.mesh.shard_microbatches) and
    are scanned in-graph, one optimizer update per call.

    bf16=True runs the network forward/backward in bfloat16 (featurizer and
    CTC loss stay float32; master params/optimizer fp32).

    state_shardings: NamedSharding pytree from parallel.mesh.fsdp_shardings —
    pins the updated state to its ZeRO-style placement through the donated
    jit (see train/spiral.py::make_pretrain_step)."""
    # numpy, not device array: a device-array closure constant forces a
    # blocking host fetch at lowering time (see train/spiral.py note)
    mask_emb = np.asarray(gaussian_mask_emb(cfg.num_features))

    def loss_fn(params, batch_stats, batch, rng, freeze: bool):
        if bf16:
            params = jax.tree.map(
                lambda p: p.astype(jnp.bfloat16)
                if jnp.issubdtype(p.dtype, jnp.floating) else p,
                params,
            )
        rngs = {"dropout": jax.random.fold_in(rng, 0)}
        specs, spec_lens = wav_to_spec(
            cfg, batch["wavs"], batch["wav_lens"], training=True,
            rng=jax.random.fold_in(rng, 1),
        )
        if bf16:
            specs = specs.astype(jnp.bfloat16)
        # spec-masking as a SpecAugment-style regularizer (ctc_finetune.py:394-424)
        if "time_mask" in batch:
            specs = apply_mask(
                specs, batch["time_mask"], batch.get("chan_mask"), mask_emb
            )
        (log_probs, logit_lens), new_state = model.apply(
            {"params": params, "batch_stats": batch_stats},
            specs, spec_lens, train=True, freeze_encoder=freeze,
            rngs=rngs, mutable=["batch_stats"],
        )
        loss = ctc_loss(
            log_probs.astype(jnp.float32), logit_lens,
            batch["labels"], batch["label_lens"], model.blank_idx,
        )
        return loss, new_state.get("batch_stats", batch_stats)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    jit_kw = {}
    if state_shardings is not None:
        assert mesh is not None, "state_shardings requires the mesh"
        from jax.sharding import NamedSharding, PartitionSpec

        jit_kw["out_shardings"] = (
            state_shardings, NamedSharding(mesh, PartitionSpec())
        )

    @partial(jax.jit, donate_argnums=(0,), static_argnums=(3,), **jit_kw)
    def step(state: CTCTrainState, batch, rng, freeze: bool):
        if accum_steps > 1:
            def micro(carry, xs):
                grads_acc, loss_acc, batch_stats = carry
                mb, r = xs
                (loss, batch_stats), grads = grad_fn(
                    state.params, batch_stats, mb, r, freeze
                )
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                return (grads_acc, loss_acc + loss, batch_stats), None

            rs = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
                jnp.arange(accum_steps)
            )
            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss, batch_stats), _ = jax.lax.scan(
                micro, (zeros, 0.0, state.batch_stats), (batch, rs)
            )
            inv = 1.0 / accum_steps
            grads = jax.tree.map(lambda g: g * inv, grads)
            loss = loss * inv
        else:
            (loss, batch_stats), grads = grad_fn(
                state.params, state.batch_stats, batch, rng, freeze
            )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            CTCTrainState(state.step + 1, params, batch_stats, opt_state),
            {"loss": loss},
        )

    def step_auto(state, batch, rng, iteration: Optional[int] = None):
        """``iteration`` is the runner's host-side step counter: the
        encoder-freeze gate (ctc_finetune.py:403-405) is decided on host,
        with no device->host sync in the step path. It is required whenever
        ``freeze_finetune_updates`` > 0 (the runner already tracks it)."""
        if freeze_finetune_updates <= 0:
            freeze = False
        else:
            if iteration is None:
                raise ValueError(
                    "freeze_finetune_updates > 0 requires the host-side "
                    "iteration counter (pass iteration=...); reading it back "
                    "from state.step would block on the device every step"
                )
            freeze = int(iteration) < freeze_finetune_updates
        return step(state, batch, rng, freeze)

    return step_auto


def load_pretrained_encoder(finetune_params, pretrain_params,
                            use_teacher: bool = False,
                            pretrain_teacher=None):
    """Checkpoint surgery: copy the pretrained feature_encoder into the
    finetune tree (init_encoder_from_pretrain_model, ctc_finetune.py:511-533;
    optional teacher weights, st2vec_model.py:318-327)."""
    out = jax.tree.map(lambda x: x, finetune_params)  # shallow copy
    src = (
        pretrain_teacher["feature_encoder"]
        if (use_teacher and pretrain_teacher is not None)
        else pretrain_params["feature_encoder"]
    )
    out["encoder"]["feature_encoder"] = jax.tree.map(jnp.asarray, src)
    return out
