"""SPIRAL pretraining: jitted teacher-student step with in-graph EMA.

Replaces the reference's PyTorch-Lightning loop
(SPIRAL/nemo/collections/asr/models/st2vec/st2vec_pretrain.py:68-233 +
ModelPT/DDP) with a single donated jit program per step: wav->spec both
branches, teacher shift + no-grad encode, student mask + encode, per-frame
negatives, InfoNCE, AdamW + warmup-cosine, EMA teacher lerp. Data parallelism
comes from batch sharding over the mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_speech.models.spiral.masking import apply_mask, gaussian_mask_emb, make_student_masks
from tpu_speech.models.spiral.st2vec import (
    ST2VecConfig,
    ST2VecEncoder,
    contrastive_loss,
    ema_update,
    momentum_schedule,
    sample_negatives,
    teacher_param_subset,
    teacher_shift,
    wav_to_spec,
)


@flax.struct.dataclass
class SpiralTrainState:
    step: jax.Array
    params: Any          # student params
    batch_stats: Any     # student BN stats (predictor)
    teacher: Any         # EMA teacher subtree (feature_encoder + projector)
    opt_state: Any


def init_spiral_state(model: ST2VecEncoder, rng, spec_shape, tx):
    specs = jnp.zeros(spec_shape)
    lens = jnp.full((spec_shape[0],), spec_shape[1], dtype=jnp.int32)
    # ONE jitted program: eager Module.init dispatches every param
    # initializer as its own compiled call — hundreds of round trips on a
    # remote-compile harness (measured: minutes vs seconds)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        specs, lens, train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return SpiralTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        teacher=jax.tree.map(jnp.copy, teacher_param_subset(params)),
        opt_state=tx.init(params),
    )


def make_pretrain_step(model: ST2VecEncoder, cfg: ST2VecConfig, tx,
                       grad_clip: Optional[float] = None,
                       bf16: bool = False,
                       accum_steps: int = 1,
                       mesh=None,
                       state_shardings=None):
    """bf16=True runs the network forward/backward in bfloat16 (params cast
    per step; optimizer state and updates stay float32 — standard TPU mixed
    precision).

    accum_steps>1 implements trainer.accumulate_grad_batches (reference knob
    spiral_base_pretrain_ls960.py:218): the step takes stacked micro-batches
    (leaves [accum_steps, batch, ...], see parallel.mesh.shard_microbatches),
    scans them accumulating gradients, and applies ONE optimizer + EMA update
    per call — the micro-batch scan trades HBM for steps so the global-batch
    recipe fits on fewer chips.

    mesh: pass a mesh with a 'seq' axis (make_mesh(seq_parallel=N)) to run
    sequence-parallel — featurizer/encoder activations are anchored to
    P(data, seq) and XLA partitions the time axis between the anchors
    (see parallel.mesh.seq_constrainer). No-op for meshes without 'seq'.

    state_shardings: the pytree of NamedShardings the state was placed with
    (parallel.mesh.fsdp_shardings) — pins the updated state's output sharding
    so ZeRO-style placement survives the donated jit (params all-gathered for
    the forward, grads reduce-scattered, AdamW update shard-wise)."""
    from tpu_speech.parallel.mesh import seq_constrainer

    seq_c = seq_constrainer(mesh)
    # keep host constants as NUMPY: a device array closed over by a jitted fn
    # is fetched back host-side at lowering time (ir_constant -> ._value),
    # a blocking round trip on remote-device harnesses; np lowers directly
    mask_emb = np.asarray(gaussian_mask_emb(cfg.num_features))

    def _cast(tree, dtype):
        return jax.tree.map(
            lambda p: p.astype(dtype)
            if jnp.issubdtype(p.dtype, jnp.floating) else p,
            tree,
        )

    def loss_fn(params, batch_stats, teacher, batch, rng):
        emb = mask_emb
        if bf16:
            params = _cast(params, jnp.bfloat16)
            teacher = _cast(teacher, jnp.bfloat16)
            emb = mask_emb.astype(jnp.bfloat16)
        rngs = {"dropout": jax.random.fold_in(rng, 0)}
        r_dither_t, r_dither_s, r_neg = (
            jax.random.fold_in(rng, 1), jax.random.fold_in(rng, 2),
            jax.random.fold_in(rng, 3),
        )
        # clean branch -> teacher; perturbed branch -> student
        # (featurizer stays float32; specs cast at the network boundary)
        t_specs, t_lens = wav_to_spec(
            cfg, batch["wavs"], batch["wav_lens"], training=True, rng=r_dither_t
        )
        s_specs, s_lens = wav_to_spec(
            cfg, batch["p_wavs"], batch["p_wav_lens"], training=True,
            rng=r_dither_s,
        )
        if bf16:
            t_specs = t_specs.astype(jnp.bfloat16)
            s_specs = s_specs.astype(jnp.bfloat16)
        t_specs, s_specs = seq_c(t_specs), seq_c(s_specs)

        # teacher: shift + encode with EMA params (no grad)
        t_specs_sh, t_lens_sh = teacher_shift(
            t_specs, t_lens, batch["shift_k"], batch["shift_r"],
            cfg.shift_unit, cfg.max_shift, emb,
        )
        teacher_params = dict(params)
        teacher_params.update(teacher)
        targets, _t_feat_lens = model.apply(
            {"params": teacher_params, "batch_stats": batch_stats},
            t_specs_sh, t_lens_sh, train=True,
            method=ST2VecEncoder.encode_teacher, rngs=rngs,
        )
        targets = jax.lax.stop_gradient(seq_c(targets))
        # trim the k leading shifted frames -> aligned with student frames
        tf_student = s_specs.shape[1] // cfg.shift_unit
        targets = jax.lax.dynamic_slice_in_dim(
            targets, batch["shift_k"], tf_student, axis=1
        )

        # student: mask + encode
        s_specs = apply_mask(
            s_specs, batch["time_mask"], batch["chan_mask"], emb
        )
        (pred, feat_lens), new_model_state = model.apply(
            {"params": params, "batch_stats": batch_stats},
            s_specs, s_lens, train=True,
            method=ST2VecEncoder.encode_student,
            rngs=rngs, mutable=["batch_stats"],
        )
        pred = seq_c(pred)

        valid = (
            jnp.arange(pred.shape[1])[None, :] < feat_lens[:, None]
        ).astype(pred.dtype)
        negs = sample_negatives(r_neg, targets, feat_lens, cfg.n_negatives)
        loss, acc = contrastive_loss(
            pred, targets, negs, valid, cfg.logit_temp
        )
        return loss, (acc, new_model_state.get("batch_stats", batch_stats))

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    jit_kw = {}
    if state_shardings is not None:
        assert mesh is not None, "state_shardings requires the mesh"
        from jax.sharding import NamedSharding, PartitionSpec

        jit_kw["out_shardings"] = (
            state_shardings, NamedSharding(mesh, PartitionSpec())
        )

    @partial(jax.jit, donate_argnums=(0,), **jit_kw)
    def step(state: SpiralTrainState, batch, rng):
        if accum_steps > 1:
            def micro(carry, xs):
                grads_acc, loss_acc, acc_acc, batch_stats = carry
                mb, r = xs
                (loss, (acc, batch_stats)), grads = grad_fn(
                    state.params, batch_stats, state.teacher, mb, r
                )
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                return (grads_acc, loss_acc + loss, acc_acc + acc,
                        batch_stats), None

            rs = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
                jnp.arange(accum_steps)
            )
            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss, acc, batch_stats), _ = jax.lax.scan(
                micro, (zeros, 0.0, 0.0, state.batch_stats), (batch, rs)
            )
            inv = 1.0 / accum_steps
            grads = jax.tree.map(lambda g: g * inv, grads)
            loss, acc = loss * inv, acc * inv
        else:
            (loss, (acc, batch_stats)), grads = grad_fn(
                state.params, state.batch_stats, state.teacher, batch, rng
            )
        if grad_clip is not None:
            gnorm = jnp.sqrt(
                sum(jnp.sum(g * g) for g in jax.tree.leaves(grads))
            )
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        m = momentum_schedule(
            state.step, cfg.target_momentum, cfg.target_momentum_final,
            cfg.target_momentum_steps,
        )
        teacher = ema_update(state.teacher, params, m)
        metrics = {"loss": loss, "accuracy": acc, "momentum": m}
        return (
            SpiralTrainState(
                state.step + 1, params, batch_stats, teacher, opt_state
            ),
            metrics,
        )

    return step


def step_rng(iteration: int, impl: str = "rbg") -> jax.Array:
    """Per-training-step PRNG key.

    'rbg' keys lower to the XLA hardware RngBitGenerator: measured 21 ms/step
    cheaper than the default threefry at the SPIRAL-base operating point
    (B=24, 250k crops — transformer dropout masks dominate the bit demand).
    'threefry' keeps jax's default bit-reproducible stream.
    """
    return jax.random.key(int(iteration), impl=impl)


def quantize_wire_int16(batch: dict) -> dict:
    """Re-encode the waveform leaves of a device batch as int16 for the
    host->device transfer (the jitted step decodes them, wav_to_spec).

    Source audio is int16 PCM, so for un-augmented waveforms the round trip
    float32 -> int16 -> float32 reproduces the loader's floats BIT-EXACTLY
    (round-to-nearest recovers the original sample index). Augmented
    waveforms (noise-mix / gain) re-quantize with error <= 0.5 LSB
    (1.5e-5) — below the featurizer's own dither (cfg.dither default 1e-5
    amplitude on a comparable scale) and ~90 dB under signal. Halves the
    dominant H2D payload; see bench.py::spiral_input_pipeline_efficiency's
    wire A/B for the measured effect.
    """
    out = dict(batch)
    for k in ("wavs", "p_wavs"):
        if k in out and out[k].dtype == np.float32:
            out[k] = np.clip(
                np.rint(out[k] * 32768.0), -32768, 32767
            ).astype(np.int16)
    return out


_MU = 255.0


def quantize_wire_mulaw(batch: dict) -> dict:
    """Re-encode waveform leaves as 8-bit mu-law (G.711-style, mu=255) for
    the host->device transfer — OPT-IN via train_ds.wire_dtype='mulaw'.

    Quarter the float32 payload (vs half for the lossless int16 default),
    for hosts where the H2D link, not the device, bounds the step (the dev
    harness's ~48 MB/s tunnel; see bench.py::bench_input_pipeline). LOSSY:
    logarithmic companding holds quantization noise at ~38 dB SNR across
    the signal's dynamic range — far coarser than int16's ~90 dB but above
    typical far-field/augmented-speech noise floors, and the same transcode
    the G.711 telephony perturbation applies on purpose (data/spiral.py).
    The jitted step expands on device (st2vec.py::wav_to_spec, exact
    inverse of this companding up to f32 rounding).
    """
    out = dict(batch)
    for k in ("wavs", "p_wavs"):
        if k in out and out[k].dtype == np.float32:
            x = np.clip(out[k], -1.0, 1.0)
            y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
            out[k] = np.rint((y + 1.0) * 127.5).astype(np.uint8)
    return out


def quantize_wire(batch: dict, wire_dtype: str) -> dict:
    """Dispatch train_ds.wire_dtype -> wire encoder ('float32' = passthrough)."""
    if wire_dtype == "int16":
        return quantize_wire_int16(batch)
    if wire_dtype == "mulaw":
        return quantize_wire_mulaw(batch)
    if wire_dtype == "float32":
        return batch
    raise ValueError(
        f"train_ds.wire_dtype={wire_dtype!r} (expected float32/int16/mulaw)")


def host_augment_batch(cfg: ST2VecConfig, wavs, wav_lens, p_wavs, p_wav_lens,
                       spec_len: int, rng: np.random.Generator,
                       shift_rng: Optional[np.random.Generator] = None):
    """Host-side per-batch randomness: student masks + teacher shift amounts.

    spec_len: static padded spec length (= padded wav len / hop, rounded to 16).
    shift_rng: source for the batch-level shift scalars. Under multi-host DP
    these are REPLICATED leaves, so every process must draw identical values —
    pass a generator seeded by the global step, while `rng` stays per-process
    for the (independent) per-example masks.
    """
    hop = int(0.01 * cfg.sample_rate)
    spec_lens = np.ceil(np.asarray(p_wav_lens) / hop).astype(np.int32)
    time_mask, chan_mask = make_student_masks(
        len(wav_lens), spec_len, cfg.num_features, spec_lens,
        cfg.mask_prob, cfg.mask_length, cfg.mask_channel_prob,
        cfg.mask_channel_length, rng=rng,
    )
    if shift_rng is None:
        shift_rng = rng
    shift_k = int(shift_rng.integers(0, cfg.max_shift + 1))
    shift_r = int(shift_rng.integers(0, cfg.max_shift + 1))
    return {
        "wavs": wavs, "wav_lens": wav_lens,
        "p_wavs": p_wavs, "p_wav_lens": p_wav_lens,
        "time_mask": time_mask, "chan_mask": chan_mask,
        "shift_k": np.int32(shift_k), "shift_r": np.int32(shift_r),
    }
