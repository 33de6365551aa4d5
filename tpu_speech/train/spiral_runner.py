"""SPIRAL run driver: pretrain / finetune / test loops over manifests.

Replaces the reference's PL Trainer + exp_manager composition
(SPIRAL/examples/asr/spiral_pretrain.py:95-190): epoch loops over the
prefetching loader, mesh DP, TB scalars, orbax resume, WER test reports.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_speech.data.loader import BucketedDataLoader, DataLoader
from tpu_speech.data.spiral import (
    AudioAugmentor,
    AudioBatchCollate,
    AudioDataset,
    AudioTextBatchCollate,
    AudioToTextDataset,
    RandomNoisePerturbation,
)
from tpu_speech.eval.wer import ctc_greedy_decode, render_wer_html, word_error_rate
from tpu_speech.models.spiral.ctc import (
    CTCFinetuneModel,
    CTCTrainState,
    load_pretrained_encoder,
    make_finetune_step,
)
from tpu_speech.models.spiral.st2vec import ST2VecEncoder, wav_to_spec
from tpu_speech.parallel import distributed
from tpu_speech.parallel.mesh import (
    fsdp_shardings,
    make_mesh,
    replicate,
    shard_batch,
    shard_microbatches,
)
from tpu_speech.train.optim import make_optimizer
from tpu_speech.train.spiral import (
    step_rng,
    host_augment_batch,
    init_spiral_state,
    make_pretrain_step,
    quantize_wire,
)
from tpu_speech.utils.checkpoint import Checkpointer


def _lr_scale(model_cfg, data_parallel: int, accum: int) -> float:
    """Rescale the config lr for the actual effective batch.

    The reference's configs are tuned for `expected_gpu_num` GPUs (its horovod
    path rescales: run_spiral.py:83-86); here the linear-scaling analog covers
    both the mesh size and gradient accumulation so recipes transfer across
    chip counts."""
    expected = getattr(model_cfg, "expected_gpu_num", 0) or 0
    if expected <= 0:
        return 1.0
    return float(data_parallel * accum) / float(expected)


def _make_optimizer(optim_cfg, total_steps, lr_scale: float = 1.0):
    return make_optimizer(optim_cfg, total_steps, lr_scale=lr_scale)


def _spec_len(crop_size: int, sample_rate: int) -> int:
    """Static padded spec length for a crop: center=True STFT yields
    1 + N//hop frames (features.py:84), then pad to a multiple of 16."""
    hop = int(0.01 * sample_rate)
    t = 1 + crop_size // hop
    return ((t + 15) // 16) * 16




def _raw_checkpoint_tree(path: str):
    """Read an orbax checkpoint written by Checkpointer as a raw pytree
    (no target): the input to surgery-aware full-model restores."""
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(os.path.abspath(path))

def _save_run_archive(log_dir: str, name: str, cfg, params,
                      extra=None) -> str:
    """Write the `.nemo`-analog archive at train end (NeMoModelCheckpoint's
    optional .nemo save, utils/exp_manager.py:552-604)."""
    from tpu_speech.utils.archive import save_archive

    path = os.path.join(log_dir, f"{name}.tpu_speech")
    save_archive(path, cfg, params, extra=extra)
    return path


class SpiralPretrainRunner:
    def __init__(self, cfg, log_dir: str, exp=None, ckpt_dir: str = ""):
        self.cfg = cfg
        m = cfg.model
        self.enc_cfg = m.encoder
        self.exp = exp
        if exp is not None:
            log_dir = exp.log_dir
        self.log_dir = log_dir
        self.primary = distributed.is_primary()
        os.makedirs(log_dir, exist_ok=True)
        n_dev = getattr(cfg.trainer, "devices", -1)
        sp = max(1, getattr(cfg.trainer, "seq_parallel", 1))
        self.mesh = make_mesh(
            n_devices=n_dev if n_dev and n_dev > 0 else None,
            seq_parallel=sp,
        )
        n_data = self.mesh.shape["data"]
        self.accum = max(1, getattr(cfg.trainer, "accumulate_grad_batches", 1))
        self.rng_impl = getattr(cfg.model, "rng_impl", "rbg")

        aug = None
        noise_cfg = getattr(m, "noise_perturb", None)
        if noise_cfg is not None and noise_cfg.manifest_path:
            # reference multi-condition recipe (NoisePerturbConfig,
            # spiral_base_pretrain_ls960_noise.py:214-223)
            aug = AudioAugmentor([(1.0, RandomNoisePerturbation(
                noise_cfg.manifest_path,
                min_snr_db=noise_cfg.min_snr_db,
                max_snr_db=noise_cfg.max_snr_db,
                ratio=noise_cfg.ratio,
            ))])
        elif m.train_ds.noise_manifest:
            aug = AudioAugmentor(
                [(1.0, RandomNoisePerturbation(m.train_ds.noise_manifest))]
            )
        self.collate = AudioBatchCollate(m.train_ds.crop_size)
        # ds.batch_size is per-device (reference per-GPU semantics,
        # spiral_base_pretrain_ls960.py:173); the loader yields this
        # process's share of the global batch.
        local_batch = m.train_ds.batch_size * jax.local_device_count()
        local_batch = min(local_batch, m.train_ds.batch_size * n_data)
        if getattr(m.train_ds, "tarred_audio_filepaths", None):
            from tpu_speech.data.spiral import TarredAudioDataset

            self.dataset = TarredAudioDataset(
                m.train_ds.manifest_filepath,
                m.train_ds.tarred_audio_filepaths,
                m.train_ds.sample_rate, m.train_ds.crop_size,
                m.train_ds.min_duration, m.train_ds.max_duration,
                augmentor=aug, return_both=True,
                shuffle_n=getattr(m.train_ds, "shuffle_n", 0),
                shard_id=distributed.process_index(),
                num_shards=distributed.process_count(),
            )
            dataset, collate, bs = self.dataset, self.collate, local_batch

            class _TarLoader:
                def __iter__(self):
                    return dataset.iter_batches(bs, collate)

                def __len__(self):
                    return len(dataset) // bs

            self.loader = _TarLoader()
        else:
            self.dataset = AudioDataset(
                m.train_ds.manifest_filepath, m.train_ds.sample_rate,
                m.train_ds.crop_size, m.train_ds.min_duration,
                m.train_ds.max_duration, augmentor=aug, return_both=True,
            )
            batch_fn = None
            if getattr(m.train_ds, "use_native_loader", True):
                from tpu_speech.data.native_pipeline import (
                    NativePretrainBatcher,
                )

                batch_fn = NativePretrainBatcher.maybe_build(
                    self.dataset, seed=distributed.process_index(),
                )
                if batch_fn is not None and self.primary:
                    print("input pipeline: native C++ batch prep")
            self.loader = DataLoader(
                self.dataset, local_batch, self.collate,
                shuffle=m.train_ds.shuffle, num_workers=m.train_ds.num_workers,
                shard_id=distributed.process_index(),
                num_shards=distributed.process_count(),
                batch_fn=batch_fn,
            )
        self.spec_len = _spec_len(m.train_ds.crop_size, m.train_ds.sample_rate)

        self.model = ST2VecEncoder(self.enc_cfg)
        total_steps = m.optim.sched.max_steps if m.optim.sched else 100000
        lr_scale = _lr_scale(m, n_data, self.accum)
        if lr_scale != 1.0 and self.primary:
            print(
                f"lr rescaled x{lr_scale:.3f} "
                f"(data_parallel={n_data}, accum={self.accum}, "
                f"expected_gpu_num={m.expected_gpu_num})"
            )
        self.tx = _make_optimizer(m.optim, total_steps, lr_scale)
        state = init_spiral_state(
            self.model, jax.random.PRNGKey(0),
            (m.train_ds.batch_size, self.spec_len, self.enc_cfg.num_features),
            self.tx,
        )
        self.fsdp = bool(getattr(cfg.trainer, "fsdp", False))
        state_shardings = None
        if self.fsdp:
            state_shardings = fsdp_shardings(self.mesh, state)
            self.state = jax.tree.map(jax.device_put, state, state_shardings)
        else:
            self.state = replicate(self.mesh, state)
        self._state_shardings = state_shardings
        self.step_fn = make_pretrain_step(
            self.model, self.enc_cfg, self.tx, grad_clip=m.grad_clip,
            bf16=(getattr(m, 'precision', 'fp32') == 'bf16'),
            accum_steps=self.accum,
            mesh=self.mesh,
            state_shardings=state_shardings,
        )
        # --chkpt_dir (reference run_spiral.py:33) relocates checkpoints
        # away from the log dir when set
        self.ckpt = Checkpointer(ckpt_dir or os.path.join(log_dir, "ckpt"))
        self.tb = None
        if self.primary:
            if exp is not None:
                self.tb = exp.tb
            else:
                try:
                    from tensorboardX import SummaryWriter

                    self.tb = SummaryWriter(log_dir)
                except Exception:
                    self.tb = None
        from tpu_speech.utils.profiling import StepTimer

        self.timer = StepTimer()
        self.host_rng = np.random.default_rng(distributed.process_index())
        self._micro_buf = []
        self._micro_sec = 0.0
        self.iteration = 0
        from collections import deque

        self._pending = deque()  # in-flight (iteration, metrics) futures

    def resume_if_exists(self):
        restored = self.ckpt.restore_latest(jax.device_get(self.state))
        if restored is None:
            return False
        if self._state_shardings is not None:
            self.state = jax.tree.map(
                jax.device_put, restored, self._state_shardings
            )
        else:
            self.state = replicate(self.mesh, restored)
        self.iteration = int(restored.step)
        return True

    def save_archive(self) -> Optional[str]:
        if not self.primary:
            return None
        state = jax.device_get(self.state)
        return _save_run_archive(
            self.log_dir, self.cfg.name or "st2vec", self.cfg,
            state.params,
            extra={"teacher": state.teacher,
                   "batch_stats": state.batch_stats},
        )

    def restore_from_archive(self, path: str, partial: bool = False,
                             skip: tuple = ()) -> None:
        """Load a ``.tpu_speech`` archive's weights into the live state (the
        reference's ModelPT.restore_from workflow, modelPT.py:~900-1268):
        params + EMA teacher + batch_stats; step/optimizer state start
        fresh. ``partial``/``skip`` implement the reference launcher's
        --init_model_partial / --load_model_skip_var surgery
        (run_spiral.py:45-47) via utils/surgery.merge_params; a strict load
        (default) fails loudly on any missing leaf or shape mismatch."""
        from tpu_speech.utils.archive import load_archive
        from tpu_speech.utils.surgery import merge_params

        host = jax.device_get(self.state)
        _, raw_params, extra = load_archive(path)
        params, report = merge_params(
            host.params, raw_params, partial=partial, skip=skip
        )
        if self.primary:
            print(f"archive restore: {report.summary()}")
        state = host.replace(
            params=params,
            teacher=extra.get("teacher", host.teacher),
            batch_stats=extra.get("batch_stats", host.batch_stats),
        )
        if self._state_shardings is not None:
            self.state = jax.tree.map(
                jax.device_put, state, self._state_shardings
            )
        else:
            self.state = replicate(self.mesh, state)

    def restore_from_checkpoint(self, path: str, partial: bool = False,
                                skip: tuple = ()) -> None:
        """Initialize the FULL training-state weights from a saved step
        checkpoint (the reference test-mode load: spiral_pretrain.py:117-121
        -> ModelPT.load_state_from_checkpoint, modelPT.py:605-631). Loads
        params (+teacher/batch_stats when present); step and optimizer state
        start fresh. ``partial``/``skip`` per utils/surgery.merge_params."""
        from tpu_speech.utils.surgery import merge_params

        raw = _raw_checkpoint_tree(path)
        host = jax.device_get(self.state)
        params, report = merge_params(
            host.params, raw.get("params", raw), partial=partial, skip=skip
        )
        if self.primary:
            print(f"checkpoint restore: {report.summary()}")
        state = host.replace(
            params=params,
            teacher=raw.get("teacher", host.teacher),
            batch_stats=raw.get("batch_stats", host.batch_stats),
        )
        if self._state_shardings is not None:
            self.state = jax.tree.map(
                jax.device_put, state, self._state_shardings
            )
        else:
            self.state = replicate(self.mesh, state)

    def validate(self) -> float:
        """Validation contrastive loss over validation_ds (the reference's
        validation_step, st2vec_pretrain.py:119-132): same loss, mask=True,
        no parameter/EMA update."""
        m = self.cfg.model
        ds_cfg = m.validation_ds
        if ds_cfg is None:
            return float("nan")
        if self._val_loader is None:  # manifest parse + loader built once
            dataset = AudioDataset(
                ds_cfg.manifest_filepath, ds_cfg.sample_rate,
                m.train_ds.crop_size, ds_cfg.min_duration, ds_cfg.max_duration,
                return_both=True, dup_factor=getattr(ds_cfg, "dup_factor", 1),
            )
            # per-process batch follows the mesh's data extent (a
            # trainer.devices clamp must bound validation too)
            val_batch = min(
                ds_cfg.batch_size * jax.local_device_count(),
                ds_cfg.batch_size * self.mesh.shape["data"],
            )
            self._val_loader = DataLoader(
                dataset, val_batch,
                self.collate, shuffle=False, num_workers=ds_cfg.num_workers,
                shard_id=distributed.process_index(),
                num_shards=distributed.process_count(),
            )
        loader = self._val_loader
        if self._val_fn is None:
            model, cfg = self.model, self.enc_cfg
            from tpu_speech.train.spiral import make_pretrain_step

            # reuse the training loss via a no-update step: call loss only
            import jax.numpy as _jnp

            from tpu_speech.models.spiral.masking import (
                apply_mask,
                gaussian_mask_emb,
            )
            from tpu_speech.models.spiral.st2vec import (
                check_collapse,
                contrastive_loss,
                sample_negatives,
                teacher_shift,
                wav_to_spec,
            )

            emb = _jnp.asarray(gaussian_mask_emb(cfg.num_features))

            @jax.jit
            def val_loss(params, batch_stats, teacher, batch, rng):
                t_specs, t_lens = wav_to_spec(
                    cfg, batch["wavs"], batch["wav_lens"]
                )
                s_specs, s_lens = wav_to_spec(
                    cfg, batch["p_wavs"], batch["p_wav_lens"]
                )
                t_specs_sh, t_lens_sh = teacher_shift(
                    t_specs, t_lens, batch["shift_k"], batch["shift_r"],
                    cfg.shift_unit, cfg.max_shift, emb,
                )
                teacher_params = dict(params)
                teacher_params.update(teacher)
                from tpu_speech.models.spiral.st2vec import ST2VecEncoder

                targets, _ = model.apply(
                    {"params": teacher_params, "batch_stats": batch_stats},
                    t_specs_sh, t_lens_sh, train=False,
                    method=ST2VecEncoder.encode_teacher,
                )
                tf_student = s_specs.shape[1] // cfg.shift_unit
                targets = jax.lax.dynamic_slice_in_dim(
                    targets, batch["shift_k"], tf_student, axis=1
                )
                s_specs_m = apply_mask(
                    s_specs, batch["time_mask"], batch["chan_mask"], emb
                )
                (pred, feat_lens), _ = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    s_specs_m, s_lens, train=False,
                    method=ST2VecEncoder.encode_student,
                    mutable=["batch_stats"],
                )
                valid = (
                    _jnp.arange(pred.shape[1])[None, :] < feat_lens[:, None]
                ).astype(pred.dtype)
                negs = sample_negatives(rng, targets, feat_lens, cfg.n_negatives)
                loss, acc = contrastive_loss(
                    pred, targets, negs, valid, cfg.logit_temp
                )
                # collapse diagnostics (reference check_collapse,
                # st2vec_model.py:287-312) on the same tensors
                diag = check_collapse(pred, targets, feat_lens)
                return loss, acc, diag

            self._val_fn = val_loss
        losses = []
        diags = []
        state = self.state
        for raw in loader:
            batch = self._augment(raw)
            batch = shard_batch(self.mesh, batch)
            loss, _acc, diag = self._val_fn(
                state.params, state.batch_stats, state.teacher, batch,
                jax.random.PRNGKey(0),
            )
            losses.append(float(jax.device_get(loss)))
            diags.append(jax.device_get(diag))
        val = float(np.mean(losses)) if losses else float("nan")
        if self.tb is not None:
            self.tb.add_scalar("val/loss", val, self.iteration)
            if diags:
                for k in diags[0]:
                    self.tb.add_scalar(
                        f"val/collapse/{k}",
                        float(np.mean([d[k] for d in diags])),
                        self.iteration,
                    )
        if self.primary:
            msg = f"Validation: loss = {val:.4f}"
            if diags:
                # collapse diagnostics in the log, not just TB, so quality
                # runs leave an assertable artifact (reference prints its
                # check_collapse matrices, st2vec_model.py:287-312)
                for k in diags[0]:
                    msg += f" | {k} = {float(np.mean([d[k] for d in diags])):.4f}"
            with open(os.path.join(self.log_dir, "train.log"), "a") as f:
                f.write(msg + "\n")
        return val

    _val_fn = None
    _val_loader = None

    def _augment(self, raw, micro_idx: int = 0, step_idx: int = None):
        # shift scalars seeded by (global step, micro index) so all processes
        # agree (they are replicated leaves of the global batch). step_idx is
        # the step that will CONSUME the batch — under device prefetch the
        # producer runs ahead of self.iteration, so it must be passed in.
        if step_idx is None:
            step_idx = self.iteration
        shift_rng = np.random.default_rng(
            1_000_003 + step_idx * self.accum + micro_idx
        )
        return host_augment_batch(
            self.enc_cfg, raw["wavs"], raw["wav_lens"], raw["p_wavs"],
            raw["p_wav_lens"], self.spec_len, self.host_rng, shift_rng,
        )

    def _device_batches(self):
        """Yield (device_batch, audio_seconds) — augment, stack accumulation
        micro-batches, and place on the mesh. Runs in the prefetch producer
        thread (train_epoch wraps it in threaded_prefetch), so mask
        generation and the ~50 MB/step host->device waveform transfer overlap
        with the device executing earlier steps instead of serializing with
        them — the role torch DataLoader workers + pin_memory play for the
        reference (st2vec_pretrain.py:225-233)."""
        sr = self.cfg.model.train_ds.sample_rate
        wire = getattr(self.cfg.model.train_ds, "wire_dtype", "int16")

        def _aug(raw, **kw):
            return quantize_wire(self._augment(raw, **kw), wire)

        step_idx = self.iteration
        for raw in self.loader:
            if self.accum > 1:
                # leftover micro-batches persist across epochs instead of
                # being dropped; audio seconds are counted when consumed so
                # the throughput log matches the steps actually executed
                self._micro_buf.append(_aug(
                    raw, micro_idx=len(self._micro_buf), step_idx=step_idx
                ))
                self._micro_sec += float(np.sum(raw["wav_lens"])) / sr
                if len(self._micro_buf) < self.accum:
                    continue
                batch = jax.tree.map(
                    lambda *xs: np.stack(xs), *self._micro_buf
                )
                self._micro_buf = []
                sec = self._micro_sec
                self._micro_sec = 0.0
                batch = shard_microbatches(self.mesh, batch)
            else:
                sec = float(np.sum(raw["wav_lens"])) / sr
                batch = shard_batch(
                    self.mesh, _aug(raw, step_idx=step_idx)
                )
            yield batch, sec
            step_idx += 1

    def train_epoch(self, epoch: int):
        from tpu_speech.data.prefetch import threaded_prefetch

        losses, accs = [], []
        t0, n_sec = time.time(), 0.0
        for batch, sec in threaded_prefetch(self._device_batches):
            n_sec += sec
            self.timer.tick("step")
            self.state, metrics = self.step_fn(
                self.state, batch, step_rng(self.iteration, self.rng_impl)
            )
            self.timer.tock("step")  # dispatch time; device time amortizes
            # PIPELINED metric reads: never block on the step just issued —
            # drain metrics 2 steps behind so the host prepares batch i+1
            # (and the dispatcher queues step i+1) while the device runs
            # step i. A hard per-step device_get costs one full host<->device
            # round trip per step and idles the chip between steps.
            self._pending.append((self.iteration, metrics))
            while len(self._pending) > 2:
                it_done, mm = self._pending.popleft()
                m = jax.device_get(mm)
                losses.append(float(m["loss"]))
                accs.append(float(m["accuracy"]))
                if self.tb is not None and it_done % 50 == 0:
                    self.tb.add_scalar("train/loss", losses[-1], it_done)
                    self.tb.add_scalar("train/accuracy", accs[-1], it_done)
            self.iteration += 1
        while self._pending:  # epoch boundary: drain (the only hard sync)
            _, mm = self._pending.popleft()
            m = jax.device_get(mm)
            losses.append(float(m["loss"]))
            accs.append(float(m["accuracy"]))
        dt = time.time() - t0
        n_steps = max(len(losses), 1)
        if self.tb is not None:
            self.tb.add_scalar(
                "train/step_time_ms", dt * 1e3 / n_steps, self.iteration
            )
        msg = (
            f"Epoch {epoch}: loss = {np.mean(losses):.4f} | "
            f"acc = {np.mean(accs):.4f} | "
            f"step {dt * 1e3 / n_steps:.0f} ms | "
            f"{n_sec / max(dt, 1e-9):.1f}x realtime\n"
        )
        if self.primary:
            with open(os.path.join(self.log_dir, "train.log"), "a") as f:
                f.write(msg)
            self.ckpt.save(self.iteration, jax.device_get(self.state),
                           blocking=False)
        return float(np.mean(losses)) if losses else float("nan")


class SpiralFinetuneRunner:
    def __init__(self, cfg, log_dir: str, tokenizer, exp=None,
                 ckpt_dir: str = ""):
        self.cfg = cfg
        m = cfg.model
        self.enc_cfg = m.encoder
        self.tokenizer = tokenizer
        self.exp = exp
        if exp is not None:
            log_dir = exp.log_dir
        self.log_dir = log_dir
        self.primary = distributed.is_primary()
        os.makedirs(log_dir, exist_ok=True)
        n_dev = getattr(cfg.trainer, "devices", -1)
        if max(1, getattr(cfg.trainer, "seq_parallel", 1)) > 1:
            raise ValueError(
                "trainer.seq_parallel is a pretrain-only knob (the 250k-"
                "sample crops); the CTC finetune step does not implement it"
            )
        self.mesh = make_mesh(n_devices=n_dev if n_dev and n_dev > 0 else None)
        self.accum = max(1, getattr(cfg.trainer, "accumulate_grad_batches", 1))
        self.rng_impl = getattr(cfg.model, "rng_impl", "rbg")

        from tpu_speech.text.tokenizers import BlankOffsetTokenizer

        dec_cfg0 = getattr(m, "decoder", None)
        if dec_cfg0 is None or dec_cfg0.blank_pos == "vocab_first":
            # reserve id 0 for the CTC blank (blank_pos='vocab_first')
            self.tokenizer = tokenizer = BlankOffsetTokenizer(tokenizer)
        else:
            # 'after_vocab_last': blank appended past the vocab, ids unshifted
            self.tokenizer = tokenizer

        sr = m.train_ds.sample_rate
        max_samples = int((m.train_ds.max_duration or 24.0) * sr)
        self.max_samples = max_samples
        self._tarred = bool(getattr(m.train_ds, "tarred_audio_filepaths", None))
        if self._tarred:
            # tarred char/BPE variant (audio_to_text.py:798+): stream wav+text
            # from tar shards, labels via the tokenizer
            from tpu_speech.data.spiral import TarredAudioDataset

            self.dataset = TarredAudioDataset(
                m.train_ds.manifest_filepath,
                m.train_ds.tarred_audio_filepaths,
                sr, crop_size=max_samples,
                min_duration=m.train_ds.min_duration,
                max_duration=m.train_ds.max_duration,
                shuffle_n=getattr(m.train_ds, "shuffle_n", 0),
                shard_id=distributed.process_index(),
                num_shards=distributed.process_count(),
                tokenizer=tokenizer,
            )
        else:
            self.dataset = AudioToTextDataset(
                m.train_ds.manifest_filepath, tokenizer, sample_rate=sr,
                crop_size=max_samples, min_duration=m.train_ds.min_duration,
                max_duration=m.train_ds.max_duration,
                dup_factor=getattr(m.train_ds, "dup_factor", 1),
            )
        self.collate = AudioTextBatchCollate(max_samples, 512)
        local_batch = m.train_ds.batch_size * jax.local_device_count()
        # a trainer.devices clamp bounds the per-process batch too
        local_batch = min(
            local_batch, m.train_ds.batch_size * self.mesh.shape["data"]
        )
        num_buckets = max(1, getattr(m.train_ds, "num_buckets", 1))
        accum = max(1, getattr(cfg.trainer, "accumulate_grad_batches", 1))
        if self._tarred:
            if num_buckets > 1:
                raise ValueError(
                    "train_ds.num_buckets requires random-access manifests; "
                    "tarred shards stream in order (one static shape)"
                )
            dataset, collate, bs = self.dataset, self.collate, local_batch

            class _TarLoader:
                def __iter__(self):
                    return dataset.iter_batches(bs, collate)

                def __len__(self):
                    return len(dataset) // bs

            self.loader = _TarLoader()
        elif num_buckets > 1:
            # duration-bucketed static shapes: quantile bounds balance the
            # buckets; label capacity scales with the bucket's audio bound
            durations = np.array(
                [e["duration"] for e in self.dataset.entries], dtype=np.float64
            )
            qs = np.quantile(
                durations, np.arange(1, num_buckets + 1) / num_buckets
            )
            max_dur = max_samples / sr
            # quantile bounds balance bucket populations; snap up to quarter
            # seconds so near-equal quantiles collapse into one program
            bounds = sorted(set(
                min(max_dur, float(np.ceil(q * 4.0) / 4.0)) for q in qs
            ))
            bounds[-1] = max_dur

            def collate_builder(bound_samples):
                cap = -(-512 * bound_samples // max_samples)  # ceil-scale
                labels = max(64, (cap + 31) // 32 * 32)
                return AudioTextBatchCollate(bound_samples, int(labels))

            self.loader = BucketedDataLoader(
                self.dataset, local_batch, collate_builder,
                durations, bounds, sr, run_length=accum,
                shuffle=m.train_ds.shuffle,
                num_workers=m.train_ds.num_workers,
                shard_id=distributed.process_index(),
                num_shards=distributed.process_count(),
            )
        else:
            self.loader = DataLoader(
                self.dataset, local_batch, self.collate,
                shuffle=m.train_ds.shuffle,
                num_workers=m.train_ds.num_workers,
                shard_id=distributed.process_index(),
                num_shards=distributed.process_count(),
            )

        dec_cfg = getattr(m, "decoder", None)
        blank_pos = dec_cfg.blank_pos if dec_cfg is not None else "vocab_first"
        dec_kw = {}
        if dec_cfg is not None:
            if dec_cfg.conv_layers is not None:
                dec_kw["decoder_convs"] = tuple(dec_cfg.conv_layers)
            dec_kw["upsample_rate"] = dec_cfg.upsample_rate
            dec_kw["upsample_filters"] = dec_cfg.upsample_filters
            for k in ("upsample_norm", "upsample_act", "upsample_dropout"):
                if hasattr(dec_cfg, k):
                    dec_kw[k] = getattr(dec_cfg, k)
        self.model = CTCFinetuneModel(
            self.enc_cfg, tokenizer.vocab_size, blank_pos, **dec_kw
        )
        spec_len = _spec_len(max_samples, sr)
        self.spec_len = spec_len
        self.sample_rate = sr
        self.host_rng = np.random.default_rng(
            1 + distributed.process_index()
        )
        self._micro_buf = []
        specs = jnp.zeros((1, spec_len, self.enc_cfg.num_features))
        lens = jnp.full((1,), spec_len)
        variables = jax.jit(
            self.model.init, static_argnames=("train", "freeze_encoder")
        )({"params": jax.random.PRNGKey(0)}, specs, lens, train=False)
        params = variables["params"]
        if m.pretrain_chkpt_path:
            pre = self._load_pretrain(m.pretrain_chkpt_path)
            params = load_pretrained_encoder(
                params, pre["params"], m.use_teacher_encoder, pre.get("teacher")
            )
        total_steps = m.optim.sched.max_steps if m.optim.sched else 80000
        n_data = self.mesh.shape["data"]
        lr_scale = _lr_scale(m, n_data, self.accum)
        if lr_scale != 1.0 and self.primary:
            print(
                f"lr rescaled x{lr_scale:.3f} "
                f"(data_parallel={n_data}, accum={self.accum}, "
                f"expected_gpu_num={m.expected_gpu_num})"
            )
        self.tx = _make_optimizer(m.optim, total_steps, lr_scale)
        state = CTCTrainState(
            jnp.zeros((), jnp.int32), params,
            variables.get("batch_stats", {}), self.tx.init(params),
        )
        self.fsdp = bool(getattr(cfg.trainer, "fsdp", False))
        state_shardings = None
        if self.fsdp:
            state_shardings = fsdp_shardings(self.mesh, state)
            self.state = jax.tree.map(jax.device_put, state, state_shardings)
        else:
            self.state = replicate(self.mesh, state)
        self._state_shardings = state_shardings
        self.step_fn = make_finetune_step(
            self.model, self.enc_cfg, self.tx, m.freeze_finetune_updates,
            accum_steps=self.accum,
            bf16=(getattr(m, 'precision', 'fp32') == 'bf16'),
            mesh=self.mesh,
            state_shardings=state_shardings,
        )
        # --chkpt_dir (reference run_spiral.py:33) relocates checkpoints
        # away from the log dir when set
        self.ckpt = Checkpointer(ckpt_dir or os.path.join(log_dir, "ckpt"))
        self.tb = None
        if self.primary:
            if exp is not None:
                self.tb = exp.tb
            else:
                try:
                    from tensorboardX import SummaryWriter

                    self.tb = SummaryWriter(log_dir)
                except Exception:
                    self.tb = None
        self.iteration = 0
        from collections import deque

        self._pending = deque()  # in-flight metrics futures

    @staticmethod
    def _load_pretrain(path):
        if path.endswith((".ckpt", ".pt")):
            # reference PyTorch-Lightning checkpoint (ctc_finetune.py:92-95
            # loads these by param-prefix strip; here via compat converter)
            import torch

            from tpu_speech.compat.torch_spiral import convert_st2vec

            sd = torch.load(path, map_location="cpu", weights_only=False)
            params, batch_stats, teacher = convert_st2vec(sd)
            return {
                "params": params,
                "teacher": teacher or None,
                "batch_stats": batch_stats or None,
            }
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(path)
        return {
            "params": restored["params"],
            "teacher": restored.get("teacher"),
        }

    def resume_if_exists(self):
        restored = self.ckpt.restore_latest(jax.device_get(self.state))
        if restored is None:
            return False
        if self._state_shardings is not None:
            self.state = jax.tree.map(
                jax.device_put, restored, self._state_shardings
            )
        else:
            self.state = replicate(self.mesh, restored)
        self.iteration = int(restored.step)
        return True

    def save_archive(self) -> Optional[str]:
        if not self.primary:
            return None
        state = jax.device_get(self.state)
        return _save_run_archive(
            self.log_dir, self.cfg.name or "ctc_finetune", self.cfg,
            state.params, extra={"batch_stats": state.batch_stats},
        )

    def restore_from_archive(self, path: str, partial: bool = False,
                             skip: tuple = ()) -> None:
        """Load a ``.tpu_speech`` archive's weights (params + batch_stats)
        into the live state — serve/test from one shipped file (the
        reference's restore_from, modelPT.py:~900-1268). ``partial``/``skip``
        implement --init_model_partial / --load_model_skip_var
        (reference run_spiral.py:45-47) via utils/surgery.merge_params."""
        from tpu_speech.utils.archive import load_archive
        from tpu_speech.utils.surgery import merge_params

        host = jax.device_get(self.state)
        _, raw_params, extra = load_archive(path)
        params, report = merge_params(
            host.params, raw_params, partial=partial, skip=skip
        )
        if self.primary:
            print(f"archive restore: {report.summary()}")
        state = host.replace(
            params=params,
            batch_stats=extra.get("batch_stats", host.batch_stats),
        )
        if self._state_shardings is not None:
            self.state = jax.tree.map(
                jax.device_put, state, self._state_shardings
            )
        else:
            self.state = replicate(self.mesh, state)

    def restore_from_checkpoint(self, path: str, partial: bool = False,
                                skip: tuple = ()) -> None:
        """Full-model weight init from a saved step checkpoint (the
        reference test-mode load, spiral_pretrain.py:117-121 with
        strict=not partial; skip per --load_model_skip_var)."""
        from tpu_speech.utils.surgery import merge_params

        raw = _raw_checkpoint_tree(path)
        host = jax.device_get(self.state)
        params, report = merge_params(
            host.params, raw.get("params", raw), partial=partial, skip=skip
        )
        if self.primary:
            print(f"checkpoint restore: {report.summary()}")
        state = host.replace(
            params=params,
            batch_stats=raw.get("batch_stats", host.batch_stats),
        )
        if self._state_shardings is not None:
            self.state = jax.tree.map(
                jax.device_put, state, self._state_shardings
            )
        else:
            self.state = replicate(self.mesh, state)

    def _train_masks(self, wav_width, wav_lens):
        """Spec-masking as a SpecAugment-style regularizer during finetune
        training (reference ctc_finetune.py:394-424 passes mask=training
        into the encoder; same host-side mask generation as pretrain).

        wav_width: the batch's padded sample capacity — per-bucket under
        duration bucketing, so the mask width matches wav_to_spec's output."""
        from tpu_speech.models.spiral.masking import make_student_masks

        hop = int(0.01 * self.sample_rate)
        spec_lens = np.ceil(np.asarray(wav_lens) / hop).astype(np.int32)
        spec_len = _spec_len(int(wav_width), self.sample_rate)
        return make_student_masks(
            len(spec_lens), spec_len, self.enc_cfg.num_features,
            spec_lens, self.enc_cfg.mask_prob, self.enc_cfg.mask_length,
            self.enc_cfg.mask_channel_prob, self.enc_cfg.mask_channel_length,
            rng=self.host_rng,
        )

    def _device_batches(self):
        """Yield device-ready finetune batches; runs in the prefetch producer
        thread (see SpiralPretrainRunner._device_batches)."""
        wire = getattr(self.cfg.model.train_ds, "wire_dtype", "int16")
        for raw in self.loader:
            batch = {k: v for k, v in raw.items() if k != "texts"}
            batch["time_mask"], batch["chan_mask"] = self._train_masks(
                batch["wavs"].shape[1], batch["wav_lens"]
            )
            batch = quantize_wire(batch, wire)
            if self.accum > 1:
                # leftovers persist across epochs rather than being dropped
                self._micro_buf.append(batch)
                if len(self._micro_buf) < self.accum:
                    continue
                batch = jax.tree.map(
                    lambda *xs: np.stack(xs), *self._micro_buf
                )
                self._micro_buf = []
                batch = shard_microbatches(self.mesh, batch)
            else:
                batch = shard_batch(self.mesh, batch)
            yield batch

    def train_epoch(self, epoch: int):
        from tpu_speech.data.prefetch import threaded_prefetch

        losses = []
        for batch in threaded_prefetch(self._device_batches):
            self.state, metrics = self.step_fn(
                self.state, batch, step_rng(self.iteration, self.rng_impl),
                iteration=self.iteration,
            )
            # pipelined metric reads (see SpiralPretrainRunner.train_epoch)
            self._pending.append(metrics)
            while len(self._pending) > 2:
                losses.append(
                    float(jax.device_get(self._pending.popleft())["loss"])
                )
            self.iteration += 1
        while self._pending:
            losses.append(
                float(jax.device_get(self._pending.popleft())["loss"])
            )
        if self.primary:
            with open(os.path.join(self.log_dir, "train.log"), "a") as f:
                f.write(f"Epoch {epoch}: ctc loss = {np.mean(losses):.4f}\n")
            self.ckpt.save(self.iteration, jax.device_get(self.state),
                           blocking=False)
        return float(np.mean(losses)) if losses else float("nan")

    def validate(self) -> dict:
        """Validation WER over validation_ds (the reference's
        validation_step WER logging, ctc_finetune.py:440-460)."""
        ds_cfg = self.cfg.model.validation_ds
        if ds_cfg is None:
            return {}
        results = self.evaluate(
            manifest=ds_cfg.manifest_filepath, ds_cfg=ds_cfg
        )
        if self.primary:
            if self.tb is not None:
                self.tb.add_scalar("val/wer", results["wer"], self.iteration)
                self.tb.add_scalar("val/cer", results["cer"], self.iteration)
            with open(os.path.join(self.log_dir, "train.log"), "a") as f:
                f.write(
                    f"Validation: WER = {results['wer']:.4f} | "
                    f"CER = {results['cer']:.4f}\n"
                )
        return results

    def transcribe(self, audio_paths, batch_size: int = 4,
                   overlap_s: float = 3.2, beam_width: int = 1,
                   lm=None, lm_alpha: float = 0.5):
        """Decode a list of wav files -> texts (the reference's
        CTCFinetuneModel.transcribe, ctc_finetune.py:135-170).

        Beyond-reference: audio longer than max_duration is transcribed in
        overlapping max_duration windows whose log-probs are stitched at the
        overlap midpoints before one CTC decode — the reference (and the
        short path here) silently truncates at the crop. ``overlap_s`` must
        exceed the encoder's receptive field so midpoint frames see full
        context from one side or the other."""
        from tpu_speech.data.wav import read_wav

        sr = self.cfg.model.train_ds.sample_rate

        def decode(log_probs, lens):
            if beam_width > 1:
                from tpu_speech.eval.ctc_beam import ctc_beam_search_batch

                return ctc_beam_search_batch(
                    np.asarray(log_probs), np.asarray(lens),
                    blank=self.model.blank_idx, beam_width=beam_width,
                    lm=lm, alpha=lm_alpha,
                )
            return ctc_greedy_decode(
                np.asarray(log_probs), np.asarray(lens), self.model.blank_idx
            )

        texts = [None] * len(audio_paths)
        short = []  # (position, wav)
        for pos, path in enumerate(audio_paths):
            wav, wav_sr = read_wav(path)
            assert wav_sr == sr, (path, wav_sr)
            if len(wav) > self.max_samples:
                lp = self._chunked_log_probs(wav, overlap_s)
                ids = decode(lp[None], np.array([lp.shape[0]]))[0]
                texts[pos] = self.tokenizer.ids_to_text(ids)
            else:
                short.append((pos, wav))
        for i in range(0, len(short), batch_size):
            group = short[i : i + batch_size]
            padded = np.zeros((len(group), self.max_samples), np.float32)
            lens = np.zeros((len(group),), np.int32)
            for j, (_, w) in enumerate(group):
                padded[j, : len(w)] = w
                lens[j] = len(w)
            log_probs, out_lens = self._infer_fn()(
                self.state.params, self.state.batch_stats,
                jnp.asarray(padded), jnp.asarray(lens),
            )
            ids = decode(log_probs, out_lens)
            for (pos, _), seq in zip(group, ids):
                texts[pos] = self.tokenizer.ids_to_text(seq)
        return texts

    def transcribe_streaming(self, audio_paths, feed_seconds: float = 0.5):
        """Chunk-incremental decode (models/spiral/streaming.py): constant
        memory and bounded latency regardless of utterance length. Requires
        a streaming-mode model (encoder.streaming=StreamingCfg(...)) so
        serving matches training exactly; the reference ships incremental
        attention unused (multihead_attention.py:15-465)."""
        from tpu_speech.data.wav import read_wav
        from tpu_speech.models.spiral.streaming import StreamingTranscriber

        assert self.enc_cfg.streaming is not None, (
            "transcribe_streaming requires a streaming-mode model "
            "(set encoder.streaming=StreamingCfg(...) in the config)"
        )
        sr = self.cfg.model.train_ds.sample_rate
        tr = StreamingTranscriber(self.model, self.state.params, batch=1)
        feed = max(1, int(feed_seconds * sr))
        texts = []
        for path in audio_paths:
            wav, wav_sr = read_wav(path)
            assert wav_sr == sr, (path, wav_sr)
            tr.reset()
            for i in range(0, len(wav), feed):
                tr.feed(wav[None, i:i + feed])
            texts.append(self.tokenizer.ids_to_text(tr.flush()[0]))
        return texts

    def evaluate_streaming(self, manifest: Optional[str] = None,
                           feed_seconds: float = 0.5):
        """Test-mode WER decoded through the streaming transcriber — the
        honest deployment metric for a streaming model (every utterance is
        processed chunk-by-chunk with carried caches, not as one window)."""
        from tpu_speech.data.spiral import read_manifest

        manifest = manifest or self.cfg.model.test_ds.manifest_filepath
        entries = read_manifest(manifest, 0.0, None)
        paths = [e["audio_filepath"] for e in entries]
        refs = [e["text"] for e in entries]
        hyps = self.transcribe_streaming(paths, feed_seconds=feed_seconds)
        from tpu_speech.eval.wer import word_error_rate

        wer = word_error_rate(hyps, refs)
        cer = word_error_rate(hyps, refs, use_cer=True)
        return {"wer": wer, "cer": cer, "n": len(refs)}

    def _chunked_log_probs(self, wav: np.ndarray, overlap_s: float
                           ) -> np.ndarray:
        """Run overlapping full-width windows over one long wav and stitch
        their frame log-probs at the overlap midpoints (each kept frame has
        >= overlap/2 of acoustic context on its clipped side)."""
        sr = self.cfg.model.train_ds.sample_rate
        window = self.max_samples
        ov = min(int(overlap_s * sr), window // 2)
        hop = window - ov
        starts = list(range(0, len(wav), hop))
        # drop windows that add no new kept region
        while len(starts) > 1 and starts[-1] + ov >= len(wav):
            starts.pop()
        infer = self._infer_fn()
        pieces = []
        for k, s in enumerate(starts):
            seg = wav[s : s + window]
            padded = np.zeros((1, window), np.float32)
            padded[0, : len(seg)] = seg
            lp, out_len = infer(
                self.state.params, self.state.batch_stats,
                jnp.asarray(padded),
                jnp.asarray(np.array([len(seg)], np.int32)),
            )
            lp = np.asarray(lp)[0]
            f = int(np.asarray(out_len)[0])  # valid frames this window
            frames_per_sample = f / max(len(seg), 1)
            lo = 0 if k == 0 else int(round((ov / 2) * frames_per_sample))
            hi = (
                f if k == len(starts) - 1
                else f - int(round((ov / 2) * frames_per_sample))
            )
            pieces.append(lp[lo:hi])
        return np.concatenate(pieces, axis=0)

    _infer_cache = None

    def _infer_fn(self):
        if self._infer_cache is None:
            @jax.jit
            def infer(params, batch_stats, wavs, wav_lens):
                specs, spec_lens = wav_to_spec(self.enc_cfg, wavs, wav_lens)
                return self.model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    specs, spec_lens, train=False,
                )

            self._infer_cache = infer
        return self._infer_cache

    def export_model(self, path: str, n_samples: Optional[int] = None) -> str:
        """Serialize the wav->log-probs inference graph as a portable
        StableHLO artifact (the reference Exportable's ONNX export analog,
        core/classes/exportable.py)."""
        from tpu_speech.utils.export import export_fn

        n = n_samples or self.max_samples

        def infer(params, batch_stats, wavs, wav_lens):
            specs, spec_lens = wav_to_spec(self.enc_cfg, wavs, wav_lens)
            return self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                specs, spec_lens, train=False,
            )

        state = jax.device_get(self.state)
        example = (
            state.params, state.batch_stats,
            jnp.zeros((1, n), jnp.float32), jnp.full((1,), n, jnp.int32),
        )
        export_fn(infer, example, path)
        return path

    def evaluate(self, manifest: Optional[str] = None, save_logits_dir=None,
                 ds_cfg=None, beam_width: int = 1, lm=None,
                 lm_alpha: float = 0.5):
        """Test-mode WER (spiral_pretrain.py:140-190). ds_cfg selects the
        dataset knobs (sample rate, batch size, workers); defaults to
        test_ds, but validate() passes validation_ds so validation audio is
        not loaded with test-set settings.

        beam_width>1 switches the greedy argmax decode to CTC prefix beam
        search (eval/ctc_beam.py), optionally shallow-fused with ``lm``
        (e.g. NGramLM fit on training transcripts) at weight ``lm_alpha`` —
        beyond-reference: the reference decodes greedy-only.

        Multi-host: the utterances are split round-robin across processes
        (each decodes only its shard, no utterance dropped or duplicated)
        and the raw error counts are all-reduced, so the returned WER/CER
        are exact and identical on every process (the reference's
        dist_sync WER, ctc_finetune.py:119). The HTML diagnosis covers the
        primary's shard in multi-host runs (all utterances single-host)."""
        m = self.cfg.model
        ds_cfg = ds_cfg or m.test_ds or m.validation_ds
        manifest = manifest or ds_cfg.manifest_filepath
        dataset = AudioToTextDataset(
            manifest, self.tokenizer, sample_rate=ds_cfg.sample_rate,
            crop_size=self.max_samples,
        )
        n_proc = distributed.process_count()
        rank = distributed.process_index()
        if n_proc > 1:
            # exact round-robin shard: unlike the training loader there is
            # no per-batch collective, so shards may differ in length
            dataset.entries = dataset.entries[rank::n_proc]
        collate = AudioTextBatchCollate(self.max_samples, 512)
        loader = DataLoader(
            dataset, ds_cfg.batch_size, collate, shuffle=False,
            drop_last=False, num_workers=ds_cfg.num_workers,
        )

        infer = self._infer_fn()
        if n_proc > 1:
            # decode on local devices only: pull one host copy of the
            # globally-replicated state so the per-batch jit stays local
            params, batch_stats = jax.device_get(
                (self.state.params, self.state.batch_stats)
            )
        else:
            params, batch_stats = self.state.params, self.state.batch_stats

        hyps, refs = [], []
        for raw in loader:
            log_probs, lens = infer(
                params, batch_stats,
                jnp.asarray(raw["wavs"]), jnp.asarray(raw["wav_lens"]),
            )
            if beam_width > 1:
                from tpu_speech.eval.ctc_beam import ctc_beam_search_batch

                ids = ctc_beam_search_batch(
                    np.asarray(log_probs), np.asarray(lens),
                    blank=self.model.blank_idx, beam_width=beam_width,
                    lm=lm, alpha=lm_alpha,
                )
            else:
                ids = ctc_greedy_decode(
                    np.asarray(log_probs), np.asarray(lens),
                    self.model.blank_idx,
                )
            for seq, text in zip(ids, raw["texts"]):
                hyps.append(self.tokenizer.ids_to_text(seq))
                refs.append(text)
            if save_logits_dir:
                os.makedirs(save_logits_dir, exist_ok=True)
                np.save(
                    os.path.join(save_logits_dir, f"logits_{len(hyps)}.npy"),
                    np.asarray(log_probs),
                )
        from tpu_speech.eval.wer import error_counts

        w_err, w_tot = error_counts(hyps, refs)
        c_err, c_tot = error_counts(hyps, refs, use_cer=True)
        err_utts = sum(1 for h, r in zip(hyps, refs) if h.split() != r.split())
        counts = distributed.allreduce_sum(
            np.array([w_err, w_tot, c_err, c_tot, len(hyps), err_utts],
                     dtype=np.int64)
        )
        results = {
            "wer": counts[0] / max(counts[1], 1),
            "cer": counts[2] / max(counts[3], 1),
            "n": int(counts[4]),
            "ser": counts[5] / max(counts[4], 1),
        }
        if self.primary:
            # per-utterance alignment diagnosis (compute_wer.py:24-73 /
            # simple_wer_v2.write_html artifact)
            html_path = os.path.join(self.log_dir, "wer_diagnosis.html")
            render_wer_html(hyps, refs, html_path)
            results["diagnosis_html"] = html_path
        return results
