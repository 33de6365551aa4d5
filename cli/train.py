"""Grad-TTS single-speaker training CLI (same role/recipe as the reference
Grad-TTS/train.py:59-175): LJSpeech filelist -> mel targets on host workers ->
jitted DP training step on the TPU mesh, TensorBoard + train.log + per-epoch
checkpoints."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import params
from tpu_speech.data.gradtts import TextMelBatchCollate, TextMelDataset
from tpu_speech.data.loader import DataLoader
from tpu_speech.models.grad_tts import GradTTS
from tpu_speech.text import symbols
from tpu_speech.train.gradtts import GradTTSTrainer


def build_model(n_spks=None):
    nsymbols = len(symbols) + 1 if params.add_blank else len(symbols)
    return GradTTS(
        nsymbols, n_spks or params.n_spks, params.spk_emb_dim,
        params.n_enc_channels, params.filter_channels, params.filter_channels_dp,
        params.n_heads, params.n_enc_layers, params.enc_kernel,
        params.enc_dropout, params.window_size, params.n_feats, params.dec_dim,
        params.beta_min, params.beta_max, params.pe_scale,
    )


def init_params(model, seed=0):
    x = jnp.ones((1, 8), dtype=jnp.int32)
    xl = jnp.array([8])
    y = jnp.zeros((1, 16, params.n_feats))
    yl = jnp.array([16])
    spk = jnp.zeros((1,), dtype=jnp.int32) if model.n_spks > 1 else None
    return jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(seed)}, x, xl, y, yl,
        jax.random.PRNGKey(seed + 1), spk=spk, train=False,
    )


def build_preview_batch(dataset, filelist_path, multispeaker, n=3):
    """Fixed synthesis-preview sentences from the test filelist
    (reference test_batch, Grad-TTS/train.py:85-95)."""
    try:
        with open(filelist_path, encoding="utf-8") as f:
            lines = [ln.strip().split("|") for ln in f if ln.strip()][:n]
    except OSError:
        return None
    if not lines:
        return None
    seqs = [dataset.get_text(parts[1]) for parts in lines]
    max_len = max(len(s) for s in seqs)
    x = np.zeros((len(seqs), max_len), dtype=np.int32)
    for i, s in enumerate(seqs):
        x[i, : len(s)] = s
    batch = {
        "x": x,
        "x_lengths": np.array([len(s) for s in seqs], dtype=np.int32),
    }
    if multispeaker:
        batch["spk"] = np.array(
            [int(parts[2]) if len(parts) > 2 else 0 for parts in lines],
            dtype=np.int32,
        )
    return batch


def main(multispeaker: bool = False):
    from tpu_speech.utils.exp_manager import ExpManager

    exp = ExpManager(
        name="gradtts_multi" if multispeaker else "gradtts",
        explicit_log_dir=params.log_dir,
    )
    exp.save_config({
        k: v for k, v in vars(params).items()
        if not k.startswith("_") and isinstance(v, (int, float, str, bool, list, tuple))
    })

    print("Initializing data loaders...")
    dataset = TextMelDataset(
        params.train_filelist_path, params.cmudict_path, params.add_blank,
        params.n_fft, params.n_feats, params.sample_rate, params.hop_length,
        params.win_length, params.f_min, params.f_max,
        multispeaker=multispeaker, shuffle_seed=params.seed,
    )
    collate = TextMelBatchCollate()
    loader = DataLoader(
        dataset, params.batch_size, collate, shuffle=False, drop_last=True,
        num_workers=4, seed=params.seed,
    )

    print("Initializing model...")
    model = build_model(None if not multispeaker else params.n_spks)
    model_params = init_params(model, params.seed)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(model_params))
    print(f"Total parameters: {n / 1e6:.2f}m")

    preview = build_preview_batch(
        dataset, params.test_filelist_path, multispeaker
    )
    trainer = GradTTSTrainer(
        model, model_params, params.log_dir,
        learning_rate=params.learning_rate, out_size=params.out_size,
        save_every=params.save_every,
        bf16=(getattr(params, "precision", "fp32") == "bf16"),
        exp=exp, preview_batch=preview,
    )
    if trainer.resume_if_exists():
        print(f"Resumed from iteration {trainer.iteration}")

    print("Start training...")
    # rbg keys lower the per-step dropout bit generation onto the XLA
    # hardware RngBitGenerator — measured 3.7 ms/step of threefry loop
    # fusions at the bs16 recipe point (round-4 trace); same scheme as the
    # SPIRAL runner (train/spiral.py::step_rng). Set rng_impl='threefry'
    # in params for jax's bit-reproducible default stream.
    base_rng = jax.random.key(
        params.seed, impl=getattr(params, "rng_impl", "rbg"))
    for epoch in range(1, params.n_epochs + 1):
        stats = trainer.train_epoch(loader, epoch, base_rng)
        print(
            f"Epoch {epoch}: dur {stats['dur_loss']:.3f} | "
            f"prior {stats['prior_loss']:.3f} | diff {stats['diff_loss']:.3f}"
        )
    trainer.ckpt.wait()  # drain the async checkpoint write
    archive = trainer.save_archive(
        config={
            k: v for k, v in vars(params).items()
            if not k.startswith("_")
            and isinstance(v, (int, float, str, bool, list, tuple))
        },
        name="gradtts_multi" if multispeaker else "gradtts",
    )
    if archive:
        print(f"saved model archive: {archive}")


if __name__ == "__main__":
    main()
