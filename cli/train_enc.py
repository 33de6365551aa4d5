"""DiffVC stage 1: train the average-voice encoder (reference
DiffVC/train_enc.py recipe: masked MSE to phoneme-averaged mels, Adam 5e-4,
batch 128, 300 epochs)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

import params_vc as params
from tpu_speech.data.diffvc import VCEncBatchCollate, VCEncDataset
from tpu_speech.data.loader import DataLoader
from tpu_speech.models.diffvc.encoder import FwdDiffusion
from tpu_speech.train.diffvc import DiffVCTrainer, make_enc_train_step
from tpu_speech.train.state import TrainState


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--exc-file", default=None)
    ap.add_argument("--avg-type", default="mode")
    ap.add_argument("--log-dir", default="logs/enc")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--precision", default="fp32",
                    choices=["fp32", "bf16"],
                    help="bf16: mixed-precision network compute, fp32 "
                         "master weights (train/diffvc.py)")
    ap.add_argument("--lr", type=float, default=5e-4)
    args = ap.parse_args(argv)

    dataset = VCEncDataset(args.data_dir, args.exc_file, args.avg_type,
                           shuffle_seed=params.seed)
    collate = VCEncBatchCollate(params.train_frames, params.n_mels, params.seed)
    loader = DataLoader(dataset, args.batch_size, collate, shuffle=True,
                        num_workers=4, seed=params.seed)

    model = FwdDiffusion(
        params.n_mels, params.channels, params.filters, params.heads,
        params.layers, params.kernel, params.dropout, params.window_size,
        params.enc_dim,
    )
    x = jnp.zeros((1, params.train_frames, params.n_mels))
    mask = jnp.ones((1, params.train_frames, 1))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(params.seed), x, mask, train=False
    )
    n = sum(p.size for p in jax.tree.leaves(variables))
    print(f"Number of encoder parameters = {n / 1e6:.2f}m")

    from tpu_speech.train.diffvc import make_enc_preview
    from tpu_speech.utils.exp_manager import ExpManager

    exp = ExpManager(name="diffvc_enc", explicit_log_dir=args.log_dir)
    exp.save_config(vars(args))
    preview_batch = next(iter(loader))
    tx = optax.adam(args.lr)
    state = TrainState.create({"params": variables["params"]}, tx)
    trainer = DiffVCTrainer(
        make_enc_train_step(model, tx, bf16=(args.precision == "bf16")), state, args.log_dir, exp=exp,
        preview_fn=make_enc_preview(model, preview_batch),
    )
    if trainer.resume_if_exists():
        print(f"Resumed from iteration {trainer.iteration}")
    base_rng = jax.random.PRNGKey(params.seed)
    for epoch in range(1, args.epochs + 1):
        loss = trainer.train_epoch(loader, epoch, base_rng)
        print(f"Epoch {epoch}: loss = {loss:.4f}")
    trainer.ckpt.wait()  # drain the async checkpoint write


if __name__ == "__main__":
    main()
