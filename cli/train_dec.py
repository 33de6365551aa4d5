"""DiffVC stage 2: train the speaker-conditional diffusion decoder with the
frozen stage-1 encoder (reference DiffVC/train_dec.py recipe: Adam 1e-4,
batch 32, 110 epochs)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

import params_vc as params
from tpu_speech.data.diffvc import VCDecBatchCollate, VCDecDataset
from tpu_speech.data.loader import DataLoader
from tpu_speech.models.diffvc.vc import DiffVC
from tpu_speech.train.diffvc import DiffVCTrainer, make_dec_train_step
from tpu_speech.train.state import TrainState


def load_encoder_params(enc_path):
    """Stage-1 checkpoint (ours or reference .pt) -> encoder subtree."""
    if enc_path.endswith(".pt"):
        import torch

        from tpu_speech.compat.torch_diffvc import convert_fwd_diffusion

        sd = torch.load(enc_path, map_location="cpu")
        return convert_fwd_diffusion(sd, "", params.layers)
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(enc_path)
    p = restored["params"]["params"] if "params" in restored else restored
    return p.get("params", p)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--val-file", default=None)
    ap.add_argument("--exc-file", default=None)
    ap.add_argument("--enc-ckpt", required=True,
                    help="stage-1 encoder checkpoint (.pt or orbax dir)")
    ap.add_argument("--log-dir", default="logs/dec")
    ap.add_argument("--epochs", type=int, default=110)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--precision", default="fp32",
                    choices=["fp32", "bf16"],
                    help="bf16: mixed-precision network compute, fp32 "
                         "master weights (train/diffvc.py)")
    ap.add_argument("--lr", type=float, default=1e-4)
    args = ap.parse_args(argv)

    dataset = VCDecDataset(args.data_dir, args.val_file, args.exc_file,
                           shuffle_seed=params.seed)
    collate = VCDecBatchCollate(params.train_frames, params.n_mels, params.seed)
    loader = DataLoader(dataset, args.batch_size, collate, shuffle=True,
                        num_workers=4, seed=params.seed)

    model = DiffVC(
        params.n_mels, params.channels, params.filters, params.heads,
        params.layers, params.kernel, params.dropout, params.window_size,
        params.enc_dim, params.spk_dim, params.use_ref_t, params.dec_dim,
        params.beta_min, params.beta_max,
    )
    x = jnp.zeros((1, params.train_frames, params.n_mels))
    xl = jnp.array([params.train_frames])
    c = jnp.zeros((1, 256))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(params.seed), x, xl, x, c,
        jax.random.PRNGKey(params.seed + 1), train=False,
    )
    model_params = dict(variables["params"])
    model_params["encoder"] = jax.tree.map(
        jnp.asarray, load_encoder_params(args.enc_ckpt)
    )
    n = sum(p.size for p in jax.tree.leaves(model_params))
    print(f"Number of parameters = {n / 1e6:.2f}m")

    from tpu_speech.train.diffvc import make_dec_preview
    from tpu_speech.utils.exp_manager import ExpManager

    exp = ExpManager(name="diffvc_dec", explicit_log_dir=args.log_dir)
    exp.save_config(vars(args))
    preview_batch = next(iter(loader))
    tx = optax.adam(args.lr)
    state = TrainState.create({"params": model_params}, tx)
    trainer = DiffVCTrainer(
        make_dec_train_step(model, tx, bf16=(args.precision == "bf16")), state, args.log_dir, exp=exp,
        preview_fn=make_dec_preview(model, preview_batch),
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
