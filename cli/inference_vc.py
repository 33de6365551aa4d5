"""DiffVC voice-conversion CLI (the reference ships this flow as
DiffVC/inference.ipynb): source wav + target wav -> converted wav.

Pipeline: hifi-gan-convention mels -> speaker embedding (GE2E, partials) ->
30-step maximum-likelihood reverse diffusion -> spectral-subtraction denoise
-> HiFi-GAN (or Griffin-Lim fallback) vocoding."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import params_vc as params
from tpu_speech.audio.mel import mel_spectrogram_np
from tpu_speech.audio.vocode import fast_griffin_lim
from tpu_speech.data.wav import read_wav, write_wav
from tpu_speech.models.diffvc.vc import DiffVC, voice_convert
from tpu_speech.models.speaker_encoder import (
    SpeakerEncoder,
    embed_utterance,
    preprocess_wav,
)
from tpu_speech.ops.masks import fix_len_compatibility


def get_mel(wav_path):
    wav, sr = read_wav(wav_path)
    assert sr == params.sampling_rate, f"{wav_path}: {sr}"
    wav = wav[: (len(wav) // params.hop_size) * params.hop_size]
    return mel_spectrogram_np(wav[None])[0]  # (T, 80)


def noise_median_smoothing(x, w=5):
    y = np.copy(x)
    x = np.pad(x, w, "edge")
    for i in range(y.shape[0]):
        med = np.median(x[i : i + 2 * w + 1])
        y[i] = min(x[i + w + 1], med)
    return y


def mel_spectral_subtraction(mel_synth, mel_source, spectral_floor=0.02,
                             silence_window=5, smoothing_window=1):
    """Notebook's denoiser; mels here are (T, F)."""
    ms, msrc = mel_synth.T, mel_source.T  # (F, T)
    mel_len = msrc.shape[-1]
    energy_min, i_min = 1e9, 0
    for i in range(mel_len - silence_window):
        e = np.sum(np.exp(2.0 * msrc[:, i : i + silence_window]))
        if e < energy_min:
            i_min, energy_min = i, e
    noise = np.min(np.exp(2.0 * ms[:, i_min : i_min + silence_window]), axis=-1)
    if smoothing_window is not None:
        noise = noise_median_smoothing(noise, smoothing_window)
    out = np.copy(ms)
    for i in range(mel_len):
        sig = np.exp(2.0 * ms[:, i]) - noise
        est = np.maximum(sig, spectral_floor * noise)
        out[:, i] = np.log(np.sqrt(est))
    return out.T


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-s", "--source", required=True, help="source wav (content)")
    ap.add_argument("-t", "--target", required=True, help="target wav (voice)")
    ap.add_argument("-c", "--checkpoint", required=True, help="DiffVC ckpt (.pt or orbax)")
    ap.add_argument("--spk-encoder", default=None, help="speaker encoder ckpt (.pt)")
    ap.add_argument("-n", "--timesteps", type=int, default=30)
    ap.add_argument("--mode", default="ml", choices=["pf", "em", "ml", "dpm"],
                    help="dpm = DPM-Solver++(2M) on the pf ODE "
                         "(1 net call/step; -n 6 beats pf at 30 steps)")
    ap.add_argument("-o", "--output", default="./out/converted.wav")
    args = ap.parse_args(argv)

    model = DiffVC(
        params.n_mels, params.channels, params.filters, params.heads,
        params.layers, params.kernel, params.dropout, params.window_size,
        params.enc_dim, params.spk_dim, params.use_ref_t, params.dec_dim,
        params.beta_min, params.beta_max,
    )
    if args.checkpoint.endswith(".pt"):
        import torch

        from tpu_speech.compat.torch_diffvc import convert_diffvc

        sd = torch.load(args.checkpoint, map_location="cpu")
        model_params = jax.device_put(
            convert_diffvc(sd, params.use_ref_t, params.layers)
        )
    else:
        import orbax.checkpoint as ocp

        model_params = jax.device_put(
            ocp.StandardCheckpointer().restore(args.checkpoint)
        )

    mel_src = get_mel(args.source)
    mel_tgt = get_mel(args.target)

    # speaker embedding of the target voice
    wav_tgt, sr = read_wav(args.target)
    wav_pre = preprocess_wav(wav_tgt, source_sr=sr)
    spk_model = SpeakerEncoder()
    if args.spk_encoder:
        import torch

        from tpu_speech.compat.torch_speaker_encoder import (
            convert_speaker_encoder,
        )

        sd = torch.load(args.spk_encoder, map_location="cpu")
        spk_params = {"params": convert_speaker_encoder(sd)["params"]}
    else:
        print("WARNING: no speaker-encoder checkpoint; using random init")
        spk_params = spk_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 160, 40))
        )
    c = embed_utterance(spk_model, spk_params, wav_pre)[None]  # (1, 256)

    t_src = fix_len_compatibility(mel_src.shape[0])
    t_tgt = mel_tgt.shape[0]
    x = np.zeros((1, t_src, params.n_mels), np.float32)
    x[0, : mel_src.shape[0]] = mel_src
    xr = mel_tgt[None]

    convert = jax.jit(
        lambda p, x, xl, xr, xrl, c, rng: voice_convert(
            model, p, x, xl, xr, xrl, c, args.timesteps, args.mode, rng
        )
    )
    mean_x, y = convert(
        model_params, jnp.asarray(x), jnp.array([mel_src.shape[0]]),
        jnp.asarray(xr), jnp.array([t_tgt]), jnp.asarray(c),
        jax.random.PRNGKey(0),
    )
    mel_out = np.asarray(y[0, : mel_src.shape[0]])
    mel_out = mel_spectral_subtraction(mel_out, mel_src, smoothing_window=1)

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    wav_out = np.asarray(
        fast_griffin_lim(jnp.asarray(mel_out[None]), n_iters=32)
    )[0]
    write_wav(args.output, wav_out, params.sampling_rate)
    print(f"Wrote {args.output} ({len(wav_out) / params.sampling_rate:.2f}s)")


if __name__ == "__main__":
    main()
