"""Grad-TTS inference CLI (same signature as the reference
Grad-TTS/inference.py:33-85): -f texts file, -c checkpoint, -t timesteps,
-s speaker id. Synthesizes each line to out/sample_{i}.wav and prints RTF.

Checkpoints: accepts reference PyTorch .pt files (converted on the fly) or
tpu_speech orbax checkpoints. HiFi-GAN vocoder checkpoint via --hifigan
(PyTorch .pt, weight-norm folded at load)."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import params
from tpu_speech.data.wav import write_wav
from tpu_speech.models.grad_tts import GradTTS, synthesize
from tpu_speech.models.hifigan import Generator as HiFiGAN
from tpu_speech.ops.masks import fix_len_compatibility
from tpu_speech.text import CMUDict, intersperse, symbols, text_to_sequence

HIFIGAN_CONFIG = "./checkpts/hifigan-config.json"
HIFIGAN_CHECKPT = "./checkpts/hifigan.pt"


def load_gradtts_params(path, n_spks):
    if path.endswith(".pt"):
        import torch

        from tpu_speech.compat.torch_gradtts import convert_gradtts

        sd = torch.load(path, map_location="cpu")
        return convert_gradtts(sd, n_spks=n_spks)
    if path.endswith(".tpu_speech"):
        # self-contained archive written by GradTTSTrainer.save_archive
        # (the reference .nemo restore_from analog)
        from tpu_speech.utils.archive import load_archive

        _, p, _ = load_archive(path)
        return {"params": p}
    from tpu_speech.utils.checkpoint import Checkpointer

    ckptr = Checkpointer(path)
    import orbax.checkpoint as ocp

    step = ckptr.latest_step()
    restored = ocp.StandardCheckpointer().restore(ckptr._path(step))
    if "params" in restored:
        p = restored["params"]
        return p if "params" in p else {"params": p}
    return restored


def load_hifigan(config_path, ckpt_path):
    if not (os.path.exists(config_path) and os.path.exists(ckpt_path)):
        return None, None
    import torch

    from tpu_speech.compat.torch_hifigan import convert_generator

    with open(config_path) as f:
        h = json.load(f)
    sd = torch.load(ckpt_path, map_location="cpu")
    if "generator" in sd:
        sd = sd["generator"]
    gen = HiFiGAN(
        resblock=h["resblock"],
        upsample_rates=tuple(h["upsample_rates"]),
        upsample_kernel_sizes=tuple(h["upsample_kernel_sizes"]),
        upsample_initial_channel=h["upsample_initial_channel"],
        resblock_kernel_sizes=tuple(h["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(tuple(d) for d in h["resblock_dilation_sizes"]),
    )
    return gen, convert_generator(
        sd, tuple(h["upsample_rates"]), tuple(h["resblock_kernel_sizes"]),
        h["resblock"],
    )


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-f", "--file", type=str, required=True,
                        help="path to a file with texts to synthesize")
    parser.add_argument("-c", "--checkpoint", type=str, required=True,
                        help="path to a checkpoint of Grad-TTS")
    parser.add_argument("-t", "--timesteps", type=int, default=10,
                        help="number of timesteps of reverse diffusion")
    parser.add_argument("-s", "--speaker_id", type=int, default=None,
                        help="speaker id for multispeaker model")
    parser.add_argument("--solver", type=str, default="euler",
                        choices=["euler", "dpm"],
                        help="dpm = DPM-Solver++(2M) on the probability-flow"
                             " ODE (one network call per step); '-t 6"
                             " --solver dpm' is faster AND closer to the"
                             " many-step limit than the default 10-step euler")
    parser.add_argument("--length-scale", type=float, default=0.91,
                        help="duration scale (reference inference.py:76 "
                             "hardcodes 0.91)")
    parser.add_argument("--temperature", type=float, default=1.5,
                        help="z = mu_y + N(0,I)/temperature (reference "
                             "inference.py:76 hardcodes 1.5)")
    parser.add_argument("--hifigan", type=str, default=HIFIGAN_CHECKPT)
    parser.add_argument("--hifigan-config", type=str, default=HIFIGAN_CONFIG)
    parser.add_argument("--out-dir", type=str, default="./out")
    args = parser.parse_args(argv)

    spk = None
    if args.speaker_id is not None:
        assert params.n_spks > 1, "set n_spks in params.py for multispeaker"
        spk = jnp.array([args.speaker_id], dtype=jnp.int32)

    print("Initializing Grad-TTS...")
    model = GradTTS(
        len(symbols) + 1, params.n_spks, params.spk_emb_dim,
        params.n_enc_channels, params.filter_channels, params.filter_channels_dp,
        params.n_heads, params.n_enc_layers, params.enc_kernel,
        params.enc_dropout, params.window_size, params.n_feats, params.dec_dim,
        params.beta_min, params.beta_max, params.pe_scale,
    )
    model_params = jax.device_put(load_gradtts_params(args.checkpoint, params.n_spks))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(model_params))
    print(f"Number of parameters: {n_params}")

    print("Initializing HiFi-GAN...")
    vocoder, vocoder_params = load_hifigan(args.hifigan_config, args.hifigan)
    if vocoder_params is not None:
        vocoder_params = jax.device_put(vocoder_params)
    if vocoder is None:
        print("  (no vocoder checkpoint found; writing mels only)")

    with open(args.file, encoding="utf-8") as f:
        texts = [line.strip() for line in f if line.strip()]
    cmu = CMUDict(params.cmudict_path)
    os.makedirs(args.out_dir, exist_ok=True)

    bucket = params.y_max_length_bucket

    @jax.jit
    def synth(p, x, x_lengths, spk, rng):
        return synthesize(
            model, p, x, x_lengths, n_timesteps=args.timesteps,
            y_max_length=bucket, temperature=args.temperature, stoc=False,
            spk=spk, length_scale=args.length_scale, rng=rng,
            solver=args.solver,
        )

    # vocode emits int16 PCM ON DEVICE — the wav file's payload format —
    # halving the device->host transfer (measured ~7 ms/utterance on the
    # tunneled dev chip)
    vocode = (
        jax.jit(lambda vp, mel: (
            jnp.clip(vocoder.apply(vp, mel).astype(jnp.float32), -1.0, 1.0)
            * 32767.0
        ).astype(jnp.int16))
        if vocoder else None
    )

    for i, text in enumerate(texts):
        print(f"Synthesizing {i} text...", end=" ", flush=True)
        seq = intersperse(text_to_sequence(text, dictionary=cmu), len(symbols))
        # pad token ids to a bucket so every line reuses one compiled program
        x_bucket = ((len(seq) + 31) // 32) * 32
        padded = np.zeros((1, x_bucket), dtype=np.int32)
        padded[0, : len(seq)] = seq
        x = jnp.asarray(padded)
        x_lengths = jnp.array([len(seq)], dtype=jnp.int32)

        t0 = time.perf_counter()
        y_enc, y_dec, attn, y_lengths = synth(
            model_params, x, x_lengths, spk, jax.random.PRNGKey(i)
        )
        y_dec.block_until_ready()
        t = time.perf_counter() - t0
        n_frames = int(y_lengths[0])
        print(f"Grad-TTS RTF: {t * params.sample_rate / (n_frames * params.hop_length)}")

        mel = y_dec[:, :n_frames, :]
        if vocode is not None:
            audio = np.asarray(vocode(vocoder_params, mel))[0]
            write_wav(
                os.path.join(args.out_dir, f"sample_{i}.wav"), audio,
                params.sample_rate,
            )
        else:
            np.save(os.path.join(args.out_dir, f"sample_{i}_mel.npy"),
                    np.asarray(mel[0]))

    print(f"Done. Check out `{args.out_dir}` folder for samples.")


if __name__ == "__main__":
    main()
