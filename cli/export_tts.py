"""Export the Grad-TTS serving graph (text ids -> waveform) as StableHLO.

TPU-native analog of the reference's ONNX ``Exportable`` surface
(SPIRAL/nemo/core/classes/exportable.py) for the TTS family the reference
never made exportable: the whole pipeline — encoder, duration/alignment,
lax.scan reverse-SDE, HiFi-GAN vocoder — is lowered as ONE program with the
weights baked in as constants, so any JAX/XLA runtime can serve it without
the Python model definitions (utils/export.py::load_exported, or an
XLA-based server). Static buckets keep one compiled program per shape.

Inputs of the exported fn: (x [B, max_text_len] int32 token ids,
x_lengths [B] int32, seed [] int32[, spk [B] int32]).
Outputs: (wav [B, y_max_length*hop] f32, wav_lengths [B] i32) — or
(mel, y_lengths) when exporting without a vocoder.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_speech.models.grad_tts import GradTTS, synthesize
from tpu_speech.text import symbols
from tpu_speech.utils.export import export_fn, load_exported


def _cast_bf16(tree):
    return jax.tree.map(
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p, tree,
    )


def build_serving_fn(
    model: GradTTS,
    model_params,
    vocoder=None,
    vocoder_params=None,
    n_timesteps: int = 10,
    y_max_length: int = 384,
    max_text_len: int = 128,
    hop_length: int = 256,
    temperature: float = 1.5,
    length_scale: float = 0.91,
    batch_size: int = 1,
    multispeaker: bool = False,
    bf16: bool = False,
):
    """(fn, example_args) for the one-program text->waveform serving graph.

    Weights are closed over (exported as constants). ``seed`` is a runtime
    input so the caller controls the diffusion noise draw.
    """
    if bf16:
        model_params = _cast_bf16(model_params)
        if vocoder_params is not None:
            vocoder_params = _cast_bf16(vocoder_params)

    def fn(x, x_lengths, seed, spk=None):
        rng = jax.random.PRNGKey(seed)
        _, mel, _, y_lengths = synthesize(
            model, model_params, x, x_lengths, n_timesteps=n_timesteps,
            y_max_length=y_max_length, temperature=temperature,
            spk=spk, length_scale=length_scale, rng=rng,
        )
        mel = mel.astype(jnp.float32)
        if vocoder is None:
            return mel, y_lengths
        # zero out padding frames so the waveform tail is silence, then
        # vocode the full bucket (static shapes; caller trims by length)
        frame_valid = (
            jnp.arange(mel.shape[1])[None, :] < y_lengths[:, None]
        )
        mel = jnp.where(frame_valid[:, :, None], mel, 0.0)
        wav = vocoder.apply(
            vocoder_params, mel.astype(
                jnp.bfloat16 if bf16 else jnp.float32)
        ).astype(jnp.float32)
        return wav, y_lengths * hop_length

    x = jnp.zeros((batch_size, max_text_len), dtype=jnp.int32)
    xl = jnp.full((batch_size,), max_text_len, dtype=jnp.int32)
    seed = jnp.zeros((), dtype=jnp.int32)
    if multispeaker:
        spk = jnp.zeros((batch_size,), dtype=jnp.int32)
        return fn, (x, xl, seed, spk)
    return fn, (x, xl, seed)


def main(argv=None):
    # model loading shared with the inference CLI (same checkpoint surface)
    import params
    from inference import load_gradtts_params, load_hifigan

    p = argparse.ArgumentParser()
    p.add_argument("-c", "--checkpoint", type=str, required=True,
                   help="Grad-TTS checkpoint (.pt or orbax dir)")
    p.add_argument("-o", "--output", type=str, required=True,
                   help="output .stablehlo path")
    p.add_argument("-t", "--timesteps", type=int, default=10)
    p.add_argument("--hifigan", type=str, default="./checkpts/hifigan.pt")
    p.add_argument("--hifigan-config", type=str,
                   default="./checkpts/hifigan-config.json")
    p.add_argument("--mel-only", action="store_true",
                   help="export without the vocoder stage")
    p.add_argument("--max-text-len", type=int, default=128)
    p.add_argument("--max-frames", type=int, default=0,
                   help="mel bucket (0 = params.y_max_length_bucket)")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--bf16", action="store_true",
                   help="bake bf16 weights/compute (fp32 outputs)")
    p.add_argument("--platforms", type=str, default="tpu,cpu")
    p.add_argument("--verify", action="store_true",
                   help="reload the artifact and run it on zeros")
    args = p.parse_args(argv)

    model = GradTTS(
        len(symbols) + 1,
        params.n_spks, params.spk_emb_dim,
        params.n_enc_channels, params.filter_channels,
        params.filter_channels_dp, params.n_heads, params.n_enc_layers,
        params.enc_kernel, params.enc_dropout, params.window_size,
        params.n_feats, params.dec_dim, params.beta_min, params.beta_max,
        params.pe_scale,
    )
    model_params = load_gradtts_params(args.checkpoint, params.n_spks)
    vocoder = vocoder_params = None
    if not args.mel_only:
        vocoder, vocoder_params = load_hifigan(
            args.hifigan_config, args.hifigan)
        if vocoder is None:
            print("no vocoder checkpoint found; exporting mel-only")

    fn, ex = build_serving_fn(
        model, model_params, vocoder, vocoder_params,
        n_timesteps=args.timesteps,
        y_max_length=args.max_frames or params.y_max_length_bucket,
        max_text_len=args.max_text_len, hop_length=params.hop_length,
        batch_size=args.batch_size, multispeaker=params.n_spks > 1,
        bf16=args.bf16,
    )
    export_fn(fn, ex, args.output,
              platforms=tuple(args.platforms.split(",")))
    size_mb = os.path.getsize(args.output) / 1e6
    print(f"exported: {args.output} ({size_mb:.1f} MB, "
          f"platforms={args.platforms})")

    if args.verify:
        art = load_exported(args.output)
        outs = art.call(*ex)
        out = np.asarray(outs[0])
        print(f"verify ok: output shape {out.shape}, "
              f"finite={bool(np.isfinite(out).all())}")


if __name__ == "__main__":
    main()
