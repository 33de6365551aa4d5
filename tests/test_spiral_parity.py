"""SPIRAL component parity vs minimal torch twins (the reference NeMo fork
cannot be imported here — pytorch_lightning/omegaconf are absent — so these
twins replicate the exact reference ops: TF-pad convs, fairseq MHA layer,
weight-normed conv positional embedding, NeMo featurizer, torch CTC)."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_speech.models.spiral.conv_layers import Conv1dTF, create_pad_mask  # noqa: E402
from tpu_speech.models.spiral.features import filterbank_features  # noqa: E402
from tpu_speech.models.spiral.wav2vec import (  # noqa: E402
    ConvPositionalEmbedding,
    TransformerSentenceEncoderLayer,
)
from tpu_speech.models.spiral.ctc import ctc_loss  # noqa: E402


def test_conv1d_tf_pad_parity(rng):
    """TF 'same' pad with stride 2 must match the reference Conv wrapper
    (convolution_layers.py:213-254), including the channel-parity quirk."""
    b, t, cin, cout, k, s = 2, 20, 4, 6, 5, 2  # even cin -> asymmetric pad
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    lens = np.array([20, 15], dtype=np.int32)

    conv = Conv1dTF(cout, k, s)
    params = conv.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(lens), None
    )
    y, out_lens, _ = conv.apply(
        params, jnp.asarray(x), jnp.asarray(lens),
        jnp.asarray(create_pad_mask(jnp.asarray(lens), t)),
    )

    # torch twin: mask fill -> F.pad (k//2-1, k//2) -> conv stride 2 pad 0
    w = np.asarray(params["params"]["kernel"]).transpose(2, 1, 0)  # (out,in,k)
    bias = np.asarray(params["params"]["bias"])
    xt = torch.from_numpy(x.transpose(0, 2, 1)).clone()
    mask = torch.arange(t)[None, :] >= torch.from_numpy(lens)[:, None]
    xt = xt.masked_fill(mask.unsqueeze(1), 0.0)
    xt = F.pad(xt, (k // 2 - 1, k // 2))
    want = F.conv1d(
        xt, torch.from_numpy(w.copy()), torch.from_numpy(bias), stride=s
    )
    np.testing.assert_allclose(
        np.asarray(y), want.numpy().transpose(0, 2, 1), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(out_lens), [10, 8])  # ceil(l/2)


class TorchFairseqLayer(torch.nn.Module):
    """Twin of TransformerSentenceEncoderLayer (wav2vec.py:219-322), pre-LN."""

    def __init__(self, d, ffn, heads):
        super().__init__()
        self.attn = torch.nn.MultiheadAttention(d, heads, batch_first=True)
        self.ln1 = torch.nn.LayerNorm(d)
        self.ln2 = torch.nn.LayerNorm(d)
        self.fc1 = torch.nn.Linear(d, ffn)
        self.fc2 = torch.nn.Linear(ffn, d)

    def forward(self, x, key_padding_mask):
        r = x
        h = self.ln1(x)
        h, _ = self.attn(h, h, h, key_padding_mask=key_padding_mask,
                         need_weights=False)
        x = r + h
        r = x
        h = self.ln2(x)
        h = self.fc2(F.gelu(self.fc1(h)))
        return r + h


def test_transformer_layer_parity(rng):
    d, ffn, heads, b, t = 16, 32, 4, 2, 10
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    lens = np.array([10, 7])
    pad = np.arange(t)[None, :] >= lens[:, None]

    torch.manual_seed(0)
    tm = TorchFairseqLayer(d, ffn, heads)
    tm.eval()
    with torch.no_grad():
        want = tm(torch.from_numpy(x), torch.from_numpy(pad)).numpy()

    # map torch params -> flax tree
    ip_w = tm.attn.in_proj_weight.detach().numpy()
    ip_b = tm.attn.in_proj_bias.detach().numpy()
    params = {
        "self_attn": {
            "q_proj": {"kernel": ip_w[:d].T, "bias": ip_b[:d]},
            "k_proj": {"kernel": ip_w[d : 2 * d].T, "bias": ip_b[d : 2 * d]},
            "v_proj": {"kernel": ip_w[2 * d :].T, "bias": ip_b[2 * d :]},
            "out_proj": {
                "kernel": tm.attn.out_proj.weight.detach().numpy().T,
                "bias": tm.attn.out_proj.bias.detach().numpy(),
            },
        },
        "self_attn_layer_norm": {
            "scale": tm.ln1.weight.detach().numpy(),
            "bias": tm.ln1.bias.detach().numpy(),
        },
        "final_layer_norm": {
            "scale": tm.ln2.weight.detach().numpy(),
            "bias": tm.ln2.bias.detach().numpy(),
        },
        "fc1": {"kernel": tm.fc1.weight.detach().numpy().T,
                "bias": tm.fc1.bias.detach().numpy()},
        "fc2": {"kernel": tm.fc2.weight.detach().numpy().T,
                "bias": tm.fc2.bias.detach().numpy()},
    }
    layer = TransformerSentenceEncoderLayer(d, ffn, heads, 0.0, 0.0, 0.0,
                                            "gelu", True)
    got = layer.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(pad), train=False
    )
    # padded positions diverge (torch NaNs them); compare valid frames only
    for i in range(b):
        np.testing.assert_allclose(
            np.asarray(got[i, : lens[i]]), want[i, : lens[i]], atol=2e-5
        )


def test_conv_pos_embedding_parity(rng):
    d, g, k, b, t = 16, 4, 8, 2, 12
    x = rng.standard_normal((b, t, d)).astype(np.float32)

    torch.manual_seed(0)
    conv = torch.nn.Conv1d(d, d, k, padding=k // 2, groups=g)
    conv = torch.nn.utils.weight_norm(conv, name="weight", dim=2)
    conv.eval()
    with torch.no_grad():
        y = conv(torch.from_numpy(x.transpose(0, 2, 1)))
        y = y[:, :, :-1]  # SamePad for even kernel
        want = F.gelu(y).numpy().transpose(0, 2, 1)

    wg = conv.weight_g.detach().numpy()  # (1, 1, k)
    wv = conv.weight_v.detach().numpy()  # (out, in/g, k)
    params = {
        "g": wg[0, 0, :],
        "v": wv.transpose(2, 1, 0),  # (k, in/g, out)
        "bias": conv.bias.detach().numpy(),
    }
    mod = ConvPositionalEmbedding(d, k, g)
    got = mod.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_filterbank_features_matches_torch_pipeline(rng):
    """NeMo featurizer semantics vs a direct torch.stft implementation."""
    sr, win, hop, nfilt = 16000, 320, 160, 32
    n_fft = 512
    wavs = (rng.standard_normal((2, 8000)) * 0.1).astype(np.float32)
    lens = np.array([8000, 6400], dtype=np.int32)

    got, got_lens = filterbank_features(
        jnp.asarray(wavs), jnp.asarray(lens), sample_rate=sr, nfilt=nfilt,
        dither=0.0, training=False, do_normalize_time_domain=True,
    )

    # torch twin
    from tpu_speech.audio.mel import mel_filterbank

    x = torch.from_numpy(wavs)
    x = x / (x.abs().max(dim=1, keepdim=True).values + 1e-5)
    x = torch.cat((x[:, :1], x[:, 1:] - 0.97 * x[:, :-1]), dim=1)
    window = torch.hann_window(win, periodic=False)
    spec = torch.stft(x, n_fft, hop_length=hop, win_length=win, window=window,
                      center=True, return_complex=True)
    mag2 = spec.real**2 + spec.imag**2
    fb = torch.from_numpy(np.asarray(mel_filterbank(sr, n_fft, nfilt, 0.0, sr / 2)))
    mel = torch.log(fb @ mag2 + 2.0**-24)  # (B, nfilt, T)
    want_lens = np.ceil(lens / hop).astype(np.int64)
    for i in range(2):
        v = mel[i, :, : want_lens[i]]
        m = v.mean(dim=1, keepdim=True)
        s = v.std(dim=1, keepdim=True) + 1e-5
        mel[i] = (mel[i] - m) / s
    want = mel.numpy().transpose(0, 2, 1)

    assert list(np.asarray(got_lens)) == list(want_lens)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(got[i, : want_lens[i]]), want[i, : want_lens[i]],
            atol=2e-3,
        )


def test_ctc_loss_matches_torch(rng):
    b, t, k = 3, 20, 6
    logits = rng.standard_normal((b, t, k)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    logit_lens = np.array([20, 16, 12], dtype=np.int32)
    labels = rng.integers(1, k, size=(b, 8)).astype(np.int32)
    label_lens = np.array([8, 5, 3], dtype=np.int32)

    got = float(ctc_loss(log_probs, jnp.asarray(logit_lens),
                         jnp.asarray(labels), jnp.asarray(label_lens), 0))

    tl = torch.nn.CTCLoss(blank=0, reduction="mean", zero_infinity=False)
    lp = torch.from_numpy(np.asarray(log_probs)).transpose(0, 1).contiguous()
    # torch expects (T, B, K)
    lp = torch.from_numpy(np.asarray(log_probs)).permute(1, 0, 2)
    want = tl(lp, torch.from_numpy(labels).long(),
              torch.from_numpy(logit_lens).long(),
              torch.from_numpy(label_lens).long())
    # torch 'mean' divides each sequence loss by label_len then averages;
    # optax returns per-sequence losses -> replicate torch reduction
    per_seq = np.asarray(
        __import__("optax").ctc_loss(
            log_probs,
            (np.arange(t)[None] >= logit_lens[:, None]).astype(np.float32),
            labels,
            (np.arange(8)[None] >= label_lens[:, None]).astype(np.float32),
            blank_id=0,
        )
    )
    torch_style = float(np.mean(per_seq / label_lens))
    assert np.isclose(torch_style, float(want), rtol=1e-4), (torch_style, float(want))
    # and our mean-of-sums variant is finite/positive
    assert got > 0
