"""Chunk-incremental (streaming) inference for SPIRAL CTC models.

The reference vendors fairseq's incremental-state plumbing in its attention
(SPIRAL/nemo/collections/asr/parts/multihead_attention.py:15-465) but never
trains or serves a streaming model with it. Here streaming is a first-class
mode designed for train/serve parity:

- TRAIN: build the model with ``ST2VecConfig(streaming=StreamingCfg(...))``
  (encoder.py) — causal convs, causal positional conv, block-chunked
  attention, and a causal cumulative featurizer normalization
  (``normalize="per_feature_causal"``, features.py). This is an ordinary
  offline forward; all existing training machinery applies.
- SERVE: ``make_stream_step`` builds a jitted per-chunk step that carries
  per-layer KV caches (attention), (k-1)-frame input caches (convs and the
  positional conv), and cumulative normalization stats. Its chunked outputs
  equal the offline streaming-mode forward up to float reassociation
  (asserted at atol=2e-4 fp32, tests/test_streaming.py — the chunked compute
  reassociates reductions, e.g. block-summed vs cumsum normalization stats,
  so BIT-exactness is not claimed), and the collapsed greedy transcript is
  asserted EQUAL. The model sees the same function at train and serve time
  by construction; there is no architectural train/serve mismatch to tune
  around (contrast: offline-trained models served with chunked attention).

The per-chunk step is one fused jit program with static shapes: the KV caches
are fixed-size (left_chunks * chunk) buffers rolled by concatenate+slice, so
XLA sees the same executable every chunk.

Parameters are consumed directly from the offline model's tree (same names:
``block{b}_conv{c}/conv``, ``block{b}_transformer/layer_{i}/self_attn/q_proj``
etc.) — no conversion step.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_speech.audio.mel import frame_signal
from tpu_speech.models.spiral.encoder import StreamingCfg  # noqa: F401 (re-export)
from tpu_speech.models.spiral.features import (
    CONSTANT,
    hann_window_symmetric,
    mel_filterbank,
)

# ---------------------------------------------------------------------------
# functional primitives operating on offline param subtrees
# ---------------------------------------------------------------------------


def _dense(p, x):
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _layer_norm(p, x, eps):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(m)
    y = (x - m) * jax.lax.rsqrt(v + eps)
    return y * p["scale"] + p["bias"]


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _conv1d_valid(w, x, stride):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )


# ---------------------------------------------------------------------------
# incremental layers; each returns (output, new_cache)
# ---------------------------------------------------------------------------


def _conv_norm_act_chunk(p, cache, x_new, kernel, stride, norm_type,
                         act_func, ln_eps=1e-5):
    """Incremental ConvNormAct (conv_layers.py): cache is the (k-1)-frame
    input tail at this layer's input level; emits exactly
    x_new.shape[1] // stride causal outputs."""
    if kernel > 1:
        x = jnp.concatenate([cache, x_new], axis=1)
        new_cache = x[:, -(kernel - 1):]
    else:
        x = x_new
        new_cache = cache  # zero-width
    y = _conv1d_valid(p["conv"]["kernel"], x, stride)
    if "bias" in p["conv"]:
        y = y + p["conv"]["bias"]
    if norm_type == "ln":
        y = _layer_norm(p["norm"], y, ln_eps)
    if act_func == "relu":
        y = jax.nn.relu(y)
    elif act_func == "hardtanh":
        y = jnp.clip(y, -1.0, 1.0)
    return y, new_cache


def _pos_conv_chunk(p, cache, x_new, kernel, groups):
    """Incremental causal ConvPositionalEmbedding (wav2vec.py): weight-norm
    grouped conv over [cache(k-1), new] with VALID padding + exact GELU."""
    v, gmag, b = p["v"], p["g"], p["bias"]
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(1, 2), keepdims=True))
    w = v / jnp.maximum(norm, 1e-12) * gmag[:, None, None]
    x = jnp.concatenate([cache, x_new], axis=1)
    new_cache = x[:, -(kernel - 1):]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=groups,
    ) + b
    return _gelu(y), new_cache


def _mha_chunk(p, x_new, k_cache, v_cache, key_valid, num_heads):
    """Incremental block-chunked self-attention: queries are the new chunk;
    keys/values are [cache (left_chunks * C frames), new chunk]. The rolled
    caches store projected K/V, so cached frames are never re-projected —
    true fairseq-style incremental state, with static shapes."""
    bsz, c, d = x_new.shape
    dh = d // num_heads
    q = (_dense(p["q_proj"], x_new) * dh ** -0.5).reshape(bsz, c, num_heads, dh)
    k_new = _dense(p["k_proj"], x_new).reshape(bsz, c, num_heads, dh)
    v_new = _dense(p["v_proj"], x_new).reshape(bsz, c, num_heads, dh)
    k_all = jnp.concatenate([k_cache, k_new], axis=1)  # (B, L+C, H, Dh)
    v_all = jnp.concatenate([v_cache, v_new], axis=1)
    scores = jnp.einsum("bthd,bshd->bhts", q, k_all)
    scores = jnp.where(key_valid[:, None, None, :], scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", probs, v_all).reshape(bsz, c, d)
    return _dense(p["out_proj"], out), k_all[:, c:], v_all[:, c:]


def _transformer_chunk(p, st, x_new, tcfg, key_valid):
    """Incremental TransformerEncoder (pre-LN only, as SPIRAL uses).

    st: {"pos": pos-conv input cache, "kv": [(k_cache, v_cache)] per layer}.
    key_valid: (B, L+C) — False at cache slots from before stream start and
    at padded frames of a final partial chunk.
    """
    assert tcfg.layer_norm_first, "streaming supports pre-LN stacks"
    pos, new_pos_cache = _pos_conv_chunk(
        p["pos_conv"], st["pos"], x_new, tcfg.conv_pos, tcfg.conv_pos_groups
    )
    x = x_new + pos
    new_kv = []
    for i in range(tcfg.encoder_layers):
        lp = p[f"layer_{i}"]
        h = _layer_norm(lp["self_attn_layer_norm"], x, 1e-6)
        attn, kc, vc = _mha_chunk(
            lp["self_attn"], h, st["kv"][i][0], st["kv"][i][1], key_valid,
            tcfg.num_attention_heads,
        )
        new_kv.append((kc, vc))
        x = x + attn
        h = _layer_norm(lp["final_layer_norm"], x, 1e-6)
        if tcfg.activation_fn == "gelu":
            h = _gelu(_dense(lp["fc1"], h))
        else:
            h = jax.nn.relu(_dense(lp["fc1"], h))
        h = _dense(lp["fc2"], h)
        x = x + h
    x = _layer_norm(p["layer_norm"], x, 1e-6)
    return x, {"pos": new_pos_cache, "kv": new_kv}


# ---------------------------------------------------------------------------
# featurizer: chunked log-mel + causal cumulative normalization
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _FeatSpec:
    sample_rate: int
    nfilt: int
    win_length: int
    hop: int
    n_fft: int
    preemph: float
    log_guard: float

    @property
    def pad(self) -> int:
        return self.n_fft // 2

    @property
    def overlap(self) -> int:  # padded samples shared between frame blocks
        return self.n_fft - self.hop


def feat_spec(sample_rate=16000, nfilt=128, window_size=0.02,
              window_stride=0.01, preemph=0.97,
              log_guard=2.0 ** -24) -> _FeatSpec:
    win = int(window_size * sample_rate)
    return _FeatSpec(
        sample_rate=sample_rate, nfilt=nfilt, win_length=win,
        hop=int(window_stride * sample_rate),
        n_fft=2 ** math.ceil(math.log2(win)),
        preemph=preemph, log_guard=log_guard,
    )


def _logmel_window(spec: _FeatSpec, window, fb, x_padded):
    """x_padded: (B, W + overlap) preemphasized+padded samples -> (B, F, M)
    log-mels, mirroring features.filterbank_features' rfft pipeline op for
    op (sqrt -> square for mag_power=2) so streaming == offline bit-close."""
    frames = frame_signal(x_padded, spec.n_fft, spec.hop) * window
    z = jnp.fft.rfft(frames, axis=-1)
    mag = jnp.sqrt(jnp.real(z) ** 2 + jnp.imag(z) ** 2) ** 2
    return jnp.log(mag @ fb.T + spec.log_guard)


def _causal_normalize(feats, valid, cnt, s1, s2):
    """Per-feature cumulative mean / Bessel-var normalization, continuing the
    carried (count, sum, sum-of-squares). valid: (B, F) 1.0 at real frames."""
    vm = valid[:, :, None]
    ccnt = cnt[:, None, :] + jnp.cumsum(vm, axis=1)  # (B, F, 1)
    cs1 = s1[:, None, :] + jnp.cumsum(feats * vm, axis=1)
    cs2 = s2[:, None, :] + jnp.cumsum(jnp.square(feats) * vm, axis=1)
    mean = cs1 / jnp.maximum(ccnt, 1.0)
    var = (cs2 - ccnt * jnp.square(mean)) / jnp.maximum(ccnt - 1.0, 1.0)
    std = jnp.sqrt(jnp.maximum(var, 0.0)) + CONSTANT
    out = (feats - mean) / std
    return out, ccnt[:, -1, :], cs1[:, -1, :], cs2[:, -1, :]


# ---------------------------------------------------------------------------
# stream state + step builder
# ---------------------------------------------------------------------------


def _zeros(b, t, c, dtype=jnp.float32):
    return jnp.zeros((b, max(t, 0), c), dtype=dtype)


def make_stream_step(model, params: Dict[str, Any],
                     feat: Optional[_FeatSpec] = None):
    """Build (init_state, step) for a streaming-mode CTCFinetuneModel.

    model.encoder_cfg.streaming must be set; the offline params tree (from
    training / archive restore) is closed over unchanged.

    step(state, window, n_valid) -> (state, log_probs, ids)
      window:  (B, chunk_samples + feat.overlap) preemphasized, padded
               samples (StreamingTranscriber assembles these host-side)
      n_valid: (B,) number of REAL spec frames in this chunk (chunk_frames
               except for the flush chunk)
      log_probs: (B, frames_per_chunk_out, V); ids: greedy argmax per frame.
    """
    cfg = model.encoder_cfg
    stream = cfg.streaming
    assert stream is not None, "model must be built with streaming=StreamingCfg(...)"
    if feat is None:
        feat = feat_spec(sample_rate=cfg.sample_rate, nfilt=cfg.num_features)
    chunk = stream.chunk_frames
    left = stream.left_chunks

    window_np = hann_window_symmetric(feat.win_length)
    lpad = (feat.n_fft - feat.win_length) // 2
    window_np = np.pad(
        window_np, (lpad, feat.n_fft - feat.win_length - lpad)
    )
    fb_np = mel_filterbank(
        feat.sample_rate, feat.n_fft, feat.nfilt, 0.0, feat.sample_rate / 2
    )
    # keep as numpy: device arrays closed over by the jitted step would be
    # fetched back at lowering (blocking round trip on remote harnesses)
    window_dev = window_np.astype(np.float32)
    fb_dev = fb_np.astype(np.float32)

    # NOTE: the param trees are NOT closed over by the jitted step — they are
    # threaded through as jit arguments (see the wrapper at the bottom).
    # Closing over ~100 M device-array params inlines them as program
    # CONSTANTS at lowering: a ~400 MB MLIR module that exceeds remote
    # compile request limits (observed HTTP 413) and forces a blocking
    # host fetch per leaf.
    all_params = {
        "enc": params["encoder"]["feature_encoder"],
        "dec": params["decoder"],
    }

    # static per-block geometry
    blocks = []
    cum = 1
    for bi, blk in enumerate(cfg.blocks):
        convs = []
        for ci, c in enumerate(blk.conv_layers):
            convs.append((bi, ci, c, cum))
            cum *= c.stride[0]
        blocks.append((convs, blk.transformer, cum))
    total_sub = cum
    assert chunk % total_sub == 0

    dec = model.decoder if hasattr(model, "decoder") else None

    def init_state(batch: int):
        st: Dict[str, Any] = {
            "cnt": jnp.zeros((batch, feat.nfilt)),
            "s1": jnp.zeros((batch, feat.nfilt)),
            "s2": jnp.zeros((batch, feat.nfilt)),
            "chunk_idx": jnp.zeros((), jnp.int32),
            "enc": [],
            "dec": {},
        }
        in_ch = feat.nfilt
        for convs, tcfg, cum_after in blocks:
            bst: Dict[str, Any] = {"convs": [], "tfm": None}
            for _, _, c, _ in convs:
                bst["convs"].append(_zeros(batch, c.kernel_size[0] - 1, in_ch))
                in_ch = c.filters
            if tcfg is not None:
                c_level = chunk // cum_after
                bst["tfm"] = {
                    "pos": _zeros(batch, tcfg.conv_pos - 1, in_ch),
                    "kv": [
                        (
                            jnp.zeros((batch, left * c_level,
                                       tcfg.num_attention_heads,
                                       in_ch // tcfg.num_attention_heads)),
                            jnp.zeros((batch, left * c_level,
                                       tcfg.num_attention_heads,
                                       in_ch // tcfg.num_attention_heads)),
                        )
                        for _ in range(tcfg.encoder_layers)
                    ],
                }
                in_ch = tcfg.embedding_dim
            st["enc"].append(bst)
        # decoder caches
        if model.upsample_rate is not None:
            st["dec"]["up"] = _zeros(batch, 4, in_ch)  # k=5
            in_ch = model.upsample_filters
        for i, c in enumerate(model.decoder_convs):
            st["dec"][f"conv_{i}"] = _zeros(
                batch, c.kernel_size[0] - 1, in_ch
            )
            in_ch = c.filters
        return st

    def step(p, state, window, n_valid):
        eparams, dparams = p["enc"], p["dec"]
        feats = _logmel_window(feat, window_dev, fb_dev, window)  # (B,chunk,M)
        fvalid = (
            jnp.arange(chunk)[None, :] < n_valid[:, None]
        ).astype(feats.dtype)
        x, cnt, s1, s2 = _causal_normalize(
            feats, fvalid, state["cnt"], state["s1"], state["s2"]
        )
        x = x * fvalid[:, :, None]  # offline zeroes padded frames (pad_value)
        new_state = {
            "cnt": cnt, "s1": s1, "s2": s2,
            "chunk_idx": state["chunk_idx"] + 1,
            "enc": [], "dec": {},
        }
        j = state["chunk_idx"]
        lens = n_valid
        for (convs, tcfg, cum_after), bst in zip(blocks, state["enc"]):
            nbst: Dict[str, Any] = {"convs": [], "tfm": None}
            for bi, ci, c, _ in convs:
                x, cache = _conv_norm_act_chunk(
                    eparams[f"block{bi}_conv{ci}"], bst["convs"][ci], x,
                    c.kernel_size[0], c.stride[0], c.norm_type, c.act_func,
                )
                nbst["convs"].append(cache)
                if c.stride[0] > 1:
                    lens = (lens + c.stride[0] - 1) // c.stride[0]
            if tcfg is not None:
                c_level = chunk // cum_after
                # key validity: cache slot m holds global frame
                # (j - left) * C + m; new frames valid up to `lens`
                cache_pos = jnp.arange(left * c_level)
                cache_valid = (
                    (j - left) * c_level + cache_pos >= 0
                )[None, :] & jnp.ones(
                    (x.shape[0], 1), bool
                )
                new_valid = (
                    jnp.arange(c_level)[None, :] < lens[:, None]
                )
                key_valid = jnp.concatenate(
                    [cache_valid, new_valid], axis=1
                )
                bname = f"block{bi}_transformer"
                x = jnp.where(new_valid[:, :, None], x, 0.0)
                x, ntfm = _transformer_chunk(
                    eparams[bname], bst["tfm"], x, tcfg, key_valid
                )
                nbst["tfm"] = ntfm
            new_state["enc"].append(nbst)

        # decoder (causal)
        if model.upsample_rate is not None:
            up = dparams["proj_upsampling"]
            xin = jnp.concatenate([state["dec"]["up"], x], axis=1)
            new_state["dec"]["up"] = xin[:, -4:]
            y = _conv1d_valid(up["proj"]["kernel"], xin, 1)
            if "bias" in up["proj"]:
                y = y + up["proj"]["bias"]
            b_, t_, _ = y.shape
            y = y.reshape(b_, t_ * model.upsample_rate, model.upsample_filters)
            if model.upsample_norm == "ln":
                y = _layer_norm(up["norm"], y, 1e-5)
            if model.upsample_act == "relu":
                y = jax.nn.relu(y)
            x = y
            lens = lens * model.upsample_rate
        for i, c in enumerate(model.decoder_convs):
            x, cache = _conv_norm_act_chunk(
                dparams[f"conv_{i}"], state["dec"][f"conv_{i}"], x,
                c.kernel_size[0], c.stride[0], c.norm_type, c.act_func,
            )
            new_state["dec"][f"conv_{i}"] = cache
        logits = _dense(dparams["decoder_proj"], x)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return new_state, log_probs, jnp.argmax(log_probs, axis=-1), lens

    jit_step = jax.jit(step)

    def bound_step(state, window, n_valid):
        return jit_step(all_params, state, window, n_valid)

    # do NOT wrap bound_step in another jit or a lax.scan: tracing through
    # the wrapper re-captures the param trees as program CONSTANTS, which
    # is exactly the oversized-program failure this structure avoids.
    # Exposed for tests (tests/test_no_device_constants.py):
    bound_step._jit_step = jit_step
    bound_step._params = all_params
    return init_state, bound_step


class StreamingTranscriber:
    """Host-side streaming driver: buffers raw samples, assembles fixed-shape
    preemphasized windows, runs the jitted chunk step, and carries greedy-CTC
    collapse state across chunks.

    feed(wav) accepts arbitrary-length float32 chunks; flush() processes the
    reflect-padded tail and returns the remaining ids. Token ids are
    blank/ repeat-collapsed across chunk boundaries (prev-token carry).
    """

    def __init__(self, model, params, batch: int = 1,
                 feat: Optional[_FeatSpec] = None):
        cfg = model.encoder_cfg
        self.feat = feat or feat_spec(
            sample_rate=cfg.sample_rate, nfilt=cfg.num_features
        )
        self.chunk = cfg.streaming.chunk_frames
        self.chunk_samples = self.chunk * self.feat.hop
        self.blank = model.blank_idx
        self.batch = batch
        self.init_state, self.step = make_stream_step(model, params, self.feat)
        self.reset()

    def reset(self):
        self.state = self.init_state(self.batch)
        # preemphasized + left-reflect-padded sample stream (host numpy)
        self._padded = [
            np.zeros((0,), np.float32) for _ in range(self.batch)
        ]
        self._raw_n = 0
        self._prev_raw = np.zeros((self.batch,), np.float32)
        self._started = False
        self._consumed = 0  # padded samples consumed into emitted windows
        self._prev_tok = np.full((self.batch,), -1, np.int64)
        self._ids: List[List[int]] = [[] for _ in range(self.batch)]
        self._tail_raw = [
            np.zeros((0,), np.float32) for _ in range(self.batch)
        ]

    def _preemph_extend(self, wav: np.ndarray):
        """wav: (B, n) new raw samples -> append preemphasized samples (and
        the 256-sample reflect pad at stream start) to the padded stream."""
        p = wav - self.feat.preemph * np.concatenate(
            [self._prev_raw[:, None], wav[:, :-1]], axis=1
        )
        if not self._started:
            p[:, 0] = wav[:, 0]  # offline keeps x[0] unmodified
        self._prev_raw = wav[:, -1].copy()
        for b in range(self.batch):
            self._padded[b] = np.concatenate([self._padded[b], p[b]])
        self._raw_n += wav.shape[1]
        if not self._started and self._raw_n > self.feat.pad:
            # left reflect pad of the preemphasized signal (features.py:92)
            for b in range(self.batch):
                head = self._padded[b][1:self.feat.pad + 1][::-1]
                self._padded[b] = np.concatenate([head, self._padded[b]])
            self._started = True

    def _emit_ready(self, final_valid: Optional[np.ndarray] = None):
        W, OV = self.chunk_samples, self.feat.overlap
        while self._started and all(
            len(pb) - self._consumed >= W + OV for pb in self._padded
        ):
            win = np.stack([
                pb[self._consumed:self._consumed + W + OV]
                for pb in self._padded
            ])
            self._consumed += W
            if final_valid is not None and all(
                len(pb) - self._consumed < W + OV for pb in self._padded
            ):
                nv = final_valid
            else:
                nv = np.full((self.batch,), self.chunk, np.int32)
            self.state, _, ids, lens = self.step(
                self.state, jnp.asarray(win), jnp.asarray(nv)
            )
            ids = np.asarray(ids)
            lens = np.asarray(lens)
            for b in range(self.batch):
                for t in range(int(lens[b])):
                    tok = int(ids[b, t])
                    if tok != self.blank and tok != self._prev_tok[b]:
                        self._ids[b].append(tok)
                    self._prev_tok[b] = tok

    def feed(self, wav: np.ndarray):
        """wav: (B, n) or (n,) raw float32 samples."""
        if wav.ndim == 1:
            wav = wav[None, :]
        assert wav.shape[0] == self.batch
        self._preemph_extend(wav.astype(np.float32))
        self._emit_ready()

    def flush(self) -> List[List[int]]:
        """Reflect-pad the tail (features.py right pad), zero-fill to a whole
        chunk, process remaining frames, and return collapsed token ids."""
        n_total = self._raw_n
        true_frames = -(-n_total // self.feat.hop)  # ceil
        done_frames = self._consumed // self.feat.hop
        if true_frames > done_frames:
            for b in range(self.batch):
                pb = self._padded[b]
                tail = pb[-self.feat.pad - 1:-1][::-1] if len(pb) > self.feat.pad else np.zeros(
                    (self.feat.pad,), np.float32
                )
                self._padded[b] = np.concatenate([pb, tail])
            # zero-fill so remaining frames form whole chunks
            rem = true_frames - done_frames
            n_chunks = -(-rem // self.chunk)
            need = self._consumed + n_chunks * self.chunk_samples + self.feat.overlap
            for b in range(self.batch):
                if len(self._padded[b]) < need:
                    self._padded[b] = np.concatenate([
                        self._padded[b],
                        np.zeros((need - len(self._padded[b]),), np.float32),
                    ])
            last_valid = rem - (n_chunks - 1) * self.chunk
            final_valid = np.full((self.batch,), last_valid, np.int32)
            self._emit_ready(final_valid=final_valid)
        return [list(ids) for ids in self._ids]
