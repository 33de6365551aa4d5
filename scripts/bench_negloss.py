"""Micro-benchmark: SPIRAL negatives+InfoNCE formulations on the chip.

The loss head costs ~11 ms/step (fp32 trace): sample_negatives materializes
(N=100, B, T, D) = 480 MB fp32 via vector gathers, then contrastive_loss
reads it again for cosines (st2vec.py:203-298). Two formulations:

  materialized  the current production path
  gram          (B,T,T) pred@targets^T + targets@targets^T gram matmuls
                (4.7 GF each — trivial), cosines for ALL frames, then
                SCALAR gathers of the (B,T,N) logits; neg_is_pos from a
                128-bit content hash instead of vector equality

Measured fwd and fwd+bwd at the production operating point.
Run: python scripts/bench_negloss.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_speech_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")

from tpu_speech.models.spiral.st2vec import (  # noqa: E402
    contrastive_loss,
    sample_negatives,
)

B, T, D, N = 24, 196, 256, 100
TEMP = 0.3
CHAIN = 16
REPS = 5


def loss_materialized(pred, targets, feat_lens, key):
    valid = (jnp.arange(T)[None, :] < feat_lens[:, None]).astype(pred.dtype)
    negs = sample_negatives(key, targets, feat_lens, N)
    loss, acc = contrastive_loss(pred, targets, negs, valid, TEMP)
    return loss


def _neg_indices(key, feat_lens):
    """Same index distribution as sample_negatives (st2vec.py:203-216)."""
    high = jnp.maximum(feat_lens - 1, 1)[:, None, None]
    idx = jax.random.randint(key, (B, T, N), 0, high)
    pos = jnp.arange(T)[None, :, None]
    idx = idx + (idx >= pos)
    return jnp.minimum(idx, T - 1)


def _content_hash(x):
    """Per-frame 2x32-bit mixing hash of the raw float bits: equal vectors
    hash equal; distinct vectors collide w.p. ~2^-64."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    k = jnp.arange(1, x.shape[-1] + 1, dtype=jnp.uint32)
    c1 = jnp.uint32(2654435761)  # wraps mod 2^32 (literal overflows int32)
    h1 = jnp.sum(bits * (c1 * k), axis=-1)
    h2 = jnp.sum(bits * (jnp.uint32(40503) * k * k + jnp.uint32(1)), axis=-1)
    return h1, h2


def loss_gram(pred, targets, feat_lens, key):
    valid = (jnp.arange(T)[None, :] < feat_lens[:, None]).astype(jnp.float32)
    idx = _neg_indices(key, feat_lens)

    p32 = pred.astype(jnp.float32)
    t32 = targets.astype(jnp.float32)
    gram = jnp.einsum("btd,bsd->bts", p32, t32)  # (B, T, T)
    pn = jnp.linalg.norm(p32, axis=-1)           # (B, T)
    tn = jnp.linalg.norm(t32, axis=-1)           # (B, T)
    cos_all = gram / jnp.maximum(pn[:, :, None] * tn[:, None, :], 1e-8)

    pos = jnp.take_along_axis(
        cos_all, jnp.arange(T)[None, :, None], axis=2
    )[..., 0]                                    # (B, T) diag
    neg = jnp.take_along_axis(cos_all, idx, axis=2)  # (B, T, N) scalars

    h1, h2 = _content_hash(targets)
    same1 = jnp.take_along_axis(h1[:, None, :].repeat(T, 1), idx, 2) == h1[:, :, None]
    same2 = jnp.take_along_axis(h2[:, None, :].repeat(T, 1), idx, 2) == h2[:, :, None]
    neg_is_pos = same1 & same2

    sims = jnp.concatenate(
        [pos[..., None], jnp.where(neg_is_pos, -1e9 * TEMP, neg)], axis=-1
    ) / TEMP                                      # (B, T, 1+N)
    logp = jax.nn.log_softmax(sims, axis=-1)
    ce = -logp[..., 0]
    denom = jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.sum(ce * valid) / denom


def timed(f, grad, pred, targets, feat_lens):
    if grad:
        g = jax.grad(lambda p, t, k: f(p, t, feat_lens, k), argnums=(0, 1))

        def body(c, k):
            dp, dt = g(pred + (c * 1e-30).astype(pred.dtype), targets, k)
            return dp.astype(jnp.float32).mean(), None
    else:
        def body(c, k):
            return f(pred + (c * 1e-30).astype(pred.dtype), targets,
                     feat_lens, k).astype(jnp.float32), None

    @jax.jit
    def run(pred, targets, key):
        c, _ = lax.scan(body, jnp.float32(0.0), jax.random.split(key, CHAIN))
        return c

    key = jax.random.PRNGKey(0)
    for _ in range(2):
        jax.device_get(run(pred, targets, key))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.device_get(run(pred, targets, key))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / CHAIN


def main():
    rng = np.random.default_rng(0)
    pred32 = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    tgt32 = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    feat_lens = jnp.full((B,), T, dtype=jnp.int32)

    # numeric check: same loss (same idx distribution, same rng consumption)
    k = jax.random.PRNGKey(7)
    a = float(loss_materialized(pred32, tgt32, feat_lens, k))
    b = float(loss_gram(pred32, tgt32, feat_lens, k))
    print(f"loss materialized={a:.6f} gram={b:.6f} diff={abs(a-b):.2e}")

    for dt, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        pred, tgt = pred32.astype(dt), tgt32.astype(dt)
        for name, f in (("materialized", loss_materialized),
                        ("gram", loss_gram)):
            tf = timed(f, False, pred, tgt, feat_lens)
            tg = timed(f, True, pred, tgt, feat_lens)
            print(f"{name:13s} {tag}  fwd {tf*1e3:7.3f} ms   "
                  f"fwd+bwd {tg*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
