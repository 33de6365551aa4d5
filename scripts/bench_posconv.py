"""Micro-benchmark: grouped positional-conv formulations on the chip.

The k=128 / groups=16 wav2vec positional convolution is ~13.5 ms/step
(fwd+bwd, both branches) in the SPIRAL trace — running at ~23 TFLOP/s
because each group's 32-48 output channels underfill the 128-wide MXU
lanes. This measures drop-in-equivalent formulations at the production
shapes to pick the fastest:

  grouped   lax.conv feature_group_count=G (current, wav2vec.py:58)
  batchg    groups moved to the batch dim, batch_group_count=G
  vmapg     vmap over groups of dense conv
  dense_bd  one dense conv with a block-diagonal kernel (16x flops but
            full lane occupancy)

Each at fp32 and bf16, fwd and fwd+bwd. Run: python scripts/bench_posconv.py
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_speech_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")

K, G = 128, 16
SHAPES = (  # (B, T, C): block1 student/teacher, block0
    (24, 196, 768),
    (24, 228, 768),
    (24, 392, 512),
)
CHAIN = 32
REPS = 5


def grouped(x, w):
    return lax.conv_general_dilated(
        x, w, (1,), [(K // 2, K // 2)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=G,
    )[:, :-1]


def batchg(x, w):
    b, t, c = x.shape
    cg = c // G
    # (B,T,C) -> (G*B, T, Cg): group g of batch b at index g*B + b
    xg = x.reshape(b, t, G, cg).transpose(2, 0, 1, 3).reshape(G * b, t, cg)
    # batch_group_count: output features split into G groups, each seeing
    # its own slice of the batch. w (K, Cg, C): output feature g*cg+co is
    # group g's filters — matches the grouped weights layout directly.
    y = lax.conv_general_dilated(
        xg, w, (1,), [(K // 2, K // 2)],
        dimension_numbers=("NHC", "HIO", "NHC"), batch_group_count=G,
    )[:, :-1]
    # y: (B, T, C) already? batch_group output has N/b_g batches
    return y


def vmapg(x, w):
    b, t, c = x.shape
    cg = c // G
    xg = x.reshape(b, t, G, cg).transpose(2, 0, 1, 3)  # (G, B, T, cg)
    wg = w.reshape(K, cg, G, cg).transpose(2, 0, 1, 3)  # (G, K, cg, cg)

    def one(xx, ww):
        return lax.conv_general_dilated(
            xx, ww, (1,), [(K // 2, K // 2)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )[:, :-1]

    y = jax.vmap(one)(xg, wg)  # (G, B, T, cg)
    return y.transpose(1, 2, 0, 3).reshape(b, t, c)


def dense_bd(x, w):
    c = x.shape[-1]
    cg = c // G
    wg = w.reshape(K, cg, G, cg)
    dense = jnp.zeros((K, c, c), w.dtype)
    for g in range(G):
        dense = dense.at[:, g * cg:(g + 1) * cg, g * cg:(g + 1) * cg].set(
            wg[:, :, g, :]
        )
    return lax.conv_general_dilated(
        x, dense, (1,), [(K // 2, K // 2)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )[:, :-1]


def timed_chain(f, x, w):
    @jax.jit
    def run(x, w):
        def body(c, _):
            y = f(x + (c * 1e-30).astype(x.dtype), w)
            return y.astype(jnp.float32).mean(), None
        c, _ = lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
        return c

    for _ in range(2):
        jax.device_get(run(x, w))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.device_get(run(x, w))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / CHAIN


def timed_chain_grad(f, x, w):
    # squared loss: a LINEAR f has x-independent grads, which XLA
    # hoists out of the chain (bogus timing) — square to keep them live
    g = jax.grad(
        lambda x, w: (f(x, w).astype(jnp.float32) ** 2).sum(), argnums=(0, 1))

    @jax.jit
    def run(x, w):
        def body(c, _):
            dx, dw = g(x + (c * 1e-30).astype(x.dtype), w)
            return dx.astype(jnp.float32).mean(), None
        c, _ = lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
        return c

    for _ in range(2):
        jax.device_get(run(x, w))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.device_get(run(x, w))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / CHAIN


def main():
    rng = np.random.default_rng(0)
    fns = [("grouped", grouped), ("batchg", batchg), ("vmapg", vmapg),
           ("dense_bd", dense_bd)]
    for b, t, c in SHAPES:
        cg = c // G
        x32 = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
        w32 = jnp.asarray(
            (rng.standard_normal((K, cg, c)) * 0.02).astype(np.float32))
        flops = 2 * b * t * K * cg * c
        # equivalence check (vs grouped, fp32)
        ref = np.asarray(grouped(x32, w32))
        print(f"\n== shape B{b} T{t} C{c} (fwd {flops/1e9:.1f} GF) ==")
        for name, f in fns:
            try:
                got = np.asarray(f(x32, w32))
                err = float(np.max(np.abs(got - ref)))
            except Exception as e:
                print(f"{name:9s} FAILED: {str(e)[:90]}")
                continue
            for dt, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
                x, w = x32.astype(dt), w32.astype(dt)
                tf = timed_chain(f, x, w)
                tg = timed_chain_grad(f, x, w)
                print(f"{name:9s} {tag}  fwd {tf*1e3:7.3f} ms "
                      f"({flops/tf/1e12:5.1f} TF/s)  fwd+bwd {tg*1e3:7.3f} ms"
                      f"  maxerr {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
