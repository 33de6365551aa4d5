"""tpu_speech — TPU-native (JAX/XLA/Pallas) rebuild of the Speech-Backbones collection.

A from-scratch framework providing the capabilities of huawei-noah/Speech-Backbones
(Grad-TTS, DiffVC, SPIRAL) designed TPU-first:

- channels-last layouts (B, T, C) so feature dims ride the 128-wide lanes
- all hot paths jit-compiled; sequential SDE solvers as ``lax.scan``
- monotonic alignment search on-device (vectorized DP / Pallas kernel) instead of
  the reference's Cython-on-CPU round-trip (Grad-TTS/model/monotonic_align/core.pyx)
- data parallelism via ``jax.sharding.Mesh`` + NamedSharding instead of DDP/NCCL

Subpackages
-----------
audio     L0: STFT/mel frontends (both reference conventions), Griffin-Lim
text      L1a: cleaners, CMUdict, symbol tables
data      L1b: filelist/manifest datasets, padding collates
nn        L2a: module library (rel-pos transformer, masked convs, U-Net blocks)
ops       L2b: functional kernels (MAS, path generation, CTC, masks)
models    L2c: GradTTS, DiffVC, SPIRAL, HiFi-GAN, speaker encoder
parallel  mesh/sharding helpers
train     training loops, optimizers, LR schedules, EMA, checkpointing
eval      WER/CER, RTF harness
compat    torch checkpoint -> jax pytree converters
"""

__version__ = "0.1.0"
