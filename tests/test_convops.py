"""conv_transpose{1,2}d vs torch.nn.functional oracles.

Pins the subpixel (depth-to-space) fast path — taken whenever the kernel is a
multiple of the stride, i.e. every HiFi-GAN upsampler (16/8, 8/4, 4/2,
Grad-TTS/hifi-gan/models.py:84-90) and the U-Net Upsample (k=4, s=2,
Grad-TTS/model/diffusion.py:57) — and the dilated-input fallback against the
reference framework's own transposed-conv arithmetic.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tpu_speech.nn.convops import conv_transpose1d, conv_transpose2d


@pytest.mark.parametrize(
    "k,s,p",
    [
        (16, 8, 4),  # hifigan up1
        (8, 4, 2),   # hifigan up2/3
        (4, 2, 1),   # hifigan up4
        (6, 3, 2),   # k % s == 0, non-power-of-2
        (5, 2, 1),   # k % s != 0 -> dilated fallback
        (3, 1, 1),   # stride 1 -> plain correlate path
    ],
)
def test_conv_transpose1d_matches_torch(rng, k, s, p):
    B, T, cin, cout = 2, 17, 6, 5
    x = rng.standard_normal((B, T, cin)).astype(np.float32)
    w = rng.standard_normal((k, cin, cout)).astype(np.float32)
    b = rng.standard_normal((cout,)).astype(np.float32)
    # torch layout: input (B, Cin, T), weight (Cin, Cout, k)
    ref = F.conv_transpose1d(
        torch.from_numpy(x.transpose(0, 2, 1)),
        torch.from_numpy(w.transpose(1, 2, 0)).contiguous(),
        torch.from_numpy(b),
        stride=s,
        padding=p,
    ).numpy().transpose(0, 2, 1)
    got = np.asarray(conv_transpose1d(x, w, b, stride=s, padding=p))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "k,s,p",
    [
        ((4, 4), (2, 2), (1, 1)),  # U-Net Upsample
        ((6, 4), (3, 2), (2, 1)),  # mixed strides, both divide
        ((5, 4), (2, 2), (1, 1)),  # kh % sh != 0 -> fallback
        ((3, 3), (1, 1), (1, 1)),  # stride 1
    ],
)
def test_conv_transpose2d_matches_torch(rng, k, s, p):
    B, H, W, cin, cout = 2, 9, 11, 4, 3
    x = rng.standard_normal((B, H, W, cin)).astype(np.float32)
    w = rng.standard_normal((*k, cin, cout)).astype(np.float32)
    b = rng.standard_normal((cout,)).astype(np.float32)
    ref = F.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(w.transpose(2, 3, 0, 1)).contiguous(),
        torch.from_numpy(b),
        stride=s,
        padding=p,
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(conv_transpose2d(x, w, b, stride=s, padding=p))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
