"""Mel/alignment visualization (reference Grad-TTS/utils.py plot_tensor /
save_plot used for per-epoch TensorBoard images, train.py:89-172)."""

from __future__ import annotations

import numpy as np


def plot_tensor(tensor) -> np.ndarray:
    """Render a (T, F) or (F, T) array to an HWC uint8 image."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    arr = np.asarray(tensor)
    if arr.ndim == 2 and arr.shape[0] > arr.shape[1]:
        arr = arr.T  # show frequency on y
    fig, ax = plt.subplots(figsize=(12, 3))
    im = ax.imshow(arr, aspect="auto", origin="lower", interpolation="none")
    fig.colorbar(im, ax=ax)
    fig.canvas.draw()
    data = np.asarray(fig.canvas.buffer_rgba())[:, :, :3]
    plt.close(fig)
    return data


def save_plot(tensor, savepath: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    arr = np.asarray(tensor)
    if arr.ndim == 2 and arr.shape[0] > arr.shape[1]:
        arr = arr.T
    fig, ax = plt.subplots(figsize=(12, 3))
    im = ax.imshow(arr, aspect="auto", origin="lower", interpolation="none")
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    fig.savefig(savepath)
    plt.close(fig)
