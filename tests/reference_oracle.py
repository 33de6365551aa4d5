"""Import helpers for using the reference PyTorch implementation as a test
oracle (read-only at /root/reference). The Cython monotonic_align extension is
not built, so we pre-seed sys.modules with a numpy-backed stand-in before
importing the reference package."""

import sys
import types

GRAD_TTS_DIR = "/root/reference/Grad-TTS"
DIFFVC_DIR = "/root/reference/DiffVC"
SPIRAL_DIR = "/root/reference/SPIRAL"


def _install_mas_stub():
    import numpy as np
    import torch

    from tpu_speech.ops.monotonic_align import maximum_path_numpy

    stub = types.ModuleType("model.monotonic_align")

    def maximum_path(value, mask):
        path = maximum_path_numpy(value.detach().numpy(), mask.detach().numpy())
        return torch.from_numpy(path.astype(np.float32))

    stub.maximum_path = maximum_path
    sys.modules["model.monotonic_align"] = stub


def load_gradtts_reference():
    """Returns the reference Grad-TTS `model` package (torch)."""
    _purge_module_namespace()
    if GRAD_TTS_DIR not in sys.path:
        sys.path.insert(0, GRAD_TTS_DIR)
    _install_mas_stub()
    import model  # noqa: F401

    return sys.modules["model"]


def _install_audio_stubs():
    """DiffVC/model/utils.py imports librosa + torchaudio (absent here); stub
    them with our native equivalents so the torch model graph is importable."""
    if "librosa" in sys.modules and hasattr(sys.modules["librosa"], "__stub__"):
        return
    import numpy as np

    from tpu_speech.audio.mel import mel_filterbank

    import importlib.machinery

    librosa = types.ModuleType("librosa")
    librosa.__stub__ = True
    # a bare ModuleType has __spec__=None, which breaks later
    # importlib.util.find_spec("librosa") calls (e.g. transformers' lazy
    # import machinery raises "ValueError: librosa.__spec__ is None")
    librosa.__spec__ = importlib.machinery.ModuleSpec("librosa", loader=None)
    filters = types.ModuleType("librosa.filters")
    filters.__spec__ = importlib.machinery.ModuleSpec(
        "librosa.filters", loader=None
    )

    def mel(sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **kw):
        return np.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax or sr / 2))

    filters.mel = mel
    librosa.filters = filters
    sys.modules["librosa"] = librosa
    sys.modules["librosa.filters"] = filters

    if "torchaudio" not in sys.modules:
        torchaudio = types.ModuleType("torchaudio")
        torchaudio.__spec__ = importlib.machinery.ModuleSpec(
            "torchaudio", loader=None
        )
        torchaudio.functional = types.SimpleNamespace(istft=None)
        sys.modules["torchaudio"] = torchaudio


def load_diffvc_reference():
    """Returns the reference DiffVC `model` package (torch)."""
    _purge_module_namespace()
    _install_audio_stubs()
    if DIFFVC_DIR not in sys.path:
        sys.path.insert(0, DIFFVC_DIR)
    import model  # noqa: F401

    return sys.modules["model"]


def _purge_module_namespace():
    """Grad-TTS and DiffVC both use a top-level `model` package; drop any
    previously imported one so the right directory wins."""
    for name in list(sys.modules):
        if name == "model" or name.startswith("model."):
            del sys.modules[name]
    for d in (GRAD_TTS_DIR, DIFFVC_DIR):
        if d in sys.path:
            sys.path.remove(d)
