"""ctypes binding for the native (C++/OpenMP) host audio batch pipeline.

The shared library (native/audio_pipeline.cpp, built by ``make -C native``)
fuses the three Python passes of the SPIRAL pretrain input path — wav read +
random crop (AudioDataset._load_cropped), SNR noise splicing
(RandomNoisePerturbation, the reference's perturb.py:478-582), and the padded
batch collate (AudioBatchCollate) — into one OpenMP pass that writes the
final (B, crop) float32 matrices. The ctypes call releases the GIL, so the
prefetching loader's worker threads genuinely overlap batch prep with the
device step even before multi-core scaling.

All randomness is drawn in Python from the caller's generator (crop/segment
positions as uniforms, SNRs, noise-file choices), so batches remain
reproducible from the loader seed; the C++ side is a pure function of those
draws. Items the native reader cannot parse are re-fetched through the
Python dataset path (wav_lens == -1 sentinel).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libaudio_pipeline.so"))

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR),
                 "libaudio_pipeline.so"],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.tsp_wav_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.tsp_wav_info.restype = ctypes.c_int
        lib.tsp_read_wav.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.tsp_read_wav.restype = ctypes.c_int64
        lib.tsp_prepare_pretrain_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),  # wav paths
            ctypes.POINTER(ctypes.c_double),  # crop uniforms
            ctypes.POINTER(ctypes.c_char_p),  # noise paths (NULL = none)
            ctypes.POINTER(ctypes.c_double),  # noise segment uniforms
            ctypes.POINTER(ctypes.c_float),   # snr dB
            ctypes.c_int, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.tsp_prepare_pretrain_batch.restype = ctypes.c_int
        _lib = lib
    except OSError:
        return None
    return _lib


def native_available() -> bool:
    return _load() is not None


def read_wav_native(path: str, start: int = 0,
                    max_frames: Optional[int] = None):
    """Native float32-mono wav read (matches data/wav.py::read_wav up to the
    crop window). Returns (wav, sr) or None when the file can't be parsed."""
    lib = _load()
    if lib is None:
        return None
    n_frames = ctypes.c_int64()
    sr = ctypes.c_int()
    if lib.tsp_wav_info(path.encode(), ctypes.byref(n_frames),
                        ctypes.byref(sr)) != 0:
        return None
    cap = n_frames.value - start
    if max_frames is not None:
        cap = min(cap, max_frames)
    cap = max(cap, 0)
    out = np.empty((cap,), dtype=np.float32)
    got = lib.tsp_read_wav(
        path.encode(), start, cap,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if got < 0:
        return None
    return out[:got], sr.value


def prepare_pretrain_batch(
    wav_paths: Sequence[str],
    crop_size: int,
    rng: np.random.Generator,
    noise_paths: Optional[Sequence[Optional[str]]] = None,
    snr_db: Optional[np.ndarray] = None,
    expected_sr: int = 16000,
):
    """Build a {wavs, wav_lens, p_wavs, p_wav_lens} batch natively.

    noise_paths[i] = None means item i gets no noise (clean == perturbed).
    Returns (batch_dict, failed_indices); failed items have zero rows and
    must be refilled by the caller via the Python dataset path.
    """
    lib = _load()
    assert lib is not None, "native audio pipeline unavailable"
    b = len(wav_paths)
    if noise_paths is None:
        noise_paths = [None] * b
    if snr_db is None:
        snr_db = np.zeros((b,), dtype=np.float32)
    crop_u = rng.random(b)
    noise_u = rng.random(b)

    wavs = np.zeros((b, crop_size), dtype=np.float32)
    p_wavs = np.zeros((b, crop_size), dtype=np.float32)
    wav_lens = np.zeros((b,), dtype=np.int32)
    p_wav_lens = np.zeros((b,), dtype=np.int32)

    c_wav_paths = (ctypes.c_char_p * b)(*[p.encode() for p in wav_paths])
    c_noise_paths = (ctypes.c_char_p * b)(
        *[None if p is None else p.encode() for p in noise_paths]
    )
    snr = np.ascontiguousarray(snr_db, dtype=np.float32)
    crop_u = np.ascontiguousarray(crop_u)
    noise_u = np.ascontiguousarray(noise_u)

    lib.tsp_prepare_pretrain_batch(
        c_wav_paths,
        crop_u.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        c_noise_paths,
        noise_u.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        snr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b, crop_size, expected_sr,
        wavs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        wav_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        p_wavs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        p_wav_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    failed = np.nonzero(wav_lens < 0)[0]
    if failed.size:
        wav_lens[failed] = 0
        p_wav_lens[failed] = 0
        wavs[failed] = 0.0
        p_wavs[failed] = 0.0
    batch = {
        "wavs": wavs, "wav_lens": wav_lens,
        "p_wavs": p_wavs, "p_wav_lens": p_wav_lens,
    }
    return batch, failed.tolist()


class NativePretrainBatcher:
    """Drop-in `_make_batch` for the pretrain DataLoader.

    Usable when the dataset is a plain `AudioDataset(return_both=True)` of
    .wav files whose augmentor is empty or a single RandomNoisePerturbation —
    the production multi-condition recipe (spiral_*_pretrain_*_noise.py).
    Everything else falls back to the Python dataset (returns None from
    `maybe_build`)."""

    def __init__(self, dataset, noise_entries, noise_prob: float,
                 noise_ratio: float, min_snr: float, max_snr: float,
                 seed: int = 0):
        self.dataset = dataset
        self.entries = dataset.entries
        self.crop_size = dataset.crop_size
        self.sample_rate = dataset.sample_rate
        self.noise_entries = noise_entries
        self.noise_prob = noise_prob
        self.noise_ratio = noise_ratio
        self.min_snr, self.max_snr = min_snr, max_snr
        self.rng = np.random.default_rng(seed)

    @staticmethod
    def maybe_build(dataset, seed: int = 0):
        """Return a batcher when the dataset/augmentor combination is
        expressible natively, else None."""
        from tpu_speech.data.spiral import (
            AudioAugmentor,
            AudioDataset,
            RandomNoisePerturbation,
        )

        if not native_available():
            return None
        if type(dataset) is not AudioDataset or not dataset.return_both:
            return None
        if dataset.crop_size is None:
            return None
        if any(not e["audio_filepath"].lower().endswith(".wav")
               for e in dataset.entries):
            return None
        aug = dataset.augmentor
        if aug is None:
            return NativePretrainBatcher(dataset, [], 0.0, 0.0, 0.0, 0.0,
                                         seed)
        if not isinstance(aug, AudioAugmentor):
            return None
        if len(aug.perturbations) == 0:
            return NativePretrainBatcher(dataset, [], 0.0, 0.0, 0.0, 0.0,
                                         seed)
        if len(aug.perturbations) != 1:
            return None
        prob, pert = aug.perturbations[0]
        if not isinstance(pert, RandomNoisePerturbation):
            return None
        if any(not e["audio_filepath"].lower().endswith(".wav")
               for e in pert.entries):
            return None
        return NativePretrainBatcher(
            dataset, pert.entries, prob, pert.ratio,
            pert.min_snr, pert.max_snr, seed,
        )

    def __call__(self, idxs) -> dict:
        b = len(idxs)
        paths = [self.entries[int(i)]["audio_filepath"] for i in idxs]
        noise_paths: list = [None] * b
        snr = np.zeros((b,), dtype=np.float32)
        if self.noise_entries:
            apply = (self.rng.random(b) < self.noise_prob) & (
                self.rng.random(b) <= self.noise_ratio
            )
            choice = self.rng.integers(0, len(self.noise_entries), size=b)
            snr = self.rng.uniform(self.min_snr, self.max_snr, size=b).astype(
                np.float32
            )
            for i in range(b):
                if apply[i]:
                    noise_paths[i] = self.noise_entries[int(choice[i])][
                        "audio_filepath"
                    ]
        batch, failed = prepare_pretrain_batch(
            paths, self.crop_size, self.rng, noise_paths, snr,
            expected_sr=self.sample_rate,
        )
        for i in failed:  # unparseable natively -> Python path for that item
            item = self.dataset[int(idxs[i])]
            for key, lkey in (("wav", "wav_lens"), ("p_wav", "p_wav_lens")):
                w = item[key][: self.crop_size]
                dst = batch["wavs" if key == "wav" else "p_wavs"]
                dst[i, : len(w)] = w
                dst[i, len(w):] = 0.0
                batch[lkey][i] = len(w)
        return batch
