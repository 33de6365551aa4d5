"""Duration-bucketed static batching (data/loader.py::BucketedDataLoader).

The reference CTC finetune pads dynamically per batch (audio_to_text.py
collate); the TPU answer is k static bucket shapes. These tests pin the
scheduling contract: batch widths come from the bucket bounds, items land in
the smallest bucket that fits, shards see identical shape schedules with
disjoint items, and accumulation runs never mix shapes.
"""

import numpy as np

from tpu_speech.data.loader import BucketedDataLoader
from tpu_speech.data.spiral import AudioTextBatchCollate

SR = 1000  # 1 kHz keeps the toy arrays tiny


class ToyAudioText:
    def __init__(self, durations):
        self.entries = [{"duration": float(d)} for d in durations]

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, i):
        n = int(self.entries[i]["duration"] * SR)
        wav = np.zeros(n, dtype=np.float32)
        wav[0] = i + 1  # identify the item through the collate
        return {"wav": wav, "labels": np.array([i + 1], np.int32),
                "text": str(i)}


def _builder(bound_samples):
    return AudioTextBatchCollate(bound_samples, 8)


def test_bucket_assignment_and_shapes():
    rng = np.random.default_rng(0)
    durations = rng.uniform(0.2, 4.0, size=64)
    ds = ToyAudioText(durations)
    bounds = [1.0, 2.0, 4.0]
    loader = BucketedDataLoader(
        ds, 4, _builder, durations, bounds, SR, num_workers=1, seed=3,
    )
    widths = {int(b * SR) for b in bounds}
    seen = []
    for batch in loader:
        w = batch["wavs"].shape[1]
        assert w in widths
        # every item fits its bucket, and would NOT fit the next-smaller one
        smaller = max([x for x in widths if x < w], default=0)
        for j in range(len(batch["wav_lens"])):
            ln = int(batch["wav_lens"][j])
            assert ln <= w
            assert ln > smaller or smaller == 0 or ln <= smaller
            # item identity recoverable -> no duplicates
            seen.append(int(batch["wavs"][j, 0]))
        # bucket choice is minimal: at least one item needs this bucket
        assert max(int(x) for x in batch["wav_lens"]) > smaller
    assert len(seen) == len(set(seen))
    # bounded drop: fewer than batch items lost per bucket
    assert len(seen) >= len(ds) - 4 * len(bounds)


def test_shard_schedules_agree_and_items_disjoint():
    rng = np.random.default_rng(1)
    durations = rng.uniform(0.2, 4.0, size=96)
    ds = ToyAudioText(durations)
    bounds = [1.0, 4.0]

    def loader(shard):
        return BucketedDataLoader(
            ds, 2, _builder, durations, bounds, SR, num_workers=1,
            seed=7, shard_id=shard, num_shards=2,
        )

    l0, l1 = loader(0), loader(1)
    b0, b1 = list(l0), list(l1)
    assert len(b0) == len(b1) == len(l0)
    ids0, ids1 = set(), set()
    for x0, x1 in zip(b0, b1):
        # identical static shape schedule across processes (collective safety)
        assert x0["wavs"].shape == x1["wavs"].shape
        ids0.update(int(v) for v in x0["wavs"][:, 0])
        ids1.update(int(v) for v in x1["wavs"][:, 0])
    assert not (ids0 & ids1)


def test_accumulation_runs_share_shape():
    rng = np.random.default_rng(2)
    durations = rng.uniform(0.2, 4.0, size=80)
    ds = ToyAudioText(durations)
    loader = BucketedDataLoader(
        ds, 2, _builder, durations, [1.0, 2.0, 4.0], SR,
        run_length=2, num_workers=1, seed=5,
    )
    shapes = [b["wavs"].shape for b in loader]
    assert len(shapes) % 2 == 0
    for i in range(0, len(shapes), 2):
        assert shapes[i] == shapes[i + 1]  # grad-accum stack is stackable


def test_write_wav_accepts_int16(tmp_path):
    """On-device PCM quantization path: int16 input writes the same file as
    the equivalent float input."""
    import scipy.io.wavfile

    from tpu_speech.data.wav import write_wav

    rng = np.random.default_rng(0)
    f = np.clip(rng.standard_normal(1000) * 0.3, -1, 1).astype(np.float32)
    i16 = (f * 32767.0).astype(np.int16)
    p1, p2 = str(tmp_path / "f.wav"), str(tmp_path / "i.wav")
    write_wav(p1, f, 8000)
    write_wav(p2, i16, 8000)
    r1, d1 = scipy.io.wavfile.read(p1)
    r2, d2 = scipy.io.wavfile.read(p2)
    assert r1 == r2 == 8000
    np.testing.assert_array_equal(d1, d2)
    assert d2.dtype == np.int16
