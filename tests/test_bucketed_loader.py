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
