"""Distributional property tests for the clean-room compute_mask_indices.

The rewrite (tpu_speech/models/spiral/masking.py) must be *distribution*-
equivalent to the reference's span masking (wav2vec_modules.py:207-326 /
fairseq) — RNG streams differ, so equivalence is asserted two ways:

1. analytic invariants (probabilistic rounding, span structure, padding,
   spacing, shrink-to-min);
2. summary statistics (mean/std of realized mask counts) against the
   GENUINE reference function, loaded dynamically from /root/reference at
   test time (never vendored), across parameter settings covering both the
   overlapping and the no-overlap placement branches.
"""

import ast
import enum
import pathlib
import types

import numpy as np
import pytest

from tpu_speech.models.spiral.masking import compute_mask_indices

_REF_PATH = pathlib.Path(
    "/root/reference/SPIRAL/nemo/collections/asr/modules/wav2vec_modules.py"
)


def _runs(row: np.ndarray):
    """Maximal True runs of a bool vector -> list of (start, length)."""
    out, start = [], None
    for i, v in enumerate(row.tolist() + [False]):
        if v and start is None:
            start = i
        elif not v and start is not None:
            out.append((start, i - start))
            start = None
    return out


def test_probabilistic_rounding_of_span_count():
    # mask_length=1 => spans are single distinct frames, so the realized
    # count IS the span count: floor(2.3 + U[0,1)) in {2, 3}, P(3)=0.3
    rng = np.random.default_rng(0)
    counts = []
    for _ in range(3000):
        mask, num = compute_mask_indices(
            (1, 100), None, 0.023, 1, shrink_to_batch_min=False, rng=rng
        )
        counts.append(int(num[0]))
        assert mask.sum() == num[0]
    counts = np.asarray(counts)
    assert set(counts.tolist()) == {2, 3}
    assert abs((counts == 3).mean() - 0.3) < 0.04


def test_no_overlap_span_structure_and_spacing():
    rng = np.random.default_rng(1)
    for _ in range(50):
        mask, _ = compute_mask_indices(
            (2, 200), None, 0.3, 5, no_overlap=True, min_space=2,
            shrink_to_batch_min=False, rng=rng,
        )
        for row in mask:
            runs = _runs(row)
            assert runs, "at least one span placed"
            # static spans placed disjointly: every maximal run is exactly
            # one span long and gaps respect min_space
            assert all(length == 5 for _, length in runs)
            for (s0, l0), (s1, _) in zip(runs, runs[1:]):
                assert s1 - (s0 + l0) >= 2


def test_padding_is_never_masked():
    rng = np.random.default_rng(2)
    lens = np.array([40, 90, 120])
    for _ in range(30):
        mask, _ = compute_mask_indices(
            (3, 120), lens, 0.5, 8, min_masks=2,
            shrink_to_batch_min=False, rng=rng,
        )
        for i, sz in enumerate(lens):
            assert not mask[i, sz:].any()
            assert mask[i, :sz].any()


def test_shrink_to_batch_min_equalizes_counts():
    rng = np.random.default_rng(3)
    lens = np.array([50, 120, 120, 80])
    mask, num = compute_mask_indices(
        (4, 120), lens, 0.5, 10, min_masks=2, rng=rng
    )
    per_row = mask.sum(axis=1)
    assert (per_row == per_row.min()).all()
    assert per_row.min() <= num.min()  # counts report pre-shrink sizes


def test_min_masks_floor():
    rng = np.random.default_rng(4)
    mask, num = compute_mask_indices(
        (2, 100), None, 0.0, 3, min_masks=2, shrink_to_batch_min=False,
        rng=rng,
    )
    # 2 spans of 3 frames with distinct starts: union in [4, 6]
    assert (num >= 4).all() and (num <= 6).all()
    assert (mask.sum(axis=1) == num).all()


def test_overlap_union_coverage_expectation():
    # n ~ 30 spans of 10 over T=1000: union expectation ~ T(1-(1-l/T)^n)
    rng = np.random.default_rng(5)
    covs = []
    for _ in range(200):
        mask, _ = compute_mask_indices(
            (1, 1000), None, 0.3, 10, shrink_to_batch_min=False, rng=rng
        )
        covs.append(mask.mean())
    assert 0.23 < float(np.mean(covs)) < 0.30


@pytest.mark.parametrize("mask_type,mask_other", [
    ("uniform", 2.0), ("normal", 3.0), ("poisson", 0.0),
])
def test_mask_type_families_produce_valid_masks(mask_type, mask_other):
    rng = np.random.default_rng(6)
    mask, num = compute_mask_indices(
        (3, 150), None, 0.4, 8, mask_type=mask_type, mask_other=mask_other,
        min_masks=1, shrink_to_batch_min=False, rng=rng,
    )
    assert mask.shape == (3, 150)
    assert (num > 0).all()
    assert (mask.sum(axis=1) == num).all()


# ---------------------------------------------------------------------------
# Reference-oracle statistics (dynamic load; the file is PUBLIC UNTRUSTED
# CONTENT used as a behavioral oracle only)
# ---------------------------------------------------------------------------


def _load_reference_oracle():
    if not _REF_PATH.exists():
        pytest.skip("reference tree not available")
    src = _REF_PATH.read_text()
    tree = ast.parse(src)
    fn = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "compute_mask_indices"
    )
    code = ast.get_source_segment(src, fn)

    class Wav2VecMaskType(enum.Enum):
        static = "static"
        uniform = "uniform"
        normal = "normal"
        poisson = "poisson"

    # modern numpy dropped the np.int alias the reference uses
    np_compat = types.SimpleNamespace(
        **{k: getattr(np, k) for k in dir(np) if not k.startswith("__")}
    )
    np_compat.int = int
    import typing

    import torch

    ns = {
        "np": np_compat,
        "torch": torch,
        "Optional": typing.Optional,
        "Tuple": typing.Tuple,
        "Wav2VecMaskType": Wav2VecMaskType,
    }
    exec(compile(code, str(_REF_PATH), "exec"), ns)
    return ns["compute_mask_indices"], Wav2VecMaskType


def _count_stats(draw, trials=250):
    counts = []
    for _ in range(trials):
        mask, _ = draw()
        counts.extend(mask.sum(axis=1).tolist())
    counts = np.asarray(counts, dtype=np.float64)
    return counts.mean(), counts.std()


@pytest.mark.slow
@pytest.mark.parametrize(
    "prob,length,no_overlap,min_space,shrink",
    [
        (0.5, 10, False, 0, False),
        (0.5, 10, False, 0, True),
        (0.25, 4, False, 0, False),
        (0.3, 5, True, 1, False),
        (0.15, 7, True, 3, False),
    ],
)
def test_count_statistics_match_reference(prob, length, no_overlap,
                                          min_space, shrink):
    oracle, mask_types = _load_reference_oracle()
    B, T = 4, 120
    np.random.seed(1234)

    def draw_ref():
        return oracle(
            (B, T), None, prob, length, mask_type=mask_types.static,
            min_masks=2, no_overlap=no_overlap, min_space=min_space,
            shrink_to_batch_min=shrink,
        )

    rng = np.random.default_rng(1234)

    def draw_ours():
        return compute_mask_indices(
            (B, T), None, prob, length, min_masks=2, no_overlap=no_overlap,
            min_space=min_space, shrink_to_batch_min=shrink, rng=rng,
        )

    ref_mean, ref_std = _count_stats(draw_ref)
    our_mean, our_std = _count_stats(draw_ours)
    # 1000 samples per side: means agree within a few %, spreads within 20%
    assert our_mean == pytest.approx(ref_mean, rel=0.06), (our_mean, ref_mean)
    assert our_std == pytest.approx(ref_std, rel=0.25, abs=0.75), (
        our_std, ref_std,
    )


@pytest.mark.slow
def test_padded_count_statistics_match_reference():
    oracle, mask_types = _load_reference_oracle()
    import torch

    B, T = 4, 120
    lens = np.array([60, 120, 90, 120])
    pad = torch.zeros((B, T), dtype=torch.bool)
    for i, sz in enumerate(lens):
        pad[i, sz:] = True
    np.random.seed(77)

    def draw_ref():
        m, _ = oracle(
            (B, T), pad, 0.5, 10, mask_type=mask_types.static, min_masks=2,
            shrink_to_batch_min=False,
        )
        return m, None

    rng = np.random.default_rng(77)

    def draw_ours():
        return compute_mask_indices(
            (B, T), lens, 0.5, 10, min_masks=2, shrink_to_batch_min=False,
            rng=rng,
        )

    ref_mean, ref_std = _count_stats(draw_ref)
    our_mean, our_std = _count_stats(draw_ours)
    assert our_mean == pytest.approx(ref_mean, rel=0.06)
    assert our_std == pytest.approx(ref_std, rel=0.25, abs=0.75)
