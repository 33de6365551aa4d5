"""Utility subsystem tests: archives, plotting, type contracts, schedules."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_speech.train.schedules import (
    SCHEDULES,
    noam,
    polynomial_hold,
    warmup_cosine,
)
from tpu_speech.utils.archive import load_archive, save_archive
from tpu_speech.utils.plotting import plot_tensor
from tpu_speech.utils.typing_contracts import TypecheckError, typecheck


def test_archive_roundtrip(tmp_path):
    params = {"layer": {"kernel": np.ones((3, 4), np.float32),
                        "bias": np.zeros((4,), np.float32)}}
    cfg = {"name": "test", "dim": 4}
    path = str(tmp_path / "model.tsa")
    save_archive(path, cfg, params, extra={"teacher": {"w": np.ones(2)}})
    cfg2, params2, extra = load_archive(path)
    assert cfg2["name"] == "test"
    np.testing.assert_array_equal(params2["layer"]["kernel"], np.ones((3, 4)))
    np.testing.assert_array_equal(extra["teacher"]["w"], np.ones(2))


def test_plot_tensor():
    img = plot_tensor(np.random.randn(80, 200))
    assert img.ndim == 3 and img.shape[2] == 3


def test_typecheck():
    @typecheck(x="B T F", lengths="B")
    def f(x, lengths):
        return x

    f(jnp.zeros((2, 5, 8)), jnp.zeros((2,)))
    with pytest.raises(TypecheckError):
        f(jnp.zeros((2, 5)), jnp.zeros((2,)))
    with pytest.raises(TypecheckError):
        f(jnp.zeros((2, 5, 8)), jnp.zeros((3,)))  # B mismatch

    @typecheck(x="B T 80")
    def g(x):
        return x

    g(jnp.zeros((1, 4, 80)))
    with pytest.raises(TypecheckError):
        g(jnp.zeros((1, 4, 81)))


def test_typecheck_element_lattice():
    """Element-type tags (the reference's neural_types/elements.py lattice,
    collapsed to the semantic groups the repo's ports use) enforce dtype
    kind at call time and answer NeMo-style compatibility queries."""
    from tpu_speech.utils.typing_contracts import Compat, compare

    @typecheck(y="B T F @mel", labels="B L @labels")
    def f(y, labels):
        return y

    f(jnp.zeros((2, 5, 8)), jnp.zeros((2, 3), jnp.int32))
    f(jnp.zeros((2, 5, 8), jnp.bfloat16), jnp.zeros((2, 3), jnp.int32))
    with pytest.raises(TypecheckError):  # float labels: wrong dtype kind
        f(jnp.zeros((2, 5, 8)), jnp.zeros((2, 3), jnp.float32))
    with pytest.raises(TypecheckError):  # integer mel: wrong dtype kind
        f(jnp.zeros((2, 5, 8), jnp.int32), jnp.zeros((2, 3), jnp.int32))

    @typecheck(x="B T @nosuch")
    def g(x):
        return x

    with pytest.raises(TypecheckError):  # unknown element type
        g(jnp.zeros((2, 5)))

    # lattice comparisons (neural_type.py:72-106 comparison semantics)
    assert compare("mel", "mel") is Compat.SAME
    assert compare("mel", "spec") is Compat.LESS       # mel is-a spectrogram
    assert compare("spec", "mel") is Compat.GREATER
    # LogprobsType subclasses ElementType, NOT LogitsType (elements.py:150)
    assert compare("logprobs", "logits") is Compat.INCOMPATIBLE
    assert compare("mel", "labels") is Compat.INCOMPATIBLE
    # spectrograms are NOT audio subtypes (SpectrogramType subclasses
    # ChannelType, not AudioSignal — reference elements.py:180-204): a mel
    # port must not be pluggable into a raw-waveform port
    assert compare("mel", "audio") is Compat.INCOMPATIBLE
    assert compare("spec", "audio") is Compat.INCOMPATIBLE
    # ...but they ARE channel subtypes, transitively (elements.py:196-205)
    assert compare("mel", "channel") is Compat.LESS
    assert compare("embedding", "channel") is Compat.LESS  # Acoustic->Encoded->Channel
    # void is compatible with everything (elements.py:125-132)
    assert compare("void", "mel") is Compat.SAME
    assert compare("labels", "void") is Compat.SAME
    with pytest.raises(TypecheckError):
        compare("mel", "nosuch")


def test_port_type_algebra():
    """Full NeuralType comparison parity: element type parameters, fields,
    axis kinds/sizes, and the complete comparison-result set (reference
    neural_type.py:72-108, elements.py:90-122, comparison.py:20-32)."""
    from tpu_speech.utils.typing_contracts import (
        Axis, AxisKind, Compat, Element, PortType, audio_signal,
    )

    # --- element type parameters (AudioSignal(freq), elements.py:180-193) ---
    assert compare_el(audio_signal(16000), audio_signal(16000)) is Compat.SAME
    assert (compare_el(audio_signal(16000), audio_signal(22050))
            is Compat.SAME_TYPE_INCOMPATIBLE_PARAMS)
    # None params are treated as void (elements.py:112-115)
    assert compare_el(audio_signal(16000), audio_signal(None)) is Compat.SAME
    # --- fields must match exactly (elements.py:118-122) ---
    a = Element.of("element", fields=("x", "y", "w", "h"))
    b = Element.of("element", fields=("x", "y", "w", "h"))
    c = Element.of("element", fields=("x", "y"))
    assert compare_el(a, b) is Compat.SAME
    assert compare_el(a, c) is Compat.INCOMPATIBLE

    # --- axis comparison (neural_type.py:151-199) ---
    btd_mel = PortType.of(("B", "T", "D"), "mel")
    bdt_mel = PortType.of(("B", "D", "T"), "mel")
    bt_mel = PortType.of(("B", "T"), "mel")
    # same axes: element result passes through
    assert btd_mel.compare(PortType.of(("B", "T", "D"), "mel")) is Compat.SAME
    assert btd_mel.compare(PortType.of(("B", "T", "D"), "spec")) is Compat.LESS
    assert PortType.of(("B", "T", "D"), "spec").compare(btd_mel) is Compat.GREATER
    # permuted axis kinds, same element -> TRANSPOSE_SAME
    assert btd_mel.compare(bdt_mel) is Compat.TRANSPOSE_SAME
    # permuted axis kinds, different element -> INCOMPATIBLE
    assert btd_mel.compare(PortType.of(("B", "D", "T"), "spec")) is Compat.INCOMPATIBLE
    # rank mismatch -> INCOMPATIBLE
    assert btd_mel.compare(bt_mel) is Compat.INCOMPATIBLE
    # same kinds, mismatched fixed size -> DIM_INCOMPATIBLE
    sized = PortType.of((Axis(AxisKind.Batch), Axis(AxisKind.Dimension, 80)), "mel")
    other = PortType.of((Axis(AxisKind.Batch), Axis(AxisKind.Dimension, 81)), "mel")
    assert sized.compare(other) is Compat.DIM_INCOMPATIBLE
    # Any axis kind matches anything (axes.py:43, neural_type.py:181-182)
    anyax = PortType.of((Axis(AxisKind.Any), Axis(AxisKind.Any), Axis(AxisKind.Any)), "mel")
    assert anyax.compare(btd_mel) is Compat.SAME
    # "big void" (void element, no axes) matches anything (neural_type.py:79-81)
    assert PortType.of(None, "void").compare(btd_mel) is Compat.SAME
    # axes-less vs axes-ful -> INCOMPATIBLE (neural_type.py:83-87)
    assert PortType.of(None, "loss").compare(btd_mel) is Compat.INCOMPATIBLE
    assert PortType.of(None, "loss").compare(PortType.of(None, "loss")) is Compat.SAME

    # --- wiring check accepts SAME and GREATER only (neural_type.py:110-119) ---
    PortType.of(("B", "T", "D"), "spec").compare_and_raise("y", btd_mel)  # mel feeds spec? GREATER: ok
    with pytest.raises(TypecheckError):
        btd_mel.compare_and_raise("y", PortType.of(("B", "T", "D"), "spec"))

    # list axes cannot have a fixed size (axes.py:87-89)
    with pytest.raises(TypecheckError):
        Axis(AxisKind.Batch, size=3, is_list=True)


def compare_el(a, b):
    from tpu_speech.utils.typing_contracts import compare_elements

    return compare_elements(a, b)


def test_typecheck_on_model_facades():
    """Port contracts are live on the model layer (the reference's
    NeuralType checks on every module, common.py / losses/ctc.py:33-49)."""
    import jax

    from tests.test_spiral_pretrain import TINY_CFG as cfg
    from tpu_speech.models.spiral.st2vec import ST2VecEncoder

    model = ST2VecEncoder(cfg)
    specs = jnp.zeros((2, 32, cfg.num_features))
    lens = jnp.full((2,), 32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, specs, lens,
                           train=False)
    # rank violation on the facade port fails loudly
    with pytest.raises(TypecheckError):
        model.apply(variables, jnp.zeros((2, 32)), lens, train=False)
    # batch-axis inconsistency across ports fails too
    with pytest.raises(TypecheckError):
        model.apply(variables, specs, jnp.full((3,), 32), train=False)

    from tpu_speech.models.grad_tts import GradTTS

    tts = GradTTS(n_vocab=10, n_enc_channels=16, filter_channels=16,
                  filter_channels_dp=16, n_heads=2, n_enc_layers=1,
                  n_feats=8, dec_dim=8)
    with pytest.raises(TypecheckError):
        tts.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((2, 6), jnp.int32), jnp.full((2,), 6),
            jnp.zeros((2, 12, 8)), jnp.full((3,), 12),  # y_lengths B mismatch
            jax.random.PRNGKey(2),
        )


def test_schedule_zoo_shapes():
    for name, factory in SCHEDULES.items():
        if name == "NoamAnnealing":
            sched = factory(1e-3, 512, 100)
        elif name == "InverseSquareRootAnnealing":
            sched = factory(1e-3, 100)
        else:
            sched = factory(1e-3, 100, 1000)
        v0 = float(sched(jnp.asarray(0)))
        v_mid = float(sched(jnp.asarray(500)))
        assert np.isfinite(v0) and np.isfinite(v_mid), name
        assert v0 >= 0 and v_mid >= 0


def test_polynomial_hold_phases():
    s = polynomial_hold(1.0, warmup_steps=10, max_steps=100, hold_steps=20)
    assert float(s(jnp.asarray(0))) == 0.0
    assert float(s(jnp.asarray(10))) == 1.0  # warmed up
    assert float(s(jnp.asarray(25))) == 1.0  # holding
    assert float(s(jnp.asarray(100))) < 0.01  # decayed


def test_warmup_cosine_monotone_warmup():
    s = warmup_cosine(1.0, 10, 100)
    vals = [float(s(jnp.asarray(i))) for i in range(11)]
    assert all(b >= a for a, b in zip(vals, vals[1:]))
    assert abs(vals[-1] - 1.0) < 1e-6


def test_rank_aware_logger(capsys):
    import logging

    from tpu_speech.utils import logging as tl

    tl._logger = None
    logger = tl.get_logger("tpu_speech_test")
    assert logger.level == logging.INFO  # single-process -> primary
    logger.info("hello from primary")
    assert tl.get_logger() is logger  # cached


def test_notebooks_parse_and_compile():
    """The notebook entry points (reference inference.ipynb analogs) must
    stay valid: JSON parses and every code cell compiles."""
    import glob
    import json

    paths = sorted(glob.glob("notebooks/*.ipynb"))
    assert len(paths) >= 2
    for path in paths:
        nb = json.load(open(path))
        n_code = 0
        for cell in nb["cells"]:
            if cell["cell_type"] != "code":
                continue
            n_code += 1
            compile("".join(cell["source"]), path, "exec")
        assert n_code >= 2, path


def test_loader_shards_yield_equal_batch_counts():
    """Every shard must yield the SAME batch count (each batch drives a
    global-mesh collective step; an extra batch on one process hangs the
    others). n=199, 2 shards, bs=10 previously gave 10 vs 9 batches."""
    from tpu_speech.data.loader import DataLoader

    data = list(range(199))
    collate = lambda items: items

    def count(shard_id):
        dl = DataLoader(data, 10, collate, shuffle=True, num_workers=1,
                        shard_id=shard_id, num_shards=2)
        return sum(1 for _ in dl)

    c0, c1 = count(0), count(1)
    assert c0 == c1 == 9
    # and no duplicates within one shard's epoch
    dl = DataLoader(data, 10, collate, shuffle=True, num_workers=1,
                    shard_id=0, num_shards=2)
    seen = [x for b in dl for x in b]
    assert len(seen) == len(set(seen))


def test_inverse_sqrt_schedule_nonzero_without_warmup():
    """warmup_steps=0 (the SchedParams default) must not zero the lr."""
    import jax.numpy as jnp

    from tpu_speech.train.schedules import inverse_sqrt_annealing

    sched = inverse_sqrt_annealing(1e-3, warmup_steps=0)
    lr = float(sched(jnp.asarray(100.0)))
    assert lr > 0
    # still decays ~1/sqrt(s)
    assert abs(lr - 1e-3 / 10.0) / (1e-3 / 10.0) < 0.2
