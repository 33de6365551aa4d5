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
