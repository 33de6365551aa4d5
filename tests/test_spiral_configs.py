"""The full SPIRAL experiment-config matrix (reference
examples/asr/conf/spiral/*.py — 10 configs): every config imports, validates,
builds its optimizer, and its model family constructs. Base-size models run a
real step (slow tier); large is validated structurally via jax.eval_shape
(no 600M-param CPU allocation)."""

import dataclasses
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, os.path.join(REPO, "cli"))

from importlib import import_module

from tpu_speech.train.optim import make_optimizer

PRETRAIN_CONFIGS = [
    "spiral_base_pretrain_ls960",
    "spiral_base_pretrain_ls960_noise",
    "spiral_large_pretrain_librilight",
]
FINETUNE_CONFIGS = [
    "spiral_base_finetune_ls100_char",
    "spiral_base_finetune_ls100_subword",
    "spiral_base_finetune_ls100_subword_noise",
    "spiral_large_finetune_ls100_char",
    "spiral_large_finetune_ls100_subword",
    "spiral_large_finetune_ls960_char",
    "spiral_large_finetune_ls960_subword",
]


def _load(name):
    return import_module(f"conf.spiral.{name}").cfg


@pytest.mark.parametrize("name", PRETRAIN_CONFIGS + FINETUNE_CONFIGS)
def test_config_constructs_and_validates(name):
    cfg = _load(name)
    m = cfg.model
    assert m.encoder is not None
    assert m.train_ds.manifest_filepath
    assert cfg.trainer.max_steps > 0
    # optimizer + schedule build from the config as the runner would
    tx = make_optimizer(m.optim, cfg.trainer.max_steps, lr_scale=1.0)
    p = {"w": jnp.ones((2,))}
    tx.init(p)
    # encoder structure is self-consistent
    for blk in m.encoder.blocks:
        t = blk.transformer
        if t is not None:
            assert t.embedding_dim % t.num_attention_heads == 0
    sub = 1
    for blk in m.encoder.blocks:
        for c in blk.conv_layers:
            sub *= c.stride[0]
    assert sub == 8  # SPIRAL's 8x subsampling, all variants
    assert m.encoder.shift_unit == 8


@pytest.mark.parametrize("name", FINETUNE_CONFIGS)
def test_finetune_decoder_heads(name):
    cfg = _load(name)
    dec = cfg.model.decoder
    assert dec is not None
    if "char" in name:
        assert dec.blank_pos == "after_vocab_last"
        assert dec.upsample_rate == 4
        assert len(dec.conv_layers) == 3
        assert cfg.model.labels is not None
    else:
        assert dec.blank_pos == "vocab_first"
        assert dec.upsample_rate is None
        assert len(dec.conv_layers) == 2
        assert cfg.model.tokenizer_file


def test_noise_variants_carry_noise_config():
    for name in ("spiral_base_pretrain_ls960_noise",
                 "spiral_base_finetune_ls100_subword_noise"):
        cfg = _load(name)
        np_cfg = cfg.model.noise_perturb
        assert np_cfg is not None and np_cfg.manifest_path
        assert np_cfg.min_snr_db == 0.0 and np_cfg.max_snr_db == 30.0
        assert np_cfg.ratio == 0.5
    # and the base config objects were not mutated by the noise variants
    assert _load("spiral_base_pretrain_ls960").model.noise_perturb is None
    assert _load("spiral_base_finetune_ls100_subword").model.noise_perturb is None


def test_spiral_large_structure_no_alloc():
    """SPIRAL-large validated by abstract evaluation: init traces, the
    parameter count lands in the expected class, no memory allocated."""
    from tpu_speech.models.spiral.st2vec import ST2VecEncoder

    cfg = _load("spiral_large_pretrain_librilight").model.encoder
    model = ST2VecEncoder(cfg)
    specs = jax.ShapeDtypeStruct((1, 64, cfg.num_features), jnp.float32)
    lens = jax.ShapeDtypeStruct((1,), jnp.int32)
    shapes = jax.eval_shape(
        lambda s, l: model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, s, l, train=False
        ),
        specs, lens,
    )
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes["params"]))
    # reference SPIRAL-large: 20x1024 transformer + 4x512 -> ~300-360M
    assert 250e6 < n < 500e6, n
    # block dims straight from the reference file (lines 73-108)
    assert cfg.blocks[1].transformer.encoder_layers == 20
    assert cfg.blocks[1].transformer.embedding_dim == 1024
    assert cfg.blocks[1].transformer.num_attention_heads == 16
    assert cfg.projector_dim == 512
    assert cfg.target_momentum == 0.99 and cfg.target_momentum_final == 0.999


@pytest.mark.slow
def test_char_head_upsampling_step():
    """The char CTC head (4x ProjUpsampling + appended blank) runs a train
    step end to end on a tiny encoder."""
    import optax

    from tests.test_distributed import _zero_dropout_blocks
    from tests.test_spiral_pretrain import TINY_CFG
    from tpu_speech.models.spiral.ctc import (
        CTCFinetuneModel,
        CTCTrainState,
        make_finetune_step,
    )
    from tpu_speech.models.spiral.encoder import ConvLayerCfg
    from tpu_speech.parallel.mesh import make_mesh, replicate, shard_batch

    cfg = dataclasses.replace(TINY_CFG, blocks=_zero_dropout_blocks())
    vocab = 28
    model = CTCFinetuneModel(
        cfg, vocab, "after_vocab_last",
        decoder_convs=(
            ConvLayerCfg(32, (5,), (1,), None, "relu", 0.0),
            ConvLayerCfg(32, (5,), (1,), None, "relu", 0.0),
            ConvLayerCfg(32, (5,), (1,), None, "relu", 0.0),
        ),
        upsample_rate=4, upsample_filters=32,
    )
    assert model.blank_idx == vocab
    rng = np.random.default_rng(0)
    b = 2
    batch = {
        "wavs": (rng.standard_normal((b, 8000)) * 0.1).astype(np.float32),
        "wav_lens": np.full((b,), 8000, dtype=np.int32),
        "labels": rng.integers(0, vocab, size=(b, 8)).astype(np.int32),
        "label_lens": np.full((b,), 8, dtype=np.int32),
    }
    specs = jnp.zeros((1, 64, cfg.num_features))
    lens = jnp.full((1,), 64)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, specs, lens, train=False
    )
    # upsampled logit length: 64 specs / 8 subsample * 4 upsample = 32 frames
    (lp, lpl), _ = model.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        specs, lens, train=False, mutable=["batch_stats"],
    )
    assert lp.shape[-1] == vocab + 1  # appended blank
    assert int(lpl[0]) == 32

    mesh = make_mesh(n_devices=2)
    tx = optax.adam(1e-4)
    state = replicate(mesh, CTCTrainState(
        jnp.zeros((), jnp.int32), variables["params"],
        variables.get("batch_stats", {}), tx.init(variables["params"]),
    ))
    step = make_finetune_step(model, cfg, tx, 0)
    state, metrics = step(state, shard_batch(mesh, batch), jax.random.PRNGKey(1))
    assert np.isfinite(float(jax.device_get(metrics)["loss"]))


@pytest.mark.slow
def test_spiral_base_pretrain_config_one_step():
    """The real SPIRAL-base encoder (97M class) from the ls960 config runs
    one pretrain step on short specs."""
    import optax

    from tpu_speech.models.spiral.st2vec import ST2VecEncoder
    from tpu_speech.parallel.mesh import make_mesh, replicate, shard_batch
    from tpu_speech.train.spiral import (
        host_augment_batch,
        init_spiral_state,
        make_pretrain_step,
    )

    cfg = _load("spiral_base_pretrain_ls960").model.encoder
    model = ST2VecEncoder(cfg)
    tx = optax.adamw(1e-3)
    b, n_samples = 2, 20480
    spec_len = 144  # 1 + 20480//160 = 129 -> pad16 -> 144
    rng = np.random.default_rng(0)
    wavs = (rng.standard_normal((b, n_samples)) * 0.1).astype(np.float32)
    lens = np.full((b,), n_samples, dtype=np.int32)
    batch = host_augment_batch(
        cfg, wavs, lens, wavs.copy(), lens.copy(), spec_len,
        np.random.default_rng(1),
    )
    mesh = make_mesh(n_devices=2)
    state = replicate(mesh, init_spiral_state(
        model, jax.random.PRNGKey(0), (b, spec_len, cfg.num_features), tx
    ))
    step = make_pretrain_step(model, cfg, tx)
    state, metrics = step(state, shard_batch(mesh, batch), jax.random.PRNGKey(2))
    assert np.isfinite(float(jax.device_get(metrics)["loss"]))


# ---------------------------------------------------------------------------
# YAML experiment files + dotted overrides (reference legacy hydra path,
# run_spiral.py:113-131, and OmegaConf struct-mode validation :104-109)


def test_apply_override_coerces_and_validates():
    from tpu_speech.utils.config import apply_override, apply_overrides

    cfg = _load("spiral_tiny_test")
    import copy

    cfg = copy.deepcopy(cfg)
    apply_override(cfg, "model.optim.lr", 3e-3)
    assert cfg.model.optim.lr == 3e-3
    # int -> float coercion (YAML '1' for a float field)
    apply_override(cfg, "model.optim.weight_decay", 1)
    assert cfg.model.optim.weight_decay == 1.0
    assert isinstance(cfg.model.optim.weight_decay, float)
    # tuple field from a YAML list
    apply_override(cfg, "model.optim.betas", [0.8, 0.9])
    assert cfg.model.optim.betas == (0.8, 0.9)
    # nested mapping form
    apply_overrides(cfg, {"trainer": {"max_steps": 7, "log_every_n_steps": 2}})
    assert cfg.trainer.max_steps == 7 and cfg.trainer.log_every_n_steps == 2
    # struct mode: unknown keys raise with the full dotted path
    with pytest.raises(KeyError, match="model.optim.lrr"):
        apply_override(cfg, "model.optim.lrr", 1.0)
    with pytest.raises(KeyError, match="nonexistent"):
        apply_overrides(cfg, {"trainer": {"nonexistent": 1}})


def test_apply_override_constructs_optional_dataclass():
    from tpu_speech.utils.config import apply_override
    from tpu_speech.utils.config import NoisePerturbConfig

    cfg = _load("spiral_tiny_test")
    import copy

    cfg = copy.deepcopy(cfg)
    assert cfg.model.noise_perturb is None
    apply_override(cfg, "model.noise_perturb.min_snr_db", 5.0)
    assert isinstance(cfg.model.noise_perturb, NoisePerturbConfig)
    assert cfg.model.noise_perturb.min_snr_db == 5.0


def test_yaml_experiment_file(tmp_path):
    from tpu_speech.utils.config import (
        apply_overrides,
        load_yaml_experiment,
    )

    y = tmp_path / "exp.yaml"
    y.write_text(
        "base: spiral_tiny_test\n"
        "model:\n"
        "  optim:\n"
        "    lr: 0.004\n"
        "trainer:\n"
        "  max_epochs: 3\n"
    )
    base, overrides = load_yaml_experiment(str(y))
    assert base == "spiral_tiny_test"
    import copy

    cfg = copy.deepcopy(_load(base))
    apply_overrides(cfg, overrides)
    assert cfg.model.optim.lr == 0.004
    assert cfg.trainer.max_epochs == 3
    # missing base is an error
    bad = tmp_path / "bad.yaml"
    bad.write_text("model:\n  optim:\n    lr: 1\n")
    with pytest.raises(ValueError, match="base"):
        load_yaml_experiment(str(bad))


def test_parse_cli_override_yaml_scalars():
    from tpu_speech.utils.config import parse_cli_override

    assert parse_cli_override("model.optim.lr=3e-3") == ("model.optim.lr", 3e-3)
    assert parse_cli_override("trainer.max_steps=100") == ("trainer.max_steps", 100)
    assert parse_cli_override("model.precision=bf16") == ("model.precision", "bf16")
    k, v = parse_cli_override("model.use_teacher_encoder=true")
    assert v is True
    with pytest.raises(ValueError):
        parse_cli_override("no_equals_sign")
