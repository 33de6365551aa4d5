"""Load the reference SPIRAL torch model as a parity/conversion oracle.

The reference NeMo fork imports a dozen packages this offline image lacks
(omegaconf, hydra, pytorch_lightning, onnx, librosa, ...). None of them are
needed to *construct* the torch module graph and read its ``state_dict`` —
this module installs minimal stubs for all of them and returns the genuine
``ST2VecEncoder`` (st2vec_model.py:66) built from the shipped
``spiral_base_pretrain_ls960.py`` (or any other) experiment config.
"""

from __future__ import annotations

import importlib.machinery as _machinery
import logging
import sys
import types

SPIRAL_DIR = "/root/reference/SPIRAL"
EXAMPLES_DIR = f"{SPIRAL_DIR}/examples/asr"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    m.__spec__ = _machinery.ModuleSpec(name, loader=None)
    m.__path__ = []  # mark as package so submodule stubs can hang off it
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


class _DictConfig(dict):
    """dict with attribute access — enough of omegaconf.DictConfig for the
    dataclass-config path the shipped experiment files use."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


def _to_cfg(x):
    """Recursively convert dataclasses/dicts/lists to _DictConfig trees."""
    import dataclasses as _dc

    if _dc.is_dataclass(x) and not isinstance(x, type):
        return _DictConfig(
            (f.name, _to_cfg(getattr(x, f.name))) for f in _dc.fields(x)
        )
    if isinstance(x, dict):
        return _DictConfig((k, _to_cfg(v)) for k, v in x.items())
    if isinstance(x, tuple):
        return tuple(_to_cfg(v) for v in x)
    if isinstance(x, list):
        return [_to_cfg(v) for v in x]
    return x


class _OmegaConf:
    @staticmethod
    def structured(x):
        return _to_cfg(x)

    @staticmethod
    def create(x=None):
        return _to_cfg(x if x is not None else {})

    @staticmethod
    def merge(*configs):
        out = _DictConfig()
        for c in configs:
            c = _to_cfg(c)
            if isinstance(c, dict):
                out.update(c)
        return out

    @staticmethod
    def to_container(x, resolve=True):
        return dict(x) if isinstance(x, dict) else x

    @staticmethod
    def set_struct(x, v):
        pass

    @staticmethod
    def is_config(x):
        return isinstance(x, dict)


class _ContextDecorator:
    def __call__(self, *a, **k):
        return self

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _patch_dataclasses_for_py312():
    """The reference uses dataclass instances as mutable field defaults (an
    omegaconf convention, fine on the Python it targeted). Python 3.12
    rejects defaults whose class has __hash__=None — give nested dataclass
    defaults an identity hash so the reference config modules import."""
    import dataclasses as _dc

    if getattr(_dc, "__spiral_patch__", False):
        return
    orig = _dc._get_field

    def patched(cls, a_name, a_type, default_kw_only):
        default = getattr(cls, a_name, _dc.MISSING)
        if (
            default is not _dc.MISSING
            and not isinstance(default, _dc.Field)
            and _dc.is_dataclass(default)
            and type(default).__hash__ is None
        ):
            type(default).__hash__ = object.__hash__
        return orig(cls, a_name, a_type, default_kw_only)

    _dc._get_field = patched
    _dc.__spiral_patch__ = True


def install_stubs():
    if "omegaconf" in sys.modules and hasattr(
        sys.modules["omegaconf"], "__spiral_stub__"
    ):
        return
    _patch_dataclasses_for_py312()

    class _OCError(Exception):
        pass

    oc = _stub(
        "omegaconf", OmegaConf=_OmegaConf, DictConfig=_DictConfig,
        ListConfig=list, MISSING="???", open_dict=_ContextDecorator(),
        read_write=_ContextDecorator(),
    )
    oc.__spiral_stub__ = True
    oc.errors = _stub(
        "omegaconf.errors", OmegaConfBaseException=_OCError,
        ConfigKeyError=_OCError, ValidationError=_OCError,
        MissingMandatoryValue=_OCError, UnsupportedValueType=_OCError,
        ConfigValueError=_OCError,
    )
    _stub("omegaconf.omegaconf", OmegaConf=_OmegaConf, DictConfig=_DictConfig,
          MISSING="???", open_dict=_ContextDecorator())
    _stub("omegaconf.dictconfig", DictConfig=_DictConfig)

    class _Anything:
        def __init__(self, *a, **k):
            pass

    def _instantiate(config=None, **kw):
        """Real hydra-style instantiation: import `_target_`, call with the
        remaining keys (the reference builds its preprocessor and spec-augment
        modules through this path, common.py:253-274)."""
        import importlib as _il

        d = dict(config)
        d.update(kw)
        target = d.pop("_target_")
        d.pop("cls", None)
        d.pop("target", None)
        mod_name, cls_name = target.rsplit(".", 1)
        cls_obj = getattr(_il.import_module(mod_name), cls_name)
        return cls_obj(**d)

    hydra_mod = _stub("hydra")
    hydra_mod.utils = _stub("hydra.utils", instantiate=_instantiate,
          get_original_cwd=lambda: ".")
    _stub("hydra.types", TaskFunction=_Anything)
    _stub("hydra.core")
    _stub("hydra.core.config_store",
          ConfigStore=types.SimpleNamespace(instance=lambda: types.SimpleNamespace(store=lambda **k: None)))
    _stub("hydra.core.hydra_config", HydraConfig=_Anything)
    _stub("hydra._internal")
    _stub("hydra._internal.utils", _run_hydra=lambda *a, **k: None,
          get_args_parser=lambda: None)

    class _Metric:
        def __init__(self, *a, **k):
            pass

        def add_state(self, *a, **k):
            pass

    import torch as _torch

    class _LightningModule(_torch.nn.Module):
        """Real-ish base: torch Module so ST2VecEncoder's parameters
        register; MRO-compatible with the reference's ABC mixins."""

        def save_hyperparameters(self, *a, **k):
            pass

        @property
        def hparams(self):
            return {}

    class _Callback:
        pass

    pl = _stub(
        "pytorch_lightning", LightningModule=_LightningModule,
        Trainer=_Anything, Callback=_Callback,
        _logger=logging.getLogger("pytorch_lightning"),
    )
    pl.utilities = _stub("pytorch_lightning.utilities",
                         rank_zero_only=lambda f: f)
    _stub("pytorch_lightning.utilities.cloud_io", load=lambda *a, **k: None)
    _stub("pytorch_lightning.callbacks", ModelCheckpoint=_Anything)
    _stub("pytorch_lightning.callbacks.base", Callback=_Callback)
    _stub("pytorch_lightning.loggers", LoggerCollection=_Anything,
          TensorBoardLogger=_Anything, WandbLogger=_Anything)
    _stub("pytorch_lightning.metrics", Metric=_Metric)
    _stub("torchmetrics", Metric=_Metric)

    class _Version:
        def __init__(self, v):
            self.v = str(v)

        def __ge__(self, o):
            return True

        def __gt__(self, o):
            return True

        def __le__(self, o):
            return False

        def __lt__(self, o):
            return False

    pkg = _stub("packaging")
    pkg.version = _stub("packaging.version", Version=_Version, parse=_Version)

    _stub("onnx", ModelProto=_Anything, __version__="0.0",
          load=lambda *a, **k: None,
          checker=types.SimpleNamespace(check_model=lambda *a, **k: None))
    _stub("wget", download=lambda *a, **k: None)
    _stub("editdistance", eval=lambda a, b: 0)
    _stub("frozendict", frozendict=dict)
    _stub("inflect", engine=lambda: None)
    _stub("unidecode", unidecode=lambda s: s)
    _stub("soundfile", SoundFile=_Anything, read=lambda *a, **k: None)
    _stub("sentencepiece", SentencePieceProcessor=_Anything)
    _stub("braceexpand", braceexpand=lambda s: [s])
    _stub("webdataset", WebDataset=_Anything)
    _stub("ruamel")
    _stub("ruamel.yaml", YAML=_Anything)
    _stub("librosa", util=None, filters=None)
    _stub("librosa.util", tiny=lambda x: 1e-30)

    import numpy as _np

    def _mel(sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **kw):
        from tpu_speech.audio.mel import mel_filterbank

        return _np.asarray(
            mel_filterbank(sr, n_fft, n_mels, fmin, fmax or sr / 2)
        )

    sys.modules["librosa"].filters = _stub("librosa.filters", mel=_mel)
    sys.modules["librosa"].util = sys.modules["librosa.util"]

    _stub("numba", jit=lambda *a, **k: (lambda f: f), cuda=None)

    class _STFT(_torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    _stub("torch_stft", STFT=_STFT)


def _load_ref_config(config_name: str):
    """Load a reference experiment-config module under a synthetic package
    anchored at the reference's conf/spiral directory — the repo's own
    cli/conf package would otherwise shadow the reference's `conf.spiral`
    namespace when both are imported in one pytest process (and the config
    files use relative imports among themselves)."""
    import importlib

    pkg_name = "_spiral_ref_conf"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__spec__ = _machinery.ModuleSpec(pkg_name, loader=None,
                                             is_package=True)
        pkg.__path__ = [f"{EXAMPLES_DIR}/conf/spiral"]
        sys.modules[pkg_name] = pkg
    return importlib.import_module(f"{pkg_name}.{config_name}")


def load_st2vec_encoder(config_name: str = "spiral_base_pretrain_ls960"):
    """Returns (torch ST2VecEncoder instance, its encoder config)."""
    install_stubs()
    if SPIRAL_DIR not in sys.path:
        sys.path.insert(0, SPIRAL_DIR)
    if EXAMPLES_DIR not in sys.path:
        sys.path.insert(0, EXAMPLES_DIR)
    import importlib

    # the configs package must initialize before spec2vec_config is entered
    # directly, or its internal ctc_models_config <-> spec2vec_config cycle
    # trips (the reference's own entry points import it in this order too)
    importlib.import_module("nemo.collections.asr.models.configs")
    from nemo.collections.asr.models.st2vec.st2vec_model import ST2VecEncoder

    cfg_mod = _load_ref_config(config_name)
    # the launcher converts the dataclass tree with OmegaConf.structured
    # before model construction (run_spiral.py:104-109) — mirror that
    enc_cfg = _to_cfg(cfg_mod.cfg.model.st2vec_encoder)
    return ST2VecEncoder(enc_cfg), enc_cfg


def load_conv_asr_decoder(config_name: str = "spiral_base_finetune_ls100_subword"):
    """Returns the genuine reference ConvASRDecoder (conv_asr.py:214) built
    from a shipped finetune config's decoder settings."""
    install_stubs()
    if SPIRAL_DIR not in sys.path:
        sys.path.insert(0, SPIRAL_DIR)
    if EXAMPLES_DIR not in sys.path:
        sys.path.insert(0, EXAMPLES_DIR)
    import importlib

    importlib.import_module("nemo.collections.asr.models.configs")
    from nemo.collections.asr.modules.conv_asr import ConvASRDecoder

    cfg_mod = _load_ref_config(config_name)
    dec_cfg = _to_cfg(cfg_mod.cfg.model.decoder)
    kwargs = {k: v for k, v in dec_cfg.items() if k != "_target_"}
    return ConvASRDecoder(**kwargs), dec_cfg
