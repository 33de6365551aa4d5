"""Self-contained model archives (the reference's ``.nemo`` format analog).

SPIRAL saves tar(config.yaml + weights) archives (ModelPT save/restore,
nemo/core/classes/modelPT.py:~900-1268); here: tar(config.json +
params.msgpack) via flax serialization — restorable without the original
experiment directory.
"""

from __future__ import annotations

import dataclasses
import io
import json
import os
import tarfile
import time
from typing import Any, Dict, Sequence, Tuple

import flax.serialization
import jax


def _to_jsonable(o: Any) -> Any:
    """Recursively encode a config tree, tagging EVERY dataclass level with
    its import path so ``config_object`` can rebuild the exact dataclass
    composition (the reference round-trips hparams the same way through the
    .nemo archive's config.yaml, modelPT.py:~900-1268)."""
    if dataclasses.is_dataclass(o) and not isinstance(o, type):
        d: Dict[str, Any] = {
            "__dataclass__": type(o).__module__ + "." + type(o).__qualname__
        }
        for f in dataclasses.fields(o):
            d[f.name] = _to_jsonable(getattr(o, f.name))
        return d
    if isinstance(o, (list, tuple)):
        return [_to_jsonable(x) for x in o]
    if isinstance(o, dict):
        return {str(k): _to_jsonable(v) for k, v in o.items()}
    if isinstance(o, (str, int, float, bool)) or o is None:
        return o
    return str(o)


def _cfg_to_json(cfg: Any) -> str:
    return json.dumps(_to_jsonable(cfg), indent=2)


def config_object(config: Any) -> Any:
    """Inverse of ``_to_jsonable``: rebuild the dataclass config tree from an
    archive's config.json dict (the ``--use_chkpt_hparams`` load path)."""
    if isinstance(config, dict):
        target = config.get("__dataclass__")
        kwargs = {
            k: config_object(v) for k, v in config.items()
            if k != "__dataclass__"
        }
        if target is None:
            return kwargs
        import importlib

        module, _, qualname = target.rpartition(".")
        cls = importlib.import_module(module)
        for part in qualname.split("."):
            cls = getattr(cls, part)
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in kwargs.items() if k in fields})
    if isinstance(config, list):
        return [config_object(v) for v in config]
    return config


def save_archive(path: str, config: Any, params: Any,
                 extra: Dict[str, Any] | None = None) -> None:
    """Write tar archive: config.json + params.msgpack (+ extra trees)."""
    params = jax.device_get(params)
    members = {
        "config.json": _cfg_to_json(config).encode("utf-8"),
        "params.msgpack": flax.serialization.to_bytes(params),
    }
    for name, tree in (extra or {}).items():
        members[f"{name}.msgpack"] = flax.serialization.to_bytes(
            jax.device_get(tree)
        )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with tarfile.open(path, "w") as tar:
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = int(time.time())
            tar.addfile(info, io.BytesIO(data))


def load_archive(path: str, params_target: Any = None) -> Tuple[Dict, Any, Dict]:
    """Read an archive -> (config_dict, params, extra_trees)."""
    with tarfile.open(path, "r") as tar:
        names = tar.getnames()
        config = json.loads(tar.extractfile("config.json").read().decode("utf-8"))
        raw = tar.extractfile("params.msgpack").read()
        if params_target is not None:
            params = flax.serialization.from_bytes(params_target, raw)
        else:
            params = flax.serialization.msgpack_restore(raw)
        extra = {}
        for name in names:
            if name.endswith(".msgpack") and name != "params.msgpack":
                extra[name[:-8]] = flax.serialization.msgpack_restore(
                    tar.extractfile(name).read()
                )
    return config, params, extra
