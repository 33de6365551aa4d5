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
from typing import Any, Dict, Tuple

import flax.serialization
import jax


def _cfg_to_json(cfg: Any) -> str:
    def enc(o):
        if dataclasses.is_dataclass(o):
            return {
                "__dataclass__": type(o).__module__ + "." + type(o).__qualname__,
                **dataclasses.asdict(o),
            }
        return str(o)

    return json.dumps(cfg, indent=2, default=enc)


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
