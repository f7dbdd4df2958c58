"""Pytree checkpointing (ref: torch.save/load of state_dict — SURVEY.md §6).

Saves {params, opt_state, step, iterator state, config} as msgpack via
flax.serialization (pure array bytes, no pickle) + a JSON sidecar for
humans. Keeps the last N checkpoints; atomic rename so a crash mid-write
never corrupts the latest.
"""

from __future__ import annotations

import json
import os
import re

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    ckpt_dir: str,
    step: int,
    params,
    opt_state=None,
    iterator_state: dict | None = None,
    extra: dict | None = None,
    keep: int = 3,
) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    state = {
        "step": step,
        "params": serialization.to_state_dict(_to_numpy(params)),
        "opt_state": (
            serialization.to_state_dict(_to_numpy(opt_state))
            if opt_state is not None else {}
        ),
    }
    blob = serialization.msgpack_serialize(state)
    path = os.path.join(ckpt_dir, f"ckpt_{step:08d}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    meta = {
        "step": step,
        "iterator_state": iterator_state or {},
        "extra": extra or {},
    }
    with open(path.replace(".msgpack", ".json"), "w") as f:
        json.dump(meta, f)
    _prune(ckpt_dir, keep)
    return path


def _prune(ckpt_dir: str, keep: int) -> None:
    ckpts = sorted(
        f for f in os.listdir(ckpt_dir)
        if re.fullmatch(r"ckpt_\d+\.msgpack", f)
    )
    for f in ckpts[:-keep]:
        os.remove(os.path.join(ckpt_dir, f))
        sidecar = os.path.join(ckpt_dir, f.replace(".msgpack", ".json"))
        if os.path.exists(sidecar):
            os.remove(sidecar)


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = sorted(
        f for f in os.listdir(ckpt_dir)
        if re.fullmatch(r"ckpt_\d+\.msgpack", f)
    )
    return os.path.join(ckpt_dir, ckpts[-1]) if ckpts else None


def load_checkpoint(path: str, params_template, opt_state_template=None):
    """Restore against templates (shape/dtype-checked by flax).

    Returns (step, params, opt_state, iterator_state, extra).
    """
    with open(path, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(params_template, state["params"])
    opt_state = None
    if opt_state_template is not None and state.get("opt_state"):
        opt_state = serialization.from_state_dict(
            opt_state_template, state["opt_state"]
        )
    meta_path = path.replace(".msgpack", ".json")
    iterator_state, extra = {}, {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        iterator_state = meta.get("iterator_state", {})
        extra = meta.get("extra", {})
    return int(state["step"]), params, opt_state, iterator_state, extra
