"""Device mesh + sharding helpers.

DP-over-ICI is the primary strategy (BASELINE.json config 5: v5e-8); the mesh
keeps a second ``model`` axis plumbed through so tensor-parallel layouts can
be enabled by config without code changes (SURVEY.md §3: "keep mesh-axis
plumbing generic so TP can shard the transformer later").
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lipreading_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp * mp > n:
        raise ValueError(f"mesh {dp}x{mp} needs {dp*mp} devices, have {n}")
    arr = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh (params, opt state)."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Leading-dim sharding for batches."""
    return NamedSharding(mesh, P(data_axis))


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Put a host batch dict on the mesh, batch dim split over the data axis."""
    s = batch_sharding(mesh, data_axis)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def param_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_host_local_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Multi-host input sharding: each host contributes its LOCAL batch shard
    and the result is a global array sharded over the data axis.

    On a single-host mesh this reduces to shard_batch. On multi-host slices
    (e.g. v5e-16+), each host's input pipeline loads only its 1/num_hosts of
    the global batch (SURVEY.md §5 "per-host input sharding") and
    jax.make_array_from_process_local_data assembles the global view without
    any cross-host data movement.
    """
    if jax.process_count() == 1:
        return shard_batch(batch, mesh, data_axis)
    s = batch_sharding(mesh, data_axis)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
        batch,
    )


def model_param_shardings(params, mesh: Mesh, cfg=None,
                          model_axis: str = "model"):
    """Tensor-parallel NamedSharding tree for the model params.

    GSPMD-style TP: only *annotations* — the XLA partitioner inserts the
    all-reduces. Sharded over the ``model`` axis:

    * transformer MLP: in-proj columns / out-proj rows (megatron layout, so
      the pair needs a single psum at the block end);
    * attention q/k/v columns (head-parallel) / output-proj rows;
    * embedding + vocab output columns.

    Everything else (frontend convs, GRU, norms, biases) replicates — those
    layers are small; DP covers them. With model_parallel == 1 this
    degenerates to full replication.
    """
    rep = NamedSharding(mesh, P())
    col = NamedSharding(mesh, P(None, model_axis))   # shard output features
    row = NamedSharding(mesh, P(model_axis, None))   # shard input features

    def dense_s(kind):
        # {"w": [in, out], "b": [out]}
        if kind == "col":
            return {"w": col, "b": NamedSharding(mesh, P(model_axis))}
        return {"w": row, "b": rep}

    # walk the tree by structure instead of per-leaf paths: simpler + robust
    import jax

    def map_tf_layer(lp):
        out = jax.tree.map(lambda _: rep, lp)
        for attn_key in ("attn", "self", "cross"):
            if attn_key in lp:
                out[attn_key] = {
                    "q": dense_s("col"), "k": dense_s("col"),
                    "v": dense_s("col"), "o": dense_s("row"),
                }
        if "mlp" in lp:
            out["mlp"] = {"in": dense_s("col"), "out": dense_s("row")}
        return out

    shardings = jax.tree.map(lambda _: rep, params)
    for side in ("encoder", "att_decoder"):
        sub = params.get(side)
        if isinstance(sub, dict) and "layers" in sub and sub["layers"] \
                and "ln1" in sub["layers"][0]:
            shardings[side]["layers"] = [
                map_tf_layer(lp) for lp in sub["layers"]
            ]
    return shardings
