#!/usr/bin/env python
"""Export a trained run as a params-only release asset.

Writes assets/<name>.msgpack (no optimizer state) + assets/<name>.json (the
config snapshot), so the repo ships a ready-to-demo model the way the
reference ships pretrained weights (SURVEY.md §6 Checkpoint/resume).

Usage: python scripts/export_model.py workdir=runs/ctc_big name=bigru_ctc
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lipreading_tpu.config import load_workdir_config, parse_overrides


def main(argv):
    args = parse_overrides(argv)
    workdir = args["workdir"]
    name = args.get("name", "model")

    import json

    import jax
    import numpy as np
    from flax import serialization

    from lipreading_tpu.config import preset
    from lipreading_tpu.models.lipreader import init_model
    from lipreading_tpu.train.checkpoint import latest_checkpoint, load_checkpoint

    cfg = load_workdir_config(workdir) or preset(args.get("preset", "bigru-ctc"))
    params = init_model(jax.random.PRNGKey(0), cfg)
    path = latest_checkpoint(os.path.join(workdir, "ckpt"))
    assert path, f"no checkpoint in {workdir}/ckpt"
    step, params, _, _, _ = load_checkpoint(path, params)

    out_dir = os.path.join(os.path.dirname(__file__), "..", "assets")
    os.makedirs(out_dir, exist_ok=True)
    blob = serialization.msgpack_serialize(
        serialization.to_state_dict(jax.tree.map(np.asarray, params))
    )
    out = os.path.join(out_dir, f"{name}.msgpack")
    with open(out, "wb") as f:
        f.write(blob)
    with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
        json.dump({"config": cfg.to_dict(), "step": step}, f, indent=1,
                  default=str)
    print(f"exported step-{step} params ({os.path.getsize(out)>>20} MiB) -> {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
