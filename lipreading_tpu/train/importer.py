"""One-way PyTorch state_dict -> JAX pytree weight importer.

SURVEY.md §6 "Checkpoint / resume": "a one-way weight importer from the
reference's PyTorch state_dict layout into the JAX pytree — required for the
bit-for-bit transcript parity gate". The reference checkpoints themselves are
not present in this environment (SURVEY.md §0), so the importer is specified
against the reference's module types (torch.nn.Conv3d / GRU / Linear /
Embedding — SURVEY.md §3) and validated by round-tripping torch models built
with those exact types (tests/test_importer.py).

Layout conventions (torch -> ours):
    Linear      weight [out, in]        -> w [in, out] (transpose), b [out]
    Conv3d      weight [O, I, kT, kH, kW] -> w [kT, kH, kW, I, O] (DHWIO)
    GRU         weight_ih_l{k}(_reverse) [3H, in] -> w_ih [in, 3H] (transpose;
                gate order r,z,n is identical), biases copied
    Embedding   weight [V, D]           -> table [V, D]

torch (CPU build) is an optional dependency, used only here and in tests.
"""

from __future__ import annotations

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def _k(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def import_linear(sd: dict, prefix: str = "") -> dict:
    p = {"w": _np(sd[_k(prefix, "weight")]).T}
    if _k(prefix, "bias") in sd:
        p["b"] = _np(sd[_k(prefix, "bias")])
    return p


def import_conv3d(sd: dict, prefix: str = "") -> dict:
    w = _np(sd[_k(prefix, "weight")])             # [O, I, kT, kH, kW]
    p = {"w": np.transpose(w, (2, 3, 4, 1, 0))}   # -> DHWIO
    if _k(prefix, "bias") in sd:
        p["b"] = _np(sd[_k(prefix, "bias")])
    return p


def import_embedding(sd: dict, prefix: str = "") -> dict:
    return {"table": _np(sd[_k(prefix, "weight")])}


def import_gru_cell(sd: dict, prefix: str, layer: int = 0,
                    reverse: bool = False) -> dict:
    sfx = f"_l{layer}" + ("_reverse" if reverse else "")
    return {
        "w_ih": _np(sd[_k(prefix, f"weight_ih{sfx}")]).T,
        "w_hh": _np(sd[_k(prefix, f"weight_hh{sfx}")]).T,
        "b_ih": _np(sd[_k(prefix, f"bias_ih{sfx}")]),
        "b_hh": _np(sd[_k(prefix, f"bias_hh{sfx}")]),
    }


def import_bigru(sd: dict, prefix: str, layers: int) -> dict:
    return {
        "layers": [
            {
                "fwd": import_gru_cell(sd, prefix, layer, False),
                "bwd": import_gru_cell(sd, prefix, layer, True),
            }
            for layer in range(layers)
        ]
    }


def import_batchnorm_as_scale_bias(sd: dict, prefix: str, eps: float = 1e-5) -> dict:
    """Fold an inference-mode BatchNorm into GroupNorm-style scale/bias.

    Only valid for *frozen* (eval-mode) BN: y = (x - mean)/sqrt(var+eps) * g + b
    folds to y = x * scale + bias with scale = g/sqrt(var+eps). Note this is
    an affine transform of x, NOT a normalization — callers must apply it with
    ``nn``'s identity-stat norm (i.e. use apply_frozen_bn below), not groupnorm.
    """
    g = _np(sd[_k(prefix, "weight")])
    b = _np(sd[_k(prefix, "bias")])
    mean = _np(sd[_k(prefix, "running_mean")])
    var = _np(sd[_k(prefix, "running_var")])
    scale = g / np.sqrt(var + eps)
    return {"scale": scale, "bias": b - mean * scale}


def apply_frozen_bn(p: dict, x):
    """Apply folded inference-mode BatchNorm (channel-last)."""
    return x * p["scale"] + p["bias"]


def load_torch_state_dict(path: str) -> dict:
    """Load a torch checkpoint file to a flat state_dict (CPU)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj
