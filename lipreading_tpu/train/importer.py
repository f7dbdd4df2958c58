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


def import_groupnorm(sd: dict, prefix: str = "") -> dict:
    return {"scale": _np(sd[_k(prefix, "weight")]),
            "bias": _np(sd[_k(prefix, "bias")])}


def import_grucell(sd: dict, prefix: str = "") -> dict:
    """torch.nn.GRUCell -> our gru_cell pytree (same r,z,n gate order)."""
    return {
        "w_ih": _np(sd[_k(prefix, "weight_ih")]).T,
        "w_hh": _np(sd[_k(prefix, "weight_hh")]).T,
        "b_ih": _np(sd[_k(prefix, "bias_ih")]),
        "b_hh": _np(sd[_k(prefix, "bias_hh")]),
    }


def import_model(sd: dict, cfg) -> dict:
    """Assemble the COMPLETE params pytree from a reference-shaped torch
    state_dict: Conv3d stack -> bidirectional nn.GRU -> Bahdanau GRU
    attention decoder -> linear CTC head (SURVEY.md §3 model rows). This is
    the full-model gate behind the fp32 transcript parity contract
    (BASELINE.md "bit-for-bit" row): tests/torch_ref.py builds exactly this
    module in torch, and tests/test_parity_gate.py asserts string-identical
    fp32 transcripts between its decode and ``infer.transcribe``.

    Expected state_dict layout (prefix -> torch module):
        frontend.conv{0,1,2}        nn.Conv3d          (weight, bias)
        frontend.gn{0,1,2}          nn.GroupNorm(8, C) (weight, bias)
        frontend.proj               nn.Linear
        frontend.highway.{i}.h/.t   nn.Linear pairs
        encoder.gru                 nn.GRU(bidirectional=True, num_layers=K)
        ctc_head                    nn.Linear           [decoder ctc|hybrid]
        att_decoder.embed           nn.Embedding        [decoder attention|hybrid]
        att_decoder.attn_enc        nn.Linear(2H, A, bias=False)
        att_decoder.attn_dec        nn.Linear(H, A)
        att_decoder.attn_v          nn.Linear(A, 1, bias=False)
        att_decoder.gru             nn.GRUCell(H + 2H, H)
        att_decoder.out             nn.Linear(H + 2H, V)

    Every state_dict entry must be consumed — unknown keys raise (a gate
    that silently ignores weights cannot certify parity).
    """
    m = cfg.model
    if m.frontend != "conv3d":
        raise ValueError(
            "import_model maps the reference-shaped conv3d frontend; "
            f"cfg.model.frontend={m.frontend!r} has no torch counterpart "
            "(train it natively via scripts/train.py)"
        )
    consumed: set[str] = set()
    tracking = dict(sd)

    def take(fn, prefix, **kw):
        before = set(tracking)
        out = fn(tracking, prefix, **kw)
        # mark keys consumed by prefix (importers read, never delete)
        for k in before:
            if k == prefix or k.startswith(prefix + "."):
                consumed.add(k)
        return out

    params: dict = {
        "frontend": {
            "conv0": take(import_conv3d, "frontend.conv0"),
            "gn0": take(import_groupnorm, "frontend.gn0"),
            "conv1": take(import_conv3d, "frontend.conv1"),
            "gn1": take(import_groupnorm, "frontend.gn1"),
            "conv2": take(import_conv3d, "frontend.conv2"),
            "gn2": take(import_groupnorm, "frontend.gn2"),
            "proj": take(import_linear, "frontend.proj"),
            "highway": [
                {
                    "h": take(import_linear, f"frontend.highway.{i}.h"),
                    "t": take(import_linear, f"frontend.highway.{i}.t"),
                }
                for i in range(m.highway_layers)
            ],
        },
        "encoder": {
            "layers": [
                {
                    "fwd": take(import_gru_cell, "encoder.gru",
                                layer=layer, reverse=False),
                    "bwd": take(import_gru_cell, "encoder.gru",
                                layer=layer, reverse=True),
                }
                for layer in range(m.gru_layers)
            ]
        },
    }
    if cfg.decoder in ("ctc", "hybrid"):
        params["ctc_head"] = take(import_linear, "ctc_head")
    if cfg.decoder in ("attention", "hybrid"):
        params["att_decoder"] = {
            "embed": take(import_embedding, "att_decoder.embed"),
            "attn_enc": take(import_linear, "att_decoder.attn_enc"),
            "attn_dec": take(import_linear, "att_decoder.attn_dec"),
            "attn_v": take(import_linear, "att_decoder.attn_v"),
            "gru": take(import_grucell, "att_decoder.gru"),
            "out": take(import_linear, "att_decoder.out"),
        }
    leftover = [k for k in sd if k not in consumed
                and not k.endswith("num_batches_tracked")]
    if leftover:
        raise ValueError(
            f"state_dict keys not consumed by import_model: {sorted(leftover)}"
        )
    return params


def export_model_state_dict(params: dict, cfg) -> dict:
    """Inverse of :func:`import_model`: our params pytree -> a torch
    state_dict in the reference-shaped layout (torch tensors).

    Used by the parity gate to load *trained* release weights into the
    eager-torch reference model and compare decodes; round-tripping through
    import_model must reproduce the pytree bit-for-bit (pure transposes).
    """
    import torch

    if cfg.model.frontend != "conv3d":
        raise ValueError(
            "export_model_state_dict maps the reference-shaped conv3d "
            f"frontend; cfg.model.frontend={cfg.model.frontend!r} has no "
            "torch counterpart"
        )

    sd: dict = {}

    def put(key, arr, transpose=False):
        a = np.asarray(arr, dtype=np.float32)
        sd[key] = torch.from_numpy(
            np.ascontiguousarray(a.T if transpose else a).copy()
        )

    fe = params["frontend"]
    for i in range(3):
        w = np.asarray(fe[f"conv{i}"]["w"])            # DHWIO
        sd[f"frontend.conv{i}.weight"] = torch.from_numpy(
            np.ascontiguousarray(np.transpose(w, (4, 3, 0, 1, 2)))
        )
        put(f"frontend.conv{i}.bias", fe[f"conv{i}"]["b"])
        put(f"frontend.gn{i}.weight", fe[f"gn{i}"]["scale"])
        put(f"frontend.gn{i}.bias", fe[f"gn{i}"]["bias"])
    put("frontend.proj.weight", fe["proj"]["w"], transpose=True)
    put("frontend.proj.bias", fe["proj"]["b"])
    for i, hp in enumerate(fe["highway"]):
        for part in ("h", "t"):
            put(f"frontend.highway.{i}.{part}.weight", hp[part]["w"],
                transpose=True)
            put(f"frontend.highway.{i}.{part}.bias", hp[part]["b"])

    for layer, lp in enumerate(params["encoder"]["layers"]):
        for cell, sfx in ((lp["fwd"], f"_l{layer}"),
                          (lp["bwd"], f"_l{layer}_reverse")):
            put(f"encoder.gru.weight_ih{sfx}", cell["w_ih"], transpose=True)
            put(f"encoder.gru.weight_hh{sfx}", cell["w_hh"], transpose=True)
            put(f"encoder.gru.bias_ih{sfx}", cell["b_ih"])
            put(f"encoder.gru.bias_hh{sfx}", cell["b_hh"])

    if "ctc_head" in params:
        put("ctc_head.weight", params["ctc_head"]["w"], transpose=True)
        put("ctc_head.bias", params["ctc_head"]["b"])
    if "att_decoder" in params:
        ad = params["att_decoder"]
        put("att_decoder.embed.weight", ad["embed"]["table"])
        put("att_decoder.attn_enc.weight", ad["attn_enc"]["w"], transpose=True)
        put("att_decoder.attn_dec.weight", ad["attn_dec"]["w"], transpose=True)
        put("att_decoder.attn_dec.bias", ad["attn_dec"]["b"])
        put("att_decoder.attn_v.weight", ad["attn_v"]["w"], transpose=True)
        put("att_decoder.gru.weight_ih", ad["gru"]["w_ih"], transpose=True)
        put("att_decoder.gru.weight_hh", ad["gru"]["w_hh"], transpose=True)
        put("att_decoder.gru.bias_ih", ad["gru"]["b_ih"])
        put("att_decoder.gru.bias_hh", ad["gru"]["b_hh"])
        put("att_decoder.out.weight", ad["out"]["w"], transpose=True)
        put("att_decoder.out.bias", ad["out"]["b"])
    return sd


def load_torch_state_dict(path: str) -> dict:
    """Load a torch checkpoint file to a flat state_dict (CPU)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj
