"""Reference-shaped PyTorch model + host decode loops (parity-gate fixture).

This is the torch side of the fp32 transcript parity gate (SURVEY.md §5 item
5, BASELINE.md "bit-for-bit" row): a complete eager-PyTorch lip reader with
the reference's module types — Conv3d stack -> bidirectional nn.GRU ->
Bahdanau GRU attention decoder -> linear CTC head (SURVEY.md §3 model rows)
— whose state_dict is exactly what ``importer.import_model`` consumes.

The decode functions below are the reference-style host Python loops
(SURVEY.md §4.3): per-step greedy/beam over eager decoder calls. The gate in
tests/test_parity_gate.py asserts their transcripts are string-identical to
``infer.transcribe``'s jitted device decodes at fp32.

Geometry note: the JAX frontend convs use XLA SAME padding; with stride
(1, 2, 2) and a 5x5 spatial kernel that pad is asymmetric (lo=1, hi=2).
``_pad_same`` reproduces it exactly so both frontends see identical windows.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

NEG_INF = -1e30


def _same_pad_1d(size: int, k: int, s: int) -> tuple[int, int]:
    """XLA SAME padding (extra pad goes high, like TF/XLA)."""
    out = -(-size // s)
    total = max((out - 1) * s + k - size, 0)
    lo = total // 2
    return lo, total - lo


def _pad_same(x: torch.Tensor, k: tuple, s: tuple) -> torch.Tensor:
    """x: [B, C, T, H, W]; pad to XLA SAME for kernel k / stride s."""
    _, _, T, H, W = x.shape
    pt = _same_pad_1d(T, k[0], s[0])
    ph = _same_pad_1d(H, k[1], s[1])
    pw = _same_pad_1d(W, k[2], s[2])
    return F.pad(x, (pw[0], pw[1], ph[0], ph[1], pt[0], pt[1]))


class Highway(nn.Module):
    def __init__(self, dim: int):
        super().__init__()
        self.h = nn.Linear(dim, dim)
        self.t = nn.Linear(dim, dim)

    def forward(self, x):
        h = F.relu(self.h(x))
        t = torch.sigmoid(self.t(x))
        return h * t + x * (1.0 - t)


class Frontend3D(nn.Module):
    """Conv3d stack mirroring models/frontend3d.py (GroupNorm flavour)."""

    def __init__(self, cfg):
        super().__init__()
        c0, c1, c2 = cfg.model.frontend_channels
        self.conv0 = nn.Conv3d(1, c0, (3, 5, 5), stride=(1, 2, 2))
        self.gn0 = nn.GroupNorm(math.gcd(8, c0), c0)
        self.conv1 = nn.Conv3d(c0, c1, (3, 5, 5))
        self.gn1 = nn.GroupNorm(math.gcd(8, c1), c1)
        self.conv2 = nn.Conv3d(c1, c2, (3, 3, 3))
        self.gn2 = nn.GroupNorm(math.gcd(8, c2), c2)
        self.proj = nn.Linear(c2 * 6 * 6, cfg.model.frontend_dim)
        self.highway = nn.ModuleList(
            Highway(cfg.model.frontend_dim)
            for _ in range(cfg.model.highway_layers)
        )
        self.pool = nn.MaxPool3d((1, 2, 2))

    def forward(self, rois):                      # [B, T, R, R] float
        x = rois.unsqueeze(1)                     # NCDHW [B, 1, T, R, R]
        x = self.conv0(_pad_same(x, (3, 5, 5), (1, 2, 2)))
        x = self.pool(F.relu(self.gn0(x)))
        x = self.conv1(_pad_same(x, (3, 5, 5), (1, 1, 1)))
        x = self.pool(F.relu(self.gn1(x)))
        x = self.conv2(_pad_same(x, (3, 3, 3), (1, 1, 1)))
        x = self.pool(F.relu(self.gn2(x)))
        # [B, C, T, 6, 6] -> [B, T, 6, 6, C] -> flatten (h, w, c) order
        x = x.permute(0, 2, 3, 4, 1).contiguous()
        B, T = x.shape[:2]
        x = self.proj(x.reshape(B, T, -1))
        for hw in self.highway:
            x = hw(x)
        return x                                  # [B, T, D]


class Encoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.gru = nn.GRU(
            cfg.model.frontend_dim, cfg.model.gru_hidden,
            num_layers=cfg.model.gru_layers, batch_first=True,
            bidirectional=True,
        )

    def forward(self, feats, lengths):            # [B, T, D], [B]
        T = feats.shape[1]
        packed = nn.utils.rnn.pack_padded_sequence(
            feats, lengths.cpu(), batch_first=True, enforce_sorted=False
        )
        out, _ = self.gru(packed)
        enc, _ = nn.utils.rnn.pad_packed_sequence(
            out, batch_first=True, total_length=T
        )
        return enc                                # [B, T, 2H]


class AttnDecoder(nn.Module):
    """Bahdanau GRU decoder mirroring models/attention.py step math."""

    def __init__(self, cfg, enc_dim: int):
        super().__init__()
        H = cfg.model.decoder_hidden
        A = cfg.model.attn_dim
        V = cfg.model.vocab_size
        self.embed = nn.Embedding(V, H)
        self.attn_enc = nn.Linear(enc_dim, A, bias=False)
        self.attn_dec = nn.Linear(H, A)
        self.attn_v = nn.Linear(A, 1, bias=False)
        self.gru = nn.GRUCell(H + enc_dim, H)
        self.out = nn.Linear(H + enc_dim, V)

    def step(self, h, tok, enc, enc_proj, enc_mask):
        emb = self.embed(tok)                     # [B, H]
        q = self.attn_dec(h)                      # [B, A]
        e = torch.tanh(enc_proj + q.unsqueeze(1))
        scores = self.attn_v(e).squeeze(-1)       # [B, T]
        scores = scores.masked_fill(~enc_mask, NEG_INF)
        w = torch.softmax(scores, dim=-1)
        ctx = torch.einsum("bt,btd->bd", w, enc)
        h = self.gru(torch.cat([emb, ctx], dim=-1), h)
        logits = self.out(torch.cat([h, ctx], dim=-1))
        return h, logits


class TorchLipReader(nn.Module):
    """The complete reference-shaped model. state_dict keys match
    importer.import_model's documented layout exactly."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        enc_dim = 2 * cfg.model.gru_hidden
        self.frontend = Frontend3D(cfg)
        self.encoder = Encoder(cfg)
        if cfg.decoder in ("ctc", "hybrid"):
            self.ctc_head = nn.Linear(enc_dim, cfg.model.vocab_size)
        if cfg.decoder in ("attention", "hybrid"):
            self.att_decoder = AttnDecoder(cfg, enc_dim)

    def encode(self, rois, lengths):
        return self.encoder(self.frontend(rois), lengths)


# ---------- reference-style host decode loops ----------


def ctc_greedy_transcripts(model, rois, lengths, vocab) -> list[str]:
    """argmax -> collapse repeats -> drop blanks (per-frame host loop)."""
    with torch.no_grad():
        enc = model.encode(rois, lengths)
        logits = model.ctc_head(enc)              # [B, T, V]
    out = []
    for b in range(rois.shape[0]):
        ids = logits[b, : int(lengths[b])].argmax(-1).tolist()
        out.append(vocab.decode_ctc_greedy(ids))
    return out


def ctc_log_posteriors(model, rois, lengths) -> np.ndarray:
    with torch.no_grad():
        enc = model.encode(rois, lengths)
        lp = F.log_softmax(model.ctc_head(enc).float(), dim=-1)
    return lp.numpy()


def attention_greedy_transcripts(model, rois, lengths, vocab,
                                 max_len: int) -> list[str]:
    """Per-step argmax loop over eager decoder calls (SURVEY.md §4.3)."""
    dec = model.att_decoder
    with torch.no_grad():
        enc = model.encode(rois, lengths)
        B, T, _ = enc.shape
        enc_proj = dec.attn_enc(enc)
        mask = torch.arange(T)[None, :] < lengths[:, None]
        h = torch.zeros(B, dec.gru.hidden_size)
        tok = torch.full((B,), vocab.sos_id, dtype=torch.long)
        rows: list[list[int]] = [[] for _ in range(B)]
        done = [False] * B
        for _ in range(max_len):
            h, logits = dec.step(h, tok, enc, enc_proj, mask)
            tok = logits.argmax(-1)
            for b in range(B):
                if not done[b]:
                    t = int(tok[b])
                    if t == vocab.eos_id:
                        done[b] = True
                    else:
                        rows[b].append(t)
            if all(done):
                break
    return [vocab.decode(r) for r in rows]


def attention_beam_transcripts(model, rois, lengths, vocab, beam: int,
                               max_len: int, length_penalty: float
                               ) -> list[str]:
    """Reference-style beam loop: eager decoder steps + numpy bookkeeping.

    Mirrors ops/decode.beam_search's scoring contract exactly — log_softmax
    in fp32, finished beams emit eos at zero cost, top-k over [beam * V]
    with highest-score-lowest-index tie-breaking (what jax.lax.top_k does),
    GNMT length normalization ((len + 5) / 6) ** lp at final selection.
    """
    dec = model.att_decoder
    outs = []
    with torch.no_grad():
        enc_all = model.encode(rois, lengths)
        for b in range(rois.shape[0]):
            T = int(lengths[b])
            enc = enc_all[b : b + 1, : T].repeat(beam, 1, 1)   # [W, T, 2H]
            enc_proj = dec.attn_enc(enc)
            mask = torch.ones(beam, T, dtype=torch.bool)
            h = torch.zeros(beam, dec.gru.hidden_size)
            toks = torch.full((beam,), vocab.sos_id, dtype=torch.long)
            scores = np.full((beam,), NEG_INF, np.float32)
            scores[0] = 0.0
            seqs: list[list[int]] = [[] for _ in range(beam)]
            finished = np.zeros(beam, bool)
            lens = np.zeros(beam, np.int64)
            V = model.cfg.model.vocab_size
            for _ in range(max_len):
                h, logits = dec.step(h, toks, enc, enc_proj, mask)
                logp = F.log_softmax(logits.float(), dim=-1).numpy()
                eos_only = np.full((V,), NEG_INF, np.float32)
                eos_only[vocab.eos_id] = 0.0
                logp = np.where(finished[:, None], eos_only[None, :], logp)
                total = (scores[:, None] + logp).reshape(-1)   # [W * V]
                # stable top-k: highest score wins; ties -> lowest flat index
                top = np.argsort(-total, kind="stable")[:beam]
                src = top // V
                new_tok = top % V
                scores = total[top]
                seqs = [seqs[s] + [int(t)] for s, t in zip(src, new_tok)]
                h = h[torch.from_numpy(src)]
                lens = lens[src] + (~finished[src]).astype(np.int64)
                finished = finished[src] | (new_tok == vocab.eos_id)
                toks = torch.from_numpy(new_tok.astype(np.int64))
                if finished.all():
                    # keep stepping is what the jitted scan does; finished
                    # beams only append eos at zero cost, so stopping early
                    # leaves scores and lengths identical
                    break
            norm = ((lens.astype(np.float32) + 5.0) / 6.0) ** length_penalty
            best = int(np.argmax(scores / np.maximum(norm, 1e-6)))
            outs.append(vocab.decode(seqs[best][: lens[best]]))
    return outs
