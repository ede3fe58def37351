"""Torch golden oracle for the Parakeet-TDT architecture.

Role: the independent reference implementation at the root of the parity
ladder, standing in for the NeMo/PyTorch goldens the reference compared
against (its ladder: NeMo PyTorch -> ORT -> TRT -> C++ runtime; ours:
torch oracle -> JAX CPU f32 -> JAX TPU f32/bf16). Written in torch idiom
(torch.nn.LSTM, F.conv*, F.layer_norm) with its OWN state conventions
(left-aligned caches, dynamic shapes) so that agreement with the JAX
implementation (right-aligned static caches, lax.scan) is a genuine
cross-check, not a shared bug.

Weights load from the trt_asr_tpu parameter pytree (the single source of
truth): see load_pytree().

CPU/f32 only; B=1 for streaming steps (golden generation), batched offline.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np
import torch
import torch.nn.functional as F

from trt_asr_tpu.config import ModelConfig


_DTYPE = torch.float32


def set_oracle_dtype(name: str) -> None:
    """Switch the oracle's working precision ('float32' | 'float64').

    float64 turns the oracle into a near-exact reference for ATTRIBUTING
    the f32 parity floor (VERDICT r2 #1): ||torch32 - torch64|| isolates
    the oracle's own f32 rounding from ||jax - torch64||, the
    implementation's true error. Affects tensors created AFTER the call
    (construct TorchParakeet afterwards); also sets torch's default dtype
    so internal zeros/cat/LSTM follow."""
    global _DTYPE
    _DTYPE = {"float32": torch.float32, "float64": torch.float64}[name]
    torch.set_default_dtype(_DTYPE)


def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x)).to(_DTYPE)


def sinusoidal_pos_table(tq: int, tkv: int, d_model: int) -> torch.Tensor:
    positions = torch.arange(tkv - 1, -tq, -1, dtype=torch.float64)[:, None]
    div = torch.exp(torch.arange(0, d_model, 2, dtype=torch.float64) * -(math.log(10000.0) / d_model))
    pe = torch.zeros(positions.shape[0], d_model, dtype=torch.float64)
    pe[:, 0::2] = torch.sin(positions * div)
    pe[:, 1::2] = torch.cos(positions * div)
    return pe.to(_DTYPE)


class OracleEncoderLayer:
    def __init__(self, cfg: ModelConfig, lp: Dict[str, np.ndarray], li: int):
        g = lambda name: _t(lp[name][li])  # noqa: E731
        self.cfg = cfg
        self.ff1_ln = (g("ff1_ln_g"), g("ff1_ln_b"))
        self.ff1 = (g("ff1_w1"), g("ff1_w2"))
        self.att_ln = (g("att_ln_g"), g("att_ln_b"))
        self.wq, self.wk, self.wv, self.wo = g("att_wq"), g("att_wk"), g("att_wv"), g("att_wo")
        self.wpos = g("att_wpos")
        self.bias_u, self.bias_v = g("att_bias_u"), g("att_bias_v")
        self.conv_ln = (g("conv_ln_g"), g("conv_ln_b"))
        self.conv_pw1, self.conv_dw, self.conv_pw2 = g("conv_pw1"), g("conv_dw"), g("conv_pw2")
        self.bn = (g("conv_bn_g"), g("conv_bn_b"), g("conv_bn_m"), g("conv_bn_v"))
        self.ff2_ln = (g("ff2_ln_g"), g("ff2_ln_b"))
        self.ff2 = (g("ff2_w1"), g("ff2_w2"))
        self.out_ln = (g("out_ln_g"), g("out_ln_b"))

    def _ln(self, x, gb):
        return F.layer_norm(x, (x.shape[-1],), gb[0], gb[1])

    def _ff(self, x, ln, w):
        h = self._ln(x, ln)
        return F.silu(h @ w[0]) @ w[1]

    def _attention(self, u: torch.Tensor, kv: torch.Tensor, kv_mask: Optional[torch.Tensor]):
        b, tq, d = u.shape
        tkv = kv.shape[1]
        hh = self.cfg.n_heads
        dh = d // hh
        q = (u @ self.wq).view(b, tq, hh, dh)
        k = (kv @ self.wk).view(b, tkv, hh, dh)
        v = (kv @ self.wv).view(b, tkv, hh, dh)
        pos = sinusoidal_pos_table(tq, tkv, d)
        p = (pos @ self.wpos).view(-1, hh, dh)
        ac = torch.einsum("bthd,bshd->bhts", q + self.bias_u, k)
        pd = torch.einsum("bthd,rhd->bhtr", q + self.bias_v, p)
        i = torch.arange(tq)[:, None]
        j = torch.arange(tkv)[None, :]
        idx = (tq - 1 - i + j).expand(b, hh, tq, tkv)
        bd = torch.gather(pd, -1, idx)
        scores = (ac + bd) / math.sqrt(dh)
        if kv_mask is not None:
            scores = scores.masked_fill(~kv_mask[:, None, None, :], float("-inf"))
        att = torch.softmax(scores, dim=-1)
        out = torch.einsum("bhts,bshd->bthd", att, v).reshape(b, tq, d)
        return out @ self.wo

    def forward(
        self,
        x: torch.Tensor,                      # [B, Tq, D]
        att_cache: torch.Tensor,              # [B, len, D] left-aligned valid only
        time_cache: torch.Tensor,             # [B, K, D]
        time_mask: torch.Tensor,              # [B, Tq] bool
        cache_keep: int,
    ) -> Tuple[torch.Tensor, torch.Tensor, torch.Tensor]:
        b, tq, d = x.shape
        k = time_cache.shape[1]
        x = x + 0.5 * self._ff(x, self.ff1_ln, self.ff1)

        u = self._ln(x, self.att_ln)
        kv = torch.cat([att_cache, u], dim=1)
        kv_mask = torch.cat([torch.ones(b, att_cache.shape[1], dtype=torch.bool), time_mask], dim=1)
        x = x + self._attention(u, kv, kv_mask)
        new_att_cache = torch.cat([att_cache, u[:, :cache_keep]], dim=1)[:, -self.cfg.att_cache_size:]

        c = self._ln(x, self.conv_ln)
        c = F.glu(c @ self.conv_pw1, dim=-1)
        c = c * time_mask[:, :, None]
        c_ext = torch.cat([time_cache, c, torch.zeros(b, k, d)], dim=1)
        w_dw = self.conv_dw.T.unsqueeze(1)        # [D, 1, K]
        cv = F.conv1d(c_ext.transpose(1, 2), w_dw, groups=d).transpose(1, 2)
        g_, b_, m_, v_ = self.bn
        cv = F.batch_norm(cv.transpose(1, 2), m_, v_, g_, b_, training=False).transpose(1, 2)
        cv = F.silu(cv) @ self.conv_pw2
        x = x + cv
        new_time_cache = torch.cat([time_cache, c[:, :cache_keep]], dim=1)[:, -k:]

        x = x + 0.5 * self._ff(x, self.ff2_ln, self.ff2)
        x = self._ln(x, self.out_ln)
        return x, new_att_cache, new_time_cache


class TorchParakeet:
    def __init__(self, cfg: ModelConfig, params):
        self.cfg = cfg
        params = _to_numpy_tree(params)
        pe = params["encoder"]["pre_encode"]
        self.conv_in_w = _t(pe["conv_in"]["w"]).permute(3, 2, 0, 1)   # [C,1,3,3]
        self.conv_in_b = _t(pe["conv_in"]["b"])
        self.stages = []
        for st in pe["stages"]:
            self.stages.append({
                "dw_w": _t(st["dw_w"]).permute(3, 2, 0, 1),           # [C,1,3,3]
                "dw_b": _t(st["dw_b"]),
                "pw_w": _t(st["pw_w"]).permute(3, 2, 0, 1),           # [C,C,1,1]
                "pw_b": _t(st["pw_b"]),
            })
        self.pre_out_w = _t(pe["out"]["w"])
        self.pre_out_b = _t(pe["out"]["b"])
        self.layers = [OracleEncoderLayer(cfg, params["encoder"]["layers"], li)
                       for li in range(cfg.num_layers)]

        pr = params["predictor"]
        self.embed = _t(pr["embed"])
        self.lstm = torch.nn.LSTM(cfg.pred_hidden, cfg.pred_hidden,
                                  num_layers=cfg.pred_rnn_layers, batch_first=True)
        with torch.no_grad():
            for li, lw in enumerate(pr["lstm"]):
                getattr(self.lstm, f"weight_ih_l{li}").copy_(_t(lw["wi"]).T)
                getattr(self.lstm, f"weight_hh_l{li}").copy_(_t(lw["wh"]).T)
                getattr(self.lstm, f"bias_ih_l{li}").copy_(_t(lw["bi"]))
                getattr(self.lstm, f"bias_hh_l{li}").copy_(_t(lw["bh"]))
        self.lstm.eval()

        jt = params["joint"]
        self.j_enc_w, self.j_enc_b = _t(jt["enc"]["w"]), _t(jt["enc"]["b"])
        self.j_pred_w, self.j_pred_b = _t(jt["pred"]["w"]), _t(jt["pred"]["b"])
        self.j_out_w, self.j_out_b = _t(jt["out"]["w"]), _t(jt["out"]["b"])

    # ---- encoder ----

    def pre_encode(self, feats: torch.Tensor) -> torch.Tensor:
        """feats [B, T, F] -> [B, T', D]."""
        h = feats.unsqueeze(1)                                    # [B, 1, T, F]
        h = F.relu(F.conv2d(h, self.conv_in_w, self.conv_in_b, stride=2, padding=1))
        for st in self.stages:
            h = F.conv2d(h, st["dw_w"], st["dw_b"], stride=2, padding=1, groups=h.shape[1])
            h = F.relu(F.conv2d(h, st["pw_w"], st["pw_b"]))
        b, c, t, f = h.shape
        h = h.permute(0, 2, 1, 3).reshape(b, t, c * f)            # [B, T', C*F']
        return h @ self.pre_out_w + self.pre_out_b

    def sub_length(self, length: int) -> int:
        for _ in range(self.cfg.stride_stages):
            length = (length - 1) // 2 + 1
        return length

    @torch.no_grad()
    def offline_encode(self, feats: np.ndarray, lengths: np.ndarray):
        """feats [B, T, F] -> (enc [B, T', D], out_len [B])."""
        x = self.pre_encode(_t(feats))
        b, tq, d = x.shape
        out_len = np.array([min(self.sub_length(int(l_)), tq) for l_ in lengths])
        time_mask = torch.arange(tq)[None, :] < torch.from_numpy(out_len)[:, None]
        x = x * time_mask[:, :, None]
        empty_att = torch.zeros(b, 0, d)
        time_cache = torch.zeros(b, self.cfg.conv_context_size, d)
        for layer in self.layers:
            x, _, _ = layer.forward(x, empty_att, time_cache, time_mask, 0)
        return x.numpy(), out_len

    @torch.no_grad()
    def streaming_step(
        self,
        feats: np.ndarray,          # [1, T, F]
        length: int,
        cache_lc: np.ndarray,       # [1, L, C, D] left-aligned valid prefix
        cache_lt: np.ndarray,       # [1, L, D, K]
        cache_len: int,
        drop_extra: int,
        keep_all: bool = False,
    ):
        """Contract-layout streaming step (B=1).

        Returns (enc_out [1, T_valid, D], valid_len, cache_lc', cache_lt',
        cache_len')."""
        cfg = self.cfg
        x = self.pre_encode(_t(feats))
        sub_len = self.sub_length(int(length))
        if drop_extra:
            x = x[:, drop_extra:]
            sub_len = max(sub_len - drop_extra, 0)
        tq = x.shape[1]
        sub_len = min(sub_len, tq)
        cache_drop = 0 if keep_all else cfg.cache_drop_size
        # only valid (non-padded) steps may enter the caches
        cache_keep = min(max(tq - cache_drop, 0), sub_len)

        time_mask = (torch.arange(tq) < sub_len)[None, :]
        x = x * time_mask[:, :, None]

        new_lc = np.zeros_like(cache_lc)
        new_lt = np.zeros_like(cache_lt)
        for li, layer in enumerate(self.layers):
            att_cache = _t(cache_lc[:, li, :cache_len])           # [1, len, D]
            time_cache = _t(cache_lt[:, li]).transpose(1, 2)       # [1, K, D]
            x, new_att, new_time = layer.forward(x, att_cache, time_cache, time_mask, cache_keep)
            na = new_att.numpy()
            new_lc[0, li, : na.shape[1]] = na[0]
            new_lt[0, li] = new_time.numpy()[0].T
        new_len = min(cache_len + min(sub_len, cache_keep), cfg.att_cache_size)
        valid = sub_len if keep_all else min(sub_len, cfg.valid_out_len)
        return x.numpy()[:, :valid], valid, new_lc, new_lt, new_len

    # ---- predictor / joint ----

    @torch.no_grad()
    def predictor(self, y: np.ndarray, h: np.ndarray, c: np.ndarray):
        """y [B, U] int64 -> (g [B, U, P], h', c')."""
        x = self.embed[torch.from_numpy(np.asarray(y, dtype=np.int64))]
        out, (h_n, c_n) = self.lstm(x, (_t(h), _t(c)))
        return out.numpy(), h_n.numpy(), c_n.numpy()

    @torch.no_grad()
    def joint(self, enc: np.ndarray, pred: np.ndarray) -> np.ndarray:
        """enc [B, T, D], pred [B, U, P] -> logits [B, T, U, V]."""
        e = _t(enc) @ self.j_enc_w + self.j_enc_b
        g = _t(pred) @ self.j_pred_w + self.j_pred_b
        h = F.relu(e[:, :, None, :] + g[:, None, :, :])
        return (h @ self.j_out_w + self.j_out_b).numpy()


def _to_numpy_tree(node):
    if isinstance(node, dict):
        return {k: _to_numpy_tree(v) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return [_to_numpy_tree(v) for v in node]
    return np.asarray(node)
