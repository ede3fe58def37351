"""Parameter pytree: init, dtype casting, save/load.

Layout decisions (TPU-first):
- Conformer layers are stored STACKED along a leading [L, ...] axis so the
  encoder runs as one ``lax.scan`` over layers — a single traced layer body
  instead of 24 inlined copies (fast compile, natural target for pipeline
  sharding later).
- Linear weights are stored right-multiplication style [in, out].
- The predictor embedding keeps a zero row at blank_id (NeMo blank_as_pad /
  padding_idx semantics — reference contract predictor.blank_as_pad=true).

The pytree is the single source of truth: the torch parity oracle loads
FROM this tree, and checkpoint save/load round-trips it via npz + manifest
(sha256 provenance, mirroring the reference's artifact hashing —
contract.json hashes block).
"""

from __future__ import annotations

import hashlib
import json
import math
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from trt_asr_tpu.config import ModelConfig


def _normal(rng: np.random.Generator, shape, fan_in: int) -> np.ndarray:
    return (rng.standard_normal(shape) / math.sqrt(max(fan_in, 1))).astype(np.float32)


def init_params(cfg: ModelConfig, seed: int = 0) -> Dict[str, Any]:
    rng = np.random.default_rng(seed)
    d, h, dh = cfg.d_model, cfg.n_heads, cfg.head_dim
    ed = cfg.d_model * cfg.ff_expansion_factor
    c = cfg.subsampling_conv_channels
    k = cfg.conv_kernel_size
    ll = cfg.num_layers

    f_out = cfg.feat_in
    for _ in range(cfg.stride_stages):
        f_out = (f_out - 1) // 2 + 1

    pre_encode = {
        "conv_in": {"w": _normal(rng, (3, 3, 1, c), 9), "b": np.zeros(c, np.float32)},
        "stages": [
            {
                "dw_w": _normal(rng, (3, 3, 1, c), 9),
                "dw_b": np.zeros(c, np.float32),
                "pw_w": _normal(rng, (1, 1, c, c), c),
                "pw_b": np.zeros(c, np.float32),
            }
            for _ in range(cfg.stride_stages - 1)
        ],
        "out": {"w": _normal(rng, (c * f_out, d), c * f_out), "b": np.zeros(d, np.float32)},
    }

    def stack(fn):
        return np.stack([fn() for _ in range(ll)])

    layers = {
        # macaron FFN 1
        "ff1_ln_g": np.ones((ll, d), np.float32), "ff1_ln_b": np.zeros((ll, d), np.float32),
        "ff1_w1": stack(lambda: _normal(rng, (d, ed), d)),
        "ff1_w2": stack(lambda: _normal(rng, (ed, d), ed)),
        # rel-pos MHA
        "att_ln_g": np.ones((ll, d), np.float32), "att_ln_b": np.zeros((ll, d), np.float32),
        "att_wq": stack(lambda: _normal(rng, (d, d), d)),
        "att_wk": stack(lambda: _normal(rng, (d, d), d)),
        "att_wv": stack(lambda: _normal(rng, (d, d), d)),
        "att_wo": stack(lambda: _normal(rng, (d, d), d)),
        "att_wpos": stack(lambda: _normal(rng, (d, d), d)),
        "att_bias_u": stack(lambda: _normal(rng, (h, dh), dh)),
        "att_bias_v": stack(lambda: _normal(rng, (h, dh), dh)),
        # conv module
        "conv_ln_g": np.ones((ll, d), np.float32), "conv_ln_b": np.zeros((ll, d), np.float32),
        "conv_pw1": stack(lambda: _normal(rng, (d, 2 * d), d)),
        "conv_dw": stack(lambda: _normal(rng, (k, d), k)),
        "conv_bn_g": np.ones((ll, d), np.float32), "conv_bn_b": np.zeros((ll, d), np.float32),
        "conv_bn_m": np.zeros((ll, d), np.float32), "conv_bn_v": np.ones((ll, d), np.float32),
        "conv_pw2": stack(lambda: _normal(rng, (d, d), d)),
        # FFN 2
        "ff2_ln_g": np.ones((ll, d), np.float32), "ff2_ln_b": np.zeros((ll, d), np.float32),
        "ff2_w1": stack(lambda: _normal(rng, (d, ed), d)),
        "ff2_w2": stack(lambda: _normal(rng, (ed, d), ed)),
        # per-layer output LN
        "out_ln_g": np.ones((ll, d), np.float32), "out_ln_b": np.zeros((ll, d), np.float32),
    }

    p = cfg.pred_hidden
    embed = _normal(rng, (cfg.vocab_size + 1, p), p)
    embed[cfg.blank_id] = 0.0  # blank_as_pad: blank embeds to the zero vector
    predictor = {
        "embed": embed,
        "lstm": [
            {
                "wi": _normal(rng, (p, 4 * p), p),
                "wh": _normal(rng, (p, 4 * p), p),
                "bi": np.zeros(4 * p, np.float32),
                "bh": np.zeros(4 * p, np.float32),
            }
            for _ in range(cfg.pred_rnn_layers)
        ],
    }

    j = cfg.joint_hidden
    joint = {
        "enc": {"w": _normal(rng, (d, j), d), "b": np.zeros(j, np.float32)},
        "pred": {"w": _normal(rng, (p, j), p), "b": np.zeros(j, np.float32)},
        "out": {"w": _normal(rng, (j, cfg.joint_vocab_size), j),
                "b": np.zeros(cfg.joint_vocab_size, np.float32)},
    }

    params = {"encoder": {"pre_encode": pre_encode, "layers": layers},
              "predictor": predictor, "joint": joint}
    return jax.tree.map(jnp.asarray, params)


_F32_KEEP = ("ln_g", "ln_b", "bn_g", "bn_b", "bn_m", "bn_v")


def cast_params_for_compute(params: Dict[str, Any], dtype) -> Dict[str, Any]:
    """Cast matmul/conv weights to the compute dtype; keep norm params f32."""

    def cast_named(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if any(t in str(p) for p in path for t in _F32_KEEP) or any(t in name for t in _F32_KEEP):
            return leaf
        return leaf.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast_named, params)


def num_params(params: Dict[str, Any]) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def save_checkpoint(path: str, params: Dict[str, Any], meta: Dict[str, Any] | None = None) -> None:
    """Flat-key npz + JSON manifest with per-tensor sha256 (provenance
    mirrors the reference's artifact hash chain)."""
    os.makedirs(path, exist_ok=True)
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for kk, vv in node.items():
                walk(f"{prefix}/{kk}" if prefix else kk, vv)
        elif isinstance(node, (list, tuple)):
            for i, vv in enumerate(node):
                walk(f"{prefix}/{i}", vv)
        else:
            flat[prefix] = np.asarray(node)

    walk("", params)
    npz_path = os.path.join(path, "params.npz")
    np.savez(npz_path, **flat)
    manifest = {
        "format": "trt-asr-tpu/npz/v1",
        "num_tensors": len(flat),
        "num_params": int(sum(int(np.prod(v.shape)) for v in flat.values())),
        "tensors": {kk: {"shape": list(v.shape), "dtype": str(v.dtype),
                         "sha256": hashlib.sha256(v.tobytes()).hexdigest()}
                    for kk, v in flat.items()},
        "meta": meta or {},
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)


def load_checkpoint(path: str, verify: bool = True) -> Dict[str, Any]:
    npz = np.load(os.path.join(path, "params.npz"))
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    tree: Dict[str, Any] = {}
    for key in npz.files:
        v = npz[key]
        if verify:
            want = manifest["tensors"][key]["sha256"]
            got = hashlib.sha256(v.tobytes()).hexdigest()
            if want != got:
                raise ValueError(f"checkpoint tensor {key} sha256 mismatch")
        parts = key.split("/")
        node = tree
        for pp in parts[:-1]:
            node = node.setdefault(pp, {})
        node[parts[-1]] = jnp.asarray(v)

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(kk.isdigit() for kk in keys):
                return [listify(node[kk]) for kk in sorted(node, key=int)]
            return {kk: listify(vv) for kk, vv in node.items()}
        return node

    return listify(tree)
