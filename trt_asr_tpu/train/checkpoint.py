"""Training-state checkpoint / resume.

The reference has no training, so its checkpoint story is immutable
artifacts with sha256 provenance (SURVEY §5 checkpoint row, contract.json:5-9);
this module extends that exact pattern to the training subsystem this
framework adds: model weights ride the existing npz + per-tensor-sha256
manifest (`models/parakeet/params.save_checkpoint`), and the optimizer
state is stored as ordered flat leaves restored into a TEMPLATE built by
the caller from `make_train_step`'s `init_opt(params)` — no pickling of
pytree structure, every leaf shape/dtype-checked against the template.
Resume is bitwise: continuing from a restored state reproduces the exact
params/metrics of an uninterrupted run (tests/test_training.py).
"""
from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from trt_asr_tpu.models.parakeet.params import load_checkpoint, save_checkpoint


def save_train_state(path: str, params: Dict[str, Any], opt_state: Any,
                     step: int, meta: Dict[str, Any] | None = None) -> None:
    """Write weights (npz+manifest) + optimizer leaves + step counter."""
    os.makedirs(path, exist_ok=True)
    save_checkpoint(os.path.join(path, "weights"), params,
                    meta={"train_step": int(step), **(meta or {})})
    leaves = jax.tree_util.tree_leaves(opt_state)
    arrs = {f"leaf_{i:05d}": np.asarray(v) for i, v in enumerate(leaves)}
    np.savez(os.path.join(path, "opt_state.npz"), **arrs)
    manifest = {
        "format": "trt-asr-tpu/train-state/v1",
        "step": int(step),
        "n_leaves": len(arrs),
        "leaves": {k: {"shape": list(v.shape), "dtype": str(v.dtype),
                       "sha256": hashlib.sha256(v.tobytes()).hexdigest()}
                   for k, v in arrs.items()},
        "meta": meta or {},
    }
    with open(os.path.join(path, "train_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)


def load_train_state(path: str, opt_state_template: Any,
                     verify: bool = True) -> Tuple[Dict[str, Any], Any, int]:
    """Returns (params, opt_state, step).

    ``opt_state_template`` must come from the same optimizer config the
    state was saved under (e.g. ``init_opt(params)``); its pytree structure
    receives the saved leaves, each checked for shape and dtype.
    """
    params = load_checkpoint(os.path.join(path, "weights"), verify=verify)
    with open(os.path.join(path, "train_manifest.json")) as f:
        manifest = json.load(f)
    npz = np.load(os.path.join(path, "opt_state.npz"))
    t_leaves, treedef = jax.tree_util.tree_flatten(opt_state_template)
    if len(t_leaves) != manifest["n_leaves"]:
        raise ValueError(
            f"optimizer-state template has {len(t_leaves)} leaves, "
            f"checkpoint has {manifest['n_leaves']} — different optimizer?")
    new_leaves = []
    for i, tmpl in enumerate(t_leaves):
        key = f"leaf_{i:05d}"
        v = npz[key]
        if verify:
            want = manifest["leaves"][key]["sha256"]
            got = hashlib.sha256(v.tobytes()).hexdigest()
            if want != got:
                raise ValueError(f"train-state leaf {key} sha256 mismatch")
        tmpl_arr = np.asarray(tmpl)
        if tuple(v.shape) != tuple(tmpl_arr.shape) or \
                str(v.dtype) != str(tmpl_arr.dtype):
            raise ValueError(
                f"train-state leaf {key}: saved {v.shape}/{v.dtype} vs "
                f"template {tmpl_arr.shape}/{tmpl_arr.dtype}")
        new_leaves.append(jnp.asarray(v))
    return params, treedef.unflatten(new_leaves), int(manifest["step"])
