"""Model bundle: config + params + frontend + tokenizer, with a model-dir
format replacing the reference's engine directory.

Reference model dir: {encoder,predictor,joint}.engine + vocab.txt +
model_meta.json (built by tools/export_onnx + tools/build_trt). Ours:

    model_dir/
      config.json        # ModelConfig fields (the architecture IS the code;
                         # no graph compiler — SURVEY §7 architecture mapping)
      params.npz         # weights (flat-key)
      manifest.json      # per-tensor sha256 provenance
      vocab.txt          # newline vocab

``ParakeetTDT.transcribe_offline`` is the minimum end-to-end slice:
wav -> log-mel -> per-feature norm -> offline encoder -> on-device TDT
greedy decode -> tokenizer text.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from trt_asr_tpu.config import ModelConfig, RuntimeConfig
from trt_asr_tpu.contract import FrontendSpec
from trt_asr_tpu.decode import (
    init_decode_state,
    prime_decode_state,
    tdt_greedy_decode_chunk,
)
from trt_asr_tpu.frontend import (
    LogMelFrontend,
    apply_per_feature_norm,
    compute_per_feature_stats,
)
from trt_asr_tpu.models.parakeet.encoder import offline_encode
from trt_asr_tpu.models.parakeet.params import (
    init_params,
    load_checkpoint,
    save_checkpoint,
)
from trt_asr_tpu.tokenizer import Tokenizer, make_synthetic_vocab, write_vocab


class ParakeetTDT:
    def __init__(self, cfg: ModelConfig, params, tokenizer: Tokenizer,
                 frontend: Optional[LogMelFrontend] = None,
                 runtime: Optional[RuntimeConfig] = None):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.frontend = frontend or LogMelFrontend(FrontendSpec(n_mels=cfg.feat_in))
        self.runtime = runtime or RuntimeConfig.from_env()
        if self.runtime.compile_cache_dir:
            # persistent XLA compilation cache (TRT_ASR_COMPILE_CACHE): the
            # engine-load cold-start analog — see runtime/engine.py
            from trt_asr_tpu.runtime.engine import apply_compile_cache

            apply_compile_cache(self.runtime.compile_cache_dir)
        self._punct_mask = None
        if self.runtime.joint_dur_first:
            # export compat (reference PARAKEET_JOINT_DUR_FIRST,
            # parakeet_trt.cpp:2853-2857): head order [durations, tokens]
            # becomes the internal [tokens, durations] by permuting the out
            # projection's columns ONCE at load — exact, zero hot-path cost
            nd = self.cfg.num_duration_bins
            ths = self.cfg.token_head_size
            perm = np.concatenate([np.arange(nd, nd + ths), np.arange(nd)])
            out = self.params["joint"]["out"]
            self.params = {**self.params, "joint": {
                **self.params["joint"],
                "out": {"w": np.asarray(out["w"])[:, perm],
                        "b": np.asarray(out["b"])[perm]}}}
        if self.runtime.quant != "none":
            # int8 weight-only quantization (the TRT builder-precision
            # analog); every matmul site dispatches on the leaf type
            from trt_asr_tpu.models.parakeet.quant import quantize_params

            self.params = quantize_params(self.params, self.runtime.quant)

    # -- assets -------------------------------------------------------------

    @classmethod
    def from_model_dir(cls, model_dir: str, runtime: Optional[RuntimeConfig] = None) -> "ParakeetTDT":
        with open(os.path.join(model_dir, "config.json")) as f:
            raw = json.load(f)
        # JSON round-trip turns tuples into lists; the config must stay
        # hashable (it is a static jit argument)
        raw = {k: tuple(v) if isinstance(v, list) else v for k, v in raw.items()}
        cfg = ModelConfig(**raw)
        params = load_checkpoint(model_dir)
        tok = Tokenizer.from_file(os.path.join(model_dir, "vocab.txt"), blank_id=cfg.blank_id)
        return cls(cfg, params, tok, runtime=runtime)

    def save_model_dir(self, model_dir: str) -> None:
        os.makedirs(model_dir, exist_ok=True)
        cfg_dict = dataclasses.asdict(self.cfg)
        with open(os.path.join(model_dir, "config.json"), "w") as f:
            json.dump(cfg_dict, f, indent=1)
        save_checkpoint(model_dir, self.params, meta={"model": "parakeet-tdt"})
        write_vocab(os.path.join(model_dir, "vocab.txt"), self.tokenizer.vocab)

    @classmethod
    def random(cls, cfg: Optional[ModelConfig] = None, seed: int = 0) -> "ParakeetTDT":
        cfg = cfg or ModelConfig.tiny()
        params = init_params(cfg, seed=seed)
        tok = Tokenizer(make_synthetic_vocab(cfg.vocab_size), blank_id=cfg.blank_id)
        return cls(cfg, params, tok)

    # -- helpers ------------------------------------------------------------

    @property
    def prompt_ids(self) -> List[int]:
        if self.runtime.y0_override >= 0:
            return [self.runtime.y0_override]
        ids = []
        # start token, then the language token (reference prime order,
        # parakeet_trt.cpp:1931-1942 — hardcoded <|en|> there; here
        # RuntimeConfig.language / TRT_ASR_LANG selects any of the
        # model's language tokens, absent ones prime nothing)
        lang = f"<|{self.runtime.language}|>"
        # extra constraint tokens (e.g. <|nopnc|>, <|noitn|>) prime ONLY on
        # request: the reference measured that priming them biases decoding
        # toward punctuation spam and skips them unconditionally
        # (parakeet_trt.cpp:1933-1944); TRT_ASR_EXTRA_PROMPT exposes the
        # knob so the decision stays measurable per model
        # strip(): absent tokens are skipped by design, so a comma-space
        # (" <|noitn|>") would otherwise silently drop the constraint
        extra = tuple(t.strip() for t in self.runtime.extra_prompt.split(",")
                      if t.strip())
        for t in ("<|startoftranscript|>", lang) + extra:
            i = self.tokenizer.token_id(t)
            if i >= 0:
                ids.append(i)
        return ids

    @property
    def punct_mask(self) -> np.ndarray:
        if self._punct_mask is None:
            m = np.zeros(self.cfg.token_head_size, bool)
            for i, t in enumerate(self.tokenizer.vocab):
                m[i] = Tokenizer.is_punct_only(t)
            self._punct_mask = m
        return self._punct_mask

    def features(self, audio: np.ndarray, norm: str = "per_feature") -> np.ndarray:
        feats = np.asarray(self.frontend(audio))
        if norm == "per_feature" and feats.shape[0] > 0:
            mean, std = compute_per_feature_stats(feats)
            feats = np.asarray(apply_per_feature_norm(feats, mean, std))
        return feats

    # -- offline end-to-end -------------------------------------------------

    def transcribe_offline(self, audio: np.ndarray, norm: str = "per_feature",
                           max_frames: int = 2048) -> Tuple[str, List[int]]:
        """wav samples -> (text, token_ids). Long audio is processed in
        <=max_frames feature windows with carried decode state (the
        reference self-chunks >256-frame pushes, parakeet_trt.cpp:1982)."""
        feats = self.features(audio, norm=norm)
        t_total = feats.shape[0]
        if t_total == 0:
            return "", []
        dec = prime_decode_state(self.params, self.cfg, init_decode_state(self.cfg, 1),
                                 self.prompt_ids)
        ids: List[int] = []
        rt = self.runtime
        for start in range(0, t_total, max_frames):
            chunk = feats[start : start + max_frames]
            enc, enc_len = offline_encode(
                self.params, self.cfg, chunk[None], np.array([chunk.shape[0]], np.int32))
            t_enc_static = enc.shape[1]
            toks, n, dec = tdt_greedy_decode_chunk(
                self.params, self.cfg, enc[0], jnp.asarray(enc_len)[0].astype(jnp.int32),
                dec, max_tokens=self.cfg.max_symbols_per_timestep * t_enc_static,
                blank_penalty=rt.blank_penalty,
                emitted_so_far=np.int32(len(ids)),
                punct_mask=jnp.asarray(self.punct_mask) if rt.suppress_leading_punct else None,
                use_punct_mask=rt.suppress_leading_punct)
            ids.extend(int(x) for x in np.asarray(toks)[: int(n)])
        return self.tokenizer.decode(ids), ids

    def transcribe_batch(self, audios, norm: str = "per_feature",
                         mesh=None, max_frames: int = 2048,
                         pad_multiple: int = 128):
        """Batched offline transcription: one padded [B, T, C] feature
        batch, one batched encoder pass per <=max_frames window, one
        lockstep batched TDT greedy decode (decode/batched.py) with
        carried per-row decode state. Token-exact with per-utterance
        ``transcribe_offline`` (tested) — rows just share device programs.

        ``mesh``: dp-shards the batch and places params per
        parallel/mesh.py (tp shards the matmuls); forward inference needs
        no dp collectives (SURVEY §2.5), so this is the multi-chip offline
        throughput surface. The batch is padded up to a dp multiple with
        zero-length rows; ``pad_multiple`` buckets T to bound the number
        of compiled shapes. Returns [(text, token_ids)] in input order.
        Reference analog: none — it is B=1 everywhere
        (docs/runtime_contract.md:16, SURVEY §2.5 DP row).
        """
        from trt_asr_tpu.decode.batched import tdt_greedy_decode_batch

        feats_list = [self.features(np.asarray(a), norm=norm) for a in audios]
        b = len(feats_list)
        if b == 0:
            return []
        lens = np.array([f.shape[0] for f in feats_list], np.int32)
        t_pad = max(int(max(lens.max(), 1) + pad_multiple - 1)
                    // pad_multiple * pad_multiple, pad_multiple)
        dp = int(mesh.shape["dp"]) if mesh is not None else 1
        b_pad = (b + dp - 1) // dp * dp
        x = np.zeros((b_pad, t_pad, self.cfg.feat_in), np.float32)
        for i, f in enumerate(feats_list):
            x[i, : f.shape[0]] = f
        params = self.params
        dec = prime_decode_state(self.params, self.cfg,
                                 init_decode_state(self.cfg, b_pad),
                                 self.prompt_ids)
        if mesh is not None:
            import jax

            from trt_asr_tpu.parallel.mesh import (
                batch_sharding,
                decode_state_shardings,
            )

            params = self._params_for_mesh(mesh)
            x = jax.device_put(x, batch_sharding(mesh, 3))
            dec = jax.device_put(dec, decode_state_shardings(mesh))
        rt = self.runtime
        ids: List[List[int]] = [[] for _ in range(b_pad)]
        emitted = jnp.zeros((b_pad,), jnp.int32)
        for start in range(0, t_pad, max_frames):
            w = min(max_frames, t_pad - start)
            valid = np.zeros((b_pad,), np.int32)
            valid[:b] = np.clip(lens - start, 0, w)
            xw = x[:, start : start + w]
            if mesh is not None:
                import jax

                from trt_asr_tpu.parallel.mesh import batch_sharding

                valid = jax.device_put(valid, batch_sharding(mesh, 1))
            enc, enc_len = offline_encode(params, self.cfg, xw, valid,
                                          mask_pad_subsample=True)
            t_enc_static = enc.shape[1]
            toks, n, dec = tdt_greedy_decode_batch(
                params, self.cfg, enc,
                jnp.asarray(enc_len).astype(jnp.int32), dec,
                max_tokens=self.cfg.max_symbols_per_timestep * t_enc_static,
                blank_penalty=rt.blank_penalty,
                emitted_so_far=emitted,
                punct_mask=(jnp.asarray(self.punct_mask)
                            if rt.suppress_leading_punct else None),
                use_punct_mask=rt.suppress_leading_punct)
            toks_h, n_h = np.asarray(toks), np.asarray(n)
            emitted = emitted + n
            for i in range(b_pad):
                ids[i].extend(int(t) for t in toks_h[i, : int(n_h[i])])
        return [(self.tokenizer.decode(ids[i]), ids[i]) for i in range(b)]

    def _params_for_mesh(self, mesh):
        """Place params once per mesh (cached): replicated over dp, matmul
        weights sharded over tp per parallel/mesh.py's rules. The cache
        entry pins the mesh object itself — an id()-only key would go
        stale when a GC'd mesh's id is reused — and holds at most two
        meshes (each entry is a full placed copy of the params)."""
        from trt_asr_tpu.parallel import shard_params

        cache = getattr(self, "_mesh_params", None)
        if cache is None:
            cache = self._mesh_params = {}   # id(mesh) -> (mesh, placed)
        hit = cache.get(id(mesh))
        if hit is not None and hit[0] is mesh:
            return hit[1]
        placed = shard_params(self.params, mesh)
        while len(cache) >= 2:
            cache.pop(next(iter(cache)))
        cache[id(mesh)] = (mesh, placed)
        return placed

    def transcribe_offline_beam(self, audio: np.ndarray, beam: int = 4,
                                norm: str = "per_feature",
                                length_norm: float = 0.0,
                                expansion_k: int = 4,
                                lm_fn=None, lm_weight: float = 0.0):
        """n-best offline transcription via TDT beam search
        (decode/beam.py — capability beyond the greedy-only reference).
        Returns a list of (text, token_ids, score), best first. The
        encoder runs once on device; the search runs on host over the
        jitted joint/predictor single-step programs. ``lm_fn``/``lm_weight``
        enable shallow fusion (see decode/beam.py)."""
        from trt_asr_tpu.decode.beam import make_host_fns, tdt_beam_decode_host

        feats = self.features(audio, norm=norm)
        if feats.shape[0] == 0:
            return [("", [], 0.0)]
        enc, enc_len = offline_encode(
            self.params, self.cfg, feats[None],
            np.array([feats.shape[0]], np.int32))
        t = int(np.asarray(enc_len)[0])
        j_fn, p_fn, j_batch = make_host_fns(self.params)

        ds = prime_decode_state(self.params, self.cfg,
                                init_decode_state(self.cfg, 1), self.prompt_ids)
        rt = self.runtime
        punct_ids = (set(np.flatnonzero(self.punct_mask).tolist())
                     if rt.suppress_leading_punct else None)
        hyps = tdt_beam_decode_host(
            np.asarray(enc)[0, :t], j_fn, p_fn, (ds.h, ds.c),
            np.asarray(ds.g)[0], int(np.asarray(ds.y_id)[0]),
            blank_id=self.cfg.blank_id,
            token_head_size=self.cfg.token_head_size,
            duration_values=self.cfg.duration_values, beam=beam,
            expansion_k=expansion_k,
            max_symbols=self.cfg.max_symbols_per_timestep,
            length_norm=length_norm,
            blank_penalty=rt.blank_penalty, punct_token_ids=punct_ids,
            lm_fn=lm_fn, lm_weight=lm_weight, joint_batch_fn=j_batch)
        return [(self.tokenizer.decode(h.tokens), list(h.tokens), h.score)
                for h in hyps]
