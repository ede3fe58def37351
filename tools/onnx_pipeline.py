#!/usr/bin/env python3
"""Pure-numpy closed-loop streaming ASR over the exported ONNX graphs.

The complete inference pipeline — cache-aware streaming encoder chunk step,
prediction network, joint, and the TDT greedy decode loop — driven entirely
through the EXPORTED artifacts (encoder_streaming.onnx / predictor.onnx /
joint.onnx executed by the op-level-independent interpreter in
tools/onnx_exec.py, scheduled by model_meta.json's embedded "streaming"
section). No JAX, no torch, no model code from this repo: this is the
executable proof that a user of the reference's export workflow
(tools/export_onnx + tools/onnxruntime/onnx_streaming_parity.py:178-230,
which ran the exported graphs under ORT as a second implementation) can
consume our export the same way — a THIRD implementation of the full
pipeline, independent at the op level of both the JAX runtime and the torch
oracle.

Decode semantics mirror the runtime device loop exactly
(trt_asr_tpu/decode/tdt_greedy.py; reference hot loop
cpp/src/parakeet_trt.cpp:2914-3713): dual argmax over token/duration heads,
blank-with-duration-0 clamps to advance 1, predictor steps only on
emission, at most max_symbols_per_timestep zero-advance inner steps, and
duration overshoot carried across chunk boundaries (time_carry). The chunk
schedule is the unified single-program profile (streaming/schedule.py:
ChunkScheduler(unified=True)): every chunk including the first and the
flush runs the one static window, with `length` driving the in-graph
short-chunk masking.

Token-exactness vs the JAX StreamingSession is asserted by
tests/test_onnx_pipeline.py.

CLI (features in, token IDs out):
    python tools/onnx_pipeline.py EXPORT_DIR --features feats.npy \
        [--push-frames 37] [--vocab vocab.txt]
"""
from __future__ import annotations

import json
import os
import sys
from typing import Dict, List, Optional

import numpy as np

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

from tools.onnx_exec import run_graph  # noqa: E402
from trt_asr_tpu.io.onnx_lite import read_onnx  # noqa: E402


class OnnxStreamingPipeline:
    """Closed-loop streaming transcription over an export directory."""

    def __init__(self, export_dir: str, *, blank_penalty: float = 0.0,
                 prompt_ids: Optional[List[int]] = None):
        with open(os.path.join(export_dir, "model_meta.json")) as f:
            meta = json.load(f)
        st = meta.get("streaming")
        if st is None:
            raise ValueError(
                "model_meta.json has no 'streaming' section — re-export with "
                "trt_asr_tpu.io.onnx_weights.export_params_to_onnx")
        self.meta = meta
        self.blank_id = int(meta["blank_id"])
        self.duration_values = [int(d) for d in meta["duration_values"]]
        self.token_head_size = int(meta["joint_vocab_size"]) - len(self.duration_values)
        self.blank_penalty = float(blank_penalty)
        # prompt priming must match the producing runtime (model.py:112-120)
        # — the export records the model's prompt ids; an explicit argument
        # overrides
        self.prompt_ids = list(st.get("prompt_ids", [])
                               if prompt_ids is None else prompt_ids)

        cfgm = meta["config"]
        self.n_mels = int(meta["features"]["n_mels"])
        self.num_layers = int(cfgm["num_layers"])
        self.d_model = int(cfgm["d_model"])
        self.pred_layers = int(cfgm["pred_rnn_layers"])
        self.pred_hidden = int(cfgm["pred_hidden"])
        self.k_ctx = int(cfgm["conv_context_size"])

        self.chunk_sizes = [int(v) for v in st["chunk_size_frames"]]
        self.shift_sizes = [int(v) for v in st["shift_size_frames"]]
        self.pre_encode = [int(v) for v in st["pre_encode_cache_size"]]
        self.valid_out_len = int(st["valid_out_len"])
        self.att_cache_size = int(st["att_cache_size"])
        self.max_symbols = int(st["max_symbols_per_timestep"])
        self.window = self.chunk_sizes[1] + self.pre_encode[1]
        self.lead = self.window - self.chunk_sizes[0]

        self.enc_graph = read_onnx(os.path.join(export_dir, "encoder_streaming.onnx"))
        self.pred_graph = read_onnx(os.path.join(export_dir, "predictor.onnx"))
        self.joint_graph = read_onnx(os.path.join(export_dir, "joint.onnx"))
        for name, g in (("encoder_streaming", self.enc_graph),
                        ("predictor", self.pred_graph),
                        ("joint", self.joint_graph)):
            if not g.nodes:
                raise ValueError(f"{name}.onnx carries no compute nodes — "
                                 "initializer-only export cannot be executed")
        self.reset()

    # -- lifecycle --------------------------------------------------------

    def reset(self) -> None:
        self._buf = np.zeros((0, self.n_mels), np.float32)
        self._idx = 0          # next chunk index
        self._start = 0        # next chunk's first new frame (absolute)
        self._finalized = False
        self.tokens: List[int] = []
        self._time_carry = 0
        self._cache = {
            "cache_last_channel": np.zeros(
                (1, self.num_layers, self.att_cache_size, self.d_model),
                np.float32),
            "cache_last_time": np.zeros(
                (1, self.num_layers, self.d_model, self.k_ctx), np.float32),
            "cache_last_channel_len": np.zeros((1,), np.int64),
        }
        # predictor priming (reference parakeet_reset_utterance:1884-1942;
        # NeMo fallback primes with blank when there is no prompt)
        self._h = np.zeros((self.pred_layers, 1, self.pred_hidden), np.float32)
        self._c = np.zeros_like(self._h)
        self._g = np.zeros((self.pred_hidden,), np.float32)
        for tok in (self.prompt_ids or [self.blank_id]):
            self._pred_step(tok)

    # -- component steps (each one ONNX graph execution) -------------------

    def _pred_step(self, tok: int) -> None:
        outs = run_graph(self.pred_graph, {
            "y": np.array([[tok]], np.int32), "h": self._h, "c": self._c})
        self._g = outs["g"][0, :, 0].astype(np.float32)
        self._h, self._c = (outs["h_out"].astype(np.float32),
                            outs["c_out"].astype(np.float32))

    def _joint_logits(self, enc_t: np.ndarray) -> np.ndarray:
        outs = run_graph(self.joint_graph, {
            "encoder_output": enc_t.reshape(1, -1, 1).astype(np.float32),
            "predictor_output": self._g.reshape(1, -1, 1)})
        return outs["joint_output"][0, 0, 0]

    # -- streaming input ----------------------------------------------------

    def push_features(self, feats: np.ndarray) -> int:
        """feats [T, n_mels]. Returns chunks processed."""
        if self._finalized:
            raise RuntimeError("push after finalize; call reset()")
        feats = np.asarray(feats, np.float32)
        if feats.size:
            if feats.ndim != 2 or feats.shape[1] != self.n_mels:
                raise ValueError(f"expected [T, {self.n_mels}] features, "
                                 f"got {feats.shape}")
            self._buf = np.concatenate([self._buf, feats], axis=0)
        done = 0
        while True:
            spec = self._next_ready()
            if spec is None:
                break
            self._run_chunk(*spec, is_last=False)
            done += 1
        return done

    def finalize(self) -> None:
        if self._finalized:
            return
        avail = self._buf.shape[0]
        if self._idx == 0:
            if avail > 0:
                got = min(avail, self.chunk_sizes[0])
                x = np.zeros((self.window, self.n_mels), np.float32)
                x[self.lead: self.lead + got] = self._buf[:got]
                self._run_chunk(x, self.lead + got, is_last=True)
        elif avail > self._start:
            s0 = self._start - self.pre_encode[1]
            lo = max(s0, 0)          # see _next_ready: shift < pre regimes
            seg = self._buf[lo: avail]
            x = np.zeros((self.window, self.n_mels), np.float32)
            x[lo - s0: lo - s0 + len(seg)] = seg
            self._run_chunk(x, (lo - s0) + len(seg), is_last=True)
        self._finalized = True

    # -- internals ----------------------------------------------------------

    def _next_ready(self):
        """Unified single-program schedule (ChunkScheduler(unified=True)):
        chunk 0 = lead zeros + first_chunk frames; steady chunk k at start s
        = frames [s - pre, s + steady). The lead zeros subsample onto
        exactly the drop_extra steps, so chunk 0 through the steady program
        equals the dedicated first-chunk program (verified repo-side)."""
        avail = self._buf.shape[0]
        if self._idx == 0:
            if avail < self.chunk_sizes[0]:
                return None
            x = np.zeros((self.window, self.n_mels), np.float32)
            x[self.lead:] = self._buf[: self.chunk_sizes[0]]
            self._idx, self._start = 1, self.shift_sizes[0]
            return x, self.window
        s0 = self._start - self.pre_encode[1]
        s1 = self._start + self.chunk_sizes[1]
        if avail < s1:
            return None
        # s0 < 0 happens in regimes with shift < pre_encode (e.g. the
        # NeMo-default 8-frame shift): left-pad zeros, exactly like the
        # runtime's extract_chunk (streaming/schedule.py:182-194)
        lo = max(s0, 0)
        x = self._buf[lo:s1]
        if lo > s0:
            x = np.pad(x, ((lo - s0, 0), (0, 0)))
        self._idx += 1
        self._start += self.shift_sizes[1]
        return x, self.window

    def _run_chunk(self, x: np.ndarray, valid_frames: int, is_last: bool) -> None:
        outs = run_graph(self.enc_graph, {
            "audio_signal": x.T[None],
            "length": np.array([valid_frames], np.int64),
            **self._cache})
        self._cache = {
            "cache_last_channel": outs["cache_last_channel_out"],
            "cache_last_time": outs["cache_last_time_out"],
            "cache_last_channel_len": outs["cache_last_channel_len_out"],
        }
        t_post = int(outs["encoded_lengths"][0])
        enc_len = t_post if is_last else min(t_post, self.valid_out_len)
        enc = outs["encoder_output"][0].T[:enc_len]           # [enc_len, D]
        self._decode(enc)

    def _decode(self, enc: np.ndarray) -> None:
        """TDT greedy over one chunk's valid encoder steps, carrying
        duration overshoot into the next chunk (DecodeState.time_carry)."""
        t_enc = enc.shape[0]
        time_idx = self._time_carry
        while time_idx < t_enc:
            advanced = False
            for _u in range(self.max_symbols):
                logits = self._joint_logits(enc[time_idx])
                tok_logits = logits[: self.token_head_size]
                if self.blank_penalty:
                    tok_logits = tok_logits.copy()
                    tok_logits[self.blank_id] -= self.blank_penalty
                best_tok = int(np.argmax(tok_logits))
                dur_logits = logits[self.token_head_size:
                                    self.token_head_size + len(self.duration_values)]
                advance = self.duration_values[int(np.argmax(dur_logits))]
                if best_tok == self.blank_id and advance == 0:
                    advance = 1   # TDT blank-duration-0 clamp
                if best_tok != self.blank_id:
                    self.tokens.append(best_tok)
                    self._pred_step(best_tok)
                if advance == 0:
                    continue
                time_idx += advance
                advanced = True
                break
            if not advanced:
                time_idx += 1     # forced advance after max_symbols
        self._time_carry = max(time_idx - t_enc, 0)


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("export_dir")
    ap.add_argument("--features", required=True,
                    help="NPY [T, n_mels] log-mel features")
    ap.add_argument("--push-frames", type=int, default=0,
                    help="stream in pushes of N frames (0 = one push)")
    ap.add_argument("--vocab", default="", help="optional vocab.txt to detokenize")
    ap.add_argument("--blank-penalty", type=float, default=0.0)
    args = ap.parse_args()

    feats = np.load(args.features)
    pipe = OnnxStreamingPipeline(args.export_dir,
                                 blank_penalty=args.blank_penalty)
    hop = args.push_frames or len(feats)
    for s in range(0, len(feats), hop):
        pipe.push_features(feats[s: s + hop])
    pipe.finalize()
    print(json.dumps({"tokens": pipe.tokens, "n": len(pipe.tokens)}))
    if args.vocab:
        from trt_asr_tpu.tokenizer import Tokenizer

        with open(args.vocab) as f:
            vocab = [line.rstrip("\n") for line in f]
        print(Tokenizer(vocab, blank_id=pipe.blank_id).decode(pipe.tokens))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
