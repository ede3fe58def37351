"""Python side of the C-ABI bridge (called from cpp/src/backend_python.cpp
via the embedded CPython interpreter).

The C++ side holds the Python session object directly; functions here take
it as an argument. Model bundles are cached per model_dir so multiple
sessions share weights (the reference loads engines per session —
parakeet_trt.cpp:1720-1738 — sharing is an improvement).
"""

from __future__ import annotations

import os
import sys
import threading
from typing import Dict, Optional, Tuple

import numpy as np

_models: Dict[str, object] = {}
_lock = threading.Lock()


def _ensure_jax_backend() -> None:
    """Embedded interpreters may miss the host's TPU-plugin sitecustomize
    (e.g. the axon PJRT plugin registered via a PYTHONPATH sitecustomize).
    If the env demands a platform jax can't provide, fall back to CPU
    instead of failing session creation.

    The caller's JAX_PLATFORMS choice is REASSERTED after import: TPU-plugin
    sitecustomizes may force their platform at interpreter start regardless
    of the env var (docs/DEBUGGING.md), which silently routed CPU-requested
    native-CLI runs through the TPU tunnel (one remote compile per
    subprocess — the r3 WER gate's native surface timed out on it)."""
    import jax

    from trt_asr_tpu.runtime.platform import ensure_requested_platform

    ensure_requested_platform()
    try:
        jax.devices()
    except RuntimeError as e:
        want = os.environ.get("JAX_PLATFORMS", "")
        print(f"capi_bridge: jax backend '{want}' unavailable ({e}); "
              "falling back to cpu", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        jax.devices()


class _BridgeSession:
    def __init__(self, model_dir: str):
        _ensure_jax_backend()
        from trt_asr_tpu.config import RuntimeConfig
        from trt_asr_tpu.models.parakeet.model import ParakeetTDT
        from trt_asr_tpu.streaming.session import StreamingSession

        with _lock:
            model = _models.get(model_dir)
            if model is None:
                model = ParakeetTDT.from_model_dir(model_dir)
                _models[model_dir] = model
        self.model = model
        rt = RuntimeConfig.from_env()
        if rt.beam_width > 0:
            # TRT_ASR_BEAM: native surface gets the streaming beam decoder
            # (FinalText carries the 1-best; see streaming/beam_session.py)
            from trt_asr_tpu.streaming.beam_session import BeamStreamingSession

            self.session = BeamStreamingSession(
                model, beam=rt.beam_width, runtime=rt, feature_norm="none")
        else:
            self.session = StreamingSession(model, rt, feature_norm="none")


def create_session(model_dir: str) -> _BridgeSession:
    return _BridgeSession(model_dir)


def destroy_session(s: _BridgeSession) -> None:
    s.session = None


def reset_session(s: _BridgeSession) -> None:
    s.session.reset_utterance()


def n_mels(s: _BridgeSession) -> int:
    return int(s.model.cfg.feat_in)


def push_features(s: _BridgeSession, buf, frames: int) -> int:
    feats = np.frombuffer(buf, dtype=np.float32).reshape(frames, -1)
    return int(s.session.push_features(feats))


def finalize(s: _BridgeSession) -> None:
    s.session.finalize()


def poll_event(s: _BridgeSession) -> Optional[Tuple[int, int, str, str]]:
    ev = s.session.poll_event()
    if ev is None:
        return None
    return (int(ev.type), int(ev.segment_id), ev.text, ev.error_message)


def stable_text(s: _BridgeSession) -> str:
    """Committed transcript prefix (the C ABI's trt_asr_stable_text):
    the whole transcript for greedy sessions, the hypothesis pool's
    common prefix for beam sessions (streaming/session.py stable_text)."""
    return s.session.stable_text


def word_timestamps_tsv(s: _BridgeSession) -> str:
    """Word timings as TSV lines ``start_s\\tend_s\\tlogp\\tword`` (the C
    ABI's trt_asr_word_timestamps payload — line-oriented so the native
    side needs no JSON parser; logp is the word's decode-time
    log-probability, decode/timestamps.py)."""
    return "".join(
        f"{w['start_s']:.4f}\t{w['end_s']:.4f}\t{w.get('logp', 0.0):.4f}"
        f"\t{w['word']}\n"
        for w in s.session.word_timestamps())
