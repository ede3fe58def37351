"""Chunk schedule for cache-aware streaming.

Implements the two-regime schedule from the reference contract
(streaming.chunk_size [41,48] / shift [17,24] / pre_encode_cache [0,9];
schedule builder semantics per the reference golden generator
tools/verify_nemo/streaming_encoder_cache.py `_build_schedule`):

- chunk 0: feature frames [0, 41), no pre-encode context, shift 17
- chunk k>=1 at start s: frames [s-9, s+48) (57 frames), shift 24,
  drop_extra_pre_encoded=2 encoder steps after subsampling

Each chunk yields valid_out_len=3 new encoder steps; the trailing
cache_drop_size=3 steps are lookahead recomputed by the next chunk. The
valid outputs tile the stream contiguously (chunk 0 covers encoder steps
0..2 == frames [0,24), chunk 1 steps 3..5 == frames [24,48), ...).

Static shapes: every chunk is one of two program shapes (41 or 57 frames) —
the TPU-compiled analog of the reference's fixed TRT shape profiles.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

from trt_asr_tpu.config import ModelConfig


@dataclass(frozen=True)
class ChunkSpec:
    idx: int
    start: int          # first NEW feature frame covered by this chunk
    slice_start: int    # input slice [slice_start, slice_end)
    slice_end: int
    frames: int         # static program shape (41 or 57)
    valid_frames: int   # actual frames available (== frames except last chunk)
    drop_extra: int     # pre-encoded steps to drop
    is_last: bool


def build_schedule(total_frames: int, cfg: ModelConfig) -> List[ChunkSpec]:
    """Offline helper: chunk a known-length utterance."""
    chunks: List[ChunkSpec] = []
    first_chunk, steady_chunk = cfg.chunk_size_frames
    first_shift, steady_shift = cfg.shift_size_frames
    pre = cfg.pre_encode_cache_size[1]
    start, idx = 0, 0
    while start < total_frames:
        if idx == 0:
            s0, s1 = 0, first_chunk
            frames, drop_extra, shift = first_chunk, 0, first_shift
        else:
            s0, s1 = start - pre, start + steady_chunk
            frames, drop_extra, shift = steady_chunk + pre, cfg.drop_extra_pre_encoded, steady_shift
        is_last = s1 >= total_frames
        valid = min(s1, total_frames) - s0
        chunks.append(ChunkSpec(idx, start, s0, min(s1, total_frames), frames, valid, drop_extra, is_last))
        start += shift
        idx += 1
        if is_last:
            break
    return chunks


def extract_chunk(feat_buf, spec: ChunkSpec):
    """Slice [slice_start, slice_end) out of the absolute feature buffer,
    zero-padding on both sides to the static program shape. Negative
    slice_start (unified first chunk) pads zeros on the left."""
    import numpy as np

    lo = max(spec.slice_start, 0)
    x = feat_buf[lo : spec.slice_end]
    left = lo - spec.slice_start
    right = spec.frames - left - x.shape[0]
    if left or right > 0:
        x = np.pad(x, ((left, max(right, 0)), (0, 0)))
    return x


class ChunkScheduler:
    """Online chunker: accepts arbitrary feature pushes, yields fixed-shape
    chunks per the schedule. Keeps the feature tail needed for the next
    chunk's pre-encode context.

    unified=True uses ONE program shape for every chunk (the reference's TRT
    ``unified_profile``, contract trt.profiles.encoder_streaming): the first
    chunk is served by the steady 57-frame program with
    (steady_chunk + pre_encode - first_chunk) zero frames prepended; since
    the prepended zeros subsample onto exactly the drop_extra_pre_encoded
    steps and the conv stack zero-pads edges anyway, the valid outputs are
    numerically identical to the dedicated 41-frame program (verified in
    tests), while halving the number of compiled programs and enabling
    lockstep multi-stream batching."""

    def __init__(self, cfg: ModelConfig, unified: bool = False):
        self.cfg = cfg
        self.unified = unified
        self.reset()

    def reset(self) -> None:
        self._buf_frames = 0     # total frames received
        self._idx = 0
        self._start = 0          # next chunk's start frame (absolute)

    def next_ready(self, frames_available: int) -> Optional[ChunkSpec]:
        """If enough absolute frames are available, return the next chunk."""
        cfg = self.cfg
        first_chunk, steady_chunk = cfg.chunk_size_frames
        first_shift, steady_shift = cfg.shift_size_frames
        pre = cfg.pre_encode_cache_size[1]
        if self._idx == 0:
            if frames_available < first_chunk:
                return None
            if self.unified:
                frames = steady_chunk + pre
                lead = frames - first_chunk
                spec = ChunkSpec(0, 0, -lead, first_chunk, frames, frames,
                                 cfg.drop_extra_pre_encoded, False)
            else:
                spec = ChunkSpec(0, 0, 0, first_chunk, first_chunk, first_chunk, 0, False)
            self._idx, self._start = 1, first_shift
            return spec
        s0 = self._start - pre
        s1 = self._start + steady_chunk
        if frames_available < s1:
            return None
        spec = ChunkSpec(self._idx, self._start, s0, s1, steady_chunk + pre,
                         steady_chunk + pre, cfg.drop_extra_pre_encoded, False)
        self._idx += 1
        self._start += steady_shift
        return spec

    def flush(self, frames_available: int) -> Optional[ChunkSpec]:
        """End-of-utterance: produce the final (possibly short) chunk."""
        cfg = self.cfg
        pre = cfg.pre_encode_cache_size[1]
        first_chunk, steady_chunk = cfg.chunk_size_frames
        if self._idx == 0:
            if frames_available <= 0:
                return None
            spec = ChunkSpec(0, 0, 0, frames_available, first_chunk,
                             min(frames_available, first_chunk), 0, True)
            self._idx = 1
            return spec
        s0 = self._start - pre
        if frames_available <= self._start:
            return None
        spec = ChunkSpec(self._idx, self._start, s0, frames_available,
                         steady_chunk + pre, frames_available - s0,
                         cfg.drop_extra_pre_encoded, True)
        self._idx += 1
        return spec
