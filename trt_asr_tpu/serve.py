"""Multi-client streaming ASR daemon over ``BatchStreamingEngine``.

The reference engine has no serving process of its own: its daemon is an
external private project ("magnolia") that links the C ABI
(/root/reference/tools/run_daemon.sh — launcher only, hardcoded private
paths). This module is the missing piece made first-class: a TCP server
that multiplexes up to ``batch_size`` concurrent client streams through
ONE lockstep batched device program (streaming/batch_engine.py), so
serving capacity rides the MXU batch axis instead of process-per-client.

Wire protocol: newline-delimited JSON, one connection per client stream.

  -> {"op": "open"}                                <- {"ok": true, "sid": N}
  -> {"op": "open", "continuous": true,
      "silence_s": 0.6, "energy_threshold": 0.01,
      "min_speech_s": 0.12, "preroll_s": 0.2}      <- {"ok": true, "sid": N}
  -> {"op": "push", "pcm": "<base64 f32le 16k>"}   <- {"ok": true}
  -> {"op": "push_features", "feats": "<base64 f32le [T,C]>", "frames": T}
  -> {"op": "finalize"}                            <- {"ok": true}
  -> {"op": "info"}                                <- {"ok": true, "info": ...}
  events (async, server->client):
     {"event": "partial"|"final"|"error", "segment": N, "text": ...,
      "tokens": [...]}
     finals additionally carry "words": [{word, start_s, end_s}] —
     frame-anchored TDT timestamps (decode/timestamps.py).

Continuous clients (streaming/continuous.py EndpointDetector per client,
run in the client's handler thread — the endpointer costs the device
nothing): audio between speech onset (with pre-roll) and a
sustained-silence endpoint flows into an engine slot; at each endpoint
the slot is finalized and TRANSPARENTLY swapped for a fresh one, and the
finished utterance arrives as
     {"event": "segment", "text": ..., "tokens": [...],
      "start_s": S, "end_s": E, "words": [...]}
with absolute stream times (words are relative to the segment start).
An explicit finalize flushes a segment still in flight; its ack carries
{"total_segments": N} — the number of segment events this stream will
have emitted once all retired slots drain — so clients can wait for
completion deterministically (serve.transcribe_continuous does).
Segment events are emitted when the old slot's flush drains, so they
can interleave with the next segment's partials — order by start_s,
not arrival.

Threading model: shared engine state is serialized under one lock; a
stepper thread runs the lockstep batched chunk whenever any stream has a
ready chunk and moves drained events onto per-stream outbound queues
(never touching a socket — a stalled consumer can only grow its own
queue, drained by its own sender thread). Client handler threads run the
per-slot mel frontend outside the lock (single-owner state) and take the
lock only for the cheap feature-buffer append; stepper errors are
reported to clients and the daemon keeps serving.
"""

from __future__ import annotations

import argparse
import base64
import json
import socket
import sys
import threading
import time
from collections import deque
from typing import Dict, List, Optional

import numpy as np

from trt_asr_tpu.config import ModelConfig, RuntimeConfig
from trt_asr_tpu.models.parakeet.model import ParakeetTDT
from trt_asr_tpu.streaming.batch_engine import BatchStreamingEngine
from trt_asr_tpu.streaming.session import EventType


class AsrServer:
    def __init__(self, model: ParakeetTDT, batch_size: int = 8,
                 host: str = "127.0.0.1", port: int = 0,
                 runtime: Optional[RuntimeConfig] = None, mesh=None,
                 engines=None, beam: int = 1, lm_fn=None,
                 lm_weight: float = 0.0, token_cap: int = 512):
        """beam > 1: every served slot runs the batched device beam
        (optionally LM-fused / biased — streaming/batch_engine.py); FINAL
        events then carry the ranked ``nbest`` alongside the 1-best."""
        self.engine = BatchStreamingEngine(model, batch_size=batch_size,
                                           runtime=runtime, mesh=mesh,
                                           engines=engines, beam=beam,
                                           lm_fn=lm_fn, lm_weight=lm_weight,
                                           token_cap=token_cap)
        self._elock = threading.Lock()      # serializes ALL engine access
        self._clients: Dict[int, socket.socket] = {}   # sid -> conn
        self._wlocks: Dict[int, threading.Lock] = {}   # per-conn write lock
        # per-sid outbound event queue + sender thread: the stepper NEVER
        # touches a socket, so a slow/stalled client can only grow its own
        # queue — it cannot block the device loop or other streams
        self._outq: Dict[int, "deque"] = {}
        self._outcv: Dict[int, threading.Condition] = {}
        self._finalizing: set = set()
        # continuous clients: sid -> {"det": EndpointDetector, "start": n}
        # (owned by that client's handler thread; remapped on rollover)
        self._cont: Dict[int, dict] = {}
        # old sid -> {"start_s","end_s"}: segment metadata awaiting the
        # slot's FINAL event (attached by _drain_events)
        self._seg_pending: Dict[int, dict] = {}
        self._stop = threading.Event()
        self._srv = socket.create_server((host, port))
        self.addr = self._srv.getsockname()
        self._threads = [
            threading.Thread(target=self._accept_loop, daemon=True),
            threading.Thread(target=self._step_loop, daemon=True),
        ]

    # -- lifecycle -------------------------------------------------------

    def start(self, warmup: bool = True) -> "AsrServer":
        if warmup:
            # compile the lockstep + slot-reset programs before accepting
            # clients: the first connection must never pay trace+compile
            # (BatchStreamingEngine.warmup; with TRT_ASR_COMPILE_CACHE the
            # compile is fetched from the persistent cache)
            with self._elock:
                wall = self.engine.warmup()
            print(f"warmup: serving programs ready in {wall:.2f}s", flush=True)
        for t in self._threads:
            t.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass

    def serve_forever(self, warmup: bool = True) -> None:
        self.start(warmup=warmup)
        try:
            while not self._stop.is_set():
                time.sleep(0.2)
        except KeyboardInterrupt:
            pass
        finally:
            # whether the loop ended by KeyboardInterrupt or a client-
            # initiated _stop, close the listening socket deterministically
            self.stop()

    # -- accept / client handling ---------------------------------------

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._client_loop, args=(conn,),
                             daemon=True).start()

    def _send(self, conn: socket.socket, obj: dict, sid: Optional[int] = None,
              lock: Optional[threading.Lock] = None) -> None:
        data = (json.dumps(obj) + "\n").encode()
        if lock is None:
            lock = self._wlocks.get(sid) if sid is not None else None
        try:
            if lock is not None:
                with lock:
                    conn.sendall(data)
            else:
                conn.sendall(data)
        except OSError:
            pass  # client gone; stream cleanup happens in _client_loop

    def _sender_loop(self, sid: int, conn: socket.socket) -> None:
        """Drains one stream's outbound event queue to its socket. Runs in
        its own thread so a stalled consumer only blocks itself. The write
        lock is captured by reference like cv/q: a retired continuous slot
        has its dict entries popped while its last events are still in
        flight, and those final sends must still synchronize with the
        connection's other writers."""
        cv, q = self._outcv[sid], self._outq[sid]
        lock = self._wlocks.get(sid)
        while True:
            with cv:
                while not q:
                    cv.wait()
                item = q.popleft()
            if item is None:   # sentinel: client gone
                return
            self._send(conn, item, sid, lock=lock)

    def _enqueue(self, sid: int, obj: dict) -> None:
        cv = self._outcv.get(sid)
        if cv is None:
            return
        with cv:
            self._outq[sid].append(obj)
            cv.notify()

    def _client_loop(self, conn: socket.socket) -> None:
        sid: Optional[int] = None
        buf = b""
        try:
            while not self._stop.is_set():
                chunk = conn.recv(1 << 16)
                if not chunk:
                    break
                buf += chunk
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    if not line.strip():
                        continue
                    sid = self._dispatch(conn, sid, line)
        except OSError:
            pass
        finally:
            if sid is not None:
                self._cont.pop(sid, None)
                with self._elock:
                    self._clients.pop(sid, None)
                    self._finalizing.discard(sid)
                    self.engine.close_stream(sid)
                self._enqueue(sid, None)   # stop the sender thread
                self._outq.pop(sid, None)
                self._outcv.pop(sid, None)
                self._wlocks.pop(sid, None)
            try:
                conn.close()
            except OSError:
                pass

    def _dispatch(self, conn: socket.socket, sid: Optional[int],
                  line: bytes) -> Optional[int]:
        try:
            msg = json.loads(line)
            op = msg.get("op")
        except json.JSONDecodeError as e:
            self._send(conn, {"ok": False, "error": f"bad json: {e}"}, sid)
            return sid
        try:
            if op == "open":
                with self._elock:
                    new_sid = self.engine.open_stream()
                    self._clients[new_sid] = conn
                    self._wlocks[new_sid] = threading.Lock()
                    self._outq[new_sid] = deque()
                    self._outcv[new_sid] = threading.Condition()
                if msg.get("continuous"):
                    from trt_asr_tpu.streaming.continuous import EndpointDetector

                    self._cont[new_sid] = {"det": EndpointDetector(
                        energy_threshold=float(msg.get("energy_threshold", 0.01)),
                        silence_s=float(msg.get("silence_s", 0.6)),
                        min_speech_s=float(msg.get("min_speech_s", 0.12)),
                        preroll_s=float(msg.get("preroll_s", 0.2))),
                        "start": 0, "segments": 0}
                threading.Thread(target=self._sender_loop,
                                 args=(new_sid, conn), daemon=True).start()
                self._send(conn, {"ok": True, "sid": new_sid}, new_sid)
                return new_sid
            if op == "info":
                self._send(conn, {"ok": True,
                                  "info": {"batch_size": self.engine.b,
                                           "n_mels": self.engine.cfg.feat_in}},
                           sid)
                return sid
            if sid is None:
                self._send(conn, {"ok": False, "error": "open a stream first"})
                return sid
            if op == "push":
                pcm = np.frombuffer(base64.b64decode(msg["pcm"]), np.float32)
                if sid in self._cont:
                    sid = self._push_continuous(conn, sid, pcm)
                    return sid
                # mel extraction runs OUTSIDE the engine lock: the per-slot
                # streaming frontend is owned by this client's handler
                # thread alone (engine.extract_features), so frontend CPU
                # work never contends with device stepping
                feats = self.engine.extract_features(sid, pcm)
                with self._elock:
                    self.engine.push_features(sid, feats)
                self._send(conn, {"ok": True}, sid)
            elif op == "push_features":
                raw = np.frombuffer(base64.b64decode(msg["feats"]), np.float32)
                feats = raw.reshape(int(msg["frames"]), -1)
                with self._elock:
                    self.engine.push_features(sid, feats)
                self._send(conn, {"ok": True}, sid)
            elif op == "finalize":
                if sid in self._cont:
                    # continuous: flush a segment still in flight; the
                    # (fresh) slot stays open for more audio. Rollover is
                    # fallible (slot capacity) — only mark the detector
                    # flushed once it succeeded
                    det = self._cont[sid]["det"]
                    end = det.pending_end
                    if end is not None:
                        sid = self._segment_rollover(conn, sid, end)
                        det.flush()
                    # total_segments = every rollover this client ever
                    # triggered: a client can drain deterministically
                    # (wait until that many segment events arrived)
                    # instead of guessing with quiet-window heuristics
                    self._send(conn, {
                        "ok": True,
                        "total_segments": self._cont[sid]["segments"]}, sid)
                    return sid
                with self._elock:
                    self.engine.finalize_stream(sid)
                    self._finalizing.add(sid)
                self._send(conn, {"ok": True}, sid)
            else:
                self._send(conn, {"ok": False, "error": f"unknown op {op!r}"}, sid)
        except Exception as e:  # noqa: BLE001 — protocol surface, mirror
            # the C-ABI contract: misuse surfaces as an error reply, the
            # daemon stays up for other streams
            self._send(conn, {"ok": False, "error": repr(e)}, sid)
        return sid

    # -- continuous clients ------------------------------------------------

    def _push_continuous(self, conn: socket.socket, sid: int,
                         pcm: np.ndarray) -> int:
        """Run the client's endpoint detector over the pushed audio; only
        speech (plus pre-roll) reaches the engine slot. Returns the
        (possibly remapped) sid — an endpoint swaps the slot."""
        st = self._cont[sid]
        for kind, payload in st["det"].feed(pcm):
            if kind == "onset":
                audio, st["start"] = payload
            elif kind == "speech":
                audio = payload
            else:                       # endpoint
                sid = self._segment_rollover(conn, sid, payload)
                st = self._cont[sid]
                continue
            feats = self.engine.extract_features(sid, audio)
            with self._elock:
                self.engine.push_features(sid, feats)
        self._send(conn, {"ok": True}, sid)
        return sid

    def _segment_rollover(self, conn: socket.socket, old_sid: int,
                          end_sample: int) -> int:
        """Finalize the current slot as one segment and swap in a fresh
        one for the same client. The segment event is emitted by
        _drain_events when the old slot's flush drains (its FINAL event),
        stamped with the absolute stream times recorded here.

        A rollover transiently holds TWO slots (the retiring one until
        its flush drains, plus the fresh one) — size batch_size with that
        headroom. The fresh slot is claimed FIRST: if the server is full,
        open_stream raises before anything is mutated, the client gets an
        error reply, and its detector/slot keep working untouched."""
        with self._elock:
            new_sid = self.engine.open_stream()   # may raise: state intact
            st = self._cont.pop(old_sid)
            st["segments"] += 1
            self.engine.finalize_stream(old_sid)
            self._seg_pending[old_sid] = {
                "start_s": st["start"] / 16000.0,
                "end_s": end_sample / 16000.0,
            }
            self._clients[new_sid] = conn
            # both sids' sender threads write ONE socket: share the lock
            self._wlocks[new_sid] = self._wlocks[old_sid]
            self._outq[new_sid] = deque()
            self._outcv[new_sid] = threading.Condition()
            self._cont[new_sid] = st
        threading.Thread(target=self._sender_loop,
                         args=(new_sid, conn), daemon=True).start()
        return new_sid

    # -- the serving loop -------------------------------------------------

    def _step_loop(self) -> None:
        while not self._stop.is_set():
            advanced = 0
            try:
                with self._elock:
                    if self.engine.pending():
                        advanced = self.engine.step()
                    self._drain_events()
            except Exception as e:  # noqa: BLE001 — the stepper must
                # survive transient device/backend errors (e.g. the TPU
                # tunnel dropping, docs/DEBUGGING.md): report to every
                # connected client and keep serving
                print(f"trt-asr-tpu-serve: step error: {e!r}",
                      file=sys.stderr, flush=True)
                for sid in list(self._clients):
                    self._enqueue(sid, {"event": "error", "segment": -1,
                                        "text": "", "tokens": [],
                                        "error": f"server step failed: {e!r}"})
                time.sleep(0.5)
            if not advanced:
                time.sleep(0.005)

    def _drain_events(self) -> None:
        """Move per-stream events onto their owners' outbound queues
        (caller holds the engine lock; no socket IO here — see _sender_loop)."""
        for sid in list(self._clients):
            while (ev := self.engine.poll_event(sid)) is not None:
                name = {EventType.PARTIAL_TEXT: "partial",
                        EventType.FINAL_TEXT: "final",
                        EventType.ERROR: "error"}[ev.type]
                if ev.type == EventType.FINAL_TEXT and sid in self._seg_pending:
                    # a continuous client's retired slot finished flushing:
                    # emit the segment, then dispose of the slot + its
                    # sender thread (the client already talks on a new sid)
                    meta = self._seg_pending.pop(sid)
                    self._enqueue(sid, {
                        "event": "segment", "text": ev.text,
                        "tokens": list(ev.tokens),
                        "start_s": meta["start_s"], "end_s": meta["end_s"],
                        "words": self.engine.word_timestamps(sid)})
                    self.engine.close_stream(sid)
                    self._clients.pop(sid, None)
                    self._enqueue(sid, None)
                    self._outq.pop(sid, None)
                    self._outcv.pop(sid, None)
                    self._wlocks.pop(sid, None)   # shared object lives on
                    break
                out = {"event": name, "segment": ev.segment_id,
                       "text": ev.text, "tokens": list(ev.tokens)}
                if ev.type == EventType.ERROR:
                    out["error"] = ev.error_message
                if ev.type == EventType.FINAL_TEXT and sid in self._finalizing:
                    out["words"] = self.engine.word_timestamps(sid)
                    if self.engine.beam > 1:
                        out["nbest"] = [
                            {"text": txt, "tokens": ids, "score": sc}
                            for txt, ids, sc in self.engine.nbest(sid)]
                    self._finalizing.discard(sid)
                self._enqueue(sid, out)


# -- client helper --------------------------------------------------------


class _Client:
    """Shared blocking-client core: connect, open handshake, chunked
    base64 push with strict ack checking, event routing to a callback,
    guaranteed cleanup (both the socket AND its makefile dup must close
    or the server never sees EOF and the slot leaks)."""

    def __init__(self, host: str, port: int, timeout_s: float,
                 open_msg: dict, on_event):
        self.conn = socket.create_connection((host, port), timeout=timeout_s)
        self.f = self.conn.makefile("rwb")
        self.on_event = on_event
        self.send(open_msg)
        r = self.recv()
        if not r.get("ok"):
            self.close()
            raise RuntimeError(r.get("error", "open failed"))

    def send(self, obj: dict) -> None:
        self.f.write((json.dumps(obj) + "\n").encode())
        self.f.flush()

    def recv(self) -> dict:
        line = self.f.readline()
        if not line:
            raise ConnectionError("server closed")
        return json.loads(line)

    def recv_routed(self) -> Optional[dict]:
        """One message: events go to on_event (errors raise), acks are
        returned after strict checking."""
        r = self.recv()
        if r.get("event") == "error":
            raise RuntimeError(f"stream error: {r.get('error', r)}")
        if "event" in r:
            self.on_event(r)
            return None
        if not r.get("ok", False):
            raise RuntimeError(r.get("error", f"request rejected: {r}"))
        return r

    def request(self, obj: dict) -> dict:
        """Send an op; route events until its ack arrives."""
        self.send(obj)
        while True:
            ack = self.recv_routed()
            if ack is not None:
                return ack

    def push_all(self, audio: np.ndarray, chunk_samples: int) -> None:
        audio = np.asarray(audio, np.float32)
        for s in range(0, len(audio), chunk_samples):
            self.request({"op": "push", "pcm": base64.b64encode(
                audio[s : s + chunk_samples].tobytes()).decode()})

    def close(self) -> None:
        try:
            self.f.close()
        except OSError:
            pass
        try:
            self.conn.close()
        except OSError:
            pass


def transcribe(host: str, port: int, audio: np.ndarray,
               chunk_samples: int = 8000, timeout_s: float = 300.0) -> dict:
    """Blocking convenience client: stream ``audio`` (16 kHz f32), return
    {"text", "words", "partials"} from the stream's final event."""
    partials = []
    final: List[dict] = []

    def on_event(r):
        if r.get("event") == "final":
            final.append(r)
        else:
            partials.append(r)

    cli = _Client(host, port, timeout_s, {"op": "open"}, on_event)
    try:
        cli.push_all(audio, chunk_samples)
        cli.request({"op": "finalize"})
        deadline = time.monotonic() + timeout_s
        while not final and time.monotonic() < deadline:
            cli.recv_routed()
    finally:
        cli.close()
    if not final:
        raise TimeoutError("no final event")
    out = {"text": final[0]["text"], "words": final[0].get("words", []),
           "partials": partials}
    if "nbest" in final[0]:          # beam-mode server: ranked hypotheses
        out["nbest"] = final[0]["nbest"]
    return out


def transcribe_continuous(host: str, port: int, audio: np.ndarray,
                          chunk_samples: int = 8000,
                          timeout_s: float = 300.0, *,
                          n_segments: Optional[int] = None,
                          **open_kw) -> list:
    """Blocking convenience client for a continuous stream: push ``audio``
    through a `{"op":"open","continuous":true}` stream (``open_kw``:
    silence_s / energy_threshold / min_speech_s / preroll_s), flush, and
    return the segment events sorted by start_s.

    Completion is DETERMINISTIC: the finalize ack carries the server's
    total_segments count (every endpoint this stream ever hit), and the
    drain waits until exactly that many segment events arrived — retired
    slots flush asynchronously, so no quiet-window guessing is involved.
    ``n_segments`` overrides the target (e.g. return early)."""
    segments: List[dict] = []
    cli = _Client(host, port, timeout_s,
                  {"op": "open", "continuous": True, **open_kw},
                  lambda r: segments.append(r)
                  if r.get("event") == "segment" else None)
    try:
        cli.push_all(audio, chunk_samples)
        ack = cli.request({"op": "finalize"})
        want = n_segments if n_segments is not None \
            else int(ack.get("total_segments", 0))
        deadline = time.monotonic() + timeout_s
        while len(segments) < want:
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"{len(segments)}/{want} segments before timeout")
            cli.recv_routed()
    finally:
        cli.close()
    segments.sort(key=lambda m: m["start_s"])
    return segments


def main(argv=None) -> int:
    from trt_asr_tpu.runtime.platform import ensure_requested_platform

    ensure_requested_platform()
    ap = argparse.ArgumentParser(prog="trt-asr-tpu-serve", description=__doc__)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8057)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--model-dir", default="")
    ap.add_argument("--synthetic-model", choices=["tiny", "full"], default="")
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip precompiling the serving programs at startup")
    ap.add_argument("--engines", default="",
                    help="AOT engine dir (tools/engine_build.py --batch N): "
                         "serve the lockstep program from the deserialized "
                         "artifact, live-jit fallback on signature miss")
    ap.add_argument("--beam", type=int, default=1,
                    help="beam width > 1 serves every slot with the batched "
                         "device beam (n-best on FINAL events)")
    ap.add_argument("--lm", default="",
                    help="n-gram LM json (tools/ngram_lm_fit.py) fused into "
                         "the device beam; requires --beam > 1")
    ap.add_argument("--lm-weight", type=float, default=0.6,
                    help="fusion weight; default from the graded-ambiguity "
                         "gate (artifacts/e2e_wer_gate_lm_graded.json)")
    ap.add_argument("--token-cap", type=int, default=512,
                    help="device-beam per-hypothesis token buffer")
    args = ap.parse_args(argv)

    rt = RuntimeConfig.from_env()
    if args.model_dir:
        model = ParakeetTDT.from_model_dir(args.model_dir, runtime=rt)
    elif args.synthetic_model:
        cfg = ModelConfig.tiny() if args.synthetic_model == "tiny" else ModelConfig()
        model = ParakeetTDT.random(cfg)
        model.runtime = rt
    else:
        ap.error("provide --model-dir or --synthetic-model")
    engines = None
    if args.engines:
        from trt_asr_tpu.runtime.engine import EngineSet

        engines = EngineSet.load(args.engines)
    lm_fn = None
    if args.lm:
        from trt_asr_tpu.decode.ngram_lm import NGramLM

        lm_fn = NGramLM.load(args.lm)
    srv = AsrServer(model, batch_size=args.batch_size, host=args.host,
                    port=args.port, runtime=rt, engines=engines,
                    beam=args.beam, lm_fn=lm_fn, lm_weight=args.lm_weight,
                    token_cap=args.token_cap)
    print(f"trt-asr-tpu-serve listening on {srv.addr[0]}:{srv.addr[1]} "
          f"(batch_size={args.batch_size}"
          + (f", beam={args.beam}" if args.beam > 1 else "") + ")",
          flush=True)
    srv.serve_forever(warmup=not args.no_warmup)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
