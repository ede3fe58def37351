"""Serving daemon: concurrent TCP clients multiplexed through one lockstep
batched engine must transcribe exactly like the engine driven directly
(the daemon adds transport, not semantics)."""

import socket
import threading

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig, RuntimeConfig
from trt_asr_tpu.models.parakeet.model import ParakeetTDT
from trt_asr_tpu.serve import AsrServer, transcribe
from trt_asr_tpu.streaming.batch_engine import BatchStreamingEngine


@pytest.fixture(scope="module")
def model():
    return ParakeetTDT.random(ModelConfig.tiny(), seed=5)


def _audio(n, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (0.4 * np.sin(2 * np.pi * (250 + 30 * seed) * t / 16000)
            + 0.1 * rng.standard_normal(n)).astype(np.float32)


def _direct(model, audio):
    eng = BatchStreamingEngine(model, batch_size=2,
                               runtime=RuntimeConfig(suppress_leading_punct=False))
    sid = eng.open_stream()
    eng.push_audio(sid, audio)
    eng.finalize_stream(sid)
    eng.run_until_drained()
    return eng.text(sid), eng.word_timestamps(sid)


def test_concurrent_clients_match_direct(model):
    srv = AsrServer(model, batch_size=4,
                    runtime=RuntimeConfig(suppress_leading_punct=False)).start()
    host, port = srv.addr
    audios = {k: _audio(28000 + 4000 * k, k + 1) for k in range(3)}
    results = {}

    def run(k):
        results[k] = transcribe(host, port, audios[k], chunk_samples=6000)

    try:
        threads = [threading.Thread(target=run, args=(k,)) for k in audios]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=420)
        assert len(results) == len(audios), "client thread(s) did not finish"
        emitted_any = False
        for k, audio in audios.items():
            want_text, want_words = _direct(model, audio)
            assert results[k]["text"] == want_text, f"stream {k}"
            assert results[k]["words"] == want_words, f"stream {k}"
            emitted_any = emitted_any or bool(want_text)
        assert emitted_any, "degenerate: no stream transcribed anything"
    finally:
        srv.stop()


def test_busy_and_protocol_errors(model):
    srv = AsrServer(model, batch_size=1,
                    runtime=RuntimeConfig(suppress_leading_punct=False)).start()
    host, port = srv.addr
    try:
        c1 = socket.create_connection((host, port), timeout=60)
        f1 = c1.makefile("rwb")
        f1.write(b'{"op": "open"}\n')
        f1.flush()
        import json

        assert json.loads(f1.readline())["ok"] is True

        # second open: all slots busy -> error reply, daemon stays up
        c2 = socket.create_connection((host, port), timeout=60)
        f2 = c2.makefile("rwb")
        f2.write(b'{"op": "open"}\n')
        f2.flush()
        r = json.loads(f2.readline())
        assert r["ok"] is False and "busy" in r["error"]

        # push without open -> error
        f2.write(b'{"op": "push", "pcm": ""}\n')
        f2.flush()
        assert json.loads(f2.readline())["ok"] is False

        # malformed json -> error reply, connection survives
        f2.write(b'not json\n{"op": "info"}\n')
        f2.flush()
        assert json.loads(f2.readline())["ok"] is False
        info = json.loads(f2.readline())
        assert info["ok"] is True and info["info"]["batch_size"] == 1
        f2.close()
        c2.close()

        # first client's slot frees on disconnect -> a new open succeeds
        # (makefile dups the fd: close BOTH so the server sees EOF)
        f1.close()
        c1.close()
        import time

        deadline = time.monotonic() + 30
        ok = False
        while time.monotonic() < deadline and not ok:
            c3 = socket.create_connection((host, port), timeout=60)
            f3 = c3.makefile("rwb")
            f3.write(b'{"op": "open"}\n')
            f3.flush()
            ok = json.loads(f3.readline())["ok"]
            f3.close()
            c3.close()
            if not ok:
                time.sleep(0.1)
        assert ok, "slot did not free after client disconnect"
    finally:
        srv.stop()


def test_continuous_client_segments(model):
    """A continuous client (server-side endpointing) receives one
    'segment' event per speech span, with absolute times, matching the
    engine driven directly on the same samples; a plain client on the
    same daemon is unaffected."""
    import base64
    import json

    srv = AsrServer(model, batch_size=4,
                    runtime=RuntimeConfig(suppress_leading_punct=False)).start()
    host, port = srv.addr
    z = np.zeros(16000, np.float32)
    speech = [_audio(12800, 1), _audio(12800, 2)]
    stream = np.concatenate([z, speech[0], z, speech[1], z])

    plain = {}

    def run_plain():
        plain["r"] = transcribe(host, port, _audio(24000, 3),
                                chunk_samples=6000)

    t = threading.Thread(target=run_plain)
    t.start()
    try:
        conn = socket.create_connection((host, port), timeout=300)
        f = conn.makefile("rwb")

        def send(obj):
            f.write((json.dumps(obj) + "\n").encode())
            f.flush()

        def recv():
            line = f.readline()
            if not line:
                raise ConnectionError("server closed")
            return json.loads(line)

        send({"op": "open", "continuous": True, "silence_s": 0.6})
        assert recv()["ok"]
        segs = []
        for s in range(0, len(stream), 4000):
            send({"op": "push",
                  "pcm": base64.b64encode(
                      stream[s : s + 4000].tobytes()).decode()})
            while True:
                msg = recv()
                if "ok" in msg:
                    break
                if msg.get("event") == "segment":
                    segs.append(msg)
        deadline = 300
        import time as _time
        t0 = _time.monotonic()
        conn.settimeout(1.0)
        while len(segs) < 2 and _time.monotonic() - t0 < deadline:
            try:
                msg = recv()
            except (TimeoutError, socket.timeout):
                continue
            if msg.get("event") == "segment":
                segs.append(msg)
        conn.close()
        assert len(segs) == 2, segs
        segs.sort(key=lambda m: m["start_s"])
        # each segment matches the engine driven directly on its samples
        for seg in segs:
            a = int(round(seg["start_s"] * 16000))
            b = int(round(seg["end_s"] * 16000))
            want_text, _ = _direct(model, stream[a:b])
            assert seg["text"] == want_text, seg
        assert segs[0]["start_s"] <= 1.02 and segs[1]["start_s"] <= 2.82
    finally:
        t.join(timeout=420)
        srv.stop()
    assert plain["r"]["text"] == _direct(model, _audio(24000, 3))[0]


def test_continuous_rollover_capacity_error_is_recoverable(model):
    """batch_size=1: a continuous client's endpoint rollover needs a
    second (transient) slot, so it must fail with an error REPLY — the
    detector and slot stay intact (regression: the old code popped the
    detector and finalized the slot before open_stream could raise) —
    and the daemon keeps serving after the client leaves."""
    import base64
    import json

    srv = AsrServer(model, batch_size=1,
                    runtime=RuntimeConfig(suppress_leading_punct=False)).start()
    host, port = srv.addr
    try:
        conn = socket.create_connection((host, port), timeout=300)
        f = conn.makefile("rwb")

        def send(obj):
            f.write((json.dumps(obj) + "\n").encode())
            f.flush()

        def recv():
            line = f.readline()
            if not line:
                raise ConnectionError("server closed")
            return json.loads(line)

        send({"op": "open", "continuous": True, "silence_s": 0.4})
        assert recv()["ok"]
        z = np.zeros(16000, np.float32)
        stream = np.concatenate([z, _audio(12800, 1), z])
        got_error = False
        for s in range(0, len(stream), 4000):
            send({"op": "push",
                  "pcm": base64.b64encode(
                      stream[s : s + 4000].tobytes()).decode()})
            while True:
                msg = recv()
                if "ok" in msg:
                    got_error = got_error or not msg["ok"]
                    break
        assert got_error, "rollover on a full server must surface an error"
        f.close()     # the makefile dup holds the fd: close it too or the
        conn.close()  # server never sees FIN and the slot never frees
    finally:
        pass
    # the slot frees once the server notices the disconnect (async);
    # then a plain client works
    import time as _time

    try:
        r = None
        for _ in range(100):
            try:
                r = transcribe(host, port, _audio(24000, 3),
                               chunk_samples=8000)
                break
            except RuntimeError:
                _time.sleep(0.2)
        assert r is not None, "slot never freed after disconnect"
        assert r["text"] == _direct(model, _audio(24000, 3))[0]
    finally:
        srv.stop()


def test_many_rollovers_no_slot_leak(model):
    """Six utterances through one continuous client: every rollover
    retires the old slot when its flush drains — at the end exactly one
    slot is active, no pending segments, and the per-sid maps hold only
    the live sid (leak check across repeated rollovers)."""
    import base64
    import json
    import time as _time

    srv = AsrServer(model, batch_size=3,
                    runtime=RuntimeConfig(suppress_leading_punct=False)).start()
    host, port = srv.addr
    try:
        conn = socket.create_connection((host, port), timeout=300)
        f = conn.makefile("rwb")

        def send(obj):
            f.write((json.dumps(obj) + "\n").encode())
            f.flush()

        def recv():
            line = f.readline()
            if not line:
                raise ConnectionError("server closed")
            return json.loads(line)

        send({"op": "open", "continuous": True, "silence_s": 0.4})
        assert recv()["ok"]
        gap = np.zeros(int(0.7 * 16000), np.float32)
        parts = [gap]
        for k in range(6):
            parts += [_audio(int(0.45 * 16000), k + 1), gap]
        stream = np.concatenate(parts)
        segs = []
        for s in range(0, len(stream), 4000):
            send({"op": "push",
                  "pcm": base64.b64encode(
                      stream[s : s + 4000].tobytes()).decode()})
            while True:
                msg = recv()
                if "ok" in msg:
                    assert msg["ok"], msg
                    break
                if msg.get("event") == "segment":
                    segs.append(msg)
        conn.settimeout(1.0)
        t0 = _time.monotonic()
        while len(segs) < 6 and _time.monotonic() - t0 < 300:
            try:
                msg = recv()
            except (TimeoutError, socket.timeout):
                continue
            if msg.get("event") == "segment":
                segs.append(msg)
        assert len(segs) == 6, [s.get("text") for s in segs]
        starts = [s["start_s"] for s in segs]
        assert starts == sorted(starts)
        # steady state: exactly the live slot remains
        t0 = _time.monotonic()
        while _time.monotonic() - t0 < 60:
            with srv._elock:
                if (sum(srv.engine._active) == 1
                        and not srv._seg_pending
                        and len(srv._clients) == 1):
                    break
            _time.sleep(0.2)
        with srv._elock:
            assert sum(srv.engine._active) == 1
            assert not srv._seg_pending
            assert len(srv._clients) == 1
            assert len(srv._outq) == 1 and len(srv._wlocks) == 1
        f.close()
        conn.close()
    finally:
        srv.stop()


def test_transcribe_continuous_helper(model):
    """The blocking continuous client helper returns the ordered segment
    list, including a flushed (no trailing silence) final segment."""
    from trt_asr_tpu.serve import transcribe_continuous

    srv = AsrServer(model, batch_size=3,
                    runtime=RuntimeConfig(suppress_leading_punct=False)).start()
    host, port = srv.addr
    z = np.zeros(16000, np.float32)
    # second utterance has NO trailing silence: only the finalize flush
    # can close it
    stream = np.concatenate([z, _audio(12800, 1), z, _audio(12800, 2)])
    try:
        segs = transcribe_continuous(host, port, stream, chunk_samples=4000,
                                     n_segments=2, silence_s=0.5)
        assert len(segs) == 2
        assert segs[0]["start_s"] < segs[1]["start_s"]
        a, b = (int(round(segs[1]["start_s"] * 16000)),
                int(round(segs[1]["end_s"] * 16000)))
        assert b <= len(stream)
        want_text, _ = _direct(model, stream[a:b])
        assert segs[1]["text"] == want_text
    finally:
        srv.stop()


def test_daemon_serves_from_aot_engines(model, tmp_path):
    """serve.py --engines path: the daemon's lockstep program runs through
    the deserialized StableHLO artifact — warmup warms the artifact call
    path (not the live jit), every served step is an engine hit, and the
    transcript is identical to the engine-less daemon."""
    from trt_asr_tpu.runtime.engine import EngineSet, build_engines

    rt = RuntimeConfig(suppress_leading_punct=False)
    d = tmp_path / "daemon_engines"
    # build under the SAME runtime the server uses: blank_penalty etc. are
    # part of the program signature
    build_engines(model, str(d), runtime=rt, smoke=False, batch_sizes=(2,))
    es = EngineSet.load(str(d))

    audio = _audio(24000, 9)
    want, _ = _direct(model, audio)

    srv = AsrServer(model, batch_size=2, port=0, runtime=rt, engines=es)
    srv.start(warmup=True)
    try:
        got = transcribe(srv.addr[0], srv.addr[1], audio)
        assert got["text"] == want
        assert srv.engine.engine_misses == 0
        assert srv.engine.engine_hits > 0
    finally:
        srv.stop()
