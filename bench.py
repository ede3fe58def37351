"""Benchmark: full-size streaming chunk step (encoder + fused TDT decode).

Headline vs the reference's best number (BASELINE.md): TRT FP16
streaming-encoder per-chunk latency mean 18.8 ms for a 480 ms-advance chunk
(per-240ms-normalized: 9.4 ms). Ours measures the SAME work plus the decode
loop (which the reference ran on the host with per-step D2H), on one TPU
chip.

The default run measures TWO arms in one process: the ACCURACY arm
(f32 weights, 6-pass HIGHEST matmuls — closed-loop 5.2e-6 at full size,
the contract's strictest ort_f32 1e-4 rung with 19x margin, while the
TRT-FP16 baseline failed its own bar at 0.7% pass; B=1 is
op-overhead-bound so HIGHEST costs nothing vs 3-pass HIGH there) and,
WHEN the committed decode-safety chain certifies it
(_fast_mode_certified — trained-margin artifacts at d256 AND d512 with
margins dominating the int8 delta), the FAST arm (int8 weights, bf16
compute, fused Pallas attention+joint), which then becomes the headline
with the accuracy arm reported alongside. This mirrors the reference's
own shipping decision — its headline TRT engine is FP16, certified by
behavioral evidence rather than a tensor bar. `--single-arm` (or any
explicit --dtype/--quant/--pallas-att/--batch selection) restores
single-mode behavior.

Methodology note (docs/DEBUGGING.md): repeated identical executions through
the axon tunnel get memoized upstream, so every timed step feeds DIFFERENT
data via an on-device perturbation chained through the streaming state —
each measured step is a genuinely new computation.

Prints exactly ONE JSON line on stdout:
  {"metric": "streaming_chunk_p50_ms", "value": ..., "unit": "ms",
   "vs_baseline": <normalized baseline 9.4 / ours>}
Extra detail (incl. batched throughput) to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# reference TRT FP16: 18.8 ms per 480 ms chunk -> 9.4 ms per 240 ms of audio
BASELINE_PER_240MS_MS = 9.4


def _wait_for_device(max_wait_s: float) -> None:
    """Probe the axon TPU tunnel in a SUBPROCESS until it answers or the
    budget runs out. The tunnel has multi-hour outages during which a bare
    jax.devices() HANGS in-process (docs/DEBUGGING.md trap #4) — probing
    out-of-process with a timeout keeps this process recoverable, so a
    transient flap at bench time doesn't cost the run."""
    import os
    import subprocess
    import time as _t

    if max_wait_s <= 0:
        return
    deadline = _t.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=max(1.0, min(180.0, deadline - _t.monotonic())),
                capture_output=True, env=os.environ.copy())
            if r.returncode == 0:
                if attempt > 1:
                    print(f"device up after {attempt} probes", file=sys.stderr)
                return
        except subprocess.TimeoutExpired:
            pass
        if _t.monotonic() >= deadline:
            print(f"device probe failed for {max_wait_s:.0f}s "
                  f"({attempt} attempts) — tunnel down", file=sys.stderr)
            raise SystemExit(3)
        print(f"device probe {attempt} failed; retrying", file=sys.stderr)
        _t.sleep(min(60.0, max(deadline - _t.monotonic(), 1.0)))


def _measure(step, make_state, feats0, iters: int, window: int = 5):
    """Chained varied-input loop, fenced per WINDOW of ``window`` steps.

    Per-step blocking would serialize tunnel round trips that do not exist
    in production (each stream's chunks are state-dependent; the host only
    overlaps dispatch with device compute), but a single end fence hides
    step-to-step variance entirely. A host fetch of the token buffer every
    ``window`` steps keeps most of the pipelining while yielding per-window
    means whose distribution carries the envelope — the reference's parity
    summaries publish p50/p95/p99 the same way
    (trt_parity_300chunks_closedloop.json:13-18).

    On the axon tunnel block_until_ready can acknowledge before the
    computation finishes; only a host fetch fences reliably
    (docs/DEBUGGING.md) — hence np.asarray, not block_until_ready.

    The window fence costs one tunnel round trip, inflating windowed
    numbers on THIS dev setup (remote chip) relative to r1-r3's
    single-fence chained mean; ``chained_mean`` (one fence for the whole
    run) is therefore measured too and stays the cross-round-comparable
    number. On direct-attached hardware the two converge.

    Returns {p50, p95, mean, chained_mean} ms/step (best of 3 runs)."""
    import jax

    def run_once(salt: float, win: int):
        states = make_state()         # fresh buffers (steps donate state)
        f = feats0 * (1.0 + salt)     # distinct data stream per run
        out = None
        times = []
        t0 = time.perf_counter()
        done = 0
        while done < iters:
            w = min(win, iters - done)
            for _ in range(w):
                f = f * 1.0001 + 0.001
                out = step(f, *states)
                states = out[2:]
            _ = np.asarray(out[0])    # window fence (host fetch)
            t1 = time.perf_counter()
            times.append((t1 - t0) * 1e3 / w)
            t0 = t1
            done += w
        _ = np.asarray(jax.tree.leaves(states[0])[0][..., -1:, :])
        return np.asarray(times)

    out = step(feats0, *make_state())
    _ = np.asarray(out[0])          # compile + warm
    best = min((run_once(0.03 * (k + 1), window) for k in range(3)),
               key=lambda t: np.percentile(t, 50))
    chained = min(float(run_once(0.03 * (k + 4), iters).mean())
                  for k in range(2))
    return {"p50": float(np.percentile(best, 50)),
            "p95": float(np.percentile(best, 95)),
            "mean": float(best.mean()),
            "chained_mean": chained}


_PARAM_SPEC = "artifacts/perf/param_spec_fullsize.json"


def _param_spec(cfg):
    """[(path keys, shape, mean, std)] for every leaf of init_params(cfg).

    For the default full-size config the spec is CACHED in the repo
    (artifacts/perf/param_spec_fullsize.json): host init_params at 0.6B
    costs ~85 s plus a ~20 s moments pass on this box — measured r5, the
    dominant share of the r4 bench's '1000 s init' — so the bench reads
    4 KB of JSON instead. Any other config falls back to computing (and
    does not cache)."""
    import os

    from trt_asr_tpu.config import ModelConfig

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        _PARAM_SPEC)
    is_default = cfg == ModelConfig()
    if is_default and os.path.exists(here):
        with open(here) as f:
            d = json.load(f)
        return d["skeleton"], [(tuple(shp), m, s) for shp, m, s in d["leaves"]]

    from trt_asr_tpu.models.parakeet import init_params

    host = init_params(cfg, seed=0)
    leaves = []

    def skel(x):
        if isinstance(x, dict):
            return {k: skel(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [skel(v) for v in x]
        leaves.append((tuple(x.shape), float(x.mean()), float(x.std())))
        return len(leaves) - 1

    skeleton = skel(host)
    if is_default:
        os.makedirs(os.path.dirname(here), exist_ok=True)
        with open(here, "w") as f:
            json.dump({"config": "ModelConfig() full-size",
                       "skeleton": skeleton,
                       "leaves": [[list(shp), m, s]
                                  for shp, m, s in leaves]}, f)
    return skeleton, leaves


def _device_init_params(cfg, seed: int):
    """Full-size random params generated ON DEVICE (VERDICT r4 #6).

    The r4 bench paid ~1000 s per run on host-side 0.6B f32 init + the
    2.4 GB upload through the tunnel — one flap away from losing the
    measurement. The bench needs RANDOM weights of the right shapes and
    scales, not those exact bytes: a cached per-leaf (shape, mean, std)
    spec (_param_spec) parameterizes ONE jitted program that draws a
    single flat normal vector on device and carves every leaf out of it
    with static slices — no host weights, no upload, one small compile.
    The measured step is identical (same shapes/dtypes, statistically
    identical logits; emission profile re-calibrated per run via
    --blank-bias); equivalence vs host-init:
    artifacts/perf/device_init_equivalence.json. ``--host-init`` restores
    the old path."""
    import jax
    import jax.numpy as jnp

    skeleton, spec = _param_spec(cfg)
    sizes = [int(np.prod(shp)) for shp, _, _ in spec]
    total = int(np.sum(sizes))
    offs = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)

    @jax.jit
    def gen(key):
        flat = jax.random.normal(key, (total,), jnp.float32)
        return [m + s * flat[int(offs[i]): int(offs[i + 1])].reshape(shp)
                for i, (shp, m, s) in enumerate(spec)]

    leaves = gen(jax.random.key(seed))

    def build(node):
        if isinstance(node, dict):
            return {k: build(v) for k, v in node.items()}
        if isinstance(node, list):
            return [build(v) for v in node]
        return leaves[node]

    return build(skeleton)


def _fast_mode_certified(root: str = ""):
    """Decide whether the fast mode (int8+bf16+Pallas) carries its
    WER-gated certification, from the COMMITTED decode-safety-chain
    artifacts (PERFNOTES "int8 decode safety vs model size"). int8 can
    never meet a tensor rung (encoder output delta ~0.18 vs the 1.8e-3
    trt_fp16 bar), so its certification is behavioral — the same CLASS
    of evidence the reference shipped its FP16 engine on. Required, at
    EVERY trained mid-size gate (d256 and d512):

    - the direct decode-level evidence: the trained model's held-out WER
      gate re-run with int8 weights + bf16 compute passes
      (int8_wer_gate_d{dm}.json: pass == true, wer <= 0.05);
    - the per-decision bound: int8's argmax decision-flip rate < 2%
      (trained_margins_vs_int8_delta_d{dm}.json — measured flips, not
      the aggregate margin/delta ratio: r5 showed the ratio tracks how
      CONVERGED a gate model is, not decode safety; both are reported).

    Returns the per-size evidence list, or None (artifacts
    absent/regressed -> the bench keeps the f32 headline)."""
    import os

    here = root or os.path.dirname(os.path.abspath(__file__))
    out = []
    for dm in (256, 512):
        pm = f"artifacts/parity/trained_margins_vs_int8_delta_d{dm}.json"
        pw = f"artifacts/parity/int8_wer_gate_d{dm}.json"
        try:
            with open(os.path.join(here, pm)) as f:
                d = json.load(f)
            ratio = float(d["safety_ratio_emission_p5_over_delta_e2e_p95"])
            flips = float(d["decision_flip_rate_e2e"])
            with open(os.path.join(here, pw)) as f:
                w = json.load(f)
            wer = float(w["wer"])
            ok = bool(w["pass"])
        except (OSError, KeyError, ValueError):
            return None
        if not (ok and wer <= 0.05 and flips < 0.02):
            return None
        out.append({"d_model": dm, "int8_wer": round(wer, 4),
                    "decision_flip_rate": round(flips, 5),
                    "margin_delta_ratio": round(ratio, 2),
                    "artifacts": [pw, pm]})
    return out


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--no-pallas", action="store_true",
                    help="disable the fused Pallas joint decode step")
    ap.add_argument("--pallas-att", action="store_true",
                    help="B=1 only: fused attention-block Pallas kernel "
                         "(the session's TRT_ASR_PALLAS_ATT path)")
    ap.add_argument("--quant", default="none",
                    choices=["none", "joint", "encoder", "all"],
                    help="int8 weight-only quantization scope (TRT_ASR_QUANT)")
    ap.add_argument("--dtype", default="f32", choices=["bf16", "f32"],
                    help="f32 (default) = the ACCURACY-PASSING config: f32 "
                         "weights, 3-pass HIGH matmuls — full-size closed-"
                         "loop error 2.99e-4, inside even the contract's "
                         "fp32-class bar (artifacts/parity/fullsize_tpu_"
                         "f32high_closedloop_30.json). bf16 = fast mode "
                         "(fails the accuracy bar, like the reference's "
                         "own shipped fp16 engine did at 0.7%% pass)")
    ap.add_argument("--offline", type=float, default=0.0, metavar="SECONDS",
                    help="offline batch mode: RTFx for B utterances of this "
                         "duration (BASELINE.json 'batched offline' config)")
    ap.add_argument("--blank-bias", type=float, default=1.5,
                    help="added to the joint blank logit so the decode loop "
                         "sees a SPEECH-LIKE blank-dominated emission profile "
                         "instead of random weights' emit-every-step worst "
                         "case; 1.5 measured = 1.5 tokens/chunk (calibrated "
                         "on-device, artifacts/perf/b1_sweep.json); 0 "
                         "disables (see --worst-case)")
    ap.add_argument("--worst-case", action="store_true",
                    help="alias for --blank-bias 0: every decode step emits "
                         "(max_symbols cap), the decode-bound upper bound")
    ap.add_argument("--single-arm", action="store_true",
                    help="measure only the mode given by --dtype/--quant/"
                         "--pallas-att; default ALSO measures the "
                         "certified fast arm in the same process and "
                         "promotes it to the headline when the decode-"
                         "safety chain holds (_fast_mode_certified)")
    ap.add_argument("--host-init", action="store_true",
                    help="initialize params on host and upload them (the "
                         "pre-r5 path: ~1000 s of f32 through the tunnel); "
                         "default generates them on device in seconds "
                         "(_device_init_params)")
    ap.add_argument("--f32-precision", default="highest",
                    choices=["high", "highest"],
                    help="accuracy-mode MXU pass count: high = 3-pass "
                         "(trt_fp32 rung, 2.99e-4 full-size closed loop), "
                         "highest = 6-pass (strictest ort_f32 rung, 5.2e-6 "
                         "— floor_attribution_tpu_f32highest.json). "
                         "DEFAULT is highest: B=1 is op-overhead-bound, so "
                         "the strictest rung costs nothing there (measured "
                         "interleaved, artifacts/perf/b1_f32_precision.json "
                         "8.2 vs 7.7 ms); at B>=32 capacity, high is ~12%% "
                         "more streams/chip")
    args = ap.parse_args()
    if args.worst_case:
        args.blank_bias = 0.0
    if args.dtype == "f32":
        # the accuracy-mode MXU pass count (read once at ops.common import,
        # so it must be set before trt_asr_tpu imports). The CLI flag WINS
        # over a stale env var — silently inheriting one mislabels the
        # benchmarked rung; report the effective mode for the record.
        import os

        env = os.environ.get("TRT_ASR_F32_PRECISION")
        if env and env.lower() != args.f32_precision:
            print(f"note: overriding TRT_ASR_F32_PRECISION={env} with "
                  f"--f32-precision {args.f32_precision}", file=sys.stderr)
        os.environ["TRT_ASR_F32_PRECISION"] = args.f32_precision
        print(f"effective f32 precision: {args.f32_precision}", file=sys.stderr)

    import os

    # bounded tunnel-outage tolerance (TRT_ASR_BENCH_WAIT_S=0 disables)
    _wait_for_device(float(os.environ.get("TRT_ASR_BENCH_WAIT_S", "900")))

    import jax
    import jax.numpy as jnp

    if os.environ.get("TRT_ASR_COMPILE_CACHE"):
        # persistent-cache the bench programs (runtime/engine.py): repeat
        # runs skip the remote compile entirely — with device-side param
        # init this makes the whole setup seconds, not ~1000 s (VERDICT
        # r4 #6). One-way per process by design (docs/DEBUGGING.md).
        from trt_asr_tpu.runtime.engine import apply_compile_cache

        apply_compile_cache(os.environ["TRT_ASR_COMPILE_CACHE"])

    from trt_asr_tpu.config import ModelConfig
    from trt_asr_tpu.decode import init_decode_state
    from trt_asr_tpu.models.parakeet import init_encoder_state, init_params
    from trt_asr_tpu.models.parakeet.params import cast_params_for_compute
    from trt_asr_tpu.streaming.batch_engine import _batch_step

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    cfg = ModelConfig()

    def prep_arm(a):
        """Params + compute dtype for one measurement arm (``a`` is an
        argparse Namespace; the dual-arm default clones ``args`` with the
        fast-mode fields flipped)."""
        dt = jnp.bfloat16 if a.dtype == "bf16" else jnp.float32
        t0 = time.time()
        if a.host_init:
            params = init_params(cfg, seed=0)
        else:
            params = _device_init_params(cfg, seed=0)
        if a.blank_bias:
            # random weights give blank no special mass (1 of 8193) so
            # every step would emit — unrepresentative of ASR decode,
            # which is blank-dominated. Bias the blank logit for a
            # realistic emission rate; report the measured tokens/chunk
            # alongside the timing. (quantize_params leaves biases f32,
            # so this survives the fast arm's int8 pass.)
            bb = np.asarray(params["joint"]["out"]["b"]).copy()
            bb[cfg.blank_id] += a.blank_bias
            params["joint"]["out"]["b"] = bb
        if a.dtype == "bf16":
            params = cast_params_for_compute(params, jnp.bfloat16)
        if a.quant != "none":
            from trt_asr_tpu.models.parakeet.quant import quantize_params

            params = quantize_params(params, a.quant)
        params = jax.device_put(params)
        print(f"params init+put: {time.time()-t0:.1f}s ({a.dtype}"
              f"{', host-init' if a.host_init else ', device-init'}"
              f"{', quant ' + a.quant if a.quant != 'none' else ''})",
              file=sys.stderr)
        return params, dt

    frames = cfg.chunk_size_frames[1] + cfg.pre_encode_cache_size[1]   # 57
    chunk_audio_ms = cfg.shift_size_frames[1] * 10.0                    # 240
    rng = np.random.default_rng(0)
    max_tokens = cfg.max_symbols_per_timestep * (frames // cfg.subsampling_factor + 1)

    def make_step(b, a, params, dtype):
        valid = jnp.full((b,), frames, jnp.int32)
        emitted = jnp.zeros((b,), jnp.int32)
        cache_drop = jnp.full((b,), cfg.cache_drop_size, jnp.int32)
        valid_cap = jnp.full((b,), cfg.valid_out_len, jnp.int32)

        if a.pallas_att:
            assert b == 1, "--pallas-att is the B=1 streaming path"
            assert a.dtype == "bf16" or a.quant in ("encoder", "all"), \
                "--pallas-att needs bf16 or int8 weights (f32 exceeds VMEM)"
            from trt_asr_tpu.ops.conv import subsampled_length
            from trt_asr_tpu.models.parakeet.encoder import precompute_pos_proj
            from trt_asr_tpu.ops.pallas.att_block_kernel import _round_up
            from trt_asr_tpu.streaming.session import _session_step

            tq = int(subsampled_length(np.asarray(frames), cfg.stride_stages)) \
                - cfg.drop_extra_pre_encoded
            tq_pad = _round_up(tq, 8)
            pp = precompute_pos_proj(params, cfg, tq_pad, cfg.att_cache_size)
            r_pad = _round_up(pp.shape[1], 128)
            ppT = jnp.zeros((cfg.num_layers, cfg.d_model, r_pad), dtype)
            ppT = ppT.at[:, :, : pp.shape[1]].set(jnp.swapaxes(pp, 1, 2).astype(dtype))
            ppT = jax.device_put(ppT)

            def step(f, es, ds):
                toks, n, es, ds = _session_step(
                    params, cfg, f, valid, es, ds,
                    drop_extra=cfg.drop_extra_pre_encoded,
                    cache_drop=cfg.cache_drop_size, valid_cap=cfg.valid_out_len,
                    blank_penalty=0.0, emitted_so_far=emitted[0],
                    punct_mask=None, use_punct_mask=False,
                    pos_proj=None, pos_projT=ppT,
                    pad_steps=tq_pad - tq, use_pallas_att=True,
                    use_pallas_joint=not a.no_pallas and a.dtype == "bf16")
                return toks, n, es, ds

            return step

        def step(f, es, ds):
            toks, n, es, ds = _batch_step(
                params, cfg, f, valid, es, ds, emitted, cache_drop, valid_cap,
                drop_extra=cfg.drop_extra_pre_encoded, max_tokens=max_tokens,
                use_pallas_joint=not a.no_pallas and a.dtype == "bf16")
            return toks, n, es, ds

        return step

    params, dtype = prep_arm(args)
    if args.offline:
        return _bench_offline(params, cfg, args)

    b = args.batch or 1
    step = make_step(b, args, params, dtype)

    def make_state_for(dt):
        def mk():
            return (init_encoder_state(cfg, b, dtype=dt),
                    init_decode_state(cfg, b))
        return mk

    make_state = make_state_for(dtype)

    feats = jnp.asarray(rng.standard_normal((b, frames, cfg.feat_in)).astype(np.float32))

    # measured emission profile (tokens per chunk per stream) — the decode
    # loop's workload depends on it; report for honesty
    def emission_rate(step_, make_state_):
        es, ds = make_state_()
        emits = []
        for k in range(4):
            out = step_(feats * (1.0 + 0.02 * k), es, ds)
            es, ds = out[2], out[3]
            emits.append(float(np.asarray(out[1]).mean()))
        return float(np.mean(emits))

    def calibrate_emission(params_, step_, make_state_, target=1.5):
        """Adjust the blank bias ON DEVICE until the measured emission
        rate is close to ``target`` tok/chunk (the documented speech-like
        profile). The fixed --blank-bias value was calibrated against
        host-init params; device-init params land at a different rate
        (measured 3.0 at bias 1.5), so the profile is calibrated per run
        — same compiled program, no retrace."""
        if args.batch or not args.blank_bias:
            return emission_rate(step_, make_state_)
        base_b = np.asarray(params_["joint"]["out"]["b"])

        def put(extra):
            nb = (base_b.astype(np.float32) + 0.0).copy()
            nb[cfg.blank_id] += extra
            params_["joint"]["out"]["b"] = jax.device_put(
                nb.astype(base_b.dtype))

        # emission collapses FAST in the extra bias (3.0 -> 0.5 tok/chunk
        # within +0.3 here), so probe fine steps near zero
        best = (1e9, 0.0, None)
        for extra in (0.0, 0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.4, 0.6,
                      0.9, 1.2):
            put(extra)
            r = emission_rate(step_, make_state_)
            if abs(r - target) < best[0]:
                best = (abs(r - target), extra, r)
            if r < target - 0.7:
                break
        _, extra, r = best
        put(extra)
        print(f"emission calibrated: {r:.2f} tok/chunk "
              f"(extra bias {extra:g})", file=sys.stderr)
        return r

    rate = calibrate_emission(params, step, make_state)
    print(f"emission profile: {rate:.2f} tokens/chunk/stream "
          f"(blank_bias {args.blank_bias})", file=sys.stderr)

    # Dual-arm default (VERDICT r4 #2 tail): when the run is the plain
    # accuracy-mode default AND the committed decode-safety chain
    # certifies the fast mode (_fast_mode_certified), ALSO measure the
    # fast arm (int8+bf16+Pallas) in the SAME process, with the two arms
    # INTERLEAVED at round granularity — tunnel speed drifts +-2x between
    # minutes (docs/DEBUGGING.md), so sequential arm measurements flip
    # the comparison run-to-run; alternating rounds give both arms the
    # same drift exposure (the tools/perf_sweep.py rule). The promotion
    # is gated on artifacts, not asserted: delete/regress the chain and
    # the bench falls back to the f32 headline.
    fast = None
    if (not args.single_arm and not args.batch and not args.pallas_att
            and args.dtype == "f32" and args.quant == "none"):
        cert = _fast_mode_certified()
        if cert is None:
            print("fast arm skipped: decode-safety chain artifacts absent "
                  "or failing — f32 accuracy arm stays the headline",
                  file=sys.stderr)
        else:
            import copy as _copy

            fa = _copy.copy(args)
            fa.dtype, fa.quant, fa.pallas_att = "bf16", "all", True
            params_f, dtype_f = prep_arm(fa)
            step_f = make_step(1, fa, params_f, dtype_f)
            make_state_f = make_state_for(dtype_f)
            rate_f = calibrate_emission(params_f, step_f, make_state_f)
            print(f"fast-arm emission profile: {rate_f:.2f} tokens/chunk",
                  file=sys.stderr)
            fast = {"rate": rate_f, "cert": cert,
                    "params": params_f, "step": step_f,
                    "make_state": make_state_f}

    def _min_combine(a, b):
        """Keep the faster-chained round's windowed stats, min the
        chained mean (the drift-filtering estimator _measure itself
        uses across its internal runs)."""
        if a is None:
            return b
        keep = dict(b if b["chained_mean"] < a["chained_mean"] else a)
        keep["chained_mean"] = min(a["chained_mean"], b["chained_mean"])
        return keep

    t0 = time.time()
    if fast is None:
        res = _measure(step, make_state, feats, args.iters)
    else:
        res = res_f = None
        it = max(args.iters // 2, 20)
        for _ in range(3):
            res = _min_combine(res, _measure(step, make_state, feats, it))
            res_f = _min_combine(
                res_f, _measure(fast["step"], fast["make_state"], feats, it))
        fast["res"] = res_f
        print(f"fast arm (int8+bf16+pallas): "
              f"{res_f['chained_mean']:.3f} ms chained mean (windowed "
              f"p50 {res_f['p50']:.3f} / p95 {res_f['p95']:.3f}), "
              f"3 interleaved rounds", file=sys.stderr)
    print(f"measure wall: {time.time()-t0:.1f}s (incl compile)", file=sys.stderr)

    # Headline = chained mean (ONE fence per run): the r1-r3-comparable,
    # conservative number. The windowed p50/p95 are reported RAW: each
    # window pays a tunnel-fence round trip whose jitter is heavy-tailed
    # on this dev setup (tens of ms), so they are honest UPPER bounds on
    # the per-chunk envelope — on direct-attached hardware they become the
    # true percentiles. (A mean-anchored "fence correction" was tried and
    # rejected: tunnel jitter skew makes it flatter the headline.)
    p50 = res["chained_mean"]
    p95 = res["p95"]
    per_stream = p50 / b
    streams = b * chunk_audio_ms / p50
    print(f"B={b}: {p50:.3f} ms/step chained mean (windowed envelope "
          f"p50 {res['p50']:.3f} / p95 {res['p95']:.3f}, tunnel-fence-"
          f"inclusive upper bounds) "
          f"({per_stream:.3f} ms/stream-chunk; RTF {per_stream/chunk_audio_ms:.4f}; "
          f"~{streams:.0f} real-time streams/chip)", file=sys.stderr)

    # emission-profile sensitivity (VERDICT r3 #7): re-measure at a
    # SPARSER decode profile (~0.5 tok/chunk) by raising the blank bias ON
    # DEVICE — same compiled program, new joint-bias value, no recompile —
    # so the headline cannot be flattered by blank-dominated decode. Runs
    # on the HEADLINE arm (the fast arm when the dual default promoted it).
    def emission_sweep(params_, step_, make_state_, rate_, res_):
        sweep = [{"tokens_per_chunk": round(rate_, 2),
                  "ms_per_chunk": round(res_["chained_mean"], 3),
                  "windowed_p50_ms": round(res_["p50"], 3)}]
        if args.batch or not args.blank_bias or rate_ <= 0.7:
            # primary already measured at the sparse profile (device-init
            # random weights only reach ~3.0 or ~0.5 tok/chunk; the
            # calibrator picks 0.5) — a second 0.5 row adds nothing
            return sweep
        # calibrate toward ~0.5 tok/chunk: emission collapses fast in the
        # extra bias, so probe fine steps (4 steps each, no recompile) and
        # keep the rate closest to the target
        base_b = np.asarray(params_["joint"]["out"]["b"])

        def with_extra(extra):
            # keep the leaf dtype (bf16 on the fast arm): a silent numpy
            # f32 upcast would retrace the compiled step
            nb = (base_b.astype(np.float32) + 0.0).copy()
            nb[cfg.blank_id] += extra
            return jax.device_put(nb.astype(base_b.dtype))

        probes = []
        for extra in (0.2, 0.4, 0.6, 0.8, 1.0):
            params_["joint"]["out"]["b"] = with_extra(extra)
            r_e = emission_rate(step_, make_state_)
            probes.append((abs(r_e - 0.5), extra, r_e))
            if r_e < 0.2:
                break
        _, extra, lo_rate = min(probes)
        params_["joint"]["out"]["b"] = with_extra(extra)
        res_lo = _measure(step_, make_state_, feats, max(args.iters // 2, 20))
        print(f"emission sweep: {lo_rate:.2f} tok/chunk (extra bias "
              f"{extra:g}) -> chained mean {res_lo['chained_mean']:.3f} ms "
              f"(windowed p50 {res_lo['p50']:.3f})", file=sys.stderr)
        sweep.append({"tokens_per_chunk": round(lo_rate, 2),
                      "ms_per_chunk": round(res_lo["chained_mean"], 3),
                      "windowed_p50_ms": round(res_lo["p50"], 3)})
        params_["joint"]["out"]["b"] = jax.device_put(base_b)
        return sweep

    # accuracy-certification rung of the benchmarked mode (PERFNOTES
    # "rung-honest parity verdicts"; the int8/bf16 fast mode's rung is the
    # WER-gated decode-safety chain — PERFNOTES "int8 decode safety vs
    # model size" — not a tensor rung: int8 encoder output error ~0.18 can
    # never meet a tensor bar, same class as the reference's shipped FP16
    # which failed its own bar at 0.7% pass)
    if args.dtype == "f32" and args.quant == "none":
        rung = ("ort_f32_5.2e-6" if args.f32_precision == "highest"
                else "trt_fp32_2.99e-4")
    else:
        rung = "wer_gated_decode_safe_int8_chain"

    if args.batch:
        print(json.dumps({
            "metric": f"streaming_realtime_streams_per_chip_b{b}",
            "value": round(streams, 1),
            "unit": "streams",
            # ref: one 480ms chunk per 18.8ms serial => 25.5 rt streams ideal
            "vs_baseline": round(streams / 25.5, 2),
            "p95_ms": round(p95, 3),
            "tokens_per_chunk": round(rate, 2),
            "rung": rung,
        }))
    elif fast is not None:
        # certification decides ELIGIBILITY; the measurement decides
        # SELECTION — if the fast arm doesn't actually beat the f32 arm
        # in this run, the f32 arm keeps the headline (it also carries
        # the stronger rung). Both arms always appear in the JSON.
        fr = fast["res"]
        fast_wins = fr["chained_mean"] < p50
        print(f"headline arm: {'fast' if fast_wins else 'accuracy (f32)'} "
              f"(fast {fr['chained_mean']:.3f} vs f32 {p50:.3f} ms)",
              file=sys.stderr)
        f32_report = {
            "ms": round(p50, 3),
            "vs_baseline": round(BASELINE_PER_240MS_MS / p50, 2),
            "windowed_p50_ms": round(res["p50"], 3),
            "windowed_p95_ms": round(p95, 3),
            "tokens_per_chunk": round(rate, 2),
            "rung": rung,
        }
        fast_report = {
            "ms": round(fr["chained_mean"], 3),
            "vs_baseline": round(BASELINE_PER_240MS_MS / fr["chained_mean"], 2),
            "windowed_p50_ms": round(fr["p50"], 3),
            "windowed_p95_ms": round(fr["p95"], 3),
            "tokens_per_chunk": round(fast["rate"], 2),
            "rung": "wer_gated_decode_safe_int8_chain",
            "certification": fast["cert"],
        }
        hrep = fast_report if fast_wins else f32_report
        hp50 = fr["chained_mean"] if fast_wins else p50
        sweep = (emission_sweep(fast["params"], fast["step"],
                                fast["make_state"], fast["rate"], fr)
                 if fast_wins else
                 emission_sweep(params, step, make_state, rate, res))
        out = {
            "metric": "streaming_chunk_p50_ms",
            "value": round(hp50, 3),
            "unit": "ms",
            "vs_baseline": round(BASELINE_PER_240MS_MS / hp50, 2),
            "windowed_p50_ms": hrep["windowed_p50_ms"],
            "windowed_p95_ms": hrep["windowed_p95_ms"],
            "tokens_per_chunk": hrep["tokens_per_chunk"],
            "emission_sweep": sweep,
            "rung": hrep["rung"],
            "headline_arm": "fast" if fast_wins else "accuracy_f32",
        }
        if fast_wins:
            out["certification"] = fast["cert"]
            out["accuracy_mode"] = f32_report
        else:
            out["fast_mode"] = fast_report
        print(json.dumps(out))
    else:
        sweep = emission_sweep(params, step, make_state, rate, res)
        print(json.dumps({
            "metric": "streaming_chunk_p50_ms",
            "value": round(p50, 3),
            "unit": "ms",
            "vs_baseline": round(BASELINE_PER_240MS_MS / p50, 2),
            "windowed_p50_ms": round(res["p50"], 3),
            "windowed_p95_ms": round(p95, 3),
            "tokens_per_chunk": round(rate, 2),
            "emission_sweep": sweep,
            "rung": rung,
        }))
    return 0


def _bench_offline(params, cfg, args) -> int:
    """Offline batch RTFx: full-utterance encode + batched greedy decode."""
    import jax
    import jax.numpy as jnp

    from trt_asr_tpu.decode import init_decode_state
    from trt_asr_tpu.decode.batched import tdt_greedy_decode_batch
    from trt_asr_tpu.models.parakeet import offline_encode

    b = args.batch or 8
    frames = int(args.offline * 100)            # 10 ms frames
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    feats0 = jnp.asarray(rng.standard_normal((b, frames, cfg.feat_in)).astype(np.float32))
    lens = jnp.full((b,), frames, jnp.int32)

    # params is a jit ARGUMENT (never a closure: closed-over arrays inline as
    # HLO constants and kill the remote compiler — docs/DEBUGGING.md)
    @jax.jit
    def run(p, f):
        enc, t_enc = offline_encode(p, cfg, f, lens, compute_dtype=dtype)
        ds = init_decode_state(cfg, b)
        toks, n, _ = tdt_greedy_decode_batch(
            p, cfg, enc.astype(jnp.float32), t_enc.astype(jnp.int32), ds,
            max_tokens=cfg.max_symbols_per_timestep * enc.shape[1],
            use_pallas_joint=not args.no_pallas and args.dtype == "bf16")
        return toks, n

    t0 = time.time()
    toks, n = run(params, feats0)
    _ = np.asarray(toks)
    print(f"compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
    flops = None
    try:  # XLA's own FLOP count for the compiled program (MFU denominator)
        cost = run.lower(params, feats0).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0)) or None
    except Exception as e:  # noqa: BLE001 — cost analysis is best-effort
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
    best = 1e9
    for salt in (0.02, 0.07, 0.13):
        f = feats0 * (1 + salt)
        t0 = time.perf_counter()
        toks, n = run(params, f)
        _ = np.asarray(toks)
        best = min(best, time.perf_counter() - t0)
    audio_sec = b * args.offline
    rtfx = audio_sec / best
    mfu_txt = ""
    if flops:
        # v5e peak: 197 TFLOP/s bf16 (docs/DEBUGGING.md sanity anchor)
        mfu = flops / best / 197e12
        mfu_txt = f"; {flops/1e9:.0f} GFLOP -> MFU {mfu*100:.1f}% of bf16 peak"
    print(f"offline B={b} x {args.offline:.0f}s ({args.dtype}): {best*1e3:.1f} ms "
          f"-> RTFx {rtfx:.0f}{mfu_txt}", file=sys.stderr)
    print(json.dumps({
        "metric": f"offline_rtfx_b{b}_{args.dtype}",
        "value": round(rtfx, 1),
        "unit": "x_realtime",
        # reference never published RTFx (its WER gate failed; encoder-only
        # RTF ~0.04 => ~25x ceiling single-stream)
        "vs_baseline": round(rtfx / 25.0, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
