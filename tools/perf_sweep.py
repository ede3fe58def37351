"""One-process B=1 latency sweep over precision/kernel configs (real TPU).

Uploads the full-size params ONCE, derives bf16/int8 variants on device
(quantize_tensor runs as a jitted program — no re-upload), calibrates the
blank bias to a requested emission profile, then measures each config with
the fenced varied-input methodology (bench._measure, docs/DEBUGGING.md).

Usage: python tools/perf_sweep.py [--iters 50] [--emit-target 1.5]
Writes artifacts/perf/b1_sweep.json.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _measure  # fenced, varied-input, best-of-3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--emit-target", type=float, default=1.5,
                    help="calibrate blank bias for ~this many tokens/chunk")
    ap.add_argument("--configs",
                    default="xla,bpallas,bpallas_q8,xla_q8enc,xla_q8all",
                    help="comma list: xla xla_q8enc xla_q8all (batched decode, "
                         "XLA encoder) | bpallas bpallas_q8 (batched decode, "
                         "fused att kernel) | spallas spallas_q8 (single-"
                         "stream decode, fused att kernel)")
    ap.add_argument("--out", default="artifacts/perf/b1_sweep.json")
    ap.add_argument("--offline", type=float, default=0.0, metavar="SECONDS",
                    help="offline mode instead: RTFx + MFU sweep over "
                         "--batches utterances of this duration")
    ap.add_argument("--batches", default="8,16,32,64")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"],
                    help="offline-mode compute dtype; f32 honors "
                         "TRT_ASR_F32_PRECISION (the accuracy mode's "
                         "throughput rows, VERDICT r2 #4)")
    ap.add_argument("--flash-att", action="store_true",
                    help="offline mode: blocked (flash) attention kernel — "
                         "streams K/V/bias blocks through VMEM instead of "
                         "materializing [B,H,T,T] scores in HBM")
    ap.add_argument("--bucket-secs", default="",
                    help="offline length-bucketing mode: comma list of "
                         "utterance durations (e.g. 5,10,15,30); each batch "
                         "mixes real lengths, bucketed to the nearest "
                         "duration and padded within the bucket only "
                         "(VERDICT r2 #7: variable-length batches)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from trt_asr_tpu.config import ModelConfig
    from trt_asr_tpu.decode import init_decode_state
    from trt_asr_tpu.models.parakeet import init_encoder_state, init_params
    from trt_asr_tpu.models.parakeet.encoder import precompute_pos_proj
    from trt_asr_tpu.models.parakeet.params import cast_params_for_compute
    from trt_asr_tpu.models.parakeet.quant import quantize_params
    from trt_asr_tpu.ops.conv import subsampled_length
    from trt_asr_tpu.ops.pallas.att_block_kernel import _round_up
    from trt_asr_tpu.streaming.batch_engine import _batch_step
    from trt_asr_tpu.streaming.session import _session_step

    # CPU smoke knob: tiny model on the CPU backend so the sweep code
    # paths (incl. bucketed corpus measurement) are testable without the
    # TPU tunnel; numbers produced this way are NOT perf artifacts
    tiny = os.environ.get("TRT_ASR_SWEEP_TINY") == "1"
    if tiny:
        jax.config.update("jax_platforms", "cpu")
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    cfg = ModelConfig.tiny() if tiny else ModelConfig()
    t0 = time.time()
    params_np = init_params(cfg, seed=0)
    print(f"init: {time.time()-t0:.0f}s", file=sys.stderr)

    frames = cfg.chunk_size_frames[1] + cfg.pre_encode_cache_size[1]
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((1, frames, cfg.feat_in)).astype(np.float32))
    valid = jnp.full((1,), frames, jnp.int32)
    emitted = jnp.zeros((1,), jnp.int32)
    cache_drop = jnp.full((1,), cfg.cache_drop_size, jnp.int32)
    valid_cap = jnp.full((1,), cfg.valid_out_len, jnp.int32)
    max_tokens = cfg.max_symbols_per_timestep * (frames // cfg.subsampling_factor + 1)

    t0 = time.time()
    sweep_dt = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    params = jax.device_put(cast_params_for_compute(params_np, sweep_dt))
    print(f"upload ({args.dtype}): {time.time()-t0:.0f}s", file=sys.stderr)

    if args.offline or args.bucket_secs:
        return _offline_sweep(args, cfg, params)

    def make_state(dt=jnp.bfloat16):
        return (init_encoder_state(cfg, 1, dtype=dt),
                init_decode_state(cfg, 1))

    def make_state_f32():
        return make_state(jnp.float32)

    tq = int(subsampled_length(np.asarray(frames), cfg.stride_stages)) \
        - cfg.drop_extra_pre_encoded
    tq_pad = _round_up(tq, 8)

    def make_ppT(p):
        pp = precompute_pos_proj(p, cfg, tq_pad, cfg.att_cache_size)
        r_pad = _round_up(pp.shape[1], 128)
        ppT = jnp.zeros((cfg.num_layers, cfg.d_model, r_pad), jnp.bfloat16)
        return ppT.at[:, :, : pp.shape[1]].set(
            jnp.swapaxes(pp, 1, 2).astype(jnp.bfloat16))

    def xla_step_fn(p, pallas: bool = False, all_kernels: bool = False):
        kw = {}
        if pallas:
            kw = dict(pos_projT=make_ppT(p), pad_steps=tq_pad - tq,
                      use_pallas_att=True)
        if all_kernels:
            kw.update(use_pallas_conv=True, use_pallas_ffn=True)

        def step(f, es, ds):
            toks, n, es, ds = _batch_step(
                p, cfg, f, valid, es, ds, emitted, cache_drop, valid_cap,
                drop_extra=cfg.drop_extra_pre_encoded, max_tokens=max_tokens,
                use_pallas_joint=True, **kw)
            return toks, n, es, ds
        return step

    def emission(step, mk=make_state):
        es, ds = mk()
        ems = []
        for k in range(4):
            out = step(feats * (1.0 + 0.02 * k), es, ds)
            es, ds = out[2], out[3]
            ems.append(float(np.asarray(out[1]).mean()))
        return float(np.mean(ems))

    # ---- blank-bias calibration on the bf16 XLA config ----
    b0 = np.asarray(params_np["joint"]["out"]["b"]).copy()
    bias, chosen = 0.0, None
    em = 0.0
    for bias in (2.0, 1.5, 2.5, 1.0, 0.5, 3.0):
        bb = b0.copy()
        bb[cfg.blank_id] += bias
        params["joint"]["out"]["b"] = jax.device_put(jnp.asarray(bb, jnp.bfloat16))
        em = emission(xla_step_fn(params))
        print(f"bias {bias}: {em:.2f} tokens/chunk", file=sys.stderr)
        if 0.5 <= em <= 3.0:
            chosen = (bias, em)
            break
    if chosen is None:
        chosen = (bias, em)
    print(f"calibrated blank bias {chosen[0]} -> {chosen[1]:.2f} tok/chunk",
          file=sys.stderr)

    # device-side derived variants (no re-upload)
    q_enc = quantize_params(params, "encoder")
    q_all = quantize_params(params, "all")

    _f32_cache = {}

    def f32_step_fn(precision: str = ""):
        """Accuracy-mode config: f32 params. Default (precision="") honors
        the TRT_ASR_F32_PRECISION env read at import. With an explicit
        precision ("high" | "highest"), the raw step is RE-JITTED into a
        fresh callable and traced under set_f32_precision — giving each
        mode its own compiled program so both can interleave in ONE process
        (the precision global is not a jit cache key; a shared callable
        would silently reuse the first mode's program)."""
        if "p" not in _f32_cache:
            bb = np.asarray(params_np["joint"]["out"]["b"]).copy()
            bb[cfg.blank_id] += chosen[0]
            params_np["joint"]["out"]["b"] = bb
            t0 = time.time()
            _f32_cache["p"] = jax.device_put(params_np)
            print(f"f32 upload: {time.time()-t0:.0f}s", file=sys.stderr)
        p = _f32_cache["p"]

        if precision:
            from trt_asr_tpu.ops.common import set_f32_precision
            from trt_asr_tpu.streaming.batch_engine import BATCH_STEP_STATIC
            step_impl = functools.partial(
                jax.jit, static_argnames=BATCH_STEP_STATIC,
                donate_argnames=("enc_state", "dec_state"))(
                _batch_step.__wrapped__)
        else:
            step_impl = _batch_step

        def step(f, es, ds):
            # XLA joint: the fused joint kernel's f32 out-projection
            # (640x8320 = 21 MB) exceeds VMEM; accuracy mode keeps the
            # joint f32 via the plain matmul path
            prev = set_f32_precision(precision) if precision else None
            try:
                toks, n, es, ds = step_impl(
                    p, cfg, f, valid, es, ds, emitted, cache_drop, valid_cap,
                    drop_extra=cfg.drop_extra_pre_encoded,
                    max_tokens=max_tokens, use_pallas_joint=False)
            finally:
                if prev is not None:
                    set_f32_precision(prev)
            return toks, n, es, ds
        return step

    def session_step_fn(p):
        ppT = make_ppT(p)

        def step(f, es, ds):
            toks, n, es, ds = _session_step(
                p, cfg, f, valid, es, ds,
                drop_extra=cfg.drop_extra_pre_encoded,
                cache_drop=cfg.cache_drop_size, valid_cap=cfg.valid_out_len,
                blank_penalty=0.0, emitted_so_far=emitted[0],
                punct_mask=None, use_punct_mask=False,
                pos_proj=None, pos_projT=ppT, pad_steps=tq_pad - tq,
                use_pallas_att=True, use_pallas_joint=True)
            return toks, n, es, ds
        return step

    def f32_mixatt_step_fn():
        """SPEED PROBE (fails accuracy — PERFNOTES attribution): bf16
        attention kernel inside the f32-HIGH model. Bounds how much of the
        accuracy mode's wall is the attention section."""
        f32_step_fn()   # ensures the f32 upload
        p = _f32_cache["p"]
        layers = dict(p["encoder"]["layers"])
        for k in ("att_wq", "att_wk", "att_wv", "att_wo"):
            layers[k] = layers[k].astype(jnp.bfloat16)
        p = {**p, "encoder": {**p["encoder"], "layers": layers}}
        kw = dict(pos_projT=make_ppT(p), pad_steps=tq_pad - tq,
                  use_pallas_att=True)

        def step(f, es, ds):
            toks, n, es, ds = _batch_step(
                p, cfg, f, valid, es, ds, emitted, cache_drop, valid_cap,
                drop_extra=cfg.drop_extra_pre_encoded, max_tokens=max_tokens,
                use_pallas_joint=False, **kw)
            return toks, n, es, ds
        return step

    steps = {
        "xla": lambda: xla_step_fn(params),
        "bpallas": lambda: xla_step_fn(params, pallas=True),
        "bpallas_q8": lambda: xla_step_fn(q_all, pallas=True),
        "bpallas3": lambda: xla_step_fn(params, pallas=True, all_kernels=True),
        "bpallas3_q8": lambda: xla_step_fn(q_all, pallas=True, all_kernels=True),
        "spallas": lambda: session_step_fn(params),
        "spallas_q8": lambda: session_step_fn(q_all),
        "xla_q8enc": lambda: xla_step_fn(q_enc),
        "xla_q8all": lambda: xla_step_fn(q_all),
        "f32": lambda: f32_step_fn(),
        "f32_high": lambda: f32_step_fn("high"),
        "f32_highest": lambda: f32_step_fn("highest"),
        "f32_mixatt": lambda: f32_mixatt_step_fn(),
    }
    results = {"blank_bias": chosen[0], "emission_tok_per_chunk": chosen[1],
               "iters": args.iters, "device": str(jax.devices()[0]),
               "method": "interleaved 3 rounds, min per config (controls "
                         "tunnel speed drift between minutes)",
               "configs": {}}

    def measure_once(step, salt: float, mk=make_state) -> float:
        states = mk()
        f = feats * (1.0 + salt)
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            f = f * 1.0001 + 0.001
            out = step(f, *states)
            states = out[2:]
        _ = np.asarray(out[0])   # host fetch = the only reliable fence
        _ = np.asarray(jax.tree.leaves(states[0])[0][..., -1:, :])
        return (time.perf_counter() - t0) * 1e3 / args.iters

    names = args.configs.split(",")
    built = {}
    for name in names:   # compile/warm everything first
        s = steps[name]()
        mk = make_state_f32 if name.startswith("f32") else make_state
        out = s(feats, *mk())
        _ = np.asarray(out[0])
        built[name] = {"step": s, "ms": [], "mk": mk}
    # interleave rounds so machine-speed drift hits all configs equally
    for r in range(3):
        for name in names:
            ms = measure_once(built[name]["step"], 0.03 * (r + 1),
                              built[name]["mk"])
            built[name]["ms"].append(ms)
            print(f"round {r} {name}: {ms:.3f} ms/chunk", file=sys.stderr)
    for name in names:
        em = emission(built[name]["step"], built[name]["mk"])
        msl = built[name]["ms"]
        results["configs"][name] = {
            "ms_per_chunk": round(min(msl), 3),
            "rounds_ms": [round(m, 3) for m in msl],
            "emission": round(em, 2)}
        print(f"{name}: {min(msl):.3f} ms/chunk (emission {em:.2f})",
              file=sys.stderr)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["configs"]))
    return 0




def encoder_flops(cfg, b: int, t_feat: int) -> float:
    """Analytic encoder FLOP count (XLA cost_analysis counts a lax.scan
    body ONCE, undercounting the 24-layer encoder ~24x — measured 671
    GFLOP reported vs ~9.3 TFLOP actual at B=64 x 10 s)."""
    d, ed = cfg.d_model, cfg.d_model * cfg.ff_expansion_factor
    t = t_feat
    for _ in range(cfg.stride_stages):
        t = (t - 1) // 2 + 1
    mults_per_step = (4 * d * ed          # two macaron FFNs
                      + 7 * d * d         # qkvo + conv pw1(2d) + pw2
                      + 2 * t * d         # attention scores + context row
                      + cfg.conv_kernel_size * d)
    return 2.0 * b * t * cfg.num_layers * mults_per_step


def _offline_sweep(args, cfg, params) -> int:
    """One-upload offline RTFx + MFU sweep over batch sizes (VERDICT r1 #9:
    report MFU; r2 #4: --dtype f32 for the accuracy mode's rows; r2 #7:
    --bucket-secs for variable-length batches). Decode runs at the
    calibrated ~1.5 tok/chunk-equivalent blank-dominated emission profile
    (random weights would emit every step — unrepresentative); encoder-only
    wall is timed separately so MFU has a clean denominator."""
    import jax
    import jax.numpy as jnp

    from trt_asr_tpu.decode import init_decode_state
    from trt_asr_tpu.decode.batched import tdt_greedy_decode_batch
    from trt_asr_tpu.models.parakeet import offline_encode
    from trt_asr_tpu.ops.common import _F32_PRECISION

    compute_dtype = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    rng = np.random.default_rng(0)
    # blank-dominated decode (bias measured on-device, b1_sweep.json)
    b_old = params["joint"]["out"]["b"]
    bb = np.asarray(jax.device_get(b_old)).astype(np.float32)
    bb[cfg.blank_id] += 1.5
    params["joint"]["out"]["b"] = jax.device_put(jnp.asarray(bb, b_old.dtype))
    results = {"utterance_s": args.offline, "device": str(jax.devices()[0]),
               "dtype": args.dtype, "blank_bias": 1.5, "configs": {}}
    if args.dtype == "f32":
        results["f32_precision"] = str(_F32_PRECISION)

    if args.flash_att:
        # flash rows are measured INTERLEAVED with the XLA rows per batch
        # size (one process, same minute — the only tunnel-valid comparison)
        results["flash_att"] = "interleaved_comparison"

    @functools.partial(jax.jit, static_argnames=("b", "frames", "flash"))
    def enc_only(p, f, b, frames, flash=False):
        lens = jnp.full((b,), frames, jnp.int32)
        enc, t_enc = offline_encode(p, cfg, f, lens, compute_dtype=compute_dtype,
                                    use_flash_att=flash)
        return enc

    @functools.partial(jax.jit, static_argnames=("b", "frames", "flash"))
    def run(p, f, b, frames, flash=False):
        lens = jnp.full((b,), frames, jnp.int32)
        enc, t_enc = offline_encode(p, cfg, f, lens, compute_dtype=compute_dtype,
                                    use_flash_att=flash)
        ds = init_decode_state(cfg, b)
        toks, n, _ = tdt_greedy_decode_batch(
            p, cfg, enc.astype(jnp.float32), t_enc.astype(jnp.int32), ds,
            max_tokens=cfg.max_symbols_per_timestep * enc.shape[1],
            use_pallas_joint=True)
        return toks, n

    def _measure_bf(b, frames, feats0, variants=(False,)):
        """Best-of-3 fenced e2e + encoder-only walls; when comparing
        variants (flash vs XLA attention) the rounds ALTERNATE between them
        so tunnel-speed drift hits both equally."""
        best = {fl: [1e9, 1e9] for fl in variants}
        for salt in (0.02, 0.07, 0.13):
            for fl in variants:
                f = feats0 * (1 + salt)
                t0 = time.perf_counter()
                toks, _ = run(params, f, b, frames, flash=fl)
                _ = np.asarray(toks)
                best[fl][0] = min(best[fl][0], time.perf_counter() - t0)
                f = feats0 * (1 + salt + 0.005)
                t0 = time.perf_counter()
                _ = np.asarray(enc_only(params, f, b, frames, flash=fl)[..., -1:])
                best[fl][1] = min(best[fl][1], time.perf_counter() - t0)
        return best

    if args.bucket_secs:
        return _bucketed_sweep(args, cfg, params, results, run, enc_only, rng)

    variants = (False, True) if args.flash_att else (False,)
    frames = int(args.offline * 100)
    for b in [int(x) for x in args.batches.split(",")]:
        feats0 = jnp.asarray(
            rng.standard_normal((b, frames, cfg.feat_in)).astype(np.float32))
        t0 = time.time()
        flash_active = {}
        from trt_asr_tpu.ops import attention as _att
        for fl in variants:
            before = dict(_att.flash_trace_counts)
            toks, _ = run(params, feats0, b, frames, flash=fl)
            _ = np.asarray(toks)
            _ = np.asarray(enc_only(params, feats0, b, frames, flash=fl)[..., -1:])
            after = _att.flash_trace_counts
            # static gating can silently fall back to the XLA path; a row
            # labelled "flash" that measured the XLA kernel is fabricated
            flash_active[fl] = (not fl) or after["taken"] > before["taken"] \
                or after["requested"] == before["requested"]  # cached program
            if fl and not flash_active[fl]:
                print(f"WARNING: B={b} flash variant fell back to the XLA "
                      "path at trace time — row marked flash_active=false",
                      file=sys.stderr)
        print(f"B={b} compile+first: {time.time()-t0:.0f}s", file=sys.stderr)
        flops = encoder_flops(cfg, b, frames)
        walls = _measure_bf(b, frames, feats0, variants)
        for fl in variants:
            best, best_enc = walls[fl]
            rtfx = b * args.offline / best
            mfu = flops / best_enc / 197e12
            tag = f"b{b}_flash" if fl else f"b{b}"
            print(f"{tag}: e2e {best*1e3:.1f} ms -> RTFx {rtfx:.0f}; encoder "
                  f"{best_enc*1e3:.1f} ms -> {flops/best_enc/1e12:.1f} TFLOP/s "
                  f"= {mfu*100:.1f}% of bf16 peak", file=sys.stderr)
            results["configs"][tag] = {
                "wall_ms": round(best * 1e3, 1), "rtfx": round(rtfx, 1),
                "encoder_wall_ms": round(best_enc * 1e3, 1),
                "encoder_gflop_analytic": round(flops / 1e9, 1),
                "encoder_mfu_pct_bf16_peak": round(mfu * 100, 1)}
            if fl:
                results["configs"][tag]["flash_active"] = flash_active[fl]
    out = args.out.replace("b1_sweep", "offline_sweep")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["configs"]))
    return 0


def _bucketed_sweep(args, cfg, params, results, run, enc_only, rng) -> int:
    """Variable-length corpus via length bucketing (VERDICT r2 #7): sample
    a corpus of utterances with durations log-uniform across the bucket
    range, pad each only to its bucket's duration, and process bucket by
    bucket — vs the naive pad-everything-to-max baseline. One compiled
    program per (bucket, B); RTFx is REAL audio seconds over a MEASURED
    corpus wall (every batch executed, partial final batches padded to
    full B; min over two interleaved corpus rounds)."""
    import jax.numpy as jnp

    buckets = sorted(float(s) for s in args.bucket_secs.split(","))
    b = int(args.batches.split(",")[0])
    n_utts = 4 * b
    lo, hi = buckets[0] * 0.4, buckets[-1]
    durs = np.exp(rng.uniform(np.log(lo), np.log(hi), size=n_utts))
    assign = [min(s for s in buckets if s >= d - 1e-9) if d <= buckets[-1]
              else buckets[-1] for d in durs]
    real_audio = float(np.sum(durs))

    feats_cache = {}

    def _feats(frames):
        if frames not in feats_cache:
            feats_cache[frames] = jnp.asarray(rng.standard_normal(
                (b, frames, cfg.feat_in)).astype(np.float32))
            toks, _ = run(params, feats_cache[frames], b, frames)  # compile
            _ = np.asarray(toks)
        return feats_cache[frames]

    def corpus_pass(groups, salt0):
        """groups: list of (frames, count). Runs EVERY batch of the corpus
        (partial final batches execute padded to full B — the real cost of
        one static program per bucket), inputs salted per batch so the
        tunnel cannot memoize, fenced via np.asarray. Returns the summed
        measured wall — no per-batch extrapolation."""
        total, k = 0.0, 0
        for frames, count in groups:
            feats0 = _feats(frames)
            for _i in range(int(np.ceil(count / b))):
                k += 1
                t0 = time.perf_counter()
                toks, _ = run(params, feats0 * (1 + salt0 + 0.013 * k),
                              b, frames)
                _ = np.asarray(toks)
                total += time.perf_counter() - t0
        return total

    bucket_groups = []
    for s in buckets:
        count = sum(1 for a in assign if a == s)
        if count:
            bucket_groups.append((int(s * 100), count))
    padmax_groups = [(int(buckets[-1] * 100), n_utts)]
    # two interleaved corpus rounds (bucketed then padmax within each) so
    # the comparison stays inside one tunnel-speed window; min over rounds
    wall_bucketed = wall_padmax = 1e9
    for salt0 in (0.03, 0.11):
        wall_bucketed = min(wall_bucketed, corpus_pass(bucket_groups, salt0))
        wall_padmax = min(wall_padmax, corpus_pass(padmax_groups, salt0))

    out_cfg = {
        "n_utts": n_utts, "batch": b, "buckets_s": buckets,
        "real_audio_s": round(real_audio, 1),
        "duration_range_s": [round(lo, 2), round(hi, 2)],
        "bucketed": {"wall_s": round(wall_bucketed, 3),
                     "rtfx_real_audio": round(real_audio / wall_bucketed, 1)},
        "pad_to_max": {"wall_s": round(wall_padmax, 3),
                       "rtfx_real_audio": round(real_audio / wall_padmax, 1)},
        "bucketing_speedup": round(wall_padmax / wall_bucketed, 2),
        "methodology": "every batch measured (partial finals padded to B); "
                       "min over 2 interleaved corpus rounds",
    }
    results["configs"]["bucketed"] = out_cfg
    print(f"bucketed: {wall_bucketed*1e3:.0f} ms vs pad-to-max "
          f"{wall_padmax*1e3:.0f} ms -> {out_cfg['bucketing_speedup']}x; "
          f"corpus RTFx {out_cfg['bucketed']['rtfx_real_audio']}",
          file=sys.stderr)
    out = args.out.replace("b1_sweep", "offline_bucketed")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["configs"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
