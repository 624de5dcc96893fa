"""Headline benchmark: end-to-end PDSCH slots/s on one TPU chip.

Runs the reference's throughput-notebook configuration (51 PRB, 30 kHz SCS,
2 layers, 16QAM, R=490/1024 — Playground/PDSCH/PDSCH-Throughput.ipynb) as a
full TX->RX chain (LDPC encode -> ... -> OFDM -> AWGN -> ... -> LDPC decode)
batched over Monte-Carlo trials, and reports slots/s against the reference's
~6.3 slots/s single-core CPU baseline (BASELINE.md row 1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Wall-clock discipline (the driver enforces a hard time budget):
- The persistent XLA compilation cache lives in ``.jax_cache/`` (committed to
  the repo). A warm run skips the multi-minute remote axon compile entirely;
  ``tools/warm_bench_cache.py`` refreshes it for the default batches.
- ``main()`` is a thin watchdog: it runs the measurement in a subprocess with
  a per-attempt timeout and falls back to smaller, faster-compiling batches
  (1536 -> 768 -> 256) if an attempt hangs (cold cache or a flaky tunnel).
  Cold-compile wall times measured on the tunnel 2026-08-21: batch 1536
  ~3m46s, batch 768 ~1m34s; warm runs are ~20s at any batch.
- The 1536 default is only used when ``.jax_cache/WARM.json`` says the cache
  was warmed under the current jax/jaxlib versions; otherwise the first
  attempt is batch 768, which fits the budget even fully cold.

Accuracy license for the fast-path flags used here (bfloat16 decoder,
rv-aware LDPC layer pruning, closed-form Gram precoder, Dirichlet
mean-channel precoder feed): tests/test_link_e2e.py::
test_headline_fastpath_bler_anchor runs this EXACT configuration on the CPU
mesh against reference-generated BLER fixtures with the clustered z-test, and
tests/test_ldpc.py::test_bf16_decode_bler_matches_f32 bounds the bf16 BLER
delta. The bit-exact parity suites keep the float32 defaults.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_SLOTS_PER_S = 6.3  # reference PDSCH-Throughput.ipynb (~158s/1000 slots)
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
WARM_MARKER = os.path.join(CACHE_DIR, "WARM.json")


def _versions():
    import jax
    import jaxlib
    return {"jax": jax.__version__, "jaxlib": jaxlib.__version__}


def cache_is_warm():
    """True if .jax_cache was warmed under the current jax/jaxlib versions.

    The persistent-cache key includes the compiler version, so a version bump
    invalidates every entry — in that case the first attempt must be a batch
    that fits the driver budget fully cold (768: ~1m34s measured).
    """
    try:
        with open(WARM_MARKER) as f:
            return json.load(f).get("versions") == _versions()
    except (OSError, ValueError):
        return False


def enable_compilation_cache():
    import jax
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def build_point_fn():
    """The measured program: one Monte-Carlo point of the headline config."""
    from neoradium_tpu.carrier import CarrierConfig
    from neoradium_tpu.channels.antenna import AntennaPanel
    from neoradium_tpu.channels.cdl import CdlChannel
    from neoradium_tpu.sim.link import PdschLinkSim
    from neoradium_tpu.sim.sweep import make_point_fn

    car = CarrierConfig(numRbs=51, spacing=30)
    chan = CdlChannel(car, "C", delaySpread=300, carrierFreq=4e9, dopplerShift=5,
                      txAntenna=AntennaPanel((2, 2), polarization="x"),   # 8 tx
                      rxAntenna=AntennaPanel((1, 1), polarization="x"))   # 2 rx
    # decoderDtype="bfloat16" is the TPU-native fast path: ~1.2x end-to-end
    # (measured 5007 -> 6142 slots/s at batch 768). BLER impact is bounded by
    # tests/test_ldpc.py::test_bf16_decode_bler_matches_f32 (|ΔBLER| < 3·SE
    # over 1152 blocks x 3 seeds); min-sum needs only magnitude order, and
    # bf16's 8-bit mantissa exceeds hardware decoders' LLR quantization.
    #
    # decoderIter=2 matches the REFERENCE THROUGHPUT NOTEBOOK's own decode
    # call (PDSCH-Throughput.ipynb: harq.decodeLLRs(..., numIter=2)) — the
    # 6.3 slots/s baseline was achieved at 2 iterations, so 2 is the
    # apples-to-apples setting (rounds 1-4 ran 5, doing 2.5x the decode
    # work of the baseline config). BLER parity AT numIter=2 is gated by
    # tests/test_link_e2e.py::test_headline_iter2_bler_anchor against a
    # reference-generated fixture at the same iteration count.
    sim = PdschLinkSim(
        car,
        pdschKw=dict(numLayers=2, modulation="16QAM"),
        dmrsKw=dict(configType=2, additionalPos=2),
        codeRate=490 / 1024, domain="freq",
        channelModel=chan, chEst="ls", decoderIter=2,
        decoderDtype="bfloat16")
    return make_point_fn(sim.make_trial_fn())


def measure(batch):
    import jax
    import jax.numpy as jnp
    from neoradium_tpu.sim.sweep import make_trial_keys

    point_fn = build_point_fn()
    keys = make_trial_keys(7, batch)
    snr = jnp.float32(6.0)

    # compile (excluded from timing)
    jax.block_until_ready(point_fn(keys, snr))

    # Sustained throughput: enqueue `pipeline` async dispatches back-to-back
    # and sync once, so the ~25 ms axon-tunnel round-trip amortizes across
    # the batch instead of taxing every rep. min over outer reps is robust
    # to tunnel latency jitter: r4 showed a single 4x4 window can still
    # land 9% low on a jittery tunnel, so use 6 pipelined dispatches x 6
    # reps (~5 s of measurement at batch 1536 — well inside the warm fuse)
    # and discard the first rep, which pays any residual tunnel/allocator
    # warmup.
    pipeline, reps, times = 6, 6, []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [point_fn(keys, snr) for _ in range(pipeline)]
        for o in outs:
            float(o["bitErrors"].sum())   # force full execution + host sync
        times.append(time.perf_counter() - t0)
    return pipeline * batch / min(times[1:])


def run_inner(batch):
    enable_compilation_cache()
    slots_per_s = measure(batch)
    print(json.dumps({
        "metric": "pdsch_e2e_slots_per_s",
        "value": round(slots_per_s, 2),
        "unit": "slots/s",
        "vs_baseline": round(slots_per_s / BASELINE_SLOTS_PER_S, 2),
    }))


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--inner":
        run_inner(int(sys.argv[2]))
        return

    # batch sweep on v5e (2026-08-21, post round-4 channel rework): 1536 ->
    # 11650, 2048 -> 11713, 3072 -> 11574 slots/s — flat above 1536, which
    # keeps the fastest compile. 1536 is the default when the committed
    # cache is warm; 768 fits the driver budget even fully cold.
    #
    # The tunnel hangs RANDOMLY on ~half of process starts (measured
    # 2026-08-21: same warm-cache run 23s / >200s / 45s / >300s), so the
    # watchdog retries the SAME batch on timeout — a hang says nothing
    # about the batch. Warm attempts get short fuses (a clean warm run is
    # ~25s); the final cold attempt gets the rest of the budget (~95s
    # measured cold at 768, and the axon server caches compiles
    # server-side, so even a killed cold attempt's work isn't lost).
    if len(sys.argv) > 1:
        # Explicit-batch manual run: no watchdog, no budget — a cold compile
        # at a non-default batch can exceed NR_BENCH_BUDGET_S (3m46s measured
        # at 1536) and a deliberate run should complete, not report 0.0.
        run_inner(int(sys.argv[1]))
        return
    # Fuse sizing (re-measured 2026-08-21): a HEALTHY warm attempt takes
    # 25-90 s end to end (process + cache load + 36 pipelined dispatches;
    # the variance is tunnel-side), so 60 s fuses were killing
    # slow-but-healthy runs and a hang streak could exhaust the old 160 s
    # budget into a 0.0 report. 70 s fuses catch nearly all healthy runs
    # and the 220 s default budget leaves a real final chance at 768.
    if cache_is_warm():
        attempts = [(1536, 70), (1536, 70), (768, 40), (768, None)]
    else:
        attempts = [(768, 105), (768, None)]

    deadline = time.monotonic() + float(os.environ.get("NR_BENCH_BUDGET_S", 220))
    for batch, fuse in attempts:
        remaining = deadline - time.monotonic()
        per_attempt = remaining if fuse is None else min(remaining, fuse)
        if per_attempt < 20:
            break
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--inner", str(batch)],
                timeout=per_attempt, capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            continue
        for line in reversed(out.stdout.splitlines()):
            if line.startswith("{"):
                print(line)
                return
    # Every attempt hung (cold cache + flaky tunnel): report the failure as a
    # parseable line rather than silence.
    print(json.dumps({"metric": "pdsch_e2e_slots_per_s", "value": 0.0,
                      "unit": "slots/s", "vs_baseline": 0.0}))


if __name__ == "__main__":
    main()
