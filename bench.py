"""Headline benchmark: end-to-end PDSCH slots/s on one TPU chip.

Runs the reference's throughput-notebook configuration (51 PRB, 30 kHz SCS,
2 layers, 16QAM, R=490/1024 — Playground/PDSCH/PDSCH-Throughput.ipynb) as a
full TX->RX chain (LDPC encode -> ... -> OFDM -> AWGN -> ... -> LDPC decode)
batched over Monte-Carlo trials, and reports slots/s against the reference's
~6.3 slots/s single-core CPU baseline (BASELINE.md row 1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

sys.path.insert(0, ".")

BASELINE_SLOTS_PER_S = 6.3  # reference PDSCH-Throughput.ipynb (~158s/1000 slots)


def main():
    import jax
    import jax.numpy as jnp
    from neoradium_tpu.carrier import CarrierConfig
    from neoradium_tpu.channels.antenna import AntennaPanel
    from neoradium_tpu.channels.cdl import CdlChannel
    from neoradium_tpu.sim.link import PdschLinkSim
    from neoradium_tpu.sim.sweep import make_point_fn, make_trial_keys

    car = CarrierConfig(numRbs=51, spacing=30)
    chan = CdlChannel(car, "C", delaySpread=300, carrierFreq=4e9, dopplerShift=5,
                      txAntenna=AntennaPanel((2, 2), polarization="x"),   # 8 tx
                      rxAntenna=AntennaPanel((1, 1), polarization="x"))   # 2 rx
    # decoderDtype="bfloat16" is the TPU-native fast path: ~1.2x end-to-end
    # (measured 5007 -> 6142 slots/s at batch 768) with error statistics
    # within 0.03% of float32 at 6 dB — min-sum needs only magnitude order,
    # and bf16's 8-bit mantissa exceeds hardware decoders' LLR quantization
    # (cross-checked in tests/test_ldpc.py::test_bf16_decode_matches_f32_
    # outcomes; the parity suites keep the bit-identical float32 default).
    sim = PdschLinkSim(
        car,
        pdschKw=dict(numLayers=2, modulation="16QAM"),
        dmrsKw=dict(configType=2, additionalPos=2),
        codeRate=490 / 1024, domain="freq",
        channelModel=chan, chEst="ls", decoderIter=5,
        decoderDtype="bfloat16")
    point_fn = make_point_fn(sim.make_trial_fn())

    # batch sweep on v5e (2026-08, post layer-pruning/mean-channel): 768 ->
    # 7474, 1024 -> 7367, 1536 -> 7820, 2048 -> 7842 slots/s; 1536 is the
    # knee (2048 is +0.3% for 33% more memory)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1536
    keys = make_trial_keys(7, batch)
    snr = jnp.float32(6.0)

    # compile (excluded from timing)
    jax.block_until_ready(point_fn(keys, snr))

    # Sustained throughput: enqueue `pipeline` async dispatches back-to-back
    # and sync once, so the ~25 ms axon-tunnel round-trip amortizes across
    # the batch instead of taxing every rep. min over outer reps is robust
    # to tunnel latency jitter.
    pipeline, reps, times = 4, 4, []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [point_fn(keys, snr) for _ in range(pipeline)]
        for o in outs:
            float(o["bitErrors"].sum())   # force full execution + host sync
        times.append(time.perf_counter() - t0)
    slots_per_s = pipeline * batch / min(times)

    print(json.dumps({
        "metric": "pdsch_e2e_slots_per_s",
        "value": round(slots_per_s, 2),
        "unit": "slots/s",
        "vs_baseline": round(slots_per_s / BASELINE_SLOTS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
