"""Kernel-level TPU benchmarks with roofline accounting (BASELINE.md).

Reports, on the real chip (run WITHOUT forcing cpu: the env pins the axon
TPU tunnel):

  - ofdm_msamples_per_s:  OFDM modulate -> demodulate roundtrip throughput
  - ldpc_decode_mbit_per_s: decoded TB payload bits/s through rate recovery
    + layered min-sum (numIter=5) + CRC at the throughput-notebook TBS
  - td_pdsch_slots_per_s: full END-TO-END slot pipeline with the TIME-domain
    channel (OFDM + fractional-delay FIR via FFT conv + sync + LS)

Measurement discipline: the axon tunnel has a ~25 ms dispatch floor and
unreliable block_until_ready (CLAUDE.md), so each dispatch runs K passes of
the kernel inside an in-graph ``lax.fori_loop`` whose carry feeds pass i
into pass i+1 (no elision/hoisting), the timer syncs with one host scalar
transfer, and per-pass time = min-over-reps dispatch time / K. With
K*t_pass >> 25 ms the floor contributes <10% to every number below.

Roofline accounting: per-pass FLOPs and HBM bytes come from XLA's own
compiled-executable cost analysis (divided by K), falling back to analytic
estimates if the backend doesn't expose cost_analysis. Achieved GB/s and
TFLOP/s are compared against the v5e peaks (819 GB/s HBM, 197 TFLOP/s
bf16 — jax-ml.github.io/scaling-book numbers); arithmetic intensity
(flops/byte) against the v5e ridge point (~240 flops/byte) says whether a
kernel is bandwidth- or compute-bound.

Usage: python tools/bench_kernels.py [batch]   (prints one JSON line per
metric; copy results into README.md by hand)
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 197.0
V5E_RIDGE = V5E_BF16_TFLOPS * 1e12 / (V5E_HBM_GBPS * 1e9)  # ~240 flops/byte


def timed_dispatch(fn, reps=5):
    """Min dispatch wall time; fn returns a scalar, float() forces sync."""
    float(fn())                             # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn())
        times.append(time.perf_counter() - t0)
    return min(times)


def cost_per_pass(jfn, args, k):
    """(flops, hbm_bytes) per kernel pass from XLA cost analysis, or
    (None, None) when the backend doesn't expose it."""
    try:
        cost = jfn.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        byts = sum(v for key, v in cost.items()
                   if isinstance(v, (int, float)) and "bytes accessed" in key)
        if byts == 0:
            byts = float(cost.get("bytes accessed", 0.0))
        return flops / k, byts / k
    except Exception as e:          # noqa: BLE001 — axon may not support it
        print(json.dumps({"note": f"cost_analysis unavailable: {e}"}),
              flush=True)
        return None, None


def roofline(dt_pass, flops, byts):
    out = {}
    if byts:
        gbps = byts / dt_pass / 1e9
        out["achieved_GBps"] = round(gbps, 1)
        out["pct_hbm_roofline"] = round(100 * gbps / V5E_HBM_GBPS, 1)
    if flops:
        tflops = flops / dt_pass / 1e12
        out["achieved_TFLOPs"] = round(tflops, 2)
        out["pct_bf16_peak"] = round(100 * tflops / V5E_BF16_TFLOPS, 1)
    if flops and byts:
        out["flops_per_byte"] = round(flops / byts, 1)
        out["bound"] = ("compute" if flops / byts > V5E_RIDGE else "bandwidth")
    return out


def main():
    import jax
    import jax.numpy as jnp
    from neoradium_tpu.carrier import CarrierConfig
    from neoradium_tpu.channels.antenna import AntennaPanel
    from neoradium_tpu.channels.cdl import CdlChannel
    from neoradium_tpu.coding.ldpc import LdpcConfig, LdpcEncoder, LdpcDecoder
    from neoradium_tpu.ofdm import OfdmContext
    from neoradium_tpu.random import PRNG
    from neoradium_tpu.sim.link import PdschLinkSim
    from neoradium_tpu.sim.sweep import make_trial_keys

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    car = CarrierConfig(numRbs=51, spacing=30)
    results = []

    # ---------------- OFDM modulate->demodulate ----------------
    # K chained roundtrips per dispatch: pass i's demodulated grid is pass
    # i+1's input, so XLA cannot elide or hoist any pass.
    ofdm = OfdmContext(car)
    P, L, K = 2, car.symbolsPerSlot, car.numSubcarriers
    KPASS = 16
    grids = jax.jit(lambda k: PRNG.awgn_from_key(
        k, (batch, P, L, K), 1.0))(jax.random.PRNGKey(0))

    @jax.jit
    def ofdm_chain(g):
        def body(_, gg):
            return ofdm.demodulate(ofdm.modulate(gg))
        out = jax.lax.fori_loop(0, KPASS, body, g)
        return jnp.sum(jnp.real(out) ** 2 + jnp.imag(out) ** 2)

    dt = timed_dispatch(lambda: ofdm_chain(grids)) / KPASS
    flops, byts = cost_per_pass(ofdm_chain, (grids,), KPASS)
    if byts is None:
        # analytic: grid r/w + waveform r/w, complex64
        byts = 2 * (batch * P * L * K + batch * P * ofdm.numSamples) * 8.0
        nfft = car.nFFT
        flops = 2 * batch * P * L * 5.0 * nfft * np.log2(nfft)
    ns = ofdm.numSamples
    msps = batch * P * ns / dt / 1e6
    results.append(dict(metric="ofdm_msamples_per_s", value=round(msps, 1),
                        unit="Msamples/s",
                        note=f"batch {batch} x {P} planes x {ns} samples, "
                             f"{KPASS} chained passes/dispatch",
                        **roofline(dt, flops, byts)))
    print(json.dumps(results[-1]), flush=True)

    # ---------------- LDPC decode ----------------
    cfg = LdpcConfig(30216, baseGraphNo=1, modulation="16QAM", txLayers=2,
                     targetRate=490 / 1024, g=63648)
    enc, dec = LdpcEncoder(cfg), LdpcDecoder(cfg)

    def mk_llrs(k):
        payload = jax.random.bernoulli(k, 0.5, (30216,)).astype(jnp.int8)
        llr1 = (1.0 - 2.0 * enc.encode_tb(payload).astype(jnp.float32)) * 4.0
        return jnp.broadcast_to(llr1, (batch,) + llr1.shape)
    llrs = jax.jit(mk_llrs)(jax.random.PRNGKey(1))
    KDEC = 8

    @jax.jit
    def ldpc_chain(x):
        # carry a scalar into each pass's input so passes cannot be merged;
        # the scale is exactly 1.0 in float32 (err counts are tiny ints)
        def body(_, carry):
            errs, c = carry
            scaled = x * (1.0 + 1e-30 * c.astype(jnp.float32))
            e = jnp.sum(jax.vmap(
                lambda v: dec.decode_tb(v, numIter=5)[1])(scaled)
                .astype(jnp.int32))
            return (errs + e, e)
        out, _ = jax.lax.fori_loop(0, KDEC, body,
                                   (jnp.int32(0), jnp.int32(0)))
        return out

    dt = timed_dispatch(lambda: ldpc_chain(llrs)) / KDEC
    flops, byts = cost_per_pass(ldpc_chain, (llrs,), KDEC)
    mbps = batch * cfg.payloadSize / dt / 1e6
    results.append(dict(metric="ldpc_decode_mbit_per_s", value=round(mbps, 1),
                        unit="Mbit/s",
                        note=f"TBS 30216, BG1 C=4, numIter=5, batch {batch}, "
                             f"{KDEC} passes/dispatch",
                        **roofline(dt, flops, byts)))
    print(json.dumps(results[-1]), flush=True)

    # ---------------- time-domain end-to-end slots/s ----------------
    chan = CdlChannel(car, "C", delaySpread=300, carrierFreq=4e9,
                      dopplerShift=5,
                      txAntenna=AntennaPanel((2, 2), polarization="x"),
                      rxAntenna=AntennaPanel((1, 1), polarization="x"))
    sim = PdschLinkSim(car, pdschKw=dict(numLayers=2, modulation="16QAM"),
                       dmrsKw=dict(configType=2, additionalPos=2),
                       codeRate=490 / 1024, domain="time",
                       channelModel=chan, chEst="ls", decoderIter=5)
    trial = sim.make_trial_fn()
    # the TD path holds a per-symbol FFT-conv intermediate: cap the batch
    tdBatch = min(2 * batch, 512)
    keys = make_trial_keys(7, tdBatch)
    snr = jnp.float32(6.0)
    KTD = 4

    @jax.jit
    def td_chain(ks):
        # each pass folds the previous error count into fresh trial keys:
        # real new work every pass, data-dependent, nothing hoistable
        def body(i, carry):
            tot, salt = carry
            kk = jax.vmap(lambda k: jax.random.fold_in(k, salt))(ks)
            m = jax.vmap(lambda k: trial(k, snr))(kk)
            e = jnp.sum(m["bitErrors"], dtype=jnp.int32)
            return (tot + e, e + i)
        out, _ = jax.lax.fori_loop(0, KTD, body,
                                   (jnp.int32(0), jnp.int32(0)))
        return out

    dt = timed_dispatch(lambda: td_chain(keys)) / KTD
    flops, byts = cost_per_pass(td_chain, (keys,), KTD)
    results.append(dict(metric="td_pdsch_slots_per_s",
                        value=round(tdBatch / dt, 1), unit="slots/s",
                        note=f"full TD chain (OFDM+FIR+sync+LS), "
                             f"batch {tdBatch}, {KTD} passes/dispatch",
                        vs_baseline=round(tdBatch / dt / 6.3, 1),
                        **roofline(dt, flops, byts)))
    print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
