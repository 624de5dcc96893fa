"""Kernel-level TPU benchmarks for the BASELINE.md target metrics.

Reports, on the real chip (run WITHOUT forcing cpu: the env pins the axon
TPU tunnel):

  - ofdm_msamples_per_s:  OFDM modulate -> demodulate roundtrip throughput
    (time-domain samples processed per second, both directions counted once)
  - ldpc_decode_mbit_per_s: decoded transport-block payload bits per second
    through rate recovery + layered min-sum (numIter=5) + CRC check, at the
    throughput-notebook TBS (30216 bits, BG1, C=4)
  - td_pdsch_slots_per_s: the full END-TO-END slot pipeline with the
    TIME-domain channel (OFDM + fractional-delay FIR via FFT conv + sync),
    the path bench.py's freq-domain headline number shortcuts

Timing discipline per CLAUDE.md: the axon tunnel has a ~25 ms dispatch
floor and unreliable block_until_ready, so each measurement enqueues
``pipeline`` async dispatches back-to-back, forces one host transfer to
sync, and takes min over outer reps.

Usage: python tools/bench_kernels.py [batch]   (prints one JSON line per
metric; also appends nothing — copy results into README.md by hand)
"""
import json
import sys
import time

sys.path.insert(0, ".")


def timed(fn, pipeline=4, reps=4):
    # each fn returns a real SCALAR computed in-graph (eager reductions over
    # the axon tunnel hit unimplemented kernels); float() forces the sync
    fn()                                    # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(pipeline)]
        for o in outs:
            float(o)
        times.append(time.perf_counter() - t0)
    return min(times) / pipeline


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
    from neoradium_tpu.sim.sweep import make_point_fn, make_trial_keys

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    car = CarrierConfig(numRbs=51, spacing=30)
    results = []

    # ---------------- OFDM modulate->demodulate ----------------
    ofdm = OfdmContext(car)
    P, L, K = 2, car.symbolsPerSlot, car.numSubcarriers
    key = jax.random.PRNGKey(0)
    # inputs MUST be materialized under jit: eager ops over the axon tunnel
    # hit unimplemented TPU kernels (CLAUDE.md)
    ofdmBatch = 4 * batch   # amortize the ~25 ms tunnel dispatch floor
    grids = jax.jit(lambda k: PRNG.awgn_from_key(
        k, (ofdmBatch, P, L, K), 1.0))(key)

    @jax.jit
    def ofdm_rt(g):
        out = ofdm.demodulate(ofdm.modulate(g))
        return jnp.sum(jnp.real(out) ** 2 + jnp.imag(out) ** 2)

    dt = timed(lambda: ofdm_rt(grids))
    ns = ofdm.numSamples
    msps = ofdmBatch * P * ns / dt / 1e6
    results.append(dict(metric="ofdm_msamples_per_s", value=round(msps, 1),
                        unit="Msamples/s",
                        note=f"batch {ofdmBatch} x {P} planes x {ns} samples"))
    print(json.dumps(results[-1]), flush=True)

    # ---------------- LDPC decode ----------------
    cfg = LdpcConfig(30216, baseGraphNo=1, modulation="16QAM", txLayers=2,
                     targetRate=490 / 1024, g=63648)
    enc, dec = LdpcEncoder(cfg), LdpcDecoder(cfg)
    def mk_llrs(k):
        payload = jax.random.bernoulli(k, 0.5, (30216,)).astype(jnp.int8)
        llr1 = (1.0 - 2.0 * enc.encode_tb(payload).astype(jnp.float32)) * 4.0
        return jnp.broadcast_to(llr1, (4 * batch,) + llr1.shape)
    llrs = jax.jit(mk_llrs)(jax.random.PRNGKey(1))

    dec_fn = jax.jit(
        lambda x: jnp.sum(jax.vmap(
            lambda v: dec.decode_tb(v, numIter=5)[1])(x).astype(jnp.int32)))
    dt = timed(lambda: dec_fn(llrs))
    mbps = 4 * batch * cfg.payloadSize / dt / 1e6
    results.append(dict(metric="ldpc_decode_mbit_per_s", value=round(mbps, 1),
                        unit="Mbit/s",
                        note=f"TBS 30216, BG1 C=4, numIter=5, batch {4 * batch}"))
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
    point_fn = make_point_fn(sim.make_trial_fn())
    # the TD path holds a (batch, paths, nt, nfft) complex FFT-conv
    # intermediate (~25 MB per trial at 51 RB / 8 TX): cap the batch
    tdBatch = min(2 * batch, 512)
    keys = make_trial_keys(7, tdBatch)
    snr = jnp.float32(6.0)

    def td_step():
        return point_fn(keys, snr)["bitErrors"]

    dt = timed(td_step)
    results.append(dict(metric="td_pdsch_slots_per_s",
                        value=round(tdBatch / dt, 1), unit="slots/s",
                        note=f"full TD chain (OFDM+FIR+sync+LS), batch {tdBatch}",
                        vs_baseline=round(tdBatch / dt / 6.3, 1)))
    print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
