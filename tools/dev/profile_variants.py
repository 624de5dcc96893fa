"""Cumulative-pipeline stage profile of the headline bench on TPU.

Each variant runs the REAL pipeline from the start up to a cutoff stage and
returns one checksum scalar; stage cost = difference of consecutive variant
dispatch times. Unlike per-stage micro timing, the ~25 ms axon dispatch
floor is a constant additive term that CANCELS in the differences, and
XLA cannot hoist anything because every variant is one fresh end-to-end
program on per-trial random data.

Usage: python tools/dev/profile_variants.py [batch=1536]
"""
import sys
import time

sys.path.insert(0, ".")

STAGES = ["tx", "chan", "chest_eq", "llrs", "recover", "decode"]


def main():
    import jax
    import jax.numpy as jnp
    from neoradium_tpu.carrier import CarrierConfig
    from neoradium_tpu.channels.antenna import AntennaPanel
    from neoradium_tpu.channels.cdl import CdlChannel
    from neoradium_tpu.sim.link import PdschLinkSim
    from neoradium_tpu.sim.sweep import make_trial_keys
    from neoradium_tpu.grid import precode, apply_channel_freq
    from neoradium_tpu.rx.equalize import mmse_equalize
    from neoradium_tpu.random import PRNG

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1536
    car = CarrierConfig(numRbs=51, spacing=30)
    chan = CdlChannel(car, "C", delaySpread=300, carrierFreq=4e9,
                      dopplerShift=5,
                      txAntenna=AntennaPanel((2, 2), polarization="x"),
                      rxAntenna=AntennaPanel((1, 1), polarization="x"))
    sim = PdschLinkSim(
        car, pdschKw=dict(numLayers=2, modulation="16QAM"),
        dmrsKw=dict(configType=2, additionalPos=2),
        codeRate=490 / 1024, domain="freq",
        channelModel=chan, chEst="ls", decoderIter=2,
        decoderDtype="bfloat16")
    plan = sim.plan

    def upto(stage):
        cut = STAGES.index(stage)

        def one(key, snrDb):
            snr = 10.0 ** (snrDb / 10.0)
            kBits, kNoise, kChan = jax.random.split(key, 3)
            payload = jax.random.bernoulli(
                kBits, 0.5, (sim.tbs[0],)).astype(jnp.int8)
            rm = sim.ldpc[0][0].encode_tb(payload)
            grid = plan.populate(rm)
            if cut == 0:
                return jnp.sum(jnp.abs(grid) ** 2)
            state = chan.init_state(kChan)
            # mirror the sim fast path: Dirichlet mean-channel precoder +
            # precoder folded into the CIR (effective_channel_matrix) — the
            # full H and the precoded grid never materialize
            F = sim.pdsch.precoder_from_mean(chan.mean_channel(state, 0))
            Heff = chan.effective_channel_matrix(state, 0, F)
            rxGrid0 = apply_channel_freq(grid, Heff)
            x = rxGrid0.reshape(-1)
            sigma = jnp.sqrt(jnp.var(x) / snr)
            rxGrid = rxGrid0 + PRNG.awgn_from_key(
                kNoise, rxGrid0.shape, 1.0) * sigma.astype(jnp.float32)
            noiseVar = sigma ** 2
            if cut == 1:
                return jnp.sum(jnp.abs(rxGrid) ** 2)
            hEff, _ = sim.estimator.estimate(rxGrid)
            eqGrid, llrScales = mmse_equalize(rxGrid, hEff, noiseVar)
            if cut == 2:
                return jnp.sum(jnp.abs(eqGrid) ** 2)
            llrs = plan.extract_llrs(eqGrid, llrScales, noiseVar)[0]
            llrs = llrs.astype(sim.decoderDtype)
            if cut == 3:
                return jnp.sum(jnp.abs(llrs.astype(jnp.float32)))
            rec, _ = sim.ldpc[0][1].recover_rate(llrs)
            if cut == 4:
                return jnp.sum(jnp.abs(rec.astype(jnp.float32)))
            dec = sim.ldpc[0][1].decode(rec, numIter=5, dtype=sim.decoderDtype,
                                        activeRvs=(0,))
            _, cbOk = sim.ldpc[0][1].check_crc_and_merge(dec)
            return jnp.sum((~cbOk).astype(jnp.int32)).astype(jnp.float32)

        return jax.jit(jax.vmap(one, in_axes=(0, None)))

    keys = make_trial_keys(7, batch)
    snr = jnp.float32(6.0)
    times = {}
    for st in STAGES:
        fn = upto(st)
        float(fn(keys, snr).sum())            # compile + warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(fn(keys, snr).sum())
            ts.append(time.perf_counter() - t0)
        times[st] = min(ts)
        print(f"up to {st:10s}: {times[st]*1e3:8.1f} ms", flush=True)

    print(f"\nbatch {batch}; stage deltas (floor cancels):")
    prev = 0.0
    for st in STAGES:
        print(f"  {st:10s}: {(times[st]-prev)*1e3:8.1f} ms")
        prev = times[st]


if __name__ == "__main__":
    main()
