"""Estimate per-stage cost of the headline bench pipeline on TPU.

Timing over the axon tunnel is only reliable for FULL pipeline variants
(>= ~25 ms dispatch floor), so stage costs are inferred from differences
between variants:

  full(iter=5)  - full(iter=1)   -> 4 LDPC iterations
  full(ls)      - full(perfect)  -> LS channel estimation
  full(perfect) - noDecode       -> decode setup + CRC + counters

Usage: python tools/dev/profile_stages.py [batch]
"""
import sys
import time

sys.path.insert(0, ".")


def timeit(fn, keys, snr, reps=5):
    import jax
    jax.block_until_ready(fn(keys, snr))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(keys, snr)
        float(out["bitErrors"].sum())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax.numpy as jnp
    from neoradium_tpu.carrier import CarrierConfig
    from neoradium_tpu.channels.antenna import AntennaPanel
    from neoradium_tpu.channels.cdl import CdlChannel
    from neoradium_tpu.sim.link import PdschLinkSim
    from neoradium_tpu.sim.sweep import make_point_fn, make_trial_keys

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    keys = make_trial_keys(7, batch)
    snr = jnp.float32(6.0)

    def build(decoderIter=5, chEst="ls"):
        car = CarrierConfig(numRbs=51, spacing=30)
        chan = CdlChannel(car, "C", delaySpread=300, carrierFreq=4e9,
                          dopplerShift=5,
                          txAntenna=AntennaPanel((2, 2), polarization="x"),
                          rxAntenna=AntennaPanel((1, 1), polarization="x"))
        sim = PdschLinkSim(
            car, pdschKw=dict(numLayers=2, modulation="16QAM"),
            dmrsKw=dict(configType=2, additionalPos=2),
            codeRate=490 / 1024, domain="freq",
            channelModel=chan, chEst=chEst, decoderIter=decoderIter)
        return make_point_fn(sim.make_trial_fn())

    t5 = timeit(build(5, "ls"), keys, snr)
    print(f"full iter=5 ls      : {t5*1e3:8.1f} ms  ({batch/t5:7.0f} slots/s)")
    t1 = timeit(build(1, "ls"), keys, snr)
    print(f"full iter=1 ls      : {t1*1e3:8.1f} ms  ({batch/t1:7.0f} slots/s)")
    t5p = timeit(build(5, "perfect"), keys, snr)
    print(f"full iter=5 perfect : {t5p*1e3:8.1f} ms  ({batch/t5p:7.0f} slots/s)")

    perIter = (t5 - t1) / 4
    print(f"\nper-LDPC-iteration  : {perIter*1e3:8.1f} ms "
          f"({5*perIter/t5*100:.0f}% of full for 5 iters)")
    print(f"LS chest            : {(t5-t5p)*1e3:8.1f} ms "
          f"({(t5-t5p)/t5*100:.0f}% of full)")
    print(f"everything else     : {(t1-(t5-t5p)-perIter)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
