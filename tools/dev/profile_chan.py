"""Sub-stage profile of the 'chan' stage of the headline bench (see
profile_variants.py — same cumulative-variant methodology, floor cancels).

Usage: python tools/dev/profile_chan.py [batch=1536]
"""
import sys
import time

sys.path.insert(0, ".")

STAGES = ["tx", "state", "cirs", "Heff", "apply", "noise"]


def main():
    import jax
    import jax.numpy as jnp
    from neoradium_tpu.carrier import CarrierConfig
    from neoradium_tpu.channels.antenna import AntennaPanel
    from neoradium_tpu.channels.cdl import CdlChannel
    from neoradium_tpu.sim.link import PdschLinkSim
    from neoradium_tpu.sim.sweep import make_trial_keys
    from neoradium_tpu.grid import precode, apply_channel_freq
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

    def csum(x):
        return jnp.sum(jnp.abs(x.astype(jnp.complex64 if jnp.iscomplexobj(x)
                                        else jnp.float32)) ** 2)

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
                return csum(grid)
            state = chan.init_state(kChan)
            if cut == 1:
                return csum(grid) + sum(csum(l) for l in
                                        jax.tree_util.tree_leaves(state))
            c = chan.slot_cirs(state, 0)
            if cut == 2:
                return csum(grid) + csum(c)
            F = sim.pdsch.precoder_from_mean(chan.mean_channel(state, 0))
            Heff = chan.effective_channel_matrix(state, 0, F)
            if cut == 3:
                return csum(grid) + csum(Heff)
            rxGrid0 = apply_channel_freq(grid, Heff)
            if cut == 4:
                return csum(rxGrid0)
            x = rxGrid0.reshape(-1)
            sigma = jnp.sqrt(jnp.var(x) / snr)
            rxGrid = rxGrid0 + PRNG.awgn_from_key(
                kNoise, rxGrid0.shape, 1.0) * sigma.astype(jnp.float32)
            return csum(rxGrid)

        return jax.jit(jax.vmap(one, in_axes=(0, None)))

    keys = make_trial_keys(7, batch)
    snr = jnp.float32(6.0)

    if "--cost" in sys.argv:
        # XLA cost-analysis deltas: bytes/FLOPs attribution per sub-stage
        # (compile-only; the persistent cache makes re-lowering cheap)
        prevB = prevF = 0.0
        for st in STAGES:
            cost = upto(st).lower(keys, snr).compile().cost_analysis()
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            b, f = float(cost.get("bytes accessed", 0)), float(cost.get("flops", 0))
            print(f"  {st:8s}: +{(b - prevB)/batch/1e6:8.2f} MB/slot  "
                  f"+{(f - prevF)/batch/1e6:8.1f} MFLOP/slot")
            prevB, prevF = b, f
        return

    times = {}
    for st in STAGES:
        fn = upto(st)
        float(fn(keys, snr).sum())
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(fn(keys, snr).sum())
            ts.append(time.perf_counter() - t0)
        times[st] = min(ts)
        print(f"up to {st:8s}: {times[st]*1e3:8.1f} ms", flush=True)

    print(f"\nbatch {batch}; deltas:")
    prev = 0.0
    for st in STAGES:
        print(f"  {st:8s}: {(times[st]-prev)*1e3:8.1f} ms")
        prev = times[st]


if __name__ == "__main__":
    main()
