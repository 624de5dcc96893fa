"""Micro-profile the headline-bench substages on TPU.

Each stage is wrapped in a jitted lax.scan that repeats it REPS times on the
same data, beating the ~25 ms axon dispatch floor (CLAUDE.md timing lore);
reported time = total/REPS. Usage: python tools/dev/profile_micro.py [batch]
"""
import sys
import time

sys.path.insert(0, ".")

REPS = 10


def timed(name, fn, *args):
    import jax
    out = jax.block_until_ready(fn(*args))   # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / REPS
    print(f"{name:26s}: {dt*1e3:8.2f} ms/call")
    return dt


def repeat(fn):
    """fn(x)->y  =>  jitted scan of REPS calls, returns checksum."""
    import jax
    import jax.numpy as jnp

    def rep(*args):
        def body(c, _):
            o = fn(*args)
            leaves = jax.tree_util.tree_leaves(o)
            s = sum(jnp.sum(jnp.abs(l).astype(jnp.float32)) for l in leaves)
            return c + s, ()
        tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return tot
    return jax.jit(rep)


def main():
    import jax
    import jax.numpy as jnp
    from neoradium_tpu.carrier import CarrierConfig
    from neoradium_tpu.channels.antenna import AntennaPanel
    from neoradium_tpu.channels.cdl import CdlChannel
    from neoradium_tpu.sim.link import PdschLinkSim
    from neoradium_tpu.rx.equalize import mmse_equalize
    from neoradium_tpu.grid import precode, apply_channel_freq

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    car = CarrierConfig(numRbs=51, spacing=30)
    chan = CdlChannel(car, "C", delaySpread=300, carrierFreq=4e9, dopplerShift=5,
                      txAntenna=AntennaPanel((2, 2), polarization="x"),
                      rxAntenna=AntennaPanel((1, 1), polarization="x"))
    sim = PdschLinkSim(
        car, pdschKw=dict(numLayers=2, modulation="16QAM"),
        dmrsKw=dict(configType=2, additionalPos=2),
        codeRate=490 / 1024, domain="freq",
        channelModel=chan, chEst="ls", decoderIter=2)
    L, K = car.symbolsPerSlot, car.numSubcarriers
    nr, nt, nl = 2, 8, 2
    keys = jax.random.split(jax.random.PRNGKey(0), batch)

    # representative tensors
    kChan = jax.random.split(jax.random.PRNGKey(1), batch)
    state = jax.vmap(chan.init_state)(kChan)
    H = jax.block_until_ready(jax.jit(jax.vmap(
        lambda s: chan.channel_matrix(s, 0)))(state))
    rxGrid = jax.random.normal(jax.random.PRNGKey(2), (batch, nr, L, K),
                               jnp.complex64)
    payload = jax.random.bernoulli(
        jax.random.PRNGKey(3), 0.5, (batch, sim.tbs[0])).astype(jnp.int8)
    G = sim.plan.bitSizes[0]
    llrs = jax.random.normal(jax.random.PRNGKey(4), (batch, G), jnp.float32)

    timed("payload bits", repeat(
        lambda ks: jax.vmap(lambda k: jax.random.bernoulli(
            k, 0.5, (sim.tbs[0],)).astype(jnp.int8))(ks)), keys)
    timed("AWGN full grid", repeat(
        lambda ks: jax.vmap(lambda k: jax.random.normal(
            k, (nr, L, K), jnp.complex64))(ks)), keys)
    timed("chan init_state", repeat(
        lambda ks: jax.vmap(chan.init_state)(ks)), kChan)
    timed("channel_matrix", repeat(
        lambda s: jax.vmap(lambda x: chan.channel_matrix(x, 0))(s)), state)
    timed("SVD precoder", repeat(
        lambda h: jax.vmap(sim.pdsch.precoding_matrix_traced)(h)), H)
    timed("LDPC encode_tb", repeat(
        lambda p: jax.vmap(sim.ldpc[0][0].encode_tb)(p)), payload)
    grid = jax.block_until_ready(jax.jit(jax.vmap(sim.plan.populate))(
        jax.vmap(sim.ldpc[0][0].encode_tb)(payload)))
    timed("plan.populate", repeat(
        lambda b: jax.vmap(sim.plan.populate)(b)),
        jax.vmap(sim.ldpc[0][0].encode_tb)(payload))
    F = jax.block_until_ready(jax.jit(jax.vmap(
        sim.pdsch.precoding_matrix_traced))(H))
    timed("precode+applyChan", repeat(
        lambda g, f, h: jax.vmap(apply_channel_freq)(
            jax.vmap(precode)(g, f), h)), grid, F, H)
    timed("LS chest", repeat(
        lambda g: jax.vmap(sim.estimator.estimate)(g)), rxGrid)
    hEff = jax.block_until_ready(jax.jit(jax.vmap(
        lambda g: sim.estimator.estimate(g)[0]))(rxGrid))
    timed("MMSE equalize", repeat(
        lambda g, h: jax.vmap(lambda a, b: mmse_equalize(a, b, 0.01))(g, h)),
        rxGrid, hEff)
    eq = jax.block_until_ready(jax.jit(jax.vmap(
        lambda g, h: mmse_equalize(g, h, 0.01)[0]))(rxGrid, hEff))
    timed("extract_llrs", repeat(
        lambda e: jax.vmap(lambda x: sim.plan.extract_llrs(x, None, 0.01)[0])(e)),
        eq)
    timed("recover_rate", repeat(
        lambda l: jax.vmap(lambda x: sim.ldpc[0][1].recover_rate(x)[0])(l)), llrs)
    timed("decode 5it+CRC", repeat(
        lambda r: jax.vmap(lambda x: sim.ldpc[0][1].decode_tb(x, numIter=5)[0])(r)),
        llrs)


if __name__ == "__main__":
    main()
