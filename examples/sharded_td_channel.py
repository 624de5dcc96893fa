"""Sample-axis sharding of the time-domain channel: one slot's waveform
split across the device mesh with a ppermute halo exchange.

When to shard SAMPLES instead of TRIALS (see SCALING.md):
  - trial-sharding (sim.sweep) is the default — embarrassingly parallel,
    zero collectives — and wins whenever you have >= numDevices independent
    trials in flight;
  - sample-sharding (ChannelBase.apply_to_signal_sharded) wins when ONE
    waveform is too long/latency-critical to filter on a single chip —
    long multi-slot captures, wideband numerologies, or a single real-time
    slot — because the FIR memory is tiny (coeffLen-1 samples), so each
    device convolves its block after one neighbor ppermute over ICI.

This example runs both paths on the same slot and checks they agree.

Run: python examples/sharded_td_channel.py  (8 virtual CPU devices)
     NR_TPU=1 ... on real chips.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# Examples default to CPU for fast startup; set NR_TPU=1 to run on TPU.
if not os.environ.get("NR_TPU"):
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import neoradium_tpu as nr


def main():
    carrier = nr.CarrierConfig(numRbs=51, spacing=30)
    chan = nr.CdlChannel(
        carrier, "C", delaySpread=300, carrierFreq=4e9, dopplerShift=5,
        txAntenna=nr.AntennaPanel((2, 2), polarization="x"),
        rxAntenna=nr.AntennaPanel((1, 1), polarization="x"))
    state = chan.init_state(jax.random.PRNGKey(0))

    ns = carrier.slotLen(0) + chan.getMaxDelay()
    nt = chan.nrNt[1]
    rng = np.random.default_rng(1)
    wf = jnp.asarray(rng.normal(size=(nt, ns))
                     + 1j * rng.normal(size=(nt, ns)))

    mesh = Mesh(np.array(jax.devices()), ("sample",))
    print(f"{len(jax.devices())} devices; slot of {ns} samples "
          f"-> {-(-ns // len(jax.devices()))} samples/device "
          f"(+{chan.coeffMatrix.shape[1] - 1}-sample halo)")

    mono = chan.apply_to_signal(wf, state, 0)
    shard = chan.apply_to_signal_sharded(wf, state, mesh, 0)
    err = float(jnp.abs(shard - mono).max() / jnp.abs(mono).max())
    print(f"sharded vs monolithic max rel err: {err:.2e}")
    assert err < 1e-5
    print("OK — sample-sharded TD channel matches the single-device path")


if __name__ == "__main__":
    main()
