"""Multi-chip readiness benchmark: the EXACT headline config per device.

One command that cashes BASELINE.md's multi-host scaling target the day a
real TPU slice is available, and validates end-to-end TODAY on a virtual
CPU mesh:

    # real slice (e.g. a v5e-8): run as-is, mesh auto-sized to the devices
    python tools/bench_multichip.py --mesh 1x8 --trials-per-device 1536

    # virtual 8-device CPU mesh (what CI/this machine can do)
    python tools/bench_multichip.py --cpu 8 --mesh 2x4 --trials-per-device 8

Runs the headline PDSCH pipeline (51 PRB, 30 kHz, 2x(4x2) CDL-C, 16QAM,
R=490/1024, LS+MMSE, bf16 decoder — identical to bench.py) through
``sim.sweep.run_bler_grid`` on an (snr x trial) mesh: trial keys shard
over 'trial', SNR points over 'snr', counters all-reduce over ICI. Prints
one JSON line per run:

  total slots/s, per-device slots/s, efficiency vs the single-device run
  of the SAME script (measured when --baseline is given or devices==1),
  and the per-device partitioned-executable GFLOPs from XLA cost analysis
  (shows the work partitions ~1/n even where shared-core virtual devices
  can't show wall-clock speedup).

Expected single-chip v5e reference point: the sharded-grid path
sustains 9.0-9.7k slots/s on the one tunneled chip (bench.py's direct
pipeline: ~17.2k); a b-device slice at >=85% efficiency (BASELINE.md
row 6) should therefore print >= 0.85 * 9000 * b total slots/s with
--trials-per-device 1536 (see SCALING.md).

NOTE (CPU runs): virtual devices SHARE physical cores, so wall-clock
efficiency on --cpu meshes measures sharding overhead only; the GFLOPs
column is the partitioning evidence (see SCALING.md).
"""
import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default=None,
                    help="SNRxTRIAL device grid, e.g. 2x4 (default 1xN)")
    ap.add_argument("--trials-per-device", type=int, default=8)
    ap.add_argument("--snr-points-per-device", type=int, default=2,
                    help="SNR points per snr-axis device")
    ap.add_argument("--cpu", type=int, default=0,
                    help="force N virtual CPU devices (0 = real backend)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--baseline", type=float, default=None,
                    help="single-device slots/s for the efficiency column "
                         "(default: measured here when devices == 1)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count={args.cpu}")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from neoradium_tpu.carrier import CarrierConfig
    from neoradium_tpu.channels.antenna import AntennaPanel
    from neoradium_tpu.channels.cdl import CdlChannel
    from neoradium_tpu.sim.link import PdschLinkSim
    from neoradium_tpu.sim.sweep import build_grid_fn

    devs = jax.devices()
    if args.mesh:
        nS, nT = (int(x) for x in args.mesh.lower().split("x"))
    else:
        nS, nT = 1, len(devs)
    nDev = nS * nT
    if nDev > len(devs):
        raise SystemExit(f"mesh {nS}x{nT} needs {nDev} devices, "
                         f"have {len(devs)}")
    mesh = Mesh(np.asarray(devs[:nDev]).reshape(nS, nT), ("snr", "trial"))

    car = CarrierConfig(numRbs=51, spacing=30)
    chan = CdlChannel(car, "C", delaySpread=300, carrierFreq=4e9,
                      dopplerShift=5,
                      txAntenna=AntennaPanel((2, 2), polarization="x"),
                      rxAntenna=AntennaPanel((1, 1), polarization="x"))
    sim = PdschLinkSim(car, pdschKw=dict(numLayers=2, modulation="16QAM"),
                       dmrsKw=dict(configType=2, additionalPos=2),
                       codeRate=490 / 1024, domain="freq", channelModel=chan,
                       chEst="ls", decoderIter=2, decoderDtype="bfloat16")
    trial_fn = sim.make_trial_fn()

    nSnr = nS * args.snr_points_per_device
    numTrials = nT * args.trials_per_device
    snrs = list(np.linspace(2.0, 8.0, nSnr))
    gridj, keys, snrArr = build_grid_fn(trial_fn, snrs, numTrials, 7, mesh)

    # per-device compiled FLOPs of the partitioned executable
    gflops = None
    try:
        cost = gridj.lower(keys, snrArr).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        gflops = round(float(cost.get("flops", 0.0)) / 1e9, 2)
    except Exception:
        pass

    out = gridj(keys, snrArr)
    jax.block_until_ready(out)               # compile + warm
    # sustained throughput: pipeline async dispatches and sync once, as
    # bench.py does — the tunnel round-trip amortizes over the window
    pipeline = 4
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        outs = [gridj(keys, snrArr) for _ in range(pipeline)]
        for out in outs:
            sum(int(np.asarray(v).sum()) for v in out.values())
        times.append(time.perf_counter() - t0)
    dt = min(times) / pipeline
    totalSlots = nSnr * numTrials
    slots_s = totalSlots / dt

    base = args.baseline
    if base is None and nDev == 1:
        base = slots_s
    eff = (slots_s / (base * nDev)) if base else None
    blocks = np.asarray(out["blocks"]).sum()
    blerOk = bool(blocks == totalSlots)      # structural counter sanity
    print(json.dumps(dict(
        metric="multichip_pdsch_slots_per_s", value=round(slots_s, 1),
        unit="slots/s", mesh=f"{nS}x{nT}", devices=nDev,
        backend=jax.default_backend(),
        per_device=round(slots_s / nDev, 1),
        snr_points=nSnr, trials=numTrials,
        efficiency=None if eff is None else round(eff, 3),
        gflops_per_device=gflops, counters_ok=blerOk)))


if __name__ == "__main__":
    main()
