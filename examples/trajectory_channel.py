"""Ray-tracing trajectory channel (mirrors reference
Playground/RayTracing/TrajEndToEnd.ipynb; SURVEY.md §3.5).

Builds a synthetic scenario grid (use DeepMimoData("scenario_name") with
downloaded DeepMIMO files for real scenarios), draws a random per-slot
trajectory, and runs the deterministic TrjChannel along it.

Run: python examples/trajectory_channel.py
"""
import numpy as np
import jax

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# Examples default to CPU for fast startup; set NR_TPU=1 to run on TPU.
if not os.environ.get("NR_TPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import neoradium_tpu as nr


def synthetic_scenario(nx=30, ny=20, delta=0.5):
    bs = np.array([4.0, 4.0, 15.0])
    pts = []
    for iy in range(ny):
        for ix in range(nx):
            xyz = np.array([ix * delta, iy * delta, 1.5])
            t = np.arange(4)
            pi = np.zeros((4, 8))
            pi[:, 0] = 20 * np.sin(0.1 * ix + t)
            pi[:, 1] = 100 + 8 * t + 0.4 * ix
            pi[:, 2] = -4 - 3 * t - 0.02 * iy
            pi[:, 3] = 40 + 4 * t + 0.3 * ix
            pi[:, 4] = 85 + t
            pi[:, 5] = -30 + 6 * t
            pi[:, 6] = 92 + t
            pi[:, 7] = -1
            pi[0, 7] = 0
            pts.append(nr.TrjPoint(xyz, 1, pi,
                                   np.sqrt(np.square(bs - xyz).sum())))
    return nr.DeepMimoData.fromPoints(pts, 3.5e9, bs, (nx, ny),
                                      np.array([delta, delta]))


def main():
    dmd = synthetic_scenario()
    carrier = nr.CarrierConfig(numRbs=12, spacing=30)
    traj = dmd.getRandomTrajectory(
        np.array([[0.0, 0.0], [14.0, 9.0]]), segLen=2, carrier=carrier,
        trajLen=20, speedMps=8.0, rng=np.random.default_rng(7))
    print(f"trajectory: {traj.numPoints} per-slot points, "
          f"{traj.totalDist:.1f} m, {traj.time*1e3:.1f} ms")

    chan = nr.TrjChannel(carrier, traj,
                         txAntenna=nr.AntennaPanel((2, 2), polarization="x"),
                         rxAntenna=nr.AntennaPanel((1, 1), polarization="x"))
    hs = [np.asarray(chan.channel_matrix(slotNo=s)) for s in range(5)]
    h0, h1 = hs[0], hs[1]
    corr = np.abs(np.vdot(h0, h1)) / (np.linalg.norm(h0) * np.linalg.norm(h1))
    print(f"channel {h0.shape}; slot-to-slot correlation {corr:.4f}")

    seqs = list(chan.chan_seq_gen(seqLen=4, maxNumSeq=2))
    print(f"{len(seqs)} channel sequences of shape {seqs[0].shape}")


if __name__ == "__main__":
    main()
