"""SNR/noise conventions, time vs frequency domain (mirrors the reference's
Playground/Others/SnrCalculations.ipynb).

Demonstrates and NUMERICALLY VERIFIES the framework's noise scalings:

  time domain:  sigma_T = sqrt(nFFT * var(waveform) / (K * snr))
                (Waveform.noiseStdForSnr; MATLAB convention divides the
                measured per-RE power out of CP-stripped FFT windows)
  freq domain:  sigma_F = sqrt(var(grid) / snr)

and checks that after OFDM demodulation the measured per-RE SNR matches the
target in both conventions (the nFFT factor is exactly the FFT processing
gain).

Run: python examples/snr_calculations.py    (CPU; NR_TPU=1 for TPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if not os.environ.get("NR_TPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

import neoradium_tpu as nr
from neoradium_tpu.waveform import Waveform


def main():
    snrDb = 0.0
    snr = nr.toLinear(snrDb)
    carrier = nr.CarrierConfig(numRbs=52, spacing=30)
    ofdm = nr.OfdmContext(carrier)
    K, nFFT = carrier.numSubcarriers, carrier.nFFT
    rng = nr.PRNG(7)
    modem = nr.Modem("16QAM")

    L = carrier.symbolsPerSlot
    bits = rng.bits(4 * L * K)
    grid = modem.modulate(bits).reshape(1, L, K)

    # ---- time domain
    wf = Waveform(ofdm.modulate(grid, windowing=False))
    sigmaT = wf.noiseStdForSnr(snr, carrier)
    print(f"noise STD (time): {sigmaT:.6f}  "
          f"(= sqrt(nFFT*rePower/(snr)) with rePower measured)")
    noisy = wf.addNoise(rng.key(), noiseStd=sigmaT)
    rxGrid = ofdm.demodulate(noisy.waveform)
    noiseRe = rxGrid - grid
    measured = float(jnp.mean(jnp.abs(grid) ** 2)
                     / jnp.mean(jnp.abs(noiseRe) ** 2))
    print(f"  measured per-RE SNR after demod: {nr.toDb(measured):.2f} dB "
          f"(target {snrDb:.1f} dB)")
    assert abs(nr.toDb(measured) - snrDb) < 0.5

    # ---- frequency domain
    sigmaF = float(jnp.sqrt(jnp.var(grid) / snr))
    print(f"noise STD (freq): {sigmaF:.6f}  (= sqrt(var(grid)/snr))")
    rxGrid2 = grid + nr.PRNG.awgn_from_key(rng.key(), grid.shape, sigmaF)
    measured2 = float(jnp.mean(jnp.abs(grid) ** 2)
                      / jnp.mean(jnp.abs(rxGrid2 - grid) ** 2))
    print(f"  measured per-RE SNR: {nr.toDb(measured2):.2f} dB "
          f"(target {snrDb:.1f} dB)")
    assert abs(nr.toDb(measured2) - snrDb) < 0.5

    # ---- the nFFT relationship between the two
    # unitarity: the 1/nFFT ifft scaling makes var(waveform) =
    # K*var(grid)/nFFT^2, so sigma_T works out to exactly
    # sigma_F/sqrt(nFFT) — the FFT's processing gain concentrates the
    # time-domain noise into nFFT bins of which only K carry signal.
    print(f"\nsigma_T / sigma_F = {sigmaT / sigmaF:.5f} "
          f"= 1/sqrt(nFFT) = {1 / np.sqrt(nFFT):.5f} "
          f"(nFFT={nFFT}, K={K})")


if __name__ == "__main__":
    main()
