"""Time-domain waveform container + cross-correlation timing estimation.

The framework's primary compute path is plain arrays (OfdmContext and
channel methods consume/produce ``(..., P, Ns)`` tensors); ``Waveform`` is a
thin API-parity wrapper carrying the noise-variance bookkeeping of the
reference's stateful class (reference ``neoradium/waveform.py:24-341``):
addNoise with all four conventions (noise/noiseStd/noiseVar/snrDb with
MATLAB or measured-RX-power scaling), pad, sync.

``estimate_timing_offset`` is the reference's CSI-RS cross-correlation sync
(grid.py:592-624) as one batched FFT correlation.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .utils import toLinear
from .random import PRNG


class Waveform:
    """(P, Ns) complex time-domain signal + noiseVar bookkeeping."""

    def __init__(self, waveform, noiseVar=0.0):
        self.waveform = jnp.asarray(waveform)
        self.noiseVar = noiseVar

    @property
    def shape(self):
        return self.waveform.shape

    @property
    def numPorts(self):
        return self.waveform.shape[-2]

    def __getitem__(self, idx):
        return self.waveform[idx]

    def pad(self, numPad: int) -> "Waveform":
        """Append zeros (reference waveform.py:295-314)."""
        pads = [(0, 0)] * (self.waveform.ndim - 1) + [(0, int(numPad))]
        return Waveform(jnp.pad(self.waveform, pads), self.noiseVar)

    def sync(self, timingOffset) -> "Waveform":
        """Drop leading samples (reference waveform.py:317-341)."""
        return Waveform(self.waveform[..., timingOffset:], self.noiseVar)

    # ----------------------------------------------------------------- power
    def rePower(self, carrier) -> float:
        """Average RE power from CP-stripped FFT windows
        (reference waveform.py:107-117)."""
        from .ofdm import OfdmContext
        idx = OfdmContext(carrier).tables["demod_idx"]
        x = np.asarray(self.waveform)[..., idx]
        return float(x.var()) / carrier.numSubcarriers

    def noiseStdForSnr(self, snr: float, carrier) -> float:
        """sigma for a target linear SNR using measured power
        (reference waveform.py:120-142)."""
        return float(np.sqrt(self.rePower(carrier) * carrier.nFFT / snr))

    # ----------------------------------------------------------------- noise
    def addNoise(self, key=None, **kwargs) -> "Waveform":
        """All the reference conventions (waveform.py:145-292): pass one of
        ``noise`` (array), ``noiseStd``, ``noiseVar``, or ``snrDb`` (with
        optional carrier + useRxPower)."""
        if "noise" in kwargs:
            n = jnp.asarray(kwargs["noise"])
            return Waveform(self.waveform + n, float(jnp.var(n)))
        if "noiseStd" in kwargs:
            std = float(kwargs["noiseStd"])
        elif "noiseVar" in kwargs:
            std = float(np.sqrt(kwargs["noiseVar"]))
        elif "snrDb" in kwargs:
            snr = toLinear(kwargs["snrDb"])
            carrier = kwargs.get("carrier", kwargs.get("bwp"))
            if kwargs.get("useRxPower", False):
                std = self.noiseStdForSnr(snr, carrier)
            else:
                nFFT = carrier.nFFT if carrier is not None else 1
                std = float(1.0 / np.sqrt(snr * self.numPorts * nFFT))
        else:
            raise ValueError("Specify noise, noiseStd, noiseVar, or snrDb")
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(1 << 31))
        noise = PRNG.awgn_from_key(key, self.waveform.shape, std)
        return Waveform(self.waveform + noise, std ** 2)


def estimate_timing_offset(refWaveform, rxWaveform) -> jnp.ndarray:
    """Timing offset via cross-correlation against a reference waveform
    (e.g. the OFDM-modulated CSI-RS-only grid) — reference grid.py:592-624.

    Args:
      refWaveform: (P, n) known reference signal.
      rxWaveform: (R, N) received signal, N >= n.

    Returns argmax over lags in [0, N) of the summed |xcorr|.
    """
    ref = jnp.asarray(refWaveform)
    rx = jnp.asarray(rxWaveform)
    n = rx.shape[-1]
    m = ref.shape[-1]
    size = int(2 ** np.ceil(np.log2(n + m)))
    R = jnp.fft.fft(rx, size, axis=-1)
    S = jnp.fft.fft(ref, size, axis=-1)
    # full cross-correlation of every (rx, port) pair, lags >= 0
    xc = jnp.fft.ifft(R[:, None, :] * jnp.conj(S)[None, :, :], axis=-1)
    mags = jnp.abs(xc[..., :n]).sum(axis=(0, 1))
    return jnp.argmax(mags)
