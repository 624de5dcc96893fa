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

    @property
    def length(self):
        """Samples per port (reference waveform.py ``length``)."""
        return self.waveform.shape[-1]

    def __getitem__(self, idx):
        return self.waveform[idx]

    def pad(self, numPad: int) -> "Waveform":
        """Append zeros (reference waveform.py:295-314)."""
        pads = [(0, 0)] * (self.waveform.ndim - 1) + [(0, int(numPad))]
        return Waveform(jnp.pad(self.waveform, pads), self.noiseVar)

    def sync(self, timingOffset) -> "Waveform":
        """Drop leading samples (reference waveform.py:317-341)."""
        return Waveform(self.waveform[..., timingOffset:], self.noiseVar)

    # ------------------------------------------------------------- windowing
    def applyWindowing(self, cpLens, windowing, carrier) -> "Waveform":
        """Overlap raised-cosine windowing of an externally supplied OFDM
        waveform (reference waveform.py:380-470). The window length comes
        from ``windowing``:

        - ``"STD"``: TS 38.101-1/-2 F.5 table sizes per CP length, min over
          symbols (reference getWindowingSize, waveform.py:366-377);
        - ``"%25"``: percentage of the minimum CP length;
        - ``"0.125"``: ratio (must contain a '.') of the minimum CP length;
        - ``"164"``: explicit window length in samples.

        ``cpLens`` is the per-symbol CP length list (samples) and ``carrier``
        supplies nFFT/cpType (the reference's bwp argument). The waveform
        must hold exactly the symbols described by cpLens (Ns = sum(cpLens)
        + len(cpLens)*nFFT); length is preserved (the first window wraps
        circularly, matching the reference's final np.roll).

        ``OfdmContext.modulate(windowing=True)`` applies the same windowing
        fused into modulation; this standalone method exists for waveforms
        produced elsewhere. Host-computed static gather/scatter tables, one
        device scatter-add — no per-symbol device loop."""
        from .ofdm import _std_window_len

        cpLens = [int(c) for c in cpLens]
        nFFT = carrier.nFFT
        windowing = str(windowing)
        if "%" in windowing:
            ratio = float(windowing.replace("%", "")) / 100.0
            winLen = min(int(0.5 + ratio * c) for c in cpLens)
        elif "." in windowing:
            ratio = float(windowing)
            if not 0 <= ratio <= 1:
                raise ValueError("The windowing ratio must be between 0 and 1")
            winLen = min(int(0.5 + ratio * c) for c in cpLens)
        elif windowing.upper() == "STD":
            winLen = min(_std_window_len(c, carrier.cpType) for c in cpLens)
        else:
            winLen = int(windowing)
            if winLen >= min(cpLens):
                raise ValueError("The windowing size must be smaller than CP size")

        symLens = np.asarray(cpLens, np.int64) + nFFT
        Ns = int(symLens.sum())
        if self.waveform.shape[-1] != Ns:
            raise ValueError(f"waveform length {self.waveform.shape[-1]} != "
                             f"sum of symbol lengths {Ns}")
        if winLen == 0:
            return Waveform(self.waveform, self.noiseVar)
        symStarts = np.concatenate([[0], np.cumsum(symLens[:-1])])

        # extended symbol l, position j in [0, symLen_l + winLen): source
        # sample (within the input waveform) and raised-cosine coefficient.
        # j < winLen prepends the samples at symbol positions
        # [nFFT-winLen, nFFT) — the body samples cyclically preceding the
        # CP content — then the up-ramp hits the prepended part and the
        # down-ramp the symbol tail; ext_l lands at symStart_l - winLen + j
        # (circularly), which folds in the reference's final roll.
        ramp = 0.5 * (1 - np.sin(np.pi * np.arange(winLen - 1, -winLen, -2)
                                 / (2 * winLen)))
        srcs, dsts, coefs = [], [], []
        for l, sl in enumerate(map(int, symLens)):
            j = np.arange(sl + winLen)
            src = symStarts[l] + np.where(j < winLen, nFFT - winLen + j,
                                          j - winLen)
            w = np.ones(sl + winLen)
            w[:winLen] = ramp
            w[-winLen:] = ramp[::-1]
            srcs.append(src)
            dsts.append((symStarts[l] - winLen + j) % Ns)
            coefs.append(w)
        src = jnp.asarray(np.concatenate(srcs).astype(np.int32))
        dst = jnp.asarray(np.concatenate(dsts).astype(np.int32))
        coef = jnp.asarray(np.concatenate(coefs),
                           self.waveform.real.dtype)
        ext = self.waveform[..., src] * coef
        out = jnp.zeros_like(self.waveform).at[..., dst].add(ext)
        return Waveform(out, self.noiseVar)

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
