"""OFDM modulation / demodulation — TS 38.211 §5.3.1, §5.4.

TPU design: all the ragged cyclic-prefix bookkeeping (per-symbol CP lengths,
mid-CP FFT start, overlap windowing) is reduced to *static gather/scatter
index arrays* computed host-side per (carrier, slot-in-subframe) pattern.
The jitted path is: pad -> ifftshift -> batched IFFT -> one flat gather
(+ windowed scatter-add) for modulation, and one flat gather -> batched FFT ->
fftshift -> center-K slice for demodulation. Batched over arbitrary leading
axes (trials, ports).

Behavioral parity: reference ``neoradium/grid.py:521-582`` (ofdmModulate,
including TS 38.104 B.5.2/C.5.2 "STD" windowing via waveform.py:380-470) and
``neoradium/waveform.py:473-527`` (ofdmDemodulate with cpOffsetRatio=0.5 and
f0 phase de-rotation).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from .carrier import CarrierConfig


def _std_window_len(cpLen: int, cpType: str) -> int:
    """TS 38.101-1/-2 F.5 window size for one symbol's CP length."""
    if cpType == "normal":
        return (cpLen + 1) // 2
    table = {64: 54, 96: 80, 128: 106, 192: 164}
    return table.get(cpLen, int(round(cpLen * 0.859)))


@lru_cache(maxsize=64)
def _build_context(carrier: CarrierConfig, slotNoInSubFrame: int, numSlots: int):
    L = carrier.symbolsPerSlot * numSlots
    l0 = (slotNoInSubFrame % carrier.slotsPerSubFrame) * carrier.symbolsPerSlot
    if l0 + L > carrier.symbolsPerSubFrame:
        raise ValueError("Cannot modulate across a subframe boundary")
    nFFT = carrier.nFFT
    symLens = carrier.symbolLensSubframe[l0:l0 + L].astype(np.int64)
    cpLens = symLens - nFFT
    Ns = int(symLens.sum())
    symStarts = np.concatenate([[0], np.cumsum(symLens[:-1])])

    # ---- modulation gather: out[s] = ifft[l(s), (t(s) - cpLen[l]) % nFFT]
    sym_of_sample = np.repeat(np.arange(L), symLens)
    t_in_sym = np.arange(Ns) - symStarts[sym_of_sample]
    mod_idx = (sym_of_sample * nFFT + (t_in_sym - cpLens[sym_of_sample]) % nFFT).astype(np.int32)

    # ---- windowing (overlap raised-cosine, common window length = min over symbols)
    winLen = int(min(_std_window_len(int(c), carrier.cpType) for c in cpLens))
    extLen = int(symLens.max()) + winLen
    # ext symbol l, position j (0<=j<symLen_l+winLen): ifft[l, (j - winLen - cpLen_l) % nFFT]
    j = np.arange(extLen)
    win_src = (np.arange(L)[:, None] * nFFT
               + (j[None, :] - winLen - cpLens[:, None]) % nFFT).astype(np.int32)
    # window coefficients: ramp up over first winLen, ramp down over last winLen of each ext
    ramp = 0.5 * (1 - np.sin(np.pi * np.arange(winLen - 1, -winLen, -2) / (2 * winLen)))
    wcoef = np.ones((L, extLen))
    for l in range(L):
        n = int(symLens[l]) + winLen
        wcoef[l, :winLen] = ramp
        wcoef[l, n - winLen:n] = ramp[::-1]
        wcoef[l, n:] = 0.0
    # scatter target (circular over the slot): ext_l[j] adds at (symStart_l - winLen + j) mod Ns
    win_dst = ((symStarts[:, None] - winLen + j[None, :]) % Ns).astype(np.int32)

    # ---- demodulation gather: mid-CP FFT start with cyclic unrotation
    fftStarts = np.round(cpLens * 0.5).astype(np.int64)
    k = np.arange(nFFT)
    demod_idx = ((cpLens[:, None] - fftStarts[:, None] + k[None, :]) % nFFT
                 + fftStarts[:, None] + symStarts[:, None]).astype(np.int32)

    K = carrier.numSubcarriers
    padlo, padhi = (nFFT - K + 1) // 2, (nFFT - K) // 2
    k0 = nFFT // 2 - K // 2

    # phase factors for up/down conversion (per TS 38.211 §5.4 phase compensation)
    n0 = int(carrier.symbolLensSubframe[:l0].sum())
    startIdx = np.cumsum(np.concatenate([[n0], symLens[:-1]]))
    return dict(
        L=L, nFFT=nFFT, K=K, Ns=int(Ns), padlo=int(padlo), padhi=int(padhi), k0=int(k0),
        winLen=winLen, symLens=symLens, cpLens=cpLens, symStarts=symStarts,
        mod_idx=mod_idx, win_src=win_src, wcoef=wcoef.astype(np.float32), win_dst=win_dst,
        demod_idx=demod_idx,
        mod_phase_t=(-startIdx - cpLens) / carrier.sampleRate,   # multiply exp(2j pi f0 *)
        demod_phase_t=(symStarts + cpLens) / carrier.sampleRate,
    )


@dataclass(frozen=True)
class OfdmContext:
    """Precomputed OFDM index tables for one slot pattern of a carrier."""

    carrier: CarrierConfig
    slotNoInSubFrame: int = 0
    numSlots: int = 1

    @property
    def tables(self):
        return _build_context(self.carrier, self.slotNoInSubFrame, self.numSlots)

    @property
    def numSamples(self) -> int:
        return self.tables["Ns"]

    # ---------------------------------------------------------------- TX
    def modulate(self, grid: jnp.ndarray, f0: float = 0.0, windowing: bool = True) -> jnp.ndarray:
        """grid (..., L, K) complex -> waveform (..., Ns) complex64."""
        t = self.tables
        x = jnp.pad(grid, [(0, 0)] * (grid.ndim - 1) + [(t["padlo"], t["padhi"])])
        x = jnp.fft.ifftshift(x, axes=-1)
        x = jnp.fft.ifft(x, axis=-1).astype(jnp.complex64)       # (..., L, nFFT)
        flat = x.reshape(x.shape[:-2] + (t["L"] * t["nFFT"],))

        if f0 > 0:
            ph = jnp.exp(2j * jnp.pi * f0 * jnp.asarray(t["mod_phase_t"])).astype(jnp.complex64)
            flat = (x * ph[:, None]).reshape(flat.shape)

        if not windowing or t["winLen"] == 0:
            return flat[..., jnp.asarray(t["mod_idx"])]

        # windowed overlap-add
        src = flat[..., jnp.asarray(t["win_src"].reshape(-1))]
        src = src * jnp.asarray(t["wcoef"].reshape(-1))
        out = jnp.zeros(flat.shape[:-1] + (t["Ns"],), dtype=jnp.complex64)
        return out.at[..., jnp.asarray(t["win_dst"].reshape(-1))].add(src)

    # ---------------------------------------------------------------- RX
    def demodulate(self, waveform: jnp.ndarray, f0: float = 0.0) -> jnp.ndarray:
        """waveform (..., >=Ns) complex -> grid (..., L, K) complex64."""
        t = self.tables
        fft_in = waveform[..., jnp.asarray(t["demod_idx"])]       # (..., L, nFFT)
        g = jnp.fft.fft(fft_in, axis=-1)
        g = jnp.fft.fftshift(g, axes=-1)
        g = g[..., t["k0"]:t["k0"] + t["K"]].astype(jnp.complex64)
        if f0 > 0:
            ph = jnp.exp(2j * jnp.pi * f0 * jnp.asarray(t["demod_phase_t"])).astype(jnp.complex64)
            g = g * ph[:, None]
        return g
