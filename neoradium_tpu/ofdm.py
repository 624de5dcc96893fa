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
import jax
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

    # ---- windowing (overlap raised-cosine, common window length = min over
    # symbols); raised-cosine up-ramp (down-ramp is its reverse)
    winLen = int(min(_std_window_len(int(c), carrier.cpType) for c in cpLens))
    ramp = 0.5 * (1 - np.sin(np.pi * np.arange(winLen - 1, -winLen, -2)
                             / (2 * winLen))) if winLen else np.zeros(0)

    # ---- demodulation: mid-CP FFT start with cyclic unrotation. The
    # per-symbol (slice start, left-rotation) pairs drive the slice-based
    # demodulate; the flat gather index table is kept for the RX-power
    # measurement paths (sim/link.py, waveform.py:rePower).
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
        winLen=winLen, ramp=ramp.astype(np.float32),
        symLens=symLens, cpLens=cpLens, symStarts=symStarts,
        fftStarts=fftStarts, demod_idx=demod_idx,
        mod_phase_t=(-startIdx - cpLens) / carrier.sampleRate,   # multiply exp(2j pi f0 *)
        demod_phase_t=(symStarts + cpLens) / carrier.sampleRate,
    )


@lru_cache(maxsize=16)
def _mxu_dft_tables(nFFT: int):
    """Split-radix DFT-as-matmul tables: nFFT = A*B with A a single
    MXU-sized DFT stage (>=128) and B <= 8 unrolled combine planes."""
    A = nFFT if nFFT <= 128 else max(128, nFFT // 8)
    B = nFFT // A
    if A * B != nFFT:
        return None
    FA = np.exp(-2j * np.pi * np.outer(np.arange(A), np.arange(A)) / A)
    WN = np.exp(-2j * np.pi * np.outer(np.arange(B), np.arange(A)) / nFFT)
    WB = np.exp(-2j * np.pi * np.outer(np.arange(B), np.arange(B)) / B)
    return (A, B, FA.real.astype(np.float32), FA.imag.astype(np.float32),
            WN.astype(np.complex64), WB.astype(np.complex64))


def _mxu_fft(x: jnp.ndarray, nFFT: int, inverse: bool) -> jnp.ndarray:
    """FFT along the last axis as MXU matmuls (TPU fast path).

    Cooley-Tukey with one radix-A stage: n = B*a + b, k = A*c + d gives
    X[A*c+d] = sum_b W_N^{bd} W_B^{bc} (DFT_A over a of x[B*a+b]) — the
    DFT_A runs as two real (A x A) einsums on the MXU (f32,
    precision='highest') and the B <= 8 combine terms are unrolled
    elementwise planes. ~3e-7 relative vs the reference FFT (f32 dot
    rounding; measured per size), NOT bit-identical — kept off the CPU
    parity path by fftImpl='auto'.

    Measured 2026-08-21 on v5e over the axon tunnel (batch 1024 x 2 x 14,
    nFFT 1024, 8 chained passes): XLA fft 14.0 ms/pass, this path at
    precision='highest' 17.8 ms/pass — SLOWER, because 'highest' f32
    matmuls emulate via 6 bf16 passes. The win would come from
    precision='high'/'default' (3/1 passes, still ~1e-5 accurate per the
    error model), but those dot variants return backend UNIMPLEMENTED
    over the current axon tunnel, so they cannot be validated here.
    'auto' therefore resolves to the XLA FFT everywhere until real chips
    allow measuring the reduced-precision variants; 'mxu' stays as the
    opt-in experiment.

    The inverse uses ifft(x) = conj(fft(conj(x)))/N.
    """
    t = _mxu_dft_tables(nFFT)
    A, B, FAr, FAi, WN, WB = t
    if inverse:
        x = jnp.conj(x)
    lead = x.shape[:-1]
    xr = x.reshape(lead + (A, B))
    re, im = jnp.real(xr), jnp.imag(xr)
    kw = dict(precision="highest")
    FAr, FAi = jnp.asarray(FAr), jnp.asarray(FAi)
    Yr = (jnp.einsum("da,...ab->...db", FAr, re, **kw)
          - jnp.einsum("da,...ab->...db", FAi, im, **kw))
    Yi = (jnp.einsum("da,...ab->...db", FAr, im, **kw)
          + jnp.einsum("da,...ab->...db", FAi, re, **kw))
    Y = (Yr + 1j * Yi).astype(jnp.complex64)
    planes = [Y[..., :, b] * jnp.asarray(WN[b]) for b in range(B)]
    outs = []
    for c in range(B):
        acc = planes[0] * WB[0, c]
        for b in range(1, B):
            acc = acc + planes[b] * WB[b, c]
        outs.append(acc)
    out = jnp.stack(outs, axis=-2).reshape(lead + (nFFT,))
    if inverse:
        out = jnp.conj(out) / nFFT
    return out.astype(jnp.complex64)


def _use_mxu_fft(fftImpl: str, nFFT: int) -> bool:
    if fftImpl == "xla":
        return False
    if _mxu_dft_tables(nFFT) is None:
        return False
    # 'auto' -> XLA everywhere for now: the only matmul precision the
    # axon tunnel can run ('highest') measured slower than the XLA FFT;
    # see _mxu_fft's measurement note.
    return fftImpl == "mxu"


@dataclass(frozen=True)
class OfdmContext:
    """Precomputed OFDM index tables for one slot pattern of a carrier.

    fftImpl: 'auto' (MXU matmul-DFT on TPU, XLA FFT elsewhere — the CPU
    parity suites stay bit-exact), 'mxu', or 'xla'.
    """

    carrier: CarrierConfig
    slotNoInSubFrame: int = 0
    numSlots: int = 1
    fftImpl: str = "auto"

    @property
    def tables(self):
        return _build_context(self.carrier, self.slotNoInSubFrame, self.numSlots)

    @property
    def numSamples(self) -> int:
        return self.tables["Ns"]

    # ---------------------------------------------------------------- TX
    def modulate(self, grid: jnp.ndarray, f0: float = 0.0, windowing: bool = True) -> jnp.ndarray:
        """grid (..., L, K) complex -> waveform (..., Ns) complex64.

        SLICE-BASED CP insertion: the waveform is a static concat of
        per-symbol [CP slice, body] views of the ifft output — no device
        gather (a 15360-wide gather was 35% of the mod+demod roundtrip on
        TPU; the concat form measured 21.1 -> 13.7+epsilon ms/pass at batch
        1024 together with the demod slicing). Windowing reduces to the
        winLen-wide boundary region before each symbol start (circularly):
        everywhere else exactly one overlap-add contribution has weight 1,
        so the region is rampDown*(previous body tail) + rampUp*(cyclic
        pre-extension of the next symbol) and the rest is the plain CP
        waveform — same values as the reference's full overlap-add
        (waveform.py:437-470), symbol 0's wrap landing at the slot end
        (its final np.roll)."""
        t = self.tables
        L, nFFT, winLen = t["L"], t["nFFT"], t["winLen"]
        cpLens = [int(c) for c in t["cpLens"]]
        x = jnp.pad(grid, [(0, 0)] * (grid.ndim - 1) + [(t["padlo"], t["padhi"])])
        x = jnp.fft.ifftshift(x, axes=-1)
        if _use_mxu_fft(self.fftImpl, nFFT):
            x = _mxu_fft(x.astype(jnp.complex64), nFFT, inverse=True)
        else:
            x = jnp.fft.ifft(x, axis=-1).astype(jnp.complex64)   # (..., L, nFFT)

        if f0 > 0:
            ph = jnp.exp(2j * jnp.pi * f0 * jnp.asarray(t["mod_phase_t"])).astype(jnp.complex64)
            x = x * ph[:, None]

        bodies = [x[..., l, :] for l in range(L)]
        if not windowing or winLen == 0:
            parts = []
            for l in range(L):
                parts.append(bodies[l][..., nFFT - cpLens[l]:])   # CP
                parts.append(bodies[l])
            return jnp.concatenate(parts, axis=-1)

        rampU = jnp.asarray(t["ramp"])
        rampD = rampU[::-1]
        parts = []
        for l in range(L):
            nxt = (l + 1) % L
            tail = bodies[l][..., nFFT - winLen:]
            pre = bodies[nxt][..., nFFT - cpLens[nxt] - winLen:
                              nFFT - cpLens[nxt]]
            parts.append(bodies[l][..., nFFT - cpLens[l]:])       # CP
            parts.append(bodies[l][..., :nFFT - winLen])          # body - tail
            parts.append(tail * rampD + pre * rampU)              # boundary
        return jnp.concatenate(parts, axis=-1)

    # ---------------------------------------------------------------- RX
    def demodulate(self, waveform: jnp.ndarray, f0: float = 0.0) -> jnp.ndarray:
        """waveform (..., >=Ns) complex -> grid (..., L, K) complex64.

        Slice-based: per symbol, one contiguous nFFT window starting
        mid-CP plus a static left-rotation (two slices + concat) replaces
        the flat (L*nFFT)-wide device gather — see modulate's layout note."""
        t = self.tables
        nFFT = t["nFFT"]
        outs = []
        for l in range(t["L"]):
            st = int(t["symStarts"][l]) + int(t["fftStarts"][l])
            w = waveform[..., st:st + nFFT]
            r = int(t["cpLens"][l]) - int(t["fftStarts"][l])
            if r:
                w = jnp.concatenate([w[..., r:], w[..., :r]], axis=-1)
            outs.append(w[..., None, :])
        fft_in = jnp.concatenate(outs, axis=-2)                   # (..., L, nFFT)
        if _use_mxu_fft(self.fftImpl, nFFT):
            g = _mxu_fft(fft_in.astype(jnp.complex64), nFFT, inverse=False)
        else:
            g = jnp.fft.fft(fft_in, axis=-1)
        g = jnp.fft.fftshift(g, axes=-1)
        g = g[..., t["k0"]:t["k0"] + t["K"]].astype(jnp.complex64)
        if f0 > 0:
            ph = jnp.exp(2j * jnp.pi * f0 * jnp.asarray(t["demod_phase_t"])).astype(jnp.complex64)
            g = g * ph[:, None]
        return g
