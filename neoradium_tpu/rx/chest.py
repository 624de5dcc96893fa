"""LS channel estimation — reference ``neoradium/grid.py`` estimateChannelLS
(grid.py:740-975) re-designed for TPU.

TPU design: every pilot position, CDM-averaging operator, and interpolation
weight is a *static* function of the (DMRS/CSI-RS, carrier, slot) config, so
they are all precomputed host-side in ``__init__``. The jitted device path is
pure gathers + small matmuls (interp matrices) + one FFT pair for the
raised-cosine CIR denoising used by the noise estimator:

  hp = rx[pilots] / pilotVals          (gather + divide)
  hCdm = CDM-group mean                (reshape-mean, grid.py:791-798)
  hF = Wk @ hCdm                       (freq interp as matmul, grid.py:803-808)
  noise: ifft -> window -> fft -> var  (grid.py:811-837) -> MLP correction
  hEst = Wl @ hF                       (time interp as matmul, grid.py:853-866)

The public reference default (kernel='linear', polarInt=False, 1-D time
interp — grid.py:974) is exactly representable as these static matrices.
RBF ('thin_plate_spline'/'multiquadric') and 2-D interpolation have no cheap
XLA analogue and are host-side extras (SURVEY.md §7 hard parts).

Deviation: the reference noise loop reads the stale ``portKs`` of the LAST
port for every port (grid.py:823-826 never reassigns it), so with multiple
CDM groups its deltas sample the wrong subcarriers; we use each port's own
pilot subcarriers (noiseVar differs by <0.1% in those configs).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils import toDb, toLinear


def interp_matrix(x: np.ndarray, t: np.ndarray, kind: str = "linear") -> np.ndarray:
    """(len(t), len(x)) matrix W with W@v == interp1d(x, v, kind,
    fill_value='extrapolate')(t) for linear/nearest (reference utils.py:26-36).
    """
    x = np.asarray(x, np.float64)
    t = np.asarray(t, np.float64)
    n = len(x)
    W = np.zeros((len(t), n))
    if n == 1:
        W[:, 0] = 1.0
        return W
    if kind == "nearest":
        # scipy interp1d 'nearest' rounds half toward the left neighbor
        mid = (x[:-1] + x[1:]) / 2
        idx = np.searchsorted(mid, t, side="left")
        W[np.arange(len(t)), idx] = 1.0
        return W
    if kind != "linear":
        raise ValueError(f"Unsupported static interp kind {kind!r}")
    i = np.clip(np.searchsorted(x, t, side="right") - 1, 0, n - 2)
    w = (t - x[i]) / (x[i + 1] - x[i])
    W[np.arange(len(t)), i] = 1 - w
    W[np.arange(len(t)), i + 1] = w
    return W


# Noise-variance correction MLP weights — numeric constants reproduced from
# reference grid.py:708-723 (scaleNoiseVar), required for behavioral parity.
_W1 = np.asarray(
    [[6.25861, -0.22737, -8.51406, -0.25593, 0.08617, 0.54746, -10.5016, -0.0075],
     [0.05773, -0.08806, 0.03222, 0.65573, -1.05669, -0.00781, 0.01074, -0.02898],
     [-11.48739, -18.84534, 9.54569, -0.02089, 9.92439, 0.07408, 11.41916, -34.07344],
     [0.71498, 4.52607, -0.35023, 0.05907, 2.24553, 0.06049, 0.47961, 0.44182],
     [0.84015, 0.14097, 0.20389, -0.45147, 0.12305, -0.51977, 0.37225, 0.12104],
     [0.41917, 10.52318, 3.35156, 0.58207, -24.37617, 0.33745, -1.11957, 1.07133],
     [-0.12522, -1.82239, 0.90271, -0.06134, 10.43859, 0.37885, 1.36096, -0.70045],
     [0.00109, -0.00328, -0.00657, -0.16279, -0.00351, -0.28476, 0.00053, -0.00117]])
_B1 = np.asarray([0.60641, 0.06111, 0.24848, 0., 0.32098, 0., -0.21224, 0.007])
_W2 = np.asarray(
    [[0.10102, 0.22608, 0.32803, -0.11752], [-0.01549, 0.39246, -0.30703, 0.12527],
     [-0.02698, 0.09462, -0.31409, 0.03994], [-0.08645, -0.00781, 0.52137, 0.45963],
     [0.07151, -0.27656, 0.23206, -0.06437], [-0.0154, 0.07408, -0.15198, -0.4007],
     [-0.17055, -0.06038, -0.8417, 0.43372], [-3.12708, 2.03716, -3.90529, 1.21203]])
_B2 = np.asarray([0.54406, 0.36443, -0.21105, 0.35659])
_W3 = np.asarray([[0.04271], [0.07268], [0.0702], [-0.16217]])
_B3 = np.asarray([0.72121])


def scale_noise_var(rawNoiseVar, spacing, numTx, numRx, numSubcarriers,
                    lCdm, kCdm, numVar):
    """MLP-corrected noise variance (reference grid.py:697-737).

    Only ``rawNoiseVar`` may be traced/batched (any leading shape); the other
    seven inputs are static config numbers, folded host-side.
    """
    rawSnrDb = toDb(1.0 / (rawNoiseVar * numRx))
    staticPart = np.asarray([spacing, numTx, numRx, numSubcarriers,
                             lCdm, kCdm, numVar], np.float64) @ _W1[1:] + _B1
    h = jnp.maximum(rawSnrDb[..., None] * _W1[0] + staticPart, 0)
    h = jnp.maximum(h @ _W2 + _B2, 0)
    snrDb = (h @ _W3)[..., 0] + _B3[0]
    corrected = 1.0 / (toLinear(snrDb) * numRx)
    return jnp.where(rawSnrDb > 20, rawNoiseVar, corrected)


class LsChannelEstimator:
    """LS + interpolation channel estimator for one (PDSCH DMRS, slot) config.

    Built from a :class:`~neoradium_tpu.phy.pdsch.PdschConfig` with DMRS set
    (the DMRS branch of reference estimateChannelLsEx; the CSI-RS branch is
    in :mod:`neoradium_tpu.phy.csirs`). The returned channel includes the
    precoding effect (Heff = H V, grid.py:755-757).

    Args mirror reference estimateChannelLS: meanCdm, polarInt, kernel
    ('linear' or 'nearest' on device).
    """

    def __init__(self, pdschCfg, slotNo: int = 0, meanCdm: bool = True,
                 polarInt: bool = False, kernel: str = "linear"):
        if pdschCfg.dmrs is None:
            raise ValueError("PDSCH config has no DMRS — call setDMRS first")
        car = pdschCfg.carrier
        dmrs = pdschCfg.dmrs
        vals, _ = dmrs.pilot_values(car, slotNo, pdschCfg.portSet,
                                    pdschCfg.mappingType, pdschCfg.symSet,
                                    pdschCfg.slot_map(slotNo))
        ports = {}
        for p, l, ks, vs in vals:
            ports.setdefault(p, []).append((l, ks, vs))
        self._setup(car, ports, dmrs.symbols, 4 if dmrs.enhanced else 2,
                    meanCdm, polarInt, kernel)

    @classmethod
    def from_csirs(cls, csiRsConfig, slotNo: int = 0, meanCdm: bool = True,
                   polarInt: bool = False, kernel: str = "linear"):
        """CSI-RS branch of reference estimateChannelLsEx (grid.py:747-753):
        the returned channel does NOT include precoding (per-tx-port H)."""
        self = cls.__new__(cls)
        car = csiRsConfig.carrier
        cdmSize = csiRsConfig.csiRsSetList[0].csiRsList[0].cdmSize
        lCdm, kCdm = {1: (1, 1), 2: (1, 2), 4: (2, 2), 8: (4, 2)}[cdmSize]
        ports = {}
        perPortSym = {}
        for p, l, k, v in csiRsConfig.entries(slotNo):
            if v is None:
                continue
            perPortSym.setdefault((p, l), []).append((k, v))
        for (p, l), kvs in sorted(perPortSym.items()):
            kvs.sort()
            ks = np.asarray([k for k, _ in kvs], np.int32)
            vs = np.asarray([v for _, v in kvs], np.complex128)
            ports.setdefault(p, []).append((l, ks, vs))
        self._setup(car, ports, lCdm, kCdm, meanCdm, polarInt, kernel)
        return self

    def _setup(self, car, ports, lCdm, kCdm, meanCdm, polarInt, kernel):
        self.carrier = car
        self.meanCdm = meanCdm
        self.polarInt = polarInt
        self.lCdm = lCdm
        self.kCdm = kCdm
        cdmSize = lCdm * kCdm
        ll, kk = car.symbolsPerSlot, car.numSubcarriers
        self.shape = (ll, kk)
        pp = len(ports)
        # organize per port: ls (numLs,), ks (numKs,), pilotVals (numLs, numKs)
        self.portLs, self.portKs, pilotVals = [], [], []
        for p in range(pp):
            entries = sorted(ports[p], key=lambda e: e[0])
            ls = np.asarray([e[0] for e in entries], np.int32)
            ks = np.asarray(entries[0][1], np.int32)
            self.portLs.append(ls)
            self.portKs.append(ks)
            pilotVals.append(np.stack([e[2] for e in entries]))
        numLs, numKs = len(self.portLs[0]), len(self.portKs[0])
        for p in range(pp):
            if len(self.portLs[p]) != numLs or len(self.portKs[p]) != numKs:
                raise ValueError("Ports with differing pilot counts are not supported")
        self.pilotVals = np.stack(pilotVals)            # (pp, numLs, numKs)
        self.numLs, self.numKs, self.pp = numLs, numKs, pp

        if meanCdm:
            if numKs % self.kCdm or numLs % self.lCdm:
                raise ValueError("Partial CDMs are not supported")
            ks2 = [ks.reshape(-1, self.kCdm).mean(1) for ks in self.portKs]
            ls2 = [ls.reshape(-1, self.lCdm).mean(1) for ls in self.portLs]
        else:
            ks2 = [ks.astype(np.float64) for ks in self.portKs]
            ls2 = [ls.astype(np.float64) for ls in self.portLs]
        self.cdmSize = cdmSize if meanCdm else 1

        # static interpolation matrices, per port (pilot layouts may differ)
        self.Wk = np.stack([interp_matrix(k, np.arange(kk), kernel) for k in ks2])
        self.Wl = np.stack([interp_matrix(l, np.arange(ll), kernel) for l in ls2])

        # raised-cosine CIR window for noise estimation (grid.py:811-819)
        riseLen = (min(car.symbolLensSubframe) - car.nFFT) * kk // car.nFFT
        rc = 0.5 * (1 - np.sin(np.pi * np.arange(riseLen - 1, -riseLen, -2)
                               / (2 * riseLen)))
        self.win = np.concatenate([rc[::-1], np.zeros(kk - 2 * riseLen), rc])

    # ------------------------------------------------------------------ device
    def estimate(self, rxGrid: jnp.ndarray):
        """rxGrid (..., Nr, L, K) -> (hEst (..., L, K, Nr, Np), noiseVar (...,))."""
        ll, kk = self.shape
        ls = jnp.asarray(np.stack(self.portLs))          # (pp, numLs)
        ks = jnp.asarray(np.stack(self.portKs))          # (pp, numKs)
        pv = jnp.asarray(self.pilotVals, rxGrid.dtype)   # (pp, numLs, numKs)

        # LS at pilots: (..., pp, numLs, numKs, rr)
        g = jnp.moveaxis(rxGrid, -3, -1)                 # (..., L, K, rr)
        hp = g[..., ls[:, :, None], ks[:, None, :], :] / pv[..., None]
        hpOrig = hp

        if self.meanCdm:
            lead = hp.shape[:-4]
            pp, numLs, numKs = self.pp, self.numLs, self.numKs
            lCdm, kCdm = self.lCdm, self.kCdm
            rr = hp.shape[-1]
            h = hp.reshape(lead + (pp, numLs, numKs // kCdm, kCdm, rr))
            h = jnp.moveaxis(h, -2, -3)                  # (..., pp, numLs, kCdm, nK2, rr)
            h = h.reshape(lead + (pp, numLs // lCdm, lCdm * kCdm, numKs // kCdm, rr))
            hp = h.mean(-3)                              # (..., pp, nL2, nK2, rr)

        # frequency interpolation (matmul with static weights), optionally polar
        Wk = jnp.asarray(self.Wk, hp.real.dtype)
        if self.polarInt:
            theta = jnp.unwrap(jnp.angle(hp), axis=-2)
            r = jnp.abs(hp)
            thetaF = jnp.einsum("pka,...plar->...plkr", Wk, theta)
            rF = jnp.einsum("pka,...plar->...plkr", Wk, r)
            hF = (rF * jnp.exp(1j * thetaF)).astype(hp.dtype)
        else:
            hF = jnp.einsum("pka,...plar->...plkr", Wk, hp)  # (..., pp, nL2, kk, rr)

        # noise estimation via raised-cosine CIR denoising (grid.py:811-837)
        cir = jnp.fft.ifft(hF, axis=-2)
        den = jnp.fft.fft(cir * jnp.asarray(self.win)[:, None], axis=-2)
        if self.meanCdm and self.lCdm > 1:
            den = jnp.repeat(den, self.lCdm, axis=-3)
        # static one-hot gather of pilot subcarriers, per port
        sel = np.zeros((self.pp, self.numKs, kk), np.float32)
        for p in range(self.pp):
            sel[p, np.arange(self.numKs), self.portKs[p]] = 1.0
        denAtPilots = jnp.einsum("pak,...plkr->...plar",
                                 jnp.asarray(sel, den.real.dtype), den)
        deltas = (hpOrig - denAtPilots).reshape(hpOrig.shape[:-4] + (-1,))
        rawVar = jnp.var(deltas, axis=-1)
        rr = rxGrid.shape[-3]
        noiseVar = scale_noise_var(
            rawVar, self.carrier.spacing, self.pp, rr, kk,
            self.lCdm if self.meanCdm else 1, self.kCdm if self.meanCdm else 1,
            deltas.shape[-1])

        # time interpolation -> (..., L, K, rr, pp)
        Wl = jnp.asarray(self.Wl, hp.real.dtype)
        hEst = jnp.einsum("pla,...pakr->...lkrp", Wl, hF)
        return hEst, noiseVar
