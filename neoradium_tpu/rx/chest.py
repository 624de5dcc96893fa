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

Every interpolation the reference offers is a *linear map from pilot values
to target values with config-static coefficients* — including the RBF
kernels ('thin_plate_spline'/'multiquadric', reference utils.py:26-36) and
the 2-D time-frequency RBF (int2d, grid.py:853-863): the pilot coordinates
are fixed by the config, so W = f(targets) where f is the scipy interpolant
fitted on identity values. W is extracted host-side once (exact scipy
behavioral parity by construction, neighbors/smoothing/degree included) and
shipped as one more static matmul; no host fallback is needed on device.

Ports may have differing pilot counts/layouts (reference grid.py:775-808
loops per port); partial CDM groups raise, as in the reference
(grid.py:793-794 "Partial CDMs are not supported in this version.").

Deviation: the reference noise loop reads the stale ``portKs`` of the LAST
port for every port (grid.py:823-826 never reassigns it), so with multiple
CDM groups its deltas sample the wrong subcarriers; we use each port's own
pilot subcarriers (noiseVar differs by <0.1% in those configs).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils import toDb, toLinear


def interp_matrix(x: np.ndarray, t: np.ndarray, kind: str = "linear",
                  neighbors: int | None = 12,
                  smoothing: float = 0.0) -> np.ndarray:
    """(len(t), len(x)) matrix W with W@v == reference
    ``utils.interpolate(x, v, t, kind, neighbors, smoothing)``.

    linear/nearest are built directly; quadratic and the RBF kernels
    ('thin_plate_spline'/'multiquadric', epsilon=1 degree=1 exactly as
    reference utils.py:27-28) are extracted from the scipy interpolant by
    fitting it on identity values — the interpolation is linear in the
    values, so the identity columns ARE the weight matrix.
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
    if kind == "linear":
        i = np.clip(np.searchsorted(x, t, side="right") - 1, 0, n - 2)
        w = (t - x[i]) / (x[i + 1] - x[i])
        W[np.arange(len(t)), i] = 1 - w
        W[np.arange(len(t)), i + 1] = w
        return W
    if kind == "quadratic":
        from scipy.interpolate import interp1d
        return interp1d(x, np.eye(n), kind="quadratic", axis=0,
                        fill_value="extrapolate")(t)
    if kind in ("thin_plate_spline", "multiquadric"):
        from scipy.interpolate import RBFInterpolator
        f = RBFInterpolator(x[:, None], np.eye(n), neighbors, smoothing,
                            kind, 1)
        return f(t[:, None])
    raise ValueError(f"Unsupported interpolation kind {kind!r}")


def interp2d_matrix(ls: np.ndarray, ll: int, kk: int, kernel: str,
                    neighbors: int | None, smoothing: float,
                    degree: int | None) -> np.ndarray:
    """(ll*kk, len(ls)*kk) weight matrix of the reference's 2-D RBF
    interpolation over the (symbol, subcarrier) plane (grid.py:853-863):
    pilot points = meshgrid(arange(kk), ls), targets = the full grid, both
    flattened symbol-major. Extracted from scipy by the identity trick.

    Deviation (documented reference bug): the reference's int2d defaults
    (neighbors=12, grid.py:741) crash in scipy with 'Singular matrix' —
    the 12 nearest pilots to any target lie on ONE pilot symbol row
    (subcarrier spacing 1 << symbol spacing), so the local degree-1
    monomial system is rank-deficient. We fall back to the global RBF
    (neighbors=None), which is what the reference needs to be called with
    to work at all."""
    from numpy.linalg import LinAlgError
    from scipy.interpolate import RBFInterpolator
    pilotLKs = np.float64(
        np.meshgrid(np.arange(kk), np.asarray(ls, np.float64))).reshape(2, -1).T
    allLKs = np.float64(
        np.meshgrid(range(kk), range(ll))).reshape(2, -1).T
    eye = np.eye(len(pilotLKs))
    try:
        f = RBFInterpolator(pilotLKs, eye, neighbors, smoothing, kernel,
                            degree=degree)
        return f(allLKs)
    except LinAlgError:
        f = RBFInterpolator(pilotLKs, eye, None, smoothing, kernel,
                            degree=degree)
        return f(allLKs)


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

    Args mirror reference estimateChannelLsEx: meanCdm, polarInt, kernel
    ('linear'/'nearest'/'quadratic'/'thin_plate_spline'/'multiquadric'),
    int2d (2-D time-frequency RBF), neighbors, smoothing, degree — all
    interpolation variants run on device as static matmuls.
    """

    def __init__(self, pdschCfg, slotNo: int = 0, meanCdm: bool = True,
                 polarInt: bool = False, kernel: str = "linear",
                 int2d: bool = False, neighbors: int | None = 12,
                 smoothing: float = 0.0, degree: int | None = None):
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
                    meanCdm, polarInt, kernel, int2d, neighbors, smoothing,
                    degree)

    @classmethod
    def from_csirs(cls, csiRsConfig, slotNo: int = 0, meanCdm: bool = True,
                   polarInt: bool = False, kernel: str = "linear",
                   int2d: bool = False, neighbors: int | None = 12,
                   smoothing: float = 0.0, degree: int | None = None):
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
        self._setup(car, ports, lCdm, kCdm, meanCdm, polarInt, kernel,
                    int2d, neighbors, smoothing, degree)
        return self

    def _setup(self, car, ports, lCdm, kCdm, meanCdm, polarInt, kernel,
               int2d=False, neighbors=12, smoothing=0.0, degree=None):
        self.carrier = car
        self.meanCdm = meanCdm
        self.polarInt = polarInt
        self.int2d = int2d
        self.lCdm = lCdm
        self.kCdm = kCdm
        cdmSize = lCdm * kCdm
        ll, kk = car.symbolsPerSlot, car.numSubcarriers
        self.shape = (ll, kk)
        pp = len(ports)
        # organize per port: ls (numLs,), ks (numKs,), pilotVals (numLs, numKs)
        # Ports may have different pilot counts/layouts (reference
        # grid.py:775-808 loops per port) — everything below is per-port.
        self.portLs, self.portKs, self.pilotVals = [], [], []
        for p in range(pp):
            entries = sorted(ports[p], key=lambda e: e[0])
            ls = np.asarray([e[0] for e in entries], np.int32)
            ks = np.asarray(entries[0][1], np.int32)
            self.portLs.append(ls)
            self.portKs.append(ks)
            self.pilotVals.append(np.stack([e[2] for e in entries]))
        self.pp = pp

        ks2, ls2 = [], []
        for p in range(pp):
            numLs, numKs = len(self.portLs[p]), len(self.portKs[p])
            if meanCdm:
                if numKs % kCdm or numLs % lCdm:
                    # matches reference grid.py:793-794
                    raise ValueError(
                        "Partial CDMs are not supported in this version.")
                ks2.append(self.portKs[p].reshape(-1, kCdm).mean(1))
                ls2.append(self.portLs[p].reshape(-1, lCdm).mean(1))
            else:
                ks2.append(self.portKs[p].astype(np.float64))
                ls2.append(self.portLs[p].astype(np.float64))
        self.cdmSize = cdmSize if meanCdm else 1

        # static interpolation matrices, per port (pilot layouts may differ)
        self.Wk = [interp_matrix(k, np.arange(kk), kernel, neighbors,
                                 smoothing) for k in ks2]
        # time stage: reference repeats single-pilot-symbol ports
        # (grid.py:846-848) — as a matrix that is a column of ones; int2d
        # replaces the 1-D time interp with the 2-D map (grid.py:853-863).
        self.Wl, self.W2d = [], []
        w2dCache = {}
        for p in range(pp):
            if len(ls2[p]) == 1:
                self.Wl.append(np.ones((ll, 1)))
                self.W2d.append(None)
                continue
            if int2d:
                key = tuple(ls2[p])
                if key not in w2dCache:
                    w2dCache[key] = interp2d_matrix(
                        ls2[p], ll, kk, kernel, neighbors, smoothing, degree)
                self.Wl.append(None)
                self.W2d.append(w2dCache[key])
            else:
                self.Wl.append(interp_matrix(ls2[p], np.arange(ll), kernel,
                                             neighbors, smoothing))
                self.W2d.append(None)

        # raised-cosine CIR window for noise estimation (grid.py:811-819)
        riseLen = (min(car.symbolLensSubframe) - car.nFFT) * kk // car.nFFT
        rc = 0.5 * (1 - np.sin(np.pi * np.arange(riseLen - 1, -riseLen, -2)
                               / (2 * riseLen)))
        self.win = np.concatenate([rc[::-1], np.zeros(kk - 2 * riseLen), rc])

    # ------------------------------------------------------------------ device
    def estimate(self, rxGrid: jnp.ndarray):
        """rxGrid (..., Nr, L, K) -> (hEst (..., L, K, Nr, Np), noiseVar (...,)).

        Static per-port unrolled loop (pp <= 32): each port is a gather +
        CDM reshape-mean + interp matmuls; XLA fuses across ports. Tiny dims
        (pp, lCdm, kCdm) never end up minor-most.
        """
        ll, kk = self.shape
        g = jnp.moveaxis(rxGrid, -3, -1)                 # (..., L, K, rr)
        lead = g.shape[:-3]
        rr = rxGrid.shape[-3]
        lCdm, kCdm = self.lCdm, self.kCdm
        win = jnp.asarray(self.win)
        deltas, hs = [], []
        for p in range(self.pp):
            ls = jnp.asarray(self.portLs[p])
            ks = jnp.asarray(self.portKs[p])
            pv = jnp.asarray(self.pilotVals[p], rxGrid.dtype)
            numLs, numKs = len(self.portLs[p]), len(self.portKs[p])
            # LS at pilots: (..., numLs, numKs, rr)
            hp = g[..., ls[:, None], ks[None, :], :] / pv[..., None]
            hpOrig = hp

            if self.meanCdm:                              # grid.py:791-798
                h = hp.reshape(lead + (numLs, numKs // kCdm, kCdm, rr))
                h = jnp.moveaxis(h, -2, -3)               # (..., nLs, kCdm, nK2, rr)
                h = h.reshape(lead + (numLs // lCdm, lCdm * kCdm,
                                      numKs // kCdm, rr))
                hp = h.mean(-3)                           # (..., nL2, nK2, rr)

            # frequency interpolation (static matmul), optionally polar
            Wk = jnp.asarray(self.Wk[p], hp.real.dtype)
            if self.polarInt:
                theta = jnp.unwrap(jnp.angle(hp), axis=-2)
                r = jnp.abs(hp)
                thetaF = jnp.einsum("ka,...lar->...lkr", Wk, theta)
                rF = jnp.einsum("ka,...lar->...lkr", Wk, r)
                hF = (rF * jnp.exp(1j * thetaF)).astype(hp.dtype)
            else:
                hF = jnp.einsum("ka,...lar->...lkr", Wk, hp)  # (..., nL2, kk, rr)

            # noise deltas via raised-cosine CIR denoising (grid.py:811-837)
            cir = jnp.fft.ifft(hF, axis=-2)
            den = jnp.fft.fft(cir * win[:, None], axis=-2)
            if self.meanCdm and lCdm > 1:
                den = jnp.repeat(den, lCdm, axis=-3)
            denAtPilots = jnp.take(den, ks, axis=-2)      # (..., nLs, nKs, rr)
            deltas.append((hpOrig - denAtPilots).reshape(lead + (-1,)))

            # time / 2-D interpolation -> (..., ll, kk, rr)
            if self.W2d[p] is not None:
                W2 = jnp.asarray(self.W2d[p], hp.real.dtype)
                flat = hF.reshape(lead + (-1, rr))        # (..., nL2*kk, rr)
                hs.append(jnp.einsum("ba,...ar->...br", W2,
                                     flat).reshape(lead + (ll, kk, rr)))
            else:
                Wl = jnp.asarray(self.Wl[p], hp.real.dtype)
                hs.append(jnp.einsum("la,...akr->...lkr", Wl, hF))

        allDeltas = jnp.concatenate(deltas, axis=-1)
        rawVar = jnp.var(allDeltas, axis=-1)
        noiseVar = scale_noise_var(
            rawVar, self.carrier.spacing, self.pp, rr, kk,
            lCdm if self.meanCdm else 1, kCdm if self.meanCdm else 1,
            allDeltas.shape[-1])
        hEst = jnp.stack(hs, axis=-1)                     # (..., L, K, rr, pp)
        return hEst, noiseVar
