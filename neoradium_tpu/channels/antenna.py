"""3GPP antenna model — TR 38.901 §7.1 (coordinates), §7.3 (element pattern).

TPU design: antenna geometry (element positions, polarization slants, pattern
parameters) is a static host-side description; the *field evaluation*
(`elements_fields`) is pure ``jax.numpy`` — elementwise trig + tiny matmuls —
so channel models can evaluate it per-trial under jit/vmap with per-trial
random ray angles. The same function runs in float64 on CPU for conformance
tests against the reference.

Behavioral parity: reference ``neoradium/antenna.py`` — parabolic element
pattern Table 7.3-1 (antenna.py:1014-1094), polarization models 1/2
(antenna.py:1229-1248), rotation matrix Eq. 7.1-4 (antenna.py:737-762),
global<->local angle transform Eqs. 7.1-7/7.1-8 and polarization rotation psi
Eq. 7.1-12 (antenna.py:765-859), panel geometry and polarization-major
element order (antenna.py:1360-1724).
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace

import numpy as np
import jax.numpy as jnp

from ..utils import toLinear


# ===================================================================== element
@dataclass(frozen=True)
class AntennaElement:
    """One antenna element per TR 38.901 Table 7.3-1."""

    position: tuple = (0.0, 0.0, 0.0)
    polAngle: float = 0.0               # degrees; 0 = vertical
    polModel: int = 2
    beamWidth: tuple = (65.0, 65.0)     # (theta3dB, phi3dB) degrees
    verticalSidelobeAttenuation: float = 30.0
    maxAttenuation: float = 30.0
    mainMaxGain: float = 8.0
    freqRange: tuple = (0.0, 100e9)

    # ------------------------------------------------------------- patterns
    def power_pattern_db(self, theta_deg, phi_deg):
        """A(theta'', phi'') + Gmax in dB; inputs in degrees, same shape."""
        xp = jnp if isinstance(theta_deg, jnp.ndarray) else np
        av = -xp.minimum(12 * ((theta_deg - 90.0) / self.beamWidth[0]) ** 2,
                         self.verticalSidelobeAttenuation)
        if self.beamWidth[1] == 360:
            ah = xp.zeros_like(np.asarray(phi_deg) * 0 + av)
        else:
            ah = -xp.minimum(12 * (phi_deg / self.beamWidth[1]) ** 2,
                             self.maxAttenuation)
        return -xp.minimum(-(av + ah), self.maxAttenuation) + self.mainMaxGain

    def polarized_fields(self, theta_deg, phi_deg):
        """(fTheta, fPhi) for same-shaped angle arrays (degrees)."""
        xp = jnp if isinstance(theta_deg, jnp.ndarray) else np
        f = 10.0 ** (self.power_pattern_db(theta_deg, phi_deg) / 20.0)
        zeta = self.polAngle * np.pi / 180.0
        if self.polModel == 1:
            if self.polAngle == 0:
                cpsi, spsi = 1.0, 0.0
            elif self.polAngle in (180, -180):
                cpsi, spsi = -1.0, 0.0
            else:
                th = theta_deg * np.pi / 180.0
                ph = phi_deg * np.pi / 180.0
                denom = xp.sqrt(1 - (np.cos(zeta) * xp.cos(th)
                                     - np.sin(zeta) * xp.sin(ph) * xp.sin(th)) ** 2)
                cpsi = (np.cos(zeta) * xp.sin(th)
                        + np.sin(zeta) * xp.sin(ph) * xp.cos(th)) / denom
                spsi = np.sin(zeta) * xp.cos(ph) / denom
            return f * cpsi, f * spsi
        return f * np.cos(zeta), f * np.sin(zeta)

    # ----------------------------------------------------------- container API
    def elements(self):
        return [self]

    def getNumElements(self) -> int:
        return 1

    def positions(self) -> np.ndarray:
        return np.asarray([self.position], np.float64)


# ===================================================================== panel
class AntennaPanel:
    """M x N rectangular panel; dual-polarized panels list one polarization
    block after the other (polarization-major order, TR 38.901 §7.3)."""

    def __init__(self, shape=(2, 2), **kwargs):
        self.shape = tuple(int(x) for x in shape)
        self.spacing = tuple(np.float64(kwargs.get("spacing", (0.5, 0.5))))
        self.polarization = kwargs.get("polarization", "|")
        if self.polarization not in ("|", "-", "+", "x"):
            raise ValueError("polarization must be one of '|', '-', '+', 'x'")
        self.position = np.asarray(kwargs.get("position", [0, 0, 0]), np.float64)
        self.matlabOrder = kwargs.get("matlabOrder", False)
        template = kwargs.get("element", AntennaElement(
            **{k: v for k, v in kwargs.items()
               if k in ("polModel", "beamWidth", "verticalSidelobeAttenuation",
                        "maxAttenuation", "mainMaxGain", "freqRange")}))

        rows, cols = self.shape
        dz, dy = self.spacing
        offZ, offY = (np.asarray(self.shape) - 1) * np.asarray(self.spacing) / 2
        polAngles = {"|": (0,), "-": (90,), "+": (0, 90), "x": (45, -45)}[self.polarization]
        self._grid = [[tuple(replace(template,
                                     position=(0.0, c * dy - offY, r * dz - offZ),
                                     polAngle=pa) for pa in polAngles)
                       for c in range(cols)] for r in range(rows)]

    def print(self, indent: int = 0, title: str | None = None,
              getStr: bool = False):
        """Reference-style property listing (AntennaPanel.print,
        antenna.py)."""
        import numpy as _np
        from ..utils import format_properties
        s = format_properties(
            title or "Antenna Panel Properties:",
            [("Total Elements", self.getNumElements()),
             ("spacing", ", ".join(f"{x:g}\u03bb"
                                   for x in _np.ravel(self.spacing))),
             ("shape", f"{self.shape[0]} rows x {self.shape[1]} columns"),
             ("polarization", self.polarization)], indent)
        if getStr:
            return s
        print(s)

    def __repr__(self):
        return self.print(getStr=True)

    @property
    def numPol(self) -> int:
        return 2 if self.polarization in "+x" else 1

    def elements(self, polarization=True):
        rows, cols = self.shape
        out = []
        if self.matlabOrder:
            for p in range(self.numPol if polarization else 1):
                for c in range(cols):
                    for r in range(rows - 1, -1, -1):
                        out.append(self._grid[r][c][p])
        else:
            for p in range(self.numPol if polarization else 1):
                for r in range(rows):
                    for c in range(cols):
                        out.append(self._grid[r][c][p])
        return out

    def getNumElements(self) -> int:
        return self.shape[0] * self.shape[1] * self.numPol

    def positions(self) -> np.ndarray:
        """Standalone panel positions (no panel offset, reference
        antenna.py:1601-1618)."""
        return np.asarray([e.position for e in self.elements()], np.float64)

    def _elements_one_pol(self, p: int):
        rows, cols = self.shape
        if self.matlabOrder:
            return [self._grid[r][c][p] for c in range(cols)
                    for r in range(rows - 1, -1, -1)]
        return [self._grid[r][c][p] for r in range(rows) for c in range(cols)]


# ===================================================================== array
class AntennaArray:
    """Mg x Ng grid of identical panels (TR 38.901 §7.3).

    Dual-polarized arrays order elements polarization-major ACROSS panels
    (all first-polarization elements of every panel, then all second) —
    reference antenna.py:1944-1953.
    """

    def __init__(self, shape=(1, 1), panel: AntennaPanel | None = None, **kwargs):
        self.shape = tuple(int(x) for x in shape)
        # reference API spells the template kwarg "panels" (antenna.py:1890);
        # accept both, and don't silently swallow a mistyped template.
        if panel is None:
            panel = kwargs.pop("panels", None)
        template = panel if panel is not None else AntennaPanel()
        unknown = set(kwargs) - {"spacing"}
        if unknown:
            raise ValueError(f"Unknown AntennaArray argument(s): {sorted(unknown)}")
        spacing = kwargs.get("spacing")
        if spacing is None:
            spacing = np.asarray(template.shape) * np.asarray(template.spacing)
        self.spacing = tuple(np.float64(spacing))
        rows, cols = self.shape
        dz, dy = self.spacing
        offZ, offY = (np.asarray(self.shape) - 1) * np.asarray(self.spacing) / 2
        self.panels = []
        for r in range(rows):
            rowPanels = []
            for c in range(cols):
                p = AntennaPanel(template.shape, spacing=template.spacing,
                                 polarization=template.polarization,
                                 matlabOrder=template.matlabOrder,
                                 element=template._grid[0][0][0],
                                 position=[0, c * dy - offY, r * dz - offZ])
                rowPanels.append(p)
            self.panels.append(rowPanels)

    @property
    def polarization(self):
        return self.panels[0][0].polarization

    def _all_panels(self):
        return [p for row in self.panels for p in row]

    def elements(self, polarization=True):
        out = []
        if polarization and self.polarization in "+x":
            for p in (0, 1):
                for panel in self._all_panels():
                    rows, cols = panel.shape
                    out.extend(panel._grid[r][c][p]
                               for r in range(rows) for c in range(cols))
        else:
            for panel in self._all_panels():
                out.extend(panel.elements(False))
        return out

    def getNumElements(self) -> int:
        return sum(p.getNumElements() for p in self._all_panels())

    def positions(self) -> np.ndarray:
        """Element positions in array coordinates (element + panel offsets)."""
        pos = []
        if self.polarization in "+x":
            for p in (0, 1):
                for panel in self._all_panels():
                    rows, cols = panel.shape
                    pos.extend(np.asarray(panel._grid[r][c][p].position) + panel.position
                               for r in range(rows) for c in range(cols))
        else:
            for panel in self._all_panels():
                pos.extend(np.asarray(e.position) + panel.position
                           for e in panel.elements(False))
        return np.asarray(pos, np.float64)


# ======================================================= pattern analysis
def _angles_to_numpy(angle, lo, hi):
    """Reference antenna.py:68-76 angle-argument convention."""
    if angle is None:
        angle = np.arange(lo, hi)
    if isinstance(angle, np.ndarray):
        return angle.astype(np.float64)
    if isinstance(angle, list):
        return np.float64(angle)
    if isinstance(angle, tuple):
        if angle[0] == angle[1]:
            angle = (angle[0], angle[0] + 1)
        return np.float64(range(*angle))
    return np.float64([angle])


class _PatternMixin:
    """Steering vectors / field patterns / directivity / radiation plots for
    panels and arrays (reference antenna.py:106-735)."""

    def getSteeringVector(self, theta, phi):
        """(nEl, nTheta, nPhi) array response exp(2j*pi*pos.rHat);
        angles in degrees (reference getSteeringVector:106-137)."""
        th = np.asarray(theta, np.float64).reshape(-1, 1) * np.pi / 180
        ph = np.asarray(phi, np.float64).reshape(1, -1) * np.pi / 180
        rHat = np.float64([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph),
                           np.cos(th) * np.ones_like(ph)])
        return np.exp(2j * np.pi * np.tensordot(self.positions(), rHat, axes=1))

    def _element_polarized(self, theta, phi):
        """Per-element V/H fields at (nTheta, nPhi) grid (polarization-major)."""
        th = np.asarray(theta, np.float64).reshape(-1, 1)
        ph = np.asarray(phi, np.float64).reshape(1, -1)
        els = self.elements()
        nEl = len(els)
        polAngles = []
        for e in els:
            if e.polAngle not in polAngles:
                polAngles.append(e.polAngle)
        fields = {pa: AntennaElement(polModel=els[0].polModel,
                                     beamWidth=tuple(els[0].beamWidth),
                                     verticalSidelobeAttenuation=els[0].verticalSidelobeAttenuation,
                                     maxAttenuation=els[0].maxAttenuation,
                                     mainMaxGain=els[0].mainMaxGain,
                                     polAngle=pa).polarized_fields(th, ph)
                  for pa in polAngles}
        fv = np.stack([np.broadcast_to(fields[e.polAngle][0], th.shape[:1] + ph.shape[1:])
                       for e in els])
        fh = np.stack([np.broadcast_to(fields[e.polAngle][1], th.shape[:1] + ph.shape[1:])
                       for e in els])
        return fv, fh

    def getPolarizedFields(self, theta=None, phi=None, weights=None):
        """Array-combined (V, H) fields, optionally beamformed
        (reference antenna.py:191-268)."""
        theta = _angles_to_numpy(theta, 0, 180)
        phi = _angles_to_numpy(phi, -180, 180)
        sv = self.getSteeringVector(theta, phi)
        fv, fh = self._element_polarized(theta, phi)
        if weights is not None:
            sv = sv * np.asarray(weights).reshape(-1, 1, 1)
        return (np.squeeze((sv * fv).sum(0)), np.squeeze((sv * fh).sum(0)))

    def getField(self, theta=None, phi=None, weights=None):
        """|F| = hypot(|Fv|, |Fh|) (reference getField:270-314)."""
        v, h = self.getPolarizedFields(theta, phi, weights)
        return np.hypot(np.abs(v), np.abs(h))

    def getPowerPattern(self, theta=None, phi=None, weights=None):
        return np.square(self.getField(theta, phi, weights))

    def getPowerPatternDb(self, theta=None, phi=None, weights=None):
        """Field power pattern in dB, floored at -120 dB
        (reference getPowerPatternDb:362-411)."""
        from ..utils import toDb
        return toDb(np.maximum(1e-12, self.getPowerPattern(theta, phi, weights)))

    def getFieldPattern(self, theta=None, phi=None):
        """(nEl, nTheta, nPhi) per-element fields (no polarization) used by
        the directivity integral (reference antenna.py:140-189)."""
        theta = _angles_to_numpy(theta, 0, 180)
        phi = _angles_to_numpy(phi, -180, 180)
        e0 = self.elements()[0]
        th = theta.reshape(-1, 1)
        ph = phi.reshape(1, -1)
        f = 10.0 ** (e0.power_pattern_db(th, ph) / 20.0)
        f = np.broadcast_to(f, (len(theta), len(phi)))
        return self.getSteeringVector(theta, phi) * f[None]

    def getMaxDim(self):
        pos = self.positions()
        return float((pos.max(0) - pos.min(0)).max())

    def getIntegralAngleStep(self):
        maxSpan = self.getMaxDim()
        if maxSpan == 0:
            return 1
        beamWidth = 70 / maxSpan
        for step in (1, 0.5, 0.2):
            if beamWidth >= step:
                return step
        return 0.1

    def getDirectivity(self, theta=None, phi=None, weights=None):
        """Directivity in dBi via numeric integration over the sphere
        (reference getDirectivity:431-538)."""
        from ..utils import toDb
        theta = _angles_to_numpy(theta, 0, 180)
        phi = _angles_to_numpy(phi, -180, 180)
        elementsField = self.getFieldPattern(theta, phi)
        step = self.getIntegralAngleStep()
        allTheta = np.arange(0, 180 + step, step)
        allPhi = np.arange(-180, 180 + step, step)
        if (allTheta.shape != theta.shape or allPhi.shape != phi.shape
                or np.any(allTheta != theta) or np.any(allPhi != phi)):
            fieldAll = self.getFieldPattern(allTheta, allPhi)
        else:
            fieldAll = elementsField
        n = fieldAll.shape[0]
        svCov = ((fieldAll * np.sin(allTheta * np.pi / 180)[None, :, None])
                 .reshape(n, -1) @ np.conj(fieldAll.reshape(n, -1)).T)
        dA = (step * np.pi / 180) ** 2
        if weights is not None:
            # Deviation: the reference (antenna.py:524-526) computes the
            # radiated-power integral as w.svCov.w^T (no conjugate), which is
            # not a Hermitian quadratic form and goes NEGATIVE for complex
            # beamforming weights (e.g. conj-steering), clipping directivity
            # to -120 dBi. Correct form is w.svCov.w^H; identical for the
            # real weights the reference's notebooks use.
            w = np.asarray(weights).reshape(1, n)
            integral = float((w @ svCov @ np.conj(w).T)[0, 0].real) * dA
            elementsField = elementsField * np.asarray(weights).reshape(-1, 1, 1)
        else:
            integral = float(svCov.real.sum()) * dA
        power = np.squeeze(np.square(np.abs(elementsField.sum(0))))
        return toDb(np.maximum(1e-12, 4 * np.pi * power / integral))

    def drawRadiation(self, theta=None, phi=None, radiationType="Directivity",
                      normalize=True, title=None, viewAngles=(45, 30), ax=None):
        """2-D polar cut (one of theta/phi scalar) or 3-D surface plot
        (reference drawRadiation:541-735); requires matplotlib."""
        import matplotlib.pyplot as plt
        thetaArr = _angles_to_numpy(theta, 0, 180)
        phiArr = _angles_to_numpy(phi, -180, 180)
        if radiationType == "Directivity":
            vals = self.getDirectivity(thetaArr, phiArr)
        elif radiationType == "Power":
            from ..utils import toDb
            vals = toDb(np.maximum(self.getPowerPattern(thetaArr, phiArr), 1e-12))
        else:
            vals = self.getField(thetaArr, phiArr)
        vals = np.atleast_2d(vals)
        if normalize:
            vals = vals - vals.max() if radiationType != "Field" else vals / vals.max()
        if len(thetaArr) == 1 or len(phiArr) == 1:
            ang = (phiArr if len(thetaArr) == 1 else thetaArr) * np.pi / 180
            if ax is None:
                _, ax = plt.subplots(subplot_kw=dict(projection="polar"))
            ax.plot(ang, vals.reshape(-1))
        else:
            if ax is None:
                fig = plt.figure()
                ax = fig.add_subplot(projection="3d")
            th = thetaArr.reshape(-1, 1) * np.pi / 180
            ph = phiArr.reshape(1, -1) * np.pi / 180
            r = vals - vals.min() if radiationType != "Field" else vals
            x = r * np.sin(th) * np.cos(ph)
            y = r * np.sin(th) * np.sin(ph)
            z = r * np.cos(th) * np.ones_like(ph)
            ax.plot_surface(x, y, z, cmap="viridis")
            ax.view_init(*viewAngles)
        if title:
            ax.set_title(title)
        return ax


# attach the pattern-analysis API to elements, panels, and arrays (the
# reference exposes these on AntennaBase, antenna.py:51-735)
def _element_elements(self, polarization=True):
    return [self]


def _element_positions(self):
    return np.zeros((1, 3))


def _element_num(self):
    return 1


AntennaElement.elements = _element_elements
AntennaElement.positions = _element_positions
AntennaElement.getNumElements = _element_num

for _name in ("getSteeringVector", "_element_polarized", "getPolarizedFields",
              "getField", "getPowerPattern", "getPowerPatternDb",
              "getFieldPattern", "getMaxDim",
              "getIntegralAngleStep", "getDirectivity", "drawRadiation"):
    setattr(AntennaElement, _name, getattr(_PatternMixin, _name))
    setattr(AntennaPanel, _name, getattr(_PatternMixin, _name))
    setattr(AntennaArray, _name, getattr(_PatternMixin, _name))


# ============================================================ field evaluation
def rotation_matrix(orientation) -> np.ndarray:
    """Forward composite rotation (TR 38.901 Eq. 7.1-4); host-side."""
    if not np.any(orientation):
        return np.eye(3)
    sa, sb, sg = np.sin(orientation)
    ca, cb, cg = np.cos(orientation)
    return np.asarray([
        [ca * cb, ca * sb * sg - sa * cg, ca * sb * cg + sa * sg],
        [sa * cb, sa * sb * sg + ca * cg, sa * sb * cg - ca * sg],
        [-sb, cb * sg, cb * cg]], np.float64)


def antenna_spec(antenna) -> dict:
    """Extract the static arrays a jitted field evaluation needs.

    All elements must share the radiation pattern (they may differ in
    position/polAngle — the panel/array construction guarantees this).
    """
    els = antenna.elements() if not isinstance(antenna, AntennaElement) else [antenna]
    e0 = els[0]
    pos = (antenna.positions() if not isinstance(antenna, AntennaElement)
           else e0.positions())
    return dict(
        positions=pos,                                           # (nEl, 3)
        polAngles=np.asarray([e.polAngle for e in els], np.float64),
        polModel=e0.polModel,
        beamWidth=np.asarray(e0.beamWidth, np.float64),
        slaV=e0.verticalSidelobeAttenuation,
        maxAtten=e0.maxAttenuation,
        maxGain=e0.mainMaxGain,
    )


def elements_fields(spec: dict, theta, phi, orientation):
    """Per-element polarized global fields + location phase factors.

    Pure jnp (jit/vmap-safe). Args:
      spec: from :func:`antenna_spec`.
      theta, phi: global zenith/azimuth angles (radians), any shape A.
      orientation: (alpha, beta, gamma) radians (static tuple/array).

    Returns:
      field: (nEl, 2, *A) complex-free real fields (V/H polarization).
      locFactor: (nEl, *A) complex location phase exp(j*2pi*rHat.pos).

    TPU note: callers flatten trailing (clusters, rays) angle grids into one
    minor axis before calling (20 rays as the lane dim wastes 108/128 lanes).
    """
    theta = jnp.asarray(theta)
    phi = jnp.asarray(phi)

    def col(a):  # (k,) -> (k, *1s) broadcastable against angle-shaped arrays
        return a.reshape(a.shape + (1,) * theta.ndim)
    r = jnp.asarray(rotation_matrix(np.asarray(orientation, np.float64)),
                    dtype=theta.dtype)

    sinT, cosT = jnp.sin(theta), jnp.cos(theta)
    sinP, cosP = jnp.sin(phi), jnp.cos(phi)
    rHat = jnp.stack([sinT * cosP, sinT * sinP, cosT])           # (3, n, m)

    # local angles (Eqs. 7.1-7 / 7.1-8 via inverse rotation: r is orthogonal)
    proj = jnp.einsum("iv,i...->v...", r, rHat)
    thetaLocal = jnp.arccos(jnp.clip(proj[2], -1.0, 1.0))
    phiLocal = jnp.arctan2(proj[1], proj[0])
    phiLocal = jnp.where((thetaLocal == 0) | (thetaLocal == jnp.pi), 0.0, phiLocal)

    # psi: angular displacement between local/global polarization bases (7.1-12)
    thetaHat = jnp.stack([cosT * cosP, cosT * sinP, -sinT])      # (3, n, m)
    phiHat = jnp.stack([-sinP, cosP, jnp.zeros_like(cosP)])
    cosTL = jnp.cos(thetaLocal)
    thetaHatLocal = jnp.stack([cosTL * jnp.cos(phiLocal),
                               cosTL * jnp.sin(phiLocal),
                               -jnp.sin(thetaLocal)])            # (3, n, m)
    rotTHL = jnp.einsum("ij,j...->i...", r, thetaHatLocal)
    psi = jnp.arctan2(jnp.sum(phiHat * rotTHL, 0), jnp.sum(thetaHat * rotTHL, 0))

    # element pattern at local angles (shared), per-element polarization slant
    thetaLocDeg = thetaLocal * (180.0 / jnp.pi)
    phiLocDeg = phiLocal * (180.0 / jnp.pi)
    av = -jnp.minimum(12 * ((thetaLocDeg - 90.0) / spec["beamWidth"][0]) ** 2,
                      spec["slaV"])
    if spec["beamWidth"][1] == 360:
        ah = jnp.zeros_like(phiLocDeg)
    else:
        ah = -jnp.minimum(12 * (phiLocDeg / spec["beamWidth"][1]) ** 2,
                          spec["maxAtten"])
    patternDb = -jnp.minimum(-(av + ah), spec["maxAtten"]) + spec["maxGain"]
    f = 10.0 ** (patternDb / 20.0)                               # (n, m)

    zeta = jnp.asarray(spec["polAngles"] * np.pi / 180.0, dtype=theta.dtype)
    if spec["polModel"] == 1:
        # Model-1 (TR 38.901 Eq. 7.3-3) evaluated elementwise at the LOCAL
        # angles. polAngle 0 / +-180 shortcut matches antenna.py:1232-1233.
        cz = col(jnp.cos(zeta))
        sz = col(jnp.sin(zeta))
        sinTL, cosTLoc = jnp.sin(thetaLocal), jnp.cos(thetaLocal)
        sinPL, cosPL = jnp.sin(phiLocal), jnp.cos(phiLocal)
        denom = jnp.sqrt(jnp.clip(1 - (cz * cosTLoc - sz * sinPL * sinTL) ** 2,
                                  1e-12, None))
        cpsiE = (cz * sinTL + sz * sinPL * cosTLoc) / denom
        spsiE = sz * cosPL / denom
        straight = jnp.abs(jnp.abs(zeta) % jnp.pi) < 1e-12       # 0 or +-180 deg
        sign = jnp.where(col(jnp.abs(zeta)) > 1e-12, -1.0, 1.0)
        cpsiE = jnp.where(col(straight), sign, cpsiE)
        spsiE = jnp.where(col(straight), 0.0, spsiE)
        fThetaLocal = f[None] * cpsiE
        fPhiLocal = f[None] * spsiE
    else:
        fThetaLocal = f[None] * col(jnp.cos(zeta))               # (nEl, *A)
        fPhiLocal = f[None] * col(jnp.sin(zeta))

    field = jnp.stack([fThetaLocal * jnp.cos(psi) - fPhiLocal * jnp.sin(psi),
                       fThetaLocal * jnp.sin(psi) + fPhiLocal * jnp.cos(psi)],
                      axis=1)                                    # (nEl, 2, *A)

    posG = jnp.einsum("ij,ej->ie", r, jnp.asarray(spec["positions"],
                                                  dtype=theta.dtype))  # (3, nEl)
    locAngle = 2 * jnp.pi * jnp.einsum("i...,ie->e...", rHat, posG)
    locFactor = jnp.exp(1j * locAngle)                           # (nEl, *A)
    return field, locFactor
