"""Resource grid: RE-type bookkeeping (host) + functional grid ops (device).

TPU design split (cf. SURVEY.md §7): the reference's stateful ``Grid`` object
(``grid.py:47``) carrying per-RE type bytes and string descriptors becomes:

- ``HostGrid``: a NumPy planning structure used ONLY at config time to compute
  static index sets (pilot positions, data positions, reserved REs). It mirrors
  the reference's typed ``__setitem__`` semantics (grid.py:321-340) so the
  allocation *order* — which defines codeword-to-RE mapping — is identical.
- Pure jitted device functions operating on plain complex arrays
  (..., P, L, K): ``precode``, ``apply_channel``, ``add_noise``/power helpers.

RE content types follow the reference registry (grid.py:56-77).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .utils import toLinear

RE_TYPES = ["UNASSIGNED", "RESERVED", "NO_DATA", "DMRS", "PTRS", "CSIRS_NZP",
            "CSIRS_ZP", "DATA", "PDSCH", "PDCCH", "PUSCH", "PUCCH",
            "PRECODED_MIX", "RX_DATA"]
_MAX_CUSTOM_RE_TYPES = 20  # reference grid.py:257-268 reserves 20 custom slots
# 14 built-in + 20 custom-slot colors for drawMap
_RET_COLORS = ["#d0d0d0", "#404040", "#a0a0a0", "#2b8cbe", "#88419d",
               "#e34a33", "#fdbb84", "#31a354", "#238b45", "#636363",
               "#969696", "#bdbdbd", "#fec44f", "#c994c7",
               "#1b9e77", "#d95f02", "#7570b3", "#e7298a", "#66a61e",
               "#e6ab02", "#a6761d", "#666666", "#8dd3c7", "#ffffb3",
               "#bebada", "#fb8072", "#80b1d3", "#fdb462", "#b3de69",
               "#fccde5", "#d9d9d9", "#bc80bd", "#ccebc5", "#ffed6f"]
RET = {name: i for i, name in enumerate(RE_TYPES)}


def retRegister(name: str) -> int:
    """Register a custom RE content type and return its id.

    Mirrors the reference's ``Grid.retRegister`` (grid.py:257-268): user code
    can tag REs with application-defined types (e.g. "SSB", "PDCCH_DMRS") in
    up to 20 extra slots beyond the built-in registry. Registration is
    idempotent: re-registering an existing name returns its existing id.
    """
    name = str(name).upper()
    if name in RET:
        return RET[name]
    if len(RE_TYPES) >= len(_RET_COLORS):
        raise ValueError(f"RE-type registry full "
                         f"({len(RE_TYPES) - 14}/{_MAX_CUSTOM_RE_TYPES} "
                         f"custom types registered)")
    RE_TYPES.append(name)
    rid = len(RE_TYPES) - 1
    RET[name] = rid
    return rid


class HostGrid:
    """Host-side planning grid: complex values + RE-type ids (NumPy only).

    With ``useReDesc=True`` every assignment also records a per-RE string
    descriptor (reference grid.py:187-191, 324-341) — a debugging aid for
    inspecting exactly what landed on each resource element."""

    def __init__(self, numPlanes: int, numSymbols: int, numSubcarriers: int,
                 useReDesc: bool = False):
        self.grid = np.zeros((numPlanes, numSymbols, numSubcarriers), np.complex128)
        self.reTypeIds = np.full((numPlanes, numSymbols, numSubcarriers),
                                 RET["UNASSIGNED"], np.uint8)
        self.reDesc = (np.full(self.grid.shape, "UNASSIGNED", np.dtype("<U20"))
                       if useReDesc else None)

    @property
    def shape(self):
        return self.grid.shape

    def set(self, p, l, k, value, retName: str, desc: str | None = None):
        self.grid[p, l, k] = value
        self.reTypeIds[p, l, k] = RET[retName]
        if self.reDesc is not None:
            self.reDesc[p, l, k] = desc if desc is not None else retName

    def re_type_at(self, p, l, k) -> str:
        return RE_TYPES[self.reTypeIds[p, l, k]]

    def re_desc_at(self, p, l, k) -> str:
        if self.reDesc is None:
            raise ValueError("Grid was built without useReDesc=True")
        return str(self.reDesc[p, l, k])

    def indexes_of(self, retName: str):
        return np.where(self.reTypeIds == RET[retName])

    def stats(self) -> dict:
        out = {"GridSize": int(self.grid.size)}
        for name, rid in RET.items():
            n = int(np.count_nonzero(self.reTypeIds == rid))
            if n:
                out[name] = n
        return out

    def drawMap(self, ports=(0,), reRange=(0, 12), title=None, ax=None):
        """Color-coded RE map per port (reference grid.py:1190-1246);
        requires matplotlib."""
        import matplotlib.pyplot as plt
        import matplotlib.patches as mpatches
        from matplotlib.colors import ListedColormap
        k0, k1 = reRange
        colors = _RET_COLORS
        cmap = ListedColormap(colors[: len(RE_TYPES)])
        axes = []
        for p in ports:
            if ax is None:
                _, a = plt.subplots(figsize=(8, 3))
            else:
                a = ax
            img = self.reTypeIds[p, :, k0:k1]
            a.imshow(img, aspect="auto", cmap=cmap, vmin=0,
                     vmax=len(RE_TYPES) - 1, origin="lower",
                     extent=[k0, k1, 0, img.shape[0]])
            present = sorted(set(img.flatten().tolist()))
            a.legend(handles=[mpatches.Patch(color=colors[t],
                                             label=RE_TYPES[t])
                              for t in present], loc="upper right",
                     fontsize=7)
            a.set_xlabel("Subcarrier")
            a.set_ylabel("Symbol")
            a.set_title(title or f"Port {p}")
            axes.append(a)
        return axes if len(axes) > 1 else axes[0]


# ---------------------------------------------------------------- device ops
# TPU layout note: einsums whose contraction/output dims are tiny (Nt/Nr/Nl
# of 1-8) place that tiny dim minor-most, wasting the 128-wide lane dimension
# of the VPU/MXU tiling. For small antenna counts we instead unroll the tiny
# dims in Python ("structure of arrays"): every op is then elementwise over
# the big (L, K) plane and XLA fuses the whole chain. Measured 4.7x on the
# precode+channel+MMSE chain of the headline bench (v5.6, 2026-08).
_SOA_UNROLL_MAX = 16


def precode(grid: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Apply precoder to grid (..., Nl, L, K).

    f: (Nt, Nl) wideband, or (K, Nt, Nl) per-subcarrier (PRG precoding
    expanded to subcarriers host-side). Returns (..., Nt, L, K).
    Parity: reference grid.py:456-518.
    """
    nt, nl = f.shape[-2], f.shape[-1]
    if max(nt, nl) > _SOA_UNROLL_MAX:
        if f.ndim == 2:
            return jnp.einsum("tl,...lsk->...tsk", f, grid)
        return jnp.einsum("ktl,...lsk->...tsk", f, grid)
    # SoA: f component is a scalar (wideband) or a (K,) vector (per-PRG),
    # both broadcast against the (..., L, K) layer planes.
    fc = (lambda t, i: f[t, i]) if f.ndim == 2 else (lambda t, i: f[:, t, i])
    layers = [grid[..., i, :, :] for i in range(nl)]
    return jnp.stack(
        [sum(fc(t, i) * layers[i] for i in range(nl)) for t in range(nt)],
        axis=-3)


def apply_channel_freq(grid: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Frequency-domain channel: grid (..., Nt, L, K) x h (..., L, K, Nr, Nt)
    -> (..., Nr, L, K). Parity: reference grid.py:978-1018."""
    nr, nt = h.shape[-2], h.shape[-1]
    if max(nr, nt) > _SOA_UNROLL_MAX:
        return jnp.einsum("...lkrt,...tlk->...rlk", h, grid)
    planes = [grid[..., t, :, :] for t in range(nt)]
    return jnp.stack(
        [sum(h[..., r, t] * planes[t] for t in range(nt)) for r in range(nr)],
        axis=-3)


def grid_re_power(grid: jnp.ndarray, nFFT: int) -> jnp.ndarray:
    """Average RE power convention of reference grid.py:1021-1025 (var/nFFT^2)."""
    x = grid.reshape(grid.shape[:-3] + (-1,))
    mean = jnp.mean(x, axis=-1, keepdims=True)
    return jnp.mean(jnp.abs(x - mean) ** 2, axis=-1) / (nFFT ** 2)


def grid_noise_std(grid: jnp.ndarray, snr: float) -> jnp.ndarray:
    """Noise std for a target linear SNR using measured grid power
    (reference grid.py:1028-1046)."""
    x = grid.reshape(grid.shape[:-3] + (-1,))
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.abs(x - mean) ** 2, axis=-1)
    return jnp.sqrt(var / snr)


def noise_std_for_grid_snr(snrDb: float, numRx: int) -> float:
    """MATLAB-convention grid noise std: sigma^2 = 1/(Nr * SNR)
    (reference grid.py:1184)."""
    return float(1.0 / np.sqrt(toLinear(snrDb) * numRx))


def noise_std_for_waveform_snr(snrDb: float, numRx: int, nFFT: int) -> float:
    """MATLAB-convention waveform noise std: sigma^2 = 1/(Nr * nFFT * SNR)
    (reference waveform.py:289)."""
    return float(1.0 / np.sqrt(toLinear(snrDb) * numRx * nFFT))
