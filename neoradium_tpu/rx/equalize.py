"""MMSE equalization — batched small hermitian solves on the resource grid.

Behavioral parity: reference ``neoradium/grid.py:626-694`` (equalize): MMSE
weights W = (H^H H + nv I)^-1 H^H applied per RE, with per-RE LLR scale
1/diag((H^H H + nv I)^-1).real. The reference switches to an SVD route when
Nr > Nl (grid.py:678-685) — mathematically identical to the hermitian-inverse
formula used here for all shapes, which maps better to batched TPU linalg.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils import herm


def inv_hpd_small(a: jnp.ndarray) -> jnp.ndarray:
    """Inverse of small batched hermitian positive-definite matrices
    (..., n, n) via a statically-unrolled Gauss-Jordan sweep.

    TPU-critical: ``jnp.linalg.inv`` lowers tiny batched inversions to a
    generic LU path that runs ~15x slower than the rest of the PDSCH
    pipeline combined; this unrolled elimination is pure fused elementwise
    VPU work. No pivoting — A = H^H H + nv I is HPD, so diagonal pivots
    stay bounded away from zero.
    """
    n = a.shape[-1]
    if n == 1:
        return 1.0 / a
    if n == 2:
        a00 = a[..., 0, 0]
        a01 = a[..., 0, 1]
        a10 = a[..., 1, 0]
        a11 = a[..., 1, 1]
        det = a00 * a11 - a01 * a10
        row0 = jnp.stack([a11, -a01], axis=-1)
        row1 = jnp.stack([-a10, a00], axis=-1)
        return jnp.stack([row0, row1], axis=-2) / det[..., None, None]
    # general small n: Gauss-Jordan on [A | I], loop unrolled at trace time
    m = jnp.concatenate([a, jnp.broadcast_to(
        jnp.eye(n, dtype=a.dtype), a.shape)], axis=-1)        # (..., n, 2n)
    for i in range(n):
        pivot = m[..., i:i + 1, :] / m[..., i:i + 1, i:i + 1]
        factors = m[..., :, i:i + 1]
        m = m - factors * pivot
        # restore the pivot row (it zeroed itself above)
        m = m.at[..., i, :].set(pivot[..., 0, :])
    return m[..., n:]


def _inv_components(a, n):
    """Inverse of an HPD matrix given as an n x n nested list of (broadcast-
    compatible) component arrays. Returns the same nested-list form.

    Closed forms for n=1/2, unrolled no-pivot Gauss-Jordan otherwise — every
    operation is elementwise over the component arrays (the big (L, K) plane),
    which is the TPU-friendly layout (see grid.py SoA note).
    """
    if n == 1:
        return [[1.0 / a[0][0]]]
    if n == 2:
        det = a[0][0] * a[1][1] - a[0][1] * a[1][0]
        return [[a[1][1] / det, -a[0][1] / det],
                [-a[1][0] / det, a[0][0] / det]]
    # Gauss-Jordan on [A | I] over component arrays, unrolled at trace time.
    dt = jnp.result_type(a[0][0])
    m = [list(a[i]) + [jnp.asarray(1.0 if i == j else 0.0, dt)
                       for j in range(n)] for i in range(n)]
    for i in range(n):
        piv = 1.0 / m[i][i]
        m[i] = [x * piv for x in m[i]]
        for r in range(n):
            if r == i:
                continue
            fac = m[r][i]
            m[r] = [m[r][j] - fac * m[i][j] for j in range(2 * n)]
    return [row[n:] for row in m]


def mmse_equalize(rxGrid: jnp.ndarray, hf: jnp.ndarray, noiseVar):
    """Equalize a received grid with a (possibly precoded) channel estimate.

    Args:
      rxGrid: (..., Nr, L, K) received resource grid.
      hf: (L, K, Nr, Nl) or (..., L, K, Nr, Nl) channel (including precoding
        when estimated from DMRS).
      noiseVar: scalar (traced ok) noise variance.

    Returns:
      eqGrid: (..., Nl, L, K) equalized symbols.
      llrScales: (..., Nl, L, K) real LLR scaling factors.

    TPU note: implemented structure-of-arrays — the tiny (Nr, Nl) matrix dims
    are unrolled in Python so every op is elementwise over the (L, K) plane
    (see grid.py SoA note; ~5x over the einsum/inv_hpd_small formulation).
    """
    nr, nl = hf.shape[-2], hf.shape[-1]
    nv = jnp.maximum(jnp.asarray(noiseVar, jnp.float32), 1e-8)
    if max(nr, nl) > 8:
        hh = jnp.einsum("...lkri,...lkrj->...lkij", jnp.conj(hf), hf)
        a = hh + nv * jnp.eye(nl, dtype=hf.dtype)
        ainv = inv_hpd_small(a)                               # (..., L, K, Nl, Nl)
        llrScale = (1.0 / jnp.diagonal(ainv, axis1=-2, axis2=-1)).real
        w = ainv @ herm(hf)                                   # (..., L, K, Nl, Nr)
        eq = jnp.einsum("...lkir,...rlk->...ilk", w, rxGrid)
        return eq, jnp.moveaxis(llrScale, -1, -3)
    h = [[hf[..., r, i] for i in range(nl)] for r in range(nr)]  # (..., L, K)
    hc = [[jnp.conj(h[r][i]) for i in range(nl)] for r in range(nr)]
    a = [[sum(hc[r][i] * h[r][j] for r in range(nr)) for j in range(nl)]
         for i in range(nl)]
    for i in range(nl):
        a[i][i] = a[i][i] + nv
    inv = _inv_components(a, nl)
    rxc = [rxGrid[..., r, :, :] for r in range(nr)]
    eq, scales = [], []
    for i in range(nl):
        w = [sum(inv[i][j] * hc[r][j] for j in range(nl)) for r in range(nr)]
        eq.append(sum(w[r] * rxc[r] for r in range(nr)))
        scales.append((1.0 / inv[i][i]).real)
    return jnp.stack(eq, axis=-3), jnp.stack(scales, axis=-3)
