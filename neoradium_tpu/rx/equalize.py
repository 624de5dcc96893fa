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
    """
    nl = hf.shape[-1]
    nv = jnp.maximum(jnp.asarray(noiseVar, jnp.float32), 1e-8)
    hh = jnp.einsum("...lkri,...lkrj->...lkij", jnp.conj(hf), hf)
    a = hh + nv * jnp.eye(nl, dtype=hf.dtype)
    ainv = jnp.linalg.inv(a)                                  # (..., L, K, Nl, Nl)
    llrScale = (1.0 / jnp.diagonal(ainv, axis1=-2, axis2=-1)).real
    w = ainv @ herm(hf)                                       # (..., L, K, Nl, Nr)
    eq = jnp.einsum("...lkir,...rlk->...ilk", w, rxGrid)
    scales = jnp.moveaxis(llrScale, -1, -3)                   # (..., Nl, L, K)
    return eq, scales
