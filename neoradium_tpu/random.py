"""Random number generation.

Device path: a thin facade over ``jax.random`` (threefry counter-based keys),
with per-(trial, slot, purpose) key folding so that Monte-Carlo trials sharded
across a mesh draw independent, reproducible streams without any cross-device
communication.

Host path: NumPy PCG64 generator compatible with the reference's default RNG
(reference ``random.py:198-269``) — used for golden-test reproduction and
host-side dataset generation where bit-matching matters.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class PRNG:
    """Functional RNG facade over jax.random.

    Typical use::

        rng = PRNG(123)
        k = rng.key(trial=3, slot=7, purpose="awgn")
        noise = PRNG.awgn_from_key(k, shape, std)
    """

    # Stable purpose tags -> fold constants
    _PURPOSES = {"bits": 1, "awgn": 2, "channel": 3, "phases": 4, "coupling": 5,
                 "doppler": 6, "data": 7, "misc": 8}

    def __init__(self, seed: int = 0):
        self.seed = int(seed)
        self._root = jax.random.PRNGKey(self.seed)

    def key(self, trial: int | jnp.ndarray = 0, slot: int | jnp.ndarray = 0,
            purpose: str = "misc") -> jax.Array:
        k = jax.random.fold_in(self._root, self._PURPOSES[purpose])
        k = jax.random.fold_in(k, trial)
        return jax.random.fold_in(k, slot)

    # ------------------------------------------------------------- samplers
    @staticmethod
    def bits_from_key(key: jax.Array, n, dtype=jnp.int8) -> jnp.ndarray:
        shape = (n,) if isinstance(n, int) else tuple(n)
        return jax.random.bernoulli(key, 0.5, shape).astype(dtype)

    @staticmethod
    def awgn_from_key(key: jax.Array, shape, std=1.0) -> jnp.ndarray:
        """Circularly-symmetric complex Gaussian with E|x|^2 = std^2."""
        kr, ki = jax.random.split(key)
        s = jnp.asarray(std, jnp.float32) / jnp.sqrt(2.0).astype(jnp.float32)
        re = jax.random.normal(kr, shape, dtype=jnp.float32) * s
        im = jax.random.normal(ki, shape, dtype=jnp.float32) * s
        return (re + 1j * im).astype(jnp.complex64)

    def bits(self, n, trial=0, slot=0) -> jnp.ndarray:
        return self.bits_from_key(self.key(trial, slot, "bits"), n)

    def awgn(self, shape, std=1.0, trial=0, slot=0) -> jnp.ndarray:
        return self.awgn_from_key(self.key(trial, slot, "awgn"), shape, std)


class HostRanGen:
    """Host NumPy generator matching the reference's default (PCG64) semantics.

    reference random.py: ``bits(n)`` = integers in {0,1}; ``awgn(shape, sigma)``
    = (normal(0, sigma, shape+(2,)) * [1, 1j]).sum(-1)/sqrt(2).
    """

    def __init__(self, seed: int | None = None):
        self.setSeed(seed)

    def setSeed(self, seed):
        self.gen = np.random.Generator(np.random.PCG64(seed))

    def bits(self, n) -> np.ndarray:
        return self.gen.integers(0, 2, size=n, dtype=np.int8)

    def awgn(self, shape, sigma=1.0) -> np.ndarray:
        g = self.gen.normal(0, sigma, tuple(shape) + (2,))
        return (g[..., 0] + 1j * g[..., 1]) / np.sqrt(2)

    def normal(self, loc, scale, size) -> np.ndarray:
        return self.gen.normal(loc, scale, size)

    def uniform(self, lo, hi, size=None) -> np.ndarray:
        return self.gen.uniform(lo, hi, size)

    def permutation(self, x) -> np.ndarray:
        return self.gen.permutation(x)

    def integers(self, lo, hi, size=None):
        return self.gen.integers(lo, hi, size)


# Global host generator (mirrors the reference's module-level ``random`` object)
random = HostRanGen()
