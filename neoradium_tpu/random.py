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


class NrGen1(np.random.RandomState):
    """Legacy RandomState + bits/awgn (reference random.py:190-195).

    With an integer seed this matches MATLAB's default RNG stream
    (``rng(seed)`` → ``rand``), which the reference uses for
    MATLAB-comparison tests."""

    def integers(self, low, high=None, size=None, dtype=np.int64):
        return self.randint(low, high, size, dtype)

    def bits(self, size):
        return self.randint(0, 2, size, dtype=np.int8)

    def awgn(self, shape, noiseStd):
        g = self.normal(0, noiseStd / np.sqrt(2), tuple(shape) + (2,))
        return g[..., 0] + 1j * g[..., 1]


class NrGen2(np.random.Generator):
    """NumPy Generator + bits/awgn/randint (reference random.py:198-203)."""

    def randint(self, low, high=None, size=None, dtype=int):
        return self.integers(low, high, size, dtype)

    def bits(self, size):
        return self.integers(0, 2, size, dtype=np.int8)

    def awgn(self, shape, noiseStd):
        g = self.normal(0, noiseStd / np.sqrt(2), tuple(shape) + (2,))
        return g[..., 0] + 1j * g[..., 1]


class RanGen:
    """Host RNG facade (reference random.py:206-318): delegates every method
    to the wrapped generator; ``getGenerator``/``setSeed`` select among
    PCG64 (default), any NumPy BitGenerator (MT19937/Philox/SFC64), Generator,
    or legacy RandomState (MATLAB-compatible)."""

    def __init__(self, generator=None):
        self.generator = self.getGenerator() if generator is None else generator

    @staticmethod
    def getGenerator(seed=None):
        if seed is None:
            return NrGen2(np.random.PCG64())
        if isinstance(seed, (int, np.integer)):
            return NrGen2(np.random.PCG64(seed))
        if isinstance(seed, np.random.BitGenerator):
            return NrGen2(seed)
        if isinstance(seed, np.random.RandomState):
            g = NrGen1()
            g.set_state(seed.get_state())
            return g
        if isinstance(seed, np.random.Generator):
            return NrGen2(seed.bit_generator)
        raise ValueError(f"Unsupported seed type {type(seed)!r}")

    def setSeed(self, seed):
        self.generator = self.getGenerator(seed)

    def __getattr__(self, name):
        return getattr(self.generator, name)


# Global host generator (mirrors the reference's module-level ``random``)
random = RanGen()
HostRanGen = RanGen  # back-compat alias
