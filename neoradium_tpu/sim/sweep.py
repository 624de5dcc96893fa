"""Monte-Carlo BER/BLER sweeps sharded over a device mesh.

TPU design (SURVEY.md §2 parallelism inventory): the reference's triple loop
(est-method x SNR x slots, SURVEY.md §3.2) becomes a data-parallel surface:
trials are vmapped and sharded across a 1-D or 2-D ``jax.sharding.Mesh``
(axes: 'snr' x 'trial'); error counters reduce with an all-reduce that XLA
derives from the sharded->replicated output sharding (rides ICI within a
slice). One compilation serves every SNR point (SNR is a traced argument).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_trial_keys(seed: int, numTrials: int) -> jax.Array:
    return jax.random.split(jax.random.PRNGKey(seed), numTrials)


def make_point_fn(trial_fn):
    """Build jitted fn: (keys (N,2), snrDb scalar) -> summed metric dict."""
    def point(keys, snrDb):
        metrics = jax.vmap(lambda k: trial_fn(k, snrDb))(keys)
        # int32 sums: per-point counts stay far below 2^31 (split very large
        # trial counts across multiple calls; the host loop accumulates ints).
        return {k: jnp.sum(v, dtype=jnp.int32) for k, v in metrics.items()}
    return jax.jit(point)


def run_bler_point(trial_fn, snrDb: float, numTrials: int, seed: int = 123,
                   mesh: Mesh | None = None, point_fn=None):
    """Run ``numTrials`` independent slots at one SNR; returns summed counters.

    With a mesh, trial keys are sharded over the 'trial' axis; XLA inserts the
    psum for the replicated sums.
    """
    if point_fn is None:
        point_fn = make_point_fn(trial_fn)
    keys = make_trial_keys(seed, numTrials)
    if mesh is not None:
        keys = jax.device_put(keys, NamedSharding(mesh, P("trial")))
    out = point_fn(keys, jnp.float32(snrDb))
    return {k: int(v) for k, v in out.items()}


def run_bler_sweep(trial_fn, snrDbs, numTrials: int, seed: int = 123,
                   mesh: Mesh | None = None):
    """Sweep SNR points (host loop, like the reference's SnrScheduler usage);
    one compile is reused for all points. Returns dict of metric curves."""
    point_fn = make_point_fn(trial_fn)
    results = {}
    for snr in snrDbs:
        r = run_bler_point(trial_fn, snr, numTrials, seed, mesh, point_fn)
        for k, v in r.items():
            results.setdefault(k, []).append(v)
    results["snrDbs"] = list(snrDbs)
    results["ber"] = [be / max(b, 1) for be, b in zip(results["bitErrors"], results["bits"])]
    results["bler"] = [be / max(b, 1) for be, b in zip(results["blockErrors"], results["blocks"])]
    return results


def build_grid_fn(trial_fn, snrDbs, numTrials: int, seed: int = 123,
                  mesh: Mesh | None = None):
    """Build the jitted 2-D grid function + placed inputs used by
    :func:`run_bler_grid`. Exposed so tooling can lower/compile the same
    program for cost analysis (see tools/bench_scaling.py).

    Layout note: the grid runs as ONE FLAT vmap over (key, snr) pairs
    (snr-major), with the per-SNR counter sums as a reshape + axis sum at
    the end — NOT as vmap(snr) of vmap(trial). The nested form prepends a
    small leading snr dim to every buffer of every trial, which measured
    3.1x slower on a real v5e at (2, 768) vs the flat (1536,) program
    (the flat layout is exactly the headline bench's). Sharding: the flat
    axis shards over ('snr', 'trial') jointly; with nSnr divisible by the
    snr-axis size (enforced) the per-device chunks are whole trial blocks
    of single SNR points and the final reshape stays local."""
    snrList = list(snrDbs)
    nSnr = len(snrList)
    keys = jnp.broadcast_to(
        make_trial_keys(seed, numTrials),
        (nSnr, numTrials, 2)).reshape(nSnr * numTrials, 2)
    snrs = jnp.repeat(jnp.asarray(snrList, jnp.float32), numTrials)

    def grid(keys, snrs):
        m = jax.vmap(trial_fn)(keys, snrs)
        return {k: jnp.sum(v.reshape((nSnr, numTrials) + v.shape[1:]),
                           axis=1, dtype=jnp.int32) for k, v in m.items()}

    if mesh is not None:
        if "snr" in mesh.axis_names:
            nS = mesh.shape["snr"]
            if nSnr % nS or numTrials % mesh.shape["trial"]:
                raise ValueError(
                    f"nSnr ({nSnr}) and numTrials ({numTrials}) must divide "
                    f"the mesh axes {dict(mesh.shape)}")
            flatSh = NamedSharding(mesh, P(("snr", "trial")))
            outSh = NamedSharding(mesh, P("snr"))
        else:
            flatSh = NamedSharding(mesh, P("trial"))
            outSh = NamedSharding(mesh, P())
        metricKeys = jax.eval_shape(
            trial_fn, jax.random.PRNGKey(0), jnp.float32(0.0)).keys()
        gridj = jax.jit(grid, in_shardings=(flatSh, flatSh),
                        out_shardings={k: outSh for k in metricKeys})
        keys = jax.device_put(keys, flatSh)
        snrs = jax.device_put(snrs, flatSh)
    else:
        gridj = jax.jit(grid)
    return gridj, keys, snrs


def run_bler_grid(trial_fn, snrDbs, numTrials: int, seed: int = 123,
                  mesh: Mesh | None = None):
    """The whole SNR sweep as ONE sharded call over a 2-D (snr x trial) mesh.

    The reference's outer SNR loop and inner slot loop (SURVEY.md §3.2)
    both become data parallelism: trial keys shard over the mesh's 'trial'
    axis and SNR points over its 'snr' axis; the per-point counter sums
    reduce over 'trial' via the XLA-derived all-reduce (rides ICI within a
    slice). Uses the same per-point trial keys as :func:`run_bler_sweep`.

    Determinism contract: the grid is a DIFFERENT compiled graph from the
    host-loop's per-point function (an extra vmapped SNR axis changes XLA's
    fusion/tiling), and XLA does not guarantee bitwise-identical float
    rounding across compilations. Structural counters (``bits``, ``blocks``,
    ``cbs``) are exact; error counters (``bitErrors``, ``blockErrors``,
    ``cbErrors``) agree except that a *marginal* decode — one the LDPC
    decoder barely wins or loses — may flip with the last-ulp rounding of
    its LLR chain, machine- and XLA-version-dependently. Both paths are
    individually deterministic (same machine, same jax: rerunning
    reproduces the counters bit for bit); the tolerance is only across the
    two compilations. See tests/test_link_e2e.py::test_grid_sweep_matches
    _host_loop for the quantified gate.

    Returns the same curve dict as :func:`run_bler_sweep`.
    """
    gridj, keys, snrs = build_grid_fn(trial_fn, snrDbs, numTrials, seed, mesh)
    out = {k: np.asarray(v) for k, v in gridj(keys, snrs).items()}
    snrDbs = list(snrDbs)
    results = {k: [int(x) for x in v] for k, v in out.items()}
    results["snrDbs"] = snrDbs
    results["ber"] = [be / max(b, 1) for be, b in
                      zip(results["bitErrors"], results["bits"])]
    results["bler"] = [be / max(b, 1) for be, b in
                       zip(results["blockErrors"], results["blocks"])]
    return results


def default_mesh(shape: tuple[int, ...] = None, axes: tuple[str, ...] = ("trial",)):
    """Create a mesh over all available devices (1-D 'trial' by default;
    pass e.g. shape=(2, 4), axes=('snr', 'trial') for a 2-D sweep mesh)."""
    devs = np.array(jax.devices())
    if shape is None:
        shape = (len(devs),)
    return Mesh(devs.reshape(shape), axes)
