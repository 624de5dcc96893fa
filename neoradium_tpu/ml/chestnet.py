"""ChEstNet — residual CNN channel estimator (TPU-native flax/optax).

The reference trains this network with PyTorch in its Playground
(``Playground/MLChEst/MLChestTrainTorch.ipynb``): three bottleneck residual
blocks (1x1 -> kxk -> 1x1 convolutions with BatchNorm, zero-init on the last
BN scale so each block starts as identity) over a (L, K, 2) real/imag image
of the noisy LS channel estimate, followed by a 3x3 projection back to two
channels; MSE loss against the true channel, Adam with an exponentially
decaying learning rate. This module is the same architecture implemented
flax-native so data generation, training, and evaluation all run jitted on
TPU (the reference generates data with NumPy and trains with torch on CPU).

Usage: see ``examples/ml_chest_train.py`` and :func:`make_train_state` /
:func:`train_epoch` / :func:`evaluate` below.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax


class ResBlock(nn.Module):
    """Bottleneck residual block: 1x1 -> kxk -> 1x1 with BatchNorm."""
    midDepth: int
    outDepth: int
    kernel: Sequence[int] = (3, 3)

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9)
        y = nn.Conv(self.midDepth, (1, 1))(x)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.midDepth, tuple(self.kernel), padding="SAME")(y)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.outDepth, (1, 1))(y)
        # zero-init scale: block starts as identity (reference NN init)
        y = norm(scale_init=nn.initializers.zeros)(y)
        if x.shape[-1] != self.outDepth:
            x = norm()(nn.Conv(self.outDepth, (1, 1))(x))
        return nn.relu(x + y)


class ChEstNet(nn.Module):
    """(batch, L, K, 2) noisy LS estimate -> (batch, L, K, 2) denoised.

    Deviation from the reference net (MLChestTrainTorch.ipynb): a global
    residual connection — the CNN predicts the *correction* to the LS input
    rather than the full channel. The reference's final conv starts the
    model at zero output, so it must first re-learn the identity over many
    epochs; with the skip it starts AT the LS estimate and only learns the
    denoising, converging in a few epochs to below-LS NMSE.
    """

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = ResBlock(16, 64, (9, 11))(x, train)
        y = ResBlock(16, 64, (3, 7))(y, train)
        y = ResBlock(16, 64, (3, 7))(y, train)
        return x + nn.Conv(2, (3, 3), padding="SAME",
                           kernel_init=nn.initializers.zeros)(y)


# ------------------------------------------------------------------ training
def complex_to_image(h: np.ndarray) -> np.ndarray:
    """(N, L, K) complex channels -> (N, L, K, 2) float32 images."""
    return np.stack([h.real, h.imag], axis=-1).astype(np.float32)


def image_to_complex(img: jnp.ndarray) -> jnp.ndarray:
    return img[..., 0] + 1j * img[..., 1]


def make_train_state(key, sampleShape, numEpochs: int = 100,
                     stepsPerEpoch: int = 1, lr=(1e-4, 1e-6)):
    """Initialize (params, batch_stats, optimizer state).

    lr: (first, last) exponential decay over numEpochs (reference schedule),
    or a scalar constant rate.
    """
    model = ChEstNet()
    variables = model.init(key, jnp.zeros((1,) + tuple(sampleShape)), True)
    if isinstance(lr, tuple):
        lr0, lr1 = lr
        sched = optax.exponential_decay(
            lr0, max(1, (numEpochs - 1) * stepsPerEpoch),
            lr1 / lr0, staircase=False)
    else:
        sched = lr
    tx = optax.adam(sched)
    return dict(model=model, params=variables["params"],
                batch_stats=variables["batch_stats"],
                opt_state=tx.init(variables["params"]), tx=tx)


def train_epoch(state: dict, x: jnp.ndarray, y: jnp.ndarray,
                batchSize: int, key) -> tuple[dict, float]:
    """One shuffled epoch of MSE training; returns (state, mean loss)."""
    model, tx = state["model"], state["tx"]
    n = x.shape[0]
    steps = n // batchSize
    perm = jax.random.permutation(key, n)[: steps * batchSize]
    perm = perm.reshape(steps, batchSize)

    @jax.jit
    def step(params, batch_stats, opt_state, xb, yb):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, xb, True,
                mutable=["batch_stats"])
            return jnp.mean((out - yb) ** 2), updates["batch_stats"]
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), new_stats, opt_state, loss

    losses = []
    for i in range(steps):
        xb, yb = x[perm[i]], y[perm[i]]
        state["params"], state["batch_stats"], state["opt_state"], loss = step(
            state["params"], state["batch_stats"], state["opt_state"], xb, yb)
        losses.append(loss)
    return state, float(jnp.mean(jnp.stack(losses)))


def evaluate(state: dict, x: jnp.ndarray, y: jnp.ndarray) -> float:
    """Mean MSE in eval mode (running BatchNorm statistics)."""
    out = state["model"].apply(
        {"params": state["params"], "batch_stats": state["batch_stats"]},
        x, False)
    return float(jnp.mean((out - y) ** 2))


def predict(state: dict, x: jnp.ndarray) -> jnp.ndarray:
    return state["model"].apply(
        {"params": state["params"], "batch_stats": state["batch_stats"]},
        x, False)


# --------------------------------------------------------- pipeline adapter
class MlChannelEstimator:
    """Drop-in estimator: LS estimate -> ChEstNet denoising.

    Wraps an :class:`~neoradium_tpu.rx.chest.LsChannelEstimator` and a
    trained ChEstNet state so the refined estimator plugs straight into
    ``PdschLinkSim(chEst=MlChannelEstimator(ls, state))`` — the
    reference's SelfRefining receiver composition
    (Playground/Research/SelfRefining/MLChEstEvaluateBLER.ipynb), where
    the trained network replaces the interpolated LS estimate inside the
    end-to-end BLER/HARQ pipelines.

    ``estimate`` keeps the LS estimator's contract: rxGrid (..., Nr, L, K)
    -> (hEst (..., L, K, Nr, Np), noiseVar). Each (rx, port) subchannel
    goes through the network as one (L, K, 2) real image; jit/vmap-safe
    (pure flax apply in eval mode).
    """

    def __init__(self, lsEstimator, state: dict):
        self.ls = lsEstimator
        self.model = state["model"]
        self.variables = {"params": state["params"],
                          "batch_stats": state["batch_stats"]}

    def estimate(self, rxGrid: jnp.ndarray):
        hLs, nv = self.ls.estimate(rxGrid)           # (..., L, K, Nr, Np)
        lead = hLs.shape[:-4]
        L, K, nr, pp = hLs.shape[-4:]
        x = hLs.reshape((-1, L, K, nr, pp))
        x = jnp.transpose(x, (0, 3, 4, 1, 2))        # (N, Nr, Np, L, K)
        img = jnp.stack([x.real, x.imag], axis=-1).reshape(-1, L, K, 2)
        out = self.model.apply(self.variables, img, False)
        h = (out[..., 0] + 1j * out[..., 1]).reshape(-1, nr, pp, L, K)
        h = jnp.transpose(h, (0, 3, 4, 1, 2))        # (N, L, K, Nr, Np)
        return h.reshape(lead + (L, K, nr, pp)).astype(hLs.dtype), nv
