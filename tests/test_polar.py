"""Polar coding golden tests vs the reference: parameter derivation,
encoder/rate-matcher bit-exactness, and SCL decoding (noisy goldens where
the reference decoder works; pure round-trips where it crashes — see
coding/polar.py module docstring for the documented reference bugs)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neoradium_tpu.coding.polar import (PolarConfig, PolarEncoder,
                                        PolarDecoder, scl_decode)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "polar.npz")

CASES = {
    "dci1": (32, 100, "DCI"), "dci2": (30, 600, "DCI"),
    "uci1": (12, 50, "UCI"), "uci2": (100, 300, "UCI"),
    "pbch": (24, 864, "PBCH"), "seg": (400, 2000, "UCI"),
    "short": (45, 120, "UCI"),
}


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.mark.parametrize("tag", list(CASES))
def test_parameter_derivation(tag, golden):
    a, e, dt = CASES[tag]
    cfg = PolarConfig(a, e, dt)
    assert np.array_equal(np.asarray(cfg.msgBits), golden[f"{tag}_msgBits"])
    assert np.array_equal(np.asarray(cfg.frozenBits), golden[f"{tag}_frozenBits"])


@pytest.mark.parametrize("tag", list(CASES))
def test_encode_chain_bit_exact(tag, golden):
    a, e, dt = CASES[tag]
    cfg = PolarConfig(a, e, dt)
    enc = PolarEncoder(cfg)
    txb = jnp.asarray(golden[f"{tag}_txb"])
    cbs = enc.segment(txb)
    assert np.array_equal(np.asarray(cbs), golden[f"{tag}_cbs"])
    coded = enc.encode(cbs)
    assert np.array_equal(np.asarray(coded), golden[f"{tag}_coded"])
    rm = enc.rate_match(coded)
    assert np.array_equal(np.asarray(rm), golden[f"{tag}_rm"].flatten())


@pytest.mark.parametrize("tag", [t for t in CASES if f"{t}_llrs" is not None])
def test_noisy_decode(tag, golden):
    if f"{tag}_llrs" not in golden:
        pytest.skip("repetition-mode reference decoder unavailable")
    a, e, dt = CASES[tag]
    cfg = PolarConfig(a, e, dt)
    dec = PolarDecoder(cfg)
    out, errs = dec.decode_tb(jnp.asarray(golden[f"{tag}_llrs"].flatten()))
    # our SCL must recover the payload wherever the reference did
    if int(golden[f"{tag}_errs"]) == 0:
        assert np.array_equal(np.asarray(out), golden[f"{tag}_txb"]), tag
        assert int(errs) == 0


@pytest.mark.parametrize("tag", ["dci2", "pbch"])
def test_repetition_roundtrip(tag, golden):
    """e >= N (reference decoder crashes here): clean round-trip through our
    soft-combining rate recovery."""
    a, e, dt = CASES[tag]
    cfg = PolarConfig(a, e, dt)
    assert cfg.rmMode == "repetition"
    dec = PolarDecoder(cfg)
    llrs = (1.0 - 2.0 * golden[f"{tag}_rm"].astype(np.float64)) * 5
    out, errs = dec.decode_tb(jnp.asarray(llrs.flatten()))
    assert np.array_equal(np.asarray(out), golden[f"{tag}_txb"])
    assert int(errs) == 0


def test_scl_corrects_errors():
    """SCL with list 8 corrects noisy LLRs that SC (list 1) cannot.
    Calibrated so list-1 decodes ~2/30 and list-8 ~8/30 at this SNR."""
    cfg = PolarConfig(32, 100, "DCI")
    enc = PolarEncoder(cfg)
    dec8 = PolarDecoder(cfg, sclListSize=8)
    dec1 = PolarDecoder(cfg, sclListSize=1)
    rng = np.random.default_rng(0)
    txbs = rng.integers(0, 2, (30, 32)).astype(np.int8)
    rm = np.asarray(enc.encode_tb(jnp.asarray(txbs)))
    llrs = (1 - 2 * rm.astype(np.float64)) * 2 + rng.normal(size=rm.shape) * 2
    out8, _ = jax.jit(dec8.decode_tb)(jnp.asarray(llrs))
    out1, _ = jax.jit(dec1.decode_tb)(jnp.asarray(llrs))
    n8 = int((np.asarray(out8) == txbs).all(1).sum())
    n1 = int((np.asarray(out1) == txbs).all(1).sum())
    assert n8 > n1, (n8, n1)      # list decoding strictly helps at this SNR


def test_decoder_batches():
    cfg = PolarConfig(24, 864, "PBCH")
    enc, dec = PolarEncoder(cfg), PolarDecoder(cfg)
    rng = np.random.default_rng(1)
    txbs = jnp.asarray(rng.integers(0, 2, (4, 24)).astype(np.int8))
    rm = enc.encode_tb(txbs)
    llrs = (1.0 - 2.0 * rm.astype(jnp.float32)) * 5
    out, errs = jax.jit(dec.decode_tb)(llrs)
    assert out.shape == (4, 24) and errs.shape == (4,)
    assert np.array_equal(np.asarray(out), np.asarray(txbs))


def test_nPCwm_config_usable():
    """nPCwm=1 UCI configs crash in the reference (polar.py:384); ours work."""
    cfg = PolarConfig(18, 250, "UCI")
    assert cfg.nPC == 3 and cfg.nPCwm == 1
    enc, dec = PolarEncoder(cfg), PolarDecoder(cfg)
    txb = jnp.asarray(np.random.default_rng(2).integers(0, 2, 18).astype(np.int8))
    rm = enc.encode_tb(txb)
    out, errs = dec.decode_tb((1.0 - 2.0 * rm.astype(jnp.float32)) * 5)
    assert np.array_equal(np.asarray(out), np.asarray(txb)) and int(errs) == 0


@pytest.mark.parametrize("tag", ["dci2", "pbch"])
def test_repetition_combining_is_encoder_consistent(tag, golden):
    """Anchor for the repetition soft-combine path (no reference anchor
    exists — the reference decoder crashes for e >= N): rate recovery must
    accumulate, for every coded bit n, exactly the LLRs of the transmit
    positions that the ENCODER's rate matching assigned to bit n. Extracting
    the encoder's position map via an arange probe makes the test fail if
    either side's interleaving or combining drifts."""
    a, e, dt = CASES[tag]
    cfg = PolarConfig(a, e, dt)
    enc, dec = PolarEncoder(cfg), PolarDecoder(cfg)
    n = cfg.polarCodeSize
    posMap = np.asarray(enc.rate_match(jnp.arange(n)[None])).reshape(-1)
    assert posMap.shape == (e,) and posMap.max() < n
    rng = np.random.default_rng(3)
    llrs = rng.normal(size=e)
    expected = np.zeros(n)
    np.add.at(expected, posMap, llrs)
    got = np.asarray(dec.recover_rate(jnp.asarray(llrs)))[0]
    assert np.abs(got - expected).max() < 1e-9


def test_repetition_combining_gain():
    """Soft combining must rescue bits whose FIRST copy is wrong: flip the
    base-copy LLRs of every repeated position (weight 1) and send the
    repeat with weight 3 — combined belief is correct (+2), single copy is
    wrong on all e-N repeated positions and must fail."""
    a, e, dt = CASES["dci2"]
    cfg = PolarConfig(a, e, dt)
    enc, dec = PolarEncoder(cfg), PolarDecoder(cfg)
    n = cfg.polarCodeSize
    posMap = np.asarray(enc.rate_match(jnp.arange(n)[None])).reshape(-1)
    rng = np.random.default_rng(11)
    txb = rng.integers(0, 2, a).astype(np.int8)
    rm = np.asarray(enc.encode_tb(jnp.asarray(txb))).flatten()
    good = (1.0 - 2.0 * rm) * 4.0
    llrs = good.copy()
    repeated = np.isin(posMap, posMap[n:])      # both copies of repeated bits
    firstCopy = repeated & (np.arange(e) < n)
    llrs[firstCopy] = -good[firstCopy] / 4.0    # wrong, weight 1
    llrs[n:] = good[n:] * 3.0 / 4.0             # right, weight 3
    out, errs = dec.decode_tb(jnp.asarray(llrs))
    assert int(errs) == 0 and np.array_equal(np.asarray(out), txb)
    # at the rate-recovery level the combining must have FLIPPED the belief
    # of every repeated bit (wrong weight-1 first copy + right weight-3
    # repeat -> net correct), while the single copy keeps the wrong sign
    codedBits = np.zeros(n, np.int8)
    codedBits[posMap] = rm            # coded bit value at each codeword idx
    repIdx = posMap[n:]
    rec = np.asarray(dec.recover_rate(jnp.asarray(llrs)))[0]
    single = llrs.copy()
    single[n:] = 0.0
    recSingle = np.asarray(dec.recover_rate(jnp.asarray(single)))[0]
    want = 1.0 - 2.0 * codedBits[repIdx]
    assert np.all(np.sign(rec[repIdx]) == want)
    assert np.all(np.sign(recSingle[repIdx]) == -want)
