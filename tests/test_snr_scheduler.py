"""SnrScheduler tests: cross-validated against the reference state machine
by running both on identical synthetic metric curves (see
tools/dev/cmp_snr.py for the generator)."""
import numpy as np
import pytest

from neoradium_tpu.sim.snr import SnrScheduler


def run(sched, metric):
    for snr in sched:
        sched.setData(metric(snr))
    return sched.getSnrsAndData()


def bler_curve(mid=3.0, width=2.0):
    """Smooth BLER-% style waterfall from 100 down to 0."""
    def f(snr):
        return float(np.clip(100 * (1 - (snr - mid + width) / (2 * width)), 0, 100))
    return f


def test_brackets_decreasing_metric():
    snrs, blers = run(SnrScheduler(snr0=-8, step=0.5), bler_curve())
    # all in-bracket points are inside the interesting range, sorted, step-spaced
    assert np.all(np.diff(snrs) > 0)
    assert blers[0] == 100.0 and blers[-1] == 0.0
    mids = blers[(blers > 0) & (blers < 100)]
    assert len(mids) >= 5          # the waterfall is actually traced


def test_brackets_from_above():
    snrs, blers = run(SnrScheduler(snr0=20, step=0.5), bler_curve())
    assert blers[0] == 100.0 and blers[-1] == 0.0


def test_increasing_metric_throughput():
    def thr(snr):
        return float(np.clip(50 * (snr - 1), 0, 100))
    snrs, ts = run(SnrScheduler(snr0=10, step=0.5, loSnrVal=0, hiSnrVal=100), thr)
    assert ts[0] == 0.0 and ts[-1] == 100.0


def test_extra_values_returned():
    sched = SnrScheduler(snr0=0, step=1.0)
    f = bler_curve()
    for snr in sched:
        sched.setData(f(snr), f(snr) / 10)
    snrs, blers, bers = sched.getSnrsAndData()
    assert np.allclose(bers, blers / 10)


def test_set_data_enforced():
    sched = SnrScheduler()
    next(sched)
    with pytest.raises(ValueError):
        next(sched)


def test_reset_reusable():
    sched = SnrScheduler(snr0=0, step=1.0)
    run(sched, bler_curve())
    sched.reset()
    snrs, blers = run(sched, bler_curve(mid=5.0))
    assert blers[0] == 100.0 and blers[-1] == 0.0


def test_checkpoint_resume(tmp_path):
    """A sweep interrupted mid-way resumes and produces the same curve."""
    import json
    import jax.numpy as jnp
    from neoradium_tpu.sim.checkpoint import run_checkpointed_sweep

    f = bler_curve()

    def point_fn(keys, snrDb):
        bler = f(float(snrDb))
        return dict(blockErrors=int(bler), blocks=100,
                    bitErrors=int(bler * 10), bits=1000)

    ck = str(tmp_path / "sweep.json")
    # full run (reference result)
    ref = run_checkpointed_sweep(point_fn, SnrScheduler(snr0=-8, step=0.5),
                                 None, str(tmp_path / "ref.json"))

    # interrupted run: stop after 5 points by raising
    sched = SnrScheduler(snr0=-8, step=0.5)
    count = [0]

    def failing_fn(keys, snrDb):
        count[0] += 1
        if count[0] > 5:
            raise KeyboardInterrupt
        return point_fn(keys, snrDb)

    try:
        run_checkpointed_sweep(failing_fn, sched, None, ck)
    except KeyboardInterrupt:
        pass
    assert json.load(open(ck))["scheduler"]["snrs"]
    # resume with a FRESH scheduler object
    out = run_checkpointed_sweep(point_fn, SnrScheduler(snr0=-8, step=0.5),
                                 None, ck)
    assert np.allclose(out[0], ref[0]) and np.allclose(out[1], ref[1])


def test_stage_timer():
    from neoradium_tpu.sim.checkpoint import StageTimer
    import time as _t
    with StageTimer() as t:
        with t.stage("work", items=100):
            _t.sleep(0.01)
    assert "work" in t.report()
