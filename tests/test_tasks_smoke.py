"""Smoke tests: every reference task builds and steps without NaNs
(the reference uses its examples as manual smoke tests — SURVEY §4)."""
import numpy as np
import pytest

OVR = ["mppi.num_samples=16", "n_steps=3", "mppi.horizon=6"]


def _run(mod_run, **kw):
    m = mod_run(overrides=OVR, randomize=False, **kw)
    assert m.steps >= 1
    _assert_finite(m)
    return m


def _assert_finite(m):
    assert m.final_state_finite, "world sim state went non-finite (NaN/Inf)"
    assert np.isfinite(m.path_length)


@pytest.mark.slow
def test_panda_reach():
    from mppiisaac_tpu.tasks import panda_reach

    _run(panda_reach.run, task="panda")


@pytest.mark.slow
def test_panda_effort():
    from mppiisaac_tpu.tasks import panda_reach

    _run(panda_reach.run, task="panda_effort")


def test_panda_pick():
    from mppiisaac_tpu.tasks import panda_pick

    _run(panda_pick.run)


@pytest.mark.slow
def test_panda_stick_push():
    from mppiisaac_tpu.tasks import panda_stick_push

    _run(panda_stick_push.run)


def test_boxer_reach():
    from mppiisaac_tpu.tasks import mobile_reach

    _run(mobile_reach.run, robot="boxer")


@pytest.mark.slow
def test_heijn_reach():
    from mppiisaac_tpu.tasks import mobile_reach

    _run(mobile_reach.run, robot="heijn")


@pytest.mark.slow
def test_boxer_push():
    from mppiisaac_tpu.tasks import mobile_push

    _run(mobile_push.run, robot="boxer")


@pytest.mark.slow
def test_heijn_push():
    from mppiisaac_tpu.tasks import mobile_push

    _run(mobile_push.run, robot="heijn")


@pytest.mark.slow
def test_omni_panda_pick():
    from mppiisaac_tpu.tasks import omni_panda_pick

    _run(omni_panda_pick.run)


@pytest.mark.slow
def test_albert():
    from mppiisaac_tpu.tasks import albert

    _run(albert.run)


@pytest.mark.slow
def test_anymal():
    from mppiisaac_tpu.tasks import anymal

    _run(anymal.run)


def test_multi_pointbot():
    from mppiisaac_tpu.tasks import multi_robot

    m = multi_robot.run(overrides=OVR, randomize=False)
    assert m.steps >= 1


def test_multi_jackal():
    """The multi-jackal config is executable (r3 verdict item 8: the task yaml
    existed but the runner hard-coded multi_pointbot). Two diff-drive robots,
    4-dim joint control space (v, ω per robot —
    reference `conf/mppi/multi-jackal.yaml`)."""
    from mppiisaac_tpu.tasks import multi_robot

    m = multi_robot.run_jackal(overrides=OVR, randomize=False)
    assert m.steps >= 1
    _assert_finite(m)
