"""SRM commutation controller (EXTENSION — the reference has no SRM
controller because it stubs the whole family).

`GemController.make` routes SRM ids to `SRMCommutationController`:
position-based firing windows + hysteresis current regulation (finite)
or P + resistive-feed-forward duties (cont), a sqrt torque
linearization for TC, and an anti-windup PI speed loop for SC.
"""

import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg
from gym_electric_motor_tpu.controllers import (
    GemController,
    SRMCommutationController,
)


def test_make_routes_srm():
    env = gemx.make_functional("Finite-SC-SRM-v0")
    ctrl = GemController.make(env, "Finite-SC-SRM-v0")
    assert isinstance(ctrl, SRMCommutationController)
    assert ctrl.control_task == "SC"


def test_srm_cc_hysteresis_tracks():
    """Finite CC: each phase rides its hysteresis band around the
    referenced setpoint (steady error <= the band width), zero
    violations."""
    env = gemx.make_functional(
        "Finite-CC-SRM-v0",
        reference_generator=rg.ReferenceSpec(
            [rg.ConstReference("i_a", 0.4), rg.ConstReference("i_b", 0.2),
             rg.ConstReference("i_c", 0.3)]))
    ctrl = GemController.make(env, "Finite-CC-SRM-v0")
    out = ctrl.control_environment(env, 4000)
    st = np.asarray(out["states"])
    names = list(env.state_names)
    idx = [names.index(n) for n in ("i_a", "i_b", "i_c")]
    mean_i = st[-500:, idx].mean(axis=0)
    np.testing.assert_allclose(mean_i, [0.4, 0.2, 0.3], atol=0.04)
    assert np.asarray(out["terminations"]).sum() == 0


def test_srm_tc_torque_linearization():
    """Cont TC: single-pulse commutation + the sqrt linearization + the
    integral trim on the MEASURED torque hold the reference within ~2%
    (measured 0.3%); negative torque works too (fires the
    falling-inductance windows)."""
    for t_ref in (0.3, -0.25):
        env = gemx.make_functional(
            "Cont-TC-SRM-v0",
            reference_generator=rg.ConstReference("torque", t_ref))
        ctrl = GemController.make(env, "Cont-TC-SRM-v0")
        out = ctrl.control_environment(env, 4000)
        st = np.asarray(out["states"])
        tq = st[-500:, list(env.state_names).index("torque")].mean()
        np.testing.assert_allclose(tq, t_ref, rtol=0.02)
        assert np.asarray(out["terminations"]).sum() == 0


def test_srm_sc_speed_cascade_converges():
    """Finite SC: the PI speed loop + commutated torque stage reaches the
    speed setpoint exactly (measured 0.4000 at 160 ms) with zero
    violations from standstill."""
    env = gemx.make_functional(
        "Finite-SC-SRM-v0",
        reference_generator=rg.ConstReference("omega", 0.4))
    ctrl = GemController.make(env, "Finite-SC-SRM-v0")
    out = ctrl.control_environment(env, 16000)
    st = np.asarray(out["states"])
    assert abs(st[-200:, 0].mean() - 0.4) < 0.005
    assert np.asarray(out["terminations"]).sum() == 0


def test_srm_controller_vmapped_and_internals():
    """n_envs vmapping and collect_internals (torque*/i* cascade
    references) follow the GemController conventions."""
    env = gemx.make_functional(
        "Cont-SC-SRM-v0",
        reference_generator=rg.ConstReference("omega", 0.3))
    ctrl = GemController.make(env, "Cont-SC-SRM-v0")
    out = ctrl.control_environment(env, 500, n_envs=4,
                                   collect_internals=True)
    assert np.asarray(out["states"]).shape[0] == 4
    ints = out["cascade_references"]
    assert np.isfinite(np.asarray(ints["torque_star"])).all()
    assert np.asarray(ints["i_star"]).shape[-1] == 3
