"""Classic (secondary) controller stack: automated design, symmetric-optimum
tuning, and closed-loop behavior for every supported family.

Mirrors the coverage the reference gets from
``examples/classic_controllers/integration_test_classic_controllers_dc_motor.py``
plus the per-motor example scripts.  Known upstream quirks are *pinned* (the
classic cascade's stale-state P error makes some configs settle off-reference
or violate limits — verified against the live upstream implementation in
``tests/test_classic_cross_parity.py``)."""

import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg
from gym_electric_motor_tpu.classic import (Controller,
                                            automated_controller_design)
from gym_electric_motor_tpu.classic.controller import _env_data
from gym_electric_motor_tpu.references import ConstReference, ReferenceSpec


def _multiref(*pairs):
    return ReferenceSpec([ConstReference(n, v) for n, v in pairs])


def _run(env_id, refname, gen, n, **make_kw):
    env = gemx.make_functional(env_id, reference_generator=gen, **make_kw)
    ctrl = Controller.make(env)
    out = ctrl.control_environment(env, n)
    names = list(env.physical_system.state_names)
    s = np.asarray(out["states"])
    r = np.asarray(out["references"])
    ri = list(env.reference_names).index(refname)
    err = np.abs(s[-500:, names.index(refname)] - r[-500:, ri]).mean()
    viol = int(np.asarray(out["terminations"]).sum())
    return ctrl, err, viol, s, names


# ---------------------------------------------------------------------------
# Automated design tables (classic_controllers.py:187-296)
# ---------------------------------------------------------------------------

DESIGN_CASES = [
    ("Cont-CC-PermExDc-v0", None, "pi_controller", 1),
    ("Finite-CC-PermExDc-v0", None, "three_point", 1),
    ("Cont-SC-PermExDc-v0", None, "cascaded_controller", 2),
    ("Finite-TC-SeriesDc-v0", None, "cascaded_controller", 2),
    ("Cont-CC-PMSM-v0", _multiref(("i_sd", 0.0), ("i_sq", 0.2)), "foc_controller", 1),
    ("Cont-TC-PMSM-v0", None, "cascaded_foc_controller", 1),
    ("Cont-SC-PMSM-v0", None, "cascaded_foc_controller", 2),
    ("Finite-SC-SynRM-v0", None, "cascaded_foc_controller", 4),
    ("Cont-CC-SCIM-v0", _multiref(("i_sd", 0.2), ("i_sq", 0.2)), "foc_rotor_flux_observer", 1),
    ("Cont-SC-SCIM-v0", None, "cascaded_foc_rotor_flux_observer", 2),
]


@pytest.mark.parametrize("env_id,gen,expected_type,n_stages", DESIGN_CASES)
def test_automated_design(env_id, gen, expected_type, n_stages):
    env = gemx.make_functional(env_id, **(
        {"reference_generator": gen} if gen is not None else {}))
    ctype, stages = automated_controller_design(_env_data(env))
    assert ctype == expected_type
    assert len(stages) == n_stages


def test_symmetric_optimum_gains():
    """SO current-loop tuning (classic_controllers.py:380-386): the PermExDc
    PI gets p = L/(tau a) * i_lim/u_lim, i = p/(tau a^2)."""
    env = gemx.make_functional("Cont-CC-PermExDc-v0")
    ctrl = Controller.make(env)
    d = _env_data(env)
    a, tau = 4.0, d["tau"]
    names = d["names"]
    p_exp = (d["mp"]["l_a"] / (tau * a) / d["limits"][names.index("u")]
             * d["limits"][names.index("i")])
    assert np.isclose(ctrl.stages["a"].p_gain, p_exp)
    assert np.isclose(ctrl.stages["a"].i_gain, p_exp / (tau * a**2))


def test_user_stages_override_gains():
    env = gemx.make_functional("Cont-CC-PermExDc-v0")
    ctrl = Controller.make(env, stages=[{"controller_type": "pi_controller",
                                         "p_gain": 3.0, "i_gain": 7.0}])
    assert ctrl.stages["a"].p_gain == 3.0
    assert ctrl.stages["a"].i_gain == 7.0


def test_pid_stage():
    env = gemx.make_functional("Cont-CC-PermExDc-v0",
                               reference_generator=ConstReference("i", 0.3))
    ctrl = Controller.make(env, stages=[{"controller_type": "pid_controller"}])
    # d gain defaults to p_gain * tau (classic_controllers.py:388-390)
    assert np.isclose(ctrl.stages["a"].d_gain,
                      ctrl.stages["a"].p_gain * env.physical_system.tau)
    err, viol, _, _ = _run_ctrl(env, ctrl, "i", 2000)
    assert err < 5e-3 and viol == 0


def _run_ctrl(env, ctrl, refname, n):
    out = ctrl.control_environment(env, n)
    names = list(env.physical_system.state_names)
    s = np.asarray(out["states"])
    r = np.asarray(out["references"])
    ri = list(env.reference_names).index(refname)
    err = np.abs(s[-300:, names.index(refname)] - r[-300:, ri]).mean()
    return err, int(np.asarray(out["terminations"]).sum()), s, names


# ---------------------------------------------------------------------------
# Closed-loop convergence (constant references)
# ---------------------------------------------------------------------------

CONVERGENCE = [
    # env_id, ref state, generator, steps, max tail error
    ("Cont-CC-PermExDc-v0", "i", ConstReference("i", 0.3), 2000, 1e-3),
    ("Cont-TC-SeriesDc-v0", "torque", ConstReference("torque", 0.3), 4000, 1e-3),
    ("Cont-TC-ExtExDc-v0", "torque", ConstReference("torque", 0.3), 4000, 1e-3),
    ("Cont-CC-ExtExDc-v0", "i_a", _multiref(("i_a", 0.3), ("i_e", 0.4)), 3000, 1e-3),
    ("Finite-CC-PermExDc-v0", "i", ConstReference("i", 0.3), 3000, 0.08),
    ("Finite-CC-ExtExDc-v0", "i_a", _multiref(("i_a", 0.3), ("i_e", 0.4)), 3000, 0.08),
    ("Cont-CC-PMSM-v0", "i_sq", _multiref(("i_sd", 0.0), ("i_sq", 0.3)), 3000, 1e-3),
    ("Cont-CC-SynRM-v0", "i_sq", _multiref(("i_sd", 0.3), ("i_sq", 0.2)), 3000, 1e-3),
    ("Finite-CC-PMSM-v0", "i_sq", _multiref(("i_sd", 0.0), ("i_sq", 0.3)), 3000, 0.05),
    ("Cont-TC-PMSM-v0", "torque", ConstReference("torque", 0.3), 4000, 5e-3),
    ("Cont-SC-PMSM-v0", "omega", ConstReference("omega", 0.3), 8000, 0.01),
    ("Cont-SC-SynRM-v0", "omega", ConstReference("omega", 0.3), 8000, 0.01),
    ("Finite-SC-PMSM-v0", "omega", ConstReference("omega", 0.3), 8000, 0.05),
    ("Finite-TC-SynRM-v0", "torque", ConstReference("torque", 0.3), 6000, 0.05),
    ("Cont-CC-SCIM-v0", "i_sq", _multiref(("i_sd", 0.3), ("i_sq", 0.2)), 3000, 5e-3),
]


@pytest.mark.parametrize("env_id,refname,gen,n,tol",
                         CONVERGENCE, ids=[c[0] for c in CONVERGENCE])
def test_convergence(env_id, refname, gen, n, tol):
    _, err, viol, _, _ = _run(env_id, refname, gen, n)
    assert err < tol, err
    assert viol == 0


def test_scim_torque_control_euler():
    """Matched-integrator check: with the euler plant the induction cascade
    tracks torque to <1% (the upstream oracle reaches 0.0049 on the same
    config)."""
    _, err, viol, _, _ = _run("Cont-TC-SCIM-v0", "torque",
                              ConstReference("torque", 0.3), 8000,
                              solver="euler")
    assert err < 0.01, err
    assert viol == 0


def test_scim_speed_control_euler():
    _, err, viol, _, _ = _run("Cont-SC-SCIM-v0", "omega",
                              ConstReference("omega", 0.3), 15000,
                              solver="euler")
    assert err < 0.05, err
    assert viol == 0


# ---------------------------------------------------------------------------
# Pinned upstream quirks (verified against the live reference classic stack
# in test_classic_cross_parity.py)
# ---------------------------------------------------------------------------

def test_dc_speed_cascade_settles_off_reference():
    """The classic DC cascade's outer P error is computed against the inner
    stage's state (cascaded_controller.py:147-151), so the speed loop settles
    at ~0.909 for a 0.3 reference — the upstream implementation does exactly
    the same (oracle tail mean 0.9091)."""
    _, _, viol, s, names = _run("Cont-SC-PermExDc-v0", "omega",
                                ConstReference("omega", 0.3), 10000)
    tail = s[-500:, names.index("omega")].mean()
    assert abs(tail - 0.9091) < 0.01, tail
    assert viol == 0


def test_scim_speed_cascade_violates_with_accurate_solver():
    """With the default rk4 plant the classic induction speed cascade drives
    i_sd away and violates the current limit near step ~3185 — the upstream
    oracle terminates at step 3183 on the same config."""
    env = gemx.make_functional("Cont-SC-SCIM-v0",
                               reference_generator=ConstReference("omega", 0.3))
    ctrl = Controller.make(env)
    out = ctrl.control_environment(env, 4000)
    term = np.asarray(out["terminations"])
    assert term.any()
    first = int(np.argmax(term))
    assert abs(first - 3185) < 100, first


# ---------------------------------------------------------------------------
# Loud errors for upstream-broken paths
# ---------------------------------------------------------------------------

def test_eesm_raises():
    env = gemx.make_functional("Cont-CC-EESM-v0")
    with pytest.raises(NotImplementedError, match="EESM"):
        Controller.make(env)


def test_dfim_raises():
    env = gemx.make_functional("Cont-CC-DFIM-v0")
    with pytest.raises(NotImplementedError, match="DFIM"):
        Controller.make(env)


def test_finite_induction_raises():
    env = gemx.make_functional("Finite-CC-SCIM-v0", reference_generator=_multiref(
        ("i_sd", 0.2), ("i_sq", 0.2)))
    with pytest.raises(NotImplementedError, match="induction"):
        Controller.make(env)


# ---------------------------------------------------------------------------
# Vectorized rollout
# ---------------------------------------------------------------------------

def test_vmapped_control_environment():
    import jax
    env = gemx.make_functional("Cont-CC-PermExDc-v0",
                               reference_generator=ConstReference("i", 0.3))
    ctrl = Controller.make(env)
    out = ctrl.control_environment(env, 500, key=jax.random.PRNGKey(1), n_envs=4)
    assert np.asarray(out["states"]).shape[0] == 4
    names = list(env.physical_system.state_names)
    err = np.abs(np.asarray(out["states"])[:, -100:, names.index("i")] - 0.3)
    assert err.mean() < 1e-2


# ---------------------------------------------------------------------------
# Flux weakening through the shared OPS engine (advisor fix, round 3)
# ---------------------------------------------------------------------------

def test_cascaded_foc_flux_weakening_high_speed():
    """The classic cascade hands the shared OPS engine the DENORMALIZED
    state (the engine's modulation controller compares physical |u_dq|
    against u_dc and builds the flux ceiling psi_max_ = u_dc/(sqrt(3)*w_el),
    foc_operation_point_selection.py:110-147).  At high speed that ceiling
    must bind: lower selected flux, more-negative i_sd.  With a normalized
    omega the ceiling is ~1000x too large and field weakening never engages
    — this test fails in that configuration."""
    import jax.numpy as jnp
    from gym_electric_motor_tpu.controllers.pmsm_ops import pmsm_ops_reset

    env = gemx.make_functional("Cont-TC-PMSM-v0")
    ctrl = Controller.make(env)
    d = _env_data(env)
    names = d["names"]
    pp = ctrl.ops.ops_params
    prm = ctrl.prm
    t_ref = 0.9 * prm["torque_lim"]

    def select(omega_norm):
        state = np.zeros(len(names))
        state[names.index("omega")] = omega_norm
        cs = dict(pmsm_ops_reset())
        idq = np.asarray(ctrl.ops_operating_point(cs, jnp.asarray(state), t_ref))
        psi = np.hypot(prm["psi_p"] + prm["l_d"] * idq[0], prm["l_q"] * idq[1])
        return idq, psi

    idq_lo, psi_lo = select(0.05)
    idq_hi, psi_hi = select(0.95)

    omega_hi = 0.95 * prm["omega_lim"]
    ceiling = pp["u_dc"] / (np.sqrt(3.0) * omega_hi * pp["p"])
    # low speed: the voltage ceiling sits far above the MTPC flux
    assert psi_lo > 1.5 * ceiling
    # high speed: selected flux respects the ceiling (+ bounded psi_delta
    # headroom) and the d-current is pushed further negative
    assert psi_hi <= ceiling + pp["psi_high"] + 1e-9
    assert idq_hi[0] < idq_lo[0] - 1e-3
    assert psi_hi < 0.9 * psi_lo


def test_find_controller_type_single_stage_sync_is_cascaded():
    """classic_controllers.py:157-164: any len(stages) != 2 sync config maps
    to the cascaded FOC type, even a one-element [[d, q]] with i_sq
    referenced (advisor fix, round 3)."""
    from gym_electric_motor_tpu.classic.controller import _find_controller_type
    env = gemx.make_functional(
        "Cont-CC-PMSM-v0", reference_generator=_multiref(("i_sd", 0.0),
                                                         ("i_sq", 0.2)))
    d = _env_data(env)
    stages = [[{"controller_type": "pi_controller"},
               {"controller_type": "pi_controller"}]]
    ctype, _ = _find_controller_type(d, stages)
    assert ctype == "cascaded_foc_controller"
