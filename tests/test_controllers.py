"""Controller-stack tests: tuning values, closed-loop convergence on device,
and behavior parity spot-checks against the reference cascade design
(``/root/reference/src/gem_controllers/``)."""

import jax
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg
from gym_electric_motor_tpu.controllers import GemController


def closed_loop_final(env_id, ref_state, ref_value, n_steps, key=0):
    env = gemx.make_functional(
        env_id, reference_generator=rg.ConstReference(ref_state, reference_value=ref_value)
    )
    ctrl = GemController.make(env, env_id)
    out = ctrl.control_environment(env, n_steps, key=jax.random.PRNGKey(key))
    idx = env.state_names.index(ref_state)
    final = float(np.asarray(out["states"][-100:, idx]).mean())
    terminated = bool(np.asarray(out["terminations"]).any())
    return final, terminated


# ---------------- tuning ----------------


def test_symmetric_optimum_gains_permex():
    env = gemx.make_functional("Cont-CC-PermExDc-v0")
    ctrl = GemController.make(env, "Cont-CC-PermExDc-v0", a=4)
    mp = env.physical_system.motor.parameter
    tau = env.tau
    # p = l/(tau*a), i = p/(tau*a^2)  (pi_controller.py:60-86)
    np.testing.assert_allclose(ctrl.cc_p_gain, mp["l_a"] / (tau * 4))
    np.testing.assert_allclose(ctrl.cc_i_gain, ctrl.cc_p_gain / (tau * 16))


def test_speed_controller_gains():
    env = gemx.make_functional("Cont-SC-PermExDc-v0")
    ctrl = GemController.make(env, "Cont-SC-PermExDc-v0", a=4)
    j_total = env.physical_system.load.j_load + env.physical_system.motor.parameter["j_rotor"]
    t_n = float(np.min(ctrl.cc_p_gain / ctrl.cc_i_gain))
    np.testing.assert_allclose(ctrl.sc_p_gain, j_total / (4 * t_n), rtol=1e-6)


def test_pmsm_ops_tables_built():
    env = gemx.make_functional("Cont-TC-PMSM-v0")
    ctrl = GemController.make(env, "Cont-TC-PMSM-v0")
    pp = ctrl.ops_params
    assert pp["mtpc"].shape == (250, 4)
    assert pp["i_d_lut"].shape == (250, 250)
    # MTPC current magnitudes grow with |torque|
    mags = np.hypot(pp["mtpc"][:, 1], pp["mtpc"][:, 2])
    assert mags[0] > mags[125]  # extreme torque needs more current than zero


def test_dfim_unsupported():
    env = gemx.make_functional("Cont-CC-DFIM-v0")
    with pytest.raises(NotImplementedError):
        GemController.make(env, "Cont-CC-DFIM-v0")


# ---------------- closed loop ----------------


@pytest.mark.parametrize("env_id,ref_state,val,steps,tol", [
    ("Cont-CC-PermExDc-v0", "i", 0.3, 1500, 0.02),
    ("Cont-TC-SeriesDc-v0", "torque", 0.4, 3000, 0.02),
    ("Cont-SC-PermExDc-v0", "omega", 0.5, 8000, 0.02),
    ("Cont-SC-ShuntDc-v0", "omega", 0.4, 12000, 0.02),
    ("Cont-TC-PMSM-v0", "torque", 0.3, 3000, 0.02),
    ("Cont-SC-PMSM-v0", "omega", 0.3, 10000, 0.03),
    ("Cont-TC-SynRM-v0", "torque", 0.3, 3000, 0.05),
])
def test_cont_convergence(env_id, ref_state, val, steps, tol):
    final, terminated = closed_loop_final(env_id, ref_state, val, steps)
    assert not terminated, f"{env_id} terminated"
    assert abs(final - val) < tol, f"{env_id}: {final} vs {val}"


@pytest.mark.parametrize("env_id,ref_state,val,steps,tol", [
    ("Finite-CC-PermExDc-v0", "i", 0.3, 2000, 0.05),
    ("Finite-CC-PMSM-v0", "i_sq", 0.2, 2000, 0.05),
])
def test_finite_convergence(env_id, ref_state, val, steps, tol):
    """Discrete (bang-bang) output stages still track current references."""
    env = gemx.make_functional(
        env_id,
        reference_generator=(
            rg.ReferenceSpec([rg.ConstReference("i_sd", reference_value=0.0),
                              rg.ConstReference("i_sq", reference_value=val)])
            if env_id == "Finite-CC-PMSM-v0"
            else rg.ConstReference(ref_state, reference_value=val)
        ),
    )
    ctrl = GemController.make(env, env_id)
    out = ctrl.control_environment(env, steps, key=jax.random.PRNGKey(0))
    idx = env.state_names.index(ref_state)
    final = float(np.asarray(out["states"][-200:, idx]).mean())
    assert abs(final - val) < tol, f"{env_id}: {final} vs {val}"


def test_vectorized_controller():
    """The controller vmaps over an env batch (the scale-out path)."""
    env_id = "Cont-CC-PermExDc-v0"
    env = gemx.make_functional(
        env_id, reference_generator=rg.ConstReference("i", reference_value=0.25)
    )
    ctrl = GemController.make(env, env_id)
    out = ctrl.control_environment(env, 800, key=jax.random.PRNGKey(1), n_envs=8)
    states = np.asarray(out["states"])  # (8, 800, n)
    assert states.shape[0] == 8
    idx = env.state_names.index("i")
    finals = states[:, -50:, idx].mean(axis=1)
    np.testing.assert_allclose(finals, 0.25, atol=0.02)
