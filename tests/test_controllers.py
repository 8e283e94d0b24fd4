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


def test_dfim_requires_flux_observer():
    """DFIM control (an extension — the reference crashes with a KeyError at
    parameter_reader.voltages['DFIM']) is field-oriented and rejects envs
    without the FluxObserver wrapper, like SCIM."""
    env = gemx.make_functional("Cont-CC-DFIM-v0")
    with pytest.raises(ValueError, match="FluxObserver"):
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


# ---------------- SCIM / EESM ----------------
# NOTE: in the reference, GemController.make crashes at tune time for every
# AC-motor torque/speed task (SquaredClippingStage.action_range returns [] and
# torque_controller.py:117 indexes it), so there is no upstream closed-loop
# ground truth for these; this port keeps the documented cascade design and
# verifies convergence directly.


def _scim_env(env_id, ref):
    from gym_electric_motor_tpu import wrappers as wr

    return gemx.make_functional(env_id, physical_system_wrappers=(wr.FluxObserver(),),
                                reference_generator=ref)


def test_scim_current_control():
    env = _scim_env("Cont-CC-SCIM-v0", rg.ReferenceSpec([
        rg.ConstReference("i_sd", reference_value=0.3),
        rg.ConstReference("i_sq", reference_value=0.2),
    ]))
    ctrl = GemController.make(env, "Cont-CC-SCIM-v0")
    out = ctrl.control_environment(env, 4000, key=jax.random.PRNGKey(0))
    S = np.asarray(out["states"])
    sd, sq = env.state_names.index("i_sd"), env.state_names.index("i_sq")
    np.testing.assert_allclose(S[-100:, sd].mean(), 0.3, atol=0.02)
    np.testing.assert_allclose(S[-100:, sq].mean(), 0.2, atol=0.02)


def test_scim_torque_control():
    env = _scim_env("Cont-TC-SCIM-v0", rg.ConstReference("torque", reference_value=0.4))
    ctrl = GemController.make(env, "Cont-TC-SCIM-v0")
    out = ctrl.control_environment(env, 8000, key=jax.random.PRNGKey(1))
    tq = env.state_names.index("torque")
    final = float(np.asarray(out["states"])[-100:, tq].mean())
    # the flux-observer-fed flux controller converges slowly; accept coarse
    # tracking and the right sign/magnitude
    assert 0.25 < final < 0.5, final


# ---------------- DFIM (extension: no upstream controller exists) ----------
# The rotor converter is held at zero differential voltage (a hard rotor
# short), under which the DFIM physics reduces exactly to the squirrel-cage
# machine, and the stator runs the SCIM field-oriented cascade with
# DFIM-specific robustness fixes (true converter-ceiling voltage budget,
# bounded modulation integrator, speed-aware torque ceiling, magnetization
# floor, model-based flux controller) — see controllers/readers.py and
# induction_eesm_ops.py.


def test_dfim_current_control():
    env = _scim_env("Cont-CC-DFIM-v0", rg.ReferenceSpec([
        rg.ConstReference("i_sd", reference_value=0.3),
        rg.ConstReference("i_sq", reference_value=0.2),
    ]))
    ctrl = GemController.make(env, "Cont-CC-DFIM-v0")
    out = ctrl.control_environment(env, 4000, key=jax.random.PRNGKey(0))
    S = np.asarray(out["states"])
    sd, sq = env.state_names.index("i_sd"), env.state_names.index("i_sq")
    np.testing.assert_allclose(S[-100:, sd].mean(), 0.3, atol=0.02)
    np.testing.assert_allclose(S[-100:, sq].mean(), 0.2, atol=0.02)
    assert not np.asarray(out["terminations"]).any()


def test_dfim_finite_current_control():
    """Finite variant: stator B6 bridge switched by the cascade, rotor B6
    held at subaction (all-lower) = zero line-to-line voltage."""
    env = _scim_env("Finite-CC-DFIM-v0", rg.ReferenceSpec([
        rg.ConstReference("i_sd", reference_value=0.3),
        rg.ConstReference("i_sq", reference_value=0.2),
    ]))
    ctrl = GemController.make(env, "Finite-CC-DFIM-v0")
    out = ctrl.control_environment(env, 6000, key=jax.random.PRNGKey(0))
    S = np.asarray(out["states"])
    sd, sq = env.state_names.index("i_sd"), env.state_names.index("i_sq")
    np.testing.assert_allclose(S[-200:, sd].mean(), 0.3, atol=0.03)
    np.testing.assert_allclose(S[-200:, sq].mean(), 0.2, atol=0.03)


def test_dfim_torque_control():
    env = _scim_env("Cont-TC-DFIM-v0", rg.ConstReference("torque", reference_value=0.3))
    ctrl = GemController.make(env, "Cont-TC-DFIM-v0")
    out = ctrl.control_environment(env, 10000, key=jax.random.PRNGKey(0))
    tq = env.state_names.index("torque")
    final = float(np.asarray(out["states"])[-200:, tq].mean())
    np.testing.assert_allclose(final, 0.3, atol=0.03)
    assert not np.asarray(out["terminations"]).any()


def test_dfim_speed_control():
    env = _scim_env("Cont-SC-DFIM-v0", rg.ConstReference("omega", reference_value=0.5))
    ctrl = GemController.make(env, "Cont-SC-DFIM-v0")
    out = ctrl.control_environment(env, 15000, key=jax.random.PRNGKey(0))
    om = env.state_names.index("omega")
    final = float(np.asarray(out["states"])[-200:, om].mean())
    np.testing.assert_allclose(final, 0.5, atol=0.02)
    assert not np.asarray(out["terminations"]).any()


def test_dfim_finite_speed_control():
    """Finite-SC (tau=1e-5, B6 two-level switching) converges like Cont-SC."""
    env = _scim_env("Finite-SC-DFIM-v0", rg.ConstReference("omega", reference_value=0.5))
    ctrl = GemController.make(env, "Finite-SC-DFIM-v0")
    out = ctrl.control_environment(env, 50000, key=jax.random.PRNGKey(0))
    om = env.state_names.index("omega")
    final = float(np.asarray(out["states"])[-500:, om].mean())
    np.testing.assert_allclose(final, 0.5, atol=0.03)
    assert not np.asarray(out["terminations"]).any()


def test_dfim_finite_torque_control_tracks():
    """Finite-TC-DFIM tracks the torque reference to ~99% (round 4; was
    ~45%).  Root cause, established by an isolating experiment (the same
    cascade through a CONTINUOUS ideal-modulator converter at the same
    tau=1e-5 tracked 0.299/0.3, so neither the cascade nor a physical B6
    ceiling was the limiter): the FOC modulation controller read the raw
    per-cycle applied |u_dq| — under two-level switching that is ALWAYS
    the full vector magnitude (a ~ 1.33 > a_max), so its integrator wound
    to the floor and crushed the flux command to the 15% magnetization
    floor (measured i_sd at 40% of its reference while i_sq tracked).
    Fix: PT1-filter the dq voltage COMPONENTS (quasi-DC in the field
    frame) over ~100 switching cycles before forming the modulation index
    (pmsm_ops._modulation_control, ``a_filter_tau``) — filtering |u|
    would still read E[|u|] ~ 1.33.  The reference crashes at tune time
    for every finite AC torque task, so there is no upstream baseline."""
    env = _scim_env("Finite-TC-DFIM-v0", rg.ConstReference("torque", reference_value=0.3))
    ctrl = GemController.make(env, "Finite-TC-DFIM-v0")
    out = ctrl.control_environment(env, 20000, key=jax.random.PRNGKey(0))
    tq = env.state_names.index("torque")
    final = float(np.asarray(out["states"])[-500:, tq].mean())
    np.testing.assert_allclose(final, 0.3, atol=0.03)
    assert not np.asarray(out["terminations"]).any()


def test_finite_tc_cont_equivalence_isolating_experiment():
    """The isolating experiment behind the round-4 modulation-filter fix,
    committed as a regression guard: the SAME cascade through the
    continuous (ideal-modulator) converter at the finite env's tau=1e-5
    tracks the torque reference — proving any future finite-path tracking
    deficit is a modulation/measurement artifact, not a cascade or
    physical converter ceiling."""
    from gym_electric_motor_tpu import wrappers as wr
    env = gemx.make_functional(
        "Cont-TC-DFIM-v0", tau=1e-5,
        physical_system_wrappers=(wr.FluxObserver(),),
        reference_generator=rg.ConstReference("torque", reference_value=0.3))
    ctrl = GemController.make(env, "Cont-TC-DFIM-v0")
    out = ctrl.control_environment(env, 20000, key=jax.random.PRNGKey(0))
    tq = env.state_names.index("torque")
    final = float(np.asarray(out["states"])[-500:, tq].mean())
    np.testing.assert_allclose(final, 0.3, atol=0.03)
    assert not np.asarray(out["terminations"]).any()


def test_eesm_torque_controller_matches_reference_first_action():
    """The reference EESM controller diverges on its own env (terminates at
    step ~18), so closed-loop comparison is moot; instead pin the first
    controller output, which was verified to match the reference bit-for-bit
    ([2.602, -1.043, -1.559, 1.086] from the same initial state)."""
    env = gemx.make_functional("Cont-TC-EESM-v0",
                               reference_generator=rg.ConstReference("torque", reference_value=0.3))
    ctrl = GemController.make(env, "Cont-TC-EESM-v0")
    state, (obs, ref_obs) = env.reset(jax.random.PRNGKey(0))
    cs = ctrl.reset()
    cs, action = ctrl.control(cs, obs, ref_obs)
    a = np.asarray(action)
    assert a.shape == (4,)
    np.testing.assert_allclose(a, [2.602, -1.043, -1.559, 1.086], atol=0.05)


def test_three_point_controller():
    """Bang-bang current control with a hysteresis band
    (three_point_controller.py) still tracks the reference."""
    # Finite env (tau=1e-5): one full-voltage step slews ~30A, inside the
    # hysteresis regime; at Cont tau=1e-4 bang-bang overshoots the limit in a
    # single step (as it would in the reference)
    env = gemx.make_functional(
        "Finite-CC-PermExDc-v0",
        reference_generator=rg.ConstReference("i", reference_value=0.3),
    )
    ctrl = GemController.make(env, "Finite-CC-PermExDc-v0",
                              base_current_controller="ThreePoint")
    out = ctrl.control_environment(env, 3000, key=jax.random.PRNGKey(0))
    idx = env.state_names.index("i")
    final = float(np.asarray(out["states"][-500:, idx]).mean())
    assert abs(final - 0.3) < 0.06, final


def test_block_diagram():
    from gym_electric_motor_tpu.controllers.block_diagram import build_block_diagram

    env = gemx.make_functional("Cont-SC-PMSM-v0")
    ctrl = GemController.make(env, "Cont-SC-PMSM-v0")
    import tempfile, os
    path = os.path.join(tempfile.mkdtemp(), "bd.png")
    fig = build_block_diagram(ctrl, save_as=path)
    assert fig is not None and os.path.getsize(path) > 5000
