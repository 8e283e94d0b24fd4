"""Trajectory-level parity for physical-system wrappers and non-ideal
supplies: both frameworks run the same env + wrapper/supply configuration
with matched Euler integrators in float64 and must produce identical
normalized state trajectories."""

import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rgx
from gym_electric_motor_tpu import wrappers as wrx
from gym_electric_motor_tpu.models import supplies as spx

N_STEPS = 80
RTOL = 1e-9
ATOL = 1e-11


def run_ref(reference_gem, env_id, actions, ref_state, *, wrappers=(), supply=None):
    from gym_electric_motor.physical_systems.solvers import EulerSolver
    from gym_electric_motor.reference_generators import ConstReferenceGenerator

    kwargs = dict(
        ode_solver=EulerSolver(),
        reference_generator=ConstReferenceGenerator(reference_state=ref_state,
                                                    reference_value=0.1),
    )
    if wrappers:
        kwargs["physical_system_wrappers"] = wrappers
    if supply is not None:
        kwargs["supply"] = supply
    env = reference_gem.make(env_id, **kwargs).unwrapped
    (s, _), _ = env.reset(seed=0)
    out = [s]
    for a in actions:
        (s, _), _r, term, *_ = env.step(a)
        out.append(s)
        if term:
            break
    return np.array(out), list(env.state_names)


def run_tpu(env_id, actions, ref_state, *, wrappers=(), supply=None):
    import jax

    with jax.enable_x64():
        import jax.numpy as jnp

        env = gemx.make_functional(
            env_id, solver="euler", dtype=jnp.float64,
            reference_generator=rgx.ConstReference(ref_state, reference_value=0.1),
            physical_system_wrappers=wrappers,
            supply=supply,
        )
        st, (s, _) = env.reset(jax.random.PRNGKey(0))
        out = [np.asarray(s)]
        for a in actions:
            st, (s, _), _r, tm = env.step(st, jnp.asarray(a))
            out.append(np.asarray(s))
            if bool(tm):
                break
    return np.array(out), env.state_names


def fin_actions(n=N_STEPS, n_act=8, seed=7):
    rng = np.random.default_rng(seed)
    return [int(rng.integers(n_act)) for _ in range(n)]


def assert_pair(ref, tpu, names_r, names_t):
    assert list(names_r) == list(names_t)
    assert ref.shape == tpu.shape
    np.testing.assert_allclose(tpu, ref, rtol=RTOL, atol=ATOL)


def test_cos_sin_processor_parity(reference_gem):
    from gym_electric_motor.physical_system_wrappers import CosSinProcessor

    acts = fin_actions()
    r, nr = run_ref(reference_gem, "Finite-CC-PMSM-v0", acts, "i_sq",
                    wrappers=(CosSinProcessor(),))
    t, nt = run_tpu("Finite-CC-PMSM-v0", acts, "i_sq",
                    wrappers=(wrx.CosSinProcessor(),))
    assert_pair(r, t, nr, nt)


def test_current_sum_processor_parity(reference_gem):
    from gym_electric_motor.physical_system_wrappers import CurrentSumProcessor

    acts = fin_actions(n_act=4)
    r, nr = run_ref(reference_gem, "Finite-CC-ExtExDc-v0",
                    [np.array([a, (a + 1) % 4]) for a in acts], "i_a",
                    wrappers=(CurrentSumProcessor(("i_a", "i_e")),))
    t, nt = run_tpu("Finite-CC-ExtExDc-v0",
                    [np.array([a, (a + 1) % 4]) for a in acts], "i_a",
                    wrappers=(wrx.CurrentSumProcessor(("i_a", "i_e")),))
    assert_pair(r, t, nr, nt)


def test_dead_time_processor_parity(reference_gem):
    from gym_electric_motor.physical_system_wrappers import DeadTimeProcessor

    acts = fin_actions(n_act=4)
    r, nr = run_ref(reference_gem, "Finite-CC-PermExDc-v0", acts, "i",
                    wrappers=(DeadTimeProcessor(),))
    t, nt = run_tpu("Finite-CC-PermExDc-v0", acts, "i",
                    wrappers=(wrx.DeadTimeProcessor(),))
    assert_pair(r, t, nr, nt)


def test_flux_observer_parity(reference_gem):
    from gym_electric_motor.physical_system_wrappers import FluxObserver

    rng = np.random.default_rng(3)
    acts = [rng.uniform(-1, 1, size=3) for _ in range(N_STEPS)]
    r, nr = run_ref(reference_gem, "Cont-CC-SCIM-v0", acts, "i_sq",
                    wrappers=(FluxObserver(),))
    t, nt = run_tpu("Cont-CC-SCIM-v0", acts, "i_sq",
                    wrappers=(wrx.FluxObserver(),))
    assert_pair(r, t, nr, nt)


def test_rc_supply_parity(reference_gem):
    import gym_electric_motor.physical_systems as rps

    acts = fin_actions(n_act=4)
    r, nr = run_ref(reference_gem, "Finite-CC-PermExDc-v0", acts, "i",
                    supply=rps.RCVoltageSupply(60.0, {"R": 1.0, "C": 4e-3}))
    t, nt = run_tpu("Finite-CC-PermExDc-v0", acts, "i",
                    supply=spx.rc_voltage_supply(60.0, {"R": 1.0, "C": 4e-3}))
    assert_pair(r, t, nr, nt)


def test_ac_supply_parity(reference_gem):
    """Fixed-phase AC supply so no RNG stream needs to match."""
    import gym_electric_motor.physical_systems as rps

    acts = fin_actions(n_act=4)
    r, nr = run_ref(reference_gem, "Finite-CC-PermExDc-v0", acts, "i",
                    supply=rps.AC1PhaseSupply(
                        60.0, {"frequency": 50.0, "phase": 1.0}))
    t, nt = run_tpu("Finite-CC-PermExDc-v0", acts, "i",
                    supply=spx.ac_1_phase_supply(
                        60.0, {"frequency": 50.0, "phase": 1.0}))
    assert_pair(r, t, nr, nt)
