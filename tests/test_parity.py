"""Golden-trace parity vs the reference implementation.

The TPU framework must reproduce the reference's trajectories *bit-for-bit
modulo float64 rounding* when the integrators are matched (the BASELINE.json
correctness contract; cf. the reference's own golden-trace test
``tests/integration_tests/test_integration.py:88-105``).

Setup: both sides use explicit Euler (``EulerSolver`` <-> ``solver='euler'``),
constant-zero motor initialization (the DC default), a constant reference (so
no RNG stream needs to be aligned) and a fixed action sequence.  Compared per
step: full normalized state vector, reward, termination flag.
"""

import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rgx

N_STEPS = 150
RTOL = 1e-8


def run_reference(gem, env_id, actions, ref_state, ref_value):
    from gym_electric_motor.physical_systems.solvers import EulerSolver
    from gym_electric_motor.reference_generators import ConstReferenceGenerator

    env = gem.make(
        env_id,
        ode_solver=EulerSolver(),
        reference_generator=ConstReferenceGenerator(
            reference_state=ref_state, reference_value=ref_value
        ),
    )
    (state, ref), _ = env.reset(seed=0)
    states, rewards, terms = [state], [], []
    for a in actions:
        (state, ref), reward, term, trunc, _ = env.step(a)
        states.append(state)
        rewards.append(reward)
        terms.append(term)
        if term:
            break
    return np.array(states), np.array(rewards), np.array(terms), list(env.unwrapped.state_names)


def run_tpu(env_id, actions, ref_state, ref_value):
    import jax

    with jax.enable_x64():
        import jax.numpy as jnp

        env = gemx.make_functional(
            env_id,
            solver="euler",
            dtype=jnp.float64,
            reference_generator=rgx.ConstReference(ref_state, reference_value=ref_value),
        )
        state, (s, r) = env.reset(jax.random.PRNGKey(0))
        states, rewards, terms = [np.asarray(s)], [], []
        for a in actions:
            state, (s, r_obs), reward, term = env.step(state, jnp.asarray(a))
            states.append(np.asarray(s))
            rewards.append(float(reward))
            terms.append(bool(term))
            if terms[-1]:
                break
    return np.array(states), np.array(rewards), np.array(terms), env.state_names


CASES = [
    # (env_id, ref_state, finite) — DC family across converter topologies
    ("Finite-CC-PermExDc-v0", "i", True),
    ("Cont-CC-PermExDc-v0", "i", False),
    ("Finite-CC-SeriesDc-v0", "i", True),
    ("Cont-TC-SeriesDc-v0", "torque", False),
    ("Finite-CC-ShuntDc-v0", "i_a", True),
    ("Cont-SC-ShuntDc-v0", "omega", False),
]


@pytest.mark.parametrize("env_id,ref_state,finite", CASES)
def test_dc_golden_trace(reference_gem, env_id, ref_state, finite):
    rng = np.random.default_rng(42)
    if finite:
        actions = [int(rng.integers(4)) for _ in range(N_STEPS)]
    else:
        actions = [rng.uniform(-1, 1, size=(1,)) for _ in range(N_STEPS)]
    ref_value = 0.3
    s_ref, r_ref, t_ref, names_ref = run_reference(
        reference_gem, env_id, actions, ref_state, ref_value
    )
    s_tpu, r_tpu, t_tpu, names_tpu = run_tpu(env_id, actions, ref_state, ref_value)
    assert list(names_ref) == list(names_tpu)
    assert s_ref.shape == s_tpu.shape, "trajectory lengths differ (termination mismatch)"
    np.testing.assert_allclose(s_tpu, s_ref, rtol=RTOL, atol=1e-10)
    np.testing.assert_allclose(r_tpu, r_ref, rtol=RTOL, atol=1e-10)
    np.testing.assert_array_equal(t_tpu, t_ref)


def test_extex_dc_multidiscrete(reference_gem):
    """ExtExDc uses a FiniteMultiConverter (two 4QCs) — MultiDiscrete actions."""
    rng = np.random.default_rng(3)
    actions = [np.array([rng.integers(4), rng.integers(4)]) for _ in range(100)]
    from gym_electric_motor.physical_systems.solvers import EulerSolver
    from gym_electric_motor.reference_generators import ConstReferenceGenerator

    env = reference_gem.make(
        "Finite-CC-ExtExDc-v0",
        ode_solver=EulerSolver(),
        reference_generator=ConstReferenceGenerator(reference_state="i_a", reference_value=0.2),
    )
    (state, _), _ = env.reset(seed=0)
    s_ref = [state]
    for a in actions:
        (state, _), *_ = env.step(a)
        s_ref.append(state)
    s_ref = np.array(s_ref)

    import jax

    with jax.enable_x64():
        import jax.numpy as jnp

        envx = gemx.make_functional(
            "Finite-CC-ExtExDc-v0",
            solver="euler",
            dtype=jnp.float64,
            reference_generator=rgx.ConstReference("i_a", reference_value=0.2),
        )
        st, (s, _) = envx.reset(jax.random.PRNGKey(0))
        s_tpu = [np.asarray(s)]
        for a in actions:
            st, (s, _), _, _ = envx.step(st, jnp.asarray(a))
            s_tpu.append(np.asarray(s))
    np.testing.assert_allclose(np.array(s_tpu), s_ref, rtol=RTOL, atol=1e-10)


@pytest.mark.parametrize("env_id,conv_name,ref_state,n_act,p_act", [
    ("Finite-CC-PermExDc-v0", "FiniteFourQuadrantConverter", "i", 4,
     [0.4, 0.1, 0.1, 0.4]),
    ("Finite-CC-PermExDc-v0", "FiniteTwoQuadrantConverter", "i", 3,
     [0.4, 0.3, 0.3]),
    ("Finite-CC-PMSM-v0", "FiniteB6BridgeConverter", "i_sd", 8, None),
])
def test_interlocked_golden_trace(reference_gem, env_id, conv_name,
                                  ref_state, n_act, p_act):
    """Interlocking dead time vs the live reference: the 2-sub-interval
    schedule, the deferred interlock pattern AND the reference's
    single-interval integration on cycles with no interlock (its merged
    switching-time list is [t + tau]) must all line up — trajectories
    match bit-exactly (~1e-15) under matched explicit Euler + float64
    (converters.py:99-111, 271-310; physical_systems.py:171-203)."""
    import gym_electric_motor.physical_systems.converters as ref_cv
    from gym_electric_motor.physical_systems.solvers import EulerSolver
    from gym_electric_motor.reference_generators import ConstReferenceGenerator

    from gym_electric_motor_tpu.models import converters as cv

    tau, ti = 1e-5, 1e-6
    rng = np.random.default_rng(7)
    actions = rng.choice(np.arange(n_act), p=p_act, size=120)

    env = reference_gem.make(
        env_id,
        ode_solver=EulerSolver(),
        converter=getattr(ref_cv, conv_name)(tau=tau, interlocking_time=ti),
        reference_generator=ConstReferenceGenerator(
            reference_state=ref_state, reference_value=0.0),
    )
    (state, _), _ = env.reset(seed=0)
    s_ref = [state]
    for a in actions:
        (state, _r), reward, term, trunc, _ = env.step(int(a))
        s_ref.append(state)
        if term:
            break
    s_ref = np.array(s_ref)
    n = len(s_ref)

    builders = {
        "FiniteFourQuadrantConverter": cv.finite_four_quadrant_converter,
        "FiniteTwoQuadrantConverter": cv.finite_two_quadrant_converter,
        "FiniteB6BridgeConverter": cv.finite_b6_bridge_converter,
    }
    import jax

    with jax.enable_x64():
        import jax.numpy as jnp

        envx = gemx.make_functional(
            env_id, solver="euler", dtype=jnp.float64,
            converter=builders[conv_name](tau, interlocking_time=ti),
            reference_generator=rgx.ConstReference(ref_state,
                                                   reference_value=0.0),
        )
        st, (s, _r) = envx.reset(jax.random.PRNGKey(0))
        s_tpu = [np.asarray(s)]
        for a in actions[: n - 1]:
            st, (s, _ro), _rew, _term = envx.step(st, jnp.asarray(int(a)))
            s_tpu.append(np.asarray(s))
    s_tpu = np.array(s_tpu)
    np.testing.assert_allclose(s_tpu, s_ref, rtol=RTOL, atol=1e-10)
