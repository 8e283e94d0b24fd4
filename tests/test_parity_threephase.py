"""Golden-trace parity for the three-phase motor families.

Same contract as tests/test_parity.py (matched Euler integrators, float64,
constant references, fixed action sequences), covering PMSM, SynRM, EESM,
SCIM and DFIM — i.e. the per-sub-interval Park/Clarke transform chains, the
field-angle orientation and the dual-converter DFIM plumbing.

SCIM/DFIM caveat: while the rotor flux is still numerical dust (|psi|~1e-22,
before any real flux has built up), the reference's field angle
``atan2(psi_rbeta, psi_ralpha)`` (physical_systems.py:766-770) amplifies
float-rounding noise, so the dq-projected *outputs* are chaotic and
implementation-defined for those first steps.  The underlying alphabeta
states remain bit-identical, and once physical flux develops the dq outputs
re-converge bit-exactly; the induction tests therefore allow a small number
of early-transient dq mismatches while requiring everything else to match to
1e-9.
"""

import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rgx

N_STEPS = 120
RTOL = 1e-9
ATOL = 1e-11


def run_pair(reference_gem, env_id, actions, ref_state="torque", ref_value=0.1):
    from gym_electric_motor.physical_systems.solvers import EulerSolver
    from gym_electric_motor.reference_generators import ConstReferenceGenerator

    env = reference_gem.make(
        env_id,
        ode_solver=EulerSolver(),
        reference_generator=ConstReferenceGenerator(
            reference_state=ref_state, reference_value=ref_value
        ),
    ).unwrapped
    (s, _), _ = env.reset(seed=0)
    ref_states, ref_terms = [s], []
    for a in actions:
        (s, _), _r, term, *_ = env.step(a)
        ref_states.append(s)
        ref_terms.append(term)
        if term:
            break

    import jax

    with jax.enable_x64():
        import jax.numpy as jnp

        envx = gemx.make_functional(
            env_id, solver="euler", dtype=jnp.float64,
            reference_generator=rgx.ConstReference(ref_state, reference_value=ref_value),
        )
        st, (sx, _) = envx.reset(jax.random.PRNGKey(0))
        tpu_states, tpu_terms = [np.asarray(sx)], []
        for a in actions:
            st, (sx, _), _, tm = envx.step(st, jnp.asarray(a))
            tpu_states.append(np.asarray(sx))
            tpu_terms.append(bool(tm))
            if tpu_terms[-1]:
                break
    assert list(env.state_names) == list(envx.state_names)
    assert ref_terms == tpu_terms, "termination sequences differ"
    return np.array(ref_states), np.array(tpu_states), list(env.state_names)


def finite_actions(n, n_act=8, seed=1):
    rng = np.random.default_rng(seed)
    return [int(rng.integers(n_act)) for _ in range(n)]


def cont_actions(n, dim, seed=1):
    rng = np.random.default_rng(seed)
    return [rng.uniform(-1, 1, size=dim) for _ in range(n)]


@pytest.mark.parametrize("env_id,actions", [
    ("Finite-CC-PMSM-v0", finite_actions(N_STEPS)),
    ("Cont-CC-PMSM-v0", cont_actions(N_STEPS, 3)),
    ("Finite-TC-SynRM-v0", finite_actions(N_STEPS)),
    ("Finite-CC-EESM-v0", [np.array([a, b]) for a, b in
                           zip(finite_actions(N_STEPS), finite_actions(N_STEPS, 4, 2))]),
    ("Cont-TC-EESM-v0", cont_actions(N_STEPS, 4)),
])
def test_synchronous_golden_trace(reference_gem, env_id, actions):
    s_ref, s_tpu, _names = run_pair(reference_gem, env_id, actions)
    np.testing.assert_allclose(s_tpu, s_ref, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("env_id,actions", [
    ("Cont-TC-SCIM-v0", cont_actions(N_STEPS, 3)),
    ("Cont-CC-DFIM-v0", cont_actions(N_STEPS, 6)),
])
def test_induction_cont_golden_trace(reference_gem, env_id, actions):
    s_ref, s_tpu, _names = run_pair(reference_gem, env_id, actions)
    np.testing.assert_allclose(s_tpu, s_ref, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("env_id,actions", [
    ("Finite-CC-SCIM-v0", finite_actions(N_STEPS)),
    ("Finite-TC-DFIM-v0", [np.array([a, b]) for a, b in
                           zip(finite_actions(N_STEPS), finite_actions(N_STEPS, 8, 3))]),
])
def test_induction_finite_golden_trace(reference_gem, env_id, actions):
    s_ref, s_tpu, names = run_pair(reference_gem, env_id, actions)
    dq_idx = [i for i, n in enumerate(names)
              if n in ("i_sd", "i_sq", "u_sd", "u_sq", "i_rd", "i_rq", "u_rd", "u_rq")]
    other_idx = [i for i in range(len(names)) if i not in dq_idx]
    # non-dq states: bit parity everywhere
    np.testing.assert_allclose(s_tpu[:, other_idx], s_ref[:, other_idx],
                               rtol=RTOL, atol=ATOL)
    # dq projections: allow the flux-dust transient (see module docstring),
    # but the vast majority of steps must match tightly
    diff = np.max(np.abs(s_tpu[:, dq_idx] - s_ref[:, dq_idx]), axis=1)
    mismatched = diff > 1e-6
    assert mismatched.mean() < 0.15, (
        f"{mismatched.sum()}/{len(diff)} steps diverge in dq outputs"
    )
    # and after the transient they must be in lockstep again
    assert not mismatched[-20:].any(), "dq outputs still diverging at the end"
