"""Fixed-step-vs-adaptive accuracy: SURVEY.md flags replacing scipy's
adaptive dopri5 with fixed-step RK4 at tau=1e-5..1e-4 as a validation
requirement.  Here the default RK4 envs are compared against the reference's
default ``ScipyOdeSolver('dopri5')`` on the stiffest family (SCIM) and on
PMSM: trajectories must agree to fractions of a percent of full scale."""

import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rgx

N_STEPS = 150


@pytest.mark.parametrize("env_id,n_act,atol", [
    ("Finite-CC-PMSM-v0", 8, 2e-4),
    ("Finite-CC-SCIM-v0", 8, 2e-3),
    ("Cont-CC-PermExDc-v0", None, 2e-4),
])
def test_rk4_matches_adaptive_dopri5(reference_gem, env_id, n_act, atol):
    from gym_electric_motor.reference_generators import ConstReferenceGenerator

    rng = np.random.default_rng(5)
    if n_act is None:
        actions = [rng.uniform(-1, 1, size=(1,)) for _ in range(N_STEPS)]
    else:
        actions = [int(rng.integers(n_act)) for _ in range(N_STEPS)]

    # reference with its default adaptive dopri5 solver
    env_r = reference_gem.make(
        env_id,
        reference_generator=ConstReferenceGenerator(
            reference_state="torque", reference_value=0.1),
    ).unwrapped
    (s, _), _ = env_r.reset(seed=0)
    ref_tr = [s]
    for a in actions:
        (s, _), _r, term, *_ = env_r.step(a)
        ref_tr.append(s)
        if term:
            break
    ref_tr = np.array(ref_tr)

    # this framework with the default fixed-step RK4 in float64
    import jax

    with jax.enable_x64():
        import jax.numpy as jnp

        env_t = gemx.make_functional(
            env_id, dtype=jnp.float64,
            reference_generator=rgx.ConstReference("torque", reference_value=0.1),
        )
        st, (s, _) = env_t.reset(jax.random.PRNGKey(0))
        tpu_tr = [np.asarray(s)]
        for a in actions:
            st, (s, _), _r, tm = env_t.step(st, jnp.asarray(a))
            tpu_tr.append(np.asarray(s))
            if bool(tm):
                break
    tpu_tr = np.array(tpu_tr)

    n = min(len(ref_tr), len(tpu_tr))
    # exclude the dq-projected outputs for SCIM (the flux-dust angle chaos,
    # see test_parity_threephase.py); everything else must agree tightly
    names = list(env_r.state_names)
    cols = [i for i, nm in enumerate(names)
            if not (env_id == "Finite-CC-SCIM-v0"
                    and nm in ("i_sd", "i_sq", "u_sd", "u_sq"))]
    diff = np.max(np.abs(ref_tr[:n][:, cols] - tpu_tr[:n][:, cols]))
    assert diff < atol, f"max normalized deviation {diff}"
