"""dq control-space coverage for every three-phase family (round-2 VERDICT #3).

Reference semantics (``physical_systems.py``):

* SynchronousMotorSystem(control_space='dq') — 2-dim Box, action rotated
  dq->abc with the pre-step rotor angle (:423-431, :491-493).
* SCIM — same pattern with the *field* angle (:701-709, :771-775).
* EESM — upstream *inherits* the 2-dim constructor (:564) but its ``simulate``
  never converts the action, so it crashes with IndexError inside the multi
  converter (verified against the live reference below).  We implement the
  inherited intent properly: 3-dim (u_d, u_q, u_e).
* DFIM — upstream has no control_space kwarg at all (:850-860, TypeError);
  we reject it loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.ops.transforms import dq_to_abc


def test_eesm_dq_action_space_and_step():
    env = gemx.make_functional("Cont-CC-EESM-v0", control_space="dq")
    assert env.action_space.shape == (3,)
    state, obs = env.reset(jax.random.PRNGKey(0))
    state, (s, r), rew, term = env.step(state, jnp.asarray([0.1, -0.2, 0.3]))
    assert np.all(np.isfinite(np.asarray(s)))


def test_eesm_dq_equals_manually_rotated_abc():
    """Stepping the dq system must equal stepping the abc system with the
    action pre-rotated by the same (pre-step) rotor angle."""
    # float32 (x64 stays off in the suite): both paths rotate with the same
    # angle, differing only in where the rounding lands -> f32 tolerances
    kw = dict(solver="euler")
    env_dq = gemx.make_functional("Cont-CC-EESM-v0", control_space="dq", **kw)
    env_abc = gemx.make_functional("Cont-CC-EESM-v0", **kw)
    key = jax.random.PRNGKey(42)
    s_dq, _ = env_dq.reset(key)
    s_abc, _ = env_abc.reset(key)

    eps_i = env_dq.physical_system.state_positions["epsilon"]
    eps_lim = env_dq.physical_system.limits[eps_i]
    a_dq = jnp.asarray([0.3, -0.5, 0.7])
    for _ in range(20):
        # pre-step rotor angle from the (normalized) system state
        eps = s_dq.system_state[eps_i] * eps_lim
        a_abc = jnp.concatenate([dq_to_abc(a_dq[:2], eps), a_dq[2:]])
        s_dq, (o_dq, _), _, _ = env_dq.step(s_dq, a_dq)
        s_abc, (o_abc, _), _, _ = env_abc.step(s_abc, a_abc)
        np.testing.assert_allclose(np.asarray(o_dq), np.asarray(o_abc),
                                   rtol=1e-4, atol=2e-5)


def test_pmsm_dq_equals_manually_rotated_abc():
    kw = dict(solver="euler")
    env_dq = gemx.make_functional("Cont-CC-PMSM-v0", control_space="dq", **kw)
    env_abc = gemx.make_functional("Cont-CC-PMSM-v0", **kw)
    key = jax.random.PRNGKey(7)
    s_dq, _ = env_dq.reset(key)
    s_abc, _ = env_abc.reset(key)
    eps_i = env_dq.physical_system.state_positions["epsilon"]
    eps_lim = env_dq.physical_system.limits[eps_i]
    a_dq = jnp.asarray([0.4, -0.1])
    for _ in range(20):
        eps = s_dq.system_state[eps_i] * eps_lim
        a_abc = dq_to_abc(a_dq, eps)
        s_dq, (o_dq, _), _, _ = env_dq.step(s_dq, a_dq)
        s_abc, (o_abc, _), _, _ = env_abc.step(s_abc, a_abc)
        np.testing.assert_allclose(np.asarray(o_dq), np.asarray(o_abc),
                                   rtol=1e-4, atol=2e-5)


def test_scim_dq_runs():
    env = gemx.make_functional("Cont-CC-SCIM-v0", control_space="dq")
    assert env.action_space.shape == (2,)
    state, obs = env.reset(jax.random.PRNGKey(0))
    state, (s, r), rew, term = env.step(state, jnp.asarray([0.1, -0.2]))
    assert np.all(np.isfinite(np.asarray(s)))


def test_dfim_dq_rejected_loudly():
    with pytest.raises(ValueError, match="DFIM"):
        gemx.make_functional("Cont-CC-DFIM-v0", control_space="dq")


def test_finite_converter_dq_rejected():
    with pytest.raises(ValueError, match="continuous"):
        gemx.make_functional("Finite-CC-PMSM-v0", control_space="dq")


def test_dc_motor_dq_rejected():
    with pytest.raises(ValueError, match="three-phase"):
        gemx.make_functional("Cont-CC-SeriesDc-v0", control_space="dq")


def test_reference_eesm_dq_is_broken_upstream(reference_gem):
    """Live-oracle documentation of the upstream quirk: the reference EESM
    accepts control_space='dq' but crashes in simulate (IndexError: the 2-dim
    action reaches the 4-input multi converter unconverted,
    physical_systems.py:620-646)."""
    np.complex = complex
    import gym_electric_motor.physical_systems as ps
    from gym_electric_motor.physical_systems.physical_systems import (
        ExternallyExcitedSynchronousMotorSystem,
    )

    sys_ = ExternallyExcitedSynchronousMotorSystem(
        converter=ps.ContMultiConverter(
            subconverters=(ps.ContB6BridgeConverter(), ps.ContFourQuadrantConverter())
        ),
        control_space="dq",
        motor=ps.ExternallyExcitedSynchronousMotor(),
        load=ps.ConstantSpeedLoad(omega_fixed=100.0),
        supply=ps.IdealVoltageSupply(u_nominal=300.0),
        ode_solver=ps.ScipyOdeSolver(),
        tau=1e-4,
    )
    assert sys_.action_space.shape == (2,)  # the inherited (broken) 2-dim space
    sys_.reset()
    with pytest.raises(IndexError):
        sys_.simulate(np.array([0.1, -0.2]))
