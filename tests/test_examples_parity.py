"""Coverage for the reference's secondary example surface (SURVEY §2.5).

* ``GemController.make(env)`` without env_id — the classic stack's
  auto-detection (examples/classic_controllers/classic_controllers.py:37-60).
* Gradient-based MPC through the differentiable env (counterpart of
  examples/model_predictive_controllers/pmsm_mpc_dq_current_control.ipynb).
* Direct-on-line grid simulation (scim_ideal_grid_simulation.py).
* User-defined initialization dicts (userdefined_initialization.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg
from gym_electric_motor_tpu.controllers import GemController
from gym_electric_motor_tpu.models import loads as ld, motors as mt


@pytest.mark.parametrize("env_id", [
    "Cont-SC-PermExDc-v0", "Finite-CC-PMSM-v0", "Cont-TC-ExtExDc-v0",
])
def test_controller_auto_detection(env_id):
    env = gemx.make_functional(env_id)
    ctrl = GemController.make(env)  # no env_id
    assert ctrl.env_id == env_id


def test_auto_detected_controller_converges():
    env = gemx.make_functional(
        "Cont-SC-PermExDc-v0",
        reference_generator=rg.ConstReference("omega", reference_value=0.5))
    ctrl = GemController.make(env)
    out = ctrl.control_environment(env, 6000, key=jax.random.PRNGKey(0))
    om = env.state_names.index("omega")
    np.testing.assert_allclose(
        float(np.asarray(out["states"])[-100:, om].mean()), 0.5, atol=0.01)


def test_gradient_mpc_tracks_dq_targets():
    env = gemx.make_functional(
        "Cont-CC-PMSM-v0", control_space="dq",
        reference_generator=rg.ReferenceSpec([
            rg.ConstReference("i_sd", -0.1), rg.ConstReference("i_sq", 0.3)]))
    names = env.state_names
    isd_i, isq_i = names.index("i_sd"), names.index("i_sq")
    target = jnp.asarray([-0.1, 0.3])
    H, ITERS, LR, STEPS = 8, 10, 0.3, 120

    def horizon_cost(plan, state):
        def body(st, a):
            st, (s, _r), _rew, _t = env.step(st, a)
            err = jnp.stack([s[isd_i], s[isq_i]]) - target
            return st, jnp.sum(err * err)
        _, costs = jax.lax.scan(body, state, plan)
        return jnp.sum(costs)

    cost_grad = jax.grad(horizon_cost)

    @jax.jit
    def run(key):
        state, _ = env.reset(key)
        plan = jnp.zeros((H, 2))

        def control_step(carry, _):
            state, plan = carry

            def opt(p, _):
                return jnp.clip(p - LR * cost_grad(p, state), -1.0, 1.0), None

            plan, _ = jax.lax.scan(opt, plan, None, length=ITERS)
            state, (s, _r), _rew, _t = env.step(state, plan[0])
            plan = jnp.concatenate([plan[1:], plan[-1:]])
            return (state, plan), jnp.stack([s[isd_i], s[isq_i]])

        (_, _), traj = jax.lax.scan(control_step, (state, plan), None,
                                    length=STEPS)
        return traj

    traj = np.asarray(run(jax.random.PRNGKey(0)))
    np.testing.assert_allclose(traj[-20:].mean(axis=0), [-0.1, 0.3], atol=0.01)


def test_grid_simulation_spins_up():
    env = gemx.make_functional(
        "Cont-CC-SCIM-v0",
        load=ld.polynomial_static_load(dict(a=0.0, b=0.0, c=0.0, j_load=1e-6)),
        constraints=(), tau=1e-5)
    tau = env.physical_system.tau
    omega_g = 2 * np.pi * 50.0
    phi = 2 * np.pi / 3

    @jax.jit
    def run(key):
        state, _ = env.reset(key)

        def body(state, k):
            t = k * tau
            a = 0.8 * jnp.stack([jnp.sin(omega_g * t),
                                 jnp.sin(omega_g * t - phi),
                                 jnp.sin(omega_g * t + phi)])
            state, (s, _r), _rew, _t = env.step(state, a)
            return state, s[0]
        _, omegas = jax.lax.scan(body, state, jnp.arange(6000))
        return omegas

    om = np.asarray(run(jax.random.PRNGKey(0)))
    om_lim = env.physical_system.limits[env.state_names.index("omega")]
    sync = omega_g / float(env.physical_system.motor.parameter["p"])
    # direct-on-line start-up approaches synchronous speed
    assert om[-1] * om_lim > 0.8 * sync


def test_userdefined_initialization_dicts():
    env = gemx.make_functional(
        "Cont-CC-SeriesDc-v0",
        motor=mt.series_dc(motor_initializer={
            "random_init": "gaussian", "random_params": (25.0, 0.1),
            "states": {"i": 0.0}}))
    keys = jax.random.split(jax.random.PRNGKey(0), 2048)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    i0 = np.asarray(state.phys.ode_state)[:, 1]
    assert abs(i0.mean() - 25.0) < 0.05 and 0.05 < i0.std() < 0.2


def test_dqn_torch_gymnasium_example():
    """The torch-DQN example (SB3-notebook counterpart) drives the env purely
    through the gymnasium API; a short run must execute the full
    replay/target-net/update machinery and produce finite losses."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "examples"))
    try:
        from dqn_torch_gymnasium import train
    finally:
        sys.path.pop(0)
    first, last, losses = train(steps=500, warmup=100, log_every=0, seed=3)
    assert len(losses) > 300
    assert np.isfinite(losses).all()
    assert np.isfinite([first, last]).all()


def test_offline_sysid_fcs_example():
    """Offline data->controller loop on fused-recorded transitions: the
    per-action least-squares identification must recover the (exactly
    linear) one-step current map to float32 precision, and the resulting
    finite-control-set controller must beat the random behavior policy by
    a wide margin with zero constraint violations."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "examples"))
    try:
        from offline_sysid_fcs_control import run
    finally:
        sys.path.pop(0)
    out = run(n_envs=256, n_steps=512, interpret=True)
    assert out["residual"] < 1e-4
    assert out["violations"] == 0.0
    assert out["fcs_reward"] > out["random_reward"] + 0.1
    assert out["fcs_reward"] > -0.06


def test_grad_sysid_pmsm_example():
    """Differentiable sysid through the PMSM physics: Adam in log-parameter
    space on the dq-trajectory error must recover all four perturbed motor
    parameters (r_s, l_d, l_q, psi_p) to <2% — no reference counterpart
    (scipy solvers admit no parameter gradients, solvers.py:139-184)."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "examples"))
    try:
        from grad_sysid_pmsm import run
    finally:
        sys.path.pop(0)
    out = run(iters=400, n_steps=150, verbose=False)
    assert out["loss"] < 1e-6 * max(out["loss0"], 1e-12)
    assert out["rel_err"].max() < 0.02
