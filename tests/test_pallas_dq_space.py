"""Fused ``control_space='dq'``: the dq action interface runs in-kernel.

The base systems' dq mode (physical_systems.py: ``action =
dq_to_abc(action, eps)`` for PMSM/SynRM/EESM at the cycle-start rotor
angle; at the rotor-FLUX field angle for the SCIM) is applied at the top
of each family's ``physics_step`` using the same cos/sin planes the
physics already carries, so dq envs get the full fused tier — reducing
kernels, recorder, and in-kernel policies (2/3 squashed-Gaussian dq-duty
channels).  DFIM rejects dq at env construction (upstream has no working
dq interface either).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg
from gym_electric_motor_tpu.ops.pallas_rollout import (
    make_fused_eesm_family_rollout,
    make_fused_induction_rollout,
    make_fused_sync_rollout,
)

T, N = 40, 128


def _xla_final(env, acts, n_ch):
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    for t in range(acts.shape[0]):
        state, _o, _r, _te = step(state,
                                  jnp.asarray(acts[t].reshape(n_ch, N).T))
    return np.asarray(state.phys.ode_state)


@pytest.mark.parametrize("eid,builder,n_state,n_ch,cols", [
    ("Cont-CC-PMSM-v0", make_fused_sync_rollout, 3, 2, ((0, 1), (1, 2))),
    ("Cont-TC-SynRM-v0", make_fused_sync_rollout, 3, 2, ((0, 1), (1, 2))),
    ("Cont-CC-SCIM-v0", make_fused_induction_rollout, 4, 2,
     ((0, 1), (1, 2), (2, 3), (3, 4))),
    ("Cont-CC-EESM-v0", make_fused_eesm_family_rollout, 4, 3,
     ((0, 1), (1, 2), (2, 3))),
], ids=["PMSM", "SynRM", "SCIM", "EESM"])
def test_dq_space_buffer_parity(eid, builder, n_state, n_ch, cols):
    """Buffer-mode fused rollout with dq actions matches the XLA dq env
    step-for-step (stale-angle / field-angle rotation included)."""
    ref = ("torque" if "TC" in eid else "i_sd")
    env = gemx.make_functional(eid, control_space="dq",
                               reference_generator=rg.ConstReference(ref,
                                                                     0.0))
    rng = np.random.default_rng(5)
    acts = rng.uniform(-0.4, 0.4, size=(T, n_ch, 1, 128)).astype(np.float32)
    roll = builder(env, T, N, action_mode="buffer", interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    out = roll(*([z] * n_state), jnp.asarray(acts))
    ode = _xla_final(env, acts, n_ch)
    for k, c in cols:
        np.testing.assert_allclose(np.asarray(out[k]).reshape(N),
                                   ode[:, c], rtol=1e-4, atol=2e-3,
                                   err_msg=f"{eid} state {k}")


def test_dq_space_random_mode_and_policy():
    """Random mode samples n_ach dq duties; the universal policy kernel
    exposes 2 squashed-Gaussian dq channels and the PPO trainer runs."""
    from gym_electric_motor_tpu.ops.pallas_policy import (
        fused_policy_init_planes, policy_n_cont, policy_obs_dim)
    from gym_electric_motor_tpu.parallel.sharded import (
        init_actor_critic_params, make_fused_ppo_trainer)

    env = gemx.make_functional("Cont-CC-PMSM-v0", control_space="dq")
    roll = make_fused_sync_rollout(env, 32, 256, interpret=True)
    z = jnp.zeros((2, 128), jnp.float32)
    out = roll(5, z, z, z)
    assert all(np.isfinite(np.asarray(o)).all() for o in out)

    nc = policy_n_cont(env)
    assert nc == 2
    init_opt, train = make_fused_ppo_trainer(
        env, hidden=16, horizon=32, n_envs=256, n_minibatches=4, lr=1e-3,
        kernel="universal", ent_coef=0.0, interpret=True)
    params = init_actor_critic_params(
        jax.random.PRNGKey(1), policy_obs_dim(env), nc, 16, n_cont=nc)
    planes = fused_policy_init_planes(env, 256)
    params, _opt, planes, rs = train(params, init_opt(params), planes, 3, 2)
    rs = np.asarray(rs)
    assert np.isfinite(rs).all() and -1.5 < rs.mean() < 0.0


def _ode_of(state):
    ph = state.phys
    while not hasattr(ph, "ode_state"):
        ph = ph.inner
    return np.asarray(ph.ode_state)


@pytest.mark.parametrize("eid,n_state,cols", [
    ("Cont-CC-PMSM-v0", 3, ((0, 1), (1, 2))),
    ("Cont-SC-PMSM-v0", 4, ((0, 0), (1, 1), (2, 2))),
], ids=["CC-const-advance", "SC-per-step-advance"])
def test_dq_wrapper_advance_angle_parity(eid, n_state, cols):
    """The ADVANCE-ANGLE DqToAbcActionProcessor wrapper runs in-kernel:
    the dq duty rotates at eps + _angle_advance * tau * omega * p
    evaluated on the pre-step state (constant rotation for fixed-speed
    envs, per-step sincos for SC) — step-for-step vs the XLA wrapper."""
    from gym_electric_motor_tpu import wrappers as wr

    ref = ("omega" if "SC" in eid else "i_sd")
    env = gemx.make_functional(
        eid, physical_system_wrappers=(wr.DqToAbcActionProcessor.make(
            "PMSM"),),
        reference_generator=rg.ConstReference(ref, 0.2))
    rng = np.random.default_rng(5)
    acts = rng.uniform(-0.3, 0.3, size=(T, 2, 1, 128)).astype(np.float32)
    roll = make_fused_sync_rollout(env, T, N, action_mode="buffer",
                                   interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    out = roll(*([z] * n_state), jnp.asarray(acts))
    ode = _ode_of_final(env, acts)
    for k, c in cols:
        np.testing.assert_allclose(np.asarray(out[k]).reshape(N),
                                   ode[:, c], rtol=1e-4, atol=2e-3)


def _ode_of_final(env, acts):
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    n_ch = acts.shape[1]
    for t in range(acts.shape[0]):
        state, _o, _r, _te = step(state,
                                  jnp.asarray(acts[t].reshape(n_ch, N).T))
    return _ode_of(state)


def test_dq_wrapper_eesm_parity():
    from gym_electric_motor_tpu import wrappers as wr

    env = gemx.make_functional(
        "Cont-CC-EESM-v0",
        physical_system_wrappers=(wr.DqToAbcActionProcessor.make("EESM"),),
        reference_generator=rg.ConstReference("i_sd", 0.0))
    rng = np.random.default_rng(7)
    acts = rng.uniform(-0.3, 0.3, size=(T, 3, 1, 128)).astype(np.float32)
    roll = make_fused_eesm_family_rollout(env, T, N, action_mode="buffer",
                                          interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    out = roll(z, z, z, z, jnp.asarray(acts))
    ode = _ode_of_final(env, acts)
    for k, c in ((0, 1), (1, 2), (2, 3)):
        np.testing.assert_allclose(np.asarray(out[k]).reshape(N),
                                   ode[:, c], rtol=1e-4, atol=2e-3)


@pytest.mark.parametrize("eid,kind,pre,n_state,n_ch,cols", [
    ("Cont-CC-PMSM-v0", "PMSM", (), 3, 2, ((0, 1), (1, 2))),
    ("Cont-SC-PMSM-v0", "PMSM", (), 4, 2, ((0, 0), (1, 1), (2, 2))),
    ("Cont-CC-EESM-v0", "EESM", (), 4, 3, ((0, 1), (1, 2), (2, 3))),
    ("Cont-SC-SCIM-v0", "SCIM", ("flux",), 7, 2,
     ((0, 0), (1, 1), (2, 2), (3, 3), (4, 4))),
    ("Cont-SC-DFIM-v0", "DFIM", ("flux",), 8, 4,
     ((0, 0), (1, 1), (2, 2), (3, 3), (4, 4))),
], ids=["PMSM-CC", "PMSM-SC", "EESM", "SCIM", "DFIM"])
def test_dq_wrapper_dead_time_composition_parity(eid, kind, pre, n_state,
                                                 n_ch, cols):
    """DqToAbc wrapper + DeadTimeProcessor COMPOSED runs in-kernel: the
    reference delays the CONVERTED duty (the dq action rotates at the
    PUSH-time angle — with the wrapper's advance bumped to
    0.5 + dead_time — and the result sits in the deque for `steps`
    cycles).  Fused by _wrap_dead_time's convert hook: the dead-time
    planes store the converted duties; states (and observer planes,
    flux-angle variants) match the XLA wrapper chain step-for-step."""
    from gym_electric_motor_tpu import wrappers as wr
    from gym_electric_motor_tpu.ops.pallas_rollout import make_fused_rollout

    wrappers = ((wr.DeadTimeProcessor(steps=1),)
                + ((wr.FluxObserver(),) if "flux" in pre else ())
                + (wr.DqToAbcActionProcessor.make(kind),))
    ref = ("omega" if "SC" in eid else "i_sd")
    env = gemx.make_functional(
        eid, physical_system_wrappers=wrappers,
        reference_generator=rg.ConstReference(ref, 0.2))
    assert env.physical_system._angle_advance == 1.5  # 0.5 + dead_time
    rng = np.random.default_rng(5)
    acts = rng.uniform(-0.3, 0.3, size=(T, n_ch, 1, 128)).astype(np.float32)
    roll = make_fused_rollout(env, T, N, action_mode="buffer",
                              interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    out = roll(*([z] * n_state), jnp.asarray(acts))
    ode = _ode_of_final(env, acts)
    for k, c in cols:
        np.testing.assert_allclose(np.asarray(out[k]).reshape(N),
                                   ode[:, c], rtol=1e-4, atol=2e-3,
                                   err_msg=f"{eid} state {k}")


def _obs_psi_of(state):
    ph = state.phys
    while not (type(ph).__name__ == "WrappedState"
               and np.asarray(ph.extra).shape[-1] == 2):
        ph = ph.inner
    return np.asarray(ph.extra)


@pytest.mark.parametrize("eid,builder,n_state,n_ch,cols", [
    ("Cont-SC-SCIM-v0", make_fused_induction_rollout, 7, 2,
     ((0, 0), (1, 1), (2, 2), (3, 3), (4, 4))),
    ("Cont-SC-DFIM-v0", None, 8, 4,
     ((0, 0), (1, 1), (2, 2), (3, 3), (4, 4))),
], ids=["SCIM", "DFIM"])
def test_dq_wrapper_psi_angle_parity(eid, builder, n_state, n_ch, cols):
    """The FLUX-OBSERVER dq-wrapper variants run in-kernel: the observer
    (a 2-state forward-Euler flux integrator over the post-step
    currents) rides as two extra state planes, and the dq duty rotates
    at its psi_angle (+/- the advance term).  States AND the observer
    planes match the XLA wrapper env step-for-step."""
    from gym_electric_motor_tpu import wrappers as wr
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        make_fused_dfim_family_rollout)

    if builder is None:
        builder = make_fused_dfim_family_rollout
    kind = "SCIM" if "SCIM" in eid else "DFIM"
    env = gemx.make_functional(
        eid,
        physical_system_wrappers=(wr.FluxObserver(),
                                  wr.DqToAbcActionProcessor.make(kind)),
        reference_generator=rg.ConstReference("omega", 0.2))
    rng = np.random.default_rng(5)
    acts = rng.uniform(-0.3, 0.3,
                       size=(T, n_ch, 1, 128)).astype(np.float32)
    roll = builder(env, T, N, action_mode="buffer", interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    out = roll(*([z] * n_state), jnp.asarray(acts))
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    for t in range(T):
        state, _o, _r, _te = step(
            state, jnp.asarray(acts[t].reshape(n_ch, N).T))
    ode = _ode_of(state)
    for k, c in cols:
        np.testing.assert_allclose(np.asarray(out[k]).reshape(N),
                                   ode[:, c], rtol=1e-4, atol=2e-3)
    psi = _obs_psi_of(state)
    for j in (0, 1):
        np.testing.assert_allclose(
            np.asarray(out[n_state - 2 + j]).reshape(N), psi[:, j],
            rtol=1e-4, atol=1e-3)


def test_psi_wrapper_arity_planes_and_trainer():
    """Regression (round-4 review): fused_state_arity and
    fused_policy_init_planes must account for the flux-observer planes —
    the TD3 trainer on a psi_angle-dq SCIM env with randomize= used to
    write the parameter draws into the observer planes (leaving the real
    r_r plane at zero -> 1/0 physics)."""
    from gym_electric_motor_tpu import wrappers as wr
    from gym_electric_motor_tpu.ops.pallas_policy import (
        fused_policy_init_planes)
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        fused_state_arity, make_fused_induction_rollout)

    env = gemx.make_functional(
        "Cont-SC-SCIM-v0",
        physical_system_wrappers=(wr.FluxObserver(),
                                  wr.DqToAbcActionProcessor.make("SCIM")))
    mp = env.physical_system.motor.parameter
    rnd = {"r_r": (0.7 * mp["r_r"], 1.4 * mp["r_r"])}
    assert fused_state_arity(env) == 7
    assert fused_state_arity(env, randomize=rnd) == 8
    planes = fused_policy_init_planes(env, 256, randomize=rnd)
    assert len(planes) == 8
    # layout: (omega, i_sa, i_sb, psi_ra, psi_rb, r_r, psi_obs_a/b):
    # the parameter draw must land on the r_r plane, observer planes 0
    rr = np.asarray(planes[5])
    assert np.all((rr >= rnd["r_r"][0]) & (rr <= rnd["r_r"][1]))
    assert np.abs(np.asarray(planes[6])).max() == 0.0
    assert np.abs(np.asarray(planes[7])).max() == 0.0
    # and the rollout built with those planes stays finite
    roll = make_fused_induction_rollout(env, 32, 256, interpret=True,
                                        randomize=rnd)
    out = roll(5, *planes)
    assert all(np.isfinite(np.asarray(o)).all() for o in out)


def test_dq_wrapper_dead_time_two_steps():
    """steps=2 composition: the deque carries TWO converted-duty
    generations (advance bumps to 2.5) — parity vs the XLA chain."""
    from gym_electric_motor_tpu import wrappers as wr
    from gym_electric_motor_tpu.ops.pallas_rollout import make_fused_rollout

    env = gemx.make_functional(
        "Cont-CC-PMSM-v0",
        physical_system_wrappers=(wr.DeadTimeProcessor(steps=2),
                                  wr.DqToAbcActionProcessor.make("PMSM")),
        reference_generator=rg.ConstReference("i_sd", 0.2))
    assert env.physical_system._angle_advance == 2.5
    rng = np.random.default_rng(5)
    acts = rng.uniform(-0.3, 0.3, size=(T, 2, 1, 128)).astype(np.float32)
    roll = make_fused_rollout(env, T, N, action_mode="buffer",
                              interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    out = roll(z, z, z, jnp.asarray(acts))
    ode = _ode_of_final(env, acts)
    for k, c in ((0, 1), (1, 2)):
        np.testing.assert_allclose(np.asarray(out[k]).reshape(N),
                                   ode[:, c], rtol=1e-4, atol=2e-3)
