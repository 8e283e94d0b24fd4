"""Catalog-wide fused-kernel coverage: every one of the 54 env ids builds
and runs through ``make_fused_rollout`` (the universal family dispatch) in
interpret mode — the guarantee that the VMEM-resident fast path exists for
the ENTIRE catalog, not just the benchmark configs.

Physics/stochastic correctness per family is asserted in
tests/test_pallas_{dc,sync}_universal.py, test_pallas_families.py and
test_pallas_rollout.py; this file asserts existence, shape contracts and
finiteness over the full id grid.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.envs.catalog import ENV_IDS
from gym_electric_motor_tpu.ops.pallas_rollout import (
    fused_state_arity,
    make_fused_rollout,
)


@pytest.mark.parametrize("env_id", ENV_IDS)
def test_every_catalog_id_has_a_fused_rollout(env_id):
    env = gemx.make_functional(env_id)
    n_state = fused_state_arity(env)
    T, N = 12, 128
    roll = make_fused_rollout(env, T, N, interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    out = roll(7, *([z] * n_state))
    # states..., reward_sum, term_count, rv, rk, rl, rs
    assert len(out) == n_state + 6
    for x in out:
        assert np.all(np.isfinite(np.asarray(x))), env_id
    reward = np.asarray(out[n_state])
    assert reward.shape == (1, 128)
    # random actions on a fresh env must accumulate negative WSE reward
    assert reward.sum() < 0.0, env_id


def test_switched_reference_runs_fused_and_matches_xla_stats():
    """Switched generators now run in-kernel (primary row = super-episode
    schedule + selection, sub-generators as shadow rows) — mean reward and
    termination rate must agree with the XLA env at matched config
    (tests/test_pallas_ref_kinds.py asserts the selection semantics)."""
    from gym_electric_motor_tpu import references as rg
    from gym_electric_motor_tpu.ops.pallas_rollout import fused_state_arity

    from test_pallas_dc_extended import _xla_random_stats

    sw = rg.SwitchedReference(
        [rg.WienerProcessReference("i"),
         rg.SinusoidalReference("i")], super_episode_length=(100, 400))
    env = gemx.make_functional("Cont-CC-PermExDc-v0",
                               reference_generator=sw)
    N_S, T_S = 2048, 400
    roll = make_fused_rollout(env, T_S, N_S, interpret=True)
    n = fused_state_arity(env)
    z = jnp.zeros((N_S // 128, 128), jnp.float32)
    out = roll(3, *([z] * n))
    k_r = float(jnp.sum(out[n])) / (N_S * T_S)
    k_t = float(jnp.sum(out[n + 1])) / (N_S * T_S)
    x_r, x_t = _xla_random_stats(env, N_S, T_S)
    assert abs(k_r - x_r) < 0.08, (k_r, x_r)
    assert abs(k_t - x_t) < max(0.5 * max(k_t, x_t), 2e-3)

    # buffer mode never touches the reference machinery
    env_f = gemx.make_functional("Finite-CC-PermExDc-v0",
                                 reference_generator=sw)
    roll = make_fused_rollout(env_f, 8, 128, action_mode="buffer",
                              interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    acts = jnp.zeros((8, 1, 128), jnp.int32)
    assert np.all(np.isfinite(np.asarray(roll(z, acts))))


def test_fused_rejects_nonideal_supply_and_dynamic_loads():
    """Supplies/loads a kernel does not implement must be rejected LOUDLY
    (their specs also expose u_nominal, so an unchecked read would silently
    simulate them as ideal — voltage_supplies.py:75-213).  Every family
    implements AC1/RC supplies and the OU + ExternalSpeedLoad loads
    in-kernel (round 4); AC3 (polyphase, NoConverter-only) still routes
    to the general XLA path, as does the non-default ExtExDc multi
    converter."""
    from types import SimpleNamespace

    from gym_electric_motor_tpu.envs.catalog import make_functional
    from gym_electric_motor_tpu.models.loads import external_speed_load
    from gym_electric_motor_tpu.models.converters import (
        cont_multi_converter, cont_two_quadrant_converter)
    from gym_electric_motor_tpu.models.supplies import ac_3_phase_supply
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        _make_fused_supply, make_fused_rollout)

    # AC3 is polyphase: it only composes with NoConverter (grid simulation,
    # no fused kernel) — the shared supply helper must reject it loudly
    fake_ps = SimpleNamespace(supply=ac_3_phase_supply(u_nominal=400.0))
    with pytest.raises(NotImplementedError, match="IdealVoltageSupply"):
        _make_fused_supply(fake_ps, (1, 128), 1e-4)

    env = make_functional(
        "Cont-CC-ExtExDc-v0",
        converter=cont_multi_converter([cont_two_quadrant_converter(1e-4),
                                        cont_two_quadrant_converter(1e-4)]))
    with pytest.raises(NotImplementedError, match="dual-4QC"):
        make_fused_rollout(env, 16, 128, interpret=True)

    # ExternalSpeedLoad is fused since round 4
    env = make_functional(
        "Cont-CC-EESM-v0",
        load=external_speed_load(lambda t: 40.0 + 0.0 * t))
    make_fused_rollout(env, 16, 128, interpret=True)


def test_fused_rejects_physics_wrappers_and_dq_control_space():
    """Wrappers that change the physics/action contract (StateNoise
    reward-relevant noise, dq action interface) must be rejected LOUDLY —
    the kernels would otherwise silently simulate different semantics
    than the env contract.  Observation-only wrappers (CurrentSum/CosSin/
    FluxObserver) remain supported, and since round 4 the DeadTime action
    delay is FUSED by the universal family builders (carried action
    planes, tests/test_pallas_dead_time.py)."""
    from gym_electric_motor_tpu import wrappers as wr
    from gym_electric_motor_tpu.envs.catalog import make_functional
    from gym_electric_motor_tpu.ops.pallas_rollout import make_fused_rollout

    env = make_functional("Finite-CC-PMSM-v0",
                          physical_system_wrappers=(wr.DeadTimeProcessor(),))
    make_fused_rollout(env, 16, 128, interpret=True)  # fused since round 4

    # plane-state sensor noise is FUSED since round 4
    # (tests/test_pallas_state_noise.py); derived couplings still reject
    env = make_functional(
        "Cont-CC-PermExDc-v0",
        physical_system_wrappers=(
            wr.StateNoiseProcessor(("i",), random_kwargs={"scale": 0.1}),))
    make_fused_rollout(env, 16, 128, interpret=True)
    env = make_functional(
        "Cont-TC-PermExDc-v0",
        physical_system_wrappers=(
            wr.StateNoiseProcessor(("i",), random_kwargs={"scale": 0.1}),))
    with pytest.raises(NotImplementedError, match="derived"):
        make_fused_rollout(env, 16, 128, interpret=True)

    # control_space='dq' is FUSED since round 4 (dq->abc at the XLA-path
    # angle inside physics_step, tests/test_pallas_dq_space.py)
    env = make_functional("Cont-CC-PMSM-v0", control_space="dq")
    make_fused_rollout(env, 16, 128, interpret=True)

    # observation-only wrappers stay fused (ShuntDc ships CurrentSum)
    env = make_functional("Cont-SC-ShuntDc-v0")
    make_fused_rollout(env, 16, 128, interpret=True)
    env = make_functional(
        "Finite-CC-PMSM-v0",
        physical_system_wrappers=(wr.CosSinProcessor(),))
    make_fused_rollout(env, 16, 128, interpret=True)
