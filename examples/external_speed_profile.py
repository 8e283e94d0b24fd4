"""Drive a motor against an external speed profile.

Counterpart of ``/root/reference/examples/environment_features/
external_speed_profile.py``: the mechanical speed is forced onto a traceable
profile while the electrical subsystem is controlled.

Run:  python examples/external_speed_profile.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg
from gym_electric_motor_tpu.models import loads as ld


def main():
    profile = lambda t: 60.0 + 40.0 * jnp.sin(2 * jnp.pi * 10.0 * t)
    env = gemx.make_functional(
        "Cont-CC-PermExDc-v0",
        load=ld.external_speed_load(profile, tau=1e-4),
        reference_generator=rg.ConstReference("i", reference_value=0.2),
    )
    state, (s, r) = env.reset(jax.random.PRNGKey(0))

    # whole rollout as one jitted scan — an eager Python step loop would pay
    # a device round trip per step (minutes through a remote-TPU tunnel)
    @jax.jit
    def rollout(state):
        def body(st, _):
            st, (obs, _ref), _rew, _term = env.step(st, jnp.asarray([0.3]))
            return st, obs[0]
        return jax.lax.scan(body, state, None, length=2000)

    _, omega_traj = rollout(state)
    omegas = np.asarray(omega_traj) * env.physical_system.limits[0]
    t = np.arange(len(omegas)) * env.tau
    target = 60.0 + 40.0 * np.sin(2 * np.pi * 10.0 * t)
    print("mean |omega - profile|:", np.abs(omegas[200:] - target[200:]).mean(), "rad/s")


if __name__ == "__main__":
    main()
