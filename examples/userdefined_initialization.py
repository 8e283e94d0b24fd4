#!/usr/bin/env python
"""User-defined state initialization (exploring starts).

Counterpart of the reference's
``examples/environment_features/userdefined_initialization.py``: the
initializer interface samples random (or fixed) initial motor/load states per
reset — important for RL exploration.  The same dict format is accepted:

* fixed values:      ``{"states": {"i": 12.0}}``
* gaussian random:   ``{"random_init": "gaussian", "random_params": (mu, sigma), "states": {"i": 0}}``
* uniform interval:  ``{"random_init": "uniform", "interval": [[60, 80]], "states": {"omega": 0}}``

Because reset is a pure function of the PRNG key, "one reset" here is a
vmap over thousands of keys — the whole initial-state distribution
materializes in one call.

Run:  python examples/userdefined_initialization.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.models import loads as ld, motors as mt


def sample_initial_states(env, n=4096, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    state, _obs = jax.jit(jax.vmap(env.reset))(keys)
    return np.asarray(state.phys.ode_state)


def main():
    # 1. fixed initial current, DC series motor
    env = gemx.make_functional(
        "Cont-CC-SeriesDc-v0",
        motor=mt.series_dc(motor_initializer={"states": {"i": 12.0}}),
    )
    ode = sample_initial_states(env, n=16)
    print(f"fixed init:    i0 = {ode[:, 1].min():.3f} .. {ode[:, 1].max():.3f}  (want 12.0)")

    # 2. gaussian random initial current
    env = gemx.make_functional(
        "Cont-CC-SeriesDc-v0",
        motor=mt.series_dc(motor_initializer={
            "random_init": "gaussian", "random_params": (25.0, 0.1),
            "states": {"i": 0.0},
        }),
    )
    ode = sample_initial_states(env)
    print(f"gaussian init: i0 mean {ode[:, 1].mean():.2f} (want ~25), "
          f"std {ode[:, 1].std():.2f}")

    # 3. uniform random initial speed via the load initializer
    env = gemx.make_functional(
        "Cont-SC-SeriesDc-v0",
        load=ld.polynomial_static_load(
            dict(a=0.01, b=0.05, c=0.0, j_load=1e-4),
            load_initializer={"random_init": "uniform",
                              "interval": [[60.0, 80.0]],
                              "states": {"omega": 0.0}},
        ),
    )
    ode = sample_initial_states(env)
    print(f"uniform init:  omega0 in [{ode[:, 0].min():.1f}, {ode[:, 0].max():.1f}] "
          f"(want [60, 80])")


if __name__ == "__main__":
    main()
