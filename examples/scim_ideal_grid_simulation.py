#!/usr/bin/env python
"""Start-up of a squirrel-cage induction motor on an ideal three-phase grid.

Counterpart of the reference's
``examples/environment_features/scim_ideal_grid_simulation.py``: the SCIM is
driven by sinusoidal grid voltages (no switching control), and the start-up
transient — angular velocity, drive torque, abc voltages, dq currents — is
plotted.  Here the whole simulation is ONE jitted `lax.scan`: the grid
voltage is computed inside the kernel from the step index, so no per-step
host loop exists at all.

Run:  python examples/scim_ideal_grid_simulation.py [--steps 10000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.models import loads as ld  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--frequency", type=float, default=50.0)  # Hz
    ap.add_argument("--amplitude", type=float, default=0.8)   # fraction of u_lim
    ap.add_argument("--save", default="scim_grid_startup.png")
    args = ap.parse_args()

    env = gemx.make_functional(
        "Cont-CC-SCIM-v0",
        load=ld.polynomial_static_load(dict(a=0.0, b=0.0, c=0.0, j_load=1e-6)),
        constraints=(),      # grid start-up exceeds rated current; don't trip
        tau=1e-5,
    )
    tau = env.physical_system.tau
    omega_g = 2 * np.pi * args.frequency
    phi = 2 * np.pi / 3

    def grid_action(k):
        t = k * tau
        return args.amplitude * jnp.stack([
            jnp.sin(omega_g * t),
            jnp.sin(omega_g * t - phi),
            jnp.sin(omega_g * t + phi),
        ])

    @jax.jit
    def run(key):
        state, _ = env.reset(key)

        def body(carry, k):
            state = carry
            state, (s, r), _rew, _term = env.step(state, grid_action(k))
            return state, s

        _, traj = jax.lax.scan(body, state, jnp.arange(args.steps))
        return traj

    traj = np.asarray(run(jax.random.PRNGKey(0)))
    names = env.state_names
    lim = np.asarray(env.physical_system.limits)
    t_ms = np.arange(args.steps) * tau * 1e3

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(4, 1, sharex=True, figsize=(9, 9))
    panels = [
        ("omega", ["omega"]),
        ("torque", ["torque"]),
        ("u_abc / V", ["u_sa", "u_sb", "u_sc"]),
        ("i_dq / A", ["i_sd", "i_sq"]),
    ]
    for ax, (label, states) in zip(axes, panels):
        for s in states:
            i = names.index(s)
            ax.plot(t_ms, traj[:, i] * lim[i], lw=0.8, label=s)
        ax.set_ylabel(label)
        ax.grid(alpha=0.3)
        ax.legend(fontsize=8)
    axes[-1].set_xlabel("t / ms")
    fig.suptitle("SCIM direct-on-line start-up (ideal grid)")
    fig.tight_layout()
    fig.savefig(args.save, dpi=120)
    print(f"saved {args.save}; final omega = "
          f"{traj[-1, names.index('omega')] * lim[names.index('omega')]:.1f} rad/s "
          f"(sync: {omega_g / env.physical_system.motor.parameter['p']:.1f})")

    # ---- The TRUE grid configuration: AC3PhaseSupply + NoConverter ----
    # The reference DEFINES both components but crashes constructing this
    # env (its state bookkeeping sizes U_SUP_IDX by voltage_len while
    # naming one u_sup state — IndexError, physical_systems.py:715).
    # Here the per-phase u_sup_a/b/c slots make it work, the env has an
    # EMPTY action space (the grid drives the stator directly), and the
    # whole start-up transient streams from the universal recorder kernel
    # (Mosaic-compiled on TPU; interpret mode on CPU).
    from gym_electric_motor_tpu.models.converters import no_converter
    from gym_electric_motor_tpu.models.supplies import ac_3_phase_supply
    from gym_electric_motor_tpu.ops.pallas_record import (
        make_fused_record_rollout)

    genv = gemx.make_functional(
        "Cont-CC-SCIM-v0",
        converter=no_converter(tau=tau),
        supply=ac_3_phase_supply(
            u_nominal=400.0,
            supply_parameter=dict(frequency=args.frequency, phase=0.0)),
        load=ld.polynomial_static_load(dict(a=0.0, b=0.0, c=0.0,
                                            j_load=1e-6)),
        constraints=(),
        tau=tau,
    )
    print("AC3 env action space:", genv.action_space.shape,
          "| u_sup states:", genv.physical_system.state_names[-3:])
    interpret = jax.default_backend() not in ("tpu",)
    rec = make_fused_record_rollout(genv, args.steps, 128, chunk=8,
                                    interpret=interpret)
    z = jnp.zeros((1, 128), jnp.float32)
    out = rec(5, *([z] * 7))
    i_sa = np.asarray(out["i_salpha"])[:, 0, 0]
    om = np.asarray(out["omega"])[:, 0, 0]
    print(f"fused AC3 grid start-up: |i_salpha| peak "
          f"{np.abs(i_sa).max():.1f} A, final omega {om[-1]:.1f} rad/s")


if __name__ == "__main__":
    main()
