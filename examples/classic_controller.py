"""Closed-loop classical control with the auto-tuned cascade.

The counterpart of the reference's
``examples/classic_controllers/classic_control_*.py`` scripts: build an env,
auto-tune the cascade controller, run the loop on device and plot the result.

Run:  python examples/classic_controller.py [--env-id Cont-SC-PermExDc-v0]
"""

import argparse

import jax
import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg
from gym_electric_motor_tpu.controllers import GemController
from gym_electric_motor_tpu.visualization import MotorDashboard


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env-id", default="Cont-SC-PermExDc-v0")
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--save", default="classic_controller")
    args = ap.parse_args()

    task = args.env_id.split("-")[1]
    ref_state = {"SC": "omega", "TC": "torque"}.get(task, "i")
    env = gemx.make_functional(
        args.env_id,
        reference_generator=rg.StepReference(ref_state, amplitude_range=(0.2, 0.3),
                                             frequency_range=(1, 3),
                                             offset_range=(0.1, 0.3)),
    )
    ctrl = GemController.make(env, args.env_id)
    out = ctrl.control_environment(env, args.steps, key=jax.random.PRNGKey(0))

    states = np.asarray(out["states"])
    refs = np.asarray(out["references"])
    rewards = np.asarray(out["rewards"])
    idx = env.state_names.index(ref_state)
    err = np.abs(states[:, idx] - refs[:, env.reference_names.index(ref_state)])
    print(f"{args.env_id}: mean |tracking error| over last half: "
          f"{err[len(err) // 2:].mean():.4f} (normalized)")

    dash = MotorDashboard(state_plots=(ref_state,))
    dash.plot_rollout(env, states, references=refs, rewards=rewards)
    paths = dash.save_to_file(args.save)
    print("plots saved:", paths)


if __name__ == "__main__":
    main()
