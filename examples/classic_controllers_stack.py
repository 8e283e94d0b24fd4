"""Classic (secondary) controller stack examples.

Counterpart of the reference's
``examples/classic_controllers/classic_controllers_dc_motor_example.py`` and
``classic_controllers_synch_motor_example.py``: auto-design + tune the
classic controller for an env, run the closed loop on device, plot.

Run:  python examples/classic_controllers_stack.py [--env-id Cont-CC-PermExDc-v0]
"""

import argparse

import jax
import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.classic import Controller
from gym_electric_motor_tpu.references import ConstReference, ReferenceSpec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env-id", default="Cont-CC-PermExDc-v0")
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--save", default="classic_stack")
    args = ap.parse_args()

    task = args.env_id.split("-")[1]
    motor = args.env_id.split("-")[2]
    three_phase = motor in ("PMSM", "SynRM", "SCIM")
    if task == "CC" and three_phase:
        gen = ReferenceSpec([ConstReference("i_sd", 0.0), ConstReference("i_sq", 0.3)])
        shown = ["i_sd", "i_sq"]
    elif task == "CC" and motor == "ExtExDc":
        gen = ReferenceSpec([ConstReference("i_a", 0.3), ConstReference("i_e", 0.4)])
        shown = ["i_a", "i_e"]
    else:
        ref_state = {"SC": "omega", "TC": "torque"}.get(task, "i")
        gen = ConstReference(ref_state, 0.3)
        shown = [ref_state]

    env = gemx.make_functional(args.env_id, reference_generator=gen)
    ctrl = Controller.make(env)
    print(f"designed controller family: {ctrl.family}")
    out = ctrl.control_environment(env, args.steps, key=jax.random.PRNGKey(0))

    states = np.asarray(out["states"])
    refs = np.asarray(out["references"])
    names = list(env.physical_system.state_names)
    for s in shown:
        i = names.index(s)
        ri = list(env.reference_names).index(s)
        tail = np.abs(states[-300:, i] - refs[-300:, ri]).mean()
        print(f"{s}: tail tracking error {tail:.5f}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(len(shown), 1, squeeze=False)
        t = np.arange(len(states)) * env.physical_system.tau
        for ax, s in zip(axes[:, 0], shown):
            i, ri = names.index(s), list(env.reference_names).index(s)
            ax.plot(t, states[:, i], label=s)
            ax.plot(t, refs[:, ri], "--", label=f"{s}*")
            ax.legend()
        fig.savefig(f"{args.save}.png", dpi=100)
        print(f"saved {args.save}.png")
    except Exception as e:  # plotting is optional
        print("plot skipped:", e)


if __name__ == "__main__":
    main()
