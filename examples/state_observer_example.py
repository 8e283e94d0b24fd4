#!/usr/bin/env python
"""StateObserver: pull named quantities from a running environment.

Counterpart of ``/root/reference/examples/observers/state_observer_example.py``:
a speed-controlled DC drive runs with the auto-tuned cascade while a
``StateObserver`` reads the torque (and the omega reference) from the live
environment each step.

Run:  python examples/state_observer_example.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg
from gym_electric_motor_tpu.controllers import GemController
from gym_electric_motor_tpu.observers import StateObserver


def main():
    env_id = "Cont-SC-PermExDc-v0"
    env = gemx.make(
        env_id,
        reference_generator=rg.SinusoidalReference(
            "omega", amplitude_range=(0.3, 0.3), frequency_range=(5, 5),
            offset_range=(0.4, 0.4)),
    )
    # controller auto-detection from the env (no env_id needed)
    ctrl = GemController.make(env.env)
    torque_observer = StateObserver("torque", env)
    ref_observer = StateObserver("omega_ref", env)

    (state, ref), _ = env.reset(seed=0)
    cs = ctrl.reset()
    torques = []
    for k in range(2000):
        cs, action = ctrl.control(cs, state, ref)
        (state, ref), reward, term, trunc, _ = env.step(np.asarray(action))
        torques.append(torque_observer.observe())
        if k % 400 == 0:
            print(f"step {k:5d}: torque = {torque_observer.observe():+0.4f}  "
                  f"omega* = {ref_observer.observe():+0.4f}")
    print(f"\nobserved torque range over the run: "
          f"[{min(torques):+0.4f}, {max(torques):+0.4f}] (normalized)")


if __name__ == "__main__":
    main()
