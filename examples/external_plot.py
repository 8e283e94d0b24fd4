"""User-injectable dashboard plots: ExternalPlot + ExternallyReferencedStatePlot.

Counterpart of the reference's
``examples/classic_controllers/external_plot.py`` and
``externally_referenced_state_plot.py`` usage: time series that do NOT
belong to the env state (here: a host-side speed cascade's intermediate
current setpoint and a few synthetic monitoring signals) ride the
MotorDashboard's shared time axis next to the regular state plots.

The cascade exposes its internal current setpoint — exactly the
"externally generated reference ... intermediately within a cascaded
controller" use case the reference names — and the ExternalPlot shows a
user signal with its own reference plus two additional lines.

This is a HOST visualization demo (one env, one step per dispatch), so it
runs on the CPU backend — per-step eager dispatch through the remote TPU
tunnel would be all latency.  For on-device closed-loop control at speed,
see the fused controller kernels (examples/fused_rollout.py).

Run:  python examples/external_plot.py [--steps 6000]
"""

import argparse

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import gym_electric_motor_tpu as gemx  # noqa: E402
from gym_electric_motor_tpu import references as rg  # noqa: E402
from gym_electric_motor_tpu.visualization import (  # noqa: E402
    ExternallyReferencedStatePlot,
    ExternalPlot,
    MotorDashboard,
    RenderMode,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--save", default="external_plot")
    args = ap.parse_args()

    # An ExternalPlot with a referenced primary line + two extra lines,
    # and a StatePlot of i whose dashed reference comes from the USER.
    ext = ExternalPlot(referenced=True, additional_lines=2,
                       min=-1.0, max=1.0)
    ext.set_label({"y_label": "y", "state_label": "$\\sin(t/T_1)$",
                   "ref_label": "$\\sin(t/T_2)$",
                   "add_label": ["$\\sin(t/T_3)$", "$\\sin(t/T_4)$"]})
    i_plot = ExternallyReferencedStatePlot("i")

    dash = MotorDashboard(state_plots=("omega",),
                          additional_plots=(ext, i_plot),
                          update_interval=args.steps,
                          render_mode=RenderMode.FigureOnce)
    env = gemx.make(
        "Cont-SC-PermExDc-v0",
        reference_generator=rg.ConstReference("omega", 0.4),
        visualization=dash)

    state_names = list(env.state_names)
    i_omega, i_i = state_names.index("omega"), state_names.index("i")

    # Minimal host-side speed cascade: PI on omega produces the current
    # setpoint (the externally-plotted intermediate reference, capped to
    # 0.6 to respect the current limit), then EMF feed-forward + P on the
    # current error produces the duty command.
    (state, ref), _ = env.reset(seed=0)
    integ = 0.0
    # A HOST loop is the point here (exception to the repo's scan-your-
    # example-loops rule): the dashboard's live path is the per-step
    # callback bus, and ExternalPlot.add_data feeds host ring buffers a
    # lax.scan cannot write to.  The script pins the CPU backend above,
    # so 6000 eager steps take ~2 s (per-step dispatch through the
    # remote TPU tunnel would take minutes).
    for t in range(args.steps):
        omega, cur = float(state[i_omega]), float(state[i_i])
        err = 0.4 - omega
        integ = float(np.clip(integ + 40.0 * err * 1e-4, -0.6, 0.6))
        i_ref = float(np.clip(2.0 * err + integ, -0.6, 0.6))
        duty = float(np.clip(omega + 0.8 * (i_ref - cur), -1.0, 1.0))
        # feed the user plots BEFORE the step that consumes the values
        i_plot.external_reference(i_ref)
        ext.add_data([np.sin(t / 300), np.sin(t / 600),
                      np.sin(t / 900), np.sin(t / 1200)])
        (state, ref), _r, term, _trunc, _info = env.step(
            np.array([duty], np.float32))
        if term:
            (state, ref), _ = env.reset()
    omega_final = float(state[i_omega])
    env.close()
    print(f"final omega: {omega_final:.3f} (target 0.4)")
    paths = dash.save_to_file(args.save)
    print("plots saved:", paths)


if __name__ == "__main__":
    main()
