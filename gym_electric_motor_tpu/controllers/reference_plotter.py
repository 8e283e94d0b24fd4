"""Cascade-internal reference plotting.

Counterpart of ``/root/reference/src/gem_controllers/reference_plotter.py``:
during a classical-control run the cascade produces *internal* setpoints —
the speed stage's torque* and the operation-point selection's current
vector* — which the reference overlays on the dashboard's state plots
(plus dashed max-reference lines for limited currents).

The reference mutates live ``StatePlot`` objects per host step; this port is
functional: the whole rollout runs jitted on device with
``control_environment(..., collect_internals=True)`` and the plotter renders
the stacked trajectories in one pass.
"""

from __future__ import annotations

import numpy as np


class ReferencePlotter:
    """Overlay cascade-internal references on state plots.

    Usage::

        ctrl = GemController.make(env, env_id)
        out = ctrl.control_environment(env, n_steps, collect_internals=True)
        fig = ReferencePlotter().plot(env, ctrl, out)
    """

    def __init__(self, plot_references=True):
        self._plot_references = plot_references

    def plot(self, env, ctrl, out, states=None, save_as=None):
        """Render state trajectories with env-level and cascade references.

        Args:
            env: the functional environment the controller ran on.
            ctrl: the tuned :class:`GemController`.
            out: result of ``control_environment(..., collect_internals=True)``.
            states: state names to plot; default: torque (if a speed/torque
                cascade ran) + the controlled currents + omega.
            save_as: optional path to save the figure.
        """
        import matplotlib

        if matplotlib.get_backend().lower() not in ("tkagg", "qtagg", "macosx"):
            try:
                matplotlib.use("Agg", force=False)
            except Exception:
                pass
        import matplotlib.pyplot as plt

        cascade = out.get("cascade_references", {}) if self._plot_references else {}
        names = list(env.state_names)
        limits = np.asarray(env.physical_system.limits)
        S = np.asarray(out["states"])
        tau = env.physical_system.tau
        t = np.arange(S.shape[0]) * tau

        if states is None:
            states = []
            if "torque" in cascade:
                states.append("torque")
            states.extend(ctrl.current_names)
            if ctrl.control_task == "SC":
                states.insert(0, "omega")

        # denormalized env-level references mapped onto their states
        refs = np.asarray(out["references"])
        ref_map = {s: refs[:, i] * limits[names.index(s)]
                   for i, s in enumerate(env.reference_names)}

        # cascade max-reference bands: the TC clip limits per current
        max_ref = {}
        if ctrl.tc_clip_limits is not None and ctrl.tc_clip_kind == "absolute":
            lims = np.asarray(ctrl.tc_clip_limits)
            if lims.ndim == 1:
                for j, cname in enumerate(ctrl.current_names):
                    max_ref[cname] = (-lims[j], lims[j])

        fig, axes = plt.subplots(len(states), 1, sharex=True,
                                 figsize=(9, 2.1 * len(states)), squeeze=False)
        for ax, s in zip(axes[:, 0], states):
            i = names.index(s)
            ax.plot(t, S[:, i] * limits[i], lw=0.9, label=s)
            if s in ref_map:
                ax.plot(t, ref_map[s], "r--", lw=0.8, label=f"{s}*")
            # cascade-internal setpoints (reference_plotter.py:43-66)
            if s == "torque" and "torque" in cascade:
                ax.plot(t, np.asarray(cascade["torque"]), "g-", lw=0.8,
                        label="torque* (cascade)")
            elif "currents" in cascade and s in ctrl.current_names:
                j = list(ctrl.current_names).index(s)
                ax.plot(t, np.asarray(cascade["currents"])[:, j], "g-",
                        lw=0.8, label=f"{s}* (cascade)")
            if s in max_ref:
                for v in max_ref[s]:
                    ax.axhline(v, c="g", lw=0.75, ls="--")
            ax.set_ylabel(s)
            ax.grid(True, alpha=0.3)
            ax.legend(loc="upper right", fontsize=7)
        axes[-1, 0].set_xlabel("t / s")
        fig.suptitle(f"{ctrl.env_id} — cascade references", fontsize=11)
        fig.tight_layout()
        if save_as:
            fig.savefig(save_as, dpi=130, bbox_inches="tight")
        return fig
