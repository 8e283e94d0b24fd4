"""Controller block diagrams.

Counterpart of ``/root/reference/src/gem_controllers/block_diagrams/`` +
``stage_blocks/`` (3.4k LoC over the external ``control_block_diagram``
package).  The reference draws, per motor type and control task, the stage
chain with summation junctions, per-stage signal labels and a state-feedback
rail (e.g. ``series_dc_cc.py``: i* ⊕ → PI → u; ``pmsm_ops.py``: T* → LUT →
(i_sd*, i_sq*)).  This port renders the same per-motor structure from the
*tuned* :class:`GemController` — the diagram reflects the stages that will
actually execute, with motor-specific signal names on every edge.
"""

from __future__ import annotations

# Per-motor signal vectors (parameter_reader.py currents/voltages tables).
_CURRENT_SIGNALS = {
    "PermExDc": "$i^*$", "SeriesDc": "$i^*$",
    "ShuntDc": "$i^*_a$", "ExtExDc": "($i^*_a$, $i^*_e$)",
    "PMSM": "($i^*_{sd}$, $i^*_{sq}$)", "SynRM": "($i^*_{sd}$, $i^*_{sq}$)",
    "SCIM": "($i^*_{sd}$, $i^*_{sq}$)",
    "DFIM": "($i^*_{sd}$, $i^*_{sq}$)",
    "EESM": "($i^*_{sd}$, $i^*_{sq}$, $i^*_e$)",
}
_VOLTAGE_SIGNALS = {
    "PermExDc": "$u$", "SeriesDc": "$u$", "ShuntDc": "$u_a$",
    "ExtExDc": "($u_a$, $u_e$)",
    "PMSM": "($u_d$, $u_q$)", "SynRM": "($u_d$, $u_q$)",
    "SCIM": "($u_d$, $u_q$)", "EESM": "($u_d$, $u_q$, $u_e$)",
    "DFIM": "($u_d$, $u_q$)",
}
_ABC_SIGNALS = {
    "PMSM": "($u_a$, $u_b$, $u_c$)", "SynRM": "($u_a$, $u_b$, $u_c$)",
    "SCIM": "($u_a$, $u_b$, $u_c$)", "EESM": "($u_a$, $u_b$, $u_c$, $u_e$)",
    "DFIM": "($u_{sa}$, $u_{sb}$, $u_{sc}$)",
}
_FEEDBACK = {
    "PermExDc": "$i$", "SeriesDc": "$i$", "ShuntDc": "$i_a$",
    "ExtExDc": "($i_a$, $i_e$)",
    "PMSM": "($i_{sd}$, $i_{sq}$)", "SynRM": "($i_{sd}$, $i_{sq}$)",
    "SCIM": "($i_{sd}$, $i_{sq}$)", "EESM": "($i_{sd}$, $i_{sq}$, $i_e$)",
    "DFIM": "($i_{sd}$, $i_{sq}$)",
}

_OPS_LABELS = {
    # torque -> current stage per motor (stage_blocks/*_ops.py)
    "permex": "$T^*\\!\\to i^*$\n$i = T/\\Psi_e$",
    "series": "$T^*\\!\\to i^*$\n$i = \\sqrt{T/L'_e}$",
    "shunt": "$T^*\\!\\to i^*_a$\n$(1/i_e)$",
    "extex": "$T^*\\!\\to(i_a^*, i_e^*)$",
    "pmsm": "MTPC / MTPF\nLUT + mod. ctrl",
    "scim": "$\\Psi$-opt LUT\n+ flux PI",
    "eesm": "3-current\nloss-opt LUT",
}
_EMF_LABELS = {
    "classic": "EMF\nfeedforward",
    "ind": "EMF FF\n(induction)",
    "eesm": "EMF FF\n(EESM)",
}
_OUT_LABELS = {
    "cont": "Output\n(normalize)",
    "disc": "3-level\ndiscretize",
    "b6": "B6\ndiscretize",
    "multidisc": "Multi-level\ndiscretize",
}


def stages_and_signals(ctrl):
    """The per-motor stage chain as ``(stages, signals)``.

    ``stages``: list of ``(label, color, feedback)`` where ``feedback`` is
    the state signal summed at that stage's input junction (None: no sum
    junction).  ``signals``: per-edge labels, ``len(stages) + 1`` entries
    (input edge first, action edge last)."""
    mtr = ctrl.motor_type
    stages = [("Input\n(denormalize)", "#dbe9f6", None)]
    signals = ["state,\nreference"]

    if ctrl.control_task == "SC":
        signals.append("$\\omega^*$")
        stages.append(("PI speed\ncontroller", "#f6e7db", "$\\omega$"))
        signals.append("$T^*$")
        stages.append(("Torque\nclipping", "#eeeeee", None))
        signals.append("$T^*$")
    elif ctrl.control_task == "TC":
        signals.append("$T^*$")

    if ctrl.control_task in ("TC", "SC"):
        stages.append((_OPS_LABELS.get(ctrl.ops_kind, "OPS"), "#e7f6db", None))
        signals.append(_CURRENT_SIGNALS[mtr])
        stages.append((f"Current clip\n({ctrl.tc_clip_kind})", "#eeeeee", None))
        signals.append(_CURRENT_SIGNALS[mtr])
    else:
        signals.append(_CURRENT_SIGNALS[mtr])

    cc_label = {"pi": "PI", "pid": "PID", "p": "P",
                "three_point": "Three-point"}[ctrl.cc_mode]
    stages.append((f"{cc_label} current\ncontroller", "#f6dbdb", _FEEDBACK[mtr]))
    signals.append(_VOLTAGE_SIGNALS[mtr])
    if ctrl.decoupling:
        stages.append((_EMF_LABELS[ctrl.emf_kind], "#f6f3db", None))
        signals.append(_VOLTAGE_SIGNALS[mtr])
    stages.append((f"Voltage clip\n({ctrl.cc_clip_kind})", "#eeeeee", None))
    signals.append(_VOLTAGE_SIGNALS[mtr])
    if ctrl.transform:
        stages.append(("dq $\\to$ abc\n(advance angle)", "#dbf6f0", "$\\varepsilon$"))
        signals.append(_ABC_SIGNALS[mtr])
    stages.append((_OUT_LABELS[ctrl.output_kind], "#dbe9f6", None))
    signals.append("action")
    return stages, signals


def build_block_diagram(ctrl, save_as=None):
    """Draw the tuned cascade of a GemController, stage-accurate per motor
    type; returns the figure.  ``save_as`` (optional) saves png/pdf."""
    import matplotlib

    if matplotlib.get_backend().lower() not in ("tkagg", "qtagg", "macosx"):
        try:
            matplotlib.use("Agg", force=False)
        except Exception:
            pass
    import matplotlib.pyplot as plt
    from matplotlib.patches import Circle, FancyArrow, FancyBboxPatch

    stages, signals = stages_and_signals(ctrl)
    n = len(stages)
    w, gap, h = 1.7, 0.95, 1.0
    fig, ax = plt.subplots(figsize=(1.6 + n * (w + gap) * 0.62, 3.2))
    ax.set_xlim(-1.1, n * (w + gap) + 0.7)
    ax.set_ylim(-1.6, 1.8)
    ax.axis("off")
    ax.set_title(
        f"{ctrl.env_id} — auto-tuned {ctrl.motor_type} "
        f"{ctrl.control_task} cascade", fontsize=11)

    rail_y = -1.1  # state-feedback rail
    for i, (label, color, feedback) in enumerate(stages):
        x = i * (w + gap)
        box = FancyBboxPatch((x, 0), w, h, boxstyle="round,pad=0.06",
                             facecolor=color, edgecolor="#444444")
        ax.add_patch(box)
        ax.text(x + w / 2, h / 2, label, ha="center", va="center", fontsize=8)
        if feedback is not None:
            # summation junction fed from the state rail (Add blocks in the
            # reference's stage_blocks)
            cx, cy = x - 0.28, h / 2
            ax.add_patch(Circle((cx, cy), 0.11, fill=False, color="#444444"))
            ax.text(cx, cy, "+", ha="center", va="center", fontsize=8)
            ax.plot([cx, cx], [rail_y, cy - 0.11], color="#777777", lw=0.9)
            ax.text(cx + 0.06, (rail_y + cy) / 2, feedback, fontsize=7,
                    ha="left", color="#555555")
        if i < n - 1:
            ax.add_patch(FancyArrow(x + w + 0.05, h / 2, gap - 0.30, 0,
                                    width=0.012, head_width=0.09,
                                    head_length=0.12, color="#444444"))
            ax.text(x + w + gap / 2, h / 2 + 0.16, signals[i + 1],
                    ha="center", fontsize=7, color="#333333")
    ax.plot([-0.9, (n - 1) * (w + gap) - 0.28], [rail_y, rail_y],
            color="#777777", lw=0.9)
    ax.text(-0.95, rail_y, "state", ha="right", va="center", fontsize=7,
            color="#555555")
    ax.text(-0.55, h / 2, signals[0], ha="right", va="center", fontsize=8)
    ax.text(n * (w + gap) - gap + 0.35, h / 2, signals[-1], ha="left",
            va="center", fontsize=8)

    if save_as:
        fig.savefig(save_as, dpi=130, bbox_inches="tight")
    return fig
