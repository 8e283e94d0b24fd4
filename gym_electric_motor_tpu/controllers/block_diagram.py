"""Controller block diagrams.

Counterpart of ``/root/reference/src/gem_controllers/block_diagrams/``
(which depends on the external ``control_block_diagram`` package): renders
the tuned cascade structure of a :class:`GemController` as a simple
matplotlib box-and-arrow diagram.
"""

from __future__ import annotations


def _stages_of(ctrl):
    stages = [("Input\n(denormalize)", "#dbe9f6")]
    if ctrl.control_task == "SC":
        stages += [(f"{'PI'} speed\ncontroller", "#f6e7db"),
                   ("Torque\nclipping", "#eeeeee")]
    if ctrl.control_task in ("TC", "SC"):
        ops_label = {
            "permex": "T->i\n(psi)", "series": "T->i\n(sqrt)",
            "shunt": "T->i\n(1/i_e)", "extex": "T->(i_a,i_e)",
            "pmsm": "MTPC/MTPF\nLUT + mod.ctrl", "scim": "psi-opt LUT\n+ flux PI",
            "eesm": "3-current\nloss-opt LUT",
        }.get(ctrl.ops_kind, "OPS")
        stages += [(ops_label, "#e7f6db"),
                   (f"Current clip\n({ctrl.tc_clip_kind})", "#eeeeee")]
    cc_label = {"pi": "PI", "pid": "PID", "p": "P",
                "three_point": "Three-point"}[ctrl.cc_mode]
    stages += [(f"{cc_label} current\ncontroller", "#f6dbdb")]
    if ctrl.decoupling:
        emf = {"classic": "EMF\nfeedforward", "ind": "EMF FF\n(induction)",
               "eesm": "EMF FF\n(EESM)"}[ctrl.emf_kind]
        stages += [(emf, "#f6f3db")]
    stages += [(f"Voltage clip\n({ctrl.cc_clip_kind})", "#eeeeee")]
    if ctrl.transform:
        stages += [("dq -> abc\n(advance angle)", "#dbf6f0")]
    out_label = {"cont": "Output\n(normalize)", "disc": "3-level\ndiscretize",
                 "b6": "B6\ndiscretize", "multidisc": "Multi-level\ndiscretize"}
    stages += [(out_label[ctrl.output_kind], "#dbe9f6")]
    return stages


def build_block_diagram(ctrl, save_as=None):
    """Draw the cascade of a tuned GemController; returns the figure.

    ``save_as`` (optional str) saves the figure (png/pdf by extension).
    """
    import matplotlib

    if matplotlib.get_backend().lower() not in ("tkagg", "qtagg", "macosx"):
        try:
            matplotlib.use("Agg", force=False)
        except Exception:
            pass
    import matplotlib.pyplot as plt
    from matplotlib.patches import FancyArrow, FancyBboxPatch

    stages = _stages_of(ctrl)
    n = len(stages)
    w, gap, h = 1.6, 0.55, 1.0
    fig, ax = plt.subplots(figsize=(1.2 + n * (w + gap), 2.6))
    ax.set_xlim(-0.5, n * (w + gap) + 0.6)
    ax.set_ylim(-0.9, 1.6)
    ax.axis("off")
    ax.set_title(f"{ctrl.env_id} — auto-tuned cascade", fontsize=11)

    for i, (label, color) in enumerate(stages):
        x = i * (w + gap)
        box = FancyBboxPatch((x, 0), w, h, boxstyle="round,pad=0.06",
                             facecolor=color, edgecolor="#444444")
        ax.add_patch(box)
        ax.text(x + w / 2, h / 2, label, ha="center", va="center", fontsize=8)
        if i < n - 1:
            ax.add_patch(FancyArrow(x + w + 0.08, h / 2, gap - 0.26, 0,
                                    width=0.015, head_width=0.09,
                                    head_length=0.12, color="#444444"))
    ax.text(-0.45, h / 2, "state,\nreference", ha="right", va="center", fontsize=8)
    ax.text(n * (w + gap) + 0.15, h / 2, "action", ha="left", va="center", fontsize=8)

    if save_as:
        fig.savefig(save_as, dpi=130, bbox_inches="tight")
    return fig
