"""Induction-machine branch of the classic controller stack.

TPU-first rebuild of the reference's
``examples/classic_controllers/controllers/{flux_observer.py,
induction_motor_foc.py, induction_motor_cascaded_foc.py,
induction_motor_torque_to_current_conversion.py}`` (~875 LoC): a current-model
rotor-flux observer, field-oriented current control in the observed flux
frame, and a cascaded torque/speed controller whose torque stage selects
(i_sd*, i_sq*) from loss-optimal-flux / maximum-torque LUTs plus a modulation
(flux-weakening) controller.

The observer's complex integrator is carried as a (re, im) pair in the
controller state pytree; LUTs are built host-side with vectorized numpy (the
reference loops per grid point) and looked up with rounded indexing on device
exactly like upstream.

Deviation (documented): the reference computes ``np.sqrt`` of a possibly
negative argument when building the maximum-torque characteristic
(induction_motor_torque_to_current_conversion.py:152-157), yielding NaNs that
poison the torque clip for large-flux entries; we clamp the argument at zero.

Quirk reproduced (documented): upstream's loss-optimal-flux table pairs the
minimizing ``i_sq`` with ``i_sd`` one grid step below the true argmin
(``i_sd[i_idx]`` against losses computed over ``i_sd[1:]``,
induction_motor_torque_to_current_conversion.py:125-134); ``_build_t2c_luts``
keeps the off-by-one so the LUTs match bit-for-bit.

Upstream crash not reproduced: finite-control-set induction CC never builds
its current controllers (induction_motor_foc.py:80-89) — ``build_im`` raises
``NotImplementedError`` with that citation instead.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import transforms
from .base import PI


# ---------------------------------------------------------------------------
# Rotor-flux observer (flux_observer.py:4-62)
# ---------------------------------------------------------------------------

def flux_observer_init():
    return {"psi_re": jnp.zeros(()), "psi_im": jnp.zeros(())}


def flux_observer_step(prm, fs, state_denorm):
    """One current-model observer update (flux_observer.py:32-58).

    ``state_denorm`` is the denormalized env state; returns
    (psi_abs, psi_angle, new_fs).
    """
    i_abc = state_denorm[jnp.asarray(prm["i_s_abc_idx"])]
    ab = transforms.abc_to_alphabeta(i_abc)
    omega = state_denorm[prm["omega_idx"]] * prm["mp_p"]
    x, y = fs["psi_re"], fs["psi_im"]
    k = prm["r_r"] * prm["l_m"] / prm["l_r"]
    # delta = (i_alpha + j i_beta) k - (x + j y)(r_r/l_r - j omega)
    d_re = ab[0] * k - (x * prm["r_r"] / prm["l_r"] + y * omega)
    d_im = ab[1] * k - (y * prm["r_r"] / prm["l_r"] - x * omega)
    x = x + d_re * prm["tau"]
    y = y + d_im * prm["tau"]
    return (jnp.sqrt(x**2 + y**2), jnp.arctan2(y, x),
            {"psi_re": x, "psi_im": y})


# ---------------------------------------------------------------------------
# Torque-to-current conversion LUTs
# (induction_motor_torque_to_current_conversion.py:115-186)
# ---------------------------------------------------------------------------

def _build_t2c_luts(prm, torque_count=1001, i_sd_count=500, psi_count=1000):
    """Host-side, vectorized build of the loss-optimal-flux table psi_opt(T)
    and the maximum-torque table T_max(psi)."""
    l_m, l_r, l_s = prm["l_m"], prm["l_r"], prm["l_s"]
    r_s, r_r, p = prm["r_s"], prm["r_r"], prm["mp_p"]
    t_lim = prm["torque_lim"]
    i_sd = np.linspace(0.0, prm["lim_i_sd"], i_sd_count)
    ts = np.linspace(-t_lim, t_lim, torque_count)
    isd = i_sd[1:][None, :]
    i_sq = ts[:, None] / (1.5 * p * l_m**2 / l_r * isd)
    pv = 1.5 * (r_s * isd**2 + (r_s + r_r * l_m**2 / l_r**2) * i_sq**2)
    j = np.argmin(pv, axis=1)
    rows = np.arange(torque_count)
    # upstream's psi_opt() computes the losses over i_sd[1:] but indexes the
    # minimizer as i_sd[i_idx] — one grid step BELOW the true argmin
    # (induction_motor_torque_to_current_conversion.py:125-134); quirk
    # reproduced so the LUTs match bit-for-bit.
    i_sd_opt = np.where(ts == 0.0, 0.0, i_sd[j])
    i_sq_opt = np.where(ts == 0.0, 0.0, i_sq[rows, j])
    psi_opt_t = np.stack([ts, l_m * i_sd_opt, i_sd_opt, i_sq_opt])

    psi_max = float(np.max(psi_opt_t[1]))
    psi = np.linspace(psi_max, 0.0, psi_count)
    i_sd_m = psi / l_m
    arg = prm["u_nom"] ** 2 / (prm["omega_nom"] ** 2 * l_s**2) - i_sd_m**2
    i_sq_m = np.sqrt(np.maximum(arg, 0.0))  # deviation: clamp (see module doc)
    t_val = 1.5 * p * l_m / l_r * psi * i_sq_m
    t_max_psi = np.stack([
        np.concatenate([t_val, -t_val[::-1]]),
        np.concatenate([psi, psi[::-1]]),
        np.concatenate([i_sd_m, i_sd_m[::-1]]),
        np.concatenate([i_sq_m, -i_sq_m[::-1]]),
    ])
    return psi_opt_t, t_max_psi, psi_max


def modulation_init():
    return {"integrated": jnp.zeros(())}


def _modulation_control(prm, ms, state):
    """Flux-weakening modulation controller
    (induction_motor_torque_to_current_conversion.py:263-305); ``state`` is
    the normalized env state (u_sd/u_sq are denormalized in place, exactly
    like upstream)."""
    u_sd = state[prm["u_sd_idx"]] * prm["lim_u_sd"]
    u_sq = state[prm["u_sq_idx"]] * prm["lim_u_sq"]
    a = 2.0 * jnp.sqrt(u_sd**2 + u_sq**2) / prm["u_dc"]
    integrated = jnp.where(a > 1.01 * prm["a_max"], prm["integrated_reset"],
                           ms["integrated"])
    a_delta = prm["k_"] * prm["a_max"] - a
    omega = jnp.maximum(jnp.abs(state[prm["omega_idx"]]) * prm["lim_omega"], 1e-4)
    i_gain = prm["mod_i_gain"] * (2.0 * omega * prm["mp_p"] / prm["u_dc"])
    psi_delta = i_gain * (a_delta * prm["tau"] + integrated)
    in_range = (psi_delta >= prm["psi_low"]) & (psi_delta <= prm["psi_high"])
    integrated = jnp.where(in_range, integrated + a_delta * prm["tau"], integrated)
    psi_delta = jnp.clip(psi_delta, prm["psi_low"], prm["psi_high"])
    psi_max_ = prm["u_dc"] / (jnp.sqrt(3.0) * omega * prm["mp_p"])
    psi = jnp.maximum(psi_max_ + psi_delta, 0.0)
    return psi, {"integrated": integrated}


def _t2c_control(ctrl, cs, state, torque, psi_abs):
    """torque -> (i_sq*/lim, i_sd*/lim, psi_opt)
    (induction_motor_torque_to_current_conversion.py:188-235)."""
    p = ctrl.prm
    lut = jnp.asarray(p["psi_opt_lut"])
    tmax_lut = jnp.asarray(p["t_max_lut"])
    tc = lut.shape[1]
    t_lim = p["torque_lim"]
    idx = jnp.clip(jnp.round(
        (jnp.clip(torque, -t_lim, t_lim) + t_lim) / (2 * t_lim) * (tc - 1)
    ).astype(jnp.int32), 0, tc - 1)
    psi_opt = lut[1, idx]
    psi_mod, ms = _modulation_control(p, cs["mod"], state)
    psi_opt = jnp.minimum(psi_opt, psi_mod)

    psi_count = p["psi_count"]
    idx2 = jnp.round(jnp.clip(psi_opt, 0.0, p["psi_max"]) / p["psi_max"]
                     * (psi_count - 1)).astype(jnp.int32)
    # upstream indexes at psi_count - idx (NOT psi_count-1-idx), landing in
    # the mirrored negative half for idx == 0
    t_max = tmax_lut[0, psi_count - idx2]
    torque = jnp.clip(torque, -jnp.abs(t_max), jnp.abs(t_max))

    psi_pi = ctrl.stages["psi"]
    i_sd_raw, cs_psi = psi_pi.control(cs["psi"], psi_abs, psi_opt)
    i_sd = jnp.clip(i_sd_raw, -0.9 * p["nom_i_sd"], 0.9 * p["nom_i_sd"])
    cs_psi = psi_pi.integrate(cs_psi, psi_abs, psi_opt, i_sd_raw == i_sd)

    i_sq = jnp.clip(
        torque / jnp.maximum(psi_abs, 0.001) * 2.0 / 3.0 / p["mp_p"]
        * p["l_r"] / p["l_m"],
        -p["nom_i_sq"], p["nom_i_sq"])
    over = p["nom_i_sq"] < jnp.sqrt(i_sq**2 + i_sd**2)
    i_sq = jnp.where(over,
                     jnp.sign(i_sq) * jnp.sqrt(jnp.maximum(
                         p["nom_i_sq"] ** 2 - i_sd**2, 0.0)),
                     i_sq)
    new_cs = {"psi": cs_psi, "mod": ms}
    return i_sq / p["lim_i_sq"], i_sd / p["lim_i_sd"], psi_opt, new_cs


# ---------------------------------------------------------------------------
# dq current control in the observed flux frame
# ---------------------------------------------------------------------------

def _im_dq_out(ctrl, cs, state_denorm, psi_abs, psi_angle, ref_d_norm, ref_q_norm):
    """Shared tail of both induction controllers
    (induction_motor_foc.py:104-155 / induction_motor_cascaded_foc.py:199-242):
    dq PI control with decoupling in the flux frame, transform to abc,
    normalize, clip, gated integration."""
    p = ctrl.prm
    omega_me = state_denorm[p["omega_idx"]]
    i_sd = state_denorm[p["i_sd_idx"]]
    i_sq = state_denorm[p["i_sq_idx"]]
    omega_s = omega_me + p["r_r"] * p["l_m"] / p["l_r"] * i_sq / jnp.maximum(
        jnp.abs(psi_abs), 1e-4) * jnp.sign(psi_abs)

    rd = ref_d_norm * p["lim_i_sd"]
    rq = ref_q_norm * p["lim_i_sq"]
    u_sd_delta, cs_d = ctrl.stages["d"].control(cs["d"], i_sd, rd)
    u_sq_delta, cs_q = ctrl.stages["q"].control(cs["q"], i_sq, rq)

    if p["decoupling"]:
        u_sd_0 = (-omega_s * p["sigma"] * p["l_s"] * i_sq
                  - p["l_m"] * p["r_r"] / p["l_r"] ** 2 * psi_abs)
        u_sq_0 = (omega_s * p["sigma"] * p["l_s"] * i_sd
                  + omega_me * p["l_m"] / p["l_r"] * psi_abs)
    else:
        u_sd_0 = u_sq_0 = 0.0

    u_abc = transforms.dq_to_abc(
        jnp.stack([u_sd_0 + u_sd_delta, u_sq_0 + u_sq_delta]), psi_angle)
    u_abc = u_abc / jnp.asarray(p["lim_u_abc"])
    action = jnp.clip(u_abc, jnp.asarray(p["box_low"]), jnp.asarray(p["box_high"]))
    ok = jnp.all(action == u_abc)
    cs_d = ctrl.stages["d"].integrate(cs_d, i_sd, rd, ok)
    cs_q = ctrl.stages["q"].integrate(cs_q, i_sq, rq, ok)
    return action, cs_d, cs_q


def control_im_foc(ctrl, cs, state, reference):
    """InductionMotorFieldOrientedController.control
    (induction_motor_foc.py:91-160)."""
    p = ctrl.prm
    state_denorm = state * jnp.asarray(p["limits"])
    psi_abs, psi_angle, fs = flux_observer_step(p, cs["flux"], state_denorm)
    action, cs_d, cs_q = _im_dq_out(
        ctrl, cs, state_denorm, psi_abs, psi_angle,
        reference[p["ref_d_idx"]], reference[p["ref_q_idx"]])
    return {"d": cs_d, "q": cs_q, "flux": fs}, action


def control_im_cascaded_foc(ctrl, cs, state, reference):
    """InductionMotorCascadedFieldOrientedController.control
    (induction_motor_cascaded_foc.py:146-252)."""
    p = ctrl.prm
    new_cs = dict(cs)
    state_denorm = state * jnp.asarray(p["limits"])
    psi_abs, psi_angle, fs = flux_observer_step(p, cs["flux"], state_denorm)
    new_cs["flux"] = fs

    if p["omega_control"]:
        ov = ctrl.stages["overlaid"]
        t_ref, cs_o = ov.control(cs["overlaid"], state[p["omega_idx"]],
                                 reference[p["ref_idx"]])
        in_lim = ((t_ref >= 0.85 * p["ss_low_t"]) & (t_ref <= 0.85 * p["ss_high_t"]))
        cs_o = ov.integrate(cs_o, state[p["omega_idx"]], reference[p["ref_idx"]],
                            in_lim)
        t_ref = jnp.where(in_lim, t_ref,
                          jnp.clip(t_ref, p["nom_t_ratio"] * p["ss_low_t"],
                                   p["nom_t_ratio"] * p["ss_high_t"]))
        new_cs["overlaid"] = cs_o
    else:
        t_ref = reference[p["ref_idx"]]

    ref_q, ref_d, _psi_opt, t2c_cs = _t2c_control(
        ctrl, cs, state, t_ref * p["torque_lim"], psi_abs)
    new_cs.update(t2c_cs)

    action, cs_d, cs_q = _im_dq_out(ctrl, new_cs, state_denorm, psi_abs,
                                    psi_angle, ref_d, ref_q)
    new_cs["d"], new_cs["q"] = cs_d, cs_q
    return new_cs, action


# ---------------------------------------------------------------------------
# Builder
# ---------------------------------------------------------------------------

def build_im(env, d, controller_type, stages, cont, decoupling, cls):
    if not cont:
        raise NotImplementedError(
            "Finite-control-set induction control is broken upstream (the "
            "discrete branch never builds d/q controllers, "
            "induction_motor_foc.py:80-89); not reproduced.")
    names = d["names"]
    refs = d["ref_states"]
    mp = d["mp"]
    l_m, l_sigs, l_sigr = mp["l_m"], mp["l_sigs"], mp["l_sigr"]
    l_r, l_s = l_m + l_sigr, l_m + l_sigs
    prm = dict(
        decoupling=decoupling,
        tau=d["tau"],
        limits=d["limits"],
        mp_p=mp["p"], l_m=l_m, l_r=l_r, l_s=l_s,
        r_r=mp["r_r"], r_s=mp["r_s"],
        sigma=(l_s * l_r - l_m**2) / (l_s * l_r),
        omega_idx=names.index("omega"),
        i_sd_idx=names.index("i_sd"),
        i_sq_idx=names.index("i_sq"),
        u_sd_idx=names.index("u_sd"),
        u_sq_idx=names.index("u_sq"),
        i_s_abc_idx=[names.index(f"i_s{ph}") for ph in "abc"],
        lim_i_sd=float(d["limits"][names.index("i_sd")]),
        lim_i_sq=float(d["limits"][names.index("i_sq")]),
        lim_u_sd=float(d["limits"][names.index("u_sd")]),
        lim_u_sq=float(d["limits"][names.index("u_sq")]),
        lim_omega=float(d["limits"][names.index("omega")]),
        lim_u_abc=d["limits"][[names.index(f"u_s{ph}") for ph in "abc"]],
        box_low=d["box_low"][:3],
        box_high=d["box_high"][:3],
    )
    stage_objs = {"d": _mk_pi(stages[0][0], d["tau"]),
                  "q": _mk_pi(stages[0][1], d["tau"])}

    if controller_type == "foc_rotor_flux_observer":
        prm["ref_d_idx"] = refs.index("i_sd")
        prm["ref_q_idx"] = refs.index("i_sq")
        return cls("im_foc", prm, stage_objs)

    # cascaded: torque/speed control
    torque_idx = names.index("torque")
    prm.update(
        torque_lim=float(d["limits"][torque_idx]),
        omega_control="omega" in refs,
        ref_idx=0,
        ss_low_t=float(d["ss_low"][torque_idx]),
        ss_high_t=float(d["ss_high"][torque_idx]),
        nom_t_ratio=float(d["nominal"][torque_idx] / d["limits"][torque_idx]),
        nom_i_sd=float(d["nominal"][names.index("i_sd")]),
        nom_i_sq=float(d["nominal"][names.index("i_sq")]),
        u_nom=float(d["nominal"][names.index("u_sd")]),
        omega_nom=float(d["nominal"][names.index("omega")]),
    )
    psi_opt_lut, t_max_lut, psi_max = _build_t2c_luts(prm)
    alpha = 2.0 / (2.0 - np.sqrt(3.0))
    prm.update(
        psi_opt_lut=psi_opt_lut, t_max_lut=t_max_lut,
        psi_max=psi_max, psi_count=1000,
        a_max=1.0, k_=0.8,
        mod_i_gain=float(1.0 / (l_s / (1.25 * mp["r_s"])) * (alpha - 1) / alpha**2),
        u_dc=float(np.sqrt(3.0) * d["limits"][names.index("u_sa")]),
        psi_high=0.1 * psi_max, psi_low=-psi_max,
        integrated_reset=-0.5 * psi_max,
    )
    # flux PI gains from the tuned q stage
    # (induction_motor_torque_to_current_conversion.py:50-55)
    tau_s = l_s / mp["r_s"]
    p_gain = float(stages[0][1]["p_gain"]) * 2.0 * tau_s**2
    stage_objs["psi"] = PI(p_gain, p_gain / d["tau"], d["tau"])
    if prm["omega_control"]:
        stage_objs["overlaid"] = _mk_pi(stages[1][0], d["tau"])
    return cls("im_cascaded_foc", prm, stage_objs)


def _mk_pi(st, tau):
    return PI(float(st.get("p_gain", 5.0)), float(st.get("i_gain", 5.0)), tau)
