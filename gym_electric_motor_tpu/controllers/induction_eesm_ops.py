"""SCIM and EESM operation-point selection.

Counterparts of
``/root/reference/src/gem_controllers/stages/operation_point_selection/
scim_ops.py`` (loss-minimal flux LUT + PI flux controller + modulation
controller) and ``eesm_ops.py`` (three-current loss-optimal LUTs).  All
tables are precomputed on the host at tune time; per-step work is pure
gathers + the modulation/flux-controller scalar updates carried in the
controller state.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .pmsm_ops import _modulation_control


# ---------------------------------------------------------------------------
# SCIM  (scim_ops.py:9-199)
# ---------------------------------------------------------------------------


def tune_scim_ops(env, env_id, current_safety_margin=0.2,
                  max_modulation_level=2 / np.sqrt(3), modulation_damping=1.2):
    names = list(env.physical_system.state_names)
    limits = np.asarray(env.physical_system.limits, dtype=np.float64)
    nominal = np.asarray(env.physical_system.nominal_state, dtype=np.float64)
    mp = env.physical_system.motor.parameter
    p = float(mp["p"])
    l_m = float(mp["l_m"])
    l_r = l_m + float(mp["l_sigr"])
    l_s = l_m + float(mp["l_sigs"])
    r_r, r_s = float(mp["r_r"]), float(mp["r_s"])
    tau = env.physical_system.tau

    i_sd_idx, i_sq_idx = names.index("i_sd"), names.index("i_sq")
    u_sd_idx, u_sq_idx = names.index("u_sd"), names.index("u_sq")
    omega_idx, torque_idx = names.index("omega"), names.index("torque")
    psi_abs_idx = names.index("psi_abs")
    u_a = "u_a" if "u_a" in names else "u_sa"
    u_a_idx = names.index(u_a)

    i_sd_limit = limits[i_sd_idx] * (1 - current_safety_margin)
    i_sq_limit = limits[i_sq_idx] * (1 - current_safety_margin)

    # DFIM extension: budget voltage against the true converter ceiling
    # (u_sup/2 per phase), not the u_sd state limit — see GemController.make.
    is_dfim = env.physical_system.motor.kind == "DFIM"
    if is_dfim:
        u_ceiling = float(limits[names.index("u_sup")]) / 2.0
    else:
        u_ceiling = float(nominal[u_sd_idx])

    t_count, psi_count, i_sd_count = 1001, 1000, 500
    t_min, t_max = -limits[torque_idx], limits[torque_idx]

    # ---- psi_opt(T): loss-minimal flux (scim_ops.py:44-72)
    i_sd = np.linspace(0, limits[i_sd_idx], i_sd_count)
    psi_opt_rows = []
    for t in np.linspace(t_min, t_max, t_count):
        if t != 0:
            i_sq = t / (1.5 * p * l_m**2 / l_r * i_sd[1:])
            pv = 1.5 * (r_s * i_sd[1:] ** 2 + (r_s + r_r * l_m**2 / l_r**2) * i_sq**2)
            idx = int(np.argmin(pv))
            i_sd_opt, i_sq_opt = i_sd[1:][idx], i_sq[idx]
        else:
            i_sd_opt = i_sq_opt = 0.0
        psi_opt_rows.append([t, l_m * i_sd_opt, i_sd_opt, i_sq_opt])
    psi_opt_t = np.array(psi_opt_rows).T  # (4, t_count)
    # DFIM only: cap the flux target so the flux controller can never consume
    # the whole current budget (at saturated torque the loss-minimal sweep
    # returns i_sd = i_limit, which forces i_sq -> 0 through the combined
    # current limit and deadlocks torque production at zero).  The cap is the
    # torque-optimal split: at the current limit, T ~ i_sd*i_sq is maximized
    # at i_sd = i_sq = I/sqrt(2).  The SCIM path keeps the uncapped
    # reference-derived table (parity convention).
    if is_dfim:
        psi_opt_t[1] = np.minimum(psi_opt_t[1], l_m * i_sd_limit / np.sqrt(2.0))
    psi_max = float(np.max(psi_opt_t[1]))

    # ---- t_max(psi) (scim_ops.py:74-100)
    psi_lin = np.linspace(psi_max, 0, psi_count)
    i_sd_v = psi_lin / l_m
    with np.errstate(invalid="ignore"):
        i_sq_v = np.sqrt(
            u_ceiling ** 2 / (nominal[omega_idx] ** 2 * l_s**2) - i_sd_v**2
        )
    i_sq_v = np.nan_to_num(i_sq_v)
    t_v = 1.5 * p * l_m / l_r * psi_lin * i_sq_v
    t_val = np.concatenate([t_v, -t_v[::-1]])
    psi_all = np.concatenate([psi_lin, psi_lin[::-1]])
    t_max_psi = np.stack([t_val, psi_all])  # (2, 2*psi_count)

    # ---- PI flux controller (pi_controller.py _tune_flux_controller)
    t_n = l_s / r_s
    fc_p = 4 * t_n**2
    fc_i = fc_p / tau
    fc_ff = 0.0
    fc_int_clamp = None
    if is_dfim:
        # DFIM extension: the reference gains (fc_p ~ 4*t_n^2 ~ 0.02 A/Wb)
        # are integrator-dominant; after a flux overshoot the integrator
        # winds deep negative and the field drains for ~1000 steps while it
        # recovers, blowing i_sq through the constraint.  Use the flux-plant
        # model instead: dpsi_r/dt = (l_m*i_sd - psi_r)/T_r, so feedforward
        # psi*/l_m holds the operating point, P closes the loop in ~15 ms,
        # and a clamped integrator (+-20% of the current budget) trims
        # steady-state error without windup.
        t_r = l_r / r_r
        fc_ff = 1.0 / l_m
        fc_p = t_r / (l_m * 15e-3)
        fc_i = fc_p / 50e-3
        fc_int_clamp = 0.2 * i_sd_limit / fc_i

    # ---- modulation controller constants (scim_ops.py:131-141)
    alpha = modulation_damping / (modulation_damping - np.sqrt(modulation_damping**2 - 1))
    i_gain = 1 / (l_s / (1.25 * r_s)) * (alpha - 1) / alpha**2
    # DFIM extension: bounded modulation integrator (see _modulation_control).
    # integ_floor is chosen so psi >= psi_rel_floor * psi_max_ at any speed:
    # psi_delta = i_gain*u_dc/(2*omega*p) * integ and psi_max_ =
    # u_dc/(sqrt(3)*omega*p) share the 1/omega factor, so the bound is
    # speed-independent: integ >= -(1 - floor) * 2/(sqrt(3)*i_gain).
    psi_rel_floor = 0.05
    integ_floor = (
        -(1.0 - psi_rel_floor) * 2.0 / (np.sqrt(3.0) * i_gain) if is_dfim else None
    )
    return dict(
        kind="scim", p=p, l_m=l_m, l_r=l_r, l_s=l_s, tau=tau,
        i_sd_idx=i_sd_idx, i_sq_idx=i_sq_idx, u_sd_idx=u_sd_idx, u_sq_idx=u_sq_idx,
        omega_idx=omega_idx, psi_abs_idx=psi_abs_idx,
        i_sd_limit=i_sd_limit, i_sq_limit=i_sq_limit,
        t_min=float(t_min), t_max=float(t_max), t_count=t_count, psi_count=psi_count,
        psi_opt_t=psi_opt_t, t_max_psi=t_max_psi, psi_max=psi_max,
        fc_p=fc_p, fc_i=fc_i, fc_ff=fc_ff, fc_int_clamp=fc_int_clamp,
        a_max=max_modulation_level, k_=0.8,
        i_gain=i_gain,
        integ_floor=integ_floor, psi_rel_floor=psi_rel_floor,
        runtime_tmax=is_dfim,
        psi_high=0.1 * psi_max, psi_low=-psi_max,
        integrated_reset=0.5 * (-psi_max),
        u_dc=float(np.sqrt(3) * (u_ceiling if is_dfim else limits[u_a_idx])),
        psi_limit=float(limits[psi_abs_idx]),
    )


def scim_ops_reset():
    return {
        "mod_integrated": jnp.zeros(()),
        "mod_limited": jnp.zeros((), bool),
        "mod_a_filt": jnp.zeros((2,)),
        "fc_integrator": jnp.zeros(()),
    }


def scim_select_operating_point(ctrl, cs, state, torque_ref):
    """scim_ops.py:150-176, on device.  ``state`` is denormalized."""
    pp = ctrl.ops_params
    psi = state[pp["psi_abs_idx"]]
    t = torque_ref

    # optimal flux for the requested torque
    t_idx = jnp.clip(
        jnp.round((jnp.clip(t, pp["t_min"], pp["t_max"]) - pp["t_min"])
                  / (pp["t_max"] - pp["t_min"]) * (pp["t_count"] - 1)).astype(jnp.int32),
        0, pp["t_count"] - 1,
    )
    psi_opt = jnp.asarray(pp["psi_opt_t"])[1, t_idx]

    # modulation-controller flux ceiling
    psi_mod, new_mod = _modulation_control(pp, cs, state)
    cs.update(new_mod)
    psi_opt = jnp.minimum(psi_opt, psi_mod)

    # torque ceiling for the flux
    if pp.get("runtime_tmax"):
        # DFIM extension: the reference's t_max(psi) table is evaluated at
        # NOMINAL speed, which reports zero feasible torque at start-up for
        # any useful flux and strangles acceleration.  Bound against the
        # physical voltage feasibility at the ACTUAL speed instead: the
        # stator-flux magnitude is limited to ~u/omega_el; its d-component is
        # k_psi*psi_r (k_psi = l_sig/l_m + l_m/l_r) and the q-component
        # l_sig*i_sq produces torque.  The flux target keeps to the 45-degree
        # split (psi_sd <= psi_s_cap/sqrt(2)), which maximizes the
        # psi_sd*psi_sq product — i.e. torque — when the speed cap binds.
        omega_el = jnp.maximum(jnp.abs(state[pp["omega_idx"]]) * pp["p"], 1e-3)
        l_sig = pp["l_s"] - pp["l_m"] ** 2 / pp["l_r"]
        k_psi = l_sig / pp["l_m"] + pp["l_m"] / pp["l_r"]
        psi_s_cap = pp["k_"] * pp["u_dc"] / (jnp.sqrt(3.0) * omega_el)
        # magnetization floor: the loss-minimal LUT returns psi ~ 0 at light
        # load, leaving the machine demagnetized — then any torque transient
        # demands i_sq ~ t/psi -> constraint violations.  Keep a minimum
        # field (yielding to the voltage cap at extreme speed).
        psi_opt = jnp.maximum(psi_opt, 0.15 * pp["psi_max"])
        psi_opt = jnp.minimum(psi_opt, psi_s_cap / (jnp.sqrt(2.0) * k_psi))
        psi_sd = k_psi * psi_opt
        i_sq_cap = jnp.sqrt(jnp.maximum(psi_s_cap**2 - psi_sd**2, 0.0)) / l_sig
        t_max = 1.5 * pp["p"] * pp["l_m"] / pp["l_r"] * psi_opt * i_sq_cap
    else:
        psi_idx = jnp.clip(
            jnp.round(jnp.clip(psi_opt, 0.0, pp["psi_max"]) / pp["psi_max"]
                      * (pp["psi_count"] - 1)).astype(jnp.int32),
            0, pp["psi_count"] - 1,
        )
        t_max = jnp.asarray(pp["t_max_psi"])[0, pp["psi_count"] - psi_idx]
    t = jnp.clip(t, -jnp.abs(t_max), jnp.abs(t_max))

    # PI flux controller -> i_sd (scim_ops.py:160-167; DFIM: FF+P+clamped-I,
    # see tune_scim_ops)
    err = psi_opt - psi
    i_sd_raw = (pp["fc_ff"] * psi_opt + pp["fc_p"] * err
                + pp["fc_i"] * cs["fc_integrator"])
    i_sd = jnp.clip(i_sd_raw, -pp["i_sd_limit"], pp["i_sd_limit"])
    if pp.get("fc_int_clamp") is not None:
        cs["fc_integrator"] = jnp.clip(
            cs["fc_integrator"] + pp["tau"] * err,
            -pp["fc_int_clamp"], pp["fc_int_clamp"],
        )
    else:
        not_clipped = (i_sd_raw == i_sd)
        cs["fc_integrator"] = cs["fc_integrator"] + pp["tau"] * err * not_clipped

    # i_sq from torque and current flux (scim_ops.py:169-175)
    i_sq = jnp.clip(
        t / jnp.maximum(psi, 0.001) * 2 / 3 / pp["p"] * pp["l_r"] / pp["l_m"],
        -pp["i_sq_limit"], pp["i_sq_limit"],
    )
    over = jnp.sqrt(i_sq**2 + i_sd**2) > pp["i_sd_limit"]
    i_sq = jnp.where(
        over,
        jnp.sign(i_sq) * jnp.sqrt(jnp.maximum(pp["i_sd_limit"] ** 2 - i_sd**2, 0.0)),
        i_sq,
    )
    return jnp.stack([i_sd, i_sq])


# ---------------------------------------------------------------------------
# EESM  (eesm_ops.py:7-268)
# ---------------------------------------------------------------------------


def _eesm_solve_analytical(l_d, l_q, l_m, p, t, psi, i_e, method="ferrari"):
    """Batched version of eesm_ops.solve_analytical; arrays t/psi/i_e
    broadcast together.  ``method='ferrari'`` (default) solves all quartics
    closed-form in one vector pass (the 750k-point tune sweep drops from
    ~35 s of batched eigvals to milliseconds); ``'eig'`` keeps the original
    companion-eigenvalue path as the validation oracle."""
    t, psi, i_e = np.broadcast_arrays(t, psi, i_e)
    shape = t.shape
    t, psi, i_e = t.ravel(), psi.ravel(), i_e.ravel()
    psi_e = l_m * i_e
    c4 = np.full(t.shape, l_d**2 * (l_d - l_q) ** 2)
    c3 = 2 * l_d**2 * (l_d - l_q) * psi_e + 2 * l_d * psi_e * (l_d - l_q) ** 2
    c2 = (l_d**2 * psi_e**2 + 4 * l_d * psi_e**2 * (l_d - l_q)
          + (psi_e**2 - psi**2) * (l_d - l_q) ** 2)
    c1 = 2 * l_q * psi_e**3 + 2 * (psi_e**2 - psi**2) * psi_e * (l_d - l_q)
    c0 = (psi_e**2 - psi**2) * psi_e**2 + (l_q * t / (3 * p)) ** 2
    a3, a2, a1, a0 = c3 / c4, c2 / c4, c1 / c4, c0 / c4
    from .pmsm_ops import _solve_selected_root

    i_d = _solve_selected_root(a3, a2, a1, a0, method)
    denom = psi_e + (l_d - l_q) * i_d
    denom = np.where(np.abs(denom) < 1e-12, 1e-12, denom)
    i_q = 2 * t / (3 * p * denom)
    zero = (t == 0) & (i_e == 0)
    return (np.where(zero, 0.0, i_d).reshape(shape),
            np.where(zero, 0.0, i_q).reshape(shape))


def tune_eesm_ops(env, env_id, current_safety_margin=0.2,
                  max_modulation_level=2 / np.sqrt(3), modulation_damping=1.2,
                  t_count=50, psi_count=100, i_e_count=150, grid_count=200):
    names = list(env.physical_system.state_names)
    limits = np.asarray(env.physical_system.limits, dtype=np.float64)
    mp = env.physical_system.motor.parameter
    p = float(mp["p"])
    l_d, l_q = float(mp["l_d"]), float(mp["l_q"])
    l_m, l_e = float(mp["l_m"]), float(mp["l_e"])
    r_s, r_e = float(mp["r_s"]), float(mp["r_e"])
    tau = env.physical_system.tau

    i_sd_idx, i_sq_idx = names.index("i_sd"), names.index("i_sq")
    u_sd_idx, u_sq_idx = names.index("u_sd"), names.index("u_sq")
    omega_idx, torque_idx = names.index("omega"), names.index("torque")
    i_e_idx = names.index("i_e")
    u_a_idx = names.index("u_a" if "u_a" in names else "u_sa")

    i_e_lim = limits[i_e_idx] * (1 - current_safety_margin)
    i_q_lim = limits[i_sq_idx] * (1 - current_safety_margin)
    i_sd_limit = limits[i_sd_idx] * (1 - current_safety_margin)
    i_sq_limit = i_q_lim
    t_lim = limits[torque_idx]
    psi_max = l_m * i_e_lim + l_d * i_q_lim

    def loss(i_d, i_q, i_e):
        return np.abs(i_d) * r_s + np.abs(i_q) * r_s + np.abs(i_e) * r_e

    # full (t, psi, i_e) sweep, batched (eesm_ops.py:143-186)
    tt = np.linspace(0, t_lim, t_count)
    pp_ = np.linspace(0, psi_max, psi_count)
    ie = np.linspace(0, i_e_lim, i_e_count)
    T, P_, E = np.meshgrid(tt, pp_, ie, indexing="ij")
    I_d, I_q = _eesm_solve_analytical(l_d, l_q, l_m, p, T, P_, E)
    feasible = np.sqrt(I_d**2 + I_q**2) < i_q_lim
    L = np.where(feasible, loss(I_d, I_q, E), np.inf)

    # per (t): global loss-minimal params over (psi, i_e)
    L_t = L.reshape(t_count, -1)
    any_t = np.isfinite(L_t).any(axis=1)
    best_t = np.argmin(L_t, axis=1)
    bp_t, bp_psi = np.divmod(best_t, i_e_count)
    rows = np.nonzero(any_t)[0]
    best_params = np.stack([
        tt[rows], pp_[bp_t[rows]],
        I_d[rows, bp_t[rows], bp_psi[rows]],
        I_q[rows, bp_t[rows], bp_psi[rows]],
        ie[bp_psi[rows]],
    ], axis=1)

    # per (t, psi): loss-minimal i_e (for the grid LUTs)
    best_e = np.argmin(L, axis=2)
    ti, pi = np.meshgrid(np.arange(t_count), np.arange(psi_count), indexing="ij")
    grid_feasible = np.isfinite(np.min(L, axis=2))
    gp = np.stack([
        T[ti, pi, best_e], P_[ti, pi, best_e],
        I_d[ti, pi, best_e], I_q[ti, pi, best_e], E[ti, pi, best_e],
    ], axis=-1)[grid_feasible]

    # t_max(psi): max feasible torque per flux (eesm_ops.py:124, 0.99 factor)
    t_max_psi = np.zeros(psi_count)
    feas_tp = feasible.any(axis=2)
    for j in range(psi_count):
        idxs = np.nonzero(feas_tp[:, j])[0]
        t_max_psi[j] = tt[idxs[-1]] if len(idxs) else 0.0
    t_max_psi = 0.99 * t_max_psi

    t_max = float(np.max(best_params[:, 0]))

    # interpolate psi/i_d/i_q/i_e opt onto a regular torque grid
    from scipy.interpolate import griddata, interp1d

    t_lin = np.linspace(0, t_max, grid_count)
    psi_opt_lut = interp1d(best_params[:, 0], best_params[:, 1], kind="cubic",
                           fill_value="extrapolate")(t_lin)
    t_grid, psi_grid = np.meshgrid(t_lin, np.linspace(0, psi_max, grid_count),
                                   indexing="ij")
    pts = (gp[:, 0], gp[:, 1])
    i_d_lut = griddata(pts, gp[:, 2], (t_grid, psi_grid), method="linear")
    i_q_lut = griddata(pts, gp[:, 3], (t_grid, psi_grid), method="linear")
    i_e_lut = griddata(pts, gp[:, 4], (t_grid, psi_grid), method="linear")
    i_d_lut = np.nan_to_num(i_d_lut)
    i_q_lut = np.nan_to_num(i_q_lut)
    i_e_lut = np.nan_to_num(i_e_lut)

    alpha = modulation_damping / (modulation_damping - np.sqrt(modulation_damping**2 - 1))
    psi_high = 0.2 * abs(l_m * i_e_lim * current_safety_margin
                         + l_d * i_sq_limit * current_safety_margin)
    return dict(
        kind="eesm", p=p, tau=tau,
        u_sd_idx=u_sd_idx, u_sq_idx=u_sq_idx, omega_idx=omega_idx,
        t_max=t_max, psi_max=psi_max, grid_count=grid_count,
        psi_opt_lut=psi_opt_lut, t_max_psi=t_max_psi, psi_count=psi_count,
        i_d_lut=i_d_lut, i_q_lut=i_q_lut, i_e_lut=i_e_lut,
        a_max=max_modulation_level, k_=0.953,
        i_gain=1 / (l_q / (1.25 * r_s)) * (alpha - 1) / alpha**2,
        psi_high=psi_high, psi_low=-psi_high,
        integrated_reset=0.01 * (-psi_high),
        u_dc=float(np.sqrt(3) * limits[u_a_idx]),
    )


def eesm_ops_reset():
    return {
        "mod_integrated": jnp.zeros(()),
        "mod_limited": jnp.zeros((), bool),
        "mod_a_filt": jnp.zeros((2,)),
    }


def eesm_select_operating_point(ctrl, cs, state, torque_ref):
    """eesm_ops.py:231-259, on device."""
    pp = ctrl.ops_params
    gc_ = pp["grid_count"]
    psi_mod, new_mod = _modulation_control(pp, cs, state)
    cs.update(new_mod)

    t_ref = torque_ref
    t_clip = jnp.abs(jnp.clip(t_ref, -pp["t_max"], pp["t_max"]))

    t_idx0 = jnp.clip(
        jnp.round(t_clip / pp["t_max"] * (gc_ - 1)).astype(jnp.int32), 0, gc_ - 1
    )
    psi_opt = jnp.asarray(pp["psi_opt_lut"])[t_idx0]
    psi = jnp.clip(psi_opt, 0.0, psi_mod)

    psi_cnt_idx = jnp.clip(
        jnp.round(jnp.clip(psi_opt, 0.0, pp["psi_max"]) / pp["psi_max"]
                  * (pp["psi_count"] - 1)).astype(jnp.int32),
        0, pp["psi_count"] - 1,
    )
    t_max = jnp.asarray(pp["t_max_psi"])[psi_cnt_idx]
    t_clip = jnp.clip(t_clip, 0.0, t_max)

    t_idx = jnp.clip(
        jnp.round(t_clip / pp["t_max"] * (gc_ - 1)).astype(jnp.int32), 0, gc_ - 1
    )
    psi_idx = jnp.clip(
        jnp.round(jnp.clip(psi, 0.0, pp["psi_max"]) / pp["psi_max"] * (gc_ - 1)).astype(jnp.int32),
        0, gc_ - 1,
    )
    i_d = jnp.asarray(pp["i_d_lut"])[t_idx, psi_idx]
    i_q = jnp.sign(t_ref) * jnp.asarray(pp["i_q_lut"])[t_idx, psi_idx]
    i_e = jnp.asarray(pp["i_e_lut"])[t_idx, psi_idx]
    return jnp.stack([i_d, i_q, i_e])
