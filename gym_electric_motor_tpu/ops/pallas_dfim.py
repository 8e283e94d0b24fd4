"""Doubly-fed induction (DFIM) fused kernels: the Cont-CC-DFIM
reducing kernel and the universal DFIM family builder
(_dfim_family / make_fused_dfim_family_rollout)."""

from __future__ import annotations

import functools
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_common import (
    LANE,
    TWO_PI,
    _fused_check_system,
    _param_reset_draws,
    _parse_randomize,
    _sup_reset_planes,
    _u_sup_plane_idx,
    _wrap_j_resolve,
    _fused_dead_time_steps,
    _fused_dq_wrapper,
    _fused_state_noise,
    _fused_constraint_mode,
    _require_default_constraints,
    _norm_advance,
    _wrap_dead_time,
    _wrap_mech_time,
    _fused_interlock,
    _fused_load,
    _fused_u_sup,
    _interlock_state,
    _make_b6,
    _make_fused_mech,
    _make_fused_supply,
    _make_rng,
    _make_wiener,
    _policy_obs_spec,
    _ref_configs,
    _ref_n_rows,
    _ref_needs_wf,
    _rotation_protocol,
    _step_noise,
    _uniform_from_bits,
    _wse_err,
)


def make_fused_dfim_rollout(env, n_steps, n_envs, action_mode="random",
                            interpret=False):
    """Fused rollout for Cont-CC-DFIM-v0: doubly-fed induction machine with
    stator AND rotor B6 duty converters (physical_systems.py:968-1054).

    Physics note: the reference rotates the rotor voltage def->dq at
    (eps_field - eps_el) then dq->alphabeta at eps_field — the composition
    is a single rotation by eps_el, so the kernel tracks only the electrical
    angle and the 4 electrical states.  The field-oriented dq currents for
    reward/termination come from the rotor-flux direction cosines
    (psi / |psi|), avoiding atan2 entirely.

    ``action_mode='buffer'``: ``rollout(isa0, isb0, psa0, psb0, eps0,
    actions)`` with ``(n_steps, 6, n_envs//128, 128)`` float32 duties.
    """
    _require_default_constraints(env)
    assert n_envs % LANE == 0
    R = n_envs // LANE
    ps = env.physical_system
    _fused_check_system(ps)
    mp = {k: float(v) for k, v in ps.motor.parameter.items()}
    names = list(ps.state_names)
    lim = np.asarray(ps.limits)

    l_m = mp["l_m"]
    l_s = l_m + mp["l_sigs"]
    l_r = l_m + mp["l_sigr"]
    r_s, r_r, p = mp["r_s"], mp["r_r"], mp["p"]
    sg = (l_s * l_r - l_m**2) / (l_s * l_r)
    tau_r = l_r / r_r
    tau_sig = sg * l_s / (r_s + r_r * l_m**2 / l_r**2)
    c_psi = l_m * r_r / (sg * l_s * l_r**2)
    c_w = l_m * p / (sg * l_r * l_s)
    c_u = 1.0 / (sg * l_s)
    c_ur = l_m / (sg * l_r * l_s)

    omega = float(_fused_load(ps, ("ConstantSpeedLoad",)).omega_fixed)
    tau = float(ps.tau)
    u_half = 0.5 * _fused_u_sup(ps)
    i_lim = float(lim[names.index("i_sd")])
    margin = float(ps.nominal_state[names.index("i_sd")] / i_lim)
    w_over_span = 0.5 / 2.0
    violation_reward = -1.0 / (1.0 - 0.9)
    p_omega = p * omega
    shape = (R, LANE)
    shape2 = (2 * R, LANE)
    LN10 = np.float32(np.log(10.0))

    def rhs(i_sa, i_sb, ps_a, ps_b, u_sa, u_sb, u_ra, u_rb):
        di_sa = (-i_sa / tau_sig + c_psi * ps_a + c_w * omega * ps_b
                 + c_u * u_sa - c_ur * u_ra)
        di_sb = (-i_sb / tau_sig + c_psi * ps_b - c_w * omega * ps_a
                 + c_u * u_sb - c_ur * u_rb)
        dps_a = (l_m * i_sa - ps_a) / tau_r - p_omega * ps_b + u_ra
        dps_b = (l_m * i_sb - ps_b) / tau_r + p_omega * ps_a + u_rb
        return di_sa, di_sb, dps_a, dps_b

    def _step_physics_cs(isa, isb, pa, pb, eps, c, s, duties):
        u_sa3 = duties[0] * u_half
        u_sb3 = duties[1] * u_half
        u_sc3 = duties[2] * u_half
        u_ra3 = duties[3] * u_half
        u_rb3 = duties[4] * u_half
        u_rc3 = duties[5] * u_half
        u_sal = (2.0 / 3.0) * (u_sa3 - 0.5 * (u_sb3 + u_sc3))
        u_sbe = np.float32(1.0 / np.sqrt(3.0)) * (u_sb3 - u_sc3)
        u_ral0 = (2.0 / 3.0) * (u_ra3 - 0.5 * (u_rb3 + u_rc3))
        u_rbe0 = np.float32(1.0 / np.sqrt(3.0)) * (u_rb3 - u_rc3)
        # rotor frame -> stator frame: rotate by the electrical angle
        u_ral = c * u_ral0 - s * u_rbe0
        u_rbe = s * u_ral0 + c * u_rbe0
        k1 = rhs(isa, isb, pa, pb, u_sal, u_sbe, u_ral, u_rbe)
        k2 = rhs(isa + 0.5 * tau * k1[0], isb + 0.5 * tau * k1[1],
                 pa + 0.5 * tau * k1[2], pb + 0.5 * tau * k1[3],
                 u_sal, u_sbe, u_ral, u_rbe)
        k3 = rhs(isa + 0.5 * tau * k2[0], isb + 0.5 * tau * k2[1],
                 pa + 0.5 * tau * k2[2], pb + 0.5 * tau * k2[3],
                 u_sal, u_sbe, u_ral, u_rbe)
        k4 = rhs(isa + tau * k3[0], isb + tau * k3[1],
                 pa + tau * k3[2], pb + tau * k3[3],
                 u_sal, u_sbe, u_ral, u_rbe)
        sixth = tau / 6.0
        return (isa + sixth * (k1[0] + 2.0 * (k2[0] + k3[0]) + k4[0]),
                isb + sixth * (k1[1] + 2.0 * (k2[1] + k3[1]) + k4[1]),
                pa + sixth * (k1[2] + 2.0 * (k2[2] + k3[2]) + k4[2]),
                pb + sixth * (k1[3] + 2.0 * (k2[3] + k3[3]) + k4[3]),
                eps + tau * p_omega)

    def _step_physics(isa, isb, pa, pb, eps, duties):
        c, s = jnp.cos(eps), jnp.sin(eps)
        return _step_physics_cs(isa, isb, pa, pb, eps, c, s, duties)

    # constant-increment rotor-angle rotation (see make_fused_pmsm_rollout)
    COS_D = np.float32(np.cos(tau * p_omega))
    SIN_D = np.float32(np.sin(tau * p_omega))

    def kernel(seed_ref, isa_ref, isb_ref, psa_ref, psb_ref, eps_ref,
               out_isa, out_isb, out_psa, out_psb, out_eps,
               out_reward, out_terms,
               out_rv, out_rk, out_rl, out_rs,
               rv_ref, rk_ref, rl_ref, rs_ref, rng_ref, c_ref, s_ref):
        seed, bits = _make_rng(interpret, rng_ref)
        seed(seed_ref[0])
        out_isa[:] = isa_ref[:]
        out_isb[:] = isb_ref[:]
        out_psa[:] = psa_ref[:]
        out_psb[:] = psb_ref[:]
        out_eps[:] = eps_ref[:]
        c_ref[:] = jnp.cos(eps_ref[:])
        s_ref[:] = jnp.sin(eps_ref[:])
        out_reward[:] = jnp.zeros(shape, jnp.float32)
        out_terms[:] = jnp.zeros(shape, jnp.float32)

        def _draw_params(mask):
            u1 = _uniform_from_bits(bits(shape2))
            u2 = _uniform_from_bits(bits(shape2))
            rl_ref[:] = jnp.where(mask, jnp.floor(500.0 + 1500.0 * u1), rl_ref[:])
            rs_ref[:] = jnp.where(mask, jnp.exp(LN10 * (-3.0 + 2.0 * u2)), rs_ref[:])

        u = _uniform_from_bits(bits(shape2))
        rv_ref[:] = (2.0 * u - 1.0) * margin
        rk_ref[:] = jnp.zeros(shape2, jnp.float32)
        _draw_params(jnp.ones(shape2, dtype=jnp.bool_))

        def body(t, _):
            duties = [2.0 * _uniform_from_bits(bits(shape)) - 1.0
                      for _k in range(6)]
            c, s = c_ref[:], s_ref[:]
            isa, isb, pa, pb, eps = _step_physics_cs(
                out_isa[:], out_isb[:], out_psa[:], out_psb[:], out_eps[:],
                c, s, duties)
            eps = eps - np.float32(TWO_PI) * jnp.floor(eps * np.float32(1.0 / TWO_PI))
            c_new = c * COS_D - s * SIN_D
            s_new = s * COS_D + c * SIN_D
            inv_cs = jax.lax.rsqrt(c_new * c_new + s_new * s_new)
            c_new = c_new * inv_cs
            s_new = s_new * inv_cs

            # field-oriented dq currents from the flux direction cosines
            pn2 = pa * pa + pb * pb
            inv_pn = jax.lax.rsqrt(jnp.maximum(pn2, 1e-18))
            safe = pn2 > 1e-18
            cf = jnp.where(safe, pa * inv_pn, 1.0)
            sf = jnp.where(safe, pb * inv_pn, 0.0)
            i_sd = (cf * isa + sf * isb) * (1.0 / i_lim)
            i_sq = (-sf * isa + cf * isb) * (1.0 / i_lim)

            violated = (i_sd * i_sd + i_sq * i_sq) > 1.0
            refs = rv_ref[:]
            wse = -(w_over_span * jnp.abs(i_sd - refs[:R])
                    + w_over_span * jnp.abs(i_sq - refs[R:]))
            reward = jnp.where(violated, violation_reward, wse)
            out_reward[:] = out_reward[:] + reward
            out_terms[:] = out_terms[:] + violated.astype(jnp.float32)

            zero = jnp.zeros(shape, jnp.float32)
            out_isa[:] = jnp.where(violated, zero, isa)
            out_isb[:] = jnp.where(violated, zero, isb)
            out_psa[:] = jnp.where(violated, zero, pa)
            out_psb[:] = jnp.where(violated, zero, pb)
            out_eps[:] = jnp.where(violated, zero, eps)
            c_ref[:] = jnp.where(violated, jnp.ones(shape, jnp.float32), c_new)
            s_ref[:] = jnp.where(violated, zero, s_new)

            # concat float masks, not bools: Mosaic rejects the i1
            # vreg cast the bool concat needs when R is not a
            # multiple of the sublane count (small-batch kernels)
            viol_f = violated.astype(jnp.float32)
            reset2 = jnp.concatenate([viol_f, viol_f], axis=0) > 0.5
            # one Box-Muller pair per env feeds both reference streams
            u1 = _uniform_from_bits(bits(shape))
            u2 = _uniform_from_bits(bits(shape))
            rad = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
            theta = np.float32(TWO_PI) * u2
            draw = jnp.concatenate(
                [rad * jnp.cos(theta), rad * jnp.sin(theta)], axis=0)
            regen = (rk_ref[:] >= rl_ref[:]) | reset2
            _draw_params(regen)
            rk_ref[:] = jnp.where(regen, 0.0, rk_ref[:]) + 1.0
            value = jnp.clip(rv_ref[:] + rs_ref[:] * draw, -margin, margin)
            u3 = _uniform_from_bits(bits(shape2))
            rv_ref[:] = jnp.where(reset2, (2.0 * u3 - 1.0) * margin, value)
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)
        out_rv[:] = rv_ref[:]
        out_rk[:] = rk_ref[:]
        out_rl[:] = rl_ref[:]
        out_rs[:] = rs_ref[:]

    def kernel_buffer(isa_ref, isb_ref, psa_ref, psb_ref, eps_ref, actions_ref,
                      out_isa, out_isb, out_psa, out_psb, out_eps):
        out_isa[:] = isa_ref[:]
        out_isb[:] = isb_ref[:]
        out_psa[:] = psa_ref[:]
        out_psb[:] = psb_ref[:]
        out_eps[:] = eps_ref[:]

        def body(t, _):
            duties = [actions_ref[t, k] for k in range(6)]
            isa, isb, pa, pb, eps = _step_physics(
                out_isa[:], out_isb[:], out_psa[:], out_psb[:], out_eps[:],
                duties)
            eps = eps - np.float32(TWO_PI) * jnp.floor(eps * np.float32(1.0 / TWO_PI))
            out_isa[:] = isa
            out_isb[:] = isb
            out_psa[:] = pa
            out_psb[:] = pb
            out_eps[:] = eps
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    if action_mode == "buffer":
        @jax.jit
        def rollout(isa0, isb0, psa0, psb0, eps0, actions):
            return pl.pallas_call(
                kernel_buffer,
                out_shape=tuple(jax.ShapeDtypeStruct(shape, jnp.float32)
                                for _ in range(5)),
                in_specs=[vmem] * 6,
                out_specs=tuple(vmem for _ in range(5)),
                interpret=interpret,
            )(isa0, isb0, psa0, psb0, eps0, actions)

        return rollout

    out_shapes = (tuple(jax.ShapeDtypeStruct(shape, jnp.float32) for _ in range(7))
                  + tuple(jax.ShapeDtypeStruct(shape2, jnp.float32) for _ in range(4)))

    @jax.jit
    def rollout(seed, isa0, isb0, psa0, psb0, eps0):
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem] * 5,
            out_specs=tuple(vmem for _ in range(11)),
            scratch_shapes=(
                [pltpu.VMEM(shape2, jnp.float32) for _ in range(4)]
                + [pltpu.VMEM(shape2, jnp.uint32)]
                + [pltpu.VMEM(shape, jnp.float32) for _ in range(2)]
            ),
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32), isa0, isb0, psa0, psb0, eps0)

    return rollout


def _dfim_family(env, R, action_mode, randomize=None):
    """Shared DFIM-family closures — consumed by the reducing rollout
    (``make_fused_dfim_family_rollout``) and the generic trajectory
    recorder (``ops.pallas_record``).

    ``randomize``: optional ``{param: (lo, hi)}`` — ``r_s``/``r_r`` as
    per-env state planes (winding-resistance temperature drift); same
    design as ``_dc_family`` / ``_induction_family``."""
    ps = env.physical_system
    _fused_check_system(
        ps, allow_dead_time=True, allow_state_noise=True,
        allow_dq_wrapper=("_DFIMDqToAbcActionProcessor",))
    mp = {k: float(v) for k, v in ps.motor.parameter.items()}
    names = list(ps.state_names)
    lim = np.asarray(ps.limits)
    conv = ps.converter
    finite = conv.action_type == "finite"
    k_int = _fused_interlock(conv, float(ps.tau), finite)
    t_int = k_int * float(ps.tau)

    l_m = mp["l_m"]
    l_s = l_m + mp["l_sigs"]
    l_r = l_m + mp["l_sigr"]
    r_s, r_r, p = mp["r_s"], mp["r_r"], mp["p"]
    sg = (l_s * l_r - l_m**2) / (l_s * l_r)
    c_w = l_m * p / (sg * l_r * l_s)
    c_u = 1.0 / (sg * l_s)
    c_ur = l_m / (sg * l_r * l_s)
    k_t = 1.5 * p * l_m / l_r

    param_names, n_param, p_idx, param_ranges = _parse_randomize(
        randomize, ("r_s", "r_r", "j_rotor", "u_sup"), "DFIM",
        "the electrical resistances + inertia + u_sup")
    # DFIM DqToAbcActionProcessor wrapper (dq_to_abc_action_processor
    # .py:115-149): (d_s, q_s, d_r, q_r) — stator pair rotated at the
    # advanced rotor angle, rotor pair at (FluxObserver psi_angle -
    # advance); the observer rides as two extra state planes (see
    # _induction_family).
    dqw = _fused_dq_wrapper(ps, ("_DFIMDqToAbcActionProcessor",))
    if dqw is not None:
        if finite:
            raise NotImplementedError(
                "the DFIM DqToAbc wrapper needs continuous converters")
    # DqToAbc wrapper + DeadTimeProcessor: fused via _wrap_dead_time's
    # convert hook — the stored planes are the six CONVERTED
    # (stator abc + rotor def) duties, both pairs rotated at the
    # push-time angles (see _sync_family)
    dq_dead = dqw is not None and _fused_dead_time_steps(ps) > 0
    n_obspsi = 2 if dqw is not None else 0
    adv_k = float(dqw._angle_advance) if dqw is not None else 0.0
    _obs_c = r_r * l_m / l_r
    _obs_a = r_r / l_r
    n_ach = 4 if dqw is not None else 6
    _sg_ls = sg * l_s
    _lm2_lr2 = l_m**2 / l_r**2
    _c_psi_den = sg * l_s * l_r**2

    def resolve(pp):
        """(tau_r, tau_sig, c_psi) in the exact float expression order of
        the baked path (see _induction_family)."""
        r_s_v = pp[p_idx["r_s"]] if "r_s" in p_idx else r_s
        r_r_v = pp[p_idx["r_r"]] if "r_r" in p_idx else r_r
        tau_r = l_r / r_r_v
        tau_sig = _sg_ls / (r_s_v + r_r_v * _lm2_lr2)
        c_psi = l_m * r_r_v / _c_psi_den
        return tau_r, tau_sig, c_psi

    tau = float(ps.tau)
    i_lim = float(lim[names.index("i_sd")])
    t_lim = float(lim[names.index("torque")])
    w_lim = float(lim[names.index("omega")])
    shape = (R, LANE)

    mload = _make_fused_mech(ps, float(mp["j_rotor"]), shape)
    resolve, j_rand = _wrap_j_resolve(resolve, mload, p_idx)
    mech_mode, mech = mload.mode, mload.mech
    needs_step_noise = mload.needs_step_noise
    omega_fixed = mload.omega_fixed
    sup = _make_fused_supply(ps, shape, tau)
    _u_idx = _u_sup_plane_idx(p_idx, sup)
    n_sup = sup.n_sup
    COS_D = SIN_D = COS_DI = SIN_DI = None
    if not mech:
        COS_D = np.float32(np.cos(tau * p * omega_fixed))
        SIN_D = np.float32(np.sin(tau * p * omega_fixed))
        COS_DI = np.float32(np.cos(t_int * p * omega_fixed))
        SIN_DI = np.float32(np.sin(t_int * p * omega_fixed))

    def torque(el):
        return k_t * (el[2] * el[1] - el[3] * el[0])

    def el_rhs(w, el, u_sal, u_sbe, u_ral, u_rbe, pc):
        tau_r, tau_sig, c_psi = pc[:3]
        i_sa, i_sb, ps_a, ps_b = el
        pw = p * w
        di_sa = (-i_sa / tau_sig + c_psi * ps_a + c_w * w * ps_b
                 + c_u * u_sal - c_ur * u_ral)
        di_sb = (-i_sb / tau_sig + c_psi * ps_b - c_w * w * ps_a
                 + c_u * u_sbe - c_ur * u_rbe)
        dps_a = (l_m * i_sa - ps_a) / tau_r - pw * ps_b + u_ral
        dps_b = (l_m * i_sb - ps_b) / tau_r + pw * ps_a + u_rbe
        return di_sa, di_sb, dps_a, dps_b

    if mech:
        def rhs(core, us, z, ts, pc):
            w, el, eps = core[0], core[1:5], core[5]
            if j_rand:
                dw = mload.mech_rhs_j(w, torque(el), z, pc[-1])
            elif mload.needs_time:
                dw = mload.mech_rhs_t(w, torque(el), z, ts)
            else:
                dw = mload.mech_rhs(w, torque(el), z)
            return (dw,) + el_rhs(w, el, *us, pc) + (p * w,)
    else:
        def rhs(core, us, z, ts, pc):
            el, eps = core[0:4], core[4]
            return (el_rhs(omega_fixed, el, *us, pc)
                    + (np.float32(p * omega_fixed) + 0.0 * eps,))

    n_core = 6 if mech else 5
    n_state = n_core + n_sup + n_param + n_obspsi
    i_eps = n_core - 1

    n_bridge = (6 if (finite and (k_int > 0.0
                                  or ps.supply.kind == "RCVoltageSupply"))
                else 0)

    b6 = _make_b6(finite, k_int)

    def bridge_cmd(action):
        a_s, a_r = action
        return b6.cmd(a_s) + b6.cmd(a_r)

    def advance_bridges(bs, action):
        cmd = bridge_cmd(action)
        if k_int > 0.0:
            return tuple(_interlock_state(b, c) for b, c in zip(bs, cmd))
        return cmd

    def voltage_fracs(action, i_s_abc=None, i_r_abc=None, st=None):
        """dual-B6 phase voltage fractions of u_sup (cont channels carry
        the interlock discount on their own phase currents; interlocked
        finite reads the half-bridge states incl. freewheeling)"""
        if finite:
            a_s, a_r = action
            return (b6.frac(a_s, i_s_abc, st[:3] if st else None),
                    b6.frac(a_r, i_r_abc, st[3:] if st else None))
        return (b6.frac(action[:3], i_s_abc),
                b6.frac(action[3:6], i_r_abc))

    def alphabeta_to_abc(i_al, i_be):
        half_b = np.float32(0.5 * np.sqrt(3.0))
        return (i_al, -0.5 * i_al + half_b * i_be,
                -0.5 * i_al - half_b * i_be)

    def phase_currents(el, c, s):
        """(stator abc, rotor 'def') phase currents: stator straight from
        Clarke inverse; rotor currents reconstructed from the fluxes
        (i_r = (psi_r - l_m i_s)/l_r, physical_systems.py:954-966).
        QUIRK kept: the reference Clarkes the STATOR-FRAME rotor
        alpha/beta current directly into what it calls 'def' — it never
        rotates into the rotor frame (physical_systems.py:985-986), so
        neither do we (nor does the XLA path)."""
        i_sa, i_sb, ps_a, ps_b = el
        i_ra = (ps_a - l_m * i_sa) * (1.0 / l_r)
        i_rb = (ps_b - l_m * i_sb) * (1.0 / l_r)
        return alphabeta_to_abc(i_sa, i_sb), alphabeta_to_abc(i_ra, i_rb)

    def conv_i_sup(action, i_s_abc, i_r_abc, st=None):
        """dual-B6 supply current"""
        if finite:
            a_s, a_r = action
            return (b6.i_sup(a_s, i_s_abc, st[:3] if st else None)
                    + b6.i_sup(a_r, i_r_abc, st[3:] if st else None))
        return (b6.i_sup(action[0:3], i_s_abc)
                + b6.i_sup(action[3:6], i_r_abc))

    def _us_of(fracs, u_sup_val, c, s):
        s_frac, r_frac = fracs
        s_abc = tuple(f * u_sup_val for f in s_frac)
        r_abc = tuple(f * u_sup_val for f in r_frac)

        def clarke(abc):
            return ((2.0 / 3.0) * (abc[0] - 0.5 * (abc[1] + abc[2])),
                    np.float32(1.0 / np.sqrt(3.0)) * (abc[1] - abc[2]))

        u_sal, u_sbe = clarke(s_abc)
        u_ral0, u_rbe0 = clarke(r_abc)
        # rotor frame -> stator frame: rotate by the electrical angle
        return (u_sal, u_sbe,
                c * u_ral0 - s * u_rbe0, s * u_ral0 + c * u_rbe0)

    def rk4(core, us, z, dt, pc, t0=None):
        def axpy(st, k, cc):
            return tuple(si + cc * ki for si, ki in zip(st, k))

        tm = te = None
        if t0 is not None:
            tm, te = t0 + 0.5 * dt, t0 + dt
        k1 = rhs(core, us, z, t0, pc)
        k2 = rhs(axpy(core, k1, 0.5 * dt), us, z, tm, pc)
        k3 = rhs(axpy(core, k2, 0.5 * dt), us, z, tm, pc)
        k4 = rhs(axpy(core, k3, dt), us, z, te, pc)
        return tuple(
            si + (dt / 6.0) * (a1 + 2.0 * (a2 + a3) + a4)
            for si, a1, a2, a3, a4 in zip(core, k1, k2, k3, k4)
        )

    def _obs_advance(new_core, psi_obs):
        if not n_obspsi:
            return ()
        el_n = new_core[1:5] if mech else new_core[0:4]
        w_el = np.float32(p) * (new_core[0] if mech
                                else np.float32(omega_fixed))
        pre, pim = psi_obs
        d_re = el_n[0] * np.float32(_obs_c) - (pre * np.float32(_obs_a)
                                               + pim * w_el)
        d_im = el_n[1] * np.float32(_obs_c) - (pim * np.float32(_obs_a)
                                               - pre * w_el)
        return (pre + d_re * np.float32(tau), pim + d_im * np.float32(tau))

    def physics_step(state, action, c, s, z=None, bs=None, t0=None):
        core = state[:n_core]
        sup_planes = state[n_core:n_core + n_sup]
        pp = state[n_core + n_sup:n_core + n_sup + n_param]
        psi_obs = state[n_core + n_sup + n_param:]
        pc = resolve(pp)
        if dqw is not None and not dq_dead:
            # stator pair at the ADVANCED rotor angle
            w_now = core[0] if mech else omega_fixed
            delta = np.float32(adv_k * tau * p) * w_now
            cd, sd = jnp.cos(delta), jnp.sin(delta)
            ca, sa = c * cd - s * sd, s * cd + c * sd
            s_al = ca * action[0] - sa * action[1]
            s_be = sa * action[0] + ca * action[1]
            # rotor pair at (observer psi_angle - advanced angle)
            fc, fsn = flux_dir((None, None, psi_obs[0], psi_obs[1]))
            cr = fc * ca + fsn * sa
            sr = fsn * ca - fc * sa
            r_al = cr * action[2] - sr * action[3]
            r_be = sr * action[2] + cr * action[3]
            action = (alphabeta_to_abc(s_al, s_be)
                      + alphabeta_to_abc(r_al, r_be))
        # dq_dead: action arrives PRE-CONVERTED (6 abc/def duties) from
        # the dead-time deque (converted at push time by dt_convert)
        finite_il = finite and k_int > 0.0
        i_s_abc = i_r_abc = None
        if sup.needs_i_sup or k_int != 0.0:
            el_pre = core[1:5] if mech else core[0:4]
            i_s_abc, i_r_abc = phase_currents(el_pre, c, s)
        if sup.needs_i_sup:
            # dual finite B6: previous cycle's switch states feed i_sup
            # (see _dc_family.step_physics)
            i_sup_val = conv_i_sup(action, i_s_abc, i_r_abc,
                                   bs if finite else None)
        else:
            i_sup_val = None
        u_sup_val, sup_new = sup.supply_u(
            sup_planes, i_sup_val,
            None if _u_idx is None else pp[_u_idx])

        if finite_il:
            # 2-sub-interval interlock schedule, mid-cycle angle/current
            # refresh (see _sync_family.physics_step)
            cmd = bridge_cmd(action)
            inter = tuple(_interlock_state(b, c2)
                          for b, c2 in zip(bs, cmd))
            flag = inter[0] != cmd[0]
            for b, c2 in zip(inter[1:], cmd[1:]):
                flag = flag | (b != c2)
            f0 = voltage_fracs(action, i_s_abc, i_r_abc, inter)
            dt0 = jnp.where(flag, np.float32(t_int), 0.0)
            dt1 = jnp.where(flag, np.float32(tau - t_int),
                            np.float32(tau))
            tm = None if t0 is None else t0 + dt0
            core_mid = rk4(core, _us_of(f0, u_sup_val, c, s), z,
                           dt0, pc, t0)
            if mech:
                eps_mid = core_mid[i_eps]
                c1, s1 = jnp.cos(eps_mid), jnp.sin(eps_mid)
            else:
                c1 = jnp.where(flag, c * COS_DI - s * SIN_DI, c)
                s1 = jnp.where(flag, s * COS_DI + c * SIN_DI, s)
            el_mid = core_mid[1:5] if mech else core_mid[0:4]
            i_s_m, i_r_m = phase_currents(el_mid, c1, s1)
            f1 = voltage_fracs(action, i_s_m, i_r_m, inter)
            fr = tuple(
                tuple(jnp.where(flag, b, a) for a, b in zip(fa, fb))
                for fa, fb in zip(f0, f1))
            new_core = rk4(core_mid, _us_of(fr, u_sup_val, c1, s1),
                           z, dt1, pc, tm)
            return (new_core + sup_new + pp
                    + _obs_advance(new_core, psi_obs))

        us = _us_of(voltage_fracs(action, i_s_abc, i_r_abc), u_sup_val,
                    c, s)
        new_core = rk4(core, us, z, tau, pc, t0)
        return (new_core + sup_new + pp
                + _obs_advance(new_core, psi_obs))

    def reset_state(bits):
        zero = jnp.zeros(shape, jnp.float32)
        core = ((mload.omega_reset(bits),) if mech else ()) + (zero,) * 5
        pdraws = _param_reset_draws(bits, shape, param_ranges)
        return (core + _sup_reset_planes(sup, bits, pdraws, _u_idx) + pdraws
                + (zero,) * n_obspsi)

    ref_cfg = _ref_configs(env, R,
                           require_wiener=action_mode == "random")
    n_ref = len(ref_cfg)
    n_rows = _ref_n_rows(ref_cfg)
    shape_r = (n_rows * R, LANE)
    rw = env.reward_function
    bias = np.float32(rw._bias_value)
    violation_reward = np.float32(rw._violation_value)
    needs_dq = any(c["name"] in ("i_sd", "i_sq") for c in ref_cfg)

    def flux_dir(el):
        ps_a, ps_b = el[2], el[3]
        mag2 = ps_a * ps_a + ps_b * ps_b
        tiny = mag2 < 1e-24
        inv = jax.lax.rsqrt(jnp.where(tiny, 1.0, mag2))
        return (jnp.where(tiny, 1.0, ps_a * inv),
                jnp.where(tiny, 0.0, ps_b * inv))

    def ref_quantities(state, cs):
        el = state[1:5] if mech else state[0:4]
        if needs_dq:
            c, s = cs
            i_sa, i_sb = el[0], el[1]
            i_dq = (c * i_sa + s * i_sb, c * i_sb - s * i_sa)
        else:
            i_dq = (None, None)
        out = []
        for cfg in ref_cfg:
            nm = cfg["name"]
            if nm == "omega":
                out.append(state[0] * np.float32(1.0 / w_lim))
            elif nm == "torque":
                out.append(torque(el) * np.float32(1.0 / t_lim))
            elif nm == "i_sd":
                out.append(i_dq[0] * cfg["inv_lim"])
            else:
                out.append(i_dq[1] * cfg["inv_lim"])
        return out

    def _sample_actions(bits):
        if finite:
            b = bits(shape)
            return ((b & jnp.uint32(7)).astype(jnp.int32),
                    ((b >> jnp.uint32(3)) & jnp.uint32(7)).astype(jnp.int32))
        return tuple(2.0 * _uniform_from_bits(bits(shape)) - 1.0
                     for _ in range(n_ach))

    # --- DeadTimeProcessor fused as carried action planes (see
    #     pallas_common._wrap_dead_time) ---
    physics_step, advance_bridges, n_bridge, bridge_dtypes = \
        _wrap_mech_time(mload, tau, physics_step, advance_bridges,
                        n_bridge, has_cs=True, k_int=k_int)
    dt_convert = None
    if dq_dead:
        def dt_convert(acts, cur, aux):
            # family kernels pass (c, s); the generic record/policy
            # kernels pass the full pre_step aux (cs, c, s)
            c, s = aux if len(aux) == 2 else (aux[1], aux[2])
            psi_obs = cur[n_core + n_sup + n_param:]
            w_now = cur[0] if mech else omega_fixed
            delta = np.float32(adv_k * tau * p) * w_now
            cd, sd = jnp.cos(delta), jnp.sin(delta)
            ca, sa = c * cd - s * sd, s * cd + c * sd
            s_al = ca * acts[0] - sa * acts[1]
            s_be = sa * acts[0] + ca * acts[1]
            fc, fsn = flux_dir((None, None, psi_obs[0], psi_obs[1]))
            cr = fc * ca + fsn * sa
            sr = fsn * ca - fc * sa
            r_al = cr * acts[2] - sr * acts[3]
            r_be = sr * acts[2] + cr * acts[3]
            return (alphabeta_to_abc(s_al, s_be)
                    + alphabeta_to_abc(r_al, r_be))

    physics_step, advance_bridges, n_bridge, bridge_dtypes = \
        _wrap_dead_time(ps,
                        (jnp.int32,) * 2 if finite
                        else (jnp.float32,) * (6 if dq_dead else n_ach),
                        physics_step, advance_bridges, n_bridge,
                        has_cs=True, base_dtypes=bridge_dtypes,
                        convert=dt_convert)

    # --- generic record-adapter surface (see ops/pallas_record.py) ---
    state_names = ((("omega",) if mech else ())
                   + ("i_salpha", "i_sbeta", "psi_ralpha", "psi_rbeta",
                      "eps") + sup.names + param_names
                   + (("psi_obs_alpha", "psi_obs_beta") if n_obspsi
                      else ()))
    observe = _fused_state_noise(
        ps, state_names, lambda nm: float(lim[names.index(nm)]),
        allowed=(("omega",) if mech else ()))
    act_names = (("action_stator", "action_rotor") if finite
                 else (("action_sd", "action_sq", "action_rd",
                        "action_rq") if dqw is not None
                       else ("action_sa", "action_sb", "action_sc",
                             "action_ra", "action_rb", "action_rc")))
    act_dtype = jnp.int32 if finite else jnp.float32
    n_act = len(act_names)
    inv_ilim2 = np.float32(1.0 / (i_lim * i_lim))

    def read_actions(ref, t):
        return tuple(ref[t, j] for j in range(n_act))

    def pre_step(cur):
        """(flux cs for the stale-angle dq outputs, park c/s for the rotor
        voltage rotation)"""
        el = cur[1:5] if mech else cur[0:4]
        cs = flux_dir(el) if needs_dq else ()
        return (cs, jnp.cos(cur[i_eps]), jnp.sin(cur[i_eps]))

    rot_init = rot_advance = pre_step_rot = None
    if not mech:
        rot_init, rot_advance = _rotation_protocol(COS_D, SIN_D, i_eps)

        def pre_step_rot(cur, c, s):
            # the flux direction depends on the evolving state — only the
            # constant-speed Park angle rides the rotation scratch
            cs = flux_dir(cur[0:4]) if needs_dq else ()
            return (cs, c, s)

    def step(cur, acts, aux, z=None, bs=None):
        _, c, s = aux
        state = physics_step(cur, acts, c, s, z, bs)
        eps = state[i_eps]
        eps = eps - np.float32(TWO_PI) * jnp.floor(
            eps * np.float32(1.0 / TWO_PI))
        return state[:i_eps] + (eps,) + state[i_eps + 1:]

    no_cons = _fused_constraint_mode(
        env, (("squared", ("i_sq", "i_sd")),)) == "none"

    def violated(state):
        if no_cons:  # constraints=(): the env never terminates
            return jnp.zeros(shape, jnp.bool_)
        el = state[1:5] if mech else state[0:4]
        # |i_dq| == |i_alphabeta| (rotation-invariant)
        return (el[0] * el[0] + el[1] * el[1]) * inv_ilim2 > 1.0

    def quantities(state, aux):
        cs = aux[0]
        return ref_quantities(state, cs if needs_dq else None)

    # --- policy-adapter surface (see ops/pallas_policy.py) ---
    off = 1 if mech else 0
    psi_lim = float(l_m) * i_lim
    obs_spec = _policy_obs_spec(mech, w_lim, omega_fixed, [
        ("state", off, 1.0 / i_lim), ("state", off + 1, 1.0 / i_lim),
        ("state", off + 2, 1.0 / psi_lim), ("state", off + 3, 1.0 / psi_lim),
        ("cos", i_eps), ("sin", i_eps)])

    return SimpleNamespace(
        obs_spec=obs_spec, act_ns=((8, 8) if finite else None),
        act_range=(None if finite else
                   (np.full((n_ach,), -1.0, np.float32),
                    np.ones((n_ach,), np.float32))),
        aux_cs=lambda aux: (aux[1], aux[2]),
        n_state=n_state, finite=finite, mech=mech, shape=shape,
        shape_r=shape_r, n_ref=n_ref, n_rows=n_rows, ref_cfg=ref_cfg, bias=bias,
        violation_reward=violation_reward, i_lim=i_lim, needs_dq=needs_dq,
        COS_D=COS_D, SIN_D=SIN_D, physics_step=physics_step,
        flux_dir=flux_dir, ref_quantities=ref_quantities,
        sample_actions=_sample_actions, state_names=state_names,
        act_names=act_names, act_dtype=act_dtype,
        sample_actions_t=_sample_actions, read_actions=read_actions,
        pre_step=pre_step, step=step, violated=violated,
        quantities=quantities, pre_step_rot=pre_step_rot,
        rot_init=rot_init, rot_advance=rot_advance,
        mech_mode=mech_mode, sup_mode=sup.mode, n_sup=n_sup, n_core=n_core,
        i_eps=i_eps, needs_step_noise=needs_step_noise,
        param_names=param_names, param_ranges=param_ranges,
        n_param=n_param, n_obspsi=n_obspsi, observe=observe,
        reset_state=reset_state, n_bridge=n_bridge, bridge_dtypes=bridge_dtypes,
        advance_bridges=_norm_advance(advance_bridges),
    )


def make_fused_dfim_family_rollout(env, n_steps, n_envs,
                                   action_mode="random", interpret=False, randomize=None):
    """Universal fused rollout for the doubly-fed induction family — all 6
    {Finite,Cont} x {CC,TC,SC} DFIM catalog configs.

    Same alpha/beta electrical model and rotor-voltage rotation as
    ``make_fused_dfim_rollout`` (physical_systems.py:968-1054; the def->dq
    ->alphabeta rotation chain collapses to one rotation by the electrical
    angle), with the dual converter (finite B6 bits x2 vs cont duties x6),
    task references (stator i_sd*/i_sq* in the rotor-flux frame via the
    PRE-step flux direction — the reference's stale-angle output quirk —
    | torque* | omega*) and the mechanical model read from the env spec.

    * random mode: ``rollout(seed, *state0) -> (*states, reward_sum,
      term_count, rv, rk, rl, rs)``; states = (omega?, i_sa, i_sb, psi_ra,
      psi_rb, eps).
    * buffer mode: ``rollout(*state0, actions) -> states`` with int32
      ``(n_steps, 2, R, LANE)`` (finite B6 bits: stator, rotor) or float32
      ``(n_steps, 6, R, LANE)`` (cont duties) action buffers.
    """
    assert n_envs % LANE == 0
    R = n_envs // LANE
    fs = _dfim_family(env, R, action_mode, randomize)
    n_state, finite, mech, shape, shape_r = (
        fs.n_state, fs.finite, fs.mech, fs.shape, fs.shape_r)
    n_ref, ref_cfg = fs.n_ref, fs.ref_cfg
    n_rows = fs.n_rows
    bias, violation_reward, i_lim = fs.bias, fs.violation_reward, fs.i_lim
    needs_dq, flux_dir = fs.needs_dq, fs.flux_dir
    COS_D, SIN_D, i_eps = fs.COS_D, fs.SIN_D, fs.i_eps
    n_bs = fs.n_bridge
    physics_step, ref_quantities = fs.physics_step, fs.ref_quantities
    _sample_actions = fs.sample_actions
    has_wf = _ref_needs_wf(ref_cfg)

    def kernel(seed_ref, *refs):
        state0 = refs[:n_state]
        out_state = refs[n_state: 2 * n_state]
        out_reward, out_terms, out_rv, out_rk, out_rl, out_rs = (
            refs[2 * n_state: 2 * n_state + 6])
        scratch = refs[2 * n_state + 6:]
        rv_ref, rk_ref, rl_ref, rs_ref, rng_ref = scratch[:5]
        j = 5
        za_ref = zb_ref = c_ref = s_ref = None
        if n_rows == 1:
            za_ref, zb_ref = scratch[j], scratch[j + 1]
            j += 2
        if not mech:
            c_ref, s_ref = scratch[j], scratch[j + 1]
        wf_ref = scratch[-1] if has_wf else None
        seed, bits = _make_rng(interpret, rng_ref)
        seed(seed_ref[0])
        for o, s in zip(out_state, state0):
            o[:] = s[:]
        if not mech:
            c_ref[:] = jnp.cos(state0[i_eps][:])
            s_ref[:] = jnp.sin(state0[i_eps][:])
        out_reward[:] = jnp.zeros(shape, jnp.float32)
        out_terms[:] = jnp.zeros(shape, jnp.float32)

        w_init, w_advance = _make_wiener(bits, ref_cfg, R, shape, shape_r,
                                         rv_ref, rk_ref, rl_ref, rs_ref,
                                         za_ref, zb_ref, wf_ref)
        w_init()

        inv_2pi = np.float32(1.0 / TWO_PI)
        inv_ilim2 = np.float32(1.0 / (i_lim * i_lim))

        def body(t, bs):
            action = _sample_actions(bits)
            z = _step_noise(fs.needs_step_noise, bits, shape)
            cur = tuple(o[:] for o in out_state)
            cs = (flux_dir(cur[1:5] if mech else cur[0:4])
                  if needs_dq else None)
            if mech:
                c, s = jnp.cos(cur[i_eps]), jnp.sin(cur[i_eps])
            else:
                c, s = c_ref[:], s_ref[:]
            state = physics_step(cur, action, c, s, z,
                                 bs if n_bs else None)
            eps = state[i_eps]
            eps = eps - np.float32(TWO_PI) * jnp.floor(eps * inv_2pi)
            state = state[:i_eps] + (eps,) + state[i_eps + 1:]

            sobs = fs.observe(state, bits) if fs.observe else state
            violated = fs.violated(sobs)
            qs = ref_quantities(sobs, cs)
            refs_now = rv_ref[:]
            wse = bias - _wse_err(ref_cfg[0], qs[0], refs_now[:R])
            if n_ref == 2:
                wse = wse - _wse_err(ref_cfg[1], qs[1], refs_now[R:])
            reward = jnp.where(violated, violation_reward, wse)
            out_reward[:] = out_reward[:] + reward
            out_terms[:] = out_terms[:] + violated.astype(jnp.float32)
            zero = jnp.zeros(shape, jnp.float32)
            for o, s2, r0 in zip(out_state, state, fs.reset_state(bits)):
                o[:] = jnp.where(violated, r0, s2)
            if not mech:
                c_new = c * COS_D - s * SIN_D
                s_new = s * COS_D + c * SIN_D
                inv = jax.lax.rsqrt(c_new * c_new + s_new * s_new)
                c_ref[:] = jnp.where(violated,
                                     jnp.ones(shape, jnp.float32),
                                     c_new * inv)
                s_ref[:] = jnp.where(violated, zero, s_new * inv)

            w_advance(t, violated)
            if not n_bs:
                return 0
            return tuple(jnp.where(violated, 0, b)
                         for b in fs.advance_bridges(bs, action, cur,
                                                     (c, s)))

        init = (tuple(jnp.zeros(shape, dt) for dt in fs.bridge_dtypes)
                if n_bs else 0)
        jax.lax.fori_loop(0, n_steps, body, init)
        out_rv[:] = rv_ref[:]
        out_rk[:] = rk_ref[:]
        out_rl[:] = rl_ref[:]
        out_rs[:] = rs_ref[:]

    def kernel_buffer(*refs):
        state0 = refs[:n_state]
        actions_ref = refs[n_state]
        out_state = refs[n_state + 1:]
        for o, s in zip(out_state, state0):
            o[:] = s[:]
        inv_2pi = np.float32(1.0 / TWO_PI)

        def body(t, bs):
            if finite:
                action = (actions_ref[t, 0], actions_ref[t, 1])
            else:
                action = tuple(actions_ref[t, k]
                               for k in range(len(fs.act_names)))
            cur = tuple(o[:] for o in out_state)
            c, s = jnp.cos(cur[i_eps]), jnp.sin(cur[i_eps])
            state = physics_step(cur, action, c, s, None,
                                 bs if n_bs else None)
            eps = state[i_eps]
            eps = eps - np.float32(TWO_PI) * jnp.floor(eps * inv_2pi)
            state = state[:i_eps] + (eps,) + state[i_eps + 1:]
            for o, s2 in zip(out_state, state):
                o[:] = s2
            if not n_bs:
                return 0
            return fs.advance_bridges(bs, action, cur, (c, s))

        init = (tuple(jnp.zeros(shape, dt) for dt in fs.bridge_dtypes)
                if n_bs else 0)
        jax.lax.fori_loop(0, n_steps, body, init)

    if action_mode == "buffer":
        assert not fs.needs_step_noise, (
            "buffer (bit-validation) mode needs deterministic physics; "
            "set the OU load's sigma to 0")

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    if action_mode == "buffer":
        @jax.jit
        def rollout(*args):
            return pl.pallas_call(
                kernel_buffer,
                out_shape=tuple(jax.ShapeDtypeStruct(shape, jnp.float32)
                                for _ in range(n_state)),
                in_specs=[vmem] * (n_state + 1),
                out_specs=tuple(vmem for _ in range(n_state)),
                interpret=interpret,
            )(*args)

        return rollout

    out_shapes = (tuple(jax.ShapeDtypeStruct(shape, jnp.float32)
                        for _ in range(n_state + 2))
                  + tuple(jax.ShapeDtypeStruct(shape_r, jnp.float32)
                          for _ in range(4)))
    scratch_shapes = (
        [pltpu.VMEM(shape_r, jnp.float32) for _ in range(4)]
        + [pltpu.VMEM(shape_r, jnp.uint32)]
        + ([pltpu.VMEM(shape, jnp.float32) for _ in range(2)]
           if n_rows == 1 else [])
        + ([] if mech else [pltpu.VMEM(shape, jnp.float32) for _ in range(2)])
        + ([pltpu.VMEM((4 * n_rows * R, LANE), jnp.float32)]
           if has_wf else [])
    )

    @jax.jit
    def rollout(seed, *state0):
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem] * n_state,
            out_specs=tuple(vmem for _ in range(len(out_shapes))),
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32), *state0)

    return rollout


