"""Fused Pallas rollout kernel for the flagship Finite-CC-PMSM config.

The XLA path (vmap + scan) executes ~100 small VPU ops per env step with the
state bouncing through HBM every scan iteration — measured at ~59M
env-steps/s on one v5e chip.  This kernel runs the ENTIRE rollout inside one
``pallas_call``: every state variable lives in VMEM for all T steps, random
numbers come from the on-core PRNG (``pltpu.prng_seed`` /
``prng_random_bits``), and the only HBM traffic is the initial/final state.

Semantics: one control cycle of Finite-CC-PMSM-v0 exactly as the XLA path
computes it —

  B6 bridge voltage from the discrete action (converters.py:788-823)
  -> abc->dq Park transform at the cycle-start rotor angle
     (physical_systems.py:496-506)
  -> RK4 over the PMSM dq ODE (permanent_magnet_synchronous_motor.py:107-119)
  -> Wiener reference recurrences for i_sd*/i_sq* with on-device sub-episode
     regeneration (wiener_process_reference_generator.py:30-49)
  -> WeightedSumOfErrors reward + squared dq-current constraint
     (weighted_sum_of_errors.py:125-129, constraints.py:71-98)
  -> in-kernel auto-reset on violation.

Six kernels live here — fused env rollouts for PMSM, PermExDc, SCIM, EESM
and DFIM, plus the fused FOC controller-in-the-loop closed loop — all
validated in tests/test_pallas_rollout.py: deterministic physics bit-level
against the XLA env (buffer-action / const-ref modes), and the stochastic
parts (Wiener references, sub-episode regeneration, in-kernel auto-reset)
statistically via the interpret-mode xorshift bit source (see ``_make_rng``)
against the XLA env at matched config.
"""

from __future__ import annotations

import functools
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TWO_PI = 2.0 * np.pi


def _uniform_from_bits(bits):
    """uint32 bits -> float32 uniform in [0, 1).

    Mosaic has no uint32->float32 cast; route the (24-bit, sign-safe) value
    through int32."""
    return ((bits >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32)
            * np.float32(1.0 / (1 << 24)))


def _fused_u_sup(ps):
    """Supply voltage constant for the SPECIALIZED fused kernels.

    Only the ideal supply's compile-time constant is representable in
    these kernels (voltage_supplies.py:60-72); RC/AC supplies and
    interlocking dead time run through the universal family kernels
    (``make_fused_rollout``) or the general XLA path.  RC/AC specs also
    expose ``u_nominal``, so reading it without this check would
    *silently* simulate them as ideal."""
    if ps.supply.kind != "IdealVoltageSupply":
        raise NotImplementedError(
            f"the specialized fused kernels support IdealVoltageSupply "
            f"only; got {ps.supply.kind!r} — use make_fused_rollout (the "
            f"universal dispatch) or the general XLA path")
    if float(getattr(ps.converter, "interlocking_time", 0.0) or 0.0) != 0.0:
        raise NotImplementedError(
            "the specialized fused kernels support zero interlocking dead "
            "time only; use make_fused_rollout (the universal dispatch) "
            "or the general XLA path")
    return float(ps.supply.u_nominal)


def _fused_load(ps, kinds=("ConstantSpeedLoad", "PolynomialStaticLoad")):
    """Load spec for fused kernels, restricted to the kinds the calling
    kernel implements.  ExternalSpeedLoad (host-defined profile closure) and
    OrnsteinUhlenbeckLoad (per-step noise stream) run on the general XLA
    path; without this check they would fail with a cryptic KeyError or —
    worse — a ``float(None)`` TypeError deep in the builder."""
    if ps.load.kind not in kinds:
        raise NotImplementedError(
            f"this fused kernel supports loads {kinds}; got "
            f"{ps.load.kind!r} — use the general XLA path "
            f"(VectorEnv.rollout)")
    return ps.load


_FUSED_OK_WRAPPERS = ("CurrentSumProcessor", "CosSinProcessor",
                      "FluxObserver")


def _fused_check_system(ps):
    """Reject silently-ignorable-but-wrong env configurations LOUDLY.

    Observation-only wrappers (CurrentSum/CosSin/FluxObserver,
    physical_system_wrappers/) are fine: the fused kernels derive
    rewards/constraints from the raw drive state and never emit wrapper
    observation channels.  Wrappers that change the physics or the action
    contract (DeadTimeProcessor's action delay, StateNoiseProcessor's
    reward-relevant state noise, DqToAbcActionProcessor) and
    ``control_space='dq'`` systems (2/3-dim dq actions vs the kernels'
    abc sampling) must run on the general XLA path — without this check
    the kernels would simulate different physics than the env contract.
    """
    chain = []
    cur = ps
    while hasattr(cur, "inner"):  # PhysicalSystemWrapper chain
        chain.append(type(cur).__name__)
        cur = cur.inner
    bad = [n for n in chain if n not in _FUSED_OK_WRAPPERS]
    if bad:
        raise NotImplementedError(
            f"fused kernels support observation-only wrappers "
            f"{_FUSED_OK_WRAPPERS}; got {bad} — use the general XLA path "
            f"(VectorEnv.rollout)")
    if getattr(cur, "control_space", "abc") != "abc":
        raise NotImplementedError(
            "fused kernels sample abc converter actions; "
            "control_space='dq' runs on the general XLA path "
            "(VectorEnv.rollout)")


def _make_fused_supply(ps, shape, tau):
    """Supply model shared by every universal family builder — the
    in-kernel counterpart of voltage_supplies.py.

    Non-ideal supplies carry per-env dynamics as extra ``(R, LANE)`` state
    planes appended after the family's core state.  Returned namespace:

    * ``mode``: ``'ideal' | 'ac1' | 'rc'``; ``n_sup``: number of supply
      planes (0 or 2); ``names``: their record-signal names;
    * ``needs_i_sup``: True iff ``supply_u`` consumes the converter supply
      current (the RC element, voltage_supplies.py:75-123);
    * ``supply_u(sup_planes, i_sup) -> (u_sup, new_planes)``: the DC-link
      voltage for this control cycle plus advanced planes;
    * ``sup_reset(bits)``: per-episode reset plane values (AC1 draws the
      random phase, voltage_supplies.py:126-166).

    AC3PhaseSupply (``voltage_len == 3``) is rejected: polyphase supply
    output only composes with NoConverter (grid simulation), which has no
    fused kernel — the general XLA path covers it.
    """
    sup_kind = ps.supply.kind
    sp_par = ps.supply.parameter

    if sup_kind == "IdealVoltageSupply":
        mode, n_sup, names, needs_i_sup = "ideal", 0, (), False
        u_sup_c = float(ps.supply.u_nominal)

        def supply_u(sup, i_sup_val):
            return u_sup_c, ()

        def sup_reset(bits):
            return ()
    elif sup_kind == "AC1PhaseSupply":
        # u_sup(t) = max_amp * sin(2 pi f t + phi), phi random per episode
        # (voltage_supplies.py:126-166); state planes (phi, t).  NOTE: the
        # float32 absolute-time plane accumulates tau per step, so the sine
        # phase gets noisy (~4e-3 rad ulp at t~1e5 steps) deep into very
        # long launches — identical to the XLA path's float32 t, so the
        # two stay in lockstep, but both drift from a float64 reference
        mode, n_sup, needs_i_sup = "ac1", 2, False
        names = ("sup_phi", "sup_t")
        f_ac, amp_ac = float(sp_par["f"]), float(sp_par["max_amp"])
        fixed_phase = float(sp_par.get("fixed_phase", 0.0)) > 0.0
        phi0_ac = float(sp_par.get("phase", 0.0))

        def supply_u(sup, i_sup_val):
            phi, t_c = sup
            u = amp_ac * jnp.sin(np.float32(TWO_PI * f_ac) * t_c + phi)
            return u, (phi, t_c + tau)

        def sup_reset(bits):
            if fixed_phase:
                phi = jnp.full(shape, np.float32(phi0_ac))
            else:
                phi = np.float32(TWO_PI) * _uniform_from_bits(bits(shape))
            return (phi, jnp.zeros(shape, jnp.float32))
    elif sup_kind == "RCVoltageSupply":
        # embedded-Euler RC element (voltage_supplies.py:75-123); state
        # planes (u_sup, t); dt = 0 on the first post-reset query
        mode, n_sup, needs_i_sup = "rc", 2, True
        names = ("u_sup", "sup_t")
        u0_rc, r_rc, c_rc = (float(sp_par["u_0"]), float(sp_par["R"]),
                             float(sp_par["C"]))

        def supply_u(sup, i_sup_val):
            u, t_c = sup
            dt = jnp.minimum(t_c, tau)
            u_new = u + dt * ((u0_rc - u - r_rc * i_sup_val)
                              * np.float32(1.0 / (r_rc * c_rc)))
            return u_new, (u_new, t_c + tau)

        def sup_reset(bits):
            return (jnp.full(shape, np.float32(u0_rc)),
                    jnp.zeros(shape, jnp.float32))
    else:
        raise NotImplementedError(
            f"fused kernels support IdealVoltageSupply/AC1PhaseSupply/"
            f"RCVoltageSupply; got {sup_kind!r} — use the general XLA "
            f"path (VectorEnv.rollout)")

    return SimpleNamespace(mode=mode, n_sup=n_sup, names=names,
                           needs_i_sup=needs_i_sup, supply_u=supply_u,
                           sup_reset=sup_reset)


def _make_fused_mech(ps, j_rotor, shape):
    """Mechanical model shared by every universal family builder.

    Modes: ``'const'`` (ConstantSpeedLoad — ``omega_fixed``, no omega
    plane), ``'poly'`` (PolynomialStaticLoad incl. the omega~0
    linearization, polynomial_static_load.py:87-107) and ``'ou'``
    (torque-independent Ornstein-Uhlenbeck speed process,
    ornstein_uhlenbeck_load.py / the loads.py factory closure).

    ``mech_rhs(w, t_e, z)`` is d(omega)/dt given the electrical torque
    ``t_e`` and (OU only) the per-step standard normal ``z``;
    ``omega_reset(bits)`` is the in-kernel autoreset plane value (OU draws
    omega ~ U(omega_lo, omega_hi); poly resets to 0 without consuming
    bits).  ``needs_step_noise`` tells the kernel to feed one Box-Muller
    normal per step into the RK4 stages (constant across substages, like
    the XLA path's per-step draw).
    """
    load = _fused_load(ps, ("ConstantSpeedLoad", "PolynomialStaticLoad",
                            "OrnsteinUhlenbeckLoad"))
    mech_rhs = omega_reset = None
    omega_fixed = None
    needs_step_noise = False

    if load.kind == "PolynomialStaticLoad":
        mode = "poly"
        lp = load.parameter
        a_c, b_c, c_c = float(lp["a"]), float(lp["b"]), float(lp["c"])
        j_total = float(load.j_load) + float(j_rotor)
        tau_decay = 1e-3
        omega_lin = a_c / j_total * tau_decay

        def mech_rhs(w, t_e, z):
            sign = jnp.sign(w)
            a_term = jnp.where(jnp.abs(w) > omega_lin, sign * a_c,
                               j_total / tau_decay * w)
            t_load = sign * c_c * w * w + b_c * w + a_term
            return (t_e - t_load) * (1.0 / j_total)

        def omega_reset(bits):
            return jnp.zeros(shape, jnp.float32)
    elif load.kind == "OrnsteinUhlenbeckLoad":
        mode = "ou"
        lp = load.parameter
        mu_l, theta_l = float(lp["mu"]), float(lp["theta"])
        sigma_l, tau_l = float(lp["sigma"]), float(lp["tau"])
        w_lo, w_hi = float(lp["omega_lo"]), float(lp["omega_hi"])
        sig_sqrt_tau = sigma_l * float(np.sqrt(tau_l))
        needs_step_noise = sigma_l > 0.0

        def mech_rhs(w, t_e, z):
            # torque-independent OU speed process (loads.py factory;
            # ornstein_uhlenbeck_load.py semantics)
            diff = theta_l * (mu_l - w) * tau_l
            if z is not None:
                diff = diff + sig_sqrt_tau * z
            return jnp.clip(diff, (w_lo - w) * (1.0 / tau_l),
                            (w_hi - w) * (1.0 / tau_l))

        def omega_reset(bits):
            # omega ~ U(omega_lo, omega_hi) (loads.py initializer)
            u_r = _uniform_from_bits(bits(shape))
            return np.float32(w_lo) + np.float32(w_hi - w_lo) * u_r
    else:
        mode = "const"
        omega_fixed = float(load.omega_fixed)

    return SimpleNamespace(mode=mode, mech=mode != "const",
                           omega_fixed=omega_fixed, mech_rhs=mech_rhs,
                           omega_reset=omega_reset,
                           needs_step_noise=needs_step_noise)


def _hb_u_st(st, i):
    """Half-bridge voltage fraction from the switching state
    (converters.py:277-287): 1 -> high, 2 -> low, 0 -> body diode
    freewheeling (high iff the current is negative)."""
    free = jnp.where(i < 0.0, 1.0, 0.0)
    return jnp.where(st == 1, 1.0, jnp.where(st == 2, 0.0, free))


def _hb_i_st(st, i):
    """Half-bridge supply current from the switching state
    (converters.py:289-298)."""
    free = jnp.where(i < 0.0, i, 0.0)
    return jnp.where(st == 1, i, jnp.where(st == 2, 0.0, free))


def _interlock_state(bs, cmd):
    """Interval switching state under interlocking (converters.py:300-310
    via models/converters.py::_hb_interlock_pattern): a half-bridge whose
    command differs from its previous state (neither all-off) opens for
    the whole control cycle — the reference's deferred-interlock quirk."""
    return jnp.where((cmd == 0) | (bs == 0) | (cmd == bs), cmd,
                     jnp.zeros_like(cmd))


def _make_b6(finite, k_int):
    """B6 half-bridge converter law shared by the sync/induction/EESM/DFIM
    family builders (converters.py:743-911): command decode, voltage
    fractions and supply current — finite via the action bits (or the
    carried switching states ``st`` incl. the freewheeling all-off branch
    under interlocking), cont via interlock-discounted duties.

    Returns ``namespace(cmd, frac, i_sup)``:
    ``cmd(action)`` -> 3 commanded half-bridge states (2 - bit);
    ``frac(action, i_abc=None, st=None)`` -> 3 voltage fractions of u_sup;
    ``i_sup(action, i_abc, st=None)`` -> converter supply current.
    """

    def cmd(action):
        return (2 - ((action >> 2) & 1), 2 - ((action >> 1) & 1),
                2 - (action & jnp.int32(1)))

    def frac(action, i_abc=None, st=None):
        if finite:
            if st is not None:
                return tuple(_hb_u_st(st[j], i_abc[j]) - 0.5
                             for j in range(3))
            return (((action >> 2) & 1).astype(jnp.float32) - 0.5,
                    ((action >> 1) & 1).astype(jnp.float32) - 0.5,
                    ((action & 1)).astype(jnp.float32) - 0.5)
        if k_int == 0.0:
            return 0.5 * action[0], 0.5 * action[1], 0.5 * action[2]
        return tuple(
            _c2u(0.5 * (jnp.clip(action[j], -1.0, 1.0) + 1.0), i_abc[j],
                 k_int) - 0.5
            for j in range(3))

    def i_sup(action, i_abc, st=None):
        i_a, i_b, i_c = i_abc
        if finite:
            if st is not None:
                return (_hb_i_st(st[0], i_a) + _hb_i_st(st[1], i_b)
                        + _hb_i_st(st[2], i_c))
            return (((action >> 2) & 1).astype(jnp.float32) * i_a
                    + ((action >> 1) & 1).astype(jnp.float32) * i_b
                    + (action & 1).astype(jnp.float32) * i_c)
        return (_c2i(0.5 * (jnp.clip(action[0], -1.0, 1.0) + 1.0), i_a,
                     k_int)
                + _c2i(0.5 * (jnp.clip(action[1], -1.0, 1.0) + 1.0), i_b,
                       k_int)
                + _c2i(0.5 * (jnp.clip(action[2], -1.0, 1.0) + 1.0), i_c,
                       k_int))

    return SimpleNamespace(cmd=cmd, frac=frac, i_sup=i_sup)


def _c2u(d, i, k):
    """Cont half-bridge duty minus the interlock discount, clipped
    (converters.py:148-184; k = t_interlock / tau, a static constant)."""
    if k == 0.0:
        return d
    return jnp.clip(d - jnp.sign(i) * np.float32(k), 0.0, 1.0)


def _c2i(d, i, k):
    """Cont half-bridge supply current incl. the interlock correction
    (converters.py:429-435)."""
    if k == 0.0:
        return d * i
    return (d + np.float32(k) * (jnp.where(i < 0, 1.0, 0.0) - d)) * i


def _fused_interlock(conv, tau, finite):
    """Static interlock fraction k = t_int / tau for the fused kernels.

    Cont converters fold interlocking into the duty/current corrections
    (``_c2u``/``_c2i``); finite converters run the 2-sub-interval
    switching schedule with carried half-bridge states
    (converters.py:99-111).  ``finite`` is kept for call-site symmetry
    with the family builders."""
    del finite
    return float(getattr(conv, "interlocking_time", 0.0) or 0.0) / tau


def _step_noise(needs, bits, shape):
    """One standard normal per env step for the OU speed load (None when
    the family carries no per-step mechanical noise)."""
    if not needs:
        return None
    u1 = _uniform_from_bits(bits(shape))
    u2 = _uniform_from_bits(bits(shape))
    return (jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
            * jnp.cos(np.float32(TWO_PI) * u2))


def _make_rng(interpret, state_ref):
    """In-kernel PRNG: ``(seed_fn, bits_fn)`` where ``bits_fn(shape)`` yields
    uint32 random bits.

    Compiled (TPU): the on-core hardware PRNG (``pltpu.prng_seed`` /
    ``prng_random_bits``) — ``state_ref`` is unused.

    Interpret (CPU tests): the TPU PRNG primitives have no CPU lowering, so a
    per-lane xorshift32 stream lives in the ``state_ref`` scratch instead.
    Only the *bit source* differs — every consumer (Box-Muller, sigma draws,
    episode lengths, resets) runs the identical code in both modes, which is
    what the statistical tests in tests/test_pallas_rollout.py validate.
    """
    if not interpret:
        def seed(s):
            pltpu.prng_seed(s)

        def bits(shape):
            return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)

        return seed, bits

    rows, lanes = state_ref.shape

    def seed(s):
        flat = (jax.lax.broadcasted_iota(jnp.uint32, (rows, lanes), 0)
                * jnp.uint32(lanes)
                + jax.lax.broadcasted_iota(jnp.uint32, (rows, lanes), 1))
        v = ((flat + jnp.uint32(1)) * jnp.uint32(2654435761)
             ^ (s.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)))
        state_ref[:] = v | jnp.uint32(1)  # xorshift must not start at 0

    def bits(shape):
        s = state_ref[:]
        s = s ^ (s << jnp.uint32(13))
        s = s ^ (s >> jnp.uint32(17))
        s = s ^ (s << jnp.uint32(5))
        state_ref[:] = s
        return s[: shape[0], : shape[1]]

    return seed, bits


class _PmsmCtx:
    """Baked constants + per-step physics closures for the Finite-CC-PMSM
    (and SynRM, psi_p=0) kernels — shared by the reducing rollout
    (``make_fused_pmsm_rollout``) and the trajectory-recording rollout
    (``make_fused_pmsm_record_rollout``) so the semantics cannot diverge."""

    def __init__(self, env):
        ps = env.physical_system
        mp = ps.motor.parameter
        names = list(ps.state_names)
        lim = np.asarray(ps.limits)

        r_s, l_d, l_q = float(mp["r_s"]), float(mp["l_d"]), float(mp["l_q"])
        psi_p, p = float(mp.get("psi_p", 0.0)), float(mp["p"])
        omega = float(_fused_load(ps, ("ConstantSpeedLoad",)).omega_fixed)
        self.tau = tau = float(ps.tau)
        u_sup = _fused_u_sup(ps)
        self.i_lim = float(lim[names.index("i_sd")])
        # Wiener margins: nominal/limit ratio times the state-space bounds
        self.margin = float(ps.nominal_state[names.index("i_sd")] / self.i_lim)
        # WeightedSumOfErrors over the two referenced currents, span 2 each
        self.w_over_span = 0.5 / 2.0
        self.violation_reward = -1.0 / (1.0 - 0.9)  # r_min/(1-gamma), rw_sum=1
        self.p_omega = p_omega = p * omega

        # Park-rotation increment per control cycle: with ConstantSpeedLoad
        # the electrical angle advances by a COMPILE-TIME-CONSTANT
        # tau*p*omega, so cos/sin(eps) are maintained by a 4-mul incremental
        # rotation (plus rsqrt renorm to bound float32 drift) instead of two
        # transcendental evaluations per step — and the in-kernel reset
        # angle is zero, so the reset rotation state is the constant (1, 0).
        self.COS_D = np.float32(np.cos(tau * p_omega))
        self.SIN_D = np.float32(np.sin(tau * p_omega))

        def sub_interval_rhs(i_sd, i_sq, u_d, u_q):
            di_sd = (-r_s * i_sd + l_q * p_omega * i_sq + u_d) * (1.0 / l_d)
            di_sq = (-psi_p * p_omega - r_s * i_sq - l_d * p_omega * i_sd
                     + u_q) * (1.0 / l_q)
            return di_sd, di_sq

        def rk4(i_sd, i_sq, u_d, u_q):
            k1d, k1q = sub_interval_rhs(i_sd, i_sq, u_d, u_q)
            k2d, k2q = sub_interval_rhs(i_sd + 0.5 * tau * k1d,
                                        i_sq + 0.5 * tau * k1q, u_d, u_q)
            k3d, k3q = sub_interval_rhs(i_sd + 0.5 * tau * k2d,
                                        i_sq + 0.5 * tau * k2q, u_d, u_q)
            k4d, k4q = sub_interval_rhs(i_sd + tau * k3d, i_sq + tau * k3q,
                                        u_d, u_q)
            sixth = tau / 6.0
            return (i_sd + sixth * (k1d + 2.0 * (k2d + k3d) + k4d),
                    i_sq + sixth * (k1q + 2.0 * (k2q + k3q) + k4q))

        def physics_step_cs(i_sd, i_sq, eps, c, s, action):
            # B6 bridge: action bits -> phase voltage (converters.py:788-823)
            ua = ((action >> 2) & 1).astype(jnp.float32) - 0.5
            ub = ((action >> 1) & 1).astype(jnp.float32) - 0.5
            uc = (action & 1).astype(jnp.float32) - 0.5
            ua, ub, uc = ua * u_sup, ub * u_sup, uc * u_sup
            # Clarke + Park at the cycle-start angle
            u_alpha = (2.0 / 3.0) * (ua - 0.5 * (ub + uc))
            u_beta = np.float32(1.0 / np.sqrt(3.0)) * (ub - uc)
            u_d = c * u_alpha + s * u_beta
            u_q = -s * u_alpha + c * u_beta
            i_sd, i_sq = rk4(i_sd, i_sq, u_d, u_q)
            return i_sd, i_sq, eps + tau * p_omega

        def physics_step(i_sd, i_sq, eps, action):
            c, s = jnp.cos(eps), jnp.sin(eps)
            return physics_step_cs(i_sd, i_sq, eps, c, s, action)

        self.physics_step_cs = physics_step_cs
        self.physics_step = physics_step


def make_fused_pmsm_rollout(env, n_steps, n_envs, action_mode="random",
                            interpret=False):
    """Build the fused rollout.  ``env`` must be a Finite-CC-PMSM-v0 (or
    Finite-CC-SynRM-v0 — the same dq machine with psi_p = 0,
    synchronous_reluctance_motor.py:117-173) functional env; its constants
    are baked into the kernel.

    Returns ``rollout(seed, i_sd0, i_sq0, eps0) -> (i_sd, i_sq, eps,
    reward_sum, term_count)`` with all array args/outputs shaped
    ``(n_envs // 128, 128)`` float32.  With ``action_mode='buffer'`` the
    rollout takes an extra ``(n_steps, n_envs // 128, 128)`` int32 action
    array and disables the stochastic parts (no reference noise, no reset) —
    the configuration used for bit-level physics validation.
    """
    assert n_envs % LANE == 0
    R = n_envs // LANE
    ctx = _PmsmCtx(env)
    i_lim, margin = ctx.i_lim, ctx.margin
    w_over_span, violation_reward = ctx.w_over_span, ctx.violation_reward
    COS_D, SIN_D = ctx.COS_D, ctx.SIN_D
    physics_step_cs, physics_step = ctx.physics_step_cs, ctx.physics_step
    random_actions = action_mode == "random"

    shape = (R, LANE)

    # both reference generators (i_sd*, i_sq*) live stacked in one
    # (2R, LANE) buffer: rows [0:R] = i_sd*, rows [R:2R] = i_sq* — one
    # vector op advances both
    shape2 = (2 * R, LANE)
    LN10 = np.float32(np.log(10.0))

    def kernel_random(seed_ref, i_sd_ref, i_sq_ref, eps_ref,
                      out_i_sd, out_i_sq, out_eps, out_reward, out_terms,
                      out_rv, out_rk, out_rl, out_rs,
                      rv_ref, rk_ref, rl_ref, rs_ref, rng_ref,
                      c_ref, s_ref):
        seed, bits = _make_rng(interpret, rng_ref)
        seed(seed_ref[0])
        out_i_sd[:] = i_sd_ref[:]
        out_i_sq[:] = i_sq_ref[:]
        out_eps[:] = eps_ref[:]
        c_ref[:] = jnp.cos(eps_ref[:])
        s_ref[:] = jnp.sin(eps_ref[:])
        out_reward[:] = jnp.zeros(shape, jnp.float32)
        out_terms[:] = jnp.zeros(shape, jnp.float32)

        def _draw_params(mask):
            u1 = _uniform_from_bits(bits(shape2))
            u2 = _uniform_from_bits(bits(shape2))
            new_len = jnp.floor(500.0 + 1500.0 * u1)
            new_sig = jnp.exp(LN10 * (-3.0 + 2.0 * u2))  # log-uniform [1e-3, 1e-1]
            rl_ref[:] = jnp.where(mask, new_len, rl_ref[:])
            rs_ref[:] = jnp.where(mask, new_sig, rs_ref[:])

        # init both generators
        u = _uniform_from_bits(bits(shape2))
        rv_ref[:] = (2.0 * u - 1.0) * margin
        rk_ref[:] = jnp.zeros(shape2, jnp.float32)
        _draw_params(jnp.ones(shape2, dtype=jnp.bool_))

        def body(t, _):
            action = (bits(shape) & jnp.uint32(7)).astype(jnp.int32)
            c, s = c_ref[:], s_ref[:]
            i_sd, i_sq, eps = physics_step_cs(
                out_i_sd[:], out_i_sq[:], out_eps[:], c, s, action)
            eps = eps - np.float32(TWO_PI) * jnp.floor(eps * np.float32(1.0 / TWO_PI))
            c_new = c * COS_D - s * SIN_D
            s_new = s * COS_D + c * SIN_D
            inv = jax.lax.rsqrt(c_new * c_new + s_new * s_new)
            c_new = c_new * inv
            s_new = s_new * inv

            i_sd_n = i_sd * (1.0 / i_lim)
            i_sq_n = i_sq * (1.0 / i_lim)
            violated = (i_sd_n * i_sd_n + i_sq_n * i_sq_n) > 1.0
            refs = rv_ref[:]
            wse = -(w_over_span * jnp.abs(i_sd_n - refs[:R])
                    + w_over_span * jnp.abs(i_sq_n - refs[R:]))
            reward = jnp.where(violated, violation_reward, wse)
            out_reward[:] = out_reward[:] + reward
            out_terms[:] = out_terms[:] + violated.astype(jnp.float32)

            # in-kernel auto-reset (constant default initializers)
            zero = jnp.zeros(shape, jnp.float32)
            out_i_sd[:] = jnp.where(violated, zero, i_sd)
            out_i_sq[:] = jnp.where(violated, zero, i_sq)
            out_eps[:] = jnp.where(violated, zero, eps)
            c_ref[:] = jnp.where(violated, jnp.ones(shape, jnp.float32), c_new)
            s_ref[:] = jnp.where(violated, zero, s_new)

            # Wiener advance for both refs in one (2R, LANE) pass
            # concat float masks, not bools: Mosaic rejects the i1
            # vreg cast the bool concat needs when R is not a
            # multiple of the sublane count (small-batch kernels)
            viol_f = violated.astype(jnp.float32)
            reset2 = jnp.concatenate([viol_f, viol_f], axis=0) > 0.5
            # one Box-Muller PAIR per env feeds both reference streams
            # (z1 = r cos, z2 = r sin are exactly independent N(0,1)):
            # halves the log/sqrt/cos lane count vs two independent draws
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
        # final Wiener state snapshot — the observables behind the
        # statistical kernel tests (value / step-counter / length / sigma)
        out_rv[:] = rv_ref[:]
        out_rk[:] = rk_ref[:]
        out_rl[:] = rl_ref[:]
        out_rs[:] = rs_ref[:]

    def kernel_buffer(i_sd_ref, i_sq_ref, eps_ref, actions_ref,
                      out_i_sd, out_i_sq, out_eps, out_reward, out_terms):
        out_i_sd[:] = i_sd_ref[:]
        out_i_sq[:] = i_sq_ref[:]
        out_eps[:] = eps_ref[:]
        out_reward[:] = jnp.zeros(shape, jnp.float32)
        out_terms[:] = jnp.zeros(shape, jnp.float32)

        def body(t, _):
            action = actions_ref[t]
            i_sd, i_sq, eps = physics_step(out_i_sd[:], out_i_sq[:], out_eps[:], action)
            eps = eps - np.float32(TWO_PI) * jnp.floor(eps * np.float32(1.0 / TWO_PI))
            out_i_sd[:] = i_sd
            out_i_sq[:] = i_sq
            out_eps[:] = eps
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)

    out_shapes = tuple(jax.ShapeDtypeStruct(shape, jnp.float32) for _ in range(5))
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    if random_actions:
        debug_shapes = tuple(jax.ShapeDtypeStruct(shape2, jnp.float32)
                             for _ in range(4))

        @jax.jit
        def rollout(seed, i_sd0, i_sq0, eps0):
            return pl.pallas_call(
                kernel_random,
                out_shape=out_shapes + debug_shapes,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vmem, vmem, vmem],
                out_specs=tuple(vmem for _ in range(9)),
                scratch_shapes=(
                    [pltpu.VMEM((2 * R, LANE), jnp.float32) for _ in range(4)]
                    + [pltpu.VMEM((2 * R, LANE), jnp.uint32)]
                    + [pltpu.VMEM(shape, jnp.float32) for _ in range(2)]
                ),
                interpret=interpret,
            )(jnp.asarray([seed], jnp.int32), i_sd0, i_sq0, eps0)

        return rollout

    @jax.jit
    def rollout(i_sd0, i_sq0, eps0, actions):
        return pl.pallas_call(
            kernel_buffer,
            out_shape=out_shapes,
            in_specs=[vmem, vmem, vmem, vmem],
            out_specs=tuple(vmem for _ in range(5)),
            interpret=interpret,
        )(i_sd0, i_sq0, eps0, actions)

    return rollout


def make_fused_pmsm_record_rollout(env, n_steps, n_envs, chunk=None,
                                   action_mode="random", interpret=False):
    """Fused PMSM rollout that RECORDS the full per-step trajectory to HBM.

    Same per-step semantics as ``make_fused_pmsm_rollout`` (B6 bridge ->
    Park -> RK4 -> Wiener references -> WSE reward -> squared constraint ->
    in-kernel auto-reset), but the kernel runs a sequential grid over
    ``n_steps // chunk`` time chunks: the drive state persists in VMEM
    scratch across grid steps while each chunk's per-step signals stream to
    HBM through pipelined output windows.  This is the off-policy /
    analysis path — transitions come OUT of the kernel instead of being
    reduced to sums, at HBM-bandwidth cost instead of dispatch-per-step
    cost.

    ``action_mode='random'``: ``rollout(seed, i_sd0, i_sq0, eps0) ->
    (i_sd, i_sq, eps, ref_d, ref_q, action, reward, done)``, each
    ``(n_steps, n_envs // 128, 128)`` (``action`` int32, rest float32).
    ``i_sd``/``i_sq``/``eps`` are the post-step, post-autoreset values
    (what a Gymnasium ``step`` returns as the next observation);
    ``ref_d``/``ref_q`` are the references the step's reward was computed
    against (the references the agent saw when choosing the action).

    ``action_mode='buffer'``: ``rollout(i_sd0, i_sq0, eps0, actions) ->
    (i_sd, i_sq, eps)`` per step, deterministic physics only — the
    configuration used for step-for-step validation vs the XLA env.

    ``chunk`` (steps per grid iteration) bounds the VMEM window:
    8 signals x chunk x (R x 128) x 4 B must fit alongside the scratch
    state; the default targets ~4 MB (chunk=8 at 16k envs).
    """
    assert n_envs % LANE == 0
    R = n_envs // LANE
    if chunk is None:
        # target ~4 MB of output window (8 signals, double-buffered),
        # clamped to n_steps and snapped down to a divisor of it
        chunk = min(max(1, (8 * LANE) // R), n_steps)
        while n_steps % chunk:
            chunk -= 1
    assert n_steps % chunk == 0, "n_steps must be a multiple of chunk"
    n_chunks = n_steps // chunk

    ctx = _PmsmCtx(env)
    i_lim, margin = ctx.i_lim, ctx.margin
    w_over_span, violation_reward = ctx.w_over_span, ctx.violation_reward
    COS_D, SIN_D = ctx.COS_D, ctx.SIN_D
    physics_step_cs = ctx.physics_step_cs
    LN10 = np.float32(np.log(10.0))
    shape = (R, LANE)
    shape2 = (2 * R, LANE)

    if action_mode == "buffer":
        def kernel_buf(acts_ref, i_sd0_ref, i_sq0_ref, eps0_ref,
                       out_isd, out_isq, out_eps,
                       isd_s, isq_s, eps_s):
            @pl.when(pl.program_id(0) == 0)
            def _():
                isd_s[:] = i_sd0_ref[:]
                isq_s[:] = i_sq0_ref[:]
                eps_s[:] = eps0_ref[:]

            def body(k, _):
                eps = eps_s[:]
                c, s = jnp.cos(eps), jnp.sin(eps)
                i_sd, i_sq, eps = physics_step_cs(
                    isd_s[:], isq_s[:], eps, c, s, acts_ref[k])
                eps = eps - np.float32(TWO_PI) * jnp.floor(
                    eps * np.float32(1.0 / TWO_PI))
                isd_s[:] = i_sd
                isq_s[:] = i_sq
                eps_s[:] = eps
                out_isd[k] = i_sd
                out_isq[k] = i_sq
                out_eps[k] = eps
                return 0

            jax.lax.fori_loop(0, chunk, body, 0)

        tblk = pl.BlockSpec((chunk, R, LANE), lambda i: (i, 0, 0))
        const = pl.BlockSpec((R, LANE), lambda i: (0, 0))
        traj = jax.ShapeDtypeStruct((n_steps, R, LANE), jnp.float32)

        @jax.jit
        def rollout(i_sd0, i_sq0, eps0, actions):
            return pl.pallas_call(
                kernel_buf,
                grid=(n_chunks,),
                out_shape=(traj, traj, traj),
                in_specs=[tblk, const, const, const],
                out_specs=(tblk, tblk, tblk),
                scratch_shapes=[pltpu.VMEM(shape, jnp.float32)
                                for _ in range(3)],
                interpret=interpret,
            )(actions, i_sd0, i_sq0, eps0)

        return rollout

    assert action_mode == "random", action_mode

    def kernel(seed_ref, i_sd0_ref, i_sq0_ref, eps0_ref,
               out_isd, out_isq, out_eps, out_refd, out_refq,
               out_act, out_reward, out_done,
               isd_s, isq_s, eps_s, c_s, s_s,
               rv_ref, rk_ref, rl_ref, rs_ref, rng_ref):
        pid = pl.program_id(0)
        seed, bits = _make_rng(interpret, rng_ref)
        # reseed per chunk (grid iterations are sequential but the PRNG
        # state is not guaranteed to persist across them); stride by
        # n_chunks so launches with different root seeds never share a
        # per-chunk seed (seed s covers [s*n_chunks, (s+1)*n_chunks))
        seed(seed_ref[0] * n_chunks + pid)

        def _draw_params(mask):
            u1 = _uniform_from_bits(bits(shape2))
            u2 = _uniform_from_bits(bits(shape2))
            new_len = jnp.floor(500.0 + 1500.0 * u1)
            new_sig = jnp.exp(LN10 * (-3.0 + 2.0 * u2))
            rl_ref[:] = jnp.where(mask, new_len, rl_ref[:])
            rs_ref[:] = jnp.where(mask, new_sig, rs_ref[:])

        @pl.when(pid == 0)
        def _():
            isd_s[:] = i_sd0_ref[:]
            isq_s[:] = i_sq0_ref[:]
            eps_s[:] = eps0_ref[:]
            c_s[:] = jnp.cos(eps0_ref[:])
            s_s[:] = jnp.sin(eps0_ref[:])
            u = _uniform_from_bits(bits(shape2))
            rv_ref[:] = (2.0 * u - 1.0) * margin
            rk_ref[:] = jnp.zeros(shape2, jnp.float32)
            _draw_params(jnp.ones(shape2, dtype=jnp.bool_))

        def body(k, _):
            action = (bits(shape) & jnp.uint32(7)).astype(jnp.int32)
            c, s = c_s[:], s_s[:]
            i_sd, i_sq, eps = physics_step_cs(
                isd_s[:], isq_s[:], eps_s[:], c, s, action)
            eps = eps - np.float32(TWO_PI) * jnp.floor(
                eps * np.float32(1.0 / TWO_PI))
            c_new = c * COS_D - s * SIN_D
            s_new = s * COS_D + c * SIN_D
            inv = jax.lax.rsqrt(c_new * c_new + s_new * s_new)
            c_new = c_new * inv
            s_new = s_new * inv

            i_sd_n = i_sd * (1.0 / i_lim)
            i_sq_n = i_sq * (1.0 / i_lim)
            violated = (i_sd_n * i_sd_n + i_sq_n * i_sq_n) > 1.0
            refs = rv_ref[:]
            wse = -(w_over_span * jnp.abs(i_sd_n - refs[:R])
                    + w_over_span * jnp.abs(i_sq_n - refs[R:]))
            reward = jnp.where(violated, violation_reward, wse)

            zero = jnp.zeros(shape, jnp.float32)
            isd_s[:] = jnp.where(violated, zero, i_sd)
            isq_s[:] = jnp.where(violated, zero, i_sq)
            eps_s[:] = jnp.where(violated, zero, eps)
            c_s[:] = jnp.where(violated, jnp.ones(shape, jnp.float32), c_new)
            s_s[:] = jnp.where(violated, zero, s_new)

            out_isd[k] = isd_s[:]
            out_isq[k] = isq_s[:]
            out_eps[k] = eps_s[:]
            out_refd[k] = refs[:R]
            out_refq[k] = refs[R:]
            out_act[k] = action
            out_reward[k] = reward
            out_done[k] = violated.astype(jnp.float32)

            viol_f = violated.astype(jnp.float32)
            reset2 = jnp.concatenate([viol_f, viol_f], axis=0) > 0.5
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

        jax.lax.fori_loop(0, chunk, body, 0)

    tblk = pl.BlockSpec((chunk, R, LANE), lambda i: (i, 0, 0))
    const = pl.BlockSpec((R, LANE), lambda i: (0, 0))
    traj_f = jax.ShapeDtypeStruct((n_steps, R, LANE), jnp.float32)
    traj_i = jax.ShapeDtypeStruct((n_steps, R, LANE), jnp.int32)

    @jax.jit
    def rollout(seed, i_sd0, i_sq0, eps0):
        return pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            out_shape=(traj_f, traj_f, traj_f, traj_f, traj_f,
                       traj_i, traj_f, traj_f),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      const, const, const],
            out_specs=(tblk,) * 8,
            scratch_shapes=(
                [pltpu.VMEM(shape, jnp.float32) for _ in range(5)]
                + [pltpu.VMEM(shape2, jnp.float32) for _ in range(4)]
                + [pltpu.VMEM(shape2, jnp.uint32)]
            ),
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32), i_sd0, i_sq0, eps0)

    return rollout


class _PermExCtx:
    """Baked constants + per-step physics closure for the Finite-CC-PermExDc
    kernels — shared by the reducing rollout (``make_fused_permex_rollout``)
    and the trajectory-recording rollout
    (``make_fused_permex_record_rollout``) so the semantics cannot
    diverge."""

    def __init__(self, env):
        ps = env.physical_system
        mp = ps.motor.parameter
        names = list(ps.state_names)
        lim = np.asarray(ps.limits)

        r_a, l_a, psi_e = (float(mp["r_a"]), float(mp["l_a"]),
                           float(mp["psi_e"]))
        omega = float(_fused_load(ps, ("ConstantSpeedLoad",)).omega_fixed)
        self.tau = tau = float(ps.tau)
        u_sup = _fused_u_sup(ps)
        self.i_lim = float(lim[names.index("i")])
        self.margin = float(ps.nominal_state[names.index("i")] / self.i_lim)
        self.w_over_span = 1.0 / 2.0
        self.violation_reward = -1.0 / (1.0 - 0.9)
        emf = psi_e * omega

        def rhs(i, u):
            return (-emf - r_a * i + u) * (1.0 / l_a)

        def step_physics(i, a):
            # 4QC voltage table: a=1 -> +u_sup, a=2 -> -u_sup, else 0
            u_in = (jnp.where(a == 1, 1.0, 0.0)
                    - jnp.where(a == 2, 1.0, 0.0)) * u_sup
            k1 = rhs(i, u_in)
            k2 = rhs(i + 0.5 * tau * k1, u_in)
            k3 = rhs(i + 0.5 * tau * k2, u_in)
            k4 = rhs(i + tau * k3, u_in)
            return i + (tau / 6.0) * (k1 + 2.0 * (k2 + k3) + k4)

        self.step_physics = step_physics


def make_fused_permex_rollout(env, n_steps, n_envs, action_mode="random",
                              interpret=False):
    """Fused rollout for Finite-CC-PermExDc-v0 — the same VMEM-resident
    design as the PMSM kernel, specialized to the 1-state DC drive:
    4QC converter table (converters.py:313-368), RK4 armature ODE
    (dc_permanently_excited_motor.py:71-84), Wiener current reference,
    WSE reward, limit-constraint termination and in-kernel reset.

    ``action_mode='buffer'``: ``rollout(i0, actions)`` with a
    ``(n_steps, n_envs//128, 128)`` int32 action buffer, deterministic
    physics only (no noise / reset) — the bit-level validation path."""
    assert n_envs % LANE == 0
    R = n_envs // LANE
    ctx = _PermExCtx(env)
    i_lim, margin = ctx.i_lim, ctx.margin
    w_over_span, violation_reward = ctx.w_over_span, ctx.violation_reward
    _step_physics = ctx.step_physics
    shape = (R, LANE)
    LN10 = np.float32(np.log(10.0))

    def kernel(seed_ref, i0_ref, out_i, out_reward, out_terms,
               out_rv, out_rk, out_rl, out_rs,
               rv_ref, rk_ref, rl_ref, rs_ref, rng_ref, za_ref, zb_ref):
        seed, bits = _make_rng(interpret, rng_ref)
        seed(seed_ref[0])
        out_i[:] = i0_ref[:]
        out_reward[:] = jnp.zeros(shape, jnp.float32)
        out_terms[:] = jnp.zeros(shape, jnp.float32)

        def _draw_params(mask):
            u1 = _uniform_from_bits(bits(shape))
            u2 = _uniform_from_bits(bits(shape))
            # CC PermExDc sigma range (1e-2, 1e-1) (catalog _REF_SIGMA)
            rl_ref[:] = jnp.where(mask, jnp.floor(500.0 + 1500.0 * u1), rl_ref[:])
            rs_ref[:] = jnp.where(mask, jnp.exp(LN10 * (-2.0 + 1.0 * u2)), rs_ref[:])

        u = _uniform_from_bits(bits(shape))
        rv_ref[:] = (2.0 * u - 1.0) * margin
        rk_ref[:] = jnp.zeros(shape, jnp.float32)
        _draw_params(jnp.ones(shape, dtype=jnp.bool_))

        def body(t, _):
            a = (bits(shape) & jnp.uint32(3)).astype(jnp.int32)
            i = _step_physics(out_i[:], a)

            i_n = i * (1.0 / i_lim)
            violated = jnp.abs(i_n) > 1.0
            reward = jnp.where(violated, violation_reward,
                               -w_over_span * jnp.abs(i_n - rv_ref[:]))
            out_reward[:] = out_reward[:] + reward
            out_terms[:] = out_terms[:] + violated.astype(jnp.float32)
            out_i[:] = jnp.where(violated, jnp.zeros(shape, jnp.float32), i)

            # one Box-Muller pair every OTHER step: z1 = r cos(theta) used
            # immediately, z2 = r sin(theta) cached for the odd step — the
            # two are exactly independent N(0,1), halving the log/sqrt/
            # cos lanes of the single-stream Wiener draw
            even = (t & 1) == 0

            @pl.when(even)
            def _():
                u1 = _uniform_from_bits(bits(shape))
                u2 = _uniform_from_bits(bits(shape))
                rad = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
                theta = np.float32(TWO_PI) * u2
                za_ref[:] = rad * jnp.cos(theta)
                zb_ref[:] = rad * jnp.sin(theta)

            draw = jnp.where(even, za_ref[:], zb_ref[:])
            regen = (rk_ref[:] >= rl_ref[:]) | violated
            _draw_params(regen)
            rk_ref[:] = jnp.where(regen, 0.0, rk_ref[:]) + 1.0
            value = jnp.clip(rv_ref[:] + rs_ref[:] * draw, -margin, margin)
            u3 = _uniform_from_bits(bits(shape))
            rv_ref[:] = jnp.where(violated, (2.0 * u3 - 1.0) * margin, value)
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)
        out_rv[:] = rv_ref[:]
        out_rk[:] = rk_ref[:]
        out_rl[:] = rl_ref[:]
        out_rs[:] = rs_ref[:]

    def kernel_buffer(i0_ref, actions_ref, out_i):
        out_i[:] = i0_ref[:]

        def body(t, _):
            out_i[:] = _step_physics(out_i[:], actions_ref[t])
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    if action_mode == "buffer":
        @jax.jit
        def rollout(i0, actions):
            return pl.pallas_call(
                kernel_buffer,
                out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
                in_specs=[vmem, vmem],
                out_specs=vmem,
                interpret=interpret,
            )(i0, actions)

        return rollout

    out_shapes = tuple(jax.ShapeDtypeStruct(shape, jnp.float32) for _ in range(7))

    @jax.jit
    def rollout(seed, i0):
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vmem],
            out_specs=tuple(vmem for _ in range(7)),
            scratch_shapes=(
                [pltpu.VMEM(shape, jnp.float32) for _ in range(4)]
                + [pltpu.VMEM(shape, jnp.uint32)]
                + [pltpu.VMEM(shape, jnp.float32) for _ in range(2)]
            ),
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32), i0)

    return rollout


def make_fused_permex_record_rollout(env, n_steps, n_envs, chunk=None,
                                     action_mode="random", interpret=False):
    """Trajectory-recording variant of ``make_fused_permex_rollout`` — the
    DC counterpart of ``make_fused_pmsm_record_rollout``: a sequential grid
    over ``n_steps // chunk`` time chunks with the drive state in VMEM
    scratch and per-step signals streaming to HBM.

    ``action_mode='random'``: ``rollout(seed, i0) -> (i, ref, action,
    reward, done)``, each ``(n_steps, n_envs // 128, 128)`` (``action``
    int32, rest float32); ``i`` is the post-step, post-autoreset current,
    ``ref`` the reference the step's reward used.

    ``action_mode='buffer'``: ``rollout(i0, actions) -> i`` per step,
    deterministic physics only (the step-for-step validation path).
    """
    assert n_envs % LANE == 0
    R = n_envs // LANE
    if chunk is None:
        # ~4 MB window (5 signals, double-buffered), snapped to a divisor
        chunk = min(max(1, (12 * LANE) // R), n_steps)
        while n_steps % chunk:
            chunk -= 1
    assert n_steps % chunk == 0, "n_steps must be a multiple of chunk"
    n_chunks = n_steps // chunk

    ctx = _PermExCtx(env)
    i_lim, margin = ctx.i_lim, ctx.margin
    w_over_span, violation_reward = ctx.w_over_span, ctx.violation_reward
    _step_physics = ctx.step_physics
    shape = (R, LANE)
    LN10 = np.float32(np.log(10.0))

    tblk = pl.BlockSpec((chunk, R, LANE), lambda i: (i, 0, 0))
    const = pl.BlockSpec((R, LANE), lambda i: (0, 0))
    traj_f = jax.ShapeDtypeStruct((n_steps, R, LANE), jnp.float32)
    traj_i = jax.ShapeDtypeStruct((n_steps, R, LANE), jnp.int32)

    if action_mode == "buffer":
        def kernel_buf(acts_ref, i0_ref, out_i, i_s):
            @pl.when(pl.program_id(0) == 0)
            def _():
                i_s[:] = i0_ref[:]

            def body(k, _):
                i_s[:] = _step_physics(i_s[:], acts_ref[k])
                out_i[k] = i_s[:]
                return 0

            jax.lax.fori_loop(0, chunk, body, 0)

        @jax.jit
        def rollout(i0, actions):
            return pl.pallas_call(
                kernel_buf,
                grid=(n_chunks,),
                out_shape=traj_f,
                in_specs=[tblk, const],
                out_specs=tblk,
                scratch_shapes=[pltpu.VMEM(shape, jnp.float32)],
                interpret=interpret,
            )(actions, i0)

        return rollout

    assert action_mode == "random", action_mode

    def kernel(seed_ref, i0_ref,
               out_i, out_ref, out_act, out_reward, out_done,
               i_s, rv_ref, rk_ref, rl_ref, rs_ref, rng_ref):
        pid = pl.program_id(0)
        seed, bits = _make_rng(interpret, rng_ref)
        # per-chunk reseed, strided so different root seeds never overlap
        seed(seed_ref[0] * n_chunks + pid)

        def _draw_params(mask):
            u1 = _uniform_from_bits(bits(shape))
            u2 = _uniform_from_bits(bits(shape))
            # CC PermExDc sigma range (1e-2, 1e-1) (catalog _REF_SIGMA)
            rl_ref[:] = jnp.where(mask, jnp.floor(500.0 + 1500.0 * u1),
                                  rl_ref[:])
            rs_ref[:] = jnp.where(mask, jnp.exp(LN10 * (-2.0 + 1.0 * u2)),
                                  rs_ref[:])

        @pl.when(pid == 0)
        def _():
            i_s[:] = i0_ref[:]
            u = _uniform_from_bits(bits(shape))
            rv_ref[:] = (2.0 * u - 1.0) * margin
            rk_ref[:] = jnp.zeros(shape, jnp.float32)
            _draw_params(jnp.ones(shape, dtype=jnp.bool_))

        def body(k, _):
            a = (bits(shape) & jnp.uint32(3)).astype(jnp.int32)
            i = _step_physics(i_s[:], a)

            i_n = i * (1.0 / i_lim)
            violated = jnp.abs(i_n) > 1.0
            ref = rv_ref[:]
            reward = jnp.where(violated, violation_reward,
                               -w_over_span * jnp.abs(i_n - ref))
            i_s[:] = jnp.where(violated, jnp.zeros(shape, jnp.float32), i)

            out_i[k] = i_s[:]
            out_ref[k] = ref
            out_act[k] = a
            out_reward[k] = reward
            out_done[k] = violated.astype(jnp.float32)

            # fresh Box-Muller draw per step (no cross-step pair cache: its
            # parity bookkeeping is not worth it at recording bandwidth)
            u1 = _uniform_from_bits(bits(shape))
            u2 = _uniform_from_bits(bits(shape))
            draw = (jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
                    * jnp.cos(np.float32(TWO_PI) * u2))
            regen = (rk_ref[:] >= rl_ref[:]) | violated
            _draw_params(regen)
            rk_ref[:] = jnp.where(regen, 0.0, rk_ref[:]) + 1.0
            value = jnp.clip(rv_ref[:] + rs_ref[:] * draw, -margin, margin)
            u3 = _uniform_from_bits(bits(shape))
            rv_ref[:] = jnp.where(violated, (2.0 * u3 - 1.0) * margin, value)
            return 0

        jax.lax.fori_loop(0, chunk, body, 0)

    @jax.jit
    def rollout(seed, i0):
        return pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            out_shape=(traj_f, traj_f, traj_i, traj_f, traj_f),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), const],
            out_specs=(tblk,) * 5,
            scratch_shapes=(
                [pltpu.VMEM(shape, jnp.float32) for _ in range(5)]
                + [pltpu.VMEM(shape, jnp.uint32)]
            ),
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32), i0)

    return rollout


def make_fused_dc_sc_rollout(env, n_steps, n_envs, action_mode="random",
                             interpret=False):
    """Fused rollout for the speed-control DC configs —
    Cont-SC-SeriesDc-v0 / Cont-SC-ShuntDc-v0 (the last two BASELINE.json
    configs without a fused kernel).  Same VMEM-resident design as the
    PermExDc kernel, extended with the mechanical dynamics: joint RK4 over
    [omega, currents] with the PolynomialStaticLoad friction model incl.
    its omega~0 linearization (polynomial_static_load.py:87-107), Cont-4QC
    converter (u = a*u_sup, converters.py:438-496), Wiener omega reference
    with the SC margin window [0, nominal/limit], WSE reward on omega and
    limit-constraint termination on the currents with in-kernel reset.

    ``action_mode='buffer'``: ``rollout(*states0, actions)`` with a
    ``(n_steps, n_envs//128, 128)`` float32 action buffer, deterministic
    physics only — the bit-level validation path vs the XLA env.
    """
    assert n_envs % LANE == 0
    R = n_envs // LANE
    ps = env.physical_system
    _fused_check_system(ps)
    mp = ps.motor.parameter
    names = list(ps.state_names)
    lim = np.asarray(ps.limits)
    kind = ps.motor.kind
    assert kind in ("SeriesDc", "ShuntDc"), kind

    tau = float(ps.tau)
    u_sup = _fused_u_sup(ps)
    l_p = float(mp["l_e_prime"])
    lp = _fused_load(ps, ("PolynomialStaticLoad",)).parameter
    a_c, b_c, c_c = float(lp["a"]), float(lp["b"]), float(lp["c"])
    j_total = float(ps.load.j_load) + float(mp["j_rotor"])
    tau_decay = 1e-3
    omega_lin = a_c / j_total * tau_decay

    w_lim = float(lim[names.index("omega")])
    # SC margin window: [0, nominal/limit] (subepisoded margin resolution)
    margin_hi = float(ps.nominal_state[names.index("omega")] / w_lim)
    sigma_lo, sigma_hi = env.reference_generator.subs[0].sigma_range
    sig_base = np.float32(np.log10(sigma_lo))
    sig_span = np.float32(np.log10(sigma_hi) - np.log10(sigma_lo))
    violation_reward = -1.0 / (1.0 - 0.9)
    shape = (R, LANE)
    LN10 = np.float32(np.log(10.0))

    if kind == "SeriesDc":
        r_t, l_t = float(mp["r_a"]) + float(mp["r_e"]), float(mp["l_a"]) + float(mp["l_e"])
        i_lim = float(lim[names.index("i")])
        n_el = 1

        def el_rhs(w, el, u):
            (i,) = el
            return ((-r_t * i - l_p * i * w + u) * (1.0 / l_t),)

        def torque(el):
            (i,) = el
            return l_p * i * i

        def violated_fn(el):
            (i,) = el
            return jnp.abs(i) > i_lim
    else:
        r_a, r_e = float(mp["r_a"]), float(mp["r_e"])
        l_a, l_e = float(mp["l_a"]), float(mp["l_e"])
        ia_lim = float(lim[names.index("i_a")])
        ie_lim = float(lim[names.index("i_e")])
        n_el = 2

        def el_rhs(w, el, u):
            i_a, i_e = el
            return ((-r_a * i_a - l_p * i_e * w + u) * (1.0 / l_a),
                    (-r_e * i_e + u) * (1.0 / l_e))

        def torque(el):
            i_a, i_e = el
            return l_p * i_e * i_a

        def violated_fn(el):
            i_a, i_e = el
            return (jnp.abs(i_a) > ia_lim) | (jnp.abs(i_e) > ie_lim)

    def mech_rhs(w, el):
        sign = jnp.sign(w)
        a_term = jnp.where(jnp.abs(w) > omega_lin, sign * a_c,
                           j_total / tau_decay * w)
        t_load = sign * c_c * w * w + b_c * w + a_term
        return (torque(el) - t_load) * (1.0 / j_total)

    def rhs(state, u):
        w, el = state[0], state[1:]
        return (mech_rhs(w, el),) + el_rhs(w, el, u)

    def _step_physics(state, a):
        u_in = a * u_sup
        def axpy(s, k, c):
            return tuple(si + c * ki for si, ki in zip(s, k))
        k1 = rhs(state, u_in)
        k2 = rhs(axpy(state, k1, 0.5 * tau), u_in)
        k3 = rhs(axpy(state, k2, 0.5 * tau), u_in)
        k4 = rhs(axpy(state, k3, tau), u_in)
        return tuple(
            s + (tau / 6.0) * (a1 + 2.0 * (a2 + a3) + a4)
            for s, a1, a2, a3, a4 in zip(state, k1, k2, k3, k4)
        )

    n_state = 1 + n_el

    def kernel(seed_ref, *refs):
        state0 = refs[:n_state]
        out_state = refs[n_state: 2 * n_state]
        out_reward, out_terms, out_rv, out_rk, out_rl, out_rs = (
            refs[2 * n_state: 2 * n_state + 6])
        (rv_ref, rk_ref, rl_ref, rs_ref, rng_ref,
         za_ref, zb_ref) = refs[2 * n_state + 6:]
        seed, bits = _make_rng(interpret, rng_ref)
        seed(seed_ref[0])
        for o, s in zip(out_state, state0):
            o[:] = s[:]
        out_reward[:] = jnp.zeros(shape, jnp.float32)
        out_terms[:] = jnp.zeros(shape, jnp.float32)

        def _draw_params(mask):
            u1 = _uniform_from_bits(bits(shape))
            u2 = _uniform_from_bits(bits(shape))
            rl_ref[:] = jnp.where(mask, jnp.floor(500.0 + 1500.0 * u1), rl_ref[:])
            rs_ref[:] = jnp.where(
                mask, jnp.exp(LN10 * (sig_base + sig_span * u2)), rs_ref[:])

        u = _uniform_from_bits(bits(shape))
        rv_ref[:] = u * margin_hi
        rk_ref[:] = jnp.zeros(shape, jnp.float32)
        _draw_params(jnp.ones(shape, dtype=jnp.bool_))

        def body(t, _):
            a = 2.0 * _uniform_from_bits(bits(shape)) - 1.0
            state = _step_physics(tuple(o[:] for o in out_state), a)

            w_n = state[0] * (1.0 / w_lim)
            violated = violated_fn(state[1:])
            reward = jnp.where(violated, violation_reward,
                               -jnp.abs(w_n - rv_ref[:]))
            out_reward[:] = out_reward[:] + reward
            out_terms[:] = out_terms[:] + violated.astype(jnp.float32)
            for o, s in zip(out_state, state):
                o[:] = jnp.where(violated, jnp.zeros(shape, jnp.float32), s)

            # one Box-Muller pair every other step (see the PermExDc kernel)
            even = (t & 1) == 0

            @pl.when(even)
            def _():
                u1 = _uniform_from_bits(bits(shape))
                u2 = _uniform_from_bits(bits(shape))
                rad = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
                theta = np.float32(TWO_PI) * u2
                za_ref[:] = rad * jnp.cos(theta)
                zb_ref[:] = rad * jnp.sin(theta)

            draw = jnp.where(even, za_ref[:], zb_ref[:])
            regen = (rk_ref[:] >= rl_ref[:]) | violated
            _draw_params(regen)
            rk_ref[:] = jnp.where(regen, 0.0, rk_ref[:]) + 1.0
            value = jnp.clip(rv_ref[:] + rs_ref[:] * draw, 0.0, margin_hi)
            u3 = _uniform_from_bits(bits(shape))
            rv_ref[:] = jnp.where(violated, u3 * margin_hi, value)
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)
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

        def body(t, _):
            state = _step_physics(tuple(o[:] for o in out_state),
                                  actions_ref[t])
            for o, s in zip(out_state, state):
                o[:] = s
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)

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

    n_out = n_state + 6
    out_shapes = tuple(jax.ShapeDtypeStruct(shape, jnp.float32)
                       for _ in range(n_out))

    @jax.jit
    def rollout(seed, *state0):
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem] * n_state,
            out_specs=tuple(vmem for _ in range(n_out)),
            scratch_shapes=(
                [pltpu.VMEM(shape, jnp.float32) for _ in range(4)]
                + [pltpu.VMEM(shape, jnp.uint32)]
                + [pltpu.VMEM(shape, jnp.float32) for _ in range(2)]
            ),
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32), *state0)

    return rollout


def _dc_family(env, R, action_mode):
    """Shared DC-family physics/reward/action closures — consumed by BOTH
    the reducing rollout (``make_fused_dc_rollout``) and the generic
    trajectory recorder (``ops.pallas_record``) so the two kernels cannot
    diverge (same pattern as ``_PmsmCtx``/``_PermExCtx``).

    Covers the full DC env-arg space, not just the catalog defaults:

    * converters: Finite/Cont 1QC/2QC/4QC (freewheeling kinds read the
      pre-step motor current exactly like the env converter,
      converters.py:218-496) and the ExtExDc dual-4QC multi converter;
    * loads: ConstantSpeedLoad, PolynomialStaticLoad (omega~0
      linearization) and OrnsteinUhlenbeckLoad (per-step normal,
      ornstein_uhlenbeck_load.py);
    * supplies: IdealVoltageSupply, AC1PhaseSupply (per-episode random
      phase, voltage_supplies.py:126-166) and RCVoltageSupply (embedded
      Euler, voltage_supplies.py:75-123).

    Non-default supplies/loads add per-env state planes (see ``n_sup``);
    ``fused_state_arity`` accounts for them.
    """
    ps = env.physical_system
    _fused_check_system(ps)
    mp = ps.motor.parameter
    names = list(ps.state_names)
    lim = np.asarray(ps.limits)
    kind = ps.motor.kind
    assert kind in ("PermExDc", "SeriesDc", "ShuntDc", "ExtExDc"), kind
    conv = ps.converter
    finite = conv.action_type == "finite"
    k_int = _fused_interlock(conv, float(ps.tau), finite)
    t_int = k_int * float(ps.tau)
    n_ch = 2 if kind == "ExtExDc" else 1

    tau = float(ps.tau)
    shape = (R, LANE)

    # --- converter law by kind (converters.py:218-496) ---
    if n_ch == 2:
        sub_kinds = getattr(conv, "sub_kinds", None) or ()
        if tuple(sub_kinds) not in (("Finite-4QC", "Finite-4QC"),
                                    ("Cont-4QC", "Cont-4QC")):
            raise NotImplementedError(
                f"fused ExtExDc kernels support the default dual-4QC multi "
                f"converter; got {sub_kinds!r} — use the general XLA path")
        conv_kinds = tuple(sub_kinds)
    else:
        if conv.kind not in ("Finite-1QC", "Finite-2QC", "Finite-4QC",
                             "Cont-1QC", "Cont-2QC", "Cont-4QC"):
            raise NotImplementedError(
                f"fused DC kernels support 1QC/2QC/4QC converters; got "
                f"{conv.kind!r} — use the general XLA path")
        conv_kinds = (conv.kind,)

    _CHAN_BRIDGES = {"Finite-1QC": 0, "Finite-2QC": 1, "Finite-4QC": 2}
    chan_nb = tuple(_CHAN_BRIDGES.get(ck, 0) for ck in conv_kinds)
    n_bridge = sum(chan_nb) if (finite and (k_int > 0.0 or
                                            getattr(ps.supply, "kind", "")
                                            == "RCVoltageSupply")) else 0

    def chan_cmd(ck, a):
        """commanded half-bridge states for one channel (bridge_actions:
        2QC identity; 4QC sub-state tables 1+(a>=2) / 1+(a&1))"""
        if ck == "Finite-2QC":
            return (a,)
        if ck == "Finite-4QC":
            return (1 + (a >= 2).astype(jnp.int32),
                    1 + (a & jnp.int32(1)))
        return ()

    def split_bs(bs):
        """flat bridge-plane tuple -> per-channel tuples"""
        out, o = [], 0
        for nb in chan_nb:
            out.append(bs[o:o + nb] if bs is not None else None)
            o += nb
        return out

    def conv_u(ck, a, i, st=None):
        """per-channel voltage fraction from the switching state ``st``
        (None: derive from the action — the zero-interlock identity);
        pre-step current ``i`` drives the freewheeling body-diode branches
        (converters.py:277-287); cont kinds fold the interlock discount
        via _c2u"""
        if ck == "Finite-1QC":
            # single transistor + diode: stateless (converters.py:218-245)
            return jnp.where(i >= 0.0, a.astype(jnp.float32), 1.0)
        if ck == "Finite-2QC":
            if st is None:  # cmd == state, never all-off mid-run
                free = jnp.where(i < 0.0, 1.0, 0.0)
                return jnp.where(a == 1, 1.0, jnp.where(a == 2, 0.0, free))
            return _hb_u_st(st[0], i)
        if ck == "Finite-4QC":
            if st is None:
                # dual half-bridge, states in {1,2} never freewheel:
                # a=1 -> +1, a=2 -> -1
                return (jnp.where(a == 1, 1.0, 0.0)
                        - jnp.where(a == 2, 1.0, 0.0))
            return _hb_u_st(st[0], i) - _hb_u_st(st[1], -i)
        if ck == "Cont-1QC":
            # diode topology: no interlock discount (converters.py:371-401)
            return jnp.where(i >= 0.0, jnp.clip(a, 0.0, 1.0), 1.0)
        if ck == "Cont-2QC":
            return _c2u(jnp.clip(a, 0.0, 1.0), i, k_int)
        # Cont-4QC: dual 2QC, both see the same current (converters.py:
        # 438-496); duty clip matters for controller-in-the-loop callers
        # whose cascade emits overmodulated duties during transients
        ac = jnp.clip(a, -1.0, 1.0)
        if k_int == 0.0:
            return ac
        return (_c2u(0.5 * (ac + 1.0), i, k_int)
                - _c2u(-0.5 * (ac - 1.0), i, k_int))

    def conv_i_sup(ck, a, i, st=None):
        """per-channel supply current (converters.py:289-298, 429-496);
        finite 2QC/4QC read the switching state ``st`` (the previous
        cycle's — see step_physics), 1QC reads the current action like the
        reference"""
        if ck == "Finite-1QC":
            return jnp.where(a == 1, i, 0.0)
        if ck == "Finite-2QC":
            if st is None:
                free = jnp.where(i < 0.0, i, 0.0)
                return jnp.where(a == 1, i, jnp.where(a == 2, 0.0, free))
            return _hb_i_st(st[0], i)
        if ck == "Finite-4QC":
            if st is None:
                # states in {1,2}: i_sup = hb_i(s0, i) + hb_i(s1, -i)
                return (jnp.where(a <= 1, i, 0.0)
                        + jnp.where((a == 0) | (a == 2), -i, 0.0))
            return _hb_i_st(st[0], i) + _hb_i_st(st[1], -i)
        if ck == "Cont-1QC":
            return jnp.clip(a, 0.0, 1.0) * i
        if ck == "Cont-2QC":
            return _c2i(jnp.clip(a, 0.0, 1.0), i, k_int)
        ac = jnp.clip(a, -1.0, 1.0)  # Cont-4QC: d1*i + d2*(-i)
        if k_int == 0.0:
            return ac * i
        return (_c2i(0.5 * (ac + 1.0), i, k_int)
                + _c2i(-0.5 * (ac - 1.0), -i, k_int))

    def advance_bridges(bs, acts):
        """next-cycle converter state: the interlock pattern when
        interlocking (interval_states -> (inter, inter), the deferred
        quirk), else the commanded states"""
        if not isinstance(acts, tuple):
            acts = (acts,)
        out = []
        for ck, a, st in zip(conv_kinds, acts, split_bs(bs)):
            cmd = chan_cmd(ck, a)
            if k_int > 0.0:
                cmd = tuple(_interlock_state(b, c) for b, c in zip(st, cmd))
            out.extend(cmd)
        return tuple(out)

    # --- electrical model (constants baked from the motor spec) ---
    if kind == "PermExDc":
        r_a, l_a, psi_e = float(mp["r_a"]), float(mp["l_a"]), float(mp["psi_e"])
        el_names = ("i",)

        def el_rhs(w, el, u):
            (i,) = el
            return ((-psi_e * w - r_a * i + u[0]) * (1.0 / l_a),)

        def torque(el):
            return psi_e * el[0]

        def i_in_fn(el):
            return (el[0],)
    elif kind == "SeriesDc":
        r_t = float(mp["r_a"]) + float(mp["r_e"])
        l_t = float(mp["l_a"]) + float(mp["l_e"])
        l_p = float(mp["l_e_prime"])
        el_names = ("i",)

        def el_rhs(w, el, u):
            (i,) = el
            return ((-r_t * i - l_p * w * i + u[0]) * (1.0 / l_t),)

        def torque(el):
            return l_p * el[0] * el[0]

        def i_in_fn(el):
            return (el[0],)
    else:  # ShuntDc / ExtExDc share the 2-current ODE (dc_motor.py:96-127)
        r_a, r_e = float(mp["r_a"]), float(mp["r_e"])
        l_a, l_e = float(mp["l_a"]), float(mp["l_e"])
        l_p = float(mp["l_e_prime"])
        el_names = ("i_a", "i_e")

        def el_rhs(w, el, u):
            i_a, i_e = el
            u_a, u_e = (u[0], u[0]) if kind == "ShuntDc" else (u[0], u[1])
            return ((-r_a * i_a - l_p * w * i_e + u_a) * (1.0 / l_a),
                    (-r_e * i_e + u_e) * (1.0 / l_e))

        def torque(el):
            return l_p * el[0] * el[1]

        if kind == "ShuntDc":
            def i_in_fn(el):
                return (el[0] + el[1],)  # i = i_a + i_e (dc_shunt_motor.py:68-92)
        else:
            def i_in_fn(el):
                return (el[0], el[1])

    n_el = len(el_names)
    el_lims = tuple(float(lim[names.index(n)]) for n in el_names)

    # --- mechanical model (shared helper) ---
    w_lim = float(lim[names.index("omega")])
    mload = _make_fused_mech(ps, float(mp["j_rotor"]), shape)
    mech_mode, mech = mload.mode, mload.mech
    needs_step_noise = mload.needs_step_noise
    omega_fixed = mload.omega_fixed

    def core_rhs(core, u, z):
        if not mech:
            return el_rhs(omega_fixed, core, u)
        w, el = core[0], core[1:]
        return (mload.mech_rhs(w, torque(el), z),) + el_rhs(w, el, u)

    # --- supply model (shared helper) ---
    sup = _make_fused_supply(ps, shape, tau)
    sup_mode, n_sup, sup_reset = sup.mode, sup.n_sup, sup.sup_reset
    supply_u = sup.supply_u

    n_core = n_el + (1 if mech else 0)
    n_state = n_core + n_sup

    def split(state):
        return state[:n_core], state[n_core:]

    def rk4(core, u, z, dt):
        def axpy(s, k, c):
            return tuple(si + c * ki for si, ki in zip(s, k))

        k1 = core_rhs(core, u, z)
        k2 = core_rhs(axpy(core, k1, 0.5 * dt), u, z)
        k3 = core_rhs(axpy(core, k2, 0.5 * dt), u, z)
        k4 = core_rhs(axpy(core, k3, dt), u, z)
        return tuple(
            s + (dt / 6.0) * (a1 + 2.0 * (a2 + a3) + a4)
            for s, a1, a2, a3, a4 in zip(core, k1, k2, k3, k4)
        )

    def step_physics(state, acts, z=None, bs=None):
        core, sup_planes = split(state)
        el_pre = core[1:] if mech else core
        i_in = i_in_fn(el_pre)
        bs_ch = split_bs(bs)
        if sup.needs_i_sup:
            # finite 2QC/4QC: the reference queries i_sup BEFORE convert()
            # applies the new switching state, so the supply current reads
            # the PREVIOUS cycle's switch positions carried in ``bs``
            # (converters.py:84-97 state update order vs the i_sup call in
            # physical_systems.py:171-203); cont converters store the new
            # duty in set_action and i_sup sees it immediately
            i_sup_val = conv_i_sup(conv_kinds[0], acts[0], i_in[0],
                                   bs_ch[0] if finite else None)
            for j in range(1, n_ch):
                i_sup_val = i_sup_val + conv_i_sup(
                    conv_kinds[j], acts[j], i_in[j],
                    bs_ch[j] if finite else None)
        else:
            i_sup_val = None
        # ONE supply query per control cycle even under interlocking: the
        # reference queries both sub-intervals at the SAME timestamp
        # (physical_systems.py:171-203 passes self._t), so the AC sine
        # repeats and the RC element integrates dt=0 on the second call
        u_sup_val, sup_new = supply_u(sup_planes, i_sup_val)

        if finite and k_int > 0.0:
            # 2-sub-interval interlock schedule (converters.py:99-111):
            # both intervals run the interlock pattern (deferred quirk);
            # interval 1 refreshes the freewheeling currents, frozen back
            # to interval-0 values for envs with no interlock this cycle
            # (the reference then emits a single sub-interval)
            inter, flag = [], None
            for ck, a, st in zip(conv_kinds, acts, bs_ch):
                cmd = chan_cmd(ck, a)
                ist = tuple(_interlock_state(b, c)
                            for b, c in zip(st, cmd))
                inter.append(ist)
                for b2, c2 in zip(ist, cmd):
                    d = b2 != c2
                    flag = d if flag is None else (flag | d)
            if flag is None:  # stateless channels only (1QC)
                flag = jnp.zeros(shape, jnp.bool_)
            u0 = tuple(conv_u(conv_kinds[j], acts[j], i_in[j],
                              inter[j] or None) * u_sup_val
                       for j in range(n_ch))
            # no interlock this cycle => the reference integrates ONE
            # sub-interval over the whole tau (single merged switching
            # time): select the leg DURATIONS per env — a dt=0 RK4 leg is
            # an exact identity, so (0, tau) reproduces the single
            # full-tau integration bit-for-bit at 2 legs instead of 3
            dt0 = jnp.where(flag, np.float32(t_int), 0.0)
            dt1 = jnp.where(flag, np.float32(tau - t_int),
                            np.float32(tau))
            core_mid = rk4(core, u0, z, dt0)
            el_mid = core_mid[1:] if mech else core_mid
            i_mid = i_in_fn(el_mid)
            u1 = tuple(
                jnp.where(flag,
                          conv_u(conv_kinds[j], acts[j], i_mid[j],
                                 inter[j] or None) * u_sup_val, u0[j])
                for j in range(n_ch))
            return rk4(core_mid, u1, z, dt1) + sup_new

        u = tuple(conv_u(conv_kinds[j], acts[j], i_in[j]) * u_sup_val
                  for j in range(n_ch))
        return rk4(core, u, z, tau) + sup_new

    def reset_state(bits):
        """Per-plane in-kernel reset values (drawn fresh every step,
        selected only on violation)."""
        zero = jnp.zeros(shape, jnp.float32)
        core = ((mload.omega_reset(bits),) if mech else ()) + (zero,) * n_el
        return core + sup_reset(bits)

    # --- references / reward / constraints from the env spec ---
    rw = env.reward_function
    bias = np.float32(rw._bias_value)
    violation_reward = np.float32(rw._violation_value)
    ref_cfg = _ref_configs(env, R,
                           require_wiener=action_mode == "random")
    n_ref = len(ref_cfg)
    assert n_ref in (1, 2)
    n_rows = _ref_n_rows(ref_cfg)
    shape_r = (n_rows * R, LANE)

    def ref_quantity(state, j):
        """normalized referenced quantity j of the post-step state"""
        nm = ref_cfg[j]["name"]
        el = state[1:1 + n_el] if mech else state[:n_el]
        if nm == "omega":
            return state[0] * np.float32(1.0 / w_lim)
        if nm == "torque":
            t_lim = float(lim[names.index("torque")])
            return torque(el) * np.float32(1.0 / t_lim)
        return el[el_names.index(nm)] * ref_cfg[j]["inv_lim"]

    def violated_fn(state):
        el = state[1:1 + n_el] if mech else state[:n_el]
        v = jnp.abs(el[0]) > el_lims[0]
        for j in range(1, n_el):
            v = v | (jnp.abs(el[j]) > el_lims[j])
        return v

    # --- random-action sampling matched to the converter action space ---
    if finite:
        act_ns = ((int(conv.action_space[1]),) if n_ch == 1
                  else tuple(int(x) for x in conv.action_space[1]))
    else:
        act_lo = np.atleast_1d(np.asarray(conv.action_space[1], np.float32))
        act_hi = np.atleast_1d(np.asarray(conv.action_space[2], np.float32))

    def _sample_actions(bits):
        if finite and act_ns == (4,):
            return ((bits(shape) & jnp.uint32(3)).astype(jnp.int32),)
        if finite and act_ns == (4, 4):
            b = bits(shape)
            return ((b & jnp.uint32(3)).astype(jnp.int32),
                    ((b >> jnp.uint32(2)) & jnp.uint32(3)).astype(jnp.int32))
        if finite:
            acts = []
            for n in act_ns:
                if n & (n - 1) == 0:  # power of two: exact mask
                    acts.append((bits(shape) & jnp.uint32(n - 1))
                                .astype(jnp.int32))
                else:
                    u = _uniform_from_bits(bits(shape))
                    acts.append(jnp.minimum(
                        jnp.floor(u * np.float32(n)).astype(jnp.int32),
                        n - 1))
            return tuple(acts)
        return tuple(
            np.float32(act_lo[j]) + np.float32(act_hi[j] - act_lo[j])
            * _uniform_from_bits(bits(shape))
            for j in range(n_ch))

    # --- generic record-adapter surface (see ops/pallas_record.py) ---
    state_names = (("omega",) if mech else ()) + el_names + sup.names
    act_names = ("action",) if n_ch == 1 else ("action_a", "action_e")
    act_dtype = jnp.int32 if finite else jnp.float32

    def read_actions(ref, t):
        if n_ch == 1:
            return (ref[t],)
        return tuple(ref[t, j] for j in range(n_ch))

    def pre_step(cur):
        return ()

    def step(cur, acts, aux, z=None, bs=None):
        return step_physics(cur, acts, z, bs)

    def quantities(state, aux):
        return [ref_quantity(state, j) for j in range(n_ref)]

    return SimpleNamespace(
        n_state=n_state, n_ch=n_ch, finite=finite, mech=mech, shape=shape,
        shape_r=shape_r, n_ref=n_ref, n_rows=n_rows, ref_cfg=ref_cfg, bias=bias,
        violation_reward=violation_reward, step_physics=step_physics,
        ref_quantity=ref_quantity, violated=violated_fn,
        sample_actions=_sample_actions, state_names=state_names,
        act_names=act_names, act_dtype=act_dtype, read_actions=read_actions,
        pre_step=pre_step, step=step, quantities=quantities,
        mech_mode=mech_mode, sup_mode=sup_mode, n_sup=n_sup, n_core=n_core,
        needs_step_noise=needs_step_noise, reset_state=reset_state,
        n_bridge=n_bridge, advance_bridges=advance_bridges,
    )


def make_fused_dc_rollout(env, n_steps, n_envs, action_mode="random",
                          interpret=False):
    """Universal fused rollout for the DC family — ALL 24 catalog configs
    ({Finite,Cont} x {CC,TC,SC} x {PermExDc,SeriesDc,ShuntDc,ExtExDc}).

    Unlike the earlier per-config kernels this builder reads every semantic
    from the functional env instance: the motor ODE/torque
    (dc_*_motor.py:68-127), the converter action law (finite 4QC table
    converters.py:313-368 / cont duty converters.py:438-496; ExtExDc's dual
    channel converters.py:547-612), the mechanical model (ConstantSpeedLoad
    or PolynomialStaticLoad incl. the omega~0 linearization,
    polynomial_static_load.py:87-107), the Wiener reference margins /
    sigma ranges / sub-episode lengths per referenced state, the
    WeightedSumOfErrors weights/spans (weighted_sum_of_errors.py:125-129)
    and the current limit constraints.

    Returned callable (``(R, LANE)`` float32 planes, R = n_envs // 128):

    * random mode: ``rollout(seed, *state0) -> (*states, reward_sum,
      term_count, rv, rk, rl, rs)`` where ``state0``/``states`` is
      ``(omega?, i...)`` — omega present only for SC (dynamic-speed)
      configs — and the rv/rk/rl/rs Wiener snapshots are stacked
      ``(n_ref * R, LANE)``.
    * buffer mode: ``rollout(*state0, actions) -> states`` with an
      ``(n_steps, [n_ch,] R, LANE)`` action buffer (int32 finite / float32
      cont; the channel axis only for ExtExDc), deterministic physics only
      — the bit-level validation path vs the XLA env.
    """
    assert n_envs % LANE == 0
    R = n_envs // LANE
    fs = _dc_family(env, R, action_mode)
    _check_switched_min_envs(fs, R, interpret)
    n_state, n_ch, shape, shape_r = fs.n_state, fs.n_ch, fs.shape, fs.shape_r
    n_bs = fs.n_bridge
    n_ref, ref_cfg = fs.n_ref, fs.ref_cfg
    n_rows = fs.n_rows
    bias, violation_reward = fs.bias, fs.violation_reward
    _step_physics, ref_quantity = fs.step_physics, fs.ref_quantity
    violated_fn, _sample_actions = fs.violated, fs.sample_actions
    has_wf = _ref_needs_wf(ref_cfg)

    def kernel(seed_ref, *refs):
        state0 = refs[:n_state]
        out_state = refs[n_state: 2 * n_state]
        out_reward, out_terms, out_rv, out_rk, out_rl, out_rs = (
            refs[2 * n_state: 2 * n_state + 6])
        scratch = refs[2 * n_state + 6:]
        rv_ref, rk_ref, rl_ref, rs_ref, rng_ref = scratch[:5]
        za_ref, zb_ref = ((scratch[5], scratch[6]) if n_rows == 1
                          else (None, None))
        wf_ref = scratch[-1] if has_wf else None
        seed, bits = _make_rng(interpret, rng_ref)
        seed(seed_ref[0])
        for o, s in zip(out_state, state0):
            o[:] = s[:]
        out_reward[:] = jnp.zeros(shape, jnp.float32)
        out_terms[:] = jnp.zeros(shape, jnp.float32)

        w_init, w_advance = _make_wiener(bits, ref_cfg, R, shape, shape_r,
                                         rv_ref, rk_ref, rl_ref, rs_ref,
                                         za_ref, zb_ref, wf_ref)
        w_init()

        def body(t, bs):
            acts = _sample_actions(bits)
            z = _step_noise(fs.needs_step_noise, bits, shape)
            state = _step_physics(tuple(o[:] for o in out_state), acts, z,
                                  bs if n_bs else None)

            violated = violated_fn(state)
            refs_now = rv_ref[:]
            wse = bias - _wse_err(ref_cfg[0], ref_quantity(state, 0),
                                  refs_now[:R])
            if n_ref == 2:
                wse = wse - _wse_err(ref_cfg[1], ref_quantity(state, 1),
                                     refs_now[R:])
            reward = jnp.where(violated, violation_reward, wse)
            out_reward[:] = out_reward[:] + reward
            out_terms[:] = out_terms[:] + violated.astype(jnp.float32)
            for o, s, r0 in zip(out_state, state, fs.reset_state(bits)):
                o[:] = jnp.where(violated, r0, s)

            w_advance(t, violated)
            if not n_bs:
                return 0
            # converter.reset() on violation: switching state back to the
            # init (all-off) state (converters.py:45-54)
            return tuple(jnp.where(violated, 0, b)
                         for b in fs.advance_bridges(bs, acts))

        init = (tuple(jnp.zeros(shape, jnp.int32) for _ in range(n_bs))
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

        def read(t):
            if n_ch == 1:
                return (actions_ref[t],)
            return (actions_ref[t, 0], actions_ref[t, 1])

        def body(t, bs):
            acts = read(t)
            state = _step_physics(tuple(o[:] for o in out_state), acts,
                                  None, bs if n_bs else None)
            for o, s in zip(out_state, state):
                o[:] = s
            if not n_bs:
                return 0
            return fs.advance_bridges(bs, acts)

        init = (tuple(jnp.zeros(shape, jnp.int32) for _ in range(n_bs))
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


_WF_KINDS = ("sinusoidal", "step", "triangle", "sawtooth")
_FUSED_REF_KINDS = ("wiener", "laplace", "const") + _WF_KINDS


def _wse_err(cfg, q, r):
    """One WSE penalty term: ``w * (|q - r|)^n`` with the 1/l^n state-length
    normalization folded into ``coef`` (weighted_sum_of_errors.py:125-129).
    n == 1/2/0.5 get cheap forms; general n pays an exp+log."""
    e = q - r
    n = cfg["pow"]
    if n == 1.0:
        return cfg["coef"] * jnp.abs(e)
    if n == 2.0:
        return cfg["coef"] * (e * e)
    if n == 0.5:
        return cfg["coef"] * jnp.sqrt(jnp.abs(e))
    return cfg["coef"] * jnp.exp(
        np.float32(n) * jnp.log(jnp.maximum(jnp.abs(e), 1e-30)))


def _ref_needs_wf(ref_cfg):
    """True if any reference row (incl. switched shadow rows) is a waveform
    kind — callers then allocate the extra (4 * n_rows * R, LANE) scratch
    plane for the per-sub-episode waveform parameters (freq, offset,
    phase, width)."""
    return any(c.get("kind", "wiener") in _WF_KINDS
               for c in _expand_ref_rows(ref_cfg)[0])


def _expand_ref_rows(ref_cfg):
    """Expand switched references into the flat row layout the in-kernel
    machinery operates on: the primary rows first (what the kernels read
    and what the reward uses; a switched primary's rk/rl planes carry the
    super-episode counter/length and its rs plane the active sub index),
    then each switched reference's K sub-generators as independent static
    SHADOW rows.  Returns ``(rows, infos)`` with
    ``infos = [(primary_row, shadow_start_row, K, p), ...]``."""
    rows = list(ref_cfg)
    infos = []
    for i, c in enumerate(ref_cfg):
        # buffer/validation-mode configs keep kind='switched' but carry no
        # sub rows (the reference machinery is never touched there)
        if c.get("kind") == "switched" and "subs" in c:
            infos.append((i, len(rows), len(c["subs"]), tuple(c["p"])))
            rows.extend(c["subs"])
    return rows, infos


def _ref_n_rows(ref_cfg):
    """Total in-kernel reference rows (primaries + switched shadows)."""
    return len(_expand_ref_rows(ref_cfg)[0])


def _check_switched_min_envs(fs, R, interpret):
    """Switched references on the COMPILED TPU path need R >= 8 (n_envs >=
    1024): the per-switched-row slice updates touch sub-8-sublane windows
    of the row-stacked reference planes, which crashes the Mosaic compiler
    (HTTP 500 from the remote compile helper observed at R in {2, 4}).
    Interpret mode (the CPU test path) has no such restriction."""
    if getattr(fs, "n_rows", fs.n_ref) != fs.n_ref and not interpret \
            and R < 8:
        raise NotImplementedError(
            "switched references in compiled fused kernels need "
            "n_envs >= 1024 (R >= 8) — smaller batches crash the Mosaic "
            "compiler on sub-sublane row slices; use more envs, interpret "
            "mode, or the general XLA path")


def _ref_configs(env, R, require_wiener=True):
    """Per-referenced-state Wiener/reward constants read from the env spec
    (subepisoded_reference_generator.py:28-117, weighted_sum_of_errors.py:
    88-129) — the table behind the universal family kernels.

    Constant references (the standard controller-evaluation setup) ride
    the same machinery as a degenerate Wiener: margins pinned to the
    value, sigma ~ 0 and a never-expiring sub-episode, so ``clip(v + 1e-30
    * z, v, v) == v`` every step with no kernel changes (const semantics:
    const_reference_generator.py:8-35).

    ``require_wiener=False`` (buffer/validation modes, which never touch the
    reference machinery) skips the generator-kind check."""
    ps = env.physical_system
    names = list(ps.state_names)
    lim = np.asarray(ps.limits)
    rw = env.reward_function
    big = np.float32(1e30)  # finite sentinel for unbounded offset ranges

    def _one(s, reward_row=None):
        """cfg for one SCALAR generator; ``reward_row`` inherits the
        reward/limit constants (switched shadows score via their primary
        row, so their own reward fields are never read)."""
        idx = names.index(s.reference_state)
        n_pow = float(np.asarray(rw._n).ravel()[idx])
        assert n_pow > 0.0, "reward_power must be positive"
        cfg = dict(
            kind=s.kind,
            tau=np.float32(ps.tau),
            name=s.reference_state,
            pow=n_pow,
            coef=np.float32(rw._weights[idx]
                            / rw._state_length[idx] ** n_pow),
            inv_lim=np.float32(1.0 / lim[idx]),
            # benign waveform defaults (noise rows never read them but the
            # masked vector ops must stay finite)
            amp_lo=np.float32(0.0), amp_hi=np.float32(0.0),
            f_lo=np.float32(1.0), f_hi=np.float32(1.0),
            off_lo=np.float32(0.0), off_hi=np.float32(0.0),
        )
        if s.kind == "const" or s.kind not in _FUSED_REF_KINDS:
            # const rides the machinery with pinned margins; non-fused
            # kinds only reach here under require_wiener=False —
            # buffer/validation modes never touch the reference machinery,
            # so a benign pinned row suffices
            v = np.float32(s.reference_value if s.kind == "const" else 0.0)
            cfg.update(
                mlo=v, mhi=v,
                sig_base=np.float32(-30.0), sig_span=np.float32(0.0),
                ep_lo=np.float32(1e9), ep_span=np.float32(0.0),
            )
        else:
            cfg.update(
                mlo=np.float32(s.margin[0]), mhi=np.float32(s.margin[1]),
                ep_lo=np.float32(s.episode_lengths[0]),
                ep_span=np.float32(s.episode_lengths[1]
                                   - s.episode_lengths[0]),
            )
            if s.kind in ("wiener", "laplace"):
                cfg.update(
                    sig_base=np.float32(np.log10(s.sigma_range[0])),
                    sig_span=np.float32(np.log10(s.sigma_range[1])
                                        - np.log10(s.sigma_range[0])),
                )
            else:  # waveform kinds — ranges pre-clipped at bind time
                a_lo, a_hi = s.amplitude_range
                o_lo, o_hi = s.offset_range
                cfg.update(
                    sig_base=np.float32(-30.0), sig_span=np.float32(0.0),
                    amp_lo=np.float32(a_lo),
                    amp_hi=np.float32(min(a_hi, 1e30)),
                    f_lo=np.float32(s.frequency_range[0]),
                    f_hi=np.float32(s.frequency_range[1]),
                    off_lo=np.float32(max(o_lo, -big)),
                    off_hi=np.float32(min(o_hi, big)),
                )
        return cfg

    cfgs = []
    for s in env.reference_generator.subs:
        if s.kind == "switched" and require_wiener:
            # switched generator: primary row = selection machinery
            # (rk/rl carry the super-episode counter/length drawn from
            # super_episode_lengths, rs the active sub index), the K sub
            # generators become static shadow rows
            # (switched_reference_generator.py:8-95)
            assert all(sub.kind in _FUSED_REF_KINDS for sub in s.subs), (
                f"switched sub-generators must be scalar fused kinds "
                f"{_FUSED_REF_KINDS}; got "
                f"{[sub.kind for sub in s.subs]!r}")
            idx = names.index(s.reference_state)
            n_pow = float(np.asarray(rw._n).ravel()[idx])
            lo, hi = s.super_episode_lengths
            cfg = dict(
                kind="switched",
                tau=np.float32(ps.tau),
                name=s.reference_state,
                pow=n_pow,
                coef=np.float32(rw._weights[idx]
                                / rw._state_length[idx] ** n_pow),
                inv_lim=np.float32(1.0 / lim[idx]),
                mlo=np.float32(s.margin[0]), mhi=np.float32(s.margin[1]),
                sig_base=np.float32(-30.0), sig_span=np.float32(0.0),
                ep_lo=np.float32(lo), ep_span=np.float32(hi - lo),
                amp_lo=np.float32(0.0), amp_hi=np.float32(0.0),
                f_lo=np.float32(1.0), f_hi=np.float32(1.0),
                off_lo=np.float32(0.0), off_hi=np.float32(0.0),
                p=tuple(float(x) for x in s.p),
                subs=[_one(sub) for sub in s.subs],
            )
            cfgs.append(cfg)
            continue
        assert s.kind in _FUSED_REF_KINDS or not require_wiener, (
            f"fused kernels implement every scalar reference kind "
            f"{_FUSED_REF_KINDS} plus switched compositions of them; got "
            f"kind={s.kind!r} for {s.reference_state!r} — use the general "
            f"XLA path")
        cfgs.append(_one(s))
    return cfgs


def _make_wiener(bits, ref_cfg, R, shape, shape_r, rv_ref, rk_ref, rl_ref,
                 rs_ref, za_ref, zb_ref, wf_ref=None):
    """Shared in-kernel reference machinery for EVERY scalar generator kind
    (wiener / laplace / const / sinusoidal / step / triangle / sawtooth —
    references.py:94-252): per-row margin/sigma/length tables (iota-built —
    Pallas kernels cannot capture arrays), init, and the per-step advance
    with sub-episode regeneration and in-kernel reset.

    Noise kinds: one Box-Muller pair feeds both streams (n_ref=2, spatial)
    or alternates across step parity (n_ref=1, temporal via za/zb scratch);
    Laplace rows take an inverse-CDF draw and reset to 0 like the XLA
    generator.  Waveform kinds evaluate the closed form at the
    steps-since-regen counter (``rk``), with per-sub-episode amplitude
    (sharing the sigma plane), frequency/offset/phase/width in the
    ``wf_ref`` scratch plane ((4 * n_ref * R, LANE), caller-allocated when
    ``_ref_needs_wf``).  An all-const config costs zero per-step work."""
    ref_cfg, switched_infos = _expand_ref_rows(ref_cfg)
    n_ref = len(ref_cfg)
    nR = n_ref * R
    LN10 = np.float32(np.log(10.0))
    kinds = [c.get("kind", "wiener") for c in ref_cfg]
    has_gauss = any(k in ("wiener", "const") for k in kinds)
    has_lap = any(k == "laplace" for k in kinds)
    has_wf = any(k in _WF_KINDS for k in kinds)
    all_const = all(k == "const" for k in kinds)
    assert not has_wf or wf_ref is not None, (
        "waveform references need the wf scratch plane (_ref_needs_wf)")

    def _row_const(field):
        vals = [c[field] for c in ref_cfg]
        if all(v == vals[0] for v in vals):
            return vals[0]
        row = jax.lax.broadcasted_iota(jnp.int32, shape_r, 0)
        out = jnp.full(shape_r, vals[-1], jnp.float32)
        for j in range(n_ref - 2, -1, -1):
            out = jnp.where(row < (j + 1) * R, vals[j], out)
        return out

    def _row_mask(pred):
        """None: no rows match; True: all rows; else a bool plane."""
        sel = [pred(k) for k in kinds]
        if not any(sel):
            return None
        if all(sel):
            return True
        row = jax.lax.broadcasted_iota(jnp.int32, shape_r, 0)
        m = jnp.zeros(shape_r, jnp.bool_)
        for j, s in enumerate(sel):
            if s:
                m = m | ((row >= j * R) & (row < (j + 1) * R))
        return m

    def _mix(mask, a, b):
        """a where mask else b, with static short-circuits."""
        if mask is None:
            return b
        if mask is True:
            return a
        return jnp.where(mask, a, b)

    mlo_t, mhi_t = _row_const("mlo"), _row_const("mhi")
    el_t, es_t = _row_const("ep_lo"), _row_const("ep_span")

    if all_const:
        # pinned margins (mlo == mhi == value): nothing ever changes — the
        # advance is free and reset keeps the same value
        def init():
            rv_ref[:] = jnp.zeros(shape_r, jnp.float32) + mlo_t
            rk_ref[:] = jnp.zeros(shape_r, jnp.float32)
            rl_ref[:] = jnp.full(shape_r, 1e9, jnp.float32)
            rs_ref[:] = jnp.zeros(shape_r, jnp.float32)

        def advance(t, violated):
            pass

        return init, advance

    sb_t, ss_t = _row_const("sig_base"), _row_const("sig_span")
    wf_mask = _row_mask(lambda k: k in _WF_KINDS)
    lap_mask = _row_mask(lambda k: k == "laplace")
    step_mask = _row_mask(lambda k: k == "step")
    tri_mask = _row_mask(lambda k: k == "triangle")
    if has_wf:
        TAU = ref_cfg[0]["tau"]
        al_t, ah_t = _row_const("amp_lo"), _row_const("amp_hi")
        fl_t, fh_t = _row_const("f_lo"), _row_const("f_hi")
        ol_t, oh_t = _row_const("off_lo"), _row_const("off_hi")

    def _draw_params(mask):
        u1 = _uniform_from_bits(bits(shape_r))
        u2 = _uniform_from_bits(bits(shape_r))
        rl_ref[:] = jnp.where(mask, jnp.floor(el_t + es_t * u1), rl_ref[:])
        sig = jnp.exp(LN10 * (sb_t + ss_t * u2))
        if has_wf:
            # amplitude shares the sigma plane (both drawn from u2,
            # references.py:108-119)
            amp = al_t + (ah_t - al_t) * u2
            rs_ref[:] = jnp.where(mask, _mix(wf_mask, amp, sig), rs_ref[:])
            u3 = _uniform_from_bits(bits(shape_r))
            u4 = _uniform_from_bits(bits(shape_r))
            u5 = _uniform_from_bits(bits(shape_r))
            u6 = _uniform_from_bits(bits(shape_r))
            freq = fl_t + (fh_t - fl_t) * u3
            # offset re-clipped against the drawn amplitude
            # (references.py:123-131: step keeps the wave inside the
            # margins, the others inside +-mhi)
            lo_b = _mix(step_mask, jnp.asarray(mlo_t, jnp.float32),
                        jnp.asarray(-mhi_t, jnp.float32)) + amp
            hi_b = mhi_t - amp
            off_l = jnp.clip(jnp.broadcast_to(ol_t, shape_r), lo_b, hi_b)
            off_h = jnp.clip(jnp.broadcast_to(oh_t, shape_r), lo_b, hi_b)
            offset = off_l + (off_h - off_l) * u4
            phase = _mix(step_mask, u5, np.float32(TWO_PI) * u5)
            # width: step = triangular(0, .5, 1) duty via inverse CDF
            # (references.py:41-46), triangle = uniform, sin/sawtooth = 1
            tri01 = jnp.where(u6 < 0.5, jnp.sqrt(0.5 * u6),
                              1.0 - jnp.sqrt(0.5 * (1.0 - u6)))
            width = _mix(step_mask, tri01,
                         _mix(tri_mask, u6, jnp.ones(shape_r, jnp.float32)))
            wf_ref[0:nR] = jnp.where(mask, freq, wf_ref[0:nR])
            wf_ref[nR:2 * nR] = jnp.where(mask, offset, wf_ref[nR:2 * nR])
            wf_ref[2 * nR:3 * nR] = jnp.where(mask, phase,
                                              wf_ref[2 * nR:3 * nR])
            wf_ref[3 * nR:4 * nR] = jnp.where(mask, width,
                                              wf_ref[3 * nR:4 * nR])
        else:
            rs_ref[:] = jnp.where(mask, sig, rs_ref[:])

    def _wf_value(k):
        """Waveform closed forms at steps-since-regen ``k``
        (references.py:148-173), clipped to the margins."""
        amp = rs_ref[:]
        freq = wf_ref[0:nR]
        offset = wf_ref[nR:2 * nR]
        phase = wf_ref[2 * nR:3 * nR]
        width = wf_ref[3 * nR:4 * nR]
        t = k * TAU
        val = jnp.zeros(shape_r, jnp.float32)
        if any(kk == "sinusoidal" for kk in kinds):
            sin_mask = _row_mask(lambda kk: kk == "sinusoidal")
            v = amp * jnp.sin(np.float32(TWO_PI) * freq * t + phase) + offset
            val = _mix(sin_mask, v, val)
        if any(kk == "step" for kk in kinds):
            # square wave with duty `width`, phase-rolled by whole steps
            spp = 1.0 / (freq * TAU)
            shift = jnp.floor(spp * phase)
            ts = (k - shift) * TAU
            x = freq * jnp.mod(ts, 1.0 / freq) - width
            v = amp * jnp.sign(x) + offset
            val = _mix(step_mask, v, val)
        if any(kk in ("triangle", "sawtooth") for kk in kinds):
            ts_mask = _row_mask(lambda kk: kk in ("triangle", "sawtooth"))
            phi = np.float32(TWO_PI) * freq * t + phase
            tmod = jnp.mod(phi * np.float32(1.0 / TWO_PI), 1.0)
            rising = 2.0 * tmod / jnp.maximum(width, 1e-12) - 1.0
            falling = 2.0 * (1.0 - tmod) / jnp.maximum(1.0 - width,
                                                       1e-12) - 1.0
            v = amp * jnp.where(tmod < width, rising, falling) + offset
            val = _mix(ts_mask, v, val)
        return jnp.clip(val, mlo_t, mhi_t)

    def _draw_active(K, p):
        """categorical draw over the switched row's sub probabilities
        (inverse CDF, switched_reference_generator.py:60-66)"""
        u = _uniform_from_bits(bits(shape))
        act = jnp.zeros(shape, jnp.float32)
        c = p[0]
        for k in range(1, K):
            act = jnp.where(u >= np.float32(c), np.float32(k), act)
            c += p[k]
        return act

    def _switched_post(switch_mask_rows, reset_rows=None, is_init=False):
        """After the standard per-row advance/init: (re)draw the active sub
        where the super-episode expired, re-init the newly-active shadow
        from the primary's current value on PURE switches (the reference
        passes initial_reference=value; on env/violation resets the subs
        keep their own standard reset draw), and write the selected shadow
        value into the primary row."""
        for (pi, s0, K, p) in switched_infos:
            psl = slice(pi * R, (pi + 1) * R)
            sw = switch_mask_rows[psl]
            prim_prev = rv_ref[psl]
            act = jnp.where(sw, _draw_active(K, p), rs_ref[psl])
            rs_ref[psl] = act
            if not is_init:
                pure = sw if reset_rows is None else (
                    sw & jnp.logical_not(reset_rows[psl]))
                row_masks = []
                for k in range(K):
                    ssl = slice((s0 + k) * R, (s0 + k + 1) * R)
                    m = pure & (act == np.float32(k))
                    # clip the seed into the SUB's own margins: const subs
                    # ignore initial_reference entirely and the
                    # subepisoded kinds clip it (subepisoded_reference_
                    # generator.py:102-117) — without this, a
                    # wiener->const switch would leak the old wiener value
                    # for one step
                    sub = ref_cfg[s0 + k]
                    seed_v = jnp.clip(prim_prev, np.float32(sub["mlo"]),
                                      np.float32(sub["mhi"]))
                    rv_ref[ssl] = jnp.where(m, seed_v, rv_ref[ssl])
                    rk_ref[ssl] = jnp.where(m, 0.0, rk_ref[ssl])
                    row_masks.append(m)
                # fresh sub-episode params for the re-initialized shadows
                # (one combined draw — the per-k masks are disjoint)
                blocks = [jnp.zeros(shape, jnp.bool_)] * s0 + row_masks +                     [jnp.zeros(shape, jnp.bool_)] * (n_ref - s0 - K)
                _draw_params(jnp.concatenate(blocks, axis=0))
            sel = jnp.zeros(shape, jnp.float32)
            for k in range(K):
                ssl = slice((s0 + k) * R, (s0 + k + 1) * R)
                sel = sel + jnp.where(act == np.float32(k), rv_ref[ssl],
                                      0.0)
            rv_ref[psl] = sel

    def init():
        u = _uniform_from_bits(bits(shape_r))
        base = mlo_t + (mhi_t - mlo_t) * u
        base = _mix(lap_mask, jnp.zeros(shape_r, jnp.float32), base)
        rk_ref[:] = jnp.zeros(shape_r, jnp.float32)
        _draw_params(jnp.ones(shape_r, dtype=jnp.bool_))
        if has_wf:
            base = _mix(wf_mask, _wf_value(jnp.zeros(shape_r, jnp.float32)),
                        base)
        rv_ref[:] = base
        if switched_infos:
            _switched_post(jnp.ones(shape_r, dtype=jnp.bool_),
                           is_init=True)

    def advance(t, violated):
        if n_ref >= 2:
            viol_f = violated.astype(jnp.float32)
            reset_r = jnp.concatenate([viol_f] * n_ref, axis=0) > 0.5
        else:
            reset_r = violated
        if has_gauss:
            if n_ref >= 2:
                parts = []
                for _pair in range((n_ref + 1) // 2):
                    u1 = _uniform_from_bits(bits(shape))
                    u2 = _uniform_from_bits(bits(shape))
                    rad = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
                    theta = np.float32(TWO_PI) * u2
                    parts.append(rad * jnp.cos(theta))
                    parts.append(rad * jnp.sin(theta))
                draw = jnp.concatenate(parts[:n_ref], axis=0)
            else:
                even = (t & 1) == 0

                @pl.when(even)
                def _():
                    u1 = _uniform_from_bits(bits(shape))
                    u2 = _uniform_from_bits(bits(shape))
                    rad = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
                    theta = np.float32(TWO_PI) * u2
                    za_ref[:] = rad * jnp.cos(theta)
                    zb_ref[:] = rad * jnp.sin(theta)

                draw = jnp.where(even, za_ref[:], zb_ref[:])
        else:
            draw = jnp.zeros(shape_r, jnp.float32)
        if has_lap:
            # Laplace increment via inverse CDF: -sign(v) ln(1 - 2|v|)
            # (laplace_process_reference_generator.py:7-35)
            v = _uniform_from_bits(bits(shape_r)) - 0.5
            lap = -jnp.sign(v) * jnp.log(jnp.maximum(1.0 - 2.0 * jnp.abs(v),
                                                     1e-12))
            draw = _mix(lap_mask, lap, draw)

        regen = (rk_ref[:] >= rl_ref[:]) | reset_r
        _draw_params(regen)
        rk_new = jnp.where(regen, 0.0, rk_ref[:]) + 1.0
        rk_ref[:] = rk_new
        if switched_infos:
            # the switched primary's rs holds its ACTIVE INDEX, not a
            # sigma — exclude it from the noise update (its value is
            # overwritten by the selection below anyway, but act*draw
            # could overflow the clip bounds into the reward read window
            # between advance and selection)
            sw_rows = _row_mask(lambda k: k == "switched")
            sig_eff = _mix(sw_rows, jnp.zeros(shape_r, jnp.float32),
                           rs_ref[:])
        else:
            sig_eff = rs_ref[:]
        value = jnp.clip(rv_ref[:] + sig_eff * draw, mlo_t, mhi_t)
        u3 = _uniform_from_bits(bits(shape_r))
        reset_val = _mix(lap_mask, jnp.zeros(shape_r, jnp.float32),
                         mlo_t + (mhi_t - mlo_t) * u3)
        value = jnp.where(reset_r, reset_val, value)
        if has_wf:
            # emitted index rides rk (1-based steps-since-regen, the same
            # counter/cadence the noise rows use): init emits k=0, each
            # advance emits k=rk — post-regen the sequence restarts at 1,
            # matching the env's violation-reset stream (reset obs is k=0)
            value = _mix(wf_mask, _wf_value(rk_new), value)
        rv_ref[:] = value
        if switched_infos:
            _switched_post(regen, reset_rows=reset_r)

    return init, advance


def _rotation_protocol(COS_D, SIN_D, i_eps=-1):
    """Constant-increment Park rotation as a generic scratch protocol for
    const-speed three-phase families (the recorder-side counterpart of the
    reducing kernels' c_ref/s_ref scratch): init cos/sin from eps0 (plane
    index ``i_eps``), 4-mul advance + rsqrt renorm per step, reset to
    (1, 0) on violation — replacing two per-step transcendentals (TPU
    probes: ~18% of step time)."""

    def rot_init(state0):
        return jnp.cos(state0[i_eps]), jnp.sin(state0[i_eps])

    def rot_advance(c, s, violated):
        c_new = c * COS_D - s * SIN_D
        s_new = s * COS_D + c * SIN_D
        inv = jax.lax.rsqrt(c_new * c_new + s_new * s_new)
        return (jnp.where(violated, jnp.ones_like(c), c_new * inv),
                jnp.where(violated, jnp.zeros_like(s), s_new * inv))

    return rot_init, rot_advance


def _resolve_shard_map():
    """The shard_map entry point across JAX versions (shared by every
    sharded wrapper so the fallback lives in one place)."""
    try:
        from jax import shard_map as sm
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as sm
    return sm


def _sync_family(env, R, action_mode):
    """Shared synchronous-family (PMSM/SynRM) closures — consumed by the
    reducing rollout (``make_fused_sync_rollout``) and the generic
    trajectory recorder (``ops.pallas_record``)."""
    ps = env.physical_system
    _fused_check_system(ps)
    mp = ps.motor.parameter
    names = list(ps.state_names)
    lim = np.asarray(ps.limits)
    conv = ps.converter
    finite = conv.action_type == "finite"
    k_int = _fused_interlock(conv, float(ps.tau), finite)
    t_int = k_int * float(ps.tau)

    r_s, l_d, l_q = float(mp["r_s"]), float(mp["l_d"]), float(mp["l_q"])
    psi_p, p = float(mp.get("psi_p", 0.0)), float(mp["p"])
    tau = float(ps.tau)
    i_lim = float(lim[names.index("i_sd")])
    t_lim = float(lim[names.index("torque")])
    w_lim = float(lim[names.index("omega")])
    shape = (R, LANE)

    mload = _make_fused_mech(ps, float(mp["j_rotor"]), shape)
    mech_mode, mech = mload.mode, mload.mech
    needs_step_noise = mload.needs_step_noise
    sup = _make_fused_supply(ps, shape, tau)
    n_sup = sup.n_sup

    COS_D = SIN_D = COS_DI = SIN_DI = None
    omega_fixed = mload.omega_fixed
    if not mech:
        COS_D = np.float32(np.cos(tau * p * omega_fixed))
        SIN_D = np.float32(np.sin(tau * p * omega_fixed))
        # mid-cycle rotation for the interlock sub-interval refresh
        COS_DI = np.float32(np.cos(t_int * p * omega_fixed))
        SIN_DI = np.float32(np.sin(t_int * p * omega_fixed))

    def torque(i_sd, i_sq):
        return 1.5 * p * (psi_p + (l_d - l_q) * i_sd) * i_sq

    def el_rhs(w, i_sd, i_sq, u_d, u_q):
        pw = p * w
        di_sd = (-r_s * i_sd + l_q * pw * i_sq + u_d) * (1.0 / l_d)
        di_sq = (-psi_p * pw - r_s * i_sq - l_d * pw * i_sd + u_q) * (1.0 / l_q)
        return di_sd, di_sq

    if mech:
        def rhs(core, u_d, u_q, z):
            w, i_sd, i_sq, eps = core
            dw = mload.mech_rhs(w, torque(i_sd, i_sq), z)
            di_sd, di_sq = el_rhs(w, i_sd, i_sq, u_d, u_q)
            return dw, di_sd, di_sq, p * w
    else:
        def rhs(core, u_d, u_q, z):
            i_sd, i_sq, eps = core
            di_sd, di_sq = el_rhs(omega_fixed, i_sd, i_sq, u_d, u_q)
            return di_sd, di_sq, np.float32(p * omega_fixed) + 0.0 * eps

    n_core = 4 if mech else 3
    n_state = n_core + n_sup
    i_eps = n_core - 1

    n_bridge = (3 if (finite and (k_int > 0.0
                                  or ps.supply.kind == "RCVoltageSupply"))
                else 0)

    b6 = _make_b6(finite, k_int)
    b6_cmd, abc_frac, b6_i_sup = b6.cmd, b6.frac, b6.i_sup

    def advance_bridges(bs, action):
        cmd = b6_cmd(action)
        if k_int > 0.0:
            return tuple(_interlock_state(b, c) for b, c in zip(bs, cmd))
        return cmd

    def dq_to_abc(i_sd, i_sq, c, s):
        """inverse Park + Clarke (t_32 rows, three_phase_motor.py:16-88)"""
        i_al = c * i_sd - s * i_sq
        i_be = s * i_sd + c * i_sq
        half_b = np.float32(0.5 * np.sqrt(3.0))
        return (i_al, -0.5 * i_al + half_b * i_be, -0.5 * i_al - half_b * i_be)

    def _park(u_abc, c, s):
        u_alpha = (2.0 / 3.0) * (u_abc[0] - 0.5 * (u_abc[1] + u_abc[2]))
        u_beta = np.float32(1.0 / np.sqrt(3.0)) * (u_abc[1] - u_abc[2])
        return c * u_alpha + s * u_beta, -s * u_alpha + c * u_beta

    def rk4(core, u_d, u_q, z, dt):
        def axpy(st, k, cc):
            return tuple(si + cc * ki for si, ki in zip(st, k))

        k1 = rhs(core, u_d, u_q, z)
        k2 = rhs(axpy(core, k1, 0.5 * dt), u_d, u_q, z)
        k3 = rhs(axpy(core, k2, 0.5 * dt), u_d, u_q, z)
        k4 = rhs(axpy(core, k3, dt), u_d, u_q, z)
        return tuple(
            si + (dt / 6.0) * (a1 + 2.0 * (a2 + a3) + a4)
            for si, a1, a2, a3, a4 in zip(core, k1, k2, k3, k4)
        )

    def _dq_of(core):
        return (core[1], core[2]) if mech else (core[0], core[1])

    def physics_step(state, action, c, s, z=None, bs=None):
        core, sup_planes = state[:n_core], state[n_core:]
        finite_il = finite and k_int > 0.0
        i_abc = None
        if sup.needs_i_sup or k_int != 0.0:
            i_sd, i_sq = _dq_of(core)
            i_abc = dq_to_abc(i_sd, i_sq, c, s)
        if sup.needs_i_sup:
            # finite B6: i_sup reads the PREVIOUS cycle's switch states
            # carried in ``bs`` (the reference queries i_sup before
            # convert() flips the bridges — see _dc_family.step_physics)
            i_sup_val = b6_i_sup(action, i_abc, bs if finite else None)
        else:
            i_sup_val = None
        # one supply query per cycle (both reference sub-intervals query at
        # the same timestamp — see _dc_family.step_physics)
        u_sup_val, sup_new = sup.supply_u(sup_planes, i_sup_val)

        if finite_il:
            # 2-sub-interval interlock schedule: interlock pattern for the
            # whole cycle (deferred quirk); the rotor angle and currents
            # refresh between sub-intervals, with the abc voltage frozen at
            # interval-0 values for envs with no interlock this cycle
            # (physical_systems.py:487-525)
            cmd = b6_cmd(action)
            inter = tuple(_interlock_state(b, cm)
                          for b, cm in zip(bs, cmd))
            flag = ((inter[0] != cmd[0]) | (inter[1] != cmd[1])
                    | (inter[2] != cmd[2]))
            u_abc0 = tuple(f * u_sup_val
                           for f in abc_frac(action, i_abc, inter))
            u_d0, u_q0 = _park(u_abc0, c, s)
            # single reference sub-interval when no interlock: leg
            # durations (0, tau) per env — a dt=0 RK4 leg is an exact
            # identity (see the DC variant)
            dt0 = jnp.where(flag, np.float32(t_int), 0.0)
            dt1 = jnp.where(flag, np.float32(tau - t_int),
                            np.float32(tau))
            core_mid = rk4(core, u_d0, u_q0, z, dt0)
            if mech:
                eps_mid = core_mid[i_eps]
                c1, s1 = jnp.cos(eps_mid), jnp.sin(eps_mid)
            else:
                # no-interlock envs keep the cycle-start angle (their
                # mid state IS the start state)
                c1 = jnp.where(flag, c * COS_DI - s * SIN_DI, c)
                s1 = jnp.where(flag, s * COS_DI + c * SIN_DI, s)
            i_sd_m, i_sq_m = _dq_of(core_mid)
            i_abc_m = dq_to_abc(i_sd_m, i_sq_m, c1, s1)
            u_abc1 = tuple(
                jnp.where(flag, f * u_sup_val, u0)
                for f, u0 in zip(abc_frac(action, i_abc_m, inter), u_abc0))
            u_d1, u_q1 = _park(u_abc1, c1, s1)
            return rk4(core_mid, u_d1, u_q1, z, dt1) + sup_new

        fa, fb, fc = abc_frac(action, i_abc)
        u_d, u_q = _park((fa * u_sup_val, fb * u_sup_val, fc * u_sup_val),
                         c, s)
        return rk4(core, u_d, u_q, z, tau) + sup_new

    def reset_state(bits):
        zero = jnp.zeros(shape, jnp.float32)
        core = ((mload.omega_reset(bits),) if mech else ()) + (zero,) * 3
        return core + sup.sup_reset(bits)

    ref_cfg = _ref_configs(env, R,
                           require_wiener=action_mode == "random")
    n_ref = len(ref_cfg)
    n_rows = _ref_n_rows(ref_cfg)
    shape_r = (n_rows * R, LANE)
    rw = env.reward_function
    bias = np.float32(rw._bias_value)
    violation_reward = np.float32(rw._violation_value)

    def ref_quantity(state, j):
        nm = ref_cfg[j]["name"]
        i_sd, i_sq = (state[1], state[2]) if mech else (state[0], state[1])
        if nm == "omega":
            return state[0] * np.float32(1.0 / w_lim)
        if nm == "torque":
            return torque(i_sd, i_sq) * np.float32(1.0 / t_lim)
        q = i_sd if nm == "i_sd" else i_sq
        return q * ref_cfg[j]["inv_lim"]

    def _sample_actions(bits):
        if finite:
            return (bits(shape) & jnp.uint32(7)).astype(jnp.int32)
        return (2.0 * _uniform_from_bits(bits(shape)) - 1.0,
                2.0 * _uniform_from_bits(bits(shape)) - 1.0,
                2.0 * _uniform_from_bits(bits(shape)) - 1.0)

    # --- generic record-adapter surface (see ops/pallas_record.py) ---
    state_names = ((("omega",) if mech else ()) + ("i_sd", "i_sq", "eps")
                   + sup.names)
    act_names = (("action",) if finite
                 else ("action_a", "action_b", "action_c"))
    act_dtype = jnp.int32 if finite else jnp.float32

    def sample_actions_t(bits):
        a = _sample_actions(bits)
        return (a,) if finite else a

    def read_actions(ref, t):
        if finite:
            return (ref[t],)
        return tuple(ref[t, j] for j in range(3))

    def pre_step(cur):
        return (jnp.cos(cur[i_eps]), jnp.sin(cur[i_eps]))

    rot_init = rot_advance = pre_step_rot = None
    if not mech:
        rot_init, rot_advance = _rotation_protocol(COS_D, SIN_D, i_eps)

        def pre_step_rot(cur, c, s):
            return (c, s)

    def step(cur, acts, aux, z=None, bs=None):
        c, s = aux
        a = acts[0] if finite else acts
        state = physics_step(cur, a, c, s, z, bs)
        eps = state[i_eps]
        eps = eps - np.float32(TWO_PI) * jnp.floor(
            eps * np.float32(1.0 / TWO_PI))
        return state[:i_eps] + (eps,) + state[i_eps + 1:]

    def violated(state):
        i_sd, i_sq = (state[1], state[2]) if mech else (state[0], state[1])
        i_sd_n = i_sd * np.float32(1.0 / i_lim)
        i_sq_n = i_sq * np.float32(1.0 / i_lim)
        return (i_sd_n * i_sd_n + i_sq_n * i_sq_n) > 1.0

    def quantities(state, aux):
        return [ref_quantity(state, j) for j in range(n_ref)]

    return SimpleNamespace(
        n_state=n_state, finite=finite, mech=mech, shape=shape,
        shape_r=shape_r, n_ref=n_ref, n_rows=n_rows, ref_cfg=ref_cfg, bias=bias,
        violation_reward=violation_reward, i_lim=i_lim, COS_D=COS_D,
        SIN_D=SIN_D, physics_step=physics_step, ref_quantity=ref_quantity,
        sample_actions=_sample_actions, state_names=state_names,
        act_names=act_names, act_dtype=act_dtype,
        sample_actions_t=sample_actions_t, read_actions=read_actions,
        pre_step=pre_step, step=step, violated=violated,
        quantities=quantities, pre_step_rot=pre_step_rot,
        rot_init=rot_init, rot_advance=rot_advance,
        mech_mode=mech_mode, sup_mode=sup.mode, n_sup=n_sup, n_core=n_core,
        i_eps=i_eps, needs_step_noise=needs_step_noise,
        reset_state=reset_state, n_bridge=n_bridge,
        advance_bridges=lambda bs, acts: advance_bridges(
            bs, acts[0] if isinstance(acts, tuple) else acts),
    )


def make_fused_sync_rollout(env, n_steps, n_envs, action_mode="random",
                            interpret=False):
    """Universal fused rollout for the synchronous family — all 12
    {Finite,Cont} x {CC,TC,SC} x {PMSM,SynRM} catalog configs.

    Reads every semantic from the env spec: the dq ODE with psi_p = 0
    covering SynRM (permanent_magnet_synchronous_motor.py:107-119,
    synchronous_reluctance_motor.py:117-130), B6 bridge bits (finite,
    converters.py:788-823) or duty u = a*u_sup/2 (cont, converters.py:
    846-881), Park at the cycle-start angle (the reference's stale-epsilon
    quirk, physical_systems.py:487-525), the SquaredConstraint on the dq
    currents, Wiener references on (i_sd*, i_sq*) / torque* / omega* and
    the WSE reward.  CC/TC (ConstantSpeedLoad) keep the 4-mul incremental
    Park rotation; SC adds the PolynomialStaticLoad mechanical ODE to the
    joint RK4 state and evaluates cos/sin(eps) per step (omega varies);
    the OU speed load and the AC1/RC supplies run in-kernel with their
    extra state planes exactly like the DC family (see ``_dc_family``).

    * random mode: ``rollout(seed, *state0) -> (*states, reward_sum,
      term_count, rv, rk, rl, rs)``; states = (omega?, i_sd, i_sq, eps,
      *supply planes).
    * buffer mode: ``rollout(*state0, actions) -> states`` with an int32
      ``(n_steps, R, LANE)`` (finite) or float32 ``(n_steps, 3, R, LANE)``
      (cont) action buffer; deterministic physics only.
    """
    assert n_envs % LANE == 0
    R = n_envs // LANE
    fs = _sync_family(env, R, action_mode)
    _check_switched_min_envs(fs, R, interpret)
    n_state, finite, mech, shape, shape_r = (
        fs.n_state, fs.finite, fs.mech, fs.shape, fs.shape_r)
    n_ref, ref_cfg = fs.n_ref, fs.ref_cfg
    n_rows = fs.n_rows
    bias, violation_reward, i_lim = fs.bias, fs.violation_reward, fs.i_lim
    COS_D, SIN_D, i_eps = fs.COS_D, fs.SIN_D, fs.i_eps
    n_bs = fs.n_bridge
    physics_step, ref_quantity = fs.physics_step, fs.ref_quantity
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

        def body(t, bs):
            action = _sample_actions(bits)
            z = _step_noise(fs.needs_step_noise, bits, shape)
            cur = tuple(o[:] for o in out_state)
            if mech:
                c, s = jnp.cos(cur[i_eps]), jnp.sin(cur[i_eps])
            else:
                c, s = c_ref[:], s_ref[:]
            state = physics_step(cur, action, c, s, z,
                                 bs if n_bs else None)
            eps = state[i_eps]
            eps = eps - np.float32(TWO_PI) * jnp.floor(eps * inv_2pi)
            state = state[:i_eps] + (eps,) + state[i_eps + 1:]

            i_sd, i_sq = (state[1], state[2]) if mech else (state[0], state[1])
            i_sd_n = i_sd * np.float32(1.0 / i_lim)
            i_sq_n = i_sq * np.float32(1.0 / i_lim)
            violated = (i_sd_n * i_sd_n + i_sq_n * i_sq_n) > 1.0

            refs_now = rv_ref[:]
            wse = bias - _wse_err(ref_cfg[0], ref_quantity(state, 0),
                                  refs_now[:R])
            if n_ref == 2:
                wse = wse - _wse_err(ref_cfg[1], ref_quantity(state, 1),
                                     refs_now[R:])
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
                                     jnp.ones(shape, jnp.float32), c_new * inv)
                s_ref[:] = jnp.where(violated, zero, s_new * inv)

            w_advance(t, violated)
            if not n_bs:
                return 0
            # converter.reset() on violation: all-off switching states
            return tuple(jnp.where(violated, 0, b)
                         for b in fs.advance_bridges(bs, action))

        init = (tuple(jnp.zeros(shape, jnp.int32) for _ in range(n_bs))
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
                action = actions_ref[t]
            else:
                action = (actions_ref[t, 0], actions_ref[t, 1],
                          actions_ref[t, 2])
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
            return fs.advance_bridges(bs, action)

        init = (tuple(jnp.zeros(shape, jnp.int32) for _ in range(n_bs))
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


def make_fused_scim_rollout(env, n_steps, n_envs, action_mode="random",
                            interpret=False):
    """Fused rollout for Cont-TC-SCIM-v0 — the stiffest family: 5-state
    alpha/beta induction ODE (induction_motor.py:287-313, rotor shorted),
    continuous B6 duty-cycle converter, Wiener torque reference, WSE torque
    reward and the squared dq-current constraint (which needs no field-angle
    atan2: the Park rotation preserves the current norm).

    ``action_mode='buffer'``: ``rollout(isa0, isb0, psa0, psb0, actions)``
    with a ``(n_steps, 3, n_envs//128, 128)`` float32 abc duty buffer in
    [-1, 1], deterministic physics only — the bit-level validation path."""
    assert n_envs % LANE == 0
    R = n_envs // LANE
    ps = env.physical_system
    _fused_check_system(ps)
    mp = ps.motor.parameter
    names = list(ps.state_names)
    lim = np.asarray(ps.limits)

    l_m = float(mp["l_m"])
    l_s = float(mp["l_m"] + mp["l_sigs"])
    l_r = float(mp["l_m"] + mp["l_sigr"])
    r_s, r_r, p = float(mp["r_s"]), float(mp["r_r"]), float(mp["p"])
    sigma = (l_s * l_r - l_m**2) / (l_s * l_r)
    tau_r = l_r / r_r
    tau_sig = sigma * l_s / (r_s + r_r * l_m**2 / l_r**2)
    c_psi = l_m * r_r / (sigma * l_s * l_r**2)
    c_w = l_m * p / (sigma * l_r * l_s)
    c_u = 1.0 / (sigma * l_s)
    k_t = 1.5 * p * l_m / l_r

    omega = float(_fused_load(ps, ("ConstantSpeedLoad",)).omega_fixed)
    tau = float(ps.tau)
    u_half = 0.5 * _fused_u_sup(ps)
    i_lim = float(lim[names.index("i_sd")])
    t_lim = float(lim[names.index("torque")])
    t_margin = float(ps.nominal_state[names.index("torque")] / t_lim)
    w_over_span = 1.0 / 2.0
    violation_reward = -1.0 / (1.0 - 0.9)
    p_omega = p * omega
    shape = (R, LANE)
    LN10 = np.float32(np.log(10.0))

    def rhs(i_sa, i_sb, ps_a, ps_b, u_a, u_b):
        di_sa = -i_sa / tau_sig + c_psi * ps_a + c_w * omega * ps_b + c_u * u_a
        di_sb = -i_sb / tau_sig + c_psi * ps_b - c_w * omega * ps_a + c_u * u_b
        dps_a = (l_m * i_sa - ps_a) / tau_r - p_omega * ps_b
        dps_b = (l_m * i_sb - ps_b) / tau_r + p_omega * ps_a
        return di_sa, di_sb, dps_a, dps_b

    def _step_physics(isa, isb, pa, pb, ua, ub, uc):
        # continuous B6: u_phase = a * u_sup / 2 per phase
        u_al = (2.0 / 3.0) * (ua - 0.5 * (ub + uc))
        u_be = np.float32(1.0 / np.sqrt(3.0)) * (ub - uc)
        k1 = rhs(isa, isb, pa, pb, u_al, u_be)
        k2 = rhs(isa + 0.5 * tau * k1[0], isb + 0.5 * tau * k1[1],
                 pa + 0.5 * tau * k1[2], pb + 0.5 * tau * k1[3], u_al, u_be)
        k3 = rhs(isa + 0.5 * tau * k2[0], isb + 0.5 * tau * k2[1],
                 pa + 0.5 * tau * k2[2], pb + 0.5 * tau * k2[3], u_al, u_be)
        k4 = rhs(isa + tau * k3[0], isb + tau * k3[1],
                 pa + tau * k3[2], pb + tau * k3[3], u_al, u_be)
        sixth = tau / 6.0
        return (isa + sixth * (k1[0] + 2.0 * (k2[0] + k3[0]) + k4[0]),
                isb + sixth * (k1[1] + 2.0 * (k2[1] + k3[1]) + k4[1]),
                pa + sixth * (k1[2] + 2.0 * (k2[2] + k3[2]) + k4[2]),
                pb + sixth * (k1[3] + 2.0 * (k2[3] + k3[3]) + k4[3]))

    def kernel(seed_ref, isa_ref, isb_ref, psa_ref, psb_ref,
               out_isa, out_isb, out_psa, out_psb, out_reward, out_terms,
               out_rv, out_rk, out_rl, out_rs,
               rv_ref, rk_ref, rl_ref, rs_ref, rng_ref, za_ref, zb_ref):
        seed, bits = _make_rng(interpret, rng_ref)
        seed(seed_ref[0])
        out_isa[:] = isa_ref[:]
        out_isb[:] = isb_ref[:]
        out_psa[:] = psa_ref[:]
        out_psb[:] = psb_ref[:]
        out_reward[:] = jnp.zeros(shape, jnp.float32)
        out_terms[:] = jnp.zeros(shape, jnp.float32)

        def _draw_params(mask):
            u1 = _uniform_from_bits(bits(shape))
            u2 = _uniform_from_bits(bits(shape))
            rl_ref[:] = jnp.where(mask, jnp.floor(500.0 + 1500.0 * u1), rl_ref[:])
            rs_ref[:] = jnp.where(mask, jnp.exp(LN10 * (-3.0 + 2.0 * u2)), rs_ref[:])

        u = _uniform_from_bits(bits(shape))
        rv_ref[:] = (2.0 * u - 1.0) * t_margin
        rk_ref[:] = jnp.zeros(shape, jnp.float32)
        _draw_params(jnp.ones(shape, dtype=jnp.bool_))

        def body(t, _):
            ua = (2.0 * _uniform_from_bits(bits(shape)) - 1.0) * u_half
            ub = (2.0 * _uniform_from_bits(bits(shape)) - 1.0) * u_half
            uc = (2.0 * _uniform_from_bits(bits(shape)) - 1.0) * u_half
            isa, isb, pa, pb = _step_physics(
                out_isa[:], out_isb[:], out_psa[:], out_psb[:], ua, ub, uc)

            torque = k_t * (pa * isb - pb * isa)
            t_n = torque * (1.0 / t_lim)
            # |i_dq| == |i_alphabeta| (rotation-invariant) -> no atan2 needed
            violated = (isa * isa + isb * isb) * (1.0 / (i_lim * i_lim)) > 1.0
            reward = jnp.where(violated, violation_reward,
                               -w_over_span * jnp.abs(t_n - rv_ref[:]))
            out_reward[:] = out_reward[:] + reward
            out_terms[:] = out_terms[:] + violated.astype(jnp.float32)

            zero = jnp.zeros(shape, jnp.float32)
            out_isa[:] = jnp.where(violated, zero, isa)
            out_isb[:] = jnp.where(violated, zero, isb)
            out_psa[:] = jnp.where(violated, zero, pa)
            out_psb[:] = jnp.where(violated, zero, pb)

            # one Box-Muller pair every other step (see the PermExDc kernel)
            even = (t & 1) == 0

            @pl.when(even)
            def _():
                u1 = _uniform_from_bits(bits(shape))
                u2 = _uniform_from_bits(bits(shape))
                rad = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
                theta = np.float32(TWO_PI) * u2
                za_ref[:] = rad * jnp.cos(theta)
                zb_ref[:] = rad * jnp.sin(theta)

            draw = jnp.where(even, za_ref[:], zb_ref[:])
            regen = (rk_ref[:] >= rl_ref[:]) | violated
            _draw_params(regen)
            rk_ref[:] = jnp.where(regen, 0.0, rk_ref[:]) + 1.0
            value = jnp.clip(rv_ref[:] + rs_ref[:] * draw, -t_margin, t_margin)
            u3 = _uniform_from_bits(bits(shape))
            rv_ref[:] = jnp.where(violated, (2.0 * u3 - 1.0) * t_margin, value)
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)
        out_rv[:] = rv_ref[:]
        out_rk[:] = rk_ref[:]
        out_rl[:] = rl_ref[:]
        out_rs[:] = rs_ref[:]

    def kernel_buffer(isa_ref, isb_ref, psa_ref, psb_ref, actions_ref,
                      out_isa, out_isb, out_psa, out_psb):
        out_isa[:] = isa_ref[:]
        out_isb[:] = isb_ref[:]
        out_psa[:] = psa_ref[:]
        out_psb[:] = psb_ref[:]

        def body(t, _):
            ua = actions_ref[t, 0] * u_half
            ub = actions_ref[t, 1] * u_half
            uc = actions_ref[t, 2] * u_half
            isa, isb, pa, pb = _step_physics(
                out_isa[:], out_isb[:], out_psa[:], out_psb[:], ua, ub, uc)
            out_isa[:] = isa
            out_isb[:] = isb
            out_psa[:] = pa
            out_psb[:] = pb
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    if action_mode == "buffer":
        @jax.jit
        def rollout(isa0, isb0, psa0, psb0, actions):
            return pl.pallas_call(
                kernel_buffer,
                out_shape=tuple(jax.ShapeDtypeStruct(shape, jnp.float32)
                                for _ in range(4)),
                in_specs=[vmem] * 5,
                out_specs=tuple(vmem for _ in range(4)),
                interpret=interpret,
            )(isa0, isb0, psa0, psb0, actions)

        return rollout

    out_shapes = tuple(jax.ShapeDtypeStruct(shape, jnp.float32) for _ in range(10))

    @jax.jit
    def rollout(seed, isa0, isb0, psa0, psb0):
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem] * 4,
            out_specs=tuple(vmem for _ in range(10)),
            scratch_shapes=(
                [pltpu.VMEM(shape, jnp.float32) for _ in range(4)]
                + [pltpu.VMEM(shape, jnp.uint32)]
                + [pltpu.VMEM(shape, jnp.float32) for _ in range(2)]
            ),
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32), isa0, isb0, psa0, psb0)

    return rollout


def _induction_family(env, R, action_mode):
    """Shared squirrel-cage-induction-family closures — consumed by the
    reducing rollout (``make_fused_induction_rollout``) and the generic
    trajectory recorder (``ops.pallas_record``)."""
    ps = env.physical_system
    _fused_check_system(ps)
    mp = ps.motor.parameter
    names = list(ps.state_names)
    lim = np.asarray(ps.limits)
    conv = ps.converter
    finite = conv.action_type == "finite"
    k_int = _fused_interlock(conv, float(ps.tau), finite)
    t_int = k_int * float(ps.tau)

    l_m = float(mp["l_m"])
    l_s = float(mp["l_m"] + mp["l_sigs"])
    l_r = float(mp["l_m"] + mp["l_sigr"])
    r_s, r_r, p = float(mp["r_s"]), float(mp["r_r"]), float(mp["p"])
    sigma = (l_s * l_r - l_m**2) / (l_s * l_r)
    tau_r = l_r / r_r
    tau_sig = sigma * l_s / (r_s + r_r * l_m**2 / l_r**2)
    c_psi = l_m * r_r / (sigma * l_s * l_r**2)
    c_w = l_m * p / (sigma * l_r * l_s)
    c_u = 1.0 / (sigma * l_s)
    k_t = 1.5 * p * l_m / l_r

    tau = float(ps.tau)
    i_lim = float(lim[names.index("i_sd")])
    t_lim = float(lim[names.index("torque")])
    w_lim = float(lim[names.index("omega")])
    shape = (R, LANE)

    mload = _make_fused_mech(ps, float(mp["j_rotor"]), shape)
    mech_mode, mech = mload.mode, mload.mech
    needs_step_noise = mload.needs_step_noise
    omega_fixed = mload.omega_fixed
    sup = _make_fused_supply(ps, shape, tau)
    n_sup = sup.n_sup

    def el_rhs(w, el, u_al, u_be):
        i_sa, i_sb, ps_a, ps_b = el
        pw = p * w
        di_sa = -i_sa / tau_sig + c_psi * ps_a + c_w * w * ps_b + c_u * u_al
        di_sb = -i_sb / tau_sig + c_psi * ps_b - c_w * w * ps_a + c_u * u_be
        dps_a = (l_m * i_sa - ps_a) / tau_r - pw * ps_b
        dps_b = (l_m * i_sb - ps_b) / tau_r + pw * ps_a
        return di_sa, di_sb, dps_a, dps_b

    def torque(el):
        return k_t * (el[2] * el[1] - el[3] * el[0])

    if mech:
        def rhs(core, u_al, u_be, z):
            w, el = core[0], core[1:]
            dw = mload.mech_rhs(w, torque(el), z)
            return (dw,) + el_rhs(w, el, u_al, u_be)
    else:
        def rhs(core, u_al, u_be, z):
            return el_rhs(omega_fixed, core, u_al, u_be)

    n_core = 4 + (1 if mech else 0)
    n_state = n_core + n_sup

    n_bridge = (3 if (finite and (k_int > 0.0
                                  or ps.supply.kind == "RCVoltageSupply"))
                else 0)

    b6 = _make_b6(finite, k_int)
    b6_cmd = b6.cmd

    def advance_bridges(bs, acts):
        action = acts[0] if isinstance(acts, tuple) else acts
        cmd = b6_cmd(action)
        if k_int > 0.0:
            return tuple(_interlock_state(b, c) for b, c in zip(bs, cmd))
        return cmd

    def _clarke_inv(i_al, i_be):
        # stator currents are already stator-frame alpha/beta: Clarke
        # back to abc without any rotation (physical_systems.py:771-814)
        half_b = np.float32(0.5 * np.sqrt(3.0))
        return (i_al, -0.5 * i_al + half_b * i_be,
                -0.5 * i_al - half_b * i_be)

    abc_frac, b6_i_sup = b6.frac, b6.i_sup

    def _uab(u_abc):
        return ((2.0 / 3.0) * (u_abc[0] - 0.5 * (u_abc[1] + u_abc[2])),
                np.float32(1.0 / np.sqrt(3.0)) * (u_abc[1] - u_abc[2]))

    def rk4(core, u_al, u_be, z, dt):
        def axpy(st, k, cc):
            return tuple(si + cc * ki for si, ki in zip(st, k))

        k1 = rhs(core, u_al, u_be, z)
        k2 = rhs(axpy(core, k1, 0.5 * dt), u_al, u_be, z)
        k3 = rhs(axpy(core, k2, 0.5 * dt), u_al, u_be, z)
        k4 = rhs(axpy(core, k3, dt), u_al, u_be, z)
        return tuple(
            si + (dt / 6.0) * (a1 + 2.0 * (a2 + a3) + a4)
            for si, a1, a2, a3, a4 in zip(core, k1, k2, k3, k4)
        )

    def step_physics(state, action, z=None, bs=None):
        core, sup_planes = state[:n_core], state[n_core:]
        finite_il = finite and k_int > 0.0
        i_abc = None
        if sup.needs_i_sup or k_int != 0.0:
            el_pre = core[1:] if mech else core
            i_abc = _clarke_inv(el_pre[0], el_pre[1])
        if sup.needs_i_sup:
            # finite B6: previous cycle's switch states feed i_sup (see
            # _dc_family.step_physics)
            i_sup_val = b6_i_sup(action, i_abc, bs if finite else None)
        else:
            i_sup_val = None
        u_sup_val, sup_new = sup.supply_u(sup_planes, i_sup_val)

        if finite_il:
            # 2-sub-interval interlock schedule (see _sync_family): the
            # stator-frame SCIM needs no mid-cycle angle refresh, only the
            # freewheeling phase currents
            cmd = b6_cmd(action)
            inter = tuple(_interlock_state(b, c) for b, c in zip(bs, cmd))
            flag = ((inter[0] != cmd[0]) | (inter[1] != cmd[1])
                    | (inter[2] != cmd[2]))
            u_abc0 = tuple(f * u_sup_val
                           for f in abc_frac(action, i_abc, inter))
            dt0 = jnp.where(flag, np.float32(t_int), 0.0)
            dt1 = jnp.where(flag, np.float32(tau - t_int),
                            np.float32(tau))
            core_mid = rk4(core, *_uab(u_abc0), z, dt0)
            el_mid = core_mid[1:] if mech else core_mid
            i_abc_m = _clarke_inv(el_mid[0], el_mid[1])
            u_abc1 = tuple(
                jnp.where(flag, f * u_sup_val, u0)
                for f, u0 in zip(abc_frac(action, i_abc_m, inter), u_abc0))
            return rk4(core_mid, *_uab(u_abc1), z, dt1) + sup_new

        u_al, u_be = _uab(tuple(f * u_sup_val
                                for f in abc_frac(action, i_abc)))
        return rk4(core, u_al, u_be, z, tau) + sup_new

    def reset_state(bits):
        zero = jnp.zeros(shape, jnp.float32)
        core = ((mload.omega_reset(bits),) if mech else ()) + (zero,) * 4
        return core + sup.sup_reset(bits)

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
        """cos/sin of the rotor-flux field angle, computed as psi/|psi|
        instead of an atan2+sincos round trip (atan2(0,0) = 0 -> (1, 0) at
        zero flux)"""
        ps_a, ps_b = el[2], el[3]
        mag2 = ps_a * ps_a + ps_b * ps_b
        tiny = mag2 < 1e-24
        inv = jax.lax.rsqrt(jnp.where(tiny, 1.0, mag2))
        return (jnp.where(tiny, 1.0, ps_a * inv),
                jnp.where(tiny, 0.0, ps_b * inv))

    def core_el(state):
        return state[1:n_core] if mech else state[:n_core]

    def ref_quantities(state, cs):
        """cs is the PRE-step field direction: the reference refreshes the
        field angle only between sub-intervals, so the dq outputs combine
        the post-step currents with the stale angle
        (physical_systems.py:783-812)."""
        el = core_el(state)
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
            return (bits(shape) & jnp.uint32(7)).astype(jnp.int32)
        return (2.0 * _uniform_from_bits(bits(shape)) - 1.0,
                2.0 * _uniform_from_bits(bits(shape)) - 1.0,
                2.0 * _uniform_from_bits(bits(shape)) - 1.0)

    # --- generic record-adapter surface (see ops/pallas_record.py) ---
    state_names = ((("omega",) if mech else ())
                   + ("i_salpha", "i_sbeta", "psi_ralpha", "psi_rbeta")
                   + sup.names)
    act_names = (("action",) if finite
                 else ("action_a", "action_b", "action_c"))
    act_dtype = jnp.int32 if finite else jnp.float32
    inv_ilim2 = np.float32(1.0 / (i_lim * i_lim))

    def sample_actions_t(bits):
        a = _sample_actions(bits)
        return (a,) if finite else a

    def read_actions(ref, t):
        if finite:
            return (ref[t],)
        return tuple(ref[t, j] for j in range(3))

    def pre_step(cur):
        if not needs_dq:
            return ()
        return flux_dir(core_el(cur))

    def step(cur, acts, aux, z=None, bs=None):
        a = acts[0] if finite else acts
        return step_physics(cur, a, z, bs)

    def violated(state):
        el = core_el(state)
        # |i_dq| == |i_alphabeta| (rotation-invariant)
        return (el[0] * el[0] + el[1] * el[1]) * inv_ilim2 > 1.0

    def quantities(state, aux):
        return ref_quantities(state, aux if needs_dq else None)

    return SimpleNamespace(
        n_state=n_state, finite=finite, mech=mech, shape=shape,
        shape_r=shape_r, n_ref=n_ref, n_rows=n_rows, ref_cfg=ref_cfg, bias=bias,
        violation_reward=violation_reward, i_lim=i_lim, needs_dq=needs_dq,
        step_physics=step_physics, flux_dir=flux_dir, core_el=core_el,
        ref_quantities=ref_quantities, sample_actions=_sample_actions,
        state_names=state_names, act_names=act_names, act_dtype=act_dtype,
        sample_actions_t=sample_actions_t, read_actions=read_actions,
        pre_step=pre_step, step=step, violated=violated,
        quantities=quantities,
        mech_mode=mech_mode, sup_mode=sup.mode, n_sup=n_sup, n_core=n_core,
        needs_step_noise=needs_step_noise, reset_state=reset_state,
        n_bridge=n_bridge, advance_bridges=advance_bridges,
    )


def make_fused_induction_rollout(env, n_steps, n_envs, action_mode="random",
                                 interpret=False):
    """Universal fused rollout for the squirrel-cage induction family — all
    6 {Finite,Cont} x {CC,TC,SC} SCIM catalog configs from one builder.

    The 4-state alpha/beta ODE (induction_motor.py:287-313, rotor shorted)
    integrates under Clarke-only converter voltages (no Park — the SCIM
    system is stator-frame, physical_systems.py:771-814); dq output
    quantities for the CC reward are produced by rotating the stator
    current into the rotor-flux frame, with the flux direction computed as
    (psi_ra, psi_rb)/|psi| instead of an atan2+sincos round trip
    (physical_systems.py:736-741's eps_fs enters only through its cos/sin).
    SC adds the polynomial-load mechanical ODE; torque = k_t (psi_ra i_sb -
    psi_rb i_sa).  References/reward/constraint read from the env spec as
    in the DC/sync universal builders.

    * random mode: ``rollout(seed, *state0) -> (*states, reward_sum,
      term_count, rv, rk, rl, rs)``; states = (omega?, i_sa, i_sb,
      psi_ra, psi_rb).
    * buffer mode: ``rollout(*state0, actions) -> states`` with int32
      ``(n_steps, R, LANE)`` B6 bits (finite) / float32
      ``(n_steps, 3, R, LANE)`` duties (cont); deterministic physics only.
    """
    assert n_envs % LANE == 0
    R = n_envs // LANE
    fs = _induction_family(env, R, action_mode)
    _check_switched_min_envs(fs, R, interpret)
    n_state, finite, mech, shape, shape_r = (
        fs.n_state, fs.finite, fs.mech, fs.shape, fs.shape_r)
    n_ref, ref_cfg = fs.n_ref, fs.ref_cfg
    n_rows = fs.n_rows
    bias, violation_reward, i_lim = fs.bias, fs.violation_reward, fs.i_lim
    needs_dq, flux_dir, core_el = fs.needs_dq, fs.flux_dir, fs.core_el
    n_bs = fs.n_bridge
    _step_physics, ref_quantities = fs.step_physics, fs.ref_quantities
    _sample_actions = fs.sample_actions
    has_wf = _ref_needs_wf(ref_cfg)

    def kernel(seed_ref, *refs):
        state0 = refs[:n_state]
        out_state = refs[n_state: 2 * n_state]
        out_reward, out_terms, out_rv, out_rk, out_rl, out_rs = (
            refs[2 * n_state: 2 * n_state + 6])
        scratch = refs[2 * n_state + 6:]
        rv_ref, rk_ref, rl_ref, rs_ref, rng_ref = scratch[:5]
        za_ref, zb_ref = ((scratch[5], scratch[6]) if n_rows == 1
                          else (None, None))
        wf_ref = scratch[-1] if has_wf else None
        seed, bits = _make_rng(interpret, rng_ref)
        seed(seed_ref[0])
        for o, s in zip(out_state, state0):
            o[:] = s[:]
        out_reward[:] = jnp.zeros(shape, jnp.float32)
        out_terms[:] = jnp.zeros(shape, jnp.float32)

        w_init, w_advance = _make_wiener(bits, ref_cfg, R, shape, shape_r,
                                         rv_ref, rk_ref, rl_ref, rs_ref,
                                         za_ref, zb_ref, wf_ref)
        w_init()

        inv_ilim2 = np.float32(1.0 / (i_lim * i_lim))

        def body(t, bs):
            action = _sample_actions(bits)
            z = _step_noise(fs.needs_step_noise, bits, shape)
            cur = tuple(o[:] for o in out_state)
            cs = flux_dir(core_el(cur)) if needs_dq else None
            state = _step_physics(cur, action, z,
                                  bs if n_bs else None)

            el = core_el(state)
            # |i_dq| == |i_alphabeta| (rotation-invariant)
            violated = (el[0] * el[0] + el[1] * el[1]) * inv_ilim2 > 1.0
            qs = ref_quantities(state, cs)
            refs_now = rv_ref[:]
            wse = bias - _wse_err(ref_cfg[0], qs[0], refs_now[:R])
            if n_ref == 2:
                wse = wse - _wse_err(ref_cfg[1], qs[1], refs_now[R:])
            reward = jnp.where(violated, violation_reward, wse)
            out_reward[:] = out_reward[:] + reward
            out_terms[:] = out_terms[:] + violated.astype(jnp.float32)
            for o, s2, r0 in zip(out_state, state, fs.reset_state(bits)):
                o[:] = jnp.where(violated, r0, s2)

            w_advance(t, violated)
            if not n_bs:
                return 0
            return tuple(jnp.where(violated, 0, b)
                         for b in fs.advance_bridges(bs, action))

        init = (tuple(jnp.zeros(shape, jnp.int32) for _ in range(n_bs))
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

        def body(t, bs):
            if finite:
                action = actions_ref[t]
            else:
                action = (actions_ref[t, 0], actions_ref[t, 1],
                          actions_ref[t, 2])
            state = _step_physics(tuple(o[:] for o in out_state), action,
                                  None, bs if n_bs else None)
            for o, s in zip(out_state, state):
                o[:] = s
            if not n_bs:
                return 0
            return fs.advance_bridges(bs, action)

        init = (tuple(jnp.zeros(shape, jnp.int32) for _ in range(n_bs))
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


def make_fused_eesm_rollout(env, n_steps, n_envs, action_mode="random",
                            interpret=False):
    """Fused rollout for Finite-CC-EESM-v0 — the slowest XLA-path family
    (~52M steps/s): 3-current EESM ODE in the dq frame
    (externally_excited_synchronous_motor.py via models/motors.py:451-476),
    dual finite converter (B6 stator bits + 4QC excitation,
    converters.py:788-823 / :313-368), three Wiener references (i_sd*,
    i_sq*, i_e* with the (0, 1) one-sided i_e band), WSE reward (1/3 each),
    squared dq-current + i_e limit constraints, in-kernel auto-reset.

    ``action_mode='buffer'``: ``rollout(i_sd0, i_sq0, i_e0, eps0, actions)``
    with ``(n_steps, 2, n_envs//128, 128)`` int32 actions (B6, 4QC),
    deterministic physics only.
    """
    assert n_envs % LANE == 0
    R = n_envs // LANE
    ps = env.physical_system
    _fused_check_system(ps)
    mp = {k: float(v) for k, v in ps.motor.parameter.items()}
    names = list(ps.state_names)
    lim = np.asarray(ps.limits)

    # stator-side transformed rotor params (models/motors.py:441-449)
    r_E = mp["k"] ** 2 * 1.5 * mp["r_e"]
    l_M = mp["k"] * 1.5 * mp["l_m"]
    l_E = mp["k"] ** 2 * 1.5 * mp["l_e"]
    i_k_rs = 2.0 / 3.0 / mp["k"]
    sig = 1.0 - l_M**2 / (mp["l_d"] * l_E)
    r_s, l_d, l_q, p, k_e = mp["r_s"], mp["l_d"], mp["l_q"], mp["p"], mp["k"]

    omega = float(_fused_load(ps, ("ConstantSpeedLoad",)).omega_fixed)
    tau = float(ps.tau)
    u_sup = _fused_u_sup(ps)
    i_lim = float(lim[names.index("i_sd")])
    ie_lim = float(lim[names.index("i_e")])
    m_sd = float(ps.nominal_state[names.index("i_sd")] / i_lim)
    # i_e reference band: limit_margin=(0, 1) (catalog.py _default_references)
    p_omega = p * omega
    w_over_span = (1.0 / 3.0) / 2.0
    violation_reward = -1.0 / (1.0 - 0.9)
    shape = (R, LANE)
    shape3 = (3 * R, LANE)
    LN10 = np.float32(np.log(10.0))

    def rhs(i_sd, i_sq, i_e, u_d, u_q, u_e):
        di_sd = (-r_s / sig * i_sd + l_M * r_E / (sig * l_E) * i_k_rs * i_e
                 + u_d / sig - l_M * k_e / (sig * l_E) * u_e
                 + l_q * p_omega / sig * i_sq) * (1.0 / l_d)
        di_sq = (-r_s * i_sq + u_q - l_d * p_omega * i_sd
                 - p_omega * l_M * i_k_rs * i_e) * (1.0 / l_q)
        di_e = (l_M * r_s / (sig * l_d) * i_sd - r_E / sig * i_k_rs * i_e
                - l_M / (sig * l_d) * u_d + k_e / sig * u_e
                - p_omega * l_M * l_q / (sig * l_d) * i_sq) * (1.0 / (l_E * i_k_rs))
        return di_sd, di_sq, di_e

    def _step_physics_cs(i_sd, i_sq, i_e, eps, c, s, a_b6, a_4qc):
        ua = (((a_b6 >> 2) & 1).astype(jnp.float32) - 0.5) * u_sup
        ub = (((a_b6 >> 1) & 1).astype(jnp.float32) - 0.5) * u_sup
        uc = ((a_b6 & 1).astype(jnp.float32) - 0.5) * u_sup
        u_e = (jnp.where(a_4qc == 1, 1.0, 0.0)
               - jnp.where(a_4qc == 2, 1.0, 0.0)) * u_sup
        u_al = (2.0 / 3.0) * (ua - 0.5 * (ub + uc))
        u_be = np.float32(1.0 / np.sqrt(3.0)) * (ub - uc)
        u_d = c * u_al + s * u_be
        u_q = -s * u_al + c * u_be
        k1 = rhs(i_sd, i_sq, i_e, u_d, u_q, u_e)
        k2 = rhs(i_sd + 0.5 * tau * k1[0], i_sq + 0.5 * tau * k1[1],
                 i_e + 0.5 * tau * k1[2], u_d, u_q, u_e)
        k3 = rhs(i_sd + 0.5 * tau * k2[0], i_sq + 0.5 * tau * k2[1],
                 i_e + 0.5 * tau * k2[2], u_d, u_q, u_e)
        k4 = rhs(i_sd + tau * k3[0], i_sq + tau * k3[1],
                 i_e + tau * k3[2], u_d, u_q, u_e)
        sixth = tau / 6.0
        return (i_sd + sixth * (k1[0] + 2.0 * (k2[0] + k3[0]) + k4[0]),
                i_sq + sixth * (k1[1] + 2.0 * (k2[1] + k3[1]) + k4[1]),
                i_e + sixth * (k1[2] + 2.0 * (k2[2] + k3[2]) + k4[2]),
                eps + tau * p_omega)

    def _step_physics(i_sd, i_sq, i_e, eps, a_b6, a_4qc):
        c, s = jnp.cos(eps), jnp.sin(eps)
        return _step_physics_cs(i_sd, i_sq, i_e, eps, c, s, a_b6, a_4qc)

    # constant-increment Park rotation (see make_fused_pmsm_rollout)
    COS_D = np.float32(np.cos(tau * p_omega))
    SIN_D = np.float32(np.sin(tau * p_omega))

    def kernel(seed_ref, isd_ref, isq_ref, ie_ref, eps_ref,
               out_isd, out_isq, out_ie, out_eps, out_reward, out_terms,
               out_rv, out_rk, out_rl, out_rs,
               rv_ref, rk_ref, rl_ref, rs_ref, rng_ref, c_ref, s_ref):
        seed, bits = _make_rng(interpret, rng_ref)
        seed(seed_ref[0])
        out_isd[:] = isd_ref[:]
        out_isq[:] = isq_ref[:]
        out_ie[:] = ie_ref[:]
        out_eps[:] = eps_ref[:]
        c_ref[:] = jnp.cos(eps_ref[:])
        s_ref[:] = jnp.sin(eps_ref[:])
        out_reward[:] = jnp.zeros(shape, jnp.float32)
        out_terms[:] = jnp.zeros(shape, jnp.float32)

        # per-generator-row margin bands, rows [i_sd | i_sq | i_e]; built
        # from iota (pallas kernels cannot capture array constants)
        is_ie = jax.lax.broadcasted_iota(jnp.int32, shape3, 0) >= 2 * R
        lo = jnp.where(is_ie, 0.0, -m_sd)
        hi = jnp.where(is_ie, 1.0, m_sd)

        def _draw_params(mask):
            u1 = _uniform_from_bits(bits(shape3))
            u2 = _uniform_from_bits(bits(shape3))
            rl_ref[:] = jnp.where(mask, jnp.floor(500.0 + 1500.0 * u1), rl_ref[:])
            rs_ref[:] = jnp.where(mask, jnp.exp(LN10 * (-3.0 + 2.0 * u2)), rs_ref[:])

        u = _uniform_from_bits(bits(shape3))
        rv_ref[:] = lo + (hi - lo) * u
        rk_ref[:] = jnp.zeros(shape3, jnp.float32)
        _draw_params(jnp.ones(shape3, dtype=jnp.bool_))

        def body(t, _):
            b = bits(shape)
            a_b6 = (b & jnp.uint32(7)).astype(jnp.int32)
            a_4qc = ((b >> jnp.uint32(3)) & jnp.uint32(3)).astype(jnp.int32)
            c, s = c_ref[:], s_ref[:]
            i_sd, i_sq, i_e, eps = _step_physics_cs(
                out_isd[:], out_isq[:], out_ie[:], out_eps[:], c, s, a_b6, a_4qc)
            eps = eps - np.float32(TWO_PI) * jnp.floor(eps * np.float32(1.0 / TWO_PI))
            c_new = c * COS_D - s * SIN_D
            s_new = s * COS_D + c * SIN_D
            inv = jax.lax.rsqrt(c_new * c_new + s_new * s_new)
            c_new = c_new * inv
            s_new = s_new * inv

            isd_n = i_sd * (1.0 / i_lim)
            isq_n = i_sq * (1.0 / i_lim)
            ie_n = i_e * (1.0 / ie_lim)
            violated = ((isd_n * isd_n + isq_n * isq_n) > 1.0) | (jnp.abs(ie_n) > 1.0)
            refs = rv_ref[:]
            wse = -(w_over_span * jnp.abs(isd_n - refs[:R])
                    + w_over_span * jnp.abs(isq_n - refs[R:2 * R])
                    + w_over_span * jnp.abs(ie_n - refs[2 * R:]))
            reward = jnp.where(violated, violation_reward, wse)
            out_reward[:] = out_reward[:] + reward
            out_terms[:] = out_terms[:] + violated.astype(jnp.float32)

            zero = jnp.zeros(shape, jnp.float32)
            out_isd[:] = jnp.where(violated, zero, i_sd)
            out_isq[:] = jnp.where(violated, zero, i_sq)
            out_ie[:] = jnp.where(violated, zero, i_e)
            out_eps[:] = jnp.where(violated, zero, eps)
            c_ref[:] = jnp.where(violated, jnp.ones(shape, jnp.float32), c_new)
            s_ref[:] = jnp.where(violated, zero, s_new)

            viol_f = violated.astype(jnp.float32)
            reset3 = jnp.concatenate([viol_f, viol_f, viol_f], axis=0) > 0.5
            # one Box-Muller pair covers i_sd*/i_sq*; a single draw covers
            # i_e* — 2 log/sqrt + 2 cos + 1 sin lanes instead of 3 of each
            u1 = _uniform_from_bits(bits(shape))
            u2 = _uniform_from_bits(bits(shape))
            rad = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
            theta = np.float32(TWO_PI) * u2
            u3 = _uniform_from_bits(bits(shape))
            u4 = _uniform_from_bits(bits(shape))
            z_e = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u3, 1e-12))) * jnp.cos(
                np.float32(TWO_PI) * u4)
            draw = jnp.concatenate(
                [rad * jnp.cos(theta), rad * jnp.sin(theta), z_e], axis=0)
            regen = (rk_ref[:] >= rl_ref[:]) | reset3
            _draw_params(regen)
            rk_ref[:] = jnp.where(regen, 0.0, rk_ref[:]) + 1.0
            value = jnp.clip(rv_ref[:] + rs_ref[:] * draw, lo, hi)
            u3 = _uniform_from_bits(bits(shape3))
            rv_ref[:] = jnp.where(reset3, lo + (hi - lo) * u3, value)
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)
        out_rv[:] = rv_ref[:]
        out_rk[:] = rk_ref[:]
        out_rl[:] = rl_ref[:]
        out_rs[:] = rs_ref[:]

    def kernel_buffer(isd_ref, isq_ref, ie_ref, eps_ref, actions_ref,
                      out_isd, out_isq, out_ie, out_eps):
        out_isd[:] = isd_ref[:]
        out_isq[:] = isq_ref[:]
        out_ie[:] = ie_ref[:]
        out_eps[:] = eps_ref[:]

        def body(t, _):
            i_sd, i_sq, i_e, eps = _step_physics(
                out_isd[:], out_isq[:], out_ie[:], out_eps[:],
                actions_ref[t, 0], actions_ref[t, 1])
            eps = eps - np.float32(TWO_PI) * jnp.floor(eps * np.float32(1.0 / TWO_PI))
            out_isd[:] = i_sd
            out_isq[:] = i_sq
            out_ie[:] = i_e
            out_eps[:] = eps
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    if action_mode == "buffer":
        @jax.jit
        def rollout(isd0, isq0, ie0, eps0, actions):
            return pl.pallas_call(
                kernel_buffer,
                out_shape=tuple(jax.ShapeDtypeStruct(shape, jnp.float32)
                                for _ in range(4)),
                in_specs=[vmem] * 5,
                out_specs=tuple(vmem for _ in range(4)),
                interpret=interpret,
            )(isd0, isq0, ie0, eps0, actions)

        return rollout

    out_shapes = (tuple(jax.ShapeDtypeStruct(shape, jnp.float32) for _ in range(6))
                  + tuple(jax.ShapeDtypeStruct(shape3, jnp.float32) for _ in range(4)))

    @jax.jit
    def rollout(seed, isd0, isq0, ie0, eps0):
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem] * 4,
            out_specs=tuple(vmem for _ in range(10)),
            scratch_shapes=(
                [pltpu.VMEM(shape3, jnp.float32) for _ in range(4)]
                + [pltpu.VMEM(shape3, jnp.uint32)]
                + [pltpu.VMEM(shape, jnp.float32) for _ in range(2)]
            ),
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32), isd0, isq0, ie0, eps0)

    return rollout


def _eesm_family(env, R, action_mode):
    """Shared EESM-family closures — consumed by the reducing rollout
    (``make_fused_eesm_family_rollout``) and the generic trajectory
    recorder (``ops.pallas_record``)."""
    ps = env.physical_system
    _fused_check_system(ps)
    mp = {k: float(v) for k, v in ps.motor.parameter.items()}
    names = list(ps.state_names)
    lim = np.asarray(ps.limits)
    conv = ps.converter
    finite = conv.action_type == "finite"
    k_int = _fused_interlock(conv, float(ps.tau), finite)
    t_int = k_int * float(ps.tau)

    # stator-side transformed rotor params (models/motors.py:441-449)
    r_E = mp["k"] ** 2 * 1.5 * mp["r_e"]
    l_M = mp["k"] * 1.5 * mp["l_m"]
    l_E = mp["k"] ** 2 * 1.5 * mp["l_e"]
    i_k_rs = 2.0 / 3.0 / mp["k"]
    sig = 1.0 - l_M**2 / (mp["l_d"] * l_E)
    r_s, l_d, l_q, p, k_e = mp["r_s"], mp["l_d"], mp["l_q"], mp["p"], mp["k"]

    tau = float(ps.tau)
    i_lim = float(lim[names.index("i_sd")])
    ie_lim = float(lim[names.index("i_e")])
    t_lim = float(lim[names.index("torque")])
    w_lim = float(lim[names.index("omega")])
    shape = (R, LANE)

    mload = _make_fused_mech(ps, float(mp["j_rotor"]), shape)
    mech_mode, mech = mload.mode, mload.mech
    needs_step_noise = mload.needs_step_noise
    omega_fixed = mload.omega_fixed
    sup = _make_fused_supply(ps, shape, tau)
    n_sup = sup.n_sup
    COS_D = SIN_D = COS_DI = SIN_DI = None
    if not mech:
        COS_D = np.float32(np.cos(tau * p * omega_fixed))
        SIN_D = np.float32(np.sin(tau * p * omega_fixed))
        COS_DI = np.float32(np.cos(t_int * p * omega_fixed))
        SIN_DI = np.float32(np.sin(t_int * p * omega_fixed))

    def torque3(i_sd, i_sq, i_e):
        return 1.5 * p * (l_M * i_e * i_k_rs + (l_d - l_q) * i_sd) * i_sq

    def el_rhs(w, i_sd, i_sq, i_e, u_d, u_q, u_e):
        pw = p * w
        di_sd = (-r_s / sig * i_sd + l_M * r_E / (sig * l_E) * i_k_rs * i_e
                 + u_d / sig - l_M * k_e / (sig * l_E) * u_e
                 + l_q * pw / sig * i_sq) * (1.0 / l_d)
        di_sq = (-r_s * i_sq + u_q - l_d * pw * i_sd
                 - pw * l_M * i_k_rs * i_e) * (1.0 / l_q)
        di_e = (l_M * r_s / (sig * l_d) * i_sd - r_E / sig * i_k_rs * i_e
                - l_M / (sig * l_d) * u_d + k_e / sig * u_e
                - pw * l_M * l_q / (sig * l_d) * i_sq) * (1.0 / (l_E * i_k_rs))
        return di_sd, di_sq, di_e

    if mech:
        def rhs(core, u_d, u_q, u_e, z):
            w, i_sd, i_sq, i_e, eps = core
            dw = mload.mech_rhs(w, torque3(i_sd, i_sq, i_e), z)
            return (dw,) + el_rhs(w, i_sd, i_sq, i_e, u_d, u_q, u_e) + (p * w,)
    else:
        def rhs(core, u_d, u_q, u_e, z):
            i_sd, i_sq, i_e, eps = core
            return (el_rhs(omega_fixed, i_sd, i_sq, i_e, u_d, u_q, u_e)
                    + (np.float32(p * omega_fixed) + 0.0 * eps,))

    n_core = 5 if mech else 4
    n_state = n_core + n_sup
    i_eps = n_core - 1

    n_bridge = (5 if (finite and (k_int > 0.0
                                  or ps.supply.kind == "RCVoltageSupply"))
                else 0)

    b6 = _make_b6(finite, k_int)

    def bridge_cmd(action):
        """B6 (3) + excitation 4QC (2) commanded half-bridge states"""
        a_b6, a_4qc = action
        return b6.cmd(a_b6) + (1 + (a_4qc >= 2).astype(jnp.int32),
                               1 + (a_4qc & jnp.int32(1)))

    def advance_bridges(bs, action):
        cmd = bridge_cmd(action)
        if k_int > 0.0:
            return tuple(_interlock_state(b, c) for b, c in zip(bs, cmd))
        return cmd

    def voltage_fracs(action, i_abc=None, i_e=None, st=None):
        """(phase fracs, excitation frac) of u_sup — B6 + 4QC channels
        (converters.py:788-823, 313-368 via the multi converter); cont
        channels carry the interlock discount (_c2u); interlocked finite
        reads the half-bridge states ``st`` incl. freewheeling"""
        if finite:
            a_b6, a_4qc = action
            fa, fb, fc = b6.frac(a_b6, i_abc, st[:3] if st else None)
            if st is not None:
                fe = _hb_u_st(st[3], i_e) - _hb_u_st(st[4], -i_e)
            else:
                fe = (jnp.where(a_4qc == 1, 1.0, 0.0)
                      - jnp.where(a_4qc == 2, 1.0, 0.0))
            return fa, fb, fc, fe
        fa, fb, fc = b6.frac(action[:3], i_abc)
        if k_int == 0.0:
            return fa, fb, fc, action[3]
        ae = jnp.clip(action[3], -1.0, 1.0)
        fe = (_c2u(0.5 * (ae + 1.0), i_e, k_int)
              - _c2u(-0.5 * (ae - 1.0), i_e, k_int))
        return fa, fb, fc, fe

    def conv_i_sup(action, i_abc, i_e, st=None):
        """multi-converter supply current: B6 (upper-switch / duty-weighted
        phase sum) + excitation 4QC (converters.py:289-298, 354-368,
        429-496, 547-612)"""
        if finite:
            a_b6, a_4qc = action
            i_b6 = b6.i_sup(a_b6, i_abc, st[:3] if st else None)
            if st is not None:
                return i_b6 + _hb_i_st(st[3], i_e) + _hb_i_st(st[4], -i_e)
            return i_b6 + (jnp.where(a_4qc <= 1, i_e, 0.0)
                           + jnp.where((a_4qc == 0) | (a_4qc == 2), -i_e,
                                       0.0))
        i_b6 = b6.i_sup(action[:3], i_abc)
        ae = jnp.clip(action[3], -1.0, 1.0)
        if k_int == 0.0:
            return i_b6 + ae * i_e
        return i_b6 + (_c2i(0.5 * (ae + 1.0), i_e, k_int)
                       + _c2i(-0.5 * (ae - 1.0), -i_e, k_int))

    def dq_to_abc(i_sd, i_sq, c, s):
        i_al = c * i_sd - s * i_sq
        i_be = s * i_sd + c * i_sq
        half_b = np.float32(0.5 * np.sqrt(3.0))
        return (i_al, -0.5 * i_al + half_b * i_be, -0.5 * i_al - half_b * i_be)

    def _currents(core):
        return core[1:4] if mech else core[0:3]

    def _udqe(fracs, u_sup_val, c, s):
        fa, fb, fc, fe = fracs
        ua, ub, uc = fa * u_sup_val, fb * u_sup_val, fc * u_sup_val
        u_al = (2.0 / 3.0) * (ua - 0.5 * (ub + uc))
        u_be = np.float32(1.0 / np.sqrt(3.0)) * (ub - uc)
        return (c * u_al + s * u_be, -s * u_al + c * u_be, fe * u_sup_val)

    def rk4(core, u_d, u_q, u_e, z, dt):
        def axpy(st, k, cc):
            return tuple(si + cc * ki for si, ki in zip(st, k))

        k1 = rhs(core, u_d, u_q, u_e, z)
        k2 = rhs(axpy(core, k1, 0.5 * dt), u_d, u_q, u_e, z)
        k3 = rhs(axpy(core, k2, 0.5 * dt), u_d, u_q, u_e, z)
        k4 = rhs(axpy(core, k3, dt), u_d, u_q, u_e, z)
        return tuple(
            si + (dt / 6.0) * (a1 + 2.0 * (a2 + a3) + a4)
            for si, a1, a2, a3, a4 in zip(core, k1, k2, k3, k4)
        )

    def physics_step(state, action, c, s, z=None, bs=None):
        core, sup_planes = state[:n_core], state[n_core:]
        finite_il = finite and k_int > 0.0
        i_abc = i_e = None
        if sup.needs_i_sup or k_int != 0.0:
            i_sd, i_sq, i_e = _currents(core)
            i_abc = dq_to_abc(i_sd, i_sq, c, s)
        if sup.needs_i_sup:
            # finite B6 + 4QC: previous cycle's switch states feed i_sup
            # (see _dc_family.step_physics)
            i_sup_val = conv_i_sup(action, i_abc, i_e,
                                   bs if finite else None)
        else:
            i_sup_val = None
        u_sup_val, sup_new = sup.supply_u(sup_planes, i_sup_val)

        if finite_il:
            # 2-sub-interval interlock schedule with mid-cycle angle and
            # current refresh (see _sync_family.physics_step)
            cmd = bridge_cmd(action)
            inter = tuple(_interlock_state(b, c2)
                          for b, c2 in zip(bs, cmd))
            flag = inter[0] != cmd[0]
            for b, c2 in zip(inter[1:], cmd[1:]):
                flag = flag | (b != c2)
            f0 = voltage_fracs(action, i_abc, i_e, inter)
            u0 = _udqe(f0, u_sup_val, c, s)
            dt0 = jnp.where(flag, np.float32(t_int), 0.0)
            dt1 = jnp.where(flag, np.float32(tau - t_int),
                            np.float32(tau))
            core_mid = rk4(core, *u0, z, dt0)
            if mech:
                eps_mid = core_mid[i_eps]
                c1, s1 = jnp.cos(eps_mid), jnp.sin(eps_mid)
            else:
                c1 = jnp.where(flag, c * COS_DI - s * SIN_DI, c)
                s1 = jnp.where(flag, s * COS_DI + c * SIN_DI, s)
            i_sd_m, i_sq_m, i_e_m = _currents(core_mid)
            i_abc_m = dq_to_abc(i_sd_m, i_sq_m, c1, s1)
            f1 = voltage_fracs(action, i_abc_m, i_e_m, inter)
            # freeze abc/excitation voltages at interval-0 values for
            # no-interlock envs, then transform with the refreshed angle
            fr = tuple(jnp.where(flag, b, a) for a, b in zip(f0, f1))
            u1 = _udqe(fr, u_sup_val, c1, s1)
            return rk4(core_mid, *u1, z, dt1) + sup_new

        u = _udqe(voltage_fracs(action, i_abc, i_e), u_sup_val, c, s)
        return rk4(core, *u, z, tau) + sup_new

    def reset_state(bits):
        zero = jnp.zeros(shape, jnp.float32)
        core = ((mload.omega_reset(bits),) if mech else ()) + (zero,) * 4
        return core + sup.sup_reset(bits)

    ref_cfg = _ref_configs(env, R,
                           require_wiener=action_mode == "random")
    n_ref = len(ref_cfg)
    n_rows = _ref_n_rows(ref_cfg)
    shape_r = (n_rows * R, LANE)
    rw = env.reward_function
    bias = np.float32(rw._bias_value)
    violation_reward = np.float32(rw._violation_value)

    def ref_quantity(state, j):
        nm = ref_cfg[j]["name"]
        i_sd, i_sq, i_e = (state[1:4] if mech else state[0:3])
        if nm == "omega":
            return state[0] * np.float32(1.0 / w_lim)
        if nm == "torque":
            return torque3(i_sd, i_sq, i_e) * np.float32(1.0 / t_lim)
        q = {"i_sd": i_sd, "i_sq": i_sq, "i_e": i_e}[nm]
        return q * ref_cfg[j]["inv_lim"]

    def _sample_actions(bits):
        if finite:
            b = bits(shape)
            return ((b & jnp.uint32(7)).astype(jnp.int32),
                    ((b >> jnp.uint32(3)) & jnp.uint32(3)).astype(jnp.int32))
        return tuple(2.0 * _uniform_from_bits(bits(shape)) - 1.0
                     for _ in range(4))

    # --- generic record-adapter surface (see ops/pallas_record.py) ---
    state_names = ((("omega",) if mech else ())
                   + ("i_sd", "i_sq", "i_e", "eps") + sup.names)
    act_names = (("action_b6", "action_e") if finite
                 else ("action_a", "action_b", "action_c", "action_e"))
    act_dtype = jnp.int32 if finite else jnp.float32
    n_act = len(act_names)
    inv_ilim = np.float32(1.0 / i_lim)
    inv_ielim = np.float32(1.0 / ie_lim)

    def read_actions(ref, t):
        return tuple(ref[t, j] for j in range(n_act))

    def pre_step(cur):
        return (jnp.cos(cur[i_eps]), jnp.sin(cur[i_eps]))

    rot_init = rot_advance = pre_step_rot = None
    if not mech:
        rot_init, rot_advance = _rotation_protocol(COS_D, SIN_D, i_eps)

        def pre_step_rot(cur, c, s):
            return (c, s)

    def step(cur, acts, aux, z=None, bs=None):
        c, s = aux
        state = physics_step(cur, acts, c, s, z, bs)
        eps = state[i_eps]
        eps = eps - np.float32(TWO_PI) * jnp.floor(
            eps * np.float32(1.0 / TWO_PI))
        return state[:i_eps] + (eps,) + state[i_eps + 1:]

    def violated(state):
        i_sd, i_sq, i_e = (state[1:4] if mech else state[0:3])
        isd_n, isq_n = i_sd * inv_ilim, i_sq * inv_ilim
        ie_n = i_e * inv_ielim
        return (((isd_n * isd_n + isq_n * isq_n) > 1.0)
                | (jnp.abs(ie_n) > 1.0))

    def quantities(state, aux):
        return [ref_quantity(state, j) for j in range(n_ref)]

    return SimpleNamespace(
        n_state=n_state, finite=finite, mech=mech, shape=shape,
        shape_r=shape_r, n_ref=n_ref, n_rows=n_rows, ref_cfg=ref_cfg, bias=bias,
        violation_reward=violation_reward, i_lim=i_lim, ie_lim=ie_lim,
        COS_D=COS_D, SIN_D=SIN_D, physics_step=physics_step,
        ref_quantity=ref_quantity, sample_actions=_sample_actions,
        state_names=state_names, act_names=act_names, act_dtype=act_dtype,
        sample_actions_t=_sample_actions, read_actions=read_actions,
        pre_step=pre_step, step=step, violated=violated,
        quantities=quantities, pre_step_rot=pre_step_rot,
        rot_init=rot_init, rot_advance=rot_advance,
        mech_mode=mech_mode, sup_mode=sup.mode, n_sup=n_sup, n_core=n_core,
        i_eps=i_eps, needs_step_noise=needs_step_noise,
        reset_state=reset_state, n_bridge=n_bridge,
        advance_bridges=advance_bridges,
    )


def make_fused_eesm_family_rollout(env, n_steps, n_envs,
                                   action_mode="random", interpret=False):
    """Universal fused rollout for the externally-excited synchronous
    family — all 6 {Finite,Cont} x {CC,TC,SC} EESM catalog configs.

    Same 3-current dq ODE as ``make_fused_eesm_rollout`` (externally_
    excited_synchronous_motor.py via models/motors.py:451-476) but with
    the converter (finite B6 bits + 4QC table vs cont B6/4QC duties),
    task references (i_sd*/i_sq*/i_e* | torque* | omega*), reward weights
    and the mechanical model read from the env spec.  SC adds the
    polynomial-load mechanical ODE (torque = 1.5 p (l_M i_e i_k_rs +
    (l_d - l_q) i_sd) i_sq, eesm:200-203) and per-step sincos; CC/TC keep
    the incremental Park rotation.

    * random mode: ``rollout(seed, *state0) -> (*states, reward_sum,
      term_count, rv, rk, rl, rs)``; states = (omega?, i_sd, i_sq, i_e,
      eps).
    * buffer mode: ``rollout(*state0, actions) -> states`` with int32
      ``(n_steps, 2, R, LANE)`` (finite: B6, 4QC) or float32
      ``(n_steps, 4, R, LANE)`` (cont duties) action buffers.
    """
    assert n_envs % LANE == 0
    R = n_envs // LANE
    fs = _eesm_family(env, R, action_mode)
    _check_switched_min_envs(fs, R, interpret)
    n_state, finite, mech, shape, shape_r = (
        fs.n_state, fs.finite, fs.mech, fs.shape, fs.shape_r)
    n_ref, ref_cfg = fs.n_ref, fs.ref_cfg
    n_rows = fs.n_rows
    bias, violation_reward = fs.bias, fs.violation_reward
    i_lim, ie_lim = fs.i_lim, fs.ie_lim
    COS_D, SIN_D, i_eps = fs.COS_D, fs.SIN_D, fs.i_eps
    n_bs = fs.n_bridge
    physics_step, ref_quantity = fs.physics_step, fs.ref_quantity
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
        inv_ilim = np.float32(1.0 / i_lim)
        inv_ielim = np.float32(1.0 / ie_lim)

        def body(t, bs):
            action = _sample_actions(bits)
            z = _step_noise(fs.needs_step_noise, bits, shape)
            cur = tuple(o[:] for o in out_state)
            if mech:
                c, s = jnp.cos(cur[i_eps]), jnp.sin(cur[i_eps])
            else:
                c, s = c_ref[:], s_ref[:]
            state = physics_step(cur, action, c, s, z,
                                 bs if n_bs else None)
            eps = state[i_eps]
            eps = eps - np.float32(TWO_PI) * jnp.floor(eps * inv_2pi)
            state = state[:i_eps] + (eps,) + state[i_eps + 1:]

            i_sd, i_sq, i_e = (state[1:4] if mech else state[0:3])
            isd_n, isq_n = i_sd * inv_ilim, i_sq * inv_ilim
            ie_n = i_e * inv_ielim
            violated = (((isd_n * isd_n + isq_n * isq_n) > 1.0)
                        | (jnp.abs(ie_n) > 1.0))

            refs_now = rv_ref[:]
            wse = bias - _wse_err(ref_cfg[0], ref_quantity(state, 0),
                                  refs_now[:R])
            for jj in range(1, n_ref):
                wse = wse - _wse_err(ref_cfg[jj], ref_quantity(state, jj),
                                     refs_now[jj * R:(jj + 1) * R])
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
                         for b in fs.advance_bridges(bs, action))

        init = (tuple(jnp.zeros(shape, jnp.int32) for _ in range(n_bs))
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
                action = tuple(actions_ref[t, k] for k in range(4))
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
            return fs.advance_bridges(bs, action)

        init = (tuple(jnp.zeros(shape, jnp.int32) for _ in range(n_bs))
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


def _dfim_family(env, R, action_mode):
    """Shared DFIM-family closures — consumed by the reducing rollout
    (``make_fused_dfim_family_rollout``) and the generic trajectory
    recorder (``ops.pallas_record``)."""
    ps = env.physical_system
    _fused_check_system(ps)
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
    tau_r = l_r / r_r
    tau_sig = sg * l_s / (r_s + r_r * l_m**2 / l_r**2)
    c_psi = l_m * r_r / (sg * l_s * l_r**2)
    c_w = l_m * p / (sg * l_r * l_s)
    c_u = 1.0 / (sg * l_s)
    c_ur = l_m / (sg * l_r * l_s)
    k_t = 1.5 * p * l_m / l_r

    tau = float(ps.tau)
    i_lim = float(lim[names.index("i_sd")])
    t_lim = float(lim[names.index("torque")])
    w_lim = float(lim[names.index("omega")])
    shape = (R, LANE)

    mload = _make_fused_mech(ps, float(mp["j_rotor"]), shape)
    mech_mode, mech = mload.mode, mload.mech
    needs_step_noise = mload.needs_step_noise
    omega_fixed = mload.omega_fixed
    sup = _make_fused_supply(ps, shape, tau)
    n_sup = sup.n_sup
    COS_D = SIN_D = COS_DI = SIN_DI = None
    if not mech:
        COS_D = np.float32(np.cos(tau * p * omega_fixed))
        SIN_D = np.float32(np.sin(tau * p * omega_fixed))
        COS_DI = np.float32(np.cos(t_int * p * omega_fixed))
        SIN_DI = np.float32(np.sin(t_int * p * omega_fixed))

    def torque(el):
        return k_t * (el[2] * el[1] - el[3] * el[0])

    def el_rhs(w, el, u_sal, u_sbe, u_ral, u_rbe):
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
        def rhs(core, us, z):
            w, el, eps = core[0], core[1:5], core[5]
            dw = mload.mech_rhs(w, torque(el), z)
            return (dw,) + el_rhs(w, el, *us) + (p * w,)
    else:
        def rhs(core, us, z):
            el, eps = core[0:4], core[4]
            return (el_rhs(omega_fixed, el, *us)
                    + (np.float32(p * omega_fixed) + 0.0 * eps,))

    n_core = 6 if mech else 5
    n_state = n_core + n_sup
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

    def rk4(core, us, z, dt):
        def axpy(st, k, cc):
            return tuple(si + cc * ki for si, ki in zip(st, k))

        k1 = rhs(core, us, z)
        k2 = rhs(axpy(core, k1, 0.5 * dt), us, z)
        k3 = rhs(axpy(core, k2, 0.5 * dt), us, z)
        k4 = rhs(axpy(core, k3, dt), us, z)
        return tuple(
            si + (dt / 6.0) * (a1 + 2.0 * (a2 + a3) + a4)
            for si, a1, a2, a3, a4 in zip(core, k1, k2, k3, k4)
        )

    def physics_step(state, action, c, s, z=None, bs=None):
        core, sup_planes = state[:n_core], state[n_core:]
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
        u_sup_val, sup_new = sup.supply_u(sup_planes, i_sup_val)

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
            core_mid = rk4(core, _us_of(f0, u_sup_val, c, s), z, dt0)
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
            return rk4(core_mid, _us_of(fr, u_sup_val, c1, s1), z,
                       dt1) + sup_new

        us = _us_of(voltage_fracs(action, i_s_abc, i_r_abc), u_sup_val,
                    c, s)
        return rk4(core, us, z, tau) + sup_new

    def reset_state(bits):
        zero = jnp.zeros(shape, jnp.float32)
        core = ((mload.omega_reset(bits),) if mech else ()) + (zero,) * 5
        return core + sup.sup_reset(bits)

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
                     for _ in range(6))

    # --- generic record-adapter surface (see ops/pallas_record.py) ---
    state_names = ((("omega",) if mech else ())
                   + ("i_salpha", "i_sbeta", "psi_ralpha", "psi_rbeta",
                      "eps") + sup.names)
    act_names = (("action_stator", "action_rotor") if finite
                 else ("action_sa", "action_sb", "action_sc",
                       "action_ra", "action_rb", "action_rc"))
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

    def violated(state):
        el = state[1:5] if mech else state[0:4]
        # |i_dq| == |i_alphabeta| (rotation-invariant)
        return (el[0] * el[0] + el[1] * el[1]) * inv_ilim2 > 1.0

    def quantities(state, aux):
        cs = aux[0]
        return ref_quantities(state, cs if needs_dq else None)

    return SimpleNamespace(
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
        reset_state=reset_state, n_bridge=n_bridge,
        advance_bridges=advance_bridges,
    )


def make_fused_dfim_family_rollout(env, n_steps, n_envs,
                                   action_mode="random", interpret=False):
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
    fs = _dfim_family(env, R, action_mode)
    _check_switched_min_envs(fs, R, interpret)
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

            el = state[1:5] if mech else state[0:4]
            # |i_dq| == |i_alphabeta| (rotation-invariant)
            violated = (el[0] * el[0] + el[1] * el[1]) * inv_ilim2 > 1.0
            qs = ref_quantities(state, cs)
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
                         for b in fs.advance_bridges(bs, action))

        init = (tuple(jnp.zeros(shape, jnp.int32) for _ in range(n_bs))
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
                action = tuple(actions_ref[t, k] for k in range(6))
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
            return fs.advance_bridges(bs, action)

        init = (tuple(jnp.zeros(shape, jnp.int32) for _ in range(n_bs))
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


def make_fused_foc_rollout(env, ctrl, n_steps, n_envs, ref_mode="wiener",
                           interpret=False):
    """Fused closed-loop FOC rollout for Cont-CC-PMSM-v0: the ENTIRE control
    cycle — tuned PI current controller with EMF decoupling, squared voltage
    clipping with anti-windup, advance-angle dq->abc transform, continuous
    output stage (controllers/controller.py:417-520) — fused with the PMSM
    physics, Wiener current references, WSE reward, squared constraint and
    in-kernel auto-reset.  Round-1 closed-loop baseline (XLA path): 224M
    controlled env-steps/s.

    ``ctrl`` must be ``GemController.make(env, "Cont-CC-PMSM-v0")``; its
    tuned gains are baked into the kernel.

    ``ref_mode='const'``: ``rollout(seed, isd0, isq0, eps0, ref_d, ref_q)``
    holds the (normalized) references fixed at the given planes — the
    closed loop is then deterministic and is compared step-for-step against
    ``ctrl.control_environment`` in tests/test_pallas_rollout.py.
    """
    assert n_envs % LANE == 0
    assert ctrl.control_task == "CC" and ctrl.output_kind == "cont"
    R = n_envs // LANE
    ps = env.physical_system
    _fused_check_system(ps)
    mp = ps.motor.parameter
    names = list(ps.state_names)
    lim = np.asarray(ps.limits)

    # physics constants (as in make_fused_pmsm_rollout)
    r_s, l_d, l_q = float(mp["r_s"]), float(mp["l_d"]), float(mp["l_q"])
    psi_p, p = float(mp["psi_p"]), float(mp["p"])
    omega = float(_fused_load(ps, ("ConstantSpeedLoad",)).omega_fixed)
    tau = float(ps.tau)
    u_half = 0.5 * _fused_u_sup(ps)
    i_lim = float(lim[names.index("i_sd")])
    margin = float(ps.nominal_state[names.index("i_sd")] / i_lim)
    w_over_span = 0.5 / 2.0
    violation_reward = -1.0 / (1.0 - 0.9)
    p_omega = p * omega

    # tuned controller constants (GemController.make)
    cc_p_d, cc_p_q = (float(x) for x in ctrl.cc_p_gain)
    cc_i_d, cc_i_q = (float(x) for x in ctrl.cc_i_gain)
    clip_d, clip_q = (float(x) for x in np.asarray(ctrl.cc_clip_limits))
    # classic EMF feedforward: u += (l_emf * i[emf_idx] + psi_emf) * omega_el
    # (emf_current_idx = (i_sq, i_sd) for the PMSM)
    l_emf_d, l_emf_q = (float(x) for x in ctrl.l_emf)
    psi_emf_d, psi_emf_q = (float(x) for x in ctrl.psi_emf)
    omega_el = omega * float(ctrl.pole_pairs)
    ref_lim_d, ref_lim_q = (float(x) for x in ctrl.ref_limits)
    out_lim = float(np.asarray(ctrl.output_limits)[0])
    # advance angle uses the MECHANICAL omega (controller.py:452-454)
    adv_dt = float(ctrl.advance_factor) * tau * omega
    # constant-increment rotor-angle rotation + constant advance rotation
    COS_D = np.float32(np.cos(tau * p_omega))
    SIN_D = np.float32(np.sin(tau * p_omega))
    COS_A = np.float32(np.cos(adv_dt))
    SIN_A = np.float32(np.sin(adv_dt))

    shape = (R, LANE)
    shape2 = (2 * R, LANE)
    LN10 = np.float32(np.log(10.0))
    wiener = ref_mode == "wiener"

    def rhs(i_sd, i_sq, u_d, u_q):
        di_sd = (-r_s * i_sd + l_q * p_omega * i_sq + u_d) * (1.0 / l_d)
        di_sq = (-psi_p * p_omega - r_s * i_sq - l_d * p_omega * i_sd + u_q) * (1.0 / l_q)
        return di_sd, di_sq

    def _cycle(i_sd, i_sq, eps, ce, se, integ_d, integ_q, ref_d_n, ref_q_n):
        """One full FOC control cycle: controller then physics."""
        # ---- controller (denormalized quantities)
        err_d = ref_d_n * ref_lim_d - i_sd
        err_q = ref_q_n * ref_lim_q - i_sq
        u_d = cc_p_d * err_d + cc_i_d * integ_d
        u_q = cc_p_q * err_q + cc_i_q * integ_q
        # EMF decoupling (classic): indices swap d<->q currents
        u_d = u_d + (l_emf_d * i_sq + psi_emf_d) * omega_el
        u_q = u_q + (l_emf_q * i_sd + psi_emf_q) * omega_el
        # squared clipping + anti-windup on the integrators
        rel = (u_d / clip_d) ** 2 + (u_q / clip_q) ** 2
        not_clipped = rel < 1.0
        integ_d = integ_d + tau * err_d * not_clipped
        integ_q = integ_q + tau * err_q * not_clipped
        # advance-angle dq->abc on the UNCLIPPED voltage (reference quirk,
        # pi_current_controller.py:160-167); cos/sin(eps + adv_dt) come from
        # the tracked rotation state rotated by the constant advance angle
        c = ce * COS_A - se * SIN_A
        s = se * COS_A + ce * SIN_A
        u_al = c * u_d - s * u_q
        u_be = s * u_d + c * u_q
        ua = u_al
        ub = -0.5 * u_al + np.float32(np.sqrt(3.0) / 2.0) * u_be
        uc = -0.5 * u_al - np.float32(np.sqrt(3.0) / 2.0) * u_be
        # cont output stage + converter: u_phase = clip(u/out_lim) * u_sup/2
        ua = jnp.clip(ua * (1.0 / out_lim), -1.0, 1.0) * u_half
        ub = jnp.clip(ub * (1.0 / out_lim), -1.0, 1.0) * u_half
        uc = jnp.clip(uc * (1.0 / out_lim), -1.0, 1.0) * u_half

        # ---- physics (Park at the cycle-start rotor angle + RK4)
        u_alpha = (2.0 / 3.0) * (ua - 0.5 * (ub + uc))
        u_beta = np.float32(1.0 / np.sqrt(3.0)) * (ub - uc)
        pu_d = ce * u_alpha + se * u_beta
        pu_q = -se * u_alpha + ce * u_beta
        k1 = rhs(i_sd, i_sq, pu_d, pu_q)
        k2 = rhs(i_sd + 0.5 * tau * k1[0], i_sq + 0.5 * tau * k1[1], pu_d, pu_q)
        k3 = rhs(i_sd + 0.5 * tau * k2[0], i_sq + 0.5 * tau * k2[1], pu_d, pu_q)
        k4 = rhs(i_sd + tau * k3[0], i_sq + tau * k3[1], pu_d, pu_q)
        sixth = tau / 6.0
        return (i_sd + sixth * (k1[0] + 2.0 * (k2[0] + k3[0]) + k4[0]),
                i_sq + sixth * (k1[1] + 2.0 * (k2[1] + k3[1]) + k4[1]),
                eps + tau * p_omega, integ_d, integ_q)

    def kernel(seed_ref, isd_ref, isq_ref, eps_ref, rd_ref, rq_ref,
               out_isd, out_isq, out_eps, out_reward, out_terms,
               out_rv, out_rk, out_rl, out_rs,
               rv_ref, rk_ref, rl_ref, rs_ref, rng_ref, igd_ref, igq_ref,
               c_ref, s_ref):
        seed, bits = _make_rng(interpret, rng_ref)
        seed(seed_ref[0])
        out_isd[:] = isd_ref[:]
        out_isq[:] = isq_ref[:]
        out_eps[:] = eps_ref[:]
        c_ref[:] = jnp.cos(eps_ref[:])
        s_ref[:] = jnp.sin(eps_ref[:])
        out_reward[:] = jnp.zeros(shape, jnp.float32)
        out_terms[:] = jnp.zeros(shape, jnp.float32)
        igd_ref[:] = jnp.zeros(shape, jnp.float32)
        igq_ref[:] = jnp.zeros(shape, jnp.float32)

        def _draw_params(mask):
            u1 = _uniform_from_bits(bits(shape2))
            u2 = _uniform_from_bits(bits(shape2))
            rl_ref[:] = jnp.where(mask, jnp.floor(500.0 + 1500.0 * u1), rl_ref[:])
            rs_ref[:] = jnp.where(mask, jnp.exp(LN10 * (-3.0 + 2.0 * u2)), rs_ref[:])

        if wiener:
            u = _uniform_from_bits(bits(shape2))
            rv_ref[:] = (2.0 * u - 1.0) * margin
            rk_ref[:] = jnp.zeros(shape2, jnp.float32)
            _draw_params(jnp.ones(shape2, dtype=jnp.bool_))
        else:
            rv_ref[:] = jnp.concatenate([rd_ref[:], rq_ref[:]], axis=0)
            rk_ref[:] = jnp.zeros(shape2, jnp.float32)
            rl_ref[:] = jnp.full(shape2, 1e9, jnp.float32)
            rs_ref[:] = jnp.zeros(shape2, jnp.float32)

        def body(t, _):
            refs = rv_ref[:]
            c, se_ = c_ref[:], s_ref[:]
            i_sd, i_sq, eps, igd, igq = _cycle(
                out_isd[:], out_isq[:], out_eps[:], c, se_,
                igd_ref[:], igq_ref[:], refs[:R], refs[R:])
            eps = eps - np.float32(TWO_PI) * jnp.floor(eps * np.float32(1.0 / TWO_PI))
            c_new = c * COS_D - se_ * SIN_D
            s_new = se_ * COS_D + c * SIN_D
            inv_cs = jax.lax.rsqrt(c_new * c_new + s_new * s_new)
            c_new = c_new * inv_cs
            s_new = s_new * inv_cs
            igd_ref[:] = igd
            igq_ref[:] = igq

            isd_n = i_sd * (1.0 / i_lim)
            isq_n = i_sq * (1.0 / i_lim)
            violated = (isd_n * isd_n + isq_n * isq_n) > 1.0
            wse = -(w_over_span * jnp.abs(isd_n - refs[:R])
                    + w_over_span * jnp.abs(isq_n - refs[R:]))
            reward = jnp.where(violated, violation_reward, wse)
            out_reward[:] = out_reward[:] + reward
            out_terms[:] = out_terms[:] + violated.astype(jnp.float32)

            zero = jnp.zeros(shape, jnp.float32)
            out_isd[:] = jnp.where(violated, zero, i_sd)
            out_isq[:] = jnp.where(violated, zero, i_sq)
            out_eps[:] = jnp.where(violated, zero, eps)
            c_ref[:] = jnp.where(violated, jnp.ones(shape, jnp.float32), c_new)
            s_ref[:] = jnp.where(violated, zero, s_new)
            # env auto-reset does NOT reset the controller state
            # (control_environment carries cs across episode boundaries)

            if wiener:
                # concat float masks, not bools: Mosaic rejects the i1 vreg
                # cast the bool concat needs when R is not a multiple of the
                # sublane count (small-batch kernels)
                viol_f = violated.astype(jnp.float32)
                reset2 = jnp.concatenate([viol_f, viol_f], axis=0) > 0.5
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

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = (tuple(jax.ShapeDtypeStruct(shape, jnp.float32) for _ in range(5))
                  + tuple(jax.ShapeDtypeStruct(shape2, jnp.float32) for _ in range(4)))

    @jax.jit
    def rollout(seed, isd0, isq0, eps0, ref_d=None, ref_q=None):
        z = jnp.zeros(shape, jnp.float32)
        ref_d = z if ref_d is None else ref_d
        ref_q = z if ref_q is None else ref_q
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem] * 5,
            out_specs=tuple(vmem for _ in range(9)),
            scratch_shapes=(
                [pltpu.VMEM(shape2, jnp.float32) for _ in range(4)]
                + [pltpu.VMEM(shape2, jnp.uint32)]
                + [pltpu.VMEM(shape, jnp.float32) for _ in range(4)]
            ),
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32), isd0, isq0, eps0, ref_d, ref_q)

    return rollout


def make_fused_dc_cascade_rollout(env, ctrl, n_steps, n_envs,
                                  interpret=False):
    """Fused closed-loop SPEED-CONTROL cascade for the DC motors: the whole
    auto-tuned three-stage chain — PI speed controller with torque clipping
    and anti-windup (pi_speed_controller.py:102-121), analytic
    operation-point selection (permex/series/shunt_dc_ops.py), current
    clipping, PI current controller with EMF feedforward, voltage clipping
    with anti-windup and the continuous output stage — runs in-kernel
    against the family physics (PolynomialStaticLoad mechanics + motor ODE
    via ``_dc_family``), with the env's reference process, WSE reward,
    limit constraint and in-kernel auto-reset.  The controller state
    (speed/current integrators) persists across episode resets, exactly as
    ``control_environment`` carries ``cs`` (controller.py:685-693).

    ``ctrl`` must be ``GemController.make(env, "Cont-SC-<motor>-v0")``.
    Build the env with a ``ConstReference('omega', v)`` for the
    deterministic validation path (the const reference pins the in-kernel
    stream, so the closed loop matches ``ctrl.control_environment``
    step-for-step while no violation occurs).

    ``rollout(seed, *state0) -> (*states, reward_sum, term_count, rv, rk,
    rl, rs, sc_int, cc_int)``; states = (omega, i...) like the family
    kernel.
    """
    assert ctrl.control_task == "SC" and ctrl.output_kind == "cont"
    kind = env.physical_system.motor.kind
    assert kind in ("PermExDc", "SeriesDc", "ShuntDc"), (
        f"in-kernel DC cascade covers PermExDc/SeriesDc/ShuntDc; got "
        f"{kind!r} (ExtExDc's dual-channel flux-weakening cascade runs on "
        f"the XLA path)")
    assert n_envs % LANE == 0
    R = n_envs // LANE
    fs = _dc_family(env, R, "random")
    assert fs.mech and fs.n_ch == 1 and not fs.finite and fs.n_ref == 1
    assert fs.mech_mode == "poly" and fs.sup_mode == "ideal", (
        "the DC cascade kernel implements the default SC configuration "
        "(polynomial load, ideal supply)")
    n_state, shape, shape_r = fs.n_state, fs.shape, fs.shape_r
    ref_cfg, bias, violation_reward = fs.ref_cfg, fs.bias, fs.violation_reward
    assert ref_cfg[0]["name"] == "omega"
    has_wf = _ref_needs_wf(ref_cfg)
    tau = np.float32(env.physical_system.tau)

    # ---- tuned cascade constants (GemController.make) ----
    names = list(env.physical_system.state_names)
    state_pos = {nm: k for k, nm in enumerate(fs.state_names)}
    sc_p, sc_i = np.float32(ctrl.sc_p_gain[0]), np.float32(ctrl.sc_i_gain[0])
    sc_lo = np.float32(np.asarray(ctrl.sc_clip_range[0])[0])
    sc_hi = np.float32(np.asarray(ctrl.sc_clip_range[1])[0])
    tc_lims = np.asarray(ctrl.tc_clip_limits, dtype=np.float64)
    tc_lo, tc_hi = np.float32(tc_lims[0].min()), np.float32(tc_lims[1].max())
    cc_p, cc_i = np.float32(ctrl.cc_p_gain[0]), np.float32(ctrl.cc_i_gain[0])
    cc_lims = np.asarray(ctrl.cc_clip_limits, dtype=np.float64)
    cc_lo, cc_hi = np.float32(cc_lims[0].min()), np.float32(cc_lims[1].max())
    inv_out = np.float32(1.0 / np.asarray(ctrl.output_limits)[0])
    ref_lim = np.float32(np.asarray(ctrl.ref_limits)[0])
    ci_pos = state_pos[names[int(np.asarray(ctrl.current_idx)[0])]]
    emf_pos = state_pos[names[int(np.asarray(ctrl.emf_current_idx)[0])]]
    l_emf = np.float32(np.asarray(ctrl.l_emf)[0])
    psi_emf = np.float32(np.asarray(ctrl.psi_emf)[0])
    p_ff = np.float32(ctrl.pole_pairs)
    ops = ctrl.ops_kind
    op = ctrl.ops_params
    if ops == "permex":
        inv_psi = np.float32(1.0 / op["psi"])
    elif ops == "series":
        inv_lp = np.float32(1.0 / op["l_prime"])
    else:  # shunt (shunt_dc_ops.py semantics, see controllers/controller.py)
        inv_lp = np.float32(1.0 / op["l_prime"])
        ie_pos = state_pos[names[int(op["i_e_idx"])]]
        ie_limit = np.float32(op["i_e_limit"])
        ia_limit = np.float32(op["i_a_limit"])

    def cascade(cur, sc_int, cc_int, ref_n):
        omega = cur[0]
        err = ref_n * ref_lim - omega
        t_ref = sc_p * err + sc_i * sc_int
        t_c = jnp.clip(t_ref, sc_lo, sc_hi)
        sc_int = sc_int + tau * err * (t_ref == t_c)
        if ops == "permex":
            i_ref = t_c * inv_psi
        elif ops == "series":
            i_ref = jnp.sqrt(jnp.maximum(t_c, 0.0) * inv_lp)
        else:
            i_e = cur[ie_pos]
            i_e_safe = jnp.where(jnp.abs(i_e) < 1e-4,
                                 jnp.sign(i_e) * 1e-4 + (i_e == 0) * 1e-4,
                                 i_e)
            i_ref = t_c * inv_lp / i_e_safe
            i_ref = jnp.where(i_e > ie_limit, -ia_limit, i_ref)
            i_ref = jnp.where(i_e < -ie_limit, ia_limit, i_ref)
        i_ref = jnp.clip(i_ref, tc_lo, tc_hi)
        err_i = i_ref - cur[ci_pos]
        u = cc_p * err_i + cc_i * cc_int
        u = u + (l_emf * cur[emf_pos] + psi_emf) * (omega * p_ff)
        u_c = jnp.clip(u, cc_lo, cc_hi)
        cc_int = cc_int + tau * err_i * (u == u_c)
        # cont output stage emits the UNCLIPPED normalized voltage
        # (cont_output_stage.py:23-24); the converter clips the duty
        return u * inv_out, sc_int, cc_int

    def kernel(seed_ref, *refs):
        state0 = refs[:n_state]
        out_state = refs[n_state: 2 * n_state]
        (out_reward, out_terms, out_rv, out_rk, out_rl, out_rs,
         out_sci, out_cci) = refs[2 * n_state: 2 * n_state + 8]
        scratch = refs[2 * n_state + 8:]
        rv_ref, rk_ref, rl_ref, rs_ref, rng_ref = scratch[:5]
        za_ref, zb_ref = scratch[5], scratch[6]
        sci_ref, cci_ref = scratch[7], scratch[8]
        wf_ref = scratch[-1] if has_wf else None
        seed, bits = _make_rng(interpret, rng_ref)
        seed(seed_ref[0])
        for o, s in zip(out_state, state0):
            o[:] = s[:]
        out_reward[:] = jnp.zeros(shape, jnp.float32)
        out_terms[:] = jnp.zeros(shape, jnp.float32)
        sci_ref[:] = jnp.zeros(shape, jnp.float32)
        cci_ref[:] = jnp.zeros(shape, jnp.float32)

        w_init, w_advance = _make_wiener(bits, ref_cfg, R, shape, shape_r,
                                         rv_ref, rk_ref, rl_ref, rs_ref,
                                         za_ref, zb_ref, wf_ref)
        w_init()

        def body(t, _):
            cur = tuple(o[:] for o in out_state)
            refs_now = rv_ref[:]
            action, sci, cci = cascade(cur, sci_ref[:], cci_ref[:],
                                       refs_now[:R])
            # the integrators persist across env auto-resets
            # (control_environment carries cs through episode boundaries)
            sci_ref[:] = sci
            cci_ref[:] = cci
            state = fs.step_physics(cur, (action,))

            violated = fs.violated(state)
            wse = bias - _wse_err(ref_cfg[0], fs.ref_quantity(state, 0),
                                  refs_now[:R])
            reward = jnp.where(violated, violation_reward, wse)
            out_reward[:] = out_reward[:] + reward
            out_terms[:] = out_terms[:] + violated.astype(jnp.float32)
            zero = jnp.zeros(shape, jnp.float32)
            for o, s2 in zip(out_state, state):
                o[:] = jnp.where(violated, zero, s2)

            w_advance(t, violated)
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)
        out_rv[:] = rv_ref[:]
        out_rk[:] = rk_ref[:]
        out_rl[:] = rl_ref[:]
        out_rs[:] = rs_ref[:]
        out_sci[:] = sci_ref[:]
        out_cci[:] = cci_ref[:]

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = (tuple(jax.ShapeDtypeStruct(shape, jnp.float32)
                        for _ in range(n_state + 2))
                  + tuple(jax.ShapeDtypeStruct(shape_r, jnp.float32)
                          for _ in range(4))
                  + tuple(jax.ShapeDtypeStruct(shape, jnp.float32)
                          for _ in range(2)))
    scratch_shapes = (
        [pltpu.VMEM(shape_r, jnp.float32) for _ in range(4)]
        + [pltpu.VMEM(shape_r, jnp.uint32)]
        + [pltpu.VMEM(shape, jnp.float32) for _ in range(2)]   # za/zb
        + [pltpu.VMEM(shape, jnp.float32) for _ in range(2)]   # integrators
        + ([pltpu.VMEM((4 * R, LANE), jnp.float32)] if has_wf else [])
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


def _policy_pmsm_ctx(env):
    """Shared PMSM physics/reward constants + step closures for the
    policy-in-the-loop kernels (reducing evaluation, trajectory recording,
    in-kernel REINFORCE) — ONE definition so collection, evaluation and
    training kernels cannot diverge (the same convention as
    _PmsmCtx/_PermExCtx for the plain rollout/record pair)."""
    ps = env.physical_system
    _fused_check_system(ps)
    mp = ps.motor.parameter
    names = list(ps.state_names)
    lim = np.asarray(ps.limits)

    r_s, l_d, l_q = float(mp["r_s"]), float(mp["l_d"]), float(mp["l_q"])
    psi_p, p = float(mp["psi_p"]), float(mp["p"])
    omega = float(_fused_load(ps, ("ConstantSpeedLoad",)).omega_fixed)
    tau = float(ps.tau)
    u_sup = _fused_u_sup(ps)
    i_lim = float(lim[names.index("i_sd")])
    p_omega = p * omega

    def rhs(i_sd, i_sq, u_d, u_q):
        di_sd = (-r_s * i_sd + l_q * p_omega * i_sq + u_d) * (1.0 / l_d)
        di_sq = (-psi_p * p_omega - r_s * i_sq - l_d * p_omega * i_sd
                 + u_q) * (1.0 / l_q)
        return di_sd, di_sq

    def physics_cs(i_sd, i_sq, eps, c, s, action):
        ua = (((action >> 2) & 1).astype(jnp.float32) - 0.5) * u_sup
        ub = (((action >> 1) & 1).astype(jnp.float32) - 0.5) * u_sup
        uc = ((action & 1).astype(jnp.float32) - 0.5) * u_sup
        u_al = (2.0 / 3.0) * (ua - 0.5 * (ub + uc))
        u_be = np.float32(1.0 / np.sqrt(3.0)) * (ub - uc)
        u_d = c * u_al + s * u_be
        u_q = -s * u_al + c * u_be
        k1 = rhs(i_sd, i_sq, u_d, u_q)
        k2 = rhs(i_sd + 0.5 * tau * k1[0], i_sq + 0.5 * tau * k1[1],
                 u_d, u_q)
        k3 = rhs(i_sd + 0.5 * tau * k2[0], i_sq + 0.5 * tau * k2[1],
                 u_d, u_q)
        k4 = rhs(i_sd + tau * k3[0], i_sq + tau * k3[1], u_d, u_q)
        sixth = tau / 6.0
        return (i_sd + sixth * (k1[0] + 2.0 * (k2[0] + k3[0]) + k4[0]),
                i_sq + sixth * (k1[1] + 2.0 * (k2[1] + k3[1]) + k4[1]),
                eps + tau * p_omega)

    return SimpleNamespace(
        rhs=rhs, physics_cs=physics_cs, tau=tau, u_sup=u_sup,
        i_lim=i_lim, p_omega=p_omega,
        omega_n=omega / float(lim[names.index("omega")]),
        eps_lim=float(lim[names.index("epsilon")]),  # pi
        margin=float(ps.nominal_state[names.index("i_sd")] / i_lim),
        w_over_span=0.5 / 2.0,
        violation_reward=-1.0 / (1.0 - 0.9),
        COS_D=np.float32(np.cos(tau * p_omega)),
        SIN_D=np.float32(np.sin(tau * p_omega)),
    )


def make_fused_policy_rollout(env, n_steps, n_envs, hidden=16,
                              sample="categorical", ref_mode="wiener",
                              interpret=False):
    """Fused POLICY-in-the-loop rollout for Finite-CC-PMSM-v0: a 2-layer
    tanh MLP (the ``parallel/sharded.py`` policy architecture) is evaluated
    inside the kernel each step, its sampled discrete action drives the B6
    converter, and physics/references/reward/reset run as in
    ``make_fused_pmsm_rollout`` — RL evaluation & data collection at fused
    speed instead of the XLA path.

    ``env`` must use ``state_filter=("omega", "i_sd", "i_sq", "epsilon")``
    so the 6-feature observation (4 filtered states + 2 current references)
    is reconstructible from the kernel state.

    Returns ``rollout(seed, w1, b1, w2, b2, i_sd0, i_sq0, eps0)`` with
    ``w1 (6*hidden,)``, ``b1 (hidden,)``, ``w2 (hidden*8,)``, ``b2 (8,)``
    flat float32 param vectors (``flatten_policy_params`` converts the
    training dict).  ``sample='greedy'`` takes argmax actions — fully
    deterministic, used for step-for-step validation vs the XLA env.
    """
    assert n_envs % LANE == 0
    assert tuple(env.state_names[i] for i in
                 np.asarray(env._state_filter)) == ("omega", "i_sd", "i_sq",
                                                    "epsilon"), \
        "build the env with state_filter=('omega','i_sd','i_sq','epsilon')"
    R = n_envs // LANE
    ctx = _policy_pmsm_ctx(env)
    physics_cs, i_lim, omega_n = ctx.physics_cs, ctx.i_lim, ctx.omega_n
    eps_lim, margin = ctx.eps_lim, ctx.margin
    w_over_span, violation_reward = ctx.w_over_span, ctx.violation_reward
    COS_D, SIN_D = ctx.COS_D, ctx.SIN_D
    F, H, A = 6, hidden, 8
    shape = (R, LANE)
    shape2 = (2 * R, LANE)
    LN10 = np.float32(np.log(10.0))
    greedy = sample == "greedy"
    wiener = ref_mode == "wiener"

    def kernel(seed_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               isd_ref, isq_ref, eps_ref, rd_ref, rq_ref,
               out_isd, out_isq, out_eps, out_reward, out_terms,
               rv_ref, rk_ref, rl_ref, rs_ref, rng_ref, c_ref, s_ref):
        seed, bits = _make_rng(interpret, rng_ref)
        seed(seed_ref[0])
        out_isd[:] = isd_ref[:]
        out_isq[:] = isq_ref[:]
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

        if wiener:
            u = _uniform_from_bits(bits(shape2))
            rv_ref[:] = (2.0 * u - 1.0) * margin
            rk_ref[:] = jnp.zeros(shape2, jnp.float32)
            _draw_params(jnp.ones(shape2, dtype=jnp.bool_))
        else:
            rv_ref[:] = jnp.concatenate([rd_ref[:], rq_ref[:]], axis=0)
            rk_ref[:] = jnp.zeros(shape2, jnp.float32)
            rl_ref[:] = jnp.full(shape2, 1e9, jnp.float32)
            rs_ref[:] = jnp.zeros(shape2, jnp.float32)

        def body(t, _):
            i_sd, i_sq, eps = out_isd[:], out_isq[:], out_eps[:]
            refs = rv_ref[:]

            # ---- observation (normalized, matching the XLA env's
            #      state_filter + reference concat order)
            eps_w = eps - np.float32(TWO_PI) * jnp.floor(eps * np.float32(1.0 / TWO_PI))
            eps_w = jnp.where(eps_w > np.float32(np.pi),
                              eps_w - np.float32(TWO_PI), eps_w)
            obs = (jnp.full(shape, omega_n, jnp.float32),
                   i_sd * (1.0 / i_lim), i_sq * (1.0 / i_lim),
                   eps_w * (1.0 / eps_lim), refs[:R], refs[R:])

            # ---- 2-layer tanh MLP, weights as SMEM scalars
            hs = []
            for j in range(H):
                acc = b1_ref[j]
                for f in range(F):
                    acc = acc + w1_ref[f * H + j] * obs[f]
                hs.append(jnp.tanh(acc))
            # ---- logits + action over 8 levels.  Greedy: plain argmax.
            # Stochastic: inverse-CDF categorical sampling over the softmax
            # (8 exps + 1 uniform) instead of Gumbel-max (16 logs)
            logits = []
            for a in range(A):
                logit = b2_ref[a]
                for j in range(H):
                    logit = logit + w2_ref[j * A + a] * hs[j]
                logits.append(logit)
            if greedy:
                best_logit = logits[0]
                action = jnp.zeros(shape, jnp.int32)
                for a in range(1, A):
                    take = logits[a] > best_logit
                    best_logit = jnp.where(take, logits[a], best_logit)
                    action = jnp.where(take, a, action)
            else:
                m = logits[0]
                for a in range(1, A):
                    m = jnp.maximum(m, logits[a])
                es = [jnp.exp(l - m) for l in logits]
                total = es[0]
                for a in range(1, A):
                    total = total + es[a]
                uu = _uniform_from_bits(bits(shape)) * total
                cum = es[0]
                action = jnp.zeros(shape, jnp.int32)
                for a in range(1, A):
                    action = jnp.where(uu >= cum, a, action)
                    cum = cum + es[a]

            c, se_ = c_ref[:], s_ref[:]
            i_sd, i_sq, eps = physics_cs(i_sd, i_sq, eps, c, se_, action)
            eps = eps - np.float32(TWO_PI) * jnp.floor(eps * np.float32(1.0 / TWO_PI))
            c_new = c * COS_D - se_ * SIN_D
            s_new = se_ * COS_D + c * SIN_D
            inv_cs = jax.lax.rsqrt(c_new * c_new + s_new * s_new)
            c_new = c_new * inv_cs
            s_new = s_new * inv_cs

            isd_n = i_sd * (1.0 / i_lim)
            isq_n = i_sq * (1.0 / i_lim)
            violated = (isd_n * isd_n + isq_n * isq_n) > 1.0
            wse = -(w_over_span * jnp.abs(isd_n - refs[:R])
                    + w_over_span * jnp.abs(isq_n - refs[R:]))
            reward = jnp.where(violated, violation_reward, wse)
            out_reward[:] = out_reward[:] + reward
            out_terms[:] = out_terms[:] + violated.astype(jnp.float32)

            zero = jnp.zeros(shape, jnp.float32)
            out_isd[:] = jnp.where(violated, zero, i_sd)
            out_isq[:] = jnp.where(violated, zero, i_sq)
            out_eps[:] = jnp.where(violated, zero, eps)
            c_ref[:] = jnp.where(violated, jnp.ones(shape, jnp.float32), c_new)
            s_ref[:] = jnp.where(violated, zero, s_new)

            if wiener:
                # concat float masks, not bools: Mosaic rejects the i1 vreg
                # cast the bool concat needs when R is not a multiple of the
                # sublane count (small-batch kernels)
                viol_f = violated.astype(jnp.float32)
                reset2 = jnp.concatenate([viol_f, viol_f], axis=0) > 0.5
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

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shapes = tuple(jax.ShapeDtypeStruct(shape, jnp.float32) for _ in range(5))

    @jax.jit
    def rollout(seed, w1, b1, w2, b2, isd0, isq0, eps0,
                ref_d=None, ref_q=None):
        z = jnp.zeros(shape, jnp.float32)
        ref_d = z if ref_d is None else ref_d
        ref_q = z if ref_q is None else ref_q
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[smem] * 5 + [vmem] * 5,
            out_specs=tuple(vmem for _ in range(5)),
            scratch_shapes=(
                [pltpu.VMEM(shape2, jnp.float32) for _ in range(4)]
                + [pltpu.VMEM(shape2, jnp.uint32)]
                + [pltpu.VMEM(shape, jnp.float32) for _ in range(2)]
            ),
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32),
          jnp.asarray(w1, jnp.float32), jnp.asarray(b1, jnp.float32),
          jnp.asarray(w2, jnp.float32), jnp.asarray(b2, jnp.float32),
          isd0, isq0, eps0, ref_d, ref_q)

    return rollout


def make_fused_policy_record_rollout(env, n_steps, n_envs, hidden=16,
                                     chunk=None, interpret=False):
    """Fused POLICY-in-the-loop TRAJECTORY RECORDER for Finite-CC-PMSM-v0 —
    the on-policy data-collection engine behind
    ``parallel.sharded.make_fused_ppo_trainer``.

    Per step, the same 2-layer tanh MLP as ``make_fused_policy_rollout``
    picks a categorical action in-kernel, physics/references/reward/reset
    run fused, and the transition signals stream to HBM through the
    chunked-grid recorder recipe (``ops.pallas_record``): post-step
    ``(i_sd, i_sq, eps)``, the pre-advance references ``(ref_d, ref_q)``
    (exactly what the policy observed this step), the sampled ``action``,
    ``reward`` and ``done``.

    The policy observation is 7-dimensional: ``(omega_n, i_sd/l, i_sq/l,
    cos(eps), sin(eps), ref_d, ref_q)`` — the rotor angle enters through
    cos/sin exactly like the reference's ``CosSinProcessor`` RL setup
    (cos_sin_processor.py:7-89; raw wrapped eps is a discontinuous feature
    an MLP handles poorly), and the two features are free in-kernel (the
    incremental Park rotation scratch already holds them).  It is
    reconstructible on the XLA side from ``(i_sd[t-1], i_sq[t-1],
    eps[t-1], ref_d[t], ref_q[t])`` with the launch's initial state at
    t = 0 — behavior log-probs and values recompute from the collecting
    parameters (cos/sin of the recorded eps matches the renormalized
    rotation scratch to ~1 ulp), so nothing else needs recording.

    Returns ``rollout(seed, w1, b1, w2, b2, isd0, isq0, eps0) -> dict`` of
    ``(n_steps, R, LANE)`` arrays keyed by ``rollout.signals``; float32
    except the int32 action.  ``w1`` is the flat (7*hidden,) first-layer
    matrix.  ``env`` must use
    ``state_filter=('omega', 'i_sd', 'i_sq', 'epsilon')``.
    """
    assert n_envs % LANE == 0
    assert tuple(env.state_names[i] for i in
                 np.asarray(env._state_filter)) == ("omega", "i_sd", "i_sq",
                                                    "epsilon"), \
        "build the env with state_filter=('omega','i_sd','i_sq','epsilon')"
    R = n_envs // LANE
    ctx = _policy_pmsm_ctx(env)
    physics_cs, i_lim, omega_n = ctx.physics_cs, ctx.i_lim, ctx.omega_n
    margin, w_over_span = ctx.margin, ctx.w_over_span
    violation_reward = ctx.violation_reward
    COS_D, SIN_D = ctx.COS_D, ctx.SIN_D
    F, H, A = 7, hidden, 8
    shape = (R, LANE)
    shape2 = (2 * R, LANE)
    LN10 = np.float32(np.log(10.0))

    names_out = ("i_sd", "i_sq", "eps", "ref_d", "ref_q", "action",
                 "reward", "done")
    n_sig = len(names_out)
    from .pallas_record import _pick_chunk
    chunk = _pick_chunk(n_steps, n_sig, R, chunk)
    n_chunks = n_steps // chunk

    def kernel(seed_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               isd0_ref, isq0_ref, eps0_ref,
               out_isd, out_isq, out_eps, out_rd, out_rq, out_act,
               out_reward, out_done,
               isd_s, isq_s, eps_s, rv_ref, rk_ref, rl_ref, rs_ref,
               rng_ref, c_ref, s_ref):
        pid = pl.program_id(0)
        seed, bits = _make_rng(interpret, rng_ref)
        # per-chunk reseed, n_chunks stride (see ops/pallas_record.py)
        seed(seed_ref[0] * n_chunks + pid)

        def _draw_params(mask):
            u1 = _uniform_from_bits(bits(shape2))
            u2 = _uniform_from_bits(bits(shape2))
            rl_ref[:] = jnp.where(mask, jnp.floor(500.0 + 1500.0 * u1),
                                  rl_ref[:])
            rs_ref[:] = jnp.where(mask, jnp.exp(LN10 * (-3.0 + 2.0 * u2)),
                                  rs_ref[:])

        @pl.when(pid == 0)
        def _():
            isd_s[:] = isd0_ref[:]
            isq_s[:] = isq0_ref[:]
            eps_s[:] = eps0_ref[:]
            c_ref[:] = jnp.cos(eps0_ref[:])
            s_ref[:] = jnp.sin(eps0_ref[:])
            u = _uniform_from_bits(bits(shape2))
            rv_ref[:] = (2.0 * u - 1.0) * margin
            rk_ref[:] = jnp.zeros(shape2, jnp.float32)
            _draw_params(jnp.ones(shape2, dtype=jnp.bool_))

        def body(k, _):
            i_sd, i_sq, eps = isd_s[:], isq_s[:], eps_s[:]
            refs = rv_ref[:]

            obs = (jnp.full(shape, omega_n, jnp.float32),
                   i_sd * (1.0 / i_lim), i_sq * (1.0 / i_lim),
                   c_ref[:], s_ref[:], refs[:R], refs[R:])

            hs = []
            for j in range(H):
                acc = b1_ref[j]
                for f in range(F):
                    acc = acc + w1_ref[f * H + j] * obs[f]
                hs.append(jnp.tanh(acc))
            logits = []
            for a in range(A):
                logit = b2_ref[a]
                for j in range(H):
                    logit = logit + w2_ref[j * A + a] * hs[j]
                logits.append(logit)
            # inverse-CDF categorical over the softmax (8 exps + 1 uniform)
            m = logits[0]
            for a in range(1, A):
                m = jnp.maximum(m, logits[a])
            es = [jnp.exp(l - m) for l in logits]
            total = es[0]
            for a in range(1, A):
                total = total + es[a]
            uu = _uniform_from_bits(bits(shape)) * total
            cum = es[0]
            action = jnp.zeros(shape, jnp.int32)
            for a in range(1, A):
                action = jnp.where(uu >= cum, a, action)
                cum = cum + es[a]

            c, se_ = c_ref[:], s_ref[:]
            i_sd, i_sq, eps = physics_cs(i_sd, i_sq, eps, c, se_, action)
            eps = eps - np.float32(TWO_PI) * jnp.floor(
                eps * np.float32(1.0 / TWO_PI))
            c_new = c * COS_D - se_ * SIN_D
            s_new = se_ * COS_D + c * SIN_D
            inv_cs = jax.lax.rsqrt(c_new * c_new + s_new * s_new)
            c_new = c_new * inv_cs
            s_new = s_new * inv_cs

            isd_n = i_sd * (1.0 / i_lim)
            isq_n = i_sq * (1.0 / i_lim)
            violated = (isd_n * isd_n + isq_n * isq_n) > 1.0
            wse = -(w_over_span * jnp.abs(isd_n - refs[:R])
                    + w_over_span * jnp.abs(isq_n - refs[R:]))
            reward = jnp.where(violated, violation_reward, wse)

            zero = jnp.zeros(shape, jnp.float32)
            isd_s[:] = jnp.where(violated, zero, i_sd)
            isq_s[:] = jnp.where(violated, zero, i_sq)
            eps_s[:] = jnp.where(violated, zero, eps)
            c_ref[:] = jnp.where(violated, jnp.ones(shape, jnp.float32),
                                 c_new)
            s_ref[:] = jnp.where(violated, zero, s_new)

            out_isd[k] = isd_s[:]
            out_isq[k] = isq_s[:]
            out_eps[k] = eps_s[:]
            out_rd[k] = refs[:R]
            out_rq[k] = refs[R:]
            out_act[k] = action
            out_reward[k] = reward
            out_done[k] = violated.astype(jnp.float32)

            viol_f = violated.astype(jnp.float32)
            reset2 = jnp.concatenate([viol_f, viol_f], axis=0) > 0.5
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

        jax.lax.fori_loop(0, chunk, body, 0)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    const = pl.BlockSpec((R, LANE), lambda i: (0, 0))
    tblk = pl.BlockSpec((chunk, R, LANE), lambda i: (i, 0, 0))
    traj_f = jax.ShapeDtypeStruct((n_steps, R, LANE), jnp.float32)
    traj_i = jax.ShapeDtypeStruct((n_steps, R, LANE), jnp.int32)
    out_shapes = (traj_f,) * 5 + (traj_i,) + (traj_f,) * 2
    scratch_shapes = (
        [pltpu.VMEM(shape, jnp.float32) for _ in range(3)]
        + [pltpu.VMEM(shape2, jnp.float32) for _ in range(4)]
        + [pltpu.VMEM(shape2, jnp.uint32)]
        + [pltpu.VMEM(shape, jnp.float32) for _ in range(2)]
    )

    @jax.jit
    def rollout(seed, w1, b1, w2, b2, isd0, isq0, eps0):
        out = pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            out_shape=out_shapes,
            in_specs=[smem] * 5 + [const] * 3,
            out_specs=(tblk,) * n_sig,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32),
          jnp.asarray(w1, jnp.float32), jnp.asarray(b1, jnp.float32),
          jnp.asarray(w2, jnp.float32), jnp.asarray(b2, jnp.float32),
          isd0, isq0, eps0)
        return dict(zip(names_out, out))

    rollout.signals = names_out
    return rollout


def flatten_policy_params(params):
    """``parallel/sharded.py`` policy dict -> the flat (w1, b1, w2, b2)
    vectors ``make_fused_policy_rollout`` consumes (row-major)."""
    return (np.asarray(params["w1"], np.float32).reshape(-1),
            np.asarray(params["b1"], np.float32).reshape(-1),
            np.asarray(params["w2"], np.float32).reshape(-1),
            np.asarray(params["b2"], np.float32).reshape(-1))


def make_fused_reinforce_rollout(env, n_steps, n_envs, hidden=16, gamma=0.99,
                                 sample="categorical", ref_mode="wiener",
                                 block_rows=8, interpret=False):
    """Fused REINFORCE rollout WITH the backward pass in-kernel: policy
    evaluation, sampling, physics, reward, auto-reset AND the policy-gradient
    accumulation all run inside one ``pallas_call`` — training data never
    leaves VMEM, and the only HBM traffic is initial/final env state plus one
    (n_params, 128) gradient block.

    The gradient is computed forward-only with per-env eligibility traces
    (no T-length activation storage):

        e_t = gamma * (1 - reset_{t-1}) * e_{t-1} + grad log pi(a_t | s_t)
        G  += (r_t - baseline) * e_t

    which for ``gamma=0`` reduces exactly to the per-step estimator of
    ``parallel/sharded.py::_build_reinforce_step`` (the XLA trainer) — the
    property the deterministic parity test exploits.  ``grad log pi`` is the
    categorical score ``onehot(a) - softmax(logits)`` backpropagated through
    the 2-layer tanh MLP by hand (the same network as
    ``make_fused_policy_rollout``).

    Per-env traces need ``n_params`` floats per env, so the kernel runs on a
    1-D grid over blocks of ``block_rows * 128`` envs: each block scans all
    ``n_steps`` with its traces resident in VMEM scratch and flushes its
    lane-summed gradient into a shared accumulator block (TPU grids are
    sequential, so ``+=`` across grid steps is well-defined).

    Returns ``rollout(seed, baseline, w1, b1, w2, b2, isd0, isq0, eps0,
    ref_d=None, ref_q=None) -> (isd, isq, eps, reward_sum, term_count,
    grad_block)`` with ``grad_block`` of shape ``(n_params, 128)``;
    ``grad_block.sum(-1)`` is the UNNORMALIZED ascent direction, packed
    ``[w1 (f*H+j) | b1 | w2 (j*A+a) | b2]`` — ``unflatten_policy_grads``
    converts it back to the params dict layout.
    """
    assert n_envs % (block_rows * LANE) == 0
    assert tuple(env.state_names[i] for i in
                 np.asarray(env._state_filter)) == ("omega", "i_sd", "i_sq",
                                                    "epsilon"), \
        "build the env with state_filter=('omega','i_sd','i_sq','epsilon')"
    R = n_envs // LANE
    n_blocks = R // block_rows
    Rb = block_rows
    ctx = _policy_pmsm_ctx(env)
    i_lim, omega_n, eps_lim = ctx.i_lim, ctx.omega_n, ctx.eps_lim
    margin, w_over_span = ctx.margin, ctx.w_over_span
    violation_reward = ctx.violation_reward
    F, H, A = 6, hidden, 8
    P1, P2, P3, P4 = F * H, H, H * A, A
    P = P1 + P2 + P3 + P4
    shape = (Rb, LANE)
    shape2 = (2 * Rb, LANE)
    LN10 = np.float32(np.log(10.0))
    greedy = sample == "greedy"
    wiener = ref_mode == "wiener"
    gamma = np.float32(gamma)

    def physics(i_sd, i_sq, eps, action):
        return ctx.physics_cs(i_sd, i_sq, eps, jnp.cos(eps), jnp.sin(eps),
                              action)

    def kernel(seed_ref, base_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               isd_ref, isq_ref, eps_ref, rd_ref, rq_ref,
               out_isd, out_isq, out_eps, out_reward, out_terms, out_grad,
               e_ref, g_acc_ref, viol_ref,
               rv_ref, rk_ref, rl_ref, rs_ref, rng_ref):
        pid = pl.program_id(0)
        seed, bits = _make_rng(interpret, rng_ref)
        seed(seed_ref[0] + pid * jnp.int32(7919))
        out_isd[:] = isd_ref[:]
        out_isq[:] = isq_ref[:]
        out_eps[:] = eps_ref[:]
        out_reward[:] = jnp.zeros(shape, jnp.float32)
        out_terms[:] = jnp.zeros(shape, jnp.float32)
        e_ref[:] = jnp.zeros((P, Rb, LANE), jnp.float32)
        g_acc_ref[:] = jnp.zeros((P, Rb, LANE), jnp.float32)
        viol_ref[:] = jnp.zeros(shape, jnp.float32)
        baseline = base_ref[0]

        def _draw_params(mask):
            u1 = _uniform_from_bits(bits(shape2))
            u2 = _uniform_from_bits(bits(shape2))
            rl_ref[:] = jnp.where(mask, jnp.floor(500.0 + 1500.0 * u1), rl_ref[:])
            rs_ref[:] = jnp.where(mask, jnp.exp(LN10 * (-3.0 + 2.0 * u2)), rs_ref[:])

        if wiener:
            u = _uniform_from_bits(bits(shape2))
            rv_ref[:] = (2.0 * u - 1.0) * margin
            rk_ref[:] = jnp.zeros(shape2, jnp.float32)
            _draw_params(jnp.ones(shape2, dtype=jnp.bool_))
        else:
            rv_ref[:] = jnp.concatenate([rd_ref[:], rq_ref[:]], axis=0)
            rk_ref[:] = jnp.zeros(shape2, jnp.float32)
            rl_ref[:] = jnp.full(shape2, 1e9, jnp.float32)
            rs_ref[:] = jnp.zeros(shape2, jnp.float32)

        def body(t, _):
            i_sd, i_sq, eps = out_isd[:], out_isq[:], out_eps[:]
            refs = rv_ref[:]

            eps_w = eps - np.float32(TWO_PI) * jnp.floor(eps * np.float32(1.0 / TWO_PI))
            eps_w = jnp.where(eps_w > np.float32(np.pi),
                              eps_w - np.float32(TWO_PI), eps_w)
            obs = (jnp.full(shape, omega_n, jnp.float32),
                   i_sd * (1.0 / i_lim), i_sq * (1.0 / i_lim),
                   eps_w * (1.0 / eps_lim), refs[:Rb], refs[Rb:])

            # ---- forward: 2-layer tanh MLP (weights as SMEM scalars)
            hs = []
            for j in range(H):
                acc = b1_ref[j]
                for f in range(F):
                    acc = acc + w1_ref[f * H + j] * obs[f]
                hs.append(jnp.tanh(acc))
            logits = []
            for a in range(A):
                logit = b2_ref[a]
                for j in range(H):
                    logit = logit + w2_ref[j * A + a] * hs[j]
                logits.append(logit)

            # ---- action: Gumbel-max (== categorical) or argmax
            best = None
            action = jnp.zeros(shape, jnp.int32)
            for a in range(A):
                pert = logits[a]
                if not greedy:
                    ug = _uniform_from_bits(bits(shape))
                    pert = pert - jnp.log(-jnp.log(jnp.maximum(ug, 1e-12)))
                if best is None:
                    best = pert
                else:
                    take = pert > best
                    best = jnp.where(take, pert, best)
                    action = jnp.where(take, a, action)

            # ---- categorical score: dlogit_a = onehot(a) - softmax(logits)
            m = logits[0]
            for a in range(1, A):
                m = jnp.maximum(m, logits[a])
            exps = [jnp.exp(logits[a] - m) for a in range(A)]
            z = exps[0]
            for a in range(1, A):
                z = z + exps[a]
            inv_z = 1.0 / z
            dlogit = [(action == a).astype(jnp.float32) - exps[a] * inv_z
                      for a in range(A)]

            # ---- manual backprop through the MLP -> per-param score g
            dh = []
            for j in range(H):
                acc = w2_ref[j * A] * dlogit[0]
                for a in range(1, A):
                    acc = acc + w2_ref[j * A + a] * dlogit[a]
                dh.append(acc)
            dpre = [(1.0 - hs[j] * hs[j]) * dh[j] for j in range(H)]
            g_parts = []
            for f in range(F):
                for j in range(H):
                    g_parts.append(obs[f] * dpre[j])
            g_parts.extend(dpre)
            for j in range(H):
                for a in range(A):
                    g_parts.append(hs[j] * dlogit[a])
            g_parts.extend(dlogit)
            g_stack = jnp.stack(g_parts, axis=0)  # (P, Rb, LANE)

            # ---- eligibility trace update (decay zeroed across resets)
            geff = gamma * (1.0 - viol_ref[:])
            e_ref[:] = e_ref[:] * geff[None] + g_stack

            # ---- physics + reward + reset (as make_fused_policy_rollout)
            i_sd, i_sq, eps = physics(i_sd, i_sq, eps, action)
            eps = eps - np.float32(TWO_PI) * jnp.floor(eps * np.float32(1.0 / TWO_PI))
            isd_n = i_sd * (1.0 / i_lim)
            isq_n = i_sq * (1.0 / i_lim)
            violated = (isd_n * isd_n + isq_n * isq_n) > 1.0
            wse = -(w_over_span * jnp.abs(isd_n - refs[:Rb])
                    + w_over_span * jnp.abs(isq_n - refs[Rb:]))
            reward = jnp.where(violated, violation_reward, wse)
            out_reward[:] = out_reward[:] + reward
            out_terms[:] = out_terms[:] + violated.astype(jnp.float32)

            # ---- gradient accumulation: G += (r - baseline) * e
            g_acc_ref[:] = g_acc_ref[:] + (reward - baseline)[None] * e_ref[:]
            viol_ref[:] = violated.astype(jnp.float32)

            zero = jnp.zeros(shape, jnp.float32)
            out_isd[:] = jnp.where(violated, zero, i_sd)
            out_isq[:] = jnp.where(violated, zero, i_sq)
            out_eps[:] = jnp.where(violated, zero, eps)

            if wiener:
                viol_f = violated.astype(jnp.float32)
                reset2 = jnp.concatenate([viol_f, viol_f], axis=0) > 0.5
                u1 = _uniform_from_bits(bits(shape2))
                u2 = _uniform_from_bits(bits(shape2))
                draw = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12))) * jnp.cos(
                    np.float32(TWO_PI) * u2)
                regen = (rk_ref[:] >= rl_ref[:]) | reset2
                _draw_params(regen)
                rk_ref[:] = jnp.where(regen, 0.0, rk_ref[:]) + 1.0
                value = jnp.clip(rv_ref[:] + rs_ref[:] * draw, -margin, margin)
                u3 = _uniform_from_bits(bits(shape2))
                rv_ref[:] = jnp.where(reset2, (2.0 * u3 - 1.0) * margin, value)
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)

        # flush: lane-block gradient = sum over this block's sublane envs
        block_grad = jnp.sum(g_acc_ref[:], axis=1)  # (P, LANE)

        @pl.when(pid == 0)
        def _():
            out_grad[:] = block_grad

        @pl.when(pid != 0)
        def _():
            out_grad[:] = out_grad[:] + block_grad

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    blk = pl.BlockSpec((Rb, LANE), lambda i: (i, 0))
    acc = pl.BlockSpec((P, LANE), lambda i: (0, 0))

    @jax.jit
    def rollout(seed, baseline, w1, b1, w2, b2, isd0, isq0, eps0,
                ref_d=None, ref_q=None):
        z = jnp.zeros((R, LANE), jnp.float32)
        ref_d = z if ref_d is None else ref_d
        ref_q = z if ref_q is None else ref_q
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            out_shape=(
                tuple(jax.ShapeDtypeStruct((R, LANE), jnp.float32)
                      for _ in range(5))
                + (jax.ShapeDtypeStruct((P, LANE), jnp.float32),)
            ),
            in_specs=[smem] * 6 + [blk] * 5,
            out_specs=(blk,) * 5 + (acc,),
            scratch_shapes=[
                pltpu.VMEM((P, Rb, LANE), jnp.float32),  # eligibility traces
                pltpu.VMEM((P, Rb, LANE), jnp.float32),  # gradient accumulator
                pltpu.VMEM(shape, jnp.float32),          # previous-step resets
                pltpu.VMEM(shape2, jnp.float32),         # Wiener value
                pltpu.VMEM(shape2, jnp.float32),         # Wiener step counter
                pltpu.VMEM(shape2, jnp.float32),         # Wiener sub-ep length
                pltpu.VMEM(shape2, jnp.float32),         # Wiener sigma
                pltpu.VMEM(shape2, jnp.uint32),          # interpret-mode RNG
            ],
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32),
          jnp.asarray([baseline], jnp.float32),
          jnp.asarray(w1, jnp.float32), jnp.asarray(b1, jnp.float32),
          jnp.asarray(w2, jnp.float32), jnp.asarray(b2, jnp.float32),
          isd0, isq0, eps0, ref_d, ref_q)

    return rollout


def unflatten_policy_grads(grad_block, obs_dim=6, n_actions=8, hidden=16):
    """(n_params, 128) kernel gradient block -> params-dict pytree (the
    inverse of ``flatten_policy_params``'s packing, lane dimension summed)."""
    g = jnp.sum(grad_block, axis=-1)
    f, h, a = obs_dim, hidden, n_actions
    p1, p2, p3 = f * h, h, h * a
    return {
        "w1": g[:p1].reshape(f, h),
        "b1": g[p1:p1 + p2],
        "w2": g[p1 + p2:p1 + p2 + p3].reshape(h, a),
        "b2": g[p1 + p2 + p3:],
    }


def make_fused_reinforce_trainer(env, n_steps, n_envs, hidden=16, gamma=0.99,
                                 lr=0.05, baseline_decay=0.9, block_rows=8,
                                 interpret=False):
    """Whole-training-run REINFORCE with the rollout AND backward pass fused
    in-kernel: ``train(seed, params, n_iters)`` scans SGD iterations inside
    ONE jitted program, each iteration being one ``make_fused_reinforce_rollout``
    launch (T env steps + in-kernel policy gradient) followed by an ascent
    update and a moving-average reward baseline.

    Env state persists across iterations (continuing envs, as the XLA
    trainer ``parallel/sharded.py::make_reinforce_trainer``).  Returns
    ``(params', mean_reward_per_iter)``.
    """
    roll = make_fused_reinforce_rollout(env, n_steps, n_envs, hidden=hidden,
                                        gamma=gamma, block_rows=block_rows,
                                        interpret=interpret)
    R = n_envs // LANE
    denom = 1.0 / float(n_envs * n_steps)

    @functools.partial(jax.jit, static_argnums=2)
    def train(seed, params, n_iters):
        z = jnp.zeros((R, LANE), jnp.float32)

        def body(carry, i):
            params, isd, isq, eps, baseline = carry
            w1 = params["w1"].reshape(-1)
            b1 = params["b1"]
            w2 = params["w2"].reshape(-1)
            b2 = params["b2"]
            out = roll(seed + i, baseline, w1, b1, w2, b2, isd, isq, eps)
            isd, isq, eps, reward_sum, _terms, grad_block = out
            mean_r = jnp.sum(reward_sum) * denom
            grads = unflatten_policy_grads(grad_block, 6, 8, hidden)
            params = jax.tree.map(
                lambda p_, g: p_ + lr * g * denom, params, grads)
            baseline = baseline_decay * baseline + (1.0 - baseline_decay) * mean_r
            return (params, isd, isq, eps, baseline), mean_r

        init = (params, z, z, z, jnp.float32(0.0))
        (params, _isd, _isq, _eps, _b), rs = jax.lax.scan(
            body, init, jnp.arange(n_iters, dtype=jnp.int32))
        return params, rs

    return train


#: motor kind -> universal family builder.  Every one of the catalog's 54
#: env ids resolves to one of these five builders.
FUSED_FAMILY_BUILDERS = {
    "PermExDc": "dc", "SeriesDc": "dc", "ShuntDc": "dc", "ExtExDc": "dc",
    "PMSM": "sync", "SynRM": "sync",
    "SCIM": "induction",
    "EESM": "eesm", "DFIM": "dfim",
}


def fused_state_arity(env):
    """Number of ``(R, LANE)`` state planes the universal fused rollout for
    ``env`` takes/returns: omega for dynamic-speed (poly/OU load) configs,
    plus two supply planes for AC1/RC supply modes ((phi, t) / (u_sup, t)
    — see ``_make_fused_supply``)."""
    ps = env.physical_system
    kind = ps.motor.kind
    mech = 1 if ps.load.omega_fixed is None else 0
    base = {"PermExDc": 1, "SeriesDc": 1, "ShuntDc": 2, "ExtExDc": 2,
            "PMSM": 3, "SynRM": 3, "SCIM": 4, "EESM": 4, "DFIM": 5}[kind]
    sup = 2 if ps.supply.kind in ("AC1PhaseSupply", "RCVoltageSupply") else 0
    return base + mech + sup


def make_fused_rollout(env, n_steps, n_envs, action_mode="random",
                       interpret=False):
    """Universal fused-rollout dispatch: every one of the 54 catalog env
    ids (9 motors x {Finite,Cont} x {CC,TC,SC}) gets its family's
    VMEM-resident Pallas kernel, with all semantics read from the env spec.

    Returns the family rollout (see the family builders for signatures);
    the number of state planes is ``fused_state_arity(env)``.  Every
    scalar reference kind runs in-kernel (wiener / laplace / const /
    sinusoidal / step / triangle / sawtooth).  Raises ``KeyError`` for
    motor kinds without a fused family (the SRM stubs — NotImplementedError
    upstream too) and ``AssertionError`` for non-fused configurations
    (interlocking dead time, reward_power != 1, >3 referenced states,
    switched reference generators): those run on the general XLA path.
    """
    family = FUSED_FAMILY_BUILDERS[env.physical_system.motor.kind]
    build = {
        "dc": make_fused_dc_rollout,
        "sync": make_fused_sync_rollout,
        "induction": make_fused_induction_rollout,
        "eesm": make_fused_eesm_family_rollout,
        "dfim": make_fused_dfim_family_rollout,
    }[family]
    return build(env, n_steps, n_envs, action_mode=action_mode,
                 interpret=interpret)


def make_sharded_fused_rollout(env, n_steps, n_envs, mesh, kernel="pmsm",
                               interpret=False):
    """Fused kernel x device mesh: the env batch is laid out ``P('env')``
    over ``mesh`` and ONE fused rollout kernel runs per device on its local
    shard — the multi-chip execution mode of the fast path (each chip
    simulates its (n_envs / n_dev) envs fully on-core; the only collective
    is a final psum of the reward/termination sums).

    ``kernel`` selects the family: ``'pmsm'`` (also covers SynRM),
    ``'permex'``, ``'dc_sc'`` (SeriesDc/ShuntDc SC — state count follows the
    motor), ``'scim'``, ``'eesm'``, ``'dfim'``, or ``'auto'`` — the
    universal dispatch (``make_fused_rollout``) covering all 54 catalog
    ids.  Returns
    ``rollout(seed, *state_planes) -> (local outputs...,
    global_reward_sum, global_term_count)``; per-device seeds are
    decorrelated by folding in the mesh position.
    """
    from functools import partial as _partial

    from jax.sharding import NamedSharding, PartitionSpec as _P

    _shard_map = _resolve_shard_map()

    builders = {
        "pmsm": (make_fused_pmsm_rollout, 3),
        "permex": (make_fused_permex_rollout, 1),
        "dc_sc": (make_fused_dc_sc_rollout,
                  2 if env.physical_system.motor.kind == "SeriesDc" else 3),
        "scim": (make_fused_scim_rollout, 4),
        "eesm": (make_fused_eesm_rollout, 4),
        "dfim": (make_fused_dfim_rollout, 5),
        # the universal dispatch — any of the 54 catalog ids
        "auto": (make_fused_rollout, fused_state_arity(env)),
    }
    build, n_state = builders[kernel]
    (axis,) = mesh.axis_names
    n_dev = mesh.size
    assert n_envs % (n_dev * LANE) == 0
    local_envs = n_envs // n_dev
    local = build(env, n_steps, local_envs, action_mode="random",
                  interpret=interpret)
    spec = _P(axis)

    # count the kernel's outputs (states..., reward, terms, wiener debug...)
    local_shape = (local_envs // LANE, LANE)
    abstract = [jax.ShapeDtypeStruct((), jnp.int32)] + [
        jax.ShapeDtypeStruct(local_shape, jnp.float32) for _ in range(n_state)
    ]
    n_out = len(jax.eval_shape(lambda se, *a: local(se, *a), *abstract))

    @_partial(_shard_map, mesh=mesh,
              in_specs=(_P(),) + (spec,) * n_state,
              out_specs=(spec,) * n_out + (_P(), _P()),
              check_vma=False)
    def run(seed, *planes):
        dev_seed = seed[0] * jnp.int32(n_dev) + jax.lax.axis_index(axis)
        out = local(dev_seed, *planes)
        reward, terms = out[n_state], out[n_state + 1]
        r_sum = jax.lax.psum(jnp.sum(reward), axis)[None]
        t_sum = jax.lax.psum(jnp.sum(terms), axis)[None]
        return tuple(out) + (r_sum, t_sum)

    shard = NamedSharding(mesh, spec)

    @jax.jit
    def rollout(seed, *planes):
        planes = tuple(jax.device_put(x, shard) for x in planes)
        return run(jnp.asarray([seed], jnp.int32), *planes)

    return rollout
