"""DC-family fused kernels: PermExDc reducing/recording kernels
(_PermExCtx), the Cont-SC Series/Shunt kernel, the universal DC
family builder (_dc_family / make_fused_dc_rollout), and the
closed-loop speed-cascade-in-the-loop kernel."""

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
    _c2i,
    _c2u,
    _fused_check_system,
    _param_reset_draws,
    _parse_randomize,
    _sup_reset_planes,
    _u_sup_plane_idx,
    _wrap_j_resolve,
    _fused_state_noise,
    _fused_constraint_mode,
    _require_default_constraints,
    _norm_advance,
    _wrap_dead_time,
    _wrap_mech_time,
    _fused_interlock,
    _fused_load,
    _fused_u_sup,
    _hb_i_st,
    _hb_u_st,
    _interlock_state,
    _make_fused_mech,
    _make_fused_supply,
    _make_rng,
    _make_wiener,
    _policy_obs_spec,
    _ref_configs,
    _ref_n_rows,
    _ref_needs_wf,
    _step_noise,
    _uniform_from_bits,
    _wse_err,
)


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
    _require_default_constraints(env)
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
    _require_default_constraints(env)
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
    _require_default_constraints(env)
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


def _dc_family(env, R, action_mode, randomize=None):
    """Shared DC-family physics/reward/action closures — consumed by BOTH
    the reducing rollout (``make_fused_dc_rollout``) and the generic
    trajectory recorder (``ops.pallas_record``) so the two kernels cannot
    diverge (same pattern as ``_PmsmCtx``/``_PermExCtx``).

    ``randomize``: optional ``{param_name: (lo, hi)}`` dict of electrical
    motor parameters to DOMAIN-RANDOMIZE per env — each named parameter
    becomes an extra per-env state plane (appended after the supply
    planes, visible as a recorded signal), read by the motor ODE every
    step and redrawn uniform in ``[lo, hi]`` on every in-kernel violation
    reset (a reset is a new motor instance).  The fused counterpart of
    the XLA path's ``make_functional(..., dynamic_params=True)`` (see
    tests/test_randomization.py); the policy observation spec does NOT
    include the parameter planes, so trained policies are robust-blind.

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
    _fused_check_system(ps, allow_dead_time=True,
                        allow_state_noise=True)
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

    # --- electrical model ---
    # Parameters are baked python-float constants by default; names listed
    # in ``randomize`` become per-env ``(R, LANE)`` PLANES appended after
    # the supply planes (domain randomization: init values come from the
    # caller, in-kernel violation resets redraw uniform in [lo, hi]).  The
    # ``resolve`` step turns the param tuple into the coefficient tuple the
    # rhs closures consume — for the default (no-plane) path it returns
    # the SAME python-float expressions as before, keeping the buffer
    # golden traces bit-exact.
    _RAND_OK = {"PermExDc": ("r_a", "l_a", "psi_e", "j_rotor"),
                "SeriesDc": ("r_a", "r_e", "l_a", "l_e", "l_e_prime",
                             "j_rotor"),
                "ShuntDc": ("r_a", "r_e", "l_a", "l_e", "l_e_prime",
                            "j_rotor"),
                "ExtExDc": ("r_a", "r_e", "l_a", "l_e", "l_e_prime",
                            "j_rotor")}
    param_names, n_param, p_idx, param_ranges = _parse_randomize(
        randomize, _RAND_OK[kind] + ("u_sup",), kind,
        "the electrical motor parameters (+ j_rotor, u_sup)")

    def getp(nm, pp):
        return pp[p_idx[nm]] if nm in p_idx else float(mp[nm])

    if kind == "PermExDc":
        el_names = ("i",)

        def resolve(pp):
            return (getp("r_a", pp), 1.0 / getp("l_a", pp),
                    getp("psi_e", pp))

        def el_rhs(w, el, u, pc):
            r_a, inv_l, psi_e = pc[:3]
            (i,) = el
            return ((-psi_e * w - r_a * i + u[0]) * inv_l,)

        def torque(el, pc):
            return pc[2] * el[0]

        def i_in_fn(el):
            return (el[0],)
    elif kind == "SeriesDc":
        el_names = ("i",)

        def resolve(pp):
            r_t = getp("r_a", pp) + getp("r_e", pp)
            l_t = getp("l_a", pp) + getp("l_e", pp)
            return (r_t, 1.0 / l_t, getp("l_e_prime", pp))

        def el_rhs(w, el, u, pc):
            r_t, inv_l, l_p = pc[:3]
            (i,) = el
            return ((-r_t * i - l_p * w * i + u[0]) * inv_l,)

        def torque(el, pc):
            return pc[2] * el[0] * el[0]

        def i_in_fn(el):
            return (el[0],)
    else:  # ShuntDc / ExtExDc share the 2-current ODE (dc_motor.py:96-127)
        el_names = ("i_a", "i_e")

        def resolve(pp):
            return (getp("r_a", pp), getp("r_e", pp),
                    1.0 / getp("l_a", pp), 1.0 / getp("l_e", pp),
                    getp("l_e_prime", pp))

        def el_rhs(w, el, u, pc):
            r_a, r_e, inv_la, inv_le, l_p = pc[:5]
            i_a, i_e = el
            u_a, u_e = (u[0], u[0]) if kind == "ShuntDc" else (u[0], u[1])
            return ((-r_a * i_a - l_p * w * i_e + u_a) * inv_la,
                    (-r_e * i_e + u_e) * inv_le)

        def torque(el, pc):
            return pc[4] * el[0] * el[1]

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
    resolve, j_rand = _wrap_j_resolve(resolve, mload, p_idx)
    mech_mode, mech = mload.mode, mload.mech
    needs_step_noise = mload.needs_step_noise
    omega_fixed = mload.omega_fixed

    def core_rhs(core, u, z, ts, pc):
        if not mech:
            return el_rhs(omega_fixed, core, u, pc)
        w, el = core[0], core[1:]
        if j_rand:
            dw = mload.mech_rhs_j(w, torque(el, pc), z, pc[-1])
        elif mload.needs_time:
            dw = mload.mech_rhs_t(w, torque(el, pc), z, ts)
        else:
            dw = mload.mech_rhs(w, torque(el, pc), z)
        return (dw,) + el_rhs(w, el, u, pc)

    # --- supply model (shared helper) ---
    sup = _make_fused_supply(ps, shape, tau)
    _u_idx = _u_sup_plane_idx(p_idx, sup)
    sup_mode, n_sup, sup_reset = sup.mode, sup.n_sup, sup.sup_reset
    supply_u = sup.supply_u

    n_core = n_el + (1 if mech else 0)
    n_state = n_core + n_sup + n_param

    def split(state):
        return (state[:n_core], state[n_core:n_core + n_sup],
                state[n_core + n_sup:])

    def rk4(core, u, z, dt, pc, t0=None):
        def axpy(s, k, c):
            return tuple(si + c * ki for si, ki in zip(s, k))

        tm = te = None
        if t0 is not None:
            tm, te = t0 + 0.5 * dt, t0 + dt
        k1 = core_rhs(core, u, z, t0, pc)
        k2 = core_rhs(axpy(core, k1, 0.5 * dt), u, z, tm, pc)
        k3 = core_rhs(axpy(core, k2, 0.5 * dt), u, z, tm, pc)
        k4 = core_rhs(axpy(core, k3, dt), u, z, te, pc)
        return tuple(
            s + (dt / 6.0) * (a1 + 2.0 * (a2 + a3) + a4)
            for s, a1, a2, a3, a4 in zip(core, k1, k2, k3, k4)
        )

    def step_physics(state, acts, z=None, bs=None, t0=None):
        core, sup_planes, pp = split(state)
        pc = resolve(pp)
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
        u_sup_val, sup_new = supply_u(
            sup_planes, i_sup_val,
            None if _u_idx is None else pp[_u_idx])

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
            tm = None if t0 is None else t0 + dt0
            core_mid = rk4(core, u0, z, dt0, pc, t0)
            el_mid = core_mid[1:] if mech else core_mid
            i_mid = i_in_fn(el_mid)
            u1 = tuple(
                jnp.where(flag,
                          conv_u(conv_kinds[j], acts[j], i_mid[j],
                                 inter[j] or None) * u_sup_val, u0[j])
                for j in range(n_ch))
            return rk4(core_mid, u1, z, dt1, pc, tm) + sup_new + pp

        u = tuple(conv_u(conv_kinds[j], acts[j], i_in[j]) * u_sup_val
                  for j in range(n_ch))
        return rk4(core, u, z, tau, pc, t0) + sup_new + pp

    def reset_state(bits):
        """Per-plane in-kernel reset values (drawn fresh every step,
        selected only on violation).  Randomized motor parameters redraw
        uniform in their [lo, hi] range — a violation reset is a NEW
        motor instance (per-episode domain randomization)."""
        zero = jnp.zeros(shape, jnp.float32)
        core = ((mload.omega_reset(bits),) if mech else ()) + (zero,) * n_el
        pdraws = _param_reset_draws(bits, shape, param_ranges)
        return core + _sup_reset_planes(sup, bits, pdraws, _u_idx) + pdraws

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
            pc = resolve(split(state)[2])
            return torque(el, pc) * np.float32(1.0 / t_lim)
        return el[el_names.index(nm)] * ref_cfg[j]["inv_lim"]

    _dc_desc = ((("limit", ("i",)),) if n_el == 1
                else (("limit", ("i_a",)), ("limit", ("i_e",))))
    no_cons = _fused_constraint_mode(env, _dc_desc) == "none"

    def violated_fn(state):
        if no_cons:  # constraints=(): the env never terminates
            return jnp.zeros(shape, jnp.bool_)
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

    # --- DeadTimeProcessor fused as carried action planes (see
    #     pallas_common._wrap_dead_time) ---
    step_physics, advance_bridges, n_bridge, bridge_dtypes = \
        _wrap_mech_time(mload, tau, step_physics, advance_bridges,
                        n_bridge, has_cs=False, k_int=k_int)
    step_physics, advance_bridges, n_bridge, bridge_dtypes = \
        _wrap_dead_time(ps, (jnp.int32,) * n_ch if finite else (jnp.float32,) * n_ch,
                        step_physics, advance_bridges, n_bridge,
                        has_cs=False, base_dtypes=bridge_dtypes)

    # --- generic record-adapter surface (see ops/pallas_record.py) ---
    state_names = ((("omega",) if mech else ()) + el_names + sup.names
                   + param_names)
    _t_ref = any(c["name"] == "torque" for c in ref_cfg)
    observe = _fused_state_noise(
        ps, state_names, lambda nm: float(lim[names.index(nm)]),
        allowed=((() if _t_ref else el_names)
                 + (("omega",) if mech else ())))
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

    # --- policy-adapter surface (see ops/pallas_policy.py) ---
    off = 1 if mech else 0
    obs_spec = _policy_obs_spec(mech, w_lim, omega_fixed, [
        ("state", off + j, 1.0 / el_lims[j]) for j in range(n_el)])

    return SimpleNamespace(
        obs_spec=obs_spec, act_ns=(act_ns if finite else None), aux_cs=None,
        act_range=(None if finite else
                   (np.asarray(act_lo, np.float32),
                    np.asarray(act_hi, np.float32))),
        n_state=n_state, n_ch=n_ch, finite=finite, mech=mech, shape=shape,
        shape_r=shape_r, n_ref=n_ref, n_rows=n_rows, ref_cfg=ref_cfg, bias=bias,
        violation_reward=violation_reward, step_physics=step_physics,
        ref_quantity=ref_quantity, violated=violated_fn,
        sample_actions=_sample_actions, state_names=state_names,
        act_names=act_names, act_dtype=act_dtype, read_actions=read_actions,
        pre_step=pre_step, step=step, quantities=quantities,
        mech_mode=mech_mode, sup_mode=sup_mode, n_sup=n_sup, n_core=n_core,
        needs_step_noise=needs_step_noise, reset_state=reset_state,
        n_bridge=n_bridge, bridge_dtypes=bridge_dtypes,
        advance_bridges=_norm_advance(advance_bridges),
        param_names=param_names, param_ranges=param_ranges, n_param=n_param, observe=observe,
    )


def make_fused_dc_rollout(env, n_steps, n_envs, action_mode="random",
                          interpret=False, randomize=None):
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
    fs = _dc_family(env, R, action_mode, randomize)
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

            # StateNoiseProcessor: reward/violation see the NOISY state,
            # the carried ODE state stays clean (see _fused_state_noise)
            sobs = fs.observe(state, bits) if fs.observe else state
            violated = violated_fn(sobs)
            refs_now = rv_ref[:]
            wse = bias - _wse_err(ref_cfg[0], ref_quantity(sobs, 0),
                                  refs_now[:R])
            if n_ref == 2:
                wse = wse - _wse_err(ref_cfg[1], ref_quantity(sobs, 1),
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
    _require_default_constraints(env)
    assert ctrl.control_task == "SC" and ctrl.output_kind == "cont"
    kind = env.physical_system.motor.kind
    assert kind in ("PermExDc", "SeriesDc", "ShuntDc"), (
        f"in-kernel DC cascade covers PermExDc/SeriesDc/ShuntDc; got "
        f"{kind!r} (ExtExDc's dual-channel flux-weakening cascade runs on "
        f"the XLA path)")
    assert n_envs % LANE == 0
    R = n_envs // LANE
    fs = _dc_family(env, R, "random")
    assert fs.observe is None, (
        "the in-kernel speed cascade rejects StateNoiseProcessor (the "
        "controller would need the noisy measurement path) — use the "
        "XLA control_environment")
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


