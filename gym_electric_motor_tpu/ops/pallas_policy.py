"""Policy-in-the-loop fused kernels: the in-kernel actor MLP
(reducing evaluation, trajectory recording for fused-collection
PPO, in-kernel REINFORCE training)."""

from __future__ import annotations

import functools
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_common import (
    _require_default_constraints,
    LANE,
    TWO_PI,
    _fused_check_system,
    _fused_load,
    _fused_u_sup,
    _make_rng,
    _make_wiener,
    _ref_needs_wf,
    _step_noise,
    _uniform_from_bits,
    _wse_err,
)


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
    _require_default_constraints(env)
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
    _require_default_constraints(env)
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
    from .pallas_common import _pick_chunk
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
    # metadata surface shared with make_fused_policy_record_universal so
    # parallel.sharded.make_fused_ppo_trainer drives both through one path
    rollout.state_names = ("i_sd", "i_sq", "eps")
    rollout.ref_names = ("ref_d", "ref_q")
    rollout.act_names = ("action",)
    rollout.act_ns = (8,)
    rollout.obs_spec = (("const", float(omega_n)),
                        ("state", 0, 1.0 / i_lim),
                        ("state", 1, 1.0 / i_lim),
                        ("cos", 2), ("sin", 2))
    rollout.obs_dim = 7
    rollout.n_state = 3
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
    _require_default_constraints(env)
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
#: env ids resolves to one of these five builders.\n

# --------------------------------------------------------------------------
# Universal policy-in-the-loop recorder: every finite-action catalog env
# --------------------------------------------------------------------------

_POLICY_FAMILY_NAMESPACES = None


def _policy_family(env, R, action_mode="random", randomize=None):
    """Resolve the family namespace for the universal policy kernels
    (lazy import: the family modules are siblings, no facade cycle).
    ``randomize``: domain-randomized motor parameters as per-env state
    planes — every family supports its electrical drift axes (see the
    family docstrings)."""
    global _POLICY_FAMILY_NAMESPACES
    if _POLICY_FAMILY_NAMESPACES is None:
        from .pallas_dc import _dc_family
        from .pallas_dfim import _dfim_family
        from .pallas_eesm import _eesm_family
        from .pallas_induction import _induction_family
        from .pallas_srm import _srm_family
        from .pallas_sync import _sync_family
        _POLICY_FAMILY_NAMESPACES = {
            "PermExDc": _dc_family, "SeriesDc": _dc_family,
            "ShuntDc": _dc_family, "ExtExDc": _dc_family,
            "PMSM": _sync_family, "SynRM": _sync_family,
            "SCIM": _induction_family,
            "EESM": _eesm_family, "DFIM": _dfim_family,
            "SRM": _srm_family,
        }
    kind = env.physical_system.motor.kind
    if randomize:
        return _POLICY_FAMILY_NAMESPACES[kind](env, R, action_mode,
                                               randomize=randomize)
    return _POLICY_FAMILY_NAMESPACES[kind](env, R, action_mode)


def policy_obs_dim(env):
    """Observation feature count of the universal policy kernel for
    ``env``: the family ``obs_spec`` features plus, per referenced state,
    the normalized controlled quantity and its reference value (see
    ``_policy_obs_spec``)."""
    fs = _policy_family(env, 1)
    return len(fs.obs_spec) + 2 * fs.n_ref


def policy_act_ns(env):
    """Per-head categorical cardinalities of ``env``'s finite action space
    as the universal policy kernel factorizes it (one independent softmax
    head per converter sub-action, e.g. EESM = (8, 4): B6 x 4QC) — or
    ``None`` for continuous-action envs, which get one squashed-Gaussian
    channel per converter duty instead (``policy_n_cont``)."""
    return _policy_family(env, 1).act_ns


def policy_n_cont(env):
    """Number of continuous action channels (squashed-Gaussian heads) for
    ``env``, 0 for finite-action envs."""
    fs = _policy_family(env, 1)
    return 0 if fs.act_ns is not None else len(fs.act_names)


def policy_obs_host(roll, prev_states, refs):
    """Host-side observation reconstruction — the EXACT features the
    kernel's MLP saw at each step, rebuilt from the recorded signals.

    ``prev_states``: dict of PRE-step state arrays (the recorded post-step
    planes shifted by one, with the launch's initial planes at t = 0),
    keyed by ``roll.state_names``; ``refs``: dict of the recorded
    ``ref_*`` signals (the kernel reads references before advancing them,
    so the recorded value IS what the policy observed).  Returns an
    ``(..., obs_dim)`` stack.  Angle features recompute as cos/sin of the
    recorded angle plane — they match the kernel's renormalized
    incremental rotation to ~1 ulp (same argument as the PMSM-specific
    ``make_fused_policy_record_rollout``).
    """
    names = roll.state_names
    some = prev_states[names[0]]
    feats = []
    for e in roll.obs_spec:
        if e[0] == "const":
            feats.append(jnp.broadcast_to(jnp.float32(e[1]), some.shape))
        elif e[0] == "state":
            feats.append(prev_states[names[e[1]]] * np.float32(e[2]))
        elif e[0] == "cos":
            feats.append(jnp.cos(prev_states[names[e[1]]]))
        else:
            feats.append(jnp.sin(prev_states[names[e[1]]]))
    # the controlled-quantity features ride the SAME family closures the
    # kernel evaluated (pure jnp on state planes — shape-polymorphic)
    if getattr(roll, "fs_quantities", None) is not None:
        cur = tuple(prev_states[nm] for nm in names)
        aux = roll.fs_pre_step(cur)
        for q in roll.fs_quantities(cur, aux):
            feats.append(q)
    for nm in roll.ref_names:
        feats.append(refs[nm])
    return jnp.stack(feats, axis=-1)


def make_fused_policy_record_universal(env, n_steps, n_envs, hidden=16,
                                       chunk=None, interpret=False,
                                       randomize=None, joint_heads=False):
    """Fused POLICY-in-the-loop trajectory recorder for ANY catalog env
    (all 54 ids) — the generalization of the PMSM-specific
    ``make_fused_policy_record_rollout`` to all five motor families and
    both action types.

    Per step, a 2-layer tanh MLP (weights as SMEM scalars) reads the
    family's observation (``_policy_obs_spec``: normalized speed/current/
    flux planes, cos/sin of the rotor angle where one exists, the
    normalized controlled quantities, plus the current reference values)
    and picks the converter action: finite envs sample each sub-action
    from its own softmax head by inverse CDF; continuous envs sample one
    squashed-Gaussian duty per channel (raw = mu + exp(ls) * z recorded
    pre-squash, the converter sees mid + half * tanh(raw); ``rollout``
    then takes the extra flat ``ls`` log-std vector after ``b2``).  The
    family's physics/references/reward/auto-reset run exactly as in the
    universal trajectory recorder
    (``ops.pallas_record.make_fused_record_rollout`` — the same
    ``pre_step``/``step``/``violated``/``quantities`` closures, so the
    policy kernel cannot diverge from the validated env semantics).  The
    recorded signals stream to HBM through the chunked-grid recipe.

    Returns ``rollout(seed, w1, b1, w2, b2, *state0) -> dict`` keyed by
    ``rollout.signals`` (family state names + ``ref_*`` + action head(s) +
    ``reward`` + ``done``), each ``(n_steps, R, LANE)``.  Flat param
    vectors: ``w1 (F*hidden,)``, ``b1 (hidden,)``, ``w2 (hidden*A,)``,
    ``b2 (A,)`` with ``F = policy_obs_dim(env)`` and ``A =
    sum(policy_act_ns(env))`` (heads concatenated in converter order).
    Behavior log-probs and values recompute host-side from
    ``policy_obs_host`` under the collecting parameters — the
    fused-collection PPO contract (``parallel.sharded
    .make_fused_ppo_trainer``).

    Reference capability matched: SB3 RL training runs on arbitrary GEM
    envs (/root/reference/examples/reinforcement_learning_controllers/);
    here collection runs in-kernel at fused speed on every finite-action
    catalog id.
    """
    assert n_envs % LANE == 0
    R = n_envs // LANE
    fs = _policy_family(env, R, "random", randomize)
    if getattr(fs, "observe", None) is not None:
        raise NotImplementedError(
            "StateNoiseProcessor is fused for the reducing/recording "
            "kernels; the policy-in-the-loop kernels reject it (exact "
            "host-side observation reconstruction would need the noise "
            "draws recorded) — use the XLA trainers")
    cont = fs.act_ns is None
    act_ns, obs_spec, aux_cs = fs.act_ns, fs.obs_spec, fs.aux_cs
    # joint_heads (finite multi-converter only): ONE softmax over the
    # CARTESIAN action space instead of independent per-converter heads —
    # the expressive alternative when the branches couple strongly
    # (e.g. the DFIM's stator+rotor B6 pair sharing the dq voltage; the
    # factorized double-DQN plateaus there, docs/parallel.md).  The
    # joint sample decodes to the family's sub-actions by radix
    # arithmetic in-kernel; the RECORDED action columns stay per-head.
    if joint_heads:
        assert not cont and len(act_ns) > 1, (
            "joint_heads needs a multi-head finite action space")
    n_state, n_ref = fs.n_state, fs.n_ref
    n_rows = getattr(fs, "n_rows", n_ref)
    n_act = len(fs.act_names)
    if not cont:
        assert n_act == len(act_ns)
    shape, shape_r = fs.shape, fs.shape_r
    ref_cfg, bias, violation_reward = fs.ref_cfg, fs.bias, fs.violation_reward

    F = len(obs_spec) + 2 * n_ref
    H = hidden
    # finite: one softmax head per converter sub-action (A = sum of
    # cardinalities).  cont: one squashed-Gaussian MEAN per duty channel
    # (A = n_act); per-channel log-stds ride a separate SMEM parameter
    # vector so the policy stays exactly recomputable host-side.
    A = (n_act if cont
         else int(np.prod(act_ns)) if joint_heads
         else int(sum(act_ns)))
    if cont:
        a_mid = 0.5 * (fs.act_range[0] + fs.act_range[1])
        a_half = 0.5 * (fs.act_range[1] - fs.act_range[0])

    from .pallas_common import _pick_chunk
    names = (tuple(fs.state_names)
             + tuple("ref_" + c["name"] for c in ref_cfg)
             + tuple(fs.act_names) + ("reward", "done"))
    n_sig = len(names)
    chunk = _pick_chunk(n_steps, n_sig, R, chunk)
    n_chunks = n_steps // chunk
    has_rot = getattr(fs, "rot_advance", None) is not None
    has_wf = _ref_needs_wf(ref_cfg)
    n_prev = getattr(fs, "n_bridge", 0)
    bds = getattr(fs, "bridge_dtypes", (jnp.int32,) * n_prev)

    def kernel(seed_ref, w1_ref, b1_ref, w2_ref, b2_ref, *refs):
        if cont:
            ls_ref, refs = refs[0], refs[1:]
        state0 = refs[:n_state]
        outs = refs[n_state: n_state + n_sig]
        out_state = outs[:n_state]
        out_ref = outs[n_state: n_state + n_ref]
        out_act = outs[n_state + n_ref: n_state + n_ref + n_act]
        out_reward, out_done = outs[-2], outs[-1]
        scratch = refs[n_state + n_sig:]
        state_s = scratch[:n_state]
        rv_ref, rk_ref, rl_ref, rs_ref, rng_ref = scratch[n_state:
                                                          n_state + 5]
        j = n_state + 5
        za_ref = zb_ref = c_ref = s_ref = None
        if n_rows == 1:
            za_ref, zb_ref = scratch[j], scratch[j + 1]
            j += 2
        if has_rot:
            c_ref, s_ref = scratch[j], scratch[j + 1]
            j += 2
        if has_wf:
            wf_ref = scratch[j]
            j += 1
        else:
            wf_ref = None
        bs_refs = scratch[j: j + n_prev]

        pid = pl.program_id(0)
        seed, bits = _make_rng(interpret, rng_ref)
        seed(seed_ref[0] * n_chunks + pid)

        w_init, w_advance = _make_wiener(bits, ref_cfg, R, shape, shape_r,
                                         rv_ref, rk_ref, rl_ref, rs_ref,
                                         za_ref, zb_ref, wf_ref)

        @pl.when(pid == 0)
        def _():
            for ss, s0 in zip(state_s, state0):
                ss[:] = s0[:]
            if has_rot:
                c0, s0_ = fs.rot_init(tuple(s0[:] for s0 in state0))
                c_ref[:] = c0
                s_ref[:] = s0_
            for pa, dt in zip(bs_refs, bds):
                pa[:] = jnp.zeros(shape, dt)
            w_init()

        def body(k, _):
            z = _step_noise(fs.needs_step_noise, bits, shape)
            bs = (tuple(pa[:] for pa in bs_refs) if n_prev else None)
            cur = tuple(ss[:] for ss in state_s)
            if has_rot:
                rc, rs = c_ref[:], s_ref[:]
                aux = fs.pre_step_rot(cur, rc, rs)
            else:
                aux = fs.pre_step(cur)
            refs_now = rv_ref[:]

            # ---- observation features (the host rebuilds the identical
            #      stack via policy_obs_host)
            cs = aux_cs(aux) if aux_cs is not None else None
            obs = []
            for e in obs_spec:
                if e[0] == "const":
                    obs.append(jnp.full(shape, np.float32(e[1])))
                elif e[0] == "state":
                    obs.append(cur[e[1]] * np.float32(e[2]))
                elif e[0] == "cos":
                    obs.append(cs[0] if cs is not None
                               else jnp.cos(cur[e[1]]))
                else:
                    obs.append(cs[1] if cs is not None
                               else jnp.sin(cur[e[1]]))
            # the controlled quantities themselves (normalized, via the
            # family closure the reward uses — gives TC/SC policies the
            # torque/speed they are asked to track, and CC-on-alpha/beta
            # families the flux-frame dq currents)
            for q in fs.quantities(cur, aux):
                obs.append(q)
            for jr in range(n_ref):
                obs.append(refs_now[jr * R:(jr + 1) * R])

            # ---- 2-layer tanh MLP on SMEM scalar weights
            hs = []
            for jh in range(H):
                acc = b1_ref[jh]
                for f in range(F):
                    acc = acc + w1_ref[f * H + jh] * obs[f]
                hs.append(jnp.tanh(acc))
            logits = []
            for a in range(A):
                logit = b2_ref[a]
                for jh in range(H):
                    logit = logit + w2_ref[jh * A + a] * hs[jh]
                logits.append(logit)

            if cont:
                # ---- squashed-Gaussian duty channels: raw = mu + std*z
                # (Box-Muller pairs); the converter sees mid + half *
                # tanh(raw).  The RAW samples are what gets recorded —
                # the Gaussian log-prob is then exactly recomputable
                # host-side with no atanh saturation, and the squash
                # correction cancels in the PPO ratio (it depends only
                # on raw, not on the parameters).
                zs = []
                for c in range(0, n_act, 2):
                    u1 = _uniform_from_bits(bits(shape))
                    u2 = _uniform_from_bits(bits(shape))
                    rad = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
                    th = np.float32(TWO_PI) * u2
                    zs.append(rad * jnp.cos(th))
                    if c + 1 < n_act:
                        zs.append(rad * jnp.sin(th))
                raws, acts = [], []
                for c in range(n_act):
                    raw = logits[c] + jnp.exp(ls_ref[c]) * zs[c]
                    raws.append(raw)
                    acts.append(np.float32(a_mid[c])
                                + np.float32(a_half[c]) * jnp.tanh(raw))
                acts = tuple(acts)
            else:
                # ---- inverse-CDF categorical sampling: one draw per
                #      head, or ONE joint draw decoded by radix
                acts = []
                groups = ([(0, A)] if joint_heads
                          else [(off, n) for off, n in
                                zip(np.cumsum((0,) + tuple(act_ns[:-1])),
                                    act_ns)])
                for off, n in groups:
                    ls = logits[off:off + n]
                    m = ls[0]
                    for a in range(1, n):
                        m = jnp.maximum(m, ls[a])
                    es = [jnp.exp(l - m) for l in ls]
                    total = es[0]
                    for a in range(1, n):
                        total = total + es[a]
                    uu = _uniform_from_bits(bits(shape)) * total
                    cum = es[0]
                    action = jnp.zeros(shape, jnp.int32)
                    for a in range(1, n):
                        action = jnp.where(uu >= cum, a, action)
                        cum = cum + es[a]
                    acts.append(action)
                if joint_heads:
                    # radix-decode the joint sample into the family's
                    # sub-actions (last head varies fastest)
                    a_joint = acts[0]
                    decoded = []
                    for n in reversed(act_ns):
                        decoded.append(a_joint % np.int32(n))
                        a_joint = a_joint // np.int32(n)
                    acts = list(reversed(decoded))
                acts = tuple(acts)

            # ---- physics / reward / reset: identical to the universal
            #      recorder (ops/pallas_record.py)
            state = fs.step(cur, acts, aux, z, bs)
            violated = fs.violated(state)
            qs = fs.quantities(state, aux)
            wse = bias - _wse_err(ref_cfg[0], qs[0], refs_now[:R])
            for jr in range(1, n_ref):
                wse = wse - _wse_err(ref_cfg[jr], qs[jr],
                                     refs_now[jr * R:(jr + 1) * R])
            reward = jnp.where(violated, violation_reward, wse)

            for i, (ss, s2, r0) in enumerate(zip(state_s, state,
                                                 fs.reset_state(bits))):
                ss[:] = jnp.where(violated, r0, s2)
                out_state[i][k] = ss[:]
            if n_prev:
                a_in = acts[0] if len(acts) == 1 else acts
                for pa, b in zip(bs_refs,
                                 fs.advance_bridges(bs, a_in, cur, aux)):
                    pa[:] = jnp.where(violated, 0, b)
            for jr in range(n_ref):
                out_ref[jr][k] = refs_now[jr * R:(jr + 1) * R]
            for jr, a in enumerate(raws if cont else acts):
                out_act[jr][k] = a
            out_reward[k] = reward
            out_done[k] = violated.astype(jnp.float32)

            if has_rot:
                c_new, s_new = fs.rot_advance(rc, rs, violated)
                c_ref[:] = c_new
                s_ref[:] = s_new
            w_advance(pid * chunk + k, violated)
            return 0

        jax.lax.fori_loop(0, chunk, body, 0)

    const = pl.BlockSpec((R, LANE), lambda i: (0, 0))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    tblk = pl.BlockSpec((chunk, R, LANE), lambda i: (i, 0, 0))
    traj_f = jax.ShapeDtypeStruct((n_steps, R, LANE), jnp.float32)
    traj_a = jax.ShapeDtypeStruct(
        (n_steps, R, LANE), jnp.float32 if cont else jnp.int32)
    out_shapes = ((traj_f,) * (n_state + n_ref) + (traj_a,) * n_act
                  + (traj_f, traj_f))
    scratch_shapes = (
        [pltpu.VMEM(shape, jnp.float32) for _ in range(n_state)]
        + [pltpu.VMEM(shape_r, jnp.float32) for _ in range(4)]
        + [pltpu.VMEM(shape_r, jnp.uint32)]
        + ([pltpu.VMEM(shape, jnp.float32) for _ in range(2)]
           if n_rows == 1 else [])
        + ([pltpu.VMEM(shape, jnp.float32) for _ in range(2)]
           if has_rot else [])
        + ([pltpu.VMEM((4 * n_rows * R, LANE), jnp.float32)]
           if has_wf else [])
        + [pltpu.VMEM(shape, dt) for dt in bds]
    )

    n_smem = 6 if cont else 5

    @jax.jit
    def rollout(seed, w1, b1, w2, b2, *rest):
        if cont:
            ls, state0 = rest[0], rest[1:]
            extra = (jnp.asarray(ls, jnp.float32),)
        else:
            state0 = rest
            extra = ()
        out = pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            out_shape=out_shapes,
            in_specs=[smem] * n_smem + [const] * n_state,
            out_specs=(tblk,) * n_sig,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32),
          jnp.asarray(w1, jnp.float32), jnp.asarray(b1, jnp.float32),
          jnp.asarray(w2, jnp.float32), jnp.asarray(b2, jnp.float32),
          *extra, *state0)
        return dict(zip(names, out))

    rollout.signals = names
    rollout.state_names = tuple(fs.state_names)
    rollout.ref_names = tuple("ref_" + c["name"] for c in ref_cfg)
    rollout.act_names = tuple(fs.act_names)
    rollout.obs_spec = obs_spec
    rollout.act_ns = act_ns
    rollout.joint_heads = joint_heads
    rollout.n_out = A
    rollout.cont = cont
    rollout.act_range = fs.act_range
    rollout.obs_dim = F
    rollout.n_state = n_state
    rollout.fs_pre_step = fs.pre_step
    rollout.fs_quantities = fs.quantities
    return rollout


def fused_policy_init_planes(env, n_envs, randomize=None, seed=0):
    """Initial ``(R, LANE)`` state planes for the universal policy
    recorder / PPO trainer: zeros for the drive state (the in-kernel
    reset value for every core plane), the supply planes\' proper
    reset values (AC1: (phi, t) = (0, 0); RC: (u_0, 0) — zeros would
    mis-start the RC element at 0 V, voltage_supplies.py:75-123) and,
    with ``randomize``, per-env motor-parameter draws uniform in each
    configured [lo, hi] range (``seed`` feeds the host-side generator)."""
    fs = _policy_family(env, n_envs // LANE, "random", randomize)
    R = n_envs // LANE
    planes = [np.zeros((R, LANE), np.float32) for _ in range(fs.n_state)]
    n_param = getattr(fs, "n_param", 0)
    # plane layout: core + supply + params + (flux-observer planes for
    # the psi_angle dq-wrapper families)
    n_obspsi = getattr(fs, "n_obspsi", 0)
    if fs.sup_mode == "rc":
        u0 = float(env.physical_system.supply.parameter["u_0"])
        planes[fs.n_state - fs.n_sup - n_param - n_obspsi] += np.float32(u0)
    if n_param:
        # draw the initial motor instances host-side — zero parameter
        # planes would be degenerate motors (1/l = inf) until the first
        # violation reset redraws them in-kernel
        rng = np.random.default_rng(seed)
        for j, (lo, hi) in enumerate(fs.param_ranges):
            planes[fs.n_state - n_obspsi - n_param + j] = rng.uniform(
                lo, hi, (R, LANE)).astype(np.float32)
    return tuple(jnp.asarray(x) for x in planes)
