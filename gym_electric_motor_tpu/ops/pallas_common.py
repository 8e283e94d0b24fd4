"""Shared machinery for the fused Pallas rollout kernels: the
in-kernel PRNG, supply/load/converter env-arg closures, and the
reference-generator recurrences (wiener/laplace/const/waveform/
switched) every family kernel builds on.  Split out of the former
pallas_rollout.py monolith (round 4); see that module for the
design overview and reference citations."""

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


def _fused_check_system(ps, allow_dead_time=False, allow_dq=False,
                        allow_state_noise=False,
                        allow_dq_wrapper=()):
    """Reject silently-ignorable-but-wrong env configurations LOUDLY.

    Observation-only wrappers (CurrentSum/CosSin/FluxObserver,
    physical_system_wrappers/) are fine: the fused kernels derive
    rewards/constraints from the raw drive state and never emit wrapper
    observation channels.  The DeadTimeProcessor action delay is fused by
    the universal FAMILY builders (``allow_dead_time=True`` — carried
    action planes, see ``_wrap_dead_time``) but not by the specialized
    kernels.  Wrappers that change the physics or the action contract
    otherwise (StateNoiseProcessor's reward-relevant state noise, the
    advance-angle DqToAbcActionProcessor wrapper) must run on the
    general XLA path — without this check the kernels would simulate
    different physics than the env contract.  The base systems'
    ``control_space='dq'`` IS fused by the family builders
    (``allow_dq=True`` — the dq action rotates to abc inside
    ``physics_step`` at the same angle the XLA path uses); the
    specialized kernels keep rejecting it.
    """
    ok = (_FUSED_OK_WRAPPERS
          + (("DeadTimeProcessor",) if allow_dead_time else ())
          + (("StateNoiseProcessor",) if allow_state_noise else ())
          + tuple(allow_dq_wrapper))
    chain = []
    cur = ps
    while hasattr(cur, "inner"):  # PhysicalSystemWrapper chain
        chain.append(type(cur).__name__)
        cur = cur.inner
    bad = [n for n in chain if n not in ok]
    if bad:
        raise NotImplementedError(
            f"fused kernels support observation-only wrappers "
            f"{_FUSED_OK_WRAPPERS}; got {bad} — use the general XLA path "
            f"(VectorEnv.rollout)")
    if getattr(cur, "control_space", "abc") != "abc" and not allow_dq:
        raise NotImplementedError(
            "fused kernels sample abc converter actions; "
            "control_space='dq' runs on the general XLA path "
            "(VectorEnv.rollout)")


def _fused_constraint_mode(env, default_desc, allow_none=True):
    """Validate the env's constraint set against what the kernel
    implements.

    The fused kernels hard-code each family's CATALOG-DEFAULT violation
    check (LimitConstraint on the DC currents, the squared dq current
    circle for AC machines) as branch-free plane arithmetic — they never
    interpret ``env.constraint_monitor`` at run time.  Without this
    check, an env built with custom constraints (or ``constraints=()``,
    the grid-simulation configuration) would be SILENTLY simulated with
    the wrong termination semantics.

    ``default_desc``: tuple of ``('limit', (names...))`` /
    ``('squared', (states...))`` describing the family default.  Returns
    ``'default'`` or ``'none'`` (empty constraint set — the family must
    then emit constant-False violations); anything else raises."""
    cons = env.constraint_monitor.constraints
    if len(cons) == 0:
        if allow_none:
            return "none"
        raise NotImplementedError(
            "this specialized kernel implements the catalog-default "
            "constraints; constraints=() runs on the universal family "
            "kernels (make_fused_rollout) or the XLA path")
    desc = []
    for c in cons:
        tn = type(c).__name__
        if tn == "LimitConstraint":
            desc.append(("limit", tuple(c.observed_state_names)))
        elif tn == "SquaredConstraint":
            desc.append(("squared", tuple(c.states)))
        else:
            desc.append((tn, None))
    if tuple(desc) == tuple(default_desc):
        return "default"
    raise NotImplementedError(
        f"fused kernels implement the catalog-default constraints "
        f"{default_desc} (or constraints=()); got {tuple(desc)} — use "
        f"the general XLA path (VectorEnv.rollout)")


_DEFAULT_CONSTRAINT_DESC = {
    "PermExDc": (("limit", ("i",)),),
    "SeriesDc": (("limit", ("i",)),),
    "ShuntDc": (("limit", ("i_a",)), ("limit", ("i_e",))),
    "ExtExDc": (("limit", ("i_a",)), ("limit", ("i_e",))),
    "EESM": (("squared", ("i_sq", "i_sd")), ("limit", ("i_e",))),
    "SRM": (("limit", ("i_a", "i_b", "i_c")),),
}


def _require_default_constraints(env):
    """Specialized (non-family) kernels hard-code the catalog-default
    violation check and have no constants-off mode — reject both custom
    constraint sets AND ``constraints=()`` loudly (the universal family
    kernels handle the latter)."""
    kind = env.physical_system.motor.kind
    desc = _DEFAULT_CONSTRAINT_DESC.get(
        kind, (("squared", ("i_sq", "i_sd")),))
    _fused_constraint_mode(env, desc, allow_none=False)


def _fused_control_space(ps):
    """'abc' or 'dq' of the base system under the wrapper chain."""
    cur = ps
    while hasattr(cur, "inner"):
        cur = cur.inner
    return getattr(cur, "control_space", "abc")


def _fused_dq_wrapper(ps, type_names):
    """The ADVANCE-ANGLE DqToAbcActionProcessor wrapper instance in the
    chain (dq_to_abc_action_processor.py:8-170), or None.  The caller
    validates the variant.  All variants are fused: rotor-angle
    ('epsilon') forms, the SCIM/DFIM psi_angle variants (the FluxObserver
    rides as extra state planes), and composition with DeadTimeProcessor
    (the reference delays the CONVERTED duty, rotated at the PUSH-time
    angle — handled by _wrap_dead_time's ``convert`` hook, which stores
    converted duties in the delay planes)."""
    cur, found = ps, None
    while hasattr(cur, "inner"):
        if type(cur).__name__ in type_names:
            found = cur
        cur = cur.inner
    return found


def _parse_randomize(randomize, allowed, kind, desc):
    """Shared ``randomize={param: (lo, hi)}`` parsing for the family
    builders: validates the names against the family's ``allowed`` set
    (``desc`` words the rejection) and returns ``(param_names, n_param,
    p_idx, param_ranges)`` in the canonical sorted-name order the state
    planes use."""
    randomize = dict(randomize or {})
    for nm in randomize:
        if nm not in allowed:
            raise NotImplementedError(
                f"randomize supports {desc} {allowed} for {kind}; got "
                f"{nm!r} — use the XLA path's dynamic_params=True")
    param_names = tuple(sorted(randomize))
    p_idx = {nm: j for j, nm in enumerate(param_names)}
    param_ranges = tuple(
        (float(randomize[nm][0]), float(randomize[nm][1]))
        for nm in param_names)
    return param_names, len(param_names), p_idx, param_ranges


def _wrap_j_resolve(resolve, mload, p_idx):
    """Append the per-env TOTAL inertia to the family's resolved
    coefficient tuple when 'j_rotor' is randomized (el unpacks slice
    their fixed prefix; the mech branch reads ``pc[-1]``).  Returns
    ``(resolve', j_rand)``."""
    if "j_rotor" not in p_idx:
        return resolve, False
    if mload.mode != "poly":
        raise NotImplementedError(
            "randomize('j_rotor') needs a PolynomialStaticLoad (SC "
            "tasks) — fixed/OU/profile speed loads never read the "
            "inertia")
    j_load, j_idx = mload.j_load, p_idx["j_rotor"]

    def resolve2(pp):
        return resolve(pp) + (np.float32(j_load) + pp[j_idx],)

    return resolve2, True


def _u_sup_plane_idx(p_idx, sup):
    """Index of the randomized supply voltage plane ('u_sup' in
    ``randomize``), or None.  Ideal supply: per-env DC-link voltage
    (battery/DC-link sag robustness).  RC supply: per-env SOURCE voltage
    u_0 feeding the RC element (the cap plane integrates toward it; the
    reset cap value is the drawn u_0, RCVoltageSupply semantics).  AC
    supplies are waveform-parameterized, not randomizable here."""
    if "u_sup" not in p_idx:
        return None
    if sup.mode not in ("ideal", "rc"):
        raise NotImplementedError(
            "randomize('u_sup') needs the IdealVoltageSupply (DC-link "
            "value) or RCVoltageSupply (source u_0) — AC supplies have "
            "waveform dynamics")
    return p_idx["u_sup"]


def _sup_reset_planes(sup, bits, pdraws, u_idx):
    """``sup_reset`` with the RC cap plane seeded at the PER-ENV
    randomized source voltage (the reference's RCVoltageSupply
    initializes ``_u_sup = u_0``); consumes the same bit stream as the
    plain reset, so non-randomized paths are bit-identical."""
    planes = sup.sup_reset(bits)
    if u_idx is not None and sup.mode == "rc":
        planes = (pdraws[u_idx],) + planes[1:]
    return planes


def _param_reset_draws(bits, shape, param_ranges):
    """Per-violation uniform redraws of the randomized parameter planes
    (a reset is a new motor instance)."""
    return tuple(
        np.float32(lo) + np.float32(hi - lo) * _uniform_from_bits(
            bits(shape))
        for lo, hi in param_ranges)


def _fused_state_noise(ps, state_names, limits_of, allowed=None):
    """Parse a StateNoiseProcessor from the wrapper chain into an
    in-kernel OBSERVATION-noise closure (state_noise_processor.py:4-98:
    noise is added to the reported state — reward, constraint checks and
    recorded signals see it — while the true ODE state evolves clean).

    ``limits_of(name) -> float`` gives the denormalization limit of a
    family state plane (the wrapper adds noise in NORMALIZED units).
    Returns ``observe(state, bits) -> state'`` perturbing the named
    planes with fresh per-step draws, or ``None`` when no processor is
    present.  Supported distributions: normal (Box-Muller, pairs shared
    across planes), uniform, laplace (inverse CDF).  Unsupported
    configurations (unknown dist, noise on non-plane states like torque,
    multiple processors) reject loudly — the XLA path covers them.
    """
    procs, cur = [], ps
    while hasattr(cur, "inner"):
        if type(cur).__name__ == "StateNoiseProcessor":
            procs.append(cur)
        cur = cur.inner
    if not procs:
        return None
    if len(procs) > 1:
        raise NotImplementedError(
            "fused kernels support one StateNoiseProcessor — use the "
            "general XLA path for stacked noise wrappers")
    w = procs[0]
    names = w._states
    if names == "all":
        raise NotImplementedError(
            "StateNoiseProcessor(states='all') noises derived states "
            "(torque, u) that are not kernel planes — use the general "
            "XLA path or name the drive states explicitly")
    names = tuple(names)
    ok = tuple(state_names) if allowed is None else tuple(allowed)
    for nm in names:
        if nm not in ok:
            raise NotImplementedError(
                f"fused StateNoiseProcessor supports noise on {ok} for "
                f"this family/task (derived quantities — torque, "
                f"flux-frame dq currents — are computed from the TRUE "
                f"state in the reference, so noising their inputs is not "
                f"representable as plane noise); got {nm!r} — use the "
                f"general XLA path")
    dist = w._random_dist
    kw = dict(w._random_kwargs)
    loc = float(kw.get("loc", 0.0))
    scale = float(kw.get("scale", 1.0))
    low, high = float(kw.get("low", 0.0)), float(kw.get("high", 1.0))
    idx = tuple(state_names.index(nm) for nm in names)
    lims = tuple(float(limits_of(nm)) for nm in names)

    def observe(state, bits):
        shape = state[0].shape
        draws = []
        if dist == "normal":
            # one Box-Muller pair per two planes
            for j in range(0, len(names), 2):
                u1 = _uniform_from_bits(bits(shape))
                u2 = _uniform_from_bits(bits(shape))
                rad = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
                th = np.float32(TWO_PI) * u2
                draws.append(loc + scale * rad * jnp.cos(th))
                if j + 1 < len(names):
                    draws.append(loc + scale * rad * jnp.sin(th))
        elif dist == "uniform":
            for _ in names:
                u = _uniform_from_bits(bits(shape))
                draws.append(np.float32(low)
                             + np.float32(high - low) * u)
        elif dist == "laplace":
            for _ in names:
                u = _uniform_from_bits(bits(shape))
                c = u - 0.5
                mag = -jnp.log(jnp.maximum(1.0 - 2.0 * jnp.abs(c),
                                           1e-12))
                draws.append(loc + scale * jnp.sign(c) * mag)
        else:
            raise NotImplementedError(
                f"fused StateNoiseProcessor supports normal/uniform/"
                f"laplace; got {dist!r} — use the general XLA path")
        out = list(state)
        for k, i, lm in zip(range(len(names)), idx, lims):
            out[i] = out[i] + draws[k] * np.float32(lm)
        return tuple(out)

    return observe


def _fused_dead_time_steps(ps):
    """Total DeadTimeProcessor delay (control cycles) in the wrapper
    chain; 0 when absent (dead_time_processor.py:9-88)."""
    cur, steps = ps, 0
    while hasattr(cur, "inner"):
        if type(cur).__name__ == "DeadTimeProcessor":
            steps += int(cur.dead_time)
        cur = cur.inner
    return steps


def _wrap_mech_time(mload, tau, physics, advance, n_bridge, has_cs, k_int):
    """Append ONE carried float32 time plane for time-dependent mechanical
    models (ExternalSpeedLoad): the cycle-start absolute time, accumulated
    ``t += tau`` in float32 exactly like the XLA path's ``PhysicsState.t``
    (bit-lockstep; the kernels' violation reset to 0 reproduces the env
    reset restarting the profile at t = 0).  The wrapped physics strips
    the plane off the carried ``bs`` tuple and passes it as ``t0`` so the
    family RK4 can evaluate the profile at the stage times, matching
    ``ops.integrators.rk4_step``.  Identity pass-through for
    time-independent loads."""
    base = (jnp.int32,) * n_bridge
    if not getattr(mload, "needs_time", False):
        return physics, advance, n_bridge, base
    # interlocking composes too: the family interlock branches integrate
    # their two sub-intervals at stage times (t0, t0 + dt0), so the
    # profile is evaluated at the same absolute times as the XLA path's
    # per-sub-interval integration (k_int kept in the signature for the
    # callers' sake)

    if has_cs:
        def physics2(state, a, c, s, z=None, bs=None):
            t0 = bs[-1]
            ibs = tuple(bs[:-1]) or None
            return physics(state, a, c, s, z, ibs, t0=t0)
    else:
        def physics2(state, a, z=None, bs=None):
            t0 = bs[-1]
            ibs = tuple(bs[:-1]) or None
            return physics(state, a, z, ibs, t0=t0)

    def advance2(bs, acts):
        t0 = bs[-1]
        ibs = tuple(bs[:-1]) or None
        inner = advance(ibs, acts) if n_bridge else ()
        return tuple(inner) + (t0 + np.float32(tau),)

    return physics2, advance2, n_bridge + 1, base + (jnp.float32,)


def _norm_advance(advance):
    """Normalize a family's advance closure to the kernels' 4-arg
    protocol ``advance(bs, acts, cur=None, aux=None)`` — the pre-step
    state/aux are only consumed by the dead-time ``convert`` path (the
    DqToAbc + DeadTime composition pushes the CONVERTED duty, which
    needs the push-time rotation); every other closure ignores them."""
    import inspect

    if len(inspect.signature(advance).parameters) >= 4:
        return advance
    return lambda bs, acts, cur=None, aux=None: advance(bs, acts)


def _wrap_dead_time(ps, act_dtypes, inner_physics, inner_advance,
                    n_bridge, has_cs, base_dtypes=None, convert=None):
    """Fuse the DeadTimeProcessor action delay into a family's physics/
    bridge closures (dead_time_processor.py:9-88: the converter applies
    the action from ``steps`` control cycles ago; the delay deque starts
    as zero actions after every reset).

    The deque becomes ``steps * n_planes`` extra carried planes PREPENDED
    to the family's bridge planes (newest action first), riding the same
    fori-carry / scratch machinery — the kernels' violation reset to 0
    reproduces the wrapper's zero-action refill.  ``act_dtypes`` gives
    one dtype per STORED plane (int32 finite / float32 cont);
    ``has_cs`` selects the three-phase closure signature
    ``(state, a, c, s, z, bs)`` vs the DC/induction ``(state, a, z, bs)``.

    ``convert``: optional ``fn(acts, cur, aux) -> tuple`` mapping the
    agent action to the STORED planes at PUSH time — the DqToAbc-wrapper
    + DeadTime composition, where the reference delays the CONVERTED abc
    duty (rotated at the push-time angle, dq_to_abc_action_processor.py
    composed over dead_time_processor.py).  With ``convert`` the deque
    holds the converted planes (``act_dtypes`` describes THEM, so its
    arity may differ from the agent-action arity) and ``inner_physics``
    receives the stored tuple as its action — the family must therefore
    accept the converted form when it requests conversion-at-push.  The
    returned ``advance`` takes ``(bs, acts, cur=None, aux=None)``; the
    kernels pass the pre-step state and aux at every call site
    (``_norm_advance`` upgrades conversion-free closures).

    Returns ``(physics', advance', n_bridge', bridge_dtypes')`` —
    identity pass-through when the env has no DeadTimeProcessor.
    """
    steps = _fused_dead_time_steps(ps)
    if base_dtypes is None:
        base_dtypes = (jnp.int32,) * n_bridge
    if not steps:
        return inner_physics, inner_advance, n_bridge, base_dtypes
    n_pl = len(act_dtypes)
    n_d = steps * n_pl

    def _delayed(bs, acts):
        """(the action applied THIS cycle, the inner bridge planes)"""
        d = bs[:n_d]
        inner = tuple(bs[n_d:]) or None
        old = tuple(d[(steps - 1) * n_pl: steps * n_pl])
        if convert is None and not isinstance(acts, tuple):
            return old[0], inner
        return old, inner

    if has_cs:
        def physics(state, action, c, s, z=None, bs=None):
            a_d, ibs = _delayed(bs, action)
            return inner_physics(state, a_d, c, s, z, ibs)
    else:
        def physics(state, action, z=None, bs=None):
            a_d, ibs = _delayed(bs, action)
            return inner_physics(state, a_d, z, ibs)

    def advance(bs, acts, cur=None, aux=None):
        a_d, ibs = _delayed(bs, acts)
        new_inner = inner_advance(ibs, a_d) if n_bridge else ()
        if convert is not None:
            new = tuple(convert(acts, cur, aux))
        else:
            new = acts if isinstance(acts, tuple) else (acts,)
        return tuple(new) + tuple(bs[:n_d - n_pl]) + tuple(new_inner)

    return physics, advance, n_bridge + n_d, act_dtypes * steps + base_dtypes


def _make_fused_supply(ps, shape, tau, allow_polyphase=False):
    """Supply model shared by every universal family builder — the
    in-kernel counterpart of voltage_supplies.py.

    Non-ideal supplies carry per-env dynamics as extra ``(R, LANE)`` state
    planes appended after the family's core state.  Returned namespace:

    * ``mode``: ``'ideal' | 'ac1' | 'ac3' | 'rc'``; ``n_sup``: number of
      supply planes (0 or 2); ``names``: their record-signal names;
    * ``needs_i_sup``: True iff ``supply_u`` consumes the converter supply
      current (the RC element, voltage_supplies.py:75-123);
    * ``supply_u(sup_planes, i_sup) -> (u_sup, new_planes)``: the DC-link
      voltage for this control cycle plus advanced planes — a 3-TUPLE of
      per-phase planes in the polyphase 'ac3' mode;
    * ``sup_reset(bits)``: per-episode reset plane values (AC1/AC3 draw
      the random phase, voltage_supplies.py:126-213).

    AC3PhaseSupply (``voltage_len == 3``) only composes with NoConverter
    (grid simulation) — callers that implement that composition pass
    ``allow_polyphase=True`` (the induction family); everyone else gets
    the loud rejection and the general XLA path covers it.
    """
    sup_kind = ps.supply.kind
    sp_par = ps.supply.parameter
    if sup_kind == "AC3PhaseSupply" and not allow_polyphase:
        raise NotImplementedError(
            "fused kernels support IdealVoltageSupply/AC1PhaseSupply/"
            "RCVoltageSupply here (AC3 is polyphase and composes only "
            "with NoConverter grid simulation) — use the general XLA "
            "path (VectorEnv.rollout)")

    if sup_kind == "IdealVoltageSupply":
        mode, n_sup, names, needs_i_sup = "ideal", 0, (), False
        u_sup_c = float(ps.supply.u_nominal)

        def supply_u(sup, i_sup_val, u0=None):
            return (u_sup_c if u0 is None else u0), ()

        def sup_reset(bits):
            return ()
    elif sup_kind in ("AC1PhaseSupply", "AC3PhaseSupply"):
        # u_sup(t) = max_amp * sin(2 pi f t + phi), phi random per episode
        # (voltage_supplies.py:126-166); state planes (theta, theta_lo):
        # the FULL sine phase accumulated in DOUBLE-FLOAT32.  A plain
        # float32 time/phase accumulator loses ~ulp/2 per step with a
        # systematic component — measured ~0.08 rad of phase noise by 2M
        # steps even with period wrapping, and Kahan summation only bounds
        # the error relative to the (linearly growing) sum of |increments|
        # (measured 4.8e-3 rad at 2M steps).  TwoSum-based double-float
        # accumulation tracks the exact rounding error instead: theta
        # advances by the increment split into hi+lo float32 parts
        # (capturing the float64 value to ~1e-15) and wraps at 2 pi the
        # same way — residual phase error ~1.4e-9 rad at 2M steps, i.e.
        # drift-free for any launch length (tests/test_ac1_phase_drift.py
        # runs the closure 2M steps against the float64 closed form).
        # theta(0) = phi, so buffer-mode callers feed (phi0, 0) exactly as
        # they fed the old (phi, t=0) planes.  AC3PhaseSupply
        # (voltage_supplies.py:169-213) shares the phase machinery and
        # emits THREE phase planes u_i = max_amp * sin(theta + i*2pi/3).
        ac3 = sup_kind == "AC3PhaseSupply"
        mode, n_sup, needs_i_sup = ("ac3" if ac3 else "ac1"), 2, False
        names = ("sup_theta", "sup_theta_lo")
        f_ac, amp_ac = float(sp_par["f"]), float(sp_par["max_amp"])
        fixed_phase = float(sp_par.get("fixed_phase", 0.0)) > 0.0
        phi0_ac = float(sp_par.get("phase", 0.0))
        d_real = 2.0 * np.pi * f_ac * tau          # float64 increment
        DHI = np.float32(d_real)
        DLO = np.float32(d_real - float(DHI))
        P2HI = np.float32(2.0 * np.pi)
        P2LO = np.float32(2.0 * np.pi - float(P2HI))

        def _dfadd(hi, lo, dhi, dlo):
            """double-float32 (hi, lo) += (dhi, dlo): TwoSum on the hi
            parts, error + lo parts folded, fast-two-sum renormalize"""
            s = hi + dhi
            bb = s - hi
            err = (hi - (s - bb)) + (dhi - bb)
            lo2 = lo + (err + dlo)
            hi2 = s + lo2
            return hi2, lo2 - (hi2 - s)

        OFF1 = np.float32(2.0 / 3.0 * np.pi)
        OFF2 = np.float32(4.0 / 3.0 * np.pi)

        def supply_u(sup, i_sup_val, u0=None):
            assert u0 is None  # _u_sup_plane_idx rejects AC supplies
            theta, lo = sup
            if ac3:
                u = (amp_ac * jnp.sin(theta),
                     amp_ac * jnp.sin(theta + OFF1),
                     amp_ac * jnp.sin(theta + OFF2))
            else:
                u = amp_ac * jnp.sin(theta)
            theta, lo = _dfadd(theta, lo, DHI, DLO)
            wrap = theta >= np.float32(2.0 * np.pi)
            tw, lw = _dfadd(theta, lo, -P2HI, -P2LO)
            theta = jnp.where(wrap, tw, theta)
            lo = jnp.where(wrap, lw, lo)
            return u, (theta, lo)

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

        def supply_u(sup, i_sup_val, u0=None):
            u, t_c = sup
            u0_v = u0_rc if u0 is None else u0
            dt = jnp.minimum(t_c, tau)
            u_new = u + dt * ((u0_v - u - r_rc * i_sup_val)
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
                            "OrnsteinUhlenbeckLoad", "ExternalSpeedLoad"))
    mech_rhs = mech_rhs_t = omega_reset = None
    omega_fixed = None
    needs_step_noise = False

    mech_rhs_j = None
    if load.kind == "PolynomialStaticLoad":
        mode = "poly"
        lp = load.parameter
        a_c, b_c, c_c = float(lp["a"]), float(lp["b"]), float(lp["c"])
        j_load = float(load.j_load)
        j_total = j_load + float(j_rotor)
        tau_decay = 1e-3
        omega_lin = a_c / j_total * tau_decay

        def mech_rhs(w, t_e, z):
            sign = jnp.sign(w)
            a_term = jnp.where(jnp.abs(w) > omega_lin, sign * a_c,
                               j_total / tau_decay * w)
            t_load = sign * c_c * w * w + b_c * w + a_term
            return (t_e - t_load) * (1.0 / j_total)

        def mech_rhs_j(w, t_e, z, jt):
            """The mech_rhs with a PER-ENV total inertia plane (j_rotor
            domain randomization); same expressions with j_total -> jt."""
            sign = jnp.sign(w)
            olin = a_c / jt * np.float32(tau_decay)
            a_term = jnp.where(jnp.abs(w) > olin, sign * a_c,
                               jt * np.float32(1.0 / tau_decay) * w)
            t_load = sign * c_c * w * w + b_c * w + a_term
            return (t_e - t_load) / jt

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
    elif load.kind == "ExternalSpeedLoad":
        # omega forced onto the host-defined profile by forward-Euler
        # forcing (external_speed_load.py:113-119; loads.py factory): the
        # rhs is TIME-DEPENDENT, so the families pass the RK4 stage time
        # ``ts`` (cycle-start time from the carried float plane, see
        # ``_wrap_mech_time``) and the profile closure traces into the
        # kernel — it must be pure jnp with no captured device arrays
        # (the same contract the jitted XLA path already imposes).
        mode = "external"
        profile = load.speed_profile
        pk = dict(load.speed_profile_kwargs or {})
        tau_l = float(load.parameter["tau"])

        def mech_rhs_t(w, t_e, z, ts):
            w_next = profile(t=ts + np.float32(tau_l), **pk)
            return (w_next - w) * np.float32(1.0 / tau_l)

        # evaluated at BUILD time (inside the kernel trace omnistaging
        # would turn even this constant profile(0) into a tracer)
        omega0_ext = np.float32(float(profile(t=0.0, **pk)))

        def omega_reset(bits):
            return jnp.full(shape, omega0_ext)
    else:
        mode = "const"
        omega_fixed = float(load.omega_fixed)

    return SimpleNamespace(mode=mode, mech=mode != "const",
                           mech_rhs_j=mech_rhs_j,
                           j_load=float(getattr(load, 'j_load', 0.0) or 0.0),
                           omega_fixed=omega_fixed, mech_rhs=mech_rhs,
                           mech_rhs_t=mech_rhs_t,
                           needs_time=mode == "external",
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
    SHADOW rows.  NESTED switched sub-generators expand recursively: a
    switched shadow row gets its own shadow block appended further down,
    so a parent's info always precedes its children's in the returned
    list (the selection pass runs children-first).  Returns
    ``(rows, infos)`` with
    ``infos = [(primary_row, shadow_start_row, K, p), ...]``."""
    rows = list(ref_cfg)
    infos = []
    i = 0
    while i < len(rows):
        c = rows[i]
        # buffer/validation-mode configs keep kind='switched' but carry no
        # sub rows (the reference machinery is never touched there)
        if c.get("kind") == "switched" and "subs" in c:
            infos.append((i, len(rows), len(c["subs"]), tuple(c["p"])))
            rows.extend(c["subs"])
        i += 1
    return rows, infos


def _ref_n_rows(ref_cfg):
    """Total in-kernel reference rows (primaries + switched shadows)."""
    return len(_expand_ref_rows(ref_cfg)[0])


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

    def _switched_cfg(s):
        """switched generator: primary row = selection machinery (rk/rl
        carry the super-episode counter/length drawn from
        super_episode_lengths, rs the active sub index), the K sub
        generators become static shadow rows
        (switched_reference_generator.py:8-95).  Switched SUB-generators
        recurse — the nested row becomes a shadow with its own shadow
        block (expanded by ``_expand_ref_rows``)."""
        assert all(sub.kind in _FUSED_REF_KINDS or sub.kind == "switched"
                   for sub in s.subs), (
            f"switched sub-generators must be scalar fused kinds "
            f"{_FUSED_REF_KINDS} or switched themselves; got "
            f"{[sub.kind for sub in s.subs]!r}")
        idx = names.index(s.reference_state)
        n_pow = float(np.asarray(rw._n).ravel()[idx])
        lo, hi = s.super_episode_lengths
        return dict(
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
            subs=[_switched_cfg(sub) if sub.kind == "switched"
                  else _one(sub) for sub in s.subs],
        )

    cfgs = []
    for s in env.reference_generator.subs:
        if s.kind == "switched" and require_wiener:
            cfgs.append(_switched_cfg(s))
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

    def _put_rows(ref, updates):
        """Write ``{row_index: (R, LANE) block}`` into the row-stacked
        ``(n_ref * R, LANE)`` plane with ONE aligned full-plane store.
        Sub-8-sublane row-slice WRITES (``ref[pi*R:(pi+1)*R] = ...`` at
        R < 8) crash the Mosaic compiler; sub-sublane READS compile fine,
        so read-modify-concat-write keeps any batch size compiling."""
        blocks = [updates.get(r, ref[r * R:(r + 1) * R])
                  for r in range(n_ref)]
        ref[:] = jnp.concatenate(blocks, axis=0)

    def _switched_post(switch_mask_rows, reset_rows=None, is_init=False):
        """After the standard per-row advance/init: (re)draw the active sub
        where the super-episode expired, re-init the newly-active shadow
        from the primary's current value on PURE switches (the reference
        passes initial_reference=value; on env/violation resets the subs
        keep their own standard reset draw), and write the selected shadow
        value into the primary row.  All plane stores go through
        ``_put_rows`` (aligned full-plane writes) and the mask concat uses
        float blocks — both Mosaic requirements below 8 sublanes.

        NESTED switched shadows cascade: when a parent's pure switch picks
        a switched child, the child is FORCED to re-switch too, seeded
        from the parent's value (the reference calls
        ``child.reset(initial_reference=value)``, which redraws the
        child's schedule/active and seeds its chosen leaf,
        switched_reference_generator.py:66-69).  The switch pass runs
        parents-first (infos order) so the forced mask/seed reach the
        child's own iteration; the selection pass runs CHILDREN-FIRST so
        a parent reads its child's freshly-selected value."""
        new_actives = {}
        forced = {}  # child primary row -> (mask, seed) from its parent
        for (pi, s0, K, p) in switched_infos:
            psl = slice(pi * R, (pi + 1) * R)
            own = switch_mask_rows[psl]
            f_m, f_seed = forced.pop(pi, (None, None))
            sw = own if f_m is None else (own | f_m)
            prim_prev = rv_ref[psl]
            seed_base = (prim_prev if f_m is None
                         else jnp.where(f_m, f_seed, prim_prev))
            act = jnp.where(sw, _draw_active(K, p), rs_ref[psl])
            _put_rows(rs_ref, {pi: act})
            new_actives[pi] = act
            if is_init:
                continue
            pure = sw if reset_rows is None else (
                sw & jnp.logical_not(reset_rows[psl]))
            rv_up, rk_up, row_masks = {}, {}, []
            for k in range(K):
                r = s0 + k
                m = pure & (act == np.float32(k))
                # clip the seed into the SUB's own margins: const subs
                # ignore initial_reference entirely and the
                # subepisoded kinds clip it (subepisoded_reference_
                # generator.py:102-117) — without this, a
                # wiener->const switch would leak the old wiener value
                # for one step
                sub = ref_cfg[r]
                seed_v = jnp.clip(seed_base, np.float32(sub["mlo"]),
                                  np.float32(sub["mhi"]))
                if sub.get("kind") == "switched":
                    # nested child: its rv is overwritten by its own
                    # selection — propagate the switch + seed instead
                    cm, cseed = forced.get(r, (None, None))
                    forced[r] = (m if cm is None else (cm | m),
                                 seed_v if cseed is None
                                 else jnp.where(m, seed_v, cseed))
                else:
                    rv_up[r] = jnp.where(m, seed_v,
                                         rv_ref[r * R:(r + 1) * R])
                rk_up[r] = jnp.where(m, 0.0, rk_ref[r * R:(r + 1) * R])
                row_masks.append((r, m.astype(jnp.float32)))
            if rv_up:
                _put_rows(rv_ref, rv_up)
            _put_rows(rk_ref, rk_up)
            # fresh sub-episode params for the re-initialized shadows
            # (one combined draw — the per-k masks are disjoint; float
            # concat: Mosaic rejects i1 vreg concats at sub-sublane R)
            zero = jnp.zeros(shape, jnp.float32)
            blocks = [zero] * n_ref
            for r, mf in row_masks:
                blocks[r] = mf
            _draw_params(jnp.concatenate(blocks, axis=0) > 0.5)
        # selection pass, children before parents
        for (pi, s0, K, p) in reversed(switched_infos):
            act = new_actives[pi]
            sel = jnp.zeros(shape, jnp.float32)
            for k in range(K):
                ssl = slice((s0 + k) * R, (s0 + k + 1) * R)
                sel = sel + jnp.where(act == np.float32(k), rv_ref[ssl],
                                      0.0)
            _put_rows(rv_ref, {pi: sel})

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


def _pick_chunk(n_steps, n_planes, R, chunk):
    """Steps per grid iteration: the output window (``n_planes`` signals x
    chunk x (R, LANE) x 4 B per buffer, ~4 MiB, so ~8 MiB double-buffered
    — the compiler's scoped-VMEM limit is 16 MiB), clamped to ``n_steps``
    and snapped down to a divisor of it."""
    if chunk is None:
        chunk = min(max(1, (64 * LANE) // (R * n_planes)), n_steps)
        while n_steps % chunk:
            chunk -= 1
    assert n_steps % chunk == 0, "n_steps must be a multiple of chunk"
    return chunk


def _policy_obs_spec(mech, w_lim, omega_fixed, entries):
    """Observation feature spec for the policy-in-the-loop kernels
    (``ops.pallas_policy.make_fused_policy_record_universal``): the speed
    feature (normalized omega plane for dynamic-speed configs, a constant
    for const-speed ones — matching the XLA env's normalized ``omega``
    observation channel) followed by the family's ``entries``.  Each entry
    is one of ``("const", value)``, ``("state", plane_idx, scale)`` or
    ``("cos"/"sin", plane_idx)`` (angle states enter through cos/sin
    exactly like the reference's CosSinProcessor RL setup,
    cos_sin_processor.py:7-89).  The n_ref reference features are appended
    by the kernel builder, so both the kernel and the host-side PPO
    reconstruction derive the identical observation from this one spec."""
    head = ((("state", 0, 1.0 / w_lim),) if mech
            else (("const", float(omega_fixed) / w_lim),))
    return head + tuple(entries)


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


