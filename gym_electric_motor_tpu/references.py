"""Reference generators as on-device stochastic processes.

The reference package precomputes a host-side numpy trajectory per random-
length sub-episode and replays one value per step
(``/root/reference/src/gym_electric_motor/reference_generators/``).  On TPU
that buffer round-trip would dominate the step time, so every generator is
re-expressed as either

* a *closed-form* function of the step index and per-sub-episode parameters
  (sinusoid, step, triangle, sawtooth, const), or
* a *one-draw-per-step recurrence* carried in the env state (Wiener, Laplace
  processes: ``value' = clip(value + draw, margin)``, exactly the loop in
  ``wiener_process_reference_generator.py:30-49``),

with the sub-episode re-randomization (length 500..2000, new process
parameters) performed in-kernel via ``lax.cond`` when ``k`` reaches the
sub-episode length (``subepisoded_reference_generator.py:96-117``).

State layout per scalar generator (stacked for composite generators):
``value`` (current normalized reference), ``k``, ``ep_len``, ``p[6]``
(kind-specific parameters), ``key``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .utils import rng

P_SIGMA, P_AMPLITUDE, P_FREQUENCY, P_OFFSET, P_PHASE, P_WIDTH = range(6)
N_P = 6


def _uniform_in(key, lo, hi):
    return (hi - lo) * jax.random.uniform(key, ()) + lo


def _triangular01_from_u(u, left=0.0, mode=0.5, right=1.0):
    """Triangular(0, 0.5, 1) sample via inverse CDF (step_reference_generator.py:346)."""
    fc = (mode - left) / (right - left)
    lo_branch = left + jnp.sqrt(u * (right - left) * (mode - left))
    hi_branch = right - jnp.sqrt((1.0 - u) * (right - left) * (right - mode))
    return jnp.where(u < fc, lo_branch, hi_branch)


@dataclasses.dataclass
class ScalarRefSpec:
    """One generator referencing one state variable."""

    kind: str  # 'wiener' | 'laplace' | 'sinusoidal' | 'step' | 'triangle' | 'sawtooth' | 'const'
    reference_state: str
    sigma_range: tuple = (1e-3, 1e-1)
    amplitude_range: Optional[tuple] = None
    frequency_range: tuple = (1.0, 10.0)
    offset_range: Optional[tuple] = None
    episode_lengths: tuple = (500, 2000)
    limit_margin: Optional[object] = None  # float | (lo, hi) | None
    initial_range: Optional[tuple] = None  # wiener only
    reference_value: float = 0.5  # const only
    # resolved at bind time:
    tau: float = None
    margin: tuple = None  # (lo, hi) floats
    state_index: int = None

    def bind(self, state_names, limits, nominal, state_space_low, state_space_high, tau):
        """Resolve limit margins against the physical system
        (subepisoded_reference_generator.py:46-66)."""
        idx = list(state_names).index(self.reference_state)
        lo_s, hi_s = float(state_space_low[idx]), float(state_space_high[idx])
        if self.limit_margin is None:
            ratio = float(nominal[idx] / limits[idx])
            margin = (ratio * lo_s, ratio * hi_s)
        elif isinstance(self.limit_margin, (float, int)):
            margin = (float(self.limit_margin) * lo_s, float(self.limit_margin) * hi_s)
        else:
            margin = (float(self.limit_margin[0]) * lo_s, float(self.limit_margin[1]) * hi_s)
        bound = dataclasses.replace(self, tau=tau, margin=margin, state_index=idx)
        if bound.kind in ("sinusoidal", "step", "triangle", "sawtooth"):
            mlo, mhi = margin
            amp = bound.amplitude_range or (0.0, np.inf)
            amp = tuple(np.clip(amp, 0.0, (mhi - mlo) / 2.0))
            off = bound.offset_range or (-np.inf, np.inf)
            off = tuple(np.clip(off, mlo, mhi))
            bound = dataclasses.replace(bound, amplitude_range=amp, offset_range=off)
        if bound.kind == "wiener" and bound.initial_range is None:
            bound = dataclasses.replace(bound, initial_range=margin)
        return bound

    # ---------------- device functions ----------------

    def _draw_params(self, u, mlo=None, mhi=None):
        """Per-sub-episode parameters from a uniform block ``u`` (>= 6 slots);
        returns (ep_len, p[6]).

        ``mlo``/``mhi`` are the (possibly dynamic) limit margins carried in
        the generator state — dynamic so curriculum callbacks like
        RampingLimitMargin (callbacks.py:11-125) can widen them per episode
        without recompilation.  The caller supplies the uniforms so reset /
        advance each cost exactly ONE bits pass — the per-step hot path
        evaluates this under vmap even on non-regen steps, so the RNG pass
        count dominates the general-path step time (utils/rng.py)."""
        if mlo is None:
            mlo, mhi = self.margin
        lo, hi = self.episode_lengths
        ep_len = jnp.floor(float(lo) + (float(hi) - float(lo)) * u[0]).astype(jnp.int32)
        p = jnp.zeros((N_P,))
        if self.kind in ("wiener", "laplace"):
            log_r = np.log(np.asarray(self.sigma_range, dtype=np.float64))
            # exp instead of 10**x — pow lowers to a far slower kernel
            sigma = jnp.exp(float(log_r[0]) + (float(log_r[1]) - float(log_r[0])) * u[1])
            p = p.at[P_SIGMA].set(sigma)
        elif self.kind in ("sinusoidal", "step", "triangle", "sawtooth"):
            # re-clip the static ranges against the dynamic margins
            # (subepisoded_reference_generator.py:46-66 applied per draw)
            amp_lo = jnp.clip(jnp.asarray(float(self.amplitude_range[0])), 0.0, (mhi - mlo) / 2.0)
            amp_hi = jnp.clip(jnp.asarray(float(self.amplitude_range[1])), 0.0, (mhi - mlo) / 2.0)
            amp = amp_lo + (amp_hi - amp_lo) * u[1]
            f_lo, f_hi = map(float, self.frequency_range)
            freq = f_lo + (f_hi - f_lo) * u[2]
            off_static = (jnp.clip(jnp.asarray(float(self.offset_range[0])), mlo, mhi),
                          jnp.clip(jnp.asarray(float(self.offset_range[1])), mlo, mhi))
            if self.kind == "step":
                off_lo = jnp.clip(off_static[0], mlo + amp, mhi - amp)
                off_hi = jnp.clip(off_static[1], mlo + amp, mhi - amp)
            else:
                off_lo = jnp.clip(off_static[0], -mhi + amp, mhi - amp)
                off_hi = jnp.clip(off_static[1], -mhi + amp, mhi - amp)
            offset = off_lo + (off_hi - off_lo) * u[3]
            if self.kind == "step":
                phase = u[4]  # fraction of a period
                width = _triangular01_from_u(u[5])  # duty ratio
            elif self.kind == "triangle":
                phase = u[4] * 2.0 * jnp.pi
                width = u[5]
            elif self.kind == "sawtooth":
                phase = u[4] * 2.0 * jnp.pi
                width = jnp.ones(())
            else:
                phase = u[4] * 2.0 * jnp.pi
                width = jnp.ones(())
            p = p.at[P_AMPLITUDE].set(amp).at[P_FREQUENCY].set(freq)
            p = p.at[P_OFFSET].set(offset).at[P_PHASE].set(phase).at[P_WIDTH].set(width)
        return ep_len, p

    def _closed_form(self, p, k, mlo, mhi):
        """Reference value at sub-episode step ``k`` for waveform kinds."""
        t = k.astype(jnp.float32) * self.tau
        amp, freq = p[P_AMPLITUDE], p[P_FREQUENCY]
        offset, phase, width = p[P_OFFSET], p[P_PHASE], p[P_WIDTH]
        if self.kind == "sinusoidal":
            ref = amp * jnp.sin(2.0 * jnp.pi * freq * t + phase) + offset
        elif self.kind == "step":
            # square wave with duty ratio `width`, phase-rolled
            # (step_reference_generator.py:338-358)
            steps_per_period = 1.0 / (freq * self.tau)
            shift = jnp.floor(steps_per_period * phase)
            t_shift = (k.astype(jnp.float32) - shift) * self.tau
            x = freq * jnp.mod(t_shift, 1.0 / freq) - width
            ref = amp * jnp.sign(x) + offset
        else:  # triangle / sawtooth via the scipy sawtooth(phi, width) closed form
            phi = 2.0 * jnp.pi * freq * t + phase
            tmod = jnp.mod(phi / (2.0 * jnp.pi), 1.0)
            w = width
            rising = 2.0 * tmod / jnp.maximum(w, 1e-12) - 1.0
            falling = (2.0 * (1.0 - tmod) / jnp.maximum(1.0 - w, 1e-12)) - 1.0
            wave = jnp.where(tmod < w, rising, falling)
            ref = amp * wave + offset
        return jnp.clip(ref, mlo, mhi)

    def reset(self, key, initial_reference=None):
        """Returns (state dict, initial reference value, first observation)."""
        if self.kind == "const":
            return self.reset_from(key, None)
        # ONE PRNG pass total (successor key + uniform block share a
        # threefry evaluation); all draws come from the block via inverse
        # CDFs (utils/rng.py)
        key_next, u = rng.split_and_uniforms(key, 8)
        return self.reset_from(key_next, u, initial_reference)

    # number of uniforms reset_from consumes (env.reset mints the blocks of
    # every module from one PRNG pass, core.py)
    @property
    def reset_n_u(self):
        return 0 if self.kind == "const" else 8

    def reset_from(self, key_state, u, initial_reference=None):
        """Reset from a pre-minted carried key and uniform block
        (``u: (reset_n_u,)``; None for const)."""
        if self.kind == "const":
            value = jnp.asarray(self.reference_value)
            state = dict(value=value, k=jnp.zeros((), jnp.int32),
                         ep_len=jnp.zeros((), jnp.int32), p=jnp.zeros((N_P,)),
                         key=key_state,
                         mlo=jnp.asarray(float(self.reference_value)),
                         mhi=jnp.asarray(float(self.reference_value)))
            return state, value, value
        key_next = key_state
        mlo = jnp.asarray(float(self.margin[0]))
        mhi = jnp.asarray(float(self.margin[1]))
        if initial_reference is not None:
            value0 = jnp.asarray(initial_reference)
        elif self.kind == "wiener":
            lo, hi = self.initial_range
            value0 = (float(hi) - float(lo)) * u[7] + float(lo)
        else:
            value0 = jnp.zeros(())
        ep_len, p = self._draw_params(u, mlo, mhi)
        # first observation = the value at k=0 of the fresh sub-episode; no
        # regen can trigger at k=0 (ep_len >= 1), so the advance step is
        # inlined without the (vmap-costly) cond-regen branch
        if self.kind in ("wiener", "laplace"):
            sigma = p[P_SIGMA]
            draw = sigma * (rng.normal_from_u(u[6]) if self.kind == "wiener"
                            else rng.laplace_from_u(u[6]))
            obs = jnp.clip(value0 + draw, mlo, mhi)
        else:
            obs = self._closed_form(p, jnp.zeros((), jnp.int32), mlo, mhi)
        state = dict(value=obs, k=jnp.ones((), jnp.int32), ep_len=ep_len, p=p,
                     key=key_next, mlo=mlo, mhi=mhi)
        return state, value0, obs

    def advance(self, state):
        """One step of ``get_reference_observation``
        (subepisoded_reference_generator.py:96-105): regenerate if the
        sub-episode ended, then emit the value at ``k`` and increment ``k``.

        The limit margins ride in the state ("mlo"/"mhi") so curriculum
        callbacks can widen them without retracing."""
        if self.kind == "const":
            return state, state["value"]

        # ONE PRNG pass per step (successor key + uniform block share a
        # threefry evaluation); the regen branch consumes u[0:6], the value
        # draw u[6] — distinct components of the same block
        key_next, u = rng.split_and_uniforms(state["key"], 7)
        state = {**state, "key": key_next}

        def regen(st):
            ep_len, p = self._draw_params(u, st["mlo"], st["mhi"])
            return {**st, "k": jnp.zeros((), jnp.int32), "ep_len": ep_len, "p": p}

        state = jax.lax.cond(state["k"] >= state["ep_len"], regen, lambda st: st, state)

        if self.kind in ("wiener", "laplace"):
            sigma = state["p"][P_SIGMA]
            if self.kind == "wiener":
                draw = sigma * rng.normal_from_u(u[6])
            else:
                draw = sigma * rng.laplace_from_u(u[6])
            value = jnp.clip(state["value"] + draw, state["mlo"], state["mhi"])
            new = {**state, "value": value, "k": state["k"] + 1}
        else:
            value = self._closed_form(state["p"], state["k"], state["mlo"], state["mhi"])
            new = {**state, "value": value, "k": state["k"] + 1}
        return new, value


@dataclasses.dataclass
class SwitchedRefSpec:
    """Randomly switches between sub-generators of the same state every
    100..10000 steps with probabilities ``p``
    (switched_reference_generator.py:8-95).

    All sub-generator states share one pytree structure, so the active one is
    advanced with ``lax.switch`` and a switch event re-initializes the chosen
    sub-generator from the current reference value — fully on device.
    """

    subs: list  # list[ScalarRefSpec] referencing the same state
    p: tuple = None
    super_episode_lengths: tuple = (100, 10000)
    kind: str = "switched"

    def __post_init__(self):
        assert len(self.subs) > 0, "No sub generator was passed."
        states = {s.reference_state for s in self.subs}
        assert len(states) == 1, "The sub generators reference different states."
        if isinstance(self.super_episode_lengths, (int, float)):
            self.super_episode_lengths = (
                int(self.super_episode_lengths), int(self.super_episode_lengths) + 1
            )
        if self.p is None:
            self.p = tuple(1.0 / len(self.subs) for _ in self.subs)

    @property
    def reference_state(self):
        return self.subs[0].reference_state

    @property
    def margin(self):
        los = [s.margin[0] for s in self.subs]
        his = [s.margin[1] for s in self.subs]
        return (min(los), max(his))

    @property
    def state_index(self):
        return self.subs[0].state_index

    def bind(self, state_names, limits, nominal, state_space_low, state_space_high, tau):
        return dataclasses.replace(
            self,
            subs=[s.bind(state_names, limits, nominal, state_space_low,
                         state_space_high, tau) for s in self.subs],
        )

    def _draw_schedule(self, key):
        k_choice, k_len = jax.random.split(key)
        active = jax.random.choice(k_choice, len(self.subs), p=jnp.asarray(self.p))
        lo, hi = self.super_episode_lengths
        remaining = jax.random.randint(k_len, (), int(lo), int(hi))
        return active.astype(jnp.int32), remaining.astype(jnp.int32)

    def reset(self, key, initial_reference=None):
        k_sched, k_subs, key_next = jax.random.split(key, 3)
        active, remaining = self._draw_schedule(k_sched)
        sub_states, values, obses = [], [], []
        for i, s in enumerate(self.subs):
            st, v0, ob = s.reset(jax.random.fold_in(k_subs, i), initial_reference)
            sub_states.append(st)
            values.append(v0)
            obses.append(ob)
        value0 = jnp.stack(values)[active]
        obs = jnp.stack(obses)[active]
        state = dict(subs=tuple(sub_states), active=active, remaining=remaining,
                     value=obs, key=key_next)
        return state, value0, obs

    def advance(self, state):
        n = len(self.subs)

        def do_switch(st):
            k_sched, k_reset, key_next = jax.random.split(st["key"], 3)
            active, remaining = self._draw_schedule(k_sched)
            new_subs = []
            for i, s in enumerate(self.subs):
                # re-init the (possibly) newly chosen sub from the current value
                ns, _v0, _ob = s.reset(jax.random.fold_in(k_reset, i),
                                       initial_reference=st["value"])
                sel = jax.tree.map(
                    lambda a, b, i=i: jnp.where(active == i, a, b), ns, st["subs"][i]
                )
                new_subs.append(sel)
            return {**st, "subs": tuple(new_subs), "active": active,
                    "remaining": remaining, "key": key_next}

        state = jax.lax.cond(state["remaining"] <= 0, do_switch, lambda s: s, state)

        def make_branch(i):
            def branch(subs):
                ns, v = self.subs[i].advance(subs[i])
                return tuple(ns if j == i else subs[j] for j in range(n)), v
            return branch

        new_subs, value = jax.lax.switch(
            state["active"], [make_branch(i) for i in range(n)], state["subs"]
        )
        return {**state, "subs": new_subs, "value": value,
                "remaining": state["remaining"] - 1}, value


def set_margins(ref_state, mlo, mhi):
    """Impose dynamic limit margins onto a (possibly nested) generator state —
    used by curriculum callbacks (callbacks.py RampingLimitMargin)."""
    out = dict(ref_state)
    if "mlo" in out:
        out["mlo"] = jnp.asarray(mlo, out["mlo"].dtype)
        out["mhi"] = jnp.asarray(mhi, out["mhi"].dtype)
    if "subs" in out:
        out["subs"] = tuple(set_margins(s, mlo, mhi) for s in out["subs"])
    return out


@dataclasses.dataclass
class ReferenceSpec:
    """Composite reference generator (the env-facing object).

    Equivalent to ``MultipleReferenceGenerator`` for len > 1 and to a single
    generator otherwise.  ``reference_names`` / ``referenced_states`` follow
    the reference semantics so rewards and observations line up.
    """

    subs: list  # list[ScalarRefSpec]
    n_states: int = None
    ref_indices: np.ndarray = None

    @property
    def reference_names(self):
        return [s.reference_state for s in self.subs]

    @property
    def n_refs(self):
        return len(self.subs)

    def bind(self, state_names, limits, nominal, low, high, tau):
        subs = [s.bind(state_names, limits, nominal, low, high, tau) for s in self.subs]
        return dataclasses.replace(
            self,
            subs=subs,
            n_states=len(state_names),
            ref_indices=np.array([s.state_index for s in subs], dtype=np.int32),
        )

    # (SwitchedRefSpec instances are valid subs: they provide the same
    # bind/reset/advance/margin/state_index contract as ScalarRefSpec.)

    def referenced_states(self):
        mask = np.zeros(self.n_states, dtype=bool)
        if len(self.ref_indices):
            mask[self.ref_indices] = True
        return mask

    def reference_space(self):
        lo = np.array([s.margin[0] if s.kind != "const" else s.reference_value for s in self.subs])
        hi = np.array([s.margin[1] if s.kind != "const" else s.reference_value for s in self.subs])
        return lo, hi

    # -------- device functions --------

    def reset(self, key):
        if not self.subs:  # ZeroReferenceGenerator (zero_reference_generator.py:7-22)
            return (), jnp.zeros((self.n_states,)), jnp.zeros((0,))
        # the single-generator case (most catalog envs) uses the key directly
        # — one fewer PRNG pass on the per-step autoreset path
        keys = [key] if len(self.subs) == 1 else jax.random.split(key, len(self.subs))
        states, values0, obs = [], [], []
        for s, k in zip(self.subs, keys):
            st, v0, ob = s.reset(k)
            states.append(st)
            values0.append(v0)
            obs.append(ob)
        ref_array = self.to_reference_array(jnp.stack(values0))
        return tuple(states), ref_array, jnp.stack(obs)

    @property
    def reset_n_u(self):
        """Total uniforms ``reset_from`` consumes, or None when a sub
        cannot be pre-minted (SwitchedRefSpec draws its own schedule)."""
        ns = [getattr(s, "reset_n_u", None) for s in self.subs]
        if any(n is None or not hasattr(s, "reset_from")
               for n, s in zip(ns, self.subs)):
            return None
        return sum(ns)

    def reset_from(self, sub_keys, u):
        """Reset every sub from pre-minted carried keys + one uniform block
        (layout: each sub's ``reset_n_u`` slots in order)."""
        if not self.subs:
            return (), jnp.zeros((self.n_states,)), jnp.zeros((0,))
        states, values0, obs = [], [], []
        o = 0
        for s, k in zip(self.subs, sub_keys):
            n = s.reset_n_u
            st, v0, ob = s.reset_from(k, u[o:o + n] if n else None)
            o += n
            states.append(st)
            values0.append(v0)
            obs.append(ob)
        ref_array = self.to_reference_array(jnp.stack(values0))
        return tuple(states), ref_array, jnp.stack(obs)

    def advance(self, states):
        if not self.subs:
            return (), jnp.zeros((0,))
        new_states, obs = [], []
        for s, st in zip(self.subs, states):
            st2, v = s.advance(st)
            new_states.append(st2)
            obs.append(v)
        return tuple(new_states), jnp.stack(obs)

    def current_values(self, states):
        if not self.subs:
            return jnp.zeros((0,))
        return jnp.stack([st["value"] for st in states])

    def to_reference_array(self, values):
        """Place the per-generator values into a full state-sized array.

        Written as a static gather (values[perm] with a zero sentinel slot)
        rather than a scatter — this runs every step and scatters don't fuse
        on TPU."""
        if not len(self.ref_indices):
            return jnp.zeros((self.n_states,),
                             dtype=values.dtype if values.size else jnp.float32)
        pos = {int(i): j for j, i in enumerate(self.ref_indices)}
        perm = np.array([pos.get(i, len(self.subs)) for i in range(self.n_states)],
                        dtype=np.int32)
        padded = jnp.concatenate([values, jnp.zeros((1,), values.dtype)])
        return padded[jnp.asarray(perm)]


# Convenience constructors mirroring the reference class names -------------


def WienerProcessReference(reference_state="omega", sigma_range=(1e-3, 1e-1),
                           initial_range=None, episode_lengths=(500, 2000),
                           limit_margin=None) -> ScalarRefSpec:
    return ScalarRefSpec("wiener", reference_state, sigma_range=sigma_range,
                         initial_range=initial_range, episode_lengths=episode_lengths,
                         limit_margin=limit_margin)


def LaplaceProcessReference(reference_state="omega", sigma_range=(1e-3, 1e-1),
                            episode_lengths=(500, 2000), limit_margin=None) -> ScalarRefSpec:
    return ScalarRefSpec("laplace", reference_state, sigma_range=sigma_range,
                         episode_lengths=episode_lengths, limit_margin=limit_margin)


def SinusoidalReference(reference_state="omega", amplitude_range=None, frequency_range=(1, 10),
                        offset_range=None, episode_lengths=(500, 2000), limit_margin=None) -> ScalarRefSpec:
    return ScalarRefSpec("sinusoidal", reference_state, amplitude_range=amplitude_range,
                         frequency_range=frequency_range, offset_range=offset_range,
                         episode_lengths=episode_lengths, limit_margin=limit_margin)


def StepReference(reference_state="omega", amplitude_range=None, frequency_range=(1, 10),
                  offset_range=None, episode_lengths=(500, 2000), limit_margin=None) -> ScalarRefSpec:
    return ScalarRefSpec("step", reference_state, amplitude_range=amplitude_range,
                         frequency_range=frequency_range, offset_range=offset_range,
                         episode_lengths=episode_lengths, limit_margin=limit_margin)


def TriangularReference(reference_state="omega", amplitude_range=None, frequency_range=(1, 10),
                        offset_range=None, episode_lengths=(500, 2000), limit_margin=None) -> ScalarRefSpec:
    return ScalarRefSpec("triangle", reference_state, amplitude_range=amplitude_range,
                         frequency_range=frequency_range, offset_range=offset_range,
                         episode_lengths=episode_lengths, limit_margin=limit_margin)


def SawtoothReference(reference_state="omega", amplitude_range=None, frequency_range=(1, 10),
                      offset_range=None, episode_lengths=(500, 2000), limit_margin=None) -> ScalarRefSpec:
    return ScalarRefSpec("sawtooth", reference_state, amplitude_range=amplitude_range,
                         frequency_range=frequency_range, offset_range=offset_range,
                         episode_lengths=episode_lengths, limit_margin=limit_margin)


def ConstReference(reference_state="omega", reference_value=0.5) -> ScalarRefSpec:
    return ScalarRefSpec("const", reference_state, reference_value=reference_value)


def SwitchedReference(sub_generators, p=None, super_episode_length=(100, 10000)) -> SwitchedRefSpec:
    """switched_reference_generator.py:8-95."""
    return SwitchedRefSpec(list(sub_generators), p=tuple(p) if p else None,
                           super_episode_lengths=super_episode_length)


def ZeroReferenceGenerator() -> "ReferenceSpec":
    """zero_reference_generator.py:7-22 — no referenced states, empty
    reference observation."""
    return ReferenceSpec([])
