"""Every scalar reference kind runs inside the fused kernels.

The in-kernel machinery (ops/pallas_rollout.py::_make_wiener) implements
wiener / laplace / const / sinusoidal / step / triangle / sawtooth with the
same per-sub-episode parameter draws and closed forms as the XLA
generators (references.py:94-252).  Validation (interpret mode, xorshift
bit source): structural identities of each waveform on the recorded
reference stream, reward recomputation, margin respect, and heavy tails
for Laplace increments.  Switched generators run in-kernel too: the
primary row carries the super-episode schedule and active index while the
K sub-generators advance as static shadow rows; NESTED switched expands
recursively (a switched shadow row gets its own shadow block, forced
re-switches cascade parent-to-child, selection runs children-first).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg
from gym_electric_motor_tpu.ops.pallas_record import make_fused_record_rollout
from gym_electric_motor_tpu.ops.pallas_rollout import make_fused_rollout

N = 256
LONG = (100000, 100000)  # no sub-episode regen within any test horizon


def _record(env, T, seed=5):
    zero = jnp.zeros((N // 128, 128), jnp.float32)
    roll = make_fused_record_rollout(env, T, N, chunk=8, interpret=True)
    return {k: np.asarray(v) for k, v in roll(seed, zero).items()}


def _flat(out, key):
    return out[key].reshape(out[key].shape[0], -1)


def _no_reset_mask(out, order=2):
    """valid[i] ⇔ no in-kernel reset affected refs i .. i+order: a done at
    step t regenerates the reference parameters for step t+1, so any
    identity over refs (i, .., i+order) needs done[i .. i+order-1] == 0."""
    done = _flat(out, "done") > 0.5
    T = done.shape[0]
    m = np.ones((T - order, done.shape[1]), bool)
    for j in range(order):
        m &= ~done[j:T - order + j]
    return m


def test_sinusoidal_exact_recurrence():
    """With pinned amplitude/frequency/offset the recorded reference obeys
    the exact sinusoid recurrence (v+ - O) + (v- - O) = 2 cos(2π f τ)
    (v - O) — validates the closed form including the phase draw."""
    A, F, O = 0.2, 123.0, 0.1
    env = gemx.make_functional(
        "Cont-CC-PermExDc-v0",
        reference_generator=rg.SinusoidalReference(
            "i", amplitude_range=(A, A), frequency_range=(F, F),
            offset_range=(O, O), episode_lengths=LONG))
    out = _record(env, 200)
    r = _flat(out, "ref_i") - O
    valid = _no_reset_mask(out, order=2)
    assert valid.sum() > 5000
    tau = float(env.physical_system.tau)
    c = 2.0 * np.cos(2.0 * np.pi * F * tau)
    resid = (r[2:] + r[:-2] - c * r[1:-1])[valid]
    np.testing.assert_allclose(resid, 0.0, atol=5e-6)
    # amplitude honored: max |v - O| ~ A (phase-dependent lower)
    assert np.abs(r).max() <= A + 1e-3
    assert np.abs(r).max() > 0.8 * A
    # phases differ across envs
    assert np.std(r[0]) > 0.01


def test_step_two_level_and_duty():
    """Step references are exactly two-level at O ± A; the duty ratio is
    triangular(0, .5, 1)-distributed, so its across-env mean is ~0.5."""
    A, O = 0.15, 0.2
    env = gemx.make_functional(
        "Cont-CC-PermExDc-v0",
        reference_generator=rg.StepReference(
            "i", amplitude_range=(A, A), frequency_range=(100.0, 100.0),
            offset_range=(O, O), episode_lengths=LONG))
    T = 1000  # one period = 1/(100 Hz * 1e-4 s) = 100 steps → 10 periods
    out = _record(env, T)
    r = _flat(out, "ref_i")
    hi, lo = O + A, O - A
    assert np.all((np.abs(r - hi) < 1e-5) | (np.abs(r - lo) < 1e-5))
    assert (np.abs(r - hi) < 1e-5).any() and (np.abs(r - lo) < 1e-5).any()
    # per-env duty averages many sub-episodes (in-kernel resets redraw the
    # triangular width), so the mean is ~0.5 with modest per-env spread
    duty = (np.abs(r - hi) < 1e-5).mean(axis=0)
    assert np.std(duty) > 0.01
    assert abs(duty.mean() - 0.5) < 0.1  # triangular(0,.5,1) mean


@pytest.mark.parametrize("kind,factory", [
    ("triangle", rg.TriangularReference),
    ("sawtooth", rg.SawtoothReference),
])
def test_triangle_sawtooth_piecewise_linear(kind, factory):
    """Triangle/sawtooth waves are piecewise linear: the second difference
    vanishes except at the corners (and sawtooth wraps)."""
    A, F = 0.2, 50.0
    env = gemx.make_functional(
        "Cont-CC-PermExDc-v0",
        reference_generator=factory(
            "i", amplitude_range=(A, A), frequency_range=(F, F),
            offset_range=(0.0, 0.0), episode_lengths=LONG))
    T = 600  # 1/(50 Hz * 1e-4 s) = 200 steps/period → 3 periods
    out = _record(env, T)
    r = _flat(out, "ref_i")
    valid = _no_reset_mask(out, order=2)
    assert valid.sum() > 20000
    assert np.abs(r).max() <= A + 1e-5
    d2 = np.abs(np.diff(r, n=2, axis=0))[valid]
    corner_rate = (d2 > 1e-4).mean()
    # <= 2 corners (tri) / 1 wrap (saw) per 200-step period
    assert corner_rate < 0.03, corner_rate
    assert (d2 < 1e-6).mean() > 0.9
    # it actually moves linearly between corners
    d1 = np.abs(np.diff(r, axis=0))
    assert d1.max() > 1e-4


def test_laplace_heavy_tails_and_reset_to_zero():
    """Laplace rows draw inverse-CDF Laplace increments (excess kurtosis 3)
    and reset to 0 like the XLA generator (references.py:186-201)."""
    s = 0.01
    env = gemx.make_functional(
        "Cont-CC-PermExDc-v0",
        reference_generator=rg.LaplaceProcessReference(
            "i", sigma_range=(s, s), episode_lengths=LONG))
    T = 2000
    out = _record(env, T)
    r = _flat(out, "ref_i")
    valid = np.ones((T - 1, r.shape[1]), bool)
    done = _flat(out, "done") > 0.5
    valid &= ~done[:-1]  # a reset at t re-inits the ref at t+1
    mlo, mhi = [m for ssub in env.reference_generator.subs
                for m in ssub.margin]
    inc = np.diff(r, axis=0)
    unclipped = valid & (r[1:] > mlo + 5 * s) & (r[1:] < mhi - 5 * s) \
        & (r[:-1] > mlo + 5 * s) & (r[:-1] < mhi - 5 * s)
    z = inc[unclipped] / s
    assert len(z) > 10000
    np.testing.assert_allclose(np.std(z), np.sqrt(2.0), rtol=0.1)
    kurt = np.mean(z ** 4) / np.mean(z ** 2) ** 2
    assert kurt > 4.5, kurt  # Laplace: 6; Gauss: 3


def test_mixed_kinds_in_one_env():
    """A dq pair with a Wiener i_sd* and a sinusoidal i_sq* — per-row kind
    masks inside one kernel."""
    ref = rg.ReferenceSpec([
        rg.WienerProcessReference("i_sd"),
        rg.SinusoidalReference("i_sq", amplitude_range=(0.1, 0.1),
                               frequency_range=(80.0, 80.0),
                               offset_range=(0.0, 0.0),
                               episode_lengths=LONG),
    ])
    env = gemx.make_functional("Cont-CC-PMSM-v0", reference_generator=ref)
    zero = jnp.zeros((N // 128, 128), jnp.float32)
    roll = make_fused_record_rollout(env, 300, N, chunk=4, interpret=True)
    out = {k: np.asarray(v) for k, v in roll(7, zero, zero, zero).items()}
    valid = _no_reset_mask(out, order=2)
    assert valid.sum() > 5000
    sd = _flat(out, "ref_i_sd")
    sq = _flat(out, "ref_i_sq")
    # the sinusoidal row obeys its recurrence, the Wiener row does not
    tau = float(env.physical_system.tau)
    c = 2.0 * np.cos(2.0 * np.pi * 80.0 * tau)
    np.testing.assert_allclose((sq[2:] + sq[:-2] - c * sq[1:-1])[valid],
                               0.0, atol=5e-6)
    resid_sd = (sd[2:] + sd[:-2] - c * sd[1:-1])[valid]
    assert np.abs(resid_sd).max() > 1e-3
    assert np.std(sd) > 1e-3  # the Wiener stream is alive


def test_reducing_kernel_runs_waveform_refs():
    """The reducing (metric-sum) kernels accept waveform references too."""
    env = gemx.make_functional(
        "Finite-CC-PermExDc-v0",
        reference_generator=rg.SinusoidalReference("i"))
    zero = jnp.zeros((N // 128, 128), jnp.float32)
    roll = make_fused_rollout(env, 300, N, interpret=True)
    out = roll(3, zero)
    r_sum = float(np.asarray(out[1]).sum())
    assert np.isfinite(r_sum) and r_sum < 0.0
    # final reference snapshot honors the margins (outputs are
    # states..., reward_sum, term_count, rv, rk, rl, rs)
    rv = np.asarray(out[3])
    (sub,) = env.reference_generator.subs
    assert rv.min() >= sub.margin[0] - 1e-6
    assert rv.max() <= sub.margin[1] + 1e-6


def test_switched_two_consts_selects_exactly():
    """A switched pair of CONST sub-generators is fully deterministic in
    value space: the emitted reference must only ever equal one of the two
    constants, and BOTH must appear over a horizon spanning many
    super-episodes (switching + selection machinery, switched_reference_
    generator.py:8-95)."""
    sw = rg.SwitchedReference(
        [rg.ConstReference("i", 0.4), rg.ConstReference("i", -0.2)],
        super_episode_length=(20, 60))
    env = gemx.make_functional("Finite-CC-PermExDc-v0",
                               reference_generator=sw)
    out = _record(env, 512, seed=9)
    r = out["ref_i"]
    is_a = np.abs(r - 0.4) < 1e-6
    is_b = np.abs(r + 0.2) < 1e-6
    assert np.all(is_a | is_b)
    frac_a = is_a.mean()
    assert 0.2 < frac_a < 0.8, frac_a  # both subs actually get scheduled
    # switch cadence: per env, value changes happen but not every step
    flips = (np.abs(np.diff(r, axis=0)) > 1e-6).mean()
    assert 1.0 / 80 < flips < 1.0 / 8, flips


def test_switched_wiener_sinusoid_statistics():
    """Switched wiener+sinusoid: finite everywhere, values inside the
    merged margins, and the recorded reward recomputes from the recorded
    signals (the reward reads the switched PRIMARY row)."""
    sw = rg.SwitchedReference(
        [rg.WienerProcessReference("i"),
         rg.SinusoidalReference("i")],
        super_episode_length=(50, 200))
    env = gemx.make_functional("Finite-CC-PermExDc-v0",
                               reference_generator=sw)
    sub0 = env.reference_generator.subs[0]
    mlo, mhi = sub0.margin
    out = _record(env, 600, seed=11)
    r, i, rew, done = (out["ref_i"], out["i"], out["reward"], out["done"])
    assert np.all(np.isfinite(r))
    assert np.all(r >= mlo - 1e-5) and np.all(r <= mhi + 1e-5)
    assert np.std(r) > 1e-3
    names = list(env.physical_system.state_names)
    lim = np.asarray(env.physical_system.limits)
    i_lim = float(lim[names.index("i")])
    coef = float(env.reward_function._weights[names.index("i")]
                 / env.reward_function._state_length[names.index("i")])
    expect = -coef * np.abs(i / i_lim - r)
    mask = done < 0.5
    np.testing.assert_allclose(rew[mask], expect[mask], rtol=1e-4,
                               atol=1e-5)


def test_nested_switched_three_consts_selects_exactly():
    """Switched-of-switched with CONST leaves is fully deterministic in
    value space: only the three constants may ever be emitted, all three
    appear, and the inner pair's combined share tracks the outer
    probability (selection cascades through the nested primary)."""
    inner = rg.SwitchedReference(
        [rg.ConstReference("i", 0.4), rg.ConstReference("i", -0.2)],
        super_episode_length=(15, 45))
    sw = rg.SwitchedReference(
        [inner, rg.ConstReference("i", 0.1)], p=(0.5, 0.5),
        super_episode_length=(20, 60))
    env = gemx.make_functional("Finite-CC-PermExDc-v0",
                               reference_generator=sw)
    out = _record(env, 600, seed=9)
    r = out["ref_i"]
    is_a = np.abs(r - 0.4) < 1e-6
    is_b = np.abs(r + 0.2) < 1e-6
    is_c = np.abs(r - 0.1) < 1e-6
    assert np.all(is_a | is_b | is_c)
    # outer 50/50: the inner pair's combined share near half, and the
    # inner schedule splits that share across BOTH leaves
    assert 0.25 < (is_a | is_b).mean() < 0.75
    assert is_a.mean() > 0.05 and is_b.mean() > 0.05
    assert is_c.mean() > 0.2
    # value changes happen but not every step (nested switch cadence)
    flips = (np.abs(np.diff(r, axis=0)) > 1e-6).mean()
    assert 1.0 / 100 < flips < 1.0 / 5, flips


def test_nested_switched_wiener_statistics():
    """Nested switched with a Wiener leaf: values finite, inside the
    merged margins, reward recomputes from the recorded signals, and the
    Wiener stream is alive (the nested machinery keeps the noise rows
    advancing)."""
    inner = rg.SwitchedReference(
        [rg.WienerProcessReference("i"), rg.ConstReference("i", 0.2)],
        super_episode_length=(30, 90))
    sw = rg.SwitchedReference(
        [inner, rg.ConstReference("i", 0.1)],
        super_episode_length=(40, 120))
    env = gemx.make_functional("Finite-CC-PermExDc-v0",
                               reference_generator=sw)
    out = _record(env, 600, seed=11)
    r, i, rew, done = (out["ref_i"], out["i"], out["reward"], out["done"])
    assert np.all(np.isfinite(r))
    mlo, mhi = env.reference_generator.subs[0].margin
    assert np.all(r >= mlo - 1e-5) and np.all(r <= mhi + 1e-5)
    assert np.std(r) > 1e-3
    names = list(env.physical_system.state_names)
    lim = np.asarray(env.physical_system.limits)
    i_lim = float(lim[names.index("i")])
    coef = float(env.reward_function._weights[names.index("i")]
                 / env.reward_function._state_length[names.index("i")])
    expect = -coef * np.abs(i / i_lim - r)
    mask = done < 0.5
    np.testing.assert_allclose(rew[mask], expect[mask], rtol=1e-4,
                               atol=1e-5)


def test_nested_switched_reducing_kernel_runs():
    """The reducing (metric-sum) kernels run nested switched configs
    too — margins respected on the final reference snapshot."""
    inner = rg.SwitchedReference([rg.WienerProcessReference("i"),
                                  rg.ConstReference("i", 0.2)])
    sw = rg.SwitchedReference([inner, rg.ConstReference("i", 0.1)])
    env = gemx.make_functional("Finite-CC-PermExDc-v0",
                               reference_generator=sw)
    roll = make_fused_rollout(env, 200, 128, interpret=True)
    out = roll(3, jnp.zeros((1, 128), jnp.float32))
    r_sum = float(np.asarray(out[1]).sum())
    assert np.isfinite(r_sum) and r_sum < 0.0
    rv = np.asarray(out[3])
    mlo, mhi = env.reference_generator.subs[0].margin
    # primary row only (shadow rows live in the same plane below)
    assert rv[:1].min() >= mlo - 1e-6 and rv[:1].max() <= mhi + 1e-6


@pytest.mark.parametrize("power", [2, 0.5, 3.0])
def test_fused_reward_power(power):
    """reward_power != 1 runs in the fused kernels: the recorded reward
    recomputes as -w * (|err| / l)^n against the recorded signals (the
    reference's MPC notebook uses reward_power=0.5)."""
    from gym_electric_motor_tpu.rewards import WeightedSumOfErrors

    env = gemx.make_functional(
        "Finite-CC-PermExDc-v0",
        reward_function=WeightedSumOfErrors(reward_power=power))
    ps = env.physical_system
    names = list(ps.state_names)
    idx = names.index("i")
    i_lim = float(np.asarray(ps.limits)[idx])
    rw = env.reward_function
    w = float(rw._weights[idx])
    ln = float(rw._state_length[idx])

    T = 256
    out = _record(env, T, seed=5)
    ok = out["done"] < 0.5
    err = np.abs(out["i"][ok] / i_lim - out["ref_i"][ok])
    np.testing.assert_allclose(out["reward"][ok],
                               -w * (err / ln) ** power,
                               rtol=2e-4, atol=5e-6)
    bad = ~ok
    assert bad.any()
    np.testing.assert_allclose(out["reward"][bad],
                               float(rw._violation_value), rtol=1e-6)


def test_switched_wiener_to_const_no_one_step_leak():
    """On a pure switch into a CONST sub, the emitted reference must be
    the constant IMMEDIATELY (const generators ignore initial_reference;
    subepisoded kinds clip it into their margins) — no one-step leak of
    the previous sub's value."""
    sw = rg.SwitchedReference(
        [rg.WienerProcessReference("i"), rg.ConstReference("i", 0.25)],
        super_episode_length=(15, 40))
    env = gemx.make_functional("Finite-CC-PermExDc-v0",
                               reference_generator=sw)
    out = _record(env, 600, seed=13)
    r, done = out["ref_i"], out["done"]
    sub0 = env.reference_generator.subs[0]
    mlo, mhi = sub0.margin
    is_const = np.abs(r - 0.25) < 1e-6
    assert 0.2 < is_const.mean() < 0.8
    # whenever the reference is NOT the const value it must be a wiener
    # value inside the WIENER margins (no merged-margin strays); allow the
    # violation-reset steps their own uniform draw within margins too
    w = r[~is_const]
    assert np.all(w >= mlo - 1e-5) and np.all(w <= mhi + 1e-5)
    # const stretches must last more than one step (leaked values would
    # show as isolated single-step const-violations inside const runs):
    # look for 0-1-0 patterns along time in the is_const mask
    m = is_const.astype(np.int8)
    isolated_nonconst = (m[:-2] == 1) & (m[1:-1] == 0) & (m[2:] == 1)
    # such a pattern can only arise from a 1-step leak (a real switch to
    # wiener lasts >= 15 steps) or a violation reset landing mid-const-run
    leak_rate = isolated_nonconst.mean()
    reset_rate = done.mean()
    assert leak_rate <= reset_rate + 1e-4, (leak_rate, reset_rate)


def test_nested_switched_rides_the_policy_trainer():
    """The in-kernel policy/PPO tier shares the reference machinery, so
    nested switched configs train without any special casing (the obs
    reads the primary rows; shadow blocks ride the shared scratch)."""
    from gym_electric_motor_tpu.ops.pallas_policy import (
        fused_policy_init_planes, policy_act_ns, policy_obs_dim)
    from gym_electric_motor_tpu.parallel.sharded import (
        init_actor_critic_params, make_fused_ppo_trainer)

    inner = rg.SwitchedReference([rg.WienerProcessReference("i"),
                                  rg.ConstReference("i", 0.2)],
                                 super_episode_length=(30, 90))
    sw = rg.SwitchedReference([inner, rg.ConstReference("i", 0.1)],
                              super_episode_length=(40, 120))
    env = gemx.make_functional("Finite-CC-PermExDc-v0",
                               reference_generator=sw)
    init_opt, train = make_fused_ppo_trainer(
        env, hidden=8, horizon=8, n_envs=128, n_minibatches=2,
        kernel="universal", interpret=True)
    n_out = int(sum(policy_act_ns(env)))
    p = init_actor_critic_params(jax.random.PRNGKey(1),
                                 policy_obs_dim(env), n_out, 8)
    pl = fused_policy_init_planes(env, 128)
    *_, rs = train(p, init_opt(p), pl, 3, 2)
    assert np.isfinite(np.asarray(rs)).all()
