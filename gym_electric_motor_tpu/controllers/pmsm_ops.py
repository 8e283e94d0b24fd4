"""PMSM/SynRM operation-point selection (torque -> (i_sd, i_sq)).

Counterpart of
``/root/reference/src/gem_controllers/stages/operation_point_selection/
pmsm_ops.py`` and its FOC base (``foc_operation_point_selection.py``):

* MTPC table: for each torque the minimum-magnitude current vector
  (pmsm_ops.py:44-89).
* MTPF table: for each flux the maximum achievable torque and its currents
  (pmsm_ops.py:91-141).
* (torque, flux) -> (i_d, i_q) grid solved from the analytic quartic
  (pmsm_ops.py:252-287); the reference's default mode is ``'online'``
  (np.roots per step) which cannot run on-device, so this port precomputes
  the same analytic solution over the grid (the reference's ``'analytical'``
  mode — identical math, host-precomputed into a LUT gathered on device).
* Modulation controller limiting flux to preserve voltage margin
  (foc_operation_point_selection.py:110-147), carried as two scalars in the
  controller state.

All tables are built once on the host with numpy at tune time and gathered
per step on device.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

T_COUNT = 250
PSI_COUNT = 250
I_COUNT = 500


def _quartic_roots(a3, a2, a1, a0):
    """All four complex roots of the monic quartics ``x^4 + a3 x^3 + a2 x^2 +
    a1 x + a0``, fully vectorized (Ferrari via the resolvent cubic).

    Replaces batched 4x4 companion-matrix ``np.linalg.eigvals`` in the tune-
    time LUT builds (35 s -> <1 s on the 750k-point EESM sweep) with max root
    deviation ~1e-9 (asserted in tests/test_controllers.py).  Returns a
    ``(4, n)`` complex array (unordered roots down axis 0) — row-major on
    purpose: strided complex writes (``np.stack(..., axis=-1)``) are
    pathologically slow on this host (~8 s per 48 MB stack)."""
    a3 = np.asarray(a3, np.float64).ravel()
    a2 = np.asarray(a2, np.float64).ravel()
    a1 = np.asarray(a1, np.float64).ravel()
    a0 = np.asarray(a0, np.float64).ravel()
    n = a3.size

    # Chunk large batches: every whole-batch temp at n=750k is a 6-12 MB
    # fresh mmap whose first-touch page faults dominate runtime (measured
    # 8.8 s -> 0.45 s on the EESM tune sweep).  Sub-mmap-threshold chunks
    # recycle allocator arenas instead.
    CHUNK = 65536
    if n > CHUNK:
        out = np.empty((4, n), np.complex128)
        for s in range(0, n, CHUNK):
            e = min(s + CHUNK, n)
            out[:, s:e] = _quartic_roots(a3[s:e], a2[s:e], a1[s:e], a0[s:e])
        return out
    return _quartic_roots_small(a3, a2, a1, a0)


def _quartic_roots_small(a3, a2, a1, a0):
    n = a3.size
    # All coefficients are real, so the whole pipeline up to the two final
    # square roots runs in real float64 (the resolvent cubic of a real
    # quartic is real and always has a nonnegative real root since its value
    # at 0 is -q^2 <= 0): ~10x faster than complex temps of twice the size.
    a3_2 = a3 * a3

    # depressed quartic y^4 + p y^2 + q y + r,  x = y - a3/4
    p = a2 - 0.375 * a3_2
    q = a1 - 0.5 * a3 * a2 + 0.125 * a3 * a3_2
    r = (a0 - 0.25 * a3 * a1 + 0.0625 * a3_2 * a2
         - (3.0 / 256.0) * a3_2 * a3_2)

    # resolvent cubic z^3 + 2p z^2 + (p^2 - 4r) z - q^2 = 0; take its
    # largest real root z0 (>= 0, see above)
    b2 = 2.0 * p
    b1 = p * p - 4.0 * r
    b0 = -(q * q)
    P = b1 - b2 * b2 / 3.0
    Q = (2.0 / 27.0) * b2 * b2 * b2 - b2 * b1 / 3.0 + b0
    disc = 0.25 * (Q * Q) + (P * P * P) / 27.0

    # disc >= 0: single real root via Cardano (np.cbrt handles signs)
    sq_disc = np.sqrt(np.maximum(disc, 0.0))
    t_card = np.cbrt(-0.5 * Q + sq_disc) + np.cbrt(-0.5 * Q - sq_disc)
    # disc < 0: three real roots; the largest is 2 sqrt(-P/3) cos(theta/3).
    # Inputs are masked to benign values on the Cardano lanes — inf/nan
    # there would not only warn but drag every vector op into slow FP-assist
    # microcode.
    neg = disc < 0.0
    Pm = np.where(neg, np.minimum(P, -1e-300), -1.0)
    Qm = np.where(neg, Q, 0.0)
    cos_arg = np.clip(1.5 * Qm / Pm * np.sqrt(-3.0 / Pm), -1.0, 1.0)
    t_trig = 2.0 * np.sqrt(-Pm / 3.0) * np.cos(np.arccos(cos_arg) / 3.0)
    z0 = np.where(neg, t_trig, t_card) - b2 / 3.0
    z0 = np.maximum(z0, 0.0)  # clamp fp noise; exact zero => biquadratic

    w = np.sqrt(z0)
    # biquadratic fallback (q == 0 => z0 may be 0, w = 0 divides)
    biquad = w < 1e-150
    w_safe = np.where(biquad, 1.0, w)
    half_pz = 0.5 * (p + z0)
    q_2w = q / (2.0 * w_safe)
    s1 = half_pz - q_2w
    s2 = half_pz + q_2w

    # roots of y^2 + w y + s1 = 0 and y^2 - w y + s2 = 0 (complex from here)
    d1 = np.sqrt((w * w - 4.0 * s1).astype(np.complex128))
    d2 = np.sqrt((w * w - 4.0 * s2).astype(np.complex128))

    # biquadratic lanes solved directly: y^2 = (-p +- sqrt(p^2 - 4r)) / 2
    sqb = np.sqrt(np.abs(b1)) * np.where(b1 >= 0, 1.0 + 0.0j, 1.0j)
    y1 = np.sqrt((-p + sqb) * 0.5)
    y2 = np.sqrt((-p - sqb) * 0.5)

    shift = 0.25 * a3
    x = np.empty((4, n), np.complex128)
    x[0] = np.where(biquad, y1, (-w + d1) * 0.5) - shift
    x[1] = np.where(biquad, -y1, (-w - d1) * 0.5) - shift
    x[2] = np.where(biquad, y2, (w + d2) * 0.5) - shift
    x[3] = np.where(biquad, -y2, (w - d2) * 0.5) - shift
    return x


def _select_reference_root(roots):
    """Replicate ``np.real(np.roots(poly)[-1])`` (pmsm_ops.py:283): LAPACK
    returns the companion eigenvalues in descending-magnitude order, so the
    last element is the smallest-magnitude root — possibly complex, of which
    the reference silently takes the real part.

    Ties are resolved to the largest real part, *robustly*: magnitudes within
    1e-9 relative count as tied.  Exact +-x pairs (the biquadratic i_e = 0
    plane of the EESM sweep) then deterministically pick +x regardless of
    1-ulp magnitude noise, where raw LAPACK ordering was arbitrary (the two
    signs are loss-equivalent operating points).

    ``roots`` is ``(4, n)`` (roots down axis 0, see ``_quartic_roots``)."""
    mag = np.abs(roots)
    min_mag = mag.min(axis=0, keepdims=True)
    tied = mag <= min_mag + 1e-9 * (1.0 + min_mag)
    return np.where(tied, roots.real, -np.inf).max(axis=0)


def _roots_from_monic(a3, a2, a1, a0, method="ferrari"):
    """(4, n) complex roots of monic quartics; ``method='eig'`` keeps the
    original batched companion-eigenvalue path as the validation oracle."""
    if method == "ferrari":
        return _quartic_roots(a3, a2, a1, a0)
    n = a3.size
    comp = np.zeros((n, 4, 4))
    comp[:, 1, 0] = comp[:, 2, 1] = comp[:, 3, 2] = 1.0
    comp[:, 0, 3] = -a0
    comp[:, 1, 3] = -a1
    comp[:, 2, 3] = -a2
    comp[:, 3, 3] = -a3
    return np.linalg.eigvals(comp).T


def _solve_selected_root(a3, a2, a1, a0, method="ferrari"):
    """Selected reference root (see ``_select_reference_root``) of each monic
    quartic, chunked end-to-end so neither the (4, n) complex root array nor
    its |.| temps ever materialize at full batch size (first-touch page
    faults on those dominate the tune-time cost otherwise)."""
    a3 = np.asarray(a3, np.float64).ravel()
    a2 = np.asarray(a2, np.float64).ravel()
    a1 = np.asarray(a1, np.float64).ravel()
    a0 = np.asarray(a0, np.float64).ravel()
    n = a3.size
    if method != "ferrari":
        return _select_reference_root(_roots_from_monic(a3, a2, a1, a0, method))
    CHUNK = 65536
    out = np.empty(n, np.float64)
    for s in range(0, n, CHUNK):
        e = min(s + CHUNK, n)
        out[s:e] = _select_reference_root(
            _quartic_roots_small(a3[s:e], a2[s:e], a1[s:e], a0[s:e]))
    return out


def _solve_analytical_grid(l_d, l_q, psi_p, p, torques, psis, method="ferrari"):
    """Vectorized version of pmsm_ops.solve_analytical (pmsm_ops.py:252-287):
    roots of the quartic in i_d, batched over the whole grid."""
    tt, pp_ = np.meshgrid(torques, psis, indexing="ij")  # (T, P)
    t = tt.ravel()
    psi = pp_.ravel()
    n = t.size
    c4 = l_d**2 * (l_d - l_q) ** 2 * np.ones(n)
    c3 = (2 * l_d**2 * (l_d - l_q) * psi_p + 2 * l_d * psi_p * (l_d - l_q) ** 2) * np.ones(n)
    c2 = (l_d**2 * psi_p**2 + 4 * l_d * psi_p**2 * (l_d - l_q)
          + (psi_p**2 - psi**2) * (l_d - l_q) ** 2)
    c1 = 2 * l_q * psi_p**3 + 2 * (psi_p**2 - psi**2) * psi_p * (l_d - l_q)
    c0 = (psi_p**2 - psi**2) * psi_p**2 + (l_q * 2 * t / (3 * p)) ** 2
    # companion matrices of monic quartic x^4 + a3 x^3 + a2 x^2 + a1 x + a0
    a3, a2, a1, a0 = c3 / c4, c2 / c4, c1 / c4, c0 / c4
    i_d = _solve_selected_root(a3, a2, a1, a0, method)
    denom = psi_p + (l_d - l_q) * i_d
    denom = np.where(np.abs(denom) < 1e-12, 1e-12, denom)
    i_q = 2 * t / (3 * p * denom)
    return i_d.reshape(tt.shape), i_q.reshape(tt.shape)


def tune_pmsm_ops(env, env_id, current_safety_margin=0.2,
                  max_modulation_level=2 / np.sqrt(3), modulation_damping=1.2):
    """Build all LUTs and scalars (pmsm_ops.py:143-249)."""
    names = list(env.physical_system.state_names)
    limits = np.asarray(env.physical_system.limits, dtype=np.float64)
    mp = env.physical_system.motor.parameter
    p = float(mp["p"])
    l_d, l_q = float(mp["l_d"]), float(mp["l_q"])
    psi_p = float(mp.get("psi_p", 0.0))
    tau = env.physical_system.tau

    i_sd_idx, i_sq_idx = names.index("i_sd"), names.index("i_sq")
    u_sd_idx, u_sq_idx = names.index("u_sd"), names.index("u_sq")
    torque_idx, omega_idx = names.index("torque"), names.index("omega")
    u_a = "u_a" if "u_a" in names else "u_sa"
    u_a_idx = names.index(u_a)

    i_sd_limit = limits[i_sd_idx] * (1 - current_safety_margin)
    i_sq_limit = limits[i_sq_idx] * (1 - current_safety_margin)
    invert = -1.0 if (psi_p == 0 and l_q < l_d) else 1.0

    # ---- modulation controller constants (pmsm_ops.py:158-167)
    alpha = modulation_damping / (modulation_damping - np.sqrt(modulation_damping**2 - 1))
    i_gain = 1 / (l_q / (1.25 * float(mp["r_s"]))) * (alpha - 1) / alpha**2
    psi_high = 0.2 * np.sqrt((psi_p + l_d * i_sd_limit) ** 2 + (l_q * i_sq_limit) ** 2)
    psi_low = -psi_high
    integrated_reset = 0.01 * psi_low
    u_dc = np.sqrt(3) * limits[u_a_idx]
    a_max = max_modulation_level
    k_ = 0.953

    max_torque = max(
        1.5 * p * (psi_p + (l_d - l_q) * (-limits[i_sd_idx])) * i_sq_limit,
        limits[torque_idx],
    )

    # ---- MTPC table (pmsm_ops.py:44-89)
    torques = np.linspace(-max_torque, max_torque, T_COUNT)
    mtpc = []
    for t in torques:
        if psi_p != 0:
            if l_d == l_q:
                i_d = np.zeros(1)
            else:
                i_d = np.linspace(-2.5 * limits[i_sd_idx], 0, I_COUNT)
            i_q = t / (i_d * (l_d - l_q) + psi_p) / (1.5 * p)
        else:
            i_q = np.linspace(-2.5 * limits[i_sq_idx], 2.5 * limits[i_sq_idx], I_COUNT)
            if l_d == l_q:
                i_d = np.zeros(1)
                i_q = t / psi_p if psi_p else i_q
            else:
                i_d = -np.abs(t / (1.5 * p * (l_d - l_q) * i_q))
        mag = i_d**2 + i_q**2
        min_idx = int(np.argmin(mag))
        if l_d == l_q:
            i_q_ret = float(np.atleast_1d(i_q)[min_idx if np.ndim(i_q) else 0])
            i_d_ret = float(np.atleast_1d(i_d)[0])
        else:
            i_q_ret = float(np.sign((l_q - l_d) * t) * np.abs(np.atleast_1d(i_q)[min_idx]))
            i_d_ret = float(np.atleast_1d(i_d)[min_idx])
        psi = np.sqrt((psi_p + l_d * i_d_ret) ** 2 + (l_q * i_q_ret) ** 2)
        mtpc.append([t, i_d_ret, i_q_ret, psi])
    mtpc = np.array(mtpc)

    # ---- MTPF table (pmsm_ops.py:91-141)
    psi_max_mtpf = np.sqrt((psi_p + l_d * i_sd_limit) ** 2 + (l_q * i_sq_limit) ** 2)
    psi_grid_1d = np.linspace(0, psi_max_mtpf, PSI_COUNT)
    i_d_lin = np.linspace(-i_sd_limit, 0, I_COUNT)
    rows = []
    i_d_best = i_q_best = 0.0
    for psi_ in psi_grid_1d:
        if psi_ == 0:
            rows.append([0.0, 0.0, -psi_p / l_d, 0.0])
            continue
        if psi_p == 0:
            i_q_best = psi_ / np.sqrt(l_d**2 + l_q**2)
            i_d_best = -i_q_best
            t = 1.5 * p * (psi_p + (l_d - l_q) * i_d_best) * i_q_best
        else:
            mask = psi_**2 - (psi_p + l_d * i_d_lin) ** 2 >= 0
            i_d_ = i_d_lin[mask]
            i_q = np.sqrt(psi_**2 - (psi_p + l_d * i_d_) ** 2) / l_q
            mask2 = np.sqrt((i_q / i_sq_limit) ** 2 + (i_d_ / i_sd_limit) ** 2) <= 1
            i_d_, i_q = i_d_[mask2], i_q[mask2]
            torque = 1.5 * p * (psi_p + (l_d - l_q) * i_d_) * i_q
            t = 0.0
            if torque.size > 0:
                idx = int(np.argmax(torque))
                t = float(torque[idx])
                i_d_best, i_q_best = float(i_d_[idx]), float(i_q[idx])
        if np.sqrt(i_d_best**2 + i_q_best**2) <= i_sq_limit:
            rows.append([psi_, t, i_d_best, i_q_best])
    pos = np.array(rows)
    psi_max_mtpf = float(np.max(pos[:, 0]))
    neg = np.rot90(np.array([pos[:, 0], -pos[:, 1], pos[:, 2], -pos[:, 3]]))
    mtpf = np.append(neg, pos, axis=0)

    # ---- (torque, flux) -> currents grid via the analytic quartic
    # grid bounds from the feasible current region (pmsm_ops.py:180-207)
    n_half = I_COUNT // 2
    i_d_g, i_q_g = np.meshgrid(
        np.linspace(-limits[i_sd_idx], 0, I_COUNT),
        np.linspace(-limits[i_sq_idx], limits[i_sq_idx], n_half),
        indexing="ij",
    )
    i_d_f, i_q_f = i_d_g.ravel(), i_q_g.ravel()
    if l_d != l_q:
        keep = (np.sign(psi_p + i_d_f * l_d) * (psi_p + i_d_f * l_d) ** 2
                + (i_q_f * l_q) ** 2) > 0
    else:
        keep = psi_p + i_d_f * l_d > 0
    i_d_f, i_q_f = i_d_f[keep], i_q_f[keep]
    t_all = p * 1.5 * (psi_p + (l_d - l_q) * i_d_f) * i_q_f
    psi_all = np.sqrt((l_d * i_d_f + psi_p) ** 2 + (l_q * i_q_f) ** 2)
    t_min, t_max = float(np.amin(t_all)), float(np.amax(t_all))
    psi_min, psi_max = float(np.amin(psi_all)), float(np.amax(psi_all))

    t_lin = np.linspace(t_min, t_max, T_COUNT)
    psi_lin = np.linspace(psi_min, psi_max, PSI_COUNT)
    i_d_lut, i_q_lut = _solve_analytical_grid(l_d, l_q, psi_p, p, t_lin, psi_lin)

    return dict(
        l_d=l_d, l_q=l_q, psi_p=psi_p, p=p, tau=tau, invert=invert,
        i_sd_idx=i_sd_idx, i_sq_idx=i_sq_idx, u_sd_idx=u_sd_idx,
        u_sq_idx=u_sq_idx, omega_idx=omega_idx,
        a_max=a_max, k_=k_, i_gain=i_gain, psi_high=psi_high, psi_low=psi_low,
        integrated_reset=integrated_reset, u_dc=float(u_dc),
        max_torque=float(max_torque),
        mtpc=mtpc, mtpf=mtpf, psi_max_mtpf=psi_max_mtpf,
        t_min=t_min, t_max=t_max, psi_min=psi_min, psi_max=psi_max,
        i_d_lut=i_d_lut, i_q_lut=i_q_lut,
        mtpf_pos_len=len(pos),
    )


def pmsm_ops_reset():
    return {
        "mod_integrated": jnp.zeros(()),
        "mod_limited": jnp.zeros((), bool),
        "mod_a_filt": jnp.zeros((2,)),
    }


def _modulation_control(pp, cs, state):
    """foc_operation_point_selection.py:110-147, branch-free.

    Finite (two-level) output stages additionally low-pass the measured
    modulation index (``a_filter_tau``): the per-cycle applied B6 vector
    always has FULL magnitude (a ~ 1.33 every active cycle), so the raw
    reference law — built for duty-cycle-averaged continuous outputs —
    reads permanent overmodulation, winds its integrator to the floor and
    crushes the flux command (measured on Finite-TC-DFIM: i_sd* at 40%,
    torque at 45% of reference).  PT1-filtering the dq voltage
    COMPONENTS over ~100 switching cycles (they are quasi-DC in the
    field frame; filtering |u| would still read E[|u|] ~ 1.33) recovers
    the duty-cycle-average modulation index the law expects.  The
    reference never exercises this path (its finite AC torque tune
    crashes upstream) — extension, tests/test_controllers.py.
    """
    u_sd, u_sq = state[pp["u_sd_idx"]], state[pp["u_sq_idx"]]
    omega = jnp.maximum(jnp.abs(state[pp["omega_idx"]]), 1e-4)
    if pp.get("a_filter_tau"):
        k_f = pp["tau"] / pp["a_filter_tau"]
        u_f = cs["mod_a_filt"] + k_f * (jnp.stack([u_sd, u_sq])
                                        - cs["mod_a_filt"])
        u_sd, u_sq = u_f[0], u_f[1]
    a = 2.0 * jnp.sqrt(u_sd**2 + u_sq**2) / pp["u_dc"]
    integrated = jnp.where(a > 1.1 * pp["a_max"],
                           pp["integrated_reset"], cs["mod_integrated"])
    a_delta = pp["k_"] * pp["a_max"] - a
    psi_max_ = pp["u_dc"] / (jnp.sqrt(3.0) * omega * pp["p"])
    k_i = 2.0 * omega * pp["p"] / pp["u_dc"]
    psi_delta = pp["i_gain"] / k_i * (a_delta * pp["tau"] + integrated)
    in_range = (psi_delta >= pp["psi_low"]) & (psi_delta <= pp["psi_high"])
    # in range: (reset if previously limited) then accumulate; else hold+clip
    base = jnp.where(cs["mod_limited"], pp["integrated_reset"], integrated)
    new_integrated = jnp.where(in_range, base + a_delta * pp["tau"], integrated)
    new_limited = ~in_range
    psi_delta = jnp.clip(psi_delta, pp["psi_low"], pp["psi_high"])
    psi = psi_max_ + psi_delta
    if pp.get("integ_floor") is not None:
        # Bounded-integrator variant (extension, used for the DFIM cascade
        # which has no upstream counterpart).  The reference's freeze-when-
        # out-of-range anti-windup can latch permanently: after a reset to
        # -0.5*psi_max, psi_delta can sit below psi_low at low speed, the
        # in_range test then never re-latches and the flux command deadlocks
        # near (or below) zero.  A hard clamp on the integrator achieves the
        # same anti-windup without a latch, and because psi_delta and
        # psi_max_ share the 1/omega factor, the floor guarantees
        # psi >= psi_rel_floor*psi_max_ at EVERY speed.
        new_integrated = jnp.clip(integrated + a_delta * pp["tau"],
                                  pp["integ_floor"], 0.0)
        psi = jnp.maximum(psi, pp["psi_rel_floor"] * psi_max_)
    new_cs = {"mod_integrated": new_integrated, "mod_limited": new_limited}
    if pp.get("a_filter_tau"):
        new_cs["mod_a_filt"] = u_f
    return psi, new_cs


def pmsm_select_operating_point(ctrl, cs, state, torque_ref):
    """pmsm_ops.py:304-366 with the 'analytical' LUT path, on device.

    Mutates ``cs`` in place for the modulation-controller scalars (the caller
    copied the dict).
    """
    pp = ctrl.ops_params
    mtpc = jnp.asarray(pp["mtpc"])
    mtpf = jnp.asarray(pp["mtpf"])
    t = torque_ref

    # MTPC index and optimal flux
    t_count = mtpc.shape[0]
    psi_idx_ = jnp.clip(
        jnp.round((t + pp["max_torque"]) / (2 * pp["max_torque"]) * (t_count - 1)).astype(jnp.int32),
        0, t_count - 1,
    )
    psi_opt = mtpc[psi_idx_, 3]

    # modulation controller flux limit
    psi_mod, new_mod = _modulation_control(pp, cs, state)
    cs.update(new_mod)
    psi_max = jnp.minimum(psi_opt, psi_mod)

    # MTPF lookup (negative half; |t|/sign handling as in the reference)
    pos_len = pp["mtpf_pos_len"]
    psi_max_idx = jnp.clip(
        (pos_len - 1)
        - jnp.round(psi_max / pp["psi_max_mtpf"] * (pos_len - 1)).astype(jnp.int32),
        0, mtpf.shape[0] - 1,
    )
    t_max = jnp.abs(mtpf[psi_max_idx, 1])
    t = jnp.where(jnp.abs(t) > t_max, jnp.sign(t) * t_max, t)

    # (t, psi) -> currents LUT
    i_d_lut = jnp.asarray(pp["i_d_lut"])
    i_q_lut = jnp.asarray(pp["i_q_lut"])
    t_idx = jnp.clip(
        jnp.round((jnp.clip(t, pp["t_min"], pp["t_max"]) - pp["t_min"])
                  / (pp["t_max"] - pp["t_min"]) * (i_d_lut.shape[0] - 1)).astype(jnp.int32),
        0, i_d_lut.shape[0] - 1,
    )
    psi_idx = jnp.clip(
        jnp.round((jnp.clip(psi_max, pp["psi_min"], pp["psi_max"]) - pp["psi_min"])
                  / (pp["psi_max"] - pp["psi_min"]) * (i_d_lut.shape[1] - 1)).astype(jnp.int32),
        0, i_d_lut.shape[1] - 1,
    )
    i_d = i_d_lut[t_idx, psi_idx]
    i_q = i_q_lut[t_idx, psi_idx]

    # LUT below MTPF floor -> clamp to MTPF point (pmsm_ops.py:341-347)
    use_mtpf = i_d <= mtpf[psi_max_idx, 2]
    i_d = jnp.where(use_mtpf, mtpf[psi_max_idx, 2], i_d)
    i_q = jnp.where(use_mtpf, jnp.sign(t) * jnp.abs(mtpf[psi_max_idx, 3]), i_q)
    # cap at the MTPC point (pmsm_ops.py:348-351)
    over_mtpc = (~use_mtpf) & (i_d > mtpc[psi_idx_, 1])
    i_d = jnp.where(over_mtpc, mtpc[psi_idx_, 1], i_d)
    i_q = jnp.where(over_mtpc, jnp.sign(t) * jnp.abs(mtpc[psi_idx_, 2]), i_q)
    # final MTPF floor (pmsm_ops.py:354-357)
    below = i_d < mtpf[psi_max_idx, 2]
    i_d = jnp.where(below, mtpf[psi_max_idx, 2], i_d)
    i_q = jnp.where(below, jnp.sign(t) * jnp.abs(mtpf[psi_max_idx, 3]), i_q)

    return jnp.stack([i_d, pp["invert"] * i_q])
