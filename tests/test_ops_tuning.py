"""Tune-time operation-point-selection solver tests (round-2 VERDICT #7).

The EESM LUT build sweeps 750k (torque, flux, excitation) points, each
requiring the reference root of a quartic (eesm_ops.py:143-186).  Round 1
solved them with batched companion-matrix eigvals (~35-40 s per controller
construction); the vectorized Ferrari solver (`pmsm_ops._quartic_roots`)
does the same job in well under a second of compute.  These tests pin both
the numerics (against the eig oracle and np.roots) and the build time.
"""

import time

import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.controllers.induction_eesm_ops import (
    _eesm_solve_analytical,
    tune_eesm_ops,
)
from gym_electric_motor_tpu.controllers.pmsm_ops import (
    _quartic_roots,
    _solve_selected_root,
)


def test_quartic_roots_match_np_roots():
    """Residual check: every returned root satisfies its quartic."""
    rng = np.random.default_rng(1)
    for scale in (1.0, 1e3, 1e-3):
        a = rng.normal(size=(1500, 4)) * scale
        roots = _quartic_roots(a[:, 0], a[:, 1], a[:, 2], a[:, 3])  # (4, n)
        for i in range(0, 1500, 7):
            x = roots[:, i]
            resid = np.abs(x**4 + a[i, 0] * x**3 + a[i, 1] * x**2
                           + a[i, 2] * x + a[i, 3]).max()
            ref = np.abs(np.roots([1.0, *a[i]])).max()
            assert resid / max(1.0, ref) ** 4 < 1e-7, (i, resid)


def test_selected_root_matches_eig_oracle():
    """Ferrari + robust tie-break equals the original companion-eigenvalue
    path on the EESM sweep geometry (the biquadratic i_e = 0 plane included,
    where LAPACK ordering was arbitrary and is now deterministic)."""
    env = gemx.make_functional("Cont-TC-EESM-v0")
    mp = env.physical_system.motor.parameter
    l_d, l_q, l_m, p = (float(mp["l_d"]), float(mp["l_q"]),
                        float(mp["l_m"]), float(mp["p"]))
    tt = np.linspace(0, 60, 18)
    ps = np.linspace(0, 2.5, 19)
    ie = np.linspace(0, 120, 20)
    T, P_, E = np.meshgrid(tt, ps, ie, indexing="ij")
    id_f, iq_f = _eesm_solve_analytical(l_d, l_q, l_m, p, T, P_, E,
                                        method="ferrari")
    id_e, iq_e = _eesm_solve_analytical(l_d, l_q, l_m, p, T, P_, E,
                                        method="eig")
    np.testing.assert_allclose(id_f, id_e, atol=1e-6)
    # i_q = 2t / (3p (psi_e + (l_d - l_q) i_d)) amplifies i_d noise near
    # singular denominators — compare where the denominator is healthy
    healthy = np.abs(l_m * E + (l_d - l_q) * id_e) > 1e-3
    np.testing.assert_allclose(iq_f[healthy], iq_e[healthy],
                               rtol=1e-5, atol=1e-5)


def test_eesm_tune_is_fast():
    """The 750k-point LUT build must not dominate experiment setup.  Round 1:
    ~35-40 s.  Timed warm (first call in a process additionally pays VM
    first-touch page faults, which are environment noise, not compute)."""
    env = gemx.make_functional("Cont-TC-EESM-v0")
    tune_eesm_ops(env, "Cont-TC-EESM-v0")  # warm the allocator arenas
    best = float("inf")
    for _ in range(2):  # best-of-2: xdist co-workers can steal a whole core
        t0 = time.perf_counter()
        tune_eesm_ops(env, "Cont-TC-EESM-v0")
        best = min(best, time.perf_counter() - t0)
    assert best < 10.0, f"EESM tune took {best:.1f}s"


def test_solve_selected_root_chunking_is_transparent():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(70_000, 4))  # crosses the 65536 chunk boundary
    full = _solve_selected_root(a[:, 0], a[:, 1], a[:, 2], a[:, 3])
    head = _solve_selected_root(a[:100, 0], a[:100, 1], a[:100, 2], a[:100, 3])
    np.testing.assert_allclose(full[:100], head, rtol=1e-12, atol=1e-12)
