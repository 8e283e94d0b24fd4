"""Low-pass-count RNG helpers for the general XLA step path.

Every ``jax.random.<dist>(key, ...)`` call costs one full PRNG pass (a
threefry sweep over the batch when the env is vmapped).  The hot rollout
loop — reference advance + in-kernel autoreset — used to spend ~15-20 such
passes per env-step, which dominated the general-path step time on TPU
(measured: the full Finite-CC-PMSM step ran at 60M steps/s while the
physics alone ran at 290M).

The fix: each consumer draws ONE uniform block per step/reset (a single
pass) and converts components to the distributions it needs with the
inverse-CDF transforms below.  The transforms match what jax.random uses
internally (normal = sqrt(2)*erfinv, laplace = signed log1p, truncated
normal = erfinv of the erf-interval), so the *distributions* are identical
— only the stream layout differs, which no parity test depends on (golden
traces pin constant references; stochastic behavior is tested
distributionally).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import erf, erfinv

# Largest float32 strictly below 1 / above -1: keeps the inverse CDFs finite
# at the closed end of the [0, 1) uniform range (same guard jax.random uses).
_ONE_MINUS = float(np.nextafter(np.float32(1), np.float32(0)))


def split_and_uniforms(key, n):
    """``(next_key, u[n])`` in ONE PRNG pass for raw threefry keys.

    ``jax.random.split`` spends one threefry evaluation minting keys and
    every draw spends another; for the classic ``uint32[2]`` key arrays the
    two can share a single evaluation — the first two output words become
    the next key (exactly how ``split`` builds keys from cipher output,
    prng.py upstream), the rest become the uniform block via the same
    bits->float mapping ``jax.random.uniform`` uses.  Each key must be
    consumed by exactly one random op (this one), which is how the env
    threads keys already.

    New-style typed keys (e.g. the documented ``unsafe_rbg`` perf option)
    fall back to split + uniform — their key data layout is impl-specific.
    """
    if is_typed_key(key):
        k_next, k_bits = jax.random.split(key)
        return k_next, jax.random.uniform(k_bits, (n,))
    bits = jax.random.bits(key, (n + 2,), dtype=jnp.uint32)
    return bits[:2], bits_to_uniform(bits[2:])


def is_typed_key(key):
    """True for new-style typed PRNG keys (rbg/unsafe_rbg/...)."""
    return jnp.issubdtype(jnp.asarray(key).dtype, jax.dtypes.prng_key)


def bits_to_uniform(bits):
    """uint32 random bits -> float32 uniforms in [0, 1) (the exact mantissa
    mapping jax.random.uniform uses)."""
    mantissa = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    return jax.lax.bitcast_convert_type(mantissa, jnp.float32) - 1.0


def normal_from_u(u):
    """Standard normal from uniform [0, 1) (inverse CDF, like jax.random.normal)."""
    x = jnp.clip(2.0 * u - 1.0, -_ONE_MINUS, _ONE_MINUS)
    return jnp.sqrt(2.0).astype(x.dtype) * erfinv(x)


def laplace_from_u(u):
    """Standard Laplace from uniform [0, 1) (inverse CDF, like jax.random.laplace)."""
    x = jnp.clip(2.0 * u - 1.0, -_ONE_MINUS, _ONE_MINUS)
    return -jnp.sign(x) * jnp.log1p(-jnp.abs(x))


def truncnorm_from_u(u, a, b):
    """Standard normal truncated to [a, b] from uniform [0, 1)
    (the erf-interval inverse CDF jax.random.truncated_normal uses)."""
    sqrt2 = jnp.sqrt(2.0).astype(jnp.result_type(u, jnp.float32))
    ea = erf(a / sqrt2)
    eb = erf(b / sqrt2)
    x = jnp.clip(ea + u * (eb - ea), -_ONE_MINUS, _ONE_MINUS)
    out = sqrt2 * erfinv(x)
    # clamp like jax.random.truncated_normal (erfinv rounding can exit [a,b])
    return jnp.clip(out, a, b)
