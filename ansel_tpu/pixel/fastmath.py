"""Bit-exact ports of the reference's fast transcendental approximations.

Reference: `/root/reference/src/math/math.h` — dt_fast_expf (:254-267),
dt_fast_mexp2f (:290-301), fast_mexp2f (:306-316, the deliberately
"incorrect, reduced precision" float-arithmetic variant kept because
fixing it would change nlmeans/denoiseprofile output).

These are NOT conveniences: the reference's denoise weights are defined
in terms of these approximations (eaw.c dn_weight :194, eaw.c weight
:35-36, nlmeans_core.c gh :86), so exact parity requires the same bit
tricks — and they are 3-4 VPU ops where a true exp2 costs a polynomial,
which is why the reference uses them in its hottest loops.  Same here:
replacing jnp.exp2 with these in the EAW/NLM Pallas kernels is both a
fidelity fix and a measured speedup.

All functions are pure jnp (convert + select + bitcast) and legal
inside Pallas TPU kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_I1 = 0x3F800000            # bits of 2^0
_I2_HALF = 0x3F000000       # bits of 2^-1
_I2_E = 0x402DF854          # bits of e^1


def dt_fast_mexp2f(x):
    """2^-x for 0 < x < 126 (math.h:290-301): integer-arithmetic
    variant — k0 = i1 + trunc(x * (i2 - i1)), zero below denormal."""
    x = jnp.asarray(x, jnp.float32)
    k0 = _I1 + (x * float(_I2_HALF - _I1)).astype(jnp.int32)
    k = jnp.where(k0 >= 0x800000, k0, 0)
    return jax.lax.bitcast_convert_type(k, jnp.float32)


def fast_mexp2f(x):
    """2^-x, the reduced-precision float-arithmetic variant
    (math.h:306-316) used by nlmeans.c/denoiseprofile.c weighting —
    kept bit-exact because "fixing it would cause a change in
    output" (the reference's own comment)."""
    x = jnp.asarray(x, jnp.float32)
    k0f = jnp.float32(float(_I1)) + x * jnp.float32(float(_I2_HALF)
                                                    - float(_I1))
    k = jnp.where(k0f >= jnp.float32(float(0x800000)),
                  k0f.astype(jnp.int32), 0)
    return jax.lax.bitcast_convert_type(k, jnp.float32)


def dt_fast_expf(x):
    """e^x for x in [-100, 0] (math.h:254-267)."""
    x = jnp.asarray(x, jnp.float32)
    k0 = (jnp.float32(float(_I1))
          + x * jnp.float32(float(_I2_E - _I1))).astype(jnp.int32)
    k = jnp.where(k0 > 0, k0, 0)
    return jax.lax.bitcast_convert_type(k, jnp.float32)
