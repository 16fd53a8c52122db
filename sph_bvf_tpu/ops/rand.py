"""Counter-based, order-independent random numbers for pairwise physics.

The reference draws SDPD thermal-noise gaussians from a serial Marsaglia RNG
seeded by wall-clock (pair_ssa_tsdpd_bvf_transport_velocity.cpp:957-959,
random_mars.cpp), which is neither reproducible nor parallelizable.  Here
per-pair noise is a pure function hash(seed, step, tag_lo, tag_hi, salt), so

  * runs are bitwise reproducible given a seed,
  * pair (i,j) and pair (j,i) — evaluated by different particles under the
    full-neighbor formulation — see identical noise (Newton's third law for
    the random force), and
  * there is no cross-device RNG state to synchronize.

The hash is two rounds of a murmur3/xxhash-style 32-bit mix — statistically
ample for thermal forcing (it is not a cryptographic PRNG).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_M1 = np.uint32(0x85EBCA6B)
_M2 = np.uint32(0xC2B2AE35)
_GOLDEN = np.uint32(0x9E3779B9)


def _mix(h):
    h = h ^ (h >> 16)
    h = h * _M1
    h = h ^ (h >> 13)
    h = h * _M2
    h = h ^ (h >> 16)
    return h


def hash_u32(*words):
    """Combine uint32 words into one well-mixed uint32 (shape-broadcasting)."""
    h = jnp.uint32(0x811C9DC5)
    for w in words:
        h = _mix((h ^ jnp.asarray(w, jnp.uint32)) * _GOLDEN + jnp.uint32(1))
    return _mix(h)


def uniform_01(*words):
    """U(0,1) in (0, 1): never exactly 0 or 1 (safe for log on either side).

    Uses the top 24 bits so the float32 mantissa represents the value
    exactly — the naive (bits + 0.5) * 2^-32 rounds to exactly 1.0 for bits
    within ~128 of 2^32, which would make -log(1-u) infinite.
    """
    bits = hash_u32(*words) >> jnp.uint32(8)  # 24 mantissa-exact bits
    return (bits.astype(jnp.float32) + 0.5) * jnp.float32(2.0**-24)


def normal(*words):
    """Standard normal via Box-Muller from two decorrelated uniforms."""
    u1 = uniform_01(*words, jnp.uint32(0x1234ABCD))
    u2 = uniform_01(*words, jnp.uint32(0x77F0551))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * jnp.float32(np.pi) * u2)


def pair_symmetric_normal(seed, step, tag_a, tag_b, salt):
    """Normal deviate identical under (a,b) <-> (b,a) exchange."""
    lo = jnp.minimum(tag_a, tag_b).astype(jnp.uint32)
    hi = jnp.maximum(tag_a, tag_b).astype(jnp.uint32)
    return normal(
        jnp.uint32(seed), jnp.asarray(step, jnp.uint32), lo, hi, jnp.uint32(salt)
    )
