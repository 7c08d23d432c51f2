"""Arbitrary-offset device match finding via value sort.

The restricted-window Pallas matcher (``lz4_match.py``) only scores a
static candidate-offset set.  This module finds EXACT greedy matches at
any offset: sort every position's 4-byte prefix value together with its
position; after an ascending (value, position) sort, each element's left
neighbor with an equal value is the MOST RECENT previous occurrence of
the same 4 bytes — precisely the candidate a classic hash-chain matcher
(and our host matcher) would take, with no hash collisions.  The host
emitter (``bt_lz4_emit_sequences`` / ``bt_snappy_emit_sequences``)
verifies and extends every hint, so sort wrap-around at the block tail
can never corrupt the stream.

This is XLA (``lax.sort``), not Pallas: sorting is the one primitive a
hand kernel cannot beat here, and the bitonic sort dominates runtime
(~1.2 ms per 128 KiB block on v5e — use ``compress_matcher="tpu"`` for
speed on pattern data, ``"host"`` for CPU-side quality at line rate).

Reference contrast: bitar ships raw bytes to the DPU DEFLATE engine
(``src/device.cc:157-238``); this module is the "accelerator does the
match search" path with an unrestricted window.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=("length",))
def find_matches_sorted(blocks_u8: jax.Array, *, length: int) -> jax.Array:
    """Most-recent previous 4-byte match offset per position.

    Args:
      blocks_u8: [N, length] uint8 raw bytes (padded blocks are fine —
        hints into padding are discarded by the verifying emitter).

    Returns [N, length] int32: ``off[p] = p - q`` for the largest q < p
    whose 4-byte prefix equals position p's (0 = no previous occurrence).
    The smallest achievable offset, so an off > 65535 result means no
    in-window match exists at p.
    """
    b = blocks_u8.astype(jnp.uint32)
    v = (b
         | (jnp.roll(b, -1, axis=1) << 8)
         | (jnp.roll(b, -2, axis=1) << 16)
         | (jnp.roll(b, -3, axis=1) << 24))
    pos = jnp.broadcast_to(
        jnp.arange(length, dtype=jnp.int32), v.shape)
    sv, sp = lax.sort((v, pos), dimension=1, num_keys=2)
    same = jnp.concatenate(
        [jnp.zeros((v.shape[0], 1), bool), sv[:, 1:] == sv[:, :-1]], axis=1)
    prev = jnp.concatenate(
        [jnp.zeros((v.shape[0], 1), jnp.int32), sp[:, :-1]], axis=1)
    off = jnp.where(same, sp - prev, 0)
    return jax.vmap(lambda o, p, x: o.at[p].set(x))(
        jnp.zeros_like(off), sp, off)
