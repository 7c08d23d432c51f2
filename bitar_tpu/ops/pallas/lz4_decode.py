"""Pallas TPU LZ4/Snappy block decode kernel (sequence-table driven).

TPU-native design: decompression splits into a *parse* stage (compressed
bytes -> SoA sequence table) and an *execute* stage (table -> output
bytes).  The execute stage is what runs here: a Pallas kernel, grid over
blocks, each step walking the block's sequence table and materializing
literals + matches with 128-lane vector chunk copies (see ``copydsl.py``).

The parse stage is format logic with a sequential byte walk — it runs in
the native host library at ingest/compress time and ships with the block as
a compact sidecar (the framework's manifest makes framing explicit; the
sidecar makes the *sequence structure* explicit the same way).  Foreign LZ4
data without a sidecar is parsed on ingest (``native.parse_sequences``).

Because Snappy's element list lowers to the same (lit_len, offset, mlen)
row shape (``bt_snappy_parse``), this one kernel executes both formats.

Reference behavior covered: the burst decompress hot loop
(``src/device.cc:241-318``) — here a block's "ops" are its sequences and
the burst is the kernel grid; bit-exactness is asserted by the same
decompressed-vs-original memcmp oracle in the tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .copydsl import copy_match, copy_span, extract_scalar


def _decode_kernel(nseq_ref, litptr_ref, litlen_ref, off_ref, mlen_ref,
                   outpos_ref, comp_ref, out_ref):
    """One grid step decodes one block.

    Refs (leading block dim of 1 squeezed by indexing):
      nseq_ref   (N,) SMEM        scalar-prefetch: per-block sequence counts
      *_ref      (1, S/128, 128)  sequence table columns (lane-tiled)
      comp_ref   (1, Rc, 128)     compressed byte plane
      out_ref    (1, Ro, 128)     output byte plane
    """
    nseq = nseq_ref[pl.program_id(0)]

    def tbl(ref, s):
        return extract_scalar(ref.at[0], s)

    def seq_body(s, _):
        lit_ptr = tbl(litptr_ref, s)
        lit_len = tbl(litlen_ref, s)
        offset = tbl(off_ref, s)
        mlen = tbl(mlen_ref, s)
        out_pos = tbl(outpos_ref, s)

        copy_span(comp_ref.at[0], out_ref.at[0], lit_ptr, out_pos, lit_len)

        @pl.when(mlen > 0)
        def _():
            copy_match(out_ref.at[0], out_pos + lit_len, mlen, offset)

        return 0

    lax.fori_loop(0, nseq, seq_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("comp_rows", "out_rows", "seq_cap", "interpret"))
def decode_blocks(comp, nseq, lit_ptr, lit_len, off, mlen, out_pos,
                  *, comp_rows: int, out_rows: int, seq_cap: int,
                  interpret: bool = False):
    """Decode a batch of blocks.

    Args:
      comp:     [N, comp_rows, 128] int32 byte planes of compressed blocks
      nseq:     [N] int32 sequence counts (scalar-prefetched)
      lit_ptr, lit_len, off, mlen, out_pos: [N, seq_cap] int32 SoA tables
      out_rows: output plane rows (block_size/128 + guard)

    Returns [N, out_rows, 128] int32 byte planes of decompressed blocks.
    """
    n = comp.shape[0]
    assert seq_cap % 128 == 0, seq_cap
    srows = seq_cap // 128
    lit_ptr, lit_len, off, mlen, out_pos = (
        t.reshape(n, srows, 128) for t in (lit_ptr, lit_len, off, mlen, out_pos))
    table_spec = pl.BlockSpec((1, srows, 128), lambda i, nseq_ref: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            table_spec, table_spec, table_spec, table_spec, table_spec,
            pl.BlockSpec((1, comp_rows, 128), lambda i, nseq_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_rows, 128), lambda i, nseq_ref: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _decode_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, out_rows, 128), jnp.int32),
        interpret=interpret,
    )(nseq, lit_ptr, lit_len, off, mlen, out_pos, comp)
