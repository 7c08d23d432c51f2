"""Flat-plan int8 Pallas decoder: the fast LZ4/Snappy/RAW decode path.

Third-generation plan-execute kernel (supersedes the dense kernel in
``lz4_decode_planned.py``).  Same plan semantics — the host planner
(``plan.cc``) schedules slope-1 fragments into passes with at most one
fragment per 128-byte output row per pass — but the execution is rebuilt
around measured TPU facts (ARCHITECTURE.md "Measured TPU facts"; the
ablation history lives in the round-2 notes):

1. **int8 MXU matmuls run 2x bf16** and lower fine from Pallas.  Byte
   planes are stored bias-128 in int8 (``b - 128``, done by the caller on
   device); a 0/1 one-hot times the biased plane accumulates exactly in
   int32.
2. **Paired planes kill half the gathers.**  A source plane carries 256
   lanes: lanes [0,128) hold row r, lanes [128,256) hold row r+1.  One
   one-hot matmul fetches BOTH candidate source rows of every output row
   (slope-1 means each row's source bytes span < 2 rows); a parity
   select picks per byte.
3. **Split source planes break the false store->gather dependency.**
   Comp-source passes gather from a comp-plane scratch that is never
   written after init; out-source passes gather from the out-plane
   scratch.  With one stacked buffer (the v1/v2 design) Mosaic had to
   order every gather after every store — ablation showed the whole
   kernel collapsing from ~15 us/pass to ~2 us/pass once stores stopped
   aliasing gathers.  ``lax.cond`` chunk-skipping was likewise measured
   counterproductive and is gone: each gather is ONE full-K matmul.
4. **Comp-source passes batch CB wide.**  Fragments partition the
   output, so active masks are disjoint across ALL passes; comp passes
   are fully independent and merge through one select chain into a
   single aligned store per batch.  Out passes execute in scheduled
   order (real dependencies), maintaining the paired mirror with a
   sublane roll.
5. **Plans stream from HBM with double-buffered DMA** in DCHUNK-pass
   chunks (the ``pipeline_depth`` knob's home), ``se`` rides int16.
   Both phases are padded to DCHUNK multiples so the two phase loops
   stay branch-free.

Wire format per plan cell (one (pass, row) slot):

* ``se``    int16: ``start << 8 | end`` — row-relative active byte range,
  start in [0, 127], end in [0, 128]; 0 means inactive.
* ``shift`` int32: source byte index = p + shift, in *comp-plane* byte
  coordinates for comp passes and *out-plane* (block-local) coordinates
  for out passes (no stacked-plane rebase — the planes are separate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...status import Status, StatusError


def _invalid(cond: bool, msg: str) -> None:
    """Entry-invariant check that survives ``python -O`` (these guard
    device-poisoning conditions; a stripped assert would hand the kernel
    a mis-sized wire and hang a DMA semaphore)."""
    if not cond:
        raise StatusError(Status.Invalid(msg))


LANES = 128
_PLANS_VMEM_BYTES = 12 * 1024 * 1024   # plans at most this big go VMEM-resident
_S_QUANTUM = 512      # plan-array length rounds up to this (bounds the set
                      # of compiled kernel shapes; S is a static dimension)
CB = 4                # passes per phase batch (and per DMA transfer)
DCHUNK = CB           # plan rows per DMA transfer
KBAND = 256           # source rows per banded-gather matmul chunk
_MT_MAX = 1024        # M-tile rows (bounds VMEM transients; see kernel)
_DENSE_Q = 4          # dense passes batched per gather (anchors stack on M)
_DENSE_SUB = 128      # dense-pass M-subtile rows: each subtile loops only ITS
                      # max window count (per-row window counts are wildly
                      # skewed — measured 14% utilization at whole-block
                      # granularity on markdown, 34% at 128-row subtiles)


def mtile_count(nrows: int, mt_max: int = _MT_MAX) -> int:
    """Number of M-tiles the kernel splits a block's rows into."""
    return nrows // min(nrows, mt_max)


def _colcast(vt, t0: int, nt: int):
    """(128, tiles) sublane-major per-row values -> (nt*128, 128) lane
    broadcast for tiles [t0, t0+nt).

    Row t*128 + l's value lives at vt[l, t]; the result carries it on
    every lane of row (t - t0)*128 + l.  Pure lane broadcasts — Mosaic
    cannot reshape lanes into sublanes, and transposes are relayouts."""
    cols = [jnp.broadcast_to(vt[:, t0 + a:t0 + a + 1], (LANES, LANES))
            for a in range(nt)]
    return jnp.concatenate(cols, axis=0) if nt > 1 else cols[0]


def _flat_kernel(p_used_ref, p_off_ref, p0_ref, dense_ref, dqidx_ref,
                 dnsub_ref, bands_ref, se_ref, shift_ref, dq_ref, row_a_ref,
                 comp_ref, out_ref, comp_sc, out_sc, *rest,
                 comp_rows: int, out_rows: int, gather_rows: int,
                 prefetch: bool,
                 plans_vmem: bool, banded: bool, static_bands: bool,
                 with_dense: bool, mt_max: int, dense_q: int,
                 dense_sub: int):
    if plans_vmem:
        se_buf = shift_buf = sems = None
    else:
        se_buf, shift_buf, sems = rest
    """One grid step decodes one block.  See module docstring.

    Refs:
      p_used_ref (N,) SMEM      per-block total passes (multiple of CB)
      p_off_ref  (N,) SMEM      per-block start row in the flat plan arrays
      p0_ref     (N,) SMEM      per-block comp passes (multiple of CB)
      dense_ref  (N,) SMEM      dense passes; -1 = identity (RAW) block
      dqidx_ref  (N,) SMEM      per-block row into the compact dq/row_a
      se_ref    [S, tiles, 128] int16 HBM   packed start<<8|end
      shift_ref [S, tiles, 128] int32 HBM   source shifts (plane-local)
      comp_ref  (1, comp_rows, 128) VMEM    int8 biased compressed plane
      out_ref   (1, out_rows, 128) VMEM     uint8 decoded byte plane
      comp_sc   (comp_rows, 256) int8       paired comp plane (read-only)
      out_sc    (out_rows, 256) int8        paired out plane
      se_buf    (2*DCHUNK, tiles, 128) int16   double-buffered plan rows
      shift_buf (2*DCHUNK, tiles, 128) int32
      sems      (2, 2) DMA semaphores [kind, slot]
    """
    nrows = out_rows
    b = pl.program_id(0)
    npass = p_used_ref[b]          # total passes, multiple of CB
    ncomp = p0_ref[b]              # comp passes, multiple of CB
    base = p_off_ref[b]

    # Identity-dense (RAW stored) block: the decoded bytes ARE the comp
    # plane — one unbiased VMEM copy, no scratch work, no wire.
    @pl.when(dense_ref[b] < 0)
    def _identity():
        cr = min(comp_rows, nrows)
        ident = (comp_ref[0][:cr].astype(jnp.int32) + 128).astype(jnp.uint8)
        if cr < nrows:
            out_ref[0, :cr] = ident
            out_ref[0, cr:] = jnp.zeros((nrows - cr, LANES), jnp.uint8)
        else:
            out_ref[0] = ident

    @pl.when(dense_ref[b] >= 0)
    def _scratch_init():
        # Non-identity blocks' comp bytes fit gather_rows (<= comp_rows:
        # the full plane height is driven by identity/RAW blocks, which
        # never touch this scratch) — fills and gather K shrink to the
        # data that can actually be sourced.
        comp_i8 = comp_ref[0][:gather_rows]
        comp_sc[:, 0:LANES] = comp_i8
        comp_sc[:, LANES:2 * LANES] = jnp.roll(comp_i8, -1, axis=0)
        if with_dense:
            # Third pane (row + 2) for the dense 3-row source window.
            comp_sc[:, 2 * LANES:] = jnp.roll(comp_i8, -2, axis=0)

    # All per-pass work is M-tiled at MT rows so VMEM transients stay
    # bounded regardless of block size (a [nrows, *] int32 working set
    # blows the 16 MiB scoped budget past 1024 rows).
    MT = min(nrows, mt_max)
    KC = 1024
    lane_iota = lax.broadcasted_iota(jnp.int32, (MT, LANES), 1)
    row_iota = lax.broadcasted_iota(jnp.int32, (MT, LANES), 0)

    def fetch(chunk, slot):
        row = base + chunk * DCHUNK
        pltpu.make_async_copy(
            se_ref.at[pl.ds(row, DCHUNK)],
            se_buf.at[pl.ds(slot * DCHUNK, DCHUNK)],
            sems.at[0, slot]).start()
        pltpu.make_async_copy(
            shift_ref.at[pl.ds(row, DCHUNK)],
            shift_buf.at[pl.ds(slot * DCHUNK, DCHUNK)],
            sems.at[1, slot]).start()

    if plans_vmem:
        def fetch(chunk, slot):  # noqa: F811  (whole plan resident in VMEM)
            del chunk, slot

        def wait_slot(slot):     # noqa: F811
            del slot

    def wait_slot(slot):
        pltpu.make_async_copy(
            se_ref.at[pl.ds(0, DCHUNK)],
            se_buf.at[pl.ds(slot * DCHUNK, DCHUNK)],
            sems.at[0, slot]).wait()
        pltpu.make_async_copy(
            shift_ref.at[pl.ds(0, DCHUNK)],
            shift_buf.at[pl.ds(slot * DCHUNK, DCHUNK)],
            sems.at[1, slot]).wait()

    # One-hot construction is an [MT, K] int32 elementwise compare per
    # gather.  Narrower compares do NOT help: v5e has no 16-bit iota and
    # "target does not support this comparison" for int16 == (measured) —
    # the VPU is 32-bit-laned, so int32 is already its native compare.
    mtiles = nrows // MT

    def one_pass_tile(tv, src_ref, mt, band=None):
        """Gather + merge inputs for output rows [mt, mt+MT) of one pass
        whose pre-transposed plan values sit in ``tv`` (see
        ``chunk_values``), sourcing from ``src_ref``.

        ``band`` (banded mode) is the pass's packed source-row band word
        for this M-tile: ``base << 8 | nchunks`` with base 8-aligned and
        ``base + nchunks*KB <= krows`` (host guarantee, KB =
        min(KBAND, krows) — small planes shrink the chunk so the dynamic
        slice stays in bounds); the gather then runs ``nchunks`` KB-row
        matmuls instead of full K.  An all-inactive pass carries
        nchunks == 0 and gathers nothing.

        Returns (active, val_i8): the tile's write mask + biased bytes.
        """
        krows = src_ref.shape[0]
        t0 = mt // LANES
        nt = MT // LANES
        vt_se, vt_sh, j = tv
        se = _colcast(vt_se, j * tiles + t0, nt)
        shift = _colcast(vt_sh, j * tiles + t0, nt)
        start = lax.shift_right_logical(se, 8)
        end = lax.bitwise_and(se, 0xFF)
        active = jnp.logical_and(lane_iota >= start, lane_iota < end)

        byte_iota = (row_iota + mt) * LANES + lane_iota   # block-absolute
        q = byte_iota + shift
        qrow = lax.shift_right_logical(q, 7)
        qlane = lax.bitwise_and(q, LANES - 1)
        # Source row straight off the plan: the first active byte of row r
        # sits at start + r*128 + shift, so row_a = that >> 7.
        row_a_full = lax.shift_right_logical(
            jnp.maximum(start + byte_iota - lane_iota + shift, 0), 7)
        row_a = jnp.minimum(row_a_full[:, 0:1], krows - 1)

        if band is not None:
            KB = min(KBAND, krows)
            kiota_b = lax.broadcasted_iota(jnp.int32, (MT, KB), 1)
            b0 = lax.shift_right_logical(band, 8)
            if static_bands:
                # Planner-enforced bands (bt_plan_batch band_rows=KBAND):
                # every (pass, tile)'s sources fit ONE window, so the
                # gather is a single branch-free static-K matmul.  An
                # inactive pass carries band 0 and gathers garbage that
                # the all-false active mask discards.
                oh = (kiota_b == (row_a - b0)).astype(jnp.int8)
                src = src_ref[pl.ds(pl.multiple_of(b0, 8), KB), 0:2 * LANES]
                acc = jnp.dot(oh, src, preferred_element_type=jnp.int32)
            else:
                bcnt = lax.bitwise_and(band, 0xFF)

                def gather_chunk(ci, acc):
                    k0 = b0 + ci * KB
                    oh = (kiota_b == (row_a - k0)).astype(jnp.int8)
                    # base is 8-aligned by host construction; Mosaic needs
                    # the hint to emit an aligned sublane load.
                    src = src_ref[pl.ds(pl.multiple_of(k0, 8), KB),
                                  0:2 * LANES]
                    return acc + jnp.dot(oh, src,
                                         preferred_element_type=jnp.int32)

                acc = lax.fori_loop(0, bcnt, gather_chunk,
                                    jnp.zeros((MT, 2 * LANES), jnp.int32))
        else:
            acc = jnp.zeros((MT, 2 * LANES), jnp.int32)
            for ck in range(0, krows, KC):
                kc = min(KC, krows - ck)
                # Per-chunk iota instead of slicing one [MT, KC] iota:
                # the tail chunk's strided slice (kc < KC) crashes the
                # Mosaic vector-layout pass (Check limits <= dim, observed
                # on comp_rows = 1280 planes).
                kio = lax.broadcasted_iota(jnp.int32, (MT, kc), 1)
                oh = (kio == (row_a - ck)).astype(jnp.int8)
                acc = acc + jnp.dot(oh, src_ref[ck:ck + kc, 0:2 * LANES],
                                    preferred_element_type=jnp.int32)
        v_a = jnp.take_along_axis(acc[:, :LANES], qlane, axis=1)
        v_b = jnp.take_along_axis(acc[:, LANES:], qlane, axis=1)
        val = jnp.where(qrow == row_a, v_a, v_b)              # biased int32
        return active, val.astype(jnp.int8)

    def band_of(c, j, mt):
        """This pass+M-tile's band word from the SMEM band table."""
        if not banded:
            return None
        prow = base + c * DCHUNK + j
        return bands_ref[prow * mtiles + mt // MT]

    tiles = nrows // LANES

    def chunk_values(c, slot):
        """Transpose the chunk's DCHUNK passes of plan rows ONCE:
        [DCHUNK*tiles, 128] -> [128, DCHUNK*tiles] registers.  Per-pass
        per-tile expansion is then a plain lane broadcast of one column
        (the per-pass transposes were ~40% of pass cost in ablation).
        With VMEM-resident plans the rows load straight from the input
        block; with HBM plans they come from the DMA double buffer."""
        if plans_vmem:
            tt = se_ref[pl.ds(base + c * DCHUNK, DCHUNK)].astype(jnp.int32)
            tt2 = shift_ref[pl.ds(base + c * DCHUNK, DCHUNK)]
        else:
            tt = se_buf[pl.ds(slot * DCHUNK, DCHUNK)].astype(jnp.int32)
            tt2 = shift_buf[pl.ds(slot * DCHUNK, DCHUNK)]
        vt_se = tt.reshape(DCHUNK * tiles, LANES).T
        vt_sh = tt2.reshape(DCHUNK * tiles, LANES).T
        return vt_se, vt_sh

    def stage_plans(c, slot):
        """Plan staging: double-buffered lookahead (pipeline_depth 2) or
        fetch-and-wait in place (pipeline_depth 1); no-op with
        VMEM-resident plans."""
        if plans_vmem:
            return
        if prefetch:
            @pl.when(c + 1 < nchunks)
            def _():
                fetch(c + 1, 1 - slot)
        else:
            fetch(c, slot)
        wait_slot(slot)

    def comp_chunk(c, _):
        """CB independent comp passes merged into one aligned store per
        M-tile."""
        slot = lax.rem(c, 2)
        stage_plans(c, slot)
        vt_se, vt_sh = chunk_values(c, slot)
        for mt in range(0, nrows, MT):
            cur = out_sc[mt:mt + MT, 0:LANES]
            for j in range(CB):
                a_j, v_j = one_pass_tile((vt_se, vt_sh, j), comp_sc, mt,
                                         band_of(c, j, mt))
                cur = jnp.where(a_j, v_j, cur)
            out_sc[mt:mt + MT, 0:LANES] = cur
        return 0

    def out_chunk(c, _):
        """CB scheduled out passes; maintains the paired mirror (the
        full-plane roll handles tile boundaries: row mt+MT-1's mirror is
        the next tile's first row)."""
        slot = lax.rem(c, 2)
        stage_plans(c, slot)
        vt_se, vt_sh = chunk_values(c, slot)
        for j in range(CB):
            for mt in range(0, nrows, MT):
                a, v = one_pass_tile((vt_se, vt_sh, j), out_sc, mt,
                                     band_of(c, j, mt))
                cur = out_sc[mt:mt + MT, 0:LANES]
                out_sc[mt:mt + MT, 0:LANES] = jnp.where(a, v, cur)
            out_sc[:, LANES:] = jnp.roll(out_sc[:, 0:LANES], -1, axis=0)
        return 0

    nchunks = npass // DCHUNK
    ncomp_chunks = ncomp // DCHUNK
    if prefetch and not plans_vmem:
        # A zero-pass block (host-fallback placeholder) must not start a
        # DMA it will never wait on — the chunk loops have zero trips and
        # an un-awaited semaphore poisons the device (measured:
        # FAILED_PRECONDITION on the next launch).
        @pl.when(nchunks > 0)
        def _():
            fetch(0, 0)

    if with_dense:
        # --- Dense comp passes: comp cells covered by a row's <= 63
        # greedy 3-row windows execute here from the per-byte wire (see
        # plan.cc Densify) — one anchored gather + select per window set
        # replaces up to ~56 scheduled comp passes on fragment-dense
        # data.  The wire's 6-bit pass-id field selects which bytes each
        # dense pass writes.  Two measured facts shape the loop:
        #   * per-ROW window counts are wildly skewed (markdown: 2/3 of
        #     rows carry NO dense cells; mean/max = 14%), so looping the
        #     whole block to the block max wastes ~6x the gather work —
        #     each DS-row SUBTILE loops only to ITS own max (dnsub_ref,
        #     derived from the wire's top bits in the wrapper);
        #   * passes all read the never-written comp scratch, so they
        #     are mutually independent — Q of them batch into ONE
        #     stacked gather (anchors concatenated along M).
        DS = min(nrows, dense_sub, MT)
        nsub = nrows // DS
        @pl.when(dense_ref[b] > 0)
        def _dense():
            nd = dense_ref[b]
            di = dqidx_ref[b]
            Q = dense_q
            for st in range(0, nrows, DS):
                t0 = st // LANES
                nt = DS // LANES
                v = dq_ref[0][st:st + DS].astype(jnp.int32)
                pid = lax.bitwise_and(lax.shift_right_logical(v, 9), 0x3F)
                qlane = lax.bitwise_and(v, LANES - 1)
                dr = lax.bitwise_and(lax.shift_right_logical(v, 7), 3)
                # NOTE (measured 2026-08-19): fusing the 3 takes into one
                # take over the 384-wide window fails Mosaic lowering —
                # dynamic lane gathers must stay within one 128-lane
                # tile.  The 3-take + select chain is the lowerable form.
                qlane_q = jnp.concatenate([qlane] * Q, axis=0)
                dr_q = jnp.concatenate([dr] * Q, axis=0)
                ndm = dnsub_ref[di * nsub + st // DS]

                def dense_quad(g, cur):
                    j0 = g * Q
                    # Pass ids past nd-1 clamp to a valid anchor row (the
                    # wire may not be Q-padded); their pid test j+1 > nd
                    # never matches, so the clamped gather is dead work,
                    # not a wrong write.
                    ra1 = jnp.concatenate(
                        [_colcast(row_a_ref[0, jnp.minimum(j0 + q, nd - 1)],
                                  t0, nt)[:, 0:1] for q in range(Q)], axis=0)
                    acc = jnp.zeros((Q * DS, 3 * LANES), jnp.int32)
                    for ck in range(0, gather_rows, KC):
                        kc = min(KC, gather_rows - ck)
                        kio = lax.broadcasted_iota(jnp.int32, (Q * DS, kc), 1)
                        oh = (kio == (ra1 - ck)).astype(jnp.int8)
                        acc = acc + jnp.dot(oh, comp_sc[ck:ck + kc, :],
                                            preferred_element_type=jnp.int32)
                    va = jnp.take_along_axis(acc[:, 0:LANES], qlane_q, axis=1)
                    vb = jnp.take_along_axis(acc[:, LANES:2 * LANES], qlane_q,
                                             axis=1)
                    vc = jnp.take_along_axis(acc[:, 2 * LANES:], qlane_q,
                                             axis=1)
                    val = jnp.where(dr_q == 0, va,
                                    jnp.where(dr_q == 1, vb, vc)).astype(
                                        jnp.int8)
                    for q in range(Q):
                        cur = jnp.where(pid == j0 + q + 1,
                                        val[q * DS:(q + 1) * DS], cur)
                    return cur

                out_sc[st:st + DS, 0:LANES] = lax.fori_loop(
                    0, (ndm + Q - 1) // Q, dense_quad,
                    out_sc[st:st + DS, 0:LANES])

    @pl.when(dense_ref[b] >= 0)
    def _phases():
        lax.fori_loop(0, ncomp_chunks, comp_chunk, 0)

        # Comp batches skip mirror upkeep; sync once before the out
        # phase — only needed if out passes will read the mirror.
        @pl.when(nchunks > ncomp_chunks)
        def _out_phase():
            out_sc[:, LANES:] = jnp.roll(out_sc[:, 0:LANES], -1, axis=0)
            lax.fori_loop(ncomp_chunks, nchunks, out_chunk, 0)

        out_ref[0] = (out_sc[:, 0:LANES].astype(jnp.int32)
                      + 128).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=("comp_rows", "out_rows", "gather_rows", "interpret",
                     "pipeline_depth", "mt_max", "static_bands", "dense_q",
                     "dense_sub"))
def decode_blocks_flat(comp, p_used, p_off, p0, se_flat, shift_flat,
                       bands=None, dq=None, row_a=None, dense=None,
                       dq_idx=None, *,
                       comp_rows: int, out_rows: int,
                       gather_rows: int | None = None,
                       interpret: bool = False, pipeline_depth: int = 2,
                       mt_max: int = _MT_MAX, static_bands: bool = False,
                       dense_q: int = _DENSE_Q, dense_sub: int = _DENSE_SUB):
    """Decode a batch of blocks via flat (pad-free) scheduled plans.

    Args:
      comp:     [N, comp_rows, 128] int8 biased compressed planes
                (byte - 128; see ``bias_planes``)
      p_used:   [N] int32 per-block scheduled pass counts (multiples of
                CB; 0 for identity-dense and dense-only blocks)
      p_off:    [N] int32 per-block start row into the flat plan arrays
      p0:       [N] int32 per-block comp-pass counts (multiples of CB)
      se_flat:  [S, out_rows/128, 128] int16, S >= sum(p_used) + DCHUNK
                (slack rows keep the fixed-size DMA in bounds; contents
                are never read)
      shift_flat: [S, out_rows/128, 128] int32
      bands:    optional [S * mtiles] int32 banded-gather table from
                ``compute_bands``: per (pass, M-tile) packed source-row
                band ``base << 8 | nchunks``.  When given, each gather
                runs nchunks KBAND-row matmuls instead of full K — the
                speed-of-light lever when source rows cluster (always,
                for compressible data).  None = full-K gathers.
      pipeline_depth: 2 = prefetch the next plan chunk during compute
                (default); 1 = serial fetch-then-compute (debug/compare)
      static_bands: host promise that every band word covers the pass's
                sources in ONE window (plans built with band_rows=KBAND),
                so gathers lower to a single branch-free static-K matmul
                — the cheapest gather shape.  Requires ``bands``.

    Returns [N, out_rows, 128] uint8 decoded byte planes.
    """
    # Entry invariants guard device-poisoning conditions (e.g. an
    # un-awaited DMA semaphore when the wire is mis-sized), so they are
    # StatusErrors, not asserts — ``python -O`` must not strip them.
    _invalid(pipeline_depth in (1, 2), "plan DMA supports depth 1 or 2")
    banded = bands is not None
    _invalid(not (static_bands and not banded), "static_bands requires bands")
    _invalid(1 <= dense_q <= 8, "dense_q batches 1..8 passes per gather")
    _invalid(dense_sub % LANES == 0, "dense_sub must be a 128-row multiple")
    _invalid(
        not (static_bands and mt_max > _MT_MAX),
        "planner band tiles are 1024 rows; coarser M-tiles break the promise")
    if not banded:
        bands = jnp.zeros(1, jnp.int32)       # placeholder, never read
    n = comp.shape[0]
    with_dense = dq is not None
    _invalid(with_dense == (row_a is not None) == (dense is not None),
             "dq/row_a/dense travel together")
    if not with_dense:                        # placeholders, never read
        dq = jnp.zeros((1, 8, 128), jnp.int16)
        row_a = jnp.zeros((1, 1, 8, 128), jnp.int32)
        dense = jnp.zeros(n, jnp.int32)
        dq_idx = jnp.zeros(n, jnp.int32)
    elif dq_idx is None:
        # Uncompacted planes: block i's wire lives at row i.
        dq_idx = jnp.arange(n, dtype=jnp.int32)
    ds_rows = min(out_rows, dense_sub, mt_max)
    nsub = out_rows // ds_rows
    if with_dense:
        # Per-(wire row, subtile) max window count, so each subtile's
        # dense loop stops at ITS own max.  pid rides the wire's TOP
        # used bits (value = pid<<9 | dr<<7 | qlane, bit 15 clear), so a
        # plain max over the wire recovers max pid — one cheap reduce
        # per launch, no extra host wire.
        row_wc = lax.shift_right_logical(
            jnp.max(dq.astype(jnp.int32), axis=2), 9)
        dn_sub = jnp.max(
            row_wc.reshape(dq.shape[0], nsub, ds_rows), axis=2
        ).reshape(-1).astype(jnp.int32)
    else:
        dn_sub = jnp.zeros(nsub, jnp.int32)   # placeholder, never read
    nrows = out_rows
    _invalid(nrows % LANES == 0, "flat kernel requires out_rows % 128 == 0")
    _invalid(comp_rows % LANES == 0, "gather K dim wants lane-tiled comp_rows")
    if gather_rows is None:
        gather_rows = comp_rows
    _invalid(gather_rows % LANES == 0 and gather_rows <= comp_rows,
             "gather_rows must be lane-tiled and within the comp plane")
    _invalid(se_flat.shape[0] >= DCHUNK, "plan arrays need DCHUNK slack rows")
    _invalid(se_flat.dtype == jnp.int16 and shift_flat.dtype == jnp.int32,
             "se/shift wire dtypes must be int16/int32")
    _invalid(comp.dtype == jnp.int8, "comp planes must be biased int8")
    tiles = nrows // LANES
    # Small plan batches live wholly in VMEM (loaded once — the index map
    # is constant, so Pallas does not re-fetch per grid step) and skip the
    # DMA double-buffer machinery entirely; large batches stream from HBM.
    plans_vmem = (se_flat.nbytes + shift_flat.nbytes) <= _PLANS_VMEM_BYTES
    if plans_vmem:
        plan_specs = [
            pl.BlockSpec(se_flat.shape, lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(shift_flat.shape, lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        extra_scratch = []
    else:
        plan_specs = [
            pl.BlockSpec(memory_space=pltpu.HBM),   # se_flat stays in HBM
            pl.BlockSpec(memory_space=pltpu.HBM),   # shift_flat stays in HBM
        ]
        extra_scratch = [
            pltpu.VMEM((2 * DCHUNK, tiles, LANES), jnp.int16),
            pltpu.VMEM((2 * DCHUNK, tiles, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
    if with_dense:
        # Block i's wire row comes from the dq_idx prefetch vector (the
        # planes are compacted: identity/none blocks carry no wire and
        # point at a neighboring row, which Pallas only re-fetches when
        # the index changes).
        def _dq_map(i, pu, po, p0r, dn, di, ds, bd):
            return (di[i], 0, 0)

        def _ra_map(i, pu, po, p0r, dn, di, ds, bd):
            return (di[i], 0, 0, 0)

        dense_specs = [
            pl.BlockSpec((1,) + dq.shape[1:], _dq_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + row_a.shape[1:], _ra_map,
                         memory_space=pltpu.VMEM),
        ]
    else:
        dense_specs = [
            pl.BlockSpec((1,) + dq.shape[1:], lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + row_a.shape[1:], lambda i, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(n,),
        in_specs=plan_specs + dense_specs + [
            pl.BlockSpec((1, comp_rows, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_rows, 128), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((gather_rows, (3 if with_dense else 2) * LANES),
                       jnp.int8),
            pltpu.VMEM((out_rows, 2 * LANES), jnp.int8),
        ] + extra_scratch,
    )
    kernel = functools.partial(
        _flat_kernel, comp_rows=comp_rows, out_rows=out_rows,
        gather_rows=gather_rows,
        prefetch=pipeline_depth == 2, plans_vmem=plans_vmem, banded=banded,
        static_bands=static_bands, with_dense=with_dense, mt_max=mt_max,
        dense_q=dense_q, dense_sub=dense_sub)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, out_rows, 128), jnp.uint8),
        # The default 16 MiB scoped-VMEM budget undercounts large-block
        # working sets; v5e carries 128 MiB of VMEM (config.py cites the
        # public spec) — grant the kernel half.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(p_used, p_off, p0, dense, dq_idx, dn_sub, bands, se_flat, shift_flat,
      dq, row_a, comp)


@functools.partial(jax.jit, static_argnames=("comp_rows",))
def bias_planes(rows_u8: jax.Array, comp_rows: int) -> jax.Array:
    """[n, slot] u8 arena rows -> [n, comp_rows, 128] int8 biased planes."""
    n = rows_u8.shape[0]
    want = comp_rows * 128
    have = rows_u8.shape[1]
    flat = rows_u8[:, :want] if have >= want else jnp.pad(
        rows_u8, ((0, 0), (0, want - have)))
    return (flat.astype(jnp.int32) - 128).astype(jnp.int8).reshape(
        n, comp_rows, 128)


def pad_plan_counts(P: int, p0: int) -> tuple[int, int]:
    """Pad (total, comp) pass counts to CB multiples (empty passes)."""
    p0_pad = -(-p0 // CB) * CB
    total_pad = p0_pad + -(-(P - p0) // CB) * CB
    return max(total_pad, CB), p0_pad


def pack_plan_flat(r_dstart, r_dend, r_shift, p0, comp_rows):
    """Host-side flat-plan packing for one block.

    Takes the planner's [P, nrows] int32 tables (block-absolute
    dstart/dend, plane-local shifts, comp-pass count p0) and produces the
    padded flat wire rows:

      (se [Ppad, nrows] int16, shift [Ppad, nrows] int32, Ppad, p0_pad)

    Comp passes land in [0, p0_pad), out passes in [p0_pad, Ppad);
    padding passes are empty (se == 0).  ``comp_rows`` is unused (shifts
    stay plane-local with split planes) but kept for signature stability.
    """
    del comp_rows
    P, nrows = r_dstart.shape
    row_lo = np.arange(nrows, dtype=np.int32)[None, :] * LANES
    start = np.clip(r_dstart - row_lo, 0, LANES).astype(np.int32)
    end = np.clip(r_dend - row_lo, 0, LANES).astype(np.int32)
    se = ((start << 8) | end).astype(np.int16)    # start<=127 -> fits 15 bits
    shift = r_shift

    Ppad, p0_pad = pad_plan_counts(P, p0)
    se_o = np.zeros((Ppad, nrows), np.int16)
    sh_o = np.zeros((Ppad, nrows), np.int32)
    se_o[:p0] = se[:p0]
    sh_o[:p0] = shift[:p0]
    nout = P - p0
    se_o[p0_pad:p0_pad + nout] = se[p0:P]
    sh_o[p0_pad:p0_pad + nout] = shift[p0:P]
    return se_o, sh_o, Ppad, p0_pad


def flatten_batch_plans(se, shift, p_used, p0, nrows):
    """Compact ``bt_plan_batch`` buffers into the flat wire dict.

    ``se``/``shift``: [n, max_passes, nrows] per-block plan buffers with
    only the first ``p_used[i]`` passes populated.  Returns the same dict
    shape as ``build_flat_plans`` (pad-free rows + DCHUNK slack).
    """
    n, mp, _ = se.shape
    tiles = nrows // LANES
    p_used = p_used.astype(np.int32)
    p_off = np.zeros(n, np.int32)
    p_off[1:] = np.cumsum(p_used)[:-1]
    S = int(p_used.sum())
    sel = np.concatenate(
        [np.arange(i * mp, i * mp + int(p_used[i])) for i in range(n)]
    ) if n else np.zeros(0, np.int64)
    # Quantize the array length: it is part of the kernel's compiled
    # shape, and every distinct S would otherwise trigger a fresh Mosaic
    # compile (minutes on a remote compiler) per unit.
    S_pad = -(-(S + DCHUNK) // _S_QUANTUM) * _S_QUANTUM
    se_flat = np.zeros((S_pad, tiles, LANES), np.int16)
    sh_flat = np.zeros((S_pad, tiles, LANES), np.int32)
    se_flat[:S] = se.reshape(n * mp, tiles, LANES)[sel]
    sh_flat[:S] = shift.reshape(n * mp, tiles, LANES)[sel]
    return {"p_used": p_used, "p_off": p_off, "p0": p0.astype(np.int32),
            "se": se_flat, "shift": sh_flat}


def pack_row_a_planes(row_a: np.ndarray, dcap: int) -> np.ndarray:
    """[m, D, nrows] pass-major anchors -> the kernel's [m, dcap, 128,
    tiles] column layout (trimmed or zero-padded to ``dcap`` planes).
    The single writer of this layout — keep the engine and the test
    helper byte-identical."""
    m, D, nrows = row_a.shape
    tiles = nrows // LANES
    ra = row_a[:, :dcap]
    if dcap > D:
        ra = np.pad(ra, ((0, 0), (0, dcap - D), (0, 0)))
    return np.ascontiguousarray(
        ra.reshape(m, dcap, tiles, LANES).transpose(0, 1, 3, 2))


def attach_dense_planes(plans: dict, dq: np.ndarray, row_a: np.ndarray,
                        dense: np.ndarray) -> dict:
    """Attach the planner's dense comp-pass planes to a flat-plan dict.

    ``dq``: [n, nrows, 128] int16 per-byte wire, ``row_a``:
    [n, D, nrows] int32 pass-major per-row anchors (re-laid to the
    kernel's [D, 128, tiles] column layout), ``dense``: [n] dense-pass
    counts.  Plans built by ``bt_plan_batch*`` REQUIRE these planes:
    densified comp cells leave the pass schedule, so executing the
    schedule alone decodes incompletely.
    """
    n, D, nrows = row_a.shape
    plans["dq"] = dq
    # Trim anchor planes to the unit's true dense-pass count, quantized
    # to powers of two so the kernel shape (and its Mosaic compile) is
    # shared across units.
    dmax = max(1, int(dense.max(initial=0)))
    dcap = min(D, 1 << (dmax - 1).bit_length())
    if nrows % LANES == 0:
        plans["row_a"] = pack_row_a_planes(row_a, dcap)
    else:
        # Oracle-only plans (the kernel requires lane-tiled rows): keep
        # the natural per-row layout, which decode_flat_numpy accepts.
        plans["row_a"] = row_a
    plans["dense"] = dense.astype(np.int32)
    return plans


def concat_flat_plans(parts: list[dict]) -> dict:
    """Merge per-chunk ``flatten_batch_plans`` outputs into one wire.

    Each part's slack/quantization padding is stripped (only its
    ``p_used.sum()`` true rows are kept); the merged wire re-adds one
    DCHUNK slack and one quantization.  Lets callers plan huge units in
    bounded-scratch chunks without per-chunk wire waste.
    """
    if len(parts) == 1:
        return parts[0]
    p_used = np.concatenate([p["p_used"] for p in parts])
    p0 = np.concatenate([p["p0"] for p in parts])
    sizes = [int(p["p_used"].sum()) for p in parts]
    S = sum(sizes)
    S_pad = -(-(S + DCHUNK) // _S_QUANTUM) * _S_QUANTUM
    tiles = parts[0]["se"].shape[1]
    se = np.zeros((S_pad, tiles, LANES), np.int16)
    sh = np.zeros((S_pad, tiles, LANES), np.int32)
    offs = []
    o = 0
    for p, sz in zip(parts, sizes):
        se[o:o + sz] = p["se"][:sz]
        sh[o:o + sz] = p["shift"][:sz]
        offs.append(p["p_off"].astype(np.int64) + o)
        o += sz
    return {"p_used": p_used, "p_off": np.concatenate(offs).astype(np.int32),
            "p0": p0, "se": se, "shift": sh}


def build_flat_plans(per_block, comp_rows, nrows):
    """Assemble per-block planner outputs into the kernel's wire arrays.

    ``per_block``: list of (P, p0, cols) planner results.
    Returns dict with p_used, p_off, p0 (all [N] int32), se
    [S, tiles, 128] int16, shift [S, tiles, 128] int32 (S includes
    DCHUNK slack rows).
    """
    tiles = nrows // LANES
    packed = [
        pack_plan_flat(cols["r_dstart"][:P], cols["r_dend"][:P],
                       cols["r_shift"][:P], p0, comp_rows)
        for (P, p0, cols) in per_block]
    n = len(packed)
    p_used = np.array([p[2] for p in packed], np.int32)
    p0s = np.array([p[3] for p in packed], np.int32)
    p_off = np.zeros(n, np.int32)
    p_off[1:] = np.cumsum(p_used)[:-1]
    S = int(p_used.sum())
    S_pad = -(-(S + DCHUNK) // _S_QUANTUM) * _S_QUANTUM
    se = np.zeros((S_pad, tiles, LANES), np.int16)
    shift = np.zeros((S_pad, tiles, LANES), np.int32)
    for i, (se_i, sh_i, Ppad, _) in enumerate(packed):
        o = p_off[i]
        se[o:o + Ppad] = se_i.reshape(Ppad, tiles, LANES)
        shift[o:o + Ppad] = sh_i.reshape(Ppad, tiles, LANES)
    return {"p_used": p_used, "p_off": p_off, "p0": p0s,
            "se": se, "shift": shift}


def bands_supported(comp_rows: int, nrows: int) -> bool:
    """True when both source planes admit banded gathers: each plane's
    chunk KB = min(KBAND, krows) must tile the plane exactly so a band
    window can always be slid fully inside it (kr % KB == 0; kr = 384
    with KB = 256 cannot be covered without overhang)."""
    return all(k % min(KBAND, k) == 0 for k in (comp_rows, nrows))


def compute_bands(plans: dict, comp_rows: int, nrows: int,
                  mt_max: int = _MT_MAX) -> np.ndarray:
    """Per-(pass, M-tile) source-row bands for the banded-gather kernel.

    For every populated pass row the source rows the kernel will gather
    are fully determined by the plan: row_a = (row*128 + start + shift)
    >> 7 over the pass's active rows.  Pack the covering [base,
    base + nchunks*KB) window as ``base << 8 | nchunks`` (KB =
    min(KBAND, plane rows); base 8-aligned for the dynamic sublane
    slice, window slid left so it never runs past the source plane).
    Passes with no active rows get 0 — the kernel skips their gathers
    entirely.

    Returns int32 [S * mtiles] (SMEM-resident via scalar prefetch).
    """
    _invalid(bands_supported(comp_rows, nrows),
             "banded gathers unsupported for this plane shape")
    se = plans["se"].astype(np.int32)          # [S, tiles, LANES]
    shift = plans["shift"]
    S = se.shape[0]
    mtiles = mtile_count(nrows, mt_max)
    start = (se >> 8) & 0x7F
    end = se & 0xFF
    active = end > start
    rows = np.arange(nrows, dtype=np.int32).reshape(se.shape[1], LANES)
    row_a = (rows[None] * LANES + start + shift) >> 7
    # krows (and so the chunk size KB) per pass row: comp passes source
    # the comp plane, out passes the output plane; slack/padding rows
    # keep 0 (no active cells).
    kr = np.zeros(S, np.int64)
    p_off, p0, p_used = plans["p_off"], plans["p0"], plans["p_used"]
    for i in range(p_used.shape[0]):
        o = int(p_off[i])
        kr[o:o + int(p0[i])] = comp_rows
        kr[o + int(p0[i]):o + int(p_used[i])] = nrows
    kb = np.minimum(KBAND, np.maximum(kr, 1))[:, None]
    ra = np.where(active, row_a, np.int32(1 << 24))
    rb = np.where(active, row_a, np.int32(-1))
    grp = ra.reshape(S, mtiles, -1)
    lo = grp.min(axis=2).astype(np.int64)
    hi = rb.reshape(S, mtiles, -1).max(axis=2).astype(np.int64)
    has = hi >= 0
    lo = np.clip(lo, 0, np.maximum(kr, 1)[:, None] - 1)
    hi = np.clip(hi, 0, np.maximum(kr, 1)[:, None] - 1)
    base = lo & ~np.int64(7)
    cnt = -(-(hi + 1 - base) // kb)
    # Slide the window left so it ends inside the plane (kr % kb == 0
    # keeps the slid base a multiple of kb, hence 8-aligned).
    over = base + cnt * kb - kr[:, None]
    base = np.where(over > 0, np.maximum(base - over, 0), base)
    cnt = np.where(has, cnt, 0)
    base = np.where(has, base, 0)
    if (cnt > 0xFF).any():
        raise ValueError("band chunk count exceeds 8-bit field")
    return ((base << 8) | cnt).astype(np.int32).reshape(-1)


def decode_flat_numpy(comp_bytes, plans, comp_rows, out_rows):
    """Numpy oracle with the kernel's exact semantics (for tests)."""
    n = len(comp_bytes)
    out = np.zeros((n, out_rows * LANES), np.uint8)
    for i in range(n):
        comp_plane = np.zeros(comp_rows * LANES, np.int64)
        cb = np.frombuffer(bytes(comp_bytes[i]), np.uint8)
        comp_plane[:len(cb)] = cb
        out_plane = np.zeros(out_rows * LANES, np.int64)
        p = np.arange(out_rows * LANES)
        # Identity-dense (RAW) block: output IS the comp plane.
        if plans.get("dense") is not None and plans["dense"][i] < 0:
            w = min(out_rows * LANES, comp_plane.shape[0])
            out[i, :w] = comp_plane[:w].astype(np.uint8)
            continue
        # Dense comp passes first (per-byte wire; see plan.cc Densify).
        if plans.get("dense") is not None and plans["dense"][i] > 0:
            k = (int(plans["dq_idx"][i]) if plans.get("dq_idx") is not None
                 else i)
            dq = plans["dq"][k].reshape(-1).astype(np.int64)     # [rows*128]
            ra = plans["row_a"][k]        # [D, 128, tiles] or [D, nrows]
            pid = (dq >> 9) & 0x3F
            qlane = dq & (LANES - 1)
            drow = (dq >> 7) & 3
            for j in range(int(plans["dense"][i])):
                row_a = (ra[j].T.reshape(-1) if ra[j].ndim == 2
                         else ra[j])                             # per row
                active = pid == j + 1
                srow = np.repeat(row_a, LANES) + drow
                src = np.clip(srow * LANES + qlane, 0,
                              comp_plane.shape[0] - 1)
                out_plane = np.where(active, comp_plane[src], out_plane)
        ncomp = int(plans["p0"][i])
        for k in range(int(plans["p_used"][i])):
            row = int(plans["p_off"][i]) + k
            se = plans["se"][row].reshape(-1).astype(np.int32)
            shift = plans["shift"][row].reshape(-1)
            start = np.repeat((se >> 8) & 0x7F, LANES)
            end = np.repeat(se & 0xFF, LANES)
            lane = p & (LANES - 1)
            active = (lane >= start) & (lane < end)
            src_plane = comp_plane if k < ncomp else out_plane
            src = np.clip(p + np.repeat(shift, LANES), 0,
                          src_plane.shape[0] - 1)
            out_plane = np.where(active, src_plane[src], out_plane)
        out[i] = out_plane
    return out.reshape(n, out_rows, LANES)
