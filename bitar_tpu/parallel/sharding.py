"""Multi-chip sharding: block-parallel codec execution over a device mesh.

The reference's only parallelism is data-parallel block streams: input split
into per-(device, queue-pair) segments, each on its own lcore
(``demo_app.cc:577-596``, ``driver.cc:100-158``).  The TPU-native scale-out
replaces that topology with a ``jax.sharding.Mesh``:

* the *blocks* axis shards the batch of independent blocks across chips
  (the dp analog — each chip runs the same Pallas decode grid on its shard),
* collectives ride ICI via ``shard_map`` (``all_to_all`` for the
  compressed-block shuffle, ``all_gather`` for result assembly when a
  replicated view is wanted),
* multi-host pods extend the same mesh across processes
  (``jax.distributed.initialize``; the mesh axis spans all global devices).

Everything here is mesh-shape-agnostic: tests and the dry-run drive it on
an 8-way virtual CPU mesh, production on a pod slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pallas import layout
from ..ops.pallas.lz4_decode import decode_blocks
from ..status import Status, StatusError

BLOCKS_AXIS = "blocks"
_TABLE_KEYS = ("lit_ptr", "lit_len", "off", "mlen", "out_pos")


def make_mesh(num_devices: int | None = None, axis: str | None = None,
              config=None) -> Mesh:
    """A mesh over the first ``num_devices`` devices (default all).

    ``config`` (a ``bitar_tpu.config.ShardingConfig``) supplies the axis
    name and an optional multi-dim ``mesh_shape`` whose product selects
    the device count; explicit arguments win.  The discovery analog of
    the reference's lcore enumeration (``driver.cc:215-218``)."""
    if config is not None:
        if axis is None:
            axis = config.data_axis
        if num_devices is None and config.mesh_shape:
            num_devices = int(np.prod(config.mesh_shape))
    if axis is None:
        axis = BLOCKS_AXIS
    devs = jax.devices()
    if num_devices is not None:
        if num_devices > len(devs):
            raise StatusError(Status.Invalid(
                f"requested {num_devices} devices, only {len(devs)} visible"))
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis,))


def shard_blocks(mesh: Mesh, *arrays, axis: str = BLOCKS_AXIS):
    """Place arrays with their leading (block) dim sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return tuple(jax.device_put(a, sharding) for a in arrays)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "comp_rows", "out_rows", "seq_cap", "block_size",
                     "interpret"))
def sharded_decode(comp, nseq, lit_ptr, lit_len, off, mlen, out_pos, *,
                   mesh: Mesh, comp_rows: int, out_rows: int, seq_cap: int,
                   block_size: int, interpret: bool = False):
    """Decode a block batch sharded over the mesh's blocks axis.

    Each device runs the single-chip Pallas decode grid on its local shard;
    no communication — blocks are independent (the whole point of
    block-level compression).  Output stays sharded the same way.
    """
    spec = P(BLOCKS_AXIS)

    def local_decode(comp_l, nseq_l, lp, ll, of, ml, op):
        planes = decode_blocks(
            comp_l, nseq_l, lp, ll, of, ml, op,
            comp_rows=comp_rows, out_rows=out_rows, seq_cap=seq_cap,
            interpret=interpret)
        rows = block_size // 128
        nb = planes.shape[0]
        return planes[:, :rows, :].astype(jnp.uint8).reshape(nb, block_size)

    return jax.shard_map(
        local_decode, mesh=mesh,
        in_specs=(spec,) * 7, out_specs=spec,
        check_vma=False,
    )(comp, nseq, lit_ptr, lit_len, off, mlen, out_pos)


def pad_block_count(n: int, num_devices: int) -> int:
    """Blocks per batch must divide evenly across the mesh; pad with idle
    blocks (nseq=0) to the next multiple."""
    return -(-n // num_devices) * num_devices


def prepare_sharded_batch(comps: list[np.ndarray],
                          tables: list[dict[str, np.ndarray]],
                          block_size: int, slot_size: int, num_devices: int):
    """Host-side batch prep: planes + padded tables, block count padded to
    the mesh width.  Returns (arrays dict, real_n)."""
    real_n = len(comps)
    n = pad_block_count(real_n, num_devices)
    t, nseq = layout.pad_tables(tables, _TABLE_KEYS)
    seq_cap = t["lit_ptr"].shape[1]
    comp_rows = slot_size // 128 + layout.GUARD_ROWS
    planes = np.zeros((n, comp_rows, 128), dtype=np.int32)
    for i, c in enumerate(comps):
        flat = planes[i].reshape(-1)
        flat[:c.shape[0]] = c
    full = {
        "comp": planes,
        "nseq": np.zeros(n, np.int32),
        **{k: np.zeros((n, seq_cap), np.int32) for k in _TABLE_KEYS},
    }
    full["nseq"][:real_n] = nseq
    for k in _TABLE_KEYS:
        full[k][:real_n] = t[k]
    meta = dict(comp_rows=comp_rows, seq_cap=seq_cap,
                out_rows=layout.padded_rows(block_size), block_size=block_size)
    return full, real_n, meta
