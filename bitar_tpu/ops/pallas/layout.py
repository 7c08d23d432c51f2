"""Byte-array layouts for TPU codec kernels.

Bytes live on device as int32 "byte planes": shape ``[rows, 128]`` with byte
``i`` at ``[i >> 7, i & 127]`` — one byte per int32 lane element.  The lane
dimension is the TPU's native 128-wide vector axis, so a 128-byte chunk is
one vector row; sub-lane-aligned access never occurs.  ``GUARD_ROWS`` extra
rows at the tail let chunk reads/writes at the last byte touch row ``r+1``
without bounds hazards.

This is the Pallas analog of the reference's mbuf segment layout
(``memory.cc:78-104`` attaches byte ranges to fixed-size segments); here the
"segment" is a 128-lane vector row.
"""

from __future__ import annotations

import numpy as np

LANES = 128
GUARD_ROWS = 8  # int32 sublane tile is 8; keeps padded shapes tile-aligned


def rows_for(nbytes: int) -> int:
    """VMEM rows (without guard) needed for nbytes."""
    return max(1, -(-nbytes // LANES))


def padded_rows(nbytes: int) -> int:
    return rows_for(nbytes) + GUARD_ROWS


def bytes_to_plane(data: np.ndarray, nrows: int) -> np.ndarray:
    """Pack uint8 bytes into an int32 [nrows, 128] plane (zero padded)."""
    flat = np.zeros(nrows * LANES, dtype=np.int32)
    flat[: data.shape[0]] = data
    return flat.reshape(nrows, LANES)


def plane_to_bytes(plane: np.ndarray, nbytes: int) -> np.ndarray:
    """Unpack an int32 plane back to uint8 bytes."""
    return plane.reshape(-1)[:nbytes].astype(np.uint8)


def batch_to_planes(blocks: list[np.ndarray], nrows: int) -> np.ndarray:
    """Stack N byte blocks into an [N, nrows, 128] int32 plane batch."""
    out = np.zeros((len(blocks), nrows, LANES), dtype=np.int32)
    for i, b in enumerate(blocks):
        if b.shape[0] > nrows * LANES:
            raise ValueError(f"block {i} ({b.shape[0]}B) exceeds plane {nrows * LANES}B")
        flat = out[i].reshape(-1)
        flat[: b.shape[0]] = b
    return out


def pad_tables(tables: list[dict[str, np.ndarray]], keys: tuple[str, ...],
               multiple: int = 128) -> tuple[dict[str, np.ndarray], np.ndarray]:
    """Pad per-block SoA sequence tables to a common row count.

    Returns ({key: [N, S] int32}, nseq [N] int32).  S is the max sequence
    count rounded up to ``multiple`` (lane alignment for future vector
    parse stages).
    """
    n = len(tables)
    nseq = np.array([t[keys[0]].shape[0] for t in tables], dtype=np.int32)
    s = int(max(1, -(-int(nseq.max(initial=1)) // multiple) * multiple))
    out = {k: np.zeros((n, s), dtype=np.int32) for k in keys}
    for i, t in enumerate(tables):
        m = int(nseq[i])
        for k in keys:
            out[k][i, :m] = t[k]
    return out, nseq
