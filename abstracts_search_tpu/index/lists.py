"""Packed inverted-list storage, sharded across the device mesh.

The TPU-native replacement for faiss `OnDiskInvertedLists` +
in-RAM list arrays (SURVEY.md §2 #9,#11; reference artifacts
`index.faiss`/`ondisk.ivfdata`, Makefile:11): variable-length IVF lists
are the classic static-shape enemy on XLA, so each list is split into
fixed-size *segments* (SEG rows, zero-padded tail). Per device:

- ``data``      [n_segs * SEG, payload]  — row payloads (f32 vectors for
                 IVF-Flat, uint8 PQ codes for IVF-PQ), segment-contiguous
- ``row_ids``   [n_segs * SEG] int32     — global corpus positions
                 (-1 for padding rows; the `ids.parquet` mapping lives
                 above this, SURVEY.md §1 L3)
- ``seg_valid`` [n_segs] int32           — live rows per segment
- ``list_segs`` [n_lists, max_segs] int32 — device-local segment ids of
                 each list (-1 padded; rows for lists owned by other
                 devices are all -1)

Lists are assigned to devices round-robin (list_id % ndev) so hot lists
spread across the mesh. All per-device arrays are padded to identical
shapes — a probe+scan is then one SPMD program with static shapes,
and probing gathers whole segments (aligned tiles, DMA-friendly).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class DeviceLists:
    data: np.ndarray       # [n_segs*SEG, payload...]
    row_ids: np.ndarray    # [n_segs*SEG] int32
    seg_valid: np.ndarray  # [n_segs] int32
    list_segs: np.ndarray  # [n_lists, max_segs] int32


@dataclasses.dataclass
class PackedLists:
    """Per-device packed lists, equal shapes, ready to device_put."""

    per_device: list[DeviceLists]
    seg_size: int
    n_lists: int
    n_rows: int
    max_segs: int

    @property
    def ndev(self) -> int:
        return len(self.per_device)

    def stacked(self):
        """Stack per-device arrays on a leading device axis (for sharding)."""
        return (
            np.stack([d.data for d in self.per_device]),
            np.stack([d.row_ids for d in self.per_device]),
            np.stack([d.seg_valid for d in self.per_device]),
            np.stack([d.list_segs for d in self.per_device]),
        )

    def memory_bytes(self) -> int:
        return sum(
            d.data.nbytes + d.row_ids.nbytes + d.seg_valid.nbytes + d.list_segs.nbytes
            for d in self.per_device
        )


def pack_lists(
    payloads: np.ndarray,
    positions: np.ndarray,
    assignments: np.ndarray,
    n_lists: int,
    *,
    ndev: int,
    seg_size: int = 128,
) -> PackedLists:
    """Bucket rows by IVF list into the per-device packed layout.

    payloads: [N, ...] row payloads; positions: [N] global corpus ids;
    assignments: [N] list id per row.
    """
    n = len(payloads)
    assert len(positions) == n and len(assignments) == n

    # rows of each list, in insertion order
    order = np.argsort(assignments, kind="stable")
    sorted_lists = assignments[order]
    boundaries = np.searchsorted(sorted_lists, np.arange(n_lists + 1))

    # device -> (list_id, row_indices) in list order
    dev_rows: list[list[tuple[int, np.ndarray]]] = [[] for _ in range(ndev)]
    segs_per_list = np.zeros(n_lists, np.int64)
    for l in range(n_lists):
        rows = order[boundaries[l] : boundaries[l + 1]]
        segs_per_list[l] = -(-len(rows) // seg_size) if len(rows) else 0
        dev_rows[l % ndev].append((l, rows))

    max_segs = int(segs_per_list.max()) if n_lists else 0
    n_segs_dev = [
        int(sum(segs_per_list[l] for l, _ in rows)) for rows in dev_rows
    ]
    n_segs_pad = max(max(n_segs_dev), 1) if n_segs_dev else 1

    payload_shape = payloads.shape[1:]
    out = []
    for d in range(ndev):
        data = np.zeros((n_segs_pad * seg_size,) + payload_shape, payloads.dtype)
        row_ids = np.full(n_segs_pad * seg_size, -1, np.int32)
        seg_valid = np.zeros(n_segs_pad, np.int32)
        list_segs = np.full((n_lists, max(max_segs, 1)), -1, np.int32)

        seg = 0
        for l, rows in dev_rows[d]:
            for s in range(int(segs_per_list[l])):
                chunk = rows[s * seg_size : (s + 1) * seg_size]
                lo = seg * seg_size
                data[lo : lo + len(chunk)] = payloads[chunk]
                row_ids[lo : lo + len(chunk)] = positions[chunk]
                seg_valid[seg] = len(chunk)
                list_segs[l, s] = seg
                seg += 1
        out.append(DeviceLists(data, row_ids, seg_valid, list_segs))

    return PackedLists(
        per_device=out,
        seg_size=seg_size,
        n_lists=n_lists,
        n_rows=n,
        max_segs=max(max_segs, 1),
    )
