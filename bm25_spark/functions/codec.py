"""Packed posting-list codec: delta + varint compression with block-max
metadata (the north-star physical layout; the reference stores flat u32
(delta, tf) pairs — lib/src/bm25.dart:437-468 — our format additionally
varint-compresses and records per-block score upper bounds for WAND).

Layout of ``data`` (one blob per (pk, term, shard) row):
    varint stream of n triples: (doc_id_delta, tf, dl)
    doc_id_delta is vs the previous posting in THIS shard (first = doc_id -
    shard_base, where shard_base = shard * shard_size).

Block-max metadata: postings are split into blocks of BLOCK docs;
``block_last_doc[i]`` = last doc_id in block i, ``block_max[i]`` = max over
the block of tf/(tf + k1*((1-b)+b*dl/avgdl)) — the score contribution
divided by idf, so ub(term, block) = idf * block_max. True upper bounds =>
WAND pruning is exact (safe) for top-k.

Encode/decode are numpy-vectorized inside pandas UDFs (no per-row Python
varint loops: byte-expansion is done with array ops).
"""

from __future__ import annotations

import numpy as np

BLOCK = 128


_ENC_SLICE = 1 << 20  # values per internal encode slice (memory bound)


def encode_varints(
    values: np.ndarray, return_lengths: bool = False
):
    """LEB128-encode a uint64 array, vectorized. With ``return_lengths``,
    also returns the per-value byte counts (for slicing a bulk encode into
    per-run blobs).

    Encodes in internal slices of ``_ENC_SLICE`` values: the vectorized
    kernel materializes an (n, width) byte matrix plus two boolean masks
    (~10x the input bytes in transients), so one unbounded call costs
    O(input) peak memory — slicing caps the transient at ~30 MB while the
    output stream stays byte-identical (LEB128 is value-local)."""
    v = values.astype(np.uint64)
    n = len(v)
    if n == 0:
        return (b"", np.empty(0, np.int64)) if return_lengths else b""
    if n > _ENC_SLICE:
        parts = []
        lens = [] if return_lengths else None
        for s in range(0, n, _ENC_SLICE):
            out = encode_varints(v[s : s + _ENC_SLICE], return_lengths)
            if return_lengths:
                parts.append(out[0])
                lens.append(out[1])
            else:
                parts.append(out)
        buf = b"".join(parts)
        if return_lengths:
            return buf, np.concatenate(lens)
        return buf
    # byte count per value: 1 + one per 7-bit threshold crossed (max 10)
    nbytes = np.ones(n, dtype=np.int64)
    for t in range(7, 64, 7):
        nbytes += (v >= (np.uint64(1) << np.uint64(t))).astype(np.int64)
    width = int(nbytes.max())
    # (n, width) little-endian 7-bit groups, built in `width` vectorized
    # passes over ALL values (no per-iteration compaction/nonzero)
    mat = np.empty((n, width), dtype=np.uint8)
    rem = v.copy()
    for j in range(width):
        mat[:, j] = (rem & np.uint64(0x7F)).astype(np.uint8)
        rem >>= np.uint64(7)
    cols = np.arange(width, dtype=np.int64)[None, :]
    keep = cols < nbytes[:, None]
    cont = cols < (nbytes - 1)[:, None]
    mat |= cont.astype(np.uint8) << 7
    buf = mat[keep].tobytes()
    return (buf, nbytes) if return_lengths else buf


def decode_varints(buf: bytes) -> np.ndarray:
    """Decode a LEB128 stream to uint64 array, vectorized."""
    if not buf:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    cont = (raw & 0x80) != 0
    # value boundaries: positions where cont is False end a value
    ends = np.nonzero(~cont)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    payload = (raw & 0x7F).astype(np.uint64)
    # shift = 7 * (position within the value)
    idx = np.arange(len(raw), dtype=np.int64)
    value_id = np.cumsum(np.concatenate(([False], ~cont[:-1]))).astype(np.int64)
    within = idx - starts[value_id]
    shifted = payload << (np.uint64(7) * within.astype(np.uint64))
    out = np.zeros(len(ends), dtype=np.uint64)
    np.add.at(out, value_id, shifted)
    return out


def _bit_length(v: np.ndarray) -> np.ndarray:
    out = np.zeros(len(v), dtype=np.int64)
    x = v.astype(np.uint64).copy()
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        mask = x >= (np.uint64(1) << s)
        out[mask] += shift
        x[mask] >>= s
    out[v.astype(np.uint64) != 0] += 1
    return out


def pack_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    shard_base: int,
    k1: float,
    b: float,
    avgdl: float,
) -> tuple[bytes, int, list[int], list[float], list[int]]:
    """Returns (data, n, block_last_doc, block_max, block_off). Input must
    be doc-sorted.

    ``block_off[i]`` is the byte offset of block i's first varint triple.
    The delta chain runs straight through block boundaries, so a block can
    be decoded standalone: its first delta is relative to
    ``block_last[i-1]`` (``shard_base`` for block 0) — see unpack_blocks.
    """
    n = len(doc_ids)
    doc_ids = doc_ids.astype(np.int64)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = doc_ids[0] - shard_base
    deltas[1:] = np.diff(doc_ids).astype(np.uint64)
    interleaved = np.empty(3 * n, dtype=np.uint64)
    interleaved[0::3] = deltas
    interleaved[1::3] = tfs.astype(np.uint64)
    interleaved[2::3] = dls.astype(np.uint64)
    data, nbytes = encode_varints(interleaved, return_lengths=True)
    cum = np.concatenate(([0], np.cumsum(nbytes)))

    norm = (1.0 - b) + b * dls.astype(np.float64) / avgdl
    partial = tfs.astype(np.float64) * (k1 + 1.0) / (tfs + k1 * norm)
    block_last, block_max, block_off = [], [], []
    for s in range(0, n, BLOCK):
        e = min(s + BLOCK, n)
        block_last.append(int(doc_ids[e - 1]))
        block_max.append(float(partial[s:e].max()))
        block_off.append(int(cum[3 * s]))
    return data, n, block_last, block_max, block_off


def unpack_postings(
    data: bytes, n: int, shard_base: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (doc_ids, tfs, dls) — inverse of pack_postings."""
    vals = decode_varints(data)
    assert len(vals) == 3 * n, (len(vals), n)
    deltas = vals[0::3].astype(np.int64)
    tfs = vals[1::3].astype(np.int32)
    dls = vals[2::3].astype(np.int32)
    doc_ids = np.cumsum(deltas) + shard_base
    return doc_ids, tfs, dls


def unpack_blocks(
    data: bytes,
    n: int,
    shard_base: int,
    block_last: np.ndarray,
    block_off: np.ndarray,
    sel: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode ONLY the selected blocks (sorted unique block indices) of a
    packed posting blob — the physical read behind block-max WAND: ruled-out
    blocks are never varint-decoded. Contiguous selected blocks decode as
    one run. Returns (doc_ids, tfs, dls) concatenated in doc order."""
    nb = len(block_last)
    if len(sel) == 0:
        z = np.empty(0, np.int64)
        return z, z.astype(np.int32), z.astype(np.int32)
    # split sel into runs of consecutive block indices
    cuts = np.flatnonzero(np.diff(sel) != 1) + 1
    runs = np.split(sel, cuts)
    ids_l, tfs_l, dls_l = [], [], []
    for run in runs:
        b0, b1 = int(run[0]), int(run[-1])
        lo = int(block_off[b0])
        hi = int(block_off[b1 + 1]) if b1 + 1 < nb else len(data)
        vals = decode_varints(data[lo:hi])
        n_post = (min((b1 + 1) * BLOCK, n)) - b0 * BLOCK
        assert len(vals) == 3 * n_post, (len(vals), n_post)
        deltas = vals[0::3].astype(np.int64)
        base = int(block_last[b0 - 1]) if b0 > 0 else shard_base
        ids_l.append(np.cumsum(deltas) + base)
        tfs_l.append(vals[1::3].astype(np.int32))
        dls_l.append(vals[2::3].astype(np.int32))
    return (
        np.concatenate(ids_l),
        np.concatenate(tfs_l),
        np.concatenate(dls_l),
    )


def pack_run(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, base: int
) -> bytes:
    """Pack a doc-sorted partial posting run (same triple-varint layout as
    pack_postings, no block metadata — the map-side unit of the two-stage
    build: partitions emit compressed runs, the per-term shuffle moves only
    these blobs, and the reducer merge-sorts runs into the final shard)."""
    n = len(doc_ids)
    doc_ids = doc_ids.astype(np.int64)
    interleaved = np.empty(3 * n, dtype=np.uint64)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = doc_ids[0] - base
    deltas[1:] = np.diff(doc_ids).astype(np.uint64)
    interleaved[0::3] = deltas
    interleaved[1::3] = tfs.astype(np.uint64)
    interleaved[2::3] = dls.astype(np.uint64)
    return encode_varints(interleaved)


unpack_run = unpack_postings  # identical layout


def pack_runs_bulk(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    bases: np.ndarray,
) -> list[bytes]:
    """Pack MANY doc-sorted runs in one vectorized pass (the map side of
    the two-stage postings build — one encode_varints call regardless of
    how many (term, shard) runs the task holds; per-run blobs are byte
    slices of the bulk buffer).

    ``starts``/``ends``: run boundaries into the flat arrays (runs must be
    contiguous and internally doc-sorted); ``bases``: per-run shard base."""
    n = len(doc_ids)
    if n == 0:
        return []
    # contiguity + non-emptiness are load-bearing for the reduceat-based
    # offsets below (reduceat over a repeated boundary would yield a
    # 1-element sum, not 0, for an empty run)
    if (
        starts[0] != 0
        or ends[-1] != n
        or not np.array_equal(ends[:-1], starts[1:])
        or not (ends > starts).all()
    ):
        raise ValueError(
            "pack_runs_bulk requires contiguous non-empty runs"
        )
    doc_ids = doc_ids.astype(np.int64)
    deltas = np.empty(n, dtype=np.int64)
    deltas[1:] = np.diff(doc_ids)
    deltas[starts] = doc_ids[starts] - bases
    interleaved = np.empty(3 * n, dtype=np.uint64)
    interleaved[0::3] = deltas.astype(np.uint64)
    interleaved[1::3] = tfs.astype(np.uint64)
    interleaved[2::3] = dls.astype(np.uint64)
    del deltas
    buf, nbytes = encode_varints(interleaved, return_lengths=True)
    del interleaved
    # per-run byte offsets via reduceat over the run boundaries — never a
    # full per-value cumsum (that transient is 8 bytes/value at exactly the
    # task's peak-memory moment)
    run_bytes = np.add.reduceat(nbytes, 3 * starts)
    del nbytes
    offs = np.concatenate(([0], np.cumsum(run_bytes)))
    return [buf[offs[i] : offs[i + 1]] for i in range(len(starts))]
