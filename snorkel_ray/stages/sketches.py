"""Mergeable sketches (SURVEY.md A10 — optional/beyond-reference).

HyperLogLog approximate distinct count: one sketch per batch, merged
on the driver (register-wise max) — the canonical partial+final shape
for 100 TB cardinality estimation where an exact ``unique`` would be an
all-to-all over every row.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class HLL:
    """Plain HyperLogLog (Flajolet et al. 2007 public algorithm),
    p bits of bucket index → 2^p uint8 registers; deterministic
    blake2b hashing (no PYTHONHASHSEED dependence)."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (registers if registers is not None
                          else np.zeros(self.m, dtype=np.uint8))

    def add_batch(self, values) -> None:
        """Vectorized: one blake2b per value (unavoidable — it is the
        hash function), but index/rank extraction and the register max
        run as numpy kernels instead of a per-row Python if/assign
        (round-1 verdict: the old per-row loop was the only scalar
        path in the sketch)."""
        n = len(values)
        if n == 0:
            return
        hs = np.fromiter(
            (int.from_bytes(hashlib.blake2b(str(v).encode(), digest_size=8).digest(),
                            "big") for v in values),
            dtype=np.uint64, count=n)
        shift = np.uint64(64 - self.p)
        idx = (hs >> shift).astype(np.int64)
        rest = hs & ((np.uint64(1) << shift) - np.uint64(1))
        # rank = leading-zero count of `rest` within (64-p) bits, + 1
        width = 64 - self.p
        bitlen = np.zeros(n, dtype=np.int64)
        tmp = rest.copy()
        for b in (32, 16, 8, 4, 2, 1):  # O(log bits) vectorized bit-length
            mask = tmp >= (np.uint64(1) << np.uint64(b))
            bitlen[mask] += b
            tmp[mask] >>= np.uint64(b)
        bitlen[rest > 0] += 1
        rank = (width - bitlen + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HLL") -> "HLL":
        return HLL(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        am = 0.7213 / (1 + 1.079 / m)
        s = float(np.sum(2.0 ** (-self.registers.astype(np.float64))))
        e = am * m * m / s
        if e <= 2.5 * m:  # small-range correction
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                e = m * np.log(m / zeros)
        return e

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, b: bytes) -> "HLL":
        return cls(b[0], np.frombuffer(b[1:], dtype=np.uint8).copy())


def approx_distinct(ds, column: str, *, p: int = 12) -> float:
    """Distributed approximate distinct count: per-batch HLL partials
    (serialized sketch rows) merged on the driver. Standard error
    ≈ 1.04/sqrt(2^p) (~1.6% at p=12)."""

    def _sketch(batch: pa.Table) -> pa.Table:
        h = HLL(p)
        h.add_batch(batch.column(column).to_pylist())
        return pa.table({"sketch": pa.array([h.serialize()], pa.binary())})

    parts = ds.map_batches(_sketch, batch_format="pyarrow")
    acc = HLL(p)
    # streamed merge: one sketch row per block; never materialize the
    # partial stream (at millions of blocks even sketch rows add up)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for blob in b.column("sketch").to_pylist():
            acc = acc.merge(HLL.deserialize(blob))
    return acc.estimate()
