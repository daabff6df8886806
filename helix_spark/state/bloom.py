"""Range-partitioned bloom filter over xxhash64 URL hashes.

Role (north rule): cheap *prefilter* for the URL-seen set. A bloom "no" is
definitive (URL definitely unseen → admit without consulting the exact seen
table); a bloom "maybe" routes the URL to the exact left-anti join against
the bucketed `seen` table. False positives therefore cost one join probe,
never a lost URL (SURVEY.md §7 phase 4: filters are prefilters only).

Scale design: the filter is split into P independent slices by
``pmod(url_hash, P)``. Each slice is built executor-side from its own hash
range via applyInPandas (numpy, vectorized — no per-row Python), OR-merged
incrementally across waves, serialized into the warehouse's `filters` table
each commit, and broadcast for probing. At 10^10 URLs with p=1e-3 the whole
structure is ~18 GB — sliced, so each executor holds only broadcast slices
(or probes against a subset at very large P); in this sandbox P=16 suffices.

All position math uses splitmix64-style double hashing derived from the one
xxhash64 already computed Spark-side — no extra string hashing in Python.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, IntegerType, StructField, StructType

_MULT = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant (splitmix64)


def optimal_bits(n: int, p: float) -> int:
    """Standard bloom sizing: m = -n ln p / (ln 2)^2, rounded to a byte."""
    m = max(64, int(-n * math.log(p) / (math.log(2) ** 2)))
    return (m + 7) // 8 * 8


def optimal_hashes(m_bits: int, n: int) -> int:
    return max(1, min(16, round(m_bits / max(n, 1) * math.log(2))))


def _positions(hashes: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(len(h), k) bit positions via double hashing h1 + i*h2 mod m."""
    h = hashes.astype(np.uint64)
    h1 = h
    h2 = (h * _MULT) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


class PartitionedBloom:
    """P slices of an m-bit bloom filter, each covering one hash residue class."""

    def __init__(self, num_slices: int, bits_per_slice: int, num_hashes: int,
                 slices: list[bytes] | None = None):
        self.num_slices = num_slices
        self.bits_per_slice = bits_per_slice
        self.num_hashes = num_hashes
        self.slices: list[np.ndarray] = (
            [np.frombuffer(b, dtype=np.uint8).copy() for b in slices]
            if slices
            else [np.zeros(bits_per_slice // 8, dtype=np.uint8) for _ in range(num_slices)]
        )

    @classmethod
    def sized_for(cls, expected_n: int, p: float = 1e-3, num_slices: int = 16) -> "PartitionedBloom":
        per_slice = max(1, expected_n // num_slices)
        bits = optimal_bits(per_slice, p)
        return cls(num_slices, bits, optimal_hashes(bits, per_slice))

    # ------------------------------------------------------------- local ops
    def add_hashes_local(self, slice_id: int, hashes: np.ndarray) -> None:
        pos = _positions(hashes, self.num_hashes, self.bits_per_slice).ravel()
        np.bitwise_or.at(self.slices[slice_id], pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership over mixed-slice hashes → bool array."""
        h = hashes.astype(np.uint64)
        sid = (h % np.uint64(self.num_slices)).astype(np.int64)
        pos = _positions(h, self.num_hashes, self.bits_per_slice)
        out = np.ones(len(h), dtype=bool)
        stack = np.stack(self.slices)  # (P, bytes)
        for j in range(self.num_hashes):
            p = pos[:, j]
            bits = (stack[sid, p >> 3] >> (p & 7).astype(np.uint8)) & 1
            out &= bits.astype(bool)
        return out

    def merge(self, other: "PartitionedBloom") -> None:
        for i in range(self.num_slices):
            self.slices[i] |= other.slices[i]

    # ------------------------------------------------------------ spark ops
    def build_update(self, df: DataFrame, hash_col: str = "url_hash") -> "PartitionedBloom":
        """Executor-side build: group rows by slice, each group sets its bits
        in numpy, driver collects P small byte blobs and ORs them in."""
        P, bits, k = self.num_slices, self.bits_per_slice, self.num_hashes
        schema = StructType([
            StructField("slice_id", IntegerType()),
            StructField("bits", BinaryType()),
        ])

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            arr = np.zeros(bits // 8, dtype=np.uint8)
            h = pdf[hash_col].to_numpy(dtype=np.int64).astype(np.uint64)
            pos = _positions(h, k, bits).ravel()
            np.bitwise_or.at(arr, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
            return pd.DataFrame({"slice_id": [int(pdf["__slice"].iloc[0])], "bits": [arr.tobytes()]})

        sliced = df.select(
            F.col(hash_col),
            F.pmod(F.col(hash_col), F.lit(P)).cast("int").alias("__slice"),
        )
        rows = sliced.groupBy("__slice").applyInPandas(build, schema).collect()
        update = PartitionedBloom(P, bits, k)
        for r in rows:
            update.slices[r["slice_id"]] |= np.frombuffer(r["bits"], dtype=np.uint8)
        self.merge(update)
        return update

    def probe_col(self, df: DataFrame, hash_col: str = "url_hash",
                  out_col: str = "maybe_seen") -> DataFrame:
        """mapInPandas probe against the broadcast filter → boolean column."""
        spark = df.sparkSession
        bc = spark.sparkContext.broadcast(self.to_dict())
        cols = df.columns

        def probe(batches):
            bloom = PartitionedBloom.from_dict(bc.value)
            for pdf in batches:
                h = pdf[hash_col].to_numpy(dtype=np.int64)
                pdf = pdf.copy()
                pdf[out_col] = bloom.contains_hashes(h)
                yield pdf

        from pyspark.sql.types import BooleanType

        schema = StructType(list(df.schema.fields) + [StructField(out_col, BooleanType())])
        return df.mapInPandas(probe, schema).select(*cols, out_col)

    # -------------------------------------------------------------- serde
    def to_dict(self) -> dict:
        return {
            "num_slices": self.num_slices,
            "bits_per_slice": self.bits_per_slice,
            "num_hashes": self.num_hashes,
            "slices": [s.tobytes() for s in self.slices],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "PartitionedBloom":
        return cls(d["num_slices"], d["bits_per_slice"], d["num_hashes"], d["slices"])

    def to_rows(self, wave: int) -> list[tuple[int, int, int, int, int, bytes]]:
        """Rows for the `filters` checkpoint table."""
        return [
            (wave, i, self.num_slices, self.bits_per_slice, self.num_hashes, s.tobytes())
            for i, s in enumerate(self.slices)
        ]

    @classmethod
    def from_rows(cls, rows) -> "PartitionedBloom":
        rows = sorted(rows, key=lambda r: r[1])
        first = rows[0]
        return cls(first[2], first[3], first[4], [bytes(r[5]) for r in rows])
