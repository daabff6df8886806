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


def _slice_ids(hashes: np.ndarray, num_slices: int) -> np.ndarray:
    """Slice assignment with Spark pmod semantics (floor-mod on int64)."""
    return hashes.astype(np.int64) % np.int64(num_slices)


def _positions(hashes: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(len(h), k) bit positions via double hashing h1 + i*h2 mod m."""
    h = hashes.astype(np.uint64)
    h1 = h
    h2 = (h * _MULT) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


class PartitionedBloom:
    """P slices of an m-bit bloom filter, each covering one hash residue
    class. Two residency modes:

    - DRIVER mode (default): slice byte arrays live on the driver;
      build_update collects P small update blobs and ORs them in. Fine up
      to ~the broadcast threshold.
    - DRIVER-LIGHT mode (``handle=True``): the driver holds only the
      parameters and the per-slice parquet paths; building, merging with
      the previous wave's blobs, and persisting all happen executor-side
      (merge_update_spark), and probing is slice-affine (_probe_sliced).
      Nothing filter-sized ever transits the driver — the mode for the
      10^10-URL / ~18 GB design point."""

    def __init__(self, num_slices: int, bits_per_slice: int, num_hashes: int,
                 slices: list[bytes] | None = None, handle: bool = False):
        self.num_slices = num_slices
        self.bits_per_slice = bits_per_slice
        self.num_hashes = num_hashes
        self.slices: list[np.ndarray] | None = (
            None
            if handle
            else (
                [np.frombuffer(b, dtype=np.uint8).copy() for b in slices]
                if slices
                else [np.zeros(bits_per_slice // 8, dtype=np.uint8) for _ in range(num_slices)]
            )
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
        # slice id MUST match Spark's pmod on signed int64 (build_update
        # groups by it): numpy int64 % positive is floor-mod == Spark pmod.
        # uint64 % P diverges for negative hashes unless P divides 2^64.
        sid = _slice_ids(hashes, self.num_slices)
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

    def merge_update_spark(self, df: DataFrame, out_dir: str,
                           hash_col: str = "url_hash") -> dict[int, str]:
        """DRIVER-LIGHT build+merge+persist, fully executor-side: per slice,
        set the bits for this wave's hashes, OR with the previous slice blob
        read straight from ``slice_paths``, and emit the merged blob; the
        partitionBy write routes each group's single row to its
        ``slice_id=i/`` dir with NO extra shuffle (applyInPandas output
        partitions already hold whole groups). Slices with no new hashes
        keep their previous path (linked, zero IO). Returns the new
        slice_paths map; the instance's paths are updated in place."""
        import os

        P, bits, k = self.num_slices, self.bits_per_slice, self.num_hashes
        prev_paths = {int(s): p for s, p in (self.slice_paths or {}).items()}
        schema = StructType([
            StructField("slice_id", IntegerType()),
            StructField("blob", BinaryType()),
        ])

        def build_merge(pdf: pd.DataFrame) -> pd.DataFrame:
            import pyarrow.parquet as pq

            sid = int(pdf["__slice"].iloc[0])
            arr = np.zeros(bits // 8, dtype=np.uint8)
            h = pdf[hash_col].to_numpy(dtype=np.int64).astype(np.uint64)
            pos = _positions(h, k, bits).ravel()
            np.bitwise_or.at(arr, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
            prev = prev_paths.get(sid)
            if prev is not None:
                t = pq.read_table(prev, columns=["blob"])
                arr |= np.frombuffer(t["blob"][0].as_py(), dtype=np.uint8)
            return pd.DataFrame({"slice_id": [sid], "blob": [arr.tobytes()]})

        sliced = df.select(
            F.col(hash_col),
            F.pmod(F.col(hash_col), F.lit(P)).cast("int").alias("__slice"),
        )
        merged = sliced.groupBy("__slice").applyInPandas(build_merge, schema)
        merged.write.mode("overwrite").partitionBy("slice_id").parquet(out_dir)
        new_paths = dict(prev_paths)
        for sub in os.listdir(out_dir):
            if sub.startswith("slice_id="):
                new_paths[int(sub.split("=", 1)[1])] = os.path.join(out_dir, sub)
        self.slice_paths = new_paths
        return new_paths

    # set by the engine after save/load: per-slice parquet dirs of the
    # checkpointed filter table + the broadcast cutover size
    slice_paths: dict[int, str] | None = None
    broadcast_max_bytes: int = 64 << 20

    def probe_col(self, df: DataFrame, hash_col: str = "url_hash",
                  out_col: str = "maybe_seen",
                  slice_paths: dict[int, str] | None = None,
                  broadcast_max_bytes: int | None = None) -> DataFrame:
        """Probe → boolean column. Two physical strategies:

        - small filter (≤ ``broadcast_max_bytes`` total): broadcast the whole
          structure, mapInPandas probe — one pass, no repartition.
        - large filter with ``slice_paths`` (the checkpointed per-slice
          parquet dirs): SLICE-AFFINE probe — candidates repartition by
          slice id and each task loads ONLY its slice's blob from shared
          storage. Nothing filter-sized is ever broadcast or collected: at
          the 10^10-URL / ~18 GB design point every executor holds one
          ~1 GB slice instead of the whole filter (whole-filter broadcast
          there is a guaranteed OOM)."""
        slice_paths = slice_paths if slice_paths is not None else self.slice_paths
        if broadcast_max_bytes is None:
            broadcast_max_bytes = self.broadcast_max_bytes
        total_bytes = self.num_slices * (self.bits_per_slice // 8)
        if self.slices is None:  # driver-light handle: sliced probe only
            return self._probe_sliced(df, hash_col, out_col, slice_paths or {})
        if slice_paths is None or total_bytes <= broadcast_max_bytes:
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
        return self._probe_sliced(df, hash_col, out_col, slice_paths)

    def _probe_sliced(self, df: DataFrame, hash_col: str, out_col: str,
                      slice_paths: dict[int, str]) -> DataFrame:
        P, bits, k = self.num_slices, self.bits_per_slice, self.num_hashes
        cols = df.columns
        paths = {int(s): p for s, p in slice_paths.items()}
        sliced = df.withColumn(
            "__slice", F.pmod(F.col(hash_col), F.lit(P)).cast("int")
        ).repartition(P, "__slice")

        def probe(batches):
            import pyarrow.parquet as pq

            cache: dict[int, np.ndarray] = {}  # ~1 slice per task (hash(P) collisions aside)
            for pdf in batches:
                res = np.zeros(len(pdf), dtype=bool)
                for sid, idx in pdf.groupby("__slice", sort=False).indices.items():
                    sid = int(sid)
                    if sid not in paths:
                        # slice never written → empty filter → definitely new
                        continue
                    arr = cache.get(sid)
                    if arr is None:
                        t = pq.read_table(paths[sid], columns=["blob"])
                        arr = np.frombuffer(t["blob"][0].as_py(), dtype=np.uint8)
                        cache[sid] = arr
                    h = pdf[hash_col].to_numpy(dtype=np.int64)[idx]
                    pos = _positions(h.astype(np.uint64), k, bits)
                    ok = np.ones(len(idx), dtype=bool)
                    for j in range(k):
                        p = pos[:, j]
                        ok &= ((arr[p >> 3] >> (p & 7).astype(np.uint8)) & 1).astype(bool)
                    res[idx] = ok
                out = pdf.drop(columns=["__slice"]).copy()
                out[out_col] = res
                yield out

        from pyspark.sql.types import BooleanType

        schema = StructType(
            [f for f in df.schema.fields if f.name != "__slice"]
            + [StructField(out_col, BooleanType())]
        )
        return sliced.mapInPandas(probe, schema).select(*cols, out_col)

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
