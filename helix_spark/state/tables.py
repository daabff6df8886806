"""Snapshot warehouse: atomic, resumable table state for the crawl.

The north rule calls for Iceberg-checkpointed state. This sandbox has no
iceberg-spark-runtime jar, so this module provides the same *semantics* on
plain parquet — manifest-based snapshots with atomic commit — behind an API
small enough that an Iceberg SQL backend (MERGE INTO / snapshot tags) can be
swapped in when the jar is present (helix_spark.session.iceberg_jar_available).

Layout (all immutable once written, like Iceberg data/manifest files):

    warehouse/
      <table>/data-<token>/...            parquet leaf dirs, write-once
      <table>/manifest-<token>.json       {key, num_buckets, buckets|files}
      _commits/commit-<n>.json            {wave, tables: {name: manifest}, metrics}
      _HEAD                               latest commit number (os.replace = atomic)

Scale design:
- ``merge_upsert`` is bucket-level copy-on-write: the table is hash-bucketed
  by its key (pmod(xxhash64(key), num_buckets)); a merge rewrites ONLY the
  buckets containing updated keys and re-links the rest — O(changed data),
  not O(table). This is what keeps a 10^10-row `seen`/`results` table
  mergeable per wave.
- ``append`` links old leaf dirs + one new dir: O(1) data movement.
- readers prune buckets: ``read(table, buckets=[...])`` reads only the leaf
  dirs of the named buckets — the exact anti-join against `seen` only scans
  buckets that bloom-positive candidates hash into.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "__bucket"


def _atomic_write(path: str, text: str) -> None:
    tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        f.write(text)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class SnapshotWarehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "_commits"), exist_ok=True)

    # ------------------------------------------------------------------ paths
    def _table_dir(self, name: str) -> str:
        d = os.path.join(self.root, name)
        os.makedirs(d, exist_ok=True)
        return d

    def _head_path(self) -> str:
        return os.path.join(self.root, "_HEAD")

    # --------------------------------------------------------------- commits
    def head_commit(self) -> dict | None:
        hp = self._head_path()
        if not os.path.exists(hp):
            return None
        with open(hp) as f:
            n = int(f.read().strip())
        with open(os.path.join(self.root, "_commits", f"commit-{n:06d}.json")) as f:
            return json.load(f)

    def commit(self, wave: int, table_manifests: dict[str, str], metrics: dict | None = None) -> int:
        """Atomically publish a new commit. ``table_manifests`` maps table name
        → manifest filename (from write/append/merge calls). Tables not named
        keep their manifest from the previous commit."""
        prev = self.head_commit()
        tables = dict(prev["tables"]) if prev else {}
        tables.update(table_manifests)
        n = (prev["n"] + 1) if prev else 1
        commit = {"n": n, "wave": wave, "tables": tables, "metrics": metrics or {}}
        _atomic_write(
            os.path.join(self.root, "_commits", f"commit-{n:06d}.json"),
            json.dumps(commit, indent=1),
        )
        _atomic_write(self._head_path(), str(n))
        return n

    # -------------------------------------------------------------- manifests
    def _load_manifest(self, name: str, manifest_file: str | None = None) -> dict | None:
        if manifest_file is None:
            head = self.head_commit()
            if not head or name not in head["tables"]:
                return None
            manifest_file = head["tables"][name]
        path = os.path.join(self._table_dir(name), manifest_file)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def _save_manifest(self, name: str, manifest: dict) -> str:
        fname = f"manifest-{uuid.uuid4().hex[:12]}.json"
        _atomic_write(os.path.join(self._table_dir(name), fname), json.dumps(manifest, indent=1))
        return fname

    def _new_data_dir(self, name: str) -> str:
        return os.path.join(self._table_dir(name), f"data-{uuid.uuid4().hex[:12]}")

    def _read_parquet(self, paths: list[str], m: dict | None):
        """Leaf-dir read with the schema pinned from the manifest: skips the
        footer-inference job Spark otherwise runs per read (measured as a
        per-wave driver-side gap). Falls back to inference for manifests
        written before schemas were recorded."""
        reader = self.spark.read
        sch = (m or {}).get("schema")
        if sch:
            from pyspark.sql.types import StructType

            reader = reader.schema(StructType.fromJson(json.loads(sch)))
        return reader.parquet(*paths)

    @staticmethod
    def _data_schema_json(df: DataFrame, drop: tuple[str, ...] = ()) -> str:
        """Schema of the rows as READ BACK from leaf dirs (partition dir
        columns are not in the data files — drop them)."""
        fields = [f for f in df.schema.fields if f.name not in drop]
        from pyspark.sql.types import StructType

        return json.dumps(StructType(fields).jsonValue())

    # ------------------------------------------------------------ table ops
    def overwrite(self, name: str, df: DataFrame) -> str:
        """Replace table contents (unbucketed). Returns manifest filename."""
        d = self._new_data_dir(name)
        df.write.mode("overwrite").parquet(d)
        return self._save_manifest(
            name, {"key": None, "num_buckets": 0, "files": [d],
                   "schema": self._data_schema_json(df)})

    def append(self, name: str, df: DataFrame) -> str:
        """Append rows: link previous leaf dirs + one new dir. O(new data)."""
        m = self._load_manifest(name) or {"key": None, "num_buckets": 0, "files": []}
        d = self._new_data_dir(name)
        df.write.mode("overwrite").parquet(d)
        files = list(m.get("files", []))
        if m.get("num_buckets"):
            # flatten a bucketed table into append mode is not supported
            raise ValueError(f"table {name} is bucketed; use merge_upsert")
        files.append(d)
        return self._save_manifest(
            name, {"key": None, "num_buckets": 0, "files": files,
                   "schema": m.get("schema") or self._data_schema_json(df)})

    def merge_upsert(self, name: str, updates: DataFrame, key: str, num_buckets: int = 64) -> str:
        """MERGE semantics (WHEN MATCHED UPDATE, WHEN NOT MATCHED INSERT) with
        bucket-level copy-on-write. Last-write-wins on the key within
        ``updates`` is the caller's responsibility (dedupe first).

        Scale note: suitable for tables whose per-call updates cluster into
        FEW buckets. Hash-uniform per-wave updates (seen/report/host_state)
        touch every bucket once updates ≥ bucket count, degenerating this to
        an O(table) rewrite — those tables use the LSM paths instead
        (append_bucketed + version-resolved reads + compact_bucketed)."""
        m = self._load_manifest(name)
        bucketed = updates.withColumn(
            BUCKET_COL, F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets)).cast("int")
        )
        affected = sorted(
            r[BUCKET_COL] for r in bucketed.select(BUCKET_COL).distinct().collect()
        )
        if m is None:
            m = {"key": key, "num_buckets": num_buckets, "buckets": {}}
        if m["num_buckets"] != num_buckets or m["key"] != key:
            raise ValueError(f"table {name}: bucket spec mismatch")
        buckets: dict[str, list[str]] = {str(k): list(v) for k, v in m.get("buckets", {}).items()}
        old_paths = [p for b in affected for p in buckets.get(str(b), [])]
        if old_paths:
            old = self._read_parquet(old_paths, m)
            # per-wave updates are a small fraction of the table — broadcast
            # the key set so the anti-join never shuffles the kept rows
            keep = old.join(
                F.broadcast(updates.select(key).distinct()), on=key, how="left_anti"
            )
            keep = keep.withColumn(
                BUCKET_COL, F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets)).cast("int")
            )
            merged = keep.unionByName(bucketed.select(keep.columns))
        else:
            merged = bucketed
        d = self._new_data_dir(name)
        # repartition by bucket before the partitioned write: otherwise every
        # shuffle partition writes a sliver into every bucket dir —
        # num_buckets × shuffle_partitions tiny files per merge
        merged.repartition(min(num_buckets, 32), F.col(BUCKET_COL)).write.mode(
            "overwrite"
        ).partitionBy(BUCKET_COL).parquet(d)
        for b in affected:
            sub = os.path.join(d, f"{BUCKET_COL}={b}")
            buckets[str(b)] = [sub] if os.path.exists(sub) else []
        return self._save_manifest(
            name, {"key": key, "num_buckets": num_buckets, "buckets": buckets,
                   "schema": m.get("schema") or self._data_schema_json(updates)})

    def overwrite_bucketed(self, name: str, df: DataFrame, key: str,
                           num_buckets: int = 64) -> str:
        """Full rewrite of a table INTO the bucketed layout (readable with
        bucket pruning, appendable with append_bucketed) — the one-time
        migration step when a table that was small enough for plain
        ``overwrite`` crosses into LSM territory. O(table), by design run
        once at the threshold crossing. Callers attach Observations to
        ``df`` directly if they need write-riding metrics."""
        bucketed = df.withColumn(
            BUCKET_COL, F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets)).cast("int")
        )
        d = self._new_data_dir(name)
        bucketed.repartition(min(num_buckets, 32), F.col(BUCKET_COL)).write.mode(
            "overwrite"
        ).partitionBy(BUCKET_COL).parquet(d)
        buckets = {}
        for b in range(num_buckets):
            sub = os.path.join(d, f"{BUCKET_COL}={b}")
            if os.path.exists(sub):
                buckets[str(b)] = [sub]
        return self._save_manifest(
            name, {"key": key, "num_buckets": num_buckets, "buckets": buckets,
                   "schema": self._data_schema_json(df)})

    def append_bucketed(self, name: str, df: DataFrame, key: str, num_buckets: int = 64,
                        base_manifest: str | None = None) -> str:
        """LSM-style bucketed append: write the new rows partitioned by
        key-hash bucket and LINK the new leaf dirs into each bucket's file
        list — O(new data) per call, no rewrite of existing data. Readers
        keep bucket pruning; last-write-wins resolution (by a version column)
        is the reader's job; periodic compaction can rewrite hot buckets.

        ``base_manifest``: chain from an UNCOMMITTED manifest instead of
        HEAD — lets one wave split a table's append into two pooled writes
        (an early half overlapped with the admit job, the admit half after)
        without the second losing the first's leaves."""
        m = self._load_manifest(name, base_manifest) or {
            "key": key, "num_buckets": num_buckets, "buckets": {}}
        if m["num_buckets"] != num_buckets or m["key"] != key:
            raise ValueError(f"table {name}: bucket spec mismatch")
        bucketed = df.withColumn(
            BUCKET_COL, F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets)).cast("int")
        )
        d = self._new_data_dir(name)
        bucketed.repartition(min(num_buckets, 32), F.col(BUCKET_COL)).write.mode(
            "overwrite"
        ).partitionBy(BUCKET_COL).parquet(d)
        buckets: dict[str, list[str]] = {str(k): list(v) for k, v in m.get("buckets", {}).items()}
        for b in range(num_buckets):
            sub = os.path.join(d, f"{BUCKET_COL}={b}")
            if os.path.exists(sub):
                buckets.setdefault(str(b), []).append(sub)
        return self._save_manifest(
            name, {"key": key, "num_buckets": num_buckets, "buckets": buckets,
                   "schema": m.get("schema") or self._data_schema_json(df)})

    # ------------------------------------------------------- ranged tables
    def append_ranged(self, name: str, df: DataFrame, range_col: str,
                      range_bits: int = 18, bucket_col: str | None = None,
                      num_buckets: int = 16) -> str:
        """LSM append for a table whose rows are CONSUMED in ``range_col``
        order (the frontier: per-host priority prefixes). Rows are written
        partitioned by ``range_id = range_col >> range_bits``; the manifest
        records leaf dirs per range. Because consumption is a priority
        prefix, a fully-consumed range is dropped from the manifest with
        ZERO data movement (prune_ranged) — the frontier never needs a
        rewrite, only appends + manifest edits. O(new data) per call.

        ``bucket_col`` set → leaves are additionally split by
        ``pmod(xxhash64(bucket_col), num_buckets)`` so consumption progress
        can be tracked PER BUCKET: with a global min cursor, one lagging
        host blocks range pruning for the whole frontier; with per-host-
        bucket cursors only that host's bucket keeps its dead ranges alive
        (read_ranged/prune_ranged ``bucket_mins``)."""
        m = self._load_manifest(name) or {
            "range_col": range_col, "range_bits": range_bits, "ranges": {},
            "bucket_col": bucket_col, "num_buckets": num_buckets if bucket_col else None,
        }
        if m.get("range_col") != range_col or m.get("range_bits") != range_bits:
            raise ValueError(f"table {name}: range spec mismatch")
        if m.get("bucket_col") != bucket_col:
            # NOTE format break: manifests written before host-bucketing
            # (bucket_col absent ⇒ None) fail fast here when resumed with a
            # bucketed spec — re-append under the old flat spec, or start a
            # fresh warehouse. Reads of flat manifests still prune via the
            # global-cursor fallback in _ranged_leaves.
            raise ValueError(
                f"table {name}: bucket_col mismatch (manifest="
                f"{m.get('bucket_col')!r}, requested={bucket_col!r})"
            )
        if bucket_col is not None and m.get("num_buckets") != num_buckets:
            # silent acceptance would relabel new leaves under a different
            # hash modulus while old leaves keep __hb labels from the old
            # one — cursor pruning would then drop leaves that still hold
            # live rows (silent URL loss). The consumer derives its modulus
            # from this manifest (ranged_bucket_spec), so a changed config
            # must be rejected, not absorbed.
            raise ValueError(
                f"table {name}: num_buckets mismatch (manifest="
                f"{m.get('num_buckets')}, requested={num_buckets}) — the "
                f"host-bucket modulus is immutable for the table's lifetime"
            )
        RANGE, HB = "__range", "__hb"
        ranged = df.withColumn(
            RANGE, F.shiftright(F.col(range_col).cast("long"), range_bits).cast("long")
        )
        part_cols = [RANGE]
        if bucket_col is not None:
            ranged = ranged.withColumn(
                HB, F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(num_buckets)).cast("int")
            )
            part_cols.append(HB)
        d = self._new_data_dir(name)
        # salt the write partitioning: one wave's rows span only 1-2 priority
        # ranges, and repartition(RANGE) alone would funnel the whole append
        # through 1-2 write tasks; salted writers per leaf keep the file
        # count bounded while using the cluster. Host-bucketed tables already
        # have ranges x num_buckets leaves (>= cores), so they skip the salt:
        # leaf-dir count is the commit critical path (measured: the frontier
        # append at 2x salt was the slowest member of the commit pool).
        salt = F.pmod(F.xxhash64(F.col(range_col)), F.lit(8 if bucket_col is None else 1))
        ranged.repartition(*[F.col(c) for c in part_cols], salt).write.mode(
            "overwrite"
        ).partitionBy(*part_cols).parquet(d)
        ranges = {str(k): v for k, v in m.get("ranges", {}).items()}
        for sub in os.listdir(d):
            if not sub.startswith(f"{RANGE}="):
                continue
            rid = sub.split("=", 1)[1]
            if bucket_col is None:
                ranges.setdefault(rid, []).append(os.path.join(d, sub))
            else:
                by_hb = ranges.setdefault(rid, {})
                for hsub in os.listdir(os.path.join(d, sub)):
                    if hsub.startswith(f"{HB}="):
                        hb = hsub.split("=", 1)[1]
                        by_hb.setdefault(hb, []).append(os.path.join(d, sub, hsub))
        return self._save_manifest(
            name, {"range_col": range_col, "range_bits": range_bits, "ranges": ranges,
                   "bucket_col": bucket_col,
                   "num_buckets": num_buckets if bucket_col else None,
                   "schema": m.get("schema") or self._data_schema_json(df)}
        )

    @staticmethod
    def _ranged_leaves(m: dict, min_exclusive: int | None,
                       bucket_mins: dict[int, int] | None):
        """→ kept {rid: dirs-or-{hb: dirs}} after cursor pruning. A leaf is
        dead iff its whole range span is ≤ the relevant cursor: the global
        ``min_exclusive`` for flat tables, the leaf's OWN bucket cursor for
        bucketed ones (an unknown bucket is conservatively kept)."""
        bits = m["range_bits"]
        bucketed = m.get("bucket_col") is not None
        if not bucketed and bucket_mins is not None and min_exclusive is None:
            # legacy flat manifest driven by a per-bucket caller: collapse
            # to the global cursor (min over buckets) so pre-bucketing
            # frontiers keep range pruning on resume instead of silently
            # pruning nothing
            min_exclusive = min(bucket_mins.values()) if bucket_mins else None
        keep = {}
        for rid, entry in m.get("ranges", {}).items():
            rmax = ((int(rid) + 1) << bits) - 1
            if bucketed and bucket_mins is not None:
                kept_hb = {
                    hb: dirs
                    for hb, dirs in entry.items()
                    if not (int(hb) in bucket_mins and rmax <= bucket_mins[int(hb)])
                }
                if kept_hb:
                    keep[rid] = kept_hb
            else:
                if min_exclusive is not None and rmax <= min_exclusive:
                    continue
                keep[rid] = entry
        return keep

    def read_ranged(self, name: str, min_exclusive: int | None = None,
                    bucket_mins: dict[int, int] | None = None,
                    manifest_file: str | None = None) -> DataFrame | None:
        """Read a ranged table, PRUNING leaves whose entire ``range_col``
        span is consumed (≤ the global ``min_exclusive``, or ≤ their own
        host-bucket's cursor in ``bucket_mins``) at the manifest level — no
        file IO for dead leaves. ``manifest_file`` reads a specific
        (possibly not-yet-committed) manifest instead of HEAD — the
        pipelined wave commit's next-select read."""
        m = self._load_manifest(name, manifest_file)
        if m is None:
            return None
        paths = []
        for entry in self._ranged_leaves(m, min_exclusive, bucket_mins).values():
            dirs = entry if isinstance(entry, list) else [
                p for ds in entry.values() for p in ds
            ]
            paths.extend(dirs)
        paths = [p for p in paths if os.path.exists(p)]
        if not paths:
            return None
        return self._read_parquet(paths, m)

    def prune_ranged(self, name: str, min_exclusive: int | None = None,
                     bucket_mins: dict[int, int] | None = None) -> str | None:
        """Drop fully-consumed leaves from the manifest (zero-IO compaction).
        Returns the new manifest name, or None if nothing was prunable."""
        m = self._load_manifest(name)
        if m is None:
            return None
        keep = self._ranged_leaves(m, min_exclusive, bucket_mins)
        before = sum(
            len(e) if isinstance(e, dict) else 1 for e in m.get("ranges", {}).values()
        )
        after = sum(len(e) if isinstance(e, dict) else 1 for e in keep.values())
        if after == before:
            return None
        return self._save_manifest(
            name, {"range_col": m["range_col"], "range_bits": m["range_bits"],
                   "ranges": keep, "bucket_col": m.get("bucket_col"),
                   "num_buckets": m.get("num_buckets"), "schema": m.get("schema")}
        )

    def compact_bucketed(
        self, name: str, version_col: str | None = None,
        prefer_nonnull: str | None = None, max_files_per_bucket: int = 8,
    ) -> str | None:
        """LSM compaction: rewrite buckets whose leaf-dir count exceeds
        ``max_files_per_bucket``, resolving last-write-wins by ``version_col``
        (ties: non-null ``prefer_nonnull`` wins). Bounded read amplification
        for long crawls; untouched buckets keep their files. Returns the new
        manifest name, or None if nothing needed compaction."""
        m = self._load_manifest(name)
        if m is None or not m.get("num_buckets"):
            return None
        buckets: dict[str, list[str]] = {str(k): list(v) for k, v in m.get("buckets", {}).items()}
        hot = [b for b, paths in buckets.items() if len(paths) > max_files_per_bucket]
        if not hot:
            return None
        paths = [p for b in hot for p in buckets[b] if os.path.exists(p)]
        df = self._read_parquet(paths, m)
        key = m["key"]
        if version_col is not None:
            from pyspark.sql import Window

            order = [F.col(version_col).desc()]
            if prefer_nonnull is not None:
                order.append(F.when(F.col(prefer_nonnull).isNull(), 1).otherwise(0))
            w = Window.partitionBy(key).orderBy(*order)
            df = (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        nb = m["num_buckets"]
        bucketed = df.withColumn(
            BUCKET_COL, F.pmod(F.xxhash64(F.col(key)), F.lit(nb)).cast("int")
        )
        d = self._new_data_dir(name)
        bucketed.repartition(min(nb, 32), F.col(BUCKET_COL)).write.mode(
            "overwrite"
        ).partitionBy(BUCKET_COL).parquet(d)
        for b in hot:
            sub = os.path.join(d, f"{BUCKET_COL}={b}")
            buckets[b] = [sub] if os.path.exists(sub) else []
        return self._save_manifest(
            name, {"key": key, "num_buckets": nb, "buckets": buckets,
                   "schema": m.get("schema")})

    # --------------------------------------------------------------- readers
    def exists(self, name: str) -> bool:
        return self._load_manifest(name) is not None

    def read(self, name: str, buckets: list[int] | None = None) -> DataFrame | None:
        """Read a table at HEAD. ``buckets`` prunes a bucketed table to the
        named buckets only (used by the seen-set anti-join)."""
        m = self._load_manifest(name)
        if m is None:
            return None
        if m.get("num_buckets"):
            bmap = m.get("buckets", {})
            sel = bmap.keys() if buckets is None else [str(b) for b in buckets]
            paths = [p for b in sel for p in bmap.get(str(b), [])]
        else:
            paths = list(m.get("files", []))
        paths = [p for p in paths if os.path.exists(p)]
        if not paths:
            return None
        return self._read_parquet(paths, m)

    def num_buckets(self, name: str) -> int:
        m = self._load_manifest(name)
        return int(m.get("num_buckets", 0)) if m else 0

    def ranged_bucket_spec(self, name: str) -> tuple[str | None, int | None] | None:
        """(bucket_col, num_buckets) recorded in a ranged table's manifest —
        the AUTHORITATIVE hash modulus for cursor pruning (deriving it from
        config instead would compute bucket ids under a different modulus
        than the one the leaves were labeled with after a config change).
        None if the table does not exist; (None, None) for flat manifests."""
        m = self._load_manifest(name)
        if m is None:
            return None
        return (m.get("bucket_col"), m.get("num_buckets"))

    def ranged_live_buckets(self, name: str, min_exclusive: int | None = None,
                            bucket_mins: dict[int, int] | None = None,
                            manifest_file: str | None = None) -> list[int] | None:
        """Host-hash buckets that still have LIVE leaves after cursor
        pruning — from the manifest alone. A consumer keyed by the same
        (bucket_col, num_buckets) spec (host_state) can restrict its own
        read to these buckets: hosts whose every frontier leaf is consumed
        cannot appear in the wave's select join. None for flat manifests."""
        m = self._load_manifest(name, manifest_file)
        if m is None or m.get("bucket_col") is None:
            return None
        hbs: set[int] = set()
        for entry in self._ranged_leaves(m, min_exclusive, bucket_mins).values():
            hbs.update(int(h) for h in entry)
        return sorted(hbs)

    def ranged_leaf_count(self, name: str, min_exclusive: int | None = None,
                          bucket_mins: dict[int, int] | None = None,
                          manifest_file: str | None = None) -> int:
        """Number of live leaf dirs a read_ranged with the same cursors would
        scan — from the manifest alone, no Spark plan / RDD conversion (the
        wave loop sizes its select shuffle from this)."""
        m = self._load_manifest(name, manifest_file)
        if m is None:
            return 0
        n = 0
        for entry in self._ranged_leaves(m, min_exclusive, bucket_mins).values():
            n += len(entry) if isinstance(entry, list) else sum(
                len(ds) for ds in entry.values()
            )
        return n
