"""SnapshotTable: a minimal snapshot-log lakehouse table (Iceberg-like).

Why this exists: the sandbox has no network and no Iceberg/Delta runtime jar,
but the north rule requires idempotent MERGE with snapshot-based exactly-once,
schema evolution, and resumability. This module implements those semantics
directly on parquet + an atomic JSON commit log, with the same *physical*
cost model as Iceberg's copy-on-write MERGE:

- The table is hash-bucketed on the key: ``bucket = pmod(xxhash64(url), N)``.
- A merge rewrites ONLY the buckets touched by the batch (Iceberg rewrites
  only affected data files); untouched buckets are carried forward by
  reference in the new snapshot's manifest. At 100 TB with tens of thousands
  of buckets, merge cost is proportional to the touched fraction, not table
  size.
- A commit is one atomic ``open(path, "x")`` + rename of
  ``_log/v{N}.json`` carrying: parent snapshot, schema (with full history),
  bucket→(data path, schema id) manifest, and a summary with the applied
  LSN range + batch id. Exactly-once = "skip any batch whose lsn_max ≤ the
  last committed lsn_max" (replay detection), plus rewrites themselves being
  deterministic (a re-run of a half-applied batch rewrites identical bucket
  contents before the commit exists, so no torn state is observable).
- Schema evolution (column add / int→long / float→double widen) updates the
  schema in the SAME commit as the merge — transactional, per north rule.
  Old buckets are NOT rewritten on widen; each bucket records the schema id
  it was written under, and reads align per schema-group then union.

Single-writer by design (one streaming query owns a table — same operational
model as a Delta/Iceberg streaming sink); ``open(..., "x")`` makes a
concurrent second writer fail its commit rather than corrupt the log.

On a real cluster with Iceberg jars, `hyped_spark.lake.iceberg_backend`
replaces this class with genuine ``MERGE INTO`` SQL — the engine's merge
*source construction* (dedup, align, salt) is shared between both backends.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hyped_spark.schema import SchemaDiff, align_to_schema, apply_diff, diff_schemas

_LOG_DIR = "_log"
_DATA_DIR = "data"
# fragment snapshot ordinal (8-byte long, parsed from the zero-padded snap
# dir in the file path at scan time) — MOR equal-ord tie-break; a compact
# column instead of the path string so the merge shuffle carries 8 bytes,
# and attached only when fragments actually exist (see _resolve_lww)
_FRAG_ORD = "__frag_ord"

# Deletes persist as tombstone rows (null payload, this flag set). This makes
# the LWW merge COMMUTATIVE across microbatches: a late-delivered update with
# a lower LSN than an applied delete loses to the tombstone instead of
# resurrecting the row. Required because streaming file sources deliver part
# files in mtime order, not LSN order. Tombstones are filtered from read();
# GC (dropping tombstones older than a low-watermark LSN) is a compaction
# concern, orthogonal to correctness.
_TOMBSTONE = "__tombstone"


def bucket_expr(key_col: str, n_buckets: int) -> F.Column:
    """Stable bucket id for a key — the table's partitioning function."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


@dataclass
class MergeStats:
    batch_id: int
    snapshot_id: int
    lsn_min: int
    lsn_max: int
    rows_in_batch: int
    rows_after_dedup: int
    rows_upserted: int
    rows_deleted: int
    buckets_touched: int
    merge_latency_ms: int
    skipped_replay: bool = False
    # per-partition lineage: bucket id -> rows applied to it in this batch
    bucket_rows: dict[int, int] | None = None
    # per-phase wall-clock (ms): meta / heavy / commit — for overhead audits
    phases: dict[str, int] | None = None


class SnapshotTable:
    """Bucketed copy-on-write table with an atomic JSON snapshot log."""

    def __init__(self, spark: SparkSession, path: str, key: str = "url",
                 ord_col: str = "lsn", n_buckets: int = 16):
        self.spark = spark
        self.path = path
        self.key = key
        self.ord_col = ord_col
        self.n_buckets = n_buckets
        # cached max committed version: one listdir per table lifetime
        # (advanced by _commit; valid under the single-writer protocol —
        # a lost commit race invalidates it, see _commit)
        self._version_cache: int | None = None
        os.makedirs(os.path.join(path, _LOG_DIR), exist_ok=True)
        os.makedirs(os.path.join(path, _DATA_DIR), exist_ok=True)

    # ---------------- snapshot log ----------------

    def _log_path(self, version: int) -> str:
        return os.path.join(self.path, _LOG_DIR, f"v{version:020d}.json")

    def current_version(self) -> int:
        """Latest committed version, or -1 if the table is empty.

        A 10^5-commit log would otherwise pay a directory scan per merge;
        the scan runs once per table object and the cache advances on each
        successful commit."""
        if self._version_cache is None:
            names = [n for n in os.listdir(os.path.join(self.path, _LOG_DIR))
                     if n.startswith("v") and n.endswith(".json")]
            self._version_cache = (
                max(int(n[1:-5]) for n in names) if names else -1
            )
        return self._version_cache

    def refresh(self) -> int:
        """Drop the cached max version and rescan the commit log.

        The cache makes a handle's view of "current" stable for its
        lifetime: a WRITER handle always sees its own commits (``_commit``
        advances the cache), but a long-lived READ-ONLY handle does NOT
        observe commits made through a different handle/process until it
        calls ``refresh()`` (or is re-created, or reads an explicit
        ``version=``). Returns the new current version."""
        self._version_cache = None
        return self.current_version()

    def _read_commit(self, version: int) -> dict:
        with open(self._log_path(version)) as f:
            return json.load(f)

    def current_commit(self) -> dict | None:
        v = self.current_version()
        return None if v < 0 else self._read_commit(v)

    def _commit(self, version: int, payload: dict) -> None:
        """Atomic, collision-safe commit: 'x' mode fails if the version
        already exists (optimistic concurrency, single-winner)."""
        p = self._log_path(version)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, default=str)
            f.flush()
            os.fsync(f.fileno())
        # final publish must be exclusive -> link(2) fails if target exists
        try:
            os.link(tmp, p)
        except FileExistsError:
            # lost the commit race: another writer advanced the log — the
            # cached max is stale, force a re-scan on the next read
            self._version_cache = None
            raise
        finally:
            os.unlink(tmp)
        self._version_cache = version

    # ---------------- schema ----------------

    def schema(self) -> T.StructType | None:
        c = self.current_commit()
        if c is None:
            return None
        return T.StructType.fromJson(c["schemas"][-1])

    def last_committed_lsn(self) -> int:
        c = self.current_commit()
        if c is None:
            return -1
        return int(c["summary"].get("lsn_max", -1))

    def snapshot_id(self) -> int:
        return self.current_version()

    def history(self) -> list[dict]:
        out = []
        for v in range(self.current_version() + 1):
            try:
                out.append(self._read_commit(v))
            except FileNotFoundError:  # expired snapshot
                pass
        return out

    # ---------------- read path ----------------

    @staticmethod
    def _frags(info) -> list[dict]:
        """Normalize a manifest bucket entry: COW writes a single fragment
        dict; MOR appends fragments as a list. Readers see a list either way."""
        return info if isinstance(info, list) else [info]

    def _needs_resolve(self, commit: dict) -> bool:
        return any(len(self._frags(i)) > 1 for i in commit["buckets"].values())

    def _resolve_lww(self, df: DataFrame) -> DataFrame:
        """Read-side LWW across MOR fragments: latest row per key wins
        (same window shape as the merge; hash-prefixed sort keys).

        Secondary sort on the fragment snapshot ordinal makes equal-ord ties
        deterministic: duplicate (key, ord) events delivered in different
        epochs with differing payloads resolve to the NEWEST fragment on
        every scan."""
        from pyspark.sql import Window

        w = Window.partitionBy(F.xxhash64(F.col(self.key)), self.key).orderBy(
            F.col(self.ord_col).desc(), F.col(_FRAG_ORD).desc()
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", _FRAG_ORD)
        )

    def read(self, version: int | None = None) -> DataFrame:
        """Current (or time-travel) table state as a DataFrame.

        Buckets are grouped by the schema id they were written under;
        each group is read once (one parquet scan over many dirs — keeps
        the plan small even with thousands of buckets), aligned to the
        current schema, and unioned (≤ number of historical schemas groups).

        COW snapshots hold ≤1 row per key, so the read is scan+filter only.
        When merge-on-read fragments exist (merge_mode="mor"), the read
        LWW-resolves across fragments first — Iceberg v2 MOR's read-side
        merge, paid only when fragments are present.
        """
        v = self.current_version() if version is None else version
        if v < 0:
            raise ValueError(f"table {self.path} has no snapshots")
        c = self._read_commit(v)
        schema = T.StructType.fromJson(c["schemas"][-1])
        if self._needs_resolve(c):
            df = self._read_groups(c, list(c["buckets"].values()), schema,
                                   keep_tombstones=True, with_file=True)
            df = self._resolve_lww(df)
            return df.filter(~F.col(_TOMBSTONE)).drop(_TOMBSTONE)
        return self._read_groups(c, list(c["buckets"].values()), schema,
                                 keep_tombstones=False)

    def lookup(self, keys: list, version: int | None = None) -> DataFrame:
        """Point lookup by key, reading ONLY the buckets the keys hash to.

        The hash-bucket layout doubles as an index: bucket ids for the
        requested keys come from the same :func:`bucket_expr` the writer
        uses (one tiny Spark job over ``len(keys)`` rows, so rebucketed
        tables stay consistent via the commit's ``n_buckets``), and only
        those bucket directories are scanned — at 100 TB a k-key lookup
        touches at most ``k/n_buckets`` of the data, the same pruning
        contract as Iceberg partition pruning. MOR fragments LWW-resolve
        within the pruned buckets only.
        """
        if not keys:
            raise ValueError("lookup needs at least one key")
        v = self.current_version() if version is None else version
        if v < 0:
            raise ValueError(f"table {self.path} has no snapshots")
        c = self._read_commit(v)
        schema = T.StructType.fromJson(c["schemas"][-1])
        nb = int(c.get("n_buckets", self.n_buckets))
        key_schema = T.StructType([schema[self.key]])
        kdf = self.spark.createDataFrame([(k,) for k in keys], key_schema)
        bucket_ids = sorted(
            r[0] for r in
            kdf.select(bucket_expr(self.key, nb)).distinct().collect()
        )
        return self._bucket_state(c, bucket_ids).filter(
            F.col(self.key).isin(keys)
        )

    def _bucket_state(self, commit: dict, bucket_ids: list[int]) -> DataFrame:
        """Resolved, tombstone-free state of a subset of buckets under one
        commit (the read() pipeline, pruned)."""
        schema = T.StructType.fromJson(commit["schemas"][-1])
        resolve = self._needs_resolve(commit)
        df = self._read_buckets(commit, bucket_ids, schema, with_file=resolve)
        if resolve:
            df = self._resolve_lww(df)
        return df.filter(~F.col(_TOMBSTONE)).drop(_TOMBSTONE)

    def changes(self, from_version: int,
                to_version: int | None = None) -> DataFrame:
        """Change feed between two snapshots (Delta CDF / Iceberg changelog
        analogue): one row per key whose state differs between
        ``from_version`` and ``to_version`` (default: current), with
        ``_change_type`` in ``insert`` / ``update_postimage`` / ``delete``.
        Inserts and updates carry the post-image, deletes the pre-image.

        Granularity is the version RANGE (net effect), not per-commit: a
        key inserted and then deleted inside the range does not appear.

        Scale shape: only buckets whose fragment lists differ between the
        two manifests are read — a merge touching f% of buckets yields a
        change scan over ~f% of the table per side, and the diff join
        shuffles just those buckets' keys. Both snapshots must still exist
        (not expired).
        """
        v2 = self.current_version() if to_version is None else to_version
        if not 0 <= from_version <= v2:
            raise ValueError(f"bad version range [{from_version}, {v2}]")
        c1, c2 = self._read_commit(from_version), self._read_commit(v2)

        def frags_of(c: dict, b: str) -> tuple:
            return tuple(f["path"] for f in self._frags(c["buckets"][b]))

        b1, b2 = set(c1["buckets"]), set(c2["buckets"])
        unchanged = {b for b in b1 & b2 if frags_of(c1, b) == frags_of(c2, b)}
        old_ids = sorted(int(b) for b in b1 - unchanged)
        new_ids = sorted(int(b) for b in b2 - unchanged)

        schema2 = T.StructType.fromJson(c2["schemas"][-1])
        old = align_to_schema(self._bucket_state(c1, old_ids), schema2)
        new = self._bucket_state(c2, new_ids)

        cols = [f.name for f in schema2.fields]
        payload = [c for c in cols if c != self.key]
        o = old.select(F.col(self.key),
                       *[F.col(c).alias(f"__o_{c}") for c in payload],
                       F.lit(True).alias("__in_old"))
        n = new.select(F.col(self.key),
                       *[F.col(c).alias(f"__n_{c}") for c in payload],
                       F.lit(True).alias("__in_new"))
        j = o.join(n, self.key, "full_outer")
        # alias struct fields back to the plain names — to_json serializes
        # field NAMES, so prefixed sides would never compare equal
        o_img = F.to_json(
            F.struct(*[F.col(f"__o_{c}").alias(c) for c in payload])
        )
        n_img = F.to_json(
            F.struct(*[F.col(f"__n_{c}").alias(c) for c in payload])
        )
        change = (
            F.when(F.col("__in_old").isNull(), F.lit("insert"))
            .when(F.col("__in_new").isNull(), F.lit("delete"))
            .when(o_img != n_img, F.lit("update_postimage"))
        )
        j = j.withColumn("_change_type", change).filter(
            F.col("_change_type").isNotNull()
        )
        out_cols = [
            F.coalesce(F.col(f"__n_{c}"), F.col(f"__o_{c}")).alias(c)
            for c in payload
        ]
        return j.select(self.key, *out_cols, "_change_type")

    def sync_from(self, src: "SnapshotTable", since_version: int,
                  batch_id: int | None = None, **merge_kwargs):
        """Incrementally materialize this table from ``src``'s change feed
        (downstream/derived-table maintenance): apply every net change in
        ``src`` since ``since_version`` as one idempotent merge batch.

        The feed is pruned to ``src``'s rewritten buckets (see
        :meth:`changes`), so a sync after a merge touching f% of ``src``
        costs ~f% of a full copy. ``batch_id`` defaults to ``src``'s
        current version with the ``batch_id`` replay guard, so re-syncing
        the same source version is a guarded no-op. An uninitialized
        destination is bootstrapped with ``src``'s current schema.
        Returns the :class:`MergeStats`, or ``None`` when the feed is
        empty. The caller tracks ``since_version`` (e.g. the previous
        sync's source version).
        """
        src_v = src.current_version()
        feed = src.changes(since_version, src_v)
        if self.current_version() < 0:
            self.init_empty(
                T.StructType.fromJson(src._read_commit(src_v)["schemas"][-1])
            )
        if not feed.limit(1).count():
            return None
        ev = (
            feed.withColumn(
                "op",
                F.when(F.col("_change_type") == "delete", F.lit("delete"))
                 .otherwise(F.lit("update")),
            )
            .drop("_change_type")
        )
        bid = src_v if batch_id is None else batch_id
        merge_kwargs.setdefault("guard", "batch_id")
        return self.merge_events(ev, batch_id=bid, **merge_kwargs)

    def _read_groups(self, commit: dict, infos: list[dict],
                     schema: T.StructType, keep_tombstones: bool,
                     with_file: bool = False) -> DataFrame:
        """Read a set of bucket dirs, grouped by written schema id (one scan
        per schema group, so the plan stays small with thousands of buckets).
        ``with_file`` carries each row's fragment snapshot ordinal (parsed
        from ``_metadata.file_path`` at scan time) for the MOR tie-break."""
        ts_field = T.StructField(_TOMBSTONE, T.BooleanType())
        extra = [T.StructField(_FRAG_ORD, T.LongType())] if with_file else []
        target = T.StructType(list(schema.fields) + [ts_field] + extra)
        groups: dict[int, list[str]] = {}
        for info in infos:
            for frag in self._frags(info):
                groups.setdefault(frag["schema_id"], []).append(
                    os.path.join(self.path, frag["path"])
                )
        if not groups:
            out = self.spark.createDataFrame([], target)
        else:
            parts = []
            for sid, paths in sorted(groups.items()):
                phys = T.StructType(
                    list(T.StructType.fromJson(commit["schemas"][sid]).fields)
                    + [ts_field]
                )
                df = self.spark.read.schema(phys).parquet(*paths)
                if with_file:
                    df = df.withColumn(
                        _FRAG_ORD,
                        # anchored to the table's own data-dir layout
                        # (data/snapNNNNNNNNNN/...) so a table rooted under
                        # a directory that itself matches "snap<digits>"
                        # can't hijack the ordinal
                        F.regexp_extract(
                            F.col("_metadata.file_path"),
                            rf"/{_DATA_DIR}/snap(\d{{10}})/", 1
                        ).cast("long"),
                    )
                parts.append(align_to_schema(df, target))
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        out = out.withColumn(
            _TOMBSTONE, F.coalesce(F.col(_TOMBSTONE), F.lit(False))
        )
        if keep_tombstones:
            return out
        return out.filter(~F.col(_TOMBSTONE)).drop(_TOMBSTONE)

    def _read_buckets(self, commit: dict, bucket_ids: list[int],
                      schema: T.StructType,
                      with_file: bool = False) -> DataFrame:
        infos = [commit["buckets"][str(b)] for b in bucket_ids
                 if str(b) in commit["buckets"]]
        return self._read_groups(commit, infos, schema, keep_tombstones=True,
                                 with_file=with_file)

    # ---------------- write path ----------------

    def init_empty(self, schema: T.StructType) -> None:
        """Create snapshot 0 with no data (schema must include key+ord)."""
        if self.current_version() >= 0:
            return
        self._commit(0, {
            "snapshot_id": 0,
            "parent": None,
            "schemas": [schema.jsonValue()],
            "buckets": {},
            "n_buckets": self.n_buckets,
            "key": self.key,
            "ord_col": self.ord_col,
            "summary": {"lsn_max": -1, "batch_id": -1, "operation": "create"},
        })

    # ---------------- maintenance ----------------

    def expire_snapshots(self, keep_last: int = 1) -> int:
        """Drop old snapshot metadata and delete data dirs no current
        snapshot references (≙ Iceberg expire_snapshots). Returns the
        number of data directories removed. Time travel to expired
        snapshots stops working; the latest ``keep_last`` remain."""
        import shutil

        cur = self.current_version()
        if cur < 0:
            return 0
        keep_versions = [v for v in range(max(0, cur - keep_last + 1), cur + 1)]
        referenced: set[str] = set()
        for v in keep_versions:
            c = self._read_commit(v)
            for info in c["buckets"].values():
                for frag in self._frags(info):
                    # fragment paths look like data/snap000…/__bucket=k
                    referenced.add(frag["path"].split(os.sep + "__bucket=")[0])
        data_root = os.path.join(self.path, _DATA_DIR)
        removed = 0
        for d in os.listdir(data_root):
            rel = os.path.join(_DATA_DIR, d)
            if rel not in referenced:
                shutil.rmtree(os.path.join(data_root, d), ignore_errors=True)
                removed += 1
        for v in range(0, keep_versions[0]):
            try:
                os.unlink(self._log_path(v))
            except FileNotFoundError:
                pass
        return removed

    def vacuum(self, grace_seconds: float = 3600.0) -> int:
        """Remove ORPHANED data directories — written by a crashed or lost
        merge but never committed (the atomic-commit protocol makes these
        harmless garbage) — while keeping every directory referenced by ANY
        live snapshot, so time travel is unaffected (unlike
        :meth:`expire_snapshots`, which trades history for space).

        ``grace_seconds`` skips directories modified more recently than
        this — the safety margin for a concurrent writer mid-write. The
        default (1 h) is safe even with a concurrent merge in flight;
        pass 0 explicitly only when the caller owns the single writer and
        knows no merge is running. Returns the number of directories
        removed.
        """
        import shutil
        import time

        cur = self.current_version()
        referenced: set[str] = set()
        for v in range(0, cur + 1):
            try:
                c = self._read_commit(v)
            except FileNotFoundError:  # expired snapshot
                continue
            for info in c["buckets"].values():
                for frag in self._frags(info):
                    referenced.add(frag["path"].split(os.sep + "__bucket=")[0])
        data_root = os.path.join(self.path, _DATA_DIR)
        now = time.time()
        removed = 0
        for d in sorted(os.listdir(data_root)):
            rel = os.path.join(_DATA_DIR, d)
            full = os.path.join(data_root, d)
            if rel in referenced:
                continue
            if now - os.path.getmtime(full) < grace_seconds:
                continue
            shutil.rmtree(full, ignore_errors=True)
            removed += 1
        return removed

    def rollback(self, to_version: int) -> int:
        """Roll the table back to an earlier snapshot (≙ Iceberg
        rollback_to_snapshot): commits a NEW version whose manifest and
        schema are the target's, so history stays append-only and the
        rollback itself is an auditable commit. The summary watermarks
        (lsn_max / batch_id) revert with it — subsequent replay re-applies
        from the rolled-back point."""
        cur = self.current_version()
        if not 0 <= to_version <= cur:
            raise ValueError(f"cannot roll back to v{to_version} (current v{cur})")
        target = self._read_commit(to_version)
        new_version = cur + 1
        self._commit(new_version, {
            "snapshot_id": new_version,
            "parent": cur,
            "schemas": target["schemas"],
            "buckets": target["buckets"],
            "n_buckets": target["n_buckets"],
            "key": target["key"],
            "ord_col": target["ord_col"],
            "summary": dict(target["summary"], operation="rollback",
                            rolled_back_to=to_version),
        })
        return new_version

    def compact(self, n_buckets: int | None = None) -> int:
        """Rewrite every bucket into one fresh snapshot: merges MOR
        fragments and schema-group fragmentation, drops tombstones (GC —
        safe once no lower-LSN events can still arrive, i.e. between ingest
        sessions), and leaves a single schema id per bucket. Returns the
        new snapshot id.

        ``n_buckets`` REBUCKETS the table during the rewrite — the growth
        path when a table outgrows its bucket count (the Iceberg
        partition-spec-evolution analogue; at 100 TB you start with
        thousands of buckets and grow by rewriting, exactly this). By
        default the COMMITTED count is preserved, so a handle constructed
        with a different constructor value no longer silently rebuckets."""
        cur_version = self.current_version()
        if cur_version < 0:
            raise ValueError("nothing to compact")
        commit = self._read_commit(cur_version)
        self.n_buckets = int(
            n_buckets if n_buckets is not None
            else commit.get("n_buckets", self.n_buckets)
        )
        schema = T.StructType.fromJson(commit["schemas"][-1])
        needs = self._needs_resolve(commit)
        live = self._read_groups(
            commit, list(commit["buckets"].values()), schema,
            keep_tombstones=True, with_file=needs,
        )
        if needs:
            live = self._resolve_lww(live)
        live = (
            live.filter(~F.col(_TOMBSTONE)).drop(_TOMBSTONE)
            .withColumn("__bucket", bucket_expr(self.key, self.n_buckets))
        )
        new_version = cur_version + 1
        rel = os.path.join(_DATA_DIR, f"snap{new_version:010d}")
        (
            live.withColumn(_TOMBSTONE, F.lit(False))
            .repartition(self.n_buckets, F.col("__bucket"))
            .write.mode("overwrite").partitionBy("__bucket")
            .parquet(os.path.join(self.path, rel))
        )
        buckets = {}
        for b in range(self.n_buckets):
            bucket_rel = os.path.join(rel, f"__bucket={b}")
            if os.path.isdir(os.path.join(self.path, bucket_rel)):
                buckets[str(b)] = {"path": bucket_rel, "schema_id": 0}
        summary = dict(commit["summary"])
        summary["operation"] = "compact"
        self._commit(new_version, {
            "snapshot_id": new_version,
            "parent": cur_version,
            "schemas": [schema.jsonValue()],
            "buckets": buckets,
            "n_buckets": self.n_buckets,
            "key": self.key,
            "ord_col": self.ord_col,
            "summary": summary,
        })
        return new_version

    def merge_events(
        self,
        events: DataFrame,
        batch_id: int,
        guard: str = "lsn",
        op_col: str = "op",
        transform=None,
        stats_mode: str = "observe",
        meta_rows: list | None = None,
        pre_reduce: str | None = None,
        merge_mode: str = "cow",
    ) -> MergeStats:
        """Idempotent LWW MERGE of a change batch — ONE pass over the payload.

        ``events``: raw change events (``op_col`` ∈ {insert,update,delete},
        the ``ord_col``, the key, payload columns). Equivalent Iceberg SQL
        (cluster path):

            MERGE INTO target t USING (deduped events) s ON t.url = s.url
            WHEN MATCHED AND s.op = 'delete' AND s.lsn > t.lsn THEN UPDATE
                SET __tombstone = true, lsn = s.lsn   -- tombstone, see below
            WHEN MATCHED AND s.lsn > t.lsn THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *            -- incl. tombstones

        Physical shape (what matters at 100 TB):

        1. **Light meta job** — guard + per-bucket lineage from a
           column-pruned scan of (key, ord): the aggregate has ≤ n_buckets
           groups, so it is entirely map-side combine with a tiny shuffle
           and the payload never enters the job. A replayed batch is
           detected here for the cost of a two-column scan.
        2. **One heavy job** — union(raw events, touched buckets' current
           rows) → bucket repartition (the ONLY payload shuffle) → local
           sort → keep-first-per-key LWW resolve → ``transform`` (e.g.
           vectorized text extraction on the ≤1-row-per-key survivors) →
           bucket rewrite. The payload is scanned once, shuffled once,
           written once. No persist/cache of the payload.

        ``stats_mode`` — where the winner-level stats (rows_after_dedup /
        upserted / deleted) come from:
        - "observe" (default): an ``Observation`` side-output on the heavy
          write job — zero extra scans. rows_after_dedup counts the batch
          rows that WON the LWW resolve (equal to distinct batch keys for
          monotone-LSN batches; may be lower when an out-of-order epoch
          loses to already-applied higher LSNs).
        - "meta": a per-key pre-aggregation job (distinct batch keys +
          winner ops), one extra pruned scan. Used by the streaming path:
          an Observation inside ``foreachBatch`` deadlocks (measured r1).

        Replay guard (``guard``):
        - "lsn":      skip when lsn_max ≤ the committed lsn high-watermark
                      (LSN-ordered batch replay, monotone ranges).
        - "batch_id": skip when batch_id ≤ the committed batch id (streaming
                      epochs: monotone ids, arbitrary LSN contents — file
                      sources deliver part files in mtime order). Merge order
                      across epochs doesn't matter: tombstoned LWW is
                      commutative — each batch applied exactly once.

        ``merge_mode`` — the write-amplification dial (Iceberg COW vs MOR):
        - "cow" (default): rewrite the touched buckets — reads stay
          scan-only (≤1 row per key on disk). Best when batches touch a
          small fraction of the table or reads dominate.
        - "mor": append the batch winners as a new FRAGMENT per bucket and
          never read or rewrite current rows — per-batch cost is O(batch),
          not O(touched buckets). Reads LWW-resolve across fragments
          (read() pays a window) until ``compact()`` folds fragments back
          to one. Best for update-heavy streams where batches touch most
          buckets — exactly the regime where COW write-amplification
          explodes. Modes interoperate: a COW merge over a fragmented
          table naturally compacts the buckets it touches (its window
          resolves all fragment rows).

        ``pre_reduce="salted"`` — hot-key escape hatch: when a single key can
        dominate a microbatch (one url re-crawled millions of times), the
        window-rank funnels ALL its copies into one bucket partition's sort.
        The salted two-phase reduce (operators/lww.py) collapses the batch
        side to ≤ n_salt rows per key BEFORE the merge shuffle, spreading
        the hot key over many reducers. Off by default: on non-pathological
        batches it measured 5-7x slower than letting the single sort handle
        the duplicates (r1 measurements, scripts/dedup_shape_bench.py).
        Lineage (rows_in_batch, bucket_rows) still reflects the RAW events:
        the light meta job runs on the un-reduced input.

        Deletes persist as tombstones (see module header) which is what makes
        the out-of-order case safe.
        """
        t0 = time.monotonic()
        phases: dict[str, int] = {}
        if pre_reduce not in (None, "salted"):
            raise ValueError(f"unknown pre_reduce {pre_reduce!r}")
        if merge_mode not in ("cow", "mor"):
            raise ValueError(f"unknown merge_mode {merge_mode!r}")
        cur_version = self.current_version()
        if cur_version < 0:
            raise ValueError("call init_empty(schema) before merging")
        commit = self._read_commit(cur_version)
        self.n_buckets = int(commit.get("n_buckets", self.n_buckets))
        cur_schema = T.StructType.fromJson(commit["schemas"][-1])
        committed_lsn = int(commit["summary"].get("lsn_max", -1))
        committed_batch = int(commit["summary"].get("batch_id", -1))

        # ---- 1. light meta: guard + per-bucket lineage. ``meta_rows`` lets
        # a batch-loop caller precompute EVERY batch's per-bucket rollup in
        # ONE job upfront (ReplayEngine.replay does) — the per-batch meta
        # job was ~0.5s of level-independent overhead that capped scaling
        # efficiency. Otherwise: "observe" mode aggregates straight to
        # ≤ n_buckets groups (pure map-side combine); "meta" mode goes
        # through per-key winners first to also get exact dedup/delete
        # counts without an Observation.
        if meta_rows is not None:
            if stats_mode != "observe":
                raise ValueError("meta_rows requires stats_mode='observe'")
            meta = meta_rows
            n_dedup = n_deleted = None  # from the Observation, post-write
        elif stats_mode == "observe":
            meta = (
                events.select(
                    bucket_expr(self.key, self.n_buckets).alias("__bucket"),
                    F.col(self.ord_col),
                )
                .groupBy("__bucket")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.min(self.ord_col).alias("lmin"),
                    F.max(self.ord_col).alias("lmax"),
                )
                .collect()
            )
            n_dedup = n_deleted = None  # from the Observation, post-write
        else:
            per_key = (
                events.select(
                    bucket_expr(self.key, self.n_buckets).alias("__bucket"),
                    F.col(self.key),
                    F.col(self.ord_col),
                    F.col(op_col),
                )
                .groupBy("__bucket", self.key)
                .agg(
                    F.count(F.lit(1)).alias("kn"),
                    F.min(self.ord_col).alias("klmin"),
                    F.max(self.ord_col).alias("klmax"),
                    F.max_by(op_col, self.ord_col).alias("kop"),
                )
            )
            meta = (
                per_key.groupBy("__bucket")
                .agg(
                    F.sum("kn").alias("n"),
                    F.min("klmin").alias("lmin"),
                    F.max("klmax").alias("lmax"),
                    F.count(F.lit(1)).alias("n_keys"),
                    F.count(F.when(F.col("kop") == "delete", 1)).alias("n_del"),
                )
                .collect()
            )
            n_dedup = sum(r["n_keys"] for r in meta)
            n_deleted = sum(r["n_del"] for r in meta)
        touched = [int(r["__bucket"]) for r in meta]
        bucket_rows = {int(r["__bucket"]): int(r["n"]) for r in meta}
        rows_in_batch = sum(r["n"] for r in meta)
        lsn_min = int(min((r["lmin"] for r in meta), default=-1))
        lsn_max = int(max((r["lmax"] for r in meta), default=-1))
        phases["meta_ms"] = int((time.monotonic() - t0) * 1000)

        replayed = (
            lsn_max <= committed_lsn if guard == "lsn"
            else batch_id <= committed_batch
        ) or not meta
        if replayed:
            return MergeStats(batch_id, cur_version, lsn_min, lsn_max,
                              rows_in_batch, 0, 0, 0, 0,
                              int((time.monotonic() - t0) * 1000),
                              skipped_replay=True, phases=phases)

        if pre_reduce == "salted":
            from hyped_spark.operators.lww import lww_dedup_salted

            events = lww_dedup_salted(events, key=self.key, ord_col=self.ord_col)

        # ---- schema evolution (transactional: lands in the same commit).
        # __-prefixed columns are engine metadata, never table schema.
        incoming_schema = T.StructType(
            [f for f in events.schema.fields
             if f.name != op_col and not f.name.startswith("__")]
        )
        diff = diff_schemas(cur_schema, incoming_schema)
        new_schema = apply_diff(cur_schema, diff)
        schemas = list(commit["schemas"])
        if not diff.is_noop:
            schemas.append(new_schema.jsonValue())
        new_schema_id = len(schemas) - 1

        # ---- 2. the heavy job: merge in ONE shuffle + ONE local sort.
        #   union(raw events, touched-buckets' current rows)
        #     → repartition by bucket                (the ONLY payload shuffle)
        #     → window-rank LWW per (bucket, key)    (JVM: the bucket
        #       partitioning already satisfies the window's distribution —
        #       no second exchange — and Spark's WindowGroupLimit pushes
        #       rank≤1 into the sort, so losers are dropped DURING the sort)
        #     → transform (extraction, only rows missing text)
        #     → write partitionBy bucket             (no extra repartition —
        #       the merge shuffle already bucket-aligned the data)
        # Dedup, LWW resolve vs current, and bucket placement all ride that
        # single exchange. Tombstone winners persist (null payload, flag
        # set) so merges commute across batches.
        # Round 1 used sortWithinPartitions + a mapInPandas keep-first —
        # same plan shape, but it pushed every row's html payload through
        # Arrow→pandas→Arrow; the window rank keeps the payload JVM-side
        # and measured ~25% faster with better core scaling.
        tomb_field = T.StructField(_TOMBSTONE, T.BooleanType())
        src = align_to_schema(
            events.withColumn(_TOMBSTONE, F.col(op_col) == "delete"),
            T.StructType(new_schema.fields + [tomb_field]),
        ).withColumn("__src", F.lit(True))
        if merge_mode == "mor":
            # merge-on-read: only the batch flows — current rows are never
            # read or rewritten; the window below dedups the batch itself
            unioned = src
        else:
            # the fragment ordinal is only needed (and only carried through
            # the payload shuffle) when MOR fragments actually exist —
            # COW-only steady state pays nothing for the tie-break
            frag_ties = self._needs_resolve(commit)
            current = self._read_buckets(
                commit, touched, new_schema, with_file=frag_ties
            ).withColumn("__src", F.lit(False))
            if frag_ties:
                src = src.withColumn(_FRAG_ORD, F.lit(None).cast("long"))
            unioned = src.unionByName(current)
        unioned = unioned.withColumn(
            "__bucket", bucket_expr(self.key, self.n_buckets)
        )
        from pyspark.sql import Window

        n_parts = max(len(touched), 1)
        prepped = unioned.repartition(n_parts, F.col("__bucket"))
        # window partition keys lead with xxhash64(key): the generated sort
        # then compares an 8-byte long and touches the key string only on
        # hash ties (same key, effectively) — string-comparison sorts were
        # the worst-scaling stage in the microbenchmarks. Grouping is
        # unchanged (key determines its hash) and hashpartitioning(__bucket)
        # still satisfies the clustering (subset rule) — no extra exchange.
        # equal-ord tie-break is deterministic: the batch delivery beats a
        # carried row (__src desc), and among carried MOR fragments the
        # newest fragment ordinal wins (a COW bucket holds ≤1 row per key,
        # so carried-vs-carried ties only exist when fragments do)
        tie = [F.col("__src").desc()]
        if merge_mode != "mor" and frag_ties:
            tie.append(F.col(_FRAG_ORD).desc())
        w = Window.partitionBy(
            "__bucket", F.xxhash64(F.col(self.key)), self.key
        ).orderBy(F.col(self.ord_col).desc(), *tie)
        survivors = (
            prepped.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", _FRAG_ORD)
        )
        if transform is not None:
            survivors = transform(survivors)

        # ---- rewrite touched buckets under the new snapshot ----
        obs = None
        if stats_mode == "observe":
            from pyspark.sql import Observation

            obs = Observation(f"merge_{batch_id}")
            survivors = survivors.observe(
                obs,
                F.sum(F.when(F.col("__src"), 1).otherwise(0)).alias("n_batch_winners"),
                F.sum(
                    F.when(F.col("__src") & F.col(_TOMBSTONE), 1).otherwise(0)
                ).alias("n_batch_del"),
            )
        survivors = survivors.drop("__src")
        new_version = cur_version + 1
        rel = os.path.join(_DATA_DIR, f"snap{new_version:010d}")
        out_dir = os.path.join(self.path, rel)
        (
            survivors.write.mode("overwrite")
            .partitionBy("__bucket")
            .parquet(out_dir)
        )
        if obs is not None:
            vals = obs.get
            n_dedup = int(vals["n_batch_winners"] or 0)
            n_deleted = int(vals["n_batch_del"] or 0)
        n_upserted = n_dedup - n_deleted
        phases["heavy_ms"] = (
            int((time.monotonic() - t0) * 1000) - phases["meta_ms"]
        )

        # ---- manifest: COW replaces the touched buckets' fragments; MOR
        # appends the new fragment to each touched bucket's list. A COW
        # bucket with zero survivors (everything deleted) produces no
        # partition dir — it simply leaves the manifest (= empty bucket);
        # in MOR deletes are tombstone rows, so the dir always exists.
        buckets = dict(commit["buckets"])
        for b in touched:
            bucket_rel = os.path.join(rel, f"__bucket={b}")
            frag = {"path": bucket_rel, "schema_id": new_schema_id}
            if os.path.isdir(os.path.join(self.path, bucket_rel)):
                if merge_mode == "mor" and str(b) in buckets:
                    buckets[str(b)] = self._frags(buckets[str(b)]) + [frag]
                else:
                    buckets[str(b)] = frag
            elif merge_mode == "cow":
                buckets.pop(str(b), None)
        latency_ms = int((time.monotonic() - t0) * 1000)
        self._commit(new_version, {
            "snapshot_id": new_version,
            "parent": cur_version,
            "schemas": schemas,
            "buckets": buckets,
            "n_buckets": self.n_buckets,
            "key": self.key,
            "ord_col": self.ord_col,
            "summary": {
                "lsn_min": int(lsn_min),
                # high-watermarks stay monotone even if epochs arrive with
                # out-of-order LSN contents
                "lsn_max": max(int(lsn_max), committed_lsn),
                "batch_id": max(int(batch_id), committed_batch),
                "rows_in_batch": int(rows_in_batch),
                "rows_after_dedup": int(n_dedup),
                "rows_upserted": int(n_upserted),
                "rows_deleted": int(n_deleted),
                "buckets_touched": len(touched),
                "merge_latency_ms": latency_ms,
                "operation": "merge",
            },
        })
        phases["commit_ms"] = (
            int((time.monotonic() - t0) * 1000)
            - phases["meta_ms"] - phases["heavy_ms"]
        )
        return MergeStats(batch_id, new_version, int(lsn_min), int(lsn_max),
                          int(rows_in_batch), int(n_dedup), int(n_upserted),
                          int(n_deleted), len(touched), latency_ms,
                          bucket_rows=bucket_rows, phases=phases)

    def merge_batch(
        self,
        updates: DataFrame,
        batch_id: int,
        op_col: str = "op",
        guard: str = "lsn",
        stats_mode: str = "observe",
    ) -> MergeStats:
        """Alias of merge_events for already-deduped sources (≤1 row per
        key, e.g. a build_merge_source output). Identical semantics —
        merge_events' LWW resolve is a no-op on pre-deduped input; lineage
        lsn_min/rows_in_batch reflect the rows actually passed in."""
        return self.merge_events(
            updates, batch_id, guard=guard, op_col=op_col, stats_mode=stats_mode
        )
