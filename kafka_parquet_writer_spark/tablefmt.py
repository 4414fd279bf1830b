"""Dependency-free Delta-shaped transaction-log table format.

The reference publishes files by tmp-write + rename and readers just
glob the directory (`KafkaProtoParquetWriter.java:236-241,362-380`);
the upsert sink (streaming/foreach_sink.py) upgraded that to whole-
snapshot versions. This module is the real table-format shape those
two approximate — the design Delta Lake / Iceberg standardized, built
only on parquet + JSON + POSIX atomic primitives:

- **Commit log.** `<dir>/_txlog/<version>.json`, one JSON action per
  line (`add` / `remove` / `meta` / `commit`). A version is claimed by
  `O_CREAT|O_EXCL` — the atomic point of every operation. Data files
  are staged first and are invisible until the log entry lands, so a
  crash mid-write leaves garbage bytes, never a corrupt table.
- **File-level operations.** Append adds files; nothing is rewritten.
  MERGE rewrites ONLY the files whose key range overlaps the batch
  (min/max stats are read from parquet footers at commit time) — on a
  100 TB table a trickle of late corrections touches a handful of
  files, not the table. Untouched `add` actions survive by reference.
- **Optimistic concurrency.** Two writers racing for version N: one
  wins the O_EXCL create, the loser re-reads the log and retries if
  its operation commutes (append, compact), or raises if it logically
  conflicts (overwrite, merge).
- **Snapshot isolation + time travel.** A reader resolves the live
  file set at a version and reads exactly those parquet paths;
  writers never mutate committed files. `read(version=)` is
  `VERSION AS OF`; `history()` is `DESCRIBE HISTORY`.
- **Log checkpoints.** Every `CHECKPOINT_EVERY` commits the full live
  set is rolled into `_checkpoint.<version>.json`, so snapshot
  resolution replays O(recent commits), not O(table lifetime).
- **Data skipping.** Per-file min/max stats make `read_where` prune
  non-overlapping files before Spark ever lists them — the same
  pruning MERGE uses for rewrites.
- **Idempotent streaming commits.** A `txn` action records
  (app, batch-id); replaying a crashed micro-batch sees its own txn
  already committed and no-ops (Delta's transactional writer dedup) —
  see streaming/foreach_sink.start_txlog_upsert_stream.

Object-store note: O_EXCL-create maps to conditional PUT
(if-none-match) on S3/GCS/ABFS — the same primitive Delta's commit
service uses; everything else is plain immutable-file I/O.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

LOG_SUBDIR = "_txlog"
DATA_SUBDIR = "data"
CHECKPOINT_EVERY = 10
_COMMUTING_OPS = {"append", "compact"}
#: MERGE partition-pruning guard: above this many distinct partition
#: tuples in one batch, skip partition pruning rather than collect an
#: unbounded driver-side list (stats pruning still applies)
MERGE_PRUNE_MAX_PARTS = 10_000


class ConcurrentWriteError(RuntimeError):
    """A non-commuting operation lost the race for its log version."""


def _min_max_stats(path: str, cols: list[str]) -> dict[str, list]:
    """Per-file [min, max] for ``cols`` from the parquet footer only
    (no data pages read). Columns without footer stats are omitted —
    absent stats mean "never prune this file on that column"."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out: dict[str, list] = {}
    for c in cols:
        if c not in idx:
            continue
        lo = hi = None
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[c]).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if ok and lo is not None:
            if hasattr(lo, "isoformat"):
                lo, hi = lo.isoformat(), hi.isoformat()
            out[c] = [lo, hi]
    return out


#: Z-order bucket resolution per column (2^bits equi-depth buckets)
ZORDER_BITS = 8


def _zorder_key(df: DataFrame, cols: list[str], bits: int = ZORDER_BITS):
    """Morton key column: interleave the bits of each column's
    equi-depth bucket rank. Equi-depth (quantile) buckets rather than
    uniform-width: skewed columns otherwise collapse into few buckets
    and lose their share of key bits.

    Per-row cost is a small fixed expression (array rank + bit
    shuffles); the only driver-side data is ``2^bits - 1`` boundary
    values per column from ``approxQuantile``."""
    n = 1 << bits
    buckets = []
    for c in cols:
        bounds = df.stat.approxQuantile(c, [i / n for i in range(1, n)], 0.01)
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        val = F.col(c).cast("double")
        buckets.append(
            F.size(F.filter(arr, lambda b: b <= val)).cast("long")
        )
    zkey = F.lit(0).cast("long")
    for i in range(bits):
        for ci, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            zkey = zkey + F.shiftleft(bit, i * len(cols) + ci)
    return zkey


class TxTable:
    """Handle on a transaction-log table rooted at ``table_dir``."""

    def __init__(self, table_dir: str):
        self.dir = table_dir
        self.log_dir = os.path.join(table_dir, LOG_SUBDIR)
        self.data_dir = os.path.join(table_dir, DATA_SUBDIR)

    # ---------- log plumbing ----------

    def _commit_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:012d}.json")

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        return sorted(
            int(n[:-5])
            for n in os.listdir(self.log_dir)
            if n.endswith(".json") and n[:-5].isdigit()
        )

    def exists(self) -> bool:
        return bool(self._versions())

    def latest_version(self) -> int:
        vs = self._versions()
        if not vs:
            raise FileNotFoundError(f"no tx table at {self.dir}")
        return vs[-1]

    def _checkpoint_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"_checkpoint.{version:012d}.json")

    def _latest_checkpoint(self, at_or_below: int) -> int | None:
        best = None
        if os.path.isdir(self.log_dir):
            for n in os.listdir(self.log_dir):
                if n.startswith("_checkpoint.") and n.endswith(".json"):
                    v = int(n[len("_checkpoint.") : -5])
                    if v <= at_or_below and (best is None or v > best):
                        best = v
        return best

    def _snapshot(self, version: int | None = None) -> dict:
        """Replay the log (from the nearest checkpoint) to ``version``.
        Returns {"files": {rel_path: add_action}, "schema": json_str,
        "partition_by": [...], "txns": {app: last_batch}, "version": v}."""
        v = self.latest_version() if version is None else version
        if v not in set(self._versions()):
            raise KeyError(
                f"version {v} not in log (have {self._versions()})"
            )
        files: dict[str, dict] = {}
        meta: dict = {}
        txns: dict[str, int] = {}
        start = 0
        ckpt = self._latest_checkpoint(v)
        if ckpt is not None:
            with open(self._checkpoint_path(ckpt)) as f:
                snap = json.load(f)
            files = dict(snap["files"])
            meta = dict(snap.get("meta") or {"schema": snap.get("schema")})
            txns = dict(snap.get("txns", {}))
            start = ckpt + 1
        for cv in range(start, v + 1):
            p = self._commit_path(cv)
            if not os.path.exists(p):  # racing writer claimed; not visible yet
                continue
            with open(p) as f:
                for line in f:
                    a = json.loads(line)
                    if "add" in a:
                        files[a["add"]["path"]] = a["add"]
                    elif "remove" in a:
                        files.pop(a["remove"]["path"], None)
                    elif "meta" in a:
                        meta = a["meta"]
                    elif "commit" in a:
                        t = a["commit"].get("txn")
                        if t:
                            txns[t["app"]] = t["batch"]
        return {"files": files, "schema": meta.get("schema"),
                "partition_by": meta.get("partition_by") or [],
                "meta": meta, "txns": txns, "version": v}

    def _try_commit(self, version: int, actions: list[dict]) -> bool:
        """Atomically claim ``version`` with O_EXCL. False if lost."""
        os.makedirs(self.log_dir, exist_ok=True)
        try:
            fd = os.open(
                self._commit_path(version),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            for a in actions:
                f.write(json.dumps(a) + "\n")
            f.flush()
            os.fsync(f.fileno())
        if version % CHECKPOINT_EVERY == 0 and version > 0:
            snap = self._snapshot(version)
            tmp = self._checkpoint_path(version) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {"files": snap["files"], "meta": snap["meta"],
                     "txns": snap["txns"]},
                    f,
                )
            os.replace(tmp, self._checkpoint_path(version))
        return True

    def _commit(
        self, op: str, actions: list[dict], base_version: int | None,
        txn: dict | None = None,
    ) -> int:
        """Commit ``actions`` as the next version. Commuting ops retry
        past racing writers; conflicting ops raise if the table moved
        beyond ``base_version``."""
        commit = {"commit": {"op": op}}
        if txn:
            commit["commit"]["txn"] = txn
        removes = {a["remove"]["path"] for a in actions if "remove" in a}
        while True:
            vs = self._versions()
            nxt = (vs[-1] + 1) if vs else 0
            if base_version is not None and nxt != base_version + 1:
                if op not in _COMMUTING_OPS:
                    raise ConcurrentWriteError(
                        f"{op} based on v{base_version} but table is at "
                        f"v{nxt - 1} — rerun on the current snapshot"
                    )
                # a commuting op still conflicts if a racing commit
                # removed a file it is rewriting (e.g. compact ∥ merge
                # on the same file would resurrect replaced rows)
                if removes and not removes <= set(
                    self._snapshot(nxt - 1)["files"]
                ):
                    raise ConcurrentWriteError(
                        f"{op} based on v{base_version}: a concurrent "
                        f"commit removed file(s) this op rewrites — "
                        f"rerun on the current snapshot"
                    )
            if self._try_commit(nxt, [commit] + actions):
                return nxt

    # ---------- data-file plumbing ----------

    def _stage(
        self, df: DataFrame, stats_cols: list[str],
        partition_by: list[str] | None = None,
    ) -> list[dict]:
        """Write ``df``'s data as immutable files under data/ and
        return their add-actions (not yet committed — invisible).

        With ``partition_by``, files keep their hive-style directory
        layout under data/ (so `basePath` reads reconstruct partition
        columns) AND record their partition values in the add action —
        partition pruning then happens at the LOG level, before any
        filesystem listing (the Delta model; directory layout is a
        readability nicety, the log is the source of truth)."""
        import pyarrow.parquet as pq

        os.makedirs(self.data_dir, exist_ok=True)
        stage = os.path.join(self.dir, f"_stage-{uuid.uuid4().hex}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(stage)
        adds = []
        for root, _, names in os.walk(stage):
            rel_dir = os.path.relpath(root, stage)
            pvals = {}
            if rel_dir != ".":
                for seg in rel_dir.split(os.sep):
                    if "=" in seg:
                        k, _, v = seg.partition("=")
                        pvals[k] = v
            for name in sorted(names):
                if not name.endswith(".parquet"):
                    continue
                src = os.path.join(root, name)
                nrows = pq.ParquetFile(src).metadata.num_rows
                if nrows == 0:  # empty partitions produce empty part files
                    continue
                final = f"{uuid.uuid4().hex}.parquet"
                rel = (
                    f"{DATA_SUBDIR}/{final}"
                    if rel_dir == "."
                    else f"{DATA_SUBDIR}/{rel_dir}/{final}"
                )
                dst = os.path.join(self.dir, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                nbytes = os.path.getsize(src)
                stats = _min_max_stats(src, stats_cols)
                os.replace(src, dst)
                add = {"path": rel, "rows": nrows, "bytes": nbytes,
                       "stats": stats}
                if pvals:
                    add["partition_values"] = pvals
                adds.append({"add": add})
        shutil.rmtree(stage, ignore_errors=True)
        return adds

    def _abs(self, snap: dict, rel: str) -> str:
        """Physical location of a live file: its own data/ dir, or the
        absolute source path recorded by a shallow clone()."""
        add = snap["files"][rel]
        return add.get("abs") or os.path.join(self.dir, rel)

    def _paths(self, snap: dict) -> list[str]:
        return [self._abs(snap, p) for p in snap["files"]]

    # ---------- public surface ----------

    def create(
        self, df: DataFrame, stats_cols: list[str] | None = None,
        partition_by: list[str] | None = None,
    ) -> int:
        """Create the table (version 0) from ``df``. ``partition_by``
        fixes the table's partition columns for life (every later
        write re-uses them from the meta action)."""
        if os.path.isdir(self.log_dir) and self._versions():
            raise FileExistsError(f"tx table already exists at {self.dir}")
        stats_cols = stats_cols or df.columns
        actions = [{"meta": {"schema": df.schema.json(),
                             "stats_cols": stats_cols,
                             "partition_by": partition_by or []}}]
        actions += self._stage(df, stats_cols, partition_by)
        return self._commit("create", actions, base_version=None)

    def _stats_cols(self, snap: dict) -> list[str]:
        schema = StructType.fromJson(json.loads(snap["schema"]))
        return [f.name for f in schema.fields]

    def append(
        self, df: DataFrame, txn: dict | None = None,
        merge_schema: bool = False,
    ) -> int:
        """Add files; nothing rewritten. Commutes with other appends.

        ``merge_schema=True`` allows ADDITIVE evolution: new nullable
        columns in ``df`` extend the table schema via a fresh meta
        action in the same commit; committed files never rewrite —
        schema-on-read fills the column with null for old files (the
        Delta `mergeSchema` contract). Dropping or retyping an existing
        column is refused either way: that would silently corrupt
        old-file reads.
        """
        snap = self._snapshot()
        stored = StructType.fromJson(json.loads(snap["schema"]))
        have = {f.name: f.dataType for f in stored.fields}
        extra = [f for f in df.schema.fields if f.name not in have]
        retyped = [
            f.name for f in df.schema.fields
            if f.name in have and f.dataType != have[f.name]
        ]
        if retyped:
            raise ValueError(
                f"append: column type change for {retyped} — evolution "
                f"is additive-only (rewrite via overwrite instead)"
            )
        actions: list[dict] = []
        if extra:
            if not merge_schema:
                raise ValueError(
                    f"append: new columns {[f.name for f in extra]} — "
                    f"pass merge_schema=True to evolve the table schema"
                )
            merged = StructType(stored.fields + extra)
            meta = dict(snap["meta"])
            meta["schema"] = merged.json()
            actions.append({"meta": meta})
            # schema evolution must not race anything: treat this
            # append as conflicting (exact base required)
            adds = self._stage(df, [f.name for f in merged.fields],
                               snap["partition_by"])
            return self._commit(
                "append_evolve", actions + adds, snap["version"], txn=txn
            )
        adds = self._stage(df, self._stats_cols(snap), snap["partition_by"])
        return self._commit("append", adds, snap["version"], txn=txn)

    def overwrite(self, df: DataFrame) -> int:
        """Replace the whole table contents (schema kept from meta)."""
        snap = self._snapshot()
        actions = self._stage(df, self._stats_cols(snap), snap["partition_by"])
        actions += [{"remove": {"path": p}} for p in snap["files"]]
        return self._commit("overwrite", actions, snap["version"])

    def _read_paths(
        self, spark: SparkSession, snap: dict, paths: list[str]
    ) -> DataFrame:
        schema = StructType.fromJson(json.loads(snap["schema"]))
        if not paths:
            return spark.createDataFrame([], schema)
        # shallow-clone hazard check: absolute references into another
        # table's data/ dir can dangle if the SOURCE was vacuum()ed past
        # the clone point — fail with the contract message instead of
        # Spark's generic path error (or, worse, a partial read). Only
        # foreign paths pay the existence probe; own-dir files are
        # governed by our own log.
        own_prefix = self.dir + os.sep
        dangling = [
            p for p in paths
            if not p.startswith(own_prefix) and not os.path.exists(p)
        ]
        if dangling:
            raise FileNotFoundError(
                f"{len(dangling)} cloned file reference(s) missing "
                f"(first: {dangling[0]}) — the source table was likely "
                "vacuum()ed past the clone point; re-clone, or compact() "
                "the clone before the source's retention horizon passes"
            )
        if snap["partition_by"]:
            # hive layout under a data/ root reconstructs partition
            # columns. A shallow clone's files live under the SOURCE
            # table's data/ root, and a clone that has been appended to
            # mixes that root with its own — Spark accepts exactly one
            # basePath per read, so group paths by data root and union
            # the per-root reads (schemas are identical by construction;
            # partition columns reconstruct per-root). rsplit: below a
            # table's data/ root only key=value segments exist, so the
            # LAST '/data/' is always the table's own data dir even when
            # an ancestor directory is itself named data/.
            sep = os.sep + DATA_SUBDIR + os.sep
            groups: dict[str, list[str]] = {}
            for p in paths:
                base = (
                    p.rsplit(sep, 1)[0] + os.sep + DATA_SUBDIR
                    if sep in p else self.data_dir
                )
                groups.setdefault(base, []).append(p)
            parts = [
                spark.read.schema(schema).option("basePath", b).parquet(*ps)
                for b, ps in sorted(groups.items())
            ]
            df = parts[0]
            for extra in parts[1:]:
                df = df.unionByName(extra)
            return df
        return spark.read.schema(schema).parquet(*paths)

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot read; ``version`` = time travel (VERSION AS OF)."""
        snap = self._snapshot(version)
        return self._read_paths(spark, snap, self._paths(snap))

    def candidate_files(self, snap: dict, col: str, lo, hi) -> list[str]:
        """Live files whose [min,max] for ``col`` intersects [lo,hi];
        files without stats for ``col`` are always candidates."""
        out = []
        for p, add in snap["files"].items():
            st = add.get("stats", {}).get(col)
            if st is None or not (st[1] < lo or st[0] > hi):
                out.append(p)
        return out

    def partition_candidates(self, snap: dict, equals: dict) -> list[str]:
        """Log-level partition pruning: live files whose partition
        values match every (col → value) in ``equals``. Values compare
        as hive directory strings (str(value)); files without the
        column recorded are conservatively kept."""
        want = {k: str(v) for k, v in equals.items()}
        out = []
        for p, add in snap["files"].items():
            pv = add.get("partition_values", {})
            if all(k not in pv or pv[k] == v for k, v in want.items()):
                out.append(p)
        return out

    def read_partition(
        self, spark: SparkSession, equals: dict,
        version: int | None = None,
    ) -> DataFrame:
        """Equality read over partition columns, pruned from the LOG
        (no directory listing): the file set is resolved before Spark
        sees a single path — the Delta/Iceberg partition-pruning model
        rather than Spark's directory discovery."""
        snap = self._snapshot(version)
        cand = self.partition_candidates(snap, equals)
        df = self._read_paths(
            spark, snap, [self._abs(snap, p) for p in cand]
        )
        for k, v in equals.items():
            df = df.filter(F.col(k) == v)
        return df

    def read_where(
        self, spark: SparkSession, col: str, lo, hi,
        version: int | None = None,
    ) -> DataFrame:
        """Range read with file-level data skipping: only footer-
        overlapping files are handed to Spark (row-level filtering
        still applies within them — pruning is a superset guarantee).
        """
        snap = self._snapshot(version)
        cand = self.candidate_files(snap, col, lo, hi)
        df = self._read_paths(
            spark, snap, [self._abs(snap, p) for p in cand]
        )
        return df.filter((F.col(col) >= lo) & (F.col(col) <= hi))

    def merge(
        self, spark: SparkSession, updates: DataFrame, keys: list[str],
        order_col: str | None = None, txn: dict | None = None,
    ) -> int:
        """Delta-style MERGE (upsert by key) with file pruning: only
        files whose primary-key range overlaps the batch are rewritten;
        every other file survives by reference. At 100 TB this is the
        difference between touching ~GBs and rewriting the table.

        Winner per key: the updates side, then greatest ``order_col``
        (same contract as streaming/maintenance.upsert_parquet).
        """
        from pyspark.sql.window import Window

        snap = self._snapshot()
        pk = keys[0]  # prune on the leading key; extra keys filter rows
        bounds = updates.agg(
            F.min(pk).alias("lo"), F.max(pk).alias("hi")
        ).collect()[0]
        if bounds["lo"] is None:  # empty batch: record the txn, change nothing
            return self._commit("merge", [], snap["version"], txn=txn)
        lo, hi = bounds["lo"], bounds["hi"]
        if hasattr(lo, "isoformat"):
            lo, hi = lo.isoformat(), hi.isoformat()
        touched = self.candidate_files(snap, pk, lo, hi)

        # partition pruning stacks on stats pruning when the partition
        # columns are part of the merge key: a file in a partition the
        # batch never writes cannot hold any batch key. The distinct
        # partition tuples of a micro-batch are few by construction
        # (that is what partitioning means) — but that is a property of
        # the WORKLOAD, not a guarantee, so the collect is hard-bounded:
        # a pathological batch touching more than MERGE_PRUNE_MAX_PARTS
        # partitions skips partition pruning (stats pruning above still
        # applies; pruning is an optimization, never a correctness
        # requirement) instead of materializing an unbounded driver-side
        # list at 100 TB.
        pby = snap["partition_by"]
        if pby and set(pby) <= set(keys) and touched:
            sample = (
                updates.select(*pby)
                .distinct()
                .limit(MERGE_PRUNE_MAX_PARTS + 1)
                .collect()
            )
            if len(sample) > MERGE_PRUNE_MAX_PARTS:
                import warnings

                warnings.warn(
                    f"merge batch touches > {MERGE_PRUNE_MAX_PARTS} "
                    "partitions; skipping partition pruning (stats "
                    "pruning still applied)",
                    stacklevel=2,
                )
            else:
                tuples = {
                    tuple(str(r[c]) for c in pby) for r in sample
                }
                touched = [
                    t for t in touched
                    if tuple(
                        snap["files"][t].get("partition_values", {}).get(c)
                        for c in pby
                    ) in tuples
                    or not snap["files"][t].get("partition_values")
                ]

        upd = updates.withColumn("_src", F.lit(1))
        if touched:
            old = self._read_paths(
                spark, snap, [self._abs(snap, p) for p in touched]
            ).withColumn("_src", F.lit(0))
            merged = upd.unionByName(old)
        else:
            merged = upd
        order = [F.col("_src").desc()]
        if order_col is not None:
            order.append(F.col(order_col).desc())
        w = Window.partitionBy(*keys).orderBy(*order)
        result = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_src")
        )
        actions = self._stage(result, self._stats_cols(snap), pby)
        actions += [{"remove": {"path": p}} for p in touched]
        return self._commit("merge", actions, snap["version"], txn=txn)

    def compact(
        self, spark: SparkSession, max_file_bytes: int = 64 << 20,
        cluster_by: list[str] | None = None, n_files: int | None = None,
        zorder: bool = False,
    ) -> int:
        """OPTIMIZE: rewrite files smaller than ``max_file_bytes`` into
        few right-sized ones. Commutes with appends (acts only on files
        it read; a racing append's files are untouched).

        ``cluster_by`` additionally range-sorts the rewritten rows
        before writing (the OPTIMIZE ZORDER analogue, linear order for
        the common single-column case): clustered files get narrow,
        disjoint min/max ranges, so the SAME stats make `read_where`
        and MERGE prune far more files. Unclustered appends arrive with
        overlapping ranges; periodic clustered compaction is what keeps
        data skipping effective on a long-lived 100 TB table.

        ``zorder=True`` with ≥2 numeric ``cluster_by`` columns replaces
        linear ordering with a Z-order (Morton) curve over equi-depth
        bucket ranks: bits of the per-column buckets are interleaved
        into one key, so EVERY clustered column gets narrow per-file
        ranges instead of only the leading one. Linear clustering on
        (x, y) prunes x-predicates but leaves every file spanning all
        of y; Z-order prunes both — the difference between touching
        √F and F files on the non-leading dimension of a 100 TB table.
        Bucket boundaries come from `approxQuantile` (driver receives
        only the boundary values — bounded, never data-sized)."""
        snap = self._snapshot()
        small = [
            p for p, a in snap["files"].items() if a["bytes"] < max_file_bytes
        ]
        if len(small) < 2:
            return snap["version"]
        total = sum(snap["files"][p]["bytes"] for p in small)
        n_out = n_files or max(1, total // max_file_bytes)
        df = self._read_paths(
            spark, snap, [self._abs(snap, p) for p in small]
        )
        if cluster_by and zorder and len(cluster_by) >= 2:
            df = (
                df.withColumn("_zkey", _zorder_key(df, cluster_by))
                .repartitionByRange(int(n_out), "_zkey")
                .sortWithinPartitions("_zkey")
                .drop("_zkey")
            )
        elif cluster_by:
            # repartitionByRange gives each output file a disjoint key
            # range (sortWithinPartitions alone would leave every file
            # spanning the whole key space)
            df = df.repartitionByRange(
                int(n_out), *cluster_by
            ).sortWithinPartitions(*cluster_by)
        else:
            df = df.coalesce(int(n_out))
        actions = self._stage(df, self._stats_cols(snap), snap["partition_by"])
        actions += [{"remove": {"path": p}} for p in small]
        return self._commit("compact", actions, snap["version"])

    def clone(self, target_dir: str) -> "TxTable":
        """Shallow (zero-copy) CLONE: create a NEW table whose version-0
        commit references this table's current live files by absolute
        path — no data copied, so cloning a 100 TB table is a
        metadata-only operation. The clone then evolves independently:
        appends/merges/compactions write under ITS data/ dir and only
        drop references to source files, never touch them; its vacuum
        walks only its own data/ dir, so source bytes are never
        deleted by the clone.

        Hazard (same contract as Delta shallow clones): VACUUM on the
        SOURCE can delete files the clone still references — pin the
        source's retention or `compact()` the clone to localize its
        files when it must outlive the source's horizon. Cloning a
        clone re-resolves absolute paths, so chains don't deepen.
        """
        snap = self._snapshot()
        t = TxTable(target_dir)
        if t.exists():
            raise FileExistsError(f"tx table already exists at {target_dir}")
        actions: list[dict] = [{"meta": dict(snap["meta"])}]
        for rel, add in snap["files"].items():
            a = dict(add)
            a["abs"] = os.path.abspath(self._abs(snap, rel))
            actions.append({"add": a})
        t._commit("clone", actions, base_version=None)
        return t

    def last_txn_batch(self, app: str) -> int | None:
        """Highest batch id committed by ``app`` (idempotence probe)."""
        try:
            return self._snapshot().get("txns", {}).get(app)
        except FileNotFoundError:
            return None

    def history(self) -> list[dict]:
        """Commit metadata per version, ascending (DESCRIBE HISTORY)."""
        out = []
        for v in self._versions():
            with open(self._commit_path(v)) as f:
                first = json.loads(f.readline())
            info = dict(first.get("commit", {}))
            info["version"] = v
            out.append(info)
        return out

    def vacuum(self, retain_versions: int = 2) -> list[str]:
        """Delete data files unreferenced by every retained snapshot,
        then drop the log entries older than the horizon (their
        snapshots become unreadable — that is the retention contract).
        Never touches files live in any retained version."""
        vs = self._versions()
        keep = vs[-retain_versions:] if retain_versions > 0 else vs[-1:]
        live: set[str] = set()
        for v in keep:
            live |= set(self._snapshot(v)["files"])
        removed = []
        if os.path.isdir(self.data_dir):
            for root, dirs, names in os.walk(self.data_dir, topdown=False):
                for name in names:
                    full = os.path.join(root, name)
                    rel = os.path.relpath(full, self.dir)
                    if rel not in live:
                        os.unlink(full)
                        removed.append(rel)
                if root != self.data_dir and not os.listdir(root):
                    os.rmdir(root)
        # horizon: rewrite a checkpoint at the oldest kept version so
        # replay never needs the dropped commits
        oldest = keep[0]
        if not os.path.exists(self._checkpoint_path(oldest)):
            snap = self._snapshot(oldest)
            tmp = self._checkpoint_path(oldest) + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"files": snap["files"], "meta": snap["meta"],
                           "txns": snap["txns"]}, f)
            os.replace(tmp, self._checkpoint_path(oldest))
        for v in vs:
            if v < oldest:
                os.unlink(self._commit_path(v))
        for name in os.listdir(self.log_dir):
            if name.startswith("_checkpoint."):
                cv = int(name[len("_checkpoint.") : -5])
                if cv < oldest:
                    os.unlink(os.path.join(self.log_dir, name))
        return removed
