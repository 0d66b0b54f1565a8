"""Snapshot-per-wave state store (SURVEY.md S10, C6; north_rule resume).

The reference checkpoints by saving its workbook after every keyword and on
crash (getRank.py:479, 426-430; getStockNumber.py:151-153) — bounded loss,
but no way to resume mid-run. Here every wave commits an **atomic snapshot**
in the Iceberg style: data files first, then a single manifest JSON whose
rename is the commit point. A crash loses at most the in-flight wave;
``latest_manifest`` + ``load`` give exact resume (tested in
tests/test_resume.py).

Layout under ``root``::

    frontier/wave=<n>/   full frontier snapshot at end of wave n
    shards/wave=<n>/     full Bloom shard snapshot
    seen/wave=<n>/       seen-set DELTA appended by wave n
    results/wave=<n>/    parsed result DELTA
    images/wave=<n>/     image+caption DELTA (input_hint schema)
    metrics/wave=<n>/    per-(wave, host_shard) fetch/parse metrics
    lineage/wave=<n>/    per-partition lineage rows
    _manifests/manifest-<n>.json   the commit records

Full-snapshot tables (frontier, shards) are read from the latest wave only;
delta tables are read as the union of all committed waves. At 10^10 scale
the shard snapshot would become per-bucket copy-on-write (only dirty buckets
rewritten) — same manifest mechanics, noted here for the scale path.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


def parquet_num_rows(path: str) -> int:
    """Row count of a parquet directory from file footers — metadata-only,
    no Spark job (the Iceberg-manifest analogue of snapshot row counts).
    Recursive: handles both flat and key=value-partitioned layouts."""
    import glob

    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )


def partitioned_counts(path: str) -> dict[tuple[str, ...], int]:
    """Row counts per key=value partition directory, from parquet footers
    only — driver-side, no Spark job. Keys are the ordered partition path
    segments, e.g. ('depth=1', 'host_shard=3'). Flat layouts yield {(): n}.
    This is the Iceberg-manifest analogue of per-partition row counts, and
    what makes the depth-pruned frontier dequeue free to plan."""
    import glob

    import pyarrow.parquet as pq

    out: dict[tuple[str, ...], int] = {}
    for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        rel = os.path.relpath(f, path)
        parts = tuple(p for p in rel.split(os.sep)[:-1] if "=" in p)
        out[parts] = out.get(parts, 0) + pq.ParquetFile(f).metadata.num_rows
    return out


SNAPSHOT_TABLES = ("frontier",)          # full snapshot, latest wave wins
COW_TABLES = ("shards",)                 # per-bucket copy-on-write versions
DELTA_TABLES = (
    "seen", "results", "quarantine", "seed_flags", "detail_results",
    "cart_results", "images", "metrics", "page_metrics", "lineage", "dead_letter",
)


class StateStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)

    # ------------------------------------------------------------- commit
    def commit_wave(
        self,
        wave: int,
        tables: dict[str, DataFrame | None],
        counters: dict[str, int],
        bases: frozenset[str] | set[str] = frozenset(),
        partition_cols: dict[str, tuple[str, ...]] | None = None,
    ) -> None:
        """Write all wave outputs, then atomically publish the manifest.

        The per-table writes are independent Spark jobs — submitting them
        from a thread pool overlaps their scheduling/IO latency (the wave
        loop's dominant fixed cost; each wave commits ~8 small tables).

        The frontier row count is recorded in the manifest counters from
        the written parquet FOOTERS (driver-side pyarrow, no Spark job) —
        it is the loop's stop condition, and a count() job per wave just
        for it was one of the larger per-wave fixed costs.
        """
        from concurrent.futures import ThreadPoolExecutor

        entry: dict = {
            "wave": wave,
            "tables": {},
            "counters": dict(counters),
            # bases: tables for which THIS wave's files are a full compacted
            # rewrite (delta-chain checkpoint) — loaders read from the most
            # recent base forward instead of the whole wave history
            "bases": sorted(bases),
            "committed_at": time.time(),
        }

        def write(item: tuple[str, DataFrame]) -> tuple[str, str]:
            name, df = item
            path = os.path.join(self.root, name, f"wave={wave}")
            w = df.write.mode("overwrite")
            pcols = (partition_cols or {}).get(name)
            if pcols:
                w = w.partitionBy(*pcols)
            w.parquet(path)
            return name, path

        todo = [(n, df) for n, df in tables.items() if df is not None]
        with ThreadPoolExecutor(max_workers=min(8, max(1, len(todo)))) as pool:
            for name, path in pool.map(write, todo):
                entry["tables"][name] = path
        if "frontier" in entry["tables"]:
            entry["counters"]["n_frontier"] = parquet_num_rows(entry["tables"]["frontier"])
        tmp = os.path.join(self.root, "_manifests", f".manifest-{wave}.tmp")
        final = os.path.join(self.root, "_manifests", f"manifest-{wave}.json")
        with open(tmp, "w") as f:
            json.dump(entry, f)
        os.rename(tmp, final)  # the commit point

    def counter(self, name: str):
        m = self.latest_manifest()
        return None if m is None else m["counters"].get(name)

    # ------------------------------------------------------------- resume
    def committed_waves(self) -> list[int]:
        mdir = os.path.join(self.root, "_manifests")
        waves = []
        for fn in os.listdir(mdir):
            if fn.startswith("manifest-") and fn.endswith(".json"):
                waves.append(int(fn[len("manifest-") : -len(".json")]))
        return sorted(waves)

    def latest_manifest(self) -> dict | None:
        waves = self.committed_waves()
        if not waves:
            return None
        with open(os.path.join(self.root, "_manifests", f"manifest-{waves[-1]}.json")) as f:
            return json.load(f)

    def _waves_as_of(self, as_of_wave: int | None) -> list[int]:
        waves = self.committed_waves()
        if as_of_wave is None:
            return waves
        return [w for w in waves if w <= as_of_wave]

    def load_snapshot(self, name: str, as_of_wave: int | None = None) -> DataFrame | None:
        """Committed full snapshot of ``name`` (frontier / shards) as of the
        given wave (Iceberg-style time travel; None = latest)."""
        for wave in reversed(self._waves_as_of(as_of_wave)):
            m = self._manifest(wave)
            if name in m["tables"]:
                return self.spark.read.parquet(self._check_live(m["tables"][name]))
        return None

    def load_shard_state(self, as_of_wave: int | None = None) -> DataFrame | None:
        """Copy-on-write Bloom shard state: each wave writes ONLY its dirty
        buckets (operators/bloom.py merge_into_shards dirty_only=True); the
        live state is the latest version of every bucket across waves. At
        Iceberg scale this is manifest-pruned to one file read per bucket;
        here it is a tiny union + max_by (n_buckets × waves short rows).
        ``as_of_wave`` time-travels to the state as committed at that wave."""
        from pyspark.sql import functions as F

        versioned: list[tuple[int, str]] = []
        for w in reversed(self._waves_as_of(as_of_wave)):
            m = self._manifest(w)
            if "shards" not in m["tables"]:
                continue
            versioned.append((w, self._check_live(m["tables"]["shards"])))
            if "shards" in m.get("bases", ()):
                break  # a base wave wrote every bucket — stop descending
        versioned.reverse()
        if not versioned:
            return None
        def _read(path: str) -> DataFrame:
            df = self.spark.read.parquet(path)
            if "keys" not in df.columns:
                # shard snapshots written before the exact-confirm key sets
                # existed (pre-r3 stores) lack the column — default it so
                # old checkpoints stay resumable (seen_table mode never
                # reads it; shard_sets mode needs a fresh store anyway)
                df = df.withColumn("keys", F.lit(b""))
            return df

        dfs = [_read(path).withColumn("_v", F.lit(w)) for w, path in versioned]
        u = dfs[0]
        for d in dfs[1:]:
            u = u.unionByName(d)
        latest = (
            u.groupBy("bucket")
            .agg(F.max_by(F.struct("bits", "n_items", "m_bits", "k", "keys"), "_v").alias("_s"))
            .select("bucket", "_s.*")
        )
        return latest

    def load_deltas(self, name: str, as_of_wave: int | None = None) -> DataFrame | None:
        """Union of committed deltas of ``name`` since (and including) the
        most recent compaction base — a base wave's files are the full
        cumulative table, so earlier waves are never read again.
        ``as_of_wave`` reads the table exactly as it stood after that wave's
        commit (snapshot time travel — by determinism, identical to what an
        interrupted run stopped at that wave would hold; tested)."""
        paths: list[str] = []
        for w in reversed(self._waves_as_of(as_of_wave)):
            m = self._manifest(w)
            if name not in m["tables"]:
                continue
            paths.append(self._check_live(m["tables"][name]))
            if name in m.get("bases", ()):
                break
        if not paths:
            return None
        return self.spark.read.parquet(*reversed(paths))

    def _manifest(self, wave: int) -> dict:
        with open(os.path.join(self.root, "_manifests", f"manifest-{wave}.json")) as f:
            return json.load(f)

    # -------------------------------------------------------- expiration
    def _expired_paths(self) -> set[str]:
        p = os.path.join(self.root, "_manifests", "expired.json")
        if not os.path.exists(p):
            return set()
        with open(p) as f:
            return set(json.load(f)["paths"])

    def _check_live(self, path: str) -> str:
        if path in self._expired_paths():
            raise ValueError(
                f"snapshot expired: {path} was removed by expire_snapshots(); "
                "time travel older than the retention horizon is gone"
            )
        return path

    def expire_snapshots(self, keep_last: int) -> dict:
        """Iceberg-style snapshot expiration: delete wave directories no
        longer REACHABLE from the last ``keep_last`` committed waves, by
        simulating exactly the loaders' path selection:

        * full-snapshot tables (frontier): each retained wave reads only
          its latest version — every older full rewrite is garbage. This
          is where a per-wave-rewritten 10^10-row frontier grows O(waves)
          disk without expiration.
        * COW / delta tables: chains stop at the most recent compaction
          base, so pre-base deltas of ``seen``/``shards``/``seed_flags``
          expire once a base is inside the retention window. Tables that
          never compact (results, images, metrics, lineage — their union
          IS the live table) keep every wave reachable and lose nothing.

        Manifests are kept (delta unions still need them); expired paths
        are tombstoned in ``_manifests/expired.json`` and any later time
        travel into them raises instead of reading missing files. Only
        paths referenced by SOME manifest are ever deleted — a crashed
        run's uncommitted in-flight wave directory is not touched (it is
        invisible to resume anyway). Run from the driver while no wave is
        committing.

        Returns ``{"deleted": [(table, wave), ...], "bytes_reclaimed": n,
        "retained_waves": [...]}``.
        """
        import shutil

        if keep_last < 1:
            raise ValueError(f"keep_last must be >= 1, got {keep_last}")
        waves = self.committed_waves()
        retained = waves[-keep_last:]
        referenced: set[str] = set()
        all_paths: dict[str, tuple[str, int]] = {}
        for w in waves:
            m = self._manifest(w)
            for name, path in m["tables"].items():
                all_paths[path] = (name, w)
        for name in SNAPSHOT_TABLES:
            for r in retained:
                for w in reversed([x for x in waves if x <= r]):
                    m = self._manifest(w)
                    if name in m["tables"]:
                        referenced.add(m["tables"][name])
                        break
        for name in COW_TABLES + DELTA_TABLES:
            for r in retained:
                for w in reversed([x for x in waves if x <= r]):
                    m = self._manifest(w)
                    if name not in m["tables"]:
                        continue
                    referenced.add(m["tables"][name])
                    if name in m.get("bases", ()):
                        break
        deleted: list[tuple[str, int]] = []
        bytes_reclaimed = 0
        expired = self._expired_paths()
        # conservative never-delete default: reachability above is computed
        # ONLY for table names in the three known lists — a table committed
        # under any other name (a future commit_wave addition, an external
        # caller) has no loader chain here, so treating it as unreferenced
        # would delete live data. Skip it instead.
        known = set(SNAPSHOT_TABLES) | set(COW_TABLES) | set(DELTA_TABLES)
        for path, (name, w) in sorted(all_paths.items()):
            if name not in known:
                continue
            if path in referenced or path in expired or not os.path.isdir(path):
                continue
            bytes_reclaimed += sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _dns, fns in os.walk(path)
                for f in fns
            )
            shutil.rmtree(path)
            deleted.append((name, w))
            expired.add(path)
        tmp = os.path.join(self.root, "_manifests", ".expired.tmp")
        with open(tmp, "w") as f:
            json.dump({"paths": sorted(expired)}, f)
        os.rename(tmp, os.path.join(self.root, "_manifests", "expired.json"))
        return {
            "deleted": deleted,
            "bytes_reclaimed": bytes_reclaimed,
            "retained_waves": retained,
        }

    # ---------------------------------------------------------- orphans
    def orphan_scan(self) -> dict:
        """Iceberg remove-orphan-files analog, SCAN phase: ``wave=*``
        directories on disk that NO committed manifest references — the
        residue of a crashed in-flight commit (``commit_wave`` writes the
        table directories first; the manifest rename is the commit point,
        so a crash between the two strands fully-written parquet that
        resume correctly ignores but nothing ever reclaims — at one wave
        per politeness epoch over 10^10 URLs that residue is real disk).

        Scan-only and side-effect free: returns ``{"orphans": [(table,
        path, bytes), ...], "bytes": n}``. Deletion is the separate
        :meth:`delete_orphans`, age-guarded so a commit IN PROGRESS
        (directories written, manifest not yet renamed) is never swept —
        the same two-phase discipline as ``expire_snapshots`` (which
        handles the complementary set: manifest-referenced but
        unreachable).
        """
        referenced = {
            path
            for w in self.committed_waves()
            for path in self._manifest(w)["tables"].values()
        }
        expired = self._expired_paths()
        orphans: list[tuple[str, str, int]] = []
        total = 0
        for entry in sorted(os.listdir(self.root)):
            tdir = os.path.join(self.root, entry)
            if entry == "_manifests" or not os.path.isdir(tdir):
                continue
            for wdir in sorted(os.listdir(tdir)):
                p = os.path.join(tdir, wdir)
                if not wdir.startswith("wave=") or not os.path.isdir(p):
                    continue
                if p in referenced or p in expired:
                    continue
                size = sum(
                    os.path.getsize(os.path.join(dp, f))
                    for dp, _dns, fns in os.walk(p)
                    for f in fns
                )
                orphans.append((entry, p, size))
                total += size
        return {"orphans": orphans, "bytes": total}

    def delete_orphans(self, min_age_s: float = 3600.0) -> dict:
        """Delete orphan wave directories older than ``min_age_s`` (by the
        NEWEST mtime under each directory — a directory still being
        written keeps refreshing it, so an in-flight commit can never look
        old enough to sweep). Returns ``{"deleted": [paths],
        "bytes_reclaimed": n, "skipped_young": [paths]}``. Run from the
        driver while no wave is committing, same as expire_snapshots."""
        import shutil

        scan = self.orphan_scan()
        now = time.time()
        deleted: list[str] = []
        skipped: list[str] = []
        reclaimed = 0
        for _table, path, size in scan["orphans"]:
            newest = max(
                (
                    os.path.getmtime(os.path.join(dp, f))
                    for dp, _dns, fns in os.walk(path)
                    for f in fns
                ),
                default=os.path.getmtime(path),
            )
            if now - newest < min_age_s:
                skipped.append(path)
                continue
            shutil.rmtree(path)
            deleted.append(path)
            reclaimed += size
        return {
            "deleted": deleted,
            "bytes_reclaimed": reclaimed,
            "skipped_young": skipped,
        }


def file_column_ranges(path: str, column: str) -> list[tuple[str, object, object, int]]:
    """Per-parquet-file (path, min, max, num_rows) for ``column`` from the
    footers only — no Spark job. Row-group statistics fold to file level
    (min of mins, max of maxes); a file whose footer carries NO statistics
    for the column reports ``(None, None)`` and the planner must read it
    (conservative). The Iceberg-manifest analogue of per-data-file column
    bounds — what turns a predicate into a file-skip plan before any
    executor spins up."""
    import glob

    import pyarrow.parquet as pq

    out: list[tuple[str, object, object, int]] = []
    for f in sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)):
        md = pq.ParquetFile(f).metadata
        try:
            idx = md.schema.names.index(column)
        except ValueError:
            out.append((f, None, None, md.num_rows))
            continue
        mins, maxs = [], []
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            mins.append(st.min)
            maxs.append(st.max)
        if ok and mins:
            out.append((f, min(mins), max(maxs), md.num_rows))
        else:
            out.append((f, None, None, md.num_rows))
    return out


def plan_file_skips(path: str, column: str, lo=None, hi=None) -> dict:
    """Scan plan for the predicate ``lo <= column <= hi`` over a parquet
    directory: which files the footer bounds PROVE irrelevant (their
    [min, max] range cannot intersect [lo, hi]) and which must be read.
    ``lo``/``hi`` of None are open ends. Files without statistics for the
    column are always read — skipping is only ever proof-backed.

    This is the planning half of the layout work ``zorder_layout`` does at
    write time: clustering writes by key makes per-file ranges disjoint,
    and THIS function is where that pays off — a point lookup over a
    range-clustered 10^10-row seen table opens one file's worth of pages
    instead of all of them. (Spark's own reader applies the same pruning
    from PushedFilters; exposing the plan makes the saving observable and
    testable, the way Iceberg's scan planning reports it.)

    Returns {"files": n, "read": [paths], "skipped": [paths],
    "rows_read": n, "rows_skipped": n}.
    """
    read: list[str] = []
    skipped: list[str] = []
    rows_read = rows_skipped = 0
    for f, mn, mx, n in file_column_ranges(path, column):
        prunable = mn is not None and (
            (hi is not None and mn > hi) or (lo is not None and mx < lo)
        )
        if prunable:
            skipped.append(f)
            rows_skipped += n
        else:
            read.append(f)
            rows_read += n
    return {
        "files": len(read) + len(skipped),
        "read": read,
        "skipped": skipped,
        "rows_read": rows_read,
        "rows_skipped": rows_skipped,
    }
