"""Workspace catalog: a JSON manifest over hive-partitioned Parquet.

The reference keeps a DuckLake SQLite catalog (tables, columns, data
files, partition values, snapshots — reference:
internal/database/duck_db.go:270-291, partition_key.go:40-64). Here the
same roles are played by:

- directory layout ``data/<table>/tp_partition=…/tp_index=…/tp_year=…/
  tp_month=…/*.parquet`` (self-describing, Spark-native partition
  discovery and pruning)
- ``metadata/manifest.json``: table schemas + snapshot log
- parquet footers: per-file row counts / min-max stats (A30)

Single-writer discipline per workspace (the reference runs one DuckDB
connection; we serialize manifest writes with an atomic rename).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

PARTITION_COLS = ("tp_partition", "tp_index", "tp_year", "tp_month")


def _footer_jsonable(v):
    import datetime as _dt
    from datetime import timezone

    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("utf-8", "replace")
    if isinstance(v, (int, float, str, bool)):
        return v
    return None  # unindexable type -> treated as no-stats


class FooterInfo:
    """Parquet footer metadata behind one tolerant reader.

    pyarrow is the primary backend; when it cannot parse the footer at
    all — a logical type newer than the installed pyarrow, concretely
    VARIANT written by Spark for ``json``-typed table columns (pyarrow
    <18 raises ``OSError: Thrift LogicalType that is not recognized``
    for the WHOLE file) — the same num_rows + per-column min/max/nulls
    are read through DuckDB's ``parquet_metadata()`` at the same
    O(footer) cost. Raw stat values keep pyarrow's types (tz-aware UTC
    datetimes for timestamps, int/float/str otherwise) so compaction's
    datetime arithmetic and the file index see one representation
    regardless of backend.

    String-stat caveat (r13 verdict): parquet writers may store
    TRUNCATED min/max for long BYTE_ARRAY values (a prefix with the
    last byte bumped for max). Both backends surface the same truncated
    footer values so backend parity holds, but consumers must treat
    string stats as RANGE bounds only — never exact-equality prune on
    them. Today's consumers (compaction time arithmetic, tp_timestamp
    file index) touch only numeric/temporal stats, which parquet never
    truncates."""

    def __init__(self, path: str):
        try:
            import pyarrow.parquet as pq

            md = pq.read_metadata(path)
            self.num_rows = md.num_rows
            self._md = md
            self._duck = None
        except OSError:
            self._md = None
            self.num_rows, self._duck = _duck_footer(path)

    def col_stats(self, name: str):
        """(min, max, null_count) raw-typed for one top-level column
        across all row groups, or None when any row group lacks usable
        stats (a stat-less group poisons the file — a partial range
        would under-report overlaps)."""
        if self._md is None:
            return self._duck.get(name)
        md = self._md
        lo = hi = None
        nulls = 0
        for rg in range(md.num_row_groups):
            group = md.row_group(rg)
            col = next(
                (
                    group.column(i)
                    for i in range(group.num_columns)
                    if group.column(i).path_in_schema == name
                ),
                None,
            )
            stats = col.statistics if col is not None else None
            if stats is None or not stats.has_min_max:
                return None
            nulls += stats.null_count or 0
            mn, mx = stats.min, stats.max
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
        return lo, hi, int(nulls)


def _duck_stat_value(physical_type: str, s: str):
    """One DuckDB-rendered stat string back to pyarrow's raw type,
    keyed by the parquet PHYSICAL type (unambiguous, carried in the
    same metadata row). Raises ValueError on anything unconvertible."""
    import datetime as _dt

    if physical_type in ("INT32", "INT64"):
        try:
            return int(s)
        except ValueError:
            # logical DATE renders as "YYYY-MM-DD" (pyarrow returns
            # datetime.date there), logical TIMESTAMP as a full
            # timestamp string (pyarrow returns datetime.datetime).
            # HEURISTIC SCOPE (r13 verdict): the length-10 key is sound
            # only because DATE and TIMESTAMP are the engine's ONLY
            # logical types riding INT32/64 — a future logical TIME
            # ("HH:MM:SS.ffffff" can be 10 chars) or decimal-on-int
            # rendering would misparse here; extend the branch when
            # adding such a type, don't rely on the fallthrough.
            s = str(s)
            if len(s) == 10:
                return _dt.date.fromisoformat(s)
            return _dt.datetime.fromisoformat(s)
    if physical_type in ("FLOAT", "DOUBLE"):
        return float(s)
    if physical_type == "BOOLEAN":
        return str(s).lower() == "true"
    if physical_type == "INT96":
        return _dt.datetime.fromisoformat(str(s))
    return str(s)  # BYTE_ARRAY / FIXED_LEN_BYTE_ARRAY: UTF8 rendering


def _duck_footer(path: str):
    """(num_rows, {column: (min, max, nulls) | None}) via DuckDB.

    Only TOP-LEVEL leaf columns get stats (a shredded variant's
    subcolumn paths contain ', ' and never match a column name — their
    stats are meaningless for file skipping anyway)."""
    import duckdb

    con = duckdb.connect()
    try:
        n_rows, n_groups = con.execute(
            "SELECT num_rows, num_row_groups FROM parquet_file_metadata(?)",
            [path],
        ).fetchone()
        rows = con.execute(
            "SELECT path_in_schema, type, stats_min_value, stats_max_value,"
            " stats_null_count FROM parquet_metadata(?)",
            [path],
        ).fetchall()
    finally:
        con.close()
    per_col: dict[str, list] = {}
    for name, typ, mn, mx, nc in rows:
        per_col.setdefault(name, []).append((typ, mn, mx, nc))
    stats: dict[str, tuple | None] = {}
    for name, groups in per_col.items():
        if len(groups) < int(n_groups):
            stats[name] = None
            continue
        lo = hi = None
        nulls = 0
        ok = True
        for typ, mn, mx, nc in groups:
            if mn is None or mx is None:
                ok = False
                break
            try:
                mn, mx = _duck_stat_value(typ, mn), _duck_stat_value(typ, mx)
            except (ValueError, TypeError):
                ok = False
                break
            nulls += int(nc or 0)
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
        stats[name] = (lo, hi, nulls) if ok else None
    return int(n_rows), stats


def _footer_col_stats(md: "FooterInfo", name: str):
    """JSON-able min/max/null_count for the file index, or None."""
    raw = md.col_stats(name)
    if raw is None:
        return None
    jlo, jhi = _footer_jsonable(raw[0]), _footer_jsonable(raw[1])
    if jlo is None or jhi is None:
        return None
    return {"min": jlo, "max": jhi, "nulls": raw[2]}



@dataclass
class TableEntry:
    name: str
    type_strings: dict[str, str]  # column → engine type string
    created_at: float = field(default_factory=time.time)


class Catalog:
    def __init__(self, workspace: str):
        self.workspace = workspace
        os.makedirs(self.metadata_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)
        self.cleanup_staging()

    # --- paths ---
    @property
    def data_dir(self) -> str:
        return os.path.join(self.workspace, "data")

    @property
    def metadata_dir(self) -> str:
        return os.path.join(self.workspace, "metadata")

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.metadata_dir, "manifest.json")

    def table_dir(self, table: str) -> str:
        return os.path.join(self.data_dir, table)

    def state_path(self, table: str, partition: str) -> str:
        return os.path.join(self.metadata_dir, f"state_{table}.{partition}.json")

    @property
    def staging_dir(self) -> str:
        """Scratch area for rewrite jobs (compaction, range delete).

        Lives OUTSIDE ``data/``: Spark's file listing is extension- and
        suffix-blind, so any tmp output inside a table tree would be
        scanned as data (and ``tp_month=8.tmp`` breaks partition-key
        parsing). A crash mid-rewrite leaves droppings here, not in the
        table; they are swept on the next Catalog open."""
        return os.path.join(self.workspace, "staging")

    def new_staging_dir(self, hint: str) -> str:
        os.makedirs(self.staging_dir, exist_ok=True)
        d = os.path.join(
            self.staging_dir, f"{hint}.{int(time.time() * 1000)}.{os.getpid()}"
        )
        os.makedirs(d)
        return d

    #: staging dirs older than this are crash droppings; younger ones
    #: may belong to a live rewrite in another process (a `query` must
    #: not sweep the staging of a concurrent `compact`)
    STAGING_TTL_SECONDS = 24 * 3600

    def cleanup_staging(self, ttl_seconds: int | None = None) -> None:
        ttl = self.STAGING_TTL_SECONDS if ttl_seconds is None else ttl_seconds
        if not os.path.isdir(self.staging_dir):
            return
        cutoff = time.time() - ttl
        for name in os.listdir(self.staging_dir):
            p = os.path.join(self.staging_dir, name)
            try:
                if os.path.getmtime(p) < cutoff:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                continue

    # --- single-writer discipline ---
    def writer_lock(self, owner: str):
        """Reentrant single-writer section for this workspace's
        metadata — the batch twin of streaming/rollup.py's pidfile+
        flock discipline (shared protocol: tailpipe_spark.locking).
        The reference is single-writer by construction
        (SetMaxOpenConns(1), duck_db.go:62-63); the Spark engine's
        manifest is read-modify-write JSON, so two concurrent
        ``collect``/``compact`` runs on one workspace could lose an
        update. Mutating verbs take this lock for their run: a second
        LIVE writer is refused loudly (RuntimeError), a stale lock
        from a crashed writer is stolen, and nesting (collect →
        post-collect compaction) re-enters without deadlock."""
        from tailpipe_spark.locking import writer_lock

        return writer_lock(os.path.join(self.metadata_dir, "writer.lock"), owner)

    # --- manifest ---
    def _load(self) -> dict:
        if not os.path.exists(self.manifest_path):
            return {"tables": {}, "snapshots": []}
        with open(self.manifest_path) as f:
            return json.load(f)

    def _store(self, manifest: dict) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path)  # atomic on POSIX

    def ensure_table(self, name: str, type_strings: dict[str, str]) -> None:
        """Create-table-if-not-exists (A15). Existing tables must match
        (schema evolution is an error — SURVEY.md §1.4)."""
        m = self._load()
        existing = m["tables"].get(name)
        if existing is None:
            m["tables"][name] = {
                "type_strings": type_strings,
                "created_at": time.time(),
            }
            self._store(m)
            os.makedirs(self.table_dir(name), exist_ok=True)
            return
        if existing["type_strings"] != type_strings:
            from tailpipe_spark.schema import SchemaChangeError

            changes = {
                c: (existing["type_strings"].get(c, "<absent>"), t)
                for c, t in type_strings.items()
                if existing["type_strings"].get(c) != t
            }
            raise SchemaChangeError(changes)

    def list_tables(self) -> list[str]:
        """A28."""
        return sorted(self._load()["tables"])

    def table_schema(self, name: str) -> dict[str, str]:
        """A29: column → engine type string."""
        t = self._load()["tables"].get(name)
        if t is None:
            raise KeyError(f"table {name!r} does not exist")
        return dict(t["type_strings"])

    def table_schemas(self) -> dict[str, dict[str, str]]:
        """Every table's column→type map in ONE manifest read (shell
        completion calls this per keystroke)."""
        return {
            name: dict(t["type_strings"])
            for name, t in self._load()["tables"].items()
        }

    def record_snapshot(self, op: str, detail: dict | None = None) -> int:
        m = self._load()
        snap_id = len(m["snapshots"]) + 1
        m["snapshots"].append(
            {"id": snap_id, "op": op, "ts": time.time(), **(detail or {})}
        )
        self._store(m)
        return snap_id

    def expire_snapshots(self, keep_latest: int = 1) -> int:
        """A26: all-but-latest snapshot expiry (metadata only — data GC
        is the compactor's merge/delete)."""
        m = self._load()
        n = max(0, len(m["snapshots"]) - keep_latest)
        m["snapshots"] = m["snapshots"][len(m["snapshots"]) - keep_latest :]
        self._store(m)
        return n

    def set_table_layout(
        self,
        name: str,
        bucket_by: list[str],
        num_buckets: int,
        sort_by: list[str] | None = None,
    ) -> int:
        """Record a bucketed physical layout for ``name`` in the
        manifest (the compactor writes the files; this is the metadata
        half). ``layout_rev`` bumps every rewrite so readers can tell a
        stale session-catalog registration from the current files."""
        m = self._load()
        if name not in m["tables"]:
            raise KeyError(f"table {name!r} does not exist")
        t = m["tables"][name]
        rev = int(t.get("layout", {}).get("layout_rev", 0)) + 1
        t["layout"] = {
            "bucket_by": list(bucket_by),
            "num_buckets": int(num_buckets),
            "sort_by": list(sort_by or bucket_by),
            "layout_rev": rev,
        }
        self._store(m)
        return rev

    def table_layout(self, name: str) -> dict | None:
        """The recorded bucketed layout, or None for plain layout."""
        t = self._load()["tables"].get(name)
        return None if t is None else t.get("layout")

    def row_count(self, name: str) -> int:
        """Exact table row count WITHOUT a Spark job: sum of per-file
        parquet footer counts, served from the manifest file index when
        fresh (zero reads) and from a driver-side footer walk otherwise
        (O(files) metadata reads, no data). Operators that take a
        ``corpus_size``-style hint (dedup.ngram_jaccard_pairs, bloom
        auto-sizing) should be fed from here when their input is a
        cataloged table — it replaces a full count() job over the
        table with a manifest lookup."""
        idx = self.load_file_index(name)
        # pruned_files() with no bounds doubles as the staleness check:
        # non-None means the on-disk file set still matches the index.
        if idx is not None and self.pruned_files(name) is not None:
            return sum(int(e["rows"]) for e in idx)
        return int(self.file_stats(name)["rows"])

    def backup_metadata(self) -> str:
        """A27: timestamped manifest backup before collect/compact."""
        backups = os.path.join(self.metadata_dir, "backups")
        os.makedirs(backups, exist_ok=True)
        dst = os.path.join(backups, f"manifest.{int(time.time() * 1000)}.json")
        if os.path.exists(self.manifest_path):
            shutil.copy2(self.manifest_path, dst)
        return dst

    # --- file/row stats (A30) ---
    def file_stats(self, table: str) -> dict:
        tdir = self.table_dir(table)
        files, bytes_, rows = 0, 0, 0
        for root, _dirs, names in os.walk(tdir):
            for n in names:
                if not n.endswith(".parquet"):
                    continue
                p = os.path.join(root, n)
                files += 1
                bytes_ += os.path.getsize(p)
                rows += FooterInfo(p).num_rows
        return {"table": table, "files": files, "bytes": bytes_, "rows": rows}

    # --- manifest-based data skipping -------------------------------
    #
    # At 100 TB a table is millions of files; letting every query open
    # every footer just to discover "this file's time range is disjoint
    # from the predicate" wastes the driver's scan-planning time. Like
    # Iceberg/DuckLake manifests (reference: internal/database/
    # duck_db.go:270-291 keeps per-file entries in its catalog), we
    # record per-file tp_timestamp min/max + null_count at write time
    # and intersect the predicate against the index instead.

    # The index lives in a per-table JSONL sidecar
    # (metadata/file_index/<table>.jsonl), NOT inside manifest.json: a
    # manifest-embedded index would make every incremental append pay
    # an O(index) JSON rewrite — at 1M files that is a ~100 MB driver
    # serialization per collect. JSONL appends keep the merge path
    # O(new entries); reads dedupe last-wins by path, and the full
    # rewrites (refresh/compact) naturally compact the file.

    def _index_path(self, table: str) -> str:
        return os.path.join(self.metadata_dir, "file_index", f"{table}.jsonl")

    def load_file_index(self, table: str) -> list | None:
        """Current file index, or None when never built. Reads the
        JSONL sidecar (last-wins per path); falls back to a legacy
        manifest-embedded index (pre-sidecar workspaces) which the
        next store migrates out.

        A torn FINAL line (crash mid-_append_index) is tolerated: the
        parsed prefix is returned, so the index degrades to "missing
        the interrupted append's entries" — pruning then admits those
        files via the directory scan, same as any stale index. A torn
        line anywhere BUT the end means real corruption; that returns
        None so every consumer falls back to a full scan (the contract
        elsewhere: stale/missing index -> degrade, never raise)."""
        p = self._index_path(table)
        if os.path.exists(p):
            by_path = {}
            with open(p) as f:
                lines = f.readlines()
            for i, line in enumerate(lines):
                line = line.strip()
                if not line:
                    continue
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    if i == len(lines) - 1:
                        break  # torn trailing append; keep parsed prefix
                    return None  # mid-file corruption: index unusable
                if not isinstance(e, dict) or "path" not in e:
                    # valid JSON but not an index entry (e.g. a bare
                    # number): same contract as mid-file corruption —
                    # degrade to full scan, never raise (r8 ADVICE)
                    if i == len(lines) - 1:
                        break
                    return None
                by_path[e["path"]] = e
            return list(by_path.values())
        return self._load()["tables"].get(table, {}).get("file_index")

    def _store_index(self, table: str, entries: list) -> None:
        """Atomic full rewrite of the sidecar; drops any legacy
        manifest-embedded copy so there is one source of truth."""
        p = self._index_path(table)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            f.writelines(json.dumps(e) + "\n" for e in entries)
        os.replace(tmp, p)
        manifest = self._load()
        if "file_index" in manifest["tables"].get(table, {}):
            del manifest["tables"][table]["file_index"]
            self._store(manifest)

    def _append_index(self, table: str, entries: list) -> None:
        with open(self._index_path(table), "a") as f:
            f.writelines(json.dumps(e) + "\n" for e in entries)

    def _index_entry(self, tdir: str, relpath: str, columns) -> dict:
        """One file-index entry from a single footer read."""
        p = os.path.join(tdir, relpath)
        md = FooterInfo(p)
        ts = _footer_col_stats(md, "tp_timestamp")
        entry = {
            "path": relpath,
            "bytes": os.path.getsize(p),
            "rows": md.num_rows,
            "min_ts": ts["min"] if ts else None,
            "max_ts": ts["max"] if ts else None,
            "null_ts": ts["nulls"] if ts else None,
        }
        if columns:
            entry["cols"] = {c: _footer_col_stats(md, c) for c in columns}
        return entry

    def refresh_file_index(self, table: str, columns: list[str] | None = None) -> int:
        """Record per-file footer stats in the manifest: always
        ``tp_timestamp``, plus any extra ``columns`` (the z-order
        companion: a layout clustered on (tp_timestamp, user_id) makes a
        user_id index selective, so `compact --zorder` passes its
        columns here). Returns the number of files indexed.

        This is the FULL rebuild — O(all files) footer reads. The
        incremental paths (collect append -> ``merge_file_index``;
        compact/delete -> ``refresh_partition_index``) keep the index
        maintained at O(files touched); use this only for initial
        builds, whole-table rewrites, or repair."""
        tdir = self.table_dir(table)
        index = []
        for root, _dirs, names in os.walk(tdir):
            for n in sorted(names):
                if n.endswith(".parquet"):
                    rel = os.path.relpath(os.path.join(root, n), tdir)
                    index.append(self._index_entry(tdir, rel, columns))
        self._store_index(table, index)
        if columns:
            manifest = self._load()
            manifest["tables"][table]["indexed_columns"] = list(columns)
            self._store(manifest)
        return len(index)

    def has_file_index(self, table: str) -> bool:
        return self.load_file_index(table) is not None

    def merge_file_index(self, table: str, added: list[str]) -> int:
        """Merge newly written files into the existing index, reading
        ONLY their footers — the append path knows exactly which files
        it wrote, so a collect into a table with a million existing
        files must not pay a million footer reads (the reference
        updates file metadata transactionally per insert: reference
        internal/database/file_metadata.go:42-52).

        ``added``: file paths absolute or relative to the table dir.
        Falls back to a full rebuild when no index exists yet
        (returning the full count); otherwise returns the number of
        entries appended. New entries carry the same companion-column
        stats as the existing index (``indexed_columns``) so pruning
        stays uniform."""
        if not os.path.exists(self._index_path(table)):
            legacy = self.load_file_index(table)
            if legacy is None:
                return self.refresh_file_index(table)
            # one-time migration of a legacy manifest-embedded index
            self._store_index(table, legacy)
        tdir = self.table_dir(table)
        columns = self._load()["tables"].get(table, {}).get("indexed_columns")
        rels = [
            os.path.relpath(p, tdir) if os.path.isabs(p) else p for p in added
        ]
        fresh = [self._index_entry(tdir, rel, columns) for rel in sorted(rels)]
        # O(new entries) appended lines; reads dedupe last-wins by
        # path. The existing index is deliberately NOT loaded here —
        # that read alone is O(table) and was measurable at 4k files.
        self._append_index(table, fresh)
        return len(fresh)

    def refresh_partition_index(
        self,
        table: str,
        key_relpaths: list[str],
        columns: list[str] | None = None,
    ) -> int:
        """Re-index only the given partition subdirectories (relative
        to the table dir): drop their old index rows, footer-read just
        the files now under them. Compact and delete rewrite whole
        partition keys, so their index maintenance is O(files in the
        rewritten keys), not O(table).

        ``columns`` switches the companion-column set (z-order compact
        passes its cluster columns); when that changes the WHOLE index
        is rebuilt so stats stay uniform across files."""
        existing = self.load_file_index(table)
        cols_now = self._load()["tables"].get(table, {}).get("indexed_columns")
        if existing is None or (columns and list(columns) != cols_now):
            return self.refresh_file_index(table, columns)
        tdir = self.table_dir(table)
        prefixes = tuple(k.rstrip(os.sep) + os.sep for k in key_relpaths)
        kept = [e for e in existing if not e["path"].startswith(prefixes)]
        cols = cols_now
        for key in key_relpaths:
            kdir = os.path.join(tdir, key)
            if not os.path.isdir(kdir):
                continue  # partition fully deleted
            for root, _dirs, names in os.walk(kdir):
                for n in sorted(names):
                    if n.endswith(".parquet"):
                        rel = os.path.relpath(os.path.join(root, n), tdir)
                        kept.append(self._index_entry(tdir, rel, cols))
        self._store_index(table, kept)
        return len(kept)

    def pruned_files(self, table, time_from=None, time_to=None, predicates=None):
        """File subset that can satisfy the given bounds per the
        manifest index, or ``None`` when the index is missing or STALE
        (the on-disk file set no longer matches — callers must fall
        back to a full scan, never trust a stale index).

        ``predicates``: optional ``{column: (lo, hi)}`` inclusive
        ranges over extra indexed columns (see refresh_file_index's
        ``columns``); either bound may be None.

        Conservative by construction: files without stats for a tested
        column and files containing null timestamps are always kept
        (the query layer's lower bound keeps NULL rows, query_cli.py)."""
        from datetime import datetime, timezone

        def _naive_utc(t):
            # Index timestamps are naive UTC; relative CLI bounds
            # (``T-7d``) arrive tz-aware — normalize or the < compare
            # raises TypeError (r6 ADVICE).
            if t is not None and t.tzinfo is not None:
                t = t.astimezone(timezone.utc).replace(tzinfo=None)
            return t

        time_from = _naive_utc(time_from)
        time_to = _naive_utc(time_to)
        index = self.load_file_index(table)
        if index is None:
            return None
        tdir = self.table_dir(table)
        on_disk = set()
        for root, _dirs, names in os.walk(tdir):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(root, n)
                    on_disk.add((os.path.relpath(p, tdir), os.path.getsize(p)))
        if on_disk != {(e["path"], e["bytes"]) for e in index}:
            return None  # stale — file set changed since refresh
        keep = []
        for e in index:
            full = os.path.join(tdir, e["path"])
            ts_ok = True
            if e["min_ts"] is None or e["null_ts"] is None or e["null_ts"] > 0:
                pass  # no usable ts stats / null rows → ts test keeps it
            else:
                lo = datetime.fromisoformat(e["min_ts"])
                hi = datetime.fromisoformat(e["max_ts"])
                if time_from is not None and hi < time_from:
                    ts_ok = False
                if time_to is not None and lo >= time_to:
                    ts_ok = False
            if not ts_ok:
                continue
            col_ok = True
            for c, (plo, phi) in (predicates or {}).items():
                st = (e.get("cols") or {}).get(c)
                if st is None:
                    continue  # no stats for this column → keep
                if plo is not None and st["max"] < plo:
                    col_ok = False
                    break
                if phi is not None and st["min"] > phi:
                    col_ok = False
                    break
            if col_ok:
                keep.append(full)
        return keep

    # --- spark registration (A16) ---
    def register_views(
        self,
        spark: SparkSession,
        filters: list[str] | None = None,
        hide_layout_cols: bool = True,
    ) -> list[str]:
        """Register one temp view per table, with optional baked-in
        filter predicates (reference: internal/database/views.go:14-34).
        Layout columns tp_year/tp_month are hidden so ``select *``
        matches the reference's schema."""
        names = []
        for t in self.list_tables():
            df = self.read_table(spark, t)
            for flt in filters or []:
                from pyspark.sql import functions as F

                df = df.filter(F.expr(flt))
            if hide_layout_cols:
                df = df.drop("tp_year", "tp_month")
            df.createOrReplaceTempView(t)
            names.append(t)
        return names

    def read_table(
        self,
        spark: SparkSession,
        table: str,
        time_from=None,
        time_to=None,
    ) -> DataFrame:
        """Table scan; with time bounds the manifest file index (when
        fresh) restricts the scan to intersecting files — the predicate
        itself is still applied by the query layer, skipping is a
        conservative superset."""
        if table not in self.list_tables():
            raise KeyError(f"table {table!r} does not exist")
        from pyspark.sql import functions as F

        from tailpipe_spark.session import configure_runtime

        configure_runtime(spark)
        paths = None
        if time_from is not None or time_to is not None:
            paths = self.pruned_files(table, time_from, time_to)
        elif self.table_layout(table):
            # bucketed layout: serve the scan through a session-catalog
            # external table so Catalyst sees the bucket spec (a plain
            # path read discards it and joins re-shuffle). Time-pruned
            # reads keep the path branch — file-subset scans can't
            # carry a bucket spec, and pruning is about scan size, not
            # join co-location.
            return self._read_bucketed(spark, table)
        reader = spark.read.option("basePath", self.table_dir(table))
        if paths is None:
            df = reader.parquet(self.table_dir(table))
        elif paths:
            df = reader.parquet(*paths)
        else:
            # every file pruned: plan over one file (schema + layout
            # cols intact) with a false predicate — cheapest empty scan
            any_file = os.path.join(
                self.table_dir(table),
                self.load_file_index(table)[0]["path"],
            )
            df = reader.parquet(any_file).filter(F.lit(False))
        # partition type inference is off (tp_index stays varchar);
        # restore int types for the numeric layout columns
        return df.withColumn("tp_year", F.col("tp_year").cast("int")).withColumn(
            "tp_month", F.col("tp_month").cast("int")
        )

    def _bucketed_reg_name(self, table: str, rev: int) -> str:
        import hashlib

        ws = hashlib.md5(self.workspace.encode()).hexdigest()[:8]
        return f"tp_bucketed_{ws}_{table}_r{rev}"

    def _read_bucketed(self, spark: SparkSession, table: str) -> DataFrame:
        """Scan a bucketed-layout table THROUGH the session catalog.

        Spark only honors a bucket spec on tables it knows from its
        catalog — ``spark.read.parquet(path)`` has nowhere to carry
        "these files are hash-clustered by key into N buckets", so the
        planner re-shuffles joins on the bucket key. We register an
        external table (schema from the files, partition + bucket spec
        from the manifest layout) once per layout revision and return
        ``spark.table(...)``: a join of two same-bucketed tables then
        plans as a zero-Exchange SortMergeJoin — each task reads bucket
        i of both sides (pinned in tests/test_bucketed_layout.py). The
        registration is metadata-only and idempotent; stale revisions
        are dropped (DROP TABLE on an external table keeps the files).
        """
        lay = self.table_layout(table)
        rev = int(lay["layout_rev"])
        reg = self._bucketed_reg_name(table, rev)
        if not spark.catalog.tableExists(reg):
            # derive the data-column DDL from the files themselves
            fields = spark.read.parquet(self.table_dir(table)).schema.fields
            data_cols = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}"
                for f in fields
                if f.name not in PARTITION_COLS
            )
            part_cols = (
                "`tp_partition` STRING, `tp_index` STRING, "
                "`tp_year` INT, `tp_month` INT"
            )
            bucket_cols = ", ".join(f"`{c}`" for c in lay["bucket_by"])
            sort_cols = ", ".join(f"`{c}`" for c in lay["sort_by"])
            # drop registrations of older layout revisions first
            prefix = self._bucketed_reg_name(table, 0)[: -len("_r0")]
            for row in spark.sql(f"SHOW TABLES LIKE '{prefix}_r*'").collect():
                if row.tableName != reg:
                    spark.sql(f"DROP TABLE IF EXISTS `{row.tableName}`")
            spark.sql(
                f"CREATE TABLE `{reg}` ({data_cols}, {part_cols}) "
                f"USING parquet "
                f"PARTITIONED BY (tp_partition, tp_index, tp_year, tp_month) "
                f"CLUSTERED BY ({bucket_cols}) SORTED BY ({sort_cols}) "
                f"INTO {int(lay['num_buckets'])} BUCKETS "
                f"LOCATION '{self.table_dir(table)}'"
            )
            spark.sql(f"MSCK REPAIR TABLE `{reg}`")
        # DELIBERATELY no size stats on the registration (r15, measured
        # both ways at sf10): a partitioned external table without
        # stats reports defaultSizeInBytes (huge), so the planner can
        # NEVER broadcast a provisioned fact table. With NOSCAN stats
        # the compressed-bytes estimate slipped q12's UNFILTERED 15M-row
        # orders under the 64m threshold — a 9.5 s broadcast build (3x
        # worse than plain, OOM-fragile in long sessions) where the
        # co-located SMJ runs the same join in ~2 s. Fact tables are
        # bucketed precisely because they are too big to ship; the
        # conservative estimate encodes that. Dimension tables are path
        # reads and keep their normal file-size estimates/broadcasts.
        #
        # Sorted bucket scan: the layout writes each bucket pre-sorted
        # by the bucket key (one file per bucket per hive cell —
        # bucket_rewrite aligns task hashing with bucket hashing), so
        # the scan may report its SORTED BY order and the co-located
        # SortMergeJoin runs sort-free — measured at sf10: the
        # lineitem⋈orders merge drops 4.08 -> 2.11 s with the flag on.
        # Value-correctness is pinned by the bucketed-twin oracle sweep
        # (CORRECTNESS_SF10_BUCKETED_r15) and an adversarial
        # interleaved multi-file-bucket probe (Spark 4.1 plans the
        # merge correctly either way).
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        )
        return spark.table(reg)
