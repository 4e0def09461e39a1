"""Sharded, vectorized extent map — the million-file manifest.

`sources/manifest.py` keeps one JSON sidecar per table and eliminates
files in a Python loop over entries.  Fine to ~10⁴ files; at 100 TB a
table has 10⁵–10⁶ part files and both the single sidecar rewrite and
the per-query Python loop become a PLANNER bottleneck.  The reference
kept its extent map shared-memory-resident and scanned it as a flat
array precisely for this reason (`versioning/BRM/extentmap.h:116-148`:
EMEntry records in a managed shared-memory segment, not a file parsed
per query).

This module is the scale path:

* **Storage** — the stats relation is a PARQUET DATASET of N hash
  shards (`<table>.__manifest__/shard_NNNNN.parquet`), one row per
  data file, one typed (`min::col`, `max::col`, `nulls::col`) column
  triple per data column.  A refresh after an append/DML rewrite
  stats the member files (cheap), re-harvests only CHANGED files'
  footers, and rewrites only the DIRTY shards — O(changed files), the
  BRM's incremental extent-allocation discipline.
* **Elimination** — ONE vectorized DuckDB predicate over the stats
  relation (held in memory as an Arrow table after refresh, exactly
  the shared-memory-resident posture of the EM), not a Python loop:
  a 100k-file manifest prunes in single-digit milliseconds.
* **Conservatism** — identical contract to `manifest.prune`: a file
  survives unless its stats PROVE no row can match.  NULL stats, stat
  columns that fail Arrow type unification, predicates DuckDB cannot
  type against the stats — all keep their files.  Residual filters
  are re-applied after the scan, so pruning is result-transparent.
"""

from __future__ import annotations

import os
import threading
import time
import zlib
from collections import OrderedDict
from functools import reduce
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from infinidb_spark.sources.manifest import (
    Predicate,
    _as_filter,
    _harvest_file,
    _has_nested_data,
    _member_files,
)

_KEY_COLS = ("basename", "mtime_ns", "size", "ino", "rows")


#: racily-clean window for the directory-mtime refresh gate — see
#: operators/dml._SNAP_RACY_NS (same idiom, same hazard; 2 s to exceed
#: coarse filesystem mtime granularity).
_DIR_SIG_RACY_NS = 2_000_000_000

#: serializes prune()'s register→execute→unregister on the SHARED
#: DuckDB connection (see prune for the wrong-table hazard)
_PRUNE_LOCK = threading.Lock()


def _shard_of(basename: str, n_shards: int) -> int:
    return zlib.crc32(basename.encode()) % n_shards


class ShardedManifest:
    """Incrementally-maintained, vectorized extent map for one table.

    ``manifest_dir`` defaults to ``<table>.__manifest__`` next to the
    data directory (symlink-stable for managed tables: the shards
    describe whatever version the link points at after ``refresh()``).
    """

    def __init__(self, table_dir: str, manifest_dir: str | None = None,
                 n_shards: int = 64):
        self.table_dir = table_dir.rstrip("/")
        self.manifest_dir = manifest_dir or self.table_dir + ".__manifest__"
        self.n_shards = n_shards
        self._shard_tables: dict[int, pa.Table] = {}
        self._shard_keys: dict[int, dict[str, tuple[int, int, int]]] = {}
        self._relation: pa.Table | None = None
        self._clean_fp: tuple | None = None
        self._dir_sig: tuple[str, int] | None = None
        # serializes refresh()/relation() per instance: instances are
        # shared process-wide via _SHARDED_CACHE, and two driver threads
        # interleaving a refresh could leave _shard_tables[i] and
        # _shard_keys[i] describing DIFFERENT filesets — after which the
        # shard reads as clean forever and its files silently vanish
        # from every scan
        self._lock = threading.RLock()

    # -- storage ------------------------------------------------------

    def _shard_path(self, i: int) -> str:
        return os.path.join(self.manifest_dir, f"shard_{i:05d}.parquet")

    def _load_shard(self, i: int) -> pa.Table | None:
        t = self._shard_tables.get(i)
        if t is not None:
            return t
        p = self._shard_path(i)
        if not os.path.exists(p):
            return None
        t = pq.read_table(p)
        self._shard_tables[i] = t
        return t

    def _write_shard(self, i: int, t: pa.Table) -> None:
        os.makedirs(self.manifest_dir, exist_ok=True)
        p = self._shard_path(i)
        tmp = p + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, p)  # readers never see a torn shard
        self._shard_tables[i] = t

    # -- refresh (O(changed files)) -----------------------------------

    def refresh(self) -> "ShardedManifest":
        with self._lock:
            return self._refresh_locked()

    def _refresh_locked(self) -> "ShardedManifest":
        real = os.path.realpath(self.table_dir)

        # Directory-mtime gate: every writer creates/renames/unlinks
        # entries in the table dir, so an unchanged dir mtime means an
        # unchanged file set — a clean refresh of a 10⁵-file table
        # costs ONE stat, not O(files).  Same racily-clean guard as
        # operators/dml._snapshot: a dir modified within the window is
        # never trusted from (nor admitted to) the memo, so a same-tick
        # writer can't alias.  KNOWN LIMIT (documented trade): an
        # in-place overwrite of an existing file (open+truncate on the
        # same name, no rename) does not bump the dir mtime and is
        # invisible to the gate — this engine's writers never do that
        # (Spark/pyarrow write temp + rename), but externally-managed
        # dirs modified that way should delete <table>.__manifest__ to
        # force a rebuild.
        try:
            dir_mtime = os.stat(real).st_mtime_ns
        except OSError:
            dir_mtime = None
        racy = (
            dir_mtime is None
            or time.time_ns() - dir_mtime <= _DIR_SIG_RACY_NS
        )
        if (
            not racy
            and self._dir_sig == (real, dir_mtime)
            and self._clean_fp is not None
            # the documented rebuild remedy is "delete <table>.
            # __manifest__" — a live instance must notice that deletion
            # (the in-memory shard memo would otherwise serve stale
            # stats forever); one extra stat per clean refresh
            and os.path.isdir(self.manifest_dir)
        ):
            return self
        # arm the signature only at a SUCCESS exit: a mid-rebuild
        # exception (torn footer, disk full) must leave the gate
        # disarmed so the retry rescans instead of serving stale shards
        self._dir_sig = None
        if not os.path.isdir(self.manifest_dir) and (
            self._shard_tables or self._shard_keys or self._clean_fp
        ):
            # the user invoked the documented rebuild remedy (deleted
            # the manifest dir): drop EVERY in-memory memo — both the
            # clean-fingerprint fast path below and _load_shard's
            # memory-first lookup would otherwise keep serving the
            # stale stats the deletion was meant to purge
            self._shard_tables = {}
            self._shard_keys = {}
            self._clean_fp = None
            self._relation = None

        current: dict[str, tuple[int, int, int]] = {}
        for f in _member_files(real):
            try:
                st = os.stat(f)
            except OSError:
                # unlinked between the listing and the stat (concurrent
                # compaction/rewrite): a vanished file can't contribute
                # rows — skip it rather than failing the whole query
                continue
            current[os.path.basename(f)] = (st.st_mtime_ns, st.st_size, st.st_ino)

        # Clean-snapshot fast path: when the file set is identical to
        # the last refresh there is nothing to compare per shard — skip
        # the per-shard key materialization entirely (a per-scan
        # refresh of a clean 100k-file table must not pay O(files)
        # Python-object work).
        fp = (real, tuple(sorted(current.items())))
        if fp == self._clean_fp:
            self._dir_sig = (real, dir_mtime) if not racy else None
            return self
        # disarm BEFORE rewriting shards: a mid-rebuild crash followed
        # by a fileset REVERT (version-symlink rollback to hard-linked
        # files with identical stat keys) must not match the stale
        # clean print and serve half-rebuilt shards
        self._clean_fp = None

        harvest_failed = False
        by_shard: dict[int, dict[str, tuple[int, int, int]]] = {}
        for b, key in current.items():
            by_shard.setdefault(_shard_of(b, self.n_shards), {})[b] = key

        for i in range(self.n_shards):
            want = by_shard.get(i, {})
            have = self._load_shard(i)
            stored = self._shard_keys.get(i)
            if stored is None:
                stored = {}
                if have is not None:
                    stored = {
                        b: (m, s, n)
                        for b, m, s, n in zip(
                            have.column("basename").to_pylist(),
                            have.column("mtime_ns").to_pylist(),
                            have.column("size").to_pylist(),
                            have.column("ino").to_pylist(),
                        )
                    }
                self._shard_keys[i] = stored
            if stored == want:
                continue  # clean shard: zero footer reads, zero writes
            # carry unchanged rows, harvest only changed/new files
            keep = [
                idx
                for idx, b in enumerate(
                    have.column("basename").to_pylist() if have is not None else []
                )
                if stored.get(b) == want.get(b)
            ]
            rows: list[dict[str, Any]] = (
                have.take(keep).to_pylist() if have is not None and keep else []
            )
            kept_names = {r["basename"] for r in rows}
            recorded = dict(want)
            for b, (mt, sz, ino) in sorted(want.items()):
                if b in kept_names:
                    continue
                try:
                    e = _harvest_file(os.path.join(real, b))
                except OSError:
                    # vanished between the stat pass and the footer
                    # read; MUST also drop it from the recorded keys —
                    # recording it while the shard table lacks its row
                    # would read as clean forever and silently
                    # eliminate the file from every scan if it returns
                    del recorded[b]
                    harvest_failed = True
                    continue
                row: dict[str, Any] = {
                    "basename": b, "mtime_ns": mt, "size": sz, "ino": ino,
                    "rows": int(e["rows"]),
                }
                for col, st in e["columns"].items():
                    row[f"min::{col}"] = st["min"]
                    row[f"max::{col}"] = st["max"]
                    row[f"nulls::{col}"] = st["null_count"]
                rows.append(row)
            self._write_shard(i, _rows_to_table(rows))
            self._shard_keys[i] = recorded
            self._relation = None
        if not harvest_failed:
            # any skipped file leaves the gates disarmed: the next
            # refresh re-lists and retries the harvest
            self._clean_fp = fp
            self._dir_sig = (real, dir_mtime) if not racy else None
        return self

    # -- the resident stats relation ----------------------------------

    def relation(self) -> pa.Table:
        """All shards as ONE Arrow table (schema-unified by name) — the
        shared-memory-resident extent map the planner queries."""
        with self._lock:
            if self._relation is None:
                tables = [
                    t for i in range(self.n_shards)
                    if (t := self._load_shard(i)) is not None and t.num_rows
                ]
                if not tables:
                    self._relation = _rows_to_table([])
                else:
                    # lossy cross-shard promotion check FIRST: int64 and
                    # float64 unify silently, but the widening rounds —
                    # a stored int min above 2^53 can round UP past the
                    # true min and mis-eliminate a file holding matching
                    # rows.  Poison such columns (conservative: keeps
                    # files), value-checked so the common small-value
                    # evolution keeps its elimination.
                    tables = _poison_lossy_promotions(tables)
                    try:
                        self._relation = pa.concat_tables(
                            tables, promote_options="permissive"
                        )
                    except (pa.ArrowInvalid, pa.ArrowTypeError,
                            pa.ArrowNotImplementedError):
                        # schema evolution can land the SAME stat column
                        # with incompatible Arrow types in DIFFERENT
                        # shards (each shard unified fine in isolation —
                        # _rows_to_table's poisoning is per-shard).
                        # Contract says typing failures KEEP files, so
                        # poison the conflicting columns to all-NULL
                        # everywhere and merge the rest.
                        self._relation = pa.concat_tables(
                            _poison_conflicts(tables),
                            promote_options="permissive",
                        )
            return self._relation

    # -- vectorized elimination ---------------------------------------

    def prune(self, predicates: list[Predicate]) -> list[str]:
        """Surviving data-file paths under the AND of ``predicates`` —
        one vectorized scan of the stats relation, conservative on any
        typing failure (per-predicate fallback keeps its files)."""
        from infinidb_spark.sources.manifest import _duck_con

        rel = self.relation()
        real = os.path.realpath(self.table_dir)
        if rel.num_rows == 0:
            # a never-refreshed manifest over a NON-empty table must not
            # read as "all files eliminated" (missing stats keep files,
            # never drop them) — build the stats first, then decide
            if _member_files(real):
                rel = self.refresh().relation()
            if rel.num_rows == 0:
                return []
        con = _duck_con()
        # the register→execute→unregister span runs under a module
        # lock: _duck_con is one shared connection and the view name is
        # fixed, so a concurrent prune (second session / parallel
        # driver thread) re-registering mid-query would silently serve
        # ANOTHER table's basenames — zero of which match this dir,
        # planning an all-eliminated (empty) scan for a query with rows
        with _PRUNE_LOCK:
            return self._prune_registered(con, rel, real, predicates)

    def _prune_registered(self, con, rel, real, predicates) -> list[str]:
        # register INSIDE the try: an exception (or KeyboardInterrupt)
        # between a bare acquire and its try-block used to leak
        # _PRUNE_LOCK and deadlock every future prune in the process
        try:
            con.register("_idb_sharded_manifest", rel)
            clauses, params = [], []
            for p in predicates:
                c = _pred_sql(p, set(rel.schema.names))
                if c is not None:
                    clauses.append(c[0])
                    params.extend(c[1])
            if not clauses:
                names = rel.column("basename").to_pylist()
            else:
                try:
                    names = [
                        r[0] for r in con.execute(
                            "SELECT basename FROM _idb_sharded_manifest WHERE "
                            + " AND ".join(clauses),
                            params,
                        ).fetchall()
                    ]
                except Exception:
                    # a predicate DuckDB cannot type against the stats:
                    # intersect per-predicate, keeping all files for any
                    # clause that still fails (conservative)
                    names = set(rel.column("basename").to_pylist())
                    for p in predicates:
                        c = _pred_sql(p, set(rel.schema.names))
                        if c is None:
                            continue
                        try:
                            ok = {
                                r[0] for r in con.execute(
                                    "SELECT basename FROM _idb_sharded_manifest "
                                    "WHERE " + c[0],
                                    c[1],
                                ).fetchall()
                            }
                            names &= ok
                        except Exception:
                            continue
                    names = sorted(names)
        finally:
            try:
                con.unregister("_idb_sharded_manifest")
            except Exception:
                pass  # register itself may have failed
        return [os.path.join(real, b) for b in sorted(names)]


def _poison_lossy_promotions(tables: list[pa.Table]) -> list[pa.Table]:
    """Null out stat columns whose cross-shard type mix would promote
    LOSSILY under concat (integer alongside floating): float64 carries
    53 mantissa bits, so an int64 stat above 2^53 rounds — possibly
    RAISING a min / LOWERING a max past its true value, which breaks
    the never-mis-eliminate contract.  Value-checked: the mix poisons
    only when some integer instance actually exceeds 2^53."""
    import pyarrow.compute as pc

    types: dict[str, set] = {}
    for t in tables:
        for field in t.schema:
            if "::" in field.name:
                types.setdefault(field.name, set()).add(field.type)
    bad: set[str] = set()
    for name, ts in types.items():
        non_null = [x for x in ts if not pa.types.is_null(x)]
        has_int = any(pa.types.is_integer(x) for x in non_null)
        has_float = any(
            pa.types.is_floating(x) or pa.types.is_decimal(x)
            for x in non_null
        )
        if not (has_int and has_float):
            continue
        for t in tables:
            if name not in t.schema.names:
                continue
            col = t.column(name)
            if not pa.types.is_integer(col.type):
                continue
            m = pc.max(pc.abs_checked(col)).as_py()
            if m is not None and m > 2**53:
                bad.add(name)
                break
    if not bad:
        return tables
    out = []
    for t in tables:
        for name in bad & set(t.schema.names):
            i = t.schema.get_field_index(name)
            t = t.set_column(i, name, pa.array([None] * t.num_rows, pa.null()))
        out.append(t)
    return out


def _poison_conflicts(tables: list[pa.Table]) -> list[pa.Table]:
    """Null out any column whose Arrow types cannot unify ACROSS shards
    (per-shard conflicts were already poisoned by _rows_to_table).  Key
    columns have stable types, so only stat columns can conflict."""
    types: dict[str, set] = {}
    for t in tables:
        for field in t.schema:
            types.setdefault(field.name, set()).add(field.type)
    bad: set[str] = set()
    for name, ts in types.items():
        non_null = [x for x in ts if not pa.types.is_null(x)]
        if len(non_null) <= 1:
            continue
        try:
            pa.unify_schemas(
                [pa.schema([(name, x)]) for x in non_null],
                promote_options="permissive",
            )
        except Exception:
            bad.add(name)
    out = []
    for t in tables:
        for name in bad & set(t.schema.names):
            i = t.schema.get_field_index(name)
            t = t.set_column(i, name, pa.array([None] * t.num_rows, pa.null()))
        out.append(t)
    return out


def _rows_to_table(rows: list[dict[str, Any]]) -> pa.Table:
    """Row dicts -> Arrow table.  A stat column whose values fail Arrow
    type unification (mixed harvest types) is POISONED to all-NULL —
    conservative: elimination never fires on it."""
    if not rows:
        return pa.table({
            "basename": pa.array([], pa.string()),
            "mtime_ns": pa.array([], pa.int64()),
            "size": pa.array([], pa.int64()),
            "ino": pa.array([], pa.int64()),
            "rows": pa.array([], pa.int64()),
        })
    names: list[str] = list(_KEY_COLS)
    for r in rows:
        for k in r:
            if k not in names:
                names.append(k)
    arrays, out_names = [], []
    for name in names:
        vals = [r.get(name) for r in rows]
        # same lossy-promotion guard as _poison_lossy_promotions, at
        # row level: pa.array over mixed int/float infers float64
        # silently, rounding int stats above 2^53 (can raise a min past
        # its true value → mis-elimination)
        if "::" in name and any(isinstance(v, float) for v in vals) and any(
            isinstance(v, int) and not isinstance(v, bool) and abs(v) > 2**53
            for v in vals
        ):
            arrays.append(pa.array([None] * len(vals), pa.null()))
            out_names.append(name)
            continue
        try:
            arr = pa.array(vals)
        except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
            arr = pa.array([None] * len(vals), pa.null())
        arrays.append(arr)
        out_names.append(name)
    return pa.table(arrays, names=out_names)


def _pred_sql(pred: Predicate, avail: set[str]) -> tuple[str, list] | None:
    """(WHERE clause, params) for one predicate over the stats relation;
    None when the column has no stat columns at all (keep everything —
    same contract as `manifest._may_match` on a missing column).

    Timestamp predicates compare validly ONLY because both engines are
    pinned UTC (session.py builds every Spark session with
    spark.sql.session.timeZone=UTC; manifest._duck_con sets
    TimeZone='UTC') — the DuckDB-side comparison and Spark's residual
    filter then read a timestamp literal as the same instant.  An
    embedder running a non-UTC Spark session must treat timestamp
    predicates as non-prunable (elimination could drop files whose
    rows the residual filter would match)."""
    col, op = pred[0], pred[1]
    # double embedded '"': a column name containing a quote otherwise
    # yields malformed SQL for every predicate on it — swallowed
    # conservatively, but elimination goes silently inert for the
    # column (and crafted names could alter clause semantics)
    q = col.replace('"', '""')
    mn, mx = f'"min::{q}"', f'"max::{q}"'
    if f"min::{col}" not in avail or f"max::{col}" not in avail:
        return None
    guard = f"({mn} IS NULL OR {mx} IS NULL OR "
    if op == "=":
        return guard + f"({mn} <= ? AND {mx} >= ?))", [pred[2], pred[2]]
    if op == "<":
        return f"({mn} IS NULL OR {mn} < ?)", [pred[2]]
    if op == "<=":
        return f"({mn} IS NULL OR {mn} <= ?)", [pred[2]]
    if op == ">":
        return f"({mx} IS NULL OR {mx} > ?)", [pred[2]]
    if op == ">=":
        return f"({mx} IS NULL OR {mx} >= ?)", [pred[2]]
    if op == "between":
        return guard + f"({mx} >= ? AND {mn} <= ?))", [pred[2], pred[3]]
    if op == "in":
        vals = list(pred[2])
        if not vals:
            return "FALSE", []
        ors = " OR ".join(f"({mn} <= ? AND {mx} >= ?)" for _ in vals)
        return guard + f"({ors}))", [v for v in vals for _ in (0, 1)]
    return None  # unknown operator → keep the file


#: process-level instance memo — a fresh ShardedManifest pays a full
#: 64-shard load + O(files) key-dict build on its first refresh; a kept
#: instance's clean-snapshot fast path is one os.stat pass (the same
#: amortization manifest.py's _MANIFEST_CACHE gives the loop pruner).
#: Keyed by the UNRESOLVED table path: the manifest dir sits next to
#: the symlink and stays valid across version swaps.  LRU-bounded —
#: each entry holds the table's full Arrow stats relation, and a
#: long-lived session scanning many short-lived tables (temp tables,
#: per-job dirs) must not accumulate them forever; entries whose table
#: vanished are dropped at lookup.
_SHARDED_CACHE: OrderedDict[str, "ShardedManifest"] = OrderedDict()
_SHARDED_CACHE_MAX = 64


def cached_sharded_manifest(path: str) -> "ShardedManifest":
    key = os.path.abspath(path.rstrip("/"))
    m = _SHARDED_CACHE.get(key)
    if m is not None:
        if not os.path.isdir(os.path.realpath(key)):
            del _SHARDED_CACHE[key]  # table dropped: stats are garbage
        else:
            _SHARDED_CACHE.move_to_end(key)
            return m
    m = _SHARDED_CACHE[key] = ShardedManifest(path)
    while len(_SHARDED_CACHE) > _SHARDED_CACHE_MAX:
        _SHARDED_CACHE.popitem(last=False)
    return m


def scan_with_sharded_manifest(
    spark: SparkSession,
    path: str,
    predicates: list[Predicate],
    manifest: ShardedManifest | None = None,
) -> DataFrame:
    """`scan_with_manifest` through the sharded/vectorized extent map;
    eliminated files never become input splits, residual filters are
    re-applied (result-transparent)."""
    if not predicates:
        return spark.read.parquet(path)  # manifest never consulted
    residual = reduce(lambda a, b: a & b, (_as_filter(p) for p in predicates))
    if not os.path.isdir(os.path.realpath(path)):
        # single parquet FILE: the extent map keys member files of a
        # DIRECTORY — refreshing here would key the file by its own
        # basename and prune() would emit bogus '<file>/<file>' paths
        # (plus a stray sidecar dir beside the file).  Plain scan; the
        # loop pruner (scan_with_manifest) documents the same gate.
        return spark.read.parquet(path).filter(residual)
    if _has_nested_data(path):
        # hive-partitioned table: the extent map keys TOP-LEVEL member
        # files and would read the layout as empty (zero rows for a
        # table with data) — plain scan; partition pruning + pushdown
        # still apply natively.  Checked BEFORE touching the LRU cache:
        # building a ShardedManifest that is never consulted would also
        # evict a live table's warm stats relation from the 64 slots.
        return spark.read.parquet(path).filter(residual)
    m = manifest or cached_sharded_manifest(path)
    m.refresh()
    files = m.prune(predicates)
    if not files:
        anchor = _member_files(os.path.realpath(path))[:1] or [path]
        return spark.read.parquet(*anchor).filter(F.lit(False) & residual)
    return spark.read.parquet(*files).filter(residual)
