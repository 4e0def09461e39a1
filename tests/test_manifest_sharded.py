"""Sharded vectorized extent map (sources/manifest_sharded.py) —
million-file-scale manifest maintenance and elimination
(`versioning/BRM/extentmap.h:116-148` shared-resident EM analog)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from infinidb_spark.sources.layout import cluster_write
from infinidb_spark.sources.manifest import cached_manifest, prune
from infinidb_spark.sources.manifest_sharded import (
    ShardedManifest,
    _rows_to_table,
    scan_with_sharded_manifest,
)

PREDS = [("l_orderkey", "between", 100, 900), ("l_quantity", ">=", 5)]


def _clustered(spark, sf_dir, tmp_path):
    t = str(tmp_path / "li_clustered")
    cluster_write(
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")),
        t, ["l_orderkey"], n_files=8,
    )
    return t


def test_prune_matches_loop_pruner(spark, sf_dir, tmp_path):
    t = _clustered(spark, sf_dir, tmp_path)
    m = ShardedManifest(t).refresh()
    for preds in (
        PREDS,
        [("l_orderkey", "=", 500)],
        [("l_orderkey", "<", 50)],
        [("l_orderkey", ">=", 5000)],
        [("l_orderkey", "in", [10, 20, 5999])],
        [("l_returnflag", "=", "R")],
    ):
        vec = set(m.prune(preds))
        ref = set(prune(cached_manifest(t), preds))
        assert vec == ref, preds
    # elimination is REAL on the clustered layout
    assert len(m.prune(PREDS)) < 8


def test_scan_is_result_transparent(spark, sf_dir, tmp_path):
    t = _clustered(spark, sf_dir, tmp_path)
    got = (
        scan_with_sharded_manifest(spark, t, PREDS)
        .agg(F.count(F.lit(1)), F.sum("l_extendedprice"))
        .collect()[0]
    )
    want = (
        spark.read.parquet(t)
        .filter((F.col("l_orderkey").between(100, 900)) & (F.col("l_quantity") >= 5))
        .agg(F.count(F.lit(1)), F.sum("l_extendedprice"))
        .collect()[0]
    )
    assert tuple(got) == tuple(want)


def test_refresh_is_incremental(spark, sf_dir, tmp_path):
    t = _clustered(spark, sf_dir, tmp_path)
    m = ShardedManifest(t, n_shards=8).refresh()
    mtimes = {
        f: os.stat(os.path.join(m.manifest_dir, f)).st_mtime_ns
        for f in os.listdir(m.manifest_dir)
    }
    # clean refresh rewrites NOTHING
    ShardedManifest(t, n_shards=8).refresh()
    after = {
        f: os.stat(os.path.join(m.manifest_dir, f)).st_mtime_ns
        for f in os.listdir(m.manifest_dir)
    }
    assert after == mtimes
    # appending one file dirties exactly the shards it hashes into
    extra = spark.read.parquet(t).limit(10)
    extra.coalesce(1).write.mode("append").parquet(t)
    ShardedManifest(t, n_shards=8).refresh()
    after2 = {
        f: os.stat(os.path.join(m.manifest_dir, f)).st_mtime_ns
        for f in os.listdir(m.manifest_dir)
    }
    changed = [f for f in after2 if after2[f] != after.get(f)]
    assert len(changed) >= 1
    new_files = (
        spark.read.parquet(t).count()
        == spark.read.parquet(t).count()
    )
    assert new_files
    # at most (#appended files) shards rewritten
    assert len(changed) <= 2


def test_100k_file_manifest_prunes_under_100ms(tmp_path):
    """The VERDICT-r05 acceptance bar: a synthetic 100k-file manifest
    eliminates in <100 ms through the vectorized path (the Python loop
    pruner is ~50x slower at this size)."""
    n, per_file = 100_000, 6000
    mdir = str(tmp_path / "mf")
    m = ShardedManifest(str(tmp_path / "t"), manifest_dir=mdir, n_shards=64)
    shards: dict[int, list[dict]] = {}
    for i in range(n):
        b = f"part-{i:06d}.parquet"
        lo = i * per_file
        row = {
            "basename": b, "mtime_ns": 1, "size": 1, "ino": i, "rows": per_file,
            "min::k": lo, "max::k": lo + per_file - 1,
            "nulls::k": 0,
            "min::ts": 1_000_000 + i, "max::ts": 1_000_000 + i + 10,
            "nulls::ts": 0,
        }
        from infinidb_spark.sources.manifest_sharded import _shard_of

        shards.setdefault(_shard_of(b, 64), []).append(row)
    for i, rows in shards.items():
        m._write_shard(i, _rows_to_table(rows))
    m.relation()  # resident, like the BRM's shared-memory EM
    t0 = time.perf_counter()
    files = m.prune([("k", "between", 1_000_000, 1_060_000)])
    dt = time.perf_counter() - t0
    assert len(files) == 11  # parts 166..176 overlap the key range
    assert dt < 0.1, f"vectorized prune took {dt * 1000:.1f} ms"


def test_conservative_on_mixed_and_missing_stats(tmp_path):
    rows = [
        {"basename": "a.parquet", "mtime_ns": 1, "size": 1, "ino": 1, "rows": 5,
         "min::k": 0, "max::k": 10, "nulls::k": 0},
        # poisoned column (no stats) must survive every predicate on it
        {"basename": "b.parquet", "mtime_ns": 1, "size": 1, "ino": 2, "rows": 5,
         "min::k": None, "max::k": None, "nulls::k": None},
    ]
    m = ShardedManifest(str(tmp_path / "t"), manifest_dir=str(tmp_path / "mf"),
                        n_shards=1)
    m._write_shard(0, _rows_to_table(rows))
    assert [os.path.basename(f) for f in m.prune([("k", "=", 999)])] == ["b.parquet"]
    # a predicate on a column with NO stat columns keeps everything
    assert len(m.prune([("nosuch", "=", 1)])) == 2
    # a literal DuckDB cannot type against the int stats keeps the files
    assert len(m.prune([("k", "=", "not-a-number")])) == 2


def test_prune_without_refresh_keeps_files(spark, sf_dir, tmp_path):
    """A never-refreshed manifest over a NON-empty table must not read
    as 'all files eliminated' — prune self-heals by building the stats
    first (missing stats keep files, never drop them)."""
    t = _clustered(spark, sf_dir, tmp_path)
    m = ShardedManifest(t)  # no refresh()
    survivors = m.prune([("l_orderkey", ">=", 0)])
    assert len(survivors) == 8  # nothing eliminable by a full-range pred
    assert set(m.prune(PREDS)) == set(prune(cached_manifest(t), PREDS))


def test_cross_shard_type_conflict_is_poisoned_not_fatal(tmp_path):
    """Schema evolution can land the SAME stat column with incompatible
    Arrow types in DIFFERENT shards; relation() must poison the column
    (keep files), not crash the planner."""
    import pyarrow.parquet as pq

    m = ShardedManifest(str(tmp_path / "t"))
    os.makedirs(m.manifest_dir, exist_ok=True)
    rows_int = [{"basename": "a.parquet", "mtime_ns": 1, "size": 1, "ino": 1,
                 "rows": 10, "min::c": 1, "max::c": 9, "nulls::c": 0}]
    rows_str = [{"basename": "b.parquet", "mtime_ns": 1, "size": 1, "ino": 2,
                 "rows": 10, "min::c": "x", "max::c": "z", "nulls::c": 0}]
    pq.write_table(_rows_to_table(rows_int), m._shard_path(0))
    pq.write_table(_rows_to_table(rows_str), m._shard_path(1))
    rel = m.relation()  # must not raise
    assert rel.num_rows == 2
    # the conflicting stat column is all-NULL -> elimination never fires
    assert rel.column("min::c").null_count == 2
    assert sorted(os.path.basename(p) for p in m.prune([("c", "=", 5)])) == [
        "a.parquet", "b.parquet",
    ]


def test_clean_refresh_fast_path(spark, sf_dir, tmp_path):
    """A second refresh over an unchanged table takes the fingerprint
    fast path: no shard is re-materialized, results identical."""
    t = _clustered(spark, sf_dir, tmp_path)
    m = ShardedManifest(t).refresh()
    before = set(m.prune(PREDS))
    m._shard_tables.clear()  # loading any shard would repopulate this
    m._shard_keys.clear()
    m.refresh()  # clean: fingerprint short-circuits before shard loads
    assert m._shard_keys == {}  # fast path touched no shard
    assert set(m.prune(PREDS)) == before


def test_refresh_dir_mtime_gate_skips_stat_pass(spark, tmp_path, monkeypatch):
    """A clean refresh of a quiescent table costs ONE directory stat,
    not O(files): the per-file stat pass is skipped when the dir mtime
    matches the memoized signature (outside the racy window); touching
    the table re-arms the pass."""
    import os

    import infinidb_spark.sources.manifest_sharded as ms

    t = str(tmp_path / "t")
    spark.range(200).selectExpr("id AS k", "id % 5 AS v").repartition(4).write.parquet(t)

    m = ms.ShardedManifest(t)
    monkeypatch.setattr(ms, "_DIR_SIG_RACY_NS", -1)
    m.refresh()

    calls = []
    real_member = ms._member_files
    monkeypatch.setattr(
        ms, "_member_files", lambda p: (calls.append(p), real_member(p))[1]
    )
    m.refresh()
    assert calls == []  # gated: zero per-file stats

    # a new file bumps the dir mtime → the stat pass runs again
    src_bytes = open(
        next(os.path.join(t, f) for f in sorted(os.listdir(t))
             if f.endswith(".parquet") and not f.startswith(("_", "."))),
        "rb",
    ).read()
    with open(os.path.join(t, "part-extra.parquet"), "wb") as fh:
        fh.write(src_bytes)
    m.refresh()
    assert len(calls) == 1


def test_refresh_failure_does_not_arm_dir_gate(spark, tmp_path, monkeypatch):
    """A refresh that dies mid-rebuild (torn footer) must NOT arm the
    dir-mtime gate: the retry after the file is fixed rescans and picks
    the change up (code-review r08: _dir_sig was set before the rebuild,
    so the retry served stale shards)."""
    import os

    import pytest

    import infinidb_spark.sources.manifest_sharded as ms

    t = str(tmp_path / "t")
    spark.range(50).selectExpr("id AS k").coalesce(1).write.parquet(t)
    monkeypatch.setattr(ms, "_DIR_SIG_RACY_NS", -1)
    m = ms.ShardedManifest(t)
    m.refresh()

    # torn new file: refresh stats it, then the footer harvest raises
    torn = os.path.join(t, "part-torn.parquet")
    open(torn, "wb").close()
    with pytest.raises(Exception):
        m.refresh()
    assert m._dir_sig is None  # gate disarmed by the failure

    # fix the file; the retry must rescan (same dir mtime would have
    # been served stale under the old early _dir_sig assignment)
    good = next(
        os.path.join(t, f) for f in sorted(os.listdir(t))
        if f.endswith(".parquet") and not f.startswith(("_", ".")) and "torn" not in f
    )
    with open(torn, "wb") as fh:
        fh.write(open(good, "rb").read())
    m.refresh()
    rel = m.relation()
    assert "part-torn.parquet" in rel.column("basename").to_pylist()


def test_manifest_dir_deletion_forces_rebuild(spark, tmp_path):
    """r10 review fix: deleting <table>.__manifest__ (the documented
    rebuild remedy) must purge a live instance's in-memory shard memo —
    it used to keep serving the stale stats from memory."""
    import os
    import shutil

    from infinidb_spark.sources.manifest_sharded import ShardedManifest

    table = str(tmp_path / "t")
    spark.range(100).selectExpr("id AS v").coalesce(1).write.parquet(table)
    m = ShardedManifest(table)
    m.refresh()
    assert m.relation().num_rows >= 1
    # simulate an external in-place rewrite + the documented remedy
    shutil.rmtree(table + ".__manifest__")
    import time

    time.sleep(0.01)
    m.refresh()
    # memo was dropped and the manifest dir rebuilt from footers
    assert os.path.isdir(table + ".__manifest__")
    assert m.relation().num_rows >= 1


def test_sharded_scan_single_file_path(spark, tmp_path):
    """r10 review fix: a single parquet FILE path must plain-scan with
    the residual filter, not fabricate '<file>/<file>' survivor paths."""
    import glob
    import os

    from infinidb_spark.sources.manifest_sharded import (
        scan_with_sharded_manifest,
    )

    d = str(tmp_path / "d")
    spark.range(50).selectExpr("id AS v").coalesce(1).write.parquet(d)
    f = glob.glob(os.path.join(d, "*.parquet"))[0]
    out = scan_with_sharded_manifest(spark, f, [("v", ">=", 40)])
    assert out.count() == 10
    assert not os.path.exists(f + ".__manifest__")


def test_rows_to_table_poisons_lossy_int_float_mix():
    """A stat column mixing floats with ints above 2^53 must poison
    (pa.array would infer float64 and ROUND the int — a rounded-up min
    mis-eliminates files holding matching rows)."""
    from infinidb_spark.sources.manifest_sharded import _rows_to_table

    big = 2**53 + 3
    rows = [
        {"basename": "a", "mtime_ns": 1, "size": 1, "ino": 1, "rows": 1,
         "min::k": big, "max::k": big, "nulls::k": 0},
        {"basename": "b", "mtime_ns": 1, "size": 1, "ino": 2, "rows": 1,
         "min::k": 1.5, "max::k": 2.5, "nulls::k": 0},
    ]
    t = _rows_to_table(rows)
    import pyarrow as pa

    assert pa.types.is_null(t.column("min::k").type)
    assert pa.types.is_null(t.column("max::k").type)
    # small ints + floats still promote exactly — no poisoning
    rows[0]["min::k"] = rows[0]["max::k"] = 7
    t2 = _rows_to_table(rows)
    assert not pa.types.is_null(t2.column("min::k").type)


def test_cross_shard_lossy_promotion_keeps_files(tmp_path, spark):
    """Across shards: an int64-stat shard above 2^53 merged with a
    float-stat shard must not round the min past the true value —
    prune keeps the file (conservative poisoning)."""
    import pyarrow as pa

    from infinidb_spark.sources.manifest_sharded import (
        _poison_lossy_promotions,
    )

    big = 2**53 + 3
    t1 = pa.table({"basename": ["a"], "min::k": [big], "max::k": [big]})
    t2 = pa.table({"basename": ["b"], "min::k": [1.5], "max::k": [2.5]})
    out = _poison_lossy_promotions([t1, t2])
    assert pa.types.is_null(out[0].column("min::k").type)
    # small values: untouched
    t3 = pa.table({"basename": ["a"], "min::k": [7], "max::k": [9]})
    out2 = _poison_lossy_promotions([t3, t2])
    assert out2[0].column("min::k").to_pylist() == [7]


def test_pred_sql_escapes_quoted_identifier():
    from infinidb_spark.sources.manifest_sharded import _pred_sql

    avail = {'min::a"b', 'max::a"b'}
    clause, params = _pred_sql(('a"b', "=", 5), avail)
    assert '"min::a""b"' in clause and params == [5, 5]


def test_refresh_tolerates_vanished_file(spark, tmp_path, monkeypatch):
    """A file unlinked between the stat pass and the footer read must
    not crash the refresh, must not be recorded as present, and must
    leave the clean gates disarmed so the retry re-harvests."""
    import os

    import infinidb_spark.sources.manifest_sharded as ms

    table = str(tmp_path / "van_t")
    spark.range(100).withColumnRenamed("id", "k").coalesce(2).write.parquet(table)
    m = ms.ShardedManifest(table)

    real_harvest = ms._harvest_file
    blown = {}

    def flaky(path):
        if not blown:
            blown["x"] = os.path.basename(path)
            raise OSError("vanished")
        return real_harvest(path)

    monkeypatch.setattr(ms, "_harvest_file", flaky)
    m.refresh()
    assert m._clean_fp is None  # gates stay disarmed after a skip
    listed = {
        b for keys in m._shard_keys.values() for b in keys
    }
    assert blown["x"] not in listed  # never recorded as present
    # retry harvests the skipped file and re-arms
    m.refresh()
    assert m._clean_fp is not None
    files = m.prune([("k", ">=", 0)])
    assert len(files) == 2


def test_quantified_filter_dotted_column(spark):
    from pyspark.sql import functions as F

    from infinidb_spark.operators.quantified import quantified_filter

    df = spark.createDataFrame([(1,), (5,), (9,)], "x long")
    sub = spark.createDataFrame([(4.0,), (2.0,)], "p double").selectExpr(
        "p AS `price.usd`"
    )
    got = sorted(
        r.x for r in quantified_filter(df, F.col("x"), ">", sub, "all").collect()
    )
    assert got == [5, 9]


def test_write_table_cluster_by_range_shuffles(spark, tmp_path):
    """cluster_by without partition_by must range-shuffle first: each
    output file's min/max covers a narrow slice, so stats eliminate —
    a local sort of hash-distributed input left every file spanning
    the full domain (zero elimination)."""
    import pyarrow.parquet as pq

    from infinidb_spark.sources.table_write import write_table

    df = spark.range(10_000).withColumnRenamed("id", "k").repartition(8)
    path = str(tmp_path / "clus_t")
    # max_records_per_file splits each (sorted) partition sequentially:
    # with the range shuffle the resulting files are disjoint slices;
    # under the old local-sort-only shape every file spanned the full
    # domain regardless of the split
    write_table(df, path, cluster_by=["k"], max_records_per_file=2000)
    import glob as _g

    spans = []
    for f in _g.glob(path + "/part-*.parquet"):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        spans.append((min(mins), max(maxs)))
    assert len(spans) > 1
    spans.sort()
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # disjoint ranges: range partitioning happened
