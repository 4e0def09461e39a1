"""Optimistic concurrent writers — snapshot-isolation copy-on-write.

Reference semantics: the version buffer admits concurrent writers with
snapshot readers and rejects a second writer touching a VB-resident
block (`versioning/BRM/vss.h:180-210`).  The rebuild's analog: writers
on DISJOINT rows of one table all commit (the later one rebases, i.e.
serializes after the winner); TRUE row overlap aborts the later
committer (first committer wins).
"""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

from infinidb_spark.operators.dml import (
    ConcurrentWriteConflict,
    _pins_dir,
    create_table,
    delete_from_optimistic,
    read_table,
    update_table,
    update_table_optimistic,
)


def _mk_table(spark, tmp_path, n=1000):
    t = str(tmp_path / "t")
    df = spark.range(n).select(
        F.col("id").cast("bigint").alias("k"),
        (F.col("id") % 10).cast("int").alias("grp"),
        F.lit(0).cast("int").alias("v"),
    )
    create_table(df, t)
    return t


def _no_debris(t):
    """No leftover pins, locks, or orphan version dirs besides the live one."""
    parent, base = os.path.dirname(t), os.path.basename(t)
    live = os.path.basename(os.path.realpath(t))
    debris = [
        f for f in os.listdir(parent)
        if f.startswith(base + ".__") and f != live
        and not f.endswith((".__pins__", ".__retain__"))
    ]
    pins = os.listdir(_pins_dir(t)) if os.path.isdir(_pins_dir(t)) else []
    return debris == [] and pins == []


def test_disjoint_writers_both_commit_interleaved(spark, tmp_path):
    """Deterministic interleave via the _before_commit hook: writer B
    builds its rewrite from the pre-A snapshot, A commits, B detects the
    stale snapshot, proves disjointness, rebases, commits."""
    t = _mk_table(spark, tmp_path)

    def a_commits():
        assert update_table(spark, t, F.col("k") < 100, {"v": F.lit(1)}) == 100

    n = update_table_optimistic(
        spark, t, F.col("k") >= 900, {"v": F.lit(2)}, _before_commit=a_commits
    )
    assert n == 100
    out = read_table(spark, t)
    assert out.filter((F.col("k") < 100) & (F.col("v") == 1)).count() == 100
    assert out.filter((F.col("k") >= 900) & (F.col("v") == 2)).count() == 100
    assert out.filter(F.col("v") == 0).count() == 800
    assert out.count() == 1000
    assert _no_debris(t)


def test_overlap_aborts_later_committer(spark, tmp_path):
    t = _mk_table(spark, tmp_path)

    def a_commits():
        update_table(spark, t, F.col("k") < 100, {"v": F.lit(1)})

    with pytest.raises(ConcurrentWriteConflict, match="first committer wins"):
        update_table_optimistic(
            spark, t, F.col("k") < 50, {"v": F.lit(2)}, _before_commit=a_commits
        )
    out = read_table(spark, t)
    # A's effect intact, B fully rolled back
    assert out.filter(F.col("v") == 1).count() == 100
    assert out.filter(F.col("v") == 2).count() == 0
    assert out.count() == 1000
    assert _no_debris(t)


def test_overlap_via_moved_row_detected(spark, tmp_path):
    """A moves rows INTO B's predicate range — the post-image diff must
    catch it even though B's predicate matched nothing A touched at
    B's snapshot."""
    t = _mk_table(spark, tmp_path)

    def a_commits():
        # moves k 0..99 into grp 99
        update_table(spark, t, F.col("k") < 100, {"grp": F.lit(99)})

    with pytest.raises(ConcurrentWriteConflict):
        update_table_optimistic(
            spark, t, F.col("grp") == 99, {"v": F.lit(5)}, _before_commit=a_commits
        )
    assert _no_debris(t)


def test_delete_disjoint_rebases(spark, tmp_path):
    t = _mk_table(spark, tmp_path)

    def a_commits():
        update_table(spark, t, F.col("k") < 10, {"v": F.lit(7)})

    n = delete_from_optimistic(
        spark, t, F.col("k") >= 990, _before_commit=a_commits
    )
    assert n == 10
    out = read_table(spark, t)
    assert out.count() == 990
    assert out.filter(F.col("v") == 7).count() == 10
    assert _no_debris(t)


def test_concurrent_insert_is_a_snapshot_change(spark, tmp_path):
    """An INSERT lands in the SAME version directory (append, no swap) —
    the content token must still register it, or the stale rewrite would
    silently DROP the inserted rows.  With no pre-images to conflict
    with, the statement rebases: it serializes after the INSERT, so the
    inserted rows are visible to (and updated by) the re-execution."""
    from infinidb_spark.operators.dml import insert_into

    t = _mk_table(spark, tmp_path)

    def a_inserts():
        extra = spark.range(1000, 1010).select(
            F.col("id").cast("bigint").alias("k"),
            F.lit(0).cast("int").alias("grp"),
            F.lit(0).cast("int").alias("v"),
        )
        insert_into(extra, t)

    n = update_table_optimistic(
        spark, t, F.col("k") >= 1000, {"v": F.lit(3)}, _before_commit=a_inserts
    )
    out = read_table(spark, t)
    assert out.count() == 1010          # nothing dropped by the stale rewrite
    assert n == 10
    assert out.filter(F.col("v") == 3).count() == 10
    assert _no_debris(t)


def test_concurrent_insert_disjoint_rebase_keeps_rows(spark, tmp_path):
    from infinidb_spark.operators.dml import insert_into

    t = _mk_table(spark, tmp_path)

    def a_inserts():
        extra = spark.range(2000, 2005).select(
            F.col("id").cast("bigint").alias("k"),
            F.lit(0).cast("int").alias("grp"),
            F.lit(0).cast("int").alias("v"),
        )
        insert_into(extra, t)

    n = update_table_optimistic(
        spark, t, F.col("k") < 100, {"v": F.lit(4)}, _before_commit=a_inserts
    )
    assert n == 100
    out = read_table(spark, t)
    # the rebase re-read includes the concurrently-inserted rows
    assert out.count() == 1005
    assert out.filter(F.col("v") == 4).count() == 100
    assert _no_debris(t)


def test_two_threads_disjoint_ranges_both_commit(spark, tmp_path):
    """The VERDICT-r05 acceptance scenario: two real concurrent writers
    on disjoint key ranges of ONE table; both must commit whatever the
    interleaving."""
    t = _mk_table(spark, tmp_path)
    errs: list[Exception] = []

    def run(lo, hi, tag):
        try:
            update_table_optimistic(
                spark, t, (F.col("k") >= lo) & (F.col("k") < hi),
                {"v": F.lit(tag)}, lock_timeout=120.0,
            )
        except Exception as e:  # pragma: no cover - failure surface
            errs.append(e)

    th1 = threading.Thread(target=run, args=(0, 100, 11))
    th2 = threading.Thread(target=run, args=(900, 1000, 22))
    th1.start(); th2.start(); th1.join(); th2.join()
    assert errs == []
    out = read_table(spark, t)
    assert out.filter(F.col("v") == 11).count() == 100
    assert out.filter(F.col("v") == 22).count() == 100
    assert out.count() == 1000
    assert _no_debris(t)


def test_session_sysvar_routes_to_optimistic(spark, monkeypatch):
    """SET infinidb_concurrent_dml=1 routes UPDATE/DELETE through the
    optimistic path (and the statements still work end-to-end)."""
    import shutil

    import infinidb_spark.operators.dml as dml
    from infinidb_spark.session import InfiniSession

    calls = []
    orig = dml.update_table_optimistic

    def spy(*a, **k):
        calls.append("optimistic")
        return orig(*a, **k)

    sess = InfiniSession(spark)
    try:
        sess.execute("CREATE TABLE ot (k BIGINT, v BIGINT)")
        sess.execute("INSERT INTO ot VALUES (1, 0), (2, 0), (3, 0)")
        sess.execute("SET infinidb_concurrent_dml = 1")
        monkeypatch.setattr(dml, "update_table_optimistic", spy)
        n = sess.execute("UPDATE ot SET v = 5 WHERE k <= 2")
        assert n == 2 and calls == ["optimistic"]
        n = sess.execute("DELETE FROM ot WHERE k = 3")
        assert n == 1
        assert sess.sql("SELECT sum(v) FROM ot").collect()[0][0] == 10
        sess.execute("SET infinidb_concurrent_dml = 0")
        n = sess.execute("UPDATE ot SET v = 6 WHERE k = 1")
        assert n == 1 and calls == ["optimistic"]  # back on the locked path
    finally:
        if sess._managed_root:
            shutil.rmtree(sess._managed_root, ignore_errors=True)


def test_retry_exhaustion_gives_up_cleanly(spark, tmp_path):
    t = _mk_table(spark, tmp_path)

    def a_commits():
        update_table(spark, t, F.col("k") < 10, {"v": F.lit(1)})

    with pytest.raises(ConcurrentWriteConflict, match="giving up"):
        update_table_optimistic(
            spark, t, F.col("k") >= 500, {"v": F.lit(9)},
            max_retries=0, _before_commit=a_commits,
        )
    assert _no_debris(t)


def test_update_where_on_assigned_column_sets_all_columns(spark, tmp_path):
    """WHERE is evaluated against the ORIGINAL row: an UPDATE that sets
    the very column its WHERE references must still apply EVERY later
    assignment to the matched rows (a chained re-evaluation of the
    predicate against already-assigned columns silently skipped them)."""
    t = _mk_table(spark, tmp_path, n=100)
    n = update_table(spark, t, F.col("v") == 0, {"v": F.lit(1), "grp": F.lit(77)})
    assert n == 100
    out = read_table(spark, t)
    assert out.filter((F.col("v") == 1) & (F.col("grp") == 77)).count() == 100


def test_optimistic_update_where_on_assigned_column(spark, tmp_path):
    t = _mk_table(spark, tmp_path, n=100)
    n = update_table_optimistic(
        spark, t, F.col("v") == 0, {"v": F.lit(1), "grp": F.lit(77)}
    )
    assert n == 100
    out = read_table(spark, t)
    assert out.filter((F.col("v") == 1) & (F.col("grp") == 77)).count() == 100
    assert _no_debris(t)


def test_pruned_update_where_on_assigned_column(spark, tmp_path):
    from infinidb_spark.operators.dml import update_table_pruned

    t = _mk_table(spark, tmp_path, n=100)
    n = update_table_pruned(
        spark, t, [("v", "=", 0)], {"v": F.lit(1), "grp": F.lit(77)}
    )
    assert n == 100
    out = read_table(spark, t)
    assert out.filter((F.col("v") == 1) & (F.col("grp") == 77)).count() == 100


def test_set_exprs_see_updated_values_left_to_right(spark, tmp_path):
    """MySQL: UPDATE t SET v = v+1, grp = v assigns the NEW v to grp —
    pinning the WHERE must not freeze the assignment expressions."""
    t = _mk_table(spark, tmp_path, n=10)
    update_table(spark, t, F.col("k") >= 0, {"v": F.col("v") + 1, "grp": F.col("v")})
    out = read_table(spark, t)
    assert out.filter((F.col("v") == 1) & (F.col("grp") == 1)).count() == 10


def test_concurrent_insert_survives_optimistic_commit(spark, tmp_path):
    """An INSERT landing between a committer's rewrite and its commit
    is never dropped: the snapshot token changes, the committer proves
    disjointness against the inserted rows and rebases over them."""
    from infinidb_spark.operators.dml import insert_into

    t = _mk_table(spark, tmp_path, n=100)

    def b_inserts():
        rows = spark.range(100, 110).select(
            F.col("id").cast("bigint").alias("k"),
            F.lit(99).cast("int").alias("grp"),
            F.lit(1).cast("int").alias("v"),  # does NOT match the UPDATE's WHERE
        )
        insert_into(rows, t)

    n = update_table_optimistic(
        spark, t, F.col("v") == 0, {"v": F.lit(5)}, _before_commit=b_inserts
    )
    assert n == 100
    out = read_table(spark, t)
    assert out.count() == 110                      # inserted rows survived the swap+GC
    assert out.filter(F.col("v") == 5).count() == 100
    assert out.filter((F.col("grp") == 99) & (F.col("v") == 1)).count() == 10
    assert _no_debris(t)


def test_insert_waits_for_table_lock(spark, tmp_path):
    """insert_into serializes with rewriters: while a writer holds the
    table lock, an insert waits (bounded) instead of appending into a
    version directory the writer may GC."""
    from infinidb_spark.operators.dml import _table_lock, insert_into

    t = _mk_table(spark, tmp_path, n=10)
    rows = spark.range(10, 12).select(
        F.col("id").cast("bigint").alias("k"),
        F.lit(0).cast("int").alias("grp"),
        F.lit(0).cast("int").alias("v"),
    )
    cm = _table_lock(t, "UPDATE")
    cm.__enter__()
    try:
        with pytest.raises(RuntimeError, match="locked"):
            insert_into(rows, t, lock_timeout=0.3)
    finally:
        cm.__exit__(None, None, None)
    insert_into(rows, t)
    assert read_table(spark, t).count() == 12


def test_finished_holder_does_not_release_anothers_lock(tmp_path):
    """A holder's release must be ownership-checked: after an operator
    clears H1's lock as stale and H2 acquires, H1 finishing must NOT
    free H2's lock (that would let a third writer race H2)."""
    from infinidb_spark.operators.dml import (
        _table_lock,
        clear_table_lock,
        view_table_locks,
    )

    t = str(tmp_path / "t")
    root = str(tmp_path)
    cm1 = _table_lock(t, "UPDATE")
    cm1.__enter__()
    (rec1,) = view_table_locks(root, "t")
    assert "cleared" in clear_table_lock(root, rec1["lock_id"])
    cm2 = _table_lock(t, "DELETE")
    cm2.__enter__()
    cm1.__exit__(None, None, None)  # H1 finishes — must not free H2's lock
    (rec2,) = view_table_locks(root, "t")
    assert rec2["op"] == "DELETE"
    cm2.__exit__(None, None, None)
    assert view_table_locks(root, "t") == []


def test_corrupt_lock_visible_and_clearable_by_table_name(tmp_path):
    """A writer crashing between the O_EXCL create and the JSON flush
    leaves an empty lock file: it must show up in the lock listing
    (lock_id None) and be clearable by TABLE NAME — the advertised
    recovery path, not a manual rm."""
    from infinidb_spark.operators.dml import (
        _table_lock,
        clear_table_lock,
        view_table_locks,
    )

    t = str(tmp_path / "t")
    open(t + ".__lock__", "w").close()
    (rec,) = view_table_locks(str(tmp_path), "t")
    assert rec["lock_id"] is None
    with pytest.raises(RuntimeError, match="locked"):
        _table_lock(t, "UPDATE").__enter__()
    assert clear_table_lock(str(tmp_path), "t") == "Lock t is cleared"
    assert view_table_locks(str(tmp_path), "t") == []


def test_concurrent_dml_sysvar_is_case_insensitive(spark, monkeypatch):
    """MySQL boolean sysvars accept on/ON/TRUE/1 — every spelling must
    route to the optimistic path."""
    import shutil

    import infinidb_spark.operators.dml as dml
    from infinidb_spark.session import InfiniSession

    calls = []
    orig = dml.update_table_optimistic

    def spy(*a, **k):
        calls.append("optimistic")
        return orig(*a, **k)

    sess = InfiniSession(spark)
    try:
        sess.execute("CREATE TABLE oc (k BIGINT, v BIGINT)")
        sess.execute("INSERT INTO oc VALUES (1, 0), (2, 0)")
        monkeypatch.setattr(dml, "update_table_optimistic", spy)
        for i, spelling in enumerate(["on", "TRUE", "On", "1"]):
            sess.execute(f"SET infinidb_concurrent_dml = {spelling}")
            assert sess.execute(f"UPDATE oc SET v = {i + 1} WHERE k = 1") == 1
        assert calls == ["optimistic"] * 4
        sess.execute("SET infinidb_concurrent_dml = off")
        assert sess.execute("UPDATE oc SET v = 9 WHERE k = 2") == 1
        assert calls == ["optimistic"] * 4  # off -> pessimistic path
    finally:
        if sess._managed_root:
            shutil.rmtree(sess._managed_root, ignore_errors=True)


def test_conflict_diff_reads_only_changed_files(spark, tmp_path, monkeypatch):
    """The disjoint-rebase overlap probe on an N-file table reads
    O(changed) files, not O(N) — the VB tracks changed blocks, never
    the whole table (versioning/BRM/vss.h:180).  Winner here is
    caldroppartitions (hard-links N-1 survivors into the new version),
    so exactly ONE file differs between the pinned snapshots."""
    import infinidb_spark.operators.dml as dml
    from infinidb_spark.operators.partitions import drop_partitions

    t = str(tmp_path / "t")
    df = spark.range(1000).select(
        F.col("id").cast("bigint").alias("k"),
        F.lit(0).cast("int").alias("v"),
    ).repartition(8)  # N = 8 part files
    dml.create_table(df, t)
    real = os.path.realpath(t)
    parts = sorted(
        f for f in os.listdir(real)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    assert len(parts) == 8
    victim = parts[0]
    dropped_rows = spark.read.parquet(os.path.join(real, victim)).count()
    assert dropped_rows > 0  # the victim really holds rows

    read_calls: list[list[str]] = []
    orig = dml._read_files

    def spy(sp, vdir, rels):
        read_calls.append(list(rels))
        return orig(sp, vdir, rels)

    monkeypatch.setattr(dml, "_read_files", spy)

    def winner_drops_one_file():
        drop_partitions(t, [victim])  # hard-links the 7 survivors

    pred = F.col("k") == -1  # matches nothing: guaranteed disjoint
    n = dml.update_table_optimistic(
        spark, t, pred, {"v": F.lit(2)}, _before_commit=winner_drops_one_file
    )
    assert n == 0
    assert read_table(spark, t).count() == 1000 - dropped_rows
    # the overlap probe read exactly the ONE dropped file, never all 8
    assert read_calls, "file-level diff path was not taken"
    assert all(len(c) <= 1 for c in read_calls), read_calls
    assert sum(len(c) for c in read_calls) == 1


def test_writer_killed_before_commit_is_garbage_collected(spark, tmp_path):
    """Chaos: SIGKILL a writer between rewrite-build and commit; the
    next writer GCs the orphan version dir and the dead pin and
    proceeds (the stale-lock recovery analog for snapshots —
    _pinned_versions' dead-pid GC)."""
    import signal
    import subprocess
    import sys
    import textwrap
    import time as _time

    t = _mk_table(spark, tmp_path, n=200)
    marker = str(tmp_path / "built")

    child_src = textwrap.dedent(f"""
        import os, time
        from pyspark.sql import functions as F
        from infinidb_spark.session import get_spark
        from infinidb_spark.operators.dml import update_table_optimistic
        spark = get_spark("victim", cpus=2)
        spark.sparkContext.setLogLevel("ERROR")

        def stall():
            open({marker!r}, "w").close()
            time.sleep(600)   # hold the built rewrite + pin; parent kills us

        update_table_optimistic(
            spark, {t!r}, F.col("k") < 50, {{"v": F.lit(9)}},
            _before_commit=stall,
        )
    """)
    proc = subprocess.Popen(
        [sys.executable, "-c", child_src],
        cwd="/root/repo",
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        deadline = _time.monotonic() + 180
        while not os.path.exists(marker):
            assert proc.poll() is None, "victim writer died before building"
            assert _time.monotonic() < deadline, "victim never built its rewrite"
            _time.sleep(0.5)
        # killed between rewrite-build and commit: pin + version orphaned
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()

    pins = os.listdir(_pins_dir(t))
    assert pins, "victim should have left a pin behind"
    parent, base = os.path.dirname(t), os.path.basename(t)

    # next writer proceeds despite the orphan state...
    n = update_table_optimistic(spark, t, F.col("k") >= 150, {"v": F.lit(3)})
    assert n == 50
    out = read_table(spark, t)
    assert out.filter(F.col("v") == 9).count() == 0  # victim never committed
    assert out.filter(F.col("v") == 3).count() == 50
    assert out.count() == 200

    # ...and the dead pid's pin is gone (dead-pid GC)
    assert os.listdir(_pins_dir(t)) == [] if os.path.isdir(_pins_dir(t)) else True
    # the victim's orphan version dir is GC-able: no version dir other
    # than the live one survives the next writer's GC pass
    live = os.path.basename(os.path.realpath(t))
    orphans = [
        f for f in os.listdir(parent)
        if f.startswith(base + ".__v") and f != live
    ]
    assert orphans == [], orphans


def test_conflict_diff_on_partitioned_table(spark, tmp_path):
    """The file-level overlap probe must keep Hive-partition columns
    (basePath read): a partitioned table's conflict rebase used to work
    through read_table, and the O(changed) path must too."""
    import infinidb_spark.operators.dml as dml

    t = str(tmp_path / "tp")
    df = spark.range(400).select(
        F.col("id").cast("bigint").alias("k"),
        (F.col("id") % 4).cast("int").alias("p"),
        F.lit(0).cast("int").alias("v"),
    )
    dml.create_table(df, t, partition_by=["p"])

    def winner():
        # plain full rewrite on disjoint rows (flattens partitioning)
        dml.update_table(spark, t, F.col("k") < 50, {"v": F.lit(1)})

    n = dml.update_table_optimistic(
        spark, t, F.col("k") >= 350, {"v": F.lit(2)}, _before_commit=winner
    )
    assert n == 50
    out = dml.read_table(spark, t)
    assert out.filter((F.col("k") < 50) & (F.col("v") == 1)).count() == 50
    assert out.filter((F.col("k") >= 350) & (F.col("v") == 2)).count() == 50
    assert out.count() == 400


def test_insert_then_swap_winner_rebases_not_aborts(spark, tmp_path):
    """A file INSERTed into the pinned snapshot dir AFTER pinning, then
    carried into a winner's rewrite, is a phantom — the changed-file
    probe must re-walk the pinned dirs at diff time (a pin-time identity
    map would see those rows only on the winner's side and abort)."""
    import infinidb_spark.operators.dml as dml

    t = _mk_table(spark, tmp_path, n=100)

    def winner():
        extra = spark.range(1000, 1005).select(
            F.col("id").cast("bigint").alias("k"),
            F.lit(0).cast("int").alias("grp"),
            F.lit(0).cast("int").alias("v"),
        )
        dml.insert_into(extra, t)  # appends into OUR pinned snapshot dir
        # swap winner whose rewrite carries the inserted rows
        update_table(spark, t, F.col("k") < 10, {"v": F.lit(1)})

    # predicate matches ONLY the concurrently-inserted rows
    n = update_table_optimistic(
        spark, t, F.col("k") >= 1000, {"v": F.lit(2)}, _before_commit=winner
    )
    assert n == 5
    out = read_table(spark, t)
    assert out.count() == 105
    assert out.filter(F.col("v") == 2).count() == 5
    assert out.filter(F.col("v") == 1).count() == 10
    assert _no_debris(t)


def test_snapshot_stats_o_changed_dirs(tmp_path, monkeypatch):
    """_snapshot is O(directories) + O(changed-dir files), not O(files):
    a warm snapshot of a quiescent N-file table re-lists ZERO
    directories; touching one subdirectory re-lists exactly that one.
    The reference keeps its extent map memory-resident for the same
    per-statement-identity reason (versioning/BRM/extentmap.h:116)."""
    from infinidb_spark.operators import dml

    root = tmp_path / "t"
    for d in range(6):
        sub = root / f"part={d}"
        sub.mkdir(parents=True)
        for f in range(20):
            (sub / f"f{f}.parquet").write_bytes(b"x" * (d + f + 1))

    # disable the racily-clean guard: the files were just written, and
    # the test asserts the steady-state (quiescent-table) behavior
    monkeypatch.setattr(dml, "_SNAP_RACY_NS", -1)
    dml._SNAP_CACHE.clear()

    calls: list[str] = []
    real_scan = dml._scan_dir

    def counting_scan(d):
        calls.append(d)
        return real_scan(d)

    monkeypatch.setattr(dml, "_scan_dir", counting_scan)

    _, tok1, entries1 = dml._snapshot(str(root))
    assert len(entries1) == 120
    assert len(calls) == 7  # root + 6 subdirs, cold

    calls.clear()
    _, tok2, entries2 = dml._snapshot(str(root))
    assert calls == []  # warm: zero directory listings, zero file stats
    assert (tok2, entries2) == (tok1, entries1)

    # one new file in one subdir → exactly that directory re-listed
    (root / "part=3" / "f_new.parquet").write_bytes(b"y" * 9)
    calls.clear()
    _, tok3, entries3 = dml._snapshot(str(root))
    assert [os.path.basename(c) for c in calls] == ["part=3"]
    assert tok3 != tok1 and len(entries3) == 121

    # deleting it restores the original token (content-addressed)
    (root / "part=3" / "f_new.parquet").unlink()
    calls.clear()
    _, tok4, _ = dml._snapshot(str(root))
    assert [os.path.basename(c) for c in calls] == ["part=3"]
    assert tok4 == tok1
    dml._SNAP_CACHE.clear()


def test_snapshot_racy_window_always_rescans(tmp_path, monkeypatch):
    """Directories modified within the racy window are rescanned AND not
    cached — a same-tick concurrent writer can never alias."""
    from infinidb_spark.operators import dml

    root = tmp_path / "t"
    root.mkdir()
    (root / "a.parquet").write_bytes(b"x")

    dml._SNAP_CACHE.clear()
    calls: list[str] = []
    real_scan = dml._scan_dir
    monkeypatch.setattr(dml, "_scan_dir", lambda d: (calls.append(d), real_scan(d))[1])

    # default window (0.5 s) — the directory was JUST written
    dml._snapshot(str(root))
    dml._snapshot(str(root))
    assert len(calls) == 2  # no cache hit inside the window
    assert str(root) not in dml._SNAP_CACHE
    dml._SNAP_CACHE.clear()


def test_lock_file_is_per_holder_and_release_is_own_unlink(tmp_path):
    """The lock file name carries the holder id
    (<table>.__lock__.<lock_id>), so release/clear unlink one specific
    holder's file and can never free a later holder's lock; an
    unflushed holder is clearable BY ID from the name alone."""
    from infinidb_spark.operators.dml import (
        _table_lock,
        clear_table_lock,
        view_table_locks,
    )

    t = str(tmp_path / "t")
    cm = _table_lock(t, "UPDATE")
    cm.__enter__()
    (lockfile,) = [f for f in os.listdir(tmp_path) if ".__lock__" in f]
    (rec,) = view_table_locks(str(tmp_path), "t")
    assert lockfile == f"t.__lock__.{rec['lock_id']}"
    with pytest.raises(RuntimeError, match="locked"):
        _table_lock(t, "DELETE").__enter__()
    cm.__exit__(None, None, None)
    assert view_table_locks(str(tmp_path), "t") == []

    # crashed-before-flush holder: empty named file → id from the NAME
    open(t + ".__lock__.424242", "w").close()
    (rec,) = view_table_locks(str(tmp_path), "t")
    assert rec["lock_id"] == 424242
    assert "cleared" in clear_table_lock(str(tmp_path), 424242)
    assert view_table_locks(str(tmp_path), "t") == []
