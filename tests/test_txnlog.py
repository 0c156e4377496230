"""Transactional table format (operators/txnlog.py): atomic commits,
optimistic concurrency via the os.link version claim, snapshot
isolation, time travel, transactional MERGE/DELETE, and vacuum with a
retention floor — the ACID properties the round-8 verdict listed as
the repo's residual gap #2.
"""

from __future__ import annotations

import json
import os

import pytest

from eggv_spark.operators import txnlog as T


def _rows(spark, df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, tmp_path, rows, name="t"):
    table = str(tmp_path / name)
    df = spark.createDataFrame(rows, "k long, v string")
    T.create(df, table)
    return table


# ---------------------------------------------------------------------------
# create / append / read / history
# ---------------------------------------------------------------------------


def test_create_append_read(spark, tmp_path):
    table = _mk(spark, tmp_path, [(1, "a"), (2, "b")])
    assert T.append(spark.createDataFrame([(3, "c")], "k long, v string"),
                    table) == 2
    got = _rows(spark, T.read(spark, table))
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    ops = [e["op"] for e in T.history(table)]
    assert ops == ["create", "append"]


def test_create_refuses_existing(spark, tmp_path):
    table = _mk(spark, tmp_path, [(1, "a")])
    with pytest.raises(FileExistsError):
        T.create(spark.createDataFrame([(9, "z")], "k long, v string"),
                 table)


def test_time_travel_reads_every_version(spark, tmp_path):
    table = _mk(spark, tmp_path, [(1, "a")])
    T.append(spark.createDataFrame([(2, "b")], "k long, v string"), table)
    T.overwrite(spark.createDataFrame([(9, "z")], "k long, v string"),
                table, based_on=2)
    assert _rows(spark, T.read(spark, table, version=1)) == [(1, "a")]
    assert _rows(spark, T.read(spark, table, version=2)) == [
        (1, "a"), (2, "b")]
    assert _rows(spark, T.read(spark, table, version=3)) == [(9, "z")]
    assert _rows(spark, T.read(spark, table)) == [(9, "z")]
    with pytest.raises(ValueError, match="not in log"):
        T.read(spark, table, version=7)


# ---------------------------------------------------------------------------
# atomicity: data staged before the log names it
# ---------------------------------------------------------------------------


def test_staged_but_uncommitted_data_is_invisible(spark, tmp_path):
    table = _mk(spark, tmp_path, [(1, "a")])
    # simulate a writer that crashed after staging, before the commit
    T._stage_data(
        spark.createDataFrame([(99, "ghost")], "k long, v string"),
        table, 2,
    )
    assert _rows(spark, T.read(spark, table)) == [(1, "a")]
    # and vacuum reclaims the garbage (writers quiesced -> retention 0)
    out = T.vacuum(table, keep_versions=1, retention_seconds=0)
    assert len(out["deleted"]) == 1 and "v2-" in out["deleted"][0]
    assert _rows(spark, T.read(spark, table)) == [(1, "a")]


# ---------------------------------------------------------------------------
# optimistic concurrency: the version-claim race
# ---------------------------------------------------------------------------


def test_append_auto_retries_a_lost_race(spark, tmp_path):
    table = _mk(spark, tmp_path, [(1, "a")])
    # another writer claims v2 between our read and our commit: simulate
    # by pre-writing the v2 entry the way a rival commit would
    rival = spark.createDataFrame([(5, "rival")], "k long, v string")
    rel = T._stage_data(rival, table, 2)
    assert T._try_commit(table, 2, {
        "op": "append", "version": 2, "add": [rel], "remove": [],
        "schema": "struct<k:bigint,v:string>", "ts_unix": 0,
    })
    v = T.append(spark.createDataFrame([(3, "c")], "k long, v string"),
                 table)
    assert v == 3  # retried onto the next version, nothing lost
    assert _rows(spark, T.read(spark, table)) == [
        (1, "a"), (3, "c"), (5, "rival")]


def test_replace_commit_raises_on_stale_base(spark, tmp_path):
    table = _mk(spark, tmp_path, [(1, "a")])
    T.append(spark.createDataFrame([(2, "b")], "k long, v string"), table)
    with pytest.raises(T.ConcurrentWriteError, match="head is v2"):
        T.overwrite(
            spark.createDataFrame([(9, "z")], "k long, v string"),
            table, based_on=1,
        )
    # the losing overwrite must not have changed anything
    assert _rows(spark, T.read(spark, table)) == [(1, "a"), (2, "b")]


def test_try_commit_is_exclusive(spark, tmp_path):
    table = _mk(spark, tmp_path, [(1, "a")])
    e = {"op": "x", "version": 2, "add": [], "remove": []}
    assert T._try_commit(table, 2, e) is True
    assert T._try_commit(table, 2, e) is False  # second claim loses


# ---------------------------------------------------------------------------
# snapshot isolation: a resolved file set is immune to later commits
# ---------------------------------------------------------------------------


def test_reader_snapshot_survives_concurrent_overwrite(spark, tmp_path):
    table = _mk(spark, tmp_path, [(1, "a"), (2, "b")])
    snapshot = T.read(spark, table)  # resolves the v1 file set NOW
    T.overwrite(spark.createDataFrame([(9, "z")], "k long, v string"),
                table, based_on=1)
    # the overwrite adds new files and removes v1 from the HEAD, but
    # the already-resolved reader still sees its snapshot
    assert _rows(spark, snapshot) == [(1, "a"), (2, "b")]
    assert _rows(spark, T.read(spark, table)) == [(9, "z")]


# ---------------------------------------------------------------------------
# transactional MERGE / DELETE
# ---------------------------------------------------------------------------


def test_merge_upsert_updates_win_survivors_carry(spark, tmp_path):
    table = _mk(spark, tmp_path, [(1, "a"), (2, "b"), (3, "c")])
    updates = spark.createDataFrame(
        [(2, "B2"), (4, "d")], "k long, v string"
    )
    v = T.merge_upsert(spark, updates, table, ["k"])
    assert v == 2
    assert _rows(spark, T.read(spark, table)) == [
        (1, "a"), (2, "B2"), (3, "c"), (4, "d")]
    # time travel still shows the pre-merge state
    assert _rows(spark, T.read(spark, table, version=1)) == [
        (1, "a"), (2, "b"), (3, "c")]


def test_delete_rows(spark, tmp_path):
    table = _mk(spark, tmp_path, [(1, "a"), (2, "b"), (3, "c")])
    T.delete_rows(spark, table, "k = 2")
    assert _rows(spark, T.read(spark, table)) == [(1, "a"), (3, "c")]


def test_merge_is_idempotent_under_rerun(spark, tmp_path):
    """Re-running the same MERGE (the backfill re-run case) converges:
    same final rows, one more version."""
    table = _mk(spark, tmp_path, [(1, "a"), (2, "b")])
    updates = spark.createDataFrame([(2, "B2")], "k long, v string")
    T.merge_upsert(spark, updates, table, ["k"])
    T.merge_upsert(spark, updates, table, ["k"])
    assert _rows(spark, T.read(spark, table)) == [(1, "a"), (2, "B2")]
    assert len(T.history(table)) == 3


# ---------------------------------------------------------------------------
# vacuum: retention floor + time-travel interaction
# ---------------------------------------------------------------------------


def test_vacuum_respects_retention_floor(spark, tmp_path):
    table = _mk(spark, tmp_path, [(1, "a")])
    T.overwrite(spark.createDataFrame([(2, "b")], "k long, v string"),
                table, based_on=1)
    T.overwrite(spark.createDataFrame([(3, "c")], "k long, v string"),
                table, based_on=2)
    out = T.vacuum(table, keep_versions=2, retention_seconds=0)
    # v1's data (only referenced by version 1) is reclaimed
    assert len(out["deleted"]) == 1 and "v1-" in out["deleted"][0]
    # retained versions still read fine
    assert _rows(spark, T.read(spark, table, version=2)) == [(2, "b")]
    assert _rows(spark, T.read(spark, table, version=3)) == [(3, "c")]
    # history metadata survives vacuum even for reclaimed versions
    assert [e["version"] for e in T.history(table)] == [1, 2, 3]


def test_vacuum_keeps_append_chains(spark, tmp_path):
    """Appended directories are referenced by EVERY later version, so
    vacuum must never reclaim them while any retained version needs
    them."""
    table = _mk(spark, tmp_path, [(1, "a")])
    T.append(spark.createDataFrame([(2, "b")], "k long, v string"), table)
    T.append(spark.createDataFrame([(3, "c")], "k long, v string"), table)
    out = T.vacuum(table, keep_versions=1, retention_seconds=0)
    assert out["deleted"] == []  # head references all three adds
    assert _rows(spark, T.read(spark, table)) == [
        (1, "a"), (2, "b"), (3, "c")]


# ---------------------------------------------------------------------------
# file-level pruning: MERGE by zone-map stats, DELETE by exact probe
# (round-9 verdict item 4)
# ---------------------------------------------------------------------------


def _file_state(table, rel):
    """(path, mtime, size) of every file under a data directory —
    byte-identical-on-disk evidence for the pruning tests."""
    root = os.path.join(table, rel)
    out = []
    for r, _d, files in os.walk(root):
        for fn in sorted(files):
            p = os.path.join(r, fn)
            st = os.stat(p)
            out.append((p, st.st_mtime_ns, st.st_size))
    return out


def test_merge_prunes_non_overlapping_directories(spark, tmp_path):
    """A keyed MERGE must rewrite ONLY the directories whose recorded
    [min, max] key stats intersect the updates' key range; the other
    directories stay live across versions, untouched on disk."""
    table = str(tmp_path / "t")
    T.create(spark.createDataFrame([(i, "low") for i in range(1, 6)],
                                   "k long, v string"),
             table, stats_cols=["k"])
    T.append(spark.createDataFrame([(i, "high") for i in range(100, 106)],
                                   "k long, v string"),
             table, stats_cols=["k"])
    stats = T.snapshot_stats(table)
    low_rel = next(r for r, s in stats.items() if s["k"] == [1, 5])
    high_rel = next(r for r, s in stats.items() if s["k"] == [100, 105])
    before = _file_state(table, low_rel)
    v = T.merge_upsert(
        spark,
        spark.createDataFrame([(103, "patched"), (200, "new")],
                              "k long, v string"),
        table, ["k"],
    )
    assert v == 3
    e = T.history(table)[-1]
    # only the overlapping (high) directory was removed; low survives
    assert e["remove"] == [high_rel]
    assert low_rel not in e["remove"]
    assert _file_state(table, low_rel) == before  # byte-identical
    got = _rows(spark, T.read(spark, table))
    assert got == sorted(
        [(i, "low") for i in range(1, 6)]
        + [(i, "high") for i in (100, 101, 102, 104, 105)]
        + [(103, "patched"), (200, "new")]
    )
    # the new directory carries fresh key stats for future pruning
    assert T.snapshot_stats(table)[e["add"][0]]["k"] == [100, 200]
    # time travel to v2 still sees the pre-merge state
    assert (102, "high") in _rows(spark, T.read(spark, table, version=2))


def test_merge_rewrites_statless_directories_conservatively(spark, tmp_path):
    """Directories committed WITHOUT stats cannot be proven disjoint,
    so a pruned merge must rewrite them (correctness over savings)."""
    table = _mk(spark, tmp_path, [(1, "a"), (2, "b")])  # no stats_cols
    v = T.merge_upsert(
        spark, spark.createDataFrame([(999, "far")], "k long, v string"),
        table, ["k"],
    )
    e = T.history(table)[-1]
    assert len(e["remove"]) == 1  # the statless create dir was rewritten
    assert _rows(spark, T.read(spark, table)) == [
        (1, "a"), (2, "b"), (999, "far")]
    assert v == 2


def test_merge_stat_type_drift_rewrites_conservatively(
    spark, tmp_path, monkeypatch,
):
    """Stats recorded under one key type must not crash a MERGE whose
    updates carry a different type: an int-vs-str range comparison is
    unprovable, so the directory is rewritten, not TypeError'd.  The
    drift is injected at the stats layer (a historical commit's stats
    typed differently from today's key column)."""
    table = str(tmp_path / "t")
    T.create(spark.createDataFrame([("a", 1), ("b", 2)],
                                   "k string, n long"),
             table, stats_cols=["k"])
    rel = next(iter(T.snapshot_stats(table)))
    # simulate a commit whose stats were recorded under an INT key
    monkeypatch.setattr(
        T, "snapshot_stats", lambda t, v=None: {rel: {"k": [1, 9]}}
    )
    v = T.merge_upsert(
        spark, spark.createDataFrame([("zzz", 9)], "k string, n long"),
        table, ["k"],
    )
    monkeypatch.undo()
    e = T.history(table)[-1]
    assert v == 2 and e["remove"] == [rel]  # conservative rewrite
    got = sorted(tuple(r) for r in T.read(spark, table).collect())
    assert got == [("a", 1), ("b", 2), ("zzz", 9)]


def test_delete_probe_prunes_unmatched_directories(spark, tmp_path):
    """DELETE WHERE rewrites only directories the predicate-pushed
    probe finds matches in; a delete matching nothing journals an
    explicit no-op version."""
    table = str(tmp_path / "t")
    T.create(spark.createDataFrame([(i, "low") for i in range(1, 4)],
                                   "k long, v string"),
             table, stats_cols=["k"])
    T.append(spark.createDataFrame([(i, "high") for i in range(100, 104)],
                                   "k long, v string"),
             table, stats_cols=["k"])
    stats = T.snapshot_stats(table)
    low_rel = next(r for r, s in stats.items() if s["k"][0] == 1)
    high_rel = next(r for r, s in stats.items() if s["k"][0] == 100)
    before = _file_state(table, low_rel)
    v = T.delete_rows(spark, table, "k = 101")
    assert v == 3
    e = T.history(table)[-1]
    assert e["remove"] == [high_rel]
    assert _file_state(table, low_rel) == before
    assert _rows(spark, T.read(spark, table)) == (
        [(i, "low") for i in range(1, 4)]
        + [(i, "high") for i in (100, 102, 103)]
    )
    # rewritten directory keeps tracking the same stats column
    assert T.snapshot_stats(table)[e["add"][0]]["k"] == [100, 103]
    # no-op delete: nothing matches -> journaled empty commit
    v2 = T.delete_rows(spark, table, "k = 424242")
    e2 = T.history(table)[-1]
    assert v2 == 4 and e2["add"] == [] and e2["remove"] == []
    assert len(_rows(spark, T.read(spark, table))) == 6


# ---------------------------------------------------------------------------
# vacuum vs concurrent writers (round-9 advice fix)
# ---------------------------------------------------------------------------


def test_vacuum_retention_window_protects_staged_data(spark, tmp_path):
    """The default retention window must NOT reclaim a freshly-staged
    directory: a concurrent writer stages data BEFORE the log names
    it, so mtime-recent unreferenced directories are in-flight
    commits, not garbage (the Delta VACUUM rule)."""
    table = _mk(spark, tmp_path, [(1, "a")])
    rel = T._stage_data(
        spark.createDataFrame([(2, "inflight")], "k long, v string"),
        table, 2,
    )
    out = T.vacuum(table, keep_versions=1)  # default 7-day retention
    assert out["deleted"] == []
    assert out["skipped_recent"] == [rel]
    # the in-flight writer can still commit and its data is intact
    assert T._try_commit(table, 2, {
        "op": "append", "version": 2, "add": [rel], "remove": [],
        "schema": "struct<k:bigint,v:string>", "ts_unix": 0,
    })
    assert _rows(spark, T.read(spark, table)) == [(1, "a"), (2, "inflight")]


def test_vacuum_relists_log_before_deleting(spark, tmp_path, monkeypatch):
    """A commit that lands between vacuum computing its needed-set and
    the delete loop must be protected even when the mtime guard is
    disabled: vacuum re-lists the log and treats directories added by
    any newly-landed version as needed."""
    table = _mk(spark, tmp_path, [(1, "a")])
    # the rival's commit is fully on disk...
    rival = spark.createDataFrame([(2, "rival")], "k long, v string")
    rel = T._stage_data(rival, table, 2)
    assert T._try_commit(table, 2, {
        "op": "append", "version": 2, "add": [rel], "remove": [],
        "schema": "struct<k:bigint,v:string>", "ts_unix": 0,
    })
    # ...but vacuum's INITIAL listing raced it: hide v2 from the first
    # _list_versions call (and the snapshot_files call that follows),
    # reveal it on the re-list.
    real = T._list_versions
    calls = {"n": 0}

    def racing_list(t):
        calls["n"] += 1
        vs = real(t)
        return [v for v in vs if v == 1] if calls["n"] <= 2 else vs

    monkeypatch.setattr(T, "_list_versions", racing_list)
    out = T.vacuum(table, keep_versions=1, retention_seconds=0)
    assert calls["n"] >= 3  # initial + snapshot replay + re-list
    assert out["deleted"] == []
    assert rel in out["retained"]
    monkeypatch.undo()
    assert _rows(spark, T.read(spark, table)) == [(1, "a"), (2, "rival")]


def test_delete_null_predicate_rows_survive_everywhere(spark, tmp_path):
    """SQL DELETE semantics: a NULL predicate keeps the row.  With
    file-level pruning this must hold in BOTH directory classes — a
    NULL-key row sharing a directory with a real match (rewritten)
    and one in a pruned directory — or the loss becomes
    data-dependent, the worst kind of wrong."""
    table = str(tmp_path / "t")
    # dir A: contains the match (k=7) AND a NULL-k row
    T.create(
        spark.createDataFrame([(7, "hit"), (None, "null_a"), (1, "keep")],
                              "k long, v string"),
        table, stats_cols=["k"],
    )
    # dir B: no match, plus its own NULL-k row
    T.append(
        spark.createDataFrame([(100, "far"), (None, "null_b")],
                              "k long, v string"),
        table, stats_cols=["k"],
    )
    T.delete_rows(spark, table, "k % 7 = 0")
    got = {(r["k"], r["v"]) for r in T.read(spark, table).collect()}
    assert (7, "hit") not in got
    assert (None, "null_a") in got  # survived the rewritten directory
    assert (None, "null_b") in got  # survived the pruned directory
    assert (1, "keep") in got and (100, "far") in got


# ---------------------------------------------------------------------------
# checkpoints: O(interval) snapshot resolution (the Delta _checkpoint)
# ---------------------------------------------------------------------------


def _mk_chain(spark, tmp_path, n_appends):
    table = _mk(spark, tmp_path, [(0, "v0")])
    for i in range(1, n_appends + 1):
        T.append(
            spark.createDataFrame([(i, f"v{i}")], "k long, v string"), table
        )
    return table


def test_checkpoint_written_at_interval_and_excluded_from_log(
    spark, tmp_path,
):
    table = _mk_chain(spark, tmp_path, T._CKPT_INTERVAL)  # versions 1..11
    cks = T._list_checkpoints(table)
    assert cks == [T._CKPT_INTERVAL]
    # checkpoint files never masquerade as versions
    assert T._list_versions(table) == list(range(1, T._CKPT_INTERVAL + 2))


def test_checkpoint_resolution_equals_full_replay(spark, tmp_path):
    table = _mk_chain(spark, tmp_path, T._CKPT_INTERVAL + 2)
    head = T._list_versions(table)[-1]
    with_ck = T._live_state(table, head)
    without = T._live_state(table, head, use_checkpoint=False)
    assert with_ck == without
    assert len(_rows(spark, T.read(spark, table))) == T._CKPT_INTERVAL + 3


def test_checkpoint_resolution_after_merge_carries_stats(spark, tmp_path):
    """A checkpoint must snapshot the zone-map stats too: a MERGE
    after the checkpoint still prunes directories whose stats were
    folded INTO the checkpoint rather than replayed from entries."""
    table = str(tmp_path / "t")
    T.create(spark.createDataFrame([(i, "low") for i in range(1, 6)],
                                   "k long, v string"),
             table, stats_cols=["k"])
    for i in range(2, T._CKPT_INTERVAL + 1):  # drive past the interval
        T.append(
            spark.createDataFrame([(100 * i, f"hi{i}")], "k long, v string"),
            table, stats_cols=["k"],
        )
    assert T._list_checkpoints(table) == [T._CKPT_INTERVAL]
    stats = T.snapshot_stats(table)
    assert stats and all(s.get("k") for s in stats.values())
    low_rel = next(r for r, s in stats.items() if s["k"] == [1, 5])
    before = _file_state(table, low_rel)
    T.merge_upsert(
        spark, spark.createDataFrame([(200, "patch")], "k long, v string"),
        table, ["k"],
    )
    e = T.history(table)[-1]
    assert low_rel not in e["remove"]  # pruned via checkpointed stats
    assert _file_state(table, low_rel) == before


def test_time_travel_before_checkpoint_still_replays(spark, tmp_path):
    table = _mk_chain(spark, tmp_path, T._CKPT_INTERVAL + 1)
    # version 3 predates the checkpoint at _CKPT_INTERVAL
    got = _rows(spark, T.read(spark, table, version=3))
    assert got == [(i, f"v{i}") for i in range(3)]


def test_malformed_checkpoint_degrades_to_replay(spark, tmp_path):
    table = _mk_chain(spark, tmp_path, T._CKPT_INTERVAL)
    ck = T._ckpt_path(table, T._CKPT_INTERVAL)
    with open(ck, "w") as f:
        f.write("{corrupt json")
    got = _rows(spark, T.read(spark, table))
    assert len(got) == T._CKPT_INTERVAL + 1  # full replay, right answer
    # and write_checkpoint repairs it atomically
    T.write_checkpoint(table)
    head = T._list_versions(table)[-1]
    assert T._live_state(table, head) == T._live_state(
        table, head, use_checkpoint=False
    )


# ---------------------------------------------------------------------------
# log hygiene
# ---------------------------------------------------------------------------


def test_log_entries_are_valid_sorted_json(spark, tmp_path):
    table = _mk(spark, tmp_path, [(1, "a")])
    T.append(spark.createDataFrame([(2, "b")], "k long, v string"), table)
    log_dir = os.path.join(table, "_txn_log")
    names = sorted(os.listdir(log_dir))
    assert names == ["00000000001.json", "00000000002.json"]
    for n in names:
        e = json.load(open(os.path.join(log_dir, n)))
        assert set(e) >= {"op", "version", "add", "remove", "schema"}
    # no temp files left behind
    assert not [n for n in names if n.startswith("_tmp")]


def test_empty_snapshot_after_full_delete_keeps_schema(spark, tmp_path):
    table = _mk(spark, tmp_path, [(1, "a")])
    T.delete_rows(spark, table, "k = 1")
    df = T.read(spark, table)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["k", "v"]
