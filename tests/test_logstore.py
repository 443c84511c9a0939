"""LogStore abstraction: the versioned table performs ALL log IO
through the interface (proved by running full table lifecycles over a
dict-backed store with no _log directory ever reaching disk), and
put_exclusive honors its exactly-one-winner contract under real
concurrency on both shipped implementations."""

from __future__ import annotations

import os
import threading

import pytest

from medallion_data_lake_spark.operators.logstore import (
    InMemoryLogStore,
    LocalLogStore,
    set_log_store,
)


@pytest.fixture
def mem_store():
    store = InMemoryLogStore()
    prev = set_log_store(store)
    try:
        yield store
    finally:
        set_log_store(prev)


@pytest.mark.parametrize("make", [LocalLogStore, InMemoryLogStore])
def test_put_exclusive_exactly_one_winner(make, tmp_path):
    """32 threads race one target: exactly one create succeeds, the
    rest raise FileExistsError — the property the whole commit
    protocol rests on."""
    store = make()
    target = str(tmp_path / "00000000000000000000.json")
    results: list[str] = []
    barrier = threading.Barrier(32)

    def attempt(i: int) -> None:
        barrier.wait()
        try:
            store.put_exclusive(target, f"writer-{i}")
            results.append("won")
        except FileExistsError:
            results.append("lost")

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(32)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results.count("won") == 1 and results.count("lost") == 31
    # the surviving content is the winner's, intact
    assert store.read(target).startswith("writer-")


def test_versioned_lifecycle_through_memory_store(spark, tmp_path, mem_store):
    """Commit / snapshot / evolution / rollback / checkpointed expiry
    all run against the in-memory store — and the table directory
    contains ONLY data files (any _log dir on disk would mean a log
    touch bypassed the interface)."""
    from medallion_data_lake_spark.operators.versioned import (
        commit,
        expire_log,
        history,
        latest_version,
        read_table,
        rollback,
    )

    path = str(tmp_path / "vt")
    commit(spark.createDataFrame([(1, "a")], "id long, tag string"), path)
    commit(spark.createDataFrame([(2, "b", 1.5)],
                                 "id long, tag string, score double"),
           path, allow_schema_evolution=True)
    assert latest_version(path) == 1
    got = read_table(spark, path)
    assert set(got.columns) == {"id", "tag", "score"} and got.count() == 2
    assert read_table(spark, path, version=0).count() == 1

    rollback(spark, path, to_version=0)
    assert read_table(spark, path).count() == 1
    assert [h["operation"] for h in history(path)][-1] == "RESTORE(0)"

    # enough commits to cross a checkpoint, then expire history
    for i in range(12):
        commit(spark.createDataFrame([(10 + i, "x")], "id long, tag string"),
               path)
    out = expire_log(path, keep_last=2)
    assert out["entries_deleted"] > 0
    assert read_table(spark, path).count() == 13  # 1 restored + 12 appends

    assert not os.path.exists(os.path.join(path, "_log")), (
        "log IO bypassed the LogStore interface"
    )
    # the log lives in the store: entries + at least one checkpoint
    names = mem_store.list(os.path.join(path, "_log"))
    assert any(n.endswith(".checkpoint.json") for n in names)
    assert any(n.endswith(".json") and "checkpoint" not in n for n in names)


def test_race_retry_through_store_interface(spark, tmp_path, mem_store):
    """A chaos wrapper steals every first claim (simulating a racing
    writer on an object store): the claim loop must LOSE loudly and
    retry on the next version — publishing exactly once, never twice."""
    from medallion_data_lake_spark.operators import logstore
    from medallion_data_lake_spark.operators.versioned import (
        commit,
        read_table,
    )

    inner = mem_store
    steals = {"n": 0}

    class StealingStore(logstore.LogStore):
        def list(self, d):
            return inner.list(d)

        def read(self, f):
            return inner.read(f)

        def put_exclusive(self, f, text):
            if f.endswith(".json") and "checkpoint" not in f and steals["n"] < 3:
                steals["n"] += 1
                # another writer claimed this version first
                inner.put_exclusive(f, '{"version": %d, "timestamp": 0, '
                                    '"mode": "append", "added": [], '
                                    '"removed": [], "operation": "WRITE"}'
                                    % int(os.path.basename(f).split(".")[0]))
                raise FileExistsError(f)
            inner.put_exclusive(f, text)

        def delete(self, f):
            inner.delete(f)

        def ensure_dir(self, d):
            inner.ensure_dir(d)

    prev = logstore.set_log_store(StealingStore())
    try:
        path = str(tmp_path / "vt")
        entry = commit(
            spark.createDataFrame([(1, "a")], "id long, tag string"), path)
    finally:
        logstore.set_log_store(prev)
    assert steals["n"] == 3
    # our commit landed AFTER the three stolen versions, exactly once
    assert entry["version"] == 3
    assert read_table(spark, path).count() == 1


# ---------------------------------------------------------------------------
# Cross-PROCESS race (r6 verdict item 7): the one-winner contract was
# proven with 32 threads in one interpreter; the seam exists for separate
# writers — two OS processes with independent page caches and no shared
# GIL hammering the same version sequence.
# ---------------------------------------------------------------------------


def _race_worker(log_dir: str, tag: str, n_versions: int, out_file: str) -> None:
    """Claim every version as fast as possible; record the wins."""
    import json as _json

    from medallion_data_lake_spark.operators.logstore import LocalLogStore

    store = LocalLogStore()
    wins = []
    for v in range(n_versions):
        try:
            store.put_exclusive(
                os.path.join(log_dir, f"{v:020d}.json"), tag
            )
            wins.append(v)
        except FileExistsError:
            pass
    with open(out_file, "w") as fh:
        _json.dump(wins, fh)


def test_put_exclusive_cross_process_one_winner(tmp_path):
    """4 OS processes × 50 versions through O_CREAT|O_EXCL: the win sets
    must PARTITION the version space — every version claimed exactly
    once, no version claimed twice, winner's content intact."""
    import json as _json
    import multiprocessing as mp

    log_dir = str(tmp_path / "_log")
    os.makedirs(log_dir)
    n_versions, n_procs = 50, 4
    outs = [str(tmp_path / f"wins_{i}.json") for i in range(n_procs)]
    ctx = mp.get_context("spawn")  # no inherited fds/locks — real strangers
    procs = [
        ctx.Process(
            target=_race_worker, args=(log_dir, f"proc{i}", n_versions, outs[i])
        )
        for i in range(n_procs)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0
    win_sets = [set(_json.load(open(o))) for o in outs]
    all_wins = [v for s in win_sets for v in s]
    assert sorted(all_wins) == list(range(n_versions))  # partition: no dup, no gap
    # file contents name the recorded winner (no torn/overwritten writes)
    for i, s in enumerate(win_sets):
        for v in s:
            assert open(os.path.join(log_dir, f"{v:020d}.json")).read() == f"proc{i}"
