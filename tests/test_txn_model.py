"""Randomized crash-recovery model test for the transaction
coordinator (operators/txn.py).

A seeded scenario generator drives transactions over three versioned
tables, injecting a crash at a RANDOM leg publish or at the finalize
write in a random subset of them (pre-decision aborts are a separate
action; pre-decision CRASHES are unit-tested in test_txn.py), randomly
interleaving recovery sweeps and duplicate replays (same txn app/batch
re-staged, the streaming replay shape). The generator honors the one
ordering precondition the watermark contract states (stage_commit
docstring): an app's batch ids are applied in non-decreasing order per
table — after a crash, the crashed batch is recovered or replayed
BEFORE the next batch id is issued, exactly as a Structured Streaming
restart replays the failed epoch first. After a final recovery pass,
the coordinator's whole contract is asserted:

- every manifest is terminal (committed) — recovery leaves nothing
  prepared;
- ATOMIC DURABILITY: for every committed txn, every leg's batch rows
  are present in its table EXACTLY once (no torn txn, no double-apply);
- a batch the generator decided to abort pre-decision is present in NO
  table;
- after recovery + staging expiry, no staged dirs or manifests leak;
- every table's version chain is gap-free.

Each scenario is cheap (tiny frames, metadata-heavy), so several seeds
run in one test without Hypothesis — the randomness here is in the
CRASH SCHEDULE, which hand-written cases cover only pointwise
(tests/test_txn.py picks specific crash points; this sweeps them).
"""

from __future__ import annotations

import os
import random

import pytest

from medallion_data_lake_spark.operators import txn as T
from medallion_data_lake_spark.operators.txn import (
    commit_txn,
    list_txns,
    recover_txns,
)
from medallion_data_lake_spark.operators.versioned import (
    _commit_versions,
    commit,
    read_table,
)
from medallion_data_lake_spark.operators.wap import (
    abandon_staged,
    expire_staged,
    list_staged,
    stage_commit,
)

N_TABLES = 3
N_TXNS = 6


@pytest.mark.parametrize("seed", [11, 23, 47, 61, 83])
def test_txn_coordinator_random_crash_schedule(
    spark, tmp_path, monkeypatch, seed
):
    rng = random.Random(seed)
    tables = []
    for i in range(N_TABLES):
        p = str(tmp_path / f"t{i}")
        commit(spark.createDataFrame([(0, -1)], "id long, batch long"), p)
        tables.append(p)
    root = str(tmp_path / "_txn")

    real_publish = T.publish_staged
    crash_plan = {"at": None, "count": 0}

    def crashing_publish(spark_, path, sid):
        crash_plan["count"] += 1
        if crash_plan["at"] is not None and crash_plan["count"] >= crash_plan["at"]:
            raise RuntimeError("scheduled crash")
        return real_publish(spark_, path, sid)

    monkeypatch.setattr(T, "publish_staged", crashing_publish)

    real_wm = T._write_manifest

    def crashing_finalize(root_, manifest):
        if crash_plan.get("fin") and manifest.get("status") == "committed":
            crash_plan["fin"] = False
            raise RuntimeError("scheduled crash")
        return real_wm(root_, manifest)

    monkeypatch.setattr(T, "_write_manifest", crashing_finalize)

    expected: dict[str, set[int]] = {p: set() for p in tables}  # batch ids
    aborted: list[int] = []

    def stage_batch(batch_id, members):
        legs = []
        for p in members:
            sid = stage_commit(
                spark.createDataFrame(
                    [(batch_id * 10 + k, batch_id) for k in range(2)],
                    "id long, batch long",
                ),
                p,
                txn_app_id="model", txn_version=batch_id,
            )
            if sid is not None:
                legs.append((p, sid))
        return legs

    for batch_id in range(1, N_TXNS + 1):
        members = rng.sample(tables, rng.randint(1, N_TABLES))
        legs = stage_batch(batch_id, members)
        action = rng.choice(["commit", "crash", "crash_finalize", "abort"])
        if action == "abort":
            # pre-decision abort: readers must never see the batch
            for p, sid in legs:
                abandon_staged(p, sid)
            aborted.append(batch_id)
            continue
        crash_plan["at"] = (
            rng.randint(1, len(legs)) if action == "crash" else None
        )
        crash_plan["fin"] = action == "crash_finalize"
        crash_plan["count"] = 0
        crashed = False
        try:
            commit_txn(spark, root, legs, note=f"batch {batch_id}")
        except RuntimeError:
            crashed = True  # scheduled crash: the manifest is the redo log
        crash_plan["at"] = None
        for p in members:
            expected[p].add(batch_id)
        # the streaming ordering contract: a crashed epoch is replayed
        # or recovered before the next batch id is issued; the ORDER of
        # replay vs recovery is random (replay-first is the race where
        # a restarted stream beats the maintenance recover)
        replay_first = rng.random() < 0.5
        if crashed and replay_first:
            replay_legs = stage_batch(batch_id, members)
            if replay_legs:
                commit_txn(spark, root, replay_legs,
                           note=f"replay {batch_id}")
        if crashed or rng.random() < 0.5:
            recover_txns(spark, root)
        if rng.random() < 0.4:
            replay_legs = stage_batch(batch_id, members)
            if replay_legs:
                commit_txn(spark, root, replay_legs,
                           note=f"replay {batch_id}")

    # final repair pass, then the full contract
    recover_txns(spark, root)
    assert all(m["status"] == "committed" for m in list_txns(root)), (
        [m["status"] for m in list_txns(root)]
    )
    for p in tables:
        rows = read_table(spark, p).collect()
        got_batches = sorted({r["batch"] for r in rows if r["batch"] >= 0})
        assert got_batches == sorted(expected[p]), (
            f"{os.path.basename(p)}: torn or lost batches"
        )
        # exactly once: 2 rows per expected batch, never 4
        from collections import Counter

        per_batch = Counter(r["batch"] for r in rows if r["batch"] >= 0)
        assert all(n == 2 for n in per_batch.values()), (
            f"{os.path.basename(p)}: double-applied {dict(per_batch)}"
        )
        for b in aborted:
            assert b not in per_batch, "aborted batch became visible"
        versions = _commit_versions(p)
        assert versions == list(range(len(versions))), "version chain gap"
        # nothing staged leaks once txns are terminal — list FIRST
        # (expire would reclaim the evidence), then prove expiry finds
        # nothing either
        assert list_staged(p) == [], "staging leak"
        assert expire_staged(p, older_than_sec=0.0) == []
