"""Checkpoint lifecycle for iterative superstep loops.

`DataFrame.localCheckpoint(eager=True)` pins its materialized blocks in the
BlockManager until the SESSION ends — Spark exposes no DataFrame-level
unpersist for them. An iterative job that checkpoints per round therefore
LEAKS one resident copy of its state per checkpoint: at 100 supersteps on a
10^9-vertex frontier that is 100 pinned frontier copies, which first evicts
useful cache, then spills, then destabilizes run-to-run wall time (observed:
back-to-back identical PageRank runs at 14-77 s as leaked blocks accumulated
— the round-2 scaling-noise root cause).

CheckpointCycler tracks the persistent-RDD ids created by each checkpoint
call: diff of sparkContext persistent RDDs around the eager materialization,
RESTRICTED to locally-checkpointed RDDs. The restriction matters — an
upstream `.cache()` whose fill job happens to be the first checkpoint's
materialization (lazy caches register during their first job) would
otherwise land in that generation and be blocking-unpersisted two
checkpoints later, silently de-caching a live input for the rest of the
loop. Generations are unpersisted once superseded. Two
generations stay live by default: convergence tests join the new state
against the previous one, so the parent must survive one extra round;
anything older is provably unreachable — the new checkpoint cut its lineage.

Usage:
    ck = CheckpointCycler(spark)
    state = ck.checkpoint(state0)
    for it in range(iters):
        new_state = step(state)
        new_state = ck.checkpoint(new_state)   # frees generation it-1
        ...convergence test may join new_state with state...
        state = new_state
    return ck.finish(state)   # frees everything but the returned state
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class CheckpointCycler:
    def __init__(self, spark, keep_generations: int = 2):
        self._sc = spark.sparkContext
        self._keep = max(1, keep_generations)
        self._gens: list[set[int]] = []

    def _persistent_ids(self) -> set[int]:
        return set(self._sc._jsc.getPersistentRDDs().keys())

    def _local_checkpoint_ids(self) -> set[int]:
        # only RDDs whose checkpointData is a LocalRDDCheckpointData — an
        # upstream .cache() filling lazily inside a checkpoint job is NOT ours
        jmap = self._sc._jsc.getPersistentRDDs()
        return {rid for rid in jmap.keys() if jmap[rid].rdd().isLocallyCheckpointed()}

    def _release(self, ids: set[int]) -> None:
        jmap = self._sc._jsc.getPersistentRDDs()
        for rid in ids:
            if rid in jmap:
                jmap[rid].unpersist(True)

    def checkpoint(self, df: DataFrame) -> DataFrame:
        before = self._persistent_ids()
        out = df.localCheckpoint(eager=True)
        self._gens.append(self._local_checkpoint_ids() - before)
        while len(self._gens) > self._keep:
            self._release(self._gens.pop(0))
        return out

    def finish(self, result: DataFrame) -> DataFrame:
        """Retire every tracked generation except the newest (which backs
        `result`); returns `result` for chaining."""
        while len(self._gens) > 1:
            self._release(self._gens.pop(0))
        return result

    def close(self) -> None:
        """Retire EVERY tracked generation, newest included. Only valid when
        the caller's result no longer depends on any of them — e.g. it was
        re-checkpointed through another cycler (components.py's contraction
        pre-pass does this: the final result is eagerly checkpointed, then
        the label-chain cycler is closed so residency stays O(V))."""
        while self._gens:
            self._release(self._gens.pop())
