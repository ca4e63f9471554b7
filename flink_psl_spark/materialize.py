"""One materialization primitive for every engine intermediate.

Many operators materialize a reused or loop-carried intermediate (LSH
fingerprint tables, graph edge lists, curation stage boundaries) so the
subtree executes ONCE instead of once per consumer. Locally the right
call is ``DataFrame.localCheckpoint`` — cheap, no configured storage —
but it is *unreliable* storage: blocks live on executors, an executor
loss during a downstream stage fails the job instead of recomputing,
and the blocks pin executor memory/disk until the RDD is GC'd. A 100 TB
deployment wants the same call sites to write a *reliable* checkpoint
(HDFS/object store) or a spillable persist instead.

``materialize(df)`` is that single knob. Backend selection (checked per
call, so a long-lived session can switch):

- ``SPARK_GRAFT_MATERIALIZE=local`` (default): ``localCheckpoint`` —
  identical behavior to the historical inline calls.
- ``SPARK_GRAFT_MATERIALIZE=reliable``: ``DataFrame.checkpoint`` to the
  configured checkpoint dir (``SPARK_GRAFT_CHECKPOINT_DIR`` or an
  already-set ``SparkContext.setCheckpointDir``) — survives executor
  loss; the right production backend for corpus-sized intermediates.
- ``SPARK_GRAFT_MATERIALIZE=persist``: ``persist(MEMORY_AND_DISK)`` +
  an eager ``count()`` — keeps lineage (recompute on block loss) at the
  cost of NOT truncating the plan; only appropriate where plan growth
  is bounded. Blocks free on GC/unpersist like any cached frame.

Call sites use ``df.transform(materialize)`` so chained expressions read
the same as the old ``.localCheckpoint(eager=True)`` suffix.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

BACKEND_ENV = "SPARK_GRAFT_MATERIALIZE"
CHECKPOINT_DIR_ENV = "SPARK_GRAFT_CHECKPOINT_DIR"


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly materialize ``df`` and return a frame reading the stored
    result (lineage truncated under the checkpoint backends). See module
    docstring for backend selection."""
    backend = os.environ.get(BACKEND_ENV, "local").strip().lower() or "local"
    if backend == "local":
        return df.localCheckpoint(eager=True)
    if backend == "reliable":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            target = os.environ.get(CHECKPOINT_DIR_ENV)
            if not target:
                raise ValueError(
                    "SPARK_GRAFT_MATERIALIZE=reliable needs a checkpoint "
                    "dir: set SPARK_GRAFT_CHECKPOINT_DIR or call "
                    "SparkContext.setCheckpointDir first"
                )
            sc.setCheckpointDir(target)
        return df.checkpoint(eager=True)
    if backend == "persist":
        out = df.persist()
        out.count()
        return out
    raise ValueError(
        f"unknown {BACKEND_ENV}={backend!r}; expected local | reliable | "
        "persist"
    )
