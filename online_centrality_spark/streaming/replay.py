"""Streaming replay bridge: Structured Streaming driving the
distributed-state temporal engine.

``StreamingDistributedReplay`` is a ``foreachBatch`` sink that advances
a distributed-state measure (:class:`DistributedTemporalKatz`,
:class:`DistributedTemporalPageRank`, ...) over each micro-batch and
reads scores out at the batch's max event key — the streaming
counterpart of one ``SuperstepDriver`` interval per micro-batch, with
the same cogrouped DataFrame state and the same partitioned score sink
(nothing driver-held).

Ordering contract: edges must arrive **key-ordered across
micro-batches** (a time-ordered ingest — Kafka partitions by time
bucket, file drops in event-time order); within a batch any order is
fine, the kernel sorts by ``(key, seq)``. Late data across batches
would need the batch engine's replay instead (decay is lazy, so
re-running from the last checkpoint is cheap).

Exactness: the measure's state after N micro-batches equals a single
batch replay over the union of those batches with the same boundaries
(tested in ``tests/test_streaming.py`` against the batch engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class StreamingDistributedReplay:
    """``foreachBatch(self)`` sink advancing ``measure`` per micro-batch.

    ``prepare`` (optional) maps each raw micro-batch to the measure's
    edge schema ``(key, src, dst, seq, <closure_col>)`` — e.g. a
    broadcast join attaching the closure key. Read-outs are appended to
    ``out_dir`` partitioned by ``interval_id`` (the micro-batch id).
    """

    def __init__(self, measure, out_dir: str, prepare=None):
        self.measure = measure
        self.out_dir = out_dir
        self.prepare = prepare
        self.batches: list[tuple[int, float]] = []  # (batch_id, boundary)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.prepare is not None:
            batch_df = self.prepare(batch_df)
        hi_row = batch_df.agg(F.max("key")).collect()[0]
        if hi_row[0] is None:
            return  # empty micro-batch: lazy decay, nothing to do
        hi = float(hi_row[0])
        ro = self.measure.run_batch(batch_df, [(int(batch_id), hi, hi)])
        (
            ro.repartition("interval_id")
            .write.mode("append")
            .partitionBy("interval_id")
            .parquet(self.out_dir)
        )
        self.batches.append((int(batch_id), hi))

    def scores(self, spark) -> DataFrame:
        return spark.read.option("basePath", self.out_dir).parquet(self.out_dir)
