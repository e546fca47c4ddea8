"""Shared partitioned-report sink with a params-manifest resume contract.

Used by jobs/graph_report.py and jobs/corpus_profile.py: each metric
family writes to ``<out>/metric=<name>/``; next to the parquet commit a
``_params.json`` manifest records the invocation parameters the family's
values depend on. ``--resume`` skips a family only when BOTH hold:

- the parquet ``_SUCCESS`` marker exists (checked FIRST — a partial
  sink is never scanned just to decide whether to skip it), and
- the committed manifest equals the current invocation's params — so a
  resume with different parameters recomputes instead of silently
  mixing stale and fresh families in one report.

Hadoop FS APIs (not ``open()``) keep the contract storage-agnostic:
the same code commits to HDFS / S3A / local paths.
"""

from __future__ import annotations

import json
import time


def metric_sink(spark, out: str, params: dict, metrics: dict,
                resume: bool = False):
    """Return a ``sink(name, df)`` closure writing one metric family
    under ``out`` and recording {rows, secs[, resumed]} into
    ``metrics``."""

    def _fs_and_path(p):
        jvm = spark.sparkContext._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(p)
        fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        return jvm, fs, hpath

    def sink(name, df):
        path = f"{out}/metric={name}"
        t0 = time.time()
        if resume:
            try:
                jvm, fs, success = _fs_and_path(path + "/_SUCCESS")
                if fs.exists(success):
                    mpath = jvm.org.apache.hadoop.fs.Path(
                        path + "/_params.json"
                    )
                    committed = None
                    if fs.exists(mpath):
                        stream = fs.open(mpath)
                        committed = json.loads(
                            jvm.org.apache.commons.io.IOUtils.toString(
                                stream, "UTF-8"
                            )
                        )
                        stream.close()
                    if committed == params:
                        n = spark.read.parquet(path).count()
                        metrics[name] = {
                            "rows": n, "secs": 0.0, "resumed": True,
                        }
                        return
            except Exception:
                pass  # unreadable marker/manifest -> recompute below
        df.write.mode("overwrite").parquet(path)
        # manifest written AFTER the parquet commit: its presence+match
        # implies the data beside it was produced with these params
        # (underscore prefix -> invisible to parquet readers)
        jvm, fs, mpath = _fs_and_path(path + "/_params.json")
        ostream = fs.create(mpath, True)
        ostream.write(bytearray(json.dumps(params), "utf-8"))
        ostream.close()
        n = spark.read.parquet(path).count()
        metrics[name] = {"rows": n, "secs": round(time.time() - t0, 2)}

    return sink
