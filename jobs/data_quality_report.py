"""spark-submit entry point: one-pass data-quality report.

The validation gate a production training-data pipeline runs before
(and after) every transform, composed from the round-5 quality layer
into a single job (launch with --py-files exactly like
jobs/replay_job.py):

    every table            -> per-column profile        (validation.py)
    star schema + events   -> FK / uniqueness report    (validation.py)
    documents              -> readability histogram     (text/analysis.py)
    documents              -> gopher quality rules      (text/analysis.py)

Each family lands under ``<out>/metric=<name>/`` (the shared
``metric_sink`` contract: per-family parquet + manifest, ``--resume``
skips committed families whose parameters match); a JSON metrics line
with row counts and wall-clock per stage goes to stdout.

    spark-submit --master local[8] \\
        --py-files dist/online_centrality_spark.zip \\
        jobs/data_quality_report.py --sf-dir /root/testdata/sf0.01 \\
        --out /tmp/dq_report
"""

import argparse
import json
import time

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents",
]


def run_report(spark, sf_dir: str, out: str, exact: bool = True,
               resume: bool = False) -> dict:
    from pyspark.sql import functions as F

    from online_centrality_spark.sinks import metric_sink
    from online_centrality_spark.text.analysis import gopher_rules, readability
    from online_centrality_spark.validation import (
        integrity_checks,
        table_profile,
    )

    metrics = {}
    params = {"exact": exact, "sf_dir": sf_dir}
    sink = metric_sink(spark, out, params, metrics, resume=resume)

    dfs = {
        t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TABLES
    }
    # one long-form profile frame across every table
    profiles = None
    for t in TABLES:
        p = table_profile(dfs[t], exact=exact).select(
            F.lit(t).alias("table"), "*"
        )
        profiles = p if profiles is None else profiles.unionByName(p)
    sink("profiles", profiles)
    sink(
        "integrity",
        integrity_checks(
            foreign_keys=[
                ("orders.o_custkey", dfs["orders"], "o_custkey",
                 dfs["customer"], "c_custkey"),
                ("lineitem.l_orderkey", dfs["lineitem"], "l_orderkey",
                 dfs["orders"], "o_orderkey"),
                ("lineitem.l_partkey", dfs["lineitem"], "l_partkey",
                 dfs["part"], "p_partkey"),
                ("lineitem.l_suppkey", dfs["lineitem"], "l_suppkey",
                 dfs["supplier"], "s_suppkey"),
                ("customer.c_nationkey", dfs["customer"], "c_nationkey",
                 dfs["nation"], "n_nationkey"),
                ("nation.n_regionkey", dfs["nation"], "n_regionkey",
                 dfs["region"], "r_regionkey"),
            ],
            unique_keys=[
                ("orders.o_orderkey", dfs["orders"], ["o_orderkey"]),
                ("events.event_id", dfs["events"], ["event_id"]),
                ("customer.c_custkey", dfs["customer"], ["c_custkey"]),
                ("documents.doc_id", dfs["documents"], ["doc_id"]),
            ],
        ),
    )
    sink("readability", readability(dfs["documents"]))
    sink("gopher", gopher_rules(dfs["documents"]))
    return metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--approx", action="store_true",
                    help="HLL cardinalities in the profiles (100 TB mode)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from online_centrality_spark.session import get_spark

    kwargs = {"app_name": "data_quality_report"}
    if args.master:
        kwargs["master"] = args.master
    spark = get_spark(**kwargs)
    t0 = time.time()
    metrics = run_report(
        spark, args.sf_dir, args.out,
        exact=not args.approx, resume=args.resume,
    )
    metrics["total_secs"] = round(time.time() - t0, 2)
    print(json.dumps({"job": "data_quality_report", **metrics}))


if __name__ == "__main__":
    main()
