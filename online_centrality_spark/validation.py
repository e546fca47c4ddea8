"""Data-quality validation: table profiling and constraint checks.

The Deequ / TFDV layer every production training-data pipeline runs
before (and after) each transform: per-column statistics to catch
schema drift and silent corruption, plus declarative constraints
(uniqueness, referential integrity) whose violations are counted, not
crashed on.

Scale shape:
- ``table_profile`` is ONE aggregation pass over the table. Multiple
  exact ``count(distinct)`` columns make Catalyst plan an Expand (one
  replica of the scan per distinct aggregate) — the honest price of
  exact cardinalities; ``exact=False`` swaps in
  ``approx_count_distinct`` (HLL, single replica) for the 100 TB
  profile where ±2% cardinality is fine. Everything else (null counts,
  min/max) is map-side combinable either way.
- ``integrity_checks`` is one left-anti-join count per declared
  foreign key (orphans = child keys with no parent) and one groupBy
  per declared unique key (duplicates = rows beyond the first per
  key). Each check is an independent 1-row aggregate; the result frame
  unions them — no driver-side loops over data, only over the
  (tiny, declared) constraint list.

Numeric vs string surfaces are split into typed columns (``min_num``
and friends as double, ``min_str`` for strings) instead of casting
everything to strings — cross-engine float formatting is not
deterministic, numeric values are.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def table_profile(
    df: DataFrame, columns: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """(column, dtype, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str) — one row per profiled column.

    Numeric columns surface min/max as doubles; timestamps as epoch
    microseconds (integer-exact in a double far beyond any realistic
    date); strings in ``min_str``/``max_str``. ``exact=False`` uses
    HLL cardinalities for the 100 TB profile.
    """
    schema = {f.name: f.dataType for f in df.schema.fields}
    cols = columns if columns is not None else [f.name for f in df.schema.fields]
    unknown = [c for c in cols if c not in schema]
    if unknown:
        raise ValueError(f"unknown columns: {unknown}")
    if not cols:
        raise ValueError("no columns to profile")

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    distinct_fn = F.countDistinct if exact else F.approx_count_distinct
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}")
        )
        aggs.append(distinct_fn(F.col(c)).alias(f"__nd_{c}"))
        dt = schema[c]
        if isinstance(dt, _NUMERIC):
            num = F.col(c).cast("double")
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            num = F.unix_micros(F.col(c).cast("timestamp")).cast("double")
        else:
            num = F.lit(None).cast("double")
        aggs.append(F.min(num).alias(f"__mn_{c}"))
        aggs.append(F.max(num).alias(f"__mx_{c}"))
        s = (
            F.col(c)
            if isinstance(dt, T.StringType)
            else F.lit(None).cast("string")
        )
        aggs.append(F.min(s).alias(f"__ms_{c}"))
        aggs.append(F.max(s).alias(f"__xs_{c}"))
    wide = df.agg(*aggs)

    stack_args = []
    for c in cols:
        stack_args += [
            F.lit(c),
            F.lit(schema[c].simpleString()),
            F.col(f"__nn_{c}"),
            F.col(f"__nd_{c}").cast("long"),
            F.col(f"__mn_{c}"),
            F.col(f"__mx_{c}"),
            F.col(f"__ms_{c}"),
            F.col(f"__xs_{c}"),
        ]
    return wide.select(
        "n_rows",
        F.stack(
            F.lit(len(cols)),
            *stack_args,
        ).alias("column", "dtype", "n_nulls", "n_distinct",
                "min_num", "max_num", "min_str", "max_str"),
    ).select(
        "column", "dtype", "n_rows", "n_nulls", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    )


def integrity_checks(
    foreign_keys: list[tuple[str, DataFrame, str, DataFrame, str]]
    | None = None,
    unique_keys: list[tuple[str, DataFrame, list[str]]] | None = None,
) -> DataFrame:
    """(check, n_rows, n_violations) — declarative constraint report.

    ``foreign_keys``: (name, child_df, child_col, parent_df,
    parent_col); a violation is a child row whose (non-null) key has no
    parent. ``unique_keys``: (name, df, key_cols); violations are rows
    beyond the first per key value (NULL keys participate as a value,
    matching SQL GROUP BY)."""
    frames = []
    for name, child, ccol, parent, pcol in foreign_keys or []:
        ch = child.select(F.col(ccol).alias("__k")).filter(
            F.col("__k").isNotNull()
        )
        pa = parent.select(F.col(pcol).alias("__k"))
        orphans = ch.join(pa, "__k", "left_anti")
        frames.append(
            ch.agg(F.count(F.lit(1)).alias("n_rows")).crossJoin(
                orphans.agg(
                    F.count(F.lit(1)).alias("n_violations")
                )
            ).select(F.lit(f"fk:{name}").alias("check"), "n_rows", "n_violations")
        )
    for name, df, keys in unique_keys or []:
        per_key = df.groupBy(*[F.col(k) for k in keys]).agg(
            F.count(F.lit(1)).alias("__c")
        )
        frames.append(
            per_key.agg(
                F.sum("__c").alias("n_rows"),
                F.sum(F.col("__c") - 1).alias("n_violations"),
            ).select(
                F.lit(f"unique:{name}").alias("check"),
                "n_rows",
                F.coalesce(F.col("n_violations"), F.lit(0)).alias(
                    "n_violations"
                ),
            )
        )
    if not frames:
        raise ValueError("no checks declared")
    return reduce(DataFrame.unionByName, frames)
