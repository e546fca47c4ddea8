"""The Iceberg/catalog table-reference seam (read_transcripts):
catalog-name sources resolve through the session catalog (on an
Iceberg deployment this is purely a spark.sql.catalog.* config
change), path sources through format readers, and schema violations
fail loudly at the boundary."""

import datetime

import pytest

from online_centrality_spark.sources.transcripts import read_transcripts

ROWS = [
    ("c1", 0, "user", "hi", None, datetime.datetime(2024, 1, 1, 0, 0, 0)),
    ("c1", 1, "assistant", "hello", "search",
     datetime.datetime(2024, 1, 1, 0, 0, 5)),
]
SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def test_catalog_table_source(spark):
    spark.createDataFrame(ROWS, SCHEMA).createOrReplaceTempView(
        "transcripts_seam_test"
    )
    df = read_transcripts(spark, "transcripts_seam_test")
    assert df.count() == 2
    assert {"conv_id", "turn_idx", "role", "text", "tool", "ts"} <= set(
        df.columns
    )


def test_path_source_parquet(spark, tmp_path):
    p = str(tmp_path / "transcripts.parquet")
    spark.createDataFrame(ROWS, SCHEMA).write.parquet(p)
    df = read_transcripts(spark, p)
    assert df.count() == 2


def test_missing_columns_fail_loudly(spark, tmp_path):
    p = str(tmp_path / "bad.parquet")
    spark.createDataFrame([(1,)], "conv_id long").write.parquet(p)
    with pytest.raises(ValueError, match="missing columns"):
        read_transcripts(spark, p)
