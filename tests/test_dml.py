"""Row-level DML (UPDATE / DELETE / MERGE, file-granularity copy-on-write) —
the reference's Iceberg CoW surface (App.scala:66, spatial UPDATE;
TestSedonaIcebergExtension.scala:82-87)."""

import os

import pytest
from pyspark.sql import functions as F

from sedona_iceberg_extension_spark.operators import dml


@pytest.fixture()
def table(spark, tmp_path):
    """A multi-file parquet table of points: id, data, x, y, geo(WKB)."""
    path = str(tmp_path / "tbl")
    df = spark.sql("""
        SELECT id, CONCAT('row-', id) AS data,
               CAST(id % 10 AS DOUBLE) AS x, CAST(id % 7 AS DOUBLE) AS y,
               ST_Point(CAST(id % 10 AS DOUBLE), CAST(id % 7 AS DOUBLE)) AS geo
        FROM RANGE(0, 100) t(id)
    """)
    df.repartition(5, F.col("id")).write.parquet(path)
    return path


def _files(path):
    return sorted(f for f in os.listdir(path)
                  if not f.startswith((".", "_")) and f.endswith(".parquet")
                  or f.startswith(("part-", "cow-")))


def test_update_spatial_predicate(spark, table):
    """The reference's exact statement shape: UPDATE with an ST_ predicate."""
    before = spark.read.parquet(table).count()
    res = dml.sql_dml(
        spark,
        "UPDATE tbl SET data = 'hit' "
        "WHERE ST_Contains(ST_PolygonFromEnvelope(0.5D, 0.5D, 2.5D, 2.5D), geo)",
        {"tbl": table})
    after = spark.read.parquet(table)
    assert after.count() == before  # UPDATE never changes cardinality
    hits = after.filter(F.col("data") == "hit")
    # points with x in {1,2} and y in {1,2}
    assert hits.count() == res["rows_updated"] > 0
    assert after.filter((F.col("x") == 1) & (F.col("y") == 1)
                        & (F.col("data") != "hit")).count() == 0


def test_update_rewrites_only_touched_files(spark, table):
    files_before = set(_files(table))
    res = dml.update_where(spark, table, {"data": "'touched'"}, "id = 3")
    files_after = set(_files(table))
    # exactly the touched files were replaced; the rest are byte-identical
    # originals (same names still present)
    assert res["files_rewritten"] >= 1
    surviving = files_before & files_after
    assert len(files_before) - len(surviving) == res["files_rewritten"]


def test_update_no_match_is_noop(spark, table):
    files_before = set(_files(table))
    res = dml.update_where(spark, table, {"data": "'x'"}, "id = -1")
    assert res == {"files_rewritten": 0, "rows_updated": 0}
    assert set(_files(table)) == files_before


def test_delete_where(spark, table):
    res = dml.sql_dml(spark, "DELETE FROM tbl WHERE x >= 5.0", {"tbl": table})
    after = spark.read.parquet(table)
    assert res["rows_deleted"] == 50
    assert after.count() == 50
    assert after.filter(F.col("x") >= 5.0).count() == 0


def test_merge_into(spark, table):
    src = spark.sql("""
        SELECT id, CONCAT('merged-', id) AS data,
               CAST(-1.0 AS DOUBLE) AS x, CAST(-1.0 AS DOUBLE) AS y,
               ST_Point(-1.0D, -1.0D) AS geo
        FROM RANGE(95, 110) t(id)
    """)
    res = dml.merge_into(spark, table, src, on="id")
    after = spark.read.parquet(table)
    assert res["rows_updated"] == 5      # ids 95..99 existed
    assert res["rows_inserted"] == 10    # ids 100..109 are new
    assert after.count() == 110
    assert after.filter(F.col("data") == "merged-97").count() == 1
    assert after.filter((F.col("id") == 50)
                        & (F.col("data") == "row-50")).count() == 1


def test_merge_duplicate_source_keys_raise(spark, table):
    src = spark.sql("""
        SELECT CAST(3 AS BIGINT) AS id, CONCAT('dup-', r) AS data,
               CAST(0.0 AS DOUBLE) AS x, CAST(0.0 AS DOUBLE) AS y,
               ST_Point(0.0D, 0.0D) AS geo
        FROM RANGE(0, 2) t(r)
    """)
    with pytest.raises(ValueError, match="multiple rows"):
        dml.merge_into(spark, table, src, on="id")


def test_merge_large_key_set_rewrites_only_touched_files(spark, tmp_path):
    """>10k source keys: no driver-side key collect, no full-table fallback —
    only the files containing matched keys are rewritten."""
    path = str(tmp_path / "big")
    spark.sql("SELECT id, CONCAT('row-', id) AS data FROM RANGE(0, 40000) t(id)") \
        .repartition(8, F.col("id")).write.parquet(path)
    files_before = set(_files(path))
    # 12k keys, all congruent to 0 mod 3 within [0, 36000): hits many files,
    # but ids >= 40000 insert; a bounded band 0..11999 step 1 touches every
    # file — use a range that maps to a subset of files instead
    src = spark.sql(
        "SELECT id * 100000 + 999999999 AS id, 'new' AS data FROM RANGE(0, 12000) t(id)")
    res = dml.merge_into(spark, path, src, on="id")
    assert res["rows_updated"] == 0
    assert res["rows_inserted"] == 12000
    assert res["files_rewritten"] == 0           # nothing matched → no rewrite
    assert files_before <= set(_files(path))     # originals untouched
    assert spark.read.parquet(path).count() == 52000

    # now a >10k-key matched merge: keys hash-partitioned over 8 files all
    # match, so every file is legitimately touched — but through the semi-join
    # plan, not a full-table fallback; verify counts stay exact
    src2 = spark.sql("SELECT id * 2 AS id, 'upd' AS data FROM RANGE(0, 11000) t(id)")
    res2 = dml.merge_into(spark, path, src2, on="id", insert_when_not_matched=False)
    assert res2["rows_updated"] == 11000
    after = spark.read.parquet(path)
    assert after.filter(F.col("data") == "upd").count() == 11000
    assert after.count() == 52000


def test_update_assignment_expression(spark, table):
    dml.sql_dml(spark, "UPDATE tbl SET x = x + 100, data = CONCAT(data, '!') "
                "WHERE id < 10", {"tbl": table})
    after = spark.read.parquet(table)
    assert after.filter(F.col("x") >= 100).count() == 10
    assert after.filter(F.col("data") == "row-3!").count() == 1


def test_merge_sql_statement(spark, table):
    """The Iceberg MERGE statement shape, as SQL text."""
    src = spark.createDataFrame(
        [(3, "merged", 0.0, 0.0), (777, "fresh", 1.0, 1.0)],
        "id long, data string, x double, y double")
    src = src.withColumn("geo", F.expr("ST_Point(x, y)"))
    src.createOrReplaceTempView("merge_src")
    res = dml.sql_dml(
        spark,
        "MERGE INTO tbl USING merge_src ON tbl.id = merge_src.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        {"tbl": table})
    assert res["rows_updated"] == 1 and res["rows_inserted"] == 1
    after = spark.read.parquet(table)
    assert after.count() == 101
    assert after.filter("id = 3 AND data = 'merged'").count() == 1
    assert after.filter("id = 777 AND data = 'fresh'").count() == 1


def test_merge_sql_column_list(spark, table):
    src = spark.createDataFrame([(4, "colmerge", -1.0, -1.0)],
                                "id long, data string, x double, y double")
    src.createOrReplaceTempView("merge_src2")
    res = dml.sql_dml(
        spark,
        "MERGE INTO tbl AS t USING merge_src2 AS s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET data = s.data",
        {"tbl": table})
    assert res["rows_updated"] == 1 and res["rows_inserted"] == 0
    after = spark.read.parquet(table)
    row = after.filter("id = 4").collect()[0]
    assert row["data"] == "colmerge"
    assert row["x"] == 4.0  # only the listed column was updated


def test_update_unknown_column_raises(spark, table):
    with pytest.raises(ValueError, match="unknown column"):
        dml.update_where(spark, table, {"nope": "'x'"}, "id = 1")
    with pytest.raises(ValueError, match="unknown column"):
        dml.sql_dml(spark, "UPDATE tbl SET nope = 'x' WHERE id = 1",
                    {"tbl": table})


def test_merge_unknown_update_col_raises(spark, table):
    src = spark.createDataFrame([(1, "a", 0.0, 0.0)],
                                "id long, data string, x double, y double")
    with pytest.raises(ValueError, match="unknown column"):
        dml.merge_into(spark, table, src, on="id", update_cols=["nope"])


def test_merge_sql_insert_only(spark, table):
    """Iceberg's insert-only MERGE (no WHEN MATCHED clause): existing rows
    are untouched — no file is rewritten at all — and only new keys land."""
    src = spark.createDataFrame(
        [(3, "dupe", 0.0, 0.0), (888, "fresh", 1.0, 1.0)],
        "id long, data string, x double, y double")
    src.createOrReplaceTempView("ins_src")
    res = dml.sql_dml(
        spark,
        "MERGE INTO tbl USING ins_src ON tbl.id = ins_src.id "
        "WHEN NOT MATCHED THEN INSERT *",
        {"tbl": table})
    assert res["files_rewritten"] == 0
    assert res["rows_updated"] == 0 and res["rows_inserted"] == 1
    after = spark.read.parquet(table)
    assert after.count() == 101
    assert after.filter("id = 3 AND data = 'dupe'").count() == 0  # untouched
    assert after.filter("id = 888").count() == 1


def test_cow_file_list_cap(spark, table, monkeypatch):
    """The matched-file collect is bounded: with the cap below the touched
    file count the CoW raises a clear error instead of an unbounded
    driver-side collect (SPARK_GRAFT_MAX_COW_FILES, default 100k)."""
    monkeypatch.setenv("SPARK_GRAFT_MAX_COW_FILES", "1")
    with pytest.raises(RuntimeError, match="SPARK_GRAFT_MAX_COW_FILES"):
        dml.sql_dml(spark, "UPDATE tbl SET data = 'x' WHERE id >= 0",
                    {"tbl": table})
    # untouched on failure: the cap fires at plan time, before any rewrite
    assert spark.read.parquet(table).filter(F.col("data") == "x").count() == 0
    monkeypatch.setenv("SPARK_GRAFT_MAX_COW_FILES", "100")
    res = dml.sql_dml(spark, "UPDATE tbl SET data = 'x' WHERE id >= 0",
                      {"tbl": table})
    assert res["rows_updated"] == 100
