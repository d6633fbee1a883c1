"""Shared fixtures: one local SparkSession per test run, employee fixture."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import SparkSession, types as T


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("nlp_to_nosql_spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    yield spark
    spark.stop()


EMPLOYEE_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("age", T.LongType()),
        T.StructField("department", T.StringType()),
        T.StructField("position", T.StringType()),
        T.StructField("salary", T.LongType()),
        T.StructField("experience_years", T.LongType()),
        T.StructField("location", T.StringType()),
        T.StructField("joining_date", T.StringType()),
    ]
)

# FIXTURES.md §1: boundary rows (salary exactly 60000), a NULL department,
# mixed-case department (case-insensitive regex), duplicates.
EMPLOYEE_ROWS = [
    ("Alice Adams", 34, "engineering", "SWE", 95000, 8, "NYC", "2019-03-14"),
    ("Bob Brown", 29, "Engineering", "SWE II", 60000, 4, "SF", "2021-06-01"),
    ("Carol Chen", 45, "marketing", "Director", 120000, 20, "NYC", "2018-01-05"),
    ("Dan Diaz", 23, "sales", "AE", 45000, 1, "Austin", "2023-09-30"),
    ("Eve Evans", 51, "hr", "VP People", 140000, 25, "SF", "2018-11-20"),
    ("Frank Ford", 30, None, "Contractor", 50000, 5, "Remote", "2021-01-01"),
    ("Grace Gray", 38, "engineering", "Staff SWE", 150000, 12, "Seattle", "2020-02-29"),
    ("Dan Diaz", 23, "sales", "AE", 45000, 1, "Austin", "2023-09-30"),  # duplicate
    ("Hank Hill", 60, "sales", "Manager", 60001, 30, "Dallas", "2019-07-04"),
    ("Ivy Irwin", 26, "marketing", "Analyst", 39999, 2, "NYC", "2022-05-17"),
]


@pytest.fixture(scope="session")
def employees(spark):
    df = spark.createDataFrame(EMPLOYEE_ROWS, EMPLOYEE_SCHEMA)
    df.createOrReplaceTempView("employees")
    return df
