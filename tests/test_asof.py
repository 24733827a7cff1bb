"""As-of join edge cases on hand-built data."""

import datetime as dt

import pytest

from vector_search_databricks_poc_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00:00")),  # after both rights
            (2, 10, _ts("2024-01-01T05:00:00")),  # exactly at right ts (inclusive)
            (3, 10, _ts("2024-01-01T00:30:00")),  # before all rights -> no match
            (4, 20, _ts("2024-01-01T12:00:00")),  # key with no right rows
        ],
        "event_id long, key long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T01:00:00"), "state_a"),
            (10, _ts("2024-01-01T05:00:00"), "state_b"),
        ],
        "key long, rts timestamp_ntz, state string",
    )
    return left, right


def test_asof_inner(frames):
    left, right = frames
    out = {
        r["event_id"]: r["state"]
        for r in asof_join(left, right, "key", "ts", "rts", how="inner").collect()
    }
    assert out == {1: "state_b", 2: "state_b"}  # inclusive at equal ts


def test_asof_left(frames):
    left, right = frames
    out = {
        r["event_id"]: r["state"]
        for r in asof_join(left, right, "key", "ts", "rts", how="left").collect()
    }
    assert out == {1: "state_b", 2: "state_b", 3: None, 4: None}


def test_asof_bad_how(frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right, "key", "ts", "rts", how="full")
