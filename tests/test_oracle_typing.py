"""Regression guard: no oracle SQL may emit driver-hash-unstable types.

The driver's value hash is type-sensitive: DuckDB types a bare integer
``SUM(...)`` as HUGEINT, which hashes differently from Spark's BIGINT even
when every value is identical (this flipped repetition_signals and
paragraph_dedup red in round 6 despite value-equal results).  The local
``tests/oracle_utils.compare`` stringifies values and cannot catch it, so
this test types every registered oracle relation directly and asserts none
of the hash-fragile DuckDB types escape uncast.

Convention enforced: cast integer SUMs to ``::BIGINT`` and use explicit
``ROUND(...)``/``CAST(... AS DOUBLE)`` for fractional outputs.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from tests.oracle_utils import duck_connection

from __spark_entry__ import oracle_sql

# DuckDB types whose hash representation diverges from the Spark-side type
# the queries actually return.  HUGEINT/UHUGEINT: bare SUM of integers.
# DECIMAL: literal-division or untyped arithmetic.
_FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_DIR)
    yield c
    c.close()


def _oracle_items():
    return sorted(oracle_sql().items())


@pytest.mark.parametrize("name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()])
def test_oracle_has_no_hash_fragile_types(con, name, sql):
    rel = con.sql(sql)
    offenders = [
        f"{col}:{typ}"
        for col, typ in zip(rel.columns, (str(t) for t in rel.types))
        if any(bad in str(typ).upper() for bad in _FORBIDDEN)
    ]
    assert not offenders, (
        f"oracle '{name}' emits hash-fragile DuckDB types {offenders}; "
        "cast integer SUMs to ::BIGINT and decimals to DOUBLE"
    )
