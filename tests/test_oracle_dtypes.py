"""Regression guard for the driver's value-hash contract (VERDICT r2 #1).

The round-2 correctness failures (rolling_fingerprint, winnow_fingerprints)
were not engine bugs: DuckDB's ``list_sum`` over a BIGINT list returns
HUGEINT, and a NULL-able HUGEINT column NULL-lifts to float64 at fetch, so
the driver hashed ``1.85e+09``-style floats against Spark's exact bigints.

This test pins the fix class for every *current and future* oracle: no
oracle SQL may produce a HUGEINT (or UHUGEINT) column, and no column may
fetch as float when its name/shape suggests Spark emits an integer.  The
first check is static (DuckDB relation binding — no execution), so it runs
on the full registry in milliseconds.
"""

from __future__ import annotations

import pytest

from tests.oracle_compare import duck_connection

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

_FORBIDDEN = {"HUGEINT", "UHUGEINT"}


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_DIR)
    yield c
    c.close()


def _oracle_items():
    return sorted(entrymod.oracle_sql().items())


@pytest.mark.parametrize("name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()])
def test_oracle_output_has_no_hugeint(con, name, sql):
    """Binding-time check: HUGEINT in an oracle's output schema means the
    fetched pandas column NULL-lifts to float64 and the driver's value
    hash diverges from Spark's int64 even when values agree.  Wrap any
    list_sum / wide arithmetic in CAST(... AS BIGINT)."""
    rel = con.sql(sql)
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t).upper() in _FORBIDDEN
    ]
    assert not bad, (
        f"oracle '{name}' produces forbidden wide-int columns {bad}; "
        f"CAST them to BIGINT so the driver fetch stays integral"
    )
