"""Local mirror of the driver's correctness gate: every queries() entry
vs its oracle_sql() via DuckDB at sf0.001 (row count + column names +
order-insensitive canonical value hash)."""

import datetime
import hashlib
import math

import pytest

from tests.conftest import SF_DIR

import __spark_entry__ as entrymod


def _canon(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, int):
        return repr(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, str):
        return v
    try:  # Decimal and friends
        return repr(v)
    except Exception:  # pragma: no cover
        return str(v)


def _rows_digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        "\x1f".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in canon:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    if name not in ORACLES:
        assert len(rows) >= 0  # rows-only smoke: it ran with a schema
        return
    res = duck.sql(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(cols) == sorted(ocols), (
        f"{name}: columns {sorted(cols)} != {sorted(ocols)}")
    assert len(rows) == len(orows), (
        f"{name}: row count {len(rows)} != {len(orows)}")
    got = _rows_digest(cols, rows)
    exp = _rows_digest(ocols, orows)
    if got != exp:
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        gset = sorted("\x1f".join(_canon(r[i]) for i in order)
                      for r in rows)
        oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
        oset = sorted("\x1f".join(_canon(r[i]) for i in oorder)
                      for r in orows)
        diff = [(a, b) for a, b in zip(gset, oset) if a != b][:3]
        pytest.fail(f"{name}: value hash mismatch; first diffs {diff}")


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0 and len(df.columns) > 0
