"""Round-5 judge items: the _plan_size_bytes private-API pin."""

import os

from conftest import SF_DIR

from geozero_spark.operators import pip_join as PJ


def test_plan_size_bytes_finite_for_parquet_scan(spark):
    """The prefilter auto-mode keys on Catalyst's sizeInBytes estimate
    through a PRIVATE API (df._jdf.queryExecution). A PySpark upgrade
    that breaks the reflection chain must show up here — not as every
    small join silently flipping into prefilter mode."""
    df = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    est = PJ._plan_size_bytes(df)
    # a real file-stats-based estimate: positive and nowhere near the
    # fail-safe sentinel
    assert 0 < est < 1 << 61
    # projection keeps it estimable (column pruning shrinks it or at
    # minimum keeps it finite)
    est2 = PJ._plan_size_bytes(df.select("doc_id"))
    assert 0 < est2 <= est


def test_plan_size_bytes_fails_safe(spark):
    """On ANY failure the estimate is the huge sentinel -> callers
    treating 'huge' as 'large input' turn the prefilter ON (a
    fixed-cost-vs-linear-saving decision fails safe)."""
    class Broken:
        @property
        def _jdf(self):
            raise RuntimeError("private API changed")

    assert PJ._plan_size_bytes(Broken()) == 1 << 62

    class Broken2:
        class _J:
            def queryExecution(self):
                raise AttributeError("gone")
        _jdf = _J()

    assert PJ._plan_size_bytes(Broken2()) == 1 << 62
