"""LIVE JDBC scan of geometry blobs — the reference's PostGIS/SQLx
pattern (geozero/src/postgis/, wkb decode over a database row stream)
proven against a real JDBC database, not just decode semantics.

No PostGIS server exists in this sandbox; Apache Derby (embedded, in
Spark's own classpath) provides an actual JDBC driver + SQL engine, so
the full plumbing runs: DataFrame -> JDBC write -> `spark.read.jdbc`
scan -> st_geomfromwkb decode -> geometry struct. Against PostGIS only
the url/driver strings change (and dialect='ewkb' matches its
geometry wire format). Partitioned reads (partitionColumn/num
Partitions) are exercised for the scale shape: N executor tasks each
scanning a key range."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from geozero_spark.functions import udfs
from geozero_spark.kernel import wkb as kwkb, wkt as kwkt

URL_TMPL = "jdbc:derby:{path};create=true"
DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

WKTS = [
    "POINT(1 2)",
    "POINT(-3.5 7.25)",
    "LINESTRING(0 0,1 1,2 0)",
    "POLYGON((0 0,4 0,4 4,0 4,0 0))",
    "POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,1 2,1 1))",
    "MULTIPOINT(1 1,2 2)",
    "MULTILINESTRING((0 0,1 1),(2 2,3 3))",
    "MULTIPOLYGON(((0 0,1 0,1 1,0 0)))",
]


@pytest.fixture(scope="module")
def jdbc_db(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("derby") / "gzdb")
    url = URL_TMPL.format(path=path)
    rows = [(i, bytearray(kwkb.encode(kwkt.decode(w), dialect="ewkb")))
            for i, w in enumerate(WKTS)]
    df = spark.createDataFrame(rows, "gid int, geom_wkb binary")
    (df.write.format("jdbc").option("url", url)
       .option("dbtable", "features").option("driver", DRIVER)
       .mode("overwrite").save())
    yield url
    shutil.rmtree(path, ignore_errors=True)


def test_jdbc_scan_decodes_all_kinds(spark, jdbc_db):
    back = (spark.read.format("jdbc").option("url", jdbc_db)
            .option("dbtable", "features").option("driver", DRIVER)
            .load())
    dec = udfs.st_geomfromwkb(dialect="ewkb")
    enc = udfs.st_aswkt()
    got = {r.gid: r.w for r in back
           .withColumn("g", dec("geom_wkb"))
           .withColumn("w", enc("g")).select("gid", "w").collect()}
    exp = {i: kwkt.encode(kwkt.decode(w)) for i, w in enumerate(WKTS)}
    assert got == exp


def test_jdbc_partitioned_scan(spark, jdbc_db):
    """partitionColumn/numPartitions: each task scans a key range —
    the 10^12-row shape (the reference streams one cursor; a cluster
    scans many)."""
    back = (spark.read.format("jdbc").option("url", jdbc_db)
            .option("dbtable", "features").option("driver", DRIVER)
            .option("partitionColumn", "gid")
            .option("lowerBound", "0")
            .option("upperBound", str(len(WKTS)))
            .option("numPartitions", "4").load())
    assert back.rdd.getNumPartitions() == 4
    dec = udfs.st_geomfromwkb(dialect="ewkb")
    n = back.withColumn("g", dec("geom_wkb")) \
        .where(F.col("g").isNotNull()).count()
    assert n == len(WKTS)


def test_jdbc_pushdown_predicate(spark, jdbc_db):
    """A gid filter reaches the database as a WHERE clause (JDBC
    source pushdown) — `PushedFilters` in the scan plan."""
    back = (spark.read.format("jdbc").option("url", jdbc_db)
            .option("dbtable", "features").option("driver", DRIVER)
            .load().where(F.col("gid") < 3))
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "gid" in plan
    assert back.count() == 3
