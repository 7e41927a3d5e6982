package graft.sink

import graft.SparkSpec

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def tbl() = new VersionedTable(tmpDir("vtable") + "/t",
    spark.sparkContext.hadoopConfiguration)

  test("commit/read/time-travel/rollback lifecycle") {
    val t = tbl()
    assert(t.currentVersion.isEmpty && t.history.isEmpty)
    intercept[IllegalStateException](t.readCurrent(spark))
    assert(t.commit(Seq(1, 2, 3).toDF("x")) === 1L)
    assert(t.commit(Seq(1, 2).toDF("x")) === 2L)
    assert(t.currentVersion.contains(2L))
    assert(t.readCurrent(spark).count() === 2)
    assert(t.read(spark, 1L).count() === 3)
    t.rollback(1L)
    assert(t.readCurrent(spark).count() === 3)
    // commits continue the sequence after rollback; history intact
    assert(t.commit(Seq(9).toDF("x")) === 3L)
    assert(t.history === Seq(1L, 2L, 3L))
    intercept[IllegalArgumentException](t.rollback(7L))
    intercept[IllegalArgumentException](t.read(spark, 0L))
  }

  test("a crash BEFORE the pointer flip leaves the table on the old version") {
    val t = tbl()
    t.commit(Seq(1, 2).toDF("x"))
    // simulate the torn commit: a version directory landed but the
    // pointer never moved (the commit() crash window)
    val root = t.read(spark, 1L).inputFiles.head
      .replaceFirst("/versions/v00001/.*$", "")
    Seq(99).toDF("x").write.parquet(s"$root/versions/v00002")
    assert(t.currentVersion.contains(1L), "pointer must still be v1")
    assert(t.readCurrent(spark).count() === 2)
    // the orphan is visible in history (retention-reclaimable) and the
    // next commit does not collide with it
    assert(t.history === Seq(1L, 2L))
    assert(t.commit(Seq(7).toDF("x")) === 3L)
    assert(t.readCurrent(spark).count() === 1)
  }
}
