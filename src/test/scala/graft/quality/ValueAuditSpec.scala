package graft.quality

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Value audit: deterministic row policy, snapshot layout, and the
  * single-pass multi-column diff (mismatches, null-vs-value, and
  * one-side-only records).
  */
class ValueAuditSpec extends SparkSpec {

  test("rowSample is deterministic and roughly proportional") {
    import spark.implicits._
    val df = (0L until 4096L).toDF("id")
    val kept = df.filter(ValueAudit.rowSample(col("id"), 0.25)).count()
    assert(kept > 800 && kept < 1250) // ~1024 expected
    val again = df.filter(ValueAudit.rowSample(col("id"), 0.25)).count()
    assert(kept == again)
    assert(df.filter(ValueAudit.rowSample(col("id"), 0.0)).count() == 0)
    // fraction 1.0 keeps EVERY row (a capped hex cut would leak ~1/65536)
    assert(df.filter(ValueAudit.rowSample(col("id"), 1.0)).count() == 4096)
  }

  test("compare counts per-column mismatches, null flips, and drops") {
    import spark.implicits._
    val tmp = tmpDir("graft_audit_spec")
    val a = Seq(
      (1L, "x", Some(10L)), (2L, "y", Some(20L)), (3L, "z", None),
      (4L, "w", Some(40L))).toDF("id", "s", "v")
    val b = Seq(
      (1L, "x", Some(10L)), // clean
      (2L, "Y", Some(20L)), // s corrupted
      (3L, "z", Some(30L)), // null -> value flip on v
      (5L, "q", Some(50L))) // invented; id=4 dropped
      .toDF("id", "s", "v")
    val all = lit(true)
    ValueAudit.snapshot(a, tmp, "t", "p1", all, Seq("id", "s", "v"))
    ValueAudit.snapshot(b, tmp, "t", "p2", all, Seq("id", "s", "v"))
    val out = ValueAudit.compare(spark, tmp, "t", "p1", "p2", "id")
      .orderBy("column").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("s") == ((3L, 1L, 1L, 1L)))
    assert(out("v") == ((3L, 1L, 1L, 1L)))
  }

  test("compare refuses mismatched column projections") {
    import spark.implicits._
    val tmp = tmpDir("graft_audit_spec2")
    val df = Seq((1L, "x", 2L)).toDF("id", "s", "v")
    ValueAudit.snapshot(df, tmp, "t", "p1", lit(true), Seq("id", "s"))
    ValueAudit.snapshot(df, tmp, "t", "p2", lit(true), Seq("id", "v"))
    intercept[IllegalArgumentException] {
      ValueAudit.compare(spark, tmp, "t", "p1", "p2", "id")
    }
  }
}
