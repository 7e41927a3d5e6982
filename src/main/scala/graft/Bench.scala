package graft
import org.apache.spark.sql.SparkSession

/** Driver benchmark: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR, plus a SCALE-RATIO harness — every query also
  * runs at a 10x-smaller SF (SPARK_GRAFT_SCALE_DIR, default sf0.01)
  * and the line carries t(big)/t(small) per query with super-linear
  * offenders flagged. This turns "the plan survives a 10x scale-up"
  * from code review into a measurement: a data-proportional query on
  * a scale-safe plan should ratio near the data ratio (<= ~10, plus
  * fixed overheads pushing it DOWN); a ratio past `FlagRatio` means
  * some stage grows super-linearly and would bury a 100 TB run.
  * Operator gates doing fixed-size protocol work ratio near 1 — only
  * ratios above the flag line are reported as suspicious.
  */
object Bench {
  private val FlagRatio = 15.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scaleDir = sys.env.get("SPARK_GRAFT_SCALE_DIR")
      .orElse(Some("/root/testdata/sf0.01"))
      .filter(d => d != sfDir && new java.io.File(d).isDirectory)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // Warmup pass (JVM/codegen/broadcast warm; not timed), then timed run.
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    def timedPass(dir: String): Seq[(String, Double, Boolean)] =
      ordered.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, dir).count(); true } catch { case _: Throwable => false }
        (name, (System.nanoTime() - t0) / 1e9, ok)
      }
    // small-SF pass first (also further warmup for the main pass)
    val small = scaleDir.map(d => timedPass(d).map(r => r._1 -> r).toMap)
    // A failing query must not masquerade as a fast success: its entry
    // is null in `queries` and its name is listed under `errors`.
    val results = timedPass(sfDir)
    val qs = results.map { case (k, v, ok) => s"\"" + k + "\":" + (if (ok) v.toString else "null") }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, false) => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    val scaleJson = (small, scaleDir) match {
      case (Some(sm), Some(sd)) =>
        val ratios = results.flatMap { case (k, v, ok) =>
          sm.get(k).collect { case (_, sv, true) if ok && sv > 0 => k -> v / sv }
        }
        val rj = ratios.map { case (k, r) => f""""$k":$r%.2f""" }.mkString("{", ",", "}")
        val flagged = ratios.collect { case (k, r) if r > FlagRatio => "\"" + k + "\"" }
          .mkString("[", ",", "]")
        s""","scale":{"small_sf":"$sd","flag_ratio":$FlagRatio,"ratios":$rj,"flagged":$flagged}"""
      case _ => ""
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"$scaleJson}""")
    spark.stop()
  }
}
