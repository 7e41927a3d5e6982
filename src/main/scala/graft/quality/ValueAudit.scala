package graft.quality

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Value auditing — the engine's take on the reference's audit module
  * (`gobblin-audit`: `ValueAuditGenerator.java`,
  * `RowSelectionPolicy.java` / `ColumnProjectionPolicy.java`,
  * `FsAuditSink.java`, `ValueAuditRuntimeMetadata.java`): snapshot a
  * row-selected, column-projected slice of a dataset at each pipeline
  * phase, then diff the snapshots of two phases to catch value
  * corruption introduced between them.
  *
  * Phase snapshots land under `<auditDir>/<table>/<phase>` as parquet
  * (the FsAuditSink layout, phase metadata in the path). Row selection
  * is a deterministic md5-threshold policy rather than the reference's
  * RNG-based one — at 100 TB an audit sample must be REPLAYABLE: the
  * extract-phase and convert-phase snapshots have to pick the same
  * logical rows or every diff is noise.
  *
  * The comparison is one full-outer equi-join on the audit key and one
  * aggregation pass computing every column's mismatch count
  * simultaneously (never a per-column job), melted to long format.
  */
object ValueAudit {

  /** Keep rows whose 4-hex md5 prefix of (seed|key) falls under
    * `fraction` — the same engine-portable policy Splits uses.
    */
  def rowSample(keyCol: Column, fraction: Double, seed: String = "audit"): Column =
    // the ONE cut formula (Converters.fractionCut: %04x hex compare,
    // 'g' keep-all sentinel) — a second copy here would let the audit
    // policy and its oracle drift from the sampling family
    substring(md5(concat_ws("|", lit(seed), keyCol)), 1, 4) <
      lit(graft.operators.Converters.fractionCut(fraction))

  /** Snapshot one phase: select audit rows, project audit columns,
    * write to the phase directory. Returns the snapshot path.
    */
  def snapshot(df: DataFrame, auditDir: String, table: String, phase: String,
      rowPolicy: Column, columns: Seq[String]): String = {
    val path = s"$auditDir/$table/$phase"
    df.filter(rowPolicy).select(columns.map(col): _*)
      .write.mode("overwrite").parquet(path)
    path
  }

  /** Diff two phase snapshots on `key`: one row per audited column
    * with common/mismatch counts, plus rows present on only one side
    * (a phase that drops or invents records is also corruption).
    */
  def compare(spark: SparkSession, auditDir: String, table: String,
      phaseA: String, phaseB: String, key: String): DataFrame = {
    val a = spark.read.parquet(s"$auditDir/$table/$phaseA")
    val b = spark.read.parquet(s"$auditDir/$table/$phaseB")
    val cols = a.columns.filter(_ != key).toSeq
    require(cols.sorted.sameElements(b.columns.filter(_ != key).sorted),
      s"audit column projections differ between $phaseA and $phaseB")
    val aSel = Seq(lit(1).as("_a"), col(key)) ++
      cols.map(c => col(c).as(s"a_$c"))
    val bSel = Seq(lit(1).as("_b"), col(key)) ++
      cols.map(c => col(c).as(s"b_$c"))
    val joined = a.select(aSel: _*).join(b.select(bSel: _*),
      Seq(key), "full_outer")
    val aggCols = cols.flatMap { c =>
      val both = col("_a").isNotNull && col("_b").isNotNull
      Seq(
        count(when(both, 1)).as(s"common_$c"),
        // null-safe inequality: a null on ONE side is a mismatch
        count(when(both && !(col(s"a_$c") <=> col(s"b_$c")), 1))
          .as(s"mismatch_$c"))
    } ++ Seq(
      count(when(col("_b").isNull, 1)).as("only_a"),
      count(when(col("_a").isNull, 1)).as("only_b"))
    val wide = joined.agg(aggCols.head, aggCols.tail: _*)
    val pairs = cols.flatMap(c => Seq(
      lit(c), struct(col(s"common_$c").as("n_common"),
        col(s"mismatch_$c").as("n_mismatch"),
        col("only_a"), col("only_b"))))
    wide.select(explode(map(pairs: _*)).as(Seq("column", "m")))
      .select(col("column"), col("m.n_common").as("n_common"),
        col("m.n_mismatch").as("n_mismatch"),
        col("m.only_a").as("n_only_a"), col("m.only_b").as("n_only_b"))
  }
}
