package graft.runner

import java.io.StringReader
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.JobSpec
import graft.operators.Converters
import graft.operators.Converters.Op
import graft.quality.Quality
import graft.state.FsStateStore

/** Properties-file job definitions — the `.pull`/`.job` file interface
  * of the reference (EmbeddedGobblin / job config files,
  * gobblin-runtime/.../embedded/EmbeddedGobblin.java:118-121), so a
  * declarative job is one text file:
  *
  * {{{
  * job.name=events_ingest
  * source.format=parquet
  * source.path=/data/events
  * source.watermark.expr=unix_micros(ts)
  * ops=timePartition,pick
  * op.timePartition.column=ts
  * op.pick.fields=event_id,user_id,value,date_key,wm
  * policy.row.value_present.predicate=value IS NOT NULL
  * policy.row.value_present.type=FAIL
  * policy.task.min.rows=1
  * sink.staging=/data/staging/events
  * sink.output=/data/out/events
  * sink.partitionBy=date_key
  * state.dir=/data/state
  * quarantine.dir=/data/quarantine/events
  * }}}
  *
  * Op vocabulary (ordered via `ops=`): filter, pick, timePartition,
  * regexFilter, sample, dropColumns, sqlExpr, grok (pattern-library
  * parse), encrypt/decrypt (rotating-AES over a JSON keystore).
  * Predicates/expressions are Spark SQL fragments (`expr(...)`) — the
  * full column-function surface without naming JVM classes, replacing
  * the reference's `converter.classes` FQCN lists.
  */
object JobConfig {

  def parse(text: String): Properties = {
    val p = new Properties()
    p.load(new StringReader(text))
    p
  }

  private def req(p: Properties, key: String): String =
    Option(p.getProperty(key)).map(_.trim)
      .getOrElse(throw new IllegalArgumentException(s"missing config: $key"))

  private def opt(p: Properties, key: String): Option[String] =
    Option(p.getProperty(key)).map(_.trim).filter(_.nonEmpty)

  def buildOps(p: Properties): Seq[Op] =
    opt(p, "ops").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil).map {
      case "filter" => Converters.filterWhere(expr(req(p, "op.filter.predicate")))
      case "pick" => Converters.pickFields(
        req(p, "op.pick.fields").split(",").map(_.trim).toIndexedSeq: _*)
      case "timePartition" => Converters.withTimePartition(req(p, "op.timePartition.column"))
      case "regexFilter" => Converters.regexFilter(
        req(p, "op.regexFilter.column"), req(p, "op.regexFilter.pattern"))
      case "sample" => Converters.sampleDeterministic(
        req(p, "op.sample.idColumn"), req(p, "op.sample.mod").toInt)
      case "dropColumns" => (df: DataFrame) =>
        df.drop(req(p, "op.dropColumns.fields").split(",").map(_.trim).toIndexedSeq: _*)
      case "sqlExpr" => (df: DataFrame) =>
        df.selectExpr(req(p, "op.sqlExpr.exprs").split(";").map(_.trim).toIndexedSeq: _*)
      case "grok" => Converters.grok(
        req(p, "op.grok.column"), req(p, "op.grok.pattern"),
        dropSource = opt(p, "op.grok.keepSource").isEmpty)
      case "encrypt" => (df: DataFrame) => {
        import graft.functions.RotatingAes
        val store = RotatingAes.CredentialStore.fromJsonFile(req(p, "op.encrypt.keystore"))
        val c = req(p, "op.encrypt.column")
        df.withColumn(c,
          RotatingAes.encrypt(col(c), RotatingAes.pickKeyId(store, col(req(p, "op.encrypt.idColumn"))), store))
      }
      case "decrypt" => (df: DataFrame) => {
        import graft.functions.RotatingAes
        val store = RotatingAes.CredentialStore.fromJsonFile(req(p, "op.decrypt.keystore"))
        val c = req(p, "op.decrypt.column")
        df.withColumn(c, RotatingAes.decrypt(col(c), store).cast("string"))
      }
      case other => throw new IllegalArgumentException(s"unknown op: $other")
    }

  def buildRowPolicies(p: Properties): Seq[Quality.RowPolicy] = {
    import scala.jdk.CollectionConverters._
    p.stringPropertyNames.asScala.toSeq.sorted
      .filter(k => k.startsWith("policy.row.") && k.endsWith(".predicate"))
      .map { k =>
        val name = k.stripPrefix("policy.row.").stripSuffix(".predicate")
        val ptype = opt(p, s"policy.row.$name.type").getOrElse("FAIL") match {
          case "FAIL" => Quality.Fail
          case "ERR_FILE" => Quality.ErrFile
          case "OPTIONAL" => Quality.Optional
          case other => throw new IllegalArgumentException(s"unknown policy type: $other")
        }
        Quality.RowPolicy(name, expr(p.getProperty(k)), ptype)
      }
  }

  def buildTaskPolicies(p: Properties): Seq[Quality.TaskPolicy] =
    opt(p, "policy.task.min.rows").map { min =>
      Quality.TaskPolicy("min_rows", mandatory = true,
        m => m("rows").asInstanceOf[Long] >= min.toLong)
    }.toSeq

  /** Run a properties-defined job end-to-end via [[JobRunner]]. */
  def run(spark: SparkSession, p: Properties): JobRunner.RunResult = {
    val job = JobSpec(req(p, "job.name"))
    val store = new FsStateStore(req(p, "state.dir"),
      spark.sparkContext.hadoopConfiguration)
    val wmExpr = opt(p, "source.watermark.expr")
    val read = (s: SparkSession) => {
      val df = s.read.format(opt(p, "source.format").getOrElse("parquet"))
        .load(req(p, "source.path"))
      wmExpr.fold(df)(e => df.withColumn("wm", expr(e)))
    }
    JobRunner.run(spark, store, job, read,
      watermarkCol = if (wmExpr.isDefined) "wm" else req(p, "source.watermark.column"),
      ops = buildOps(p),
      rowPolicies = buildRowPolicies(p),
      taskPolicies = buildTaskPolicies(p),
      sink = (req(p, "sink.staging"), req(p, "sink.output"),
        opt(p, "sink.partitionBy").map(_.split(",").map(_.trim).toSeq).getOrElse(Nil)),
      quarantineDir = opt(p, "quarantine.dir"))
  }
}
