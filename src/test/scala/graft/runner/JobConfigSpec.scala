package graft.runner

import graft.SparkSpec

/** A reference-style .pull properties file runs the whole pipeline. */
class JobConfigSpec extends SparkSpec {

  test("properties job file runs end-to-end and is incremental on re-run") {
    val root = tmpDir("jobconfig")
    val conf =
      s"""# events ingestion job (reference .pull style)
         |job.name=events_from_props
         |source.format=parquet
         |source.path=${sf()}/events.parquet
         |source.watermark.expr=ts div 1000
         |ops=sqlExpr,timePartition,filter,pick
         |op.sqlExpr.exprs=event_id;timestamp_micros(ts div 1000) as ts;user_id;event_type;value;wm
         |op.timePartition.column=ts
         |op.filter.predicate=event_type <> 'error'
         |op.pick.fields=event_id,user_id,event_type,value,wm,date_key
         |policy.row.value_ok.predicate=value IS NOT NULL AND value >= 0
         |policy.row.value_ok.type=FAIL
         |policy.task.min.rows=1
         |sink.staging=$root/staging
         |sink.output=$root/out
         |sink.partitionBy=date_key
         |state.dir=$root/state
         |quarantine.dir=$root/quarantine
         |""".stripMargin
    val props = JobConfig.parse(conf)

    val r1 = JobConfig.run(spark, props)
    assert(r1.published)
    val out = spark.read.parquet(s"$root/out")
    assert(out.count() == r1.rowsWritten && r1.rowsWritten > 0)
    assert(out.columns.sorted.toSeq ==
      Seq("date_key", "event_id", "event_type", "user_id", "value", "wm"))
    assert(out.filter(org.apache.spark.sql.functions.col("event_type") === "error").count() == 0)

    // re-run: watermark committed, nothing new
    val r2 = JobConfig.run(spark, props)
    assert(r2.rowsWritten == 0)
    assert(spark.read.parquet(s"$root/out").count() == r1.rowsWritten)
  }

  test("declarative encrypt/decrypt ops roundtrip through a JSON keystore") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ks = java.nio.file.Files.createTempFile("ks", ".json")
    java.nio.file.Files.writeString(ks,
      """{"3": "000102030405060708090a0b0c0d0e0f", "8": "ffeeddccbbaa99887766554433221100"}""")
    val conf =
      s"""ops=encrypt,decrypt
         |op.encrypt.keystore=$ks
         |op.encrypt.column=secret
         |op.encrypt.idColumn=id
         |op.decrypt.keystore=$ks
         |op.decrypt.column=secret
         |""".stripMargin
    val ops = JobConfig.buildOps(JobConfig.parse(conf))
    val df = spark.range(20).select(col("id"), concat(lit("v"), col("id")).as("secret"))
    val out = ops.foldLeft(df)((d, op) => op(d)).collect()
    out.foreach(r => assert(r.getString(1) == s"v${r.getLong(0)}"))
  }

  test("declarative grok op parses with the pattern dictionary") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val conf =
      s"""ops=grok
         |op.grok.column=line
         |op.grok.pattern=^%{IP:client} %{WORD:method} %{INT:code:int}$$
         |""".stripMargin
    val ops = JobConfig.buildOps(JobConfig.parse(conf))
    val df = Seq("10.0.0.1 GET 200", "bad line").toDF("line")
    val out = ops.head(df).orderBy(col("code").asc_nulls_last).collect()
    assert(out(0).getAs[String]("client") == "10.0.0.1" && out(0).getAs[Int]("code") == 200)
    assert(out(1).isNullAt(out(1).fieldIndex("code"))) // unparseable -> nulls
  }

  test("unknown op and missing keys fail loudly") {
    val bad = JobConfig.parse("job.name=x\nops=teleport\n")
    intercept[IllegalArgumentException](JobConfig.buildOps(bad))
    intercept[IllegalArgumentException](JobConfig.run(spark, JobConfig.parse("job.name=x")))
  }
}
