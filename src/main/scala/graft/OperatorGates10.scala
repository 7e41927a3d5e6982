package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 tier: persisted ANN index maintenance (declarative +
  * streaming, frozen-codebook contract), declarative coverage for the
  * round-7 library operators (funnel, heavy hitters, quota, triplets).
  * Oracles replay every ranking/assignment with identical IEEE
  * expression trees in DuckDB.
  */
object OperatorGates10 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def queries10: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- declarative incremental ANN index job (job.type=annindex):
    //     epoch 1 fits the codebook (Ann.sampledIvf over the FIRST
    //     half — frozen thereafter) and publishes assignments; epoch 2
    //     assigns the second half against the frozen codebook and
    //     merges (delta-wins row replacement); a third run is a no-op.
    //     Search from the PUBLISHED assignments + sidecar codebook
    //     must equal the oracle's full-corpus re-assignment with the
    //     same (first-epoch-seeded) codebook — merge == rebuild ------
    "q_ann_index_job" -> ((s, dir) => {
      import graft.operators.AnnIndex
      import graft.runner.JobConfig
      val e = t(s, dir, "embeddings")
      val tmp = java.nio.file.Files.createTempDirectory("q_ann_index_job").toString
      val props = JobConfig.parse(
        s"""job.type=annindex
           |job.name=vec_index
           |source.path=$tmp/src
           |annindex.id=vec_id
           |annindex.vec=embedding
           |annindex.seq=vec_id
           |annindex.centroids=8
           |sink.staging=$tmp/staging
           |sink.output=$tmp/idx
           |state.dir=$tmp/state
           |""".stripMargin)
      // O(1) driver scalar: the epoch split point, not data
      val maxId = e.agg(max(col("vec_id"))).head.getLong(0)
      val split = maxId / 2
      e.filter(col("vec_id") <= split).write.mode("append").parquet(s"$tmp/src")
      val r1 = JobConfig.runAny(s, props)
      require(r1("published") == "true", s"epoch 1 failed: $r1")
      e.filter(col("vec_id") > split).write.mode("append").parquet(s"$tmp/src")
      val r2 = JobConfig.runAny(s, props)
      require(r2("published") == "true" && r2("highWatermark") == maxId.toString,
        s"epoch 2 failed: $r2")
      val r3 = JobConfig.runAny(s, props)
      require(r3("published") == "false" && r3("deltaRows") == "0",
        s"empty epoch must be a no-op: $r3")
      val idx = AnnIndex.loadCodebook(s"$tmp/idx", s.sparkContext.hadoopConfiguration)
      // assignments live in a list_id-partitioned ShardedTable:
      // searchTable opens ONLY the probed lists' partitions (manifest
      // pruning) — same results as a full-assignments search
      val table = new graft.sink.ShardedTable(s"$tmp/idx", "list_id",
        s.sparkContext.hadoopConfiguration)
      AnnIndex.searchTable(idx, table,
          e.filter(pmod(col("vec_id"), lit(100)) === 0), k = 5, nProbe = 4)
        .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
    }),

    // --- STREAMING ANN index maintenance (foreachBatch +
    //     AnnIndex.merge): three micro-batches of vectors; batches 1+2
    //     carry a STALE (reversed) embedding for every 10th vector,
    //     batch 3 is the correction replay. The codebook is fit from
    //     batch 1 (stale rows included — that's what an online fit
    //     sees) and FROZEN, riding each published snapshot as a
    //     sidecar. Search from the final snapshot must equal the
    //     oracle's full re-assignment of the CORRECTED corpus with the
    //     stale-batch-1-seeded codebook ---------------------------------
    "q_stream_ann_index" -> ((s, dir) => {
      import graft.operators.AnnIndex
      import graft.state.FsStateStore
      import graft.streaming.StreamingIngest
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val staled = e.withColumn("embedding",
        when(pmod(col("vec_id"), lit(10)) === 0, reverse(col("embedding")))
          .otherwise(col("embedding")))
      val maxId = e.agg(max(col("vec_id"))).head.getLong(0)
      val split = maxId / 2
      val inDir = java.nio.file.Files.createTempDirectory("q_stream_ann_index")
      val now = System.currentTimeMillis()
      OperatorGates8.stageFile(staled.filter(col("vec_id") <= split),
        inDir, "b1.parquet", now - 180000)
      OperatorGates8.stageFile(staled.filter(col("vec_id") > split),
        inDir, "b2.parquet", now - 120000)
      OperatorGates8.stageFile(e.filter(pmod(col("vec_id"), lit(10)) === 0),
        inDir, "b3.parquet", now - 60000)
      val root = java.nio.file.Files.createTempDirectory("q_stream_ann_out").toString
      val idxPath = s"$root/idx"
      val hconf = s.sparkContext.hadoopConfiguration
      val stream = StreamingIngest.readFileStream(s, staled.schema,
        inDir.toString, maxFilesPerTrigger = Some(1))
      // each batch commits a list_id-partitioned ShardedTable version
      // rewriting ONLY the lists its delta touches; the frozen
      // codebook (fit from the FIRST batch) is a root sidecar written
      // before the first commit's pointer flip
      val table = new graft.sink.ShardedTable(idxPath, "list_id", hconf)
      val q = stream.writeStream
        .foreachBatch { (delta: DataFrame, _: Long) =>
          val hasCurrent = table.currentVersion.isDefined
          val idx =
            if (hasCurrent) AnnIndex.loadCodebook(idxPath, hconf)
            else {
              val fit = graft.functions.Ann.sampledIvf(delta, k = 8)
              new FsStateStore(idxPath, hconf).put("_centroids", "annindex",
                Map("table" -> AnnIndex.encodeCentroids(fit)))
              fit
            }
          val (merged, touched) =
            AnnIndex.shardedMerge(idx, table, hasCurrent, delta)
          table.commit(merged, touched)
          ()
        }
        .option("checkpointLocation", s"$root/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val idx = AnnIndex.loadCodebook(idxPath, hconf)
      AnnIndex.searchTable(idx, table,
          e.filter(pmod(col("vec_id"), lit(100)) === 0), k = 5, nProbe = 4)
        .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
    }),

    // --- public-key GPG codec (Pgp.encryptPk/decryptPk/PgpPkDecrypt):
    //     a throwaway RSA pair is generated BY THE REAL gpg binary,
    //     documents are encrypted with `gpg --encrypt -r`, and the
    //     executors decrypt through the pure-JCE PKESK path with the
    //     exported (unprotected) secret keyring. Same count-bounded
    //     fixture discipline as q_gpg_roundtrip -----------------------
    "q_gpg_pubkey" -> ((s, dir) => {
      import graft.functions.PgpPkDecrypt
      def sh(cmd: String*): Int = new ProcessBuilder(cmd: _*)
        .redirectErrorStream(true).start().waitFor()
      val tmp = java.nio.file.Files.createTempDirectory("q_gpg_pubkey")
      val home = tmp.resolve("gnupg")
      java.nio.file.Files.createDirectories(home)
      java.nio.file.Files.setPosixFilePermissions(home,
        java.nio.file.attribute.PosixFilePermissions.fromString("rwx------"))
      val params = home.resolve("params")
      java.nio.file.Files.writeString(params,
        """%no-protection
          |Key-Type: RSA
          |Key-Length: 2048
          |Subkey-Type: RSA
          |Subkey-Length: 2048
          |Name-Real: Graft Gate
          |Name-Email: gate@graft
          |Expire-Date: 0
          |%commit
          |""".stripMargin)
      require(sh("gpg", "--homedir", home.toString, "--batch", "--gen-key",
        params.toString) == 0, "gpg key generation failed")
      // -o must precede the --export command (gpg treats trailing args
      // as key names and would dump the ring to stdout)
      require(sh("gpg", "--homedir", home.toString, "--batch", "--yes",
        "-o", home.resolve("sec.gpg").toString,
        "--export-secret-keys", "gate@graft") == 0, "gpg secret export failed")
      val sec = java.nio.file.Files.readAllBytes(home.resolve("sec.gpg"))
      // COUNT-BOUNDED fixture set (same 20 docs at every SF)
      val docs = t(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(25)) === 0 && col("doc_id") < 500)
        .select(col("doc_id"), col("text")).collect()
      val enc = tmp.resolve("enc"); java.nio.file.Files.createDirectories(enc)
      docs.foreach { r =>
        val id = r.getLong(0)
        val pt = tmp.resolve(s"$id.txt")
        java.nio.file.Files.write(pt, r.getString(1).getBytes("UTF-8"))
        require(sh("gpg", "--homedir", home.toString, "--batch", "--yes",
          "--force-mdc", "--trust-model", "always", "-r", "gate@graft",
          "-o", enc.resolve(s"$id.gpg").toString, "--encrypt",
          pt.toString) == 0, s"gpg encrypt failed for doc $id")
      }
      // each per-run temp homedir spawns its OWN gpg-agent; left
      // running they accumulate across rounds until the user's
      // inotify-instance limit kills unrelated tooling (observed: 82
      // stale agents). Decryption below is pure-JCE — the agent is
      // fixture-only, kill it with the fixture.
      sh("gpgconf", "--homedir", home.toString, "--kill", "gpg-agent")
      s.read.format("binaryFile").load(s"$enc/*.gpg")
        .select(regexp_extract(col("path"), "(\\d+)\\.gpg$", 1)
          .cast("long").as("doc_id"), col("content"))
        .select(col("doc_id"),
          PgpPkDecrypt(col("content"), lit(sec)).cast("string").as("text"))
        .orderBy(col("doc_id"))
    }),

    // --- declarative incremental funnel job (job.type=funnel): two
    //     watermark epochs of events; epoch 2 recomputes ONLY the
    //     delta-touched users over their full history (order-sensitive
    //     matching), untouched rows carry over; a third run is a
    //     no-op. The published funnel must equal the oracle's
    //     full-corpus match — touched-key merge == rebuild ------------
    "q_funnel_job" -> ((s, dir) => {
      import graft.runner.JobConfig
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"),
        col("event_type"), expr("unix_micros(ts) div 1000").as("ms"))
      val tmp = java.nio.file.Files.createTempDirectory("q_funnel_job").toString
      val props = JobConfig.parse(
        s"""job.type=funnel
           |job.name=purchase_funnel
           |source.path=$tmp/src
           |funnel.key=user_id
           |funnel.type=event_type
           |funnel.ms=ms
           |funnel.steps=view,click,purchase
           |funnel.maxGapMs=86400000
           |funnel.seq=event_id
           |sink.staging=$tmp/staging
           |sink.output=$tmp/funnel
           |state.dir=$tmp/state
           |""".stripMargin)
      val maxId = ev.agg(max(col("event_id"))).head.getLong(0)
      val split = maxId / 2
      ev.filter(col("event_id") <= split).write.mode("append").parquet(s"$tmp/src")
      val r1 = JobConfig.runAny(s, props)
      require(r1("published") == "true", s"epoch 1 failed: $r1")
      ev.filter(col("event_id") > split).write.mode("append").parquet(s"$tmp/src")
      val r2 = JobConfig.runAny(s, props)
      require(r2("published") == "true" && r2("highWatermark") == maxId.toString,
        s"epoch 2 failed: $r2")
      val r3 = JobConfig.runAny(s, props)
      require(r3("published") == "false" && r3("deltaRows") == "0",
        s"empty epoch must be a no-op: $r3")
      // the funnel dimension is a key-hash ShardedTable since round 9
      new graft.sink.ShardedTable(s"$tmp/funnel", "shard",
          s.sparkContext.hadoopConfiguration)
        .readCurrent(s).drop("shard")
        .orderBy(col("user_id"))
    })
  )

  /** Shared IVF oracle CTE block parameterized by the SEED POPULATION
    * (the frozen-codebook jobs fit centroids from the first epoch /
    * first batch only): seeds by md5('ivf|'+id) within `seedWhere`,
    * cid ascending by vec_id, argmax-dot assignment of the FULL
    * corpus, nProbe probe lists for `probeMod` queries, exact-cosine
    * top-k — mirrors OracleSql.annIvf with a restricted quantizer fit.
    */
  private def frozenIvfSearch(seedWhere: String, seedExpr: String,
      nCentroids: Int, nProbe: Int, k: Int, probeMod: Int): String =
    s"""WITH seeds AS (
       |  SELECT vec_id, $seedExpr AS e FROM embeddings
       |  WHERE $seedWhere
       |  ORDER BY md5('ivf' || '|' || vec_id), vec_id LIMIT $nCentroids
       |), cents AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, e
       |  FROM seeds
       |), scored AS (
       |  SELECT v.vec_id, c.cid,
       |    list_dot_product(CAST(v.embedding AS DOUBLE[]), c.e) AS dot
       |  FROM embeddings v CROSS JOIN cents c
       |), assign AS (
       |  SELECT vec_id, cid FROM scored
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) = 1
       |), plists AS (
       |  SELECT vec_id, cid FROM scored WHERE vec_id % $probeMod = 0
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) <= $nProbe
       |), vecs AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |), cand AS (
       |  SELECT p.vec_id AS query_id, v.vec_id AS neighbor_id,
       |    list_dot_product(a.e, b.e)
       |      / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
       |      AS sim
       |  FROM plists p JOIN assign v ON p.cid = v.cid AND p.vec_id <> v.vec_id
       |  JOIN vecs a ON a.vec_id = p.vec_id
       |  JOIN vecs b ON b.vec_id = v.vec_id
       |)
       |SELECT query_id, neighbor_id, sim FROM cand
       |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= $k
       |ORDER BY query_id, sim DESC, neighbor_id""".stripMargin

  def oracleSql10: Map[String, String] = Map(

    // merge == rebuild: the oracle re-assigns the WHOLE corpus with
    // the codebook seeded from the first epoch only
    "q_ann_index_job" -> frozenIvfSearch(
      seedWhere = "vec_id <= (SELECT max(vec_id) // 2 FROM embeddings)",
      seedExpr = "CAST(embedding AS DOUBLE[])",
      nCentroids = 8, nProbe = 4, k = 5, probeMod = 100),

    // streaming: seeds come from batch 1 (first half) WITH the stale
    // reversal applied to every 10th vector — exactly what the online
    // fit saw; assignment/search run over the CORRECTED final corpus
    "q_stream_ann_index" -> frozenIvfSearch(
      seedWhere = "vec_id <= (SELECT max(vec_id) // 2 FROM embeddings)",
      seedExpr = """CASE WHEN vec_id % 10 = 0
                   |      THEN list_reverse(CAST(embedding AS DOUBLE[]))
                   |      ELSE CAST(embedding AS DOUBLE[]) END""".stripMargin,
      nCentroids = 8, nProbe = 4, k = 5, probeMod = 100),

    "q_gpg_pubkey" ->
      """SELECT doc_id, text FROM documents
        |WHERE ((doc_id % 25) + 25) % 25 = 0 AND doc_id < 500
        |ORDER BY doc_id""".stripMargin,

    // full-corpus funnel replay (same CTE chain as q_funnel): a green
    // row proves the touched-key incremental merge equals the rebuild
    "q_funnel_job" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) // 1000 AS ms FROM events),
        |s1 AS (
        |  SELECT user_id, min(ms) AS t1 FROM ev
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(ms) AS t2 FROM ev e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND ms > t1 AND ms <= t1 + 86400000
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(ms) AS t3 FROM ev e JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND ms > t2 AND ms <= t2 + 86400000
        |  GROUP BY e.user_id)
        |SELECT s1.user_id, t1, t2, t3,
        |  CAST(1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
        |         + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS n_steps
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin
  )
}
