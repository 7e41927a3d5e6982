package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Common Crawl CDX(J) index operations — the planning layer a 100-TB
  * crawl consumer actually uses: instead of reading whole .warc.gz
  * files, resolve target URLs through the published per-crawl index
  * (`urlkey timestamp {json}` lines) to (file, offset, length) ranges
  * and fetch ONLY those byte ranges. Reference seam: the reference
  * plans file-level work units from listings
  * (gobblin-core/.../source/extractor/filebased/FileBasedSource.java);
  * the CDX range plan is the byte-granular refinement crawls need.
  *
  * Everything here is pure codegen'd column chains (no UDF) plus one
  * windowed gaps-and-islands pass for range coalescing.
  */
object CdxIndex {

  /** SURT form of a URL (the index's `urlkey`): scheme dropped,
    * lower-cased, leading `www`/`www2`/`www3`… label stripped, host
    * segments reversed and comma-joined, non-default port kept as
    * `host:port` before reversal (`com,example:8080)/…`), `)/` +
    * path, query params SORTED (the pywb default canonicalizer this
    * module pins in its oracle: it strips `www\d*\.` and only the
    * default :80/:443 ports).
    */
  def surt(url: Column): Column = {
    val lowered = lower(url)
    val noScheme = regexp_replace(lowered, "^[a-z][a-z0-9+.-]*://", "")
    val noFrag = split(noScheme, "#").getItem(0)
    val hostPort = split(noFrag, "/").getItem(0)
    // path+query = everything from the first '/' (or just "/")
    val slashPos = instr(noFrag, "/")
    val pqReal = when(slashPos > 0,
      noFrag.substr(slashPos, length(noFrag) - slashPos + 1))
      .otherwise(lit("/"))
    val host = regexp_replace(split(hostPort, ":").getItem(0), "^www\\d*\\.", "")
    val port = get(split(hostPort, ":"), lit(1)) // null when no port
    val keptPort = when(port.isNotNull && !port.isin("80", "443"),
      concat(lit(":"), port)).otherwise(lit(""))
    val revHost = concat(array_join(reverse(split(host, "\\.")), ","), keptPort)
    // sort query params
    val qpos = instr(pqReal, "?")
    val path = when(qpos > 0, pqReal.substr(lit(1), qpos - 1)).otherwise(pqReal)
    val query = when(qpos > 0, pqReal.substr(qpos + 1, length(pqReal)))
      .otherwise(lit(""))
    val sortedQ = array_join(array_sort(filter(split(query, "&"),
      p => length(p) > 0)), "&")
    concat(revHost, lit(")"), path,
      when(length(sortedQ) > 0, concat(lit("?"), sortedQ)).otherwise(lit("")))
  }

  /** Parse CDXJ lines (`urlkey timestamp {json}`) into typed columns.
    * `lines` must have a `line` string column; malformed lines fail
    * the JSON parse into nulls the caller can police.
    */
  def parseCdxj(lines: DataFrame): DataFrame = {
    val spark = lines.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("url",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("status",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("mime",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("digest",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("filename",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("offset",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.StringType)))
    val _ = spark
    lines
      .withColumn("urlkey", split(col("line"), " ", 3).getItem(0))
      .withColumn("ts", split(col("line"), " ", 3).getItem(1))
      .withColumn("j", from_json(split(col("line"), " ", 3).getItem(2), schema))
      .select(col("urlkey"), col("ts"),
        col("j.url").as("url"),
        col("j.status").cast("int").as("status"),
        col("j.mime").as("mime"),
        col("j.digest").as("digest"),
        col("j.filename").as("filename"),
        col("j.offset").cast("long").as("offset"),
        col("j.length").cast("long").as("length"))
  }

  /** Resolve wanted URLs through the index and coalesce per-file byte
    * ranges whose gaps are at most `maxGap` (HTTP range requests are
    * cheaper when merged across small gaps) — gaps-and-islands over a
    * per-file window, never a driver loop. Output: one row per merged
    * range with the number of records it covers.
    */
  def planFetch(index: DataFrame, wanted: DataFrame, urlCol: String,
      maxGap: Long = 4096): DataFrame = {
    val keys = wanted.select(surt(col(urlCol)).as("urlkey")).distinct()
    coalesceRanges(index.join(keys, "urlkey")
      .select(col("filename"), col("offset"), col("length")), maxGap)
  }

  /** The range-coalescing core of [[planFetch]]: (filename, offset,
    * length) hit rows → per-file gaps-and-islands byte ranges, merged
    * when the gap to the previous record end is <= `maxGap`. Islands
    * are additionally SPLIT at `maxRangeBytes` (a densely-hit file
    * must never coalesce into a range one task cannot buffer — the
    * cap bounds task memory AND keeps ranges inside Int addressing):
    * records are bucketed by `floor((offset - island_start) /
    * maxRangeBytes)`, so a merged range spans at most maxRangeBytes
    * plus one record's length (a single record larger than the cap is
    * still fetched whole — it has to be).
    */
  def coalesceRanges(hits: DataFrame, maxGap: Long,
      maxRangeBytes: Long = 256L << 20): DataFrame = {
    // a merged range can exceed the cap by ONE record's length (a
    // record straddling a bucket boundary stays whole), so the cap
    // itself is bounded at 1 GiB — comfortable headroom under
    // fetchRanges' Int-addressing backstop even for a pathological
    // 1 GiB single record
    require(maxRangeBytes > 0 && maxRangeBytes <= (1L << 30),
      s"maxRangeBytes must be in (0, 1 GiB], got $maxRangeBytes")
    val w = Window.partitionBy(col("filename")).orderBy(col("offset"))
    val withPrev = hits
      .select(col("filename"), col("offset"), col("length"))
      .withColumn("prev_end", max(col("offset") + col("length")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
    val flagged = withPrev.withColumn("new_island",
      when(col("prev_end").isNull ||
        col("offset") > col("prev_end") + maxGap, 1).otherwise(0))
    val islands = flagged.withColumn("island",
      sum(col("new_island")).over(w))
    // island start = running max of the island-opening offsets, under
    // the SAME (filename)-partitioned window as everything above —
    // offsets ascend within a file, so the latest opener seen IS the
    // current island's min(offset). The previous min-over-(filename,
    // island) window forced an extra hash exchange + sort on a
    // partitioning nothing else uses.
    val capped = islands.withColumn("sub",
      floor((col("offset") - max(when(col("new_island") === 1,
        col("offset"))).over(w.rowsBetween(Window.unboundedPreceding, 0))) /
        lit(maxRangeBytes)))
    capped.groupBy(col("filename"), col("island"), col("sub"))
      .agg(min(col("offset")).as("range_start"),
        max(col("offset") + col("length")).as("range_end"),
        count(lit(1)).as("n_records"))
      .select(col("filename"), col("range_start"), col("range_end"),
        (col("range_end") - col("range_start")).as("range_bytes"),
        col("n_records"))
  }

  /** One CDX delta's ledger step — shared by `job.type=cdxfetch` and
    * its streaming face: dedup the delta by content digest, anti-join
    * the digest-sharded ledger over the delta's candidate shards only
    * (never the whole table), coalesce byte ranges and [[fetchRanges]]
    * just the genuinely new content, then merge the fetched documents
    * with the touched shards' existing rows. Returns (merged rows,
    * touched shard ids, cleanup) in the incremental-publish contract's
    * shape — the caller MUST invoke cleanup() once the merged rows are
    * materialized (i.e. after `table.commit`): it unpersists this
    * epoch's cached deltas, which the SQL CacheManager would otherwise
    * pin forever (one leaked MEMORY_AND_DISK entry per micro-batch on
    * the streaming face).
    */
  def ledgerMerge(spark: org.apache.spark.sql.SparkSession,
      table: graft.sink.ShardedTable, hasCurrent: Boolean,
      delta: DataFrame, warcDir: String, seqCol: String,
      maxGap: Long, nShards: Int,
      maxRangeBytes: Long = 256L << 20,
      robots: Option[(DataFrame, String)] = None): (DataFrame, Seq[String], () => Unit) = {
    // optional fetch-time politeness: drop index rows whose URL the
    // robots rules table disallows for `crawler`, BEFORE digest dedup
    // — a disallowed capture must never be fetched, not even as the
    // digest winner another (allowed) URL's content would ride on
    val polite = robots match {
      case None => delta
      case Some((rules, crawler)) =>
        Robots.filterAllowed(delta, "url", rules, crawler)
    }
    // Common Crawl indexes carry `warc/revisit` rows: dedup'd
    // captures whose digest names an ORIGINAL payload, usually in an
    // EARLIER crawl's files. A revisit member holds no payload, so it
    // must never be fetched and never win digest dedup; a digest
    // visible ONLY through revisits is content this crawl's files do
    // not carry — skipped (the ledger already has it when the
    // original crawl was ingested; epochs stay O(new FETCHABLE
    // content)). Applies when the delta carries a `mime` column.
    val fetchable =
      if (polite.columns.contains("mime"))
        polite.filter(col("mime").isNull ||
          lower(col("mime")) =!= "warc/revisit")
      else polite
    // persisted (lazily — the candidate-shard collect right below is
    // the action that materializes it): deduped feeds the candidate
    // collect, the ledger anti-join, and through `fresh` the range
    // plan and the fetch join-back — without the cache each of those
    // re-ran the digest-dedup window chain over the delta (measured:
    // ~4x the stages for identical bytes). O(delta) rows, same bound
    // and discipline as incrementalShardedPublish's delta persist.
    // NOTE: persist registers in the SQL CacheManager, which holds the
    // plan strongly until an explicit unpersist — the returned
    // cleanup() releases both caches after the epoch's commit.
    val deduped = dedupByDigest(fetchable)
      .withColumn("shard", pmod(xxhash64(col("digest")), lit(nShards)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // candidate shards gate the ledger anti-join, which only exists
    // when there IS a ledger: on the first epoch skip the collect job
    // (deduped then materializes at the touched-shard collect below)
    val fresh0 =
      if (!hasCurrent) deduped
      else {
        val candidates = deduped.select("shard").distinct()
          .collect().map(_.getLong(0).toString).toSeq // <= nShards values
        deduped.join(
          table.readPartitions(spark, candidates).select("digest").distinct(),
          Seq("digest"), "left_anti")
      }
    // deterministic one-capture-per-url winner (a URL may carry
    // several digests across recrawls in one delta)
    val urlWin = Window.partitionBy(col("url"))
      .orderBy(col("filename"), col("offset"))
    // persisted for the same reason (materialized by the touched
    // collect): consumed by the range plan, the fetch join-back, and
    // the merged-rows write — O(new fetchable content) rows
    val fresh = fresh0
      .withColumn("_rn", row_number().over(urlWin))
      .filter(col("_rn") === 1).drop("_rn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val touched = fresh.select("shard").distinct()
      .collect().map(_.getLong(0).toString).toSeq
    val plan = coalesceRanges(
      fresh.select("filename", "offset", "length"), maxGap, maxRangeBytes)
    val fetched = fetchRanges(spark, warcDir, plan)
    // ranges cover skipped neighbors too (including OTHER captures of
    // the same URL): join back on the record's addressable identity
    // (filename, member offset) — unique by construction — never on
    // url, which fans out under recrawls. A fresh winner whose range
    // read returned nothing is a planning bug: fail loudly.
    val docs = fresh
      .select(col("url"), col("digest"), col("shard"),
        col("filename"), col("offset"),
        col(seqCol).cast("long").as("seq"))
      // dropDuplicates makes the join provably 1:1 even if two plan
      // ranges ever covered one member (identical decodes either way)
      .join(fetched.select(col("filename"), col("offset"),
          col("payload_text").as("text"))
          .dropDuplicates("filename", "offset"),
        Seq("filename", "offset"), "left")
      .withColumn("text", when(col("text").isNull,
        raise_error(concat(lit("cdxfetch: no record decoded at "),
          col("filename"), lit(":"), col("offset"),
          lit(" for "), col("url")))).otherwise(col("text")))
      .select(col("url"), col("digest"), col("seq"),
        length(col("text")).cast("long").as("n_chars"),
        col("text"), col("shard"))
    val merged =
      if (!hasCurrent) docs
      else table.readPartitions(spark, touched)
        .select("url", "digest", "seq", "n_chars", "text", "shard")
        .unionByName(docs)
    val cleanup = () => {
      deduped.unpersist(blocking = false)
      fresh.unpersist(blocking = false)
      ()
    }
    (merged, touched, cleanup)
  }

  /** Execute a fetch plan against a store of member-per-record
    * .warc.gz files: every plan row becomes ONE bounded seek-read of
    * `[range_start, range_end)` — never a whole-file read, the
    * property that makes a 100-TB crawl consumable — and the slice
    * (whole gzip members by construction) decodes through
    * [[WarcCodec.parse]]. Returns one row per contained response
    * record with its addressable offset (the gzip MEMBER start \u2014 what
    * the CDX index's `offset` column stores, so (filename, offset) is
    * the unique join-back key), the charset-sniffed payload text and
    * its payload MD5 (the digest-join key for synthetic indexes).
    * Distributed: one task per range; executors open the filesystem
    * themselves.
    */
  def fetchRanges(spark: org.apache.spark.sql.SparkSession, warcDir: String,
      plan: DataFrame): DataFrame = {
    import spark.implicits._
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    plan.select(col("filename"), col("range_start").cast("long"),
        col("range_end").cast("long"))
      .as[(String, Long, Long)]
      .mapPartitions(_.flatMap { case (fname, start, end) =>
        require(end > start, s"empty range [$start,$end) for $fname")
        require(end - start <= Int.MaxValue.toLong,
          s"range [$start,$end) for $fname exceeds one task's Int " +
            "addressing; lower cdx.maxRangeBytes")
        val path = new org.apache.hadoop.fs.Path(s"$warcDir/$fname")
        val fs = path.getFileSystem(serConf.value)
        val len = (end - start).toInt
        val buf = new Array[Byte](len)
        val in = fs.open(path)
        try { in.seek(start); in.readFully(buf, 0, len) } finally in.close()
        WarcCodec.parseIndexed(start, buf, base = start).iterator
          .filter(_._2.warcType == "response")
          .map { case (off, r) =>
            val cs = CharsetSniff.javaCharset(r.httpCharset)
            val md = java.security.MessageDigest.getInstance("MD5")
            val digest = md.digest(r.payload)
              .map(b => f"${b & 0xff}%02x").mkString
            (fname, off, r.targetUri, r.httpStatus, digest,
              new String(r.payload, cs).stripPrefix("\uFEFF"))
          }
      })
      .toDF("filename", "offset", "target_uri", "http_status",
        "payload_md5", "payload_text")
  }

  /** Keep ONE index record per content digest before planning — the
    * index's digest column exists exactly for this: identical bodies
    * captured under many URLs need fetching once. Deterministic
    * winner: smallest (filename, offset).
    */
  def dedupByDigest(index: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("digest"))
      .orderBy(col("filename"), col("offset"))
    index.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** RFC 4648 base32 (uppercase, unpadded) of a SHA-1 — the Common
    * Crawl CDX digest convention (20 bytes = exactly 32 chars).
    */
  private[operators] def sha1B32(b: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1").digest(b)
    val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val sb = new java.lang.StringBuilder(32)
    var buf = 0L
    var bits = 0
    d.foreach { byte =>
      buf = (buf << 8) | (byte & 0xffL)
      bits += 8
      while (bits >= 5) {
        bits -= 5
        sb.append(alphabet(((buf >> bits) & 31L).toInt))
      }
    }
    sb.toString
  }

  /** Build a CDX index over a directory of member-per-record .warc.gz
    * files — the PRODUCER side of [[planFetch]]/[[ledgerMerge]]: a
    * crawl with no published index becomes consumable by indexing it
    * once and feeding the result to `job.type=cdxfetch`. Distributed
    * one task per file; each task STREAMS its file through bounded
    * seek-read windows (`windowBytes` at a time, grown only while a
    * single gzip member straddles the cut, capped at `maxMemberBytes`
    * — the same 1 GiB discipline [[fetchRanges]] enforces), so a task
    * never holds a whole archive: production crawl files larger than
    * executor heap — or the 2 GiB Int ceiling — index fine. Emitted
    * per response record: the REAL gzip member offset and compressed
    * member length (what range fetches need), the `urlkey` in SURT
    * form, `ts` from WARC-Date (digits, 14), the HTTP status, the
    * parameter-stripped Content-Type, and the payload digest —
    * `digestAlgo` "sha1b32" (the Common Crawl convention) or "md5"
    * (hex). Columns match [[parseCdxj]], so [[renderCdxj]] serializes
    * the result to CDXJ lines directly.
    */
  def indexWarcs(spark: org.apache.spark.sql.SparkSession, warcDir: String,
      digestAlgo: String = "sha1b32",
      pattern: String = "*.warc.gz",
      windowBytes: Long = 64L << 20,
      maxMemberBytes: Long = 1L << 30): DataFrame = {
    require(digestAlgo == "sha1b32" || digestAlgo == "md5",
      s"unsupported digest algo '$digestAlgo' (sha1b32 | md5)")
    require(windowBytes > 0 && windowBytes <= maxMemberBytes,
      s"windowBytes $windowBytes must be in (0, maxMemberBytes]")
    require(maxMemberBytes <= (1L << 30),
      "maxMemberBytes above 1 GiB breaks one task's Int addressing")
    import spark.implicits._
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // driver-side listing is O(files) metadata, like any scan planning
    val dirPath = new org.apache.hadoop.fs.Path(warcDir)
    val dirFs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // globStatus returns NULL (not empty) for a wildcard-free pattern
    // naming a missing file — fold both into the loud require
    val files = Option(dirFs.globStatus(
      new org.apache.hadoop.fs.Path(dirPath, pattern)))
      .getOrElse(Array.empty)
      .map(st => (st.getPath.getName, st.getLen)).toSeq.sorted
    require(files.nonEmpty, s"no '$pattern' files under $warcDir")
    // a 0-byte archive is an interrupted upload, not an empty crawl —
    // indexing it to zero rows would silently shrink the index
    files.filter(_._2 == 0L).foreach { case (f, _) =>
      throw new IllegalArgumentException(
        s"$warcDir/$f is empty (0 bytes) — refusing to index a " +
          "truncated archive silently")
    }
    val rows = spark.createDataset(files)
      .repartition(math.min(files.size,
        spark.sparkContext.defaultParallelism))
      .mapPartitions(_.flatMap { case (fname, fileLen) =>
        val id = fname.hashCode.toLong & 0x7fffffffL
        val path = new org.apache.hadoop.fs.Path(s"$warcDir/$fname")
        val fs = path.getFileSystem(serConf.value)
        val out = Seq.newBuilder[(String, String, Int, String, String,
          String, Long, Long)]
        val in = fs.open(path)
        try {
          var pos = 0L
          var window = windowBytes
          // mirrors the old whole-file gunzipMembers "inflated to
          // nothing" guard: an archive whose every member inflates
          // empty is corruption, not an empty crawl — the 0-byte-file
          // check above can't see it, so track it across windows
          var anyInflated = false
          while (pos < fileLen) {
            val len = math.min(window, fileLen - pos).toInt
            val buf = new Array[Byte](len)
            in.seek(pos)
            in.readFully(buf, 0, len)
            val (members, consumed) = WarcCodec.gunzipMembersPrefix(id, buf)
            if (members.isEmpty) {
              // no complete member fits this window: grow (a single
              // member straddles the cut) unless the file itself ends
              // inside the member — then it is truncation, be loud
              require(pos + len < fileLen,
                s"$fname: truncated gzip member at $pos (file ends mid-member)")
              require(len.toLong < maxMemberBytes,
                s"$fname: gzip member at $pos exceeds maxMemberBytes $maxMemberBytes")
              window = math.min(window * 2, maxMemberBytes)
            } else {
              members.foreach { case (mStart, mEnd, raw) =>
                if (raw.nonEmpty) anyInflated = true
                (if (raw.isEmpty) Seq.empty
                 else WarcCodec.parseIndexed(id, raw, base = 0L))
                  .filter(_._2.warcType == "response")
                  .foreach { case (_, r) =>
                    val digest =
                      if (digestAlgo == "md5")
                        java.security.MessageDigest.getInstance("MD5")
                          .digest(r.payload)
                          .map(b => f"${b & 0xff}%02x").mkString
                      else sha1B32(r.payload)
                    val ts = r.warcDate.filter(_.isDigit).take(14)
                    out += ((ts, r.targetUri, r.httpStatus, r.httpMime,
                      digest, fname, pos + mStart, mEnd - mStart))
                  }
              }
              pos += consumed
              window = windowBytes // reset after any growth
            }
          }
          require(anyInflated,
            s"$fname: every gzip member inflated to nothing — " +
              "corrupt archive, refusing to index it to zero rows")
        } finally in.close()
        out.result().iterator
      })
      .toDF("ts", "url", "status", "mime", "digest",
        "filename", "offset", "length")
    rows.select(surt(col("url")).as("urlkey"), col("ts"), col("url"),
      col("status"), col("mime"), col("digest"),
      col("filename"), col("offset"), col("length"))
  }

  /** Attempt-safe commit: rename tmp into place, treating
    * "destination exists" as a sibling attempt's identical commit
    * (per-partition content is deterministic). NEVER deletes a
    * committed final — a zombie attempt that deleted the winner's
    * file and died would orphan a path cluster.idx still references;
    * the loser's tmp debris is dropped instead.
    */
  private def commitRename(fs: org.apache.hadoop.fs.FileSystem,
      tmp: org.apache.hadoop.fs.Path,
      fin: org.apache.hadoop.fs.Path): Unit =
    if (!fs.rename(tmp, fin)) {
      require(fs.exists(fin), s"rename $tmp -> $fin failed")
      fs.delete(tmp, false)
    }

  /** Render an index DataFrame back to CDXJ lines (the export side). */
  def renderCdxj(index: DataFrame): DataFrame =
    keyedCdxj(index).select(col("line"))

  /** CDXJ lines keeping the (urlkey, ts) sort key as columns — the
    * ZipNum export orders and blocks on them.
    */
  private def keyedCdxj(index: DataFrame): DataFrame =
    index.select(col("urlkey"), col("ts"), concat(
      col("urlkey"), lit(" "), col("ts"), lit(" "),
      to_json(struct(
        col("url"), col("status").cast("string").as("status"),
        col("mime"), col("digest"), col("filename"),
        col("offset").cast("string").as("offset"),
        col("length").cast("string").as("length")))).as("line"))

  /** pywb-interoperable ZipNum export — the Common Crawl distribution
    * layout external replay tooling consumes: `shards` sorted text
    * shards `cdx-NNNNN.gz` (each a CONCATENATION of standalone gzip
    * members — "blocks" — of at most `linesPerBlock` CDXJ lines, the
    * whole shard still a valid multi-member .gz) plus the plain-text
    * `cluster.idx` secondary index, one line per block:
    *
    *   {{{<first urlkey> <first ts>\t<shard file>\t<offset>\t<length>\t<seq>}}}
    *
    * A reader (pywb's ZipNum cluster) binary-searches cluster.idx for
    * a key, range-reads ONE compressed block from the named shard and
    * gunzips ≤ `linesPerBlock` lines — O(log blocks + block) per
    * lookup over an arbitrarily large index.
    *
    * Scale shape: one range exchange orders the whole index by
    * (urlkey, ts); each shard is written by ITS OWN task (memory =
    * one block's lines); block descriptors — O(rows / linesPerBlock)
    * metadata, the same cardinality as the cluster.idx file itself —
    * flow through a shuffle to the single task that writes
    * cluster.idx (one sorted text file is the format's own design;
    * CC's production cluster.idx is exactly that).
    *
    * `perShardIdx` is the EXTREME-scale layout variant: each shard
    * task also writes its own `cdx-NNNNN.idx` (same line format,
    * seq = the 1-based ordinal within the shard) so secondary-index
    * writing parallelizes with the shards, and instead of the
    * single-task cluster.idx only a tiny `shards.idx` top index (one
    * line per shard — O(shards) driver metadata) is written.
    * [[readZipnum]] consumes both layouts identically.
    */
  def exportZipnum(spark: org.apache.spark.sql.SparkSession,
      index: DataFrame, outDir: String, shards: Int,
      linesPerBlock: Int = 3000, perShardIdx: Boolean = false): Unit = {
    // 5-digit shard names are load-bearing: lexical filename order IS
    // the global key order cluster.idx and readZipnum assume — a 6th
    // digit would sort cdx-100000 before cdx-99999 and silently
    // mis-order the intervals
    require(shards > 0 && shards <= 99999,
      s"shards $shards must be in [1, 99999]")
    require(linesPerBlock > 0, s"linesPerBlock $linesPerBlock must be positive")
    import spark.implicits._
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val outFs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    outFs.mkdirs(new org.apache.hadoop.fs.Path(outDir))
    // Cross-JOB overwrite happens here, on the driver, before any
    // task launches: tasks themselves never delete a committed final
    // (a zombie attempt that deleted the winner's shard and then died
    // would leave cluster.idx naming a missing file). Stale .tmp
    // debris from crashed prior runs goes too.
    Option(outFs.globStatus(new org.apache.hadoop.fs.Path(outDir,
        "{cdx-*.gz,cdx-*.idx,cluster.idx,shards.idx," +
          ".cdx-*.tmp,.cluster.idx.*.tmp}")))
      .getOrElse(Array.empty)
      .foreach(st => outFs.delete(st.getPath, false))
    // total order: the line embeds filename/offset, so (urlkey, ts,
    // line) is unique — range boundaries can't split ties ambiguously
    val ranged = keyedCdxj(index)
      .repartitionByRange(shards, col("urlkey"), col("ts"), col("line"))
      .sortWithinPartitions(col("urlkey"), col("ts"), col("line"))
      .as[(String, String, String)]
    val blocks = ranged.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val fname = f"cdx-$pid%05d.gz"
        val fs = new org.apache.hadoop.fs.Path(outDir)
          .getFileSystem(serConf.value)
        // attempt-safe: write under an attempt-unique temp name, then
        // rename into place — two concurrent attempts (speculation, a
        // zombie after a repartition) never interleave bytes in the
        // final file; the partition's content is deterministic, so
        // whichever attempt's rename lands, cluster.idx offsets hold.
        // Rename-FIRST, never delete the final: "destination exists"
        // means a sibling attempt committed the identical bytes.
        val finalPath = new org.apache.hadoop.fs.Path(s"$outDir/$fname")
        val tmpPath = new org.apache.hadoop.fs.Path(
          s"$outDir/.$fname.attempt-${tc.taskAttemptId()}.tmp")
        val out = fs.create(tmpPath, true)
        val descs = Seq.newBuilder[(String, String, String, Long, Long)]
        var offset = 0L
        val buf = new scala.collection.mutable.ArrayBuffer[(String, String, String)](
          linesPerBlock)
        def flush(): Unit = if (buf.nonEmpty) {
          val bos = new java.io.ByteArrayOutputStream(64 * buf.length)
          val gz = new java.util.zip.GZIPOutputStream(bos)
          buf.foreach { case (_, _, line) =>
            gz.write(line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            gz.write('\n')
          }
          gz.finish(); gz.close()
          val member = bos.toByteArray
          out.write(member)
          descs += ((buf.head._1, buf.head._2, fname, offset,
            member.length.toLong))
          offset += member.length
          buf.clear()
        }
        it.foreach { row =>
          buf += row
          if (buf.length == linesPerBlock) flush()
        }
        flush()
        out.close()
        commitRename(fs, tmpPath, finalPath)
        val ds = descs.result()
        if (perShardIdx) {
          // this shard's OWN secondary index, written by the same
          // task (same attempt-safe protocol) — the variant that
          // parallelizes index writing at extreme block counts
          val idxName = fname.stripSuffix(".gz") + ".idx"
          val idxFinal = new org.apache.hadoop.fs.Path(s"$outDir/$idxName")
          val idxTmp = new org.apache.hadoop.fs.Path(
            s"$outDir/.$idxName.attempt-${tc.taskAttemptId()}.tmp")
          val iout = fs.create(idxTmp, true)
          var iseq = 0L
          ds.foreach { case (uk, ts2, fn, off, len) =>
            iseq += 1
            iout.write(s"$uk $ts2\t$fn\t$off\t$len\t$iseq\n"
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
          iout.close()
          commitRename(fs, idxTmp, idxFinal)
        }
        ds.iterator
      }
    }.toDF("urlkey", "ts", "filename", "offset", "length")
    if (perShardIdx) {
      // top index: one line per shard — O(shards) metadata collected
      // to the driver (the whole point of the variant: nothing
      // O(blocks) funnels through one task or the driver)
      val tops = blocks.groupBy(col("filename"))
        .agg(min_by(struct(col("urlkey"), col("ts")),
            col("offset")).as("first"),
          count(lit(1)).as("nblocks"), sum(col("length")).as("bytes"))
        .select(col("filename"), col("first.urlkey"), col("first.ts"),
          col("nblocks"), col("bytes"))
        .collect().sortBy(_.getString(0))
      val topOut = outFs.create(
        new org.apache.hadoop.fs.Path(s"$outDir/shards.idx"), true)
      tops.foreach { r =>
        topOut.write((s"${r.getString(1)} ${r.getString(2)}\t" +
          s"${r.getString(0)}\t${r.getLong(3)}\t${r.getLong(4)}\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      topOut.close()
      return
    }
    // cluster.idx: every block, globally sorted, one task (the format
    // is one text file); `seq` is the 1-based global block ordinal
    blocks.repartition(1)
      .sortWithinPartitions(col("filename"), col("offset"))
      .as[(String, String, String, Long, Long)]
      .foreachPartition { (it: Iterator[(String, String, String, Long, Long)]) =>
        val tc = org.apache.spark.TaskContext.get()
        val fs = new org.apache.hadoop.fs.Path(outDir)
          .getFileSystem(serConf.value)
        val finalPath = new org.apache.hadoop.fs.Path(s"$outDir/cluster.idx")
        val tmpPath = new org.apache.hadoop.fs.Path(
          s"$outDir/.cluster.idx.attempt-${tc.taskAttemptId()}.tmp")
        val out = fs.create(tmpPath, true)
        var seq = 0L
        it.foreach { case (uk, ts, fname, off, len) =>
          seq += 1
          out.write(s"$uk $ts\t$fname\t$off\t$len\t$seq\n"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
        out.close()
        commitRename(fs, tmpPath, finalPath)
        ()
      }
  }

  /** Read a ZipNum-distributed CDX index (`cdx-*.gz` shards +
    * `cluster.idx`, or the per-shard `cdx-*.idx` variant when no
    * cluster.idx exists) back as the [[parseCdxj]]-shaped DataFrame — the
    * CONSUMER of the layout [[exportZipnum]] writes and Common Crawl
    * actually distributes, so a published index feeds
    * `job.type=cdxfetch` without any parquet conversion step.
    *
    * `urlkeyPrefix` replays what pywb's binary search does,
    * distributively: cluster.idx carries each block's FIRST key, so a
    * block can contain keys in `[key_i, key_{i+1})` — only blocks
    * whose interval intersects the prefix range are range-read at
    * all. IO is O(matching blocks), never O(index); without a prefix
    * every block is read but still only ONCE, streamed per task, no
    * whole-shard buffering.
    */
  def readZipnum(spark: org.apache.spark.sql.SparkSession, dir: String,
      urlkeyPrefix: Option[String] = None): DataFrame = {
    import spark.implicits._
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // cluster.idx is O(blocks) metadata text; the lead() needs the
    // GLOBAL block order, which the format itself defines as the file
    // order (shards sort lexically, offsets within) — one window task
    // over block-descriptor rows, the same cardinality the file holds
    // both layouts: the pywb default (one cluster.idx) and the
    // per-shard variant (cdx-*.idx, same line format) — the window
    // below re-establishes the global block order either way. In the
    // per-shard layout a PREFIX lookup first narrows WHICH .idx
    // files to read through the tiny shards.idx top index (shards
    // are globally key-ordered, so shard intervals prune like block
    // intervals) — block metadata IO stays O(matching shards), not
    // O(all shards), exactly the reason the variant exists.
    val clusterPath = new org.apache.hadoop.fs.Path(s"$dir/cluster.idx")
    val dirFs = clusterPath.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val idxSource: Seq[String] =
      if (dirFs.exists(clusterPath)) Seq(s"$dir/cluster.idx")
      else {
        val topPath = new org.apache.hadoop.fs.Path(s"$dir/shards.idx")
        (urlkeyPrefix, dirFs.exists(topPath)) match {
          case (Some(p), true) =>
            // shards.idx: "<first key>\t<shard gz>\t<blocks>\t<bytes>",
            // lexically ordered by shard = globally ordered by key.
            // O(shards) driver metadata, the same class as scan
            // planning; interval logic mirrors the block filter below
            val in = dirFs.open(topPath)
            val tops = try new String(in.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8)
              .split("\n").toSeq.filter(_.nonEmpty).map(_.split("\t"))
            finally in.close()
            val keep = tops.zipWithIndex.filter { case (t, i) =>
              val nextKey = tops.lift(i + 1).map(_(0))
              t(0) < p + "\uffff" && nextKey.forall(_ >= p)
            }.map { case (t, _) =>
              s"$dir/${t(1).stripSuffix(".gz")}.idx"
            }
            // no candidate shard (prefix past every key): fall back
            // to the full glob — the block-level filter below then
            // drops every block, and an empty-partition shard that
            // never wrote its file can't 404 a concrete path
            if (keep.nonEmpty) keep else Seq(s"$dir/cdx-*.idx")
          case _ => Seq(s"$dir/cdx-*.idx")
        }
      }
    // an EMPTY per-shard export writes no shard files at all (every
    // range partition empty ⇒ no task wrote) — mirror the cluster.idx
    // layout's empty read instead of a Path-does-not-exist crash
    if (idxSource == Seq(s"$dir/cdx-*.idx") &&
      Option(dirFs.globStatus(
        new org.apache.hadoop.fs.Path(s"$dir/cdx-*.idx")))
        .forall(_.isEmpty))
      return parseCdxj(Seq.empty[String].toDF("line"))
    val cluster = spark.read.text(idxSource: _*)
      .select(split(col("value"), "\t").as("f"))
      .select(
        col("f").getItem(0).as("key"),
        col("f").getItem(1).as("filename"),
        col("f").getItem(2).cast("long").as("offset"),
        col("f").getItem(3).cast("long").as("length"))
    val w = Window.orderBy(col("filename"), col("offset"))
    val ranged = cluster.withColumn("next_key",
      lead(col("key"), 1).over(w))
    val wanted = urlkeyPrefix match {
      case None => ranged
      case Some(p) =>
        // key strings in cluster.idx are "<urlkey> <ts>"; a block may
        // hold the prefix iff its first key is below the prefix's
        // upper bound AND the next block starts at-or-after the prefix
        ranged.filter(col("key") < lit(p + "\uffff") &&
          (col("next_key").isNull || col("next_key") >= lit(p)))
    }
    // one open + monotonic seeks per (task, shard file): same-file
    // blocks land in one task sorted by offset, so a full read costs
    // one sequential pass per shard instead of an open/seek/close
    // round trip per block (object stores price exactly that)
    val lines = wanted
      .select(col("filename"), col("offset"), col("length"))
      .repartition(col("filename"))
      .sortWithinPartitions(col("filename"), col("offset"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        var curName: String = null
        var curIn: org.apache.hadoop.fs.FSDataInputStream = null
        def closeCur(): Unit = if (curIn != null) { curIn.close(); curIn = null }
        val out = it.flatMap { case (fname, off, len) =>
          require(len <= Int.MaxValue.toLong,
            s"$fname: block at $off exceeds Int addressing")
          if (fname != curName) {
            closeCur()
            val path = new org.apache.hadoop.fs.Path(s"$dir/$fname")
            curIn = path.getFileSystem(serConf.value).open(path)
            curName = fname
          }
          val buf = new Array[Byte](len.toInt)
          curIn.seek(off)
          curIn.readFully(buf, 0, len.toInt)
          val gz = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(buf))
          new String(gz.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
            .split("\n").iterator.filter(_.nonEmpty)
        }
        // flatMap is lazy: close the stream when the iterator drains
        new scala.collection.AbstractIterator[String] {
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h) closeCur()
            h
          }
          def next(): String = out.next()
        }
      }
      .toDF("line")
    val parsed = parseCdxj(lines)
    urlkeyPrefix match {
      case None => parsed
      case Some(p) => parsed.filter(col("urlkey").startsWith(p))
    }
  }
}
