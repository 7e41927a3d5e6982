package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** The reference's Converter matrix (SURVEY.md §2.3; 1 record -> 0..N
  * records, gobblin-api/.../converter/Converter.java:61-190) re-expressed
  * as composable `DataFrame => DataFrame` stages built from Catalyst
  * column expressions — so predicate pushdown / column pruning /
  * whole-stage codegen apply to every stage for free.
  *
  * Each combinator cites its reference counterpart.
  */
object Converters {

  type Op = DataFrame => DataFrame

  /** MultiConverter (gobblin-runtime/.../MultiConverter.java): chain. */
  def chain(ops: Op*): Op = df => ops.foldLeft(df)((d, op) => op(d))

  /** AvroFilterConverter (filter/AvroFilterConverter.java:42,61-86):
    * keep record iff (possibly nested, dot-path) field == value.
    */
  def filterEquals(field: String, value: Any): Op =
    _.filter(col(field) === lit(value))

  /** RowLevelPolicy-style predicate filter. */
  def filterWhere(predicate: Column): Op = _.filter(predicate)

  /** AvroFieldsPickConverter (filter/AvroFieldsPickConverter.java:49):
    * projection of listed (possibly nested) fields.
    */
  def pickFields(fields: String*): Op =
    _.select(fields.map(f => col(f).as(f.replace('.', '_'))): _*)

  /** AvroFieldRetrieverConverter (avro/AvroFieldRetrieverConverter.java:43):
    * extract a single (nested) field as the record.
    */
  def retrieveField(field: String, as: String): Op = _.select(col(field).as(as))

  /** Whole-schema flatten — the reference's AvroFlattener
    * (gobblin-utility/.../AvroFlattener.java): every nested STRUCT
    * leaf lifts to a top-level column named by its path joined with
    * `sep`; arrays and maps ride along un-flattened (the reference
    * lifts record/option nesting, not collections). Pure projection —
    * codegen'd, column-pruned at the scan.
    */
  def flattenAll(sep: String = "_"): Op = df => {
    def leaves(schema: StructType, prefix: Seq[String]): Seq[Seq[String]] =
      schema.fields.toSeq.flatMap { f =>
        f.dataType match {
          case st: StructType => leaves(st, prefix :+ f.name)
          case _ => Seq(prefix :+ f.name)
        }
      }
    val paths = leaves(df.schema, Nil)
    val names = paths.map(_.mkString(sep))
    require(names.distinct.size == names.size,
      s"flatten produces colliding names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    df.select(paths.zip(names).map { case (path, name) =>
      col(path.map(n => s"`$n`").mkString(".")).as(name)
    }: _*)
  }

  /** FlattenNestedKeyConverter (avro/FlattenNestedKeyConverter.java:57):
    * copy nested keys to top level (a.b -> a_b).
    */
  def flattenNestedKeys(paths: String*): Op = df =>
    paths.foldLeft(df)((d, p) => d.withColumn(p.replace('.', '_'), col(p)))

  /** JsonStringToJsonIntermediateConverter + JsonIntermediateToAvroConverter
    * (json/JsonStringToJsonIntermediateConverter.java:48,
    * avro/JsonElementConversionFactory.java:66-762): parse a JSON-string
    * column into typed columns.
    */
  def parseJson(column: String, schema: DataType, keepOriginal: Boolean = false): Op = df => {
    val parsed = df.withColumn(s"__parsed_$column", from_json(col(column), schema))
    val expanded = parsed.select(
      (df.columns.filter(c => keepOriginal || c != column).map(col).toSeq :+
        col(s"__parsed_$column.*")): _*)
    expanded
  }

  /** CsvToJsonConverterV2 (csv/CsvToJsonConverterV2.java:68): apply a
    * schema to a delimited string column by ordinal.
    */
  def splitDelimited(column: String, delim: String, names: Seq[String]): Op = df => {
    val parts = split(col(column), java.util.regex.Pattern.quote(delim))
    names.zipWithIndex.foldLeft(df) { case (d, (n, i)) =>
      d.withColumn(n, parts.getItem(i))
    }.drop(column)
  }

  /** StringFilterConverter (string/StringFilterConverter.java:40,70). */
  def regexFilter(column: String, regex: String): Op =
    _.filter(col(column).rlike(regex))

  /** StringSplitterConverter (string/StringSplitterConverter.java:34,61):
    * 1 -> N via explode.
    */
  def splitToRecords(column: String, delim: String, as: String): Op =
    _.withColumn(as, explode(split(col(column), java.util.regex.Pattern.quote(delim))))

  /** StringSplitterToListConverter: split into a list column. */
  def splitToList(column: String, delim: String, as: String): Op =
    _.withColumn(as, split(col(column), java.util.regex.Pattern.quote(delim)))

  /** SamplingConverter (gobblin-core-base/.../SamplingConverter.java:36).
    * The reference Bernoulli-samples with an RNG; at 100 TB a
    * deterministic, re-runnable sample is strictly better, so we key the
    * sample on a stable id column (mod sampling). `df.sample(fraction)`
    * remains available for true random sampling.
    */
  def sampleDeterministic(idColumn: String, mod: Int, keep: Int = 0): Op =
    _.filter(pmod(col(idColumn), lit(mod)) === lit(keep))

  /** Per-group deterministic pseudo-random sample: keep k rows per
    * group, selected by ranking on a cryptographic hash of the id (+
    * seed). Reproducible run-over-run AND engine-portable (md5), unlike
    * rand()-based reservoir sampling — the property that matters when a
    * 100 TB sample job is retried or audited.
    */
  def sampleKPerGroup(groupCols: Seq[String], idCol: String, k: Int, seed: String = "graft"): Op = df => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(md5(concat_ws("|", lit(seed), col(idCol))), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** Stratified per-group FRACTION sampling: each group keeps its own
    * deterministic share of rows — the corpus-rebalance pass (downsample
    * the over-represented language/source, keep the rare one whole).
    * Same md5-threshold machinery as [[graft.operators.Splits]]: a row
    * is kept iff its 4-hex-digit id-hash prefix falls under the group's
    * cut, so membership is stable under dataset growth and replayable
    * by a SQL oracle. Groups absent from `fractions` keep
    * `defaultFraction` (1.0 = pass through). Pure filter projection —
    * no shuffle, no rand().
    */
  /** 4-hex-digit keep-threshold for a fraction; 1.0 maps to "g", which
    * sorts after every hex prefix ('g' > 'f' in ASCII and SQL alike) —
    * keep-all must not round down to 65535/65536. Shared by the filter
    * and the SQL oracle replay (no second source of truth).
    */
  private[graft] def fractionCut(f: Double): String = {
    require(f >= 0.0 && f <= 1.0, s"fraction $f outside [0,1]")
    if (f >= 1.0) "g" else f"${math.round(f * 65536).min(65535)}%04x"
  }

  def sampleFractionPerGroup(groupCol: String, idCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 1.0,
      seed: String = "graft"): Op = df => {
    val prefix = substring(md5(concat_ws("|", lit(seed), col(idCol))), 1, 4)
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldRight(lit(fractionCut(defaultFraction)): Column) {
        case ((g, f), acc) => when(col(groupCol) === g, lit(fractionCut(f))).otherwise(acc)
      }
    df.filter(prefix < threshold)
  }

  /** Rebalance to a TARGET group mix (DoReMi-style static reweighting,
    * downsample-only): group g keeps min(1, target_g / current_g) of
    * its rows, where current shares come from ONE aggregate (collected
    * driver-side — O(groups), the mix table is configuration-sized)
    * and the keep-filter is the same deterministic md5-threshold
    * machinery as [[sampleFractionPerGroup]] — growth-stable
    * membership, SQL-replayable, no rand(). Empty `targetShares` means
    * a uniform target (1/k per group); groups absent from a non-empty
    * map keep everything.
    */
  def rebalanceToTargetMix(df: DataFrame, groupCol: String, idCol: String,
      targetShares: Map[String, Double] = Map.empty,
      seed: String = "graft"): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1))
    val total = counts.map(_._2).sum.toDouble
    val uniform = 1.0 / counts.length
    val fractions = counts.map { case (g, n) =>
      val target = if (targetShares.isEmpty) uniform else targetShares.getOrElse(g, 1.0)
      g -> math.min(1.0, target / (n / total))
    }.toMap
    sampleFractionPerGroup(groupCol, idCol, fractions, defaultFraction = 1.0, seed)(df)
  }

  /** UniMax/T5-style temperature mixture weights: per-domain sampling
    * weight share^α / Σ share^α and the implied epochs over each
    * domain at that weight. α is fixed at 0.5 so the power is `sqrt`
    * — correctly-rounded IEEE and therefore bit-reproducible across
    * engines (`pow(x, 0.5)` is not).
    *
    * The denominator Σ sqrt(share) is a sum of DOUBLES — order-
    * dependent if folded directly. Instead each term is quantized to
    * a 2^40 fixed-point integer, `swq = floor(sqrt(share) * 2^40)`
    * (multiply by a power of two is exact — pure exponent shift — and
    * sqrt/division are correctly-rounded IEEE, so swq is identical on
    * every engine), and the denominator is the EXACT long sum Σ swq:
    * order-free, no pinned fold, no window at all. Headroom: by
    * Cauchy-Schwarz Σ sqrt(share) <= sqrt(#domains), so the long sum
    * holds past 2^46 domains. Weights shift by <2^-39 relative vs the
    * unquantized ratio — noise for sampling weights.
    *
    * 100 TB shape: ONE corpus aggregation, materialized
    * (localCheckpoint) so the two O(1) driver scalars (total, denomq)
    * re-read the domain-sized table, never the corpus — and a 10M-
    * domain web corpus never funnels through a single-partition
    * window (this operator previously order-pinned the fold through
    * one; [[GlobalOrder]] documents the general pattern).
    */
  def mixtureTemperature(df: DataFrame, domainCol: String): DataFrame = {
    val counts = df.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val total = counts.agg(coalesce(sum(col("n")), lit(0L))).head.getLong(0)
    val quantized = counts
      .withColumn("share", col("n").cast("double") / lit(total))
      .withColumn("swq", floor(sqrt(col("share")) * lit(Sw2p40)).cast("long"))
    val denomq = // exact long sum: order-free
      quantized.agg(coalesce(sum(col("swq")), lit(0L))).head.getLong(0)
    quantized.select(col("domain"), col("n"), col("share"),
      (col("swq").cast("double") / lit(denomq).cast("double")).as("weight"),
      (col("swq").cast("double") / lit(denomq).cast("double")
        * lit(total).cast("double") / col("n")).as("epochs"))
  }

  /** 2^40 as an exact double: the [[mixtureTemperature]] fixed-point
    * quantum (oracle SQL spells it 1099511627776.0).
    */
  private val Sw2p40: Double = 1099511627776.0

  /** Materialize the [[mixtureTemperature]] weights as an actual
    * resampled corpus: every record is emitted `floor(epochs)` times
    * plus one more with probability `frac(epochs)` (deterministic
    * md5-threshold on the id, so replays and oracles see the same
    * copies). Handles BOTH directions — an over-represented domain
    * (epochs < 1) downsamples, a rare one (epochs > 1) repeats. The
    * per-row copy count is a broadcast join + two codegen'd columns;
    * the explode is the only fan-out.
    */
  def temperatureResample(df: DataFrame, domainCol: String, idCol: String,
      seed: String = "graft"): DataFrame = {
    val w = mixtureTemperature(df, domainCol)
      .select(col("domain").as(domainCol), col("epochs"))
    val base = floor(col("epochs")).cast("long")
    val frac = col("epochs") - floor(col("epochs"))
    // 4-hex cut built from the DATA-derived fraction (a column, not a
    // constant): same %04x + string-compare trick as Splits
    val cut = format_string("%04x",
      least(floor(frac * 65536), lit(65535.0)).cast("int"))
    val extra = when(
      substring(md5(concat_ws("|", lit(seed), col(idCol))), 1, 4) < cut,
      1L).otherwise(0L)
    df.join(broadcast(w), Seq(domainCol))
      .withColumn("n_copies", base + extra)
      .filter(col("n_copies") > 0)
      .select(df.columns.map(col) :+
        explode(sequence(lit(1L), col("n_copies"))).as("rep"): _*)
  }

  /** ForkOperator (gobblin-api/.../fork/ForkOperator.java:36; stream impl
    * fork/Forker.java:44-101): route each record to 0..N branches. The
    * Spark shape is cache-once + N filtered branches; callers write each
    * branch to its sink.
    */
  def fork(df: DataFrame, branches: Seq[Column]): Seq[DataFrame] = {
    val cached = if (branches.size > 1) df.persist() else df
    branches.map(cached.filter)
  }

  /** Branch-tagged union — the query-shaped view of a fork, for testing
    * fork semantics without multiple sinks.
    */
  def forkTagged(df: DataFrame, branches: Seq[(String, Column)]): DataFrame =
    branches.map { case (tag, pred) =>
      df.filter(pred).withColumn("branch", lit(tag))
    }.reduce(_.unionAll(_))

  /** CountBasedLimiter / LimitingExtractorDecorator
    * (gobblin-runtime/.../CountBasedLimiter.java:27): deterministic top-k
    * (ordered limit — an unordered limit is nondeterministic under
    * retries at scale).
    */
  def limitBy(n: Int, ordering: Column*): Op = _.orderBy(ordering: _*).limit(n)

  /** GrokToJsonConverter (gobblin-modules/gobblin-grok/.../
    * GrokToJsonConverter.java:86): regex log-line parsing into named
    * typed columns. groups = (name, groupIndex, castTo).
    */
  def grokParse(column: String, pattern: String,
      groups: Seq[(String, Int, String)], dropSource: Boolean = true): Op = df => {
    val parsed = groups.foldLeft(df) { case (d, (name, idx, typ)) =>
      // non-matching lines extract '' -> null fields (ANSI-safe), the
      // converter's "unparseable record" signal
      val raw = regexp_extract(col(column), pattern, idx)
      d.withColumn(name, nullif(raw, lit("")).cast(typ))
    }
    if (dropSource) parsed.drop(column) else parsed
  }

  /** Grok expression form — `%{IP:client} %{WORD:method}`-style pattern
    * references expanded against the pattern library (ref
    * GrokToJsonConverter.java:121), then parsed with [[grokParse]].
    */
  def grok(column: String, expr: String,
      patterns: Map[String, String] = graft.functions.Grok.BasePatterns,
      dropSource: Boolean = true): Op = {
    val compiled = graft.functions.Grok.compile(expr, patterns)
    grokParse(column, compiled.regex, compiled.groups, dropSource)
  }

  /** TimeBasedWriterPartitioner (gobblin-core/.../writer/partitioner/
    * TimeBasedWriterPartitioner.java:59,148-207): derive the yyyy/MM/dd
    * partition key from a timestamp column. Used with
    * `df.write.partitionBy("date_key")` for native dynamic partitioning.
    */
  def withTimePartition(tsColumn: String, as: String = "date_key", fmt: String = "yyyy-MM-dd"): Op =
    _.withColumn(as, date_format(col(tsColumn), fmt))
}
