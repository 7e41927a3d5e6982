package graft.sources

import java.time.{Instant, ZoneOffset, ZonedDateTime}
import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoUnit

/** Watermark-interval partitioner for query-based (JDBC) sources.
  *
  * Re-expresses the planning semantics of the reference's
  * gobblin-core/.../source/extractor/partition/Partitioner.java:50,95,167
  * (split [lowWM, highWM] into at most N intervals by watermark type) and
  * watermark/TimestampWatermark.java:54-65 (interval -> SQL predicate).
  * The output feeds `spark.read.jdbc(..., predicates)` so each interval
  * becomes one Spark input partition; Catalyst pushes each predicate into
  * the remote query.
  *
  * Watermark encoding follows the reference: SIMPLE = plain long;
  * DATE/HOUR/TIMESTAMP = yyyyMMdd / yyyyMMddHH / yyyyMMddHHmmss longs
  * in UTC (WatermarkType.java).
  */
sealed trait WatermarkType
object WatermarkType {
  case object Simple extends WatermarkType
  case object Date extends WatermarkType
  case object Hour extends WatermarkType
  case object Timestamp extends WatermarkType
}

object Partitioner {
  private val tsFmt = DateTimeFormatter.ofPattern("yyyyMMddHHmmss").withZone(ZoneOffset.UTC)

  private def toInstant(wm: Long, t: WatermarkType): Instant = t match {
    case WatermarkType.Simple => Instant.ofEpochMilli(wm)
    case WatermarkType.Date =>
      ZonedDateTime.of(wm.toInt / 10000, (wm.toInt / 100 % 100), (wm % 100).toInt,
        0, 0, 0, 0, ZoneOffset.UTC).toInstant
    case WatermarkType.Hour =>
      val d = wm / 100
      ZonedDateTime.of((d / 10000).toInt, (d / 100 % 100).toInt, (d % 100).toInt,
        (wm % 100).toInt, 0, 0, 0, ZoneOffset.UTC).toInstant
    case WatermarkType.Timestamp =>
      ZonedDateTime.parse(wm.toString, tsFmt.withZone(ZoneOffset.UTC)).toInstant
  }

  private def fromInstant(i: Instant, t: WatermarkType): Long = t match {
    case WatermarkType.Simple => i.toEpochMilli
    case WatermarkType.Date =>
      val z = i.atZone(ZoneOffset.UTC)
      z.getYear.toLong * 10000 + z.getMonthValue * 100 + z.getDayOfMonth
    case WatermarkType.Hour =>
      val z = i.atZone(ZoneOffset.UTC)
      (z.getYear.toLong * 10000 + z.getMonthValue * 100 + z.getDayOfMonth) * 100 + z.getHour
    case WatermarkType.Timestamp => tsFmt.format(i).toLong
  }

  /** Split [low, high] (inclusive both ends, as in the reference) into at
    * most maxIntervals half-open [lo, hi) spans, last span closed at high.
    */
  def intervals(low: Long, high: Long, maxIntervals: Int, t: WatermarkType): Seq[(Long, Long)] = {
    require(maxIntervals > 0, "maxIntervals must be positive")
    if (low > high) return Seq.empty
    if (low == high) return Seq((low, high))
    t match {
      case WatermarkType.Simple =>
        val span = high - low
        val n = math.min(maxIntervals.toLong, span).toInt
        val step = math.ceil(span.toDouble / n).toLong
        (0 until n).map { i =>
          val lo = low + i * step
          val hi = math.min(low + (i + 1) * step, high)
          (lo, hi)
        }.filter { case (lo, hi) => lo < hi || (lo == hi && hi == high) }
          .filter { case (lo, _) => lo < high }
      case _ =>
        val unit = t match {
          case WatermarkType.Date => ChronoUnit.DAYS
          case WatermarkType.Hour => ChronoUnit.HOURS
          case _ => ChronoUnit.SECONDS
        }
        val lo = toInstant(low, t); val hi = toInstant(high, t)
        val span = unit.between(lo, hi)
        val n = math.max(1, math.min(maxIntervals.toLong, math.max(span, 1L))).toInt
        val step = math.max(1L, math.ceil(span.toDouble / n).toLong)
        val bounds = Iterator.iterate(lo)(x => x.plus(step, unit)).takeWhile(_.isBefore(hi)).toSeq :+ hi
        bounds.sliding(2).map { case Seq(a, b) => (fromInstant(a, t), fromInstant(b, t)) }.toSeq
    }
  }

  /** SQL predicate for one interval — mirror of
    * TimestampWatermark.getWatermarkCondition (reference :54-65).
    * `isLast` closes the final interval so `high` itself is included.
    */
  def predicate(column: String, lo: Long, hi: Long, t: WatermarkType, isLast: Boolean): String = {
    def render(v: Long): String = t match {
      case WatermarkType.Simple => v.toString
      case _ =>
        val i = toInstant(v, t)
        "'" + DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC).format(i) + "'"
    }
    val upper = if (isLast) "<=" else "<"
    s"$column >= ${render(lo)} AND $column $upper ${render(hi)}"
  }

  /** Full predicate list for `spark.read.jdbc(url, table, predicates, props)`. */
  def jdbcPredicates(column: String, low: Long, high: Long, maxIntervals: Int, t: WatermarkType): Array[String] = {
    val iv = intervals(low, high, maxIntervals, t)
    iv.zipWithIndex.map { case ((lo, hi), i) =>
      predicate(column, lo, hi, t, isLast = i == iv.size - 1)
    }.toArray
  }

  /** One probe-histogram bucket: `count` rows with watermark in [lo, hi). */
  final case class HistBucket(lo: Long, hi: Long, count: Long)

  /** Skew-aware range planning from a count histogram — the one source-
    * planning algorithm Spark does not subsume. Uniform intervals give
    * one partition 100× the rows when the source is skewed; the
    * reference probes a coarse histogram and packs buckets into
    * balanced ranges instead (gobblin-salesforce/.../SalesforceSource
    * .java:272-298: getHistogram → generateWorkUnits with
    * min.target.partition.size).
    *
    * Greedy pack of SORTED buckets: extend the current range while its
    * row total stays within targetRows; a single bucket larger than
    * targetRows becomes its own range (the histogram's granularity is
    * the split floor — probe finer if that hurts). Ranges are made
    * CONTIGUOUS (each ends where the next begins), so rows falling in
    * histogram gaps are never lost.
    */
  def splitByHistogram(buckets: Seq[HistBucket], targetRows: Long): Seq[(Long, Long)] = {
    require(targetRows > 0, "targetRows must be positive")
    val sorted = buckets.sortBy(_.lo)
    sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
      require(a.hi <= b.lo, s"overlapping histogram buckets: $a, $b")
    }
    if (sorted.isEmpty) return Seq.empty
    val starts = scala.collection.mutable.ArrayBuffer(sorted.head.lo)
    var acc = 0L
    var hasBuckets = false // guards on membership, not rows: a zero-count
    sorted.foreach { b =>  // bucket must not absorb an oversized neighbor
      if (hasBuckets && acc + b.count > targetRows) {
        starts += b.lo
        acc = 0L
      }
      acc += b.count
      hasBuckets = true
    }
    val bounds = starts.toSeq :+ sorted.last.hi
    bounds.sliding(2).map { case Seq(lo, hi) => (lo, hi) }.toSeq
  }

  /** Histogram-balanced predicate list for `spark.read.jdbc` — the
    * skew-aware alternative to [[jdbcPredicates]].
    */
  def jdbcPredicatesFromHistogram(column: String, buckets: Seq[HistBucket],
      targetRows: Long, t: WatermarkType): Array[String] = {
    val iv = splitByHistogram(buckets, targetRows)
    iv.zipWithIndex.map { case ((lo, hi), i) =>
      predicate(column, lo, hi, t, isLast = i == iv.size - 1)
    }.toArray
  }
}
