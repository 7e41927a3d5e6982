package graft.sink

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Property fuzz for the evolution resolver: SEEDED random schema
  * histories — add / drop / rename / drop-then-re-add-the-name /
  * int→long promotion, each snapshot independently choosing whether
  * its parquet files carry footer field ids — written through
  * [[ForeignIceberg.writeHistory]] and read back with
  * [[IcebergMeta.read]]. The expected table is computed from first
  * principles OUTSIDE the reader: a row written at snapshot s
  * surfaces each CURRENT field f as its written value iff f (by
  * FIELD ID) existed in snapshot s's schema, else null. Every value
  * is unique per (snapshot, field id), so a single mis-bound column
  * anywhere produces a concrete mismatch, and a silent null-fill of
  * a renamed column shows up as missing values — the two failure
  * classes the resolver exists to prevent.
  */
class IcebergEvolveFuzzSpec extends graft.SparkSpec {

  private final case class Fld(id: Int, name: String, isLong: Boolean)

  private def runHistory(seed: Int): Unit = {
    val rnd = new Random(seed)
    var nextId = 2
    var retired = Set.empty[String] // names free to re-use after a drop
    var fields = Vector(Fld(1, "k", isLong = true))
    val nSnaps = 2 + rnd.nextInt(3)
    var rowKey = 0L

    // (snapshot schema, rows written at it): value(snap, field) is
    // unique and reconstructible
    def value(snap: Int, fid: Int): Long = snap * 1000L + fid
    val history = (0 until nSnaps).map { snap =>
      if (snap > 0) {
        // mutate: 1-2 random evolution steps
        (0 until (1 + rnd.nextInt(2))).foreach { _ =>
          rnd.nextInt(4) match {
            case 0 => // add (fresh id; maybe re-using a retired name)
              val nm =
                if (retired.nonEmpty && rnd.nextBoolean()) {
                  val n = retired.head; retired -= n; n
                } else s"c$nextId"
              fields = fields :+ Fld(nextId, nm, rnd.nextBoolean())
              nextId += 1
            case 1 if fields.length > 2 => // drop a non-key column
              val victim = fields(1 + rnd.nextInt(fields.length - 1))
              fields = fields.filterNot(_.id == victim.id)
              retired += victim.name
            case 2 if fields.length > 1 => // rename a non-key column
              val i = 1 + rnd.nextInt(fields.length - 1)
              val fresh = s"r${snap}_${fields(i).id}"
              retired -= fresh
              fields = fields.updated(i, fields(i).copy(name = fresh))
            case _ if fields.length > 1 => // promote int -> long
              val i = 1 + rnd.nextInt(fields.length - 1)
              fields = fields.updated(i, fields(i).copy(isLong = true))
            case _ => ()
          }
        }
      }
      val schema = fields
      val nRows = 1 + rnd.nextInt(3)
      val rows = (0 until nRows).map { _ =>
        rowKey += 1
        (rowKey, schema.map(f => f.id -> value(snap, f.id)).toMap)
      }
      (schema, rows, rnd.nextBoolean()) // footer ids or not
    }

    val root = ForeignIceberg.writeHistory(spark, tmpDir(s"fuzz$seed"),
      history.map { case (schema, rows, footerIds) =>
        val st = StructType(schema.map(f => StructField(f.name,
          if (f.isLong) LongType else IntegerType)))
        val data = rows.map { case (k, vals) =>
          Row.fromSeq(schema.map { f =>
            val v = if (f.id == 1) k else vals(f.id)
            if (f.isLong) v else v.toInt
          })
        }
        ForeignIceberg.HistSnap(
          spark.createDataFrame(
            spark.sparkContext.parallelize(data, 1), st),
          schema.map(f => f.name -> f.id).toMap,
          parquetFieldIds = footerIds)
      })

    val current = history.last._1
    val expected = history.zipWithIndex.flatMap {
      case ((schemaAt, rows, _), snap) =>
        val present = schemaAt.map(_.id).toSet
        rows.map { case (k, vals) =>
          current.map { f =>
            if (f.id == 1) Some(k)
            else if (present(f.id)) Some(vals(f.id)) else None
          }
        }
    }.toSet

    val got = IcebergMeta.read(spark, root).collect().map { r =>
      current.indices.map { i =>
        if (r.isNullAt(i)) None
        else if (current(i).isLong) Some(r.getLong(i))
        else Some(r.getInt(i).toLong)
      }.toVector
    }.toSet
    assert(got.map(_.toVector) === expected.map(_.toVector),
      s"seed $seed: history ${history.map(_._1.map(f =>
        s"${f.id}:${f.name}:${if (f.isLong) "L" else "I"}")
        .mkString("[", ",", "]")).mkString(" -> ")}")
  }

  // CI default 40; deep sweeps via GRAFT_FUZZ_SEEDS=N (dev knob)
  private val nSeeds =
    sys.env.getOrElse("GRAFT_FUZZ_SEEDS", "40").toInt
  (1 to nSeeds).foreach { seed =>
    test(s"random evolution history reads exactly (seed $seed)") {
      runHistory(seed)
    }
  }
}
