package graft.quality

import graft.SparkSpec
import graft.functions.JsonSchema._

/** Property check over random schema trees: parity holds under field
  * and union-branch reordering, and a single random mutation (rename,
  * retype, add, drop) anywhere in the tree always breaks it.
  */
class SchemaCheckPropSpec extends SparkSpec {
  import SchemaCheck.parity

  private val prims: Vector[SType] =
    Vector(SString, SInt, SLong, SDouble, SBoolean, SDate)

  private def genType(rnd: scala.util.Random, depth: Int): SType =
    if (depth <= 0) prims(rnd.nextInt(prims.length))
    else rnd.nextInt(6) match {
      case 0 => SArray(genType(rnd, depth - 1))
      case 1 => SMap(genType(rnd, depth - 1))
      case 2 => genRecord(rnd, depth - 1)
      case 3 => SUnion(Seq(SNull, genType(rnd, depth - 1)))
      case _ => prims(rnd.nextInt(prims.length))
    }

  private def genRecord(rnd: scala.util.Random, depth: Int): SRecord =
    SRecord(s"r${rnd.nextInt(5)}",
      (0 until 1 + rnd.nextInt(4)).map(i => s"f$i" -> genType(rnd, depth)))

  private def shuffle(rnd: scala.util.Random, t: SType): SType = t match {
    case SRecord(nm, fs) =>
      SRecord(nm, rnd.shuffle(fs.map { case (k, v) => k -> shuffle(rnd, v) }))
    case SArray(e) => SArray(shuffle(rnd, e))
    case SMap(v) => SMap(shuffle(rnd, v))
    case SUnion(bs) => SUnion(rnd.shuffle(bs.map(shuffle(rnd, _))))
    case other => other
  }

  /** Mutate ONE node: record rename, field rename, field add, field
    * drop, or primitive retype. Returns None when the tree offers no
    * mutation point of the drawn kind (caller redraws).
    */
  private def mutate(rnd: scala.util.Random, t: SType): Option[SType] =
    t match {
      case SRecord(nm, fs) => rnd.nextInt(4) match {
        case 0 => Some(SRecord(nm + "_x", fs))
        case 1 if fs.nonEmpty =>
          val i = rnd.nextInt(fs.size)
          Some(SRecord(nm, fs.updated(i, (fs(i)._1 + "_x") -> fs(i)._2)))
        case 2 => Some(SRecord(nm, fs :+ ("extra" -> SString)))
        case _ if fs.nonEmpty =>
          val i = rnd.nextInt(fs.size)
          mutate(rnd, fs(i)._2)
            .map(m => SRecord(nm, fs.updated(i, fs(i)._1 -> m)))
            .orElse(Some(SRecord(nm, fs.patch(i, Nil, 1))))
        case _ => Some(SRecord(nm, fs :+ ("extra" -> SString)))
      }
      case SArray(e) => mutate(rnd, e).map(SArray)
      case SMap(v) => mutate(rnd, v).map(SMap)
      case SUnion(bs) if bs.nonEmpty =>
        val i = rnd.nextInt(bs.size)
        mutate(rnd, bs(i)).map(m => SUnion(bs.updated(i, m)))
          .orElse(Some(SUnion(bs.patch(i, Nil, 1))))
      case p =>
        val others = prims.filterNot(_ == p)
        Some(others(rnd.nextInt(others.length)))
    }

  test("parity invariant under reordering; any single mutation breaks it (300 trees)") {
    for (seed <- 1 to 300) {
      val rnd = new scala.util.Random(seed * 7919)
      val base = genRecord(rnd, 3)
      assert(parity(base, base), s"seed=$seed reflexive")
      assert(parity(base, shuffle(rnd, base).asInstanceOf[SRecord]),
        s"seed=$seed shuffled:\n$base")
      mutate(rnd, base) match {
        case Some(mutated) =>
          assert(!parity(base, mutated),
            s"seed=$seed mutation not caught:\nbase=$base\nmut=$mutated")
        case None => fail(s"seed=$seed produced no mutation")
      }
    }
  }
}
