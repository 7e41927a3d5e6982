package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.FsCopy

/** DatasetFinder: glob discovery, time-window version selection
  * (unparseable names skipped), layout-preserving multi-dataset copy.
  */
class DatasetFinderSpec extends SparkSpec {

  private def mkTree(): String = {
    val root = Files.createTempDirectory("dsf").toString
    val layout = Seq(
      "ds_a/2024-01-01", "ds_a/2024-01-02", "ds_a/2024-02-01", "ds_a/_tmp_stage",
      "ds_b/2024-01-15", "ds_b/2023-12-31",
      "not_a_dataset.txt")
    layout.foreach { rel =>
      val p = java.nio.file.Paths.get(root, rel)
      if (rel.endsWith(".txt")) { Files.createDirectories(p.getParent); Files.writeString(p, "x") }
      else {
        Files.createDirectories(p)
        Files.writeString(p.resolve("data.bin"), s"payload of $rel")
      }
    }
    root
  }

  test("glob finds dataset directories only; window selects parseable dated versions") {
    val root = mkTree()
    val datasets = DatasetFinder.findDatasets(spark, s"$root/ds_*")
    assert(datasets.map(_.name) == Seq("ds_a", "ds_b"))

    val vers = DatasetFinder.versions(spark, datasets)
    assert(vers.count() == 6) // 4 under ds_a (incl _tmp_stage) + 2 under ds_b

    val selected = DatasetFinder.inWindow(vers, "yyyy-MM-dd",
      lit("2024-01-01 00:00:00").cast("timestamp"),
      lit("2024-02-01 00:00:00").cast("timestamp"))
    val names = selected.select("dataset", "version").collect()
      .map(r => s"${r.getString(0)}/${r.getString(1)}").sorted.toSeq
    // 2024-02-01 is outside [from, to); _tmp_stage is unparseable
    assert(names == Seq("ds_a/2024-01-01", "ds_a/2024-01-02", "ds_b/2024-01-15"))
  }

  test("selected versions replicate layout-preserving through FsCopy") {
    val root = mkTree()
    val dest = Files.createTempDirectory("dsf_dest").toString
    val datasets = DatasetFinder.findDatasets(spark, s"$root/ds_*")
    val selected = DatasetFinder.inWindow(DatasetFinder.versions(spark, datasets),
        "yyyy-MM-dd",
        lit("2024-01-01 00:00:00").cast("timestamp"),
        lit("2024-03-01 00:00:00").cast("timestamp"))
      .select("dataset", "version", "path").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    val plan = DatasetFinder.planCopies(spark, selected, dest)
    val res = FsCopy.execute(plan)
    assert(res.files == 4) // 3 ds_a dated + 1 ds_b in window
    assert(FsCopy.verify(plan).isEmpty)
    val copied = Files.readString(
      java.nio.file.Paths.get(dest, "ds_a", "2024-01-02", "data.bin"))
    assert(copied == "payload of ds_a/2024-01-02")
    // out-of-window and unparseable versions must NOT replicate
    assert(!Files.exists(java.nio.file.Paths.get(dest, "ds_b", "2023-12-31")))
    assert(!Files.exists(java.nio.file.Paths.get(dest, "ds_a", "_tmp_stage")))
  }
}
