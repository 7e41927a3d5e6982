package graft.metrics

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.state.{FsStateStore, StateStore}

/** Dataset lineage events, the reference's metrics-lineage surface
  * (ref `gobblin-metrics-base/.../lineage/LineageInfo.java:86-311`,
  * `LineageEventBuilder.java:45-150`): a job sets ONE source
  * descriptor; each fork branch puts its destination under a
  * `branch.<id>.` key prefix; `load` assembles one deduplicated
  * lineage event per (dataset, branch). Persisting through the
  * FsStateStore mirrors the reference's choice of carrying lineage in
  * job state so a downstream collector (GaaS, a metadata service) can
  * read it after the run — and makes the events a queryable DataFrame.
  *
  * Scale note: lineage is O(datasets × branches) metadata; the DATA
  * path never sees it. Event row counts ride the branch writes via
  * `observe()` (zero extra passes).
  */
object Lineage {

  final case class Descriptor(platform: String, name: String) {
    def render: String = s"$platform:$name"
  }

  final case class Event(job: String, dataset: String, branch: Int,
      src: String, dst: String, nRows: Long)

  private val Store = "lineage"
  private val BranchPrefix = "branch."

  /** Declare the job's source dataset. Resets any prior lineage for
    * the job (a rerun re-derives its lineage from scratch).
    */
  def setSource(store: StateStore, job: String, dataset: String,
      source: Descriptor): Unit =
    store.put(Store, job, Map(
      "dataset" -> dataset, "source" -> source.render))

  /** Record one branch's destination (idempotent per branch: a retry
    * overwrites the same keys, so `load` never double-counts).
    */
  def putDestination(store: StateStore, job: String, branch: Int,
      dest: Descriptor, rows: Long): Unit = {
    val cur = store.get(Store, job).getOrElse(
      throw new IllegalStateException(
        s"lineage: putDestination before setSource for job $job"))
    store.put(Store, job, cur ++ Map(
      s"$BranchPrefix$branch.destination" -> dest.render,
      s"$BranchPrefix$branch.rows" -> rows.toString))
  }

  /** Assemble lineage events for the given jobs: one per recorded
    * (dataset, branch) with a destination — branches without one are
    * skipped, matching the reference's "no destination, no event".
    */
  def loadEvents(store: StateStore, jobs: Seq[String]): Seq[Event] =
    jobs.flatMap { job =>
      store.get(Store, job).toSeq.flatMap { st =>
        val dataset = st.getOrElse("dataset", job)
        val src = st.getOrElse("source", "")
        st.keys.collect {
          case k if k.startsWith(BranchPrefix) && k.endsWith(".destination") =>
            k.stripPrefix(BranchPrefix).stripSuffix(".destination").toInt
        }.toSeq.sorted.map { b =>
          Event(job, dataset, b, src,
            st(s"$BranchPrefix$b.destination"),
            st.getOrElse(s"$BranchPrefix$b.rows", "0").toLong)
        }
      }
    }

  /** The queryable form: (job, dataset, branch, src, dst, n_rows). */
  def load(spark: SparkSession, store: StateStore,
      jobs: Seq[String]): DataFrame = {
    import spark.implicits._
    loadEvents(store, jobs)
      .map(e => (e.job, e.dataset, e.branch, e.src, e.dst, e.nRows))
      .toDF("job", "dataset", "branch", "src", "dst", "n_rows")
  }

  /** Drop a job's lineage (ref `LineageInfo.purgeLineageInfo`). */
  def purge(store: StateStore, job: String): Unit =
    store.delete(Store, job)
}
