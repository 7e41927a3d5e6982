package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Record-driven object-store deletion — ObjectStoreDeleteConverter +
  * the object-store writer (gobblin-core/.../converter/objectstore/
  * ObjectStoreDeleteConverter.java:47): each record names an object to
  * delete; deletes execute per partition in batches against a
  * pluggable client.
  *
  * Same executor-side shape as [[AsyncEnrich]]: no driver collection,
  * batch size bounds each request, a throwing client fails the task
  * and Spark retries (deletes are idempotent by nature).
  */
object ObjectStoreDelete {

  /** Client deletes a batch of keys, returns the keys actually deleted
    * (missing keys are skipped, not errors — delete is idempotent).
    */
  trait DeleteClient extends Serializable {
    def deleteBatch(keys: Seq[String]): Seq[String]
  }

  final case class DeleteStats(requested: Long, deleted: Long)

  def delete(df: DataFrame, keyCol: String, client: DeleteClient,
      batchSize: Int = 1000): DeleteStats = {
    val spark = df.sparkSession
    import spark.implicits._
    val keys: Dataset[String] = df.select(keyCol).as[String]
    val (req, del) = keys.mapPartitions { it =>
      var requested = 0L
      var deleted = 0L
      it.grouped(batchSize).foreach { batch =>
        requested += batch.size
        deleted += client.deleteBatch(batch).size
      }
      Iterator.single((requested, deleted))
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    DeleteStats(req, del)
  }
}
