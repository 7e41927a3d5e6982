package graft.state

import java.sql.{Connection, DriverManager}

/** JDBC-backed state store — the reference's MysqlStateStore
  * (gobblin-metastore/.../MysqlStateStore.java:66,149: one table of
  * (store_name, table_name, modification_time, state), primary-keyed
  * on the pair, upserted per put) re-expressed over plain JDBC so any
  * ANSI database works (tests pin Derby; the SQL sticks to the
  * portable subset). State payloads reuse the same flat-JSON render
  * as [[FsStateStore]], so a state written through one backend is
  * readable through the other.
  *
  * Scale note: this store holds per-dataset METADATA rows (watermarks,
  * run bookkeeping) — thousands of rows, not data — so a single
  * transactional table is the right shape; the reference made the
  * same call.
  */
final class JdbcStateStore(jdbcUrl: String, table: String = "graft_state")
  extends StateStore {

  require(table.matches("[A-Za-z_][A-Za-z0-9_]*"),
    s"state table name '$table' must be a plain identifier")

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(jdbcUrl)
    try f(c) finally c.close()
  }

  /** Create the backing table if absent (idempotent). */
  def init(): this.type = {
    withConn { c =>
      val meta = c.getMetaData.getTables(null, null, null, Array("TABLE"))
      var exists = false
      while (meta.next()) {
        if (meta.getString("TABLE_NAME").equalsIgnoreCase(table)) exists = true
      }
      meta.close()
      if (!exists) {
        val st = c.createStatement()
        try st.executeUpdate(
          s"""CREATE TABLE $table (
             |  store_name VARCHAR(256) NOT NULL,
             |  table_name VARCHAR(256) NOT NULL,
             |  modification_time TIMESTAMP NOT NULL,
             |  state CLOB NOT NULL,
             |  PRIMARY KEY (store_name, table_name))""".stripMargin)
        finally st.close()
      }
    }
    this
  }

  def put(store: String, key: String, state: Map[String, String]): Unit =
    withConn { c =>
      c.setAutoCommit(false)
      try {
        // portable upsert: delete + insert inside one transaction (the
        // reference uses MySQL's ON DUPLICATE KEY; Derby lacks it)
        val del = c.prepareStatement(
          s"DELETE FROM $table WHERE store_name = ? AND table_name = ?")
        try {
          del.setString(1, store); del.setString(2, key)
          del.executeUpdate()
        } finally del.close()
        val ins = c.prepareStatement(
          s"INSERT INTO $table (store_name, table_name, modification_time, state) VALUES (?, ?, CURRENT_TIMESTAMP, ?)")
        try {
          ins.setString(1, store); ins.setString(2, key)
          ins.setString(3, Json.render(state))
          ins.executeUpdate()
        } finally ins.close()
        c.commit()
      } catch {
        case e: Exception => c.rollback(); throw e
      } finally c.setAutoCommit(true)
    }

  def get(store: String, key: String): Option[Map[String, String]] =
    withConn { c =>
      val q = c.prepareStatement(
        s"SELECT state FROM $table WHERE store_name = ? AND table_name = ?")
      try {
        q.setString(1, store); q.setString(2, key)
        val rs = q.executeQuery()
        try {
          if (rs.next()) Some(Json.parseFlat(rs.getString(1))) else None
        } finally rs.close()
      } finally q.close()
    }

  def delete(store: String, key: String): Unit =
    withConn { c =>
      val d = c.prepareStatement(
        s"DELETE FROM $table WHERE store_name = ? AND table_name = ?")
      try {
        d.setString(1, store); d.setString(2, key)
        d.executeUpdate()
      } finally d.close()
    }

  def listKeys(store: String): Seq[String] =
    withConn { c =>
      val q = c.prepareStatement(
        s"SELECT table_name FROM $table WHERE store_name = ? ORDER BY table_name")
      try {
        q.setString(1, store)
        val rs = q.executeQuery()
        try {
          val out = Seq.newBuilder[String]
          while (rs.next()) out += rs.getString(1)
          out.result()
        } finally rs.close()
      } finally q.close()
    }

  /** Drop every key of a store in one transaction — the reference's
    * whole-store cleanup seam.
    */
  def deleteStore(store: String): Unit =
    withConn { c =>
      val d = c.prepareStatement(s"DELETE FROM $table WHERE store_name = ?")
      try { d.setString(1, store); d.executeUpdate() } finally d.close()
    }
}
