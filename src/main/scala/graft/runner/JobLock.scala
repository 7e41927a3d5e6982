package graft.runner

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Filesystem job lock — one run of a named job at a time across the
  * cluster (ref `gobblin-runtime/.../locks/FileBasedJobLock.java:40`,
  * `FileBasedJobLockFactory.java`): acquire = atomically create
  * `<lockDir>/<job>.lock`, release = delete it. Works on any Hadoop
  * FileSystem whose create-no-overwrite is atomic (HDFS, local).
  *
  * One extension over the reference: a lock older than `staleMs` can
  * be broken — a crashed driver must not wedge its job forever. The
  * holder's pid/host + timestamp are written into the lock file for
  * operator forensics.
  */
final class JobLock(lockDir: String, jobName: String,
    staleMs: Long = 24L * 3600 * 1000,
    conf: Configuration = new Configuration()) {

  private val lockFile = new Path(lockDir, s"$jobName.lock")
  private val fs = lockFile.getFileSystem(conf)
  // unique per INSTANCE (pid alone would alias two locks in one JVM):
  // release() deletes only a lock file carrying this token, so a
  // holder that lost its lock to a stale-break cannot delete the new
  // holder's live lock
  private val token =
    s"${java.lang.ProcessHandle.current().pid()}@${java.net.InetAddress.getLocalHost.getHostName}:${System.nanoTime()}"
  @volatile private var held = false

  /** Try to acquire; returns false if another live run holds the lock.
    * A stale lock (older than `staleMs`) is broken first.
    */
  def tryAcquire(): Boolean = {
    try {
      // single getFileStatus: exists()-then-stat would throw if the
      // holder releases in between
      val st = fs.getFileStatus(lockFile)
      if (System.currentTimeMillis() - st.getModificationTime > staleMs) {
        // break via rename + re-verify, NOT a blind delete: between
        // our stat and the break another breaker may have taken the
        // lock and re-created it FRESH — deleting that would let two
        // runs hold the lock at once. Renaming parks the candidate
        // where only we can see it; if it turns out fresh, restore it
        // (or drop our steal if the holder already re-created).
        val park = new Path(lockDir, s"$jobName.stale.${System.nanoTime()}")
        if (fs.rename(lockFile, park)) {
          val st2 = fs.getFileStatus(park)
          if (System.currentTimeMillis() - st2.getModificationTime > staleMs)
            fs.delete(park, false) // genuinely stale: gone, race to acquire
          else if (!fs.rename(park, lockFile))
            fs.delete(park, false) // fresh lock re-created meanwhile; back off
        }
      }
    } catch { case _: java.io.FileNotFoundException => () }
    try {
      fs.mkdirs(lockFile.getParent)
      // overwrite=false: atomic create-or-fail is the lock primitive
      val out = fs.create(lockFile, false)
      try out.write(token.getBytes("UTF-8"))
      finally out.close()
      held = true
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.io.IOException if fs.exists(lockFile) => false
    }
  }

  def isLocked: Boolean = fs.exists(lockFile)

  /** Release only OUR lock: after a stale-break took the lock from
    * us, the file carries the new holder's token and must survive.
    */
  def release(): Unit = {
    if (held) {
      try {
        val in = fs.open(lockFile)
        val content =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        if (content == token) fs.delete(lockFile, false)
      } catch { case _: java.io.FileNotFoundException => () }
      held = false
    }
  }

  /** Run `body` under the lock; `None` if the lock is held elsewhere. */
  def withLock[T](body: => T): Option[T] =
    if (!tryAcquire()) None
    else try Some(body) finally release()
}
