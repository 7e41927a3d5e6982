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

  /** Try to acquire; returns false if another live run holds the lock.
    * A stale lock (older than `staleMs`) is broken first.
    */
  def tryAcquire(): Boolean = {
    if (fs.exists(lockFile) &&
        System.currentTimeMillis() - fs.getFileStatus(lockFile).getModificationTime > staleMs)
      fs.delete(lockFile, false) // break the stale lock, then race to acquire
    try {
      fs.mkdirs(lockFile.getParent)
      // overwrite=false: atomic create-or-fail is the lock primitive
      val out = fs.create(lockFile, false)
      try out.write(
        s"${java.lang.ProcessHandle.current().pid()}@${java.net.InetAddress.getLocalHost.getHostName} ${System.currentTimeMillis()}"
          .getBytes("UTF-8"))
      finally out.close()
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.io.IOException if fs.exists(lockFile) => false
    }
  }

  def isLocked: Boolean = fs.exists(lockFile)

  def release(): Unit = fs.delete(lockFile, false)

  /** Run `body` under the lock; `None` if the lock is held elsewhere. */
  def withLock[T](body: => T): Option[T] =
    if (!tryAcquire()) None
    else try Some(body) finally release()
}
