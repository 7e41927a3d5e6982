package graft

/** Resolves external CLI binaries for interop specs. Suite health must
  * not depend on the invoking shell's PATH: probe PATH first, then the
  * standard system bin directories, and let callers `assume()` (skip
  * with notice) when the tool genuinely isn't installed.
  */
object BinTool {

  private val extraDirs = Seq(
    "/usr/local/bin", "/usr/bin", "/bin", "/usr/sbin", "/sbin",
    "/opt/homebrew/bin")

  /** Absolute path of `name` if reachable via PATH or a standard
    * system bin directory; None when the tool is not installed.
    */
  def resolve(name: String): Option[String] = {
    val pathDirs = Option(System.getenv("PATH")).toSeq
      .flatMap(_.split(java.io.File.pathSeparatorChar).toSeq)
      .filter(_.nonEmpty)
    (pathDirs ++ extraDirs).distinct.iterator
      .map(d => new java.io.File(d, name))
      .find(f => f.isFile && f.canExecute)
      .map(_.getAbsolutePath)
  }
}
