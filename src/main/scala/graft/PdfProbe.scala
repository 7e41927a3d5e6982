package graft

/** Dev probe: extract text from PDF files given as args. */
object PdfProbe {
  def main(args: Array[String]): Unit = {
    args.foreach { p =>
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
      val t = graft.operators.PdfText.extract(1L, bytes)
      println(s"== $p pages=${t.nPages}")
      val txt = t.text
      println(s"chars=${txt.length} replacement=${txt.count(_ == '�')}")
      println(txt.take(600))
      println("---- tail ----")
      println(txt.takeRight(300))
    }
  }
}
