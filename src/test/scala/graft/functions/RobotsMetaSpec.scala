package graft.functions

import org.apache.spark.sql.functions._

/** Text.robotsMeta: the page-level indexing-consent matrix — meta
  * robots in both attribute orders and quote styles, `none`/`all`
  * shorthand, X-Robots-Tag union, absent signals.
  */
class RobotsMetaSpec extends graft.SparkSpec {

  private def run(html: String, header: Option[String]): (Boolean, Boolean) = {
    import spark.implicits._
    val df = Seq((html, header.orNull)).toDF("html", "hdr")
    val r = df.select(Text.robotsMeta(col("html"), col("hdr")).as("r"))
      .select(col("r.noindex"), col("r.nofollow")).collect().head
    (r.getBoolean(0), r.getBoolean(1))
  }

  test("directive matrix") {
    assert(run("""<meta name="robots" content="noindex, nofollow">""", None) == (true, true))
    assert(run("""<meta name="robots" content="noindex">""", None) == (true, false))
    assert(run("""<meta content='nofollow' name=robots>""", None) == (false, true))
    assert(run("""<meta name=robots content="none">""", None) == (true, true))
    assert(run("""<meta name="robots" content="all">""", None) == (false, false))
    assert(run("<html>no meta</html>", None) == (false, false))
    assert(run("<html/>", Some("noindex")) == (true, false))
    assert(run("<html/>", Some("NOINDEX, nofollow")) == (true, true))
    // header + meta union
    assert(run("""<meta name="robots" content="noindex">""", Some("nofollow")) == (true, true))
    // case-insensitive names and values, extra attributes
    assert(run("""<META NAME="ROBOTS" data-x="1" CONTENT="NoIndex">""", None) == (true, false))
    // unquoted content values (HTML allows unquoted attributes)
    assert(run("""<meta name=robots content=noindex>""", None) == (true, false))
    assert(run("""<meta name="robots" content=none>""", None) == (true, true))
    assert(run("""<meta content=nofollow name=robots>""", None) == (false, true))
    assert(run("""<meta name=robots content=noindex />""", None) == (true, false))
    // an unrelated meta must not trigger
    assert(run("""<meta name="viewport" content="noindex">""", None) == (false, false))
    assert(run("""<meta name=viewport content=noindex>""", None) == (false, false))
  }
}
