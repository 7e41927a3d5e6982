package graft.functions

import scala.collection.mutable

/** Grok pattern-language support: `%{PATTERN:field:type}` references
  * expand — by pure string rewriting — into one plain regex plus an
  * ordered capture list, which feeds Converters.grokParse /
  * regexp_extract (codegen'd, no UDF). This is the reference's
  * GrokToJsonConverter (gobblin-modules/gobblin-grok/.../
  * GrokToJsonConverter.java:121 compiles a grok expression against the
  * pattern library and walks named captures into typed JSON fields).
  *
  * Dictionary entries are written capture-free (only `(?:…)` groups),
  * so capture indices are exactly the named `%{…:field}` references in
  * left-to-right order — what regexp_extract needs.
  */
object Grok {

  /** The standard base patterns users actually hit (subset of the
    * public grok-patterns file, rewritten with non-capturing groups).
    */
  val BasePatterns: Map[String, String] = Map(
    "WORD" -> "\\b\\w+\\b",
    "NOTSPACE" -> "\\S+",
    "SPACE" -> "\\s*",
    "DATA" -> ".*?",
    "GREEDYDATA" -> ".*",
    "INT" -> "(?:[+-]?(?:[0-9]+))",
    "BASE10NUM" -> "(?:[+-]?(?:(?:[0-9]+(?:\\.[0-9]+)?)|(?:\\.[0-9]+)))",
    "NUMBER" -> "(?:%{BASE10NUM})",
    "POSINT" -> "\\b(?:[1-9][0-9]*)\\b",
    "NONNEGINT" -> "\\b(?:[0-9]+)\\b",
    "USERNAME" -> "[a-zA-Z0-9._-]+",
    "USER" -> "%{USERNAME}",
    "UUID" -> "[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "IPV4" -> "(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)",
    "IP" -> "%{IPV4}",
    "HOSTNAME" -> "\\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\\.?\\b",
    "IPORHOST" -> "(?:%{IP}|%{HOSTNAME})",
    "QUOTEDSTRING" -> "(?:\"(?:[^\"\\\\]|\\\\.)*\")",
    "YEAR" -> "(?:\\d\\d){1,2}",
    "MONTHNUM" -> "(?:0?[1-9]|1[0-2])",
    "MONTHDAY" -> "(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "HOUR" -> "(?:2[0123]|[01]?[0-9])",
    "MINUTE" -> "(?:[0-5][0-9])",
    "SECOND" -> "(?:[0-5][0-9](?:[:.,][0-9]+)?|60)",
    "TIME" -> "(?:%{HOUR}:%{MINUTE}(?::%{SECOND})?)",
    "DATE_ISO" -> "%{YEAR}-%{MONTHNUM}-%{MONTHDAY}",
    "TIMESTAMP_ISO8601" -> "%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?(?:Z|[+-]%{HOUR}(?::?%{MINUTE})?)?",
    "LOGLEVEL" -> "(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo?(?:rmation)?|INFO?(?:RMATION)?|[Ww]arn?(?:ing)?|WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|[Cc]rit?(?:ical)?|CRIT?(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)")

  private val Ref = "%\\{(\\w+)(?::(\\w+))?(?::(\\w+))?\\}".r

  /** Compiled grok: the expanded regex and the capture list in
    * regexp_extract form — (field, 1-based group index, Spark cast type).
    */
  final case class Compiled(regex: String, groups: Seq[(String, Int, String)])

  private def sparkType(grokType: Option[String]): String = grokType match {
    case Some("int") => "int"
    case Some("long") => "long"
    case Some("float") => "float"
    case Some("double") => "double"
    case Some("boolean") => "boolean"
    case None | Some("string") => "string"
    case Some(other) => throw new IllegalArgumentException(s"unknown grok cast type '$other'")
  }

  /** Expand a grok expression into [[Compiled]]. Unnamed `%{P}` refs
    * become non-capturing; `%{P:field}` becomes capture group N in
    * appearance order; dictionary refs expand recursively with cycle
    * detection.
    */
  def compile(expr: String, patterns: Map[String, String] = BasePatterns): Compiled = {
    val groups = mutable.ArrayBuffer[(String, Int, String)]()

    def lookup(name: String, expanding: Set[String]): String = {
      require(!expanding.contains(name), s"grok pattern cycle through '$name'")
      val body = patterns.getOrElse(name,
        throw new IllegalArgumentException(s"unknown grok pattern '%{$name}'"))
      expand(body, expanding + name, capture = false)
    }

    def expand(s: String, expanding: Set[String], capture: Boolean): String =
      Ref.replaceAllIn(s, m => {
        val (pname, field, gtype) = (m.group(1), Option(m.group(2)), Option(m.group(3)))
        val inner = lookup(pname, expanding)
        val out = field match {
          case Some(f) if capture =>
            groups += ((f, groups.size + 1, sparkType(gtype)))
            s"($inner)"
          case _ => s"(?:$inner)"
        }
        java.util.regex.Matcher.quoteReplacement(out)
      })

    val regex = expand(expr, Set.empty, capture = true)
    // fail fast on malformed output instead of at executor time
    java.util.regex.Pattern.compile(regex)
    Compiled(regex, groups.toSeq)
  }
}
