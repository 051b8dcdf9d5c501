package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PromQL-style label selectors over a labeled chunk store — the
 * key-search-first query model of the Gorilla paper's §4 (the
 * reference README's aspiration): a series is identified by a SET OF
 * LABELS, and every query starts from a label matcher expression like
 * `{type="click", host=~"h1.*", region!="r3"}`.
 *
 * Spark-first data model: each label the store is keyed by is a
 * TOP-LEVEL string column of the chunk store (an "indexed" label), and
 * a derived `labels` map<string,string> column presents the PromQL
 * view. Matchers against indexed labels compile to plain column
 * predicates — equality reaches the parquet scan as a pushed filter
 * (row-group stat + dictionary pruning), regexes with a literal prefix
 * compile to `startsWith` (pushed as StringStartsWith), and only the
 * general-regex tail stays a post-scan `rlike`. Matchers against
 * labels that exist only inside the map fall back to `element_at`
 * (null-safe: a series lacking the label never matches a positive
 * matcher, matching PromQL's absent-label semantics for `=`/`=~`,
 * and DOES match `!=`/`!~`).
 *
 * Regex matchers are fully anchored (`=~ "api.*"` means the WHOLE
 * value matches), like PromQL.
 */
object Labels {
  sealed trait Matcher { def label: String }
  /** `label="v"`  */ final case class Eq(label: String, value: String) extends Matcher
  /** `label!="v"` */ final case class Ne(label: String, value: String) extends Matcher
  /** `label=~"re"`  */ final case class Re(label: String, pattern: String) extends Matcher
  /** `label!~"re"`  */ final case class NotRe(label: String, pattern: String) extends Matcher

  /** Parse a PromQL-style selector body: comma-separated
    * `name op "value"` with op in {=, !=, =~, !~}; surrounding braces
    * optional. Quotes are required around values; `\"` and `\\`
    * escapes are honored. */
  def parse(selector: String): Seq[Matcher] = {
    val s0 = selector.trim
    val s = if (s0.startsWith("{") && s0.endsWith("}")) s0.substring(1, s0.length - 1) else s0
    if (s.trim.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Matcher]
    var i = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"bad selector at offset $i: $msg in <$selector>")
    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    while ({ skipWs(); i < s.length }) {
      val ns = i
      while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
      if (i == ns) fail("expected label name")
      val name = s.substring(ns, i)
      skipWs()
      val op =
        if (s.startsWith("=~", i)) { i += 2; "=~" }
        else if (s.startsWith("!~", i)) { i += 2; "!~" }
        else if (s.startsWith("!=", i)) { i += 2; "!=" }
        else if (s.startsWith("=", i)) { i += 1; "=" }
        else fail("expected one of = != =~ !~")
      skipWs()
      if (i >= s.length || s.charAt(i) != '"') fail("expected opening quote")
      i += 1
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\' && i + 1 < s.length) {
          sb.append(s.charAt(i + 1)); i += 2
        } else { sb.append(s.charAt(i)); i += 1 }
      }
      if (i >= s.length) fail("unterminated quoted value")
      i += 1 // closing quote
      out += (op match {
        case "="  => Eq(name, sb.toString)
        case "!=" => Ne(name, sb.toString)
        case "=~" => Re(name, sb.toString)
        case "!~" => NotRe(name, sb.toString)
      })
      skipWs()
      if (i < s.length) {
        if (s.charAt(i) != ',') fail("expected comma between matchers")
        i += 1
      }
    }
    out.toSeq
  }

  /** A regex consisting of a literal prefix followed by `.*` (e.g.
    * `h1.*`) — the shape PromQL index lookups special-case. Returns
    * the prefix when the pattern has no other metacharacters. */
  private[tsdb] def literalPrefix(pattern: String): Option[String] =
    if (pattern.endsWith(".*") &&
        !pattern.dropRight(2).exists("\\^$.|?*+()[]{}".contains(_)))
      Some(pattern.dropRight(2))
    else None

  /** Compile one matcher to a Column predicate over `df`. Indexed
    * (top-level column) labels get direct column predicates; map-only
    * labels read through `element_at(labels, name)`. */
  def predicate(df: DataFrame, m: Matcher): Column = {
    val v: Column =
      if (df.schema.fieldNames.contains(m.label)) col(m.label).cast("string")
      else element_at(col("labels"), m.label)
    m match {
      case Eq(_, value) => v === value
      case Ne(_, value) => v.isNull || v =!= value
      case Re(_, p) => literalPrefix(p) match {
        case Some(pre) => v.startsWith(pre) // pushed as StringStartsWith
        case None      => v.rlike("^(?:" + p + ")$") // anchored, like PromQL
      }
      case NotRe(_, p) => v.isNull || !v.rlike("^(?:" + p + ")$")
    }
  }

  /** Filter any frame carrying label columns (chunk store, decoded
    * points, rollup partials) by a selector string. */
  def select(df: DataFrame, selector: String): DataFrame =
    parse(selector).foldLeft(df)((d, m) => d.filter(predicate(d, m)))

  /** The PromQL view of an indexed store: a `labels` map assembled
    * from the given label columns (kept alongside them; matchers still
    * compile to the indexed form via [[predicate]]). */
  def withLabels(df: DataFrame, labelCols: Seq[String]): DataFrame =
    df.withColumn("labels",
      map(labelCols.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*))

  /** Selector + time range → per-series aggregates off a labeled chunk
    * store: label predicates prune FIRST (pushed scans over chunk
    * METADATA — no chunk byte is read for a filtered-out series), then
    * the surviving chunks answer via the compressed-domain range
    * kernel ([[Ts.rangeAgg]]: covered chunks from header stats, only
    * boundary chunks decode). */
  def selectRangeAgg(chunks: DataFrame, labelCols: Seq[String], selector: String,
                     fromSec: Long, toSec: Long): DataFrame =
    Ts.rangeAgg(select(chunks, selector), labelCols, fromSec, toSec)

  /** Selector + time range → decoded points (the PromQL range-vector
    * materialization): prune by labels and window stats before any
    * decode, then unpack only the survivors. */
  def selectRange(chunks: DataFrame, labelCols: Seq[String], selector: String,
                  fromSec: Long, toSec: Long): DataFrame =
    Ts.rangeQuery(select(chunks, selector), labelCols, fromSec, toSec)
}
