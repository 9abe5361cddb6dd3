package graft.merge

import graft.core.Text
import org.apache.spark.sql.{Dataset, SparkSession}

/** Paper/column alias parsing + application — reference parity with
  * /root/reference/src/tablemerge/aliases.py and the alias rename inside
  * group_tablesfiles (/root/reference/src/tablemerge/__main__.py:149-162).
  */
final case class PaperAlias(canonical: String, offset: Int = 0)

object Aliases {

  /** parse_column_aliases — aliases.py:12-18: "alias:target" tokens.
    * The reference returns a dict, so a duplicate alias keeps its FIRST
    * insertion position with the LAST value winning — replicated here with
    * a LinkedHashMap fold (a plain Vector preserved duplicates and could
    * diverge depending on the consumer).
    */
  def parseColumnAliases(text: String): Vector[(String, String)] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
    Text.tokenizeSchema(text).foreach { part =>
      val i = part.indexOf(':')
      if (i >= 0) m(part.substring(0, i)) = part.substring(i + 1)
    }
    m.toVector
  }

  /** parse_paper_aliases — aliases.py:21-37: "alias:canonical[:offset]";
    * a non-integer offset is an error (same message shape as the reference).
    */
  def parsePaperAliases(text: String): Map[String, PaperAlias] =
    Text.tokenizeSchema(text).flatMap { part =>
      part.split(":", 3) match {
        case Array(alias, canonical) => Some(alias -> PaperAlias(canonical))
        case Array(alias, canonical, off) =>
          val offset =
            try off.toInt
            catch {
              case _: NumberFormatException => throw new IllegalArgumentException(
                s"Invalid page offset in alias '$part': '$off' is not an integer")
            }
          Some(alias -> PaperAlias(canonical, offset))
        case _ => None
      }
    }.toMap

  /** Canonical doc key + extra page offset for one doc id. */
  def canonicalize(docId: String, aliases: Map[String, PaperAlias]): (String, Int) =
    aliases.get(docId) match {
      case Some(pa) => (pa.canonical, pa.offset)
      case None => (docId, 0)
    }

  /** Distributed form of the grouping rename: rewrite run docs to their
    * canonical ids and fold the alias page offset in BEFORE the groupByKey
    * shuffle — aliased and canonical runs of the same document then land in
    * one merge group. The alias map is tiny (user-supplied) → broadcast.
    */
  def applyToRuns(spark: SparkSession, runs: Dataset[RunDoc],
      aliases: Map[String, PaperAlias]): Dataset[RunDoc] = {
    import spark.implicits._
    if (aliases.isEmpty) runs
    else {
      val bc = spark.sparkContext.broadcast(aliases)
      runs.map { r =>
        val (canonical, offset) = canonicalize(r.doc_id, bc.value)
        if (canonical == r.doc_id && offset == 0) r
        else r.copy(doc_id = canonical, page_offset = r.page_offset + offset)
      }
    }
  }
}
