package graft.ops

import graft.core.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S12 filenorm — full reference semantics
  * (/root/reference/src/filenorm/__main__.py:28-66), distributed:
  *
  *  - duplicate groups: files sharing a content md5; the KEEPER is chosen
  *    by the reference's fold — prefer the file whose rival's normalized
  *    basename equals its own basename (a pre-normalized twin), else the
  *    shorter path (first wins ties);
  *  - rename plan: normalized basename + lowercased extension; name
  *    collisions get `_1`, `_2`, … suffixes.
  *
  * Divergence (documented): the reference folds files in CLI argument
  * order and numbers collisions in dict order — order concepts that do not
  * exist for a distributed table, so both use lexicographic path order,
  * which makes the plan deterministic under any partitioning.
  */
object FileNorm {

  def basename(path: String): String = {
    val i = path.lastIndexOf('/')
    if (i >= 0) path.substring(i + 1) else path
  }

  def splitExt(name: String): (String, String) = {
    val i = name.lastIndexOf('.')
    if (i > 0) (name.substring(0, i), name.substring(i)) else (name, "")
  }

  /** plan_actions' keeper fold over one md5 group (__main__.py:36-48). */
  def pickKeeper(files: Seq[String]): String =
    files.reduce { (old, nw) =>
      val (oldBase, _) = splitExt(basename(old))
      val (newBase, _) = splitExt(basename(nw))
      if (Text.normalizeColumnName(newBase) == oldBase) old
      else if (Text.normalizeColumnName(oldBase) == newBase) nw
      else if (nw.length < old.length) nw
      else old // min by length; tie keeps the earlier file
    }

  /** The full plan over a (path, md5) table:
    * (path, md5, keep, new_name) — `keep=false` rows are duplicates to
    * drop; `new_name` is set when the kept file needs renaming.
    */
  def plan(spark: SparkSession, files: DataFrame): DataFrame = {
    import spark.implicits._
    val keepers = files
      .select(col("md5"), col("path"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroups { (md5, it) =>
        val paths = it.map(_._2).toSeq.sorted
        (md5, pickKeeper(paths))
      }
      .toDF("md5", "keeper")

    val withKeep = files.join(keepers, "md5")
      .withColumn("keep", col("path") === col("keeper"))

    // rename plan over keepers only: candidate = normalized base + ext.lower
    // with _N collision suffixes. Numbering replays the reference's
    // seen-set walk — but scoped to a NAME FAMILY (base with every trailing
    // _<digits> group stripped, plus the extension): any two files that
    // could ever contend for the same final name share a family, so the
    // per-family walk is exactly as collision-free as the global one while
    // staying distributed. (A plain per-candidate window would let a
    // suffixed name collide with a kept file already bearing it.)
    val kept = withKeep.filter(col("keep"))
      .select(col("path")).as[String]
      .map { path =>
        val (base, ext) = splitExt(basename(path))
        val newBase = Text.normalizeColumnName(base)
        (path, newBase, ext.toLowerCase(java.util.Locale.ROOT), familyOf(newBase))
      }
      .toDF("path", "new_base", "new_ext", "family")
      .as[(String, String, String, String)]
    val renamed = kept
      .groupByKey { case (_, _, ext, family) => (family, ext) }
      .flatMapGroups { (_, it) =>
        val files = it.toSeq.sortBy(_._1)
        val seen = scala.collection.mutable.HashSet.empty[String]
        files.iterator.map { case (path, base, ext, _) =>
          var candidate = base + ext
          var idx = 1
          while (seen.contains(candidate)) {
            candidate = s"${base}_$idx$ext"
            idx += 1
          }
          seen += candidate
          val newName = if (candidate != basename(path)) candidate else null
          (path, newName)
        }
      }
      .toDF("k_path", "new_name")

    withKeep
      .join(renamed, col("path") === col("k_path"), "left")
      .select(col("path"), col("md5"), col("keep"), col("new_name"))
  }

  private val TrailingNumGroups = "(?:_[0-9]+)+$".r

  /** Name family: base with every trailing `_<digits>` group removed —
    * the equivalence class of names that can contend under `_N` suffixing.
    */
  def familyOf(base: String): String = TrailingNumGroups.replaceFirstIn(base, "")
}
