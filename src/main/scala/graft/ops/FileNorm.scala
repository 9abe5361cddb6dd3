package graft.ops

import graft.core.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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

    // rename plan over keepers only: candidate = normalized base + ext.lower;
    // collision index via a PARTITIONED window on the candidate name
    val kept = withKeep.filter(col("keep"))
      .select(col("md5"), col("path")).as[(String, String)]
      .map { case (md5, path) =>
        val (base, ext) = splitExt(basename(path))
        (md5, path, Text.normalizeColumnName(base), ext.toLowerCase(java.util.Locale.ROOT))
      }
      .toDF("md5", "path", "new_base", "new_ext")
    val w = Window.partitionBy(col("new_base"), col("new_ext")).orderBy(col("path"))
    val renamed = kept
      .withColumn("idx", row_number().over(w) - 1)
      .withColumn("candidate",
        when(col("idx") === 0, concat(col("new_base"), col("new_ext")))
          .otherwise(concat(col("new_base"), lit("_"), col("idx").cast("string"), col("new_ext"))))
      .withColumn("orig_name", element_at(split(col("path"), "/"), -1))
      .select(col("path").as("k_path"),
        when(col("candidate") =!= col("orig_name"), col("candidate")).as("new_name"))

    withKeep
      .join(renamed, col("path") === col("k_path"), "left")
      .select(col("path"), col("md5"), col("keep"), col("new_name"))
  }
}
