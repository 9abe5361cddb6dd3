package graft.core

/** Shared helpers for the spark-submit entrypoints ([[graft.ExtractMain]],
  * [[graft.CurateMain]]) so the parse/validate/emit skeleton has one
  * implementation to keep correct.
  */
private[graft] object Cli {

  def positiveInt(flag: String, v: String): Int = {
    val n = try v.toInt catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(s"$flag expects a positive integer, got: $v")
    }
    if (n <= 0) throw new IllegalArgumentException(s"$flag must be positive, got: $v")
    n
  }

  /** Locale.ROOT number rendering: the f-interpolator formats via the JVM
    * default locale, and a comma-decimal cluster image (de_DE, fr_FR)
    * would emit `"wall_sec":4,283` — invalid JSON.
    */
  def jsonNum(d: Double, prec: Int = 3): String =
    String.format(java.util.Locale.ROOT, "%." + prec + "f", Double.box(d))
}
