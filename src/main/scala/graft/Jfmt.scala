package graft

/** Locale-pinned fixed-decimal rendering for machine-parsed JSON.
  * Scala's `f"..."` interpolator routes through the DEFAULT locale, so
  * under a comma-decimal locale (de_DE, fr_FR, …) `f"$r%.3f"` renders
  * "0,987" and the probe/bench metric line stops being valid JSON.
  * Every number that lands inside a JSON payload goes through these
  * (stderr progress lines stay on the interpolator — they're for
  * humans, not parsers). */
object Jfmt {
  def f2(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
  def f3(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
}
