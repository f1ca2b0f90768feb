package graft.state

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.format.DateTimeFormatter
import java.time.{LocalDateTime, ZoneOffset}

/** Per-table incremental watermark state.
  *
  * Mirrors the reference's SSM-parameter watermark dict
  * (gluejob.py:103-139): string timestamps `yyyy-MM-dd HH:mm:ss`, default
  * yesterday-midnight on cold start (gluejob.py:85-101), advanced
  * in-memory per table (gluejob.py:136-139) and committed **once after
  * all tables succeed** (gluejob.py:621-623) — at-least-once extract,
  * idempotent via the upsert dedup.
  *
  * Backing store is a local JSON file (flat string->string map); the
  * at-scale deployment would point this at any atomic KV (the semantics
  * only need read-all + atomic replace-all).
  */
final class WatermarkStore(path: Path, clock: () => LocalDateTime) {

  import WatermarkStore._

  private var state: Map[String, String] = load()

  /** Yesterday at midnight, the cold-start default (gluejob.py:78-87). */
  def defaultWatermark: String =
    clock().toLocalDate.atStartOfDay.minusDays(1).format(Fmt)

  private def load(): Map[String, String] =
    if (Files.exists(path))
      parseFlatJson(new String(Files.readAllBytes(path), StandardCharsets.UTF_8))
    else Map.empty

  def get(table: String): String = state.getOrElse(table, defaultWatermark)

  /** In-memory advance; not durable until commit() (gluejob.py:136-139). */
  def advance(table: String, ts: String): Unit =
    state = state.updated(table, ts)

  def snapshot: Map[String, String] = state

  /** Atomic write of the whole dict — the all-or-nothing commit the
    * reference performs at gluejob.py:623. */
  def commit(): Unit = {
    val tmp = Paths.get(path.toString + ".tmp")
    Files.createDirectories(path.toAbsolutePath.getParent)
    Files.write(tmp, renderFlatJson(state).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}

object WatermarkStore {
  val Fmt: DateTimeFormatter =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  def apply(path: String,
      clock: () => LocalDateTime = () => LocalDateTime.now(ZoneOffset.UTC))
      : WatermarkStore =
    new WatermarkStore(Paths.get(path), clock)

  /** Minimal flat {"k":"v"} JSON codec (no external deps; the payload is
    * a closed string map, cf. the reference's replace+json.loads at
    * gluejob.py:109-111). */
  def renderFlatJson(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${quote(k)}: ${quote(v)}" }
      .mkString("{", ", ", "}")

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def parseFlatJson(s: String): Map[String, String] = {
    // tolerant scan of {"k":"v",...} — sufficient for the closed payload
    val re = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    re.findAllMatchIn(s).map(m => unescape(m.group(1)) -> unescape(m.group(2))).toMap
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case o => sb.append(o); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
