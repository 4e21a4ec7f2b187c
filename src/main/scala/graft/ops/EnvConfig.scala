package graft.ops

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Environment configuration sources (reference:
  * internal/config/config.go:53-72, 126-142 and the repair tool's .env
  * loader, cmd/repair/main.go:591-630; SURVEY §2.1 S11/S12). Plain Scala
  * by design — not a Spark concern — but part of the reference surface,
  * so implemented and tested: typed lookups with defaults, and a KEY=VALUE
  * file parser with quote stripping and no-override semantics (real
  * environment wins over the file, exactly like the reference).
  */
final class EnvConfig(env: Map[String, String]) {

  def str(key: String, default: String): String = env.getOrElse(key, default)

  def int(key: String, default: Int): Int =
    env.get(key).flatMap(_.trim.toIntOption).getOrElse(default)

  def bool(key: String, default: Boolean): Boolean =
    env.get(key).map(_.trim.toLowerCase == "true").getOrElse(default)

  def duration(key: String, default: java.time.Duration): java.time.Duration =
    env.get(key).flatMap(v =>
      try Some(graft.time.TimeResolver.parseDuration(v))
      catch { case _: Exception => None }).getOrElse(default)

  /** S12 no-override merge: existing keys win over file keys
    * (repair/main.go:618-623).
    */
  def withDotEnv(file: Path): EnvConfig =
    if (!Files.exists(file)) this
    else new EnvConfig(EnvConfig.parseDotEnv(
      Files.readAllLines(file).asScala.toSeq) ++ env)
}

object EnvConfig {
  def system: EnvConfig = new EnvConfig(sys.env)

  def apply(pairs: (String, String)*): EnvConfig = new EnvConfig(pairs.toMap)

  /** KEY=VALUE lines; '#' comments and blanks skipped; single/double
    * quotes stripped from values (repair/main.go:600-616).
    */
  def parseDotEnv(lines: Seq[String]): Map[String, String] =
    lines.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
      .map { l =>
        val i = l.indexOf('=')
        val k = l.substring(0, i).trim
        var v = l.substring(i + 1).trim
        if (v.length >= 2 &&
          ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
          v = v.substring(1, v.length - 1)
        k -> v
      }
      .toMap
}
