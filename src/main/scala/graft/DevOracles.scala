package graft

import java.nio.file.{Files, Paths}

/** Dev runner: dump SparkEntry.oracleSql as JSON without starting
  * Spark — for diffing the rewritten oracle text across a
  * Registry0-rewriter change (`runMain graft.DevOracles /tmp/o.json`).
  * Same escaping rules as [[Verify]]. */
object DevOracles {
  def main(args: Array[String]): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(args(0)), json)
    println(s"wrote ${SparkEntry.oracleSql.size} oracles to ${args(0)}")
  }
}
