package graft.engine

/** Status logger with the reference's status→ANSI-color map
  * (flowbyte `log.py:17-29`) preserved, with ONE deliberate divergence:
  * the reference maps "regular" to `[30m` (ANSI black,
  * `log.py:22`), which is unreadable on the dark terminals Spark jobs
  * are typically driven from — this map uses white for the regular
  * tier instead. Every other status→color pair matches the reference
  * exactly. */
final case class Log(var message: String = "", var status: String = "regular") {

  private val colors: Map[String, String] = Map(
    "regular" -> Console.WHITE, // reference: black (see scaladoc)
    "fail"    -> Console.RED,
    "success" -> Console.GREEN,
    "warning" -> Console.YELLOW,
    "info"    -> Console.BLUE)

  /** Colored print + optional detail block (`log.py:34-44`). */
  def printMessage(detail: String = ""): Unit = {
    val color = colors.getOrElse(status, Console.WHITE)
    // scalastyle:off println
    println(s"$color$message${Console.RESET}")
    if (detail.nonEmpty) println(detail)
    // scalastyle:on println
  }
}
