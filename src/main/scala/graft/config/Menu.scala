package graft.config

/** Interactive menu surface for the config-authoring CLI — the same three
  * primitives as the reference's `Renderer` interface (sdvg
  * `cli/render/interfaces.go:8-19`: SelectionMenu / InputMenu / TextMenu),
  * re-expressed as a trait so commands are testable against a scripted
  * implementation exactly like the reference's generated renderer mock. */
trait Menu {

  /** Pick one of `items`; returns the chosen item. */
  def selection(title: String, items: Seq[String]): String

  /** Single-line input; `validate` returns Some(error) to re-prompt. */
  def input(title: String, validate: String => Option[String]): String

  /** Multi-line input, terminated by a line containing only "." or EOF
    * (the reference opens an editor buffer; a dot-terminated paragraph is
    * the piped-stdin equivalent). */
  def text(title: String): String
}

object Menu {
  val nonEmpty: String => Option[String] =
    s => if (s.trim.isEmpty) Some("value must not be empty") else None
}

/** Console implementation over any reader/writer pair (stdin/stdout in the
  * CLI; string buffers in tests). Titles print with the reference's `# `
  * comment prefix; selections print as a numbered list accepting either the
  * number or the literal item. */
final class ConsoleMenu(in: java.io.BufferedReader, out: java.io.PrintStream) extends Menu {

  private def printTitle(title: String): Unit =
    title.linesIterator.foreach(l => out.println(if (l.startsWith("#")) l else s"# $l"))

  override def selection(title: String, items: Seq[String]): String = {
    printTitle(title)
    items.zipWithIndex.foreach { case (it, i) => out.println(s"  ${i + 1}) $it") }
    var result: Option[String] = None
    while (result.isEmpty) {
      out.print("> "); out.flush()
      val line = Option(in.readLine()).getOrElse(
        throw new IllegalStateException("unexpected end of input"))
      val t = line.trim
      result = items.find(_ == t)
        .orElse(t.toIntOption.filter(i => i >= 1 && i <= items.size).map(i => items(i - 1)))
      if (result.isEmpty) out.println(s"pick 1-${items.size} or the item name")
    }
    result.get
  }

  override def input(title: String, validate: String => Option[String]): String = {
    printTitle(title)
    var result: Option[String] = None
    while (result.isEmpty) {
      out.print("> "); out.flush()
      val line = Option(in.readLine()).getOrElse(
        throw new IllegalStateException("unexpected end of input"))
      validate(line.trim) match {
        case Some(err) => out.println(err)
        case None => result = Some(line.trim)
      }
    }
    result.get
  }

  override def text(title: String): String = {
    printTitle(title)
    out.println("# (finish with a line containing only \".\")")
    val sb = new StringBuilder
    var done = false
    while (!done) {
      val line = in.readLine()
      if (line == null || line.trim == ".") done = true
      else { sb.append(line).append('\n') }
    }
    sb.toString.trim
  }
}
