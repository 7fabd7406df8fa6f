package graft.ingest

/** Console color formatting — the reference's `utils.rs:12-46` surface
  * (O18): four helpers (red-bold error / yellow warning / green success
  * / cyan path), active only when the process talks to an interactive
  * terminal, plain text otherwise (so piped output stays parseable).
  *
  * The reference gates on BOTH stdout and stderr being TTYs
  * (`couleurs_actives`, utils.rs:12-14). The closest JVM signal is
  * `System.console()`: on JDK ≤ 21 it is non-null only when stdin AND
  * stdout are interactive; on JDK ≥ 22 it is ALWAYS non-null and the
  * new `Console.isTerminal()` carries the TTY truth instead — so the
  * auto gate asks `isTerminal()` reflectively where it exists and
  * falls back to the non-null check on older JDKs. `NO_COLOR`
  * (https://no-color.org: set and non-empty) force-disables, matching
  * what owo_colors' supports-color detection honors on the reference
  * side. The flag is injectable so specs pin both modes
  * deterministically.
  * Codes are plain SGR (1;31 / 33 / 32 / 36 + reset), the same colors
  * owo_colors renders in the reference.
  */
final class ConsoleColor(val enabled: Boolean) {
  private def wrap(code: String, msg: String): String =
    if (enabled) s"\u001b[${code}m$msg\u001b[0m" else msg
  def error(msg: String): String = wrap("1;31", msg) // utils.rs:16-22
  def warn(msg: String): String = wrap("33", msg)    // utils.rs:24-30
  def success(msg: String): String = wrap("32", msg) // utils.rs:32-38
  def path(msg: String): String = wrap("36", msg)    // utils.rs:40-46

  /** Route a CLI line to the reference's helper by its prefix — the
    * same mapping main.rs applies at its call sites (erreur for
    * failures, avertissement for the error report, succes for the
    * completion lines). */
  def line(msg: String): String =
    if (msg.startsWith("Error") || msg.startsWith("[ERROR]")) error(msg)
    else if (msg.startsWith("[WARN]")) warn(msg)
    else if (msg.startsWith("[SUCCESS]")) success(msg)
    else msg
}

object ConsoleColor {
  val off: ConsoleColor = new ConsoleColor(false)

  def auto(): ConsoleColor = auto(sys.env, stdioIsTerminal())

  /** Injectable form of the auto gate: colors iff the stdio channels
    * are interactive AND `NO_COLOR` is absent/empty. */
  private[ingest] def auto(env: Map[String, String],
                           isTerminal: Boolean): ConsoleColor =
    if (env.get("NO_COLOR").exists(_.nonEmpty)) off
    else new ConsoleColor(isTerminal)

  /** TTY probe. JDK ≥ 22: `System.console()` never returns null, so
    * ask its `isTerminal()` (added by JEP 445-era console rework) —
    * redirected stdio then correctly reports false. JDK ≤ 21: the
    * method doesn't exist (NoSuchMethodException), but there
    * `console() != null` already implies interactive stdin+stdout, so
    * non-null is the answer.
    *
    * The Method MUST come from the public `java.io.Console` class, not
    * `c.getClass`: the runtime class on JDK ≥ 22 is the package-private
    * `ProxyingConsole`, whose members reflection refuses to invoke
    * (IllegalAccessException) — looking it up there would silently take
    * the fallback and reintroduce the piped-ANSI bug. */
  private[ingest] def stdioIsTerminal(): Boolean = {
    val c = System.console()
    c != null && {
      // NoSuchMethodException = JDK < 22 (no isTerminal: a non-null
      // Console already implied a terminal there). Any OTHER reflective
      // failure (access control, invocation wrapper, linkage) must take
      // the same conservative answer rather than crash a color probe —
      // colors are cosmetic, the convert pipeline is not.
      try classOf[java.io.Console].getMethod("isTerminal").invoke(c)
        .asInstanceOf[java.lang.Boolean].booleanValue()
      catch { case scala.util.control.NonFatal(_) => true }
    }
  }
}
