package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** O18 console formatting vs the reference's utils.rs:12-46 helpers:
  * four styles, TTY-gated, plain when piped. */
class ConsoleColorSpec extends AnyFunSuite {
  private val on = new ConsoleColor(true)
  private val off = ConsoleColor.off

  test("enabled: the four helpers wrap with the reference's colors") {
    assert(on.error("boom") == "\u001b[1;31mboom\u001b[0m")     // red bold
    assert(on.warn("careful") == "\u001b[33mcareful\u001b[0m")  // yellow
    assert(on.success("done") == "\u001b[32mdone\u001b[0m")     // green
    assert(on.path("/a/b") == "\u001b[36m/a/b\u001b[0m")        // cyan
  }

  test("disabled (piped output): every helper is the identity") {
    Seq("boom", "[WARN] x", "[SUCCESS] y", "").foreach { m =>
      assert(off.error(m) == m)
      assert(off.warn(m) == m)
      assert(off.success(m) == m)
      assert(off.path(m) == m)
      assert(off.line(m) == m)
    }
  }

  test("auto gate: TTY truth decides, NO_COLOR force-disables") {
    // interactive stdio, no NO_COLOR → colors on
    assert(ConsoleColor.auto(Map.empty, isTerminal = true).enabled)
    // piped stdio (JDK>=22: console()!=null but isTerminal()==false;
    // JDK<=21: console()==null) → colors off, like the reference's
    // stdout&&stderr gate
    assert(!ConsoleColor.auto(Map.empty, isTerminal = false).enabled)
    // NO_COLOR set and non-empty wins even on a TTY
    assert(!ConsoleColor.auto(Map("NO_COLOR" -> "1"), isTerminal = true).enabled)
    // no-color.org: an EMPTY NO_COLOR does not disable
    assert(ConsoleColor.auto(Map("NO_COLOR" -> ""), isTerminal = true).enabled)
  }

  test("isTerminal lookup uses the public declaring class, not the runtime class") {
    // On JDK >= 22 System.console() returns the package-private
    // ProxyingConsole; a Method obtained from c.getClass throws
    // IllegalAccessException on invoke (silently taking the fallback
    // and reintroducing the piped-ANSI bug). Pin the mechanism: when
    // java.io.Console declares isTerminal, the PUBLIC-class lookup
    // must succeed and be invocable on the live console (if any);
    // when it doesn't (JDK <= 21), NoSuchMethodException is the
    // expected — and only tolerated — failure.
    val lookedUp =
      try Some(classOf[java.io.Console].getMethod("isTerminal"))
      catch { case _: NoSuchMethodException => None }
    lookedUp.foreach { m =>
      assert(java.lang.reflect.Modifier.isPublic(m.getDeclaringClass.getModifiers))
      val c = System.console()
      if (c != null) m.invoke(c) // must not throw IllegalAccessException
    }
    // and the probe must never crash, whatever the JDK/stdio state
    ConsoleColor.stdioIsTerminal()
  }

  test("line routing mirrors the reference call sites") {
    assert(on.line("Error: nope") == on.error("Error: nope"))
    assert(on.line("[WARN] finished with errors: 3 failed values") ==
      on.warn("[WARN] finished with errors: 3 failed values"))
    assert(on.line("[SUCCESS] finished in 1.00 s") ==
      on.success("[SUCCESS] finished in 1.00 s"))
    // info/progress lines stay plain (the reference colors only
    // erreur/avertissement/succes/chemin)
    assert(on.line("[INFO] stdin written to /tmp/x") ==
      "[INFO] stdin written to /tmp/x")
    assert(on.line("1000 lines read") == "1000 lines read")
  }
}
