package graft

import java.io.File
import java.util.concurrent.TimeUnit

import org.scalatest.funsuite.AnyFunSuite

/** The extension-less ("fallback") optimizer flavor, exercised in a
  * FORKED JVM: `spark.sql.extensions` is a static conf, so the shared
  * test context (which wires GraftExtensions) can never produce an
  * extension-less session in-process — the one governance branch that
  * was validated by inspection only. The child main builds its own
  * SparkContext with no extensions, materializes a governed table's
  * cache under one session-attr context, flips the attr, and proves the
  * other context never sees the first's rows (direct read AND the
  * cached-join shape). A silent failure there is a row-policy bypass.
  */
class FallbackFlavorSpec extends AnyFunSuite {

  /** Launch `mainClass` in a fresh extension-less JVM and assert it
    * prints `okMarker` and exits 0.
    */
  private def runForked(prefix: String, mainClass: String,
      okMarker: String): Unit = {
    val wh = java.nio.file.Files.createTempDirectory(prefix).toFile
    val javaBin = new File(new File(System.getProperty("java.home"), "bin"),
      "java").getAbsolutePath
    // same module opens the build gives every forked Spark JVM
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx3g",
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      s"-Dderby.system.home=${wh.getAbsolutePath}",
      "-cp", System.getProperty("java.class.path"),
      mainClass, wh.getAbsolutePath)
    val pb = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true)
      .directory(wh) // own cwd: no metastore_db clash with this JVM
    val proc = pb.start()
    // drain on a separate thread: a hung child must hit the waitFor
    // timeout, not block this test on a never-closing stream
    val buf = new java.io.ByteArrayOutputStream()
    val drain = new Thread(() => proc.getInputStream.transferTo(buf): Unit)
    drain.setDaemon(true); drain.start()
    val finished = proc.waitFor(180, TimeUnit.SECONDS)
    if (!finished) proc.destroyForcibly(): Unit
    drain.join(5000)
    val out = buf.toString
    assert(finished, s"forked fallback probe timed out\n${out.takeRight(4000)}")
    assert(proc.exitValue() == 0 && out.contains(okMarker),
      s"forked fallback probe failed (exit ${proc.exitValue()}):\n" +
        out.takeRight(6000))
  }

  test("forked extension-less JVM: a governed cache never serves across session-attr contexts (direct + cached-join shapes)") {
    runForked("graft_fbk", "graft.FallbackGovernedCacheMain",
      "FALLBACK-GOVERNED-CACHE-OK")
  }

  test("forked extension-less JVM: CTAS from a tagged source still carries tags and their policies (no silent governance degrade without the extensions conf)") {
    runForked("graft_fct", "graft.FallbackCtasTagMain",
      "FALLBACK-CTAS-TAG-OK")
  }
}
