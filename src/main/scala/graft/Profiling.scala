package graft

/** CPU / heap profiling for the CLI — reference parity with sdvg's
  * `--cpu-profile` / `--memory-profile` options
  * (`/root/reference/internal/generator/app/app.go:104-140`:
  * pprof.StartCPUProfile at startup, WriteHeapProfile at exit),
  * re-expressed on the JVM's own instrumentation (no new dependencies):
  *
  *  - CPU: a Java Flight Recorder recording under the built-in "profile"
  *    configuration (execution sampling + allocation + GC events); dumped
  *    as a `.jfr` file readable by `jfr print`, JDK Mission Control, or
  *    `jfr print --events jdk.ExecutionSample` for flat stacks.
  *  - Memory: an `.hprof` heap dump via HotSpotDiagnosticMXBean (live
  *    objects only — the closest JVM twin of pprof's heap profile).
  *
  * Profiling failures WARN and continue, never fail the run — same
  * contract as the reference (slog.Error, no abort). */
object Profiling {

  /** Start a JFR recording; returns the stop hook that dumps to `path`. */
  def startCpu(path: String): () => Unit =
    try {
      val rec = new jdk.jfr.Recording(jdk.jfr.Configuration.getConfiguration("profile"))
      rec.start()
      () =>
        try {
          rec.dump(java.nio.file.Paths.get(path))
          rec.close()
          System.err.println(s"[profile] cpu profile written to $path")
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[profile] failed to write cpu profile: ${e.getMessage}")
        }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[profile] failed to start cpu profiling: ${e.getMessage}")
        () => ()
    }

  /** Dump a live-object heap profile to `path` (.hprof). */
  def dumpHeap(path: String): Unit =
    try {
      val mx = java.lang.management.ManagementFactory.newPlatformMXBeanProxy(
        java.lang.management.ManagementFactory.getPlatformMBeanServer,
        "com.sun.management:type=HotSpotDiagnostic",
        classOf[com.sun.management.HotSpotDiagnosticMXBean])
      // dumpHeap refuses to overwrite — match pprof's os.Create semantics
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
      mx.dumpHeap(path, true)
      System.err.println(s"[profile] memory profile written to $path")
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[profile] failed to write memory profile: ${e.getMessage}")
    }
}
