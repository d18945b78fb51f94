package graft

import java.nio.file.{Files, Path}

/** Persistence + advance logic for the bench's OVERRIDE-STREAK guard
  * (r12 verdict item 5): the load-override is evidence-gated per capture,
  * but a query overridden in every capture would let a
  * slow-but-occasionally-fast plan permanently report its min. Per-query
  * consecutive-override counts persist across official captures
  * (`bench/override_history.json` — overridden queries increment,
  * everything else resets to 0); any query at ≥ [[FlagAt]] consecutive
  * officials is flagged into `"override_streak"` in BOTH bench artifacts,
  * so repeated overrides are structurally impossible to hide. The guard
  * only ever ADDS evidence, never changes a reported number, and every
  * I/O failure degrades to an empty history (a probe run from a scratch
  * cwd must not crash the capture).
  */
object OverrideHistory {

  /** Consecutive overridden officials at which a query becomes a flagged
    * suspect regression rather than repeated bad luck with load.
    */
  val FlagAt = 3

  /** Whether this capture may ADVANCE (and persist) the streak state.
    * The streak semantics are defined over consecutive OFFICIAL captures,
    * but the official is driver-invoked with a bare environment — it
    * cannot carry an opt-in flag — so the gate is opt-OUT: builder-driven
    * probe/candidate runs set `SPARK_GRAFT_BENCH_PROBE` (any value; the
    * `tools/probe_bench.sh` wrapper does) and then only READ the history
    * for flag display, never mutating it. Without the gate, six probe
    * captures in a round advance/reset streaks through the same default
    * path and dilute the ≥ 3-consecutive-officials signal (r13 advice).
    */
  def shouldAdvance(env: Map[String, String]): Boolean =
    !env.contains("SPARK_GRAFT_BENCH_PROBE")

  /** One capture's advance, pure: overridden queries increment their
    * streak, every other MEASURED query resets to 0 (a query absent from
    * this capture keeps no entry — its history is meaningless across a
    * registry change). Returns (new streaks, flagged names sorted).
    */
  def advance(prev: Map[String, Int], measured: Seq[String],
      overridden: Set[String]): (Map[String, Int], Seq[String]) = {
    val next = measured
      .map(n => n -> (if (overridden(n)) prev.getOrElse(n, 0) + 1 else 0))
      .toMap
    (next, next.filter(_._2 >= FlagAt).keys.toSeq.sorted)
  }

  /** Tolerant read: a missing, unreadable, or torn history file reads as
    * empty — never a capture crash. The flat `{"name":N,…}` shape is
    * parsed by regex so a half-written file yields its intact prefix.
    */
  def read(path: Path): Map[String, Int] =
    try {
      if (Files.exists(path))
        "\"([^\"]+)\"\\s*:\\s*([0-9]+)".r
          .findAllMatchIn(Files.readString(path))
          .map(m => m.group(1) -> m.group(2).toInt).toMap
      else Map.empty
    } catch { case _: Throwable => Map.empty }

  /** Best-effort write of the non-zero streaks (zero entries carry no
    * information — absence means the same); failures log and continue.
    */
  def write(path: Path, streaks: Map[String, Int]): Unit =
    try {
      if (path.getParent != null) Files.createDirectories(path.getParent)
      Files.writeString(path,
        streaks.filter(_._2 > 0).toSeq.sortBy(_._1)
          .map { case (k, v) => "\"" + k + "\":" + v }
          .mkString("{", ",", "}\n"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not persist override history: ${e.getMessage}")
    }
}
