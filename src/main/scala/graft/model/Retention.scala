package graft.model

/** One resolution stage: `points` slots of `precision` seconds each.
  *
  * Reference: biggraphite/metric.py:373-508. String form
  * "{points}*{precision}s" with optional `_0` / `_aggr` suffix
  * (metric.py:420-433). stage0 holds raw points; later stages hold
  * (value, count) partial-aggregate pairs (metric.py:499-508).
  */
final case class Stage(points: Long, precisionS: Long, stage0: Boolean) {
  require(points > 0, s"points must be > 0: $points")
  require(precisionS > 0, s"precision must be > 0: $precisionS")

  def durationS: Long = points * precisionS
  def precisionMs: Long = precisionS * 1000L
  def durationMs: Long = durationS * 1000L

  /** Whether stored rows are (value,count) partials vs raw values. */
  def aggregated: Boolean = !stage0

  /** metric.py:420-433: "points*precisions" + "_0"/"_aggr". */
  override def toString: String =
    s"$points*${precisionS}s" + (if (stage0) "_0" else "_aggr")

  def asString: String = s"$points*${precisionS}s"

  /** Index of the step containing ts (metric.py:477-481). */
  def step(tsS: Long): Long = Math.floorDiv(tsS, precisionS)

  /** Start timestamp of the step with the given index. */
  def epoch(step: Long): Long = step * precisionS

  /** Round ts down to a step boundary (metric.py:483-487). */
  def roundDown(tsS: Long): Long = Math.floorDiv(tsS, precisionS) * precisionS

  /** Round ts up to a step boundary (metric.py:489-497). */
  def roundUp(tsS: Long): Long =
    if (tsS % precisionS == 0) tsS
    else (Math.floorDiv(tsS, precisionS) + 1) * precisionS
}

object Stage {
  private val Pattern = """^(\d+)\*(\d+)s(_(0|aggr))?$""".r

  /** Parse "points*precisions" (metric.py:451-462). */
  def fromString(s: String, stage0: Boolean = false): Stage = s match {
    case Pattern(p, prec, _, suffix) =>
      val isS0 = if (suffix == null) stage0 else suffix == "0"
      Stage(p.toLong, prec.toLong, isS0)
    case _ => throw new IllegalArgumentException(s"invalid stage: '$s'")
  }
}

/** Ordered list of stages, finest first.
  *
  * Reference: biggraphite/metric.py:511-628. Validation: each precision a
  * multiple of the previous and durations strictly increasing
  * (metric.py:516-532).
  */
final case class Retention(stages: List[Stage]) {
  require(stages.nonEmpty, "retention needs at least one stage")
  stages.sliding(2).foreach {
    case List(a, b) =>
      require(b.precisionS % a.precisionS == 0 && b.precisionS > a.precisionS,
        s"precisions must be increasing multiples: $a -> $b")
      require(b.durationS > a.durationS,
        s"durations must be strictly increasing: $a -> $b")
    case _ => ()
  }

  def stage0: Stage = stages.head
  def durationS: Long = stages.last.durationS
  def downsampledStages: List[Stage] = stages.tail

  /** "p0*s0s:p1*s1s:..." (metric.py:566-570). */
  override def toString: String = stages.map(_.asString).mkString(":")

  /** Most precise stage still covering a point this old
    * (metric.py:593-604): first stage whose duration reaches back to ts;
    * falls back to the coarsest. */
  def findStageForTs(tsS: Long, nowS: Long): Stage =
    stages.find(s => nowS - s.durationS <= tsS).getOrElse(stages.last)

  /** Clamp+round a query window onto one stage (metric.py:606-623):
    * pick stage by age of start, round start down, end up, clamp end to
    * now rounded up. Returns (alignedStart, alignedEnd, stage). */
  def alignTimeWindow(startS: Long, endS: Long, nowS: Long,
      shiftOverflow: Boolean = true): (Long, Long, Stage) = {
    var start = startS
    var end = endS
    val stage = findStageForTs(start, nowS)
    var newStart = stage.roundDown(start)
    if (shiftOverflow && newStart < nowS - stage.durationS) {
      newStart = stage.roundDown(nowS - stage.durationS)
    }
    start = newStart
    end = math.min(stage.roundUp(end), stage.roundUp(nowS))
    if (end < start) end = start
    (start, end, stage)
  }
}

object Retention {
  /** Parse "86400*1s:10080*60s" (metric.py:554-565). First stage is
    * stage0, the rest are aggregated. */
  def fromString(s: String): Retention = {
    val parts = s.split(":").toList
    require(parts.nonEmpty && parts.head.nonEmpty, s"invalid retention: '$s'")
    val stages = parts.zipWithIndex.map { case (p, i) =>
      Stage.fromString(p, stage0 = i == 0)
    }
    Retention(stages)
  }

  /** Carbon storage-schemas form: "60s:1d,300s:30d" style
    * (metric.py:571-591 parses via whisper; we support "Ns:Nd|h|m|s|w|y"
    * pairs and the canonical points*precision form). */
  val default: Retention = fromString("86400*1s:10080*60s")
}
