package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's compact stdout contract: the driver captures only the
  * last 2000 chars of stdout, so the final JSON line must stay under that
  * with every query present (BENCH_r06.json's "parsed": null was exactly
  * this line outgrowing the window). */
class BenchSpec extends AnyFunSuite {

  // the three composed pipelines + the BASELINE.md micro tasks that join
  // the headline list at runtime (Bench.baselineMicroTasks). Keep in sync;
  // Bench.main also warns at runtime if the line exceeds the budget.
  private val extraTasks = Seq(
    "x1_curation_pipeline", "x2_embedding_pipeline",
    "x5_pretrain_prep_pipeline",
    "bg_glob_3wild", "bg_glob_3wild_v2store", "bg_read_3600_stage0",
    "bg_read_3600_stage0_v2", "bg_read_3600_stage1",
    "bg_ingest_1m_points", "bg_ingest_100x1")

  private val allNames = Bench.headlineNames ++ extraTasks

  test("short ids are injective over the full bench task list") {
    val shorts = allNames.map(Bench.shortName)
    val dupes = shorts.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dupes.isEmpty, s"colliding short ids: $dupes")
  }

  test("worst-case compact stdout line fits the driver's 2000-char tail") {
    // worst case: every median prints wide (three digits before the point)
    val qs = allNames
      .map(n => s""""${Bench.shortName(n)}":999.999""")
      .mkString("{", ",", "}")
    val steal = Seq.fill(5)("0.999").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":99999.99,"unit":"sec","queries":$qs,"cpu_steal":$steal,"sf":"/root/testdata/sf0.1","full":"bench_out.json"}"""
    assert(line.length < 1900, s"compact line ${line.length} chars")
  }
}
