package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation
  * (beyond-reference scope, SURVEY.md §7.4): content-addressed Bernoulli
  * sampling and per-stratum rate control (language/domain mixing).
  *
  * All sampling is hash-thresholded on md5 of a key column — reproducible
  * in any engine with md5, shuffle-free (a pure filter that pushes down),
  * and stable under reruns/resharding, unlike rand()-based sampling.
  * Rates are expressed in sixteenths of the keyspace (the first hex char
  * of the digest), the same content-addressed bucketing the touch/read_on
  * sampler uses (drivers/cassandra.py:303,1921-1935 samples reads the
  * same way, non-deterministically).
  */
object Sampling {

  /** 0-based position of md5(key)'s first hex char — a uniform bucket in
    * [0, 16). (locate/strpos exists in every target engine; conv() does
    * not, hence no base-16 parse here.) */
  private def hexBucket(keyCol: Column): Column =
    call_function("locate",
      substring(md5(keyCol.cast("string")), 1, 1),
      lit("0123456789abcdef")) - 1

  /** Keep a deterministic `sixteenths`/16 fraction of rows, addressed by
    * `keyCol` content. */
  def hashSample(df: DataFrame, keyCol: Column, sixteenths: Int): DataFrame = {
    require(sixteenths >= 0 && sixteenths <= 16, "rate is in sixteenths")
    df.filter(hexBucket(keyCol) < sixteenths)
  }

  /** Stratified sampling / domain mixing: an independent keep-rate per
    * stratum (language, source domain, quality band, …), in sixteenths.
    * Strata absent from `rates` keep `defaultSixteenths`. One pass, no
    * shuffle — the per-stratum rate is a CASE over the stratum column and
    * the hash filter prunes at the scan. */
  def stratifiedSample(df: DataFrame, keyCol: Column, strataCol: Column,
      rates: Map[String, Int], defaultSixteenths: Int = 16): DataFrame = {
    require((rates.values ++ Seq(defaultSixteenths)).forall(r => r >= 0 && r <= 16),
      "rates are in sixteenths")
    val rate = rates.toSeq.sortBy(_._1).foldRight(
      lit(defaultSixteenths): Column) { case ((stratum, r), rest) =>
      when(strataCol === stratum, lit(r)).otherwise(rest)
    }
    df.filter(hexBucket(keyCol) < rate)
  }
}
