package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The unique-doc-id corpus contract shared by every per-row count
  * kernel consumer ([[Retrieval]]'s `docTermTf`, [[Vectorize]]'s
  * `tfAndIdf`, [[Dsir]]'s `docCounts`): computing a per-document
  * aggregate INSIDE the document's row is only equivalent to the
  * relational `explode → groupBy(doc, …)` when each doc id owns exactly
  * one corpus row — the groupBy would have MERGED duplicate-id rows
  * corpus-wide, a per-row kernel cannot.
  *
  * The check is OPT-IN (one extra count/count_distinct aggregation pass
  * over the id column per guarded call — cheap next to any consumer,
  * but not free, and the declared corpora satisfy the contract by
  * construction): set [[IdContract.Key]] to `true` to make a
  * duplicate-id corpus fail loudly at the operator mouth instead of
  * silently diverging from the relational semantics. [[LogReg]]'s
  * `fitText` guards unconditionally because its label relation is
  * caller-supplied and label-scale; these mouths are corpus-scale. */
private[operators] object IdContract {

  /** Conf key: `true` enables the eager duplicate-id check at the
    * kernelized operator mouths. Default off. */
  val Key = "spark.graft.checkUniqueIds"

  /** When [[Key]] is set, verify `idCol` is duplicate-free among
    * non-null values (one aggregation pass, the fitText counting rule:
    * `count(col)` skips nulls, `count_distinct` ignores them) and
    * refuse loudly naming the operator. No-op otherwise. */
  def check(df: DataFrame, idCol: String, op: String): Unit =
    if (df.sparkSession.conf.getOption(Key).exists(_.toBoolean)) {
      val r = df.agg(count(col(idCol)).as("__n"),
        count_distinct(col(idCol)).as("__nd")).head()
      require(r.getLong(0) == r.getLong(1),
        s"$op: duplicate $idCol values in the corpus " +
          s"(${r.getLong(0)} non-null rows, ${r.getLong(1)} distinct) — " +
          "the per-row count kernels assume one row per doc id (the " +
          "relational groupBy they replace merged duplicate-id rows); " +
          "dedupe the corpus ids first")
    }
}
