package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.model.MetricName

/** The native uuid5 expression must agree with the model-layer
  * implementation (which matches RFC 4122 / Python uuid.uuid5), under both
  * interpreted eval and whole-stage codegen, and via the SQL registry. */
class Uuid5Spec extends SparkSuite {
  import spark.implicits._

  test("column API matches model implementation") {
    val names = Seq("a", "a.b", "sys.cpu.0.load", "日本.metric")
    val got = names.toDF("name")
      .select(col("name"), GraftFunctions.graft_uuid5(col("name")).as("id"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    names.foreach { n => assert(got(n) === MetricName.metricId(n)) }
  }

  test("SQL registration via function registry") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_uuid5('test.metric') AS id").collect().head.getString(0)
    assert(got === MetricName.metricId("test.metric"))
  }

  test("every native function is SQL-callable after register()") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        |  graft_array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |  graft_fingerprint('hello rolling world', 8) AS fp,
        |  graft_minhash_sig('a b c d e', 8, 3) AS mh,
        |  graft_simhash('a b c d e', 16) AS sh,
        |  graft_shingle_set('a b c d', 3) AS ss,
        |  graft_sorted_intersect_count(array('a', 'b', 'c'),
        |                               array('b', 'c', 'd')) AS ic
        |""".stripMargin).collect().head
    assert(row.getDouble(0) === 11.0)
    assert(row.getSeq[String](2).size === 8)
    assert(row.getLong(3) >= 0L && row.getLong(3) < (1L << 16))
    assert(row.getSeq[String](4).toSet === Set("a b c", "b c d"))
    assert(row.getLong(5) === 2L)

    // int params must be literals — loud error otherwise
    val err = intercept[Exception] {
      spark.sql("SELECT graft_simhash('x', id) FROM range(1)").collect()
    }
    assert(err.getMessage.contains("integer literal") ||
      err.getMessage.contains("graft_simhash"))
  }

  test("null propagates") {
    val got = Seq[Option[String]](None).toDF("name")
      .select(GraftFunctions.graft_uuid5(col("name"))).collect().head
    assert(got.isNullAt(0))
  }

  test("stays inside whole-stage codegen") {
    // a local Seq would be folded by ConvertToLocalRelation; range() forces
    // a real executed plan
    val df = spark.range(100)
      .select(GraftFunctions.graft_uuid5(
        concat(lit("m."), col("id"))).as("mid"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.distinct().count() === 100)
  }
}
