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
