package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round measurement harness (guide §1): time declared
  * queries against the noop sink, dump `.explain("formatted")` plans,
  * and run targeted micro-probes for hot-path costs. Not part of the
  * bench protocol — [[Bench]] stays the official timing surface; this
  * exists so plan/timing evidence can be captured per query without
  * hand-editing a main each time.
  *
  * Usage (via tools/run_java.sh):
  *   graft.Probe explain <outDir> <query>...   — write formatted plans
  *   graft.Probe time <reps> <query>...        — noop-sink timings
  *   graft.Probe micro <name> <reps>           — named micro-probe
  */
object Probe {

  private def makeSession(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
    // Spark-default scan splits (the r15 16 KB floor regressed the
    // bench; see Bench.makeSession). Env override for explicit A/Bs.
    sys.env.get("SPARK_GRAFT_OPEN_COST").foreach { v =>
      builder.config("spark.sql.files.openCostInBytes", v)
    }
    // generic A/B passthrough: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = makeSession()
    args.toList match {
      case "explain" :: outDir :: names =>
        new java.io.File(outDir).mkdirs()
        names.foreach { n =>
          val df = SparkEntry.queries(n)(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/$n.txt"), plan)
          System.err.println(s"[probe] wrote $outDir/$n.txt")
        }
      case "time" :: reps :: names =>
        val r = reps.toInt
        // per-query job/stage/task-time accounting: where the wall time
        // goes at bench scale (tiny data → orchestration dominates)
        val jobs = new java.util.concurrent.atomic.AtomicInteger
        val stages = new java.util.concurrent.atomic.AtomicInteger
        val taskNanos = new java.util.concurrent.atomic.AtomicLong
        val tasks = new java.util.concurrent.atomic.AtomicInteger
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
              jobs.incrementAndGet()
            override def onStageCompleted(
                s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
              stages.incrementAndGet()
            override def onTaskEnd(
                t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
              tasks.incrementAndGet()
              if (t.taskMetrics != null)
                taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L)
            }
          })
        for (pass <- 1 to r; n <- names) {
          Bench.drainBlocks(spark)
          spark.sparkContext.setJobDescription(s"probe:$n")
          jobs.set(0); stages.set(0); taskNanos.set(0); tasks.set(0)
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(n)(spark, sfDir)
          val tCon = (System.nanoTime() - t0) / 1e9
          noop(df)
          val wall = (System.nanoTime() - t0) / 1e9
          // listener events drain asynchronously; settle briefly
          Thread.sleep(150)
          println(f"[probe] pass $pass $n%-28s $wall%7.3f s  " +
            f"(construct $tCon%6.3f)  jobs=${jobs.get}%3d " +
            f"stages=${stages.get}%3d " +
            f"tasks=${tasks.get}%4d taskTime=${taskNanos.get / 1e9}%7.2f s")
        }
      case "stagetime" :: n :: reps :: Nil =>
        // per-stage task-time profile of one query: which stage burns
        // the CPU (stage name carries the top operator + callsite)
        val acc = new java.util.concurrent.ConcurrentHashMap[String, Long]()
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onStageCompleted(
                s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
              val rdds = s.stageInfo.rddInfos.map(_.name).distinct
                .mkString(",").take(120)
              val key = s.stageInfo.stageId + " [" +
                s.stageInfo.numTasks + " tasks] " + rdds
              val t = Option(s.stageInfo.taskMetrics)
                .map(_.executorRunTime).getOrElse(0L)
              acc.merge(key, t, (a, b) => a + b)
            }
          })
        val docsForMicro = spark.read.parquet(s"$sfDir/documents.parquet")
        val thunkForStage: () => DataFrame =
          if (n == "micro:r1_hits") () => {
            val queries = docsForMicro.filter(col("doc_id") % 97 === 0)
              .select(col("doc_id").as("query_id"),
                trim(substring(col("text"), 40, 60)).as("qtext"))
            val qt = queries.select(col("query_id"),
              explode(array_distinct(split(lower(col("qtext")), "\\s+")))
                .as("__term"))
            val toksDf = docsForMicro.select(col("doc_id").as("doc_id"),
              split(lower(col("text")), "\\s+").as("__t"))
              .select(col("doc_id"), size(col("__t")).as("__dl"),
                explode(col("__t")).as("__term"))
            toksDf.join(broadcast(qt), Seq("__term"))
              .groupBy("query_id", "doc_id", "__dl", "__term")
              .agg(count(lit(1)).as("__tf"))
          }
          else () => SparkEntry.queries(n)(spark, sfDir)
        for (pass <- 1 to reps.toInt) {
          acc.clear()
          Bench.drainBlocks(spark)
          val t0 = System.nanoTime()
          noop(thunkForStage())
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300)
          println(f"[probe] pass $pass wall $wall%.3f s; stages by task time:")
          import scala.jdk.CollectionConverters._
          acc.asScala.toSeq.sortBy(-_._2).take(15).foreach { case (k, v) =>
            println(f"[probe]   ${v / 1e3}%8.2f s  $k")
          }
        }
      case "jobsites" :: n :: Nil =>
        // one pass; histogram of job callsites — where the job count
        // (the per-job fixed driver latency) comes from
        val sites = new java.util.concurrent.ConcurrentHashMap[String, Int]()
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
              val cs = Option(j.properties)
                .flatMap(p => Option(p.getProperty("callSite.short")))
                .getOrElse("?")
              sites.merge(cs, 1, (a, b) => a + b)
            }
          })
        Bench.drainBlocks(spark)
        val t0 = System.nanoTime()
        noop(SparkEntry.queries(n)(spark, sfDir))
        println(f"[probe] wall ${(System.nanoTime() - t0) / 1e9}%.3f s; job callsites:")
        Thread.sleep(300)
        import scala.jdk.CollectionConverters._
        sites.asScala.toSeq.sortBy(-_._2).foreach { case (k, v) =>
          println(f"[probe]   $v%4d  $k")
        }
      case "micro" :: name :: reps :: Nil =>
        val r = reps.toInt
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val probes: Map[String, () => DataFrame] = Map(
          "read_text" -> (() => docs.select(col("text"))),
          "lower" -> (() => docs.select(lower(col("text")).as("t"))),
          "split" -> (() =>
            docs.select(split(lower(col("text")), "\\s+").as("t"))),
          "split_size" -> (() =>
            docs.select(size(split(lower(col("text")), "\\s+")).as("n"))),
          "explode_count" -> (() =>
            docs.select(explode(split(lower(col("text")), "\\s+")).as("t"))
              .groupBy("t").count()),
          // r1 decomposition: which fragment owns the seconds
          "r1_queryterms" -> (() => {
            val queries = docs.filter(col("doc_id") % 97 === 0)
              .select(col("doc_id").as("query_id"),
                trim(substring(col("text"), 40, 60)).as("qtext"))
            queries.select(col("query_id"),
              explode(array_distinct(split(lower(col("qtext")), "\\s+")))
                .as("__term"))
          }),
          "r1_hits" -> (() => {
            val queries = docs.filter(col("doc_id") % 97 === 0)
              .select(col("doc_id").as("query_id"),
                trim(substring(col("text"), 40, 60)).as("qtext"))
            val qt = queries.select(col("query_id"),
              explode(array_distinct(split(lower(col("qtext")), "\\s+")))
                .as("__term"))
            val toksDf = docs.select(col("doc_id").as("doc_id"),
              split(lower(col("text")), "\\s+").as("__t"))
              .select(col("doc_id"), size(col("__t")).as("__dl"),
                explode(col("__t")).as("__term"))
            toksDf.join(broadcast(qt), Seq("__term"))
              .groupBy("query_id", "doc_id", "__dl", "__term")
              .agg(count(lit(1)).as("__tf"))
          }),
          "r1_full" -> (() => {
            import graft.operators.Retrieval
            val queries = docs.filter(col("doc_id") % 97 === 0)
              .select(col("doc_id").as("query_id"),
                trim(substring(col("text"), 40, 60)).as("qtext"))
            Retrieval.bm25TopK(docs, "doc_id", "text",
              queries, "query_id", "qtext", k = 10)
          }))
        val thunk = probes.getOrElse(name,
          sys.error(s"unknown micro probe $name; have ${probes.keys.toSeq.sorted}"))
        for (pass <- 1 to r) {
          Bench.drainBlocks(spark)
          val t0 = System.nanoTime()
          noop(thunk())
          println(f"[probe] pass $pass $name%-20s ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      case "explainfrag" :: outDir :: Nil =>
        // before/after fragment plans for the per-doc-count kernels and
        // the frozen NB faces: the queries checkpoint these subtrees
        // eagerly, so the change is invisible in query-level explain —
        // these fragments are the exact shapes the operators build
        new java.io.File(outDir).mkdirs()
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        def toks = split(lower(col("text")), "\\s+")
        def dump(name: String, df: DataFrame): Unit = {
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/$name.txt"),
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
          System.err.println(s"[probe] wrote $outDir/$name.txt")
        }
        // Retrieval docTermTf: relational vs kernel
        dump("frag_retrieval_tf_before", docs
          .select(col("doc_id"), toks.as("__t"))
          .select(col("doc_id"), size(col("__t")).as("__dl"),
            explode(col("__t")).as("__term"))
          .groupBy("doc_id", "__dl", "__term")
          .agg(count(lit(1)).as("__tf")))
        dump("frag_retrieval_tf_after", docs
          .select(col("doc_id"), toks.as("__t"))
          .select(col("doc_id"), size(col("__t")).as("__dl"),
            explode(graft.functions.TokenTf.token_tf(col("__t"))).as("__e"))
          .select(col("doc_id"), col("__dl"),
            col("__e.term").as("__term"), col("__e.tf").as("__tf")))
        // Vectorize tf: relational vs kernel
        dump("frag_vectorize_tf_before", docs
          .select(col("doc_id"), explode(toks).as("__term"))
          .select(col("doc_id"),
            graft.operators.Vectorize.termSlot(col("__term"), 64).as("slot"))
          .groupBy("doc_id", "slot").agg(count(lit(1)).as("__tf")))
        dump("frag_vectorize_tf_after", docs
          .select(col("doc_id"),
            explode(graft.functions.SlotTf.slot_tf(toks, 64)).as("__e"))
          .select(col("doc_id"), col("__e.slot").as("slot"),
            col("__e.cnt").as("__tf")))
        // Classify predict: join-shaped oracle vs frozen projection
        val model = graft.operators.Classify.nbFit(
          docs.filter(col("doc_id") % 5 =!= 0), "lang", "text",
          vocabSize = 24)
        val testDocs = docs.filter(col("doc_id") % 5 === 0)
        // the old join-shaped predict (scoredRanked rn=1), inlined
        val docTok = testDocs.select(col("doc_id"),
          explode(toks).as("term"))
        val hitSums = docTok.join(broadcast(model), Seq("term"))
          .groupBy("doc_id", "label").agg(sum(col("lik6")).as("__lik"))
        val priors = model.select("label", "prior6").distinct()
        val grid = testDocs.select(col("doc_id")).crossJoin(broadcast(priors))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id")
          .orderBy(col("score").desc, col("label").asc)
        dump("frag_nbpredict_before", grid
          .join(hitSums, Seq("doc_id", "label"), "left")
          .select(col("doc_id"), col("label"),
            ((col("prior6") + coalesce(col("__lik"), lit(0L))) / 1000000.0)
              .as("score"))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).select("doc_id", "label", "score"))
        dump("frag_nbpredict_after", graft.operators.Classify
          .nbPredict(model, docs.filter(col("doc_id") % 5 === 0),
            "doc_id", "text"))
      case "explainmicro" :: name :: Nil =>
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val df = name match {
          case "r1_hits" =>
            val queries = docs.filter(col("doc_id") % 97 === 0)
              .select(col("doc_id").as("query_id"),
                trim(substring(col("text"), 40, 60)).as("qtext"))
            val qt = queries.select(col("query_id"),
              explode(array_distinct(split(lower(col("qtext")), "\\s+")))
                .as("__term"))
            val toksDf = docs.select(col("doc_id").as("doc_id"),
              split(lower(col("text")), "\\s+").as("__t"))
              .select(col("doc_id"), size(col("__t")).as("__dl"),
                explode(col("__t")).as("__term"))
            toksDf.join(broadcast(qt), Seq("__term"))
              .groupBy("query_id", "doc_id", "__dl", "__term")
              .agg(count(lit(1)).as("__tf"))
          case other => sys.error(s"unknown $other")
        }
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      case other =>
        sys.error(s"usage: explain <outDir> <q>... | time <reps> <q>... | " +
          s"micro <name> <reps>; got $other")
    }
    spark.stop()
  }
}
