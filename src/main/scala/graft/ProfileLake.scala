package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round 18): decompose the hot LAKE queries' wall time into
  * phases — stage write, each DML statement, in-band probes, final
  * read — so optimization targets the phase that actually costs, not
  * the query as a black box. Not part of the driver contract.
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProfileLake [filter]"
  */
object ProfileLake {
  private var t0 = 0L
  private def mark(): Unit = t0 = System.nanoTime()
  private def phase(name: String): Unit = {
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[phase] $name%-46s $dt%7.3f s")
    mark()
  }

  def main(args: Array[String]): Unit = {
    val only = args.headOption
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile-lake")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", EngineConf.MaxPartitionBytes)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // per-job timing: how many Spark jobs does each phase run, how long
    // is each — the fixed-overhead count is the optimization target at
    // bench scale
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    s.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobStart.put(e.jobId, System.nanoTime())
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t = Option(jobStart.get(e.jobId))
            .map(t0 => (System.nanoTime() - t0) / 1e9).getOrElse(-1.0)
          println(f"    [job] ${e.jobId}%4d ${t}%7.3f s")
        }
      })
    s.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.entry(s).count()
    def scratch(n: String) = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/tmp"), n).toString + "/lake"
    def run(name: String)(body: => Unit): Unit =
      if (only.forall(name.contains)) {
        println(s"== $name ==")
        // run twice; second run is the warm measurement
        (1 to 2).foreach { i =>
          println(s"-- pass $i --")
          mark(); body
        }
      }

    run("q144_mor") {
      val dir = scratch("prof-q144")
      val base = Tables.orders(s, sfDir).select(col("o_orderkey"),
        col("o_orderpriority"), col("o_totalprice"))
      phase("plan base")
      graft.io.PartitionedLake.write(base, dir, "o_orderpriority")
      phase("PartitionedLake.write")
      val ops = base.filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey").as("k"), col("o_orderpriority"),
          lit(1L).as("seq"), lit("D").as("op"), lit(0.0).as("val"))
        .unionByName(base.filter(col("o_orderkey") % 101 === 0)
          .select(col("o_orderkey").as("k"), col("o_orderpriority"),
            lit(2L).as("seq"), lit("U").as("op"),
            (col("o_totalprice") + 5).as("val")))
      graft.io.PartitionedLake.cdcSinkMergeOnRead(s, dir,
        "o_orderpriority", "o_orderkey", "o_totalprice", ops)
      phase("cdcSinkMergeOnRead")
      graft.io.PartitionedLake.read(s, dir).orderBy("o_orderkey").count()
      phase("read+orderBy+count")
    }

    run("q172_mor_dml") {
      val dir = scratch("prof-q172")
      val base = Tables.orders(s, sfDir).select(col("o_orderkey"),
        col("o_orderpriority"), col("o_totalprice"))
      graft.io.PartitionedLake.write(base, dir, "o_orderpriority")
      phase("PartitionedLake.write")
      s.conf.set("spark.sql.catalog.graft_lake",
        classOf[graft.io.LakeCatalog].getName)
      s.conf.set(graft.io.LakeDeltaRowLevel.ModeKey,
        graft.io.LakeDeltaRowLevel.MergeOnRead)
      s.conf.set(graft.io.LakeDeltaRowLevel.KeyKey, "o_orderkey")
      try {
        s.sql(s"UPDATE graft_lake.`$dir` SET o_totalprice = " +
          "o_totalprice + 5 WHERE o_orderkey % 10 = 3")
        phase("UPDATE (MoR)")
        s.sql(s"DELETE FROM graft_lake.`$dir` WHERE o_orderkey % 10 = 7")
        phase("DELETE (MoR)")
        base.filter(col("o_orderkey") % 100 === 11)
          .withColumn("o_totalprice", col("o_totalprice") + 100)
          .createOrReplaceTempView("prof_merge_src")
        s.sql(
          s"""MERGE INTO graft_lake.`$dir` t USING prof_merge_src s
             |ON t.o_orderkey = s.o_orderkey
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        phase("MERGE (MoR)")
      } finally {
        s.conf.unset(graft.io.LakeDeltaRowLevel.ModeKey)
        s.conf.unset(graft.io.LakeDeltaRowLevel.KeyKey)
      }
      def dataFiles(v: String) = s.sql(
        s"SELECT * FROM graft_lake.`$dir`$v").inputFiles
        .filterNot(_.contains("delta-")).toSet
      val filesUnchanged = dataFiles(" VERSION AS OF 1") == dataFiles("")
      phase("inputFiles probes x2")
      val deltasLive = graft.io.PartitionedLake
        .partitionRowCounts(s, dir).isEmpty
      phase("partitionRowCounts probe")
      s.sql(
        s"SELECT o_orderpriority, count(*) AS n, " +
          "CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) " +
          s"AS price_sum FROM graft_lake.`$dir` " +
          "GROUP BY o_orderpriority")
        .withColumn("files_unchanged", lit(filesUnchanged))
        .withColumn("deltas_live", lit(deltasLive))
        .orderBy("o_orderpriority").count()
      phase("final agg read")
    }

    run("q167_compact") {
      val dir = scratch("prof-q167")
      val base = Tables.orders(s, sfDir).select(col("o_orderkey"),
        col("o_orderpriority"), col("o_totalprice"))
      graft.io.PartitionedLake.write(base, dir, "o_orderpriority")
      phase("PartitionedLake.write")
      val ops = base.filter(col("o_orderkey") % 50 === 0)
        .select(col("o_orderkey").as("k"), col("o_orderpriority"),
          lit(1L).as("seq"), lit("U").as("op"),
          (col("o_totalprice") + 10).as("val"))
      graft.io.PartitionedLake.cdcSinkMergeOnRead(s, dir,
        "o_orderpriority", "o_orderkey", "o_totalprice", ops)
      phase("cdcSinkMergeOnRead")
      s.conf.set("spark.sql.catalog.graft_lake",
        classOf[graft.io.LakeCatalog].getName)
      s.sql(s"CALL graft_lake.system.compact(table => '$dir')").collect()
      phase("CALL system.compact")
      graft.io.PartitionedLake.partitionRowCounts(s, dir).isDefined
      phase("partitionRowCounts")
      s.sql(
        s"SELECT o_orderpriority, count(*) AS n, " +
          "CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) " +
          s"AS price_sum FROM graft_lake.`$dir` " +
          "GROUP BY o_orderpriority").orderBy("o_orderpriority").count()
      phase("final agg read")
    }

    run("q168_native_mor_read") {
      val dir = scratch("prof-q168")
      val base = Tables.orders(s, sfDir).select(col("o_orderkey"),
        col("o_orderpriority"), col("o_totalprice"))
      graft.io.PartitionedLake.write(base, dir, "o_orderpriority")
      phase("PartitionedLake.write")
      val urgent = base.filter(col("o_orderpriority") === "1-URGENT")
      val ops = urgent.filter(col("o_orderkey") % 10 === 3)
        .select(col("o_orderkey").as("k"), col("o_orderpriority"),
          lit(1L).as("seq"), lit("U").as("op"),
          (col("o_totalprice") + 1000).as("val"))
        .unionByName(urgent.filter(col("o_orderkey") % 10 === 7)
          .select(col("o_orderkey").as("k"), col("o_orderpriority"),
            lit(1L).as("seq"), lit("D").as("op"),
            col("o_totalprice").as("val")))
      graft.io.PartitionedLake.cdcSinkMergeOnRead(s, dir,
        "o_orderpriority", "o_orderkey", "o_totalprice", ops)
      phase("cdcSinkMergeOnRead")
      s.conf.set("spark.sql.catalog.graft_lake",
        classOf[graft.io.LakeCatalog].getName)
      val out = s.sql(
        s"SELECT count(*) AS n, " +
          "CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) " +
          s"AS price_sum FROM graft_lake.`$dir` " +
          "WHERE o_orderpriority = '1-URGENT'")
      out.collect()
      phase("claimed agg")
      val full = s.sql(s"SELECT count(*) FROM graft_lake.`$dir`")
      full.collect()
      phase("full count")
      val v1 = s.read.format("graft-lake").option("path", dir).load()
        .filter(col("o_orderpriority") === "1-URGENT")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(28,6)"))
            .cast("double").as("p")).collect()
      phase("v1 parity agg")
      out.withColumn("x", lit(1)).count()
      phase("final")
    }

    run("write_variants") {
      def t(name: String)(body: => Unit): Unit = { mark(); body; phase(name) }
      val base = Tables.orders(s, sfDir).select(col("o_orderkey"),
        col("o_orderpriority"), col("o_totalprice"))
      val li = Tables.lineitem(s, sfDir).select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        (col("l_orderkey") % 64).as("x"), (col("l_partkey") % 64).as("y"))
      (1 to 2).foreach { _ =>
        t("orders plain partitionBy")(
          base.write.mode("overwrite").partitionBy("o_orderpriority")
            .parquet(scratch("w1")))
        t("orders rr8 partitionBy")(
          base.repartition(8).write.mode("overwrite")
            .partitionBy("o_orderpriority").parquet(scratch("w1b")))
        t("lineitem rr8 partitionBy")(
          li.repartition(8).write.mode("overwrite")
            .partitionBy("l_returnflag").parquet(scratch("w1c")))
        t("lineitem rr16 partitionBy")(
          li.repartition(16).write.mode("overwrite")
            .partitionBy("l_returnflag").parquet(scratch("w1d")))
        t("orders repartition(cols)")(
          base.repartition(col("o_orderpriority"))
            .write.mode("overwrite").partitionBy("o_orderpriority")
            .parquet(scratch("w2")))
        t("orders repartition(32, cols+key)")(
          base.repartition(32, col("o_orderpriority"), col("o_orderkey"))
            .write.mode("overwrite").partitionBy("o_orderpriority")
            .parquet(scratch("w3")))
        t("lineitem plain partitionBy")(
          li.write.mode("overwrite").partitionBy("l_returnflag")
            .parquet(scratch("w4")))
        t("lineitem repartition(cols)")(
          li.repartition(col("l_returnflag"))
            .write.mode("overwrite").partitionBy("l_returnflag")
            .parquet(scratch("w5")))
        t("lineitem repartition(32, cols+key)")(
          li.repartition(32, col("l_returnflag"), col("l_orderkey"))
            .write.mode("overwrite").partitionBy("l_returnflag")
            .parquet(scratch("w6")))
      }
    }

    run("q175_cow_chain") {
      val dir = scratch("prof-q175")
      val base = Tables.orders(s, sfDir).select(col("o_orderkey"),
        col("o_orderpriority"), col("o_totalprice"))
      graft.io.PartitionedLake.write(base, dir, "o_orderpriority")
      phase("PartitionedLake.write")
      s.conf.set("spark.sql.catalog.graft_lake",
        classOf[graft.io.LakeCatalog].getName)
      s.sql(s"UPDATE graft_lake.`$dir` SET o_totalprice = " +
        "o_totalprice + 7 WHERE o_orderkey % 10 = 1")
      phase("UPDATE (COW)")
      s.sql(s"DELETE FROM graft_lake.`$dir` " +
        "WHERE o_orderpriority = '1-URGENT'")
      phase("DELETE (partition)")
      s.sql(s"CALL graft_lake.system.rollback(" +
        s"table => '$dir', version => 1)").collect()
      phase("CALL rollback")
      graft.io.PartitionedLake.readVersion(s, dir, 3L).count()
      phase("readVersion(3) count")
      base.count()
      phase("base count")
      base.filter(col("o_orderpriority") === "1-URGENT").count()
      phase("urgent count")
      s.sql(s"SELECT count(*) AS n, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) " +
        s"AS price_sum FROM graft_lake.`$dir`").count()
      phase("final agg")
    }

    run("q143_cdf") {
      val dir = scratch("prof-q143")
      val base = Tables.orders(s, sfDir).select(col("o_orderkey"),
        col("o_orderpriority"), col("o_totalprice"))
      graft.io.PartitionedLake.write(base, dir, "o_orderpriority")
      phase("PartitionedLake.write")
      val delta = base.filter(col("o_orderkey") % 97 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1)
        .unionByName(base.filter(col("o_orderkey") % 101 === 0 &&
            col("o_orderkey") =!= 0)
          .withColumn("o_orderkey", -col("o_orderkey")))
      graft.io.PartitionedLake.upsert(s, dir, "o_orderpriority",
        "o_orderkey", delta)
      phase("upsert")
      graft.io.PartitionedLake.changesBetween(s, dir, 1L, 2L,
        Seq("o_orderpriority", "o_orderkey"))
        .orderBy("_change_type", "o_orderkey").count()
      phase("changesBetween+sort+count")
    }

    run("q157_stats") {
      QueryRegistry.queries("q157_dsv2_stats_skipping")(s, sfDir).count()
      phase("whole q157")
    }

    run("q150_zorder") {
      QueryRegistry.queries("q150_zorder_compact_skipping")(s, sfDir).count()
      phase("whole q150")
    }

    run("q139_pq") {
      QueryRegistry.queries("q139_pq_ann")(s, sfDir).count()
      phase("whole q139")
    }

    run("q106_bpe") {
      QueryRegistry.queries("q106_bpe_merge_step")(s, sfDir).count()
      phase("whole q106")
    }

    run("q106_variants") {
      import org.apache.spark.sql.expressions.Window
      def body(docs: org.apache.spark.sql.DataFrame,
          pairExpr: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
          : org.apache.spark.sql.DataFrame = {
        val w = split(col("text"), " ")
        val pairs = docs.select(explode(when(size(w) >= 2,
          transform(sequence(lit(1), size(w) - 1),
            i => concat(element_at(w, i), lit(" "), element_at(w, i + 1))))
          .otherwise(array().cast("array<string>"))).as("pair"))
        pairs.groupBy("pair").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("pair")).limit(10)
          .select(col("pair"), col("n"),
            row_number().over(Window
              .orderBy(col("n").desc, col("pair"))).as("rk"))
          .orderBy(col("n").desc, col("pair"))
      }
      body(Tables.documents(s, sfDir).repartition(32, col("doc_id")),
        identity).count()
      phase("q106 forced spread 32")
      // struct-key agg, concat only the 10 survivors
      val w2 = split(col("text"), " ")
      val pairsS = Tables.documents(s, sfDir)
        .repartition(32, col("doc_id"))
        .select(explode(when(size(w2) >= 2,
          transform(sequence(lit(1), size(w2) - 1),
            i => struct(element_at(w2, i).as("a"),
              element_at(w2, i + 1).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>")))
          .as("p"))
      pairsS.groupBy("p").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("p.a"), col("p.b")).limit(10)
        .select(concat(col("p.a"), lit(" "), col("p.b")).as("pair"),
          col("n"),
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("n").desc, col("p.a"), col("p.b"))).as("rk"))
        .orderBy(col("n").desc, col("pair")).count()
      phase("q106 spread + struct key")
    }

    run("q135_bucketed") {
      QueryRegistry.queries("q135_bucketed_join")(s, sfDir).count()
      phase("whole q135")
    }

    run("q134_spread") {
      // does spreading the 1-split lineitem scan before the join+distinct
      // beat the serial scan-stage? (the distinct exchange exists either
      // way; this adds ONE narrow 2-col shuffle below it)
      mark()
      val pairsPlain = Tables.lineitem(s, sfDir).select("l_orderkey", "l_suppkey")
        .join(Tables.orders(s, sfDir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .distinct()
      pairsPlain.write.format("noop").mode("overwrite").save()
      phase("pairs plain (noop)")
      val pairsSpread = graft.operators.Spread.byKey(
          Tables.lineitem(s, sfDir).select("l_orderkey", "l_suppkey"),
          col("l_orderkey"))
        .join(Tables.orders(s, sfDir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .distinct()
      pairsSpread.write.format("noop").mode("overwrite").save()
      phase("pairs spread (noop)")
    }

    run("q134_variants") {
      // (f) materialize the distinct pair set once, union projections of
      // the checkpoint
      mark()
      val pairs = Tables.lineitem(s, sfDir).select("l_orderkey", "l_suppkey")
        .join(Tables.orders(s, sfDir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .distinct().localCheckpoint()
      phase("pairs distinct checkpoint")
      val cNode = col("c") * 2; val sNode = col("s") * 2 + 1
      val edges2 = pairs.select(cNode.as("src"), sNode.as("dst"))
        .union(pairs.select(sNode.as("src"), cNode.as("dst")))
        .repartition(col("src")).persist()
      edges2.count()
      phase("edges2 persist+count")
      // (d) deg + asym from ONE shuffle
      val nodeStats = edges2
        .select(col("src").as("node"), lit(1L).as("s"), lit(0L).as("d"))
        .unionByName(edges2
          .select(col("dst").as("node"), lit(0L).as("s"), lit(1L).as("d")))
        .groupBy("node").agg(sum("s").as("outdeg"), sum("d").as("indeg"))
        .localCheckpoint()
      phase("nodeStats checkpoint")
      val asym2 = nodeStats.filter(col("outdeg") === 0 ||
        col("indeg") === 0).count()
      val n2 = nodeStats.count()
      phase(s"asym($asym2)+n($n2) counts")
      edges2.unpersist(blocking = false)
    }

    run("q134_pagerank_steps") {
      import org.apache.spark.sql.DataFrame
      val edgesIn = graft.operators.GraphOps.tradeEdges(s, sfDir)
      phase("plan edges")
      val edges = edgesIn.repartition(col("src")).persist()
      edges.count()
      phase("edges persist+count")
      val deg = edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("outdeg")).localCheckpoint()
      phase("deg checkpoint")
      val n = deg.count()
      phase("n count")
      val asym = edges
        .select(col("src").as("node"), lit(1).as("s"), lit(0).as("d"))
        .unionByName(edges
          .select(col("dst").as("node"), lit(0).as("s"), lit(1).as("d")))
        .groupBy("node").agg(max("s").as("hs"), max("d").as("hd"))
        .filter(col("hs") === 0 || col("hd") === 0).count()
      phase(s"asym check ($asym)")
      val edgesD = edges.join(deg, col("src") === deg("node"))
        .select(col("src"), col("dst"), col("outdeg")).persist()
      edgesD.count()
      phase("edgesD persist+count")
      edges.unpersist(blocking = false)
      var pr: DataFrame = deg.select(col("node").as("node"),
        floor(lit(1.0e12) / n + 0.5).cast("long").as("pr"))
      for (i <- 1 to 5) {
        val e = edgesD.select(col("src").as("node"),
          col("dst").as("edge_dst"), col("outdeg"))
        val contrib = pr.join(e, "node")
          .select(col("edge_dst").as("node"),
            floor(col("pr").cast("double") / col("outdeg") + 0.5)
              .cast("long").as("c"))
        pr = contrib.repartition(col("node"))
          .groupBy("node").agg(sum("c").as("sc"))
          .select(col("node"),
            floor(lit(1.5e11) / n + lit(0.85) * col("sc").cast("double") + 0.5)
              .cast("long").as("pr")).localCheckpoint()
        phase(s"iteration $i")
      }
      edgesD.unpersist(blocking = false)
      pr.orderBy(desc("pr")).limit(30).count()
      phase("final top30")
    }

    s.stop()
  }
}
