package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.ops.Similarity

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("native cosine_sim is bit-equal to the builtin dot/norm chain") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -0.25f, 0.0f), Array(-1.0f, 2.0f, 0.125f)))
      .toDF("a", "b")
    val builtin = Similarity.dot(col("a"), col("b")) /
      (Similarity.norm(col("a")) * Similarity.norm(col("b")))
    val rows = df.select(
      CosineSimilarity(col("a"), col("b")).as("native"),
      builtin.as("ref")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("cosine_sim accepts mixed float/double arrays") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0, 0.0))).toDF("f", "d")
    val got = df.select(CosineSimilarity(col("f"), col("d")))
      .collect().head.getDouble(0)
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("cosine_sim registered for SQL via function registry") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c")
      .collect().head.getDouble(0)
    assert(got == 0.0)
  }

  test("heavy_hitters finds the frequent values with bounded counters") {
    val values = Seq.fill(60)("alpha") ++ Seq.fill(25)("beta") ++
      (1 to 15).map(i => s"rare$i")
    val df = values.toDF("v")
    val m = df.select(HeavyHitters(col("v"), 4).as("hh"))
      .collect().head.getMap[String, Long](0)
    assert(m.contains("alpha") && m.contains("beta"))
    // Misra-Gries lower bound: count undercounts by at most N/k = 25
    assert(m("alpha") >= 60 - 25 && m("alpha") <= 60)
    assert(m.size <= 4)
  }

  test("cosine_sim nulls on length mismatch and null elements " +
    "(both eval paths)") {
    val df = Seq(
      (Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](1.0f)),
      (Array[java.lang.Float](1.0f, null), Array[java.lang.Float](1.0f, 2.0f)))
      .toDF("a", "b")
    // codegen path
    assert(df.select(CosineSimilarity(col("a"), col("b")))
      .collect().forall(_.isNullAt(0)))
    // interpreted path (eval via filter on a non-codegen context)
    val interpreted = df.select(
      CosineSimilarity(col("a"), col("b")).as("c")).filter(col("c").isNull)
    assert(interpreted.count() == 2)
  }

  test("sign_bits is bit-equal to the interpreted HOF-fold formulation") {
    val rnd = new scala.util.Random(20260814L)
    val planes: Seq[Seq[Double]] =
      Seq.fill(24)(Seq.fill(16)(rnd.nextGaussian()))
    val vecs = (1L to 50L).map(i =>
      (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1))) ++
      // NaN projection: Spark's >= orders NaN above every double → bit 1;
      // the native loop must agree
      Seq((51L, Seq.fill(16)(Float.NaN)), (52L, Seq.fill(16)(0f)))
    val df = vecs.toDF("id", "v")
    val hof = transform(typedlit(planes), p =>
      when(aggregate(zip_with(col("v"), p, (x, h) => x.cast("double") * h),
        lit(0.0), (acc, x) => acc + x) >= 0, 1).otherwise(0))
    val rows = df.select(SignBits(col("v"), planes).as("native"),
      hof.as("ref")).collect()
    rows.foreach(r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1), r.toString))
  }

  test("sign_bits nulls on mismatch/null element and drops from banding") {
    val planes: Seq[Seq[Double]] = Seq(Seq(1.0, 1.0), Seq(1.0, -1.0))
    val df = Seq(
      (1L, Array[java.lang.Float](1.0f, 2.0f)),       // well-formed
      (2L, Array[java.lang.Float](1.0f)),             // wrong length
      (3L, Array[java.lang.Float](1.0f, null)),       // null element
      (4L, null.asInstanceOf[Array[java.lang.Float]])) // null vector
      .toDF("id", "v")
    val got = df.select(col("id"), SignBits(col("v"), planes).as("bits"))
    assert(got.filter(col("bits").isNull).select("id").as[Long].collect()
      .toSet == Set(2L, 3L, 4L))
    // the malformed rows' band keys go null too, so equi-joins drop them —
    // the candidacy contract cosineCandidatePairs documents
    val bands = got.select(col("id"),
      aggregate(slice(col("bits"), 1, 2), lit(0), (a, b) => a * 2 + b)
        .as("band"))
    assert(bands.filter(col("band").isNotNull).count() == 1)
  }

  test("heavy_hitters merge keeps a heavy key arriving as one partial") {
    // the ADVICE r1 scenario: one partition holds the heavy key, others only
    // light keys; a buggy merge that decrements by the FULL incoming count
    // discards the heavy partial entirely. 1 heavy key (200×) + light noise,
    // partitioned so the heavy mass is a single merged partial.
    val values = Seq.fill(200)("heavy") ++ (1 to 40).map(i => s"light$i")
    val df = values.toDF("v").repartition(8, col("v"))
    val m = df.select(HeavyHitters(col("v"), 3).as("hh"))
      .collect().head.getMap[String, Long](0)
    // N=240, k=3 → anything with freq > 80 must survive, undercount ≤ 80
    assert(m.contains("heavy"), s"heavy key lost in merge: $m")
    assert(m("heavy") >= 200 - 80 && m("heavy") <= 200)
  }

  test("bounded_collect equals collect_list under the cap, stops past it") {
    // 3 groups: tiny (2), exactly-at-cap (5), over-cap (40). Repartition so
    // partials merge — the cap must hold through update AND merge, and
    // under-cap groups must match collect_list element-for-element (as
    // sets; arrival order is nondeterministic across partitions)
    val rows = (1 to 2).map(i => ("a", i.toLong)) ++
      (1 to 5).map(i => ("b", i.toLong)) ++
      (1 to 40).map(i => ("c", i.toLong))
    val df = rows.toDF("g", "v").repartition(8)
    val got = df.groupBy("g")
      .agg(BoundedCollect(col("v"), 5).as("bc"),
        collect_list(col("v")).as("cl"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getSeq[Long](1).toSet, r.getSeq[Long](2).toSet, r.getSeq[Long](1).size))
      .toMap
    assert(got("a")._1 == got("a")._2 && got("a")._3 == 2)
    assert(got("b")._1 == got("b")._2 && got("b")._3 == 5)
    assert(got("c")._3 == 6, "over-cap group must stop at limit+1")
    assert(got("c")._1.subsetOf(got("c")._2))
  }

  test("bounded_collect matches collect_list semantics on random inputs") {
    // randomized: group sizes 0..3·cap, random caps, random partitioning —
    // under-cap groups must equal collect_list as multisets, over-cap
    // groups must report size cap+1 with elements drawn from the group
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 3) {
      val cap = 1 + rnd.nextInt(7)
      val rows = (0 until 40).flatMap { g =>
        (0 until rnd.nextInt(3 * cap + 1)).map(i =>
          (g.toLong, g * 1000L + i))
      }
      val df = rows.toDF("g", "v").repartition(1 + rnd.nextInt(8))
      df.groupBy("g")
        .agg(BoundedCollect(col("v"), cap).as("bc"),
          collect_list(col("v")).as("cl"))
        .collect().foreach { r =>
          val bc = r.getSeq[Long](1)
          val cl = r.getSeq[Long](2)
          if (cl.size <= cap)
            assert(bc.sorted == cl.sorted, s"trial $trial cap $cap")
          else {
            assert(bc.size == cap + 1, s"trial $trial cap $cap: ${bc.size}")
            assert(bc.toSet.subsetOf(cl.toSet))
          }
        }
    }
  }

  test("bounded_collect carries struct elements through partial merge") {
    val df = (1 to 10).map(i => (i.toLong, i * 100L)).toDF("id", "fp")
      .repartition(4)
    val got = df.agg(BoundedCollect(struct(col("id"), col("fp")), 20)
        .as("docs"))
      .selectExpr("transform(docs, d -> d.id * 1000 + d.fp) AS packed")
      .collect().head.getSeq[Long](0).toSet
    assert(got == (1 to 10).map(i => i * 1000L + i * 100L).toSet)
  }

  test("every native function resolves through the extensions injection") {
    // the cluster-wide deployment path (spark.sql.extensions) must expose
    // the SAME function surface as the runtime register() — a function
    // present in one and not the other silently vanishes on a configured
    // cluster (the round-6 ADVICE finding for minhash_sigs)
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val row = s2.sql(
        "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
          "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cs, " +
          "dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp, " +
          "simhash64(transform(split('a b c', ' '), t -> xxhash64(t))) " +
          "AS sh, " +
          "minhash_sigs(transform(split('a b c', ' '), t -> xxhash64(t)), " +
          "4) AS mh").collect().head
      assert(row.getDouble(0) == 1.0)
      assert(row.getDouble(1) == 11.0)
      assert(row.getSeq[Long](3).size == 4)
      val hh = s2.sql("SELECT heavy_hitters(v, 2) AS hh FROM " +
        "(SELECT explode(array('x','x','x','y')) AS v)")
        .collect().head.getMap[String, Long](0)
      assert(hh.contains("x"))
      val bc = s2.sql("SELECT bounded_collect(v, 2) AS bc FROM " +
        "(SELECT explode(array(1L, 2L, 3L, 4L)) AS v)")
        .collect().head.getSeq[Long](0)
      assert(bc.size == 3, s"cap at limit+1: $bc")
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("heavy_hitters merges across partitions (grouped + SQL form)") {
    GraftFunctions.register(spark)
    val df = (Seq.fill(40)("x") ++ Seq.fill(10)("y")).toDF("v")
      .repartition(8)
    df.createOrReplaceTempView("hh_in")
    val m = spark.sql("SELECT heavy_hitters(v, 2) AS hh FROM hh_in")
      .collect().head.getMap[String, Long](0)
    assert(m.contains("x"))
    assert(m("x") >= 40 - 25)
  }

  test("jaro_winkler matches the published reference values") {
    // classic pairs from Winkler's papers; exact doubles from the
    // DuckDB-parity arithmetic (see JaroWinklerAlgo scaladoc)
    assert(JaroWinklerAlgo.similarity("MARTHA", "MARHTA") ==
      (0.9444444444444445 + 3 * 0.1 * (1.0 - 0.9444444444444445)))
    assert(JaroWinklerAlgo.similarity("DIXON", "DICKSONX") ==
      (0.7666666666666666 + 2 * 0.1 * (1.0 - 0.7666666666666666)))
    assert(JaroWinklerAlgo.similarity("abc", "abc") == 1.0)
    assert(JaroWinklerAlgo.similarity("", "") == 0.0)
    assert(JaroWinklerAlgo.similarity("abc", "") == 0.0)
    assert(JaroWinklerAlgo.similarity("abc", "xyz") == 0.0)
  }

  test("jaro_winkler expression: codegen equals interpreted eval") {
    val df = Seq(("martha", "marhta"), ("part_green_steel", "part_green_stel"),
      ("abcd", "abcd"), ("a", "b")).toDF("s1", "s2")
    val rows = df.select(col("s1"), col("s2"),
      JaroWinkler(col("s1"), col("s2")).as("jw")).collect()
    rows.foreach { r =>
      assert(r.getDouble(2) ==
        JaroWinklerAlgo.similarity(r.getString(0), r.getString(1)))
    }
    // null propagation
    val n = Seq((Some("x"), None: Option[String])).toDF("s1", "s2")
      .select(JaroWinkler(col("s1"), col("s2"))).collect().head
    assert(n.isNullAt(0))
  }

  test("jaro_winkler registered for SQL via function registry") {
    GraftFunctions.register(spark)
    val got = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS j")
      .collect().head.getDouble(0)
    assert(got == JaroWinklerAlgo.similarity("martha", "marhta"))
  }

  test("count_min never undercounts; exact when the sketch is wide") {
    // 10 keys with counts 100 × (1..10)/? — skewed: key i appears i+1 times
    val rows = (0 until 10).flatMap(i => Seq.fill((i + 1) * 7)(s"k$i"))
      .toDF("k")
    val truth = rows.groupBy("k").agg(count(lit(1)).as("cnt"))
    // wide sketch: 10 keys in 4×1024 cells — some row is collision-free
    // for every key (deterministic under xxhash64's fixed seeds)
    val wide = CountMin.estimate(
      CountMin.sketch(rows, "k", 4, 1024), truth.select("k"), "k", 4, 1024)
      .join(truth, "k").collect()
    wide.foreach { r =>
      assert(r.getAs[Long]("est") == r.getAs[Long]("cnt"), r)
    }
    // cramped sketch (width 4): collisions force overcounts, but CMS can
    // structurally never undercount
    val tight = CountMin.estimate(
      CountMin.sketch(rows, "k", 4, 4), truth.select("k"), "k", 4, 4)
      .join(truth, "k").collect()
    tight.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("cnt"), r)
    }
    assert(tight.map(_.getAs[Long]("est")).sum >
      tight.map(_.getAs[Long]("cnt")).sum, "width 4 must collide")
  }

  test("count_min sketches merge by cell addition") {
    val a = (0 until 50).map(i => s"k${i % 5}").toDF("k")
    val b = (0 until 30).map(i => s"k${i % 3}").toDF("k")
    val merged = CountMin.sketch(a, "k", 4, 64)
      .unionByName(CountMin.sketch(b, "k", 4, 64))
      .groupBy("r", "b").agg(sum(col("c")).as("c"))
    val direct = CountMin.sketch(a.unionByName(b), "k", 4, 64)
    val m = merged.collect().map(r =>
      (r.getAs[Int]("r"), r.getAs[Long]("b")) -> r.getAs[Long]("c")).toMap
    val d = direct.collect().map(r =>
      (r.getAs[Int]("r"), r.getAs[Long]("b")) -> r.getAs[Long]("c")).toMap
    assert(m == d, s"merged=$m direct=$d")
  }
}
