package graft

/** Session-reuse cache hygiene (round-10 ADVICE): running detectors
  * back-to-back through `SparkEntry.queries` must NOT accumulate the
  * builders' persisted intermediates — each build drains the previous
  * query's registered frames, and an explicit drain releases the last.
  */
class CacheScopeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("three detectors back-to-back do not grow storage; drain empties it") {
    // other suites share this session — measure against their leftovers
    CacheScope.drain(spark)
    val baseline = spark.sparkContext.getPersistentRDDs.keySet

    def runQuery(name: String): Set[Int] = {
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      spark.sparkContext.getPersistentRDDs.keySet.diff(baseline).toSet
    }

    val afterMinhash = runQuery("q_dedup_minhash_lsh")
    assert(afterMinhash.nonEmpty, "detector should persist intermediates")
    val afterSimhash = runQuery("q_dedup_simhash")
    // minhash's frames were drained when simhash built: no overlap, and
    // total cached RDDs is simhash's own set, not the union
    assert(afterSimhash.intersect(afterMinhash).isEmpty,
      "previous detector's persisted frames must be gone")
    val afterPhash = runQuery("q_phash_neardup")
    assert(afterPhash.intersect(afterMinhash ++ afterSimhash).isEmpty)

    // bounded, not monotonic: occupancy after three queries is the last
    // query's own intermediates only
    CacheScope.drain(spark)
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(baseline).isEmpty,
      "drain must release the last query's frames")
  }

  test("drained plans still compute (recompute path stays correct)") {
    val df = SparkEntry.queries("q_dedup_minhash_lsh")(spark, dir)
    CacheScope.drain(spark) // drop its intermediates BEFORE execution
    assert(df.count() >= 0) // plan recomputes the unpersisted subtrees
    CacheScope.drain(spark)
  }

  test("concurrent persist/drain never leaks a persisted frame") {
    // the ADVICE-r11 race: a drain() between persist's registration and
    // completion could orphan a persisted frame where no later drain
    // would ever see it. Hammer persist from several threads while
    // another drains concurrently, then drain once more: storage must
    // return exactly to baseline — any survivor is a leak.
    CacheScope.drain(spark)
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    try {
      val persists = (0 until 4).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = (0 until 25).foreach { i =>
            CacheScope.persist(spark.range(t * 100 + i, t * 100 + i + 3).toDF("v"))
          }
        })
      }
      val drains = (0 until 2).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = (0 until 40).foreach { _ => CacheScope.drain(spark) }
        })
      }
      (persists ++ drains).foreach(_.get())
    } finally pool.shutdown()
    CacheScope.drain(spark)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.diff(baseline)
    assert(leaked.isEmpty, s"persisted RDDs leaked past the final drain: $leaked")
    assert(CacheScope.registered(spark) == 0)
  }

  test("build-before-execute loses only the persist BENEFIT, never the result") {
    // the interactive-notebook order the scaladoc warns about: build A,
    // build B (B's scopedBuild drains A's registered persists), THEN
    // execute A — A must recompute its dropped intermediates and return
    // exactly what the build-execute order returns
    CacheScope.drain(spark)
    val expected = SparkEntry.queries("q_dedup_simhash")(spark, dir)
      .collect().map(_.toString).sorted // benefit path: executed right after build
    CacheScope.drain(spark)

    val a = SparkEntry.queries("q_dedup_simhash")(spark, dir)
    SparkEntry.queries("q_dedup_minhash_lsh")(spark, dir) // drains a's persists
    val got = a.collect().map(_.toString).sorted // recompute path
    assert(got.toSeq == expected.toSeq,
      "recompute after a cross-build drain must be bit-identical")
    CacheScope.drain(spark)
  }
}
