package graft.learner

import graft.SparkTestBase
import graft.api.GraftBoost
import graft.data.DMatrixSpec

/**
 * LambdaMART listwise objectives (rank:ndcg / rank:map) — Burges'
 * |Δmetric| pair weighting over the current ranking, the xgboost
 * ranking objectives beyond rank:pairwise that the reference forwards
 * verbatim. Determinism rests on Sharding.sortByQid pinning
 * intra-group order to row content (margin ties break by position),
 * which the golden partitioning tests exercise directly.
 */
class LambdaRankSpec extends SparkTestBase {
  import spark.implicits._

  test("rank:ndcg learns graded relevance: ndcg@5 improves and the " +
      "top of each group concentrates high grades") {
    val rng = new scala.util.Random(29)
    val rows = (0 until 60).flatMap { q =>
      (0 until 8).map { _ =>
        val x = rng.nextDouble()
        // graded 0..3, monotone in x with noise
        val grade = math.min(3, (x * 4 + rng.nextDouble() * 0.5).toInt)
        (x, rng.nextDouble(), grade.toDouble, q.toLong)
      }
    }
    val df = rows.toDF("a", "b", "rel", "group").repartition(4)
    val spec = DMatrixSpec(labelCol = Seq("rel"), qidCol = Some("group"))
    val res = GraftBoost.train(df, spec,
      TrainParams(objective = "rank:ndcg", numRounds = 15, maxDepth = 3,
        eta = 0.5, seed = 2, evalMetric = Seq("ndcg@5")),
      evals = Seq(("train", df)))
    val ndcg = res.evalsResult("train")("ndcg@5")
    assert(ndcg.last > ndcg.head,
      s"ndcg@5 did not improve: ${ndcg.mkString(",")}")
    assert(ndcg.last > 0.9, s"final ndcg@5 ${ndcg.last}")
  }

  test("rank:map optimizes binary average precision and rejects " +
      "graded labels") {
    val rng = new scala.util.Random(31)
    val rows = (0 until 60).flatMap { q =>
      (0 until 8).map { _ =>
        val x = rng.nextDouble()
        // noisy relevance so one shallow tree cannot rank perfectly
        (x, rng.nextDouble(),
          if (x + 0.6 * rng.nextDouble() > 0.9 || rng.nextInt(12) == 0)
            1.0 else 0.0,
          q.toLong)
      }
    }
    val df = rows.toDF("a", "b", "rel", "group").repartition(4)
    val spec = DMatrixSpec(labelCol = Seq("rel"), qidCol = Some("group"))
    val res = GraftBoost.train(df, spec,
      TrainParams(objective = "rank:map", numRounds = 12, maxDepth = 2,
        eta = 0.3, seed = 2), evals = Seq(("train", df)))
    val map = res.evalsResult("train")("map")
    assert(map.last > map.head, s"map did not improve: ${map.mkString(",")}")
    assert(map.last > 0.8, s"final map ${map.last}")

    val graded = df.withColumn("rel",
      org.apache.spark.sql.functions.col("rel") * 3)
    val e = intercept[Exception] {
      GraftBoost.train(graded, spec,
        TrainParams(objective = "rank:map", numRounds = 1, seed = 1))
    }
    // the root cause may arrive wrapped in a Spark task failure —
    // assert the binary-label guard's message is what surfaced
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("binary relevance")),
      s"expected the binary-label guard, got: ${messages(e)}")
  }

  test("golden equality: ndcg and map 1-partition == 8-partition " +
      "(content-pinned intra-group order)") {
    val rng = new scala.util.Random(37)
    val rows = (0 until 40).flatMap { q =>
      (0 until 6).map { _ =>
        val x = rng.nextDouble()
        (x, rng.nextDouble(),
          math.min(1.0, math.floor(x * 2)), q.toLong)
      }
    }
    val df = rows.toDF("a", "b", "rel", "group")
    val spec = DMatrixSpec(labelCol = Seq("rel"), qidCol = Some("group"))
    for (objective <- Seq("rank:ndcg", "rank:map")) {
      val p = TrainParams(objective = objective, numRounds = 4,
        maxDepth = 3, seed = 9)
      val one = GraftBoost.train(df, spec, p, numWorkers = 1)
      val many = GraftBoost.train(df, spec, p, numWorkers = 8)
      assert(one.model.dump() === many.model.dump(),
        s"$objective diverged across partitionings")
    }
  }

  test("dart composes with listwise ranking: rateDrop=0 == gbtree and " +
      "dropout stays partition-invariant (qid-contiguous layout " +
      "preserved through the per-round margin rebuild)") {
    val rng = new scala.util.Random(57)
    val rows = (0 until 40).flatMap { q =>
      (0 until 6).map { _ =>
        val x = rng.nextDouble()
        (x, rng.nextDouble(),
          math.min(1.0, math.floor(x * 2)), q.toLong)
      }
    }
    val df = rows.toDF("a", "b", "rel", "group")
    val spec = DMatrixSpec(labelCol = Seq("rel"), qidCol = Some("group"))
    val p = TrainParams(objective = "rank:ndcg", numRounds = 4,
      maxDepth = 3, seed = 9)
    // ranking gradients are cached per round (needsGroups) — the dart
    // rebuild must feed them the same qid-contiguous partitions
    val gb = GraftBoost.train(df, spec, p, numWorkers = 4)
    val da = GraftBoost.train(df, spec,
      p.copy(booster = "dart", rateDrop = 0.0), numWorkers = 4)
    assert(gb.model.dump() === da.model.dump())
    val d1 = GraftBoost.train(df, spec,
      p.copy(booster = "dart", rateDrop = 0.5), numWorkers = 1)
    val d8 = GraftBoost.train(df, spec,
      p.copy(booster = "dart", rateDrop = 0.5), numWorkers = 8)
    assert(d1.model.dump() === d8.model.dump(),
      "dart ranking diverged across partitionings")
  }
}
