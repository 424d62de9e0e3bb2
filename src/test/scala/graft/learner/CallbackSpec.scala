package graft.learner

import graft.SparkTestBase
import graft.api.GraftBoost
import graft.data.DMatrixSpec

import java.util.concurrent.ConcurrentLinkedQueue

/** Shared sink for hook events (local mode = one JVM). */
object HookLog {
  val events = new ConcurrentLinkedQueue[(Int, String)]()
  def clear(): Unit = events.clear()
  def list: List[(Int, String)] =
    events.toArray(Array.empty[(Int, String)]).toList
}

/** C8 test double, mirroring test_end_to_end.py:279-320's
  * _make_callback counter checks. */
class RecordingCallback extends DistributedCallback {
  private def rec(r: Int, h: String): Unit = HookLog.events.add((r, h))
  override def onInit(r: Int): Unit = rec(r, "onInit")
  override def beforeDataLoading(r: Int): Unit = rec(r, "beforeDataLoading")
  override def afterDataLoading(r: Int): Unit = rec(r, "afterDataLoading")
  override def beforeTrain(r: Int): Unit = rec(r, "beforeTrain")
  override def afterTrain(r: Int): Unit = rec(r, "afterTrain")
  override def beforePredict(r: Int): Unit = rec(r, "beforePredict")
  override def afterPredict(r: Int): Unit = rec(r, "afterPredict")
}

class CallbackSpec extends SparkTestBase {
  import spark.implicits._

  private def trainDf = {
    val rng = new scala.util.Random(41)
    (1 to 200).map { _ =>
      val x0 = rng.nextDouble(); val x1 = rng.nextDouble()
      (x0, x1, if (x0 > x1) 1 else 0)
    }.toDF("x0", "x1", "y")
  }

  test("shared train-eval frame loads the data exactly ONCE (r11): " +
      "the eval advance must not unpersist the shared base and force " +
      "a full lineage recompute at round 1") {
    HookLog.clear()
    val cb = new RecordingCallback
    val df = trainDf
    GraftBoost.train(df, DMatrixSpec("y"),
      TrainParams(objective = "binary:logistic", numRounds = 4,
        maxDepth = 3, seed = 7, evalMetric = Seq("logloss")),
      evals = Seq(("train", df)),
      numWorkers = 4, distributedCallbacks = Seq(cb))
    val loads = HookLog.list.count(_._2 == "beforeDataLoading")
    assert(loads === 4,
      s"expected one data-loading pass per partition (4), saw $loads " +
        "— the shared train/eval base was recomputed")
  }

  test("distributed callbacks fire in lifecycle order per rank (C8)") {
    HookLog.clear()
    val cb = new RecordingCallback
    val res = GraftBoost.train(trainDf, DMatrixSpec("y"),
      TrainParams(objective = "binary:logistic", numRounds = 2,
        maxDepth = 2, seed = 1),
      numWorkers = 4, distributedCallbacks = Seq(cb))
    val events = HookLog.list
    val hooks = events.map(_._2).toSet
    assert(Set("onInit", "beforeDataLoading", "afterDataLoading",
      "beforeTrain", "afterTrain").subsetOf(hooks), hooks.toString)
    // per-rank: first onInit <= first beforeDataLoading <
    //   first afterDataLoading <= first beforeTrain < first afterTrain
    val ranks = events.filter(_._2 == "beforeTrain").map(_._1).distinct
    assert(ranks.size === 4, s"expected 4 training ranks, got $ranks")
    ranks.foreach { r =>
      def first(h: String): Int = {
        val i = events.indexOf((r, h))
        assert(i >= 0, s"rank $r missing hook $h")
        i
      }
      assert(first("onInit") <= first("beforeDataLoading"))
      assert(first("beforeDataLoading") < first("afterDataLoading"))
      assert(first("afterDataLoading") < first("beforeTrain"))
      assert(first("beforeTrain") < first("afterTrain"))
    }
    // predict hooks fire when the output partitions are computed
    HookLog.clear()
    val pred = GraftBoost.predict(res.model, trainDf, DMatrixSpec("y"),
      distributedCallbacks = Seq(cb))
    assert(HookLog.list.isEmpty) // lazy: nothing fired yet
    pred.count()
    val pEvents = HookLog.list.map(_._2)
    assert(pEvents.contains("beforePredict") &&
      pEvents.contains("afterPredict"), pEvents.toString)
  }

  test("StopEvent halts training at the next round boundary (C6)") {
    val stop = new StopEvent
    val trigger = new TrainingCallback {
      override def afterIteration(round: Int,
          metrics: Map[String, Double]): Boolean = {
        if (round >= 1) stop.set() // fires during round index 1
        false
      }
    }
    val res = GraftBoost.train(trainDf, DMatrixSpec("y"),
      TrainParams(objective = "binary:logistic", numRounds = 50,
        maxDepth = 2, seed = 1),
      numWorkers = 2, callbacks = Seq(trigger, stop))
    assert(stop.isSet)
    assert(res.roundsCompleted === 2,
      s"expected stop after round 2, got ${res.roundsCompleted}")
  }

  test("hard StopEvent cancels in-flight stages and returns the " +
      "model built so far (C6 job-group cancel)") {
    val rng = new scala.util.Random(83)
    // big enough that 200 rounds take well over the stop delay
    val rows = (1 to 60000).map { _ =>
      val a = rng.nextDouble(); val b = rng.nextDouble()
      (a, b, 2 * a + b)
    }
    val df = rows.toDF("a", "b", "y").repartition(8)
    val stop = new StopEvent
    val stopper = new Thread(() => {
      Thread.sleep(1500)
      stop.set(hard = true)
    })
    stopper.start()
    val res = GraftBoost.train(df, DMatrixSpec("y"),
      TrainParams(objective = "reg:squarederror", numRounds = 200,
        maxDepth = 6, seed = 1), callbacks = Seq(stop))
    stopper.join()
    assert(stop.isSet)
    assert(res.roundsCompleted < 200,
      s"hard stop did not interrupt (${res.roundsCompleted} rounds)")
    // the returned model holds EXACTLY the completed rounds' trees —
    // a cancel landing after `trees ++= roundTrees` must trim the
    // partial round (advisor r2)
    assert(res.model.trees.length === res.roundsCompleted,
      s"${res.model.trees.length} trees vs ${res.roundsCompleted} rounds")
    val pred = GraftBoost.predict(res.model, df.limit(10), DMatrixSpec("y"))
    assert(pred.count() === 10)
  }

  test("ResultChannel carries worker items to the driver (C7)") {
    val chan = new ResultChannel(spark.sparkContext)
    val sender = new DistributedCallback {
      override def beforeTrain(r: Int): Unit = chan.put(s"hello-$r")
    }
    GraftBoost.train(trainDf, DMatrixSpec("y"),
      TrainParams(objective = "binary:logistic", numRounds = 1,
        maxDepth = 2, seed = 1),
      numWorkers = 3, distributedCallbacks = Seq(sender))
    val got = chan.items
    assert(got.size >= 3, got.toString)
    assert((0 until 3).forall(r => got.contains((r, s"hello-$r"))),
      got.toString)
  }
}
