package graft.learner

import org.apache.spark.{SparkContext, TaskContext}
import org.apache.spark.util.CollectionAccumulator

import scala.jdk.CollectionConverters._

/**
 * Worker-side lifecycle callbacks — analog of the reference's
 * `DistributedCallback` (reference: xgboost_ray/callback.py:14-116),
 * whose hooks run on each remote actor. Here the "actor" is a task
 * working one partition: `rank` is `TaskContext.partitionId`. Like the
 * reference ("de-serialized on each actor and ... independent of each
 * other"), each task gets its own deserialized copy, so mutating state
 * inside a hook affects only that task.
 *
 * Wiring (see GraftBoost / Trainer.boost):
 *  - onInit + beforeDataLoading fire when a partition of the training
 *    matrix starts materializing; afterDataLoading fires at task
 *    completion of that pass (TaskContext.addTaskCompletionListener).
 *  - beforeTrain / afterTrain fire in one pass over the cached binned
 *    data immediately before / after the boosting round loop.
 *  - beforePredict / afterPredict wrap each output partition of
 *    `GraftBoost.predict`, firing when the prediction partition is
 *    actually computed.
 *
 * Hooks may re-fire for a partition if Spark recomputes it after a
 * failure — the same way the reference re-runs hooks on actor restart.
 */
trait DistributedCallback extends Serializable {
  def onInit(rank: Int): Unit = {}
  def beforeDataLoading(rank: Int): Unit = {}
  def afterDataLoading(rank: Int): Unit = {}
  def beforeTrain(rank: Int): Unit = {}
  def afterTrain(rank: Int): Unit = {}
  def beforePredict(rank: Int): Unit = {}
  def afterPredict(rank: Int): Unit = {}
}

private[graft] object DistributedCallback {

  @inline def rank(): Int =
    Option(TaskContext.get()).map(_.partitionId()).getOrElse(0)

  /** Fire `before` now and `after` at task completion; pass rows through
    * untouched. */
  def wrapLoading[T](cbs: Seq[DistributedCallback], init: Boolean)
      (it: Iterator[T]): Iterator[T] = {
    if (cbs.isEmpty) return it
    val r = rank()
    if (init) cbs.foreach(_.onInit(r))
    cbs.foreach(_.beforeDataLoading(r))
    Option(TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => cbs.foreach(_.afterDataLoading(r))))
    it
  }

  def wrapPredict[T](cbs: Seq[DistributedCallback])
      (it: Iterator[T]): Iterator[T] = {
    if (cbs.isEmpty) return it
    val r = rank()
    cbs.foreach(_.beforePredict(r))
    Option(TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => cbs.foreach(_.afterPredict(r))))
    it
  }
}

/**
 * Stop event (C6) — analog of the reference's `stop_event` /
 * `_StopCallback` pair (reference: xgboost_ray/main.py session stop
 * handling). Register it in the `callbacks` list of `GraftBoost.train`.
 *
 *  - `set()`: cooperative — training stops at the next round boundary.
 *  - `set(hard = true)`: additionally cancels the trainer's Spark job
 *    group, killing in-flight histogram/eval stages; the trainer
 *    catches the cancellation and still returns the model built so far
 *    (completed rounds only), like the reference returning the last
 *    checkpoint on stop.
 */
final class StopEvent extends TrainingCallback {
  @volatile private var stopped = false
  @volatile private var cancelHook: () => Unit = () => ()

  /** Wired by the trainer so hard stops can kill the running stages. */
  private[learner] def bindCancel(hook: () => Unit): Unit =
    cancelHook = hook

  def set(): Unit = set(hard = false)
  def set(hard: Boolean): Unit = {
    stopped = true
    if (hard) cancelHook()
  }
  def isSet: Boolean = stopped
  override def afterIteration(round: Int,
      metrics: Map[String, Double]): Boolean = stopped
}

/**
 * Worker→driver result channel (C7) — analog of the reference's
 * actor→driver queue for arbitrary items (main.py `_QueueCheckCallback`
 * queue plumbing). Backed by a `CollectionAccumulator`, so items survive
 * the same merge path as any Spark metric; read `items` on the driver
 * after the job. Capture the channel inside a `DistributedCallback` or
 * any task closure and `put` from workers.
 */
final class ResultChannel(sc: SparkContext) extends Serializable {
  private val acc: CollectionAccumulator[(Int, String)] =
    sc.collectionAccumulator[(Int, String)]("graft.resultChannel")
  def put(item: String): Unit =
    acc.add((DistributedCallback.rank(), item))
  /** Driver-side view of everything sent so far. */
  def items: Seq[(Int, String)] = acc.value.asScala.toList
}
