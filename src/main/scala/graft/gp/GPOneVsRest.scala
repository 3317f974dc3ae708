package graft.gp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multiclass GP classification via one-vs-rest over binary
 * `GPClassifier`s — a capability the binary-only reference lacks.
 *
 * Each class trains an independent binary GP (parallelizable across a
 * cluster's job scheduler; sequential here); prediction picks the class
 * with the highest sigmoid-probability. All K models share the kernel
 * factory and fitting parameters of the supplied template.
 */
object GPOneVsRest {

  final case class Fitted(labels: Seq[Double], models: Seq[GPClassificationModel]) {
    /** Adds `prediction` (winning label) and `confidence` (its prob). */
    def transform(df: DataFrame): DataFrame = {
      val scored = labels.zip(models).zipWithIndex.foldLeft(df) {
        case (acc, ((_, m), i)) =>
          // copy before renaming columns: mutating the stored model would
          // leak the __ovr_* names into later direct uses (and race).
          m.copy(org.apache.spark.ml.param.ParamMap.empty)
            .setPredictionCol(s"__ovr_pred_$i")
            .setProbabilityCol(s"__ovr_p_$i")
            .transform(acc)
            .drop(s"__ovr_pred_$i")
      }
      val probs = array(labels.indices.map(i => col(s"__ovr_p_$i")): _*)
      val best = array_position(probs, array_max(probs)).cast("int") - 1
      val labelArr = typedlit(labels)
      scored
        .withColumn("prediction", element_at(labelArr, best + 1))
        .withColumn("confidence", array_max(probs))
        .drop(labels.indices.map(i => s"__ovr_p_$i"): _*)
    }
  }

  /** Train one binary GP per distinct label of `labelCol`. */
  def fit(template: GPClassifier, dataset: Dataset[_]): Fitted = {
    val df = dataset.toDF()
    val labelCol = template.getOrDefault(template.labelCol)
    val labels = df.select(col(labelCol).cast("double")).distinct()
      .collect().map(_.getDouble(0)).sorted.toSeq
    require(labels.length >= 2, "need at least two classes")
    val models = labels.map { l =>
      val bin = df.withColumn("__ovr_label", (col(labelCol) === l).cast("double"))
      template.copy(org.apache.spark.ml.param.ParamMap.empty)
        .setLabelCol("__ovr_label")
        .fit(bin)
    }
    Fitted(labels, models)
  }
}
