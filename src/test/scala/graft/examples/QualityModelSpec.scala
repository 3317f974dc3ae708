package graft.examples

import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class QualityModelSpec extends SparkTestBase {

  test("GP quality model learns the rule gate from text features") {
    val (acc, scored) = QualityModelExample.flow(spark, "/root/testdata/sf0.001")
    assert(acc > 0.85, s"held-out accuracy $acc")
    // probabilities are calibrated-ish: confident on both classes
    val probs = scored.select(
      avg(when(col("label") === 1.0, element_at(vector_to_array(col("probability")), 2))),
      avg(when(col("label") === 0.0, element_at(vector_to_array(col("probability")), 2))))
      .head()
    assert(probs.getDouble(0) > 0.6, s"mean P(pass|pass)=${probs.getDouble(0)}")
    assert(probs.getDouble(1) < 0.4, s"mean P(pass|fail)=${probs.getDouble(1)}")
  }
}
