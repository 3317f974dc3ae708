package graft.gp

import graft.SparkTestBase
import graft.examples.MnistExample

class MnistFlowSpec extends SparkTestBase {

  test("MNIST-style file flow: csv -> scale -> re-index -> OvR -> TrainValidationSplit") {
    val p = java.nio.file.Files.createTempDirectory("gp-mnist-spec").resolve("digits.csv")
    // 10 classes from file, non-contiguous class codes, ramped feature
    // scales — the full reference MNIST.scala composition
    MnistExample.writeSampleCsv(p, classes = 10, perClass = 30, dim = 8)
    val acc = MnistExample.flow(spark, p.toString,
      expertSize = 40, inducingSize = 15, maxIter = 8)
    assert(acc > 0.8, s"validation accuracy=$acc")
  }
}
