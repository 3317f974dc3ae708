package graft.queries

import org.apache.spark.sql.functions._

import graft.gp.{GPClassifier, GPRegressor}
import graft.gp.kernel.Kernels._
import graft.tables.Tables

/**
 * GP pack over the `embeddings` table (64-dim float vectors).
 *
 * gp01–gp03 exercise the full distributed fit+predict path (rows-only —
 * iterative training is not SQL-expressible); gp04/gp05 oracle-check the
 * kernel math itself against closed-form SQL.
 *
 * The table's own `label` column is uncorrelated with the embeddings
 * (measured same-label vs different-label mean cosine: 0.0016 vs
 * 0.0003), so gp01–gp03 regress a deterministic smooth function of the
 * embedding — sin(2·v·w) for a seeded unit vector w — which a working
 * GP must actually learn (quality asserted in GPQueriesSpec).
 */
object GPQueries {

  /** Seeded unit weight vector defining the synthetic learnable target. */
  private def weights(dim: Int): Seq[Double] = {
    val rnd = new scala.util.Random(97)
    val w = Array.fill(dim)(rnd.nextGaussian())
    val n = math.sqrt(w.map(x => x * x).sum)
    w.map(_ / n).toSeq
  }

  /** embeddings with features + target = sin(2·v·w). */
  private def withTarget(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val proj = graft.ops.Similarity.dot(col("embedding"), typedlit(weights(64)))
    Tables(s, dir).embeddings
      .select(col("vec_id"), col("embedding").as("features"),
        sin(proj * 2.0).as("label"))
  }

  val queries: Seq[Q] = Seq(
    Q(
      "gp01_regression_fit_predict",
      (s, dir) => {
        val e = withTarget(s, dir)
        val model = new GPRegressor()
          .setKernel(() => 1.0 * rbf(1.0))
          .setNoise(1e-3)
          .setExpertSize(100)
          .setInducingSize(64)
          .setMaxIter(15)
          .setSeed(42L)
          .fit(e)
        model.transform(e)
          .select(col("vec_id"), col("label"), col("prediction"))
          .orderBy("vec_id")
      }),

    Q(
      "gp02_classification_fit_predict",
      (s, dir) => {
        val e = withTarget(s, dir)
          .withColumn("label", (col("label") > 0).cast("double"))
        val model = new GPClassifier()
          .setKernel(() => 1.0 * rbf(1.0))
          .setNoise(1e-3)
          .setExpertSize(100)
          .setInducingSize(64)
          .setMaxIter(10)
          .setSeed(42L)
          .fit(e)
        model.transform(e)
          .select(col("vec_id"), col("label"), col("prediction"), col("probability"))
          .orderBy("vec_id")
      }),

    Q(
      "gp03_predictive_variance",
      (s, dir) => {
        val e = withTarget(s, dir)
        val model = new GPRegressor()
          .setKernel(() => 1.0 * rbf(1.0))
          .setNoise(1e-3)
          .setExpertSize(100)
          .setInducingSize(48)
          .setInducingStrategy("kmeans")
          .setMaxIter(10)
          .setSeed(42L)
          .setPredStdCol("pred_std")
          .fit(e)
        model.transform(e)
          .select(col("vec_id"), col("prediction"), col("pred_std"))
          .orderBy("vec_id")
      }),

    Q(
      "gp04_rbf_kernel_matrix",
      (s, dir) => {
        val kern = rbf(1.5)
        val kUdf = udf { (a: Seq[Double], b: Seq[Double]) =>
          kern.cross(Array(a.toArray), Array(b.toArray))(0, 0)
        }
        val e = Tables(s, dir).embeddings.filter(col("vec_id") < 15)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val a = e.select(col("vec_id").as("id_a"), col("v").as("va"))
        val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"))
        a.crossJoin(b).filter(col("id_a") <= col("id_b"))
          .select(col("id_a"), col("id_b"),
            fround(kUdf(col("va"), col("vb")), 6).as("k"))
          .orderBy("id_a", "id_b")
      },
      // k(a,b) = exp(-‖a-b‖² / (2·1.5²))
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |           FROM embeddings WHERE vec_id < 15)
             |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  floor(exp(-list_sum(list_transform(list_zip(a.v, b.v),
             |      x -> (x[1] - x[2]) * (x[1] - x[2]))) / 4.5) * 1e6 + 0.5) / 1e6 AS k
             |FROM e a JOIN e b ON a.vec_id <= b.vec_id
             |ORDER BY id_a, id_b""".stripMargin)),

    Q(
      "gp05_ard_kernel_matrix",
      (s, dir) => {
        val kern = ardRbf(64, 2.0)
        val kUdf = udf { (a: Seq[Double], b: Seq[Double]) =>
          kern.cross(Array(a.toArray), Array(b.toArray))(0, 0)
        }
        val e = Tables(s, dir).embeddings.filter(col("vec_id") < 15)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val a = e.select(col("vec_id").as("id_a"), col("v").as("va"))
        val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"))
        a.crossJoin(b).filter(col("id_a") <= col("id_b"))
          .select(col("id_a"), col("id_b"),
            fround(kUdf(col("va"), col("vb")), 6).as("k"))
          .orderBy("id_a", "id_b")
      },
      // ARD with all lengthscales 2: k = exp(-½ ‖a-b‖² / 4)
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |           FROM embeddings WHERE vec_id < 15)
             |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  floor(exp(-0.5 * list_sum(list_transform(list_zip(a.v, b.v),
             |      x -> (x[1] - x[2]) * (x[1] - x[2]))) / 4.0) * 1e6 + 0.5) / 1e6 AS k
             |FROM e a JOIN e b ON a.vec_id <= b.vec_id
             |ORDER BY id_a, id_b""".stripMargin)),

    Q(
      "gp08_matern_kernel_matrix",
      (s, dir) => {
        // Matérn-5/2 kernel matrix through the real Kernel.cross path
        // (beyond-reference kernel — spark-gp ships RBF/ARD/Eye only):
        // closed-form, so DuckDB replays the identical
        // (1+s+s²/3)·exp(−s) arithmetic with s = √5·r/ℓ.
        val kern = matern52(1.5)
        val kUdf = udf { (a: Seq[Double], b: Seq[Double]) =>
          kern.cross(Array(a.toArray), Array(b.toArray))(0, 0)
        }
        val e = Tables(s, dir).embeddings.filter(col("vec_id") < 15)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val a = e.select(col("vec_id").as("id_a"), col("v").as("va"))
        val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"))
        a.crossJoin(b).filter(col("id_a") <= col("id_b"))
          .select(col("id_a"), col("id_b"),
            fround(kUdf(col("va"), col("vb")), 6).as("k"))
          .orderBy("id_a", "id_b")
      },
      // s = √5·‖a-b‖/1.5; k = (1 + s + s²/3)·exp(-s)
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |           FROM embeddings WHERE vec_id < 15),
             |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |        sqrt(5) * sqrt(list_sum(list_transform(list_zip(a.v, b.v),
             |          x -> (x[1] - x[2]) * (x[1] - x[2])))) / 1.5 AS s
             |      FROM e a JOIN e b ON a.vec_id <= b.vec_id)
             |SELECT id_a, id_b,
             |  floor((1 + s + s * s / 3) * exp(-s) * 1e6 + 0.5) / 1e6 AS k
             |FROM p ORDER BY id_a, id_b""".stripMargin)),

    Q(
      "gp09_rq_kernel_matrix",
      (s, dir) => {
        // Rational-quadratic kernel matrix (ℓ=1.5, α=0.8) through the
        // real Kernel.cross path — closed-form u^−α, DuckDB replays the
        // identical pow/arithmetic.
        val kern = rationalQuadratic(1.5, 0.8)
        val kUdf = udf { (a: Seq[Double], b: Seq[Double]) =>
          kern.cross(Array(a.toArray), Array(b.toArray))(0, 0)
        }
        val e = Tables(s, dir).embeddings.filter(col("vec_id") < 15)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val a = e.select(col("vec_id").as("id_a"), col("v").as("va"))
        val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"))
        a.crossJoin(b).filter(col("id_a") <= col("id_b"))
          .select(col("id_a"), col("id_b"),
            fround(kUdf(col("va"), col("vb")), 6).as("k"))
          .orderBy("id_a", "id_b")
      },
      // u = 1 + d²/(2·0.8·1.5²); k = u^-0.8
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |           FROM embeddings WHERE vec_id < 15),
             |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |        1 + list_sum(list_transform(list_zip(a.v, b.v),
             |          x -> (x[1] - x[2]) * (x[1] - x[2]))) / (2 * 0.8 * 1.5 * 1.5) AS u
             |      FROM e a JOIN e b ON a.vec_id <= b.vec_id)
             |SELECT id_a, id_b,
             |  floor(pow(u, -0.8) * 1e6 + 0.5) / 1e6 AS k
             |FROM p ORDER BY id_a, id_b""".stripMargin)),

    Q(
      "gp10_dot_kernel_matrix",
      (s, dir) => {
        // Dot-product (linear) kernel matrix (σ₀=0.5) through the real
        // Kernel.cross path — exact arithmetic end to end (no
        // transcendentals), so the oracle is bit-trivial.
        val kern = dotProduct(0.5)
        val kUdf = udf { (a: Seq[Double], b: Seq[Double]) =>
          kern.cross(Array(a.toArray), Array(b.toArray))(0, 0)
        }
        val e = Tables(s, dir).embeddings.filter(col("vec_id") < 15)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val a = e.select(col("vec_id").as("id_a"), col("v").as("va"))
        val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"))
        a.crossJoin(b).filter(col("id_a") <= col("id_b"))
          .select(col("id_a"), col("id_b"),
            fround(kUdf(col("va"), col("vb")), 6).as("k"))
          .orderBy("id_a", "id_b")
      },
      // k = 0.25 + a·b
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |           FROM embeddings WHERE vec_id < 15)
             |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  floor((0.25 + list_sum(list_transform(list_zip(a.v, b.v),
             |      x -> x[1] * x[2]))) * 1e6 + 0.5) / 1e6 AS k
             |FROM e a JOIN e b ON a.vec_id <= b.vec_id
             |ORDER BY id_a, id_b""".stripMargin)),

    Q(
      "gp06_projected_predict",
      (s, dir) => {
        // The PREDICTION path (mean = k_xZ·w, var = k_xx + k_xZ·M·k_Zx)
        // through the real transform machinery, with a deterministic
        // hand-built model so DuckDB can recompute the closed forms —
        // only the iterative FITS (gp01–03) remain rows-only.
        import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
        val e = Tables(s, dir).embeddings
        val z = e.filter(col("vec_id") < 8).orderBy("vec_id")
          .select(col("embedding").cast("array<double>"))
          .collect().map(_.getSeq[Double](0).toArray)
        val weights = BDV.tabulate(z.length)(j => ((j % 5) + 1) / 10.0)
        val covAdjust = BDM.eye[Double](z.length) * -0.01
        val model = graft.gp.GPModelIO.fromProjected(
          graft.gp.ProjectedGP(z, weights, covAdjust, 1.0 * rbf(2.0)))
          .setFeaturesCol("features").setPredStdCol("std")
        model.transform(
          e.filter(col("vec_id") >= 8 && col("vec_id") < 300)
            .select(col("vec_id"), col("embedding").cast("array<double>").as("features")))
          .select(col("vec_id"),
            fround(col("prediction"), 6).as("mean"),
            fround(col("std"), 6).as("std"))
          .orderBy("vec_id")
      },
      // k_j = exp(-‖x−z_j‖²/(2·2²)); mean = Σ k_j w_j, w_j = ((j%5)+1)/10;
      // var = 1 − 0.01·Σ k_j² (covAdjust = −0.01·I, RBF self = 1)
      Some("""WITH z AS (SELECT vec_id AS zid, CAST(embedding AS DOUBLE[]) AS zv
             |           FROM embeddings WHERE vec_id < 8),
             |x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS xv
             |      FROM embeddings WHERE vec_id >= 8 AND vec_id < 300),
             |k AS (SELECT x.vec_id, z.zid,
             |    exp(-list_sum(list_transform(list_zip(xv, zv),
             |        p -> (p[1] - p[2]) * (p[1] - p[2]))) / 8.0) AS kv
             |  FROM x, z)
             |SELECT vec_id,
             |  floor(sum(kv * ((zid % 5) + 1) / 10.0) * 1e6 + 0.5) / 1e6 AS mean,
             |  floor(sqrt(1.0 - 0.01 * sum(kv * kv)) * 1e6 + 0.5) / 1e6 AS std
             |FROM k GROUP BY vec_id ORDER BY vec_id""".stripMargin)),

    Q(
      "gp07_binary_probability",
      (s, dir) => {
        // The ProbabilisticClassifier TRANSFORM path (raw = (−m, +m),
        // probability = sigmoid link, prediction = argmax) through the
        // real MLlib contract machinery, with the same deterministic
        // hand-built model as gp06 so DuckDB recomputes the sigmoid of
        // the closed-form latent mean.
        import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
        import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
        val e = Tables(s, dir).embeddings
        val z = e.filter(col("vec_id") < 8).orderBy("vec_id")
          .select(col("embedding").cast("array<double>"))
          .collect().map(_.getSeq[Double](0).toArray)
        val weights = BDV.tabulate(z.length)(j => (((j % 5) + 1) / 10.0) - 0.2)
        val covAdjust = BDM.eye[Double](z.length) * -0.01
        val model = graft.gp.GPModelIO.binaryFromProjected(
          graft.gp.ProjectedGP(z, weights, covAdjust, 1.0 * rbf(2.0)))
        model.transform(
          e.filter(col("vec_id") >= 8 && col("vec_id") < 300)
            .select(col("vec_id"),
              array_to_vector(col("embedding").cast("array<double>")).as("features")))
          .select(col("vec_id"),
            fround(element_at(vector_to_array(col("probability")), 2), 6).as("prob"),
            col("prediction").cast("int").as("pred"))
          .orderBy("vec_id")
      },
      // mean = Σ k_j w_j with w_j = ((j%5)+1)/10 − 0.2 (sign-mixed so
      // both classes appear); prob = σ(mean), pred = argmax = mean > 0
      Some("""WITH z AS (SELECT vec_id AS zid, CAST(embedding AS DOUBLE[]) AS zv
             |           FROM embeddings WHERE vec_id < 8),
             |x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS xv
             |      FROM embeddings WHERE vec_id >= 8 AND vec_id < 300),
             |k AS (SELECT x.vec_id, z.zid,
             |    exp(-list_sum(list_transform(list_zip(xv, zv),
             |        p -> (p[1] - p[2]) * (p[1] - p[2]))) / 8.0) AS kv
             |  FROM x, z),
             |m AS (SELECT vec_id,
             |    sum(kv * (((zid % 5) + 1) / 10.0 - 0.2)) AS mean
             |  FROM k GROUP BY vec_id)
             |SELECT vec_id,
             |  floor(1.0 / (1.0 + exp(-mean)) * 1e6 + 0.5) / 1e6 AS prob,
             |  CAST(CASE WHEN mean > 0 THEN 1 ELSE 0 END AS INT) AS pred
             |FROM m ORDER BY vec_id""".stripMargin))
  )
}
