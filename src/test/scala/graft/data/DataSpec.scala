package graft.data

import graft.SparkTestBase

/** Data-layer conformance: S4 matrix source, P5 label presence, P6
  * type-compat validation (reference: matrix.py, data_sources/numpy.py). */
class DataSpec extends SparkTestBase {
  import spark.implicits._

  test("fromMatrix names columns f0..fN and preserves values (S4)") {
    val rows = Seq(
      Array(1.0, 10.0, 100.0),
      Array(2.0, 20.0, 200.0),
      Array(3.0, 30.0, 300.0))
    val df = DataLoader.fromMatrix(spark, rows, Some(Seq(0.0, 1.0, 0.0)))
    assert(df.columns.toSeq === Seq("f0", "f1", "f2", "label"))
    val got = df.orderBy("f0").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq((1.0, 10.0, 100.0, 0.0),
      (2.0, 20.0, 200.0, 1.0), (3.0, 30.0, 300.0, 0.0)))
    // unlabeled variant
    val un = DataLoader.fromMatrix(spark, rows)
    assert(un.columns.toSeq === Seq("f0", "f1", "f2"))
    assert(un.count() === 3)
  }

  test("label-presence predicate: training without a label fails (P5)") {
    val df = Seq((1.0, 2.0), (3.0, 4.0)).toDF("a", "b")
    val noLabel = DMatrixSpec()
    assert(!noLabel.hasLabel)
    noLabel.validate(df, requireLabel = false) // prediction path: fine
    val e = intercept[IllegalArgumentException] {
      noLabel.validate(df, requireLabel = true)
    }
    assert(e.getMessage.contains("label"))
  }

  test("type-compat validation rejects non-numeric features (P6)") {
    val df = Seq((1.0, "oops", 0.0)).toDF("a", "s", "label")
    val e = intercept[IllegalArgumentException] {
      DMatrixSpec("label").validate(df, requireLabel = true)
    }
    assert(e.getMessage.contains("s"))
    // ignoring or excluding the string column passes
    DMatrixSpec(labelCol = Seq("label"), ignore = Seq("s"))
      .validate(df, requireLabel = true)
    DMatrixSpec(labelCol = Seq("label"), featureCols = Some(Seq("a")))
      .validate(df, requireLabel = true)
  }

  test("missing role columns are reported by name") {
    val df = Seq((1.0, 2.0)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      DMatrixSpec(labelCol = Seq("y"), weightCol = Some("w"))
        .validate(df, requireLabel = true)
    }
    assert(e.getMessage.contains("y") && e.getMessage.contains("w"))
  }
}
