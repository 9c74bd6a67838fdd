package graft

import org.apache.spark.sql.SparkSession

/** The library's custom expressions must be injectable the supported way —
  * `spark.sql.extensions` / `builder.withExtensions` — so SQL users get
  * `cosine_sim` & co. without calling into Scala. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions makes the vector expressions SQL-callable") {
    val base = spark // ensure the shared context exists first
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val row = s2.sql(
        """SELECT cosine_sim(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c,
          |       dot_product(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d,
          |       l2_dist(array(0.0f, 0.0f), array(3.0f, 4.0f)) AS l
          |""".stripMargin).head()
      assert(math.abs(row.getDouble(0) - 1.0) < 1e-9)
      assert(math.abs(row.getDouble(1) - 11.0) < 1e-9)
      assert(math.abs(row.getDouble(2) - 5.0) < 1e-9)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
