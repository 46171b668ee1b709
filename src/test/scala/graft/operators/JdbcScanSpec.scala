package graft.operators

import graft.SparkFunSuite

/**
 * The JDBC scanner run against a REAL database: embedded Derby (ships
 * in Spark's jars), mirroring the reference's
 * `indexing/JdbcScannerImplFTITest.java` + `resources/testdb.sql`
 * (a table of docs read through JDBC, doc id = url/table/pk).
 */
class JdbcScanSpec extends SparkFunSuite {

  private lazy val url: String = {
    val dir = tmpDir("derbydb")
    val u = s"jdbc:derby:$dir/db;create=true"
    val conn = java.sql.DriverManager.getConnection(u)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE docs (pk INT PRIMARY KEY, title VARCHAR(64), body VARCHAR(512))")
      val ps = conn.prepareStatement("INSERT INTO docs VALUES (?, ?, ?)")
      (1 to 25).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"title $i")
        ps.setString(3, s"body text for document $i with words")
        ps.executeUpdate()
      }
    } finally conn.close()
    s"jdbc:derby:$dir/db"
  }

  test("scanJdbc reads rows and assigns reference-style url/table/pk ids") {
    val df = ScanOps.scanJdbc(spark, url, "docs", "PK")
    assert(df.count() == 25)
    val row = df.filter(org.apache.spark.sql.functions.col("PK") === 7)
      .select("id", "TITLE").collect().head
    assert(row.getString(0) == s"$url/docs/7") // JdbcScanner.java:177-180 scheme
    assert(row.getString(1) == "title 7")
  }

  test("pushdown: a predicate reaches the JDBC source") {
    val df = ScanOps.scanJdbc(spark, url, "docs", "PK")
      .filter(org.apache.spark.sql.functions.col("PK") > 20)
    assert(df.count() == 5)
    // the filter must appear as a pushed JDBC predicate, not a Spark-side one
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.toLowerCase.contains("isnotnull"))
  }
}
