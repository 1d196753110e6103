package graft.catalog

import java.sql.DriverManager

import graft.SparkSpec

/** Exercises [[ParquetCatalog.importJdbc]] against an embedded in-memory
  * Derby database (ships with Spark's jars) — a real JDBC round-trip:
  * DDL + inserts over java.sql, then a Spark JDBC scan into the parquet
  * catalog, both the serial and the partitioned-by-range form.
  */
class JdbcImportSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def withDb[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c)
    finally c.close()
  }

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("jdbc_cat").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def seed(table: String, rows: Int): Unit = withDb { c =>
    val st = c.createStatement()
    try st.execute(s"DROP TABLE $table")
    catch { case _: java.sql.SQLException => () } // first run: no table
    st.execute(s"CREATE TABLE $table (id BIGINT NOT NULL, val DOUBLE, tag VARCHAR(16))")
    val ps = c.prepareStatement(s"INSERT INTO $table VALUES (?, ?, ?)")
    (1 to rows).foreach { i =>
      ps.setLong(1, i.toLong)
      ps.setDouble(2, i * 0.5)
      ps.setString(3, s"t${i % 3}")
      ps.addBatch()
    }
    ps.executeBatch()
    st.close(); ps.close()
  }

  test("serial import lands all rows with the declared schema") {
    seed("items", 57)
    val cat = new ParquetCatalog(spark, freshRoot())
    cat.importJdbc("items", url, "items")
    val got = cat.load("items")
    assert(got.count() == 57)
    assert(got.columns.map(_.toLowerCase).sorted.toSeq == Seq("id", "tag", "val"))
    val s = got.selectExpr("sum(id)").collect().head.getLong(0)
    assert(s == 57L * 58 / 2)
  }

  test("partitioned import: auto-discovered bounds, range slices union to the table") {
    seed("facts", 200)
    val cat = new ParquetCatalog(spark, freshRoot())
    cat.importJdbc("facts", url, "facts",
      partitionColumn = Some("id"), numPartitions = 4)
    val got = cat.load("facts")
    assert(got.count() == 200)
    // every id exactly once: range predicates must partition, not overlap
    assert(got.select("id").distinct().count() == 200)
    // the parquet copy was written from a 4-slice scan
    assert(got.rdd.getNumPartitions >= 1)
  }

  test("partitioned import with explicit bounds matches serial content") {
    seed("facts2", 91)
    val cat = new ParquetCatalog(spark, freshRoot())
    cat.importJdbc("serial", url, "facts2")
    cat.importJdbc("sliced", url, "facts2",
      partitionColumn = Some("id"), bounds = Some((1L, 91L)), numPartitions = 3)
    val a = cat.load("serial").orderBy("id").collect().toSeq
    val b = cat.load("sliced").orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("empty table with auto bounds fails fast with a clear message") {
    seed("nothing", 0)
    val cat = new ParquetCatalog(spark, freshRoot())
    val e = intercept[IllegalArgumentException] {
      cat.importJdbc("nothing", url, "nothing", partitionColumn = Some("id"))
    }
    assert(e.getMessage.contains("bounds"))
  }
}
