package graft

import org.apache.spark.sql.functions._

/** [[graft.ops.Upsert.jdbcUpsert]] driven END TO END against embedded
  * Derby (already on the Spark classpath) via the `generic` dialect — the
  * reference's Postgres `ON CONFLICT DO UPDATE` load step
  * (etl/load.py:21-58) re-expressed as a JDBC sink and actually
  * executed in-sandbox, unlike the opt-in HTTP/Kafka lanes. The
  * `postgres` dialect shares every line except the final SQL string,
  * which is asserted textually here and exercised live by a deployment
  * with the driver jar.
  */
class JdbcUpsertSpec extends SparkTestBase {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def withConn[T](f: java.sql.Connection => T): T = {
    val c = java.sql.DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  test("jdbcUpsert(generic): insert-new + update-existing, only " +
      "updateCols move, preserved column keeps the first write") {
    import spark.implicits._
    withConn { c =>
      val st = c.createStatement()
      try st.execute("DROP TABLE obs") catch { case _: Throwable => () }
      st.execute("""CREATE TABLE obs (
        "lat" DOUBLE NOT NULL, "lon" DOUBLE NOT NULL,
        "temperature" DOUBLE, "note" VARCHAR(32),
        PRIMARY KEY ("lat", "lon"))""")
      st.close()
    }
    val first = Seq((1.0, 2.0, 10.5, "v1"), (3.0, 4.0, 20.0, "v1"))
      .toDF("lat", "lon", "temperature", "note")
    graft.ops.Upsert.jdbcUpsert(first, url, "obs",
      keys = Seq("lat", "lon"), updateCols = Seq("temperature"),
      dialect = "generic")
    // conflicting refetch for (1,2) + one brand-new key: temperature
    // updates, note (not in updateCols) keeps the first write
    val second = Seq((1.0, 2.0, 11.5, "v2"), (5.0, 6.0, 30.0, "v2"))
      .toDF("lat", "lon", "temperature", "note")
    graft.ops.Upsert.jdbcUpsert(second, url, "obs",
      keys = Seq("lat", "lon"), updateCols = Seq("temperature"),
      dialect = "generic")
    val got = withConn { c =>
      val rs = c.createStatement().executeQuery(
        """SELECT "lat", "lon", "temperature", "note" FROM obs ORDER BY "lat"""")
      val b = Seq.newBuilder[(Double, Double, Double, String)]
      while (rs.next())
        b += ((rs.getDouble(1), rs.getDouble(2), rs.getDouble(3),
          rs.getString(4)))
      b.result()
    }
    assert(got == Seq(
      (1.0, 2.0, 11.5, "v1"), // temperature moved, note preserved
      (3.0, 4.0, 20.0, "v1"), // untouched by batch 2
      (5.0, 6.0, 30.0, "v2"))) // fresh insert
    // idempotence under task retry: replaying batch 2 changes nothing
    graft.ops.Upsert.jdbcUpsert(second, url, "obs",
      keys = Seq("lat", "lon"), updateCols = Seq("temperature"),
      dialect = "generic")
    val n = withConn { c =>
      val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM obs")
      rs.next(); rs.getLong(1)
    }
    assert(n == 3L)
  }

  test("postgres dialect emits the reference's exact ON CONFLICT shape " +
      "(etl/load.py:21-58); unknown dialect rejected") {
    import spark.implicits._
    val df = Seq((1.0, 2.0, 10.5)).toDF("lat", "lon", "temperature")
    // the postgres SQL can't run in-sandbox (no server); assert the
    // exact statement the sink would send — etl/load.py:21-58's shape
    assert(graft.ops.Upsert.upsertSqlFor("postgres", "observations",
      Seq("lat", "lon", "temperature", "note"), Seq("lat", "lon"),
      Seq("temperature")) ==
      """INSERT INTO observations ("lat", "lon", "temperature", "note") """ +
      """VALUES (?, ?, ?, ?) ON CONFLICT ("lat", "lon") DO UPDATE """ +
      """SET "temperature" = EXCLUDED."temperature"""")
    // an unknown dialect throws BEFORE any connection attempt
    val e = intercept[IllegalArgumentException] {
      graft.ops.Upsert.jdbcUpsert(df, url, "obs",
        keys = Seq("lat", "lon"), updateCols = Seq("temperature"),
        dialect = "oracle12")
    }
    assert(e.getMessage.contains("unknown dialect"))
    // guards fire before any JDBC work
    intercept[IllegalArgumentException] {
      graft.ops.Upsert.jdbcUpsert(df, url, "obs", keys = Nil,
        updateCols = Seq("temperature"))
    }
    intercept[IllegalArgumentException] {
      graft.ops.Upsert.jdbcUpsert(df, url, "obs", keys = Seq("lat", "lon"),
        updateCols = Seq("nope"))
    }
  }
}
