package graft.sink

import java.sql.{Connection, DriverManager, DriverPropertyInfo, SQLException}
import java.util.Properties
import java.util.logging.Logger
import graft.SparkSpec
import graft.config.JdbcConf

/** A JDBC driver that always fails to connect, counting attempts —
  * verifies the reference's retry ×3 contract (`pipeline.py:59-83`)
  * without a database in the sandbox.
  */
object FailingDriver extends java.sql.Driver {
  @volatile var attempts = 0
  private val prefix = "jdbc:graft-fail:"
  override def connect(url: String, info: Properties): Connection =
    if (!acceptsURL(url)) null
    else { attempts += 1; throw new SQLException("connection refused (test)") }
  override def acceptsURL(url: String): Boolean = url.startsWith(prefix)
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}

class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def rawDf(temp: Double) = Seq(
    ("s1", ts("2024-01-01 00:00:00"), temp, 40.0, 1000.0),
    ("s2", ts("2024-01-01 00:00:05"), temp + 1, 41.0, 1001.0))
    .toDF("sensor_id", "timestamp", "temperature", "humidity", "pressure")

  private def aggDf(mn: Double) = Seq(
    ("s1", ts("2024-01-01 00:00:00"), "temperature", mn, 25.0, 22.0, 1.1, 2L),
    ("s2", ts("2024-01-01 00:00:00"), "temperature", mn + 1, 26.0, 23.0, 1.2, 2L))
    .toDF("sensor_id", "aggregation_time", "metric_name", "min_value",
      "max_value", "avg_value", "std_dev_value", "record_count")

  private def query1[T](url: String, sql: String)(f: java.sql.ResultSet => T): T = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      rs.next(); f(rs)
    } finally conn.close()
  }

  test("the MySQL dialect is pinned reference-exact — the declared " +
    "substitute for a live soak (this sandbox ships no mysqld and no " +
    "MySQL JDBC driver; Derby proves the transactional path instead)") {
    // DDL shape of setup_database_in_mysql.py:58-71 (raw table)
    val raw = graft.sink.JdbcBootstrap.rawTableDdl
    assert(raw.contains("CREATE TABLE IF NOT EXISTS raw_sensor_data"))
    assert(raw.contains("id INT AUTO_INCREMENT PRIMARY KEY"))
    assert(raw.contains("timestamp DATETIME NOT NULL"))
    assert(raw.contains("processed_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP"))
    Seq("idx_sensor_id (sensor_id)", "idx_timestamp (timestamp)",
      "idx_file_name (file_name)").foreach(ix =>
      assert(raw.contains(s"INDEX $ix"), s"missing secondary index $ix"))
    // DDL shape of setup_database_in_mysql.py:81-97 (aggregate table)
    val agg = graft.sink.JdbcBootstrap.aggTableDdl
    assert(agg.contains("CREATE TABLE IF NOT EXISTS aggregated_sensor_data"))
    assert(agg.contains("metric_name VARCHAR(50)"))
    assert(agg.contains("ON UPDATE CURRENT_TIMESTAMP"))
    assert(agg.contains(
      "UNIQUE KEY uq_agg (sensor_id, file_name, metric_name, aggregation_time)"))
    // upsert shape of pipeline.py:236-244: native MySQL
    // INSERT ... ON DUPLICATE KEY UPDATE with VALUES() refresh
    val mysqlSink = new graft.sink.JdbcSink(
      graft.config.JdbcConf("jdbc:mysql://unreachable/x", "", ""))
    val up = mysqlSink.upsertSql
    assert(up.contains("INSERT INTO aggregated_sensor_data"))
    assert(up.contains("ON DUPLICATE KEY UPDATE"))
    Seq("min_value", "max_value", "avg_value", "std_dev_value",
      "record_count").foreach(c =>
      assert(up.contains(s"$c=VALUES($c)"), s"missing VALUES refresh for $c"))
    assert(up.contains("processed_at=NOW()"))
    // raw insert column order matches the reference executemany
    assert(mysqlSink.rawSql.replaceAll("\\s+", " ").contains(
      "(sensor_id, timestamp, temperature, humidity, pressure, file_name)"))
  }

  test("the WHOLE transactional path runs against a real embedded " +
    "Derby database: bootstrap, write, idempotent replay, upsert, " +
    "second file") {
    val url = s"jdbc:derby:memory:graft_it_${System.nanoTime()};create=true"
    val conf = JdbcConf(url, "", "", retries = 1, retryDelaySec = 0)
    JdbcBootstrap.run(conf)
    JdbcBootstrap.run(conf) // idempotent (X0Y32 swallowed)
    val sink = new JdbcSink(conf)

    assert(sink.write("a.csv", rawDf(20.0), aggDf(18.0)))
    assert(query1(url, "SELECT COUNT(*) FROM raw_sensor_data")(_.getLong(1)) === 2L)
    assert(query1(url,
      "SELECT min_value FROM aggregated_sensor_data WHERE sensor_id='s1'")(
      _.getDouble(1)) === 18.0)

    // replay the SAME file with new values: raw rows replaced
    // (delete-by-file), aggregates UPDATED in place — no duplicates
    assert(sink.write("a.csv", rawDf(30.0), aggDf(28.0)))
    assert(query1(url, "SELECT COUNT(*) FROM raw_sensor_data")(_.getLong(1)) === 2L)
    assert(query1(url, "SELECT COUNT(*) FROM aggregated_sensor_data")(_.getLong(1)) === 2L)
    assert(query1(url,
      "SELECT min_value FROM aggregated_sensor_data WHERE sensor_id='s1'")(
      _.getDouble(1)) === 28.0)
    assert(query1(url,
      "SELECT MAX(temperature) FROM raw_sensor_data")(_.getDouble(1)) === 31.0)

    // a different file appends alongside
    assert(sink.write("b.csv", rawDf(10.0), aggDf(8.0)))
    assert(query1(url, "SELECT COUNT(*) FROM raw_sensor_data")(_.getLong(1)) === 4L)
    assert(query1(url, "SELECT COUNT(*) FROM aggregated_sensor_data")(_.getLong(1)) === 4L)
  }

  test("a mid-transaction violation rolls the WHOLE file back on " +
    "real Derby — raw rows from the failed attempt do not survive") {
    val url = s"jdbc:derby:memory:graft_rb_${System.nanoTime()};create=true"
    val conf = JdbcConf(url, "", "", retries = 1, retryDelaySec = 0)
    JdbcBootstrap.run(conf)
    val sink = new JdbcSink(conf)
    assert(sink.write("a.csv", rawDf(20.0), aggDf(18.0)))
    // null metric_name violates the NOT NULL constraint AFTER the raw
    // insert batch has executed — the rollback must erase it
    val badAgg = Seq(
      ("s1", ts("2024-01-01 00:00:00"), null.asInstanceOf[String],
        1.0, 2.0, 1.5, 0.1, 1L))
      .toDF("sensor_id", "aggregation_time", "metric_name", "min_value",
        "max_value", "avg_value", "std_dev_value", "record_count")
    assert(!sink.write("c.csv", rawDf(99.0), badAgg))
    assert(query1(url,
      "SELECT COUNT(*) FROM raw_sensor_data WHERE file_name='c.csv'")(
      _.getLong(1)) === 0L)
    // the earlier committed file is untouched
    assert(query1(url, "SELECT COUNT(*) FROM raw_sensor_data")(_.getLong(1)) === 2L)
  }

  test("connect failure retries 3 times with backoff, then gives up (T5 parity)") {
    DriverManager.registerDriver(FailingDriver)
    try {
      FailingDriver.attempts = 0
      val sink = new JdbcSink(JdbcConf(
        "jdbc:graft-fail://nowhere", "u", "p",
        retries = 3, retryDelaySec = 0)) // 0 s backoff: tests don't sleep
      val df = spark.range(1).toDF("x")
      // write returns false (file retained for retry) without touching
      // the frames; exactly `retries` connection attempts were made.
      assert(!sink.write("f.csv", df, df))
      assert(FailingDriver.attempts === 3)
    } finally DriverManager.deregisterDriver(FailingDriver)
  }
}
