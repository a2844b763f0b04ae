package graft

import graft.sources.JdbcSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The JDBC import contract EXECUTED against a real (embedded Derby)
  * database — not just SQL text generation: Spark's JDBC writer bulk-stages
  * each batch, then the ANSI import statements run in one transaction, and
  * replay / partial-overlap / streaming-delivery are all asserted
  * exactly-once by key (reference: Persistence/ImportProcedure.cs:22,
  * StagingTables.cs — dup-tolerant staging + "insert only rows not already
  * present" inside a transaction).
  */
class JdbcSinkSpec extends SparkSpec {

  private def freshDb(name: String): String = {
    val url = s"jdbc:derby:memory:$name;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    // pre-created with VARCHAR keys (migrations own the DDL, as in the
    // reference): Spark's DerbyDialect would map StringType to CLOB, which
    // Derby refuses to compare in the NOT EXISTS — append mode into an
    // existing table keeps the migration's types
    st.executeUpdate(
      "CREATE TABLE tx_staging (hash VARCHAR(66), block_number BIGINT, value_str VARCHAR(40))")
    st.executeUpdate(
      "CREATE TABLE transaction_2 (hash VARCHAR(66) PRIMARY KEY, block_number BIGINT, value_str VARCHAR(40))")
    st.close(); conn.close()
    url
  }

  private def query1(url: String, sql: String): Long = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      rs.next(); rs.getLong(1)
    } finally conn.close()
  }

  test("batch upsert into Derby: replay and partial overlap are exactly-once") {
    import spark.implicits._
    val url = freshDb("graftBatch")
    val b1 = Seq(("0xa", 1L, "10"), ("0xb", 1L, "20"), ("0xc", 2L, "30"))
      .toDF("hash", "block_number", "value_str")
    JdbcSink.upsertBatch(b1, url, "tx_staging", "transaction_2", "hash")
    assert(query1(url, "SELECT COUNT(*) FROM transaction_2") == 3L)
    assert(query1(url, "SELECT COUNT(*) FROM tx_staging") == 0L,
      "imported staging rows must be cleared")

    // full replay of the same batch: a no-op (no PK violation, no growth)
    JdbcSink.upsertBatch(b1, url, "tx_staging", "transaction_2", "hash")
    assert(query1(url, "SELECT COUNT(*) FROM transaction_2") == 3L)

    // partial overlap (at-least-once delivery): only the new key lands
    val b2 = Seq(("0xa", 1L, "10"), ("0xd", 2L, "40"))
      .toDF("hash", "block_number", "value_str")
    JdbcSink.upsertBatch(b2, url, "tx_staging", "transaction_2", "hash")
    assert(query1(url, "SELECT COUNT(*) FROM transaction_2") == 4L)
    assert(query1(url,
      "SELECT COUNT(*) FROM transaction_2 WHERE hash = '0xd' AND block_number = 2") == 1L)
    assert(query1(url, "SELECT COUNT(*) FROM tx_staging") == 0L)

    // duplicate-tolerant staging: the SAME row staged twice in one batch
    // imports once (full-row DISTINCT — the DISTINCT ON analogue)
    val b3 = Seq(("0xe", 3L, "50"), ("0xe", 3L, "50"))
      .toDF("hash", "block_number", "value_str")
    JdbcSink.upsertBatch(b3, url, "tx_staging", "transaction_2", "hash")
    assert(query1(url, "SELECT COUNT(*) FROM transaction_2") == 5L)
  }

  test("a failed import rolls back and leaves staging intact for the replay") {
    import spark.implicits._
    val url = freshDb("graftRollback")
    JdbcSink.writeStaging(
      Seq(("0xa", 1L, "10")).toDF("hash", "block_number", "value_str"),
      url, "tx_staging")
    // bad target column list -> the transaction must roll back
    intercept[java.sql.SQLException] {
      JdbcSink.importFromStaging(url, "tx_staging", "transaction_2", "hash",
        Seq("hash", "no_such_col", "value_str"))
    }
    assert(query1(url, "SELECT COUNT(*) FROM tx_staging") == 1L,
      "rollback must keep the staged batch for the replay")
    assert(query1(url, "SELECT COUNT(*) FROM transaction_2") == 0L)
  }

  test("streaming foreachBatch delivery into Derby is exactly-once by key") {
    import spark.implicits._
    val url = freshDb("graftStream")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, String)]
    val q = mem.toDF().toDF("hash", "block_number", "value_str")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        JdbcSink.upsertBatch(batch, url, "tx_staging", "transaction_2", "hash")
      }
      .start()
    try {
      mem.addData(("0xa", 1L, "10"), ("0xb", 1L, "20"))
      q.processAllAvailable()
      // the source re-delivers 0xb (at-least-once) alongside a new key
      mem.addData(("0xb", 1L, "20"), ("0xc", 2L, "30"))
      q.processAllAvailable()
    } finally q.stop()
    assert(query1(url, "SELECT COUNT(*) FROM transaction_2") == 3L)
    assert(query1(url, "SELECT COUNT(*) FROM tx_staging") == 0L)
  }
}
