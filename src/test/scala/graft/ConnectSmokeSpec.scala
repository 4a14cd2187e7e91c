package graft

import org.apache.spark.sql.connect.service.SparkConnectService
import graft.queries.SqlSurfaceQueries

/** Out-of-process BI surface (SURVEY §3.3 stretch): the marts are
  * published as external parquet tables in the shared catalog, a Spark
  * Connect gRPC server is started on the same SparkContext, and a
  * Connect CLIENT session — the same `org.apache.spark.sql.connect`
  * client a BI tool or external process would embed — runs the
  * dialect-neutral biSql text verbatim over the wire (Arrow result
  * encoding) and must match the in-process answer row-for-row.
  *
  * Scale posture: this is exactly the deployment shape for the 100 TB
  * warehouse — marts land in the catalog once, N BI clients connect
  * over gRPC and never share JVM or session state with the engine
  * (the Connect session is isolated; only the catalog is shared).
  */
class ConnectSmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val biTables = Seq("orders", "customer", "nation", "region")

  test("Connect client runs the biSql text verbatim against published marts") {
    // Publish: external tables over the existing parquet — no data copy.
    for (t <- biTables) {
      spark.catalog.dropTempView(t) // temp views would shadow the catalog
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t USING parquet LOCATION '$sfDir/$t.parquet'")
    }
    SparkConnectService.start(spark.sparkContext)
    try {
      val port = SparkSpec.ConnectPort // static conf, set at context creation
      val client = org.apache.spark.sql.connect.SparkSession.builder()
        .remote(s"sc://localhost:$port")
        .create()
      try {
        // Catalog is shared across the gRPC boundary…
        val visible = client.sql("SHOW TABLES").collect().map(_.getString(1)).toSet
        for (t <- biTables) assert(visible.contains(t), s"client cannot see $t")
        // …and the BI query text needs no rewriting for the remote client.
        val remote = client.sql(SqlSurfaceQueries.biSql).collect()
          .map(_.toString).sorted.toSeq
        val local = spark.sql(SqlSurfaceQueries.biSql).collect()
          .map(_.toString).sorted.toSeq
        assert(remote.nonEmpty)
        assert(remote == local)
        // Client-side session state stays isolated: a client temp view
        // must not leak into the server session.
        client.sql("CREATE OR REPLACE TEMP VIEW client_only AS SELECT 1 AS x")
        assert(client.sql("SELECT * FROM client_only").collect().length == 1)
        assert(!spark.catalog.tableExists("client_only"))
      } finally client.close()
    } finally {
      SparkConnectService.stop(None, None)
      for (t <- biTables) spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }
}
