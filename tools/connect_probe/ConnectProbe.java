import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.connect.SparkSession;

/**
 * Real-Spark-Connect validation probe (VERDICT r6 #3).
 *
 * The container has no grpcio, so the PYTHON Connect client cannot
 * exist here -- but pyspark 4.1.2 ships both the server
 * (spark-connect_2.13) and the shaded JVM client
 * (spark-connect-client-jvm_2.13). This probe drives a live
 * sc://localhost Connect server through the real client and checks
 * the exact server capabilities functime_spark's Connect seams bet
 * on:
 *
 *  1. basic relation RPCs (range/count, parquet scan, SQL window +
 *     aggregate -- the shapes every functime_spark operator compiles
 *     to);
 *  2. the DataFrame.localCheckpoint RPC -- materialize()'s PRIMARY
 *     path: a Spark 4.x Connect server accepts CheckpointCommand, so
 *     the checkpoint-to-table fallback is only needed for older
 *     servers;
 *  3. session-conf set/get over Connect (the nanos-ingestion conf the
 *     sources layer sets).
 *
 * Run: tools/connect_probe/run.sh (starts a server, compiles, runs,
 * stops). Transcript recorded in SCALE.md.
 */
public class ConnectProbe {
    public static void main(String[] args) throws Exception {
        String remote = args.length > 0 ? args[0] : "sc://localhost:15999";
        String sf = args.length > 1 ? args[1] : "/root/testdata/sf0.001";
        SparkSession spark =
            SparkSession.builder().remote(remote).getOrCreate();
        System.out.println("CONNECTED server_version=" + spark.version());

        // 1a. basic RPC
        long n = spark.range(1000).count();
        System.out.println("range_count=" + n);

        // 1b. parquet scan + SQL window/aggregate (operator shapes)
        Dataset<Row> docs = spark.read().parquet(sf + "/documents.parquet");
        docs.createOrReplaceTempView("documents");
        Row dedup = spark.sql(
            "SELECT COUNT(*) AS total, COUNT(DISTINCT md5(text)) AS uniq "
            + "FROM documents").head();
        System.out.println(
            "exact_dedup_shape total=" + dedup.getLong(0)
            + " uniq=" + dedup.getLong(1));
        Row win = spark.sql(
            "SELECT MAX(cs) AS mx FROM (SELECT SUM(o_totalprice) OVER ("
            + "PARTITION BY o_custkey ORDER BY o_orderdate) AS cs FROM "
            + "parquet.`" + sf + "/orders.parquet`)").head();
        System.out.println("window_cumsum_max=" + win.get(0));

        // 2. the localCheckpoint RPC materialize() prefers
        Dataset<Row> lc = docs.select("doc_id").localCheckpoint(true);
        System.out.println("localCheckpoint_count=" + lc.count()
            + " (CheckpointCommand RPC accepted: materialize() primary "
            + "path works on this server; parquet fallback not needed)");

        // 3. session conf round-trip over Connect
        spark.conf().set("spark.sql.legacy.parquet.nanosAsLong", "true");
        System.out.println("conf_roundtrip="
            + spark.conf().get("spark.sql.legacy.parquet.nanosAsLong"));
        spark.stop();
        System.out.println("PROBE_OK");
    }
}
