package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Q, Tables}
import graft.core.Determinism._
import graft.core.{OracleDsl => O}

/** SURVEY.md §2.1 — scans / sources / sinks.
  *
  * Reference evidence: "extract raw data from multiple sources"
  * (/root/reference/README.md:10), "partitioning data" (README.md:8).
  *
  * 100 TB notes: every read here goes through Spark's vectorized parquet
  * reader with an explicit schema; filters and projections are pushed to
  * the scan (check `PushedFilters` in .explain). `sink_partitioned`
  * demonstrates the partition-pruning contract: a `partitionBy(date)`
  * layout turns a date-filtered read into a directory prune — at 100 TB
  * this is the difference between reading one day and a full scan.
  */
object Scans {

  private def fix(sfDir: String, name: String): String =
    graft.core.Fixtures.path(sfDir, name)

  /** Parquet scan with explicit schema + projected/filtered read. */
  def scanParquet(spark: SparkSession, dir: String): DataFrame =
    ordered(
      Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .filter(col("l_quantity") > 45))

  private val scanParquetSql =
    s"""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
       |WHERE l_quantity > 45
       |${O.OrderAll}"""

  /** CSV ingest round-trip: write customer as CSV (header), read back
    * with an explicit schema in PERMISSIVE mode. Oracle checks the
    * round-trip is lossless against the original table. */
  def scanCsv(spark: SparkSession, dir: String): DataFrame = {
    val path = fix(dir, "scan_csv")
    Tables.load(spark, dir, "customer")
      .write.mode("overwrite").option("header", "true").csv(path)
    ordered(
      spark.read.schema(Tables.customer)
        .option("header", "true").option("mode", "PERMISSIVE")
        .csv(path))
  }

  private val scanCsvSql = s"SELECT * FROM customer ${O.OrderAll}"

  /** JSON-lines ingest: write an events extract as JSONL, read back with
    * schema, parse the embedded JSON payload column. */
  def scanJson(spark: SparkSession, dir: String): DataFrame = {
    val path = fix(dir, "scan_json")
    Tables.load(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").json(path)
    val schema = "event_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    ordered(
      spark.read.schema(schema).json(path)
        .withColumn("k",
          get_json_object(col("props"), "$.k").cast("int"))
        .drop("props"))
  }

  // Oracle avoids DuckDB's json extension (may be unavailable offline):
  // the payload shape is {"k": <int>} so a regexp extract is equivalent.
  private val scanJsonSql =
    s"""SELECT event_id, event_type, value,
       |  CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INTEGER) AS k
       |FROM events
       |${O.OrderAll}"""

  /** Partitioned parquet sink + pruned read-back: write lineitem
    * partitioned by ship year, read back exactly one partition (the scan
    * lists a single directory — partition pruning), aggregate it. */
  def sinkPartitioned(spark: SparkSession, dir: String): DataFrame = {
    val path = fix(dir, "sink_partitioned")
    // parallelism floor on the parquet ENCODE (r15): the lineitem scan
    // is 3 splits at bench SF, so the partitioned write's encode ran on
    // 3 of 32 cores (JobProf: 1.4 s CPU on 3 tasks = ~80% of the key).
    // Keyed spread, no-op at scale where the scan already splits ≥
    // cores — there file sizing is governed by the ~128 MB scan splits.
    graft.core.Spread.cpuBound(spark,
        Tables.load(spark, dir, "lineitem"), col("l_orderkey"))
      .withColumn("ship_year", year(col("l_shipdate")))
      .write.mode("overwrite").partitionBy("ship_year").parquet(path)
    ordered(
      spark.read.parquet(path)
        .filter(col("ship_year") === 1998)
        .agg(
          count(lit(1)).as("n"),
          dsum(col("l_extendedprice")).as("total_price")))
  }

  private val sinkPartitionedSql =
    s"""SELECT COUNT(*) AS n, ${O.dsum("l_extendedprice")} AS total_price
       |FROM lineitem WHERE year(l_shipdate) = 1998
       |${O.OrderAll}"""

  /** XML round-trip through Spark 4's built-in XML data source (the
    * spark-xml connector was folded into core in 4.0): customer is
    * written as `<customer>` row elements and read back with an
    * EXPLICIT schema (inference on XML is a full extra pass AND can
    * widen types — never at 100 TB), then aggregated per segment. The
    * oracle computes the same aggregates from the source parquet, so a
    * green row proves the round-trip lossless for long/int/double/
    * string — doubles survive because the writer emits
    * `Double.toString`'s shortest-exact form and the reader's
    * `Double.parseDouble` is its exact inverse.
    *
    * 100 TB: XML is an ingest-edge format, not a storage format — one
    * streaming StaxXmlParser pass per file split, then immediately
    * land as parquet/orc. The aggregate here runs map-side partial →
    * 5-group final, so the exchange is negligible; the real cost is
    * the (unavoidable) text parse, which is why the round-trip demo
    * writes the SMALL dimension, not lineitem. */
  def scanXml(spark: SparkSession, dir: String): DataFrame = {
    val path = fix(dir, "scan_xml")
    Tables.load(spark, dir, "customer")
      .write.mode("overwrite").format("xml").option("rowTag", "customer")
      .save(path)
    ordered(
      spark.read.format("xml").option("rowTag", "customer")
        .schema(Tables.customer).load(path)
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("c_acctbal")).as("sum_bal"),
          sum(col("c_custkey")).as("key_sum"),
          min(col("c_name")).as("first_name"),
          max(col("c_name")).as("last_name")))
  }

  private val scanXmlSql =
    s"""SELECT c_mktsegment, COUNT(*) AS n,
       |  ${O.dsum("c_acctbal")} AS sum_bal,
       |  CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
       |  MIN(c_name) AS first_name,
       |  MAX(c_name) AS last_name
       |FROM customer
       |GROUP BY c_mktsegment
       |${O.OrderAll}"""

  /** ORC round-trip: the second columnar format Spark ships natively
    * (vectorized reader, predicate pushdown — same contract as
    * parquet). Oracle checks losslessness against the source table. */
  def scanOrc(spark: SparkSession, dir: String): DataFrame = {
    val path = fix(dir, "scan_orc")
    Tables.load(spark, dir, "nation").write.mode("overwrite").orc(path)
    ordered(spark.read.schema(Tables.nation).orc(path))
  }

  private val scanOrcSql = s"SELECT * FROM nation ${O.OrderAll}"

  /** Codec-controlled sink: zstd parquet (the 100 TB default — ~30%
    * smaller than snappy at similar scan speed) round-tripped and
    * aggregated; oracle computes the same aggregate from the source. */
  def sinkZstd(spark: SparkSession, dir: String): DataFrame = {
    val path = fix(dir, "sink_zstd")
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .write.mode("overwrite").option("compression", "zstd").parquet(path)
    ordered(
      spark.read.schema(Tables.lineitem).parquet(path)
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty")))
  }

  private val sinkZstdSql =
    s"""SELECT l_linestatus, COUNT(*) AS n, ${O.dsum("l_quantity")} AS sum_qty
       |FROM lineitem WHERE l_returnflag = 'R'
       |GROUP BY l_linestatus
       |${O.OrderAll}"""

  /** Real JDBC round-trip through embedded Derby (on Spark's own
    * classpath — it ships for the Hive metastore): supplier is written
    * through [[graft.sinks.JdbcSink]] (batched inserts, capped
    * connection parallelism) and read back through
    * [[graft.sources.JdbcSource]] as a PARTITIONED read — 4 concurrent
    * range queries on s_suppkey, the shape that keeps a 100 TB RDBMS
    * extract from funneling through one connection. Oracle aggregates
    * the same parquet table directly: the round-trip must be lossless.
    *
    * Derby is single-JVM, so this proves the JDBC plumbing, not RDBMS
    * scale; against SQL Server only the url/driver options change. */
  def scanJdbc(spark: SparkSession, dir: String): DataFrame = {
    // Derby writes derby.log to the CWD unless told otherwise; keep it
    // with the db files (read at first engine boot in this JVM).
    System.setProperty("derby.stream.error.file",
      s"${fix(dir, "derby_db")}.log")
    val url = s"jdbc:derby:${fix(dir, "derby_db")};create=true"
    val supplier = Tables.load(spark, dir, "supplier")
    new graft.sinks.JdbcSink(url, "graft", "graft", numPartitions = 2)
      .write(supplier, "graft_supplier", org.apache.spark.sql.SaveMode.Overwrite)
    val bounds = supplier
      .agg(min(col("s_suppkey")), max(col("s_suppkey"))).head()
    val back = new graft.sources.JdbcSource(url, "graft", "graft")
      .readPartitioned(spark, "graft_supplier", "s_suppkey",
        bounds.getLong(0), bounds.getLong(1), numPartitions = 4)
    ordered(
      back.groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_suppliers"),
          dsum(col("s_acctbal")).as("total_bal")))
  }

  private val scanJdbcSql =
    s"""SELECT s_nationkey, COUNT(*) AS n_suppliers,
       |  ${O.dsum("s_acctbal")} AS total_bal
       |FROM supplier GROUP BY s_nationkey
       |${O.OrderAll}"""

  /** Text-line source round-trip: the rawest ingest format (one string
    * per line — log shipping, wet-crawl dumps). Write a delimited
    * extract of documents via the text sink, read it back with
    * `spark.read.text`, and re-parse the columns — schema-on-read done
    * manually, which is exactly what the text format means. The U+0001
    * field separator cannot collide with the single-line
    * space-separated corpus text. Oracle checks losslessness against
    * the source table. */
  def scanText(spark: SparkSession, dir: String): DataFrame = {
    val path = fix(dir, "scan_text")
    Tables.load(spark, dir, "documents")
      .select(concat_ws("\u0001",
        col("doc_id"), col("lang"), col("n_chars")).as("value"))
      .write.mode("overwrite").text(path)
    val parts = split(col("value"), "\u0001")
    ordered(
      spark.read.text(path).select(
        element_at(parts, 1).cast("long").as("doc_id"),
        element_at(parts, 2).as("lang"),
        element_at(parts, 3).cast("long").as("n_chars")))
  }

  private val scanTextSql =
    s"SELECT doc_id, lang, n_chars FROM documents ${O.OrderAll}"

  /** Z-order clustered sink: lineitem rewritten sorted by the
    * bit-interleaved (l_partkey, l_suppkey) Morton code, so rows close
    * in BOTH key dimensions land in the same files and every file's
    * per-column min/max stats cover a narrow range of BOTH keys — a
    * plain sort clusters only its leading column. At 100 TB this is
    * what makes 2-D selective reads skip most row groups (Delta/Iceberg
    * OPTIMIZE ZORDER — same public technique, here from first
    * principles as a pure column expression + range repartition).
    * IngestSpec proves the layout property from the files' actual
    * min/max spreads; the oracle checks the rewrite is lossless by
    * aggregating a 2-D-filtered read-back. */
  def sinkZorder(spark: SparkSession, dir: String): DataFrame = {
    val path = fix(dir, "sink_zorder")
    val li = Tables.load(spark, dir, "lineitem")
    // Normalize each key to an equal-width 16-bit space before
    // interleaving — RAW interleave lets the higher-cardinality column
    // monopolize the significant z bits and the other column never
    // clusters (observed: suppkey spread == global at small sf). This
    // is why Delta's ZORDER interleaves per-column RANGE IDS, not raw
    // values. One driver-side min/max row (at scale: free from table
    // stats), same justified pattern as scan_jdbc's partition bounds.
    val b = li.agg(
      min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_suppkey")), max(col("l_suppkey"))).head()
    // Explicit long cast: Column `/` is Divide → DOUBLE, and feeding a
    // double into shiftright/bitwiseAND would lean on Spark's implicit
    // truncating cast inside bit ops — correct today for these
    // non-negative values, but the integer intent belongs in the plan.
    def norm(c: String, lo: Long, hi: Long) =
      ((col(c) - lo) * 65535L / math.max(1L, hi - lo)).cast("long")
    val pkN = norm("l_partkey", b.getLong(0), b.getLong(1))
    val skN = norm("l_suppkey", b.getLong(2), b.getLong(3))
    // 16-bit × 2 Morton interleave: bit i of pkN → z bit 2i, bit i of
    // skN → z bit 2i+1. Pure codegen'd long arithmetic.
    val z = (0 until 16).map { i =>
      shiftleft(shiftright(pkN, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(skN, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
    li
      .withColumn("_z", z)
      .repartitionByRange(8, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
    ordered(
      spark.read.schema(Tables.lineitem).parquet(path)
        .filter(col("l_partkey").between(100, 300) &&
          col("l_suppkey").between(10, 40))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price")))
  }

  private val sinkZorderSql =
    s"""SELECT l_returnflag, COUNT(*) AS n,
       |  ${O.dsum("l_extendedprice")} AS sum_price
       |FROM lineitem
       |WHERE l_partkey BETWEEN 100 AND 300 AND l_suppkey BETWEEN 10 AND 40
       |GROUP BY l_returnflag
       |${O.OrderAll}"""

  /** Keyed idempotent JDBC upsert — the reference's actual production
    * load semantics (README.md:10 "load it into SQL Server"): the
    * target table is seeded with supplier, then a delta batch (every
    * 10th supplier re-priced +1000, plus the same slice re-keyed past
    * max(s_suppkey) as brand-new rows) is MERGEd in TWICE through
    * [[graft.sinks.JdbcSink.upsert]] (stage table + one server-side
    * transactional MERGE). The double application is the point: the
    * read-back aggregate equals the single-application state, proving
    * the load is idempotent — re-running a failed batch can't double
    * balances the way plain append would. The oracle computes the same
    * merged state (base minus updated keys, plus updates, plus
    * inserts) straight from parquet. */
  def sinkJdbcUpsert(spark: SparkSession, dir: String): DataFrame = {
    System.setProperty("derby.stream.error.file",
      s"${fix(dir, "derby_db")}.log")
    val url = s"jdbc:derby:${fix(dir, "derby_db")};create=true"
    val supplier = Tables.load(spark, dir, "supplier")
    val sink = new graft.sinks.JdbcSink(url, "graft", "graft", numPartitions = 2)
    sink.write(supplier, "graft_supplier_ups",
      org.apache.spark.sql.SaveMode.Overwrite)
    // + maxKey + 1: keys start at 0, so a bare +maxKey shift would remap
    // source key 0 onto existing key maxKey and the "insert" would
    // silently match-and-update it (found by the oracle count mismatch
    // — the idempotence gate doing its job on the fixture itself).
    val maxKey = supplier.agg(max(col("s_suppkey"))).head().getLong(0)
    val slice = supplier.filter(col("s_suppkey") % 10 === 0)
    val delta = slice.withColumn("s_acctbal", col("s_acctbal") + 1000.0)
      .unionByName(
        slice.withColumn("s_suppkey", col("s_suppkey") + maxKey + 1L))
    sink.upsert(delta, "graft_supplier_ups", Seq("s_suppkey"))
    sink.upsert(delta, "graft_supplier_ups", Seq("s_suppkey"))
    val back = new graft.sources.JdbcSource(url, "graft", "graft")
      .read(spark, "graft_supplier_ups")
    ordered(
      back.groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_suppliers"),
          dsum(col("s_acctbal")).as("total_bal")))
  }

  private val sinkJdbcUpsertSql =
    s"""WITH merged AS (
       |  SELECT s_nationkey, s_acctbal FROM supplier WHERE s_suppkey % 10 <> 0
       |  UNION ALL
       |  SELECT s_nationkey, s_acctbal + 1000.0 FROM supplier
       |  WHERE s_suppkey % 10 = 0
       |  UNION ALL
       |  SELECT s_nationkey, s_acctbal FROM supplier WHERE s_suppkey % 10 = 0)
       |SELECT s_nationkey, COUNT(*) AS n_suppliers,
       |  ${O.dsum("s_acctbal")} AS total_bal
       |FROM merged GROUP BY s_nationkey
       |${O.OrderAll}"""

  /** `binaryFile` source — how multimodal payloads (images, audio,
    * model shards) actually land in Spark: one row per FILE with
    * (path, length, content bytes), feeding the §2.11 binary-column
    * pipeline. The fixture is one text blob per language (rows in
    * doc_id order, so file bytes are deterministic); the read-back
    * digests each file's raw bytes. The oracle recomputes length and
    * sha256 from the documents table with an ordered string_agg — the
    * bytes on disk must equal the logical content exactly, which also
    * pins the text sink's framing (one trailing newline per row).
    * 100 TB: file-granular rows mean no splitting; the source
    * parallelizes across files, so shard counts — not file sizes —
    * set the parallelism. */
  def scanBinaryFile(spark: SparkSession, dir: String): DataFrame = {
    val path = fix(dir, "scan_binaryfile")
    Tables.load(spark, dir, "documents")
      .repartition(col("lang"))
      .sortWithinPartitions(col("lang"), col("doc_id"))
      .select(col("lang"), col("text").as("value"))
      .write.mode("overwrite").partitionBy("lang").text(path)
    ordered(
      spark.read.format("binaryFile")
        .option("pathGlobFilter", "part-*")
        .load(path)
        .select(
          regexp_extract(col("path"), "lang=([^/]+)", 1).as("lang"),
          col("length").as("n_bytes"),
          sha2(col("content"), 256).as("digest")))
  }

  private val scanBinaryFileSql =
    s"""SELECT lang,
       |  CAST(SUM(n_chars) + COUNT(*) AS BIGINT) AS n_bytes,
       |  sha256(string_agg(text || chr(10), '' ORDER BY doc_id)) AS digest
       |FROM documents GROUP BY lang
       |${O.OrderAll}"""

  /** PERMISSIVE corrupt-record quarantine — the ingest negative path
    * (README.md:12 "error handling … throughout the ETL process"):
    * a raw extract where a deterministic subset of lines is mangled
    * (`c_custkey % 37 = 0` → non-numeric key field, full arity), read
    * under `mode=PERMISSIVE` with `columnNameOfCorruptRecord` — bad
    * lines surface as rows with the raw text in `_corrupt_record`
    * instead of killing the job (FAILFAST) or vanishing silently
    * (DROPMALFORMED). One aggregate counts good/corrupt and sums a
    * money column over the parseable rows only; the oracle replays the
    * corruption rule on the clean source.
    *
    * 100 TB: quarantine-by-column is a single pass — no second read to
    * find the bad lines, and the corrupt rows keep their raw text for
    * the repair queue (`etl_quarantine`'s shape at the parser level).
    * Caveat worth knowing: a query referencing ONLY the corrupt column
    * is rejected by Spark (lazy parsing would skip the data columns);
    * aggregating it alongside real columns, as here, is the supported
    * spelling. */
  def scanCsvMalformed(spark: SparkSession, dir: String): DataFrame = {
    val path = fix(dir, "scan_csv_malformed")
    val c = Tables.load(spark, dir, "customer")
    c.select(
        when(col("c_custkey") % 37 === 0,
          concat(lit("corrupt"), col("c_custkey"), lit(",###,bad,row,###")))
          .otherwise(concat_ws(",", col("c_custkey"), col("c_name"),
            col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")))
          .as("value"))
      .write.mode("overwrite").text(path)
    val schema = org.apache.spark.sql.types.StructType(
      Tables.customer.fields :+ org.apache.spark.sql.types.StructField(
        "_corrupt_record", org.apache.spark.sql.types.StringType))
    val parsed = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
    ordered(parsed.agg(
      count(when(col("_corrupt_record").isNull, lit(1))).as("n_good"),
      count(col("_corrupt_record")).as("n_corrupt"),
      dsum(when(col("_corrupt_record").isNull, col("c_acctbal")))
        .as("good_acctbal")))
  }

  private val scanCsvMalformedSql =
    s"""SELECT
       |  COUNT(*) FILTER (c_custkey % 37 <> 0) AS n_good,
       |  COUNT(*) FILTER (c_custkey % 37 = 0) AS n_corrupt,
       |  CAST(SUM(CASE WHEN c_custkey % 37 <> 0
       |    THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE) AS good_acctbal
       |FROM customer
       |${O.OrderAll}"""

  /** Stats-pruned scan (data skipping / zone maps) — the mechanism
    * behind every lakehouse manifest (Delta/Iceberg file stats, parquet
    * footer min/max): lineitem is rewritten RANGE-CLUSTERED by
    * l_shipdate (clustering is what MAKES per-file min/max selective —
    * the same reason `sink_zorder` exists for 2-D predicates), a
    * per-FILE stats table (min/max shipdate per file — the manifest)
    * is derived in one pass at write time, and the date-band query
    * consults ONLY the stats to decide which files to open (one row
    * per file — at 100 TB the manifest is millions of rows where the
    * data is billions, and it prunes BEFORE any data IO is scheduled).
    * The
    * keyed row carries the band aggregate (answerable from the pruned
    * read alone — the oracle recomputes it from the FULL table, so a
    * wrongly-skipped file goes red, the skip proven lossless) plus the
    * pinned `files_pruned` invariant (the metadata filter actually
    * skipped files; counts stay out of the row because range-partition
    * file boundaries are sampling-dependent). */
  private val skipD1 = "1996-01-01 00:00:00"
  private val skipD2 = "1996-06-30 00:00:00"

  /** The keyed form since r10 (r9 verdict "what's wrong" #1): the
    * manifest is a persisted TABLE and the prune is a JOIN the engine
    * turns into dynamic partition pruning — NO driver round-trip of a
    * file list. Zones are the write's range clusters surfaced as a
    * partition column (`zid`), so "open only admitted files" is
    * literally the scan's PartitionFilters (`dynamicpruning#…`, pinned
    * in PlanSpec): Spark evaluates the manifest side first and the
    * data scan never schedules IO for pruned zones. At 100 TB the
    * manifest is millions of rows — a table you join, not a list you
    * collect; this is exactly Delta/Iceberg's scan planning made
    * visible. `files_pruned` rides a broadcast scalar (kept < total),
    * never a collected list. [[scanSkippingCollectTwin]] keeps the r9
    * driver-side spelling as the equality twin (IngestSpec law). */
  /** Fixture name keyed by the lineitem corpus FINGERPRINT, not just
    * the sf dir name (r12, per advisor): regenerating `data/sf*` in
    * place must invalidate the zoned layout, not silently serve the
    * stale one. */
  private[graft] def scanSkippingFixtureName(dir: String): String =
    "scan_skipping_zones_" +
      graft.core.Fixtures.corpusFingerprint(dir, "lineitem")

  def scanSkipping(spark: SparkSession, dir: String): DataFrame = {
    // Build-once (r11, r10 verdict "what's wrong" #2): the zoned
    // layout and its manifest are pure functions of the corpus, but
    // the r10 form rewrote BOTH on every invocation — ~10× the read
    // work, so a big-rung gate timed the fixture write, not the scan
    // skipping. Now parameter-keyed like the IVF/PQ indexes: the
    // first call per sf writes (atomically — a crash mid-build can't
    // publish a manifest that disagrees with the zones), every later
    // call only reads. The root _SUCCESS is touched by the body only
    // after both sub-writes finish, so `exists` means zones AND
    // manifest are complete together.
    val fixture = scanSkippingFixtureName(dir)
    graft.core.Fixtures.buildAtomic(dir, fixture) { tmp =>
      Tables.load(spark, dir, "lineitem")
        .repartitionByRange(8, col("l_shipdate"))
        .withColumn("zid", spark_partition_id())
        .write.mode("overwrite").partitionBy("zid").parquet(s"$tmp/zoned")
      // the manifest: per-zone min/max, derived in one pass at write
      // time and PERSISTED — the table every later query consults
      spark.read.parquet(s"$tmp/zoned")
        .groupBy(col("zid"))
        .agg(min(col("l_shipdate")).as("lo"), max(col("l_shipdate")).as("hi"))
        .write.mode("overwrite").parquet(s"$tmp/manifest")
      require(new java.io.File(tmp, "_SUCCESS").createNewFile(),
        s"fixture completion marker already present under $tmp")
    }
    val path = fix(dir, fixture) + "/zoned"
    val manifestPath = fix(dir, fixture) + "/manifest"
    val d1 = lit(skipD1).cast("timestamp")
    val d2 = lit(skipD2).cast("timestamp")
    val manifest = spark.read.parquet(manifestPath)
    val kept = manifest.filter(col("hi") >= d1 && col("lo") <= d2)
      .select(col("zid"))
    val pruned = manifest.agg(
      (count(when(col("hi") >= d1 && col("lo") <= d2, lit(1))) < count(lit(1)))
        .as("files_pruned"))
    ordered(
      spark.read.parquet(path)
        .join(kept, Seq("zid")) // → dynamic partition pruning on zid
        .filter(col("l_shipdate").between(d1, d2))
        .groupBy()
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
        .crossJoin(broadcast(pruned)))
  }

  /** The r9 driver-side spelling — stats collected, kept paths re-fed
    * to a second read. Correct and bounded by file count, but a 100 TB
    * manifest (~10⁶ files) does not round-trip the driver; kept ONLY
    * as the equality twin the IngestSpec law compares the join form
    * against. */
  private[graft] def scanSkippingCollectTwin(
      spark: SparkSession, dir: String): DataFrame = {
    val path = fix(dir, "scan_skipping")
    Tables.load(spark, dir, "lineitem")
      .repartitionByRange(8, col("l_shipdate"))
      .sortWithinPartitions(col("l_shipdate"))
      .write.mode("overwrite").parquet(path)
    val stats = spark.read.schema(Tables.lineitem).parquet(path)
      .select(input_file_name().as("f"), col("l_shipdate"))
      .groupBy(col("f"))
      .agg(min(col("l_shipdate")).as("lo"), max(col("l_shipdate")).as("hi"))
    val d1 = lit(skipD1).cast("timestamp")
    val d2 = lit(skipD2).cast("timestamp")
    val filesTotal = stats.count()
    val kept = stats.filter(col("hi") >= d1 && col("lo") <= d2)
      .select(col("f")).collect().map(_.getString(0))
    ordered(
      spark.read.schema(Tables.lineitem).parquet(kept.toIndexedSeq: _*)
        .filter(col("l_shipdate").between(d1, d2))
        .groupBy()
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
        .withColumn("files_pruned", lit(kept.length < filesTotal)))
  }

  private val scanSkippingSql =
    s"""SELECT COUNT(*) AS n, ${O.dsum("l_extendedprice")} AS sum_price,
       |  TRUE AS files_pruned
       |FROM lineitem
       |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
       |  AND TIMESTAMP '1996-06-30 00:00:00'
       |${O.OrderAll}"""

  val queries: Map[String, Q] = Map(
    "scan_skipping" -> Q(scanSkipping _, scanSkippingSql),
    "scan_csv_malformed" -> Q(scanCsvMalformed _, scanCsvMalformedSql),
    "scan_binaryfile" -> Q(scanBinaryFile _, scanBinaryFileSql),
    "scan_text" -> Q(scanText _, scanTextSql),
    "sink_zorder" -> Q(sinkZorder _, sinkZorderSql),
    "scan_jdbc" -> Q(scanJdbc _, scanJdbcSql),
    "sink_jdbc_upsert" -> Q(sinkJdbcUpsert _, sinkJdbcUpsertSql),
    "scan_parquet" -> Q(scanParquet _, scanParquetSql),
    "scan_orc" -> Q(scanOrc _, scanOrcSql),
    "scan_xml" -> Q(scanXml _, scanXmlSql),
    "sink_zstd" -> Q(sinkZstd _, sinkZstdSql),
    "scan_csv" -> Q(scanCsv _, scanCsvSql),
    "scan_json" -> Q(scanJson _, scanJsonSql),
    "sink_partitioned" -> Q(sinkPartitioned _, sinkPartitionedSql)
  )
}
