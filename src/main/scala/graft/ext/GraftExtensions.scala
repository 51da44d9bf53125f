package graft.ext

import graft.expressions.{TextExpressions, VectorExpressions}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{CreateArray, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for graft's native expressions, registered through the
  * public `SparkSessionExtensions.injectFunction` extension point:
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .withExtensions(new GraftExtensions)           // programmatic
  *   // or .config("spark.sql.extensions", "graft.ext.GraftExtensions")
  *   .getOrCreate()
  * spark.sql("SELECT graft_dot(a.v, b.v) FROM ...")
  * }}}
  *
  * This makes the kernels first-class for `spark.sql` users (the
  * serving-layer entry point, SURVEY.md §3 entry point 2), not just the
  * DataFrame API. Cardinality-style parameters (k, n) are literal
  * arguments resolved at analysis time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    GraftExtensions.tableFunctions.foreach(ext.injectTableFunction)
    // Maintenance-DDL statement family (GRAFT HISTORY/RESTORE/VACUUM/
    // FSCK/CHECKPOINT/RENAME COLUMN/DROP COLUMN) — see [[GraftSqlParser]].
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // `FROM t VERSION AS OF n` / `TIMESTAMP AS OF ts` on graft and
    // interop catalog tables — resolves the parse-time placeholder in
    // the analyzer's main batch — see [[GraftTimeTravelResolve]].
    ext.injectResolutionRule(GraftTimeTravelResolve)
    // INSERT OVERWRITE on graft catalog tables must commit, never
    // truncate-and-write-raw — see [[GraftDmlRewrite]].
    // FIRST: DSv2-swapped graft relations re-resolve to the log head
    // (or swap back to v1 when the snapshot became ineligible) BEFORE
    // the rules below shape the plan — see [[Graft2Refresh]].
    ext.injectPostHocResolutionRule(Graft2Refresh)
    ext.injectPostHocResolutionRule(GraftDmlRewrite)
    // Merge-on-read snapshots read through SQL via the ∪/anti-join
    // scan rewrite — MUST be injected after GraftDmlRewrite (same Once
    // batch) so DML targets are already captured — see [[GraftMorScan]].
    ext.injectPostHocResolutionRule(GraftMorScan)
    // Iceberg v2 positional delete files apply at scan time via the
    // same Union/anti-join shape — see [[IcebergMorScan]].
    ext.injectPostHocResolutionRule(IcebergMorScan)
    // Iceberg name-mapped snapshots (a UniForm mirror over a
    // column-mapped Delta table) re-plan in physical space with a
    // logical-restoring Project — see [[IcebergNameMappingScan]].
    ext.injectPostHocResolutionRule(IcebergNameMappingScan)
    // Delta/Iceberg tables resolved through a NAMED graft catalog
    // (`lake.db.t`) swap to the format's own replay read — AFTER
    // GraftDmlRewrite so DML targets lower first — see
    // [[InteropCatalogScan]].
    ext.injectPostHocResolutionRule(InteropCatalogScan)
    // Puffin NDV statistics feed the CBO (rowCount + distinctCount on
    // iceberg-meta relations) — AFTER the MOR rewrite so it stamps
    // the relations that survive as stock scans — see
    // [[IcebergCboStats]].
    ext.injectPostHocResolutionRule(IcebergCboStats)
    // Delta column mapping resolves physical names BEFORE the DV rule
    // (a mapped table with DVs composes: physical scan, then DV
    // rewrite in physical space) — see [[DeltaColumnMappingScan]].
    ext.injectPostHocResolutionRule(DeltaColumnMappingScan)
    // Delta deletion vectors likewise — see [[DeltaMorScan]].
    ext.injectPostHocResolutionRule(DeltaMorScan)
    // LAST: plain graft reads route through the vectorized DSv2 scan
    // (spark.graft.readPath=v1 restores the v1 path) — every earlier
    // rule has already claimed the relations it owns (DML targets,
    // MOR branches, mapped scans) — see [[GraftDsv2Swap]].
    ext.injectPostHocResolutionRule(GraftDsv2Swap)
    // write-side completion of the DSv2 flip: INSERT INTO/OVERWRITE on
    // graft catalog tables become AppendData/OverwriteByExpression
    // over Graft2Table (must run AFTER DataSourceAnalysis lowers the
    // statement to InsertIntoDataSourceCommand — built-in post-hoc
    // rules precede injected ones)
    ext.injectPostHocResolutionRule(GraftDsv2Write)
  }
}

object GraftExtensions {

  private def litInt(fname: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fname expects a literal INT parameter, got $other")
  }

  private def fn(
      name: String,
      arity: String,
      usage: String)(builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft", null, name, s"$name($arity) - $usage", ""),
      builder)

  /** All registered functions. Each mirrors a kernel in
    * [[graft.ops.VectorOps]] / [[graft.ops.TextOps]]. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      fn("graft_dot", "a, b",
        "dot product of two array<double>, left-to-right accumulation") {
        es => VectorExpressions.DotProduct(es(0), es(1))
      },
      fn("graft_l2norm", "a", "L2 norm of an array<double>") {
        es => VectorExpressions.L2Norm(es(0))
      },
      fn("graft_hyperplane_bucket", "v, nPlanes",
        "random-hyperplane LSH bucket id in [0, 2^nPlanes)") {
        es => VectorExpressions.HyperplaneBucket(
          es(0), litInt("graft_hyperplane_bucket", es(1)))
      },
      fn("graft_l2distsq", "a, b",
        "exact squared L2 distance between quantized array<bigint> vectors") {
        es => VectorExpressions.L2DistSq(es(0), es(1))
      },
      fn("graft_polyhash_tokens", "ws",
        "per-token polynomial rolling hash (mod 1e9+7) of array<string>") {
        es => TextExpressions.PolyHashTokens(es(0))
      },
      fn("graft_shingle_hashes3", "th",
        "adjacent-triple composition of token hashes (not deduplicated)") {
        es => TextExpressions.ShingleHashes3(es(0))
      },
      fn("graft_st_point", "x, y",
        "WKB POINT bytes from coordinate doubles — the constructor " +
          "Spark 4.1's ST family lacks; lift with st_geomfromwkb") {
        es => graft.expressions.GeoExpressions.StPointWkb(es(0), es(1))
      },
      fn("graft_word_shingles", "ws, n",
        "n-word shingle strings of array<string> (not deduplicated)") {
        es => TextExpressions.WordShingles(es(0), litInt("graft_word_shingles", es(1)))
      },
      fn("graft_minhash_sig", "hs, k",
        "k-permutation MinHash signature over hashed shingles") {
        es => TextExpressions.MinHashSig(es(0), litInt("graft_minhash_sig", es(1)))
      },
      fn("graft_simhash16", "hs",
        "16-bit majority-vote SimHash over hashed shingles") {
        es => TextExpressions.SimHashBits(es(0), 16)
      },
      fn("graft_simhash", "hs, bits",
        "bits-wide majority-vote SimHash over hashed shingles") {
        es => TextExpressions.SimHashBits(es(0), litInt("graft_simhash", es(1)))
      },
      fn("graft_sorted_intersect_count", "a, b",
        "intersection size of two sorted distinct array<string> " +
          "(one merge pass; caller must sort, e.g. with array_sort)") {
        es => TextExpressions.SortedIntersectCount(es(0), es(1))
      },
      fn("graft_count_in_set", "ws, array('a','b',...)",
        "count of tokens belonging to a literal string set") { es =>
        val set = es(1) match {
          case CreateArray(elems, _)
              if elems.forall(e =>
                e.isInstanceOf[Literal] &&
                  e.asInstanceOf[Literal].value != null) =>
            elems.map(_.asInstanceOf[Literal].value.toString)
          case other => throw new IllegalArgumentException(
            "graft_count_in_set expects a literal string array " +
              s"without NULLs, got $other")
        }
        TextExpressions.CountInSet(es(0), set)
      })

  // ---------------------------------------------------------------------
  // Table-valued functions — the versioned table and its change feed as
  // plain FROM-clause citizens (Delta's `table_changes(...)` shape):
  //
  //   SELECT * FROM graft_table('<root>')              -- latest snapshot
  //   SELECT * FROM graft_table('<root>', 3)           -- time travel
  //   SELECT * FROM graft_changes('<root>', 2, 5)      -- CDC rows (2, 5]
  //
  // Arguments must be literals (they select WHICH table/commits to
  // read — analysis-time decisions by nature). The builders resolve
  // through the active session and return the analyzed plan of the
  // corresponding reader, so everything downstream (pruning, codegen)
  // is ordinary Spark. graft_table goes through the datasource path —
  // WHERE clauses over it hit the same manifest-stats file skipping as
  // a CREATE TABLE USING graft relation.
  // ---------------------------------------------------------------------

  private def litString(fname: String, e: Expression): String = e match {
    case Literal(v, _) if v != null &&
        e.dataType == org.apache.spark.sql.types.StringType => v.toString
    case other => throw new IllegalArgumentException(
      s"$fname expects a literal STRING, got $other")
  }

  private def litLong(fname: String, e: Expression): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, org.apache.spark.sql.types.LongType) => v
    case other => throw new IllegalArgumentException(
      s"$fname expects a literal integer, got $other")
  }

  private def tfn(name: String, arity: String, usage: String)(
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : (FunctionIdentifier, ExpressionInfo,
         Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft", null, name, s"$name($arity) - $usage", ""),
      builder)

  val tableFunctions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] =
    Seq(
      tfn("graft_table", "root [, version]",
        "snapshot of a graft versioned table (latest or time travel)") { es =>
        require(es.size == 1 || es.size == 2,
          s"graft_table takes (root [, version]), got ${es.size} args")
        val spark = org.apache.spark.sql.SparkSession.active
        val reader = spark.read.format("graft")
        val versioned =
          if (es.size == 2)
            reader.option("versionAsOf", litLong("graft_table", es(1)))
          else reader
        versioned.load(litString("graft_table", es(0)))
          .queryExecution.analyzed
      },
      tfn("graft_changes", "root, afterVersion, toVersion",
        "CDC rows of commits in (afterVersion, toVersion]") { es =>
        require(es.size == 3,
          s"graft_changes takes (root, after, to), got ${es.size} args")
        val spark = org.apache.spark.sql.SparkSession.active
        graft.sources.VersionedTable.changes(spark,
            litString("graft_changes", es(0)),
            litLong("graft_changes", es(1)),
            litLong("graft_changes", es(2)))
          .queryExecution.analyzed
      },
      tfn("delta_changes", "root, afterVersion, toVersion",
        "Delta CHANGE DATA FEED rows of commits in (after, to] — " +
          "cdc actions when recorded, derived insert/delete otherwise") {
        es =>
        require(es.size == 3,
          s"delta_changes takes (root, after, to), got ${es.size} args")
        val spark = org.apache.spark.sql.SparkSession.active
        graft.sources.DeltaLog.changes(spark,
            litString("delta_changes", es(0)),
            litLong("delta_changes", es(1)),
            litLong("delta_changes", es(2)))
          .queryExecution.analyzed
      },
      tfn("iceberg_changes", "root, afterSeq, toSeq",
        "row-level changes of Iceberg commits with sequence numbers " +
          "in (after, to] — appends as inserts, delete snapshots as " +
          "deletes from the prior snapshot's retained files; " +
          "rewrites refuse") { es =>
        require(es.size == 3,
          s"iceberg_changes takes (root, after, to), got ${es.size} args")
        val spark = org.apache.spark.sql.SparkSession.active
        graft.sources.IcebergMeta.changes(spark,
            litString("iceberg_changes", es(0)),
            litLong("iceberg_changes", es(1)),
            litLong("iceberg_changes", es(2)))
          .queryExecution.analyzed
      },
      tfn("delta_row_ids", "root",
        "visible rows of a row-tracked Delta table plus _row_id " +
          "(baseRowId + position) and _last_updated_version") { es =>
        require(es.size == 1,
          s"delta_row_ids takes (root), got ${es.size} args")
        val spark = org.apache.spark.sql.SparkSession.active
        graft.sources.DeltaLogRead.readWithRowIds(spark,
            litString("delta_row_ids", es(0)))
          .queryExecution.analyzed
      },
      tfn("iceberg_row_ids", "root",
        "visible rows of an Iceberg v3 table plus _row_id " +
          "(first_row_id inheritance + position) and " +
          "_last_updated_sequence_number") { es =>
        require(es.size == 1,
          s"iceberg_row_ids takes (root), got ${es.size} args")
        val spark = org.apache.spark.sql.SparkSession.active
        graft.sources.IcebergMetaRead.readWithRowIds(spark,
            litString("iceberg_row_ids", es(0)))
          .queryExecution.analyzed
      },
      tfn("iceberg_snapshots", "root",
        "the table$snapshots metadata relation: one row per snapshot " +
          "(committed_at, ids, sequence_number, operation, " +
          "manifest_list) from the metadata document alone") { es =>
        require(es.size == 1,
          s"iceberg_snapshots takes (root), got ${es.size} args")
        val spark = org.apache.spark.sql.SparkSession.active
        graft.sources.IcebergMeta.snapshotsFrame(spark,
            litString("iceberg_snapshots", es(0)))
          .queryExecution.analyzed
      },
      tfn("iceberg_manifests", "root",
        "the table$manifests metadata relation: one row per manifest " +
          "in the current snapshot's manifest list (the planning-cost " +
          "surface rewrite_manifests maintains)") { es =>
        require(es.size == 1,
          s"iceberg_manifests takes (root), got ${es.size} args")
        val spark = org.apache.spark.sql.SparkSession.active
        graft.sources.IcebergMeta.manifestsFrame(spark,
            litString("iceberg_manifests", es(0)))
          .queryExecution.analyzed
      },
      tfn("iceberg_refs", "root",
        "the table$refs metadata relation: one row per tag/branch " +
          "with its pinned snapshot") { es =>
        require(es.size == 1,
          s"iceberg_refs takes (root), got ${es.size} args")
        val spark = org.apache.spark.sql.SparkSession.active
        graft.sources.IcebergMeta.refsFrame(spark,
            litString("iceberg_refs", es(0)))
          .queryExecution.analyzed
      },
      tfn("iceberg_files", "root [, snapshotId]",
        "the table$files metadata relation: one row per live data/" +
          "delete/DV file of the current (or requested) snapshot, " +
          "from the manifest replay alone") { es =>
        require(es.size == 1 || es.size == 2,
          s"iceberg_files takes (root [, snapshotId]), got ${es.size} args")
        val spark = org.apache.spark.sql.SparkSession.active
        graft.sources.IcebergMeta.filesFrame(spark,
            litString("iceberg_files", es(0)),
            if (es.size == 2) Some(litLong("iceberg_files", es(1)))
            else None)
          .queryExecution.analyzed
      })
}
