package graft.ext

import graft.sources.{GraftFileIndex, VersionedTable}
import org.apache.spark.sql.{GraftColumnBridge, Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand

/** Routes SQL DML on `USING graft` catalog tables through the commit
  * protocol.
  *
  * Plain `INSERT INTO` already arrives as `InsertIntoDataSourceCommand`
  * (the relation is an `InsertableRelation`, and `DataSourceAnalysis`
  * prefers that case for non-overwrite inserts). `INSERT OVERWRITE`,
  * however, matches `DataSourceAnalysis`'s `HadoopFsRelation` case and
  * becomes an [[InsertIntoHadoopFsRelationCommand]] — which TRUNCATES
  * the table directory (transaction log included) and writes raw
  * parquet outside the manifest. This rule, injected as a post-hoc
  * resolution rule (custom rules run after the built-ins in the same
  * batch, so the raw command is already fully built and its `query`
  * already schema-aligned by `PreprocessTableInsertion`), intercepts
  * any such command whose file index is a [[GraftFileIndex]] and
  * replaces it with [[GraftInsertCommand]] — an atomic
  * `VersionedTable.commit` in `overwrite` or `append` mode, with CHECK
  * enforcement, schema validation, stats harvest, and history kept
  * (the old snapshot stays time-travelable; nothing is deleted until
  * VACUUM).
  */
case class GraftDmlRewrite(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case cmd: InsertIntoHadoopFsRelationCommand
        if cmd.fileIndex.exists(_.isInstanceOf[GraftFileIndex]) =>
      val idx = cmd.fileIndex.get.asInstanceOf[GraftFileIndex]
      GraftInsertCommand(idx.tableRoot, idx.isPinned, cmd.query,
        overwrite = cmd.mode == SaveMode.Overwrite)
    case _ => plan
  }
}

/** `INSERT OVERWRITE t ...` / rewritten raw inserts as a manifest
  * commit. Overwrite is a COMMIT, not a truncation: one new version
  * whose snapshot is exactly the query result; prior versions remain
  * readable via time travel and reclaimable only by VACUUM. */
case class GraftInsertCommand(root: String, pinned: Boolean,
    query: LogicalPlan, overwrite: Boolean) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(session: SparkSession): Seq[Row] = {
    require(!pinned,
      "graft: cannot INSERT into a time-travel-pinned relation " +
        "(versionAsOf/timestampAsOf/tagAsOf snapshots are immutable) — " +
        "insert through an unpinned table reference")
    VersionedTable.commit(GraftColumnBridge.ofRows(session, query), root,
      if (overwrite) "overwrite" else "append")
    Seq.empty
  }
}
