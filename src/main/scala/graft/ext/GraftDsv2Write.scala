package graft.ext

import graft.sources.{Graft2DataSource, Graft2Table, GraftFileIndex,
  VersionedTable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{AppendData,
  LogicalPlan, OverwriteByExpression, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  InsertIntoDataSourceCommand, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Routes `INSERT INTO` / `INSERT OVERWRITE` on graft catalog tables
  * through the DSv2 WRITE surface — the write-side completion of
  * [[GraftDsv2Swap]]'s round-9 read flip.
  *
  * The v1 lowering (`DataSourceAnalysis` →
  * [[InsertIntoDataSourceCommand]] → `InsertableRelation.insert` →
  * `VersionedTable.commit(df)`) materializes the query into a
  * DataFrame on the DRIVER-SIDE command path. This rule rewrites the
  * command into Spark's native v2 write plan —
  * `AppendData`/`OverwriteByExpression` over a
  * [[DataSourceV2Relation]] carrying a [[Graft2Table]] — so the rows
  * stream from executor tasks straight into staged parquet through
  * the public connector `DataWriter` contract and the driver commits
  * ONE manifest ([[VersionedTable.commitStagedFiles]]: same CHECK
  * enforcement, schema-evolution policy, footer-stats harvest, and
  * atomic putIfAbsent publish as the v1 writer — two write APIs, one
  * commit protocol).
  *
  * What stays v1 (each a stated reason):
  *  - pinned relations (time travel): immutable — the v1 insert
  *    raises its established error;
  *  - tables with renamed/dropped columns: appends must restate
  *    PHYSICAL names, which the v1 writer owns
  *    ([[VersionedTable.v2AppendEligible]] is the metadata probe);
  *  - DELETE/UPDATE/MERGE commands: their lowering rules own the
  *    rewrite protocol ([[GraftDmlRewrite]]).
  *
  * `spark.graft.writePath = v1` restores the v1 insert wholesale (the
  * config fallback, mirroring `spark.graft.readPath`). */
case class GraftDsv2Write(session: SparkSession) extends Rule[LogicalPlan] {

  private def v2Enabled: Boolean =
    session.conf.get("spark.graft.writePath", "v2") == "v2"

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case InsertIntoDataSourceCommand(
        lr @ LogicalRelation(r: HadoopFsRelation, _, _, false, _),
        query, overwrite)
        if v2Enabled && r.location.isInstanceOf[GraftFileIndex] &&
          !r.location.asInstanceOf[GraftFileIndex].isPinned &&
          (overwrite || VersionedTable.v2AppendEligible(
            r.location.asInstanceOf[GraftFileIndex].tableRoot,
            r.location.asInstanceOf[GraftFileIndex].currentVersion)) =>
      val idx = r.location.asInstanceOf[GraftFileIndex]
      val schema = Graft2DataSource.asNullable(lr.schema)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      val v2rel = DataSourceV2Relation.create(
        new Graft2Table(idx.tableRoot, idx.currentVersion, schema),
        None, None,
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
      // post-hoc rules run AFTER output resolution, so the write
      // command must be born resolved: align the (already
      // DataSourceAnalysis-aligned) query to the v2 relation's
      // attributes by position, with the table's exact names/types
      val aligned = Project(
        query.output.zip(v2rel.output).map { case (in, out) =>
          val typed =
            if (in.dataType == out.dataType) in
            else Cast(in, out.dataType)
          Alias(typed, out.name)()
        }, query)
      if (overwrite)
        OverwriteByExpression.byPosition(v2rel, aligned,
          Literal.TrueLiteral)
      else AppendData.byPosition(v2rel, aligned)

    // INSERT OVERWRITE lowers to InsertIntoHadoopFsRelationCommand,
    // which [[GraftDmlRewrite]] (earlier in this batch) already
    // turned into GraftInsertCommand — promote the unpinned ones the
    // same way (pinned ones keep the command so its established
    // refusal fires)
    case GraftInsertCommand(root, false, query, overwrite)
        if v2Enabled && query.resolved &&
          (overwrite || {
            val latest = VersionedTable.latestVersion(root)
            latest < 0 || VersionedTable.v2AppendEligible(root, latest)
          }) =>
      val schema = Graft2DataSource.asNullable(query.schema)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      val v2rel = DataSourceV2Relation.create(
        new Graft2Table(root, VersionedTable.latestVersion(root), schema),
        None, None,
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
      val aligned = Project(
        query.output.zip(v2rel.output).map { case (in, out) =>
          val typed =
            if (in.dataType == out.dataType) in
            else Cast(in, out.dataType)
          Alias(typed, out.name)()
        }, query)
      if (overwrite)
        OverwriteByExpression.byPosition(v2rel, aligned,
          Literal.TrueLiteral)
      else AppendData.byPosition(v2rel, aligned)
    case _ => plan
  }
}
