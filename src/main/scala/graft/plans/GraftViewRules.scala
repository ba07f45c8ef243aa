package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedTableOrView}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewCatalog, ViewInfo}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.unsafe.types.UTF8String

/** SQL wiring for DSV2 `ViewCatalog`s (r14). Spark 4.1 ships the
  * connector-side `ViewCatalog` interface but no analyzer/planner path
  * for it — `CREATE VIEW cat.ns.v` dies in ResolveSessionCatalog with
  * MISSING_CATALOG_ABILITY. This file supplies the missing path for
  * graft catalogs, injected via [[graft.GraftExtensions]]:
  *
  *  - [[GraftViewSubstitution]] runs in the HINT-resolution batch —
  *    BEFORE ResolveSessionCatalog can throw — and (a) rewrites
  *    CREATE/DROP/SHOW/RENAME VIEW statements that target a ViewCatalog
  *    into the command nodes below, (b) substitutes a reference to a
  *    stored view with its parsed definition SQL (the view is pure
  *    metadata; re-resolution happens per read, so pruning/SPJ still
  *    fire underneath).
  *  - [[GraftViewStrategy]] plans the command nodes; being `Command`s
  *    they execute eagerly like every other DDL.
  *
  * Contract notes: stored definition SQL should use qualified table
  * names (the substitution re-resolves in the CURRENT session context);
  * a self-referential view chain fails with the analyzer's
  * max-iterations error rather than looping.
  */
case class CreateGraftView(catalog: ViewCatalog, catalogName: String,
                           ident: Identifier, sql: String,
                           userCols: Seq[(String, Option[String])],
                           comment: Option[String],
                           props: Map[String, String],
                           allowExisting: Boolean, replace: Boolean,
                           query: LogicalPlan)
    extends UnaryCommand {
  override def child: LogicalPlan = query
  override protected def withNewChildInternal(newChild: LogicalPlan): CreateGraftView =
    copy(query = newChild)
}

case class DropGraftView(catalog: ViewCatalog, ident: Identifier,
                         ifExists: Boolean) extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

case class ShowGraftViews(catalog: ViewCatalog, namespace: Seq[String],
                          pattern: Option[String],
                          override val output: Seq[Attribute])
    extends LeafNode with Command {
  override def producedAttributes: AttributeSet = AttributeSet(output)
}

case class RenameGraftView(catalog: ViewCatalog, from: Identifier,
                           to: Identifier) extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

class GraftViewSubstitution(session: SparkSession) extends Rule[LogicalPlan] {

  /** (catalog, identifier) when `parts` names a registered ViewCatalog
    * (`cat.ns….name`); None for everything else — the rule must be a
    * no-op for the session catalog and non-view catalogs. */
  private def viewCatalogOf(parts: Seq[String]): Option[(ViewCatalog, Identifier)] =
    if (parts.length < 2) None
    else try {
      session.sessionState.catalogManager.catalog(parts.head) match {
        case vc: ViewCatalog =>
          Some((vc, Identifier.of(parts.slice(1, parts.length - 1).toArray,
            parts.last)))
        case _ => None
      }
    } catch { case _: Exception => None }

  /** The stored definition, parsed and re-aliased: `CREATE VIEW v(a, b)`
    * renames the query's output columns positionally-by-name, exactly
    * what the create path recorded in queryColumnNames/columnAliases. */
  private def substitute(ident: Identifier, v: View): LogicalPlan = {
    val parsed = session.sessionState.sqlParser.parsePlan(v.query())
    val aliased =
      if (v.columnAliases() == null || v.columnAliases().isEmpty) parsed
      else Project(
        v.columnAliases().zip(v.queryColumnNames()).toSeq.map {
          case (alias, qcol) =>
            Alias(UnresolvedAttribute.quoted(qcol), alias)()
        }, parsed)
    SubqueryAlias(ident.name, aliased)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case cv: CreateView => cv.child match {
      case UnresolvedIdentifier(parts, _) =>
        viewCatalogOf(parts) match {
          case Some((vc, ident)) =>
            val sql = cv.originalText.getOrElse(throw new IllegalArgumentException(
              s"graft views: CREATE VIEW ${parts.mkString(".")} carries no SQL text"))
            CreateGraftView(vc, parts.head, ident, sql,
              cv.userSpecifiedColumns, cv.comment, cv.properties,
              cv.allowExisting, cv.replace, cv.query)
          case None => cv
        }
      case _ => cv
    }

    case dv: DropView => dv.child match {
      case UnresolvedIdentifier(parts, _) =>
        viewCatalogOf(parts) match {
          case Some((vc, ident)) => DropGraftView(vc, ident, dv.ifExists)
          case None => dv
        }
      case _ => dv
    }

    case sv: ShowViews => sv.namespace match {
      case ns: UnresolvedNamespace
        if ns.multipartIdentifier.nonEmpty &&
          viewCatalogOf(ns.multipartIdentifier :+ "x").isDefined =>
        val (vc, _) = viewCatalogOf(ns.multipartIdentifier :+ "x").get
        ShowGraftViews(vc, ns.multipartIdentifier.tail, sv.pattern, sv.output)
      case _ => sv
    }

    case rt: RenameTable if rt.isView => rt.child match {
      case tv: UnresolvedTableOrView =>
        viewCatalogOf(tv.multipartIdentifier) match {
          case Some((vc, from)) =>
            // ALTER VIEW cat.ns.v RENAME TO ns.v2 (same catalog)
            val np = rt.newName
            val to = Identifier.of(np.slice(0, np.length - 1).toArray, np.last)
            RenameGraftView(vc, from, to)
          case None => rt
        }
      case _ => rt
    }

    // a reference to a stored view inlines its definition; tables of the
    // same catalog fall through untouched (viewExists is one metadata
    // probe)
    case u: UnresolvedRelation =>
      viewCatalogOf(u.multipartIdentifier) match {
        case Some((vc, ident)) if vc.viewExists(ident) =>
          substitute(ident, vc.loadView(ident))
        case _ => u
      }
  }
}

/** Executes the view commands (eager, like all DDL). */
class GraftViewStrategy(session: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case c: CreateGraftView =>
      GraftViewExec(Nil, () => {
        val userNames = c.userCols.map(_._1)
        if (c.userCols.nonEmpty && c.userCols.length != c.query.output.length)
          throw new IllegalArgumentException(
            s"graft views: ${c.userCols.length} column aliases for a " +
              s"${c.query.output.length}-column query")
        val props = new java.util.HashMap[String, String]()
        c.props.foreach { case (k, v) => props.put(k, v) }
        c.comment.foreach(props.put(ViewCatalog.PROP_COMMENT, _))
        val schema = org.apache.spark.sql.types.StructType(
          c.query.output.zipWithIndex.map { case (a, i) =>
            org.apache.spark.sql.types.StructField(
              if (userNames.isDefinedAt(i)) userNames(i) else a.name,
              a.dataType, a.nullable)
          })
        val info = new ViewInfo(c.ident, c.sql,
          session.sessionState.catalogManager.currentCatalog.name(),
          session.sessionState.catalogManager.currentNamespace,
          schema, c.query.output.map(_.name).toArray,
          userNames.toArray,
          c.userCols.map(_._2.orNull).toArray, props)
        if (c.replace) {
          if (c.catalog.viewExists(c.ident)) c.catalog.dropView(c.ident)
          c.catalog.createView(info)
        } else if (c.catalog.viewExists(c.ident)) {
          if (!c.allowExisting)
            throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(c.ident)
        } else c.catalog.createView(info)
        Nil
      }) :: Nil

    case d: DropGraftView =>
      GraftViewExec(Nil, () => {
        val dropped = d.catalog.dropView(d.ident)
        if (!dropped && !d.ifExists)
          throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(d.ident)
        Nil
      }) :: Nil

    case s: ShowGraftViews =>
      GraftViewExec(s.output, () => {
        val names = s.catalog.listViews(s.namespace: _*).map(_.name())
        val kept = s.pattern match {
          case Some(p) =>
            org.apache.spark.sql.catalyst.util.StringUtils
              .filterPattern(names.toSeq, p)
          case None => names.toSeq
        }
        kept.sorted.map(n => InternalRow(
          UTF8String.fromString(s.namespace.mkString(".")),
          UTF8String.fromString(n), false))
      }) :: Nil

    case r: RenameGraftView =>
      GraftViewExec(Nil, () => { r.catalog.renameView(r.from, r.to); Nil }) :: Nil

    case _ => Nil
  }
}

/** Side-effecting leaf exec for the view commands (the V2CommandExec
  * shape: run once, serve the rows from both collect and execute). */
case class GraftViewExec(override val output: Seq[Attribute],
                         run: () => Seq[InternalRow])
    extends SparkPlan with LeafExecNode {
  private lazy val result: Seq[InternalRow] = run()
  override def executeCollect(): Array[InternalRow] = result.toArray
  override protected def doExecute(): RDD[InternalRow] =
    sparkContext.parallelize(result, 1)
  override def producedAttributes: AttributeSet = AttributeSet(output)
}
