package graft.admin

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/** The `spark.sql(...)` front for the tenant/user/role/grant DCL —
  * the admin statements Spark itself has NO grammar for. Injected via
  * `GraftExtensions` (`spark.sql.extensions=graft.GraftExtensions`) as
  * a delegating [[ParserInterface]]: statements Spark cannot parse and
  * the reference defines (CREATE/ALTER/DROP/RECOVER TENANT,
  * CREATE/ALTER/DROP USER, CREATE/DROP ROLE, GRANT/REVOKE ... ON
  * DATABASE, SHOW TENANTS, SHOW QUERIES) become a
  * [[LeafRunnableCommand]] executed by the session's [[AdminEngine]];
  * EVERYTHING else — including CREATE DATABASE / CREATE TABLE / SHOW
  * DATABASES, which Spark owns — falls through to the delegate
  * parser untouched, so the injection can never hijack Spark's own
  * DDL.
  *
  * Session context comes from the same session-local confs the
  * session-info functions read (`spark.graft.tenant`, plus
  * `spark.graft.user`): `SET spark.graft.tenant = t1` switches the
  * acting tenant exactly as the reference's `--#TENANT=` directive.
  * The catalog persists to `spark.graft.admin.metaPath` (Hadoop FS
  * JSON) after every mutating statement when that conf is set.
  */
object AdminDcl {

  val UserKey = "spark.graft.user"
  val DatabaseKey = "spark.graft.database"
  val MetaPathKey = "spark.graft.admin.metaPath"
  val DataRootKey = "spark.graft.admin.dataRoot"

  /** Statement shapes this front owns. Deliberately EXCLUDES every
    * form Spark's own parser accepts. */
  private val Dcl =
    ("(?is)^\\s*(?:(?:CREATE|ALTER|DROP)\\s+(?:TENANT|USER|ROLE)|RECOVER\\s+(?:TENANT|DATABASE)" +
      "|(?:GRANT|REVOKE)\\s+(?:READ|WRITE|ALL)\\s+ON\\s+DATABASE" +
      "|SHOW\\s+(?:TENANTS|QUERIES|SERIES|TAG\\s+VALUES)" +
      "|CREATE\\s+STREAM\\s+TABLE)\\b.*").r

  def matches(sqlText: String): Boolean = Dcl.matches(sqlText)

  private def attr(n: String): Attribute = AttributeReference(n, StringType)()

  /** Fixed output schema per statement shape (needed at analysis time,
    * before the command runs). Whitespace-normalized so every spelling
    * the ownership regex accepts ("SHOW\t\tTENANTS") maps to the same
    * schema. */
  def outputFor(sqlText: String): Seq[Attribute] = {
    val up = sqlText.trim.toUpperCase.replaceAll("\\s+", " ")
    if (up.startsWith("SHOW TENANTS")) Seq(attr("tenant_name"))
    else if (up.startsWith("SHOW QUERIES")) AdminEngine.QueriesColumns.map(attr)
    else if (up.startsWith("SHOW SERIES")) Seq(attr("key"))
    else if (up.startsWith("SHOW TAG VALUES")) Seq(attr("key"), attr("value"))
    else Nil
  }

  // one engine per SparkSession, keyed weakly so a stopped session's
  // engine can be collected
  private val engines =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, AdminEngine]())

  def engineFor(spark: SparkSession): AdminEngine = synchronized {
    Option(engines.get(spark)).getOrElse {
      val dataRoot = spark.conf.getOption(DataRootKey)
        .getOrElse(java.nio.file.Files.createTempDirectory("graft_admin_sql").toString)
      val e = new AdminEngine(spark, new MetaCatalog, dataRoot,
        () => System.currentTimeMillis() * 1000000L)
      // hydration from MetaPathKey happens in exec(), which tracks the
      // loaded path so conf changes re-hydrate instead of clobbering
      engines.put(spark, e)
      e
    }
  }

  // which meta path each engine last loaded, and that file's
  // modification time at load/save — a save must never clobber a path
  // the in-memory catalog was not hydrated from, and a SECOND session
  // sharing the same path must pick up the first's mutations instead
  // of last-writer-wins overwriting them
  private val loadedPaths =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, (String, Long)]())

  /** Execute one DCL statement under the conf-derived session context;
    * persist the catalog afterwards when a meta path is configured.
    * Serialized per engine: the conf-derived session assignment and the
    * statement must be atomic against concurrent spark.sql threads, or
    * one thread's tenant could leak into another's statement. */
  def exec(spark: SparkSession, sqlText: String): Seq[Row] = {
    val e = engineFor(spark)
    e.synchronized {
      // hydrate from the CURRENT conf's meta path before EVERY
      // statement when the file changed since our last load/save: an
      // engine created before the conf was set must merge-load rather
      // than blind-save over persisted state, and a second session
      // sharing the path (newSession()) must see the first's mutations
      // instead of overwriting them. Statements stay read-modify-write
      // at statement granularity; true concurrent writers on one path
      // still need external coordination (documented constraint).
      spark.conf.getOption(MetaPathKey).foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val mtime = if (fs.exists(hp)) fs.getFileStatus(hp).getModificationTime else -1L
        if (loadedPaths.get(spark) != ((p, mtime))) {
          if (mtime >= 0L) e.catalog.load(spark, p)
          loadedPaths.put(spark, (p, mtime))
        }
      }
      e.session.tenant = spark.conf.get(graft.functions.SessionFunctions.TenantKey, "cnosdb")
      e.session.user = spark.conf.get(UserKey, "root")
      e.session.database = spark.conf.get(DatabaseKey, "public")
      val res = e.execute(sqlText) match {
        case None     => Nil
        case Some(df) => df.collect().toSeq // SHOW TENANTS/QUERIES: catalog-bounded
      }
      if (!sqlText.trim.toUpperCase.startsWith("SHOW"))
        spark.conf.getOption(MetaPathKey).foreach { p =>
          e.catalog.save(spark, p)
          val hp = new org.apache.hadoop.fs.Path(p)
          val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          loadedPaths.put(spark, (p, fs.getFileStatus(hp).getModificationTime))
        }
      res
    }
  }
}

/** The parsed form of an owned DCL statement: a leaf runnable command
  * whose run() drives the admin engine. */
final case class AdminDclCommand(sqlText: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = AdminDcl.outputFor(sqlText)
  override def run(sparkSession: SparkSession): Seq[Row] =
    AdminDcl.exec(sparkSession, sqlText)
}

/** Delegating parser: owned DCL shapes parse to [[AdminDclCommand]];
  * everything else goes to Spark's parser unchanged. */
final class GraftAdminParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    if (AdminDcl.matches(sqlText)) AdminDclCommand(sqlText)
    else delegate.parsePlan(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
