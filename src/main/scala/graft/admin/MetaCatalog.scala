package graft.admin

import scala.collection.mutable

/** Errors surfaced by the admin surface, mirroring the reference's
  * error taxonomy (sql parser error / Semantic error / Meta / auth /
  * Insufficient privileges). The reference wraps these in gRPC status
  * plumbing; here the message core is what a caller (and the specs)
  * see.
  *
  * Reference: the error expectations across
  * query_server/sqllogicaltests/cases/dcl and ddl.
  */
final case class AdminError(kind: String, message: String)
    extends RuntimeException(s"$kind: $message")

object AdminError {
  def parser(msg: String): Nothing    = throw AdminError("sql parser error", msg)
  def semantic(msg: String): Nothing  = throw AdminError("Semantic error", msg)
  def meta(msg: String): Nothing      = throw AdminError("Meta", msg)
  def auth(msg: String): Nothing      = throw AdminError("Auth error", msg)
  def privilege(expected: String): Nothing =
    throw AdminError("Insufficient privileges", s"expected [$expected]")
  // the stream surface's three extra flavors (the reference wraps these
  // in DataFusion's taxonomy; the message core is what the slts pin)
  def notImplemented(msg: String): Nothing =
    throw AdminError("This feature is not implemented", msg)
  def planning(msg: String): Nothing =
    throw AdminError("Error during planning", msg)
  def schema(msg: String): Nothing =
    throw AdminError("Schema error", msg)
}

/** One column of a TSKV table. `colType` is TIME | TAG | FIELD;
  * `ordinal` follows the reference's convention (TIME = 0, tags
  * 1..T, fields T+1..; information_schema.columns lists tags+fields
  * only, DESCRIBE TABLE lists all three).
  *
  * `storedId` is the PHYSICAL column key in parquet storage — the
  * Spark form of the reference's column ids (tskv stores by column
  * id, names are catalog metadata). RENAME COLUMN changes `name` and
  * keeps `storedId`, so existing rows stay readable under the new
  * name without any data rewrite; a column ADDED after creation gets
  * a FRESH ordinal-derived id, so dropping a column and re-adding the
  * same name yields nulls instead of resurrecting the dropped data.
  * Empty storedId (older snapshots) means "same as name".
  *
  * Reference: sys_table/information_schema/columns.slt,
  * ddl/describe_table.slt, ddl/rename_field.slt.
  */
final case class ColumnDef(name: String, colType: String, dataType: String,
                           codec: String, ordinal: Int,
                           storedId: String = "") {
  def physical: String = if (storedId.isEmpty) name else storedId
}

final case class TableDef(name: String, columns: Vector[ColumnDef],
                          nextColId: Int = 0) {
  def tags: Vector[ColumnDef]   = columns.filter(_.colType == "TAG")
  def fields: Vector[ColumnDef] = columns.filter(_.colType == "FIELD")
}

/** One declared column of a STREAM TABLE (name + declared type). */
final case class StreamColDef(name: String, dataType: String)

/** A stream table: a named streaming VIEW over a tskv source table —
  * the reference's `CREATE STREAM TABLE .. WITH (db, table,
  * event_time_column) engine = tskv` (the stream sqllogic suite,
  * ddl/create_stream_table.slt). Carries no storage of its own; the
  * Spark execution is readStream over the source table's parquet path
  * with a watermark on `eventTimeColumn`.
  */
final case class StreamTableDef(name: String, columns: Vector[StreamColDef],
                                db: String, table: String,
                                eventTimeColumn: String)

/** Database options. Display/default semantics mirror
  * information_schema.databases: ("INF", 1, "1year", 1, "NS",
  * "128 MiB", 16, "128 MiB", false, false, 32) for a bare CREATE
  * DATABASE. TTL None renders as "INF". The cache/WAL knobs are fixed
  * deployment defaults in the reference; carried verbatim for the
  * sys-table shape.
  */
final case class DatabaseDef(
    name: String,
    ttlNs: Option[Long] = None,
    shard: Int = 1,
    vnodeDurationNs: Long = MetaCatalog.NsPerYear,
    replica: Int = 1,
    precision: String = "NS",
    hidden: Boolean = false,
    tables: Map[String, TableDef] = Map.empty,
    streamTables: Map[String, StreamTableDef] = Map.empty)

final case class RoleDef(name: String, inherit: String) // inherit ∈ {owner, member}

final case class GrantDef(database: String, role: String, level: String) // Read|Write|All

final case class TenantDef(
    name: String,
    comment: Option[String] = None,
    dropAfter: Option[String] = None,
    hidden: Boolean = false,
    databases: Map[String, DatabaseDef] = Map.empty,
    roles: Map[String, RoleDef] = Map.empty,
    members: Map[String, String] = Map.empty, // user -> role name (owner|member|custom)
    grants: Vector[GrantDef] = Vector.empty)

final case class UserDef(
    name: String,
    admin: Boolean = false,
    comment: Option[String] = None,
    mustChangePassword: Boolean = false,
    passwordHash: Option[String] = None) // SHA-256 hex; sys tables render "*****"

/** A scheduled/cancelled async resource action, mirroring
  * information_schema.resource_status rows like
  * ("cnosdb-db_delay", "DropDatabase", "0", "Schedule").
  */
final case class ResourceStatusEntry(name: String, action: String,
                                     tryCount: Int, status: String,
                                     dueAtNs: Long,
                                     tenant: String = "", db: String = "")

/** Snapshot shape used for JSON persistence. */
final case class CatalogSnapshot(tenants: Vector[TenantDef],
                                 users: Vector[UserDef],
                                 resources: Vector[ResourceStatusEntry],
                                 writeSeq: Long = 0L)

/** The cluster metadata catalog: tenants → (databases, roles,
  * members, grants), global users, and the deferred-drop resource
  * queue. This is DRIVER-SIDE METADATA — a few KB even for thousands
  * of databases — while every data operation it gates (scans, TTL
  * expiry, compaction) stays on the distributed lake. The reference
  * keeps the same split: a raft-replicated meta service
  * (meta/src/store) over tskv data nodes; Spark's equivalent of the
  * meta service is this catalog + the session catalog, persisted as
  * one JSON document through the Hadoop FileSystem API so it lives
  * next to the lake on HDFS/S3 (atomic write-aside + rename, same
  * discipline as [[graft.operators.Dml.expireDays]]).
  *
  * Deterministic time: all drop-after scheduling takes explicit
  * nanosecond clocks from the caller, so lanes/specs replay exactly.
  *
  * Reference semantics mirrored from
  * query_server/sqllogicaltests/cases/{dcl,ddl,sys_table}/ and
  * meta/src/schema.
  */
final class MetaCatalog {
  import MetaCatalog._

  val tenants: mutable.LinkedHashMap[String, TenantDef] = mutable.LinkedHashMap(
    SystemTenant -> TenantDef(SystemTenant,
      databases = Map("public" -> DatabaseDef("public")),
      members = Map(RootUser -> "owner")))
  val users: mutable.LinkedHashMap[String, UserDef] = mutable.LinkedHashMap(
    RootUser -> UserDef(RootUser, admin = true, comment = Some("system admin"),
      mustChangePassword = true))
  val resources: mutable.LinkedHashMap[String, ResourceStatusEntry] =
    mutable.LinkedHashMap.empty

  // the monotonically increasing write sequence merge-on-read orders
  // by — the engine's stand-in for tskv's per-point WAL sequence. It
  // rides the catalog document, so it survives restarts whenever a
  // meta path is configured (the same durability the rest of the
  // catalog has); synchronized because streaming foreachBatch sinks
  // consume sequences concurrently with statements.
  private var _writeSeq: Long = 0L
  def nextWriteSeq(): Long = synchronized { _writeSeq += 1; _writeSeq }

  // ---- validation ----------------------------------------------------

  /** Reference name rules: empty / only-spaces rejected; '/' rejected
    * (path-unsafe — these names become lake directories here too).
    * ddl/create_database.slt:52-66.
    */
  def validateName(n: String): String = {
    if (n.trim.isEmpty) AdminError.parser("Name cannot be empty or contain only spaces")
    if (n.contains("/")) AdminError.parser(s"not supported keyword contains '/': $n")
    // quoted identifiers bypass the tokenizer's charset, and these names
    // become lake directories — "." / ".." / backslashes would escape
    // the tenant/db prefix on a path-joining filesystem
    if (n == "." || n == ".." || n.contains("\\"))
      AdminError.parser(s"not supported keyword contains path traversal: $n")
    n
  }

  def requireNotReservedDb(n: String): Unit =
    if (ReservedDatabases.contains(n.toLowerCase))
      AdminError.semantic(s"The database $n is a system database and cannot be created or dropped")

  // ---- tenants -------------------------------------------------------

  def tenant(name: String): TenantDef =
    tenants.get(name).filterNot(_.hidden)
      .getOrElse(AdminError.meta(s"Tenant not found: \"$name\""))

  def createTenant(name: String, ifNotExists: Boolean,
                   opts: Map[String, String]): Unit = {
    validateName(name)
    opts.keys.find(k => !TenantOptions.contains(k)).foreach(k =>
      AdminError.parser(s"Unknown tenant option: $k"))
    // a HIDDEN tenant (deferred drop pending) still owns its name:
    // overwriting it would leave the armed DropTenant resource to
    // destroy the new tenant at the old deadline — RECOVER first
    if (tenants.contains(name)) {
      if (!ifNotExists) AdminError.meta(s"Tenant already exists: \"$name\"")
    } else {
      tenants(name) = TenantDef(name,
        comment = opts.get("comment"),
        dropAfter = opts.get("drop_after").map(normalizeDuration))
    }
  }

  def alterTenantSet(name: String, opt: String, value: String): Unit = {
    val t = tenant(name)
    opt match {
      case "comment"    => tenants(name) = t.copy(comment = Some(value))
      case "drop_after" => tenants(name) = t.copy(dropAfter = Some(normalizeDuration(value)))
      case other        => AdminError.parser(s"Unknown tenant option: $other")
    }
  }

  def alterTenantUnset(name: String, opt: String): Unit = {
    val t = tenant(name)
    opt match {
      case "comment"    => tenants(name) = t.copy(comment = None)
      case "drop_after" => tenants(name) = t.copy(dropAfter = None)
      case other        => AdminError.parser(s"Unknown tenant option: $other")
    }
  }

  def dropTenant(name: String, ifExists: Boolean, afterNs: Option[Long],
                 nowNs: Long): Unit = {
    if (name == SystemTenant)
      AdminError.semantic(s"Tenant '$SystemTenant' is prohibited from being dropped")
    tenants.get(name).filterNot(_.hidden) match {
      case None => if (!ifExists) AdminError.meta(s"Tenant not found: \"$name\"")
      case Some(t) =>
        // resources are keyed action|tenant|db — the DISPLAY name
        // ("tenant" / "tenant-db") is not unique once names may contain
        // '-' (quoted identifiers), and parsing it back would misroute
        // the deferred drop
        //
        // a tenant's drop_after OPTION is the DEFAULT delay for a bare
        // DROP TENANT (drop_and_recover_tenant.slt: `drop tenant
        // tenant_delay1` with drop_after='1m' set schedules, it does
        // not drop immediately); an explicit AFTER overrides it
        afterNs.orElse(t.dropAfter.map(parseDuration)) match {
          case Some(d) =>
            tenants(name) = t.copy(hidden = true)
            resources(s"DropTenant|$name|") =
              ResourceStatusEntry(name, "DropTenant", 0, "Schedule", nowNs + d, tenant = name)
          case None => tenants.remove(name); resources.remove(s"DropTenant|$name|")
        }
    }
  }

  def recoverTenant(name: String): Unit = tenants.get(name) match {
    case Some(t) if t.hidden =>
      tenants(name) = t.copy(hidden = false)
      val key = s"DropTenant|$name|"
      resources.get(key).foreach(r => resources(key) = r.copy(status = "Cancel"))
    case Some(_) => () // visible already — recover is a no-op
    case None    => AdminError.meta(s"Tenant not found: \"$name\"")
  }

  def addMember(tenantName: String, user: String, role: String): Unit = {
    val t = tenant(tenantName)
    if (!users.contains(user)) AdminError.meta(s"User not found: \"$user\"")
    if (!SystemRoles.contains(role) && !t.roles.contains(role))
      AdminError.meta(s"The role $role not found")
    tenants(tenantName) = t.copy(members = t.members + (user -> role))
  }

  def removeMember(tenantName: String, user: String): Unit = {
    val t = tenant(tenantName)
    if (!t.members.contains(user))
      AdminError.meta(s"The member $user of tenant $tenantName not found")
    tenants(tenantName) = t.copy(members = t.members - user)
  }

  // ---- users ---------------------------------------------------------

  def createUser(name: String, ifNotExists: Boolean,
                 opts: Map[String, String]): Unit = {
    validateName(name)
    if (users.contains(name)) {
      if (!ifNotExists) AdminError.meta(s"User already exists: \"$name\"")
    } else {
      users(name) = UserDef(name,
        comment = opts.get("comment"),
        mustChangePassword = opts.get("must_change_password").exists(_.toBoolean),
        passwordHash = opts.get("password").map(MetaCatalog.sha256Hex))
    }
  }

  def alterUserSet(name: String, opt: String, value: String): Unit = {
    val u = users.getOrElse(name, AdminError.meta(s"User not found: \"$name\""))
    opt match {
      case "granted_admin"        => users(name) = u.copy(admin = value.toBoolean)
      case "comment"              => users(name) = u.copy(comment = Some(value))
      case "must_change_password" => users(name) = u.copy(mustChangePassword = value.toBoolean)
      case "password"             => users(name) = u.copy(passwordHash = Some(MetaCatalog.sha256Hex(value)))
      case other                  => AdminError.parser(s"Unknown user option: $other")
    }
  }

  def dropUser(name: String, ifExists: Boolean): Unit = {
    if (name == RootUser)
      AdminError.semantic(s"User '$RootUser' is prohibited from being dropped")
    if (!users.contains(name)) { if (!ifExists) AdminError.meta(s"User not found: \"$name\"") }
    else {
      users.remove(name)
      tenants.mapValuesInPlace((_, t) => t.copy(members = t.members - name))
    }
  }

  // ---- roles / grants (tenant-scoped) --------------------------------

  def createRole(tenantName: String, role: String, inherit: String,
                 ifNotExists: Boolean): Unit = {
    val t = tenant(tenantName)
    if (!SystemRoles.contains(inherit))
      AdminError.semantic(s"Expected [owner,member], found $inherit")
    validateName(role)
    if (t.roles.contains(role) || SystemRoles.contains(role)) {
      if (!ifNotExists) AdminError.meta(s"Role already exists: \"$role\"")
    } else tenants(tenantName) = t.copy(roles = t.roles + (role -> RoleDef(role, inherit)))
  }

  def dropRole(tenantName: String, role: String, ifExists: Boolean): Unit = {
    val t = tenant(tenantName)
    if (!t.roles.contains(role)) { if (!ifExists) AdminError.meta(s"The role $role not found") }
    else tenants(tenantName) = t.copy(
      roles = t.roles - role,
      grants = t.grants.filterNot(_.role == role),
      members = t.members.filterNot { case (_, r) => r == role })
  }

  def grant(tenantName: String, db: String, role: String, level: String): Unit = {
    val t = tenant(tenantName)
    if (!t.databases.contains(db)) AdminError.meta(s"Database not found: \"$db\"")
    if (!t.roles.contains(role)) AdminError.meta(s"The role $role not found")
    val rest = t.grants.filterNot(g => g.database == db && g.role == role)
    tenants(tenantName) = t.copy(grants = rest :+ GrantDef(db, role, level))
  }

  def revoke(tenantName: String, db: String, role: String, level: String): Unit = {
    val t = tenant(tenantName)
    if (!t.roles.contains(role)) AdminError.meta(s"The role $role not found")
    if (!t.grants.exists(g => g.database == db && g.role == role && g.level == level))
      AdminError.meta(s"cannot revoke the privilege $level on database $db of role")
    tenants(tenantName) = t.copy(
      grants = t.grants.filterNot(g => g.database == db && g.role == role && g.level == level))
  }

  // ---- databases -----------------------------------------------------

  def database(tenantName: String, db: String): DatabaseDef =
    tenant(tenantName).databases.get(db).filterNot(_.hidden)
      .getOrElse(AdminError.meta(s"Database not found: \"$db\""))

  def createDatabase(tenantName: String, name: String, ifNotExists: Boolean,
                     d: DatabaseDef): Unit = {
    validateName(name)
    requireNotReservedDb(name)
    val t = tenant(tenantName)
    // hidden (drop-scheduled) databases also hold their name — see
    // createTenant
    if (t.databases.contains(name)) {
      if (!ifNotExists) AdminError.meta(s"Database already exists: \"$name\"")
    } else tenants(tenantName) = t.copy(databases = t.databases + (name -> d))
  }

  def alterDatabase(tenantName: String, name: String,
                    f: DatabaseDef => DatabaseDef): Unit = {
    val d = database(tenantName, name)
    val t = tenant(tenantName)
    tenants(tenantName) = t.copy(databases = t.databases + (name -> f(d)))
  }

  def dropDatabase(tenantName: String, name: String, ifExists: Boolean,
                   afterNs: Option[Long], nowNs: Long): Unit = {
    requireNotReservedDb(name)
    val t = tenant(tenantName)
    t.databases.get(name).filterNot(_.hidden) match {
      case None => if (!ifExists) AdminError.meta(s"Database not found: \"$name\"")
      case Some(d) =>
        val rname = s"$tenantName-$name"
        val key = s"DropDatabase|$tenantName|$name"
        afterNs match {
          case Some(delay) =>
            tenants(tenantName) = t.copy(databases = t.databases + (name -> d.copy(hidden = true)))
            resources(key) = ResourceStatusEntry(rname, "DropDatabase", 0, "Schedule",
              nowNs + delay, tenant = tenantName, db = name)
          case None =>
            tenants(tenantName) = t.copy(
              databases = t.databases - name,
              grants = t.grants.filterNot(_.database == name))
            resources.remove(key)
        }
    }
  }

  def recoverDatabase(tenantName: String, name: String): Unit = {
    val t = tenant(tenantName)
    t.databases.get(name) match {
      case Some(d) if d.hidden =>
        tenants(tenantName) = t.copy(databases = t.databases + (name -> d.copy(hidden = false)))
        val key = s"DropDatabase|$tenantName|$name"
        resources.get(key).foreach(r => resources(key) = r.copy(status = "Cancel"))
      case Some(_) => ()
      case None    => AdminError.meta(s"Database not found: \"$name\"")
    }
  }

  /** Execute every deferred drop whose deadline has passed (the meta
    * service's background resource executor; here an explicit tick so
    * tests replay deterministically).
    */
  def runDueResources(nowNs: Long): Vector[String] = {
    val due = resources.toVector.collect {
      case (key, r) if r.status == "Schedule" && r.dueAtNs <= nowNs => (key, r)
    }
    due.foreach { case (key, r) =>
      r.action match {
        case "DropTenant" => tenants.remove(r.tenant)
        case "DropDatabase" =>
          // same cleanup as the immediate path: grants must not outlive
          // the database and silently re-attach to a future same name
          tenants.get(r.tenant).foreach(t => tenants(r.tenant) = t.copy(
            databases = t.databases - r.db,
            grants = t.grants.filterNot(_.database == r.db)))
      }
      // the reference's terminal state (its spelling preserved):
      // Schedule → Executing → Successed; this executor is synchronous,
      // so the readable post-tick state is the terminal one
      // (drop_and_recover_tenant.slt's final resource_status rows)
      resources(key) = r.copy(status = "Successed", tryCount = r.tryCount + 1)
    }
    due.map(_._2.name)
  }

  // ---- tables --------------------------------------------------------

  def table(tenantName: String, db: String, name: String): TableDef =
    database(tenantName, db).tables.getOrElse(name,
      AdminError.meta(s"Table not found: \"$tenantName.$db.$name\""))

  def createTable(tenantName: String, db: String, t: TableDef,
                  ifNotExists: Boolean): Unit = {
    // same rules as tenants/databases: the name becomes a storage path
    // under tenant/db, so '/' (and quoted "../x") must be rejected here
    // too — ddl/create_table.slt pins 'tb/1' as a parse error
    validateName(t.name)
    val d = database(tenantName, db)
    if (d.tables.contains(t.name)) {
      if (!ifNotExists) AdminError.meta(s"Table already exists: \"${t.name}\"")
    } else alterDatabase(tenantName, db, _.copy(tables = d.tables + (t.name -> t)))
  }

  def createStreamTable(tenantName: String, db: String, st: StreamTableDef,
                        ifNotExists: Boolean): Unit = {
    validateName(st.name)
    val d = database(tenantName, db)
    // tskv and stream tables share one namespace: DROP TABLE addresses
    // both, so a name may hold at most one of either kind
    if (d.tables.contains(st.name) || d.streamTables.contains(st.name)) {
      if (!ifNotExists) AdminError.meta(s"Table already exists: \"${st.name}\"")
    } else alterDatabase(tenantName, db, _.copy(streamTables = d.streamTables + (st.name -> st)))
  }

  /** DROP TABLE addresses tskv AND stream tables (the reference's
    * stream suite drops stream tables with plain DROP TABLE). */
  def dropTable(tenantName: String, db: String, name: String, ifExists: Boolean): Unit = {
    val d = database(tenantName, db)
    if (d.tables.contains(name))
      alterDatabase(tenantName, db, _.copy(tables = d.tables - name))
    else if (d.streamTables.contains(name))
      alterDatabase(tenantName, db, _.copy(streamTables = d.streamTables - name))
    else if (!ifExists) AdminError.meta(s"Table not found: \"$tenantName.$db.$name\"")
  }

  def alterTable(tenantName: String, db: String, name: String,
                 f: TableDef => TableDef): Unit = {
    val t = table(tenantName, db, name)
    alterDatabase(tenantName, db, d => d.copy(tables = d.tables + (name -> f(t))))
  }

  // ---- persistence ---------------------------------------------------

  def snapshot: CatalogSnapshot =
    CatalogSnapshot(tenants.values.toVector, users.values.toVector,
      resources.values.toVector, synchronized(_writeSeq))

  def restore(s: CatalogSnapshot): Unit = {
    tenants.clear(); users.clear(); resources.clear()
    synchronized { _writeSeq = s.writeSeq }
    s.tenants.foreach(t => tenants(t.name) = t)
    s.users.foreach(u => users(u.name) = u)
    // re-derive the composite map key — every mutation path keys by
    // action|tenant|db; keying by the DISPLAY name here would strand a
    // RECOVERed drop as status=Schedule after a save/load round-trip
    // (resources.get(key) misses) and runDueResources would then drop
    // the recovered database/tenant
    s.resources.foreach(r => resources(s"${r.action}|${r.tenant}|${r.db}") = r)
  }

  /** Persist the catalog as one JSON document beside the lake, via the
    * Hadoop FileSystem API (write-aside + rename — atomic on HDFS and
    * file:, same caveat on S3A as the Dml lifecycle ops).
    */
  def save(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import org.json4s.{Formats, NoTypeHints}
    import org.json4s.jackson.Serialization
    implicit val fmts: Formats = Serialization.formats(NoTypeHints)
    val json = Serialization.write(snapshot)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8)) finally out.close()
    fs.delete(p, false)
    require(fs.rename(tmp, p), s"rename $tmp -> $p failed")
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import org.json4s.{Formats, NoTypeHints}
    import org.json4s.jackson.Serialization
    implicit val fmts: Formats = Serialization.formats(NoTypeHints)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    restore(Serialization.read[CatalogSnapshot](json))
  }
}

object MetaCatalog {
  val SystemTenant = "cnosdb"
  val RootUser = "root"
  val SystemRoles: Set[String] = Set("owner", "member")
  val TenantOptions: Set[String] = Set("comment", "drop_after")
  val ReservedDatabases: Set[String] =
    Set("public", "cluster_schema", "information_schema", "usage_schema")
  val NsPerDay: Long = 86400L * 1000000000L
  val NsPerYear: Long = 365L * NsPerDay

  /** Parse a reference duration literal ('100ms' '3m' '1h' '10d'
    * '1year') to nanoseconds. */
  def parseDuration(s: String): Long = {
    val m = "(?i)^(\\d+)\\s*(ns|us|ms|s|m|h|d|w|y|year|years|day|days|hour|hours|min|minute|minutes|inf)?$".r
      .findFirstMatchIn(s.trim)
      .getOrElse(AdminError.parser(s"invalid duration literal: '$s'"))
    val n = m.group(1).toLong
    val unit = Option(m.group(2)).map(_.toLowerCase).getOrElse("ns")
    val perUnit: Long = unit match {
      case "us" => 1000L
      case "ms" => 1000000L
      case "s" => 1000000000L
      case "m" | "min" | "minute" | "minutes" => 60L * 1000000000L
      case "h" | "hour" | "hours" => 3600L * 1000000000L
      case "d" | "day" | "days" => NsPerDay
      case "w" => 7L * NsPerDay
      case "y" | "year" | "years" => NsPerYear
      case _ => 1L
    }
    // 100000 years of nanoseconds overflows Long — reject loudly
    // instead of wrapping into a negative TTL
    try Math.multiplyExact(n, perUnit)
    catch { case _: ArithmeticException =>
      AdminError.parser(s"duration overflows the nanosecond range: '$s'") }
  }

  /** Format nanoseconds the way DESCRIBE DATABASE does: "10days",
    * "1year", "3hours", "30minutes" (largest exact unit).
    * ddl/alter_database.slt renders TTL '10d' as "10days". */
  def formatDuration(ns: Long): String = {
    if (ns % NsPerYear == 0L) { val n = ns / NsPerYear; s"$n${if (n == 1) "year" else "years"}" }
    else if (ns % NsPerDay == 0L) { val n = ns / NsPerDay; s"$n${if (n == 1) "day" else "days"}" }
    else if (ns % (3600L * 1000000000L) == 0L) { val n = ns / (3600L * 1000000000L); s"$n${if (n == 1) "hour" else "hours"}" }
    else if (ns % (60L * 1000000000L) == 0L) { val n = ns / (60L * 1000000000L); s"$n${if (n == 1) "minute" else "minutes"}" }
    else if (ns % 1000000000L == 0L) s"${ns / 1000000000L}s"
    else s"${ns}ns"
  }

  def normalizeDuration(s: String): String = formatDuration(parseDuration(s))

  def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
}
