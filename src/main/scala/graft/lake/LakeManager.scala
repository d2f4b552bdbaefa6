package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import com.fasterxml.jackson.databind.node.ObjectNode

/** Multi-dataset catalog at a lake root — the reference's "datalake"
  * manager (`/root/reference/src/pydala/datalake/manager.py:16-209`),
  * backed by `_pydala.json` (TOML in the reference, `manager.py:48`).
  */
final class LakeManager(spark: SparkSession, root: String) {

  import TimeFly.mapper

  private val cfgPath = new Path(root, "_pydala.json")
  private val tomlCfgPath = new Path(root, "_pydala.toml")
  private def fs =
    cfgPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // Dual-format lake config, like TimeFly's dataset metadata: the
  // reference persists `_pydala.toml` (`manager.py:48`) with the SAME
  // top-level sections we use (pydala / dataset, `manager.py:66-88`) —
  // no layout translation needed. Reads prefer our JSON, fall back to a
  // reference-written TOML; writes mirror both.
  private def readCfg(): ObjectNode =
    if (fs.exists(cfgPath)) {
      val in = fs.open(cfgPath)
      try mapper.readTree(in).asInstanceOf[ObjectNode]
      finally in.close()
    } else if (fs.exists(tomlCfgPath)) {
      Toml.parse(TimeFly.readText(fs, tomlCfgPath))
    } else {
      val n = mapper.createObjectNode()
      n.putObject("pydala").put("name", new Path(root).getName)
      n.putObject("dataset")
      n
    }

  private def writeCfg(n: ObjectNode): Unit = {
    val out = fs.create(cfgPath, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(n))
    finally out.close()
    val tout = fs.create(tomlCfgPath, true)
    try tout.write(Toml.render(n)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally tout.close()
  }

  /** Init lake config (`manager.py:53-88`). */
  def init(): LakeManager = {
    fs.mkdirs(new Path(root))
    writeCfg(readCfg())
    this
  }

  /** Discover datasets by scanning for metadata files
    * (`manager.py:90-114`, glob `**_dataset.toml`) — either codec flavor
    * marks a dataset, so reference-written lakes are discoverable. */
  def discover(): Seq[String] = {
    val buf = scala.collection.mutable.LinkedHashSet[String]()
    def walk(p: Path): Unit = {
      if (!fs.exists(p)) return
      fs.listStatus(p).foreach { s =>
        val name = s.getPath.getName
        if (s.isDirectory) walk(s.getPath)
        else if (name == "_dataset.json" || name == "_dataset.toml")
          buf += s.getPath.getParent.toString
      }
    }
    walk(new Path(root))
    buf.toSeq.sorted
  }

  /** Register a dataset (`manager.py:136-180`), creating its TimeFly
    * metadata if absent. Also surfaces the dataset in `spark.catalog` as
    * a temp view when it already holds data (the C3 mapping, SURVEY
    * §2.12) — datasets written after registration become SQL-visible via
    * [[registerView]]/[[registerViews]]. */
  def addDataset(name: String, description: String = ""): TimeFly = {
    val tf = dataset(name)
    if (!tf.exists()) tf.init(name, description)
    val path = new Path(root, name).toString
    val cfg = readCfg()
    val ds = cfg.withObject("/dataset").putObject(name)
    ds.put("name", name)
    ds.put("path", path)
    ds.put("description", description)
    writeCfg(cfg)
    registerView(name)
    tf
  }

  /** Make `name` queryable as `spark.sql("SELECT … FROM name")`: a temp
    * view over its CURRENT data. Returns false (no-op) while the dataset
    * has no data files — a parquet scan needs at least one footer — or
    * when the name isn't a valid SQL identifier (datasets may carry any
    * filesystem-legal name; registration must not break addDataset for
    * them). The view captures the file listing at call time; writes made
    * through a [[dataset]]-obtained TimeFly re-register automatically
    * (temp views are session-scoped metadata, this is cheap). */
  def registerView(name: String): Boolean = {
    if (!name.matches("[A-Za-z_][A-Za-z0-9_]*")) return false
    if (datasetKind(name) == "commitlog") return registerCommitView(name)
    val tf = dataset(name)
    val hasData =
      SchemaTools.listDataFiles(spark, tf.currentPath).nonEmpty
    // Try: a reserved keyword as a name (parse-rejected under
    // enforceReservedKeywords) must not abort registration of the
    // REMAINING datasets in registerViews()
    hasData &&
      scala.util.Try(tf.read().createOrReplaceTempView(name)).isSuccess
  }

  /** Sync every registered dataset into `spark.catalog`; returns the
    * names that became (or stayed) SQL-visible. */
  def registerViews(): Seq[String] = tables.filter(registerView)

  /** Deregister, drop the SQL view, and optionally delete files
    * (`manager.py:182-190`). */
  def removeDataset(name: String, deleteFiles: Boolean = false): Unit = {
    val cfg = readCfg()
    cfg.withObject("/dataset").remove(name)
    writeCfg(cfg)
    // non-identifier (or reserved-keyword) names never got a view;
    // dropTempView parses the name and would throw rather than return
    // false — and a throw here would leave the remove half-done (cfg
    // rewritten, files kept)
    if (name.matches("[A-Za-z_][A-Za-z0-9_]*"))
      scala.util.Try(spark.catalog.dropTempView(name))
    if (deleteFiles) fs.delete(new Path(root, name), true)
  }

  /** Registered table names (`manager.py:192-196`). */
  def tables: Seq[String] = {
    val cfg = readCfg()
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    cfg.withObject("/dataset").fieldNames().forEachRemaining(buf += _)
    buf.toSeq.sorted
  }

  private def datasetKind(name: String): String =
    readCfg().withObject("/dataset").path(name).path("kind")
      .asText("timefly")

  /** Register a MULTI-WRITER commit-log dataset in the catalog: its
    * SQL view resolves the LOG (staged/uncommitted files invisible by
    * construction) and refreshes on every commit made through a handle
    * from [[commitLog]]. The `kind` marker routes [[registerViews]] to
    * the right flavor; everything else (tables, remove) is shared. */
  def addCommitLog(name: String, description: String = ""): CommitLog = {
    val cfg = readCfg()
    val ds = cfg.withObject("/dataset").putObject(name)
    ds.put("name", name)
    ds.put("path", new Path(root, name).toString)
    ds.put("description", description)
    ds.put("kind", "commitlog")
    writeCfg(cfg)
    commitLog(name)
  }

  /** Commit-log handle wired to keep the SQL view fresh per commit. */
  def commitLog(name: String): CommitLog =
    CommitLog(spark, new Path(root, name).toString).init()
      .onCommit(() => registerCommitView(name))

  private def registerCommitView(name: String): Boolean = {
    if (!name.matches("[A-Za-z_][A-Za-z0-9_]*")) return false
    val log = CommitLog(spark, new Path(root, name).toString)
    log.latestVersion() > 0 &&
      scala.util.Try(log.read(None).createOrReplaceTempView(name))
        .isSuccess
  }

  /** TimeFly handle wired to keep the dataset's SQL view fresh: any
    * write through `tf.writer(...)` or snapshot restore re-registers the
    * temp view, so `spark.sql` never answers from a stale file listing
    * (the reference re-registers on every materialization,
    * `dataset/reader.py:252`). */
  def dataset(name: String): TimeFly =
    TimeFly(spark, new Path(root, name).toString)
      .onDataChange(() => registerView(name))

  /** Reader over a catalog entry (`datalake/reader.py:12-80` — the
    * reference file is partially broken; this is the evident intent). */
  def reader(name: String, asOf: Option[String] = None): DataFrame =
    dataset(name).read(asOf)

  /** Resolve a (possibly lake-qualified) identifier path to a managed
    * commit-log table name. Accepts `t` and `<lake>.t` where `<lake>`
    * is this lake's configured name (case-insensitive, `_pydala.json`
    * `pydala.name`); any other qualifier names a foreign catalog and
    * is not ours to dispatch — the statement falls through to
    * `spark.sql` untouched. A qualifier that MATCHES the lake name but
    * whose last part is not a cataloged commit-log table refuses
    * loudly: the user addressed this lake explicitly, so a silent
    * fall-through would run the statement against some unrelated
    * same-named Spark table. */
  private def lakeName: String =
    readCfg().withObject("/pydala").path("name")
      .asText(new Path(root).getName)

  private def managedName(parts: Seq[String]): Option[String] = {
    val candidate = parts match {
      case Seq(t) => Some((t, false))
      case Seq(q, t) if q.equalsIgnoreCase(lakeName) => Some((t, true))
      case _ => None
    }
    candidate.flatMap { case (t, explicit) =>
      if (tables.contains(t) && datasetKind(t) == "commitlog") Some(t)
      else if (explicit) throw new IllegalArgumentException(
        s"$lakeName.$t names this lake but '$t' is not a managed " +
          s"commit-log table (have: ${tables.mkString(", ")})")
      else None
    }
  }

  /** `CREATE TABLE [IF NOT EXISTS] t [(cols)] USING commitlog
    * [PARTITIONED BY (c, ...)] [TBLPROPERTIES (...)]` — and the CTAS
    * flavor — create a managed commit-log dataset in THIS lake's
    * catalog. Identity partitions map to the hive-partitioned flavor
    * (other transforms refuse); declared `NOT NULL` columns land as
    * invariants ([[CommitLog.setNotNull]]); TBLPROPERTIES as a meta
    * commit; a declared schema is recorded by a zero-row founding
    * append so the first INSERT conforms positionally against it.
    * None (pass through to `spark.sql`) unless the USING clause names
    * `commitlog`; a commitlog CREATE qualified to a FOREIGN catalog
    * refuses loudly. */
  private def createManaged(
      nameChild: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      spec: org.apache.spark.sql.catalyst.plans.logical.TableSpecBase,
      partitioning: Seq[org.apache.spark.sql.connector.expressions.Transform],
      columns: Seq[org.apache.spark.sql.catalyst.plans.logical.ColumnDefinition],
      data: Option[DataFrame],
      ignoreIfExists: Boolean): Option[DataFrame] = {
    import org.apache.spark.sql.catalyst.plans.logical.UnresolvedTableSpec
    val us = spec match {
      case u: UnresolvedTableSpec => u
      case _ => return None
    }
    if (!us.provider.exists(_.equalsIgnoreCase("commitlog")))
      return None
    val parts = nameChild match {
      case id: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier =>
        id.nameParts
      case _ => return None
    }
    val t = parts match {
      case Seq(x) => x
      case Seq(q, x) if q.equalsIgnoreCase(lakeName) => x
      case other => throw new IllegalArgumentException(
        s"USING commitlog creates in THIS lake ($lakeName); cannot " +
          s"create ${other.mkString(".")}")
    }
    require(t.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"commit-log table names must be SQL identifiers: $t")
    if (tables.contains(t)) {
      if (ignoreIfExists) return Some(commitLog(t).read(None))
      throw new IllegalArgumentException(s"table $t already exists")
    }
    // CLUSTER BY (Delta's liquid clustering) is NOT a partitioning:
    // the keys record as table metadata and OPTIMIZE incrementally
    // z-orders unclustered files on them ([[CommitLog.optimizeCluster]])
    val clusterCols: Seq[String] = partitioning.collect {
      case org.apache.spark.sql.connector.expressions
          .ClusterByTransform(cols) =>
        cols.map { c =>
          require(c.fieldNames.length == 1,
            s"nested clustering references are not supported: $c")
          c.fieldNames.head
        }
    }.flatten
    // validate at DECLARATION time (the ALTER path's rule): a typo'd
    // key failing only at the first scheduled OPTIMIZE would point
    // nowhere near the CREATE that caused it. Case-insensitive;
    // recorded with the declared column's exact case. CTAS (no
    // declared columns) validates against the query's columns.
    val declNames: Seq[String] =
      if (columns.nonEmpty) columns.map(_.name)
      else data.map(_.columns.toSeq).getOrElse(Nil)
    val clusterColsResolved: Seq[String] =
      if (clusterCols.isEmpty || declNames.isEmpty) clusterCols
      else {
        val byLc = declNames
          .map(c => c.toLowerCase(java.util.Locale.ROOT) -> c).toMap
        clusterCols.map { k =>
          byLc.getOrElse(k.toLowerCase(java.util.Locale.ROOT),
            throw new IllegalArgumentException(
              s"CLUSTER BY names unknown column: $k"))
        }
      }
    val partCols: Seq[String] = partitioning.filterNot(
      _.isInstanceOf[org.apache.spark.sql.connector.expressions
        .ClusterByTransform]).map {
      case t if t.name == "identity" && t.references.length == 1 =>
        val fn = t.references.head.fieldNames
        require(fn.length == 1,
          s"nested partition references are not supported: $t")
        fn.head
      case o => throw new IllegalArgumentException(
        s"commitlog tables support identity partitioning only, got $o")
    }
    val log = addCommitLog(t)
    if (partCols.nonEmpty) log.initPartitioned(partCols)
    data match {
      case Some(df) => log.append(df)
      case None if columns.nonEmpty =>
        val schema = org.apache.spark.sql.types.StructType(
          columns.map(c => org.apache.spark.sql.types.StructField(
            c.name, c.dataType, nullable = true)))
        log.append(spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
      case None => ()
    }
    columns.filterNot(_.nullable).foreach(c => log.setNotNull(c.name))
    // identity / generated column declarations ride as namespaced
    // meta properties — versioned and checkpoint-folded like the
    // NOT NULL invariants above ([[CommitLog.appendResolvingDefaults]])
    val autoProps: Map[String, String] = columns.flatMap { c =>
      val idp = c.identityColumnSpec.map { s =>
        require(Seq[org.apache.spark.sql.types.DataType](
            org.apache.spark.sql.types.LongType,
            org.apache.spark.sql.types.IntegerType,
            org.apache.spark.sql.types.ShortType,
            org.apache.spark.sql.types.ByteType).contains(c.dataType),
          s"identity column ${c.name} must be an integral type")
        require(s.getStep != 0L,
          s"identity column ${c.name}: INCREMENT BY 0 is not a step")
        s"${CommitLog.IdentityColPrefix}${c.name}" ->
          s"${s.getStart},${s.getStep},${s.isAllowExplicitInsert}"
      }
      val gp = c.generationExpression.map(g =>
        s"${CommitLog.GeneratedColPrefix}${c.name}" -> g)
      val dp = c.defaultValue.map(d =>
        s"${CommitLog.DefaultColPrefix}${c.name}" -> d.originalSQL)
      idp.toSeq ++ gp.toSeq ++ dp.toSeq
    }.toMap
    // the DECLARED order is the positional-INSERT contract; record it
    // like ADD COLUMNS does — the empty partitioned frame would
    // otherwise serve partition-first order and rotate the binding
    val orderProp: Map[String, String] =
      if (columns.isEmpty) Map.empty
      else Map(LakeManager.ColumnOrderProp ->
        columns.map(_.name).mkString(","))
    val clusterProp: Map[String, String] =
      if (clusterColsResolved.isEmpty) Map.empty
      else Map(CommitLog.ClusterByKey ->
        clusterColsResolved.mkString(","))
    val allProps = us.properties ++ autoProps ++ orderProp ++ clusterProp
    if (allProps.nonEmpty) log.setProperties(allProps)
    Some(log.read(None))
  }

  /** An empty frame over a declared column list (the bare REPLACE
    * TABLE flavor's payload); None when no columns were declared. */
  private def colsFrame(
      columns: Seq[org.apache.spark.sql.catalyst.plans.logical
        .ColumnDefinition]): Option[DataFrame] =
    if (columns.isEmpty) None
    else Some(spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(
        columns.map(c => org.apache.spark.sql.types.StructField(
          c.name, c.dataType, nullable = true)))))

  /** `[CREATE OR] REPLACE TABLE ... USING commitlog [AS <query>]` —
    * Delta's semantics: a STANDING managed table's live set swaps by
    * ONE `replace` commit (history survives — time travel before the
    * replace still serves); a missing table refuses unless OR
    * CREATE, which creates it fresh. Non-commitlog/foreign targets
    * pass through to `spark.sql`. */
  private def replaceManaged(
      nameChild: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      spec: org.apache.spark.sql.catalyst.plans.logical.TableSpecBase,
      partitioning: Seq[org.apache.spark.sql.connector.expressions.Transform],
      columns: Seq[org.apache.spark.sql.catalyst.plans.logical.ColumnDefinition],
      data: Option[DataFrame],
      orCreate: Boolean,
      statement: String): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.UnresolvedTableSpec
    val commitlogSpec = spec match {
      case u: UnresolvedTableSpec =>
        u.provider.exists(_.equalsIgnoreCase("commitlog"))
      case _ => false
    }
    val nameOpt = nameChild match {
      case id: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier =>
        managedName(id.nameParts)
          .orElse(if (commitlogSpec && id.nameParts.size == 1)
            Some(id.nameParts.head) else None)
      case _ => None
    }
    nameOpt match {
      case Some(t) if tables.contains(t) =>
        require(partitioning.isEmpty,
          "REPLACE TABLE keeps the standing table's partitioning — " +
            "re-declaring it is not supported")
        require(columns.forall(c => c.identityColumnSpec.isEmpty &&
            c.generationExpression.isEmpty && c.defaultValue.isEmpty),
          "REPLACE TABLE keeps the standing table's column " +
            "declarations — identity/generated/DEFAULT " +
            "re-declarations are not supported (DROP and CREATE)")
        val log = commitLog(t)
        val payload = data.orElse(colsFrame(columns)).getOrElse(
          throw new IllegalArgumentException(
            "REPLACE TABLE on a managed table wants columns or AS " +
              "<query>"))
        log.replace(payload, log.latestVersion())
        log.read(None)
      case Some(_) if orCreate =>
        // OR CREATE over nothing standing = plain CREATE
        createManaged(nameChild, spec, partitioning, columns, data,
          ignoreIfExists = false)
          .getOrElse(spark.sql(statement))
      case Some(t) =>
        throw new IllegalArgumentException(
          s"no table $t to replace — use CREATE OR REPLACE")
      case _ => spark.sql(statement)
    }
  }

  /** Statement-shape dispatch for the maintenance verbs — Delta's SQL
    * surface that Spark's parser does not know, matched BEFORE the
    * parser (exactly what a parser extension would do) and only when
    * the target resolves to a managed commit-log table:
    *
    *  - `OPTIMIZE t [WHERE <pred>] [ZORDER BY (c, ...)]` →
    *    [[CommitLog.optimize]]; returns ONE metrics row (version,
    *    files_before, files_after, rewrote). Target file count comes
    *    from the `optimize.target.files` table property (default 1).
    *  - `VACUUM t [RETAIN <n> HOURS]` → [[CommitLog.vacuum]]; one row
    *    (files_deleted). No RETAIN = the default retention window.
    *  - `RESTORE [TABLE] t [TO] VERSION AS OF n | TIMESTAMP AS OF e`
    *    → [[CommitLog.restore]]; one row (restored_version,
    *    new_version). Timestamps resolve through the same rule as
    *    SELECT-side travel ([[CommitLog.versionAt]]).
    *  - `REORG TABLE t APPLY (PURGE)` → [[CommitLog.reorgPurge]]:
    *    rewrite only the dv-marked files, retire the applied marks.
    *  - `INSERT INTO t REPLACE WHERE <pred> <query>` →
    *    [[CommitLog.replaceWhere]]: atomic band swap (the predicate
    *    ends at the first SELECT token — subquery predicates split
    *    wrong; use the programmatic API for those).
    *  - `DESC[RIBE] HISTORY t` → [[CommitLog.history]].
    *  - `DESC[RIBE] DETAIL t` → [[CommitLog.detail]] — the one-row
    *    table summary, manifests + file statuses only.
    *
    * None = not a maintenance shape on a managed table; the caller
    * falls through to the stock parser (whose parse error is the
    * right refusal for these verbs on foreign tables). A WHERE
    * predicate containing the token `ZORDER BY` is ambiguous under
    * shape matching and splits at the first occurrence — quote such
    * literals or call [[CommitLog.optimize]] directly. */
  private def maintenanceSql(statement: String): Option[DataFrame] = {
    import spark.implicits._
    def managedTableName(token: String): Option[String] = {
      val parts = token.split('.').toSeq.map { p =>
        if (p.length >= 2 && p.startsWith("`") && p.endsWith("`"))
          p.substring(1, p.length - 1)
        else p
      }
      managedName(parts)
    }
    def managed(token: String): Option[CommitLog] =
      managedTableName(token).map(commitLog)
    // dotted path of plain or backquoted parts (a backquoted part
    // containing a literal dot is not addressable through the
    // maintenance verbs — use the programmatic API for such names)
    val Part = "(?:`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)"
    val Ident = s"($Part(?:\\.$Part)*)"
    val DescHist =
      ("(?is)^\\s*DESC(?:RIBE)?\\s+HISTORY\\s+" + Ident +
        "\\s*;?\\s*$").r
    val DescDetail =
      ("(?is)^\\s*DESC(?:RIBE)?\\s+DETAIL\\s+" + Ident +
        "\\s*;?\\s*$").r
    val Vac =
      ("(?is)^\\s*VACUUM\\s+" + Ident +
        "(?:\\s+RETAIN\\s+(\\d+)\\s+HOURS?)?" +
        "(?:\\s+(DRY\\s+RUN))?\\s*;?\\s*$").r
    val Rest =
      ("(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?" + Ident +
        "\\s+(?:TO\\s+)?(?:VERSION\\s+AS\\s+OF\\s+(\\d+)" +
        "|TIMESTAMP\\s+AS\\s+OF\\s+(.+?))\\s*;?\\s*$").r
    val Opt =
      ("(?is)^\\s*OPTIMIZE\\s+" + Ident +
        "(?:\\s+WHERE\\s+(.+?))?" +
        "(?:\\s+ZORDER\\s+BY\\s+(.+?))?\\s*;?\\s*$").r
    val Reorg =
      ("(?is)^\\s*REORG\\s+TABLE\\s+" + Ident +
        "\\s+APPLY\\s*\\(\\s*PURGE\\s*\\)\\s*;?\\s*$").r
    // the predicate ends at the first SELECT keyword (non-greedy) — a
    // predicate CONTAINING a subquery splits wrong under shape
    // matching; call CommitLog.replaceWhere directly for those
    val RepWhere =
      ("(?is)^\\s*INSERT\\s+INTO\\s+" + Ident +
        "\\s+REPLACE\\s+WHERE\\s+(.+?)\\s+(SELECT\\s.+?)\\s*;?\\s*$").r
    val Clone =
      ("(?is)^\\s*CREATE\\s+TABLE\\s+(?:(IF\\s+NOT\\s+EXISTS)\\s+)?" +
        Ident + "\\s+(?:(SHALLOW|DEEP)\\s+)?CLONE\\s+" + Ident +
        "\\s*;?\\s*$").r
    val SyncId =
      ("(?is)^\\s*ALTER\\s+TABLE\\s+" + Ident +
        "\\s+ALTER\\s+COLUMN\\s+(" + Part + ")\\s+SYNC\\s+IDENTITY" +
        "\\s*;?\\s*$").r
    val AlterCluster =
      ("(?is)^\\s*ALTER\\s+TABLE\\s+" + Ident +
        "\\s+CLUSTER\\s+BY\\s+(?:\\(([^)]*)\\)|NONE)\\s*;?\\s*$").r
    val Copy =
      ("(?is)^\\s*COPY\\s+INTO\\s+" + Ident +
        "\\s+FROM\\s+'([^']+)'" +
        "\\s+FILEFORMAT\\s*=\\s*([A-Za-z]+)" +
        "(?:\\s+PATTERN\\s*=\\s*'([^']+)')?" +
        // option bodies are quoted-string-aware: a ')' INSIDE a quoted
        // value (a CSV quote, a regex-ish pattern) must not truncate
        // the group and silently fall through to the stock parser
        "(?:\\s+FORMAT_OPTIONS\\s*\\(((?:'[^']*'|[^')])*)\\))?" +
        "(?:\\s+COPY_OPTIONS\\s*\\(((?:'[^']*'|[^')])*)\\))?" +
        "\\s*;?\\s*$").r
    val CreateMv =
      ("(?is)^\\s*CREATE\\s+MATERIALIZED\\s+VIEW\\s+" +
        "(?:(IF\\s+NOT\\s+EXISTS)\\s+)?" + Ident +
        "\\s+AS\\s+(SELECT\\s.+?)\\s*;?\\s*$").r
    val RefreshMv =
      ("(?is)^\\s*REFRESH\\s+MATERIALIZED\\s+VIEW\\s+" + Ident +
        "(?:\\s+(FULL))?\\s*;?\\s*$").r
    // 'k' = 'v' pairs inside FORMAT_OPTIONS / COPY_OPTIONS — matched
    // as quoted pairs, NOT split on commas (a CSV 'sep' = ',' is the
    // canonical value holding one); leftover non-separator text
    // refuses loudly
    def optMap(s: String): Map[String, String] =
      if (s == null || s.trim.isEmpty) Map.empty
      else {
        val Pair = "'([^']*)'\\s*=\\s*'([^']*)'".r
        val pairs = Pair.findAllMatchIn(s)
          .map(m => m.group(1) -> m.group(2)).toSeq
        val leftover = Pair.replaceAllIn(s, "")
          .replaceAll("[\\s,]", "")
        require(pairs.nonEmpty && leftover.isEmpty,
          s"malformed options (want 'k' = 'v', ...): $s")
        pairs.toMap
      }
    def simpleName(token: String): String = {
      val parts = token.split('.').toSeq.map { p =>
        if (p.length >= 2 && p.startsWith("`") && p.endsWith("`"))
          p.substring(1, p.length - 1)
        else p
      }
      val t = parts match {
        case Seq(x) => x
        case Seq(q, x) if q.equalsIgnoreCase(lakeName) => x
        case other => throw new IllegalArgumentException(
          s"SHALLOW CLONE creates in THIS lake ($lakeName); cannot " +
            s"create ${other.mkString(".")}")
      }
      require(t.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"commit-log table names must be SQL identifiers: $t")
      t
    }
    statement match {
      // zero-copy table clone (Delta's CREATE TABLE ... SHALLOW
      // CLONE): the clone's founding commit RE-REFERENCES the
      // source's live files — O(metadata) at any data size; the two
      // logs are independent afterwards ([[CommitLog.cloneTo]])
      case Clone(ine, destTok, flavor, srcTok) =>
        managed(srcTok).map { srcLog =>
          val dest = simpleName(destTok)
          if (tables.contains(dest)) {
            require(ine != null,
              s"table $dest already exists")
            commitLog(dest).read(None)
          } else {
            // bare CLONE = DEEP (Delta's default): an independent
            // physical copy; SHALLOW is the zero-copy dev branch
            if (flavor != null && flavor.equalsIgnoreCase("shallow"))
              srcLog.cloneTo(new Path(root, dest).toString)
            else
              srcLog.deepCloneTo(new Path(root, dest).toString)
            val log = addCommitLog(dest)
            registerCommitView(dest)
            log.read(None)
          }
        }
      // idempotent file ingest (Databricks' COPY INTO): files load
      // exactly once by (path, size, mtime) identity; rerunning the
      // statement after a crash or on a schedule never duplicates
      case Copy(t, path, fmt, pat, fopts, copts) =>
        managed(t).map { log =>
          val co = optMap(copts)
          val (v, nf, nr) = log.copyInto(path, fmt, Option(pat),
            force = co.get("force").exists(_.equalsIgnoreCase("true")),
            formatOptions = optMap(fopts),
            mergeSchema =
              co.get("mergeSchema").exists(_.equalsIgnoreCase("true")))
          Seq((nr, nf, v))
            .toDF("num_inserted_rows", "num_files_loaded", "version")
        }
      // materialized aggregate view + incremental refresh off the
      // change feed (the Databricks MV surface; see
      // [[createMaterializedView]]). The body parses through Spark's
      // OWN parser — the Aggregate node supplies keys, aggregate
      // expressions (rendered back to SQL for the metadata), and the
      // source relation; anything but the one maintainable shape
      // (bare-column keys, aliased aggregates, one managed source)
      // refuses loudly
      case CreateMv(ine, nameTok, body) =>
        import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
        import org.apache.spark.sql.catalyst.expressions.Alias
        import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, SubqueryAlias}
        val mvName = simpleName(nameTok)
        if (tables.contains(mvName)) {
          require(ine != null, s"table $mvName already exists")
          Some(commitLog(mvName).read(None))
        } else spark.sessionState.sqlParser.parsePlan(body) match {
          case Aggregate(groupExprs, aggExprs, child, _) =>
            def rel(p: LogicalPlan): Option[Seq[String]] = p match {
              case r: org.apache.spark.sql.catalyst.analysis
                  .UnresolvedRelation => Some(r.multipartIdentifier)
              case SubqueryAlias(_, c) => rel(c)
              case _ => None
            }
            rel(child).flatMap(managedName).map { src =>
              val keys = groupExprs.map {
                case a: UnresolvedAttribute if a.nameParts.size == 1 =>
                  a.name
                case o => throw new IllegalArgumentException(
                  "materialized views group by bare source columns " +
                    s"only, got: ${o.sql}")
              }
              val aggs = aggExprs.flatMap {
                case a: UnresolvedAttribute if a.nameParts.size == 1 =>
                  require(keys.contains(a.name),
                    s"non-aggregate select item must be a group key: " +
                      a.name)
                  None
                case al: Alias => Some(al.child.sql -> al.name)
                case o => throw new IllegalArgumentException(
                  s"alias every aggregate (… AS name): ${o.sql}")
              }
              createMaterializedView(mvName, src, keys, aggs)
              commitLog(mvName).read(None)
            }
          case _ => throw new IllegalArgumentException(
            "materialized views take the one incrementally-" +
              "maintainable shape: SELECT <keys, aggs> FROM " +
              "<managed table> GROUP BY <keys>")
        }
      case RefreshMv(t, full) =>
        managedTableName(t).map(n =>
          refreshMaterializedView(n, full = full != null))
      // re-derive an identity high-water mark from the data (the
      // post-RESTORE / post-bulk-load recovery verb)
      // change (or drop) the liquid-clustering keys — Delta's ALTER
      // TABLE ... CLUSTER BY. The clustered-ness markers are
      // key-aware, so the next bare OPTIMIZE re-clusters every file
      // laid out under the OLD keys and nothing else
      case AlterCluster(t, cols) => managed(t).map { log =>
        val ks = Option(cols).toSeq.flatMap(_.split(',').toSeq
          .map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty))
        // validate HERE (Delta does): a typo'd key failing only at
        // the next scheduled OPTIMIZE would point nowhere near the
        // ALTER that caused it. Case-insensitive like SQL resolution;
        // the recorded key keeps the standing column's exact case so
        // downstream expr() references resolve.
        val standing = log.read(None).columns.toSeq
        val byLc = standing
          .map(c => c.toLowerCase(java.util.Locale.ROOT) -> c).toMap
        val unknown = ks.filterNot(k =>
          byLc.contains(k.toLowerCase(java.util.Locale.ROOT)))
        require(standing.isEmpty || unknown.isEmpty,
          s"CLUSTER BY names unknown column(s): " +
            s"${unknown.mkString(", ")}")
        val ksResolved =
          if (standing.isEmpty) ks
          else ks.map(k => byLc(k.toLowerCase(java.util.Locale.ROOT)))
        val v =
          if (ksResolved.isEmpty) log.unsetProperties(
            Seq(CommitLog.ClusterByKey), ifExists = true)
          else log.setProperties(
            Map(CommitLog.ClusterByKey -> ksResolved.mkString(",")))
        Seq((ksResolved.mkString(","), v)).toDF("cluster_by", "version")
      }
      case SyncId(t, c) => managed(t).map { log =>
        val cname = c.stripPrefix("`").stripSuffix("`")
        val v = log.syncIdentity(cname)
        Seq((cname, v)).toDF("column", "version")
      }
      case DescHist(t) => managed(t).map(_.history())
      case DescDetail(t) => managed(t).map(_.detail())
      case Vac(t, hours, dry) => managed(t).map { log =>
        val retainMs = Option(hours).map(_.toLong * 3600000L)
          .getOrElse(CommitLog.RetentionMs)
        if (dry != null) // the paths the sweep WOULD delete, untouched
          log.vacuumDryRun(retainMs).toDF("path")
        else Seq(log.vacuum(retainMs)).toDF("files_deleted")
      }
      case Rest(t, v, tsExpr) => managed(t).map { log =>
        val toV =
          if (v != null) v.toLong
          else {
            val ts = spark
              .sql(s"SELECT CAST($tsExpr AS TIMESTAMP)")
              .head().getTimestamp(0)
            require(ts != null,
              s"TIMESTAMP AS OF $tsExpr is not a timestamp")
            log.versionAt(ts.getTime)
          }
        val newV = log.restore(toV)
        Seq((toV, newV)).toDF("restored_version", "new_version")
      }
      // predicate-scoped atomic overwrite (Delta's INSERT INTO ...
      // REPLACE WHERE): delete the band + land the query's rows as
      // ONE commit; batch rows outside the band refuse. The query
      // binds POSITIONALLY against the table's declared column order
      // (the SQL INSERT contract — by-name binding would silently
      // null-fill an unaliased computed column); DEFAULT columns may
      // be omitted (reduced arity), filled by the executor.
      case RepWhere(t, pred, query) => managed(t).map { log =>
        val q0 = spark.sql(query)
        val unified = log.read(None).schema
        val q =
          if (unified.isEmpty) q0
          else {
            val order: Seq[String] = log.properties()
              .get(LakeManager.ColumnOrderProp) match {
                case Some(o) =>
                  val declared = o.split(",").toSeq
                    .filter(unified.fieldNames.contains)
                  declared ++
                    unified.fieldNames.toSeq.filterNot(declared.contains)
                case None => unified.fieldNames.toSeq
              }
            val defs = log.defaultColumns().keySet
            val nonDefault = order.filterNot(defs.contains)
            val target =
              if (q0.columns.length == order.length) order
              else if (q0.columns.length == nonDefault.length) nonDefault
              else throw new IllegalArgumentException(
                s"REPLACE WHERE arity ${q0.columns.length} matches " +
                  s"neither the table arity (${order.length}) nor its " +
                  s"non-DEFAULT arity (${nonDefault.length})")
            q0.toDF(target: _*)
          }
        val (v, touched) = log.replaceWhere(q, pred.trim)
        Seq((v, touched.toLong))
          .toDF("version", "num_affected_files")
      }
      // deletion-vector purge (Delta's REORG TABLE ... APPLY (PURGE)):
      // rewrite ONLY the files carrying standing positional marks and
      // retire the fully-applied dv tombstones in the same commit
      case Reorg(t) => managed(t).map { log =>
        val before = log.liveFiles(None).size
        val v = log.reorgPurge()
        Seq((v.getOrElse(log.latestVersion()), before.toLong,
          log.liveFiles(None).size.toLong, v.isDefined))
          .toDF("version", "files_before", "files_after", "rewrote")
      }
      case Opt(t, where, zorder) => managed(t).map { log =>
        val zcols: Seq[String] = Option(zorder).toSeq.flatMap { z =>
          z.trim.stripPrefix("(").stripSuffix(")").split(',').toSeq
            .map(_.trim.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty)
        }
        val target = log.properties(None)
          .get("optimize.target.files").map(_.toInt).getOrElse(1)
        val before = log.liveFiles(None).size
        // bare OPTIMIZE on a CLUSTER BY table re-clusters
        // incrementally (Delta's liquid-clustering behavior): only
        // files not yet clustered on the declared keys rewrite
        val rewrote =
          if (zcols.isEmpty && where == null &&
              log.clusterKeys().nonEmpty)
            log.optimizeCluster(targetFiles = target)
          else log.optimize(targetFiles = target, zorderBy = zcols,
            where = Option(where).map(_.trim))
        Seq((rewrote.getOrElse(log.latestVersion()),
          before.toLong, log.liveFiles(None).size.toLong,
          rewrote.isDefined))
          .toDF("version", "files_before", "files_after", "rewrote")
      }
      case _ => None
    }
  }

  /** SQL entry point covering WRITES on managed commit-log tables —
    * the DML half the temp-view registration can't give. Statements
    * whose target resolves to a cataloged commit-log dataset dispatch
    * to the commit protocol (parse-and-dispatch — the statement's
    * query/source subtree runs through the full analyzer, so temp
    * views and registered tables resolve normally):
    *
    *  - `CREATE TABLE [IF NOT EXISTS] t [(cols)] USING commitlog
    *     [PARTITIONED BY (c,...)] [TBLPROPERTIES (...)]` / the CTAS
    *     flavor / `DROP TABLE [IF EXISTS] t [PURGE]`
    *                                       -> [[createManaged]] /
    *                                          [[removeDataset]]
    *  - `[CREATE OR] REPLACE TABLE t USING commitlog [(cols)]
    *    [AS <query>]`                      -> one `replace` commit on
    *    a standing table (HISTORY SURVIVES); OR CREATE creates fresh
    *  - `INSERT INTO t <query>`            -> [[CommitLog.append]]
    *  - `INSERT OVERWRITE [TABLE] t <query>` -> [[CommitLog.replace]]
    *  - `MERGE INTO t USING <src> ON t.k = s.k
    *     WHEN MATCHED THEN UPDATE SET *
    *     WHEN NOT MATCHED THEN INSERT *`   -> [[CommitLog.upsert]]
    *  - `DELETE FROM t WHERE <pred>`       -> [[CommitLog.deleteWhere]]
    *  - `UPDATE t SET c = <expr>, ... [WHERE <pred>]`
    *                                       -> [[CommitLog.updateWhere]]
    *  - `ALTER TABLE t ADD CONSTRAINT c CHECK (<pred>)` /
    *    `DROP CONSTRAINT [IF EXISTS] c`    -> [[CommitLog.addConstraint]]
    *  - `ALTER TABLE t ADD COLUMNS (c type, ...)` -> zero-row widening
    *    append; `RENAME COLUMN a TO b` / `DROP COLUMN c` -> zero-
    *    rewrite column mapping ([[CommitLog.renameColumn]]/
    *    [[CommitLog.dropColumn]])
    *  - `ALTER TABLE t ALTER COLUMN c SET NOT NULL | DROP NOT NULL`
    *                                       -> [[CommitLog.setNotNull]] /
    *                                          [[CommitLog.dropNotNull]]
    *  - `ALTER TABLE t ALTER COLUMN c TYPE <t>` -> type WIDENING
    *    along the promotion ladder (zero-row append; narrowing and
    *    incompatible changes refuse)
    *  - `ALTER TABLE t SET TBLPROPERTIES (...)` / `UNSET TBLPROPERTIES`
    *    / `SHOW TBLPROPERTIES t`           -> [[CommitLog.setProperties]]
    *  - `SELECT ... FROM t VERSION AS OF n | TIMESTAMP AS OF <expr>`
    *                                       -> versioned read (grafted
    *                                          into the statement's plan)
    *  - `OPTIMIZE t [WHERE <pred>] [ZORDER BY (c, ...)]`
    *                                       -> [[CommitLog.optimize]]
    *                                          (returns one metrics row)
    *  - `VACUUM t [RETAIN <n> HOURS] [DRY RUN]`
    *                                       -> [[CommitLog.vacuum]] /
    *                                          [[CommitLog.vacuumDryRun]]
    *  - `RESTORE [TABLE] t [TO] VERSION AS OF n | TIMESTAMP AS OF <e>`
    *                                       -> [[CommitLog.restore]]
    *  - `DESCRIBE HISTORY t`               -> [[CommitLog.history]]
    *  - `DESCRIBE DETAIL t`                -> [[CommitLog.detail]]
    *  - `ANALYZE TABLE t COMPUTE STATISTICS [FOR [ALL] COLUMNS ...]`
    *                                       -> [[CommitLog.buildStats]]
    *                                          (FOR COLUMNS = blooms)
    *  - `SHOW PARTITIONS t`                -> [[CommitLog.partitionValues]]
    *  - `CREATE TABLE [IF NOT EXISTS] t2 SHALLOW CLONE t1` -> zero-
    *    copy clone ([[CommitLog.cloneTo]]): the founding commit
    *    re-references the source's live files, O(metadata) at any
    *    data size
    *  - `TRUNCATE TABLE t`                 -> one zero-file replace
    *                                          commit (files stay for
    *                                          time travel)
    *  - `COPY INTO t FROM '<path>' FILEFORMAT = PARQUET|CSV|JSON
    *     [PATTERN = '<glob>'] [FORMAT_OPTIONS ('k'='v',...)]
    *     [COPY_OPTIONS ('force'='true'|'mergeSchema'='true')]`
    *                                       -> [[CommitLog.copyInto]]
    *                                          (exactly-once file ingest)
    *  - `SHOW CREATE TABLE t`              -> reconstructed DDL (one
    *                                          `createtab_stmt` row)
    *  - `SELECT ... FROM table_changes('t', start[, end])` -> the CDC
    *    feed ([[CommitLog.changesSince]]; INCLUSIVE version bounds,
    *    Delta's TVF contract)
    *  - `SELECT ... FROM table_files('t'[, version])` -> the FILES
    *    metadata table ([[CommitLog.filesDetail]]; manifests + file
    *    statuses only)
    *
    * The maintenance verbs are Delta's SQL surface; Spark's parser
    * does not know them, so they dispatch off a statement-shape match
    * BEFORE the parser (exactly what a parser extension would do) and
    * only when the target is a managed commit-log table — anything
    * else falls through to `spark.sql` and fails with the stock parse
    * error.
    *
    * INSERT is positional against the table's column order (the SQL
    * contract), with types conformed. MERGE accepts exactly the
    * update-all/insert-all shape — conditional clause variants refuse
    * loudly rather than silently approximating. Every mutation
    * refreshes the table's SQL view through the commit hook, and the
    * returned frame is the POST-mutation table read. Anything that is
    * not DML on a managed table passes through to `spark.sql`. */
  def sql(statement: String): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.logical._
    maintenanceSql(statement).foreach(df => return df)
    val parsed =
      try spark.sessionState.sqlParser.parsePlan(statement)
      catch { case scala.util.control.NonFatal(_) =>
        return spark.sql(statement) }
    def targetParts(plan: LogicalPlan): Option[Seq[String]] = plan match {
      case r: UnresolvedRelation => Some(r.multipartIdentifier)
      // ALTER TABLE statements parse their target as UnresolvedTable;
      // SHOW TBLPROPERTIES as UnresolvedTableOrView
      case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
        Some(t.multipartIdentifier)
      case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
        Some(t.multipartIdentifier)
      case SubqueryAlias(_, child) => targetParts(child)
      // ADD CONSTRAINT parses its target under a `Filter NOT(check)`
      // scaffold (the analyzer's own validation plan) — unwrap it
      case Filter(_, child) => targetParts(child)
      case _ => None
    }
    def targetName(plan: LogicalPlan): Option[String] =
      targetParts(plan).flatMap(managedName)
    def managedLog(plan: LogicalPlan): Option[CommitLog] =
      targetName(plan).map(commitLog)
    // the names a target-table column reference may be qualified by:
    // the table name itself or its alias (`UPDATE t AS x SET x.c = …`)
    def targetQualifiers(plan: LogicalPlan): Set[String] = plan match {
      case r: UnresolvedRelation => Set(r.multipartIdentifier.last)
      case SubqueryAlias(id, child) =>
        targetQualifiers(child) + id.name
      case _ => Set.empty
    }
    // DELETE/UPDATE conditions and SET values re-evaluate against the
    // BARE table frame, where `t.c` can't resolve — strip qualifiers
    // that name the target table; foreign qualifiers stay and fail
    // loudly downstream (no silent cross-table reference)
    def unqualify(e: Expression, table: LogicalPlan): Expression = {
      val quals = targetQualifiers(table)
        .map(_.toLowerCase(java.util.Locale.ROOT))
      e.transform {
        case a: UnresolvedAttribute if a.nameParts.size > 1 &&
            quals(a.nameParts.dropRight(1).mkString(".")
              .toLowerCase(java.util.Locale.ROOT)) =>
          UnresolvedAttribute(Seq(a.nameParts.last))
      }
    }
    def conformPositional(df: DataFrame, log: CommitLog): DataFrame =
      // the first INSERT into a just-created table DEFINES the schema
      if (log.latestVersion() == 0L) df
      else {
        val unified = log.read(None).schema
        // drifted tables read in alphabetical order, but ADD COLUMNS
        // records the DECLARED order as a property — positional
        // INSERT targets that order when present (SQL contract)
        val want = log.properties()
          .get(LakeManager.ColumnOrderProp) match {
            case Some(order) =>
              val declared = order.split(",").toSeq
                .filter(unified.fieldNames.contains)
              val rest = unified.fieldNames.toSeq
                .filterNot(declared.contains)
              org.apache.spark.sql.types.StructType(
                (declared ++ rest).map(unified(_)))
            case None => unified
          }
        require(df.columns.length == want.length,
          s"INSERT arity ${df.columns.length} != table arity " +
            s"${want.length}")
        SchemaTools.conformTo(df.toDF(want.fieldNames.toSeq: _*), want)
      }
    parsed match {
      case i: InsertIntoStatement =>
        managedLog(i.table) match {
          case None => spark.sql(statement)
          case Some(log) =>
            require(i.partitionSpec.isEmpty && i.userSpecifiedCols.isEmpty,
              "INSERT with PARTITION or a column list is not supported " +
                "on managed commit-log tables")
            val q = org.apache.spark.sql.GraftSqlBridge
              .ofRows(spark, i.query)
            val (ids, gens) = log.autoColumns()
            val auto = ids.keySet ++ gens.keySet ++
              log.defaultColumns().keySet
            if (auto.isEmpty) {
              val df = conformPositional(q, log)
              if (i.overwrite) log.replace(df, log.latestVersion())
              else log.append(df)
            } else {
              // positional against the NON-AUTO columns in declared
              // order (the SQL contract: you don't supply identity /
              // generated values); full-arity binds explicit values,
              // which the resolver validates per its rules
              require(!i.overwrite,
                "INSERT OVERWRITE on a table with identity/generated/" +
                  "default columns is not supported — TRUNCATE then " +
                  "INSERT")
              // bind against the DECLARED order (the same
              // ColumnOrderProp discipline conformPositional honors) —
              // the raw read order is partition-first on an empty
              // partitioned frame and alphabetical under drift
              val unified = log.read(None).schema
              val tSchema = log.properties()
                .get(LakeManager.ColumnOrderProp) match {
                  case Some(order) =>
                    val declared = order.split(",").toSeq
                      .filter(unified.fieldNames.contains)
                    val rest = unified.fieldNames.toSeq
                      .filterNot(declared.contains)
                    org.apache.spark.sql.types.StructType(
                      (declared ++ rest).map(unified(_)))
                  case None => unified
                }
              val manual = tSchema.filterNot(f => auto.contains(f.name))
              val bound =
                if (q.columns.length == manual.length)
                  SchemaTools.conformTo(
                    q.toDF(manual.map(_.name).toSeq: _*),
                    org.apache.spark.sql.types.StructType(manual))
                else if (q.columns.length == tSchema.length)
                  SchemaTools.conformTo(
                    q.toDF(tSchema.fieldNames.toSeq: _*), tSchema)
                else throw new IllegalArgumentException(
                  s"INSERT arity ${q.columns.length} matches neither " +
                    s"the non-auto columns (${manual.length}) nor the " +
                    s"full table (${tSchema.length})")
              log.appendResolvingDefaults(bound)
            }
            log.read(None)
        }
      case m: MergeIntoTable =>
        managedLog(m.targetTable) match {
          case None => spark.sql(statement)
          case Some(log) =>
            def conjuncts(e: Expression): Seq[Expression] = e match {
              case And(l, r) => conjuncts(l) ++ conjuncts(r)
              case o => Seq(o)
            }
            val keys = conjuncts(m.mergeCondition).map {
              case EqualTo(a: UnresolvedAttribute,
                  b: UnresolvedAttribute)
                  if a.nameParts.last == b.nameParts.last =>
                a.nameParts.last
              case other => throw new IllegalArgumentException(
                s"unsupported merge condition conjunct: ${other.sql} " +
                  "— use t.k = s.k equalities")
            }
            // IDENTITY and GENERATED tables route through the
            // generalized executor: it allocates identity for NOT
            // MATCHED inserts off the high-water CAS (refusing SET /
            // explicit-ALWAYS values — Delta's current rule) and
            // RECOMPUTES generated columns on update-fired and
            // inserted rows (refusing explicit assignments); star
            // expansion excludes generated columns the same way
            // Delta's does
            val (mIds, mGens) = log.autoColumns()
            val src = org.apache.spark.sql.GraftSqlBridge
              .ofRows(spark, m.sourceTable)
            if (mIds.isEmpty && mGens.isEmpty &&
                m.matchedActions == Seq(UpdateStarAction(None)) &&
                m.notMatchedActions == Seq(InsertStarAction(None)) &&
                m.notMatchedBySourceActions.isEmpty &&
                !m.withSchemaEvolution) {
              // the unconditional update-all/insert-all pair is the
              // classic upsert — keep its fast path (exact column
              // match, key-envelope-pruned copy-on-write)
              val want = log.read(None).columns
              require(src.columns.sorted.sameElements(want.sorted),
                s"merge source columns " +
                  s"${src.columns.sorted.mkString(",")} must match " +
                  s"table columns ${want.sorted.mkString(",")}")
              log.upsert(src, keys)
            } else {
              // FULL Delta MERGE grammar -> [[CommitLog.merge]].
              // References rewrite to the executor's frame: target
              // columns under their own names, source columns as
              // `__s_<name>`. Scopes enforce Delta's reference rules:
              // matched clauses see both sides; NOT MATCHED sees
              // source only (bare names resolve source-first); NOT
              // MATCHED BY SOURCE sees target only (a source
              // reference would read NULL — refuse loudly).
              val tCols = log.read(None).columns.toSeq
              val sCols = src.columns.toSeq
              val tQuals = targetQualifiers(m.targetTable)
                .map(_.toLowerCase(java.util.Locale.ROOT))
              val sQuals = targetQualifiers(m.sourceTable)
                .map(_.toLowerCase(java.util.Locale.ROOT))
              def rewrite(e: Expression, scope: String): String = {
                val out = e.transform {
                  case a: UnresolvedAttribute =>
                    val n = a.nameParts.last
                    val q = if (a.nameParts.size > 1)
                      Some(a.nameParts.dropRight(1).mkString(".")
                        .toLowerCase(java.util.Locale.ROOT))
                    else None
                    q match {
                      case Some(qq) if tQuals(qq) =>
                        require(scope != "notMatched",
                          s"NOT MATCHED clauses cannot reference the " +
                            s"target (${a.sql}) — there is no target " +
                            "row for an unmatched source row")
                        UnresolvedAttribute(Seq(n))
                      case Some(qq) if sQuals(qq) =>
                        require(scope != "nmbs",
                          s"NOT MATCHED BY SOURCE clauses cannot " +
                            s"reference the source (${a.sql}) — there " +
                            "is no source row")
                        UnresolvedAttribute(Seq(s"__s_$n"))
                      case Some(_) => a // foreign — fails loudly later
                      case None => scope match {
                        case "notMatched" =>
                          if (sCols.contains(n))
                            UnresolvedAttribute(Seq(s"__s_$n"))
                          else a
                        case "nmbs" => a // target frame only
                        case _ => // matched: target-first, then source
                          if (tCols.contains(n)) a
                          else if (sCols.contains(n))
                            UnresolvedAttribute(Seq(s"__s_$n"))
                          else a
                      }
                    }
                }
                out.sql
              }
              // star under WITH SCHEMA EVOLUTION assigns every SOURCE
              // column (Delta's expansion): shared columns take the
              // source value, source-only columns evolve onto the
              // schema, target-only columns keep standing values.
              // GENERATED columns are excluded either way (Delta's
              // rule) — the executor recomputes them from their
              // expressions, so star neither requires nor assigns them
              def star(verb: String): Seq[(String, String)] =
                if (m.withSchemaEvolution) {
                  sCols.filterNot(mGens.contains)
                    .map(c => c -> s"`__s_$c`")
                } else {
                  val missing = tCols.filterNot(sCols.contains)
                    .filterNot(mGens.contains)
                  require(missing.isEmpty,
                    s"$verb * needs the source to carry every target " +
                      s"column; missing ${missing.mkString(",")} (or " +
                      "use MERGE WITH SCHEMA EVOLUTION)")
                  tCols.filterNot(mGens.contains)
                    .map(c => c -> s"`__s_$c`")
                }
              def assigns(as: Seq[Assignment], scope: String)
                  : Seq[(String, String)] =
                as.map { a =>
                  val tgt = a.key match {
                    case k: UnresolvedAttribute
                        if k.nameParts.size == 1 =>
                      k.nameParts.head
                    case k: UnresolvedAttribute
                        if k.nameParts.size == 2 &&
                          tQuals(k.nameParts.head
                            .toLowerCase(java.util.Locale.ROOT)) =>
                      k.nameParts.last
                    case other => throw new IllegalArgumentException(
                      s"unsupported assignment target: ${other.sql} " +
                        "— use a bare or target-qualified column")
                  }
                  tgt -> rewrite(a.value, scope)
                }
              def clause(action: MergeAction, scope: String)
                  : CommitLog.MergeClause = {
                val cond = action.condition.map(rewrite(_, scope))
                val op = action match {
                  case _: DeleteAction => CommitLog.MergeDelete
                  case u: UpdateAction =>
                    CommitLog.MergeUpdate(assigns(u.assignments, scope))
                  case _: UpdateStarAction =>
                    CommitLog.MergeUpdate(star("UPDATE SET"))
                  case i: InsertAction =>
                    CommitLog.MergeInsert(assigns(i.assignments, scope))
                  case _: InsertStarAction =>
                    CommitLog.MergeInsert(star("INSERT"))
                  case other => throw new IllegalArgumentException(
                    s"unsupported merge action: $other")
                }
                CommitLog.MergeClause(cond, op)
              }
              log.merge(src, keys,
                m.matchedActions.map(clause(_, "matched")),
                m.notMatchedActions.map(clause(_, "notMatched")),
                m.notMatchedBySourceActions.map(clause(_, "nmbs")),
                evolve = m.withSchemaEvolution)
            }
            log.read(None)
        }
      case d: DeleteFromTable =>
        managedLog(d.table) match {
          case None => spark.sql(statement)
          case Some(log) =>
            val pred = unqualify(d.condition, d.table).sql
            // the `delete.mode` table property picks the physical
            // strategy: 'positional' = zero-rewrite deletion vectors,
            // default = copy-on-write
            if (log.properties(None).get("delete.mode")
                .contains("positional"))
              log.deleteWhereMor(pred)
            else log.deleteWhere(pred)
            log.read(None)
        }
      case u: UpdateTable =>
        managedLog(u.table) match {
          case None => spark.sql(statement)
          case Some(log) =>
            // assignment targets: a bare column, or one qualified by
            // the TARGET table/alias. Anything else (a struct field
            // `s.x`, a foreign qualifier) refuses loudly — silently
            // rebinding to a same-named top-level column would be a
            // wrong write, and struct-field updates are unsupported
            val quals = targetQualifiers(u.table)
              .map(_.toLowerCase(java.util.Locale.ROOT))
            val sets = u.assignments.map { a =>
              val tgt = a.key match {
                case k: UnresolvedAttribute if k.nameParts.size == 1 =>
                  k.nameParts.head
                case k: UnresolvedAttribute if k.nameParts.size == 2 &&
                    quals(k.nameParts.head
                      .toLowerCase(java.util.Locale.ROOT)) =>
                  k.nameParts.last
                case other => throw new IllegalArgumentException(
                  s"unsupported UPDATE target: ${other.sql} — use a " +
                    "bare or target-qualified COLUMN (struct fields " +
                    "are not updatable here)")
              }
              tgt -> unqualify(a.value, u.table).sql
            }
            // identity/generated targets refuse INSIDE updateWhere
            // (the API boundary); updating a generation INPUT is
            // supported — the executor recomputes the generated
            // column over the post-update row (Delta's rule)
            log.updateWhere(sets,
              u.condition.map(unqualify(_, u.table).sql))
            log.read(None)
        }
      case a: AddCheckConstraint =>
        managedLog(a.child) match {
          case None => spark.sql(statement)
          case Some(log) =>
            val c = a.checkConstraint
            log.addConstraint(c.name,
              unqualify(c.child, a.child).sql)
            log.read(None)
        }
      case d: DropConstraint =>
        managedLog(d.table) match {
          case None => spark.sql(statement)
          case Some(log) =>
            if (!(d.ifExists && !log.constraints(None).contains(d.name)))
              log.dropConstraint(d.name)
            log.read(None)
        }
      case CreateTable(nameChild, cols, partTs, spec, ignore) =>
        createManaged(nameChild, spec, partTs, cols, None, ignore)
          .getOrElse(spark.sql(statement))
      case CreateTableAsSelect(nameChild, partTs, query, spec, _,
          ignore, _) =>
        createManaged(nameChild, spec, partTs, Nil,
          Some(org.apache.spark.sql.GraftSqlBridge.ofRows(spark, query)),
          ignore)
          .getOrElse(spark.sql(statement))
      // [CREATE OR] REPLACE TABLE — Delta's semantics: the standing
      // table's live set is replaced by ONE `replace` commit, so
      // HISTORY SURVIVES (time travel before the replace still
      // serves); a missing table refuses unless OR CREATE/OR REPLACE
      // created it fresh
      case ReplaceTableAsSelect(nameChild, partTs, query, spec,
          _, orCreate, _) =>
        replaceManaged(nameChild, spec, partTs, Nil,
          Some(org.apache.spark.sql.GraftSqlBridge
            .ofRows(spark, query)), orCreate, statement)
      case ReplaceTable(nameChild, cols, partTs, spec, orCreate) =>
        replaceManaged(nameChild, spec, partTs, cols, None,
          orCreate, statement)
      case dt: DropTable =>
        val partsOpt = dt.child match {
          case id: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier =>
            Some(id.nameParts)
          case o => targetParts(o)
        }
        val resolved: Option[String] = partsOpt.flatMap { ps =>
          try managedName(ps)
          catch {
            // DROP TABLE IF EXISTS lake.absent is a no-op, not the
            // loud lake-qualified-non-member refusal
            case _: IllegalArgumentException if dt.ifExists => None
          }
        }
        resolved match {
          case Some(t) =>
            removeDataset(t, deleteFiles = dt.purge)
            spark.emptyDataFrame
          case None => spark.sql(statement)
        }
      case at: AnalyzeTable =>
        managedLog(at.child) match {
          case None => spark.sql(statement)
          case Some(log) =>
            // COMPUTE STATISTICS = (re)build the `_stats` span
            // sidecar over the live set; returns the DETAIL summary
            require(at.partitionSpec.isEmpty,
              "partition-scoped ANALYZE is not supported on managed " +
                "commit-log tables")
            log.buildStats()
            log.detail()
        }
      case an: AnalyzeColumn =>
        managedLog(an.child) match {
          case None => spark.sql(statement)
          case Some(log) =>
            // FOR COLUMNS = point-lookup (bloom) statistics for the
            // named string/integral columns, spans for everything
            // indexable as always; FOR ALL COLUMNS blooms every
            // bloomable column
            val cols =
              if (an.allColumns)
                FileStats.bloomableFields(log.read(None).schema)
              else an.columnNames.getOrElse(Nil)
            log.buildStats(bloomCols = cols)
            log.detail()
        }
      case sp: ShowPartitions =>
        managedLog(sp.child) match {
          case None => spark.sql(statement)
          case Some(log) =>
            require(sp.pattern.isEmpty,
              "SHOW PARTITIONS patterns are not supported on managed " +
                "commit-log tables")
            log.partitionValues()
        }
      case rc: RenameColumn =>
        managedLog(rc.table) match {
          case None => spark.sql(statement)
          case Some(log) =>
            require(rc.column.name.size == 1,
              s"RENAME COLUMN targets a top-level column, got " +
                rc.column.name.mkString("."))
            log.renameColumn(rc.column.name.head, rc.newName)
            LakeManager.remapColumnOrder(log,
              _.map(c => if (c == rc.column.name.head) rc.newName
                else c))
            log.read(None)
        }
      case dc: DropColumns =>
        managedLog(dc.table) match {
          case None => spark.sql(statement)
          case Some(log) =>
            val have = log.read(None).columns.toSet
            dc.columnsToDrop.foreach { f =>
              require(f.name.size == 1,
                s"DROP COLUMN targets a top-level column, got " +
                  f.name.mkString("."))
              if (!(dc.ifExists && !have(f.name.head))) {
                log.dropColumn(f.name.head)
                LakeManager.remapColumnOrder(log,
                  _.filterNot(_ == f.name.head))
              }
            }
            log.read(None)
        }
      case acols: AddColumns =>
        targetName(acols.table) match {
          case None => spark.sql(statement)
          case Some(name) =>
            val log = commitLog(name)
            // schema WIDENING as a zero-row append: the commit records
            // the widened schema, the drift machinery promotes the
            // union for readers, and positional INSERT conformance
            // picks it up — no data rewritten. Simple additions only:
            // nested paths, NOT NULL (standing rows would violate it
            // — backfill then SET NOT NULL), and active column mapping
            // (logical additions over renamed physicals would fork the
            // registry) refuse loudly.
            require(
              !SchemaTools.readSchemaMarkerInfo(spark,
                  new Path(root, name).toString)
                .exists(i => i.renames.nonEmpty || i.dropped.nonEmpty),
              "ADD COLUMNS under active column mapping is not " +
                "supported — apply the mapping first")
            val cur = log.read(None).schema
            acols.columnsToAdd.foreach { qc =>
              require(qc.path.isEmpty,
                s"ADD COLUMNS supports top-level columns only")
              require(qc.nullable,
                s"ADD COLUMNS ${qc.colName} NOT NULL would be " +
                  "violated by every standing row — add it nullable, " +
                  "backfill, then ALTER COLUMN ... SET NOT NULL")
              require(!cur.fieldNames.contains(qc.colName),
                s"column ${qc.colName} already exists")
            }
            val widened = org.apache.spark.sql.types.StructType(
              cur.fields ++ acols.columnsToAdd.map(qc =>
                org.apache.spark.sql.types.StructField(
                  qc.colName, qc.dataType, nullable = true)))
            log.append(spark.createDataFrame(
              new java.util.ArrayList[org.apache.spark.sql.Row](),
              widened))
            // the drift union reads in ALPHABETICAL order (the
            // deterministic drift contract), but SQL's positional
            // INSERT contract is the DECLARED order — record it as a
            // versioned table property that conformPositional honors.
            // A DEFAULT on an added column rides the same meta commit
            // (standing rows read NULL — Delta's rule; the default
            // applies to inserts from here on)
            log.setProperties(Map(
              LakeManager.ColumnOrderProp ->
                widened.fieldNames.mkString(",")) ++
              acols.columnsToAdd.flatMap(qc => qc.default.map(d =>
                s"${CommitLog.DefaultColPrefix}${qc.colName}" ->
                  d.originalSQL)))
            log.read(None)
        }
      case ac: AlterColumns =>
        targetName(ac.table) match {
          case None => spark.sql(statement)
          case Some(tname) =>
            val log = commitLog(tname)
            // managed column alterations: the nullability invariant
            // (Delta's NOT NULL) and TYPE WIDENING along the promotion
            // ladder (Delta type widening: a zero-row append records
            // the widened type, the drift machinery promotes every
            // reader — no data rewritten; narrowing and incompatible
            // changes refuse loudly). Comment/position/default changes
            // refuse rather than silently mutating a schema the commit
            // log owns.
            ac.specs.foreach { sp =>
              val defaultChange =
                sp.newDefaultExpression.isDefined || sp.dropDefault
              require(sp.newComment.isEmpty &&
                sp.newPosition.isEmpty &&
                (Seq(sp.newNullability.isDefined,
                  sp.newDataType.isDefined,
                  defaultChange).count(identity) == 1),
                "managed ALTER COLUMN supports exactly SET NOT NULL / " +
                  "DROP NOT NULL / TYPE <widened-type> / SET DEFAULT " +
                  "<expr> / DROP DEFAULT")
              require(sp.column.name.size == 1,
                s"ALTER COLUMN targets a top-level column, got " +
                  sp.column.name.mkString("."))
              val cname = sp.column.name.head
              if (defaultChange) {
                require(log.read(None).columns.contains(cname),
                  s"no such column $cname")
                val dkey = s"${CommitLog.DefaultColPrefix}$cname"
                if (sp.dropDefault)
                  log.unsetProperties(Seq(dkey), ifExists = true)
                else log.setProperties(Map(
                  dkey -> sp.newDefaultExpression.get.originalSQL))
              }
              else sp.newDataType match {
                case Some(want) =>
                  require(
                    !SchemaTools.readSchemaMarkerInfo(spark,
                        new Path(root, tname).toString)
                      .exists(i => i.renames.nonEmpty ||
                        i.dropped.nonEmpty),
                    "ALTER COLUMN TYPE under active column mapping " +
                      "is not supported — apply the mapping first")
                  val cur = log.read(None).schema
                  require(cur.fieldNames.contains(cname),
                    s"no such column: $cname")
                  val curT = cur(cname).dataType
                  require(SchemaTools.promote(curT, want) == want,
                    s"ALTER COLUMN $cname TYPE ${want.sql} would " +
                      s"NARROW ${curT.sql} — only promotions along " +
                      "the drift ladder are supported")
                  if (curT != want) {
                    val widened = org.apache.spark.sql.types.StructType(
                      cur.fields.map(f =>
                        if (f.name == cname) f.copy(dataType = want)
                        else f))
                    log.append(spark.createDataFrame(
                      new java.util.ArrayList[
                        org.apache.spark.sql.Row](), widened))
                    // the widening append activates the drift union
                    // (alphabetical read order) — pin the declared
                    // order for positional INSERT, keeping any order
                    // an earlier ADD COLUMNS already recorded
                    if (!log.properties()
                        .contains(LakeManager.ColumnOrderProp))
                      log.setProperties(Map(
                        LakeManager.ColumnOrderProp ->
                          cur.fieldNames.mkString(",")))
                  }
                case None =>
                  if (sp.newNullability.get) // nullable=true drops it
                    log.dropNotNull(cname)
                  else log.setNotNull(cname)
              }
            }
            log.read(None)
        }
      case p: SetTableProperties =>
        managedLog(p.table) match {
          case None => spark.sql(statement)
          case Some(log) =>
            log.setProperties(p.properties)
            log.read(None)
        }
      case p: UnsetTableProperties =>
        managedLog(p.table) match {
          case None => spark.sql(statement)
          case Some(log) =>
            log.unsetProperties(p.propertyKeys, p.ifExists)
            log.read(None)
        }
      case p: ShowTableProperties =>
        managedLog(p.table) match {
          case None => spark.sql(statement)
          case Some(log) =>
            import spark.implicits._
            val all = log.properties(None).toSeq.sortBy(_._1)
            p.propertyKey match {
              case Some(k) => all.filter(_._1 == k).toDF("key", "value")
              case None => all.toDF("key", "value")
            }
        }
      case t: TruncateTable =>
        managedLog(t.table) match {
          case None => spark.sql(statement)
          case Some(log) =>
            // TRUNCATE = one replace commit carrying zero files: data
            // files stay on disk for time travel (VACUUM retires them
            // past retention), exactly Delta's TRUNCATE-equivalent
            // `DELETE FROM t` fast path — no per-row work at any size
            log.replace(log.read(None).limit(0), log.latestVersion())
            log.read(None)
        }
      case sct: ShowCreateTable =>
        targetName(sct.child) match {
          case None => spark.sql(statement)
          case Some(name) =>
            val log = commitLog(name)
            val nn = log.notNullColumns().toSet
            val (ids, gens) = log.autoColumns()
            val defs = log.defaultColumns()
            def decl(c: String): String =
              ids.get(c).map { case (st, sp, ex) =>
                s" GENERATED ${if (ex) "BY DEFAULT" else "ALWAYS"} " +
                  s"AS IDENTITY (START WITH $st INCREMENT BY $sp)"
              }.orElse(gens.get(c).map(g =>
                s" GENERATED ALWAYS AS ($g)"))
                .orElse(defs.get(c).map(d => s" DEFAULT $d"))
                .getOrElse("")
            val cols = log.read(None).schema.fields.map(f =>
              s"  ${f.name} ${f.dataType.sql}${decl(f.name)}" +
                (if (nn(f.name)) " NOT NULL" else "")).mkString(",\n")
            val parts =
              if (log.partitionCols.isEmpty) ""
              else log.partitionCols
                .mkString("\nPARTITIONED BY (", ", ", ")")
            // clustering keys render as their DDL clause (Delta's
            // SHOW CREATE does the same), not as a raw property
            val clusterBy =
              if (log.clusterKeys().isEmpty) ""
              else log.clusterKeys()
                .mkString("\nCLUSTER BY (", ", ", ")")
            // engine bookkeeping stays out of the reconstructed DDL —
            // identity/generated/DEFAULT render as column clauses
            // above, and re-running the DDL must not replay registry
            // pointers or high-water marks as plain properties
            val internal = Seq(CommitLog.IdentityColPrefix,
              CommitLog.IdentityHwmPrefix, CommitLog.GeneratedColPrefix,
              CommitLog.DefaultColPrefix, CommitLog.CopyRunPrefix,
              CommitLog.ClusterByKey,
              LakeManager.ColumnOrderProp)
            val props = log.properties().filterNot { case (k, _) =>
              internal.exists(k.startsWith) }
            val propsClause =
              if (props.isEmpty) ""
              else props.toSeq.sorted
                .map { case (k, v) => s"  '$k' = '$v'" }
                .mkString("\nTBLPROPERTIES (\n", ",\n", ")")
            val cons = log.constraints().toSeq.sorted.map {
              case (c, p) =>
                s";\nALTER TABLE $name ADD CONSTRAINT $c CHECK ($p)"
            }.mkString
            val ddl = s"CREATE TABLE $name (\n$cols)\n" +
              s"USING commitlog$parts$clusterBy$propsClause$cons"
            import spark.implicits._
            Seq(ddl).toDF("createtab_stmt")
        }
      case other =>
        // SELECT-side time travel: `FROM t VERSION AS OF n` /
        // `TIMESTAMP AS OF <expr>` over a managed table rewrites to
        // the versioned read's (already-analyzed) plan, aliased under
        // the table name so qualified column references keep
        // resolving. `FROM table_changes('t', start[, end])` (the
        // Delta CDC TVF, INCLUSIVE version bounds) rewrites to
        // [[CommitLog.changesSince]]'s plan the same way. Anything
        // untouched falls through verbatim.
        import org.apache.spark.sql.catalyst.analysis.{
          RelationTimeTravel, UnresolvedFunction, UnresolvedHaving,
          UnresolvedTableValuedFunction}
        var rewrote = false
        // aggregates whose PARENT re-resolves aggregate functions
        // (HAVING, or an ORDER BY / filter carrying function calls)
        // keep their direct plan — the MV-substituted Project could
        // not host that re-resolution (conservative, never wrong)
        val mvUnsafe = scala.collection.mutable.ArrayBuffer[LogicalPlan]()
        other.foreach {
          case h: UnresolvedHaving => mvUnsafe += h.child
          case s: Sort if (s.child.isInstanceOf[Aggregate] ||
                s.child.isInstanceOf[Project]) &&
              s.order.exists(_.exists(_.isInstanceOf[UnresolvedFunction])) =>
            mvUnsafe += s.child
          case f: Filter if (f.child.isInstanceOf[Aggregate] ||
                f.child.isInstanceOf[Project]) &&
              f.condition.exists(_.isInstanceOf[UnresolvedFunction]) =>
            mvUnsafe += f.child
          case _ =>
        }
        val rewritten = other.transformUp {
          case agg: Aggregate if !mvUnsafe.exists(_ eq agg) =>
            tryMvRewrite(agg) match {
              case Some(p) => rewrote = true; p
              case None => agg
            }
          // a GLOBAL aggregate parses as Project (the analyzer
          // converts to Aggregate later) — match count/min/max
          // select lists over a bare managed relation here
          case proj: Project if !mvUnsafe.exists(_ eq proj) =>
            tryMetadataAgg(proj.projectList, proj.child) match {
              case Some(p) => rewrote = true; p
              case None => proj
            }
          case tvf @ UnresolvedTableValuedFunction(fname, fargs, _)
              if fname.map(_.toLowerCase(java.util.Locale.ROOT))
                == Seq("table_files") =>
            // FILES metadata TVF (the Iceberg `files` table):
            // `FROM table_files('t'[, version])` — manifests + file
            // statuses only, zero data-file opens
            require(fargs.size == 1 || fargs.size == 2,
              "table_files wants (table[, version])")
            val tbl = fargs.head.eval() match {
              case s: org.apache.spark.unsafe.types.UTF8String =>
                s.toString
              case o => require(false,
                s"table_files wants a table-name string, got $o"); ""
            }
            managedName(tbl.split('.').toSeq) match {
              case None => tvf
              case Some(n) =>
                val asOf = fargs.lift(1).map(_.eval() match {
                  case i: Int => i.toLong
                  case l: Long => l
                  case o => throw new IllegalArgumentException(
                    s"table_files wants an integer version, got $o")
                })
                rewrote = true
                SubqueryAlias(n,
                  org.apache.spark.sql.GraftSqlBridge.analyzedPlan(
                    commitLog(n).filesDetail(asOf)))
            }
          case tvf @ UnresolvedTableValuedFunction(fname, fargs, _)
              if fname.map(_.toLowerCase(java.util.Locale.ROOT))
                == Seq("table_changes") =>
            require(fargs.size == 2 || fargs.size == 3,
              "table_changes wants (table, startVersion[, endVersion])")
            val tblArg = fargs.head.eval() match {
              case s: org.apache.spark.unsafe.types.UTF8String =>
                s.toString
              case o => require(false,
                s"table_changes wants a table-name string, got $o"); ""
            }
            def ver(e: Expression, what: String): Long = e.eval() match {
              case i: Int => i.toLong
              case l: Long => l
              case o =>
                require(false,
                  s"table_changes wants an integer $what, got $o"); 0L
            }
            managedName(tblArg.split('.').toSeq) match {
              case None => tvf // not ours — the stock analyzer refuses
              case Some(n) =>
                val start = ver(fargs(1), "startVersion")
                require(start >= 1,
                  s"startVersion must be >= 1, got $start")
                val end = fargs.lift(2).map(ver(_, "endVersion"))
                rewrote = true
                SubqueryAlias(n,
                  org.apache.spark.sql.GraftSqlBridge.analyzedPlan(
                    commitLog(n).changesSince(start - 1, end)))
            }
          case tt @ RelationTimeTravel(rel, tsExpr, version) =>
            targetName(rel) match {
              case None => tt
              case Some(n) =>
                val log = commitLog(n)
                val v = version match {
                  case Some(s) =>
                    require(s.forall(_.isDigit),
                      s"VERSION AS OF wants a commit number, got $s")
                    s.toLong
                  case None =>
                    // evaluate the TIMESTAMP AS OF expression through
                    // one scalar query (constant by SQL contract),
                    // then the Delta timestampAsOf resolution rule
                    val ts = spark.sql(
                      s"SELECT CAST(${tsExpr.get.sql} AS TIMESTAMP)")
                      .head().getTimestamp(0)
                    require(ts != null,
                      s"TIMESTAMP AS OF ${tsExpr.get.sql} is not a " +
                        "timestamp")
                    log.versionAt(ts.getTime)
                }
                rewrote = true
                SubqueryAlias(n,
                  org.apache.spark.sql.GraftSqlBridge
                    .analyzedPlan(log.read(Some(v))))
            }
        }
        if (rewrote)
          org.apache.spark.sql.GraftSqlBridge.ofRows(spark, rewritten)
        else spark.sql(statement)
    }
  }

  // ---- materialized views: incremental refresh over the change feed ----

  private def mvCompute(df: DataFrame, keys: Seq[String],
      aggs: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val cols = aggs.map { case (e, a) => expr(e).as(a) }
    df.groupBy(keys.map(col): _*).agg(cols.head, cols.tail: _*)
  }

  private def mvAggsJson(aggs: Seq[(String, String)]): String = {
    val arr = mapper.createArrayNode()
    aggs.foreach { case (e, a) =>
      val o = arr.addObject(); o.put("expr", e); o.put("alias", a)
    }
    mapper.writeValueAsString(arr)
  }

  private def mvAggsParse(s: String): Seq[(String, String)] = {
    val n = mapper.readTree(s)
    (0 until n.size).map(i =>
      (n.get(i).get("expr").asText, n.get(i).get("alias").asText))
  }

  /** Create a materialized AGGREGATE view of a managed commit-log
    * table (the Databricks materialized-view discipline): the view is
    * its own commit-log table holding `SELECT keys, aggs FROM source
    * GROUP BY keys` plus metadata properties
    * ([[LakeManager.MvSourceProp]]…). [[refreshMaterializedView]]
    * advances it INCREMENTALLY: the source's change feed names the
    * group keys whose inputs moved, ONLY those groups recompute (a
    * semi-join-pruned scan of the source), and one generalized merge
    * upserts changed groups, inserts new ones, and retires vanished
    * ones atomically — refresh cost scales with the CHANGED keys,
    * never with the view or the source. Recompute-by-key needs no
    * algebraic inverse, so ANY Spark aggregate expression is
    * maintainable (min/max/avg/count-distinct, not just the abelian
    * folds CDC delta-folding could serve). Returns the source version
    * the view is founded at. */
  def createMaterializedView(name: String, source: String,
      keys: Seq[String], aggs: Seq[(String, String)]): Long = {
    require(keys.nonEmpty, "a materialized view needs group keys")
    require(aggs.nonEmpty, "a materialized view needs aggregates")
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"commit-log table names must be SQL identifiers: $name")
    val aliases = aggs.map(_._2)
    aliases.foreach(a => require(a.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"aggregate aliases must be SQL identifiers: $a"))
    require((keys ++ aliases).map(_.toLowerCase(java.util.Locale.ROOT))
      .distinct.size == keys.size + aliases.size,
      "group keys and aggregate aliases must be distinct")
    require(tables.contains(source) && datasetKind(source) == "commitlog",
      s"the source must be a managed commit-log table: $source")
    require(!tables.contains(name), s"table $name already exists")
    val srcLog = commitLog(source)
    // founding order matters for crash-consistency: capture the tip
    // FIRST, then compute over a read that can only see <= tip rows
    // plus concurrently-landing commits — a concurrent commit between
    // tip and the read makes the founding state NEWER than `synced`,
    // and the first refresh's recompute-by-key converges it (the same
    // at-least-once idempotence every refresh leans on)
    val tip = srcLog.latestVersion()
    val log = addCommitLog(name)
    log.append(mvCompute(srcLog.read(None), keys, aggs))
    log.setProperties(Map(
      LakeManager.MvSourceProp -> source,
      LakeManager.MvKeysProp -> keys.mkString(","),
      LakeManager.MvAggsProp -> mvAggsJson(aggs),
      LakeManager.MvSyncedProp -> tip.toString))
    tip
  }

  /** Incrementally refresh a materialized view: fold every source
    * commit past the view's sync point by recomputing ONLY the group
    * keys the change feed names (see [[createMaterializedView]]).
    * `full = true` recomputes everything as one replace commit — the
    * re-baseline path for when the feed refuses (a replace/restore/
    * clone in the window, or a merge/upsert without the change data
    * feed enabled on the source). Returns one metrics row
    * (from_version, to_version, changed_keys, refreshed); a refresh
    * with nothing to fold burns no commit. Crash-safe by idempotence:
    * the sync-point property advances AFTER the data merge, and
    * re-running the window recomputes the same per-key values. */
  def refreshMaterializedView(name: String, full: Boolean = false)
      : DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val log = commitLog(name)
    val props = log.properties(None)
    val source = props.getOrElse(LakeManager.MvSourceProp,
      throw new IllegalArgumentException(
        s"$name is not a materialized view"))
    val keys = props(LakeManager.MvKeysProp).split(',').toSeq
    val aggs = mvAggsParse(props(LakeManager.MvAggsProp))
    val aliases = aggs.map(_._2)
    val synced = props(LakeManager.MvSyncedProp).toLong
    val srcLog = commitLog(source)
    val tip = srcLog.latestVersion()
    def metrics(changed: Long, refreshed: Boolean) =
      Seq((synced, tip, changed, refreshed))
        .toDF("from_version", "to_version", "changed_keys", "refreshed")
    if (tip <= synced && !full) return metrics(0L, refreshed = false)
    if (full) {
      log.replace(mvCompute(srcLog.read(None), keys, aggs),
        log.latestVersion())
      log.setProperties(Map(LakeManager.MvSyncedProp -> tip.toString))
      return metrics(-1L, refreshed = true)
    }
    val changes = srcLog.changesSince(synced, Some(tip))
    // pinned ONCE: the changed-key set feeds the affected-scan
    // semi-join, the merge source, and the metrics count — without
    // the checkpoint each consumer would re-execute the whole
    // change-feed read + distinct
    val changedKeys = changes.select(keys.map(col): _*).distinct()
      .localCheckpoint(true)
    val live = srcLog.read(None)
    // recompute ONLY the moved groups; null-safe like merge matching
    val affected = live.join(changedKeys,
      keys.map(k => live(k) <=> changedKeys(k)).reduce(_ && _),
      "left_semi")
    val recomputed = mvCompute(affected, keys, aggs)
      .withColumn("_present", lit(true))
    val mergeSrc = changedKeys.alias("ck")
      .join(recomputed.alias("rc"),
        keys.map(k => col(s"ck.$k") <=> col(s"rc.$k")).reduce(_ && _),
        "left")
      .select(keys.map(k => col(s"ck.$k").as(k)) ++
        aliases.map(a => col(s"rc.$a").as(a)) :+
        coalesce(col("rc._present"), lit(false)).as("_present"): _*)
    import CommitLog.{MergeClause, MergeDelete, MergeInsert, MergeUpdate}
    log.merge(
      mergeSrc, keys,
      matched = Seq(
        // a moved group still holding rows re-lands its recomputed
        // aggregates; one whose rows all vanished retires
        MergeClause(Some("__s__present"),
          MergeUpdate(aliases.map(a => a -> s"__s_$a"))),
        MergeClause(None, MergeDelete)),
      notMatched = Seq(
        // a brand-new group inserts; a group that appeared and
        // vanished entirely inside the window matches no clause
        MergeClause(Some("__s__present"),
          MergeInsert((keys ++ aliases).map(c => c -> s"__s_$c")))),
      notMatchedBySource = Nil)
    log.setProperties(Map(LakeManager.MvSyncedProp -> tip.toString))
    metrics(changedKeys.count(), refreshed = true)
  }

  /** Transparent aggregate rewrite onto a FRESH materialized view
    * (the classic MV query-rewrite discipline, syntactic-match
    * flavor): a parsed `Aggregate` whose child is the bare managed
    * source relation, whose GROUP BY keys set-equal a view's keys,
    * and whose every select item is either a group key or an ALIASED
    * expression structurally equal (case-normalized, at the parsed
    * level — no resolution needed) to one of the view's stored
    * aggregate expressions, answers from the view's files instead of
    * the source's — O(groups) scanned instead of O(rows). SOUND only
    * when the view is synced to the source TIP (one metadata read;
    * a stale view never serves), and only for inner aggregate shapes
    * (a WHERE on the source, a HAVING/ORDER BY carrying aggregate
    * functions above, or an unaliased aggregate fall through to the
    * direct plan untouched — conservative, never wrong). Disable per
    * session with `spark.graft.mv.rewrite=false`. Candidate discovery
    * reads each cataloged table's properties — metadata-plane, like
    * Delta's own table-property resolution. */
  /** The managed-table name under a (possibly aliased) bare relation
    * — the shared eligibility probe for the MV query rewrite and the
    * metadata-only aggregate paths (one definition, so their
    * unwrapping rules can never diverge). */
  private def managedRelName(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Option[String] = p match {
    case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
      scala.util.Try(managedName(r.multipartIdentifier))
        .toOption.flatten
    case org.apache.spark.sql.catalyst.plans.logical
        .SubqueryAlias(_, c) => managedRelName(c)
    case _ => None
  }

  private def tryMvRewrite(
      agg: org.apache.spark.sql.catalyst.plans.logical.Aggregate)
      : Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] = {
    import java.util.Locale
    import org.apache.spark.sql.catalyst.analysis.{
      UnresolvedAlias, UnresolvedAttribute, UnresolvedFunction,
      UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.{
      Alias, Expression, NamedExpression, SubqueryExpression}
    import org.apache.spark.sql.catalyst.plans.logical.{
      Filter, LogicalPlan, Project, SubqueryAlias}
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions.{col => fcol}
    if (!spark.conf.get("spark.graft.mv.rewrite", "true").toBoolean)
      return None
    def lc(s: String) = s.toLowerCase(Locale.ROOT)
    def relName(p: LogicalPlan): Option[String] = managedRelName(p)
    // a WHERE between the aggregate and the relation is rewritable
    // when it touches only GROUP-LEVEL columns (view keys): a
    // row-level filter on key columns selects whole groups, so it
    // commutes with the view's pre-aggregation
    val (cond, relPlan) = agg.child match {
      case f: Filter => (Some(f.condition), f.child)
      case c => (None, c)
    }
    val source = relName(relPlan).getOrElse(return None)
    val keyNames = agg.groupingExpressions.map {
      case a: UnresolvedAttribute => lc(a.nameParts.last)
      case _ => return None
    }
    if (keyNames.isEmpty || keyNames.distinct.size != keyNames.size)
      return None
    val keySet = keyNames.toSet
    def norm(e: Expression): Expression = e.transformUp {
      case a: UnresolvedAttribute =>
        UnresolvedAttribute(Seq(lc(a.nameParts.last)))
      case f: UnresolvedFunction =>
        f.copy(nameParts = f.nameParts.map(lc))
    }
    // predicate eligibility: named function calls (could be
    // nondeterministic — rand()) and subqueries fall through;
    // comparisons/boolean/arithmetic parse to concrete expression
    // classes and pass
    val condNorm = cond.map(norm)
    if (condNorm.exists(_.exists {
        case _: UnresolvedFunction => true
        case _: SubqueryExpression => true
        case _ => false
      })) return None
    val condAttrs = condNorm.map(_.collect {
      case a: UnresolvedAttribute => a.nameParts.last
    }.toSet).getOrElse(Set.empty)
    val srcTip = commitLog(source).latestVersion()
    tables.iterator
      .filter(v => v != source && datasetKind(v) == "commitlog")
      .flatMap { v =>
        val props = commitLog(v).properties(None)
        val fresh = for {
          s <- props.get(LakeManager.MvSourceProp) if s == source
          k <- props.get(LakeManager.MvKeysProp)
          viewKeys = k.split(',').toSeq
          // ROLLUP rewrite: query keys may be a (non-strict) SUBSET
          // of the view's — missing keys re-aggregate the view's
          // groups, sound for the decomposable folds mapped below
          if keySet.subsetOf(viewKeys.map(lc).toSet)
          if condAttrs.subsetOf(viewKeys.map(lc).toSet)
          aggsJson <- props.get(LakeManager.MvAggsProp)
          synced <- props.get(LakeManager.MvSyncedProp)
          if synced.toLong == srcTip
        } yield (viewKeys.map(lc), mvAggsParse(aggsJson))
        fresh.flatMap { case (viewKeysLc, stored) =>
          val exact = viewKeysLc.toSet == keySet
          val storedNorm = stored.map { case (e, a) =>
            norm(spark.sessionState.sqlParser.parseExpression(e)) ->
              lc(a)
          }
          // every select item maps to a view column (exact-key match:
          // group rows ARE view rows, direct projection) or — on a
          // key subset — to a RE-AGGREGATION of one: sum-of-sums,
          // sum-of-counts, min-of-mins, max-of-maxes (the classic
          // rollup algebra; avg and count-distinct are not
          // decomposable from the stored value alone and fall
          // through). (mvCol, out alias, re-agg fn or None for keys)
          val mapped: Option[Seq[(String, String, Option[String])]] =
            scala.util.Try(agg.aggregateExpressions.map {
              case UnresolvedAlias(a: UnresolvedAttribute, _)
                  if keySet(lc(a.nameParts.last)) =>
                (lc(a.nameParts.last), a.nameParts.last, None)
              case a: UnresolvedAttribute
                  if keySet(lc(a.nameParts.last)) =>
                (lc(a.nameParts.last), a.nameParts.last, None)
              case al: Alias =>
                val n = norm(al.child)
                storedNorm.find(_._1 == n) match {
                  case Some((_, mvCol)) if exact =>
                    (mvCol, al.name, None)
                  case Some((_, mvCol)) =>
                    val fn = n match {
                      case f: UnresolvedFunction => lc(f.nameParts.last)
                      case _ => throw new NoSuchElementException
                    }
                    val reAgg = fn match {
                      case "count" | "sum" => "sum"
                      case "min" => "min"
                      case "max" => "max"
                      case _ => throw new NoSuchElementException
                    }
                    (mvCol, al.name, Some(reAgg))
                  case None => throw new NoSuchElementException
                }
              case _ => throw new NoSuchElementException
            }).toOption
          mapped.map { outs =>
            val viewDf0 = commitLog(v).read(None)
            val viewDf = condNorm match {
              case Some(c) => viewDf0.filter(
                org.apache.spark.sql.GraftSqlBridge.column(c))
              case None => viewDf0
            }
            val out =
              if (exact)
                viewDf.select(outs.map { case (mvCol, outName, _) =>
                  fcol(mvCol).as(outName)
                }: _*)
              else {
                val aggCols = outs.collect {
                  case (mvCol, outName, Some("sum")) =>
                    org.apache.spark.sql.functions.sum(fcol(mvCol))
                      .as(outName)
                  case (mvCol, outName, Some("min")) =>
                    org.apache.spark.sql.functions.min(fcol(mvCol))
                      .as(outName)
                  case (mvCol, outName, Some("max")) =>
                    org.apache.spark.sql.functions.max(fcol(mvCol))
                      .as(outName)
                }
                if (aggCols.isEmpty)
                  // keys-only rollup (SELECT k FROM t GROUP BY k):
                  // the view's distinct key projection
                  viewDf.select(outs.map { case (c, outName, _) =>
                    fcol(c).as(outName)
                  }: _*).distinct()
                else viewDf.groupBy(keyNames.map(fcol): _*)
                  .agg(aggCols.head, aggCols.tail: _*)
                  // restore the query's select order and key aliases
                  .select(outs.map { case (c, outName, reAgg) =>
                    fcol(if (reAgg.isEmpty) c else outName).as(outName)
                  }: _*)
              }
            org.apache.spark.sql.GraftSqlBridge.analyzedPlan(out)
              : LogicalPlan
          }
        }
      }.nextOption()
  }

  /** Metadata-only answering of a GLOBAL aggregate (Delta's
    * metadata-only query optimization): `SELECT count(*) AS …,
    * min(c) AS …, max(c) AS … FROM t` with no GROUP BY, no WHERE,
    * and every item aliased answers from [[CommitLog.metadataAgg]] —
    * one manifest fold, zero data-file opens, a one-row plan with no
    * scan at all. Declines (the direct plan runs) whenever exactness
    * is not provable: standing merge-on-read marks, a file without
    * spans, a non-numeric or span-less column, DISTINCT/FILTER
    * modifiers, or an integral extreme outside double-exact range
    * (|v| ≥ 2^53). Disable per session with
    * `spark.graft.metadata.agg=false`. */
  private def tryMetadataAgg(
      items: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression],
      child: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] = {
    import java.util.Locale
    import org.apache.spark.sql.catalyst.analysis.{
      UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation,
      UnresolvedStar}
    import org.apache.spark.sql.catalyst.expressions.{
      Alias, Literal, NamedExpression}
    import org.apache.spark.sql.catalyst.plans.logical.{
      LogicalPlan, OneRowRelation, Project, SubqueryAlias}
    import org.apache.spark.sql.types._
    if (!spark.conf.get("spark.graft.metadata.agg", "true").toBoolean)
      return None
    def lc(s: String) = s.toLowerCase(Locale.ROOT)
    def relName(p: LogicalPlan): Option[String] = managedRelName(p)
    val source = relName(child).getOrElse(return None)
    // (alias, None) = count(*); (alias, Some((fn, col))) = min/max
    sealed trait Want
    case object WantCount extends Want
    case class WantExtreme(isMin: Boolean, col: String) extends Want
    val wants: Seq[(String, Want)] = items.map {
      case al: Alias => al.child match {
        case f: UnresolvedFunction
            if !f.isDistinct && f.filter.isEmpty =>
          (lc(f.nameParts.last), f.arguments) match {
            case ("count", Seq(Literal(1, IntegerType))) =>
              al.name -> (WantCount: Want)
            case ("count", Seq(_: UnresolvedStar)) =>
              al.name -> (WantCount: Want)
            case ("min", Seq(a: UnresolvedAttribute)) =>
              al.name -> WantExtreme(isMin = true, lc(a.nameParts.last))
            case ("max", Seq(a: UnresolvedAttribute)) =>
              al.name -> WantExtreme(isMin = false, lc(a.nameParts.last))
            case _ => return None
          }
        case _ => return None
      }
      case _ => return None
    }
    if (wants.isEmpty) return None
    // nested defs cannot `return None` from the method — a local
    // control exception declines from any depth
    final class Decline extends RuntimeException
    def decline: Nothing = throw new Decline
    try {
      val log = commitLog(source)
      val schema = log.read(None).schema
      def fieldOf(c: String): org.apache.spark.sql.types.StructField =
        schema.find(f => lc(f.name) == c).getOrElse(decline)
      val extremeCols = wants.collect {
        case (_, WantExtreme(_, c)) => c }.distinct
      // numeric span domains only: exact doubles. Strings are prefix
      // spans; date/timestamp/decimal decline (encoding round-trips)
      val typed = extremeCols.map { c =>
        val f = fieldOf(c)
        f.dataType match {
          case ByteType | ShortType | IntegerType | LongType |
              FloatType | DoubleType => c -> ((f.name, f.dataType))
          case _ => decline
        }
      }.toMap
      val (n, mm) =
        log.metadataAgg(typed.values.map(_._1).toSeq)
          .getOrElse(decline)
      val byPhys = mm.map { case (k, v) => lc(k) -> v }
      def lit(v: Option[Double], dt: DataType): Literal = v match {
        case None => Literal.create(null, dt)
        case Some(d) => dt match {
          case DoubleType => Literal(d)
          case FloatType => Literal(d.toFloat)
          case _ =>
            // integral: decline unless double-exact
            if (!(d.isWhole && math.abs(d) < 9.007199254740992e15))
              decline
            dt match {
              case LongType => Literal(d.toLong)
              case IntegerType => Literal(d.toInt)
              case ShortType => Literal(d.toShort)
              case ByteType => Literal(d.toByte)
              case _ => decline
            }
        }
      }
      val outs: Seq[NamedExpression] = wants.map {
        case (name, WantCount) => Alias(Literal(n), name)()
        case (name, WantExtreme(isMin, c)) =>
          val (mn, mx) = byPhys(c)
          Alias(lit(if (isMin) mn else mx, typed(c)._2), name)()
      }
      Some(Project(outs, OneRowRelation()))
    } catch { case _: Decline => None }
  }
}

object LakeManager {
  def apply(spark: SparkSession, root: String): LakeManager =
    new LakeManager(spark, root)

  /** Table property holding the DECLARED column order (set by ADD
    * COLUMNS, remapped by RENAME/DROP COLUMN) — the order positional
    * INSERT conforms against once drift makes the read order
    * alphabetical. */
  val ColumnOrderProp = "graft.column.order"

  /** Materialized-view metadata, carried as table properties on the
    * view's OWN commit log (transactional, versioned, clone-portable
    * like every property): the source table, the group keys, the
    * aggregate expressions (JSON `[{expr, alias}]`), and the last
    * source version folded in. */
  val MvSourceProp = "graft.mv.source"
  val MvKeysProp = "graft.mv.keys"
  val MvAggsProp = "graft.mv.aggs"
  val MvSyncedProp = "graft.mv.synced"

  /** Rewrite [[ColumnOrderProp]] through `f` if it is set; no meta
    * commit is burned when the property is absent or unchanged. */
  private[lake] def remapColumnOrder(log: CommitLog,
      f: Seq[String] => Seq[String]): Unit =
    log.properties().get(ColumnOrderProp).foreach { order =>
      val next = f(order.split(",").toSeq).mkString(",")
      if (next != order)
        log.setProperties(Map(ColumnOrderProp -> next))
    }
}
