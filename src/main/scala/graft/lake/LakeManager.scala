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
}

object LakeManager {
  def apply(spark: SparkSession, root: String): LakeManager =
    new LakeManager(spark, root)
}
