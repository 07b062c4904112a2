package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned snapshot reads over plain parquet — the commit-log device
  * of Delta/Iceberg reduced to its load-bearing core, for the one
  * question a training pipeline keeps asking: "EXACTLY which rows did
  * run N train on?" (reproducibility pins a corpus VERSION, not a
  * directory whose content drifts under later appends and erasures).
  *
  * Layout at `path`:
  *   - `data/c<N>_<nonce>/part-*.parquet` — immutable files written by
  *     commit N (a commit never rewrites another commit's files; the
  *     nonce keeps a crashed attempt's directory from colliding with
  *     the retry, so orphans never block the table);
  *   - `_log/v=<N>/` — parquet manifest: one row per ACTIVE data file
  *     (relative path) of version N. The manifest write IS the commit
  *     point — readers only see versions whose manifest exists, so a
  *     failed half-written commit is invisible (its orphaned data files
  *     are dead weight, never wrong results).
  *
  * Structural sharing is the scale property: version N+1's manifest
  * re-lists the files it keeps, so an append rewrites nothing and an
  * erasure rewrites ONLY the files that contain matching rows — at
  * 100 TB a GDPR delete touches the few files holding those ids (found
  * via `_metadata.file_path`, a metadata column, not a scan-side UDF),
  * while every other byte is shared with the previous version. Reads
  * are manifest-pruned: `read(path, Some(v))` opens exactly v's file
  * list, never a directory listing.
  *
  * [[rollback]] is roll-FORWARD: restoring version v writes a NEW
  * version whose manifest equals v's — history is append-only, so the
  * rolled-back-from state stays readable (the Delta RESTORE contract).
  *
  * Schema is VERSION-PINNED: every commit records its schema beside the
  * manifest, reads apply it explicitly (time travel returns the columns
  * the table had AS OF that version), an evolving append WIDENS it
  * (mergeSchema union — new columns read as null from older files, a
  * name/type conflict fails loudly before anything is written), and a
  * restore republishes the restored version's schema.
  *
  * Each commit also records its new files' numeric column ranges (zone
  * maps from the parquet footers it just wrote, stored beside the files
  * as `_stats.json`) so [[readRange]] opens only the files a range
  * predicate can match, and [[appendIdempotent]] carries the Delta
  * txnAppId/txnVersion contract for exactly-once streaming sinks.
  * Stats are loaded per commit DIRECTORY at plan time — O(commits of
  * the queried version) driver-side reads; past ~10⁵ commit dirs the
  * upgrade path is Delta's: fold the stats into the manifest parquet as
  * columns so one manifest scan prices every file (the sidecar format
  * is private, so that move is non-breaking).
  *
  * Single-writer: concurrent committers are out of scope (no
  * conditional-put primitive on plain filesystems); the driver-side
  * commit protocol is manifest-last, so crash-safety for ONE writer
  * holds. Versions are dense integers from 1.
  */
object Snapshots {

  private def logDir(path: String) = s"$path/_log"
  private def dataDir(path: String) = s"$path/data"

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Delete the whole table (fresh-build convenience). */
  def drop(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = fs(spark, path)
    if (f.exists(p)) f.delete(p, true)
  }

  /** All committed versions at `path`, ascending (empty if none). */
  def versions(spark: SparkSession, path: String): Seq[Int] = {
    val dir = new org.apache.hadoop.fs.Path(logDir(path))
    val f = fs(spark, path)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") => s.drop(2).toInt }
      .sorted
  }

  /** The newest committed version, or 0 when the table is empty. */
  def latestVersion(spark: SparkSession, path: String): Int =
    versions(spark, path).lastOption.getOrElse(0)

  /** Relative active-file list of version `v` (the manifest contents). */
  def activeFiles(spark: SparkSession, path: String, v: Int): Seq[String] = {
    require(versions(spark, path).contains(v), s"no committed version $v at $path")
    spark.read.parquet(s"${logDir(path)}/v=$v")
      .select(col("file")).collect().map(_.getString(0)).toSeq.sorted
  }

  /** Read the table as of `version` (default: latest). The plan opens
    * exactly the manifest's files — no directory listing, no leakage
    * from later commits.
    */
  def read(spark: SparkSession, path: String, version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(latestVersion(spark, path))
    // VERSION-PINNED schema (the Delta contract): time travel returns
    // the columns the table had AS OF that version; files predating a
    // widening append lack the new columns and read back as nulls, and
    // a legitimately empty version (deleteWhere erased every row, or a
    // rollback to one) reads as an empty frame of its pinned schema.
    readFiles(spark, path, activeFiles(spark, path, v),
      readSchema(spark, path, v), s"version $v")
  }

  /** Schema of version `v`, from the `_schema.json` persisted beside its
    * manifest (absent only for pre-schema tables or never-populated ones).
    */
  private def readSchema(
      spark: SparkSession, path: String, v: Int): Option[org.apache.spark.sql.types.StructType] = {
    val p = new org.apache.hadoop.fs.Path(s"${logDir(path)}/v=$v/_schema.json")
    val f = fs(spark, path)
    if (!f.exists(p)) None
    else Some(org.apache.spark.sql.types.DataType
      .fromJson(readSmallFile(f, p))
      .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  /** One shared file-set reader: the manifest's relative files under the
    * version's pinned schema (raw parquet for legacy schema-less
    * tables), or an empty frame of the pinned schema when the set is
    * empty — the branching [[read]], [[readRange]] and [[changes]] all
    * need, in one place.
    */
  private def readFiles(
      spark: SparkSession, path: String, rels: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType],
      what: String): DataFrame =
    if (rels.isEmpty) {
      val s = schema.getOrElse(throw new IllegalStateException(
        s"$what at $path is empty and carries no schema " +
          "(table was never committed with rows)"))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    } else schema match {
      case Some(s) =>
        spark.read.schema(s).parquet(rels.map(rel => s"$path/$rel"): _*)
      case None => spark.read.parquet(rels.map(rel => s"$path/$rel"): _*)
    }

  /** Commit `df` as an APPEND; returns the new version. Rewrites
    * nothing: the new manifest = previous active list + this commit's
    * freshly written files.
    */
  def append(df: DataFrame, path: String): Int = {
    val spark = df.sparkSession
    commit(spark, path, keepFiles = currentFiles(spark, path), add = Some(df))
  }

  /** Per-file numeric column ranges from the parquet FOOTERS of the
    * files just written — zone-map stats at metadata cost (Delta collects
    * the same at write time; reading footers of a commit's own files is
    * O(new files) driver-side metadata, never a data scan). Only
    * top-level INT32/INT64/FLOAT/DOUBLE columns participate — the id /
    * timestamp / measure columns range predicates actually hit.
    */
  private def footerRanges(
      conf: org.apache.hadoop.conf.Configuration,
      abs: org.apache.hadoop.fs.Path): Map[String, (BigDecimal, BigDecimal)] = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(abs, conf))
    try {
      val acc = scala.collection.mutable.Map.empty[String, (BigDecimal, BigDecimal)]
      reader.getFooter.getBlocks.forEach { b =>
        b.getColumns.forEach { c =>
          if (c.getPath.size == 1) {
            val st = c.getStatistics
            val numeric = c.getPrimitiveType.getPrimitiveTypeName.name match {
              case "INT32" | "INT64" | "FLOAT" | "DOUBLE" => true
              case _ => false
            }
            if (numeric && st != null && !st.isEmpty && st.hasNonNullValue) {
              val name = c.getPath.toDotString
              val mn = BigDecimal(st.genericGetMin.toString)
              val mx = BigDecimal(st.genericGetMax.toString)
              val merged = acc.get(name) match {
                case Some((a, z)) => (a.min(mn), z.max(mx))
                case None => (mn, mx)
              }
              acc.update(name, merged)
            }
          }
        }
      }
      acc.toMap
    } finally reader.close()
  }

  /** Write `<dir>/_stats.json` — per-part-file numeric column ranges
    * (zone maps) for a freshly written commit directory.
    */
  private def writeStats(
      spark: SparkSession, dirAbs: String, parts: Seq[String]): Unit = {
    import org.json4s._
    val conf = spark.sparkContext.hadoopConfiguration
    val perFile: List[(String, JValue)] = parts.sorted.toList.map { name =>
      val ranges = footerRanges(conf,
        new org.apache.hadoop.fs.Path(s"$dirAbs/$name"))
      name -> (JObject(ranges.toList.sortBy(_._1).map { case (c, (mn, mx)) =>
        c -> (JArray(List(JString(mn.toString), JString(mx.toString))): JValue)
      }): JValue)
    }
    val txt = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(JObject(perFile)))
    val p = new org.apache.hadoop.fs.Path(s"$dirAbs/_stats.json")
    val out = p.getFileSystem(conf).create(p, false)
    try out.write(txt.getBytes("UTF-8")) finally out.close()
  }

  /** Load the `_stats.json` zone maps for a set of ACTIVE relative files
    * (grouped by commit directory — stats live and die with their
    * commit's files). Files without stats yield no entry and are never
    * pruned.
    */
  private def statsFor(
      spark: SparkSession, path: String, rels: Seq[String])
      : Map[String, Map[String, (BigDecimal, BigDecimal)]] = {
    import org.json4s._
    val f = fs(spark, path)
    rels.groupBy(r => r.substring(0, r.lastIndexOf('/'))).flatMap {
      case (dir, files) =>
        val p = new org.apache.hadoop.fs.Path(s"$path/$dir/_stats.json")
        if (!f.exists(p)) Map.empty[String, Map[String, (BigDecimal, BigDecimal)]]
        else {
          val txt = readSmallFile(f, p)
          val names = files.map(r => r.drop(dir.length + 1) -> r).toMap
          org.json4s.jackson.JsonMethods.parse(txt) match {
            case JObject(perFile) => perFile.collect {
              case (fname, JObject(cols)) if names.contains(fname) =>
                names(fname) -> cols.collect {
                  case (cn, JArray(List(JString(mn), JString(mx)))) =>
                    cn -> ((BigDecimal(mn), BigDecimal(mx)))
                }.toMap
            }.toMap
            case _ => Map.empty[String, Map[String, (BigDecimal, BigDecimal)]]
          }
        }
    }
  }

  /** `(files read, files total)` for a range read of `[lo, hi]` on
    * `colName` at `version` — the data-skipping proof surface: a file is
    * SKIPPED when its zone map proves no row can satisfy the range.
    */
  def skippingFileCounts(
      spark: SparkSession, path: String, colName: String,
      lo: BigDecimal, hi: BigDecimal,
      version: Option[Int] = None): (Int, Int) = {
    val v = version.getOrElse(latestVersion(spark, path))
    val rels = activeFiles(spark, path, v)
    (prunedRels(spark, path, rels, colName, lo, hi).length, rels.length)
  }

  private def prunedRels(
      spark: SparkSession, path: String, rels: Seq[String],
      colName: String, lo: BigDecimal, hi: BigDecimal): Seq[String] = {
    val stats = statsFor(spark, path, rels)
    rels.filter { r =>
      stats.get(r).flatMap(_.get(colName)) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi // ranges overlap
        case None => true // no zone map — never prune blind
      }
    }
  }

  /** Range-clustered append — the writer-side half of data skipping:
    * rows are range-partitioned AND sorted by `byCol` before the commit,
    * so the new files' zone maps are DISJOINT and a later [[readRange]]
    * on that column opens O(matching files). This is the OPTIMIZE-by-
    * sort discipline (Delta's `OPTIMIZE ... ZORDER BY` for the
    * single-column case); `nFiles` sizes the commit's file count.
    */
  def appendClustered(
      df: DataFrame, path: String, byCol: String, nFiles: Int = 8): Int = {
    require(nFiles >= 1, s"nFiles must be >= 1: $nFiles")
    append(df.repartitionByRange(nFiles, col(byCol))
      .sortWithinPartitions(col(byCol)), path)
  }

  /** Point-lookup read with zone-map skipping: open only the files whose
    * zone contains AT LEAST ONE of `values` (an IN-list is a union of
    * point ranges), then apply the exact IN filter. On a range-clustered
    * layout a k-key lookup touches ≤ k files of a 100 TB table.
    */
  def readPoints(
      spark: SparkSession, path: String, colName: String,
      values: Seq[BigDecimal],
      version: Option[Int] = None): DataFrame = {
    require(values.nonEmpty, "readPoints needs at least one value")
    val v = version.getOrElse(latestVersion(spark, path))
    val all = activeFiles(spark, path, v)
    val stats = statsFor(spark, path, all)
    val rels = all.filter { r =>
      stats.get(r).flatMap(_.get(colName)) match {
        case Some((mn, mx)) => values.exists(x => x >= mn && x <= mx)
        case None => true // no zone map — never prune blind
      }
    }
    val c = col(colName)
    readFiles(spark, path, rels, readSchema(spark, path, v), s"version $v")
      .filter(c.isInCollection(values.map(_.underlying())))
  }

  /** Range read with ZONE-MAP file skipping — the Delta data-skipping
    * contract on the commit log: every commit records its new files'
    * per-column min/max (from the parquet footers it just wrote), and a
    * range predicate on `colName` opens ONLY the files whose range
    * overlaps `[lo, hi]` — on a range-clustered layout (sort or Z-order
    * the ingest by the hot column) that is O(matching files), never a
    * table scan. The exact predicate is still applied on top: skipping
    * is a superset-pruning optimization, never a correctness device.
    */
  def readRange(
      spark: SparkSession, path: String, colName: String,
      lo: BigDecimal, hi: BigDecimal,
      version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(latestVersion(spark, path))
    val rels = prunedRels(spark, path, activeFiles(spark, path, v),
      colName, lo, hi)
    val c = col(colName)
    // DECIMAL bounds, not double: a BIGINT id beyond 2^53 would round
    // under toDouble and the exactness contract ("the predicate is still
    // applied on top") would silently break at the boundary
    val pred = c >= lit(lo.underlying()) && c <= lit(hi.underlying())
    readFiles(spark, path, rels, readSchema(spark, path, v), s"version $v")
      .filter(pred)
  }

  /** EXACTLY-ONCE append for streaming sinks — the Delta
    * txnAppId/txnVersion idempotence contract: a `foreachBatch` retry
    * after checkpoint recovery re-delivers a batch under the SAME
    * `batchId`, and a plain append would commit it twice. Each
    * idempotent commit records `(appId, batchId)` beside its manifest;
    * an append whose batchId is ≤ the app's high-water mark is SKIPPED
    * (returns None), so replays are no-ops and the table equals the
    * exactly-once stream. Returns Some(version) when the commit
    * happened. Different appIds keep independent watermarks (two
    * streams may feed one table).
    */
  def appendIdempotent(
      df: DataFrame, path: String, appId: String, batchId: Long): Option[Int] = {
    val spark = df.sparkSession
    if (lastBatchId(spark, path, appId).exists(_ >= batchId)) None
    else Some(commitAt(spark, path, latestVersion(spark, path) + 1,
      currentFiles(spark, path), Some(df), txn = Some((appId, batchId))))
  }

  /** The high-water `batchId` committed by `appId`, if any. Versions are
    * scanned NEWEST-FIRST and the first match wins — batchIds are
    * monotone per app (enforced by [[appendIdempotent]] itself), so a
    * steady-state commit reads O(1) txn markers, not O(versions).
    */
  def lastBatchId(spark: SparkSession, path: String, appId: String): Option[Long] = {
    import org.json4s._
    val f = fs(spark, path)
    versions(spark, path).reverseIterator.flatMap { v =>
      val p = new org.apache.hadoop.fs.Path(s"${logDir(path)}/v=$v/_txn.json")
      if (!f.exists(p)) None
      else org.json4s.jackson.JsonMethods.parse(readSmallFile(f, p)) match {
        case JObject(fields) =>
          val m = fields.toMap
          (m.get("app"), m.get("batch")) match {
            case (Some(JString(app)), Some(JInt(b))) if app == appId =>
              Some(b.toLong)
            case _ => None
          }
        case _ => None
      }
    }.nextOption()
  }

  /** Slurp a small bookkeeping file (schema/txn/stats sidecars). */
  private def readSmallFile(
      f: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String = {
    val in = f.open(p)
    try {
      val bytes = new Array[Byte](f.getFileStatus(p).getLen.toInt)
      in.readFully(bytes)
      new String(bytes, "UTF-8")
    } finally in.close()
  }

  /** Commit an ERASURE of rows matching `cond`; returns the new
    * version. Only files that actually contain matching rows are
    * rewritten (their survivors land in the new commit's directory);
    * every other file is carried over by reference. A no-match delete
    * commits a version identical to the previous one.
    */
  def deleteWhere(spark: SparkSession, path: String, cond: Column): Int = {
    val prev = currentFiles(spark, path)
    if (prev.isEmpty) return commit(spark, path, Seq.empty, None)
    val abs = prev.map(rel => s"$path/$rel")
    // read under the VERSION-PINNED schema: after a widening append the
    // older files lack the new columns, and a raw union read would both
    // break predicates on those columns and rewrite survivors with a
    // stale schema
    val pinned = readSchema(spark, path, latestVersion(spark, path))
    def scan(paths: Seq[String]) = pinned match {
      case Some(s) => spark.read.schema(s).parquet(paths: _*)
      case None => spark.read.parquet(paths: _*)
    }
    // Three-valued logic: a row where `cond` evaluates to NULL (e.g. a
    // predicate over a nullable column) never MATCHED the delete, so it
    // must survive. Both passes use the same coalesce so "which files
    // are touched" and "which rows survive" agree (Delta's DELETE
    // contract: remove rows where the predicate is true; keep false OR
    // null).
    val matched = coalesce(cond, lit(false))
    val touchedAbs = scan(abs)
      .filter(matched)
      .select(col("_metadata.file_path"))
      .distinct().collect().map(_.getString(0)).toSet
    // _metadata.file_path is an absolute URI; match on the relative tail
    val touched = prev.filter(rel => touchedAbs.exists(_.endsWith(rel)))
    if (touched.isEmpty) return commit(spark, path, prev, None)
    val survivors = scan(touched.map(rel => s"$path/$rel"))
      .filter(!matched)
    commit(spark, path, prev.filterNot(touched.contains), Some(survivors))
  }

  /** Restore the table to the state of version `v` by committing a NEW
    * version with v's manifest (roll-forward restore — history stays
    * readable). Returns the new version.
    */
  def rollback(spark: SparkSession, path: String, v: Int): Int =
    commitAt(spark, path, latestVersion(spark, path) + 1,
      activeFiles(spark, path, v), None,
      // RESTORE republishes v's schema with its manifest (the Delta
      // contract): rolling back a widening append rolls the columns
      // back too
      schemaHint = readSchema(spark, path, v))

  /** OPTIMIZE — collapse the latest version's accumulated small files
    * (one commit directory per append under a streaming ingest) into a
    * fresh commit of `targetFiles` files. The new manifest lists ONLY
    * the compacted files; older versions keep reading their own
    * (immutable) files, and [[vacuum]] reclaims the superseded ones once
    * retention allows. Data files are never rewritten in place, so no
    * pinning is needed — the compaction read and the new commit touch
    * disjoint directories. Returns the new version; row set proved
    * unchanged by count (content equality is the committed frame itself).
    */
  def compact(spark: SparkSession, path: String, targetFiles: Int = 1): Int = {
    require(targetFiles >= 1, s"targetFiles must be >= 1: $targetFiles")
    val before = read(spark, path)
    val n = before.count()
    val v = commit(spark, path, Seq.empty, Some(before.coalesce(targetFiles)))
    val after = read(spark, path, Some(v)).count()
    require(after == n, s"compaction changed the row count: $n -> $after")
    v
  }

  /** File-pruned CHANGE FEED between two committed versions — the Delta
    * CDF / `table_changes` analogue on the commit log: the net row
    * changes from `fromV` to `toV` as a changelog frame with an `opCol`
    * column (+1 inserted, −1 deleted), the
    * [[graft.operators.DeltaRollup.applyBatch]] input contract.
    *
    * Structural sharing makes this O(changed files), never a table
    * scan: a file listed by BOTH manifests contributed identical rows
    * to both versions and is skipped entirely; only files the interval
    * added or dropped are read, and survivor rows a `deleteWhere`
    * rewrite merely MOVED between files cancel in the multiset
    * difference (`exceptAll`). At 100 TB, CDC between adjacent
    * versions costs the commit's own write volume. Works in either
    * direction (`fromV` > `toV` yields the inverse feed — a rollback's
    * changelog). Duplicate rows are handled multiset-exactly: a row
    * whose multiplicity rose by k appears k times at +1.
    */
  def changes(
      spark: SparkSession, path: String, fromV: Int, toV: Int,
      opCol: String = "__op"): DataFrame = {
    val fa = activeFiles(spark, path, fromV).toSet
    val ta = activeFiles(spark, path, toV).toSet
    val schema = Some(readSchema(spark, path, toV)
      .orElse(readSchema(spark, path, fromV))
      .getOrElse(throw new IllegalStateException(
        s"no schema recorded for versions $fromV/$toV at $path")))
    def rd(rels: Set[String]): DataFrame =
      readFiles(spark, path, rels.toSeq.sorted, schema,
        s"changes $fromV->$toV")
    val added = rd(ta -- fa)
    val removed = rd(fa -- ta)
    added.exceptAll(removed).withColumn(opCol, lit(1))
      .unionByName(removed.exceptAll(added).withColumn(opCol, lit(-1)))
  }

  /** Retention GC — the VACUUM contract: keep the newest `keepLast`
    * versions, drop older manifests, and delete every data file no kept
    * manifest references. Structural sharing means a file stays alive as
    * long as ANY kept version lists it (a restored version keeps its
    * ancestor's files alive). Orphans from crashed commits are
    * unreferenced by construction, so vacuum sweeps them too. Returns
    * `(versions dropped, data files deleted)`. Single-writer, like
    * every mutation here: run it when no reader holds a dropped
    * version's manifest.
    */
  def vacuum(spark: SparkSession, path: String, keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, s"must keep at least one version: $keepLast")
    val all = versions(spark, path)
    if (all.isEmpty) return (0, 0)
    val (dropV, keepV) = all.splitAt(math.max(0, all.length - keepLast))
    val referenced = keepV.flatMap(activeFiles(spark, path, _)).toSet
    val f = fs(spark, path)
    dropV.foreach { v =>
      f.delete(new org.apache.hadoop.fs.Path(s"${logDir(path)}/v=$v"), true)
    }
    // crashed commits may leave half-written staging dirs — garbage by
    // construction (the publish rename never happened), swept here
    f.listStatus(new org.apache.hadoop.fs.Path(logDir(path))).foreach { st =>
      if (st.getPath.getName.startsWith("_staged_"))
        f.delete(st.getPath, true)
    }
    // sweep data files (incl. crashed-commit orphans) not referenced by
    // any kept manifest; drained commit directories vanish with them
    var removed = 0
    val dataRoot = new org.apache.hadoop.fs.Path(dataDir(path))
    if (f.exists(dataRoot)) {
      f.listStatus(dataRoot).foreach { cdir =>
        val files = f.listStatus(cdir.getPath)
        val (dead, alive) = files.partition { st =>
          st.getPath.getName.endsWith(".parquet") &&
            !referenced.contains(s"data/${cdir.getPath.getName}/${st.getPath.getName}")
        }
        dead.foreach { st => f.delete(st.getPath, false); removed += 1 }
        if (alive.forall(!_.getPath.getName.endsWith(".parquet")))
          f.delete(cdir.getPath, true)
      }
    }
    (dropV.length, removed)
  }

  private def currentFiles(spark: SparkSession, path: String): Seq[String] = {
    val latest = latestVersion(spark, path)
    if (latest == 0) Seq.empty else activeFiles(spark, path, latest)
  }

  /** The single commit funnel: optionally write `add` into the new
    * version's data directory, then publish the manifest (keep +
    * newly written files). Manifest-last = the commit point.
    */
  private def commit(
      spark: SparkSession,
      path: String,
      keepFiles: Seq[String],
      add: Option[DataFrame]): Int =
    commitAt(spark, path, latestVersion(spark, path) + 1, keepFiles, add)

  /** Widening schema union for an evolving append (the mergeSchema
    * contract on the commit log): the previous version's columns keep
    * their order, genuinely new columns append (nullable — old files
    * read them back as nulls), and a NAME collision with a different
    * type fails loudly (silent coercion would corrupt every historical
    * read).
    */
  private def unionSchema(
      prev: org.apache.spark.sql.types.StructType,
      add: org.apache.spark.sql.types.StructType,
      where: String): org.apache.spark.sql.types.StructType = {
    val byName = prev.fields.map(f => f.name -> f).toMap
    add.fields.foreach { f =>
      byName.get(f.name).foreach { p =>
        require(p.dataType == f.dataType,
          s"schema evolution type conflict at $where: column '${f.name}' " +
            s"is ${p.dataType.simpleString} in the table but " +
            s"${f.dataType.simpleString} in the append")
      }
    }
    val fresh = add.fields.filterNot(f => byName.contains(f.name))
      .map(_.copy(nullable = true))
    org.apache.spark.sql.types.StructType(prev.fields ++ fresh)
  }

  /** Publish at an EXPLICIT version — the seam that makes the collision
    * guard testable: a racing writer is exactly one that chose `v`
    * before a rival published it.
    */
  private[graft] def commitAt(
      spark: SparkSession,
      path: String,
      v: Int,
      keepFiles: Seq[String],
      add: Option[DataFrame],
      schemaHint: Option[org.apache.spark.sql.types.StructType] = None,
      txn: Option[(String, Long)] = None): Int = {
    txn.foreach { case (app, _) =>
      require(app.matches("[A-Za-z0-9._-]+"),
        s"txn appId must be [A-Za-z0-9._-]+: '$app'")
    }
    val f0 = fs(spark, path)
    val manifestDir = new org.apache.hadoop.fs.Path(s"${logDir(path)}/v=$v")
    // Single-writer contract, enforced loudly: if another committer
    // raced us to version v its manifest already exists — fail rather
    // than silently fork history (no conditional-put on plain
    // filesystems, so detection is best-effort; mode("error") on the
    // manifest write below is the backstop).
    require(!f0.exists(manifestDir),
      s"manifest collision at $path version $v: concurrent writer detected " +
        "(Snapshots is single-writer; serialize committers externally)")
    // Resolve the version's schema BEFORE any write: an evolving append
    // WIDENS the table schema (union; a type conflict fails loudly here,
    // leaving no orphan data and no manifest), empty versions stay
    // readable, and reads are version-pinned. Persisted beside the
    // manifest as `_schema.json` (underscore-prefixed → invisible to the
    // manifest's parquet reader).
    val prevSchema =
      if (v > 1) readSchema(spark, path, v - 1) else None
    val schema: Option[org.apache.spark.sql.types.StructType] =
      schemaHint.orElse {
        (prevSchema, add.map(_.schema)) match {
          case (Some(p), Some(a)) => Some(unionSchema(p, a, s"$path v$v"))
          case (p, a) => a.orElse(p).orElse(keepFiles.headOption.map(rel =>
            spark.read.parquet(s"$path/$rel").schema))
        }
      }
    val newRel = add match {
      case Some(df) =>
        val sub = s"c${v}_${java.util.UUID.randomUUID().toString.take(8)}"
        val dir = s"${dataDir(path)}/$sub"
        df.write.mode("error").parquet(dir)
        val f = fs(spark, path)
        val parts = f.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
          .map(_.getPath.getName)
          .filter(_.endsWith(".parquet"))
        // zone maps for data skipping: the new files' numeric column
        // ranges, read from the footers just written, stored beside them
        // (stats live and die with their commit's files — vacuum sweeps
        // the drained directory, _stats.json included)
        writeStats(spark, dir, parts)
        parts.map(name => s"data/$sub/$name")
      case None => Seq.empty
    }
    // STAGED publish: manifest parquet + sidecars (_schema.json,
    // _txn.json) are assembled in a staging directory whose name
    // `versions()` ignores, then RENAMED to `v=N` in one filesystem
    // move — the commit point stays a single atomic operation, so no
    // crash can publish a version whose schema or txn watermark is
    // missing (a half-written staging dir is invisible garbage; vacuum
    // sweeps it).
    import spark.implicits._
    val staged = s"${logDir(path)}/_staged_v${v}_" +
      java.util.UUID.randomUUID().toString.take(8)
    (keepFiles ++ newRel).sorted.toDF("file")
      .coalesce(1).write.mode("error").parquet(staged)
    schema.foreach { s =>
      val out = f0.create(
        new org.apache.hadoop.fs.Path(s"$staged/_schema.json"), false)
      try out.write(s.json.getBytes("UTF-8")) finally out.close()
    }
    txn.foreach { case (app, batch) =>
      val out = f0.create(
        new org.apache.hadoop.fs.Path(s"$staged/_txn.json"), false)
      try out.write(s"""{"app":"$app","batch":$batch}""".getBytes("UTF-8"))
      finally out.close()
    }
    require(f0.rename(new org.apache.hadoop.fs.Path(staged), manifestDir),
      s"manifest publish failed at $path version $v: rename refused " +
        "(concurrent writer detected — Snapshots is single-writer)")
    v
  }
}
