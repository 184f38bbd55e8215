package graft.steps

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType, TimestampType}

import graft.catalog.Warehouse
import graft.ledger.RunLedger
import graft.macros.Macros

/** Everything a step needs at execution time — session, warehouse,
  * ledger hooks, macro context, audit identities. The reference threads
  * the same set through `Step.Execute` → `CommandExecuter`
  * (`Step.cs:1083-1252`).
  */
final case class StepContext(
    spark: SparkSession,
    warehouse: Warehouse,
    ledger: RunLedger,
    macroCtx: Macros.Context,
    schrittRunId: Option[Long] = None,
    konfigurationenId: Option[Long] = None,
    /** Tenant-resolved SOURCE connection (`Step.cs:1285-1767`): a JDBC
      * spec routes COPY's source query to that database via full-query
      * pushdown; parquet/CSV specs keep the registered-view model (the
      * session catalog IS that source).
      */
    sourceSpec: Option[graft.sources.Connections.Spec] = None,
    /** Audit identities: `Nutzer` = destination user, `Datenproduzent` =
      * engine login (`CommandExecuter.cs:603-678`).
      */
    dstUser: String = "etl_user",
    datenproduzent: String = "graft",
    /** `Abfragezeitpunkt` — the workflow's start instant stamped on every
      * copied row.
      */
    abfragezeitpunkt: LocalDateTime = LocalDateTime.of(2026, 1, 1, 0, 0, 0))

/** A proc-signalled step failure — the reference's `@OutputParam1 = -1`
  * contract (`CommandExecuter.cs:1024-1041`): the executed SQL itself
  * reports failure through its scalar result, distinct from an
  * execution error.
  */
final class StepSignalledFailure(msg: String) extends RuntimeException(msg)

/** Step executors — the reference's operators (SURVEY §2.1) as Spark
  * plans with real side effects. Each executor returns the moved row
  * count (recorded as `ErwarteteDaten`) where the reference records one.
  */
object Steps {

  /** Dispatch on `Befehlstyp` like `Step.cs:1083-1252`. */
  def execute(spec: StepSpec, ctx: StepContext): Option[Long] = spec.befehlstyp match {
    case CommandType.Copy if spec.aufgabentyp == TaskType.Pipeline && spec.zeitscheibe =>
      // reject loudly (r12 review): every other COPY applies the takeover
      // window as month slices — silently ignoring the flag here would be
      // a semantic downgrade the author only notices in the output
      throw new IllegalArgumentException(
        "Zeitscheibe is not defined for PIPELINE steps — slice the corpus in " +
          "the transform's input view (the q103 fixture's takeover predicate) instead")
    case CommandType.Copy if spec.aufgabentyp == TaskType.Pipeline =>
      Some(pipelineStep(spec, ctx))
    case CommandType.Copy if spec.aufgabentyp == TaskType.Stream && spec.zeitscheibe =>
      throw new IllegalArgumentException(
        "Zeitscheibe is not defined for STREAM steps — a stream's batching is " +
          "its trigger; slice the watch folder's content upstream instead")
    case CommandType.Copy if spec.aufgabentyp == TaskType.Stream =>
      Some(streamStep(spec, ctx))
    case CommandType.Copy if spec.aufgabentyp == TaskType.Maintenance && spec.zeitscheibe =>
      throw new IllegalArgumentException(
        "Zeitscheibe is not defined for MAINTENANCE steps — compaction and " +
          "re-layout always rewrite the whole table, not a takeover slice")
    case CommandType.Copy if spec.aufgabentyp == TaskType.Maintenance =>
      maintenanceStep(spec, ctx); None
    case CommandType.Copy if !spec.zeitscheibe => Some(copy(spec, ctx))
    case CommandType.Copy => Some(copyTimesliced(spec, ctx))
    case CommandType.Transfer if spec.aufgabentyp == TaskType.Csv => Some(csvExport(spec, ctx))
    case CommandType.Transfer if spec.aufgabentyp == TaskType.Excel =>
      Some(ingest(spec, ctx, reader = xlsxReader))
    case CommandType.Transfer if spec.aufgabentyp == TaskType.Jsonl =>
      Some(ingest(spec, ctx, reader = jsonlReader))
    case CommandType.Transfer => Some(ingest(spec, ctx))
    case CommandType.SqlTarget | CommandType.SqlSource => sqlExec(spec, ctx); None
    case CommandType.Test => testStep(spec, ctx); None
    case CommandType.Exec =>
      // NYI in the reference too (`Step.cs:1191-1197`) — parity.
      throw new NotImplementedError("EXEC steps are NYI (reference parity)")
    case other => throw new IllegalArgumentException(s"unknown Befehlstyp: $other")
  }

  /** S1 COPY (`CommandExecuter.cs:322-544`): source query → rename/align
    * to the destination schema with audit defaults → bulk append. One
    * narrow scan→project→write stage, no shuffle; the row count comes
    * from an `Observation` on the write itself (no second scan — the
    * reference needs a COUNT(*) pre-pass, `362-371`, we don't).
    */
  def copy(spec: StepSpec, ctx: StepContext): Long = {
    val target = targetTable(spec)
    val query = Macros.expand(spec.befehl, ctx.macroCtx)
    ctx.ledger.logQuery(query, ctx.schrittRunId, ctx.konfigurationenId)
    writeAligned(sourceFrame(query, ctx), target, ctx)
  }

  /** COPY/PIPELINE (our Spark-native step type, [[TaskType.Pipeline]]):
    * the macro-expanded Befehl names a registered curation transform
    * ([[Transforms]]) whose output is written to the Zieltabelle with
    * the exact COPY lifecycle — query-log row, destination alignment +
    * audit columns, `Observation` row count into `ErwarteteDaten` —
    * and the transform's staged persists are released when the write
    * finishes (the operators' service-path contract).
    */
  def pipelineStep(spec: StepSpec, ctx: StepContext): Long = {
    val target = targetTable(spec)
    val command = Macros.expand(spec.befehl, ctx.macroCtx)
    ctx.ledger.logQuery(command, ctx.schrittRunId, ctx.konfigurationenId)
    val staged = Transforms.resolve(command, ctx)
    try writeAligned(staged.frame, target, ctx)
    finally staged.release()
  }

  /** COPY/STREAM (r13, VERDICT next #4): the macro-expanded Befehl
    * names a registered streaming transform ([[StreamTransforms]]) that
    * starts, drains (`AvailableNow`), and reports a Structured
    * Streaming query — the orchestrated reading of the engine's
    * always-on surface. The stream writes its own warehouse tables
    * (state schemas are the stream's, bootstrapped bare — see
    * [[StreamTransforms]] on why step audit columns must not leak into
    * stream-appended tables), so unlike COPY/PIPELINE there is no
    * `writeAligned`; the transform's admitted-row count lands in
    * `ErwarteteDaten` and the query log carries the expanded command.
    */
  def streamStep(spec: StepSpec, ctx: StepContext): Long = {
    val command = Macros.expand(spec.befehl, ctx.macroCtx)
    ctx.ledger.logQuery(command, ctx.schrittRunId, ctx.konfigurationenId)
    val rows = StreamTransforms.resolve(command, ctx)
    ctx.schrittRunId.foreach(ctx.ledger.recordExpectedRows(_, rows))
    rows
  }

  /** COPY/MAINTENANCE (r13): the macro-expanded Befehl names a
    * warehouse maintenance action applied to the step's own
    * Zieltabelle — `compact [rows_per_file=N]` ([[Warehouse.compact]]),
    * `optimize_zorder cols=a,b [bits=6] [rows_per_file=N]
    * [quantile=true]` ([[Warehouse.optimizeZOrder]]),
    * `refresh_stats cols=a,b` ([[Warehouse.refreshStats]] — persist the
    * per-file footer envelopes as the stats-manifest sibling table a
    * manifest-planned read prunes from), or `delete_where
    * predicate="…"` ([[Warehouse.deleteWhere]] with remanifest — the
    * retention verb). The table comes
    * from the Zieltabelle, NOT a command parameter, so the table-mutex
    * claim and the mutated table cannot diverge (see
    * [[TaskType.Maintenance]]); contents are unchanged by contract —
    * except `delete_where`, whose whole point is dropping the matched
    * rows — and the outcome lands in the message log (the
    * reference's trace surface, `Helper.cs:1862-2020` — row counts
    * stay untouched, so there is no `ErwarteteDaten` for maintenance).
    */
  def maintenanceStep(spec: StepSpec, ctx: StepContext): Unit = {
    val command = Macros.expand(spec.befehl, ctx.macroCtx)
    ctx.ledger.logQuery(command, ctx.schrittRunId, ctx.konfigurationenId)
    val (action, params) = Transforms.parse("MAINTENANCE", command)
    Transforms.rejectUnknown("MAINTENANCE", action, params, action match {
      case "compact" => Set("rows_per_file")
      case "optimize_zorder" => Set("cols", "bits", "rows_per_file", "quantile")
      case "refresh_stats" => Set("cols", "incremental")
      case "delete_where" => Set("predicate", "range")
      case _ => params.keySet // unknown action fails below with the action list
    })
    val table = targetTable(spec)
    // a typo'd Zieltabelle must not report a successful 0->0-file run
    // (the silent-downgrade class this repo rejects loudly everywhere)
    require(ctx.warehouse.exists(ctx.spark, table),
      s"MAINTENANCE step ${spec.id}: table `$table` does not exist in the warehouse")
    def layoutCols: Seq[String] = {
      val cols = Transforms.str(params, "cols").split(",").map(_.trim).filter(_.nonEmpty).toSeq
      require(cols.nonEmpty, s"$action on `$table` needs at least one column in cols=")
      cols
    }
    val outcome = action match {
      case "compact" =>
        val (before, after) = ctx.warehouse.compact(ctx.spark, table,
          targetRowsPerFile = Transforms.long(params, "rows_per_file", Some(1000000L)))
        s"$before -> $after files"
      case "optimize_zorder" =>
        val (before, after) = ctx.warehouse.optimizeZOrder(ctx.spark, table, layoutCols,
          bits = Transforms.long(params, "bits", Some(6L)).toInt,
          targetRowsPerFile = Transforms.long(params, "rows_per_file", Some(1000000L)),
          quantile = params.get("quantile").exists(_.toBoolean))
        s"$before -> $after files"
      // refresh_stats cols=a,b — persist per-file footer envelopes as the
      // `<table>__stats` manifest sibling (Warehouse.refreshStats), the
      // metadata a manifest-planned read (statsPrunedRead) prunes from
      // without re-opening footers; chained after compact/optimize_zorder
      // under the same mutex claim, so the listing can't be swapped away
      // refresh_stats cols=a,b — full footer sweep (creates/widens the
      // manifest); refresh_stats incremental=true — r14, the
      // append-window verb: keep live manifest rows verbatim, open
      // footers only for never-manifested files, drop vanished ones.
      // cols= and incremental= are mutually exclusive: the incremental
      // pass derives its column set from the existing manifest, and a
      // silently ignored cols= would read as a layout change that never
      // happened.
      case "refresh_stats" if params.get("incremental").exists(_.toBoolean) =>
        require(!params.contains("cols"),
          s"refresh_stats on `$table`: incremental=true derives its columns " +
            "from the existing manifest — drop cols= or run a full refresh")
        val (kept, added, dropped) =
          ctx.warehouse.refreshStatsIncremental(ctx.spark, table)
        s"incremental: $kept envelopes kept, $added added, $dropped dropped"
      case "refresh_stats" =>
        val cols = layoutCols
        val n = ctx.warehouse.refreshStats(ctx.spark, table, cols)
        s"$n envelopes over ${cols.size} columns"
      // delete_where predicate="<SQL boolean over the table's columns>"
      // — the RETENTION verb (Delta's DELETE as maintenance): rows
      // matching the predicate are dropped through the crash-safe
      // rewrite, and a stats manifest is re-collected with the rewrite
      // (Warehouse.deleteWhere remanifest=true) so pruned reads keep
      // their quality. The one maintenance action that changes CONTENTS
      // by design; a no-match predicate is a metadata-sized probe.
      //
      // delete_where range="col=lo..hi" (r14) — the MANIFEST-PLANNED
      // retention form (Warehouse.deleteWhereRange): on a manifested
      // table the match probe schedules only envelope-intersecting
      // files (a no-match probe is one small manifest read, no scan job
      // at all — the shape retention re-runs hit every time), and
      // bounds are typed per the column — integral, `yyyy-MM-dd` dates,
      // `yyyy-MM-ddTHH:mm:ss` timestamps, `*` for an open side — so
      // the canonical "drop everything before the horizon" window is
      // range="ts_col=*..<horizon>". Exactly one of predicate=/range=.
      case "delete_where" =>
        require(params.contains("predicate") ^ params.contains("range"),
          s"delete_where on `$table` needs exactly one of predicate= or range=")
        params.get("range") match {
          case Some(spec) =>
            val ranges = Transforms.parseRanges(ctx, table, "delete_where", spec)
            require(ranges.size == 1,
              s"delete_where on `$table` deletes one column range per step " +
                s"(got ${ranges.size}: $spec)")
            val (c, lo, hi) = ranges.head
            if (ctx.warehouse.deleteWhereRange(ctx.spark, table, c, lo, hi,
                remanifest = true))
              s"deleted rows with `$c` in [$spec]"
            else s"no rows match [$spec] — manifest-planned probe only, no rewrite"
          case None =>
            val predicate = Transforms.str(params, "predicate")
            require(predicate.trim.nonEmpty,
              s"delete_where on `$table` needs a non-empty predicate=")
            if (ctx.warehouse.deleteWhere(ctx.spark, table, predicate, remanifest = true))
              s"deleted rows matching [$predicate]"
            else s"no rows match [$predicate] — probe only, no rewrite"
        }
      case other => throw new IllegalArgumentException(
        s"unknown MAINTENANCE action '$other' (known: compact, optimize_zorder, " +
          "refresh_stats, delete_where)")
    }
    ctx.ledger.message(
      s"MAINTENANCE $action on $table: $outcome",
      schrittRunId = ctx.schrittRunId)
  }

  /** COPY's source frame: a tenant-resolved JDBC source executes the
    * step SQL in the SOURCE database (`(query) q` full-query pushdown —
    * the reference ships the Befehl to the source the same way,
    * `CommandExecuter.cs:463-510`); otherwise the session catalog is the
    * source and the query runs on the registered views.
    */
  private def sourceFrame(query: String, ctx: StepContext): DataFrame =
    ctx.sourceSpec match {
      case Some(j: graft.sources.Connections.Jdbc) =>
        graft.sources.Connections.read(ctx.spark, j, query)
      case _ => ctx.spark.sql(query)
    }

  /** S2 COPY + Zeitscheibe (`CommandExecuter.cs:50-304`): the takeover
    * window expands to month slices; the reference loops them serially.
    * How the slices compile depends on what the source can parallelize
    * (VERDICT r4 "what's wrong" #3):
    *
    *   - JDBC source: one pushed-down query PER slice, unioned — the
    *     per-slice bounds are the read parallelism against the external
    *     DB (its only partitioning lever), and the union reads them
    *     concurrently instead of the reference's serial loop.
    *   - Catalog source (parquet/ORC/views): ONE query over the whole
    *     takeover range `[firstSlice.from, lastSlice.to]` — a single
    *     scan (partition-pruned when the table is date-partitioned)
    *     instead of W unioned branches that each re-scan an
    *     unpartitioned source. Equivalent because slice windows are
    *     contiguous at the reference's own second resolution (its
    *     `yyyyMMdd000000`/`yyyyMMdd235959` bounds) and Zeitscheibe's
    *     contract is range batching; the first-slice-unclamped quirk is
    *     preserved since the overall range reuses `windows.last.to`.
    *
    * **Sub-second neutralization (VERDICT r6 wrong #3, closing ADVICE
    * r5's open choice)**: the reference's second-granular slice bounds
    * leave gaps `(23:59:59, 24:00:00)` between slices — its serial loop
    * silently DROPS rows with fractional-second timestamps there. Both
    * paths here take the half-open reading instead (no data loss):
    * every INTERIOR slice's upper bound is rendered as `23:59:59
    * .999999` — the inclusive-BETWEEN spelling of `[from, nextFrom)` at
    * Spark's microsecond timestamp precision — so the per-slice union
    * and the fused range return identical row sets BY CONSTRUCTION, for
    * any slice-column precision, with no duplicate coverage (the next
    * slice starts at `.000000`). The last slice keeps the takeover's
    * own upper bound. `StepsSpec` proves both paths identical on a
    * fractional-second fixture.
    *
    * **Audit parity** (`CommandExecuter.cs:143-261` logs one
    * `ETL_SQL_Anfragen` row per slice): the catalog path logs the SAME
    * per-slice query rows the reference's loop would, and documents the
    * fold in a `Meldungen` message carrying the actually-executed range
    * query — row-for-row query-log parity, plus the fold made visible.
    */
  def copyTimesliced(spec: StepSpec, ctx: StepContext): Long =
    writeAligned(timeslicedSource(spec, ctx), targetTable(spec), ctx)

  /** A Spark-SQL timestamp literal, with microseconds rendered only
    * when present (interior slice bounds carry `.999999`; everything
    * else keeps the reference's second-granular spelling).
    */
  private def tsLiteral(t: LocalDateTime): String = {
    val base = t.format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    if (t.getNano == 0) s"TIMESTAMP '$base'"
    else f"TIMESTAMP '$base.${t.getNano / 1000}%06d'"
  }

  /** The slice bound as the SOURCE dialect's timestamp literal: a query
    * pushed to an external DB must spell the literal the way THAT engine
    * parses it (Oracle's dialect emits `{ts '…'}`, most others the
    * quoted string form — Derby live-rejects the ANSI `TIMESTAMP '…'`
    * Spark SQL uses, which the StepsSpec dual-path fixture caught).
    * `compileValue` is the same public dialect hook Spark itself uses to
    * push filter literals down.
    */
  private def jdbcTsLiteral(j: graft.sources.Connections.Jdbc, t: LocalDateTime): String =
    org.apache.spark.sql.jdbc.JdbcDialects.get(j.url)
      .compileValue(java.sql.Timestamp.valueOf(t)).toString

  /** The timesliced COPY's source frame (exposed for plan audits). */
  private[steps] def timeslicedSource(spec: StepSpec, ctx: StepContext): DataFrame = {
    val windows = MonthWindows.windows(ctx.macroCtx.takeoverVon, ctx.macroCtx.takeoverBis)
    // half-open contiguous coverage (see the scaladoc above): interior
    // upper bounds extend to the last microsecond before the next slice,
    // CAPPED at the overall takeover end — a month-aligned takeover ends
    // with a degenerate last window (reference quirk, MonthWindows), so
    // the real final slice sits at an interior index and an uncapped
    // extension would ingest fractional-second rows beyond the requested
    // range that the fused catalog path excludes (ADVICE r7).
    val overallTo = windows.last.to
    val bounds = windows.zipWithIndex.map { case (w, i) =>
      val to =
        if (i == windows.size - 1) w.to
        else {
          val ext = w.to.plusNanos(999999000L)
          if (ext.isAfter(overallTo)) overallTo else ext
        }
      (w.from, to)
    }
    def sliceQuery(from: LocalDateTime, to: LocalDateTime,
                   literal: LocalDateTime => String): String = {
      // regex on the SAME grammar Macros accepts (interior whitespace:
      // `## Uebernahme_von ##` is legal) — an exact-string replace
      // missed those spellings, so Macros.expand would substitute the
      // bare whole-range date into EVERY slice and the JDBC union read
      // the full range N times (r10 review)
      def sub(text: String, name: String, value: String): String =
        ("##\\s*" + name + "\\s*##").r.replaceAllIn(
          text, java.util.regex.Matcher.quoteReplacement(value))
      Macros.expand(
        sub(sub(spec.befehl, "Uebernahme_von", literal(from)),
          "Uebernahme_bis", literal(to)),
        ctx.macroCtx)
    }
    ctx.sourceSpec match {
      case Some(j: graft.sources.Connections.Jdbc) =>
        val slices = bounds.map { case (from, to) =>
          val q = sliceQuery(from, to, jdbcTsLiteral(j, _))
          ctx.ledger.logQuery(q, ctx.schrittRunId, ctx.konfigurationenId)
          graft.sources.Connections.read(ctx.spark, j, q)
        }
        slices.reduce(_ unionByName _)
      case _ =>
        bounds.foreach { case (from, to) =>
          ctx.ledger.logQuery(sliceQuery(from, to, tsLiteral),
            ctx.schrittRunId, ctx.konfigurationenId)
        }
        val q = sliceQuery(windows.head.from, windows.last.to, tsLiteral)
        ctx.ledger.message(
          s"Zeitscheiben 1..${windows.size} zu einem Scan gefaltet " +
            s"[${windows.head.from} .. ${windows.last.to}]: $q",
          schrittRunId = ctx.schrittRunId)
        ctx.spark.sql(q)
    }
  }

  /** Destination-probe schema alignment + audit columns
    * (`CommandExecuter.cs:603-678`): add missing destination columns —
    * `Nutzer`, `Abfragezeitpunkt`, `Datenproduzent` get audit values,
    * everything else NULL — then select in destination order, with every
    * PRESENT source column cast to the destination's type (r10 review:
    * append-only parquet has no write-time validation, so one COPY from
    * a source that types a shared column differently — a CSV view's
    * all-string schema, say — would land mixed-type files and brick
    * every later read of the table; the reference's SqlBulkCopy gets
    * this coercion from the database engine). First write to a fresh
    * table skips the probe (schema from source + audit columns), like
    * the reference's initial load.
    */
  def alignToDestination(src: DataFrame, destSchema: StructType, ctx: StepContext): DataFrame = {
    val srcCols = src.columns.map(_.toLowerCase).toSet
    val srcTypes = src.schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    val withDefaults = destSchema.fields.foldLeft(src) { (df, f) =>
      if (srcCols.contains(f.name.toLowerCase)) {
        // under non-ANSI Spark an unconvertible value ('abc' → INT) casts
        // to NULL silently; the reference's SqlBulkCopy/DB coercion RAISES
        // (ADVICE r10) — so guard the retype with try_cast + raise_error:
        // a non-null source value the cast would null fails the step
        // loudly, with the SAME step-attributable message whether the
        // session runs ANSI or not. Same-type columns skip the guard
        // (cast is identity there).
        if (srcTypes.get(f.name.toLowerCase).contains(f.dataType))
          df.withColumn(f.name, col(f.name).cast(f.dataType))
        else {
          val tried = col(f.name).try_cast(f.dataType)
          df.withColumn(f.name,
            when(col(f.name).isNotNull && tried.isNull,
              raise_error(concat(
                lit(s"COPY type coercion failed: column ${f.name} value '"),
                col(f.name).cast("string"),
                lit(s"' does not convert to ${f.dataType.simpleString}"))))
              .otherwise(tried))
        }
      }
      else f.name.toLowerCase match {
        case "nutzer" => df.withColumn(f.name, lit(ctx.dstUser))
        case "abfragezeitpunkt" =>
          df.withColumn(f.name, lit(ctx.abfragezeitpunkt.format(
            DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))).cast(f.dataType))
        case "datenproduzent" => df.withColumn(f.name, lit(ctx.datenproduzent))
        case _ => df.withColumn(f.name, lit(null).cast(f.dataType))
      }
    }
    withDefaults.select(destSchema.fieldNames.map(col): _*)
  }

  private def writeAligned(src: DataFrame, target: String, ctx: StepContext): Long = {
    val aligned =
      if (ctx.warehouse.exists(ctx.spark, target))
        alignToDestination(src, ctx.warehouse.read(ctx.spark, target).schema, ctx)
      else auditColumns(src, ctx)
    val obs = new Observation()
    ctx.warehouse.append(aligned.observe(obs, count(lit(1)).as("rows")), target)
    val rows = obs.get("rows").asInstanceOf[Long]
    ctx.schrittRunId.foreach(ctx.ledger.recordExpectedRows(_, rows))
    rows
  }

  private def auditColumns(src: DataFrame, ctx: StepContext): DataFrame =
    src
      .withColumn("nutzer", lit(ctx.dstUser))
      .withColumn("abfragezeitpunkt",
        lit(ctx.abfragezeitpunkt.format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")))
          .cast("timestamp_ntz"))
      .withColumn("datenproduzent", lit(ctx.datenproduzent))

  /** S4 TRANSFER/CSV export (`CommandExecuter.cs:2140-2365`): query →
    * CSV file honoring all 7 `ETL_Paketschritt_Parameter` options. Every
    * reference knob maps to a built-in CSV-writer option; `Zahlenformat`
    * (a .NET numeric format) is applied as a decimal rescale before the
    * write since the CSV writer has no number-format option.
    */
  def csvExport(spec: StepSpec, ctx: StepContext): Long = {
    val outDir = spec.zieltabelle.getOrElse(
      throw new IllegalArgumentException("CSV export needs a target path in Zieltabelle"))
    val query = Macros.expand(spec.befehl, ctx.macroCtx)
    ctx.ledger.logQuery(query, ctx.schrittRunId, ctx.konfigurationenId)
    val df0 = ctx.spark.sql(query)
    val df = spec.csv.zahlenformat match {
      case Some(fmtStr) =>
        // interpret e.g. "0.00" as a scale: digit PLACEHOLDERS after the
        // dot (r10 review: counting the whole string's trailing zeros
        // gave scale 1 for the integer formats "0" / "#,##0")
        val scale = fmtStr.lastIndexOf('.') match {
          case -1 => 0
          case i  => fmtStr.drop(i + 1).takeWhile(c => c == '0' || c == '#').length
        }
        df0.schema.fields.foldLeft(df0) { (d, f) =>
          f.dataType match {
            case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType =>
              d.withColumn(f.name, col(f.name).cast(s"decimal(38,$scale)"))
            case _ => d
          }
        }
      case None => df0
    }
    val obs = new Observation()
    // single-file output is the reference's behavior but serializes the
    // extract through one task, so it's an explicit option (`einzeldatei`)
    // — the scale-safe default hands consumers the directory of parts
    val shaped = if (spec.csv.einzeldatei) df.coalesce(1) else df
    var w = shaped.observe(obs, count(lit(1)).as("rows")).write
      .option("header", spec.csv.kopfzeile.toString)
      .option("sep", spec.csv.trennzeichen)
      .option("timestampFormat", spec.csv.datumsformat)
      .option("timestampNTZFormat", spec.csv.datumsformat)
      .option("dateFormat", spec.csv.datumsformat.takeWhile(c => !"Hms".contains(c)).trim)
      .option("escape", spec.csv.escapecharacter)
      .option("nullValue", spec.csv.leerwert)
      .option("emptyValue", "")
    w = spec.csv.textqualifizierer match {
      case Some(q) => w.option("quote", q)
      case None    => w.option("quote", "\u0000") // disable quoting
    }
    w.mode("overwrite").csv(outDir)
    val rows = obs.get("rows").asInstanceOf[Long]
    ctx.schrittRunId.foreach(ctx.ledger.recordExpectedRows(_, rows))
    rows
  }

  /** Pluggable file readers for TRANSFER ingest — both produce the same
    * all-string, header-named shape, so the pipeline around them (schema,
    * audit columns, idempotency, lifecycle) is format-agnostic. EXCEL is
    * the dependency-free zip+StAX decoder in [[graft.sources.Xlsx]]
    * (`CommandExecuter.cs:1915-2027` semantics: first sheet, first used
    * row = header, values as strings).
    */
  type FileReader = (SparkSession, String) => DataFrame

  val csvReader: FileReader = (spark, file) =>
    spark.read.option("header", "true").option("quote", "\"").csv(file)

  val xlsxReader: FileReader = (spark, file) =>
    graft.sources.Xlsx.toDataFrame(spark, file)

  /** Line-delimited JSON (r14): Spark's json source infers per-file
    * types, so every column is cast back to string to meet the ingest
    * contract — alignment to the target schema is `writeAligned`'s
    * try_cast job, same as CSV, and a file must not shape the table by
    * its own inference. */
  val jsonlReader: FileReader = (spark, file) => {
    val df = spark.read.json(file)
    df.select(df.columns.map(c => org.apache.spark.sql.functions.col(c)
      .cast("string").as(c)): _*)
  }

  /** S3 TRANSFER ingest (`CommandExecuter.cs:1335-1640`): every file in
    * `{dir}/Insert` is moved to `{dir}/TMP`, read, columns renamed via
    * `mapping.csv`, audit columns added (`1974-1982`), rows for that
    * filename deleted (idempotent retry, `1130-1157`), appended; on
    * success the file is deleted, on failure rows are rolled back and
    * the file moved back to `Insert`. Per-file loop like the reference —
    * rollback granularity is the file. A file stranded in TMP by a hard
    * crash is recovered to Insert on the next run (delete-by-filename
    * makes the retry idempotent). Deployment constraint (r10 review):
    * the drop folder is listed driver-side with java.nio but READ by
    * executor tasks (csv/binaryFile scans), so in cluster mode `Befehl`
    * must name storage visible to both — a shared mount or DFS path —
    * exactly like the reference's UNC share; a driver-only local path
    * works in local mode only.
    */
  def ingest(spec: StepSpec, ctx: StepContext,
      reader: FileReader = csvReader): Long = {
    val baseDir = Paths.get(spec.befehl)
    val insertDir = baseDir.resolve("Insert")
    val tmpDir = baseDir.resolve("TMP")
    Files.createDirectories(tmpDir)
    val target = targetTable(spec)
    val mapping = readMapping(ctx.spark, baseDir)

    // crash recovery (r10 review): a file moved to TMP/ by a run that
    // died mid-append would otherwise sit there forever, silently never
    // ingested (the catch-based rollback only runs when the JVM
    // survives). The delete-by-filename idempotency makes reprocessing
    // safe, so stranded TMP files go back to Insert/ before listing.
    if (Files.isDirectory(tmpDir)) {
      val stranded = {
        val s = Files.list(tmpDir)
        try s.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
        finally s.close()
      }
      if (stranded.nonEmpty) Files.createDirectories(insertDir)
      stranded.foreach { f =>
        ctx.ledger.message(
          s"recovering stranded TMP file ${f.getFileName} from a crashed run",
          schrittRunId = ctx.schrittRunId)
        Files.move(f, insertDir.resolve(f.getFileName.toString),
          StandardCopyOption.REPLACE_EXISTING)
      }
    }

    val files: Seq[Path] =
      if (Files.isDirectory(insertDir)) {
        val stream = Files.list(insertDir)
        try stream.iterator().asScala.filter(Files.isRegularFile(_)).toSeq.sortBy(_.toString)
        finally stream.close()
      } else Seq.empty

    var total = 0L
    files.foreach { file =>
      val name = file.getFileName.toString
      // SQL-escape for the delete predicate — a quote in the filename must
      // not break (or worse, widen) the idempotent delete
      val nameSql = name.replace("'", "''")
      val tmpFile = tmpDir.resolve(name)
      Files.move(file, tmpFile, StandardCopyOption.REPLACE_EXISTING)
      try {
        val raw = reader(ctx.spark, tmpFile.toString)
        val renamed = mapping.foldLeft(raw) { case (df, (from, to)) =>
          if (df.columns.contains(from)) df.withColumnRenamed(from, to) else df
        }
        // a file must not RESHAPE the table (r15, ADVICE r14): once the
        // target exists, this file's column set must equal the table's
        // non-audit columns — CSV can only trip this with a changed
        // header, but JSONL infers its schema from the file's own keys,
        // so a column that is absent/all-null in one drop would silently
        // narrow the append (mixed-schema parquet dir) instead of
        // failing the file toward the rollback path
        if (ctx.warehouse.exists(ctx.spark, target)) {
          val expected = ctx.warehouse.read(ctx.spark, target)
            .columns.toSet -- auditColumns
          val got = renamed.columns.toSet
          require(got == expected,
            s"file $name does not match table $target's ingest schema " +
              s"(missing: ${(expected -- got).toSeq.sorted.mkString(", ")}; " +
              s"unexpected: ${(got -- expected).toSeq.sorted.mkString(", ")})")
        }
        val audited = renamed
          .withColumn("dateiname", lit(name))
          .withColumn("exportdatum", lit(ctx.abfragezeitpunkt.format(
            DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))).cast("timestamp_ntz"))
          .withColumn("loeschdatum", lit(null).cast("timestamp_ntz"))
          .withColumn("datenproduzent", lit(ctx.datenproduzent))
          .withColumn("abfragezeitpunkt", lit(ctx.abfragezeitpunkt.format(
            DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))).cast("timestamp_ntz"))
        // idempotent retry: drop any rows of a previous partial load
        ctx.warehouse.deleteWhere(ctx.spark, target, s"dateiname = '$nameSql'")
        val obs = new Observation()
        ctx.warehouse.append(audited.observe(obs, count(lit(1)).as("rows")), target)
        total += obs.get("rows").asInstanceOf[Long]
        Files.delete(tmpFile)
      } catch {
        case e: Throwable =>
          // rollback: delete this file's rows, move the file back
          try ctx.warehouse.deleteWhere(ctx.spark, target, s"dateiname = '$nameSql'")
          finally Files.move(tmpFile, insertDir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
          throw e
      }
    }
    ctx.schrittRunId.foreach(ctx.ledger.recordExpectedRows(_, total))
    total
  }

  /** The audit columns [[ingest]] appends beside every file's own —
    * excluded from the per-file schema check above. */
  private val auditColumns = Set("dateiname", "exportdatum", "loeschdatum",
    "datenproduzent", "abfragezeitpunkt")

  private def readMapping(spark: SparkSession, baseDir: Path): Seq[(String, String)] = {
    val mappingFile = baseDir.resolve("mapping.csv")
    if (Files.isRegularFile(mappingFile)) {
      // 2-column rename map, GenericParser-equivalent (`CommandExecuter.cs:2037-2127`)
      spark.read.option("header", "true").option("quote", "\"")
        .csv(mappingFile.toString)
        .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
    } else Seq.empty
  }

  /** S5/S6 SQL_TARGET / SQL_SOURCE (`CommandExecuter.cs:997-1075`):
    * macro-expand and execute the text with Spark SQL (for managed
    * tables Spark IS the target DBMS; SQL_SOURCE — NYI in the reference,
    * `Step.cs:1232-1238` — is the same action against source views, so
    * we implement it).
    */
  def sqlExec(spec: StepSpec, ctx: StepContext): Unit = {
    val text = Macros.expand(spec.befehl, ctx.macroCtx)
    ctx.ledger.logQuery(text, ctx.schrittRunId, ctx.konfigurationenId)
    (spec.befehlstyp, ctx.sourceSpec) match {
      // SQL_SOURCE with a tenant-resolved JDBC source runs IN that
      // database, like COPY's sourceFrame — a source-side data-quality
      // probe must see the tenant's data, not same-named session views
      case (CommandType.SqlSource, Some(j: graft.sources.Connections.Jdbc)) =>
        sqlExecJdbc(text, j, spec, ctx)
      case _ =>
        val df = ctx.spark.sql(text)
        // DDL/DML commands execute eagerly inside sql() — nothing to
        // fetch. A SELECT-shaped Befehl is the reference's scalar
        // @OutputParam probe (`CommandExecuter.cs:997-1075`): sample two
        // rows instead of collecting the whole result to the driver (a
        // misconfigured step must not be able to OOM the driver).
        val isCommand = df.queryExecution.analyzed match {
          case _: org.apache.spark.sql.catalyst.plans.logical.Command => true
          case _: org.apache.spark.sql.catalyst.plans.logical.CommandResult => true
          case _ => false
        }
        if (!isCommand)
          failIfSignalled(df.schema.length, df.limit(2).collect(), spec, ctx)
    }
    ()
  }

  /** SQL_SOURCE against a tenant JDBC source: SELECT-shaped text is
    * pushed down (`(query) q` — the source DBMS executes it) and probed
    * under the same scalar contract; anything else executes as a
    * driver-side statement, the control action the reference's
    * `ExecuteCommand` performs on its `DbConnection`
    * (`CommandExecuter.cs:997-1075` — not a distributed operation).
    */
  /** SELECT-shaped after stripping leading comments — a CTE (`WITH`),
    * a parenthesized select, or a line/block comment prefix is still a
    * query the scalar contract must see (r10 review: a literal-prefix
    * check let `WITH c AS (...) SELECT CASE WHEN bad THEN -1 ...` run
    * as a discarded Statement.execute, silently PASSING a data-quality
    * probe that signalled failure).
    */
  private[steps] def isQueryShaped(sql: String): Boolean = {
    var s = sql
    var changed = true
    while (changed) {
      val t = s.stripLeading()
      val next =
        if (t.startsWith("--")) t.dropWhile(_ != '\n')
        else if (t.startsWith("/*")) {
          val end = t.indexOf("*/")
          if (end < 0) "" else t.substring(end + 2)
        } else t
      changed = next ne t
      s = next
    }
    val u = s.toUpperCase
    // WITH alone is not enough: CTE-DML (`WITH x AS (...) INSERT/UPDATE/
    // DELETE/MERGE`, valid T-SQL and Postgres) is a statement, not a
    // query — wrapping it `(stmt) q` in the JDBC read path would fail
    // (ADVICE r10). Skip past the CTE list to the terminal top-level
    // statement keyword and classify on THAT.
    u.startsWith("SELECT") || u.startsWith("(") ||
      (u.startsWith("WITH") && !terminalStatementKeyword(s).exists(_ != "SELECT"))
  }

  /** First top-level (paren-depth-0) statement keyword in `s`, skipping
    * comments, quoted strings ('' doubling), `"…"` and `[…]` quoted
    * identifiers, and parenthesized CTE bodies. For `WITH a AS (...),
    * b AS (...) INSERT ...` that is `INSERT`; for a plain CTE query,
    * `SELECT`. None for text with no such keyword at depth 0.
    */
  private[steps] def terminalStatementKeyword(s: String): Option[String] = {
    val n = s.length
    var i = 0
    var depth = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        val end = s.indexOf("*/", i + 2)
        i = if (end < 0) n else end + 2
      } else if (c == '\'') {
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (s.charAt(i) == '\'') {
            if (i + 1 < n && s.charAt(i + 1) == '\'') i += 2
            else { closed = true; i += 1 }
          } else i += 1
        }
      } else if (c == '"') {
        i += 1; while (i < n && s.charAt(i) != '"') i += 1; i += 1
      } else if (c == '[') {
        i += 1; while (i < n && s.charAt(i) != ']') i += 1; i += 1
      } else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        if (depth == 0) s.substring(start, i).toUpperCase match {
          case k @ ("SELECT" | "INSERT" | "UPDATE" | "DELETE" | "MERGE") =>
            return Some(k)
          case _ => ()
        }
      } else i += 1
    }
    None
  }

  private def sqlExecJdbc(
      text: String, j: graft.sources.Connections.Jdbc,
      spec: StepSpec, ctx: StepContext): Unit =
    if (isQueryShaped(text)) {
      val df = graft.sources.Connections.read(ctx.spark, j, text)
      failIfSignalled(df.schema.length, df.limit(2).collect(), spec, ctx)
    } else {
      j.driver.foreach(Class.forName)
      val conn = java.sql.DriverManager.getConnection(j.url, j.user, j.password)
      try {
        val st = conn.createStatement()
        try { st.execute(text); () } finally st.close()
      } finally conn.close()
    }

  /** `@OutputParam1 = -1 ⇒ step failure` (`CommandExecuter.cs:1024-1041`,
    * wired at `Step.cs:1198-1231`): reference procs signal a failed
    * data-quality probe through an integer output parameter valued -1,
    * and the step must abort. The analog here is the scalar SELECT
    * probe: a SINGLE-row, SINGLE-column integral/decimal result valued
    * -1 fails the step (ledgered like the reference's HandleErrorCatch,
    * then rethrown so the runner marks the step failed). Any other
    * value, an empty result, a multi-column shape, or a MULTI-row
    * result passes — sampling two rows distinguishes a true scalar from
    * a data SELECT whose arbitrary first row might be -1 under one
    * partition scheduling and not another.
    */
  private def failIfSignalled(
      schemaLen: Int, probe: Array[org.apache.spark.sql.Row],
      spec: StepSpec, ctx: StepContext): Unit = {
    val signalled = schemaLen == 1 && probe.length == 1 && probe.headOption.exists(r =>
      !r.isNullAt(0) && (r.get(0) match {
        case b: java.lang.Byte => b.longValue == -1L
        case s: java.lang.Short => s.longValue == -1L
        case i: java.lang.Integer => i.longValue == -1L
        case l: java.lang.Long => l.longValue == -1L
        case d: java.math.BigDecimal => d.compareTo(java.math.BigDecimal.valueOf(-1)) == 0
        case _ => false
      }))
    if (signalled) {
      val msg = s"step ${spec.id}: Befehl signalled failure (@OutputParam1 = -1)"
      ctx.ledger.error(graft.model.ErrorRow.TypSql, graft.model.ErrorRow.SeverityMajor,
        msg, schrittRunId = ctx.schrittRunId)
      throw new StepSignalledFailure(msg)
    }
  }

  /** S8 TEST / RunDummy (`CommandExecuter.cs:28-33`): sleep `Befehl`
    * seconds, log.
    */
  def testStep(spec: StepSpec, ctx: StepContext): Unit = {
    val seconds = spec.befehl.trim.toDouble
    Thread.sleep((seconds * 1000).toLong)
    ctx.ledger.message(s"TEST step ${spec.id} slept ${seconds}s",
      schrittRunId = ctx.schrittRunId)
  }

  private def targetTable(spec: StepSpec): String =
    spec.zieltabelle.map(_.split(",").head.trim).getOrElse(
      throw new IllegalArgumentException(s"step ${spec.id} has no Zieltabelle"))
}
