package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, DateType, StructType, TimestampType}

/** File-level predicates a manifest-stats scan can prune with — the
  * deliberately small comparison algebra (>=, >, <=, <, =, AND) whose
  * file-exclusion decision is decidable from per-file min/max/null-count
  * alone. Each predicate is BOTH the pruning rule and (via [[FilePred.toColumn]])
  * the exact row filter applied after pruning, so a scan built from these can
  * never return different rows than an unpruned scan + filter — skipping only
  * decides which files are opened.
  *
  * Values may be Byte/Short/Int/Long/Float/Double (numeric columns), String
  * (string columns; also DATE columns as ISO `yyyy-MM-dd`, TIMESTAMP columns
  * via cast), java.time.LocalDate / java.sql.Date (DATE), java.time.Instant /
  * java.sql.Timestamp (TIMESTAMP). A value/stat type mismatch makes pruning
  * conservatively keep the file — the row filter still applies.
  */
sealed trait FilePred
/** A single-column comparison — the algebra's leaves. */
sealed trait LeafPred extends FilePred { def colName: String }
case class ColGe(colName: String, value: Any) extends LeafPred
case class ColGt(colName: String, value: Any) extends LeafPred
case class ColLe(colName: String, value: Any) extends LeafPred
case class ColLt(colName: String, value: Any) extends LeafPred
case class ColEq(colName: String, value: Any) extends LeafPred
/** IN-list predicate. Prunes via min/max like the others, and EXACTLY via
  * dictionary-derived value sets when the file records them.
  */
case class ColIn(colName: String, values: Seq[Any]) extends LeafPred {
  require(values.nonEmpty, s"ColIn($colName) with an empty value list matches nothing")
}
/** Disjunction of conjunctions (DNF): satisfied when ANY disjunct — a
  * conjunction of predicates, possibly across DIFFERENT columns — is. With
  * the top-level `Seq[FilePred]` conjunction this closes the algebra under
  * AND/OR: a file is skipped only when NO disjunct can match it, and
  * fully-included (for metadata COUNT) when SOME disjunct provably matches
  * every row. Real predicates (`status = 'P' OR price > x`) prune files
  * instead of scanning everything.
  */
case class ColOr(disjuncts: Seq[Seq[FilePred]]) extends FilePred {
  require(disjuncts.nonEmpty && disjuncts.forall(_.nonEmpty),
    "ColOr needs at least one non-empty disjunct")
}

object FilePred {
  /** The same leaf against a different column name. */
  def withCol(p: LeafPred, c: String): LeafPred =
    if (c == p.colName) p
    else p match {
      case x: ColGe => x.copy(colName = c)
      case x: ColGt => x.copy(colName = c)
      case x: ColLe => x.copy(colName = c)
      case x: ColLt => x.copy(colName = c)
      case x: ColEq => x.copy(colName = c)
      case x: ColIn => x.copy(colName = c)
    }

  /** Rename every column in the predicate tree — the logical→physical
    * translation seam for stats lookups (stats are recorded under the names
    * the parquet footers carry); recurses through disjunctions.
    */
  def mapCols(p: FilePred, f: String => String): FilePred = p match {
    case ColOr(ds) => ColOr(ds.map(_.map(mapCols(_, f))))
    case l: LeafPred => withCol(l, f(l.colName))
  }

  /** The exact row-filter Column for a conjunction of predicates. String
    * values against DATE/TIMESTAMP columns are cast (the lit would otherwise
    * compare as string); everything else relies on Spark's numeric coercion,
    * which agrees with the BigDecimal-exact stats comparison.
    */
  def toColumn(preds: Seq[FilePred], schema: StructType): Column = {
    require(preds.nonEmpty, "empty predicate list — use read() for a full scan")
    preds.map(one(_, schema)).reduce(_ && _)
  }

  private def one(p: FilePred, schema: StructType): Column = p match {
    case ColOr(ds) =>
      ds.map(d => d.map(one(_, schema)).reduce(_ && _)).reduce(_ || _)
    case leaf: LeafPred =>
      val dt = schema(leaf.colName).dataType
      val c = col(leaf.colName)
      leaf match {
        case ColGe(_, v) => c >= litFor(v, dt)
        case ColGt(_, v) => c > litFor(v, dt)
        case ColLe(_, v) => c <= litFor(v, dt)
        case ColLt(_, v) => c < litFor(v, dt)
        case ColEq(_, v) => c === litFor(v, dt)
        case ColIn(_, vs) =>
          // native In expression (codegen'd, parquet-pushable) unless a value
          // needs casting (string against a DATE/TIMESTAMP column — rare and
          // small lists); a 1k-element OR-chain would be a deep tree instead
          val needsCast = (dt == DateType || dt == TimestampType) &&
            vs.exists(_.isInstanceOf[String])
          if (needsCast) vs.map(v => c === litFor(v, dt)).reduce(_ || _)
          else c.isInCollection(vs)
      }
  }

  private def litFor(v: Any, dt: DataType): Column = v match {
    case s: String if dt == DateType || dt == TimestampType => lit(s).cast(dt)
    case ld: java.time.LocalDate => lit(java.sql.Date.valueOf(ld))
    case i: java.time.Instant => lit(java.sql.Timestamp.from(i))
    case other => lit(other)
  }
}

/** Per-column stats of one data file, decoded from its parquet footer.
  * `tag`: "i" integral (Long), "f" floating (Double), "s" string (String,
  * UTF-8 byte order), "d" date (ISO string), "t" timestamp (epoch micros
  * Long). `nulls` is -1 when unknown. min/max are None when the footer had
  * no usable values (all-null file, missing stats, NaN) — absence always
  * means "cannot skip", never "skip".
  *
  * `vals` is the file's EXACT non-null value set, present only when every
  * data page of the column is dictionary-encoded and the union of the row
  * groups' dictionaries is small ([[FileStatsRec.maxValueSet]]): the
  * dictionary page IS the value set — exact full values, never truncated
  * (unlike string min/max), so equality/IN predicates prune and even
  * fully-include on unsorted low-cardinality columns where bounds are
  * useless.
  */
case class ColStats(tag: String, nulls: Long, min: Option[Any], max: Option[Any],
    vals: Option[Seq[Any]] = None)

/** Breakdown of a metadata-assisted COUNT: `filesMetadata` answered from the
  * manifest alone (fully included by the predicate, or excluded → 0),
  * `filesRead` boundary files actually scanned, `filesSkipped` excluded.
  */
case class CountWhere(count: Long, filesMetadata: Int, filesRead: Int, filesSkipped: Int)

/** Metadata-assisted MIN/MAX: None when the column has no non-null value
  * anywhere. `filesRead` = files whose stats could not answer (legacy, string
  * columns — parquet string bounds may be truncated and are never trusted as
  * VALUES, only as bounds).
  */
case class StatsMinMax(min: Option[Any], max: Option[Any],
    filesMetadata: Int, filesRead: Int)

/** Outcome of a [[AtomicWarehouse.mergeInto]]: row counts per clause plus
  * the file routing (candidate files rewritten vs untouched).
  */
case class MergeIntoResult(updated: Long, deleted: Long, inserted: Long,
    filesRewritten: Int, filesUntouched: Int)

/** Outcome of a [[AtomicWarehouse.deleteWhereDv]] (merge-on-read delete):
  * `filesRewritten` is ALWAYS 0 — the method's whole contract — kept as a
  * field so callers and oracles can assert the routing literally.
  */
case class DvDeleteResult(deleted: Long, filesTombstoned: Int,
    filesRewritten: Int, filesSkipped: Int)

/** Outcome of an [[AtomicWarehouse.reclusterIncremental]]: only the eroded
  * TAIL was rewritten; `bytesRewritten` is the tail's physical size (the
  * 100 TB argument — a global recluster would rewrite everything).
  */
case class ReclusterResult(filesRewritten: Int, filesUntouched: Int,
    bytesRewritten: Long)

/** Deletion-vector manifest JSON. Inline form
  * `{"n":<count>,"ords":[<sorted ordinals>]}` — the file's COMPLETE
  * tombstone set (row ordinals within the file); every `dv` line carries
  * the union, last line per file wins. Sidecar form `{"n":<count>,
  * "f":"<leaf>"}` — dense tombstone sets live in an immutable binary
  * sidecar under `<table>/_dv/` (committed as a visible file of that
  * pseudo-table in the SAME manifest commit — the Bloom-sidecar
  * lifecycle), so the manifest carries O(1) bytes per file however many
  * rows are dead.
  */
object DvRec {
  def toJson(ords: Seq[Long]): String = {
    import org.json4s._
    org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(
      JObject("n" -> JLong(ords.size.toLong),
        "ords" -> JArray(ords.map(o => JLong(o): JValue).toList))))
  }

  def fromJson(json: String): Seq[Long] = {
    import org.json4s._
    (org.json4s.jackson.JsonMethods.parse(json) \ "ords") match {
      case JArray(items) => items.map {
        case JLong(l) => l
        case JInt(i) => i.toLong
        case other => throw new IllegalArgumentException(s"bad dv ordinal $other")
      }
      case other => throw new IllegalArgumentException(s"bad dv json: $other")
    }
  }

  /** Sidecar pointer form — see the object doc. */
  def toSidecarJson(n: Long, leaf: String): String = {
    import org.json4s._
    org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(
      JObject("n" -> JLong(n), "f" -> JString(leaf))))
  }

  /** The sidecar leaf when `json` is the pointer form, None when inline. */
  def sidecarLeaf(json: String): Option[String] = {
    import org.json4s._
    (org.json4s.jackson.JsonMethods.parse(json) \ "f") match {
      case JString(s) => Some(s)
      case _ => None
    }
  }

  /** Tombstone count without materializing the ordinals (describe/count). */
  def countOf(json: String): Long = {
    import org.json4s._
    (org.json4s.jackson.JsonMethods.parse(json) \ "n") match {
      case JLong(l) => l
      case JInt(i) => i.toLong
      case _ => fromJson(json).size.toLong
    }
  }
}

/** DESCRIBE DETAIL, metadata-only ([[AtomicWarehouse.describe]]): `rows` is
  * LIVE rows (physical minus deletion-vector tombstones), -1 unless EVERY
  * visible file carries stats; `schemaWidth` -1 for pre-evolution history;
  * `headVersion` 0 for an empty log; `dvFiles`/`dvRows` count the
  * deletion-vector surface (compaction-pressure signal) and `changeFeed`
  * reports the CDF property.
  */
case class TableDetail(table: String, files: Int, bytes: Long, rows: Long,
    filesWithStats: Int, clusterCols: Seq[String], schemaWidth: Int,
    headVersion: Int, dvFiles: Int = 0, dvRows: Long = 0L,
    changeFeed: Boolean = false, bloomCols: Seq[String] = Nil,
    bloomFiles: Int = 0, constraints: Map[String, String] = Map.empty,
    foreignKeys: Map[String, String] = Map.empty,
    uniqueKeys: Map[String, String] = Map.empty)

case class FileStatsRec(rows: Long, cols: Map[String, ColStats],
    bytes: Long = -1L) {

  /** False ⇒ NO row of this file can satisfy `pred` — the skip decision.
    * Sound under SQL three-valued logic because every predicate here is
    * null-rejecting: a file whose column is entirely null satisfies nothing.
    * Unknown stats, type mismatches, or an untracked column keep the file.
    * A disjunction may match iff SOME disjunct may (each disjunct is a
    * conjunction — all of its legs must be individually possible; that is
    * weaker than joint satisfiability, so it can only over-keep, never
    * over-skip).
    */
  def mayContain(pred: FilePred): Boolean = if (rows == 0L) false
  else pred match {
    case ColOr(ds) => ds.exists(_.forall(mayContain))
    case leaf: LeafPred => mayContainLeaf(leaf)
  }

  private def mayContainLeaf(pred: LeafPred): Boolean = cols.get(pred.colName) match {
    // a zero-row file (an empty append, a delete's empty rewrite) has no
    // footer blocks and therefore NO column entries — without the rows==0
    // short-circuit above it would never be skippable
    case None => true
    case Some(cs) =>
      if (cs.nulls >= 0 && cs.nulls == rows) false
      else cs.vals match {
        // exact value set: a predicate holds for the file iff SOME value
        // satisfies it; an incomparable value keeps the file
        case Some(vs) =>
          def any(v: Any, f: Int => Boolean) =
            vs.exists(x => FileStatsRec.cmp(x, v, cs.tag).map(f).getOrElse(true))
          pred match {
            case ColGe(_, v) => any(v, _ >= 0)
            case ColGt(_, v) => any(v, _ > 0)
            case ColLe(_, v) => any(v, _ <= 0)
            case ColLt(_, v) => any(v, _ < 0)
            case ColEq(_, v) => any(v, _ == 0)
            case ColIn(_, pvs) => pvs.exists(v => any(v, _ == 0))
          }
        case None => (cs.min, cs.max) match {
          case (Some(mn), Some(mx)) =>
            def cmpMin(v: Any) = FileStatsRec.cmp(mn, v, cs.tag)
            def cmpMax(v: Any) = FileStatsRec.cmp(mx, v, cs.tag)
            def inBounds(v: Any) = cmpMin(v).forall(_ <= 0) && cmpMax(v).forall(_ >= 0)
            pred match {
              case ColGe(_, v) => cmpMax(v).forall(_ >= 0)
              case ColGt(_, v) => cmpMax(v).forall(_ > 0)
              case ColLe(_, v) => cmpMin(v).forall(_ <= 0)
              case ColLt(_, v) => cmpMin(v).forall(_ < 0)
              case ColEq(_, v) => inBounds(v)
              case ColIn(_, pvs) => pvs.exists(inBounds)
            }
          case _ => true
        }
      }
  }

  def mayContainAll(preds: Seq[FilePred]): Boolean = preds.forall(mayContain)

  /** True ⇒ EVERY row of this file satisfies `pred` — the fully-included
    * decision metadata-only COUNT rides on. Demands known-zero nulls (a null
    * fails every predicate here) and bounds — or an exact value set — that
    * pin all values inside the predicate; anything unknown returns false
    * (the file gets read, never miscounted). A zero-row file is vacuously
    * all-match. A disjunction is all-match when SOME disjunct provably
    * covers every row (sufficient, not necessary — rows split across
    * disjuncts just get read).
    */
  def allMatch(pred: FilePred): Boolean = rows == 0L || (pred match {
    case ColOr(ds) => ds.exists(_.forall(allMatch))
    case leaf: LeafPred => allMatchLeaf(leaf)
  })

  private def allMatchLeaf(pred: LeafPred): Boolean = (cols.get(pred.colName) match {
    case Some(cs) if cs.nulls == 0L => cs.vals match {
      case Some(vs) =>
        def all(v: Any, f: Int => Boolean) =
          vs.forall(x => FileStatsRec.cmp(x, v, cs.tag).exists(f))
        pred match {
          case ColGe(_, v) => all(v, _ >= 0)
          case ColGt(_, v) => all(v, _ > 0)
          case ColLe(_, v) => all(v, _ <= 0)
          case ColLt(_, v) => all(v, _ < 0)
          case ColEq(_, v) => all(v, _ == 0)
          case ColIn(_, pvs) => vs.forall(x =>
            pvs.exists(v => FileStatsRec.cmp(x, v, cs.tag).exists(_ == 0)))
        }
      case None => (cs.min, cs.max) match {
        case (Some(mn), Some(mx)) =>
          def cmpMin(v: Any) = FileStatsRec.cmp(mn, v, cs.tag)
          def cmpMax(v: Any) = FileStatsRec.cmp(mx, v, cs.tag)
          pred match {
            case ColGe(_, v) => cmpMin(v).exists(_ >= 0)
            case ColGt(_, v) => cmpMin(v).exists(_ > 0)
            case ColLe(_, v) => cmpMax(v).exists(_ <= 0)
            case ColLt(_, v) => cmpMax(v).exists(_ < 0)
            case ColEq(_, v) => cmpMin(v).exists(_ == 0) && cmpMax(v).exists(_ == 0)
            // bounds alone prove IN only for a constant column equal to a listed value
            case ColIn(_, pvs) => pvs.exists(v =>
              cmpMin(v).exists(_ == 0) && cmpMax(v).exists(_ == 0))
          }
        case _ => false
      }
    }
    case _ => false
  })

  def allMatchAll(preds: Seq[FilePred]): Boolean = preds.forall(allMatch)

  def toJson: String = {
    import org.json4s.JsonDSL._
    import org.json4s._
    val colsJ = JObject(cols.toList.sortBy(_._1).map { case (c, cs) =>
      val base = List[JField]("t" -> JString(cs.tag), "n" -> JLong(cs.nulls))
      val mm = (cs.min, cs.max) match {
        case (Some(mn), Some(mx)) =>
          List[JField]("min" -> FileStatsRec.valJson(mn), "max" -> FileStatsRec.valJson(mx))
        case _ => Nil
      }
      val vv = cs.vals.toList.map(vs =>
        "vals" -> (JArray(vs.toList.map(FileStatsRec.valJson)): JValue))
      c -> JObject(base ++ mm ++ vv)
    })
    // `bytes` (physical file size) rides the same line so planners — the
    // streaming source's admission control above all — size work from the
    // LOG instead of stat-ing the filesystem per file; old lines without it
    // simply fall back (bytesOf = -1)
    val head: List[JField] =
      if (bytes >= 0L) List("rows" -> JLong(rows), "bytes" -> JLong(bytes))
      else List("rows" -> JLong(rows))
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        JObject(head :+ ("cols" -> (colsJ: JValue)))))
  }
}

object FileStatsRec {
  import org.json4s._

  /** Cap on recorded value sets: dictionaries above this are discarded
    * (high-cardinality columns belong to min/max and bloom-style routing,
    * not manifest value lists).
    */
  val maxValueSet = 64

  private[sources] def valJson(v: Any): JValue = v match {
    case l: Long => JLong(l)
    case d: Double => JDouble(d)
    case s: String => JString(s)
    case other => JString(other.toString)
  }

  /** Ordering used by the skip decision: stat value (already normalized per
    * tag) vs predicate value. None = incomparable (type mismatch) — caller
    * keeps the file. Numeric comparisons go through exact BigDecimal (no
    * long→double rounding traps); strings compare as unsigned UTF-8 bytes,
    * matching BOTH parquet's min/max ordering and Spark's UTF8String
    * comparison, so the skip decision and the row filter can never disagree.
    */
  private[sources] def cmp(stat: Any, predVal: Any, tag: String): Option[Int] = tag match {
    case "i" | "f" | "t" =>
      for {
        a <- asBigDec(stat)
        b <- tag match {
          case "t" => asMicros(predVal).map(m => new java.math.BigDecimal(m))
          case _ => asBigDec(predVal)
        }
      } yield a.compareTo(b)
    case "s" =>
      predVal match {
        case s: String => Some(utf8Cmp(stat.asInstanceOf[String], s))
        case _ => None
      }
    case "d" =>
      asIsoDate(predVal).map(d => stat.asInstanceOf[String].compareTo(d))
    case _ => None
  }

  private def asBigDec(v: Any): Option[java.math.BigDecimal] = v match {
    case b: Byte => Some(java.math.BigDecimal.valueOf(b.toLong))
    case s: Short => Some(java.math.BigDecimal.valueOf(s.toLong))
    case i: Int => Some(java.math.BigDecimal.valueOf(i.toLong))
    case l: Long => Some(java.math.BigDecimal.valueOf(l))
    case f: Float => if (f.isNaN || f.isInfinite) None else Some(new java.math.BigDecimal(f.toDouble))
    case d: Double => if (d.isNaN || d.isInfinite) None else Some(new java.math.BigDecimal(d))
    case _ => None
  }

  private def asMicros(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: java.time.Instant => Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case t: java.sql.Timestamp =>
      Some(java.lang.Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L)
    case _ => None
  }

  private def asIsoDate(v: Any): Option[String] = v match {
    case s: String if s.matches("\\d{4}-\\d{2}-\\d{2}") => Some(s)
    case d: java.sql.Date => Some(d.toLocalDate.toString)
    case ld: java.time.LocalDate => Some(ld.toString)
    case _ => None
  }

  private def utf8Cmp(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(a.getBytes(UTF_8), b.getBytes(UTF_8))

  def fromJson(json: String): FileStatsRec = {
    val jv = org.json4s.jackson.JsonMethods.parse(json)
    def num(j: JValue): Long = j match {
      case JLong(l) => l
      case JInt(i) => i.toLong
      case other => throw new IllegalArgumentException(s"expected integer, got $other")
    }
    val rows = num(jv \ "rows")
    val cols = (jv \ "cols") match {
      case JObject(fields) => fields.map { case (c, cj) =>
        val tag = (cj \ "t") match { case JString(s) => s; case o => throw new IllegalArgumentException(s"bad tag $o") }
        val nulls = num(cj \ "n")
        def decode(j: JValue): Option[Any] = (tag, j) match {
          case (_, JNothing) => None
          case ("i" | "t", v) => Some(num(v))
          case ("f", JDouble(d)) => Some(d)
          case ("f", JLong(l)) => Some(l.toDouble)
          case ("f", JInt(i)) => Some(i.toDouble)
          case ("s" | "d", JString(s)) => Some(s)
          case _ => None
        }
        val mn = decode(cj \ "min")
        val mx = decode(cj \ "max")
        val vals = (cj \ "vals") match {
          case JArray(items) =>
            val decoded = items.map(decode)
            if (decoded.forall(_.isDefined)) Some(decoded.flatten) else None
          case _ => None
        }
        // both-or-neither: a lone bound came from a malformed line — drop
        c -> (if (mn.isDefined && mx.isDefined) ColStats(tag, nulls, mn, mx, vals)
              else ColStats(tag, nulls, None, None, vals))
      }.toMap
      case _ => Map.empty[String, ColStats]
    }
    val bytes = (jv \ "bytes") match {
      case JLong(l) => l
      case JInt(i) => i.toLong
      case _ => -1L
    }
    FileStatsRec(rows, cols, bytes)
  }

  private val bytesRe = """"bytes"\s*:\s*(\d+)""".r

  /** The recorded physical size from a stats-line JSON WITHOUT a full JSON
    * parse (the streaming planner calls this per backlog file on the
    * driver), -1 when the line predates size recording.
    */
  def bytesOf(json: String): Long =
    bytesRe.findFirstMatchIn(json).map(_.group(1).toLong).getOrElse(-1L)

  /** Decode one data file's column stats from its parquet FOOTER — a
    * bytes-sized metadata read, never the data pages. Chunk-level parquet
    * statistics are exact for the types decoded here (string truncation, when
    * a writer configures it, keeps bounds conservative by contract —
    * parquet-format Statistics). Columns whose physical/logical type is
    * outside the algebra (decimals, nested, INT96, booleans) are simply not
    * recorded: absent stats never skip. Returns None when the footer cannot
    * be read — stats are an optimization and their absence must never fail a
    * commit.
    */
  def fromFooter(p: Path, conf: Configuration): Option[FileStatsRec] = {
    // HadoopInputFile wraps the FileStatus it already fetched to open the
    // footer, so recording the byte size costs zero extra RPCs
    val (reader, fileBytes) = try {
      val inf = HadoopInputFile.fromPath(p, conf)
      (ParquetFileReader.open(inf), inf.getLength)
    } catch { case _: Exception => return None }
    try {
      val blocks = reader.getFooter.getBlocks
      import scala.jdk.CollectionConverters._
      val rows = blocks.asScala.map(_.getRowCount).sum
      // per column: (tag, nulls, nullsOk, min, max, mmOk)
      val acc = scala.collection.mutable.LinkedHashMap[String, (String, Long, Boolean, Option[Any], Option[Any], Boolean)]()
      blocks.asScala.foreach { block =>
        block.getColumns.asScala.foreach { cc =>
          val pathArr = cc.getPath.toArray
          if (pathArr.length == 1) {
            val name = pathArr(0)
            tagOf(cc.getPrimitiveType).foreach { decodeTag =>
              // "tm" drives the millis→micros decode only; stored tag is "t"
              val tag = if (decodeTag == "tm") "t" else decodeTag
              val st = cc.getStatistics
              val prev = acc.getOrElse(name, (tag, 0L, true, None: Option[Any], None: Option[Any], true))
              val next =
                if (st == null || !st.isNumNullsSet) (tag, prev._2, false, prev._4, prev._5, false)
                else {
                  val nulls = prev._2 + st.getNumNulls
                  if (st.hasNonNullValue) {
                    decodeMinMax(st, cc.getPrimitiveType, decodeTag) match {
                      case Some((mn, mx)) =>
                        val nmn = prev._4.map(m => if (ge(m, mn, tag)) mn else m).orElse(Some(mn))
                        val nmx = prev._5.map(m => if (ge(mx, m, tag)) mx else m).orElse(Some(mx))
                        (tag, nulls, prev._3, nmn, nmx, prev._6)
                      case None => (tag, nulls, prev._3, prev._4, prev._5, false)
                    }
                  } else if (st.getNumNulls == block.getRowCount)
                    (tag, nulls, prev._3, prev._4, prev._5, prev._6) // all-null block: no bound to merge
                  else (tag, nulls, prev._3, prev._4, prev._5, false) // values exist but no stats
                }
              acc(name) = next
            }
          }
        }
      }
      // Dictionary-derived value sets for STRING columns: when every data
      // page of a column chunk is dictionary-encoded, the dictionary page
      // holds the file's exact non-null value set — full values, never
      // truncated, so equality/IN skipping is sound where string bounds are
      // not. Only small dictionaries are kept (maxValueSet); numeric columns
      // are served well enough by min/max and skip the extra page read.
      val schemaMsg = reader.getFooter.getFileMetaData.getSchema
      val dictAcc = scala.collection.mutable.Map[String, Option[Set[String]]]()
      blocks.asScala.foreach { block =>
        // ascribe the public interface: getDictionaryReader's declared return
        // type is package-private to parquet
        lazy val dictStore: org.apache.parquet.column.page.DictionaryPageReadStore =
          reader.getDictionaryReader(block)
        block.getColumns.asScala.foreach { cc =>
          val pathArr = cc.getPath.toArray
          if (pathArr.length == 1 && tagOf(cc.getPrimitiveType).contains("s")) {
            val name = pathArr(0)
            if (!dictAcc.contains(name)) dictAcc(name) = Some(Set.empty)
            dictAcc(name) = dictAcc(name).flatMap { sofar =>
              val es = cc.getEncodingStats
              val fullyDict = es != null && es.hasDictionaryPages && !es.hasNonDictionaryEncodedPages
              if (!fullyDict) None
              else {
                val desc = schemaMsg.getColumnDescription(pathArr)
                val page = dictStore.readDictionaryPage(desc)
                if (page == null || page.getDictionarySize > maxValueSet) None
                else {
                  val dict = page.getEncoding.initDictionary(desc, page)
                  val merged = sofar ++ (0 until page.getDictionarySize)
                    .map(i => new String(dict.decodeToBinary(i).getBytes, UTF_8))
                  if (merged.size > maxValueSet) None else Some(merged)
                }
              }
            }
          }
        }
      }
      val cols = acc.collect {
        case (c, (tag, nulls, nullsOk, mn, mx, mmOk)) if nullsOk || mmOk =>
          val vals = dictAcc.get(c).flatten
            .map(_.toSeq.sorted.map(_.asInstanceOf[Any]))
          c -> ColStats(tag, if (nullsOk) nulls else -1L,
            if (mmOk) mn else None, if (mmOk) mx else None, vals)
      }.toMap
      Some(FileStatsRec(rows, cols, fileBytes))
    } catch { case _: Exception => None }
    finally reader.close()
  }

  private def ge(a: Any, b: Any, tag: String): Boolean = cmp(a, b, tag).exists(_ >= 0)

  private def tagOf(pt: org.apache.parquet.schema.PrimitiveType): Option[String] = {
    val logical = pt.getLogicalTypeAnnotation
    pt.getPrimitiveTypeName match {
      case INT32 => logical match {
        case null => Some("i")
        case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation => Some("d")
        case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation if i.isSigned => Some("i")
        case _ => None
      }
      case INT64 => logical match {
        case null => Some("i")
        case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          ts.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MICROS => Some("t")
            case LogicalTypeAnnotation.TimeUnit.MILLIS => Some("tm")
            case _ => None
          }
        case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation if i.isSigned => Some("i")
        case _ => None
      }
      case FLOAT | DOUBLE => Some("f")
      case BINARY => logical match {
        case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation => Some("s")
        case _ => None
      }
      case _ => None
    }
  }

  private def decodeMinMax(st: org.apache.parquet.column.statistics.Statistics[_],
      pt: org.apache.parquet.schema.PrimitiveType, tag: String): Option[(Any, Any)] = {
    def one(v: Any): Option[Any] = (tag, v) match {
      case ("i", i: java.lang.Integer) => Some(i.longValue)
      case ("i", l: java.lang.Long) => Some(l.longValue)
      case ("d", i: java.lang.Integer) => Some(java.time.LocalDate.ofEpochDay(i.longValue).toString)
      case ("t", l: java.lang.Long) => Some(l.longValue)
      case ("tm", l: java.lang.Long) => Some(l.longValue * 1000L) // millis → micros
      case ("f", f: java.lang.Float) =>
        if (f.isNaN || f.isInfinite) None else Some(f.doubleValue)
      case ("f", d: java.lang.Double) =>
        if (d.isNaN || d.isInfinite) None else Some(d.doubleValue)
      case ("s", b: Binary) => Some(new String(b.getBytes, UTF_8))
      case _ => None
    }
    for {
      mn <- one(st.genericGetMin)
      mx <- one(st.genericGetMax)
    } yield (mn, mx)
  }
}
