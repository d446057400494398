package graft.sources

/** Manifest encoding for the per-file Bloom INDEX — the point-lookup
  * skipping regime min/max and dictionary value sets cannot serve: a
  * high-cardinality key on an UNclustered table (every file's range spans
  * the whole domain, cardinality far past [[FileStatsRec.maxValueSet]])
  * prunes nothing from bounds, yet a point lookup touches at most a few
  * files. The standard lakehouse answer (Delta's Bloom filter index,
  * Parquet's own column Bloom filters) is a per-(file, column) Bloom
  * filter: no false negatives, so "definitely absent" is a SOUND skip;
  * false positives only cost an extra open.
  *
  * Layout: the filter BYTES are a SIDECAR file under `<table>/_bloom/`
  * (serialized `org.apache.spark.util.sketch.BloomFilter`, itself a public
  * Spark API with a stable stream format), committed as a visible file of
  * the `<table>/_bloom` pseudo-table IN THE SAME manifest commit as its
  * data file — so vacuum protects live sidecars and reclaims them with
  * their data file, and the index can never refer to uncommitted data. The
  * manifest carries only a pointer line per data file:
  *
  *   `bloom\t<table>\t<dataFileRel>\t{"cols":{"<physCol>":{"f":"<sidecarLeaf>","t":"i"|"s"}}}`
  *
  * (last line per file wins; dropped when the file is removed — the dv
  * rule), plus a per-table declaration that survives truncates like a
  * cluster declaration:
  *
  *   `bloomcols\t<table>\t{"cols":["<logicalCol>",...],"fpp":0.01}`
  *
  * At 100 TB the sidecar bytes scale with the DATA (~1.2 bytes/row at 1%
  * fpp — ~0.1% of typical table size), never with the manifest: the
  * manifest holds one pointer line per file, and the driver loads a
  * sidecar only for a candidate file that SURVIVED min/max pruning under
  * an equality/IN predicate on an indexed column, caching the deserialized
  * filter forever (sidecars are immutable — rewrites produce new ones).
  *
  * The probe is type-tagged: a filter built from a LONG column (`t:"i"`,
  * integral values hashed via `putLong`) answers only integral probe
  * values, a STRING one (`t:"s"`, `putString`) only strings — a
  * type-mismatched or untagged probe keeps the file, so the index can only
  * ever remove I/O, never rows. Missing or unreadable sidecars (vacuumed
  * history after a restore) likewise keep the file: absence never skips.
  */
object BloomIndex {
  import org.json4s._
  import org.json4s.jackson.JsonMethods.{compact, parse, render}

  /** Per-file pointer JSON: physical column → (sidecar leaf, type tag). */
  def entryJson(cols: Seq[(String, String, String)]): String =
    compact(render(JObject("cols" -> JObject(cols.toList.map {
      case (pc, leaf, tag) =>
        pc -> (JObject("f" -> JString(leaf), "t" -> JString(tag)): JValue)
    }))))

  def parseEntry(json: String): Map[String, (String, String)] =
    (parse(json) \ "cols") match {
      case JObject(fields) => fields.flatMap { case (pc, v) =>
        (v \ "f", v \ "t") match {
          case (JString(f), JString(t)) => Some(pc -> (f, t))
          case _ => None
        }
      }.toMap
      case _ => Map.empty
    }

  /** Per-table declaration JSON: logical columns + target fpp. */
  def declJson(cols: Seq[String], fpp: Double): String =
    compact(render(JObject(
      "cols" -> JArray(cols.toList.map(JString(_))),
      "fpp" -> JDouble(fpp))))

  def parseDecl(json: String): (Seq[String], Double) = {
    val jv = parse(json)
    val cols = (jv \ "cols") match {
      case JArray(items) => items.collect { case JString(s) => s }
      case _ => Nil
    }
    val fpp = (jv \ "fpp") match {
      case JDouble(d) => d
      case JInt(i) => i.toDouble
      case _ => 0.01
    }
    (cols, fpp)
  }

  /** Probe value normalized to the tag's hash domain, or None when the
    * types don't line up (→ the caller keeps the file).
    */
  def probeValue(tag: String, v: Any): Option[Any] = (tag, v) match {
    case ("i", b: Byte) => Some(b.toLong)
    case ("i", s: Short) => Some(s.toLong)
    case ("i", i: Int) => Some(i.toLong)
    case ("i", l: Long) => Some(l)
    case ("s", s: String) => Some(s)
    case _ => None
  }
}
