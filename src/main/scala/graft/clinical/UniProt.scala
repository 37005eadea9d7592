package graft.clinical

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * UniProt accession validation, Swiss-Prot id-age ordering, and gene
 * authority-record parsing — the PDC quant-matrix gene-table rules
 * (create_tables_quant_data_matrix_pdc.py:237-297 validator, :299-330
 * comparator, :375-435 authority parser / uniprotkb_id selection),
 * re-expressed as pure Scala predicates plus codegen-friendly `Column`
 * twins so the same rule runs on a driver string or a 100 TB scan.
 */
object UniProt {

  // ---------------------------------------------------------------- validator

  /**
   * Canonical UniProt accession format (expasy userman.html#AC_line, as the
   * reference encodes it — create_tables_quant_data_matrix_pdc.py:237-297):
   *
   *  - length 6 or 10; idx 1 and 5 digits; idx 3 and 4 alphanumeric;
   *  - 10-char: idx 0 alpha but NOT O/P/Q, idx 2 and 6 alpha,
   *    idx 7-8 alphanumeric, idx 9 digit;
   *  - 6-char: idx 0 in O/P/Q → idx 2 alphanumeric;
   *            idx 0 other alpha → idx 2 MUST be alpha (else invalid).
   *
   * The check is case-insensitive (the reference uppercases first). Length
   * is taken on the RAW string (the reference measures before its strip),
   * so padded strings are rejected rather than trimmed into validity.
   */
  private val SixOpq    = "^[OPQ][0-9][A-Z0-9][A-Z0-9][A-Z0-9][0-9]$".r
  private val SixOther  = "^[A-NR-Z][0-9][A-Z][A-Z0-9][A-Z0-9][0-9]$".r
  private val TenPattern = "^[A-NR-Z][0-9][A-Z][A-Z0-9][A-Z0-9][0-9][A-Z][A-Z0-9][A-Z0-9][0-9]$".r

  /** Pure-Scala accession validator (driver-side twin of [[isAccessionCol]]). */
  def isAccession(id: String): Boolean = {
    if (id == null) return false
    val u = id.toUpperCase
    id.length match {
      case 6  => SixOpq.matches(u) || SixOther.matches(u)
      case 10 => TenPattern.matches(u)
      case _  => false
    }
  }

  /** SQL-dialect-neutral regex for a valid accession (anchored, uppercase
    * input assumed) — shared verbatim by the Spark column and DuckDB oracle. */
  val AccessionRegex: String =
    "^([OPQ][0-9][A-Z0-9][A-Z0-9][A-Z0-9][0-9]" +
      "|[A-NR-Z][0-9][A-Z][A-Z0-9][A-Z0-9][0-9]" +
      "|[A-NR-Z][0-9][A-Z][A-Z0-9][A-Z0-9][0-9][A-Z][A-Z0-9][A-Z0-9][0-9])$"

  /** Column twin: TRUE when `c` is a valid accession. Expression-only. */
  def isAccessionCol(c: Column): Column =
    upper(c).rlike(AccessionRegex)

  // --------------------------------------------------------------- comparator

  /**
   * Swiss-Prot id-age sort order (quant_data_matrix_pdc.py:299-330): older
   * ids first — 6-char before 10-char, then the leading letter by the
   * reference's explicit class order P, Q, O, A..N, R..Z, then the digit at
   * idx 1. Characters past idx 1 don't participate (the reference comparator
   * returns 0 there; callers tie-break externally for determinism).
   */
  val LetterOrder: String = "PQOABCDEFGHIJKLMNRSTUVWXYZ"

  /** Pure-Scala comparator twin (negative = a older / first). */
  def swissprotAgeCompare(a: String, b: String): Int = {
    if (a == b) return 0
    if (a.length != b.length) return a.length - b.length
    val ia = LetterOrder.indexOf(a.charAt(0).toUpper)
    val ib = LetterOrder.indexOf(b.charAt(0).toUpper)
    if (ia == ib) (a.charAt(1) - '0') - (b.charAt(1) - '0')
    else ia - ib
  }

  /**
   * Totally-ordered numeric sort key for the comparator: length dominates,
   * then letter-class index, then the idx-1 digit. Two ids the comparator
   * calls equal map to the same key — append the id itself as a final sort
   * column when a deterministic total order is required.
   */
  def swissprotAgeKey(c: Column): Column = {
    val letters = array(LetterOrder.map(ch => lit(ch.toString)): _*)
    val classIdx = array_position(letters, upper(substring(c, 1, 1)))
    (length(c).cast("long") * 1000L) + (classIdx * 10L) +
      substring(c, 2, 1).cast("long")
  }

  /** Oldest id of a semicolon-joined accession list (array form): min by
    * ([[swissprotAgeKey]], input position) — the reference's
    * `sorted(...)[0]` under Python's STABLE sort, where comparator ties
    * keep list order (NOT lexicographic id order). */
  def oldestAccession(arr: Column): Column =
    array_min(transform(arr, (a, i) =>
      struct(swissprotAgeKey(a).as("k"), i.as("pos"), a.as("id"))))
      .getField("id")

  // ------------------------------------------------------------ list filtering

  /**
   * Filter a semicolon-delimited protein list to valid accessions, preserving
   * order; NULL when none survive (quant_data_matrix_pdc.py:332-352).
   */
  def filterAccessions(proteins: Column): Column = {
    val kept = filter(split(proteins, ";"), isAccessionCol(_))
    when(size(kept) === 0, lit(null)).otherwise(array_join(kept, ";"))
  }

  /**
   * Filter a semicolon-delimited protein list to ids present in the
   * Swiss-Prot set (an array column — broadcast-joined or literal upstream),
   * preserving order, plus the match count
   * (quant_data_matrix_pdc.py:354-372).
   */
  def filterSwissprot(proteins: Column, swissprotSet: Column): Column = {
    val kept = filter(split(proteins, ";"), p => array_contains(swissprotSet, p))
    struct(array_join(kept, ";").as("swissprot_str"),
      size(kept).cast("long").as("swissprot_count"))
  }

  /**
   * The reference's uniprotkb_id selection (quant_data_matrix_pdc.py:420-430):
   * exactly one Swiss-Prot match → it; several → the oldest by the age
   * comparator; none → the oldest valid accession; no valid accessions →
   * empty string (the reference's untouched `""` default).
   */
  def selectUniprotkbId(proteins: Column, swissprotSet: Column): Column = {
    val sp = filter(split(proteins, ";"), p => array_contains(swissprotSet, p))
    val up = filter(split(proteins, ";"), isAccessionCol(_))
    when(size(sp) === 1, element_at(sp, 1))
      .when(size(sp) > 1, oldestAccession(sp))
      .when(size(up) >= 1, oldestAccession(up))
      .otherwise(lit(""))
  }

  // ---------------------------------------------------------- authority parser

  /**
   * Gene authority-record parser (quant_data_matrix_pdc.py:382-410): a
   * "AUTH:ID; AUTH2:ID2" string → the single non-MGI (mouse database)
   * record as struct(authority, authority_gene_id). NULL fields when the
   * input is empty or nothing but MGI remains; `n_records` carries the
   * post-MGI count so pipelines can assert the reference's "exactly one
   * authority" invariant (where the reference hard-exits) instead of
   * crashing executors.
   *
   * The reference accumulates records into a dict keyed by authority, so a
   * DUPLICATE authority keeps the LAST gene_id while entry order stays
   * first-insertion — mirrored here: one record per authority (last-wins
   * value), MGI popped afterwards, `n_records` counting DISTINCT non-MGI
   * authorities.
   */
  def parseAuthority(authority: Column): Column = {
    val parsed = filter(
      transform(split(authority, "; "),
        r => struct(substring_index(r, ":", 1).as("auth"),
          // everything after the first ':' (ids may not contain ':' per the
          // reference's <=2-element split invariant)
          when(instr(r, ":") > 0, substr(r, instr(r, ":") + 1)).as("gene_id")),
      ),
      rec => rec.getField("gene_id").isNotNull)
    // dict semantics without nested re-expansion (the earlier
    // array_position/per-element-filter formulation re-parsed the string
    // O(m²) per row — the inlining trap lshBands documents): a single fold
    // over `parsed` replays Python's dict build literally — first
    // occurrence fixes the position, a repeated authority overwrites the
    // gene_id in place (last wins). All inner work touches only the small
    // accumulator of lambda vars; `parsed` is referenced once. Then pop
    // MGI. (map_from_entries would be neater but throws under Spark's
    // default EXCEPTION key-dedup policy.)
    val dict = aggregate(parsed,
      array().cast("array<struct<auth:string,gene_id:string>>"),
      (acc, r) => when(
        exists(acc, x => x.getField("auth") === r.getField("auth")),
        transform(acc, x =>
          when(x.getField("auth") === r.getField("auth"),
            struct(x.getField("auth").as("auth"),
              r.getField("gene_id").as("gene_id"))).otherwise(x)))
        .otherwise(array_append(acc, r)))
    val recs = filter(dict, r => r.getField("auth") =!= "MGI")
    val first = element_at(recs, 1)
    when(authority.isNull || length(authority) === 0 || size(recs) === 0,
      struct(lit(null).cast("string").as("authority"),
        lit(null).cast("string").as("authority_gene_id"),
        coalesce(size(recs), lit(0)).cast("long").as("n_records")))
      .otherwise(struct(first.getField("auth").as("authority"),
        first.getField("gene_id").as("authority_gene_id"),
        size(recs).cast("long").as("n_records")))
  }
}
