package graft.llm

import scala.collection.mutable

import org.apache.spark.sql.Column

/**
 * WordPiece tokenizer (Wu et al. 2016, the BERT encoder's greedy
 * longest-match-first scheme) — the third tokenizer family next to BPE
 * (rank-greedy merges, [[Bpe]]) and unigram-LM (Viterbi/hard-EM,
 * [[UnigramExpr]]/[[UnigramTrain]]). The three genuinely differ on the
 * same vocab: BPE follows merge-rank order, WordPiece takes the longest
 * vocabulary prefix at each position, unigram maximizes sequence
 * likelihood — a tokenizer-migration audit needs all three measured on
 * the same corpus.
 *
 * Spec (shared verbatim by this encoder and the DuckDB oracle replay in
 * [[graft.queries.WordPieceOracles]]):
 *
 *  1. words = whitespace-split of `trim(lower(text))` (exactly Spark's
 *     `split(trim(lower(text)), "\\s+")` / DuckDB's
 *     `regexp_split_to_array(trim(lower(text)), '\s+')`); empty text → 0
 *     tokens;
 *  2. per word, scanning CODE POINTS left to right from position 0:
 *     take the LONGEST vocab piece matching at the current position — a
 *     word-initial position matches only bare pieces, a word-internal
 *     position only `##`-prefixed pieces (the `##` is markup, not text);
 *     advance by the matched base length;
 *  3. if any position has NO match, the WHOLE word encodes as the single
 *     token `[UNK]` (the BERT `is_bad` contract: partial prefixes are
 *     discarded, not emitted);
 *  4. document encoding = every word's pieces in order, space-joined
 *     (pieces are whitespace-free, so the join is unambiguous).
 *
 * At 100 TB the shape is identical to BPE's: encoding is a native
 * codegen'd per-row expression ([[WordPieceEncodeExpr]]) with the vocab
 * riding the plan as ONE reference object, and the per-JVM distinct-word
 * memo amortizes the scan across repeated words. No UDF, no shuffle.
 */
final class WordPieceVocab(val pieces: Seq[String]) extends Serializable {

  val Unk = "[UNK]"

  /** Bare (word-initial) pieces and continuation bases (`##` stripped),
    * in separate sets — position decides which set may match. */
  @transient private lazy val (initial, continuation) = {
    val init = new java.util.HashSet[String]()
    val cont = new java.util.HashSet[String]()
    pieces.foreach { p =>
      if (p.startsWith("##")) { if (p.length > 2) cont.add(p.substring(2)) }
      else init.add(p)
    }
    (init, cont)
  }

  @transient private lazy val maxInitLen: Int =
    pieces.iterator.filterNot(_.startsWith("##")).map(_.length).maxOption.getOrElse(0)
  @transient private lazy val maxContLen: Int =
    pieces.iterator.filter(_.startsWith("##")).map(_.length - 2).maxOption.getOrElse(0)

  @transient private lazy val encodeCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[this] val MaxCacheEntries = 1 << 16

  /** Greedy longest-match pieces of one word (spec steps 2–3). */
  def encodeWord(word: String): Array[String] = {
    // code-point array so matching mirrors DuckDB's code-point slicing
    val cps = word.codePoints().toArray
    val n = cps.length
    val out = mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < n) {
      val first = pos == 0
      val maxLen = math.min(if (first) maxInitLen else maxContLen, n - pos)
      var len = maxLen
      var found: String = null
      while (len >= 1 && found == null) {
        val cand = new String(cps, pos, len)
        val hit = if (first) initial.contains(cand) else continuation.contains(cand)
        if (hit) found = cand else len -= 1
      }
      if (found == null) return Array(Unk) // whole-word UNK (spec step 3)
      out += (if (first) found else "##" + found)
      pos += len
    }
    out.toArray
  }

  private def encodeWordJoined(word: String): String = {
    val cached = encodeCache.get(word)
    if (cached != null) cached
    else {
      val s = encodeWord(word).mkString(" ")
      if (encodeCache.size() >= MaxCacheEntries) encodeCache.clear()
      encodeCache.put(word, s)
      s
    }
  }

  /** Full document encoding (spec steps 1 + 4). Called from generated
    * code — must stay public. */
  def encodeJoined(text: String): String = {
    val t = BpeTable.trimSpaces(text.toLowerCase)
    if (t.isEmpty) ""
    else t.split("\\s+", -1).iterator
      .map(encodeWordJoined).filter(_.nonEmpty).mkString(" ")
  }

  /** WordPiece token count of a document. Public for generated code. */
  def countTokens(text: String): Long = {
    val t = BpeTable.trimSpaces(text.toLowerCase)
    if (t.isEmpty) 0L
    else {
      var total = 0L
      t.split("\\s+", -1).foreach { w =>
        if (w.nonEmpty) total += encodeWord(w).length.toLong
      }
      total
    }
  }
}

object WordPiece {

  /**
   * The fixed default vocabulary, derived deterministically from the SAME
   * seed corpus as [[Bpe.DefaultMerges]] (fixed forever — committed oracle
   * SQL interpolates it): each distinct seed word's BPE pieces enter the
   * vocab (first piece bare, the rest `##`-prefixed), plus the full a–z
   * ASCII alphabet in both forms as the character-level floor (the seed
   * corpus itself misses a few letters — x, z — and a floor that depends
   * on which letters the seed happens to use would UNK ordinary English
   * words). Seed text is already lowercase, matching spec step 1's
   * lowercasing.
   */
  lazy val DefaultVocab: Seq[String] = {
    val words = Bpe.SeedCorpus.iterator
      .flatMap(t => BpeTable.trimSpaces(t).split("\\s+", -1))
      .filter(_.nonEmpty).toSeq.distinct.sorted
    val fromBpe = words.flatMap { w =>
      val ps = Bpe.defaultTable.encodeWord(w)
      ps.head +: ps.tail.map("##" + _)
    }
    val chars = ('a' to 'z').map(_.toString)
    (fromBpe ++ chars ++ chars.map("##" + _)).distinct.sorted
  }

  lazy val defaultVocab: WordPieceVocab = new WordPieceVocab(DefaultVocab)

  /** Full WordPiece encoding as a native codegen'd Column (space-joined
    * pieces; `split(col, " ")` for the array form). */
  def encodeTokens(text: Column, vocab: Seq[String] = DefaultVocab): Column = {
    import org.apache.spark.sql.GraftExpressionBridge._
    column(WordPieceEncodeExpr(expression(text), vocab))
  }

  /** WordPiece token count as a native codegen'd Column. */
  def countTokens(text: Column, vocab: Seq[String] = DefaultVocab): Column = {
    import org.apache.spark.sql.GraftExpressionBridge._
    column(WordPieceCountExpr(expression(text), vocab))
  }
}
