package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels behind the sketch expressions. Public + static so
  * whole-stage-codegen'd call sites invoke them directly (a plain
  * `INVOKESTATIC` from generated Java) instead of the `CodegenFallback`
  * path, which round-trips inputs through an `InternalRow` and a boxed
  * reflective `eval` per row.
  */
object SketchKernels {

  /** See [[TokenMaxFreq]]: max multiplicity of any element of a token
    * array, per row. Null elements are skipped — semantics agree with
    * the old explode+groupBy chain because this engine's tokenizers
    * never emit null elements, NOT because groupBy drops null keys
    * (SQL groupBy keeps a null group; a null-element array through the
    * raw SQL surface would count nulls there but not here).
    */
  def tokenMaxFreq(arr: ArrayData): Long = {
    val n = arr.numElements()
    var best = 0
    val m = new java.util.HashMap[UTF8String, Array[Int]](math.max(8, n * 2))
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        var c = m.get(tok)
        if (c == null) { c = new Array[Int](1); m.put(tok, c) }
        c(0) += 1
        if (c(0) > best) best = c(0)
      }
      i += 1
    }
    best.toLong
  }

  /** See [[MinHashSignature]]. */
  def minhash(arr: ArrayData, numHashes: Int): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      if (tok != null) {
        val h1 = TokenHash.hash(tok, 0x9747b28cL)
        val h2 = TokenHash.hash(tok, 0x85ebca6bL)
        var j = 0
        while (j < numHashes) {
          val h = h1 + j * h2
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** See [[SimHash64]]. */
  def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      if (tok != null) {
        val h = TokenHash.hash(tok, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** See [[SimHashMd5]]. Token hash = first 8 bytes of md5(token),
    * big-endian — i.e. the first 16 hex chars of the digest parsed as an
    * unsigned 64-bit value. Like the winnow kernel's Rabin-Karp hash
    * (and unlike xxh64), md5 is computable in plain SQL, which is what
    * keeps the simhash query oracle-checkable; the bit mixing is at
    * least as good.
    */
  def simhashMd5(arr: ArrayData): Long = {
    val md = Md5.get()
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      if (tok != null) {
        md.reset()
        val d = md.digest(tok.getBytes)
        var h = 0L
        var j = 0
        while (j < 8) { h = (h << 8) | (d(j) & 0xFFL); j += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** See [[TokenShingleSet]]: trim -> whitespace-tokenize -> word k-gram
    * -> distinct -> SORT, fused into one text pass. Semantics match the
    * `sort_array(shingles(tokens(text), k))` composition EXACTLY,
    * including its quirks (the oracle SQL mirrors the composition, so
    * bug-compatibility is the contract, property-tested in DedupSpec):
    *   - SQL `trim` strips SPACES only (not \t/\n), so text whose first
    *     non-space char is another `\s` separator yields a leading EMPTY
    *     token — and a trailing separator a trailing one (Spark's split
    *     keeps trailing empties, limit -1) — which participate in shingles;
    *   - runs split on Java `\s` = [ \t\n\x0B\f\r] (an interior control
    *     char glues its token, exactly as the regex);
    *   - shingles join with a single space; dedup keeps the set.
    * Output is additionally sorted in UTF8String binary order — which is
    * what lets a verify stage count intersections with a linear merge
    * instead of per-row hash sets (order never mattered to consumers:
    * they hash, explode, or intersect the SET).
    */
  def tokenShingles(input: UTF8String, k: Int): ArrayData = {
    val s = input.toString
    // SQL trim: strip U+0020 ONLY from both ends
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    if (lo >= hi) return new GenericArrayData(Array.empty[Any])
    @inline def isSep(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    // token boundaries (start, end) over the trimmed slice; Spark's
    // split (limit -1) keeps BOTH a leading empty token (string starts
    // with a separator) and a trailing one (string ends with one),
    // unlike Java's String.split which drops trailing empties
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = lo
    if (isSep(s.charAt(lo))) { starts.add(lo); ends.add(lo) }
    while (i < hi) {
      if (!isSep(s.charAt(i))) {
        val st = i
        while (i < hi && !isSep(s.charAt(i))) i += 1
        starts.add(st); ends.add(i)
      } else i += 1
    }
    if (isSep(s.charAt(hi - 1))) { starts.add(hi); ends.add(hi) }
    val n = starts.size()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.TreeSet[UTF8String]()
    val sb = new java.lang.StringBuilder(64)
    var t = 0
    while (t + k <= n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(s, starts.get(t + j), ends.get(t + j))
        j += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      t += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** See [[TokenCountExpr]]: the size of `tokens(text)` without
    * materializing the token array — same trim/split semantics as
    * [[tokenShingles]] (SQL space-only trim; Spark split keeps leading
    * and trailing empty tokens around `\s` separators), just counted.
    */
  def tokenCount(input: UTF8String): Int = {
    val s = input.toString
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    if (lo >= hi) return 0
    @inline def isSep(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    var n = 0
    if (isSep(s.charAt(lo))) n += 1   // leading empty token
    var i = lo
    while (i < hi) {
      if (!isSep(s.charAt(i))) {
        n += 1
        while (i < hi && !isSep(s.charAt(i))) i += 1
      } else i += 1
    }
    if (isSep(s.charAt(hi - 1))) n += 1 // trailing empty token
    n
  }

  /** See [[graft.functions.HashedBowScore]]: hashed bag-of-words linear
    * score — ONE text pass: trim, split on `\s` runs, skip empty
    * tokens, polynomial-31 hash each token's chars (unsigned 64-bit
    * wrap, init 0 — the engine's text-hash convention, replicated by
    * the DuckDB oracles in HUGEINT mod-2^64 arithmetic over the ASCII
    * corpus), bucket by UNSIGNED remainder mod `weights.length`, and
    * sum the bucket weights in exact int64. The weight table is the
    * trained model: feature hashing (Weinberger et al., ICML 2009)
    * composed with a linear text classifier (the fastText shape,
    * Joulin et al. 2017) — the standard quality-filter scorer an LLM
    * data pipeline runs over every document.
    */
  def hashedBowScore(input: UTF8String, weights: Array[Long]): Long = {
    val s = input.toString
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    @inline def isSep(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    val d = weights.length
    var score = 0L
    var i = lo
    while (i < hi) {
      if (isSep(s.charAt(i))) i += 1
      else {
        var h = 0L
        while (i < hi && !isSep(s.charAt(i))) {
          h = h * 31L + s.charAt(i).toLong
          i += 1
        }
        score += weights(java.lang.Long.remainderUnsigned(h, d.toLong).toInt)
      }
    }
    score
  }

  /** See [[SortedIntersectCount]]: |a ∩ b| of two SORTED distinct string
    * arrays by linear merge — no per-row hash-set builds, no union array
    * materialization (|a ∪ b| = |a| + |b| - |a ∩ b|).
    */
  def sortedIntersect(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      // null elements (possible through the SQL surface; never produced
      // by the shingle kernels) are skipped, not matched — a null is not
      // a shingle, and getUTF8String on one would NPE
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  /** See [[SortedIntersectCountLong]]: |a ∩ b| of two SORTED distinct
    * `array<bigint>` by linear merge — the hashed-verification twin of
    * [[sortedIntersect]] (8-byte compares instead of string compares).
    */
  def sortedIntersectLong(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val av = a.getLong(i)
        val bv = b.getLong(j)
        if (av == bv) { c += 1; i += 1; j += 1 }
        else if (av < bv) i += 1
        else j += 1
      }
    }
    c
  }

  /** See [[ShingleSet]]. */
  def shingles(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + k <= n) {
      sb.setLength(0)
      var j = 0
      var hasNull = false
      while (j < k) {
        if (j > 0) sb.append(' ')
        // null elements arrive through the SQL surface (array('a', NULL));
        // skip shingles containing them like the minhash/simhash kernels
        // skip null tokens, instead of NPE-ing the task
        val t = toks.getUTF8String(i + j)
        if (t == null) hasNull = true else sb.append(t.toString)
        j += 1
      }
      if (!hasNull) seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  private val EnSet = java.util.Set.of("the", "and", "of", "to", "in", "is", "you", "that", "it", "for")
  private val FrSet = java.util.Set.of("le", "la", "les", "des", "et", "une", "est", "que", "dans", "pour")
  private val DeSet = java.util.Set.of("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu")
  private val EsSet = java.util.Set.of("el", "los", "las", "y", "un", "una", "es", "que", "por", "para")

  private val Zh = UTF8String.fromString("zh")
  private val En = UTF8String.fromString("en")
  private val Fr = UTF8String.fromString("fr")
  private val De = UTF8String.fromString("de")
  private val Es = UTF8String.fromString("es")
  private val Unknown = UTF8String.fromString("unknown")

  /** See [[LangIdGuess]]. ONE pass over the text replacing five
    * `regexp_count` passes (4 marker alternations + the CJK class):
    * maximal word-character runs are looked up against the marker sets;
    * the language pick re-applies [[graft.functions.text.langId]]'s
    * fixed tie-break order. Run continuity follows Java's `\b` exactly —
    * which, unlike `\w`, treats EVERY Unicode letter as a word char
    * (verified: `\bque\b` does not match in "éque", nor `\bthe\b` after
    * a CJK char) — so any letter/digit/underscore glues the run, and a
    * run containing a non-ASCII char is marked dead (it can never equal
    * an ASCII marker, but it must still block its neighbors). Marker
    * counts and the result are regex-identical except for exotic
    * one-to-many lowercasings (e.g. U+0130), which introduce boundaries
    * in the regex's `lower()` pre-pass that a char-wise scan cannot see.
    */
  def langId(input: UTF8String): UTF8String = {
    val s = input.toString
    val n = s.length
    var cEn = 0; var cFr = 0; var cDe = 0; var cEs = 0
    var cjk = false
    val run = new java.lang.StringBuilder(8)
    var runAlive = true // false once the run is unmatchable (too long / non-ASCII)
    var i = 0
    while (i <= n) {
      // CODE POINTS, not chars: java regex \b boundary-tests the code
      // point, and a supplementary-plane letter (U+1D49C, CJK Ext B) is
      // one word CHARACTER to \b but two non-letter surrogates to a
      // charAt scan — which would fabricate a boundary the regex spec
      // does not have
      val c = if (i < n) s.codePointAt(i) else ' '.toInt
      if (c >= 0x4E00 && c <= 0x9FFF) cjk = true
      if (c == '_'.toInt || Character.isLetterOrDigit(c)) {
        val lc = if (c >= 'A'.toInt && c <= 'Z'.toInt) c + 32 else c
        val asciiWord = (lc >= 'a'.toInt && lc <= 'z'.toInt) ||
          (lc >= '0'.toInt && lc <= '9'.toInt) || lc == '_'.toInt
        if (!asciiWord || run.length() >= 5) runAlive = false // longest marker is 5 chars
        else if (runAlive) run.append(lc.toChar)
      } else {
        if (runAlive && run.length() > 0) {
          val w = run.toString
          if (EnSet.contains(w)) cEn += 1
          if (FrSet.contains(w)) cFr += 1
          if (DeSet.contains(w)) cDe += 1
          if (EsSet.contains(w)) cEs += 1
        }
        run.setLength(0)
        runAlive = true
      }
      i += (if (i < n) Character.charCount(c) else 1)
    }
    if (cjk) Zh
    else if (cEn >= Math.max(cFr, Math.max(cDe, cEs)) && cEn > 0) En
    else if (cFr >= Math.max(cDe, cEs) && cFr > 0) Fr
    else if (cDe >= cEs && cDe > 0) De
    else if (cEs > 0) Es
    else Unknown
  }

  /** See [[WinnowFingerprint]]. Gram hash is a Rabin-Karp rolling
    * polynomial (base 31, wrap-around 2^64): O(1) per gram instead of
    * re-hashing k chars, and — unlike xxh64 — reproducible in plain SQL
    * modular arithmetic, which is what keeps the winnow query
    * oracle-checkable.
    *
    * UNIT CONTRACT: grams are over UTF-16 code units (`charAt`), and the
    * DuckDB oracle's `ascii(text[i])` units agree only while the corpus
    * is BMP/ASCII (recorded in the verify recipe) — a supplementary
    * character is one oracle unit but two kernel units. Fingerprints
    * stay deterministic for dedup either way; only cross-engine parity
    * needs the ASCII corpus. If the corpus goes multibyte, switch BOTH
    * sides to one unit (code points) or drop those oracles to
    * rows-only.
    */
  /** See [[TokenWindowHashes]]: the 64-bit hash of EVERY k-token window
    * of a text, one pass, index = window start position. Tokenization
    * matches [[tokenShingles]] exactly (SQL space-only trim, `\s` run
    * splitting, leading/trailing empty-token quirks), so window
    * positions line up with `split(trim(text), '\\s+')` coordinates.
    *
    * Per-token hashes (char polynomial + splitmix64 finalizer) combine
    * into a degree-(k-1) polynomial mod 2^64 ROLLED across positions:
    * O(n_tokens) total work and zero per-window string materialization,
    * where the `transform(sequence, slice + array_join + xxhash64)`
    * composition it replaces copies every window's text (O(n·k) bytes
    * of garbage per doc) and pays interpreted lambda dispatch per
    * window. Equal windows hash equal on any engine/partition; distinct
    * windows collide at ~2^-64 — the contract the line-dedup and
    * minhash stages already accept.
    */
  def tokenWindowHashes(input: UTF8String, k: Int): ArrayData = {
    val s = input.toString
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    if (lo >= hi) return new GenericArrayData(Array.empty[Long])
    @inline def isSep(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    @inline def mix(z0: Long): Long = { // splitmix64 finalizer
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    // per-token hashes in one scan (growable long buffer, no strings)
    var th = new Array[Long](16)
    var n = 0
    @inline def push(h: Long): Unit = {
      if (n == th.length) th = java.util.Arrays.copyOf(th, n * 2)
      th(n) = mix(h); n += 1
    }
    if (isSep(s.charAt(lo))) push(0L) // leading empty token
    var i = lo
    while (i < hi) {
      if (!isSep(s.charAt(i))) {
        var h = 1125899906842597L
        while (i < hi && !isSep(s.charAt(i))) { h = h * 31 + s.charAt(i); i += 1 }
        push(h)
      } else i += 1
    }
    if (isSep(s.charAt(hi - 1))) push(0L) // trailing empty token
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val B = 0x9E3779B97F4A7C15L // odd: multiplication is invertible mod 2^64
    var pow = 1L // B^(k-1), wrapped
    var j = 1
    while (j < k) { pow *= B; j += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    j = 0
    while (j < k) { h = h * B + th(j); j += 1 }
    out(0) = h
    var t = 1
    while (t + k <= n) {
      h = (h - th(t - 1) * pow) * B + th(t + k - 1)
      out(t) = h
      t += 1
    }
    new GenericArrayData(out)
  }

  /** See [[ScrubJoin]]: the space-join of the tokens of `text` whose
    * token positions are NOT in the SORTED int array `removed`, one
    * pass — the rewrite stage of substring scrub. Tokenization matches
    * [[tokenShingles]]/[[tokenWindowHashes]] exactly (SQL space-only
    * trim, `\s` run splitting, leading/trailing empty-token quirks), so
    * positions line up with [[tokenWindowHashes]] window coordinates.
    * A two-pointer merge over (token index, removed positions) does
    * O(tokens + removed) work where the
    * `filter(t, (tok, i) -> NOT array_contains(rem, i))` composition
    * it replaces pays O(tokens × removed) membership probes. Null or
    * duplicate entries in `removed` are skipped; entries outside
    * [0, n_tokens) remove nothing.
    */
  def scrubJoin(input: UTF8String, removed: ArrayData): UTF8String = {
    val s = input.toString
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    if (lo >= hi) return UTF8String.fromString("")
    @inline def isSep(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    val nr = removed.numElements()
    val sb = new java.lang.StringBuilder(hi - lo)
    var r = 0     // merge pointer into the sorted removal positions
    var idx = 0   // current token index
    var first = true
    @inline def emit(st: Int, en: Int): Unit = {
      while (r < nr && (removed.isNullAt(r) || removed.getInt(r) < idx)) r += 1
      if (!(r < nr && removed.getInt(r) == idx)) {
        if (!first) sb.append(' ')
        sb.append(s, st, en)
        first = false
      }
      idx += 1
    }
    if (isSep(s.charAt(lo))) emit(lo, lo) // leading empty token
    var i = lo
    while (i < hi) {
      if (!isSep(s.charAt(i))) {
        val st = i
        while (i < hi && !isSep(s.charAt(i))) i += 1
        emit(st, i)
      } else i += 1
    }
    if (isSep(s.charAt(hi - 1))) emit(hi, hi) // trailing empty token
    UTF8String.fromString(sb.toString)
  }

  def winnow(input: UTF8String, k: Int, w: Int): ArrayData = {
    val text = input.toString
    val n = text.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val grams = new Array[Long](n - k + 1)
    var h = 0L
    var pow = 1L // 31^(k-1), wrapped
    var i = 0
    while (i < k) {
      h = 31 * h + text.charAt(i)
      if (i < k - 1) pow *= 31
      i += 1
    }
    grams(0) = h
    i = 1
    while (i + k <= n) {
      h = (h - text.charAt(i - 1) * pow) * 31 + text.charAt(i + k - 1)
      grams(i) = h
      i += 1
    }
    if (grams.length <= w) {
      var mi = 0
      var j = 1
      while (j < grams.length) { if (grams(j) <= grams(mi)) mi = j; j += 1 }
      return new GenericArrayData(Array(grams(mi)))
    }
    val picked = scala.collection.mutable.LinkedHashSet.empty[Long]
    var start = 0
    while (start + w <= grams.length) {
      var mi = start
      var j = start + 1
      while (j < start + w) { if (grams(j) <= grams(mi)) mi = j; j += 1 }
      picked += grams(mi)
      start += 1
    }
    new GenericArrayData(picked.toArray)
  }

  /** See [[graft.functions.CdcChunks]]: content-defined chunking — the
    * LBFS/rsync boundary rule (Muthitacharoen et al., SOSP 2001) on the
    * engine's Rabin-Karp char-gram hash (same rolling recurrence as
    * [[winnow]], SQL-replicable in HUGEINT mod-2^64). Position `i`
    * (1-based, `i >= k`) CLOSES a chunk when the hash of the k-gram
    * ending at `i` satisfies `unsigned(h) % divisor == 0`; the
    * remainder (or a doc shorter than k) is the final chunk. Boundaries
    * depend only on LOCAL content, so an insertion re-chunks only its
    * neighborhood — the property that makes chunk-level dedup stable
    * under edits where fixed-width blocks would shift every boundary.
    * No min/max chunk clamps (a production store adds them; they would
    * complicate the SQL twin without changing the plan shape).
    */
  def cdcChunks(input: UTF8String, k: Int, divisor: Int): ArrayData = {
    val text = input.toString
    val n = text.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    if (n < k)
      return new GenericArrayData(Array[Any](UTF8String.fromString(text)))
    val out = new java.util.ArrayList[UTF8String]()
    var h = 0L
    var pow = 1L // 31^(k-1), wrapped
    var i = 0
    while (i < k) {
      h = 31 * h + text.charAt(i)
      if (i < k - 1) pow *= 31
      i += 1
    }
    var start = 0 // 0-based chunk start
    // gram ending at 0-based index e (e >= k-1) has hash h_e
    var e = k - 1
    if (java.lang.Long.remainderUnsigned(h, divisor.toLong) == 0L) {
      out.add(UTF8String.fromString(text.substring(start, e + 1)))
      start = e + 1
    }
    e = k
    while (e < n) {
      h = (h - text.charAt(e - k) * pow) * 31 + text.charAt(e)
      if (java.lang.Long.remainderUnsigned(h, divisor.toLong) == 0L) {
        out.add(UTF8String.fromString(text.substring(start, e + 1)))
        start = e + 1
      }
      e += 1
    }
    if (start < n) out.add(UTF8String.fromString(text.substring(start, n)))
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** See [[CharEntropyQ]]: quantized character-distribution NLL,
    * `-sum over distinct chars of m * floor(ln(m/n)*1e4 + 0.5)`, in ONE
    * pass with an ASCII histogram (map fallback for the rest). Counts
    * CODE POINTS — Spark's `split(text, '')` is code-point aware (an
    * emoji is ONE element, not two surrogate halves), so a code-unit
    * histogram would inflate the entropy of astral-plane text and
    * diverge from the composed twin; `length()` (numChars) is the
    * matching code-point denominator. StrictMath.log matches
    * Catalyst's `ln`.
    */
  def charEntropyQ(input: UTF8String): Long = {
    val s = input.toString
    if (s.isEmpty) return 0L
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Array[Int]] = null
    var n = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Array[Int]]
        val cell = other.get(Integer.valueOf(cp))
        if (cell == null) other.put(Integer.valueOf(cp), Array(1)) else cell(0) += 1
      }
      n += 1
      i += Character.charCount(cp)
    }
    val nd = n.toDouble
    var sum = 0L
    var j = 0
    while (j < 128) {
      val m = ascii(j)
      if (m > 0) sum += m.toLong * math.floor(StrictMath.log(m / nd) * 10000.0 + 0.5).toLong
      j += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val m = it.next()(0)
        sum += m.toLong * math.floor(StrictMath.log(m / nd) * 10000.0 + 0.5).toLong
      }
    }
    -sum
  }
}
