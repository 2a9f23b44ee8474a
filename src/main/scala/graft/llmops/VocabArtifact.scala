package graft.llmops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Standard-format tokenizer ARTIFACTS — the hand-off that makes the
  * trained vocabularies consumable outside this engine. [[Bpe]] and
  * [[Unigram]] train production tokenizers and [[graft.ingest.TokenBin]]
  * ships Megatron token shards, but a token id is only meaningful to a
  * trainer/inference stack that can reproduce the segmentation: this
  * object exports the id↔piece mapping in the two de-facto standard
  * file forms and imports foreign files back into servable tables.
  *
  *   - Unigram → a `tokenizer.json` in the HuggingFace `tokenizers`
  *     schema (`model.type = "Unigram"`, `vocab` = ordered
  *     [piece, log-prob] pairs, `unk_id`, Metaspace pre-tokenizer and
  *     decoder declared) — the single-file form the HF ecosystem loads
  *     directly.
  *   - BPE → GPT-2-convention `vocab.json` (piece → id) + `merges.txt`
  *     (`#version: 0.2` header, one "lhs rhs" line per merge in rank
  *     order) — the two-file form every BPE loader since GPT-2 accepts.
  *
  * Reversible whitespace — the `▁` (U+2581) Metaspace convention: train
  * and serve with [[metaspace]] as the pre-tokenizer (every word gains a
  * leading `▁`), and [[detokenize]] reconstructs text by concatenation +
  * `▁`→space. Without the marker, per-word segmentation is lossy (word
  * boundaries vanish); with it, the declared `decoder` in the exported
  * JSON tells a foreign stack exactly how to invert tokenization. The
  * SentencePiece caveat applies verbatim: a corpus that itself contains
  * U+2581 must be normalized first or detokenization is ambiguous.
  *
  * Determinism: ids are (cnt DESC, piece ASC) rank — the
  * `q_x_tokenize_export` rank — with `<unk>` pinned at id 0 (a trained
  * piece can never collide with the literal `"<unk>"` while
  * `maxPieceLen < 5`); scores print on the exact micro-nll grid
  * (`-nll_micro/10⁶` as a fixed 6-dp decimal), so exports are
  * byte-reproducible and the artifact TABLE is DuckDB-oracled
  * (`q_x_vocab_artifact`). A 6-dp decimal round-trips double parsing
  * exactly back onto the grid, so export → import → [[Unigram.segment]]
  * reproduces native segmentation decision-for-decision.
  *
  * Scale: a vocabulary is `vocabSize`-bounded BY CONSTRUCTION (the
  * trainer prunes to it), so the artifact collect/parse here is the
  * [[Bpe.mergeTable]] bounded-driver-action class, never corpus-sized;
  * file I/O is one tmp+rename per artifact (atomic — a reader never
  * sees a torn file).
  */
object VocabArtifact {

  val Marker = "▁"

  /** The Metaspace pre-tokenizer: `base`'s tokens, each with a leading
    * `▁` — pass as the `tokens` param of [[Unigram.unigramVocab]] /
    * [[Unigram.segment]] (and the Bpe entry points) to train/serve with
    * reversible whitespace.
    */
  def metaspace(base: Column => Column = TextAnalysis.wsTokens): Column => Column =
    c => transform(base(c), w => concat(lit(Marker), w))

  /** The GPT-2 `bytes_to_unicode` table (Radford et al. 2019, encoder.py
    * — public): printable bytes (33–126, 161–172, 174–255) map to their
    * own character; every other byte maps to 256+n in ascending byte
    * order, so all 256 bytes land on visible, whitespace-free BMP chars
    * and BPE can train/serve over arbitrary bytes with plain string
    * machinery. Index = byte value. Byte 0x20 maps to `Ġ` (U+0120) — the
    * leading-space marker every GPT-2-lineage vocab shows.
    */
  val ByteLevelTable: IndexedSeq[String] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    (0 until 256).map { b =>
      if (keep(b)) b.toChar.toString
      else { val c = (256 + n).toChar.toString; n += 1; c }
    }
  }

  private val ByteLevelHexMap: Map[String, String] =
    ByteLevelTable.zipWithIndex.map { case (ch, b) =>
      f"$b%02X" -> ch
    }.toMap
  private val ByteLevelInvMap: Map[String, String] =
    ByteLevelHexMap.map(_.swap)

  /** GPT-2 byte-level pre-tokenizer: `base`'s tokens, each with a
    * leading space (prepend_scheme always — the [[metaspace]] stance),
    * then every UTF-8 byte mapped through [[ByteLevelTable]] — a word
    * becomes e.g. `Ġcafé` → `ĠcafÃ©`. Feed to [[Bpe.wordVocab]]-shaped
    * training (explode + count the encoded tokens) or the tokens param
    * of the serving entry points; segmentation becomes TOTAL over any
    * input byte sequence (the BPE twin of Unigram's byte fallback).
    */
  def byteLevel(base: Column => Column = TextAnalysis.wsTokens): Column => Column =
    c => transform(base(c), w => byteLevelEncode(concat(lit(" "), w)))

  /** Map a string's UTF-8 bytes through [[ByteLevelTable]]. */
  def byteLevelEncode(c: Column): Column = {
    val m = typedLit(ByteLevelHexMap)
    val hx = hex(encode(c, "UTF-8"))
    array_join(transform(sequence(lit(1), length(hx) - 1, lit(2)),
      i => element_at(m, hx.substr(i, lit(2)))), "")
  }

  /** Invert [[byteLevelEncode]]: mapped chars → bytes → UTF-8 text.
    * Foreign byte-level tokens carrying invalid UTF-8 decode to U+FFFD
    * (the detokenize byte-fallback stance); a char outside the 256-entry
    * table yields a null byte-pair and the decode fails loudly rather
    * than silently dropping bytes.
    */
  def byteLevelDecode(c: Column): Column =
    decode(unhex(array_join(transform(
      sequence(lit(1), length(c)),
      i => element_at(typedLit(ByteLevelInvMap), c.substr(i, lit(1)))), "")),
      "UTF-8")

  /** Invert a byte-level segmentation back to text: pieces concatenate
    * in (word_idx, piece_idx) order, the whole stream byte-decodes
    * (leading-space `Ġ` markers become real spaces), edges trim.
    */
  def detokenizeByteLevel(segmented: DataFrame): DataFrame =
    segmented.groupBy("id")
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("word_idx"), col("piece_idx"),
          col("piece")))),
        x => x("piece"))).as("__joined"))
      .select(col("id"), trim(byteLevelDecode(col("__joined"))).as("text"))

  /** Invert a [[metaspace]]-tokenized [[Unigram.segment]] output back to
    * text: pieces concatenate in (word_idx, piece_idx) order, `▁`
    * becomes a space, the leading space trims. Returns (id, text).
    * Scale: one keyed aggregation; each doc's piece list is
    * doc-length-bounded.
    */
  def detokenize(segmented: DataFrame, marker: String = Marker,
      byteFallback: Boolean = false): DataFrame = {
    val joined = segmented.groupBy("id")
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("word_idx"), col("piece_idx"),
          col("piece")))),
        x => x("piece"))).as("__joined"))
    // byte pieces decode BEFORE the marker replacement (an OOV `▁` byte-
    // expands to <0xE2><0x96><0x81> and must reassemble first): literal
    // `%`/`+` escape out of url_decode's way, `<0xXX>` becomes `%XX`,
    // one UTF-8 percent-decode reassembles multi-byte runs. Stated
    // losses (the corpus-contains-U+2581 caveat's siblings): literal
    // `<0xAB>`-shaped text in a document false-decodes, and byte runs a
    // FOREIGN tokenizer emitted as invalid UTF-8 decode to U+FFFD.
    val decoded =
      if (!byteFallback) col("__joined")
      else url_decode(regexp_replace(
        regexp_replace(regexp_replace(col("__joined"), "%", "%25"),
          "\\+", "%2B"),
        "<0x([0-9A-F]{2})>", "%$1"))
    joined.select(col("id"),
      trim(regexp_replace(decoded, marker, " ")).as("text"))
  }

  /** The unigram artifact TABLE — exactly what [[writeUnigramJson]]
    * serializes, kept relational so the export is oracle-checkable:
    * (id, piece, score_micro, score_str) with `<unk>` at id 0
    * (score 0), every trained piece at its (cnt DESC, piece) rank, and
    * `score_str` the fixed 6-dp decimal of `-nll_micro/10⁶` that lands
    * verbatim in the JSON. The global rank window is vocab-bounded (the
    * trainer pruned to `vocabSize`), the `q_x_tokenize_export`-
    * adjudicated shape.
    */
  /** The 256 SentencePiece-convention byte pieces, `<0x00>`..`<0xFF>`. */
  private[llmops] val BytePieceSeq: Seq[String] =
    (0 to 255).map(b => f"<0x$b%02X>")

  def unigramArtifactTable(vocab: DataFrame,
      controls: Seq[String] = Nil,
      byteFallback: Boolean = false): DataFrame = {
    val spark = vocab.sparkSession
    import spark.implicits._
    require(controls.distinct.size == controls.size && !controls.contains("<unk>"),
      s"controls must be distinct and must not repeat <unk>: $controls")
    // byte_fallback reserves <0x00>..<0xFF> right after the controls
    // (the Llama id layout: unk, controls, bytes, then learned pieces)
    // at score 0 — they never segment by score (Unigram.segment emits
    // them POST-DP; servableVocab withholds them from matching).
    val reserved =
      if (byteFallback) BytePieceSeq else Seq.empty[String]
    val ranked = vocab
      .select(col("piece"), col("cnt"), col(nllColOf(vocab)).as("__nll"))
      .withColumn("id", row_number().over(
        Window.orderBy(col("cnt").desc, col("piece"))).cast("long") +
        lit((controls.size + reserved.size).toLong))
      .select(col("id"), col("piece"),
        (-col("__nll")).as("score_micro"),
        when(col("__nll") === 0L, lit("0.0"))
          .otherwise(concat(lit("-"),
            expr("__nll div 1000000L").cast("string"), lit("."),
            lpad((col("__nll") % 1000000L).cast("string"), 6, "0")))
          .as("score_str"))
    (Seq((0L, "<unk>", 0L, "0.0")) ++
      (controls ++ reserved).zipWithIndex
        .map { case (c, i) => (1L + i, c, 0L, "0.0") })
      .toDF("id", "piece", "score_micro", "score_str")
      .unionByName(ranked)
  }

  private def nllColOf(vocab: DataFrame): String =
    if (vocab.columns.contains("nll_micro")) "nll_micro" else "nll"

  /** Export a trained [[Unigram.unigramVocab]] as a HuggingFace-schema
    * `tokenizer.json` at `path` (atomic tmp+rename). Returns a one-row
    * manifest (file, n_pieces, content_md5) — the replica-verification
    * receipt. The vocab collect is `vocabSize`-bounded.
    */
  def writeUnigramJson(vocab: DataFrame, path: String,
      controls: Seq[String] = Nil,
      byteFallback: Boolean = false): DataFrame = {
    val spark = vocab.sparkSession
    val rows = unigramArtifactTable(vocab, controls, byteFallback)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3)))
    require(rows.nonEmpty && rows.head._2 == "<unk>",
      "artifact table must lead with the <unk> row")
    require(rows.map(_._2).distinct.length == rows.length,
      "artifact pieces must be unique — a TRAINED piece collides with a " +
        "control token (pre-filter the corpus or rename the control): " +
        rows.map(_._2).diff(rows.map(_._2).distinct).take(5).mkString(", "))
    // controls declared → unk + controls ship in added_tokens with
    // special:true (the SP-converted-tokenizer convention — ids 0..k sit
    // in the model vocab AND the added_tokens list, so a foreign loader
    // knows never to split them out of raw text, and [[servableVocab]]
    // knows to withhold them from segmentation). controls = Nil keeps
    // the r12 byte-pin: added_tokens stays [].
    val added =
      if (controls.isEmpty) "[]"
      else rows.take(1 + controls.size).map { case (id, piece, _) =>
        "{\"id\":" + id + ",\"content\":\"" + jsonEscape(piece) +
          "\",\"single_word\":false,\"lstrip\":false,\"rstrip\":false," +
          "\"normalized\":false,\"special\":true}"
      }.mkString("[", ",", "]")
    val sb = new StringBuilder
    sb ++= "{\"version\":\"1.0\",\"truncation\":null,\"padding\":null,"
    sb ++= "\"added_tokens\":" + added + ",\"normalizer\":null,"
    sb ++= "\"pre_tokenizer\":{\"type\":\"Metaspace\",\"replacement\":\"" +
      Marker + "\",\"prepend_scheme\":\"always\",\"split\":true},"
    sb ++= "\"post_processor\":null,"
    sb ++= "\"decoder\":{\"type\":\"Metaspace\",\"replacement\":\"" +
      Marker + "\",\"prepend_scheme\":\"always\",\"split\":true},"
    // byte_fallback serializes only when true — keeps the r12 byte-pin
    // for plain exports; HF loaders treat the absent field as false.
    sb ++= "\"model\":{\"type\":\"Unigram\",\"unk_id\":0," +
      (if (byteFallback) "\"byte_fallback\":true," else "") + "\"vocab\":["
    rows.zipWithIndex.foreach { case ((id, piece, score), i) =>
      require(id == i.toLong, s"artifact ids must be dense 0..n (got $id at $i)")
      if (i > 0) sb += ','
      sb ++= "[\"" + jsonEscape(piece) + "\"," + score + "]"
    }
    sb ++= "]}}"
    writeFileAtomic(spark, path, sb.toString.getBytes("UTF-8"), rows.length.toLong)
  }

  /** Import a `tokenizer.json` (ours or FOREIGN — any file in the HF
    * Unigram schema) back to a servable table: (id, piece, nll_micro,
    * unk). Feed the non-unk rows straight to [[Unigram.segment]]
    * (`checkCoverage = true` recommended for foreign vocabularies —
    * see the coverage contract there). Scores quantize back onto the
    * micro-nll grid (`round(-score·10⁶)`); our own exports land exactly.
    */
  def readUnigramJson(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val bytes = readFileWhole(spark, path)
    val root = MiniJson.parse(new String(bytes, "UTF-8")) match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case other => throw new IllegalArgumentException(
        s"tokenizer.json: top level must be an object, got ${other.getClass.getSimpleName}")
    }
    val model = root.get("model") match {
      case Some(m: Map[String @unchecked, Any @unchecked]) => m
      case _ => throw new IllegalArgumentException("tokenizer.json: missing model object")
    }
    require(model.get("type").contains("Unigram"),
      s"tokenizer.json: model.type must be Unigram (got ${model.get("type")})")
    val unkId = model.get("unk_id") match {
      case Some(d: Double) => d.toLong
      case _ => -1L
    }
    val vocab = model.get("vocab") match {
      case Some(v: Vector[Any @unchecked]) => v
      case _ => throw new IllegalArgumentException("tokenizer.json: missing model.vocab array")
    }
    // added_tokens with special:true mark control ids (the unk id keeps
    // its own flag); absent/empty added_tokens → no controls (back-compat
    // with r12 exports and plain SP conversions).
    val specialIds: Set[Long] = root.get("added_tokens") match {
      case Some(v: Vector[Any @unchecked]) => v.flatMap {
        case m: Map[String @unchecked, Any @unchecked]
          if m.get("special").contains(true) => m.get("id") match {
            case Some(d: Double) => Some(d.toLong)
            case _ => None
          }
        case _ => None
      }.toSet
      case _ => Set.empty
    }
    // model.byte_fallback (absent = false, the HF default) marks the
    // <0xXX> rows as byte pieces: real ids for the export hand-off, but
    // NEVER servable — their literal text inside a document must not
    // match (the control-token rule; Unigram.segment emits them post-DP).
    val byteFallback = model.get("byte_fallback").contains(true)
    val bytePat = "^<0x[0-9A-F]{2}>$".r
    val rows = vocab.zipWithIndex.map {
      case (Vector(piece: String, score: Double), i) =>
        (i.toLong, piece, math.round(-score * 1e6), i.toLong == unkId,
          specialIds.contains(i.toLong) && i.toLong != unkId,
          byteFallback && bytePat.matches(piece))
      case (other, i) => throw new IllegalArgumentException(
        s"tokenizer.json: vocab[$i] must be [piece, score], got $other")
    }
    rows.toDF("id", "piece", "nll_micro", "unk", "control", "byte")
  }

  /** The serving projection of an imported artifact: every piece
    * [[Unigram.segment]] may emit — unk and control tokens withheld
    * (controls are STRUCTURAL ids appended by the pipeline, e.g. the
    * `</s>` document terminator; letting the DP match their literal
    * text inside a document would corrupt every downstream attention
    * boundary). Works on both reader shapes (the TSV form has no
    * control flag — its controls are score-0 rows the caller names).
    */
  def servableVocab(imported: DataFrame): DataFrame = {
    val noUnk = imported.filter(!col("unk"))
    val noCtl = if (imported.columns.contains("control"))
      noUnk.filter(!col("control")) else noUnk
    val noByte = if (imported.columns.contains("byte"))
      noCtl.filter(!col("byte")) else noCtl
    noByte.select("piece", "nll_micro")
  }

  /** Export learned BPE as GPT-2-convention `vocab.json` + `merges.txt`
    * under `dir`: the alphabet (every distinct single-char symbol of the
    * training word vocabulary, sorted) takes ids 0.., then each merge
    * product in rank order (first occurrence wins if two merges produce
    * the same string). Symbols never contain whitespace (they come from
    * whitespace-split words), so the space-separated merges format is
    * unambiguous. Returns a two-row manifest (file, n_pieces,
    * content_md5); both writes are atomic.
    */
  def writeBpeFiles(trainVocab: DataFrame, merges: Seq[Bpe.Merge],
      dir: String): DataFrame = {
    val spark = trainVocab.sparkSession
    val pieces = bpePieces(trainVocab, merges)
    val vj = new StringBuilder
    vj += '{'
    var first = true
    pieces.foreach { case (p, id) =>
      if (!first) vj += ','
      first = false
      vj ++= "\"" + jsonEscape(p) + "\":" + id
    }
    vj += '}'
    val mt = new StringBuilder
    mt ++= "#version: 0.2\n"
    merges.sortBy(_.rank).foreach(m => mt ++= m.left + " " + m.right + "\n")
    writeFileAtomic(spark, s"$dir/vocab.json",
      vj.toString.getBytes("UTF-8"), pieces.size.toLong)
      .unionByName(writeFileAtomic(spark, s"$dir/merges.txt",
        mt.toString.getBytes("UTF-8"), merges.length.toLong))
  }

  /** Export the unigram artifact as a SentencePiece-convention `.vocab`
    * TSV — one `piece<TAB>score` line per id in id order (`<unk>` first,
    * the SP layout) — the inspection/diff-friendly sibling of the JSON
    * model file (SP itself ships both; the TSV is what humans and shell
    * pipelines read). Same micro-grid score strings as the JSON, so the
    * two artifacts can never disagree. Returns the one-row manifest.
    */
  def writeUnigramTsv(vocab: DataFrame, path: String,
      controls: Seq[String] = Nil): DataFrame = {
    val rows = unigramArtifactTable(vocab, controls)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3)))
    require(rows.map(_._2).distinct.length == rows.length,
      "artifact pieces must be unique — a TRAINED piece collides with a " +
        "control token (pre-filter the corpus or rename the control)")
    val sb = new StringBuilder
    rows.zipWithIndex.foreach { case ((id, piece, score), i) =>
      require(id == i.toLong, s"artifact ids must be dense 0..n (got $id at $i)")
      require(!piece.contains('\t') && !piece.contains('\n'),
        s"piece at id $id contains a TAB/newline — unrepresentable in the TSV form")
      sb ++= piece + "\t" + score + "\n"
    }
    writeFileAtomic(vocab.sparkSession, path,
      sb.toString.getBytes("UTF-8"), rows.length.toLong)
  }

  /** Import a `.vocab` TSV (ours or a real SentencePiece export) back to
    * (id, piece, nll_micro, unk) — id is the line number, unk is the
    * literal `<unk>` piece (the SP convention). Scores quantize onto the
    * micro-nll grid like [[readUnigramJson]].
    */
  def readUnigramTsv(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = new String(readFileWhole(spark, path), "UTF-8")
      .split("\n", -1).iterator.map(_.stripSuffix("\r")).toVector
      .reverse.dropWhile(_.isEmpty).reverse // trailing newlines are format, not data
    val rows = lines.zipWithIndex.map { case (l, i) =>
      val tab = l.indexOf('\t')
      require(tab > 0, s".vocab line ${i + 1}: expected 'piece<TAB>score', got '$l'")
      val piece = l.substring(0, tab)
      val score = try l.substring(tab + 1).trim.toDouble catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s".vocab line ${i + 1}: score '${l.substring(tab + 1).trim}' is not a number")
      }
      (i.toLong, piece, math.round(-score * 1e6), piece == "<unk>")
    }
    rows.toDF("id", "piece", "nll_micro", "unk")
  }

  /** Export a WordPiece vocabulary as the BERT-convention `vocab.txt` —
    * one piece per line, the LINE NUMBER is the id (the format every
    * BERT-family loader reads): the `specials` prelude
    * (`[PAD] [UNK] [CLS] [SEP] [MASK]` by default, ids 0..) then the
    * trained pieces in [[WordPiece.vocabTable]] order re-based after it.
    * Pieces come from whitespace-split words so they never contain
    * newlines; the loud check guards imported/foreign trainVocabs.
    * Returns the one-row (file, n_pieces, content_md5) manifest; the
    * write is atomic (tmp + rename).
    */
  def writeWordPieceVocabTxt(trainVocab: DataFrame,
      merges: Seq[WordPiece.Merge], path: String,
      specials: Seq[String] =
        Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]")): DataFrame = {
    val pieces = WordPiece.wordPiecePieces(trainVocab, merges).keysIterator.toSeq
    require(specials.distinct.length == specials.length,
      "duplicate special tokens")
    val clash = pieces.toSet.intersect(specials.toSet)
    require(clash.isEmpty,
      s"trained piece collides with a special token: ${clash.mkString(", ")} " +
        "— pre-filter the corpus or rename the special")
    val all = specials ++ pieces
    all.foreach(p => require(!p.contains('\n') && !p.contains('\r'),
      s"piece '$p' contains a newline — unrepresentable in vocab.txt"))
    writeFileAtomic(trainVocab.sparkSession, path,
      all.mkString("", "\n", "\n").getBytes("UTF-8"), all.size.toLong)
  }

  /** Import a `vocab.txt` (ours or a real BERT export) back to
    * (id, piece) — id is the line number. The result serves
    * [[WordPiece.segment]] directly (it reads only `piece`); specials
    * ride along as ordinary vocabulary entries, exactly as real
    * WordPiece serving treats them.
    */
  def readWordPieceVocabTxt(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = new String(readFileWhole(spark, path), "UTF-8")
      .split("\n", -1).iterator.map(_.stripSuffix("\r")).toVector
      .reverse.dropWhile(_.isEmpty).reverse // trailing newlines are format, not data
    lines.zipWithIndex.foreach { case (l, i) =>
      require(l.nonEmpty, s"vocab.txt line ${i + 1} is empty — a blank " +
        "piece cannot match anything and signals a torn/foreign file")
    }
    lines.zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("id", "piece")
  }

  /** Export a WordPiece vocabulary as the SINGLE-FILE HuggingFace
    * `tokenizer.json` (`model.type = WordPiece`) — the modern envelope
    * next to the BERT-convention [[writeWordPieceVocabTxt]], completing
    * the one-file JSON form for all three tokenizer families: the same
    * specials-then-trained id assignment, `unk_token = [UNK]`,
    * `continuing_subword_prefix = "##"` and `max_input_chars_per_word`
    * DECLARED in the model object (so a foreign loader reproduces the
    * greedy serving exactly), specials shipped in `added_tokens` with
    * `special:true`, pre-tokenizer `WhitespaceSplit` (our training
    * split). Returns the one-row manifest; collects are vocab-bounded.
    */
  def writeWordPieceJson(trainVocab: DataFrame,
      merges: Seq[WordPiece.Merge], path: String,
      specials: Seq[String] =
        Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"),
      maxInputChars: Int = 32): DataFrame = {
    require(specials.contains(WordPiece.Unk),
      s"specials must include the unk token '${WordPiece.Unk}' — the " +
        "model object declares it and serving maps uncovered words to it")
    require(maxInputChars >= 1)
    val pieces = WordPiece.wordPiecePieces(trainVocab, merges).keysIterator.toSeq
    require(specials.distinct.length == specials.length, "duplicate specials")
    val clash = pieces.toSet.intersect(specials.toSet)
    require(clash.isEmpty,
      s"trained piece collides with a special token: ${clash.mkString(", ")}")
    val all = specials ++ pieces
    val added = specials.zipWithIndex.map { case (s, i) =>
      "{\"id\":" + i + ",\"content\":\"" + jsonEscape(s) +
        "\",\"single_word\":false,\"lstrip\":false,\"rstrip\":false," +
        "\"normalized\":false,\"special\":true}"
    }.mkString("[", ",", "]")
    val sb = new StringBuilder
    sb ++= "{\"version\":\"1.0\",\"truncation\":null,\"padding\":null,"
    sb ++= "\"added_tokens\":" + added + ",\"normalizer\":null,"
    sb ++= "\"pre_tokenizer\":{\"type\":\"WhitespaceSplit\"},"
    sb ++= "\"post_processor\":null,\"decoder\":null,"
    sb ++= "\"model\":{\"type\":\"WordPiece\",\"unk_token\":\"" +
      jsonEscape(WordPiece.Unk) + "\","
    sb ++= "\"continuing_subword_prefix\":\"##\","
    sb ++= "\"max_input_chars_per_word\":" + maxInputChars + ",\"vocab\":{"
    all.zipWithIndex.foreach { case (p, id) =>
      if (id > 0) sb += ','
      sb ++= "\"" + jsonEscape(p) + "\":" + id
    }
    sb ++= "}}}"
    writeFileAtomic(trainVocab.sparkSession, path,
      sb.toString.getBytes("UTF-8"), all.size.toLong)
  }

  /** Import a WordPiece `tokenizer.json` (ours or a real BERT-family
    * export): returns the (id, piece) vocab — servable by
    * [[WordPiece.segment]] directly — plus the declared unk token and
    * `max_input_chars_per_word` (pass it as segment's maxWordLen so the
    * over-length rule matches the exporter's). Loud on: a non-WordPiece
    * model type, a `continuing_subword_prefix` other than `##` (the
    * serving fold's position-class keys are built on it — a silent
    * mismatch would mis-segment everything; stated scope), non-integer
    * ids, and an unk token missing from the vocab.
    */
  def readWordPieceJson(spark: SparkSession,
      path: String): (DataFrame, String, Int) = {
    import spark.implicits._
    val root = MiniJson.parse(
      new String(readFileWhole(spark, path), "UTF-8")) match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case other => throw new IllegalArgumentException(
        s"tokenizer.json: top level must be an object, got ${other.getClass.getSimpleName}")
    }
    val model = root.get("model") match {
      case Some(m: Map[String @unchecked, Any @unchecked]) => m
      case _ => throw new IllegalArgumentException(
        "tokenizer.json: missing model object")
    }
    require(model.get("type").contains("WordPiece"),
      s"tokenizer.json: model.type must be WordPiece (got ${model.get("type")})")
    val prefix = model.get("continuing_subword_prefix")
    require(prefix.contains("##"),
      s"tokenizer.json: continuing_subword_prefix must be '##' (got " +
        s"$prefix) — the serving fold's position classes are built on it")
    val unk = model.get("unk_token") match {
      case Some(s: String) => s
      case _ => throw new IllegalArgumentException(
        "tokenizer.json: missing model.unk_token")
    }
    val maxChars = model.get("max_input_chars_per_word") match {
      case Some(d: Double) if d.isWhole && d >= 1 => d.toInt
      case other => throw new IllegalArgumentException(
        s"tokenizer.json: max_input_chars_per_word must be a positive " +
          s"integer (got $other)")
    }
    val vocab = model.get("vocab") match {
      case Some(v: Map[String @unchecked, Any @unchecked]) => v.toVector.map {
        case (p, id: Double) =>
          require(id.isWhole && id >= 0,
            s"tokenizer.json: vocab id for '$p' is not a non-negative integer: $id")
          (id.toLong, p)
        case (p, other) => throw new IllegalArgumentException(
          s"tokenizer.json: vocab id for '$p' must be a number, got $other")
      }
      case _ => throw new IllegalArgumentException(
        "tokenizer.json: missing model.vocab object")
    }
    require(vocab.exists(_._2 == unk),
      s"tokenizer.json: unk token '$unk' is not in model.vocab")
    (vocab.sortBy(_._1).toDF("id", "piece"), unk, maxChars)
  }

  /** The BPE artifact TABLE — exactly the (piece, id) mapping
    * `vocab.json` serializes, kept relational so the export is
    * oracle-checkable: the training alphabet (distinct single-char
    * symbols, sorted) at ids 0.., then each merge product in rank order
    * (first occurrence wins when two merges produce the same string).
    */
  def bpeArtifactTable(trainVocab: DataFrame, merges: Seq[Bpe.Merge]): DataFrame = {
    val spark = trainVocab.sparkSession
    import spark.implicits._
    bpePieces(trainVocab, merges).toSeq.map { case (p, id) => (p, id.toLong) }
      .toDF("piece", "id")
  }

  /** Shared alphabet + merge-product id assignment (insertion-ordered).
    * The alphabet collect is alphabet-sized — bounded by the script
    * repertoire of the corpus, the smallest bounded-collect class here.
    */
  private def bpePieces(trainVocab: DataFrame,
      merges: Seq[Bpe.Merge]): scala.collection.mutable.LinkedHashMap[String, Int] = {
    val alphabet = Bpe.initialSyms(trainVocab).select("s").distinct()
      .orderBy("s").collect().map(_.getString(0))
    val pieces = new scala.collection.mutable.LinkedHashMap[String, Int]()
    alphabet.foreach(a => pieces.getOrElseUpdate(a, pieces.size))
    merges.sortBy(_.rank).foreach(m =>
      pieces.getOrElseUpdate(m.left + m.right, pieces.size))
    pieces
  }

  /** Export learned BPE as a SINGLE-FILE HuggingFace `tokenizer.json`
    * (`model.type = BPE`) — the modern one-file envelope next to the
    * GPT-2-convention two-file form ([[writeBpeFiles]]): same
    * [[bpeArtifactTable]] payload (the `q_x_bpe_artifact`-oracled
    * mapping), same merge list, serialized the way `tokenizers` loads it
    * — `model.vocab` as a piece→id object, `model.merges` as
    * `"lhs rhs"` strings in rank order, the pre-tokenizer DECLARED as
    * `WhitespaceSplit` (exactly our training tokenization — NOT
    * `Whitespace`, whose word/punct regex differs). Returns the one-row
    * manifest; the collect is alphabet+merges-bounded.
    */
  def writeBpeJson(trainVocab: DataFrame, merges: Seq[Bpe.Merge],
      path: String): DataFrame = {
    val spark = trainVocab.sparkSession
    val pieces = bpePieces(trainVocab, merges)
    val sb = new StringBuilder
    sb ++= "{\"version\":\"1.0\",\"truncation\":null,\"padding\":null,"
    sb ++= "\"added_tokens\":[],\"normalizer\":null,"
    sb ++= "\"pre_tokenizer\":{\"type\":\"WhitespaceSplit\"},"
    sb ++= "\"post_processor\":null,\"decoder\":null,"
    sb ++= "\"model\":{\"type\":\"BPE\",\"dropout\":null,\"unk_token\":null,"
    sb ++= "\"continuing_subword_prefix\":null,\"end_of_word_suffix\":null,"
    sb ++= "\"fuse_unk\":false,\"byte_fallback\":false,\"vocab\":{"
    var first = true
    pieces.foreach { case (p, id) =>
      if (!first) sb += ','
      first = false
      sb ++= "\"" + jsonEscape(p) + "\":" + id
    }
    sb ++= "},\"merges\":["
    merges.sortBy(_.rank).zipWithIndex.foreach { case (m, i) =>
      if (i > 0) sb += ','
      sb ++= "\"" + jsonEscape(m.left + " " + m.right) + "\""
    }
    sb ++= "]}}"
    writeFileAtomic(spark, path, sb.toString.getBytes("UTF-8"),
      pieces.size.toLong)
  }

  /** Import a BPE `tokenizer.json` (ours or FOREIGN): returns
    * (vocab: (piece, id), merges: (mrank, lhs, rhs)) — feed merges to
    * [[Bpe.applyMerges]] to replay segmentation. Tolerant of what real
    * files vary: field order, whitespace, and BOTH merge serializations
    * (`"lhs rhs"` strings and the newer `["lhs","rhs"]` pairs). Loud on:
    * a non-BPE model type, a merge entry in neither form, a merge whose
    * sides are not both in the vocab, non-integer ids.
    */
  def readBpeJson(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val root = MiniJson.parse(
      new String(readFileWhole(spark, path), "UTF-8")) match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case other => throw new IllegalArgumentException(
        s"tokenizer.json: top level must be an object, got ${other.getClass.getSimpleName}")
    }
    val model = root.get("model") match {
      case Some(m: Map[String @unchecked, Any @unchecked]) => m
      case _ => throw new IllegalArgumentException("tokenizer.json: missing model object")
    }
    require(model.get("type").contains("BPE"),
      s"tokenizer.json: model.type must be BPE (got ${model.get("type")})")
    val vocab = model.get("vocab") match {
      case Some(v: Map[String @unchecked, Any @unchecked]) => v.toVector.map {
        case (p, id: Double) =>
          require(id.isWhole && id >= 0,
            s"tokenizer.json: vocab id for '$p' is not a non-negative integer: $id")
          (p, id.toLong)
        case (p, other) => throw new IllegalArgumentException(
          s"tokenizer.json: vocab id for '$p' must be a number, got $other")
      }
      case _ => throw new IllegalArgumentException(
        "tokenizer.json: missing model.vocab object")
    }
    val inVocab = vocab.map(_._1).toSet
    val merges = model.get("merges") match {
      case Some(v: Vector[Any @unchecked]) => v.zipWithIndex.map {
        case (s: String, i) =>
          val parts = s.split(" ", -1)
          require(parts.length == 2 && parts.forall(_.nonEmpty),
            s"tokenizer.json: merges[$i] must be 'lhs rhs', got '$s'")
          ((i + 1).toLong, parts(0), parts(1))
        case (Vector(l: String, r: String), i) => ((i + 1).toLong, l, r)
        case (other, i) => throw new IllegalArgumentException(
          s"tokenizer.json: merges[$i] must be 'lhs rhs' or [lhs, rhs], got $other")
      }
      case _ => throw new IllegalArgumentException(
        "tokenizer.json: missing model.merges array")
    }
    merges.foreach { case (i, l, r) =>
      require(inVocab(l) && inVocab(r) && inVocab(l + r),
        s"tokenizer.json: merge $i ('$l' + '$r') or its product is " +
          "missing from model.vocab — the file is internally inconsistent")
    }
    (vocab.toDF("piece", "id"), merges.toDF("mrank", "lhs", "rhs"))
  }

  /** Import `merges.txt` back to the [[Bpe.mergeTable]] row shape
    * (mrank, lhs, rhs) — replay it on any corpus with
    * [[Bpe.applyMerges]]. Blank lines and `#` comment lines skip; a
    * non-two-token line fails loudly (a silently skipped merge would
    * change every downstream segmentation).
    */
  def readBpeMerges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lines = new String(readFileWhole(spark, s"$dir/merges.txt"), "UTF-8")
      .split("\n", -1).iterator
      .map(_.stripSuffix("\r"))
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .toVector
    val rows = lines.zipWithIndex.map { case (l, i) =>
      val parts = l.split(" ", -1)
      require(parts.length == 2 && parts.forall(_.nonEmpty),
        s"merges.txt line ${i + 1}: expected 'lhs rhs', got '$l'")
      ((i + 1).toLong, parts(0), parts(1))
    }
    rows.toDF("mrank", "lhs", "rhs")
  }

  /** Import `vocab.json` back to (piece, id). */
  def readBpeVocab(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = MiniJson.parse(
      new String(readFileWhole(spark, s"$dir/vocab.json"), "UTF-8")) match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case other => throw new IllegalArgumentException(
        s"vocab.json: expected an object, got ${other.getClass.getSimpleName}")
    }
    root.toSeq.map {
      case (p, id: Double) => (p, id.toLong)
      case (p, other) => throw new IllegalArgumentException(
        s"vocab.json: id of '$p' must be a number, got $other")
    }.toDF("piece", "id")
  }

  // ------------------------------------------------------------------
  // file + JSON plumbing
  // ------------------------------------------------------------------

  // private FS instances with checksums OFF (the ShardSink/TokenBin
  // invariant: artifacts ship without .crc sidecar litter, and a foreign
  // edit to a shipped file must not trip a stale local checksum) —
  // setWriteChecksum on the SHARED cached FileSystem would mutate global
  // state, so each call owns and closes its own instance.
  private[llmops] def writeFileAtomic(spark: SparkSession, path: String,
      bytes: Array[Byte], nPieces: Long): DataFrame = {
    import spark.implicits._
    val p = new Path(path)
    val fs = org.apache.hadoop.fs.FileSystem.newInstance(p.toUri,
      spark.sparkContext.hadoopConfiguration)
    try {
      fs.setWriteChecksum(false)
      fs.setVerifyChecksum(false)
      fs.mkdirs(p.getParent)
      val tmp = new Path(p.getParent, s".${p.getName}.tmp")
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      fs.delete(p, false)
      require(fs.rename(tmp, p), s"rename failed: $path")
    } finally fs.close()
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString
    Seq((path, nPieces, md5)).toDF("file", "n_pieces", "content_md5")
  }

  private[llmops] def readFileWhole(spark: SparkSession, path: String): Array[Byte] = {
    val p = new Path(path)
    val fs = org.apache.hadoop.fs.FileSystem.newInstance(p.toUri,
      spark.sparkContext.hadoopConfiguration)
    try {
      fs.setVerifyChecksum(false)
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } finally in.close()
    } finally fs.close()
  }

  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case c if c < 0x20 => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    sb.toString
  }

  /** Minimal recursive-descent JSON parser for the pinned artifact
    * subset — objects → `Map[String, Any]`, arrays → `Vector[Any]`,
    * strings (full escape set incl. `\uXXXX`), numbers → `Double`,
    * `true`/`false`/`null`. Hand-rolled on purpose (the Xlsx/PDF
    * dependency-free-reader discipline) and tolerant of foreign
    * whitespace/field order; anything outside JSON fails loudly with
    * the offset.
    */
  private[graft] object MiniJson {
    def parse(s: String): Any = {
      val p = new P(s)
      p.ws()
      val v = p.value()
      p.ws()
      require(p.i == s.length, s"trailing content at offset ${p.i}")
      v
    }

    private final class P(s: String) {
      var i = 0
      def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
      private def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"JSON parse error at offset $i: $msg")
      private def expect(c: Char): Unit = {
        if (i >= s.length || s.charAt(i) != c) fail(s"expected '$c'")
        i += 1
      }
      def value(): Any = {
        if (i >= s.length) fail("unexpected end")
        s.charAt(i) match {
          case '{' => obj()
          case '[' => arr()
          case '"' => str()
          case 't' => lit("true", java.lang.Boolean.TRUE)
          case 'f' => lit("false", java.lang.Boolean.FALSE)
          case 'n' => lit("null", null)
          case c if c == '-' || c.isDigit => num()
          case c => fail(s"unexpected '$c'")
        }
      }
      private def lit(word: String, v: Any): Any = {
        if (!s.startsWith(word, i)) fail(s"expected $word")
        i += word.length; v
      }
      private def obj(): Map[String, Any] = {
        expect('{'); ws()
        val m = Map.newBuilder[String, Any]
        if (i < s.length && s.charAt(i) == '}') { i += 1; return m.result() }
        var done = false
        while (!done) {
          ws()
          val k = str()
          ws(); expect(':'); ws()
          m += (k -> value())
          ws()
          if (i < s.length && s.charAt(i) == ',') i += 1
          else { expect('}'); done = true }
        }
        m.result()
      }
      private def arr(): Vector[Any] = {
        expect('['); ws()
        val b = Vector.newBuilder[Any]
        if (i < s.length && s.charAt(i) == ']') { i += 1; return b.result() }
        var done = false
        while (!done) {
          ws()
          b += value()
          ws()
          if (i < s.length && s.charAt(i) == ',') i += 1
          else { expect(']'); done = true }
        }
        b.result()
      }
      private def str(): String = {
        expect('"')
        val sb = new StringBuilder
        while (i < s.length && s.charAt(i) != '"') {
          val c = s.charAt(i)
          if (c == '\\') {
            i += 1
            if (i >= s.length) fail("dangling escape")
            s.charAt(i) match {
              case '"' => sb += '"'
              case '\\' => sb += '\\'
              case '/' => sb += '/'
              case 'b' => sb += '\b'
              case 'f' => sb += '\f'
              case 'n' => sb += '\n'
              case 'r' => sb += '\r'
              case 't' => sb += '\t'
              case 'u' =>
                if (i + 4 >= s.length) fail("truncated \\u escape")
                sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
                i += 4
              case e => fail(s"bad escape '\\$e'")
            }
            i += 1
          } else { sb += c; i += 1 }
        }
        expect('"')
        sb.toString
      }
      private def num(): Double = {
        val start = i
        if (i < s.length && s.charAt(i) == '-') i += 1
        while (i < s.length && s.charAt(i).isDigit) i += 1
        if (i < s.length && s.charAt(i) == '.') {
          i += 1
          while (i < s.length && s.charAt(i).isDigit) i += 1
        }
        if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
          i += 1
          if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
          while (i < s.length && s.charAt(i).isDigit) i += 1
        }
        if (i == start) fail("bad number")
        s.substring(start, i).toDouble
      }
    }
  }
}
