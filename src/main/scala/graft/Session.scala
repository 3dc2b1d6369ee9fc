package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSession factory for the graft engine.
  *
  * Defaults are tuned for the harness environment (single-JVM
  * `local[32]`, 128 GiB) but every knob is the one you would also set on
  * a real cluster:
  *
  *   - `spark.sql.shuffle.partitions` sized to the available parallelism
  *     instead of the 200 default (on a 1000-executor cluster this would
  *     be a multiple of total cores; AQE coalesces down from it).
  *   - AQE on: runtime re-planning (skew-join splitting, partition
  *     coalescing, broadcast demotion/promotion) is the main defence at
  *     100 TB where static stats are wrong.
  *   - UTC session time zone so timestamp semantics are stable across
  *     engines (DuckDB oracle parity) and clusters.
  */
object Session {
  def defaultParallelism: Int =
    sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt

  private def intLiteral(e: Expression, what: String): Int =
    if (e.foldable) e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => sys.error(s"$what must be an integer literal, got $other")
    } else sys.error(s"$what must be a literal")

  private def stringSeqLiteral(e: Expression, what: String): Seq[String] = {
    // Gate on the declared type BEFORE eval: a foldable non-string
    // array (e.g. array(1,2)) would otherwise reach
    // toObjectArray(StringType) and die with a MatchError (or misread
    // UnsafeArrayData) instead of the friendly message. The bare
    // `array()` literal types as ARRAY<VOID> and must stay accepted —
    // it is the natural SQL spelling of an empty phrase set
    // (merge_tokens pass-through); a non-empty VOID array's null
    // elements then hit the must-not-contain-NULL error below.
    val elemOk = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => true
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.NullType, _) => true
      case _ => false
    }
    if (!elemOk)
      sys.error(s"$what must be a string-array literal, got type ${e.dataType.sql}")
    if (e.foldable) e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        a.toObjectArray(org.apache.spark.sql.types.StringType).toSeq.map {
          case null => sys.error(s"$what must not contain NULL")
          case u: org.apache.spark.unsafe.types.UTF8String => u.toString
        }
      case other => sys.error(s"$what must be a string-array literal, got $other")
    } else sys.error(s"$what must be a literal")
  }

  /** The engine-native SQL functions (SURVEY §2.11): one list feeding
    * both the extensions hook (fresh sessions) and the direct-registry
    * fallback in [[get]] (pre-existing sessions, where `withExtensions`
    * never runs). */
  private[graft] val nativeFunctions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_f"),
      new ExpressionInfo(classOf[graft.functions.CosineFloat].getName, "cosine_f"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_f(arrayA, arrayB)")
        graft.functions.CosineFloat(args(0), args(1))
      }),
    (FunctionIdentifier("ngram_run_stats"),
      new ExpressionInfo(classOf[graft.functions.NgramRunStats].getName, "ngram_run_stats"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "ngram_run_stats(arrayOfStrings)")
        graft.functions.NgramRunStats(args(0))
      }),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_sig(arrayOfStrings, k)")
        graft.functions.MinHashSig(args(0), intLiteral(args(1), "minhash_sig: k"))
      }),
    (FunctionIdentifier("lsh_bands"),
      new ExpressionInfo(classOf[graft.functions.LshBands].getName, "lsh_bands"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "lsh_bands(arrayOfLongs, bands)")
        graft.functions.LshBands(args(0), intLiteral(args(1), "lsh_bands: bands"))
      }),
    (FunctionIdentifier("char_dup_fraction"),
      new ExpressionInfo(classOf[graft.functions.CharDupFraction].getName, "char_dup_fraction"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "char_dup_fraction(arrayOfStrings)")
        graft.functions.CharDupFraction(args(0))
      }),
    (FunctionIdentifier("drop_positions"),
      new ExpressionInfo(classOf[graft.functions.DropPositions].getName, "drop_positions"),
      (args: Seq[Expression]) => {
        require(args.length == 2 || args.length == 3,
          "drop_positions(arrayOfStrings, arrayOfSpanStarts[, spanWidth])")
        val w = if (args.length == 3)
          intLiteral(args(2), "drop_positions: spanWidth") else 1
        graft.functions.DropPositions(args(0), args(1), w)
      }),
    (FunctionIdentifier("compress_ratio"),
      new ExpressionInfo(classOf[graft.functions.CompressRatio].getName, "compress_ratio"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "compress_ratio(string)")
        graft.functions.CompressRatio(args(0))
      }),
    (FunctionIdentifier("phrase_hits"),
      new ExpressionInfo(classOf[graft.functions.PhraseHits].getName, "phrase_hits"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "phrase_hits(string, arrayOfPatternLiterals)")
        graft.functions.PhraseHits(args(0),
          stringSeqLiteral(args(1), "phrase_hits: patterns"))
      }),
    (FunctionIdentifier("merge_tokens"),
      new ExpressionInfo(classOf[graft.functions.MergeTokens].getName, "merge_tokens"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "merge_tokens(arrayOfStrings, arrayOfPhraseLiterals)")
        graft.functions.MergeTokens(args(0),
          stringSeqLiteral(args(1), "merge_tokens: phrases"))
      }),
    (FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[graft.functions.TokenWindows].getName, "word_ngrams"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_ngrams(arrayOfStrings, n)")
        graft.functions.TokenWindows(args(0),
          intLiteral(args(1), "word_ngrams: n"), 1, partial = false, distinct = false)
      }),
    (FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[graft.functions.TokenWindows].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_shingles(arrayOfStrings, n)")
        graft.functions.TokenWindows(args(0),
          intLiteral(args(1), "word_shingles: n"), 1, partial = false, distinct = true)
      }),
    (FunctionIdentifier("token_chunks"),
      new ExpressionInfo(classOf[graft.functions.TokenWindows].getName, "token_chunks"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "token_chunks(arrayOfStrings, width)")
        val w = intLiteral(args(1), "token_chunks: width")
        graft.functions.TokenWindows(args(0), w, w, partial = true, distinct = false)
      }),
    (FunctionIdentifier("hilbert_d2"),
      new ExpressionInfo(classOf[graft.functions.HilbertCode].getName, "hilbert_d2"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "hilbert_d2(bucketX, bucketY, bits)")
        graft.functions.HilbertCode(args(0), args(1),
          intLiteral(args(2), "hilbert_d2: bits"))
      }),
    (FunctionIdentifier("hilbert_dn"),
      new ExpressionInfo(classOf[graft.functions.HilbertCodeN].getName, "hilbert_dn"),
      (args: Seq[Expression]) => {
        require(args.length >= 3, "hilbert_dn(bucket0, bucket1, ..., bits)")
        graft.functions.HilbertCodeN(args.dropRight(1),
          intLiteral(args.last, "hilbert_dn: bits"))
      }))

  def builder(appName: String, cpus: Int = defaultParallelism): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      // Engine-native expressions registered through the public
      // extensions hook so `expr("cosine_f(a,b)")`/call_function
      // resolve in every session this factory CREATES. (getOrCreate
      // can also RETURN a pre-existing foreign session where this hook
      // never ran — [[get]] covers that path via the registry.)
      .withExtensions { ext => nativeFunctions.foreach(ext.injectFunction) }
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Explicit (it is the Spark 4 default): arithmetic overflow —
      // notably DECIMAL(38,*) sum overflow at large scale — must fail
      // loudly, never return silent NULLs.
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      // NOTE on parquet timestamps: Spark's default output encoding is
      // the deprecated INT96, which carries NO min/max statistics —
      // a layout is blind to row-group pruning on its time column
      // (measured in ZorderProbe). The stats-bearing TIMESTAMP_MICROS
      // is deliberately NOT set session-wide: Spark annotates it
      // isAdjustedToUTC=true, which external readers (DuckDB) surface
      // as TIMESTAMPTZ — a different rendered value than a naive
      // timestamp, breaking byte-level output comparisons downstream.
      // [[graft.operators.Zorder.writeZordered]] scopes the conf to
      // the clustered-layout writes, where the stats ARE the point.
      // Static conf: the generated-class cache defaults to 100 entries,
      // which a 150+-query session churns through many times over —
      // evicted classes get recompiled (~seconds for explode-heavy
      // plans) whenever a query re-executes after the cache cycled,
      // which is exactly the first-touch cost a bench warmup exists to
      // absorb. 1000 entries keeps a full suite's plans resident for a
      // few tens of MB of metaspace; on a production driver serving a
      // fixed query set the same sizing argument applies.
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      // Older events.parquet vintages carry TIMESTAMP(NANOS), which the
      // vectorized reader rejects; read those as long and convert in
      // Tables.load (newer micros vintages ignore this conf entirely).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      // Catalog-table writes (CTAS) land in a per-process scratch
      // warehouse, never the working directory — and never a path a
      // concurrently-running graft JVM is also writing.
      .config("spark.sql.warehouse.dir", queries.scratchPath("warehouse"))

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    // getOrCreate may have returned a session some OTHER code created
    // first — the extensions hook never ran there and the native
    // functions would silently be unresolvable; register them directly
    // on whatever session came back (idempotent).
    org.apache.spark.sql.GraftColumn.ensureFunctions(spark, nativeFunctions)
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
