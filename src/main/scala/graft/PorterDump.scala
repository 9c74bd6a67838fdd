package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/**
 * Parity harness for the two Porter2 spellings: dumps every distinct
 * lowercased whitespace token of the corpus (plus q288's appended
 * derivational forms and query terms) with its Scala stem, and the
 * generated DuckDB CTE chain — `scripts/check_porter_parity.py` replays
 * the chain in DuckDB and diffs token-for-token. The graded q288 hash is
 * the production form of this check; this harness is the exhaustive one
 * (every corpus token, not just the ones that reach a posting).
 *
 * Usage: runMain graft.PorterDump <sfDir> <outDir>
 */
object PorterDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    Files.createDirectories(Paths.get(outDir))
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      // fork-free local-FS permissions (graft.util.NioLocalFileSystem):
      // stock Hadoop shells out to /bin/chmod per created file
      .config("spark.hadoop.fs.file.impl", "graft.util.NioLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    // a synthetic battery sweeping every suffix rule over stems of varied
    // R1/R2 shape (short words, vowel-initial, y-forms, doubles, gener-
    // special), so the two spellings are diffed far beyond the corpus vocab
    val stems = Seq("rat", "rel", "gener", "commun", "arsen", "nation",
      "condit", "hop", "hopp", "type", "cry", "employ", "beauti", "good",
      "happi", "ae", "io", "pl", "x", "by", "tr", "abl", "sens", "sensat",
      "activ", "real", "vocal", "logic", "log", "canon", "authent", "tan")
    val suffixes = Seq("", "s", "es", "ies", "ied", "sses", "ss", "us",
      "ed", "edly", "ing", "ingly", "eed", "eedly", "y", "ey",
      "ization", "ational", "fulness", "ousness", "iveness", "tional",
      "biliti", "lessli", "entli", "ation", "alism", "aliti", "ousli",
      "iviti", "fulli", "enci", "anci", "abli", "izer", "ator", "alli",
      "bli", "ogi", "li", "alize", "icate", "iciti", "ative", "ical",
      "ness", "ful", "ement", "ance", "ence", "able", "ible", "ment",
      "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
      "al", "er", "ic", "e", "l", "ll", "'s", "'s'", "'")
    val battery = for (st <- stems; sf <- suffixes) yield st + sf
    val knowns = Seq("relational", "generously", "relate", "generous",
      "tables", "queries", "values", "streams", "dying", "lying", "skies",
      "sky", "news", "proceed", "exceed", "inning", "agreed", "feed",
      "flies", "dies", "gas", "gaps", "this", "beautifully", "happily",
      "conflated", "luxuriated", "oscillating", "yellowy", "sprayed",
      "enjoyably", "vietnamization", "predication", "communism", "adoption")
    val extra = battery ++ knowns
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .distinct().collect().map(_.getString(0)).toSeq ++ extra
    val lines = toks.distinct.sorted.map(t =>
      s"${t}\t${graft.functions.Porter2.stem(t)}")
    Files.write(Paths.get(s"$outDir/porter_scala.tsv"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(s"$outDir/porter_ctes.sql"),
      graft.functions.Porter2.sqlCtes("toks", "orig", "ltk", "ps")
        .getBytes(StandardCharsets.UTF_8))
    println(s"[porterdump] ${lines.length} distinct tokens -> $outDir")
    spark.stop()
  }
}
