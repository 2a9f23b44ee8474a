package graft

import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Parquet bloom-filter layout: the filters must REALLY be in the
  * footers (not just accepted options), adjudicate membership through
  * parquet's own reader, and stay absent for non-bloom columns; scans
  * over the layout stay correct with pushdown on.
  */
class LayoutSpec extends SparkTestBase {

  test("writeWithBloomFilters: footers carry filters for bloom columns only, membership adjudicates, scans stay exact") {
    import spark.implicits._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.column.values.bloomfilter.BloomFilter
    import org.apache.parquet.io.api.Binary

    val dir = java.nio.file.Files.createTempDirectory("bloom_layout").toString
    val df = spark.range(10000).select(
      concat(lit("doc-"), col("id").cast("string")).as("key"),
      (col("id") % 97).as("v"))
    graft.ingest.Layout.writeWithBloomFilters(df.repartition(2),
      s"$dir/t", Seq("key"), ndv = 10000L)

    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(s"$dir/t")
      .getFileSystem(conf)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/t"))
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { p =>
      // a key this file actually holds (each file has its own partition
      // of the keys — a global probe key would miss half the files)
      val ownKey = spark.read.parquet(p.toString)
        .select("key").limit(1).collect().head.getString(0)
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        r.getFooter.getBlocks.asScala.foreach { rg =>
          val cols = rg.getColumns.asScala
            .map(c => c.getPath.toDotString -> c).toMap
          // bloom column: offset present AND the filter adjudicates —
          // a key in the row group hashes positive, foreign keys
          // negative (split-block bloom at ndv 10k: fp ~1%)
          assert(cols("key").getBloomFilterOffset >= 0,
            s"no bloom filter for 'key' in $p")
          val bfReader = r.getBloomFilterDataReader(rg)
          val bf: BloomFilter = bfReader.readBloomFilter(cols("key"))
          assert(bf != null)
          def hit(s: String): Boolean =
            bf.findHash(bf.hash(Binary.fromString(s)))
          assert(hit(ownKey), s"resident key $ownKey must probe positive")
          assert(!hit("absent-key-zzz-1") || !hit("absent-key-zzz-2"),
            "two foreign keys both colliding at fp~1% is implausible")
          // non-bloom column: no filter written
          assert(cols("v").getBloomFilterOffset < 0,
            s"unexpected bloom filter for 'v' in $p")
        }
      } finally r.close()
    }
    // scans over the layout stay exact with pushdown on (default)
    val got = spark.read.parquet(s"$dir/t")
      .filter(col("key") === "doc-1234").collect()
    assert(got.length === 1 && got.head.getAs[Long]("v") === 1234L % 97)
    assert(spark.read.parquet(s"$dir/t")
      .filter(col("key") === "never-written").count() === 0L)
    // guards: unknown column loud
    val e = intercept[IllegalArgumentException](
      graft.ingest.Layout.writeWithBloomFilters(df, s"$dir/x", Seq("nope")))
    assert(e.getMessage.contains("nope"))
  }
}
