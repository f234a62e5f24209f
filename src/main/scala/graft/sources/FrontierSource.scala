package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 "link frontier" source — the reference's paginated listing
  * scan re-expressed as a proper Spark source (SURVEY §2 S1–S4):
  *
  *  - S2/S3 partitioned enumeration: one InputPartition per listing page
  *    (26 letter pages, `fighters_scraper.py:42-62`, or 1..N numbered
  *    pages, `fights_scraper.py:43-58`) — on a cluster each page is an
  *    independent task, the parallelism the single-threaded reference
  *    lacked.
  *  - S1 skip-not-fail: a page whose fetch "exhausts its retries" yields
  *    ZERO rows instead of failing the scan (`safe_request` returning None,
  *    `fighters_scraper.py:26-38`). Simulated deterministically here
  *    (letter index % 7 == 3): the harness is network-free, so the fetch
  *    is a seeded generator behind the same reader interface a real HTTP
  *    fetch (with its retry loop) would sit behind.
  *  - S4 nested expansion: each listing row fans out to its detail links
  *    inside the partition reader (the event→fights 1→N flatten).
  *  - Column pruning is pushed into the reader
  *    (SupportsPushDownRequiredColumns): pruned columns are never built —
  *    the DSv2 analog of parquet ReadSchema pruning.
  *
  * Usage: `spark.read.format("graft.sources.FrontierSource")
  *   .option("mode", "letters"|"pages").option("pages", n).load()`
  * Schema: (page string, url string, ord int).
  */
class FrontierSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FrontierSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FrontierTable(
      Option(properties.get("mode")).getOrElse("letters"),
      Option(properties.get("pages")).map(_.toInt).getOrElse(3))
}

object FrontierSource {
  val schema: StructType = StructType(Seq(
    StructField("page", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("ord", IntegerType, nullable = false)))

  /** Deterministic page keys: 26 letters or 1..n page numbers. */
  def pageKeys(mode: String, pages: Int): Seq[String] = mode match {
    case "letters" => ('a' to 'z').map(_.toString)
    case "pages"   => (1 to pages).map(_.toString)
    case other => throw new IllegalArgumentException(
      s"mode must be letters|pages, got $other")
  }

  /** The deterministic "fetch": listing rows for one page key, or Nil when
    * the simulated fetch fails (skip-not-fail). Mixes detail links with
    * chaff so downstream F1 containment filters have work to do. */
  def fetchPage(idx: Int, key: String): Seq[(String, Int)] =
    if (idx % 7 == 3) Nil // retries exhausted → skip page, not fail job
    else {
      val nLinks = 3 + idx % 5
      (0 until nLinks).flatMap { i =>
        Seq((s"site/fighter-details/$key$i", i),
            (s"site/banner/$key$i", i)) // chaff filtered by F1
      }
    }
}

private class FrontierTable(mode: String, pages: Int)
    extends Table with SupportsRead {
  override def name(): String = s"frontier($mode)"
  override def schema(): StructType = FrontierSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FrontierScanBuilder(mode, pages)
}

private class FrontierScanBuilder(mode: String, pages: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = FrontierSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] =
      FrontierSource.pageKeys(mode, pages).zipWithIndex
        .map { case (k, i) => FrontierPartition(i, k): InputPartition }
        .toArray

    override def createReaderFactory(): PartitionReaderFactory =
      new FrontierReaderFactory(required)
  }
}

private case class FrontierPartition(idx: Int, key: String)
    extends InputPartition

private class FrontierReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[FrontierPartition]
    new PartitionReader[InternalRow] {
      private val rows =
        FrontierSource.fetchPage(part.idx, part.key).iterator
      private var current: (String, Int) = _

      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false

      override def get(): InternalRow = {
        val values = required.fieldNames.map {
          case "page" => UTF8String.fromString(part.key)
          case "url"  => UTF8String.fromString(current._1)
          case "ord"  => Int.box(current._2)
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }

      override def close(): Unit = ()
    }
  }
}
