package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.commons.compress.compressors.gzip.GzipCompressorInputStream
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Binary-archive ingestion: tarballs → one row per regular member —
 * the "dataset drop" entry point (crawl dumps, NeMO-style deliveries
 * arrive as `.tar`/`.tar.gz`, not as parquet). Mirrors the reference's
 * untar stage (NeMO/src/main/wdl/untar/UntarFiles.wdl:1), re-expressed
 * as a DISTRIBUTED source: no driver loop, no shelling out, no local
 * scratch directory — each archive is read as one `binaryFile` row and
 * its members are expanded executor-side.
 *
 * Scale shape: tar has no block index, so an archive is one task (the
 * format's parallelism limit, not Spark's) — many modest drops spread
 * across the cluster, which is exactly the NeMO delivery shape. Each
 * archive must fit the `binaryFile` single-row cap (2 GiB) and executor
 * memory; for bigger drops, split upstream. Members stream through the
 * tar reader one at a time; only the current member's bytes are
 * materialized alongside the archive's.
 *
 * Gzip is auto-detected per archive from the magic bytes, so one glob
 * can mix `.tar` and `.tar.gz` drops.
 */
object Archives {

  /** Magic-byte gzip sniff (1f 8b) — extension-independent. */
  private def inputStreamFor(bytes: Array[Byte]): InputStream = {
    val raw = new ByteArrayInputStream(bytes)
    if (bytes.length >= 2 &&
      (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
      new GzipCompressorInputStream(raw)
    else raw
  }

  /**
   * Read every tarball matching `path` (a file, directory, or glob)
   * into (archive_path, member_name, member_size, member_bytes) — one
   * row per REGULAR member; directories, links, and the PAX/global
   * header pseudo-entries tar writers emit are skipped (commons-compress
   * consumes PAX metadata internally, so extended member names and
   * sizes are already resolved in what this returns).
   */
  def readTar(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (archivePath, bytes) =>
        val tar = new TarArchiveInputStream(inputStreamFor(bytes))
        // strict iterator: members are read eagerly into a buffer while
        // the stream is open (a lazy iterator would outlive it); bounded
        // by the archive's decompressed size, which binaryFile already
        // holds in memory as one row
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, Long, Array[Byte])]
        try {
          var e = tar.getNextEntry
          while (e != null) {
            if (e.isFile)
              out += ((archivePath, e.getName, e.getSize,
                tar.readAllBytes()))
            e = tar.getNextEntry
          }
        } finally tar.close()
        out
      }
      .toDF("archive_path", "member_name", "member_size", "member_bytes")
  }
}
