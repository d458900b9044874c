package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.commons.compress.compressors.gzip.GzipCompressorInputStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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
 * Both memory hazards are GUARDED with actionable errors instead of an
 * opaque mid-job failure: archives over the on-disk cap are rejected at
 * plan time from file-listing metadata (no bytes read), and a gzipped
 * archive whose DECOMPRESSED members blow past `maxDecompressedBytes`
 * (a compression bomb, or just a too-big drop) fails executor-side
 * naming the archive and the fix.
 *
 * Gzip is auto-detected per archive from the magic bytes, so one glob
 * can mix `.tar` and `.tar.gz` drops.
 */
object Archives {

  /** binaryFile's hard single-row limit: file bytes become one Array
    * slot, so 2 GiB minus array-header slack. */
  val MaxArchiveOnDiskBytes: Long = Int.MaxValue.toLong - 512

  /** Default cap on one archive's total decompressed member bytes (the
    * executor-memory hazard the on-disk cap can't see: gzip routinely
    * compresses text 5-10×, a crafted bomb far more). */
  val DefaultMaxDecompressedBytes: Long = 8L << 30

  /** Magic-byte compression sniff — extension-independent: gzip
    * (1f 8b) and zstd (28 b5 2f fd, the de-facto webdataset codec;
    * zstd-jni is a Spark transitive dependency). */
  private def inputStreamFor(bytes: Array[Byte]): InputStream = {
    val raw = new ByteArrayInputStream(bytes)
    if (bytes.length >= 2 &&
      (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
      new GzipCompressorInputStream(raw)
    else if (bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0x28 && (bytes(1) & 0xff) == 0xb5 &&
      (bytes(2) & 0xff) == 0x2f && (bytes(3) & 0xff) == 0xfd)
      new com.github.luben.zstd.ZstdInputStream(raw)
    else raw
  }

  /**
   * Read every tarball matching `path` (a file, directory, or glob)
   * into (archive_path, member_name, member_size, member_bytes) — one
   * row per REGULAR member; directories, links, and the PAX/global
   * header pseudo-entries tar writers emit are skipped (commons-compress
   * consumes PAX metadata internally, so extended member names and
   * sizes are already resolved in what this returns).
   *
   * Guards (see the object doc): archives whose ON-DISK size exceeds
   * the binaryFile row cap fail AT PLAN TIME with the offending paths
   * (one metadata-only listing pass — `content` is pruned, no archive
   * bytes are read for the check); an archive whose DECOMPRESSED
   * members exceed `maxDecompressedBytes` fails executor-side naming
   * the archive. Both errors say the fix: split the drop upstream, or
   * raise the cap if the executors genuinely have the memory.
   */
  def readTar(
    spark: SparkSession,
    path: String,
    maxDecompressedBytes: Long = DefaultMaxDecompressedBytes
  ): DataFrame = {
    import spark.implicits._
    require(maxDecompressedBytes > 0,
      s"maxDecompressedBytes must be positive: $maxDecompressedBytes")
    val files = spark.read.format("binaryFile").load(path)
    // metadata-only guard: length comes from the file listing, so this
    // action reads zero archive bytes (content is pruned away)
    val oversized = files
      .select("path", "length")
      .filter(col("length") > MaxArchiveOnDiskBytes)
      .as[(String, Long)]
      .take(5)
    if (oversized.nonEmpty) {
      val worst = oversized
        .map { case (p, n) => s"$p (${n >> 20} MiB)" }.mkString(", ")
      throw new IllegalArgumentException(
        s"readTar: archive(s) exceed the ${MaxArchiveOnDiskBytes >> 20} MiB " +
          s"single-file cap binaryFile can materialize as one row: $worst. " +
          "Split the drop into smaller tarballs upstream (tar has no block " +
          "index — one archive is one task regardless), or repackage as " +
          "parquet/jsonl parts.")
    }
    files
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (archivePath, bytes) =>
        // UTF-8 name decoding (PAX path headers are UTF-8 by spec; this
        // also reads classic-header names written by a UTF-8 tar)
        val tar = new TarArchiveInputStream(inputStreamFor(bytes), "UTF-8")
        // strict iterator: members are read eagerly into a buffer while
        // the stream is open (a lazy iterator would outlive it); the
        // running decompressed total is capped so a gzip bomb (or an
        // honestly-too-big drop) fails with a named archive instead of
        // an executor OOM
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, Long, Array[Byte])]
        var total = 0L
        try {
          var e = tar.getNextEntry
          while (e != null) {
            if (e.isFile) {
              val member = tar.readAllBytes()
              total += member.length
              if (total > maxDecompressedBytes)
                throw new IllegalStateException(
                  s"readTar: decompressed members of $archivePath exceed " +
                    s"maxDecompressedBytes=$maxDecompressedBytes (at member " +
                    s"'${e.getName}'). Split the drop upstream, or raise " +
                    "maxDecompressedBytes if executors have the memory.")
              out += ((archivePath, e.getName, e.getSize, member))
            }
            e = tar.getNextEntry
          }
        } finally tar.close()
        out
      }
      .toDF("archive_path", "member_name", "member_size", "member_bytes")
  }

  /** Hadoop `Configuration` made task-shippable via its own `Writable`
    * serialization (Spark's equivalent helper is `private[spark]`). */
  private[sources] final class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration
  ) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /**
   * Tar-shard SINK — the inverse of [[readTar]], and the delivery format
   * a training pipeline PUBLISHES (webdataset-style: a corpus shipped as
   * N modest tarballs whose members are individually addressable by
   * name). Rows of (`nameCol`: member path, `bytesCol`: member bytes)
   * stream into rolling `.tar`/`.tar.gz`/`.tar.zst` shards under `dir`
   * (`codec` ∈ none|gzip|zstd — zstd is the de-facto webdataset
   * standard, via the zstd-jni already on Spark's classpath): each input
   * partition writes its own shard sequence, cutting a new shard once
   * the current one's member-byte total passes `maxShardBytes` — shard
   * size tracks content, executor memory holds one member at a time,
   * and the write is fully DISTRIBUTED (no driver loop, no shuffle of
   * its own: the caller's partitioning controls shard count, and
   * `sortWithinPartitions` upstream makes member order — and therefore
   * shard bytes — deterministic). Output goes through the Hadoop
   * FileSystem API, so local, HDFS, and object-store destinations all
   * work; shards are named `part-<partition>-<seq>.tar[.gz]`, and a
   * retried task overwrites its OWN names (idempotent, no duplicate
   * members across attempts). PAX long-name mode handles member paths
   * past tar's 100-byte classic header.
   *
   * The write runs EXACTLY ONCE, eagerly; the returned shard manifest
   * (shard_path, n_members, member_bytes) is a driver-local relation
   * (shard-count-sized), so re-evaluating it cannot re-run the job.
   */
  def writeTarShards(
    df: DataFrame,
    dir: String,
    nameCol: String = "member_name",
    bytesCol: String = "member_bytes",
    maxShardBytes: Long = 1L << 30,
    codec: String = "none"
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(maxShardBytes > 0, s"maxShardBytes must be positive: $maxShardBytes")
    require(Set("none", "gzip", "zstd")(codec),
      s"codec must be one of none|gzip|zstd: '$codec'")
    val conf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val suffix = codec match {
      case "gzip" => ".tar.gz"
      case "zstd" => ".tar.zst"
      case _      => ".tar"
    }
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(conf.value).mkdirs(dirPath)

    val manifest: Array[(String, Long, Long)] = df
      .select(col(nameCol).cast("string"), col(bytesCol).cast("binary"))
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        if (!rows.hasNext) Iterator.empty
        else {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf.value)
          // task-start cleanup: drop every existing part-<pid>-* shard
          // before writing. "A retried task overwrites its OWN names"
          // only holds per-name — after a nondeterministic upstream
          // shuffle a failed attempt can leave HIGHER-seq orphans the
          // retry never reaches, and a prior run into the same dir
          // leaves stale shards; glob readers would see duplicates
          fs.globStatus(new org.apache.hadoop.fs.Path(
              dirPath, f"part-$pid%05d-*")) match {
            case null => ()
            case stale => stale.foreach(s => fs.delete(s.getPath, false))
          }
          val shards = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
          var seq = 0
          var tar: org.apache.commons.compress.archivers.tar.TarArchiveOutputStream = null
          var shardPath: String = null
          var nMembers = 0L
          var nBytes = 0L

          def open(): Unit = {
            shardPath = new org.apache.hadoop.fs.Path(
              dirPath, f"part-$pid%05d-$seq%04d$suffix").toString
            val raw: java.io.OutputStream =
              fs.create(new org.apache.hadoop.fs.Path(shardPath), true)
            val maybeGz = codec match {
              case "gzip" =>
                new org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream(raw)
              case "zstd" => new com.github.luben.zstd.ZstdOutputStream(raw)
              case _      => raw
            }
            // UTF-8 name encoding + PAX path headers for non-ASCII names:
            // the default encoding %U-escapes anything non-ASCII, which
            // silently corrupts member names on the roundtrip
            tar = new org.apache.commons.compress.archivers.tar.TarArchiveOutputStream(
              maybeGz, "UTF-8")
            tar.setLongFileMode(
              org.apache.commons.compress.archivers.tar.TarArchiveOutputStream.LONGFILE_POSIX)
            tar.setAddPaxHeadersForNonAsciiNames(true)
            nMembers = 0L
            nBytes = 0L
          }

          def close(): Unit = if (tar != null) {
            tar.finish()
            tar.close()
            shards += ((shardPath, nMembers, nBytes))
            tar = null
          }

          open()
          try {
            rows.foreach { case (name, bytes) =>
              if (nBytes > 0 && nBytes + bytes.length > maxShardBytes) {
                close(); seq += 1; open()
              }
              val entry = new org.apache.commons.compress.archivers.tar.TarArchiveEntry(name)
              entry.setSize(bytes.length.toLong)
              tar.putArchiveEntry(entry)
              tar.write(bytes)
              tar.closeArchiveEntry()
              nMembers += 1
              nBytes += bytes.length
            }
            close()
          } finally if (tar != null) tar.close() // failure path: release the handle
          shards.iterator
        }
      }
      .collect()

    spark.createDataFrame(manifest.toSeq)
      .toDF("shard_path", "n_members", "member_bytes")
  }
}
