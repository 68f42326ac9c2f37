package graft.sources

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** RawLocalFileSystem without the per-file `chmod` fork+exec.
  *
  * Hadoop's local filesystem, absent libhadoop native IO, implements
  * `setPermission` by shelling out — one fork+exec of /bin/chmod per
  * created file and directory (`LocalFSFileOutputStream.<init>` and
  * `mkOneDirWithMode` both funnel through it). On the local session
  * that is pure overhead: every batch file, manifest, offset-log and
  * state-store checkpoint entry pays a process spawn to set the same
  * umask-derived mode bits the OS already gave the file. Profiled at
  * 0.2-0.5 s per streaming driver row (JobProbe stack sampler, round
  * 16). POSIX permission fidelity is not part of this engine's
  * contract — production deployments talk to HDFS/S3, whose
  * FileSystems never shell out.
  */
class NoChmodRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}

/** The `file://` FileSystem the local session registers: a
  * LocalFileSystem (several Spark components — RocksDBFileManager
  * among them — pattern-match/cast on that type, so the registered
  * class must BE one) over the chmod-less raw fs, with CRC sidecars
  * off: ChecksumFileSystem would otherwise double every local create
  * (a `.crc` twin per file) for checksums parquet already carries at
  * page level and nothing here ever reads back.
  */
class NoChmodLocalFileSystem
    extends LocalFileSystem(new NoChmodRawLocalFileSystem) {
  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setWriteChecksum(false)
    setVerifyChecksum(false)
  }
}
