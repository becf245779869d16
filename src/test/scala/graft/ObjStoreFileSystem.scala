package graft

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, FileUtil, Path, RawLocalFileSystem}

/** Object-store STAND-IN for tests: a local filesystem registered under
  * the `objstore://` scheme whose RENAME degrades to copy+delete — the
  * S3-class semantics (object stores have no atomic directory rename;
  * "rename" is a client-side copy loop). Running the pool lifecycle
  * through it proves the commit protocol depends only on
  * "small-object PUT is last-writer-wins" (SCALING.md "Pool storage
  * reach"), not on posix rename — and that Spark's parquet committer,
  * the manifest swap, the snapshot writes, purge, and vacuum all hold
  * under the degraded semantics.
  */
class ObjStoreFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "objstore"
  override def getUri: URI = URI.create("objstore:///")

  override def rename(src: Path, dst: Path): Boolean = {
    ObjStoreFileSystem.renamedTo.add(dst.getName)
    if (!exists(src)) return false
    // the object-store degradation: copy everything, then delete the
    // source — never atomic, and a reader can observe the copy mid-way
    FileUtil.copy(this, src, this, dst,
      true /* deleteSource */, true /* overwrite */, getConf)
  }
}

object ObjStoreFileSystem {
  /** Destination names of every rename issued through the scheme — lets
    * specs assert which files are NEVER installed by rename (the pool's
    * metadata must be direct single-PUT writes here, since this store's
    * rename has a reader-visible missing/half-copied window). */
  val renamedTo: java.util.concurrent.ConcurrentLinkedQueue[String] =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

/** The AbstractFileSystem binding FileContext needs for the scheme. */
class ObjStoreAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new ObjStoreFileSystem, conf, "objstore", false)
