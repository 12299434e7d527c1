package graft

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** Hadoop's raw local filesystem re-registered under its own scheme —
  * the test double for a NON-`file` warehouse (HDFS, an object-store
  * connector): resolving a `graftmock://` path through
  * `Path.getFileSystem` lands here via the standard
  * `fs.graftmock.impl` registration, exactly how a deployment plugs in
  * a real connector. Because the scheme is not `file`,
  * `Published.createNewAtomic` takes its GENERIC branch
  * (`FileSystem.create(p, overwrite=false)` + Hadoop
  * FileAlreadyExistsException mapping) — the code path a real HDFS
  * warehouse runs, unreachable through `file://` which gets the POSIX
  * CREATE_NEW override. Storage is still the local disk, so tests can
  * inspect state with java.nio. (RawLocalFileSystem's create-no-
  * overwrite is check-then-act — functionally create-new, without
  * HDFS's namenode atomicity; fine for spec-level behavior checks,
  * which is why the atomicity CONTRACT itself lives in
  * `createNewAtomic`'s per-scheme scaladoc, not here.) */
class GraftMockFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("graftmock:///")
}
