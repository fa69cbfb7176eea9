package graft.sources

/** Production storage mapping (SURVEY §7.2) — the Iceberg counterpart of
  * [[TableIO]]'s parquet+manifest implementation. This sandbox ships no
  * Iceberg jar (offline, /opt/spark/jars only), so this class is a
  * documented STUB: every method states the exact Iceberg operation that
  * replaces the sandbox mechanism. The engine code talks to TableIO's
  * surface, so swapping in Iceberg changes no operator logic.
  *
  * The O(delta) property is NOT deferred to Iceberg: the sandbox LSM
  * layout already demonstrates it (LsmSpec asserts an incremental sync's
  * written bytes ≪ index size; segments are shared between versions by
  * manifest reference). Iceberg replaces the hand-rolled pieces with
  * battle-tested equivalents:
  *
  * | sandbox mechanism (TableIO + Tables)     | Iceberg production call |
  * |---                                       |---|
  * | `v=<batchId>/manifest` + `current` flip  | snapshot commit; readers pin a snapshot-id (time travel) |
  * | segment dirs shared across manifests     | data files referenced by successive snapshots (metadata-only reuse) |
  * | tombstone parquet ((docId, before))      | equality-delete files; compaction = rewrite_data_files |
  * | compaction every compactThreshold        | rewrite_data_files / rewrite_position_delete_files maintenance |
  * | `gcVersions(keep)` + segment GC          | `expire_snapshots(older_than)` + `remove_orphan_files` |
  * | checkpoints JSON-line log                | an Iceberg `checkpoints` table (append) |
  * | staged segment dirs                      | write-audit-publish (WAP) staged snapshots |
  * | fwd-table killed-doc lookup              | changelog read of the delta + bucket(docId) clustering + bloom filters |
  * | single-flight lock file                  | catalog-level commit conflict detection (optimistic, retried) |
  */
class IcebergTableIO {
  private def notInSandbox =
    throw new UnsupportedOperationException(
      "Iceberg runtime not present in this sandbox (no jar in " +
        "/opt/spark/jars); see the mapping table in the Scaladoc — " +
        "production deployments use this class with " +
        "spark.sql.catalog.graft=org.apache.iceberg.spark.SparkCatalog")

  def mergeIntoDocs(): Unit = notInSandbox
  def commitSnapshot(): Unit = notInSandbox
  def deleteWhere(): Unit = notInSandbox
  def expireSnapshots(): Unit = notInSandbox
}
