package graft.sources

/** Production storage mapping (SURVEY §7.2) — the Iceberg counterpart of
  * [[TableIO]]'s parquet+pointer-file implementation. This sandbox ships
  * no Iceberg jar (offline, /opt/spark/jars only), so this class is a
  * documented STUB: every method states the exact Iceberg operation that
  * replaces the sandbox mechanism. The engine code talks to TableIO's
  * surface, so swapping in Iceberg changes no operator logic.
  *
  * | sandbox mechanism (TableIO)            | Iceberg production call |
  * |---                                     |---|
  * | `v=<batchId>/` dir + `current` rename  | snapshot commit; readers pin a snapshot-id (time travel) |
  * | docs upsert via merge paths            | `MERGE INTO docs USING delta ON url` |
  * | purge tombstones dropped in merge      | `DELETE FROM index WHERE ...` / positional deletes |
  * | pass-through blocks re-written         | untouched data files referenced by the new snapshot (metadata-only) |
  * | `gcVersions(keep)`                     | `expire_snapshots(older_than)` |
  * | checkpoints JSON-line log              | an Iceberg `checkpoints` table (append) |
  * | staged segment dirs                    | write-audit-publish (WAP) staged snapshots |
  * | dict/stats derived by rescan           | incrementally maintained via changelog reads |
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
