"""Streaming -> versioned-publish integration (foreachBatch).

``stream_to_versioned`` lands each micro-batch as a NEW published version of
a catalog table — the streaming form of the copy pipeline's
load->publish->cleanup loop, with the batch epoch folded into the version
timestamp so replayed epochs (after a crash-restart) overwrite their own
version instead of double-appending: exactly-once at the version level.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame

from ..engine.publish import VersionedCatalog


def stream_to_versioned(
    stream_df: DataFrame,
    catalog: VersionedCatalog,
    schema: str,
    table: str,
    checkpoint_dir: str,
    *,
    base_date: datetime = datetime(2024, 1, 1),
    available_now: bool = True,
):
    """Start a stream that publishes every micro-batch as a table version.

    The version name derives from the epoch id (deterministic across
    restarts), so a replayed epoch is idempotent. Retention keeps the usual
    current+backup window.
    """

    def publish_batch(batch_df: DataFrame, epoch_id: int) -> None:
        load_date = base_date + timedelta(seconds=int(epoch_id))
        spark = batch_df.sparkSession
        physical = catalog.write_version(batch_df, schema, table, load_date)
        catalog.publish(spark, schema, table, physical)
        catalog.cleanup(schema, table)

    writer = stream_df.writeStream.foreachBatch(publish_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
