"""Multi-instance consumption of the fetched stream (SURVEY.md §2.1 S3;
integration/MultiInstanceSpec.scala:16-47).

The reference shares one RabbitMQ queue per appId between app
instances: every CrawlItem is delivered to EXACTLY ONE instance of each
app (two instances of "MultiInstanceSpec" jointly receive each of the
40 items once, no more).  The Spark-native analog: the `fetched` table
is an append-only log of immutable data files; a consumer instance
CLAIMS unclaimed files under the catalog commit lock, so file ownership
(hence item delivery) is exclusive per (app_id, file).  Different
app_ids claim independently — each app sees the full stream, mirroring
queue-per-app routing (CrawlServiceLike.scala:79-85).

At 100 TB this is manifest arithmetic: a poll moves no data, reads no
rows; only the claimed files' rows are ever scanned, by the claiming
instance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import schemas
from .warehouse import Warehouse


class FetchedConsumer:
    """One app instance's view of the shared fetched stream."""

    def __init__(self, wh: Warehouse, app_id: str, instance_id: str):
        self.wh = wh
        self.app_id = app_id
        self.instance_id = instance_id

    def poll(self, spark: SparkSession) -> DataFrame:
        """Claim every currently-committed, not-yet-claimed fetched data
        file for this instance and return its rows.  Exactly-once per
        app: the claim map is updated atomically under the catalog lock,
        so no file is ever returned to two instances of the same app."""
        cat = self.wh.catalog
        t = self.wh.table("fetched", schemas.FETCHED)
        with cat.lock():
            st = cat.state()
            files = t.files(st["tables"].get("fetched", 0))
            claims = st.get("consumers", {}).get(self.app_id, {})
            mine = [f for f in files if f not in claims]
            if mine:
                consumers = st.get("consumers", {})
                app_claims = dict(consumers.get(self.app_id, {}))
                app_claims.update({f: self.instance_id for f in mine})
                consumers = {**consumers, self.app_id: app_claims}
                cat.commit(st["wave"], {}, consumers=consumers)
        if not mine:
            return spark.createDataFrame([], schemas.FETCHED)
        return spark.read.schema(schemas.FETCHED).parquet(*mine)
