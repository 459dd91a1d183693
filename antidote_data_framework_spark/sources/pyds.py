"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
the engine's "write your own connector" surface.

`SyntheticRatingsDataSource` is a partition-planned generator of the
deterministic ratings distribution used by the recsys slice (FIXTURES.md
§B): the driver plans `numPartitions` InputPartitions, each executor
materializes only its own user range, and rows arrive through Arrow
batches.  The same three-class shape (DataSource / Reader /
InputPartition) is how a production connector wraps any external system
(REST API, message queue, proprietary store) while keeping Spark's
parallelism model: planning on the driver, I/O sharded across
executors, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class _UserRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticRatingsReader(DataSourceReader):
    def __init__(self, options):
        self.n_users = int(options.get("n_users", 100))
        self.n_items = int(options.get("n_items", 20))
        self.num_partitions = int(options.get("numpartitions", 8))

    def partitions(self):
        step = max(1, self.n_users // self.num_partitions)
        return [
            _UserRange(lo, min(lo + step, self.n_users))
            for lo in range(0, self.n_users, step)
        ]

    def read(self, partition: _UserRange):
        # Deterministic rating surface: 1 + (u*7 + i*13) % 5, the same
        # modulo law as the antidote unit fixture (FIXTURES.md §B) —
        # reproducible on any executor, any partitioning, any retry.
        for u in range(partition.start, partition.end):
            for i in range(self.n_items):
                yield (u, i, float(1 + (u * 7 + i * 13) % 5))


class SyntheticRatingsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_ratings"

    def schema(self) -> str:
        return "user_id BIGINT, item_id BIGINT, rating DOUBLE"

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticRatingsReader(self.options)
