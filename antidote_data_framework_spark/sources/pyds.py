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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
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


# ---------------------------------------------------------------------------
# Streaming flavor: a Python micro-batch source (simpleStreamReader).
# ---------------------------------------------------------------------------

N_STREAM_DAYS = 10
EVENTS_PER_DAY = 200


def _day_rows(day: int) -> list:
    # Deterministic event law: replayable on any executor at any time —
    # the property that makes offset-based recovery exact.  Returns a
    # materialized list: the simple-stream wrapper pickles the
    # prefetched batch for executor replay, and generators can't be
    # pickled.
    base = day * 86_400  # epoch seconds at day start
    return [
        (
            day * EVENTS_PER_DAY + k,                    # event_id
            base + (k * 409) % 86_400,                   # epoch_s within the day
            f"type_{(day + k) % 4}",                     # event_type
            float((day * 31 + k * 7) % 100),             # value
        )
        for k in range(EVENTS_PER_DAY)
    ]


#: Days consumed per micro-batch — the trigger-size lever.  Per-trigger
#: overhead (scheduling, Python worker round-trip, state commit) is
#: fixed cost, so larger micro-batches amortize it; this is the same
#: knob as Kafka's maxOffsetsPerTrigger.  2 days/batch keeps a real
#: multi-batch progression (5 triggers) at half the overhead of 1/batch.
DAYS_PER_BATCH = 2


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """DAYS_PER_BATCH days per micro-batch, N_STREAM_DAYS days total,
    then quiescent.

    Offsets are plain dicts ({"day": d}); read(start) returns the next
    batch of days plus the advanced offset, and readBetweenOffsets
    replays any committed range identically — exactly-once recovery
    comes from the generator being a pure function of the offset."""

    def initialOffset(self) -> dict:
        return {"day": 0}

    def read(self, start: dict):
        # Contract of the prefetch wrapper: the return must be an
        # ITERATOR (next() is called on no-advance batches) that is
        # also PICKLABLE (cached entries ship to the JVM) — a
        # list_iterator is both; a generator or bare list is not.
        d = int(start["day"])
        if d >= N_STREAM_DAYS:
            return iter([]), start
        end = min(d + DAYS_PER_BATCH, N_STREAM_DAYS)
        rows: list = []
        for day in range(d, end):
            rows.extend(_day_rows(day))
        return iter(rows), {"day": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows: list = []
        for d in range(int(start["day"]), int(end["day"])):
            rows.extend(_day_rows(d))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass


class SyntheticEventsStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events_stream"

    def schema(self) -> str:
        return "event_id BIGINT, epoch_s BIGINT, event_type STRING, value DOUBLE"

    def simpleStreamReader(self, schema: StructType):
        return SyntheticEventsStreamReader()
