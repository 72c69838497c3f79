from promhouse_spark.storage.base import Storage  # noqa: F401
from promhouse_spark.storage.memory import MemoryStorage  # noqa: F401
