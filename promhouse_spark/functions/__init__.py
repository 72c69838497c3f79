from promhouse_spark.functions.fingerprint import (  # noqa: F401
    FNV_OFFSET_BASIS,
    FNV_PRIME,
    fingerprint,
    fingerprint_signed,
    fingerprint_map_udf,
    to_signed64,
    to_unsigned64,
)
from promhouse_spark.functions.labels import (  # noqa: F401
    marshal_labels,
    sort_labels,
    unmarshal_labels,
)
