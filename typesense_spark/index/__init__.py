from typesense_spark.index.build import Index, build_index  # noqa: F401
from typesense_spark.index.codec import (  # noqa: F401
    pack_block,
    unpack_block,
    varint_decode,
    varint_encode,
)
