"""Codec kernels and the per-chunk auto-selector.

Pure numpy + pyarrow(zstd); no Spark imports here so the kernels are unit
testable and picklable into Arrow UDF workers without dragging session state.
"""

from cuda_float_compress_spark.codecs.core import (  # noqa: F401
    BYTES_CODECS,
    FLOAT_CODECS,
    INT_CODECS,
    decode_bytes_chunk,
    decode_float_chunk,
    decode_int_chunk,
    encode_bytes_chunk,
    encode_float_chunk,
    encode_int_chunk,
)
from cuda_float_compress_spark.codecs.select import (  # noqa: F401
    select_and_encode_bytes,
    select_and_encode_float,
    select_and_encode_int,
)
