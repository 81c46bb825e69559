"""Column codec kernels: numpy/pyarrow-vectorized encode/decode pairs.

Registry of column codecs (dict, rle, for_bitpack, fsst, raw) plus the
per-buffer general-purpose compression stage (zstd/lz4/none) with the
reference's never-inflate raw fallback semantics
(/root/reference/src/compression.cpp:218-271).
"""

from sparrow_ipc_spark.codecs.base import (  # noqa: F401
    EncodedColumn,
    compress_buffer,
    decode_column,
    decompress_buffer,
    encode_column,
)
from sparrow_ipc_spark.codecs import (  # noqa: F401
    decimalcodec,
    dictionary,
    forbp,
    fsst,
    listcodec,
    raw,
    rle,
    structcodec,
)
from sparrow_ipc_spark.codecs.selector import select_and_encode  # noqa: F401
