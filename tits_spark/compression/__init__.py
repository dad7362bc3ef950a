from tits_spark.compression.gorilla import (
    gorilla_decode,
    gorilla_encode,
    compress_partitions,
    decompress_partitions,
)

__all__ = [
    "gorilla_decode",
    "gorilla_encode",
    "compress_partitions",
    "decompress_partitions",
]
