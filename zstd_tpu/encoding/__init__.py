"""Encoding pipeline (oracle/host implementation).

Capability parity with /root/reference/ruzstd/src/encoding/: frame compressor
with level dispatch (Uncompressed, Fastest), compressed-block assembly
(Huffman literals, FSE sequences), hash-table match generation, RLE/raw
fallbacks with the no-expansion guarantee, and xxhash64 content checksums.
The batched TPU encode pipeline in zstd_tpu/models reuses these components'
table builders.
"""
