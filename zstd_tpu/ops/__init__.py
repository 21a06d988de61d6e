"""Device (TPU) kernels for the batched codec.

Design (SURVEY.md §7): the format's parallelism hooks — N independent
frames/blocks per batch, 4 Huffman literal streams per block, 3 interleaved
FSE states — become lanes of batched `lax.scan` kernels; tables are dense
arrays gathered per step; sequence execution is a scatter/prefix-sum/pointer
-doubling pipeline with no per-byte loop at all. All shapes are static under
jit; per-lane validity flags replace exceptions (a malformed lane poisons
only itself).
"""
