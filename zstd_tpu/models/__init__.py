"""Batched codec pipelines — the flagship "models" of this framework.

- batch_decoder: many-frame data-parallel TPU decode (the throughput path)
- batch_encoder: many-block TPU-assisted compression
- dict_trainer: raw-content dictionary training (reservoir + cover scoring)
"""
