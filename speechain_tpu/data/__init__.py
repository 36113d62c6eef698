"""Host-side data pipeline: tokenizers, datasets (idx2* metadata), length-
bucketed iterators, multi-stream loading with device prefetch.

Rebuild of reference ``speechain/dataset``, ``speechain/iterator`` and
``speechain/tokenizer`` with a TPU-first twist: batches are padded to a small
set of static shape buckets so every train step hits a cached XLA executable.
"""
