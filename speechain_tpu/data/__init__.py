"""Host-side data pipeline: tokenizers, datasets (idx2* metadata), length-
bucketed iterators, multi-stream loading with device prefetch.

Rebuild of reference ``speechain/dataset``, ``speechain/iterator`` and
``speechain/tokenizer`` with a TPU-first twist: batches are padded to a small
set of static shape buckets so every train step hits a cached XLA executable.
"""

# import for the side effect of registering components (dataset.*,
# iterator.*, tokenizer.* names in the registry)
from speechain_tpu.data import dataset as _dataset  # noqa: F401
from speechain_tpu.data import iterator as _iterator  # noqa: F401
from speechain_tpu.data import tokenizer as _tokenizer  # noqa: F401
