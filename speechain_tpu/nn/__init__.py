"""Neural network building blocks (flax.linen), TPU-first.

Re-designed equivalents of the reference's ``speechain/module/`` layer
(reference file:line citations in each submodule). Everything is a pure
functional flax module: parameters live in pytrees, dropout takes explicit
PRNG keys, autoregressive decoding uses a mutable ``cache`` collection
(KV cache) instead of the reference's full-prefix recomputation
(``infer_func/beam_search.py:299-306``).
"""
