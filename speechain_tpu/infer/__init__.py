"""Inference engines: batched KV-cached beam search with CTC/LM/ILM fusion,
greedy decode, autoregressive TTS decoding, Griffin-Lim vocoding.

Rebuild of reference ``speechain/infer_func/*`` with TPU-native control flow:
``lax.while_loop`` over static-capacity state instead of Python loops over
dynamic tensors, KV caches instead of full-prefix recomputation
(beam_search.py:299-306), and a two-scan CTC prefix scorer that never
materializes the (T, 2, B*K, V) lattice (ctc_decoding.py:73-196).
"""
